package graft.queries

import graft.Tables
import graft.dedup.Substring
import graft.ml.{Sampling, Similarity}
import graft.text.{Chunking, TextOps}
import org.apache.spark.sql.functions._
import Q._

/** Training-pipeline preparation operators over `documents`: benchmark
  * decontamination, substring-level (duplicated-span) dedup, PII
  * detection/redaction, document chunking and context-window packing.
  * Every gate has a DuckDB oracle replaying the exact algorithm.
  */
object PipeQueries {

  private[graft] val contamN = 8 // word n-gram for eval-overlap (docs are 10-99 toks)
  private val spanN = 13 // Lee et al. 2022 span length, in tokens
  private val spanMaxFrac = 0.3
  private val chunkSize = 64
  private val chunkStride = 48
  private val packCtx = 256
  private val sampleSalt = "s1" // same split as sample_split/dedup_incremental
  private val splitFractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val twinOffset = 1048576L // planted-twin id shift (as DocQueries)
  private val semThreshold = 0.999
  // non-uniform target mixture over the 20 sources: weight cycles 1..4
  private val mixWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1).toDouble).toMap
  private val mixBudget = 0.5

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)
  private def emb(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)

  private def withToks(d: org.apache.spark.sql.DataFrame) =
    d.withColumn("toks", TextOps.wsTokens(col("text")))

  /** Deterministic PII injection shared with the oracle: the synthetic
    * corpus has no organic PII, so the gate plants one email / phone /
    * IPv4 per doc_id%5 class — making counts, the flag, and the redaction
    * hash all non-trivial while staying engine-reproducible.
    */
  private[queries] def augText = concat(col("text"),
    when(col("doc_id") % 5 === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com for details")))
      .when(col("doc_id") % 5 === 1,
        concat(lit(" call 555-"),
          lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
          lit("-"),
          lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0")))
      .when(col("doc_id") % 5 === 2,
        concat(lit(" server 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), ((col("doc_id") * 3) % 256).cast("string"),
          lit(" down")))
      .otherwise(lit("")))

  val queries: Map[String, QueryFn] = Map[String, QueryFn](
    // Benchmark decontamination: hash-split test 10% stands in for the
    // eval suite; every train doc reports how many of its distinct
    // 8-grams appear anywhere in it. In production the bench side is
    // tiny → AQE broadcasts it and the corpus gram stream never shuffles.
    "decontaminate" -> ((s, dir) => {
      val sp = withToks(Sampling.splitAssign(docs(s, dir), "doc_id",
        sampleSalt, splitFractions))
      Substring.contamination(
        sp.where(col("split") === "train"),
        sp.where(col("split") === "test"),
        "doc_id", "toks", contamN)
    }),

    // Substring-level dedup (Lee et al. 2022): maximal cross-document
    // duplicated 13-token spans as [start, end) token intervals.
    "dedup_dup_spans" -> ((s, dir) =>
      Substring.dupSpanIntervals(withToks(docs(s, dir)), "doc_id", "toks", spanN)),

    // Per-doc duplicated-token coverage + the drop-heavily-duplicated
    // policy flag at 30%.
    "dedup_span_coverage" -> ((s, dir) =>
      Substring.spanCoverage(withToks(docs(s, dir)), "doc_id", "toks",
          spanN, spanMaxFrac)
        .select(col("doc_id"), col("n_tokens"), col("n_dup_tokens"),
          col("n_spans"), r6(col("dup_frac")).as("dup_frac"),
          col("keep_substring"))),

    // PII detect + redact over the injected corpus: pattern counts, the
    // any-PII flag, and the md5 of the scrubbed text.
    "pii_redact" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), augText.as("aug"))
        .select(Seq(col("doc_id")) ++ TextOps.piiColumns(col("aug")): _*)),

    // LM-pretraining chunking: 64-token windows, stride 48 (16-token
    // overlap), final chunk may be short. Pure explode — no shuffle.
    "doc_chunks" -> ((s, dir) =>
      Chunking.chunks(withToks(docs(s, dir)), "doc_id", "toks",
        chunkSize, chunkStride)),

    // Context-window packing per source shard: doc → 256-token window its
    // first token lands in, in doc_id order within the shard.
    "pack_offsets" -> ((s, dir) =>
      Chunking.packOffsets(
        withToks(docs(s, dir)).withColumn("nt", size(col("toks"))),
        "doc_id", "nt", Seq("source"), packCtx)),

    // Packing-efficiency report: docs + tokens landing in each window.
    "pack_bins" -> ((s, dir) =>
      Chunking.packBins(
        Chunking.packOffsets(
          withToks(docs(s, dir)).withColumn("nt", size(col("toks"))),
          "doc_id", "nt", Seq("source"), packCtx),
        Seq("source")))
  ) ++ Map[String, QueryFn](

    // SemDeDup exercised in its regime (tight threshold — same twin-plant
    // protocol as dedup_embedding_clusters): every vector gets an exact
    // twin at id+2^20; identical vectors deterministically land in the
    // same k-means cell (strict-> tie-break) and the twin (higher id, cos
    // 1.0 to its original) must be dropped. Measured 500/500 at sf0.01.
    "semdedup" -> ((s, dir) => {
      val e0 = emb(s, dir).select(col("vec_id"), col("embedding"))
      val twin = e0.select((col("vec_id") + twinOffset).as("vec_id"),
        col("embedding"))
      val cents = Similarity.kmeansCentroids(e0, "vec_id", "embedding",
        nlist = 32, iters = 5)
      val sd = Similarity.semDedup(e0.union(twin), "vec_id", "embedding",
        cents, semThreshold)
      e0.select(col("vec_id"))
        .join(sd.select(col("id").as("vec_id"), col("cell").as("cell_o")),
          Seq("vec_id"), "left")
        .join(sd.select((col("id") - twinOffset).as("vec_id"),
          col("cell").as("cell_t"), col("is_dropped").as("twin_dropped")),
          Seq("vec_id"), "left")
        .select(col("vec_id"),
          (col("cell_o") === col("cell_t")).as("twin_same_cell"),
          col("twin_dropped"))
    }),

    // Down-only domain-mixture resampling toward a non-uniform target:
    // the full keep/drop decision is hash-reproduced by the oracle
    // (rates → integer thresholds → (salt,id)-hash gate).
    "mixture_resample" -> ((s, dir) =>
      Sampling.mixtureResample(docs(s, dir), "doc_id", "source",
          mixWeights, mixBudget, sampleSalt)
        .select(col("doc_id"), col("source")))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------



  /** split CTE `lbl(doc_id, split)` — mirror of Sampling.splitAssign. */
  private val splitCte: String = {
    val cum = splitFractions.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
    val whens = splitFractions.map(_._1).zip(cum).init.map { case (n, c) =>
      s"WHEN h32 < ${math.round(c * 4294967296.0)} THEN '$n'"
    }.mkString(" ")
    s"""hsp AS (SELECT doc_id, md5('$sampleSalt:' || CAST(doc_id AS VARCHAR)) AS m
       |        FROM documents),
       |spl AS (SELECT doc_id, $hex32Sql AS h32 FROM hsp),
       |lbl AS (SELECT doc_id,
       |  CASE $whens ELSE '${splitFractions.last._1}' END AS split FROM spl)""".stripMargin
  }

  /** positional full n-gram hash CTE `g2(doc_id, pos, h)`. */
  private[queries] def gramCte(n: Int): String =
    s"""gr AS (
       |  SELECT doc_id, unnest(range(1, len(toks) - ${n - 2})) AS i, toks
       |  FROM toks WHERE len(toks) >= $n
       |),
       |g2 AS (
       |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |         md5(array_to_string(list_slice(toks, i, i + ${n - 1}), ' ')) AS h
       |  FROM gr
       |)""".stripMargin

  /** duplicated-span island CTE chain `isl(doc_id, span_start, span_end,
    * span_len)` over g2 (needs gramCte in scope).
    */
  private def spanIslandCtes(n: Int): String =
    s"""dh AS (SELECT h FROM g2 GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |dp AS (SELECT g2.doc_id, pos FROM g2 JOIN dh USING (h)),
       |w1 AS (
       |  SELECT doc_id, pos,
       |    max(pos + $n) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM dp
       |),
       |w2 AS (SELECT doc_id, pos,
       |  CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END AS nw
       |  FROM w1),
       |w3 AS (SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM w2),
       |isl AS (
       |  SELECT doc_id, min(pos) AS span_start, max(pos) + $n AS span_end,
       |         max(pos) + $n - min(pos) AS span_len
       |  FROM w3 GROUP BY doc_id, isl
       |)""".stripMargin

  /** PII injection mirror of [[augText]]. */
  // NOTE: no continuation line may START with `||` — stripMargin would eat
  // one pipe and leave a bitwise-or
  private[queries] val augSql: String =
    """text || CASE doc_id % 5
      |  WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com for details'
      |  WHEN 1 THEN ' call 555-' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') ||
      |              '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')
      |  WHEN 2 THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
      |              CAST((doc_id * 3) % 256 AS VARCHAR) || ' down'
      |  ELSE '' END""".stripMargin

  val oracles: Map[String, String] = Map(
    "decontaminate" ->
      s"""WITH $toksCte, $splitCte, ${gramCte(contamN)},
         |gd AS (SELECT DISTINCT doc_id, h FROM g2),
         |corp AS (SELECT gd.doc_id, h FROM gd JOIN lbl USING (doc_id)
         |         WHERE lbl.split = 'train'),
         |ben AS (SELECT DISTINCT h FROM gd JOIN lbl USING (doc_id)
         |        WHERE lbl.split = 'test'),
         |agg AS (
         |  SELECT c.doc_id, count(*) AS n_grams, count(b.h) AS n_overlap
         |  FROM corp c LEFT JOIN ben b ON b.h = c.h GROUP BY c.doc_id
         |)
         |SELECT l.doc_id,
         |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
         |  coalesce(n_overlap, 0) > 0 AS contaminated
         |FROM lbl l LEFT JOIN agg USING (doc_id)
         |WHERE l.split = 'train'""".stripMargin,

    "dedup_dup_spans" ->
      s"""WITH $toksCte, ${gramCte(spanN)}, ${spanIslandCtes(spanN)}
         |SELECT doc_id, CAST(span_start AS INT) AS span_start,
         |  CAST(span_end AS INT) AS span_end,
         |  CAST(span_len AS INT) AS span_len
         |FROM isl""".stripMargin,

    "dedup_span_coverage" ->
      s"""WITH $toksCte, ${gramCte(spanN)}, ${spanIslandCtes(spanN)},
         |cov AS (
         |  SELECT doc_id, sum(span_len) AS dup, count(*) AS n_spans
         |  FROM isl GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(dup, 0) AS BIGINT) AS n_dup_tokens,
         |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
         |  ${rd("coalesce(dup, 0) / CAST(len(toks) AS DOUBLE)")} AS dup_frac,
         |  coalesce(dup, 0) / CAST(len(toks) AS DOUBLE) <= ${D(spanMaxFrac)} AS keep_substring
         |FROM toks t LEFT JOIN cov USING (doc_id)""".stripMargin,

    "pii_redact" ->
      s"""WITH aug AS (SELECT doc_id, $augSql AS a FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(a, '${TextOps.emailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(a, '${TextOps.phoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(a, '${TextOps.ipv4Re}')) AS BIGINT) AS n_ips,
         |  len(regexp_extract_all(a, '${TextOps.emailRe}'))
         |    + len(regexp_extract_all(a, '${TextOps.phoneRe}'))
         |    + len(regexp_extract_all(a, '${TextOps.ipv4Re}')) > 0 AS has_pii,
         |  md5(regexp_replace(regexp_replace(regexp_replace(a,
         |    '${TextOps.emailRe}', '<EMAIL>', 'g'),
         |    '${TextOps.phoneRe}', '<PHONE>', 'g'),
         |    '${TextOps.ipv4Re}', '<IP>', 'g')) AS redacted_md5
         |FROM aug""".stripMargin,

    "doc_chunks" ->
      s"""WITH $toksCte,
         |st AS (SELECT doc_id, toks, unnest(range(0, len(toks), $chunkStride)) AS s
         |       FROM toks),
         |ch AS (SELECT doc_id, s // $chunkStride AS chunk_idx, s AS chunk_start,
         |              list_slice(toks, s + 1, s + $chunkSize) AS c
         |       FROM st)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |  CAST(chunk_start AS INT) AS chunk_start,
         |  CAST(len(c) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(c, ' ')) AS chunk_md5
         |FROM ch""".stripMargin,

    "pack_offsets" ->
      s"""WITH $toksCte,
         |n AS (SELECT t.doc_id, d.source, len(t.toks) AS nt
         |      FROM toks t JOIN documents d ON d.doc_id = t.doc_id),
         |o AS (SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens,
         |        coalesce(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
         |      FROM n)
         |SELECT source, doc_id, n_tokens,
         |  CAST(start_offset AS BIGINT) AS start_offset,
         |  CAST(start_offset // $packCtx AS BIGINT) AS bin_id
         |FROM o""".stripMargin,

    "pack_bins" ->
      s"""WITH $toksCte,
         |n AS (SELECT t.doc_id, d.source, len(t.toks) AS nt
         |      FROM toks t JOIN documents d ON d.doc_id = t.doc_id),
         |o AS (SELECT doc_id, source, CAST(nt AS BIGINT) AS n_tokens,
         |        coalesce(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
         |      FROM n)
         |SELECT source, CAST(start_offset // $packCtx AS BIGINT) AS bin_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM o GROUP BY source, start_offset // $packCtx""".stripMargin,

    // the booleans are the assertion: Spark computes the twin-protocol
    // properties in-plan, the oracle requires all-true per vector
    "semdedup" ->
      """SELECT vec_id, TRUE AS twin_same_cell, TRUE AS twin_dropped
        |FROM embeddings""".stripMargin,

    "mixture_resample" -> {
      val wsum = mixWeights.values.sum
      val whens = mixWeights.toSeq.sortBy(_._1).map { case (k, w) =>
        s"WHEN '$k' THEN ${D(w / wsum)}"
      }.mkString(" ")
      s"""WITH c AS (SELECT source, count(*) AS n_dom FROM documents GROUP BY source),
         |t AS (SELECT count(*) AS n_tot FROM documents),
         |r AS (
         |  SELECT source,
         |    CAST(round(least(1.0e0, ${D(mixBudget)} * CAST(n_tot AS DOUBLE) *
         |      (CASE source $whens ELSE NULL END) / CAST(n_dom AS DOUBLE)) *
         |      4294967296.0e0) AS BIGINT) AS thr
         |  FROM c CROSS JOIN t
         |),
         |h AS (SELECT doc_id, source, md5('$sampleSalt:' || CAST(doc_id AS VARCHAR)) AS m
         |      FROM documents),
         |hv AS (SELECT doc_id, source, $hex32Sql AS h32 FROM h)
         |SELECT doc_id, hv.source FROM hv JOIN r ON r.source = hv.source
         |WHERE h32 < thr""".stripMargin
    }
  )
}
