package graft.queries

import graft.Tables
import graft.text.{Bpe, LangModel, TextOps}
import org.apache.spark.sql.functions._
import Q._

/** Statistical language-model operators over `documents`: bigram-LM
  * perplexity scoring (the CCNet-style quality filter), TF-IDF term
  * weighting, and distributed BPE merge training. Every gate's DuckDB
  * oracle replays the exact algorithm, including the BPE driver loop
  * (unrolled as chained CTE iterations).
  */
object LmQueries {

  private val lmK = 0.5 // add-k smoothing
  private val tfidfTop = 3
  private val bpeMerges = 5

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)

  private def withToks(d: org.apache.spark.sql.DataFrame) =
    d.withColumn("toks", TextOps.wsTokens(col("text")))

  val queries: Map[String, QueryFn] = Map[String, QueryFn](
    // Per-doc perplexity under the corpus's own add-k bigram model — the
    // CCNet-style filter signal (docs whose ppl is an outlier vs the
    // corpus get dropped/bucketed downstream).
    "lm_perplexity" -> ((s, dir) => {
      val d = withToks(docs(s, dir))
      LangModel.bigramScore(d, d, "doc_id", "toks", lmK)
        .select(col("doc_id"), col("n_bigrams"),
          r6(col("log_prob")).as("log_prob"), r6(col("ppl")).as("ppl"))
    }),

    // Top-3 TF-IDF terms per doc (smooth idf), rank ties broken by term.
    "tfidf_topk" -> ((s, dir) =>
      LangModel.tfidfTopK(withToks(docs(s, dir)), "doc_id", "toks",
          tfidfTop, r6)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          col("df"), col("tfidf"))),

    // First 5 BPE merges over the corpus word vocabulary — merge order,
    // pair identity and weighted frequency all hash-checked against the
    // oracle's unrolled iteration chain.
    "bpe_merges" -> ((s, dir) => {
      val vocab = Bpe.wordVocab(withToks(docs(s, dir)), "toks")
      val ms = Bpe.train(vocab, bpeMerges)
      s.createDataFrame(ms)
        .select(col("step"), col("left").as("l"), col("right").as("r"),
          concat(col("left"), col("right")).as("merged"), col("freq"))
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, text,
      |         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents
      |)""".stripMargin

  /** One BPE iteration: pair counts over v{i-1} → argmax b{i} → merged
    * vocabulary v{i}. The fold encodes the symbol list as a chr(1)-joined
    * string (symbols are ^[a-z]+$ — the separator can never collide) and
    * replays the same left-to-right non-overlapping merge as
    * [[graft.text.Bpe.applyMerge]].
    */
  private def bpeIter(i: Int): String =
    s"""p$i AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS cnt
       |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM v${i - 1})
       |  GROUP BY 1, 2),
       |b$i AS (SELECT l, r, l || r AS m, CAST(cnt AS BIGINT) AS cnt
       |  FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
       |v$i AS (SELECT freq,
       |  string_split(list_reduce(syms, (acc, x) ->
       |    CASE WHEN list_last(string_split(acc, chr(1))) = b.l AND x = b.r
       |         THEN substr(acc, 1, len(acc) - len(list_last(string_split(acc, chr(1))))) || b.m
       |         ELSE acc || chr(1) || x END), chr(1)) AS syms
       |  FROM v${i - 1} CROSS JOIN b$i b)""".stripMargin

  val oracles: Map[String, String] = Map(
    "lm_perplexity" ->
      s"""WITH $toksCte,
         |uni AS (SELECT t AS tok, CAST(count(*) AS BIGINT) AS c1
         |        FROM (SELECT unnest(toks) AS t FROM toks) GROUP BY t),
         |vv AS (SELECT count(*) AS v FROM uni),
         |bg AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS bigram
         |       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |             FROM toks WHERE len(toks) >= 2)),
         |bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY bigram),
         |sc AS (SELECT doc_id,
         |         ln((bc.c2 + ${D(lmK)}) / (uni.c1 + ${D(lmK)} * vv.v)) AS logp
         |       FROM bg JOIN bc USING (bigram)
         |       JOIN uni ON uni.tok = bg.w1 CROSS JOIN vv)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  ${rd("sum(logp)")} AS log_prob,
         |  ${rd("exp(-sum(logp) / count(*))")} AS ppl
         |FROM sc GROUP BY doc_id""".stripMargin,

    "tfidf_topk" ->
      s"""WITH $toksCte,
         |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
         |       FROM (SELECT doc_id, unnest(toks) AS t FROM toks) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |nn AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT doc_id, term, tf, df,
         |         ${rd("tf * (ln((1.0 + n) / (1.0 + df)) + 1.0)")} AS tfidf
         |       FROM tf JOIN df USING (term) CROSS JOIN nn),
         |rk AS (SELECT *, row_number() OVER (
         |         PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM sc)
         |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, tfidf
         |FROM rk WHERE rank <= $tfidfTop""".stripMargin,

    "bpe_merges" -> {
      val iters = (1 to bpeMerges).map(bpeIter).mkString(",\n")
      val out = (1 to bpeMerges)
        .map(i => s"SELECT $i AS step, l, r, m AS merged, cnt AS freq FROM b$i")
        .mkString("\nUNION ALL ")
      s"""WITH $toksCte,
         |wv AS (SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
         |       FROM (SELECT unnest(toks) AS t FROM toks)
         |       WHERE regexp_matches(t, '^[a-z]+$$') GROUP BY t),
         |v0 AS (SELECT freq, regexp_extract_all(word, '.') AS syms FROM wv),
         |$iters
         |SELECT CAST(step AS INT) AS step, l, r, merged, freq FROM (
         |$out
         |)""".stripMargin
    }
  )
}
