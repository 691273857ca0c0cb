package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication and benchmark decontamination —
  * the token-sequence analogs of document-level dedup, after Lee et al.
  * 2022 ("Deduplicating Training Data Makes Language Models Better") and
  * the GPT-3 appendix's n-gram eval-overlap filter.
  *
  * Both operators ride the same inverted index: one row per (doc,
  * position) full token n-gram, hashed to md5. The index build is one
  * map-side explode (grams never leave their scan task until the groupBy),
  * and the shuffle carries 16-byte hashes, not gram text — at 100 TB the
  * gram index is the dominant intermediate, so its row width matters more
  * than anything else here.
  */
object Substring {

  /** (id, pos, h): positional FULL n-grams, md5-hashed. Docs shorter than
    * n contribute nothing (no truncated tail grams — a span match must be
    * n real tokens). `toksCol` must be a plain attribute (see
    * [[TextOps.shinglesAll]]'s lambda-capture note).
    */
  private def gramRows(d: DataFrame, idCol: String, toksCol: String,
                       n: Int): DataFrame = {
    val toks = col(toksCol)
    val grams = when(size(toks) >= n, TextOps.shinglesAll(toks, n))
      .otherwise(array().cast("array<string>"))
    d.select(col(idCol), posexplode(grams).as(Seq("pos", "g")))
      .select(col(idCol), col("pos"), md5(col("g")).as("h"))
  }

  /** Maximal duplicated-span intervals per document: positions whose
    * n-gram occurs in ≥2 DISTINCT documents, merged into islands
    * ([start, end) token offsets) when they overlap or touch.
    *
    * Plan shape: gram index → groupBy(h) keeps cross-doc hashes (the
    * inverted-index shuffle, partial-agg'd map-side) → left-semi join back
    * (hash-to-hash, AQE-planned) → per-doc island merge under a window
    * PARTITIONED BY doc — parallelism is |docs|, never a single-partition
    * sweep. Returns (idCol, span_start, span_end, span_len).
    */
  def dupSpanIntervals(d: DataFrame, idCol: String, toksCol: String,
                       n: Int): DataFrame = {
    val grams = gramRows(d, idCol, toksCol, n)
    val crossDoc = grams.groupBy("h")
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= 2)
      .select("h")
    val dup = grams.join(crossDoc, Seq("h"), "left_semi")
    val w = Window.partitionBy(idCol).orderBy("pos")
    val prevEnd = max(col("pos") + n)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isl = dup
      .withColumn("__new", when(prevEnd.isNull || col("pos") > prevEnd, 1)
        .otherwise(0))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + n).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
  }

  /** Per-document duplicated-token coverage: fraction of tokens inside
    * some cross-doc duplicated span, plus the keep flag at `maxFrac` (the
    * drop-heavily-duplicated-docs policy). Every input doc gets a row
    * (docs with no duplicated span — or shorter than n — report 0).
    */
  def spanCoverage(d: DataFrame, idCol: String, toksCol: String, n: Int,
                   maxFrac: Double): DataFrame = {
    val spans = dupSpanIntervals(d, idCol, toksCol, n)
      .groupBy(idCol)
      .agg(sum(col("span_len")).as("__dup"), count(lit(1)).as("n_spans"))
    d.select(col(idCol), size(col(toksCol)).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          col("n_dup_tokens").cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .withColumn("keep_substring", col("dup_frac") <= maxFrac)
  }

  /** Benchmark decontamination: for every corpus doc, how many of its
    * distinct n-grams appear anywhere in the benchmark set. A doc with
    * n_overlap > 0 is contaminated (GPT-3 appendix C / PaLM-style n-gram
    * overlap filter).
    *
    * The benchmark side reduces to DISTINCT gram hashes before the join —
    * in production that set is tiny relative to the corpus (eval suites,
    * not crawls), so AQE broadcasts it and the corpus-side gram stream
    * never shuffles; no hint is forced, so a large "benchmark" degrades to
    * a shuffle-hash join instead of an OOM. Returns one row per corpus doc:
    * (idCol, n_grams, n_overlap, contaminated).
    */
  /** One row per (doc, distinct full n-gram): (idCol, h = md5(gram)) —
    * the decontamination probe's unit of comparison, shared by
    * [[contamination]] and the live-pipeline per-batch probe so the gram
    * definition can never drift between the batch and streaming paths.
    */
  def distinctGramHashes(df: DataFrame, idCol: String, toksCol: String,
                         n: Int): DataFrame = {
    val toks = col(toksCol)
    val grams = when(size(toks) >= n,
      array_distinct(TextOps.shinglesAll(toks, n)))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(grams).as("g"))
      .select(col(idCol), md5(col("g")).as("h"))
  }

  /** Positional full-n-gram hashes as an ARRAY column — `xxhash64` over
    * each token SLICE, no string concatenation, no row explosion, no MD5:
    * the cheapest per-gram identity Spark can compute (XxHash64 hashes an
    * array's elements content-wise, and identical token sequences hash
    * identically — the same gram identity as the concat'd-string md5 the
    * exact probe uses, since wsTokens tokens cannot contain the join
    * separator). `toks` must be a plain attribute (lambda-capture rule,
    * see [[TextOps.shinglesAll]]).
    */
  private def gramXxArray(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - n, lit(0)) + 1),
      i => xxhash64(slice(toks, i, lit(n))))

  /** Serialized bloom filter over the xx-gram hashes of a BOUNDED
    * benchmark corpus (eval suites, not crawls). The bytes ride the
    * probing plan as one constant, so [[mightContainGram]] can pre-filter
    * rows in the scan stage without any join. Bits are CAPPED at
    * `maxBits` (default 2²⁶ = 8 MB, Spark's own runtime-bloom-filter
    * default cap): the constant travels in every task binary of every
    * stage that probes it, so an adversarially large "benchmark" trades
    * pre-filter precision (fpp drifts up; false positives just pay the
    * exact probe) for a bounded payload instead of an unbounded one.
    * Built with the public `stat.bloomFilter` so the insert hashing
    * matches `BloomFilterMightContain.mightContainLong`.
    */
  def gramXxBloom(bench: DataFrame, toksCol: String, n: Int,
                  fpp: Double = 0.01, maxBits: Long = 1L << 26): Array[Byte] = {
    val hashes = bench
      .select(explode(gramXxArray(col(toksCol), n)).as("x")).distinct()
      .persist(graft.Conf.storageLevel)
    val cnt = math.max(1L, hashes.count())
    val optimalBits = math.ceil(
      -cnt * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bf = hashes.stat.bloomFilter("x", cnt,
      math.max(64L, math.min(optimalBits, maxBits)))
    hashes.unpersist(blocking = false)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Scan-stage decontamination PRE-FILTER: true iff ANY full n-gram of
    * `toks` (a plain attribute) MIGHT be in the benchmark bloom. False
    * negatives are impossible (a bloom never misses an inserted key), so
    * `!mightContainGram(...)` rows are provably clean and skip the
    * exploded semi-join entirely; false positives just pay the exact
    * probe. One xxhash64 per token slice per gram — no explosion, no
    * shuffle, no digest allocation; the live pipeline's per-batch decon
    * probe drops from corpus-gram-join cost to per-row hashing when (as
    * in production) almost no arriving row overlaps the benchmark.
    */
  def mightContainGram(toks: Column, n: Int, bloom: Array[Byte]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val bloomLit = Literal.create(bloom,
      org.apache.spark.sql.types.BinaryType)
    def mc(v: Column): Column = GraftSqlBridge.column(
      BloomFilterMightContain(bloomLit, GraftSqlBridge.expression(v)))
    size(toks) >= n && exists(gramXxArray(toks, n), h => mc(h))
  }

  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
                    toksCol: String, n: Int): DataFrame = {
    def distinctGrams(df: DataFrame): DataFrame =
      distinctGramHashes(df, idCol, toksCol, n)
    val corpusGrams = distinctGrams(corpus)
    val benchSet = distinctGrams(bench).select("h").distinct()
      .withColumn("__hit", lit(1))
    val agg = corpusGrams.join(benchSet, Seq("h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_overlap"))
    corpus.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }
}
