package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistical language modeling for training-data curation:
  * bigram-LM perplexity scoring (the CCNet-style quality filter — Wenzek et
  * al. 2020 filter web text by LM perplexity buckets) and TF-IDF term
  * weighting.
  *
  * Scale shape: the model tables (unigram/bigram counts) are VOCABULARY-
  * bound, not corpus-bound — they aggregate map-side and shuffle only the
  * distinct-gram partials. Scoring streams the corpus once: the exploded
  * gram stream joins the count tables (AQE broadcasts them when measured
  * small; they are orders of magnitude smaller than the corpus) and
  * re-aggregates per document. Nothing here ever moves the corpus through
  * a single partition, and no step is quadratic in anything.
  */
object LangModel {

  /** (tok, c1) unigram counts over the token arrays. */
  def unigramCounts(d: DataFrame, toksCol: String): DataFrame =
    d.select(explode(col(toksCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))

  /** (bigram "w1 w2", c2) adjacent-pair counts; docs shorter than 2 tokens
    * contribute nothing.
    */
  def bigramCounts(d: DataFrame, toksCol: String): DataFrame =
    d.where(size(col(toksCol)) >= 2)
      .select(explode(TextOps.shinglesAll(col(toksCol), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c2"))

  /** Per-document bigram log-likelihood and perplexity under an add-k
    * smoothed bigram model trained on `train` (pass the same frame to
    * self-score a corpus, or a held-out reference corpus for CCNet-style
    * filtering):
    *
    *   P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V)
    *   log_prob = Σ ln P,  ppl = exp(−log_prob / n_bigrams)
    *
    * Unseen grams (scoring ≠ training corpus) fall back to counts of 0 —
    * the smoothing keeps every probability strictly positive. Documents
    * with fewer than 2 tokens emit no row.
    */
  def bigramScore(score: DataFrame, train: DataFrame, idCol: String,
                  toksCol: String, k: Double): DataFrame = {
    val uni = unigramCounts(train, toksCol)
    val big = bigramCounts(train, toksCol)
    // 1-row vocabulary scalar: broadcast, never a shuffle barrier
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val grams = score.where(size(col(toksCol)) >= 2)
      .select(col(idCol),
        explode(TextOps.shinglesAll(col(toksCol), 2)).as("bigram"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    grams
      .join(big, Seq("bigram"), "left")
      .join(uni.withColumnRenamed("tok", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((coalesce(col("c2"), lit(0L)) + k) /
          (coalesce(col("c1"), lit(0L)) + lit(k) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("logp").as("log_prob"))
      .withColumn("ppl", exp(-col("log_prob") / col("n_bigrams")))
  }

  /** DSIR-style data-selection importance weights (Xie et al. 2023, which
    * uses hashed-n-gram LM ratios): every document scored under TWO add-k
    * bigram models — one trained on the target domain, one on the full
    * corpus — and weighted by the per-gram-normalized likelihood ratio
    *
    *   log_ratio = (logP_target − logP_corpus) / n_bigrams
    *   weight    = exp(log_ratio)
    *
    * In-domain documents get weight ≳ 1, out-of-domain ones decay toward
    * 0 (the smoothing floor keeps unseen grams finite). Two streamed
    * scoring passes; both model tables stay vocabulary-bound.
    */
  def importanceWeights(all: DataFrame, target: DataFrame, idCol: String,
                        toksCol: String, k: Double): DataFrame = {
    val t = bigramScore(all, target, idCol, toksCol, k)
      .select(col(idCol), col("n_bigrams"), col("log_prob").as("__lp_t"))
    val c = bigramScore(all, all, idCol, toksCol, k)
      .select(col(idCol), col("log_prob").as("__lp_c"))
    t.join(c, Seq(idCol))
      .withColumn("log_ratio",
        (col("__lp_t") - col("__lp_c")) / col("n_bigrams"))
      .withColumn("weight", exp(col("log_ratio")))
      .drop("__lp_t", "__lp_c")
  }

  /** (id, term, tf, df, tfidf) with smooth idf (sklearn's formulation):
    * idf = ln((1+N)/(1+df)) + 1. N counts ALL documents of the corpus
    * frame (including empty ones) via a 1-row broadcast aggregate — no
    * caller-supplied total needed.
    */
  def tfidf(d: DataFrame, idCol: String, toksCol: String): DataFrame = {
    val tf = d.select(col(idCol), explode(col(toksCol)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // 1-row corpus-size scalar
    val n = d.agg(count(lit(1)).as("__n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((lit(1.0) + col("__n")) / (lit(1.0) + col("df"))) + 1.0))
      .drop("__n")
  }

  /** BM25 document retrieval (Robertson; Lucene's +1-inside-the-log idf so
    * every weight stays positive) for a SMALL literal query set:
    *
    *   idf(t)  = ln(1 + (N − df + 0.5) / (df + 0.5))
    *   w(t, d) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avglen))
    *
    * Scale shape: the `isin(query terms)` filter lands in the token
    * explode — only candidate postings survive the map side; df and the
    * query list are term-bound broadcasts. The top-k is TWO window
    * stages: a per-(query, input-partition) prune bounds the final
    * per-query sort to (#partitions·k) rows, so a query hitting a common
    * term never funnels its full posting list through one task. The
    * prune is exact (any true top-k row ranks ≤ k inside its own
    * partition too), so the pid's nondeterminism can't change results.
    */
  def bm25TopK(d: DataFrame, idCol: String, toksCol: String,
               queries: Seq[(Int, String)], k: Int,
               quantize: Column => Column,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = d.sparkSession
    import spark.implicits._
    val qterms = queries.flatMap { case (qid, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.map(qid -> _)
    }
    val qdf = qterms.toDF("query_id", "term")
    val termSet = qterms.map(_._2).distinct
    val lens = d.select(col(idCol), size(col(toksCol)).as("len"))
    val stats = lens.agg(count(lit(1)).as("__n"), avg("len").as("__avg"))
    val tf = d.select(col(idCol), explode(col(toksCol)).as("term"))
      .where(col("term").isin(termSet: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qdf), Seq("term"))
      .join(broadcast(df_), Seq("term"))
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("w",
        log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("__avg"))))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum("w").as("score"))
      .withColumn("score", quantize(col("score")))
    val w1 = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(col("score").desc, col(idCol).asc)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .withColumn("__pr", row_number().over(w1)).where(col("__pr") <= k)
      .withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }

  /** Multinomial naive-Bayes with add-1 smoothing, trained on the corpus's
    * own labels (the lightweight quality/domain-classifier shape):
    *
    *   score(c, d) = ln P(c) + Σ_t tf·ln((c_{t,c}+1)/(tot_c+V))
    *
    * Rearranged so the corpus never joins the full class-term matrix:
    *   score = ln P(c) + len_d·ln(1/(tot_c+V)) + Σ_{t: c_{t,c}>0} tf·ln(c_{t,c}+1)
    * — the unseen-term mass rides the per-class scalar `logp_miss`, and
    * only PRESENT (doc-term × class) postings join (bounded by |classes|
    * per posting). The class-term counts are model-bound (vocab ×
    * classes), not corpus-bound. Prediction quantizes scores before the
    * per-doc argmax (label-ascending tie-break) so ranking is
    * engine-reproducible.
    */
  def nbPredict(d: DataFrame, idCol: String, toksCol: String,
                labelCol: String, quantize: Column => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE explode pass over the corpus: the (doc, term, tf) table is the
    // only token-stream aggregation and is persisted — the class-term
    // matrix, the vocabulary and the scoring join all fold down from this
    // layout (tf already collapsed per doc, so the (label, term) shuffle
    // moves distinct doc-term rows, not raw tokens). Without the persist
    // the four consumers re-explode the corpus four times.
    // Cache lifecycle is deliberately left to the session (same stance as
    // TripleBarrier's p1): the returned frame is LAZY and still reads
    // docTf/ct when the caller finally acts, so an eager unpersist here
    // would silently recompute the explode pass; Spark's ContextCleaner
    // reclaims the blocks once the returned plan is garbage-collected.
    val docTf = d.select(col(idCol), col(labelCol).as("__lab"),
        explode(col(toksCol)).as("term"))
      .groupBy(col(idCol), col("__lab"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(graft.Conf.storageLevel)
    // model-bound (vocab × classes) — persisted so tot / vocab / the
    // scoring join don't each re-aggregate the doc-term layout
    // the class dimension is named __cls internally so a labelCol named
    // "label" — the most natural name — can't collide in the crossJoin
    val ct = docTf.groupBy(col("__lab").as("__cls"), col("term"))
      .agg(sum(col("tf")).as("c"))
      .persist(graft.Conf.storageLevel)
    val tot = ct.groupBy("__cls").agg(sum("c").as("tot"))
    val vocab = ct.select("term").distinct().agg(count(lit(1)).as("__v"))
    val n = d.agg(count(lit(1)).as("__n"))
    val meta = d.groupBy(col(labelCol).as("__cls")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(n)).join(tot, Seq("__cls"))
      .crossJoin(broadcast(vocab))
      .select(col("__cls"),
        log(col("nd") / col("__n")).as("log_prior"),
        log(lit(1.0) / (col("tot") + col("__v"))).as("logp_miss"))
    val adj = docTf.drop("__lab").join(ct, Seq("term"))
      .groupBy(col(idCol), col("__cls"))
      .agg(sum(col("tf") * log(col("c") + 1.0)).as("adj"))
    val scores = d.select(col(idCol), col(labelCol), size(col(toksCol)).as("len"))
      .crossJoin(broadcast(meta))
      .join(adj, Seq(idCol, "__cls"), "left")
      .withColumn("score", quantize(col("log_prior") +
        col("len") * col("logp_miss") + coalesce(col("adj"), lit(0.0))))
    scores
      .withColumn("__rn", row_number().over(Window.partitionBy(col(idCol))
        .orderBy(col("score").desc, col("__cls").asc)))
      .where(col("__rn") === 1)
      .select(col(idCol), col(labelCol), col("__cls").as("pred_label"),
        col("score"))
  }

  /** Top-k terms per document by quantized tf-idf (rounded BEFORE ranking
    * so rank ties are engine-reproducible), ties broken by term ascending.
    * The rank window partitions by document — shuffle-parallel.
    */
  def tfidfTopK(d: DataFrame, idCol: String, toksCol: String, k: Int,
                quantize: Column => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    tfidf(d, idCol, toksCol)
      .withColumn("tfidf", quantize(col("tfidf")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
