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

  /** (id, term, tf, df, tfidf) with smooth idf (sklearn's formulation):
    * idf = ln((1+N)/(1+df)) + 1. `nDocs` should count ALL documents of the
    * corpus frame (including empty ones), which the caller knows without
    * another pass — pass `d.count()` or a cheaper known total.
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
