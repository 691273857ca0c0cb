package graft

import graft.text.{Bpe, LangModel, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the language-model operators: BPE merge
  * training (classic low/lower/newest/widest vocabulary from Sennrich et
  * al. 2016 §3), the merge fold's left-to-right non-overlap semantics,
  * add-k bigram perplexity, and TF-IDF ranking.
  */
class LmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("bpe merge fold is left-to-right non-overlapping") {
    val out = Seq(Tuple1(Seq("a", "a", "a", "a", "a"))).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(out === Seq("aa", "aa", "a"))
    // merged symbol is not re-examined within the pass
    val out2 = Seq(Tuple1(Seq("a", "b", "b"))).toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[Seq[String]].head()
    assert(out2 === Seq("ab", "b"))
  }

  test("bpe trains the classic vocabulary in frequency order") {
    // Sennrich's example shape: es (6+3=9) wins first, then est (9),
    // then lo (5+2=7) ...
    val vocab = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val ms = Bpe.train(vocab, 4)
    assert(ms.map(m => (m.left, m.right, m.freq)) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L), ("lo", "w", 7L)))
    assert(ms.map(_.step) === Seq(1, 2, 3, 4))
  }

  test("bpe train stops when no pairs remain") {
    val vocab = Seq(("ab", 3L)).toDF("word", "freq")
    val ms = Bpe.train(vocab, 5)
    // "ab" → one merge (a,b), then single-symbol words have no pairs
    assert(ms.map(m => (m.left, m.right, m.freq)) === Seq(("a", "b", 3L)))
  }

  test("bigram perplexity matches the hand computation") {
    // corpus: "a b a b" and "a b" — bigrams: (a b)×3, (b a)×1
    // unigrams: a×3, b×3; V=2; k=0.5
    // P(b|a) = (3+.5)/(3+1) = 0.875 ; P(a|b) = (1+.5)/(3+1) = 0.375
    val d = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
      .withColumn("toks", TextOps.wsTokens(col("text")))
    val rows = LangModel.bigramScore(d, d, "doc_id", "toks", 0.5)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "log_prob", "ppl")
      .as[(Long, Long, Double, Double)].collect()
    val lpb = math.log(0.875); val lpa = math.log(0.375)
    assert(rows(0)._1 === 1L && rows(0)._2 === 3L)
    assert(math.abs(rows(0)._3 - (2 * lpb + lpa)) < 1e-12)
    assert(math.abs(rows(0)._4 - math.exp(-(2 * lpb + lpa) / 3)) < 1e-12)
    assert(rows(1)._2 === 1L)
    assert(math.abs(rows(1)._3 - lpb) < 1e-12)
  }

  test("tfidf ranks the distinguishing term first") {
    // "x" appears in every doc (df=3 → smooth idf = ln(4/4)+1 = 1);
    // "y" only in doc 1 (df=1 → idf = ln(4/2)+1)
    val d = Seq((1L, "x y y"), (2L, "x"), (3L, "x"))
      .toDF("doc_id", "text")
      .withColumn("toks", TextOps.wsTokens(col("text")))
    val top = LangModel.tfidfTopK(d, "doc_id", "toks", 1, identity)
      .where(col("doc_id") === 1)
      .select("term", "tf", "df", "tfidf")
      .as[(String, Long, Long, Double)].head()
    assert(top._1 === "y" && top._2 === 2L && top._3 === 1L)
    assert(math.abs(top._4 - 2 * (math.log(2.0) + 1)) < 1e-12)
    // doc 2's only term is x with tfidf exactly 1.0
    val x2 = LangModel.tfidf(d, "doc_id", "toks")
      .where(col("doc_id") === 2).select("tfidf").as[Double].head()
    assert(math.abs(x2 - 1.0) < 1e-12)
  }
}
