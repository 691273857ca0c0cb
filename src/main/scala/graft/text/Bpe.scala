package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (Sennrich et al. 2016) —
  * the count-heavy half of tokenizer training, as a Spark aggregation loop.
  *
  * The classic scale trick: BPE statistics depend only on the WORD
  * VOCABULARY with frequencies, not the corpus — so the corpus-sized work
  * is one map-side-combined groupBy producing the (word, freq) table, and
  * every merge iteration after that runs on a vocabulary-bound frame
  * (≤ a few million rows for web-scale corpora — pennies next to 100 TB).
  * Each iteration is: re-segment under the merges-so-far (one flat native
  * expression carrying the rank table — [[graft.functions.BpeSegmentExpr]]) →
  * adjacent-pair weighted count (one small shuffle) → argmax to the driver
  * (ONE row — bounded by construction). Nothing corpus-scale moves after
  * the vocab build, and plan depth is constant in the merge count.
  */
object Bpe {

  case class Merge(step: Int, left: String, right: String, freq: Long)

  /** (word, freq) vocabulary over lower-cased alphabetic tokens. The
    * `^[a-z]+$` filter keeps the symbol alphabet closed under
    * concatenation (no whitespace/control chars inside symbols).
    */
  def wordVocab(d: DataFrame, toksCol: String): DataFrame =
    d.select(explode(col(toksCol)).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial segmentation: one symbol per character. */
  def charSyms(word: Column): Column =
    regexp_extract_all(word, lit("."), lit(0))

  /** Adjacent symbol pairs of one row's `syms`, as (l, r) structs. */
  private def adjacentPairs(syms: Column): Column = {
    val s = size(syms) - 1
    transform(arrays_zip(slice(syms, lit(1), s).as("l"), slice(syms, lit(2), s).as("r")),
      e => struct(e.getField("l").as("l"), e.getField("r").as("r")))
  }

  /** Weighted adjacent-pair counts over a (freq, symsCol) frame. */
  def pairCounts(vocab: DataFrame, symsCol: String): DataFrame =
    vocab.where(size(col(symsCol)) >= 2)
      .select(col("freq"), explode(adjacentPairs(col(symsCol))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("freq"))

  /** One left-to-right, non-overlapping merge pass of (l, r) → l+r over a
    * symbol array, as a pure fold expression: append, or replace the last
    * accumulated symbol when (last, current) matches the pair. A symbol
    * produced by a merge is never re-examined within the same pass —
    * exactly the replace semantics of reference BPE trainers.
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(get(acc, size(acc) - 1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Segment the vocabulary under an ordered merge list: the per-word
    * symbol array after applying every merge in training order, as ONE
    * native expression carrying the merge-rank table as an executor-side
    * reference object ([[graft.functions.BpeSegmentExpr]]) — plan depth
    * and per-row cost are independent of the merge count, so a production
    * 30k-merge tokenizer segments with the same 1-node plan as a 5-merge
    * demo. Result-identical to chaining [[applyMerge]] folds in training
    * order (the r6 implementation, kept as [[segmentFold]] for the
    * PropertySpec equivalence pin).
    */
  def segment(vocab: DataFrame, merges: Seq[Merge]): DataFrame =
    vocab.select(col("word"),
      graft.functions.BpeSegmentExpr
        .bpeSegmentExpr(col("word"), merges.map(m => (m.left, m.right)))
        .as("syms"))

  /** Interpreted twin of [[segment]]: the sequential per-merge fold chain.
    * O(merges) plan depth — test/oracle shape only; [[segment]] is the
    * library path.
    */
  private[graft] def segmentFold(vocab: DataFrame, merges: Seq[Merge]): DataFrame = {
    val syms = merges.foldLeft(charSyms(col("word"))) { (c, m) =>
      applyMerge(c, m.left, m.right)
    }
    vocab.select(col("word"), syms.as("syms"))
  }

  /** Encode documents under a trained segmentation: BPE statistics are
    * per-WORD, so encoding is an equi-join of the token stream against
    * the vocabulary segmentation — the corpus streams once, nothing
    * re-runs the merge fold per token. No forced broadcast: the
    * segmentation is vocab-bound (sublinear but unbounded — a web-scale
    * corpus's word vocab runs to 10⁸⁺ rows), so AQE broadcasts it while
    * its measured size fits and degrades to a shuffle hash join on
    * `word` when it doesn't. Words outside the trained vocabulary pass
    * through as a single symbol. Emits per-doc symbol count and an
    * order-exact digest of the segmented text.
    */
  def encode(d: DataFrame, idCol: String, toksCol: String,
             segs: DataFrame): DataFrame =
    d.select(col(idCol), posexplode(col(toksCol)).as(Seq("pos", "word")))
      .join(segs, Seq("word"), "left")
      .withColumn("syms", coalesce(col("syms"), array(col("word"))))
      .groupBy(col(idCol))
      .agg(sum(size(col("syms"))).as("n_syms"),
        md5(concat_ws(" ",
          flatten(transform(
            array_sort(collect_list(struct(col("pos"), col("syms")))),
            e => e.getField("syms"))))).as("seg_md5"))

  /** Train `nMerges` merges. Ties break deterministically by (freq desc,
    * l asc, r asc). Each iteration's argmax is a ONE-row collect; the
    * vocab frame is persisted once and each iteration re-segments it
    * under the merges-so-far via the flat [[graft.functions.BpeSegmentExpr]]
    * rank table — per-iteration work is O(vocab · word²) row time plus one
    * vocab-bound shuffle, with CONSTANT plan depth, so 500- or 30k-merge
    * training analyzes the same 3-node plan every step (the r6 fold chain
    * re-evaluated k folds at step k: O(k²·vocab) total and a growing
    * Catalyst tree).
    */
  def train(vocab: DataFrame, nMerges: Int): Seq[Merge] = {
    // VOCAB-BOUND parallelism for the merge loop: the per-iteration frames
    // are vocabulary-sized, so running them at the session's corpus-scale
    // partitioning buys nothing and charges task-scheduling overhead per
    // iteration × per partition — measured 3.3× END-TO-END SLOWDOWN at 32
    // vs 8 cores for 1000 merges on a 4.7k-word vocab before this pin
    // (SYM_SCALING doc_scaling lines). One partition per ~500k vocab rows,
    // capped at the cluster's parallelism: a 10⁸-word web vocab still fans
    // out, a demo vocab runs 1-2 tasks per stage.
    val raw = vocab.select("freq", "word").persist()
    val nWords = raw.count()
    val parts = math.max(1, math.min(
      raw.sparkSession.sparkContext.defaultParallelism,
      ((nWords + 499999L) / 500000L).toInt))
    val base = raw.repartition(parts).persist()
    // materialize base from raw's cache, then drop raw — holding both for
    // the whole merge loop would double the vocab's cache footprint
    base.count()
    raw.unpersist(blocking = false)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var step = 1
      var done = false
      while (step <= nMerges && !done) {
        val seg = graft.functions.BpeSegmentExpr.bpeSegmentExpr(
          col("word"), merges.toSeq.map(m => (m.left, m.right)))
        val top = pairCounts(base.withColumn("syms", seg), "syms")
          .orderBy(col("freq").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val Row(l: String, r: String, f: Long) = top(0)
          merges += Merge(step, l, r, f)
          step += 1
        }
      }
      merges.toSeq
    } finally base.unpersist(blocking = false)
  }
}
