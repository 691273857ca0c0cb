package graft.streaming

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the dedup operators (`dedup/Dedup.scala`): drop exact
  * copies and surface near-dup CANDIDATES as documents arrive, instead of a
  * batch sweep after landing — the ingest-time shape of a 100 TB
  * training-data pipeline (the batch operators remain the backfill/repair
  * path over what was stored).
  *
  * Scale shape: the exact twin's state is one row per distinct content hash
  * inside the watermark window (Spark expires it); the LSH twin's state is
  * capped at `maxBucket` doc ids per band bucket with an optional idle TTL.
  * Nothing here buffers the document text in state — hashes and ids only.
  */
object StreamingDedup {

  /** Exact-dedup at ingest: the first document with a given normalized
    * content hash passes, later copies arriving within the watermark delay
    * are dropped (`dropDuplicatesWithinWatermark` — state expires once the
    * watermark passes a hash's last admissible late arrival). Uses the SAME
    * `Dedup.normalized` + md5 content key as the batch `exactDupAnnotate`,
    * so stream-passed and batch-canonical documents agree.
    *
    * DOCUMENTED DEVIATION from the batch operator: batch keep-first picks
    * the MIN doc id of a duplicate group; the stream keeps the FIRST
    * ARRIVAL (and cannot see duplicates farther apart than the delay —
    * that long tail is the batch backfill's job).
    */
  def exactDedupStream(docs: DataFrame, textCol: String,
                       eventTimeCol: String, delay: String): DataFrame =
    docs
      .withColumn("__content_md5", md5(Dedup.normalized(col(textCol))))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__content_md5")
      .drop("__content_md5")

  /** Per-ROW minhash band keys: k universal-hash permutations over the
    * word-n-gram shingle set, min per permutation, r-wide bands combined
    * with md5 — the permutation constants, shingle hash and band-key
    * encoding are IDENTICAL to the batch `Dedup.lshCandidates`, so a
    * stream-computed bucket equals the batch bucket for the same text
    * (StreamingDedupSpec/PropertySpec pin this equality). Stateless and
    * shuffle-free: the k·|shingles| work rides the row, which is what
    * makes it streamable — and it runs as the native codegen'd
    * [[graft.functions.MinhashBuckets]] expression (one generated loop
    * instead of k interpreted `transform` traversals). Returns an array of
    * "band:band_key" bucket strings; docs shorter than n tokens band via
    * their degenerate whole-text shingle, exactly like the batch twin.
    */
  def minhashBuckets(toks: Column, shingleN: Int, k: Int, bands: Int): Column =
    graft.functions.MinhashBuckets.minhashBucketsExpr(
      TextOps.shingles(toks, shingleN), k, bands)

  case class BandedDoc(bucket: String, docId: Long)
  case class CandidatePair(id_a: Long, id_b: Long, bucket: String)
  case class BucketState(ids: List[Long])

  /** Near-dup candidate ALERTS: each arriving doc pairs with the documents
    * already remembered in its band bucket. State per bucket is a
    * doc-id list capped at `maxBucket`; a saturated bucket stops pairing
    * AND stops growing — the streaming face of the batch mega-bucket cap
    * (non-discriminative boilerplate must not emit O(m²) pairs).
    * `idleTimeoutMs > 0` expires buckets idle that long (processing time).
    *
    * DOCUMENTED DEVIATIONS from batch `lshCandidates`: (1) the batch cap
    * drops an over-size bucket retroactively; a stream cannot retract, so
    * the cap here is prefix-based — the first `maxBucket` members pair.
    * (2) batch dedups pairs across bands with one `distinct()`; the stream
    * may re-emit a pair through a second shared band — downstream
    * verification (`Dedup.jaccardVerify`) is idempotent, and candidate
    * consumers must tolerate at-least-once anyway.
    */
  def lshCandidateStream(banded: Dataset[BandedDoc], maxBucket: Int,
                         idleTimeoutMs: Long = -1L): Dataset[CandidatePair] = {
    import banded.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (bucket: String, rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // ids is newest-first; membership checks are O(|bucket|) with
            // |bucket| <= maxBucket by construction
            var ids = state.getOption.map(_.ids).getOrElse(Nil)
            val out = Seq.newBuilder[CandidatePair]
            rows.toSeq.sortBy(_.docId).foreach { r =>
              if (!ids.contains(r.docId) && ids.size < maxBucket) {
                ids.foreach { ex =>
                  out += CandidatePair(math.min(ex, r.docId),
                    math.max(ex, r.docId), bucket)
                }
                ids = r.docId :: ids
              }
            }
            state.update(BucketState(ids))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.result().iterator
          }
      }
  }
}
