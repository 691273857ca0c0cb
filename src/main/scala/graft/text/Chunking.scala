package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence preparation: fixed-window document chunking and
  * contiguous context-window packing — the step between a cleaned corpus
  * and a tokenized training shard.
  *
  * Both are pure column algebra: chunking is a per-row explode (no
  * shuffle at all — it widens inside the scan stage), packing is one
  * window over the shard key. Neither ever materializes token text beyond
  * the row it came from.
  */
object Chunking {

  /** Overlapping fixed-size token windows per document: starts at
    * 0, stride, 2·stride, … while start < |toks| (the final chunk may be
    * short — standard LM-pretraining chunking). Emits (idCol, chunk_idx,
    * chunk_start, n_chunk_tokens, chunk_md5). `toksCol` must be a plain
    * attribute (positional-lambda capture, see TextOps.charNgrams).
    */
  def chunks(d: DataFrame, idCol: String, toksCol: String,
             chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val toks = col(toksCol)
    val starts = when(size(toks) > 0,
      sequence(lit(0), size(toks) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    d.select(col(idCol), toks.as("__t"),
        posexplode(starts).as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        slice(col("__t"), col("chunk_start") + 1, lit(chunkSize)).as("__c"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__c"))).as("chunk_md5"))
  }

  /** Contiguous context-window packing offsets: within each shard
    * (`partCols` — e.g. source/crawl), documents in `idCol` order fill a
    * stream of ctx-token windows; each doc is assigned the window its
    * FIRST token lands in. Emits (partCols…, idCol, n_tokens,
    * start_offset, bin_id).
    *
    * The window partitions by the shard key, so parallelism is |shards| —
    * the production shape (packing is inherently sequential WITHIN a
    * shard; a global unkeyed pack would be a single-partition sweep and
    * belongs on Scan.affine instead).
    */
  def packOffsets(d: DataFrame, idCol: String, nTokCol: String,
                  partCols: Seq[String], ctx: Int): DataFrame = {
    require(partCols.nonEmpty,
      "packing is per-shard: pass the shard key (unkeyed packing belongs on Scan.affine)")
    require(ctx > 0, "ctx must be positive")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(idCol)
    d.select(partCols.map(col) :+ col(idCol) :+
        col(nTokCol).cast("long").as("n_tokens"): _*)
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // integer DIV, not `/` (double division loses exactness past 2^53
      // total tokens — a real number at corpus scale)
      .withColumn("bin_id", expr(s"start_offset DIV $ctx"))
  }

  /** Per-bin fill statistics over [[packOffsets]] output: how many docs
    * start in each ctx window and how many tokens they contribute — the
    * packing-efficiency report (bins with n_tokens ≪ ctx are padding
    * waste; ≫ ctx means docs straddle windows).
    */
  def packBins(offsets: DataFrame, partCols: Seq[String]): DataFrame =
    offsets.groupBy((partCols :+ "bin_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
