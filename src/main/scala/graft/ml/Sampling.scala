package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling for training-data pipelines.
  *
  * Selection is a PURE FUNCTION of (salt, id): a 32-bit hash from md5,
  * compared against integer thresholds precomputed from the requested
  * rates. No RNG state, no partition-order sensitivity, no float
  * comparison anywhere in the plan — the same row lands in the same
  * sample/split on any engine, any cluster size, any rerun, and the
  * DuckDB oracles reproduce selections bit-for-bit (md5 is the
  * cross-engine hash primitive, as everywhere in this library).
  *
  * This is how production pipelines do train/test splits and downsampling
  * at 100 TB: `sample(fraction)`-style RNG sampling is irreproducible
  * across retries/re-partitions, while hash-gating is embarrassingly
  * parallel (a pure map-side predicate — no shuffle, pushes past column
  * pruning) and STABLE under incremental reruns: yesterday's rows keep
  * yesterday's split when new data arrives.
  *
  * Reference scope note: the reference has no sampling surface; this is
  * pipeline-scale surface like the dedup family (SURVEY §north-star).
  */
object Sampling {

  /** Uniform 32-bit hash of (salt, id): first 8 hex chars of
    * md5("salt:id") as a long in [0, 2³²).
    */
  def hash32(id: Column, salt: String): Column =
    conv(substring(md5(concat_ws(":", lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  private def threshold(rate: Double): Long = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    math.round(rate * 4294967296.0)
  }

  /** Keep each stratum at its own rate: row kept iff
    * hash32 < round(rate(stratum)·2³²). Strata absent from `rates` are
    * dropped entirely. One map-side predicate — no shuffle, no action.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], salt: String): DataFrame = {
    val h = hash32(col(idCol), salt)
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(null).cast("long")) {
      case (acc, (k, r)) =>
        when(col(stratumCol).cast("string") === k, lit(threshold(r))).otherwise(acc)
    }
    df.where(h < thr)
  }

  /** Assign every row to exactly one named split by cumulative hash
    * thresholds (e.g. train 0.8 / val 0.1 / test 0.1 — fractions must sum
    * to 1). Adds a `split` column; pure map-side.
    */
  def splitAssign(df: DataFrame, idCol: String, salt: String,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val h = hash32(col(idCol), salt)
    val cum = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // last split takes everything below 2^32 so rounding never drops a row
    val expr = fractions.map(_._1).zip(cum).reverse match {
      case (lastName, _) :: rest =>
        rest.foldLeft(lit(lastName)) { case (acc, (name, c)) =>
          when(h < lit(threshold(c)), lit(name)).otherwise(acc)
        }
      case Nil => throw new IllegalArgumentException("unreachable")
    }
    df.withColumn("split", expr)
  }

  /** Per-class mean embedding (class prototypes — the first step of
    * SemDeDup-style semantic dedup and of nearest-class-mean classifiers),
    * in long form: one row per (label, dim). posexplode → partial-agg mean
    * per (label, dim) — one shuffle of nlabels×dim cells regardless of
    * corpus size; map-side combine does the heavy summation.
    */
  def classCentroids(emb: DataFrame, vecCol: String, labelCol: String): DataFrame =
    emb.select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(avg(col("v")).as("mean"), count(lit(1)).as("n"))

  /** Domain-mixture resampling: hash-gated per-domain keep rates that move
    * the corpus toward target domain `weights` within a total budget of
    * `budgetFrac`·N rows — rate(d) = min(1, budgetFrac·N·w(d)/n(d)) with
    * w normalized over the given weights. The rate table is |domains| rows
    * (one groupBy) broadcast back; selection itself is the same pure
    * (salt, id)-hash predicate as [[stratifiedSample]] — deterministic,
    * engine-reproducible, stable under incremental reruns. Domains absent
    * from `weights` get a NULL threshold and are dropped entirely.
    * Oversampling is NOT performed: a domain whose target exceeds its
    * supply caps at rate 1 (the DoReMi/SlimPajama-style down-only mix).
    */
  def mixtureResample(df: DataFrame, idCol: String, domainCol: String,
                      weights: Map[String, Double], budgetFrac: Double,
                      salt: String): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac must be in (0,1]")
    val wsum = weights.values.sum
    // the rate table is bounded by the LITERAL weights map (domains are
    // crawl sources, not data), so it computes driver-side: one scalar
    // count + one |weights|-row collect, and the selection itself stays a
    // pure map-side predicate — no join in the output plan at any scale
    val total = df.count().toDouble
    val counts = df.groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .where(col("__d").isin(weights.keys.toSeq: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val thr = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) { case (acc, (k, w)) =>
        counts.get(k) match {
          case Some(n) =>
            // identical IEEE op order to the oracle SQL:
            // ((budgetFrac · N) · wnorm) / n, then round-half-up
            val rate = math.min(1.0, budgetFrac * total * (w / wsum) / n)
            when(col(domainCol).cast("string") === k,
              lit(threshold(rate))).otherwise(acc)
          case None => acc
        }
      }
    df.where(hash32(col(idCol), salt) < thr)
  }

  /** Deterministic corpus shuffle + sharding — the "global shuffle" every
    * pretraining run needs, as a pure function of (salt, id): shard =
    * h % nShards, position within the shard = rank of (h, id). Identical
    * on any engine, any cluster size, any rerun, and stable under
    * re-partitioning of the input. The position window partitions by
    * shard — parallelism = nShards (pick ≥ cluster cores at scale); no
    * global order is ever materialized.
    */
  def shuffleShards(df: DataFrame, idCol: String, salt: String,
                    nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", hash32(col(idCol), salt))
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("__h")
  }
}
