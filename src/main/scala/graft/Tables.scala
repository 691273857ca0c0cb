package graft

import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * `events.ts` arrives in one of two parquet encodings across driver
  * generations — TIMESTAMP(NANOS) (readable only as a raw ns long via
  * `spark.sql.legacy.parquet.nanosAsLong`) or TIMESTAMP(MICROS) (a Spark
  * timestamp) — and fixture re-writes store it as a plain ns long. All
  * three normalize here to `Long` ns since epoch, the engine's canonical
  * timestamp type (see SURVEY.md §1.2, mirroring the reference's int64-ns
  * convention at finmlkit/bar/data_model.py:346-368). The DuckDB oracles'
  * `epoch_ns(ts)` agrees with every encoding at µs granularity, which is
  * why the canonical trades view quantizes ts to µs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events(event_id L, ts L(ns), user_id L, event_type S, value D, props S) */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) via nanosAsLong, or a fixture's ns long
      case _ => // TIMESTAMP(MICROS): µs instants (UTC session tz) → ns longs
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
