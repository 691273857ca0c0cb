package graft.sources

import graft.trades.Trades
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingestion connector — the sandbox-portable core of the reference's
  * `binance2h5` pipeline (scripts/binance2h5.py:144-215): positional
  * aggTrades CSV → tolerant typed coercion → canonical trades (ns
  * timestamps via unit inference, side −1 if the buyer was maker else +1,
  * utils.py:297) → id-dedup → month-partitioned store.
  *
  * The download / zip / checksum stages of the script are network-bound
  * scripting with no analytic content; in a Spark deployment the dump files
  * land on shared storage and `spark.read.csv` fans the parse out across
  * the cluster — one task per file split, no driver-side loop.
  */
object Ingest {

  /** The Binance aggTrades positional column contract (binance2h5.py:159). */
  private val aggTradeCols =
    Seq("id", "price", "qty", "quoteQty", "time", "isBuyerMaker", "isBestMatch")

  /** Read one or many aggTrades CSV dumps (glob/dir paths work). Rows that
    * fail numeric coercion — header lines, corrupt records — are dropped,
    * mirroring the reference's `errors='coerce'` + required-column checks.
    */
  def readAggTradesCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "false").csv(path)
    require(raw.columns.length >= 5,
      s"aggTrades CSV needs >= 5 positional columns, got ${raw.columns.length}")
    // surplus columns (trailing commas, vendor extras) get throwaway names
    val names = aggTradeCols ++
      (aggTradeCols.length until raw.columns.length).map(i => s"c$i")
    val named = raw.toDF(names.take(raw.columns.length): _*)
    // no maker flag → side defaults to +1 downstream, matching the
    // reference's is_buyer_maker = False fallback (binance2h5.py:187-189)
    val hasMaker = named.columns.contains("isBuyerMaker")
    named.select(
        expr("try_cast(time AS BIGINT)").as("ts"),
        expr("try_cast(id AS BIGINT)").as("id"),
        expr("try_cast(price AS DOUBLE)").as("price"),
        expr("try_cast(qty AS DOUBLE)").as("qty"),
        (if (hasMaker) lower(coalesce(col("isBuyerMaker"), lit("false")))
          .isin("1", "true", "t", "yes") else lit(false)).as("is_buyer_maker"))
      .where(col("ts").isNotNull && col("id").isNotNull &&
        col("price").isNotNull && col("qty").isNotNull)
  }

  /** CSV rows → canonical trade schema: ns timestamps (unit inferred from
    * magnitude), explicit side, duplicate ids dropped keep-first.
    * `checkHeartbeatBound = true` additionally raises a per-row error on
    * any ts at/above the streaming flush-heartbeat floor (2100-01-01) —
    * see [[graft.trades.Trades.requireBelowHeartbeat]].
    */
  def canonicalize(csvTrades: DataFrame, symbol: Long = 0L,
                   checkHeartbeatBound: Boolean = false): DataFrame = {
    val canon = Trades.dedupIds(Trades.toNanos(
      csvTrades
        .withColumn("side", when(col("is_buyer_maker"), -1).otherwise(1))
        .withColumn("symbol", lit(symbol))
        .drop("is_buyer_maker")))
    if (checkHeartbeatBound) Trades.requireBelowHeartbeat(canon) else canon
  }

  /** End-to-end: CSV dump(s) → canonical trades → month-partitioned store. */
  def ingest(spark: SparkSession, csvPath: String, storePath: String,
             symbol: Long = 0L, mode: String = "overwrite"): Unit =
    Store.saveMonthly(canonicalize(readAggTradesCsv(spark, csvPath), symbol),
      storePath, mode)
}
