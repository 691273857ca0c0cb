package graft.queries

import graft.queries.Q._
import graft.streaming.{StreamingBars, StreamingDedup}
import graft.trades.Trades
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-gated STREAMING executions — the Structured-Streaming family was
  * previously ScalaTest-only (MemoryStream parity in StreamingSpec); these
  * gates drain a real file-source stream end-to-end through
  * `Trigger.AvailableNow` into a memory sink and hash-match the SAME
  * DuckDB oracles the batch twins answer to. The Spark side of each row
  * genuinely executes the streaming path: file source → watermark →
  * windowed agg / stateful dedup → append-mode sink.
  *
  * The memory sink is a GATE choice only (the driver compares a bounded
  * result set): a production deployment writes the identical stream to a
  * parquet/Kafka sink — the operators under test are sink-agnostic, and
  * their unbounded-scale behavior (state size, watermark eviction,
  * micro-batch commit cost) is certified separately by StreamBench's
  * 10M-row drains (SYM_SCALING `stream_scaling` lines).
  */
object StreamQueries {

  /** 2100-01-01T00:00Z in ns — the flush sentinel's event time. Real data
    * ends decades earlier, so `bar_ts < sentinelNs` splits exactly.
    */
  private val sentinelNs = 4102444800000000000L

  /** Drain a streaming frame to completion and return the sink table.
    * AvailableNow processes every file then stops; `maxFilesPerTrigger`
    * on the source (set by callers) controls batch granularity.
    */
  private def drain(df: DataFrame, qn: String): DataFrame = {
    val s = df.sparkSession
    s.catalog.dropTempView(qn)
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(qn)
  }

  /** Write `df` as ONE parquet file inside `dir` with the given
    * lastModified — the file-source orders batches by (modTime, path), so
    * stamping data earlier than the sentinels pins batch order without
    * relying on write latency.
    */
  private def writeOneFile(df: DataFrame, dir: String, sub: String,
                           modTime: Long): Unit = {
    val path = s"$dir/$sub"
    df.coalesce(1).write.mode("overwrite").parquet(path)
    val d = new java.io.File(path)
    d.listFiles().foreach(_.setLastModified(modTime))
    d.setLastModified(modTime)
  }

  /** Canonical trades written to a fresh temp dir as (data, sentinel-1,
    * sentinel-2) parquet files with pinned modification times, returned
    * as a one-file-per-batch stream — the shared fixture for every
    * streaming-bars gate.
    */
  private def tradeFileStream(s: SparkSession, dir: String,
                              tmpName: String): DataFrame = {
    val trades = Trades.fromEvents(graft.Tables.events(s, dir))
      .select("ts", "id", "price", "qty")
    val tmp = new java.io.File(sys.props("java.io.tmpdir"), tmpName)
      .getAbsolutePath
    // wipe stale runs: the source must see exactly this invocation's files
    // (same recursive-delete idiom as Store.saveBucketed)
    val p = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val t0 = System.currentTimeMillis()
    writeOneFile(trades, tmp, "a_data", t0 - 60000)
    def sentinel(ns: Long, id: Long) =
      s.range(1).select(lit(ns).as("ts"), lit(id).as("id"),
        lit(1.0).as("price"), lit(1.0).as("qty"))
    writeOneFile(sentinel(sentinelNs, 9000000000L), tmp, "b_s1", t0 - 40000)
    writeOneFile(sentinel(sentinelNs + 600000000000L, 9000000001L),
      tmp, "c_s2", t0 - 20000)
    s.readStream
      .schema(trades.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp + "/*")
  }

  /** Sentinel filter + the canonical rounded bar projection — shared by
    * both streaming-bars gates so their outputs stay column-identical
    * against the one oracle.
    */
  private def canonBars(drained: DataFrame): DataFrame =
    drained
      .where(col("bar_ts") < sentinelNs)
      .select(col("bar_ts"), r6(col("open")).as("open"),
        r6(col("high")).as("high"), r6(col("low")).as("low"),
        r6(col("close")).as("close"), r6(col("volume")).as("volume"),
        col("trades"), r6(col("vwap")).as("vwap"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming 5-minute OHLCV bars in APPEND mode: canonical trades land
    // as parquet files, two far-future sentinel files advance the
    // watermark (watermarks lag one batch: sentinel 1 raises it, sentinel
    // 2's batch finalizes every real bar), and the memory sink holds the
    // bars the watermark finalized. Hash-matched against the same
    // bar arithmetic the batch gates use — no empty-bar fill / median
    // (those are batch post-passes, not stream-windowed state).
    "streaming_time_bars_5m" -> ((s, dir) => {
      val src = tradeFileStream(s, dir, "graft_gate_stream_bars")
      val bars = StreamingBars.ohlcvStream(src, 300,
        watermarkDelay = Some("1 minute"))
      canonBars(drain(bars, "gate_stream_bars_5m"))
    }),

    // The SAME bars through the append-mode STATE MACHINE
    // (flatMapGroupsWithState + event-time timeout) — the scale path for
    // streaming bar construction (fixed-width per-bar state, no per-batch
    // sort). Shares the windowed-agg gate's oracle verbatim: two
    // different streaming executors, one semantic.
    "streaming_time_bars_state_5m" -> ((s, dir) => {
      import s.implicits._
      val src = tradeFileStream(s, dir, "graft_gate_stream_bars_st")
        .withColumn("symbol", lit(0L))
        .as[StreamingBars.TradeIn]
      // delay must cover the bar's open span: trades arrive up to 300 s
      // before their bar-close event time (see StreamingSpec)
      val bars = StreamingBars.ohlcvStateStream(src, 300,
        watermarkDelay = "10 minutes")
      canonBars(drain(bars.toDF(), "gate_stream_bars_state_5m"))
    }),

    // Streaming LSH candidate pairs: per-doc band keys ride the native
    // codegen minhash expression (stateless, shuffle-free), then the
    // stateful bucket stream pairs each arriving doc with its bucket's
    // remembered members. Uncapped state + a single data batch makes the
    // DISTINCT pair set deterministic and EQUAL to the batch
    // lshCandidates banding — which is exactly what the oracle computes
    // (same CTE fragments as dedup_minhash_lsh; at-least-once re-emission
    // across bands collapses under the distinct).
    "streaming_dedup_lsh_pairs" -> ((s, dir) => {
      import s.implicits._
      val sch = s.read.parquet(s"$dir/documents.parquet").schema
      val banded = s.readStream.schema(sch)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .select(col("doc_id"), explode(StreamingDedup.minhashBuckets(
          graft.text.TextOps.wsTokens(col("text")),
          DocQueries.shingleN, DocQueries.minhashK, DocQueries.minhashBands))
          .as("bucket"))
        .select(col("bucket"), col("doc_id").as("docId"))
        .as[StreamingDedup.BandedDoc]
      val pairs = StreamingDedup.lshCandidateStream(banded,
        maxBucket = Int.MaxValue)
      drain(pairs.toDF(), "gate_stream_lsh_pairs")
        .select(col("id_a"), col("id_b")).distinct()
    }),

    // Streaming exact dedup at ingest, with REAL drops: the synthetic
    // corpus has no duplicate content, so the stream is fed the originals
    // PLUS a re-keyed copy of every document as a SECOND file (= a later
    // micro-batch under maxFilesPerTrigger=1) — 2·N rows in, N out, the
    // copy batch dropped entirely AGAINST CROSS-BATCH STATE. The
    // watermark delay exceeds the synthetic event-time span, so no state
    // expires mid-run. WHICH doc id survives a duplicate group is
    // arrival-order-dependent by design (documented deviation from batch
    // min-id keep-first), so the gate projects the DETERMINISTIC part:
    // the surviving content-hash set, whose count equaling N (not 2N) is
    // the drop evidence. The oracle is untouched: distinct hashes of the
    // original corpus.
    "streaming_dedup_exact" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val tmp = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_gate_stream_dedup").getAbsolutePath
      val p = new org.apache.hadoop.fs.Path(tmp)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val t0 = System.currentTimeMillis()
      writeOneFile(docs, tmp, "a_orig", t0 - 40000)
      writeOneFile(docs.withColumn("doc_id", col("doc_id") + 1000000L),
        tmp, "b_copy", t0 - 20000)
      val src = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp + "/*")
        // base offset: doc_id 0 at epoch 0 would sit exactly ON the
        // query's initial watermark and be dropped as late
        .withColumn("event_time",
          timestamp_micros(col("doc_id") + lit(1700000000000000L)))
      val out = StreamingDedup.exactDedupStream(
        src, "text", "event_time", "3650 days")
      drain(out, "gate_stream_dedup")
        .select(md5(graft.dedup.Dedup.normalized(col("text")))
          .as("content_md5"))
    })
  )

  /** One oracle text for BOTH streaming-bars executors (windowed agg and
    * state machine): different physical paths, one bar semantic.
    */
  private val streamBarsOracle: String = {
    val iv = 300L * 1000000000L
    s"""WITH $tradesCte
       |SELECT ((ts + ${iv - 1}) // $iv) * $iv AS bar_ts,
       |       ${rd("first(price ORDER BY ts, id)")} AS open,
       |       ${rd("max(price)")} AS high, ${rd("min(price)")} AS low,
       |       ${rd("last(price ORDER BY ts, id)")} AS close,
       |       ${rd("sum(qty)")} AS volume,
       |       CAST(count(*) AS BIGINT) AS trades,
       |       ${rd("sum(price * qty) / sum(qty)")} AS vwap
       |FROM trades GROUP BY 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "streaming_time_bars_5m" -> streamBarsOracle,
    "streaming_time_bars_state_5m" -> streamBarsOracle,

    "streaming_dedup_exact" ->
      s"""SELECT DISTINCT
        |  $normMd5Sql AS content_md5
        |FROM documents""".stripMargin,

    // same banding CTEs as dedup_minhash_lsh — the streaming bucket state
    // must reproduce the batch band join's candidate set exactly
    "streaming_dedup_lsh_pairs" ->
      s"""WITH ${Q.toksCte}, ${DocQueries.shCte}, ${DocQueries.minhashBandsCtes}
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a
         |JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id""".stripMargin
  )
}
