package graft

import graft.streaming.{StreamingBars, StreamingIntegrity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput/scaling harness for the streaming twins — the evidence class
  * SYM_SCALING.json provides for batch, here for Structured Streaming: each
  * stateful stream drains a bounded multi-symbol parquet fixture under
  * `Trigger.AvailableNow` with `maxFilesPerTrigger` forcing MANY
  * micro-batches (so cross-batch state handoff — open bars, prev-trade
  * carry, gap state — is actually exercised at volume, not just in the
  * two-batch unit specs), and we record wall time, batch count and input
  * rows/sec at several core counts.
  *
  * The fixture replicates the sf trades `copies` times: each copy's ids are
  * rebased past the previous copy's and its symbols are remapped to a fresh
  * range, so the result is `copies ×` the symbols with the reference's
  * per-symbol id/ts structure intact. Sides come from the batch per-symbol
  * tick rule — the streams under test consume sided trades, they don't
  * re-derive sides.
  *
  * Streams measured (all `flatMapGroupsWithState` APPEND mode):
  *  - `ohlcv_state_60s` — per-bar OHLCV state machine, keyed by bar_ts;
  *  - `directional_buffered_1h` — watermark-buffered per-symbol directional
  *    bars (exact under any arrival order);
  *  - `integrity_alerts` — per-symbol gap/id monitor, O(1) state;
  *  - `tick_bars_1k` — per-symbol threshold-bar counter, O(1) state;
  *  - `cusum_events` — per-symbol CUSUM filter, O(1) state;
  *  - `ewma` — per-symbol span-100 EWMA recursion, O(1) state, one
  *    emission per input row (the heaviest output path);
  *  - `footprint_summary_1h` — per-bar level-grid state + post-finalize
  *    summary features (the widest per-key state);
  *  - `imbalance_bars` / `volume_imbalance_bars` / `dollar_run_bars` —
  *    per-symbol EWMA-threshold information bars (θ plus two / four
  *    adaptive expectations in O(1) state).
  *
  * Usage: [SPARK_GRAFT_SF_DIR=...] [SPARK_GRAFT_STREAM_COPIES=20]
  *        [SPARK_GRAFT_STREAM_CPUS=8,32] runMain graft.StreamBench
  * Prints one JSONL line:
  *   {"metric":"stream_scaling","rows":N,"runs":{"8":{q:sec},...},
  *    "batches":{q:n},"emitted":{q:n},...}
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_STREAM_COPIES", "20").trim.toInt
    val cpuList = sys.env.getOrElse("SPARK_GRAFT_STREAM_CPUS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val maxFiles = sys.env.getOrElse("SPARK_GRAFT_STREAM_MAXFILES", "3").trim.toInt
    val fixture = "target/streamfix"
    val nFiles = 24

    // ---- build the fixture once (its own session; not part of any timing)
    val rows: Long = {
      val spark = Conf.engineDefaults(SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val base = graft.trades.Trades.fromEvents(Tables.events(spark, sfDir))
      val (idSpan, symSpan) = {
        val r = base.agg(max("id"), max("symbol")).first()
        (r.getLong(0) + 1L, r.getLong(1) + 1L)
      }
      val replicated = base
        .withColumn("k", explode(sequence(lit(0), lit(copies - 1))))
        .select(
          col("ts"), // ts identical across copies: copies are parallel symbols, not serial history
          (col("id") + col("k") * lit(idSpan)).as("id"),
          col("price"), col("qty"),
          (col("symbol") + col("k") * lit(symSpan)).as("symbol"))
      val sided = graft.trades.Trades.withTickRuleSide(replicated, Seq("symbol"))
      sided
        .repartitionByRange(nFiles, col("ts"))
        .write.mode("overwrite").parquet(fixture)
      val n = spark.read.parquet(fixture).count()
      spark.stop()
      n
    }

    var batches = Map.empty[String, Long]
    var emitted = Map.empty[String, Long]
    val runs = cpuList.map { cpus =>
      val spark = Conf.engineDefaults(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val schema = spark.read.parquet(fixture).schema
      def src: DataFrame = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFiles) // nFiles/maxFiles micro-batches
        .parquet(fixture)

      val streams: Seq[(String, () => DataFrame)] = Seq(
        "ohlcv_state_60s" -> (() =>
          StreamingBars.ohlcvStateStream(
            src.select("ts", "id", "price", "qty", "symbol")
              .as[StreamingBars.TradeIn], 60).toDF()),
        "directional_buffered_1h" -> (() =>
          StreamingBars.directionalBufferedStream(
            src.select("ts", "id", "price", "qty", "symbol", "side")
              .as[StreamingBars.SidedSymIn], 3600).toDF()),
        "integrity_alerts" -> (() =>
          StreamingIntegrity.alerts(
            src.select("ts", "id", "symbol")
              .as[StreamingIntegrity.TickIn], maxGapNs = 600L * 1000000000L).toDF()),
        "tick_bars_1k" -> (() =>
          StreamingBars.tickBarStream(
            src.select("ts", "id", "price", "qty", "symbol")
              .as[StreamingBars.TradeIn], 1000).toDF()),
        "cusum_events" -> (() =>
          StreamingBars.cusumStream(
            src.select("ts", "id", "price", "qty", "symbol")
              .as[StreamingBars.TradeIn], 2.0).toDF()),
        "ewma" -> (() =>
          StreamingBars.ewmaStream(
            src.select("ts", "id", "price", "qty", "symbol")
              .as[StreamingBars.TradeIn], 100).toDF()),
        "footprint_summary_1h" -> (() =>
          StreamingBars.footprintSummaryStream(
            src.select("ts", "id", "price", "qty", "symbol", "side")
              .as[StreamingBars.SidedSymIn], 3600, 0.01).toDF()),
        "imbalance_bars" -> (() =>
          StreamingBars.imbalanceBarStream(
            src.select("ts", "id", "price", "qty", "symbol", "side")
              .as[StreamingBars.SidedSymIn],
            alphaT = 0.05, alphaB = 0.05, initT = 200.0, initB = 0.05)
            .toDF()),
        "volume_imbalance_bars" -> (() =>
          StreamingBars.valueImbalanceBarStream(
            src.select("ts", "id", "price", "qty", "symbol", "side")
              .as[StreamingBars.SidedSymIn], dollar = false,
            alphaT = 0.05, alphaB = 0.05, initT = 20.0, initB = 0.3)
            .toDF()),
        "dollar_run_bars" -> (() =>
          StreamingBars.valueRunBarStream(
            src.select("ts", "id", "price", "qty", "symbol", "side")
              .as[StreamingBars.SidedSymIn], dollar = true,
            alphaT = 0.05, alphaP = 0.05, alphaV = 0.05,
            initT = 20.0, initP = 0.5, initV = 290.0)
            .toDF()),
        "z_peaks" -> (() =>
          StreamingBars.zPeakStream(
            src.select("ts", "id", "price", "qty", "symbol")
              .as[StreamingBars.TradeIn], 20, 3.0).toDF()))

      val times = streams.map { case (name, mk) =>
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"streambench_$name").toString
        val t0 = System.nanoTime()
        val q = mk()
          .writeStream
          .format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress
        batches += (name -> prog.count(_.numInputRows > 0).toLong)
        emitted += (name -> prog.map(p =>
          p.sink.numOutputRows.max(0L)).sum)
        name -> sec
      }
      spark.stop()
      (cpus, times)
    }

    val runsJson = runs.map { case (cpus, times) =>
      "\"" + cpus + "\":" + times.map { case (k, v) => s"\"$k\":$v" }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    def m2j(m: Map[String, Long]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_scaling","sf":"$sfDir","copies":$copies,"rows":$rows,"max_files_per_trigger":$maxFiles,"runs":$runsJson,"batches":${m2j(batches)},"emitted":${m2j(emitted)}}""")
  }
}
