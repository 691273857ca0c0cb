package graft.queries

import graft.Tables
import graft.trades.Trades
import graft.bars.Footprints
import graft.features.VolumeProfile
import org.apache.spark.sql.functions._
import Q._

/** Footprint + volume-profile coverage (SURVEY.md §2.4 footprints, §2.5
  * volume-profile operators). tick size fixed at 0.01 (the synthetic price
  * grid), 1h bars, imbalance factor 3.
  */
object FootprintQueries {

  private val tick = 0.01
  private val k = 3.0
  private val ivSec = 3600L

  private def fp(s: org.apache.spark.sql.SparkSession, dir: String) =
    Footprints.build(
      Trades.withTickRuleSide(Trades.fromEvents(Tables.events(s, dir))),
      ivSec, tick, k)

  /** Keyed twin: per-symbol tick-rule sides, daily bars, symbol-keyed
    * footprint — the multi-symbol store layout (one shuffle on
    * (symbol, bar_ts), parallel across symbols).
    */
  private def fpSym(s: org.apache.spark.sql.SparkSession, dir: String) =
    Footprints.build(
      Trades.withTickRuleSide(Trades.fromEvents(Tables.events(s, dir)), Seq("symbol")),
      86400L, tick, k, Seq("symbol"))

  val queries: Map[String, QueryFn] = Map(
    // Exploded footprint rows with diagonal imbalance flags
    "footprint_levels_1h" -> ((s, dir) =>
      fp(s, dir).select(col("bar_ts"), col("level"),
        r6(col("buy_volume")).as("buy_volume"), r6(col("sell_volume")).as("sell_volume"),
        col("buy_ticks"), col("sell_ticks"),
        col("buy_imbalance"), col("sell_imbalance"))),

    // Per-bar footprint summary (COT, imbalance sums, signed max run, skew, gini)
    "footprint_summary_1h" -> ((s, dir) =>
      Footprints.summary(fp(s, dir)).select(col("bar_ts"),
        col("buy_imbalances_sum"), col("sell_imbalances_sum"),
        col("cot_price_level"), col("imb_max_run_signed"),
        (r6(col("vp_skew")) + lit(0.0)).as("vp_skew"), // normalize -0.0
        r6(col("vp_gini")).as("vp_gini"))),

    // Keyed twins (§2.4 footprints at the multi-symbol layout): per-symbol
    // daily footprints and their summaries, everything partitioned by
    // (symbol, bar_ts) — no cross-symbol window anywhere in the plan.
    "footprint_levels_sym" -> ((s, dir) =>
      fpSym(s, dir).select(col("symbol"), col("bar_ts"), col("level"),
        r6(col("buy_volume")).as("buy_volume"), r6(col("sell_volume")).as("sell_volume"),
        col("buy_ticks"), col("sell_ticks"),
        col("buy_imbalance"), col("sell_imbalance"))),

    "footprint_summary_sym" -> ((s, dir) =>
      Footprints.summary(fpSym(s, dir), Seq("symbol")).select(
        col("symbol"), col("bar_ts"),
        col("buy_imbalances_sum"), col("sell_imbalances_sum"),
        col("cot_price_level"), col("imb_max_run_signed"),
        (r6(col("vp_skew")) + lit(0.0)).as("vp_skew"),
        r6(col("vp_gini")).as("vp_gini"))),

    // Knife-edge guard for the footprint-summary family (r8, cusum_slack
    // pattern): the summary's vp_skew/vp_gini doubles are bit-identical
    // across engines (exact integer sums, fixed IEEE op sequence), but the
    // final r6 normalization still ROUNDS them, and the two engines' round()
    // implementations differ — Spark rounds the double's SHORTEST DECIMAL
    // string (BigDecimal.valueOf, HALF_UP), DuckDB rounds the ·1e6 product
    // (std::round, half away from zero). The two agree everywhere except
    // doubles essentially ON a 5e-7 boundary whose string and product
    // views straddle it. Per row this asserts the value either sits ≥1e-9
    // from the boundary (where no sane rounding can fork) OR Spark's r6
    // equals the product-rounding emulation of DuckDB (verified against
    // the real DuckDB on 200k probes incl. adversarial boundary doubles).
    // Exact rationals (gini = C/B²) routinely land ON or within 1e-10 of
    // .5 boundaries — those are safe precisely when both views round the
    // same way, which is what the emulation checks. A future dataset on a
    // genuine knife edge fails HERE loudly instead of hash-mismatching the
    // footprint_summary_* rows mysteriously.
    "footprint_slack" -> ((s, dir) => {
      def okCol(c: org.apache.spark.sql.Column) = {
        val scaled = abs(c) * 1e6
        val d = abs(scaled - floor(scaled) - 0.5)
        val emu = signum(c) * floor(abs(c) * 1e6 + lit(0.5)) / 1e6
        // <=> : NULL outputs (zero-attributed-volume bars) vacuously agree
        coalesce(d >= 1e-9, lit(false)) || (r6(c) <=> emu)
      }
      def slackOf(df: org.apache.spark.sql.DataFrame, variant: String) =
        df.agg(coalesce(
            bool_and(okCol(col("vp_skew")) && okCol(col("vp_gini"))), lit(true))
          .as("slack_ok"))
          .select(lit(variant).as("variant"), col("slack_ok"))
      slackOf(Footprints.summary(fp(s, dir)), "summary_1h").unionByName(
        slackOf(Footprints.summary(fpSym(s, dir), Seq("symbol")), "summary_sym"))
    }),

    // Daily volume profile: POC + % above POC
    "vp_poc_day" -> ((s, dir) => {
      val prof = VolumeProfile.profile(fp(s, dir),
        expr("bar_ts div 86400000000000"), "day")
      VolumeProfile.pocStats(prof, "day").select(col("day"), col("poc_level"),
        r6(col("pct_above_poc")).as("pct_above_poc"),
        r6(col("total_volume")).as("total_volume"))
    }),

    // Daily value area on the ~30-bin bucketed profile via the greedy
    // positional Aggregator — oracle-checked against a DuckDB recursive CTE
    // replaying the same expansion. (The dense raw-grid variant is gated at
    // a coarser tick by vp_value_area_day_dense — the 49k-level 0.01-tick
    // state is too wide for a SQL recursion — and ScalaTest-verified at
    // full resolution in FootprintSpec.)
    "vp_value_area_day" -> ((s, dir) => {
      val prof = VolumeProfile.profile(fp(s, dir),
        expr("bar_ts div 86400000000000"), "day")
      VolumeProfile.valueArea(VolumeProfile.bucket(prof, "day", 30), "day",
        dense = false)
    }),

    // Daily profile re-binned into ~30 odd-width buckets with midpoint
    // labels (bucket_price_levels, volume.py:206-274)
    "vp_bucketed_day" -> ((s, dir) => {
      val prof = VolumeProfile.profile(fp(s, dir),
        expr("bar_ts div 86400000000000"), "day")
      VolumeProfile.bucket(prof, "day", 30)
        .select(col("day"), col("level"), r6(col("volume")).as("volume"))
    }),

    // Rolling 6-bar (6h) profile POC per target bar
    "vp_rolling_6h" -> ((s, dir) => {
      val prof = VolumeProfile.rolling(fp(s, dir), ivSec, 6)
      VolumeProfile.pocStats(prof.withColumnRenamed("target_ts", "bar_ts"), "bar_ts")
        .select(col("bar_ts"), col("poc_level"),
          r6(col("pct_above_poc")).as("pct_above_poc"),
          r6(col("total_volume")).as("total_volume"))
    }),

    // Developing (anchored intraday) profile POC per bar
    "vp_developing_day" -> ((s, dir) => {
      val prof = VolumeProfile.developing(fp(s, dir))
      VolumeProfile.pocStats(prof.withColumnRenamed("target_ts", "bar_ts"), "bar_ts")
        .select(col("bar_ts"), col("poc_level"),
          r6(col("pct_above_poc")).as("pct_above_poc"),
          r6(col("total_volume")).as("total_volume"))
    }),

    // Daily value area on the DENSE [min..max] tick grid — the raw-profile
    // variant of the greedy kernel (volume.py:185-195 dense expansion +
    // 277-364 expansion loop). A 1.0 tick keeps the grid small enough for
    // the oracle's recursive-CTE replay (~560 levels/day), and volumes are
    // round(qty*10) — integer-valued doubles, so every cu/cd comparison in
    // BOTH engines is exact regardless of summation order.
    "vp_value_area_day_dense" -> ((s, dir) => {
      val prof = Trades.fromEvents(Tables.events(s, dir)).select(
          expr("ts div 86400000000000").as("day"),
          round(col("price") / 1.0).cast("int").as("level"),
          round(col("qty") * 10).as("v"))
        .groupBy("day", "level").agg(sum("v").as("volume"))
      VolumeProfile.valueArea(prof, "day", dense = true)
    })
  )

  // ---------------------------------------------------------------------
  // Oracles
  // ---------------------------------------------------------------------

  private val iv = ivSec * 1000000000L

  /** fp2 = exploded footprint with imbalance flags (mirrors Footprints.build). */
  private val fpCte: String =
    s"""fp AS (
       |  SELECT ((ts + ${iv - 1}) // $iv) * $iv AS bar_ts,
       |         CAST(round(price / ${D(tick)}) AS INT) AS level,
       |         CAST(sum(CAST((CASE WHEN side = 1 THEN qty ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) AS buy_volume,
       |         CAST(sum(CAST((CASE WHEN side = -1 THEN qty ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) AS sell_volume,
       |         CAST(sum(CASE WHEN side <> 0 THEN CAST(round(qty * 1000000) AS BIGINT) ELSE 0 END) AS HUGEINT) AS vu,
       |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS buy_ticks,
       |         CAST(sum(CASE WHEN side = -1 THEN 1 ELSE 0 END) AS BIGINT) AS sell_ticks
       |  FROM sided GROUP BY 1, 2
       |),
       |fp2 AS (
       |  SELECT *,
       |    level < max(level) OVER (PARTITION BY bar_ts)
       |      AND sell_volume > (CASE WHEN lead(level) OVER wl = level + 1
       |                         THEN lead(buy_volume) OVER wl ELSE 0.0 END) * ${D(k)} AS sell_imbalance,
       |    level > min(level) OVER (PARTITION BY bar_ts)
       |      AND buy_volume > (CASE WHEN lag(level) OVER wl = level - 1
       |                        THEN lag(sell_volume) OVER wl ELSE 0.0 END) * ${D(k)} AS buy_imbalance
       |  FROM fp WINDOW wl AS (PARTITION BY bar_ts ORDER BY level)
       |)""".stripMargin

  private def withFp(body: String): String =
    s"WITH $tradesCte, $sidedCte, $fpCte\n$body"

  /** Symbol-keyed mirror of sided+fp2: per-symbol tick rule, daily bars,
    * every window/group carries the symbol key.
    */
  private val symIv = 86400L * 1000000000L
  private val symFpCte: String =
    s"""$symSidedCte,
       |fp AS (
       |  SELECT symbol, ((ts + ${symIv - 1}) // $symIv) * $symIv AS bar_ts,
       |         CAST(round(price / ${D(tick)}) AS INT) AS level,
       |         CAST(sum(CAST((CASE WHEN side = 1 THEN qty ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) AS buy_volume,
       |         CAST(sum(CAST((CASE WHEN side = -1 THEN qty ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) AS sell_volume,
       |         CAST(sum(CASE WHEN side <> 0 THEN CAST(round(qty * 1000000) AS BIGINT) ELSE 0 END) AS HUGEINT) AS vu,
       |         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS buy_ticks,
       |         CAST(sum(CASE WHEN side = -1 THEN 1 ELSE 0 END) AS BIGINT) AS sell_ticks
       |  FROM sided GROUP BY 1, 2, 3
       |),
       |fp2 AS (
       |  SELECT *,
       |    level < max(level) OVER (PARTITION BY symbol, bar_ts)
       |      AND sell_volume > (CASE WHEN lead(level) OVER wl = level + 1
       |                         THEN lead(buy_volume) OVER wl ELSE 0.0 END) * ${D(k)} AS sell_imbalance,
       |    level > min(level) OVER (PARTITION BY symbol, bar_ts)
       |      AND buy_volume > (CASE WHEN lag(level) OVER wl = level - 1
       |                        THEN lag(sell_volume) OVER wl ELSE 0.0 END) * ${D(k)} AS buy_imbalance
       |  FROM fp WINDOW wl AS (PARTITION BY symbol, bar_ts ORDER BY level)
       |)""".stripMargin

  private def withSymFp(body: String): String =
    s"WITH $tradesCte, $symFpCte\n$body"

  val oracles: Map[String, String] = Map(
    "footprint_levels_1h" -> withFp(
      s"""SELECT bar_ts, level, ${rd("buy_volume")} AS buy_volume,
         |  ${rd("sell_volume")} AS sell_volume, buy_ticks, sell_ticks,
         |  buy_imbalance, sell_imbalance
         |FROM fp2""".stripMargin),

    "footprint_summary_1h" -> withFp(
      s""", f AS (
         |  SELECT *,
         |    CASE WHEN buy_imbalance THEN 1 WHEN sell_imbalance THEN -1 ELSE 0 END AS sgn
         |  FROM fp2
         |),
         |f2 AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY bar_ts ORDER BY level
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM (
         |    SELECT *,
         |      CASE WHEN sgn = 0 THEN 1
         |           WHEN lag(sgn) OVER wl IS NULL THEN 1
         |           WHEN sgn <> lag(sgn) OVER wl THEN 1
         |           WHEN level <> lag(level) OVER wl + 1 THEN 1
         |           ELSE 0 END AS brk
         |    FROM f WINDOW wl AS (PARTITION BY bar_ts ORDER BY level)
         |  )
         |),
         |islands AS (
         |  SELECT bar_ts, grp, sgn, CAST(count(*) AS BIGINT) AS len, min(level) AS start_level
         |  FROM f2 WHERE sgn <> 0 GROUP BY bar_ts, grp, sgn
         |),
         |best AS (
         |  SELECT bar_ts, len * sgn AS imb_max_run_signed FROM (
         |    SELECT *, row_number() OVER (PARTITION BY bar_ts ORDER BY len DESC, start_level ASC) AS rk
         |    FROM islands
         |  ) WHERE rk = 1
         |),
         |per_bar AS (
         |  SELECT bar_ts,
         |    CAST(sum(CASE WHEN buy_imbalance THEN 1 ELSE 0 END) AS BIGINT) AS buy_imbalances_sum,
         |    CAST(sum(CASE WHEN sell_imbalance THEN 1 ELSE 0 END) AS BIGINT) AS sell_imbalances_sum,
         |    max(vu) AS maxu,
         |    sum(CAST(level AS HUGEINT) * vu) AS va,
         |    sum(vu) AS vb,
         |    sum(vu * vu) AS vc
         |  FROM f GROUP BY bar_ts
         |),
         |cot AS (
         |  SELECT f.bar_ts, min(level) AS cot_price_level
         |  FROM f JOIN per_bar p ON f.bar_ts = p.bar_ts AND f.vu = p.maxu
         |  GROUP BY f.bar_ts
         |)
         |SELECT p.bar_ts, p.buy_imbalances_sum, p.sell_imbalances_sum,
         |  c.cot_price_level, coalesce(b.imb_max_run_signed, 0) AS imb_max_run_signed,
         |  ${rd("(CAST(p.va AS DOUBLE) - (CAST(p.va AS DOUBLE) / CAST(p.vb AS DOUBLE)) * CAST(p.vb AS DOUBLE)) / CAST(p.vb AS DOUBLE)")} + 0e0 AS vp_skew,
         |  ${rd("1.0 - CAST(p.vc AS DOUBLE) / (CAST(p.vb AS DOUBLE) * CAST(p.vb AS DOUBLE))")} AS vp_gini
         |FROM per_bar p
         |JOIN cot c ON c.bar_ts = p.bar_ts
         |LEFT JOIN best b ON b.bar_ts = p.bar_ts""".stripMargin),

    "footprint_levels_sym" -> withSymFp(
      s"""SELECT symbol, bar_ts, level, ${rd("buy_volume")} AS buy_volume,
         |  ${rd("sell_volume")} AS sell_volume, buy_ticks, sell_ticks,
         |  buy_imbalance, sell_imbalance
         |FROM fp2""".stripMargin),

    "footprint_summary_sym" -> withSymFp(
      s""", f AS (
         |  SELECT *,
         |    CASE WHEN buy_imbalance THEN 1 WHEN sell_imbalance THEN -1 ELSE 0 END AS sgn
         |  FROM fp2
         |),
         |f2 AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY symbol, bar_ts ORDER BY level
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM (
         |    SELECT *,
         |      CASE WHEN sgn = 0 THEN 1
         |           WHEN lag(sgn) OVER wl IS NULL THEN 1
         |           WHEN sgn <> lag(sgn) OVER wl THEN 1
         |           WHEN level <> lag(level) OVER wl + 1 THEN 1
         |           ELSE 0 END AS brk
         |    FROM f WINDOW wl AS (PARTITION BY symbol, bar_ts ORDER BY level)
         |  )
         |),
         |islands AS (
         |  SELECT symbol, bar_ts, grp, sgn, CAST(count(*) AS BIGINT) AS len,
         |         min(level) AS start_level
         |  FROM f2 WHERE sgn <> 0 GROUP BY symbol, bar_ts, grp, sgn
         |),
         |best AS (
         |  SELECT symbol, bar_ts, len * sgn AS imb_max_run_signed FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol, bar_ts
         |      ORDER BY len DESC, start_level ASC) AS rk
         |    FROM islands
         |  ) WHERE rk = 1
         |),
         |per_bar AS (
         |  SELECT symbol, bar_ts,
         |    CAST(sum(CASE WHEN buy_imbalance THEN 1 ELSE 0 END) AS BIGINT) AS buy_imbalances_sum,
         |    CAST(sum(CASE WHEN sell_imbalance THEN 1 ELSE 0 END) AS BIGINT) AS sell_imbalances_sum,
         |    max(vu) AS maxu,
         |    sum(CAST(level AS HUGEINT) * vu) AS va,
         |    sum(vu) AS vb,
         |    sum(vu * vu) AS vc
         |  FROM f GROUP BY symbol, bar_ts
         |),
         |cot AS (
         |  SELECT f.symbol, f.bar_ts, min(level) AS cot_price_level
         |  FROM f JOIN per_bar p ON f.symbol = p.symbol AND f.bar_ts = p.bar_ts
         |    AND f.vu = p.maxu
         |  GROUP BY f.symbol, f.bar_ts
         |)
         |SELECT p.symbol, p.bar_ts, p.buy_imbalances_sum, p.sell_imbalances_sum,
         |  c.cot_price_level, coalesce(b.imb_max_run_signed, 0) AS imb_max_run_signed,
         |  ${rd("(CAST(p.va AS DOUBLE) - (CAST(p.va AS DOUBLE) / CAST(p.vb AS DOUBLE)) * CAST(p.vb AS DOUBLE)) / CAST(p.vb AS DOUBLE)")} + 0e0 AS vp_skew,
         |  ${rd("1.0 - CAST(p.vc AS DOUBLE) / (CAST(p.vb AS DOUBLE) * CAST(p.vb AS DOUBLE))")} AS vp_gini
         |FROM per_bar p
         |JOIN cot c ON c.symbol = p.symbol AND c.bar_ts = p.bar_ts
         |LEFT JOIN best b ON b.symbol = p.symbol AND b.bar_ts = p.bar_ts""".stripMargin),

    // the Spark side computes the real min boundary distance; the oracle
    // just asserts both summary variants clear it (cusum_slack pattern)
    "footprint_slack" ->
      """SELECT 'summary_1h' AS variant, TRUE AS slack_ok
        |UNION ALL
        |SELECT 'summary_sym' AS variant, TRUE AS slack_ok""".stripMargin,

    "vp_poc_day" -> withFp(
      s""", prof AS (
         |  SELECT bar_ts // 86400000000000 AS day, level,
         |         CAST(sum(CAST((buy_volume + sell_volume) AS DECIMAL(18,6))) AS DOUBLE) AS volume
         |  FROM fp2 GROUP BY 1, 2
         |),
         |mx AS (SELECT day, max(volume) AS maxv FROM prof GROUP BY day),
         |poc AS (
         |  SELECT prof.day, min(level) AS poc_level
         |  FROM prof JOIN mx ON prof.day = mx.day AND prof.volume = mx.maxv
         |  GROUP BY prof.day
         |)
         |SELECT prof.day AS day, poc.poc_level,
         |  ${rd("CAST(sum(CAST((CASE WHEN level > poc_level THEN volume ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) / CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS pct_above_poc,
         |  ${rd("CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS total_volume
         |FROM prof JOIN poc ON prof.day = poc.day
         |GROUP BY prof.day, poc.poc_level""".stripMargin),

    "vp_bucketed_day" -> withFp(
      s""", prof AS (
         |  SELECT bar_ts // 86400000000000 AS day, level,
         |         CAST(sum(CAST((buy_volume + sell_volume) AS DECIMAL(18,6))) AS DOUBLE) AS volume
         |  FROM fp2 GROUP BY 1, 2
         |),
         |ext AS (
         |  SELECT *, min(level) OVER (PARTITION BY day) AS lo,
         |         max(level) OVER (PARTITION BY day) - min(level) OVER (PARTITION BY day) + 1 AS n
         |  FROM prof
         |),
         |sz AS (
         |  SELECT *, CASE WHEN raw % 2 = 0 THEN raw + 1 ELSE raw END AS bsize
         |  FROM (SELECT *, greatest(CAST(round(n / 30.0) AS INT), 1) AS raw FROM ext)
         |)
         |SELECT day, lo + ((level - lo) // bsize) * bsize + bsize // 2 AS level,
         |  ${rd("CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS volume
         |FROM sz GROUP BY 1, 2""".stripMargin),

    // Greedy value-area expansion replayed as a recursive CTE over the
    // ~30-bin bucketed profile: state = (cum, hva/lva indices, up/dn
    // cursors); cu/cd are recomputed from the cursors each step (kernel
    // carries them, but they are pure functions of the cursor except the
    // first-iteration 0.0-for-out-of-range nuance, handled via iter = 0).
    "vp_value_area_day" ->
      s"""WITH RECURSIVE $tradesCte, $sidedCte, $fpCte,
         |prof AS (
         |  SELECT bar_ts // 86400000000000 AS day, level,
         |         CAST(sum(CAST((buy_volume + sell_volume) AS DECIMAL(18,6))) AS DOUBLE) AS volume
         |  FROM fp2 GROUP BY 1, 2
         |),
         |ext AS (
         |  SELECT *, min(level) OVER (PARTITION BY day) AS lo,
         |         max(level) OVER (PARTITION BY day) - min(level) OVER (PARTITION BY day) + 1 AS nlv
         |  FROM prof
         |),
         |sz AS (
         |  SELECT *, CASE WHEN raw % 2 = 0 THEN raw + 1 ELSE raw END AS bsize
         |  FROM (SELECT *, greatest(CAST(round(nlv / 30.0) AS INT), 1) AS raw FROM ext)
         |),
         |bucketed AS (
         |  SELECT day, lo + ((level - lo) // bsize) * bsize + bsize // 2 AS level,
         |         CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE) AS volume
         |  FROM sz GROUP BY 1, 2
         |),
         |arr AS (
         |  SELECT day, list(volume ORDER BY level) AS vols,
         |         list(level ORDER BY level) AS lvls,
         |         CAST(count(*) AS BIGINT) AS n, sum(volume) AS total
         |  FROM bucketed GROUP BY day
         |),
         |init AS (
         |  -- pocidx from arr's OWN list (first max = lowest level, np.argmax
         |  -- semantics): a separate max-join CTE would re-aggregate the
         |  -- float sums in a different parallel order and miss the equality
         |  SELECT day, vols, lvls, n, total * ${D(68.34 / 100.0)} AS thr,
         |         CAST(list_position(vols, list_aggregate(vols, 'max')) - 1 AS BIGINT) AS pocidx
         |  FROM arr
         |),
         |va AS (
         |  SELECT day, vols, lvls, n, thr, pocidx,
         |         vols[pocidx + 1] AS cum,
         |         pocidx AS hvai, pocidx AS lvai,
         |         pocidx + 1 AS up, pocidx - 1 AS dn,
         |         CAST(0 AS BIGINT) AS iter
         |  FROM init
         |  UNION ALL
         |  SELECT day, vols, lvls, n, thr, pocidx,
         |         cum + CASE WHEN cu > cd THEN cu WHEN cu < cd THEN cd ELSE cu + cd END,
         |         CASE WHEN cu >= cd THEN least(up + 1, n - 1) ELSE hvai END,
         |         CASE WHEN cu <= cd THEN greatest(dn - 1, 0) ELSE lvai END,
         |         CASE WHEN cu >= cd THEN up + 2 ELSE up END,
         |         CASE WHEN cu <= cd THEN dn - 2 ELSE dn END,
         |         iter + 1
         |  FROM (
         |    SELECT *,
         |      CASE WHEN up < n THEN vols[up + 1] + CASE WHEN up + 1 < n THEN vols[up + 2] ELSE 0.0 END
         |           WHEN iter = 0 THEN 0.0 ELSE -1.0 END AS cu,
         |      CASE WHEN dn >= 0 THEN vols[dn + 1] + CASE WHEN dn - 1 >= 0 THEN vols[dn] ELSE 0.0 END
         |           WHEN iter = 0 THEN 0.0 ELSE -1.0 END AS cd
         |    FROM va
         |  )
         |  WHERE cum < thr AND NOT (cu = -1.0 AND cd = -1.0) AND iter < 2 * n + 4
         |)
         |SELECT day, CAST(lvls[pocidx + 1] AS INT) AS poc_level,
         |       CAST(lvls[hvai + 1] AS INT) AS hva_level,
         |       CAST(lvls[lvai + 1] AS INT) AS lva_level
         |FROM (SELECT *, row_number() OVER (PARTITION BY day ORDER BY iter DESC) AS rk FROM va)
         |WHERE rk = 1""".stripMargin,

    // Same recursion as vp_value_area_day, but over the dense [min..max]
    // grid (zero-filled) instead of the bucketed bins — integer-valued
    // volumes make every comparison exact in both engines.
    "vp_value_area_day_dense" ->
      s"""WITH RECURSIVE $tradesCte,
         |prof AS (
         |  SELECT ts // 86400000000000 AS day,
         |         CAST(round(price / 1.0e0) AS INT) AS level,
         |         sum(round(qty * 10)) AS volume
         |  FROM trades GROUP BY 1, 2
         |),
         |bounds AS (SELECT day, min(level) AS lo, max(level) AS hi FROM prof GROUP BY day),
         |grid AS (SELECT day, unnest(generate_series(lo, hi)) AS level FROM bounds),
         |filled AS (
         |  SELECT g.day, g.level, coalesce(p.volume, 0.0) AS volume
         |  FROM grid g LEFT JOIN prof p ON g.day = p.day AND g.level = p.level
         |),
         |arr AS (
         |  SELECT day, list(volume ORDER BY level) AS vols,
         |         list(level ORDER BY level) AS lvls,
         |         CAST(count(*) AS BIGINT) AS n, sum(volume) AS total
         |  FROM filled GROUP BY day
         |),
         |init AS (
         |  SELECT day, vols, lvls, n, total * ${D(68.34 / 100.0)} AS thr,
         |         CAST(list_position(vols, list_aggregate(vols, 'max')) - 1 AS BIGINT) AS pocidx
         |  FROM arr
         |),
         |va AS (
         |  SELECT day, vols, lvls, n, thr, pocidx,
         |         vols[pocidx + 1] AS cum,
         |         pocidx AS hvai, pocidx AS lvai,
         |         pocidx + 1 AS up, pocidx - 1 AS dn,
         |         CAST(0 AS BIGINT) AS iter
         |  FROM init
         |  UNION ALL
         |  SELECT day, vols, lvls, n, thr, pocidx,
         |         cum + CASE WHEN cu > cd THEN cu WHEN cu < cd THEN cd ELSE cu + cd END,
         |         CASE WHEN cu >= cd THEN least(up + 1, n - 1) ELSE hvai END,
         |         CASE WHEN cu <= cd THEN greatest(dn - 1, 0) ELSE lvai END,
         |         CASE WHEN cu >= cd THEN up + 2 ELSE up END,
         |         CASE WHEN cu <= cd THEN dn - 2 ELSE dn END,
         |         iter + 1
         |  FROM (
         |    SELECT *,
         |      CASE WHEN up < n THEN vols[up + 1] + CASE WHEN up + 1 < n THEN vols[up + 2] ELSE 0.0 END
         |           WHEN iter = 0 THEN 0.0 ELSE -1.0 END AS cu,
         |      CASE WHEN dn >= 0 THEN vols[dn + 1] + CASE WHEN dn - 1 >= 0 THEN vols[dn] ELSE 0.0 END
         |           WHEN iter = 0 THEN 0.0 ELSE -1.0 END AS cd
         |    FROM va
         |  )
         |  WHERE cum < thr AND NOT (cu = -1.0 AND cd = -1.0) AND iter < 2 * n + 4
         |)
         |SELECT day, CAST(lvls[pocidx + 1] AS INT) AS poc_level,
         |       CAST(lvls[hvai + 1] AS INT) AS hva_level,
         |       CAST(lvls[lvai + 1] AS INT) AS lva_level
         |FROM (SELECT *, row_number() OVER (PARTITION BY day ORDER BY iter DESC) AS rk FROM va)
         |WHERE rk = 1""".stripMargin,

    "vp_rolling_6h" -> withFp(
      s""", targets AS (SELECT DISTINCT bar_ts AS target_ts FROM fp2),
         |prof AS (
         |  SELECT t.target_ts AS bar_ts, f.level, CAST(sum(CAST((f.buy_volume + f.sell_volume) AS DECIMAL(18,6))) AS DOUBLE) AS volume
         |  FROM targets t JOIN fp2 f
         |    ON f.bar_ts <= t.target_ts AND f.bar_ts > t.target_ts - ${6L * iv}
         |  GROUP BY 1, 2
         |),
         |mx AS (SELECT bar_ts, max(volume) AS maxv FROM prof GROUP BY bar_ts),
         |poc AS (
         |  SELECT prof.bar_ts, min(level) AS poc_level
         |  FROM prof JOIN mx ON prof.bar_ts = mx.bar_ts AND prof.volume = mx.maxv
         |  GROUP BY prof.bar_ts
         |)
         |SELECT prof.bar_ts AS bar_ts, poc.poc_level,
         |  ${rd("CAST(sum(CAST((CASE WHEN level > poc_level THEN volume ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) / CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS pct_above_poc,
         |  ${rd("CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS total_volume
         |FROM prof JOIN poc ON prof.bar_ts = poc.bar_ts
         |GROUP BY prof.bar_ts, poc.poc_level""".stripMargin),

    "vp_developing_day" -> withFp(
      s""", f AS (SELECT *, bar_ts // 86400000000000 AS day FROM fp2),
         |targets AS (SELECT DISTINCT day AS tday, bar_ts AS target_ts FROM f),
         |prof AS (
         |  SELECT t.target_ts AS bar_ts, f.level, CAST(sum(CAST((f.buy_volume + f.sell_volume) AS DECIMAL(18,6))) AS DOUBLE) AS volume
         |  FROM targets t JOIN f ON f.day = t.tday AND f.bar_ts <= t.target_ts
         |  GROUP BY 1, 2
         |),
         |mx AS (SELECT bar_ts, max(volume) AS maxv FROM prof GROUP BY bar_ts),
         |poc AS (
         |  SELECT prof.bar_ts, min(level) AS poc_level
         |  FROM prof JOIN mx ON prof.bar_ts = mx.bar_ts AND prof.volume = mx.maxv
         |  GROUP BY prof.bar_ts
         |)
         |SELECT prof.bar_ts AS bar_ts, poc.poc_level,
         |  ${rd("CAST(sum(CAST((CASE WHEN level > poc_level THEN volume ELSE 0.0 END) AS DECIMAL(18,6))) AS DOUBLE) / CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS pct_above_poc,
         |  ${rd("CAST(sum(CAST((volume) AS DECIMAL(18,6))) AS DOUBLE)")} AS total_volume
         |FROM prof JOIN poc ON prof.bar_ts = poc.bar_ts
         |GROUP BY prof.bar_ts, poc.poc_level""".stripMargin)
  )
}
