package graft.queries

import graft.Tables
import graft.trades.Trades
import graft.bars.{EventBars, TimeBars}
import graft.features.{Ewm, Features}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Recursive/stateful operator coverage (SURVEY.md §2.4 indexers, §2.5 EW
  * family, §2.8 CUSUM) — SPARK SIDE runs the exact kernels (distributed
  * affine scans / ordered sequential kernels); the DuckDB oracle recomputes
  * the same quantities INDEPENDENTLY via truncated-tail windowed closed
  * forms (tail < 1e-13 ≪ the 1e-6 output rounding), so the oracle actually
  * validates the scan math instead of replaying it.
  */
object ScanQueries {

  private[queries] val span = 100
  private val q = 1.0 - 2.0 / (span + 1.0) // 0.98019801...
  private val K = 1500                     // q^K ≈ 8e-14
  private val wK = 600                     // Wilder (13/14)^600 ≈ e^-44
  private[queries] val hlSec = 3600.0
  private[queries] val hlCutNs = 108000000000000L   // 30 half-lives in ns
  private[queries] val volThr = 2000.37             // off the 0.1-decimal qty grid
  // Carry-path comparisons sit at (k+1)·thr, so the fraction must stay off
  // the 3-decimal price·qty grid for EVERY multiple: 0.06170771 is coprime
  // with 10 at 8 decimals — (k+1)·frac terminates at ≤3 decimals only when
  // (k+1) is a multiple of 1e5, far beyond any realistic bar count.
  private[queries] val dolThr = 200000.06170771

  private def trades(s: org.apache.spark.sql.SparkSession, dir: String) =
    Trades.fromEvents(Tables.events(s, dir))

  // Keyed threshold-bar twins: per-symbol streams are ~1/150th of the
  // unkeyed stream, so the thresholds scale down to yield O(3-100)
  // complete bars per symbol across sf0.01..sf0.1. Fractional parts keep
  // every compared cum off the 0.1-qty / 3-decimal-price·qty grids at
  // every multiple — the same tie-safety arguments as volThr/dolThr.
  private[queries] val symTickThr = 20
  private[queries] val symVolThr = 60.037
  private[queries] val symDolThr = 2000.06170771

  // Imbalance/run-bar expectations (the reference declares these indexers
  // but raises NotImplementedError — parameters are ours, documented):
  // EWMA weights and seeds chosen so the sf0.01 corpus yields O(100) bars
  // and the thresholds stay in a numerically comfortable range.
  private[queries] val imbAlphaT = 0.05
  private[queries] val imbAlphaB = 0.05
  private[queries] val imbInitT = 200.0
  private[queries] val imbInitB = 0.05
  private[queries] val runAlphaT = 0.05
  private[queries] val runAlphaP = 0.05
  private[queries] val runInitT = 200.0
  private[queries] val runInitP = 0.5
  // Value-measure (volume/dollar) imbalance & run variants — same EWMA
  // weights; seeds scaled to the corpus' measure magnitudes (mean qty ≈5.8,
  // mean price·qty ≈288 on the synthetic trades) so the machines start in
  // the adaptive regime rather than closing every row / never closing.
  private[queries] val valAlphaV = 0.05
  private[queries] val volImbInitB = 0.3
  // per-symbol streams are ~1/150th of the unkeyed stream — the keyed twin
  // seeds E_T at bar lengths that exist at that granularity
  private[queries] val symImbInitT = 20.0
  private[queries] val dolImbInitB = 20.0
  private[queries] val volRunInitV = 6.0
  private[queries] val dolRunInitV = 290.0

  private def bars5m(s: org.apache.spark.sql.SparkSession, dir: String) =
    TimeBars.ohlcv(Trades.fromEvents(Tables.events(s, dir)), 300)
      .withColumn("rn", row_number().over(Window.orderBy("bar_ts")))

  val queries: Map[String, QueryFn] = Map(
    // pandas ewm(span=100, adjust=True).mean() — exact distributed scan
    "ewma_scan" -> ((s, dir) =>
      Ewm.ewmaExact(trades(s, dir), "price", span)
        .select(col("ts"), col("id"), r6(col("ewma")).as("ewma"))),

    // Per-symbol EWMA through the AUTO keyed tier (Ewm.ewmaKeyed, None):
    // the measured pick at production spans is the range-partitioned
    // reset-affine scan (ordered by (symbol, ts, id), a=0 boundary
    // coefficients annihilate the previous key's state) — the SKEW-IMMUNE
    // layout: a heavy-hitter symbol splits across range partitions and
    // parallelizes WITHIN the key, where a per-key layout serializes it
    // on one task. The per-key window tier stays forced-only: its
    // O(10.4·span)/row HOF fold measured 40-230× the scan at span 100
    // (SKEW_SCALING r13).
    "ewma_sym_scan" -> ((s, dir) =>
      Ewm.ewmaKeyed(trades(s, dir), "price", span, keyCols = Seq("symbol"))
        .select(col("symbol"), col("ts"), col("id"),
          r6(col("ewma")).as("ewma"))),

    // ewm(span=100).std(bias=False) — exact distributed scan
    "ewms_scan" -> ((s, dir) =>
      Ewm.ewmsExact(trades(s, dir), "price", span)
        .select(col("ts"), col("id"), r6(col("ewms")).as("ewms"))),

    // keyed twin on the reset-affine scan (see ewma_sym_scan): per-symbol
    // EW-std through ONE range-partitioned (symbol, ts, id) scan —
    // skew-immune, no per-key shuffle
    "ewms_sym_scan" -> ((s, dir) =>
      Ewm.ewmsExact(trades(s, dir), "price", span, keyCols = Seq("symbol"))
        .select(col("symbol"), col("ts"), col("id"),
          r6(col("ewms")).as("ewms"))),

    // time-decay EW std (half-life 1h) on the irregular trades clock
    "ewmst_scan" -> ((s, dir) =>
      Ewm.ewmstExact(trades(s, dir), "price", hlSec)
        .select(col("ts"), col("id"), r6(col("ewmst")).as("ewmst"))),

    // zero-mean time-decay EW std over log-returns (core/volatility.py:72-136)
    // — the return is computed inside the scan from the prev-row handoff,
    // so the pipeline carries NO single-partition lag window
    "ewmst0_scan" -> ((s, dir) =>
      Ewm.ewmstMean0LogRet(trades(s, dir), "price", hlSec)
        .select(col("ts"), col("id"), r6(col("ewmst0")).as("ewmst0"))),

    // Wilder RSI(14): exact seeded kernel, reported on the steady-state
    // region (rn > 614) where the independent windowed oracle converges.
    "f_rsi_wilder14" -> ((s, dir) =>
      Ewm.rsiExact(bars5m(s, dir), "close", 14, Seq("bar_ts"))
        .where(col("rn") > 614)
        .select(col("bar_ts"), r6(col("rsi")).as("rsi14"))),

    // Per-symbol Wilder RSI(14) straight on the trade stream: the keyed
    // seqDouble path — kernel restarts per symbol, scan shuffles by symbol
    // (no single global sort). Oracle is the EXACT seeded closed form
    // (feasible: per-symbol streams are tiny at oracle scale).
    "f_rsi_wilder14_sym" -> ((s, dir) =>
      Ewm.rsiExact(trades(s, dir), "price", 14, Seq("ts", "id"),
          keyCols = Seq("symbol"))
        .select(col("symbol"), col("ts"), col("id"),
          r6(col("rsi")).as("rsi14"))),

    // Wilder-EMA ATR(14), steady-state region
    "f_atr_wilder14" -> ((s, dir) =>
      Ewm.atrWilderExact(bars5m(s, dir), 14, Seq("bar_ts"))
        .where(col("rn") > 614)
        .select(col("bar_ts"), r6(col("atr")).as("atr14"))),

    // ADX(14) double Wilder smoothing, steady-state region
    "f_adx14" -> ((s, dir) =>
      Ewm.adxExact(bars5m(s, dir), 14, Seq("bar_ts"))
        .where(col("rn") > 1250)
        .select(col("bar_ts"), r6(col("adx")).as("adx14"))),

    // Tick bars (every 300 trades) — closed-form bar ids, full oracle
    "tick_bars_300" -> ((s, dir) =>
      EventBars.tickBarsOhlcv(trades(s, dir), 300).select(
        col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
        r6(col("high")).as("high"), r6(col("low")).as("low"),
        r6(col("close")).as("close"), r6(col("volume")).as("volume"),
        col("trades"), r6(col("median_trade_size")).as("median_trade_size"),
        q6(col("vwap")).as("vwap"))),

    // Volume bars (reset, no carry) — reset-state scan, oracle-checked via
    // a recursive CTE over the CLOSES (one iteration per bar, not per row).
    // The threshold sits OFF the 0.1-decimal qty grid so cum can never land
    // exactly on it: the kernel's fresh per-bar sums and the oracle's
    // prefix-sum differences then always agree on every >= comparison.
    "volume_bars_2k" -> ((s, dir) =>
      EventBars.completeBars(EventBars.volumeBarIds(trades(s, dir), volThr))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))),

    // Dollar bars (carry remainder) — same oracle shape; the carry makes
    // the running total a pure prefix sum minus k·threshold. Threshold off
    // the 3-decimal price·qty grid for the same tie-safety reason.
    "dollar_bars_200k" -> ((s, dir) =>
      EventBars.completeBars(EventBars.dollarBarIds(trades(s, dir), dolThr))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))),

    // Keyed threshold-bar twins — the 100 TB layout for the three simple
    // event-bar indexers: counts/cums restart per symbol, the scan
    // shuffles by key instead of single-partitioning the stream, bar ids
    // are per-symbol sequences.
    "tick_bars_20_sym" -> ((s, dir) =>
      EventBars.tickBarsOhlcv(trades(s, dir), symTickThr, Seq("symbol"))
        .select(col("symbol"), col("bar_id"), col("bar_ts"),
          r6(col("open")).as("open"), r6(col("high")).as("high"),
          r6(col("low")).as("low"), r6(col("close")).as("close"),
          r6(col("volume")).as("volume"), col("trades"),
          r6(col("median_trade_size")).as("median_trade_size"),
          q6(col("vwap")).as("vwap"))),

    "volume_bars_60_sym" -> ((s, dir) =>
      EventBars.completeBars(
          EventBars.volumeBarIds(trades(s, dir), symVolThr, Seq("symbol")),
          Seq("symbol"))
        .select(col("symbol"), col("bar_id"), col("bar_ts"),
          r6(col("open")).as("open"), r6(col("close")).as("close"),
          r6(col("volume")).as("volume"), col("trades"))),

    "dollar_bars_2k_sym" -> ((s, dir) =>
      EventBars.completeBars(
          EventBars.dollarBarIds(trades(s, dir), symDolThr, Seq("symbol")),
          Seq("symbol"))
        .select(col("symbol"), col("bar_id"), col("bar_ts"),
          r6(col("open")).as("open"), r6(col("close")).as("close"),
          r6(col("volume")).as("volume"), col("trades"))),

    // Symmetric CUSUM event filter (constant threshold) — reset-state scan
    "cusum_events" -> ((s, dir) =>
      EventBars.cusumEventIds(
          trades(s, dir).withColumn("sigma", lit(2.0)), "sigma", 1.0, 1e-12)
        .where(col("is_event"))
        .select(col("ts"), col("id"), r6(col("price")).as("price"))),

    // Keyed CUSUM events — the 100 TB layout for the event filter: the
    // same reset state machine runs per symbol on the key-shuffled scan
    // (cusum sums, prev price and the equal-ts block rule all scoped to
    // the key run; each symbol's first row opens its own stream).
    // Constant λ keeps the keyed oracle fold's only transcendental at
    // ln(price ratio) — cusum_slack's const_sym variant certifies every
    // per-symbol fire decision clears the cross-engine ln noise.
    "cusum_events_sym" -> ((s, dir) =>
      EventBars.cusumEventIds(
          trades(s, dir).withColumn("sigma", lit(2.0)), "sigma", 1.0, 1e-12,
          keyCols = Seq("symbol"))
        .where(col("is_event"))
        .select(col("symbol"), col("ts"), col("id"),
          r6(col("price")).as("price"))),

    // Adaptive-threshold CUSUM events + per-event σ — the CUSUMBarKit
    // adaptive path and its get_sigma accessor (kit.py:140-181): σ from the
    // time-decay EW std of log-price, λ_i = max(2σ_i, 5e-4). Sequential
    // scan → rows-only driver check; ScanSpec covers the kernel.
    "cusum_events_adaptive" -> ((s, dir) => {
      val t = trades(s, dir).withColumn("__lp", log(col("price")))
      val withSigma = Ewm.ewmstExact(t, "__lp", hlSec, out = "sigma").drop("__lp")
      EventBars.cusumEventIds(withSigma, "sigma", 2.0, 5e-4)
        .where(col("is_event"))
        .select(col("ts"), col("id"), r6(col("price")).as("price"),
          r6(col("sigma")).as("sigma"))
    }),

    // Knife-edge guard for the CUSUM oracle family (round-3 advice): the
    // DuckDB fold recomputes s and λ with its own ln/exp and a truncated
    // σ tail, so hash parity is only trustworthy while every fire decision
    // clears the numeric noise. This row asserts the minimum |s−λ| slack
    // across ALL compared rows exceeds 1e-9 (≫ the 1e-13 truncation bound)
    // for both the constant and adaptive paths — a future dataset landing
    // near a threshold fails HERE loudly instead of hash-mismatching the
    // cusum_* rows mysteriously.
    "cusum_slack" -> ((s, dir) => {
      val tc = trades(s, dir)
      // coalesce: a dataset with NO compared rows (all slack NaN → min NULL)
      // is vacuously safe — emit TRUE, not a NULL that hash-mismatches the
      // oracle and reads as a mystery failure
      def slackOk = coalesce(col("ms") > 1e-9, lit(true)).as("slack_ok")
      val constSlack = EventBars.cusumEventIds(
          tc.withColumn("sigma", lit(2.0)), "sigma", 1.0, 1e-12,
          emitSlack = true)
        .agg(min(when(!isnan(col("slack")), col("slack"))).as("ms"))
        .select(lit("const").as("variant"), slackOk)
      val t = tc.withColumn("__lp", log(col("price")))
      val withSigma = Ewm.ewmstExact(t, "__lp", hlSec, out = "sigma").drop("__lp")
      val adaptSlack = EventBars.cusumEventIds(withSigma, "sigma", 2.0, 5e-4,
          emitSlack = true)
        .agg(min(when(!isnan(col("slack")), col("slack"))).as("ms"))
        .select(lit("adaptive").as("variant"), slackOk)
      // keyed machine: per-symbol fire decisions must clear the same margin
      val symSlack = EventBars.cusumEventIds(
          tc.withColumn("sigma", lit(2.0)), "sigma", 1.0, 1e-12,
          keyCols = Seq("symbol"), emitSlack = true)
        .agg(min(when(!isnan(col("slack")), col("slack"))).as("ms"))
        .select(lit("const_sym").as("variant"), slackOk)
      constSlack.unionByName(adaptSlack).unionByName(symSlack)
    }),

    // CUSUM event bars (§2.4 _cusum_bar_indexer) with the reference's
    // ADAPTIVE threshold (bar/kit.py:140-181): per-row σ from the
    // time-decay EW std of log-price, λ_i = max(mult·σ_i, floor) with the
    // reference defaults mult=2, floor=5e-4. Bar k = trades in
    // (event_{k-1}, event_k]; the trailing partial bar is dropped.
    "cusum_bars" -> ((s, dir) => {
      val t = trades(s, dir).withColumn("__lp", log(col("price")))
      val withSigma = Ewm.ewmstExact(t, "__lp", hlSec, out = "sigma").drop("__lp")
      val ev = EventBars.cusumEventIds(withSigma, "sigma", 2.0, 5e-4)
        .drop("sigma")
      val before = Window.orderBy("ts", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ids = ev.withColumn("bar_id",
        coalesce(sum(col("is_event").cast("long")).over(before), lit(0L)))
      val complete = ids.groupBy("bar_id")
        .agg(max(col("is_event")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 1))
        .join(complete.select("bar_id"), Seq("bar_id"))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))
    }),

    // Keyed CUSUM bars — per-symbol event boundaries (constant λ like
    // cusum_events_sym; the keyed window assigns bar k = trades in
    // (event_{k-1}, event_k] within the symbol, trailing partials drop).
    "cusum_bars_sym" -> ((s, dir) => {
      val ev = EventBars.cusumEventIds(
          trades(s, dir).withColumn("sigma", lit(2.0)), "sigma", 1.0, 1e-12,
          keyCols = Seq("symbol"))
        .drop("sigma")
      val before = Window.partitionBy("symbol").orderBy("ts", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ids = ev.withColumn("bar_id",
        coalesce(sum(col("is_event").cast("long")).over(before), lit(0L)))
      val complete = ids.groupBy("symbol", "bar_id")
        .agg(max(col("is_event")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 1), Seq("symbol"))
        .join(complete.select("symbol", "bar_id"), Seq("symbol", "bar_id"))
        .select(col("symbol"), col("bar_id"), col("bar_ts"),
          r6(col("open")).as("open"), r6(col("high")).as("high"),
          r6(col("low")).as("low"), r6(col("close")).as("close"),
          r6(col("volume")).as("volume"), col("trades"))
    }),

    // TICK IMBALANCE bars (§2.4 `_imbalance_bar_indexer` — declared but
    // NotImplementedError in the reference; AFML §2.3.2.1 with documented
    // choices, see EventBars.imbalanceBarIds). The DuckDB oracle replays
    // the same fold via list_reduce; every op in the recursion is an
    // exactly-rounded IEEE op (no transcendentals), so parity is
    // bit-exact by construction — no cusum-style slack guard needed.
    "imbalance_bars" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir))
      val ids = EventBars.imbalanceBarIds(sided, imbAlphaT, imbAlphaB,
        imbInitT, imbInitB)
      val complete = ids.groupBy("bar_id")
        .agg(max(col("bar_closed")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 0))
        .join(complete.select("bar_id"), Seq("bar_id"))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))
    }),

    // TICK RUN bars (§2.4 `_run_bar_indexer` — the companion declared-but-
    // unimplemented indexer; AFML §2.3.2.2, see EventBars.runBarIds).
    "run_bars" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir))
      val ids = EventBars.runBarIds(sided, runAlphaT, runAlphaP,
        runInitT, runInitP)
      val complete = ids.groupBy("bar_id")
        .agg(max(col("bar_closed")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 0))
        .join(complete.select("bar_id"), Seq("bar_id"))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))
    }),

    // VOLUME / DOLLAR IMBALANCE bars — AFML §2.3.2.1's b_t·v_t measures on
    // the same machine (EventBars.valueImbalanceBarIds); same IEEE-exact
    // list_reduce oracle parity as the tick variant.
    "volume_imbalance_bars" ->
      valueImbalanceQuery(dollar = false, volImbInitB),
    "dollar_imbalance_bars" ->
      valueImbalanceQuery(dollar = true, dolImbInitB),

    // Bar-config round-trip (§2.10 serialize-everything parity): the
    // volume-imbalance machine reconstructed from its JSON config
    // (BarSpec.fromJson ∘ toJson) must reproduce volume_imbalance_bars
    // bit-for-bit — the gate shares that oracle text, so any config
    // field dropped or misparsed in the codec is a hash mismatch.
    "bar_config_roundtrip" -> ((s, dir) => {
      import graft.features.BarSpec
      val spec = BarSpec.ValueImbalanceBars(dollar = false, imbAlphaT,
        imbAlphaB, imbInitT, volImbInitB)
      val parsed = BarSpec.fromJson(spec.toJson)
      require(parsed == spec && parsed.toJson == spec.toJson,
        "bar config json round-trip drift")
      val sided = Trades.withTickRuleSide(trades(s, dir))
      val ids = parsed.build(sided)
      val complete = ids.groupBy("bar_id")
        .agg(max(col("bar_closed")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 0))
        .join(complete.select("bar_id"), Seq("bar_id"))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))
    }),

    // VOLUME / DOLLAR RUN bars — AFML §2.3.2.2's value runs,
    // θ = max(Σ_buy v, Σ_sell v) vs E_T·max(P·E[v|buy], (1−P)·E[v|sell])
    // (EventBars.valueRunBarIds).
    "volume_run_bars" -> valueRunQuery(dollar = false, volRunInitV),
    "dollar_run_bars" -> valueRunQuery(dollar = true, dolRunInitV),

    // Keyed twins — the 100 TB layout: per-symbol tick rule, per-symbol
    // machine state (kernel restarts at key runs, scan shuffles by symbol
    // instead of single-partitioning the stream), per-symbol bar ids. The
    // oracle replays the key-run resets in one single-group fold (see
    // symValueImbalanceFoldCtes for why not per-group folds).
    "volume_imbalance_bars_sym" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir), Seq("symbol"))
      val ids = EventBars.valueImbalanceBarIds(sided, dollar = false,
        imbAlphaT, imbAlphaB, symImbInitT, volImbInitB, keyCols = Seq("symbol"))
      keyedCompleteBars(ids)
    }),

    "dollar_imbalance_bars_sym" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir), Seq("symbol"))
      val ids = EventBars.valueImbalanceBarIds(sided, dollar = true,
        imbAlphaT, imbAlphaB, symImbInitT, dolImbInitB, keyCols = Seq("symbol"))
      keyedCompleteBars(ids)
    }),

    "dollar_run_bars_sym" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir), Seq("symbol"))
      val ids = EventBars.valueRunBarIds(sided, dollar = true,
        runAlphaT, runAlphaP, valAlphaV, symImbInitT, runInitP, dolRunInitV,
        keyCols = Seq("symbol"))
      keyedCompleteBars(ids)
    }),

    "volume_run_bars_sym" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir), Seq("symbol"))
      val ids = EventBars.valueRunBarIds(sided, dollar = false,
        runAlphaT, runAlphaP, valAlphaV, symImbInitT, runInitP, volRunInitV,
        keyCols = Seq("symbol"))
      keyedCompleteBars(ids)
    }),

    "imbalance_bars_sym" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir), Seq("symbol"))
      val ids = EventBars.imbalanceBarIds(sided, imbAlphaT, imbAlphaB,
        symImbInitT, imbInitB, keyCols = Seq("symbol"))
      keyedCompleteBars(ids)
    }),

    "run_bars_sym" -> ((s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir), Seq("symbol"))
      val ids = EventBars.runBarIds(sided, runAlphaT, runAlphaP,
        symImbInitT, runInitP, keyCols = Seq("symbol"))
      keyedCompleteBars(ids)
    })
  )

  private[queries] def keyedCompleteBars(ids: org.apache.spark.sql.DataFrame) =
    // one-pass: the complete flag rides EventBars.completeBars' single
    // aggregation (the old second agg + re-join only differed on the
    // bar_id = -1 group, which the >= 0 filter drops either way)
    EventBars.completeBars(ids, Seq("symbol"))
      .select(col("symbol"), col("bar_id"), col("bar_ts"),
        r6(col("open")).as("open"), r6(col("high")).as("high"),
        r6(col("low")).as("low"), r6(col("close")).as("close"),
        r6(col("volume")).as("volume"), col("trades"))

  private def valueImbalanceQuery(dollar: Boolean, initB: Double): QueryFn =
    (s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir))
      val ids = EventBars.valueImbalanceBarIds(sided, dollar, imbAlphaT,
        imbAlphaB, imbInitT, initB)
      val complete = ids.groupBy("bar_id")
        .agg(max(col("bar_closed")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 0))
        .join(complete.select("bar_id"), Seq("bar_id"))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))
    }

  private def valueRunQuery(dollar: Boolean, initV: Double): QueryFn =
    (s, dir) => {
      val sided = Trades.withTickRuleSide(trades(s, dir))
      val ids = EventBars.valueRunBarIds(sided, dollar, runAlphaT,
        runAlphaP, valAlphaV, runInitT, runInitP, initV)
      val complete = ids.groupBy("bar_id")
        .agg(max(col("bar_closed")).as("__closed")).where(col("__closed"))
      EventBars.ohlcvByBarId(ids.where(col("bar_id") >= 0))
        .join(complete.select("bar_id"), Seq("bar_id"))
        .select(col("bar_id"), col("bar_ts"), r6(col("open")).as("open"),
          r6(col("high")).as("high"), r6(col("low")).as("low"),
          r6(col("close")).as("close"), r6(col("volume")).as("volume"),
          col("trades"))
    }

  // ---------------------------------------------------------------------
  // Oracles: independent truncated-window recomputation in DuckDB
  // ---------------------------------------------------------------------

  /** Reset-on-trigger threshold bars as a recursive CTE over the CLOSES:
    * each iteration binary-searches the next close in the prefix-sum table,
    * so the recursion depth is the bar count (~30), not the row count.
    * No-carry state is `pre - pre(last close)`; carry state is
    * `pre - k·threshold` (each close subtracts exactly the threshold).
    * Row 1 never closes (crn starts at 1); the trailing partial bar never
    * materializes (bars join on consecutive close pairs).
    */
  private def thresholdBarsOracle(measure: String, thr: Double, carry: Boolean): String = {
    val cond = if (carry) s"pre - c.k * ${D(thr)}" else "pre - c.cpre"
    s"""WITH RECURSIVE $tradesCte,
       |p AS (
       |  SELECT ts, id, price, qty, row_number() OVER (ORDER BY ts, id) AS rn,
       |         sum($measure) OVER (ORDER BY ts, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
       |  FROM trades
       |),
       |closes AS (
       |  SELECT CAST(0 AS BIGINT) AS k, CAST(1 AS BIGINT) AS crn, CAST(0.0 AS DOUBLE) AS cpre
       |  UNION ALL
       |  SELECT c.k + 1, nx.rn, nx.pre
       |  FROM closes c JOIN p nx ON nx.rn = (
       |    SELECT min(rn) FROM p WHERE rn > c.crn AND $cond >= ${D(thr)}
       |  )
       |),
       |bars AS (
       |  SELECT c1.k - 1 AS bar_id, p.ts, p.id, p.price, p.qty
       |  FROM p, closes c0, closes c1
       |  WHERE c1.k = c0.k + 1 AND p.rn > c0.crn AND p.rn <= c1.crn
       |)
       |SELECT CAST(bar_id AS BIGINT) AS bar_id, max(ts) AS bar_ts,
       |  ${rd("first(price ORDER BY ts, id)")} AS open,
       |  ${rd("last(price ORDER BY ts, id)")} AS close,
       |  ${rd("sum(qty)")} AS volume,
       |  CAST(count(*) AS BIGINT) AS trades
       |FROM bars GROUP BY bar_id""".stripMargin
  }

  /** Keyed [[thresholdBarsOracle]]: per-symbol prefix sums and a single
    * recursive CTE advancing every symbol's close chain independently
    * (each recursion step finds the next close for each still-active
    * symbol; depth = max bars per symbol). Mirrors the kernel's key-run
    * reset: each symbol's row 1 is the excluded seed trade whose measure
    * still primes the first bar's cum, exactly like the unkeyed row 0.
    */
  private def symThresholdBarsOracle(measure: String, thr: Double,
                                     carry: Boolean): String = {
    val cond = if (carry) s"pre - c.k * ${D(thr)}" else "pre - c.cpre"
    s"""WITH RECURSIVE $tradesCte,
       |p AS (
       |  SELECT ts, id, price, qty, symbol,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, id) AS rn,
       |         sum($measure) OVER (PARTITION BY symbol ORDER BY ts, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
       |  FROM trades
       |),
       |closes AS (
       |  SELECT symbol, CAST(0 AS BIGINT) AS k, CAST(1 AS BIGINT) AS crn,
       |         CAST(0.0 AS DOUBLE) AS cpre
       |  FROM (SELECT DISTINCT symbol FROM trades)
       |  UNION ALL
       |  SELECT c.symbol, c.k + 1, nx.rn, nx.pre
       |  FROM closes c JOIN p nx ON nx.symbol = c.symbol AND nx.rn = (
       |    SELECT min(rn) FROM p
       |    WHERE p.symbol = c.symbol AND rn > c.crn AND $cond >= ${D(thr)}
       |  )
       |),
       |bars AS (
       |  SELECT p.symbol, c1.k - 1 AS bar_id, p.ts, p.id, p.price, p.qty
       |  FROM p, closes c0, closes c1
       |  WHERE c0.symbol = p.symbol AND c1.symbol = p.symbol
       |    AND c1.k = c0.k + 1 AND p.rn > c0.crn AND p.rn <= c1.crn
       |)
       |SELECT CAST(symbol AS BIGINT) AS symbol, CAST(bar_id AS BIGINT) AS bar_id,
       |  max(ts) AS bar_ts,
       |  ${rd("first(price ORDER BY ts, id)")} AS open,
       |  ${rd("last(price ORDER BY ts, id)")} AS close,
       |  ${rd("sum(qty)")} AS volume,
       |  CAST(count(*) AS BIGINT) AS trades
       |FROM bars GROUP BY symbol, bar_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "volume_bars_2k" -> thresholdBarsOracle("qty", volThr, carry = false),
    "dollar_bars_200k" -> thresholdBarsOracle("price * qty", dolThr, carry = true),
    "volume_bars_60_sym" -> symThresholdBarsOracle("qty", symVolThr, carry = false),
    "dollar_bars_2k_sym" -> symThresholdBarsOracle("price * qty", symDolThr, carry = true),

    "tick_bars_20_sym" ->
      s"""WITH $tradesCte,
         |ids AS (
         |  SELECT *, rn0 // $symTickThr AS bar_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ts, id) - 1 AS rn0 FROM trades
         |  ) WHERE rn0 >= 1
         |)
         |SELECT CAST(symbol AS BIGINT) AS symbol, bar_id, max(ts) AS bar_ts,
         |       ${rd("first(price ORDER BY ts, id)")} AS open,
         |       ${rd("max(price)")} AS high, ${rd("min(price)")} AS low,
         |       ${rd("last(price ORDER BY ts, id)")} AS close, ${rd("sum(qty)")} AS volume,
         |       CAST(count(*) AS BIGINT) AS trades,
         |       ${rd("median(qty)")} AS median_trade_size,
         |       ${q6Sql(s"${m6Sql("price * qty")} / ${m6Sql("qty")}")} AS vwap
         |FROM ids GROUP BY symbol, bar_id
         |HAVING count(*) = $symTickThr OR (bar_id = 0 AND count(*) = ${symTickThr - 1})""".stripMargin,

    "cusum_bars_sym" ->
      s"""WITH $tradesCte,
         |${symCusumConstFoldCtes(2.0, 1.0, 1e-12)},
         |withids AS (
         |  SELECT p.symbol, p.ts, p.id, p.price, p.qty, p.rn,
         |         (ev.rn IS NOT NULL) AS is_event,
         |         coalesce(sum(CASE WHEN ev.rn IS NOT NULL THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY p.symbol ORDER BY p.rn
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bar_id
         |  FROM p LEFT JOIN ev ON p.symbol = ev.symbol AND p.rn = ev.rn
         |),
         |complete AS (
         |  SELECT symbol, bar_id FROM withids WHERE bar_id >= 1
         |  GROUP BY symbol, bar_id HAVING bool_or(is_event)
         |)
         |SELECT CAST(w.symbol AS BIGINT) AS symbol, CAST(w.bar_id AS BIGINT) AS bar_id,
         |  max(w.ts) AS bar_ts,
         |  ${rd("first(w.price ORDER BY w.ts, w.id)")} AS open,
         |  ${rd("max(w.price)")} AS high, ${rd("min(w.price)")} AS low,
         |  ${rd("last(w.price ORDER BY w.ts, w.id)")} AS close,
         |  ${rd("sum(w.qty)")} AS volume,
         |  CAST(count(*) AS BIGINT) AS trades
         |FROM withids w JOIN complete c ON w.symbol = c.symbol AND w.bar_id = c.bar_id
         |GROUP BY w.symbol, w.bar_id""".stripMargin,
    "ewma_scan" ->
      s"""WITH $tradesCte,
         |lw AS (
         |  SELECT ts, id,
         |         list(price) OVER (ORDER BY ts, id ROWS BETWEEN ${K - 1} PRECEDING AND CURRENT ROW) AS l
         |  FROM trades
         |)
         |SELECT ts, id, ${rd(s"list_sum(list_transform(l, (y, i) -> y * pow(${D(q)}, len(l) - i))) / ((1 - pow(${D(q)}, len(l))) / ${D(1.0 - q)})")} AS ewma
         |FROM lw""".stripMargin,

    // keyed twin: the K-truncated closed form PARTITIONed BY symbol — the
    // per-symbol tail truncation argument is identical (q^K ≈ 8e-14)
    "ewma_sym_scan" ->
      s"""WITH $tradesCte,
         |lw AS (
         |  SELECT symbol, ts, id,
         |         list(price) OVER (PARTITION BY symbol ORDER BY ts, id ROWS BETWEEN ${K - 1} PRECEDING AND CURRENT ROW) AS l
         |  FROM trades
         |)
         |SELECT symbol, ts, id, ${rd(s"list_sum(list_transform(l, (y, i) -> y * pow(${D(q)}, len(l) - i))) / ((1 - pow(${D(q)}, len(l))) / ${D(1.0 - q)})")} AS ewma
         |FROM lw""".stripMargin,

    "ewms_scan" ->
      s"""WITH $tradesCte,
         |lw AS (
         |  SELECT ts, id,
         |         list(price) OVER (ORDER BY ts, id ROWS BETWEEN ${K - 1} PRECEDING AND CURRENT ROW) AS l
         |  FROM trades
         |),
         |sums AS (
         |  SELECT ts, id,
         |    list_sum(list_transform(l, (y, i) -> y * pow(${D(q)}, len(l) - i))) AS sy,
         |    list_sum(list_transform(l, (y, i) -> y * y * pow(${D(q)}, len(l) - i))) AS syy,
         |    (1 - pow(${D(q)}, len(l))) / ${D(1.0 - q)} AS sw,
         |    (1 - pow(${D(q * q)}, len(l))) / ${D(1.0 - q * q)} AS sw2
         |  FROM lw
         |)
         |SELECT ts, id, ${rd("CASE WHEN sw - sw2 / sw > 0 THEN sqrt(greatest((syy / sw - (sy / sw) * (sy / sw)) * sw / (sw - sw2 / sw), 0.0)) END")} AS ewms
         |FROM sums""".stripMargin,

    // keyed twin: same truncated closed form PARTITIONed BY symbol
    "ewms_sym_scan" ->
      s"""WITH $tradesCte,
         |lw AS (
         |  SELECT symbol, ts, id,
         |         list(price) OVER (PARTITION BY symbol ORDER BY ts, id ROWS BETWEEN ${K - 1} PRECEDING AND CURRENT ROW) AS l
         |  FROM trades
         |),
         |sums AS (
         |  SELECT symbol, ts, id,
         |    list_sum(list_transform(l, (y, i) -> y * pow(${D(q)}, len(l) - i))) AS sy,
         |    list_sum(list_transform(l, (y, i) -> y * y * pow(${D(q)}, len(l) - i))) AS syy,
         |    (1 - pow(${D(q)}, len(l))) / ${D(1.0 - q)} AS sw,
         |    (1 - pow(${D(q * q)}, len(l))) / ${D(1.0 - q * q)} AS sw2
         |  FROM lw
         |)
         |SELECT symbol, ts, id, ${rd("CASE WHEN sw - sw2 / sw > 0 THEN sqrt(greatest((syy / sw - (sy / sw) * (sy / sw)) * sw / (sw - sw2 / sw), 0.0)) END")} AS ewms
         |FROM sums""".stripMargin,

    "ewmst_scan" ->
      s"""WITH $tradesCte,
         |a AS (
         |  SELECT ts, id, price,
         |    CASE WHEN lag(ts) OVER (ORDER BY ts, id) IS NULL THEN NULL
         |         ELSE 1 - exp(-((ts - lag(ts) OVER (ORDER BY ts, id)) / 1e9) / ${D(hlSec)}) END AS alpha
         |  FROM trades
         |),
         |lw AS (
         |  SELECT ts, id,
         |    list(alpha) OVER w AS la, list(price) OVER w AS ly, list(ts) OVER w AS lt
         |  FROM a
         |  WINDOW w AS (ORDER BY ts RANGE BETWEEN $hlCutNs PRECEDING AND CURRENT ROW)
         |),
         |sums AS (
         |  SELECT ts, id,
         |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS v,
         |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * x * exp(-2 * ((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS v2,
         |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * ly[i] * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS sy,
         |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * ly[i] * ly[i] * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS syy
         |  FROM lw
         |)
         |SELECT ts, id, ${rd(
             """CASE WHEN v > 0 THEN greatest(
               |  sqrt(CASE WHEN (v - v2 / v) > 0 AND (syy / v - (sy / v) * (sy / v)) > 0
               |            THEN (syy / v - (sy / v) * (sy / v)) * v / (v - v2 / v) ELSE 0.0 END),
               |  1e-12) END""".stripMargin)} AS ewmst
         |FROM sums""".stripMargin,

    "ewmst0_scan" ->
      s"""WITH $tradesCte,
         |a AS (
         |  SELECT ts, id,
         |    ln(price / lag(price) OVER (ORDER BY ts, id)) AS y,
         |    CASE WHEN lag(ts) OVER (ORDER BY ts, id) IS NULL THEN NULL
         |         ELSE 1 - exp(-((ts - lag(ts) OVER (ORDER BY ts, id)) / 1e9) / ${D(hlSec)}) END AS alpha
         |  FROM trades
         |),
         |lw AS (
         |  SELECT ts, id,
         |    list(alpha) OVER w AS la, list(y) OVER w AS ly, list(ts) OVER w AS lt
         |  FROM a
         |  WINDOW w AS (ORDER BY ts RANGE BETWEEN $hlCutNs PRECEDING AND CURRENT ROW)
         |),
         |sums AS (
         |  SELECT ts, id,
         |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL OR ly[i] IS NULL OR isnan(ly[i]) THEN 0.0 ELSE x * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS v,
         |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL OR ly[i] IS NULL OR isnan(ly[i]) THEN 0.0 ELSE x * ly[i] * ly[i] * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS uu
         |  FROM lw
         |)
         |SELECT ts, id, ${rd("CASE WHEN v > 0 THEN greatest(sqrt(greatest(uu / v, 0.0)), 1e-12) END")} AS ewmst0
         |FROM sums""".stripMargin,

    // Exact seeded closed form per symbol: avgG_i = (1/w)·Σ_j g_j·q^(i−max(j,w))
    // — the q^(i−w) factor on the first w diffs IS the simple-mean seed
    // rolled forward. Per-symbol streams are ~67 rows at oracle scale, so
    // the O(n²) list form is fine (the engine runs the O(n) keyed kernel).
    "f_rsi_wilder14_sym" -> {
      val wq = 13.0 / 14.0
      s"""WITH $tradesCte,
         |d AS (
         |  SELECT symbol, ts, id,
         |         price - lag(price) OVER (PARTITION BY symbol ORDER BY ts, id) AS diff
         |  FROM trades
         |),
         |g AS (
         |  SELECT symbol, ts, id,
         |    list(CASE WHEN diff IS NULL THEN NULL ELSE greatest(diff, 0.0) END) OVER w AS lg,
         |    list(CASE WHEN diff IS NULL THEN NULL ELSE greatest(-diff, 0.0) END) OVER w AS ll
         |  FROM d
         |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |),
         |sums AS (
         |  SELECT symbol, ts, id, len(lg) AS n,
         |    list_sum(list_transform(lg, (x, i) -> CASE WHEN i >= 2
         |      THEN x * pow(${D(wq)}, len(lg) - 1 - greatest(i - 1, 14)) ELSE 0.0 END)) / 14 AS ag,
         |    list_sum(list_transform(ll, (x, i) -> CASE WHEN i >= 2
         |      THEN x * pow(${D(wq)}, len(ll) - 1 - greatest(i - 1, 14)) ELSE 0.0 END)) / 14 AS al
         |  FROM g
         |)
         |SELECT symbol, ts, id,
         |  CASE WHEN n >= 15 THEN ${rd("CASE WHEN al > 0 THEN 100 - 100 / (1 + ag / al) END")} END AS rsi14
         |FROM sums""".stripMargin
    },

    "f_rsi_wilder14" -> {
      val wq = 13.0 / 14.0
      s"""WITH $tradesCte, ${barsCte(300)},
         |d AS (
         |  SELECT bar_ts, row_number() OVER (ORDER BY bar_ts) AS rn,
         |         close - lag(close) OVER (ORDER BY bar_ts) AS diff
         |  FROM bars
         |),
         |gl AS (
         |  SELECT bar_ts, rn,
         |    CASE WHEN diff IS NULL THEN NULL WHEN diff > 0 THEN diff ELSE 0.0 END AS g,
         |    CASE WHEN diff IS NULL THEN NULL WHEN diff < 0 THEN -diff ELSE 0.0 END AS l
         |  FROM d
         |),
         |lw AS (
         |  SELECT bar_ts, rn,
         |    list(g) OVER w AS lg, list(l) OVER w AS ll
         |  FROM gl
         |  WINDOW w AS (ORDER BY bar_ts ROWS BETWEEN ${wK - 1} PRECEDING AND CURRENT ROW)
         |),
         |sums AS (
         |  SELECT bar_ts, rn,
         |    list_sum(list_transform(lg, (x, i) -> coalesce(x, 0.0) * pow(${D(wq)}, len(lg) - i))) / 14 AS ag,
         |    list_sum(list_transform(ll, (x, i) -> coalesce(x, 0.0) * pow(${D(wq)}, len(ll) - i))) / 14 AS al
         |  FROM lw
         |)
         |SELECT bar_ts, ${rd("CASE WHEN al > 0 THEN 100 - 100 / (1 + ag / al) END")} AS rsi14
         |FROM sums WHERE rn > 614""".stripMargin
    },

    "f_atr_wilder14" -> {
      val wq = 13.0 / 14.0
      s"""WITH $tradesCte, ${barsCte(300)},
         |t AS (
         |  SELECT bar_ts, row_number() OVER (ORDER BY bar_ts) AS rn,
         |    coalesce(greatest(high - low, abs(high - lag(close) OVER (ORDER BY bar_ts)),
         |                      abs(low - lag(close) OVER (ORDER BY bar_ts))), high - low) AS tr
         |  FROM bars
         |),
         |lw AS (
         |  SELECT bar_ts, rn, list(tr) OVER w AS ltr
         |  FROM t WINDOW w AS (ORDER BY bar_ts ROWS BETWEEN ${wK - 1} PRECEDING AND CURRENT ROW)
         |)
         |SELECT bar_ts, ${rd(s"list_sum(list_transform(ltr, (x, i) -> x * pow(${D(wq)}, len(ltr) - i))) / 14")} AS atr14
         |FROM lw WHERE rn > 614""".stripMargin
    },

    "f_adx14" -> {
      val wq = 13.0 / 14.0
      s"""WITH $tradesCte, ${barsCte(300)},
         |l1 AS (
         |  SELECT bar_ts, row_number() OVER (ORDER BY bar_ts) AS rn,
         |    coalesce(greatest(high - low, abs(high - lag(close) OVER (ORDER BY bar_ts)),
         |                      abs(low - lag(close) OVER (ORDER BY bar_ts))), 0.0) AS tr,
         |    CASE WHEN (high - lag(high) OVER (ORDER BY bar_ts)) > (lag(low) OVER (ORDER BY bar_ts) - low)
         |          AND (high - lag(high) OVER (ORDER BY bar_ts)) > 0
         |         THEN high - lag(high) OVER (ORDER BY bar_ts) ELSE 0.0 END AS pdm,
         |    CASE WHEN (lag(low) OVER (ORDER BY bar_ts) - low) > (high - lag(high) OVER (ORDER BY bar_ts))
         |          AND (lag(low) OVER (ORDER BY bar_ts) - low) > 0
         |         THEN lag(low) OVER (ORDER BY bar_ts) - low ELSE 0.0 END AS mdm
         |  FROM bars
         |),
         |l2a AS (
         |  SELECT bar_ts, rn, list(tr) OVER w AS ltr, list(pdm) OVER w AS lpdm, list(mdm) OVER w AS lmdm
         |  FROM l1 WINDOW w AS (ORDER BY bar_ts ROWS BETWEEN ${wK - 1} PRECEDING AND CURRENT ROW)
         |),
         |l2 AS (
         |  SELECT bar_ts, rn,
         |    list_sum(list_transform(ltr, (x, i) -> x * pow(${D(wq)}, len(ltr) - i))) AS str,
         |    list_sum(list_transform(lpdm, (x, i) -> x * pow(${D(wq)}, len(lpdm) - i))) AS spdm,
         |    list_sum(list_transform(lmdm, (x, i) -> x * pow(${D(wq)}, len(lmdm) - i))) AS smdm
         |  FROM l2a
         |),
         |l3 AS (
         |  SELECT bar_ts, rn,
         |    CASE WHEN str > 0 AND (100 * spdm / str + 100 * smdm / str) > 0
         |         THEN 100 * abs(100 * spdm / str - 100 * smdm / str) / (100 * spdm / str + 100 * smdm / str)
         |         ELSE 0.0 END AS dx
         |  FROM l2
         |),
         |l4a AS (
         |  SELECT bar_ts, rn, list(dx) OVER w AS ldx
         |  FROM l3 WINDOW w AS (ORDER BY bar_ts ROWS BETWEEN ${wK - 1} PRECEDING AND CURRENT ROW)
         |),
         |l4 AS (
         |  SELECT bar_ts, rn,
         |    list_sum(list_transform(ldx, (x, i) -> x * pow(${D(wq)}, len(ldx) - i))) / 14 AS adx
         |  FROM l4a
         |)
         |SELECT bar_ts, ${rd("adx")} AS adx14 FROM l4 WHERE rn > 1250""".stripMargin
    },

    "tick_bars_300" ->
      s"""WITH $tradesCte,
         |ids AS (
         |  SELECT *, rn0 // 300 AS bar_id FROM (
         |    SELECT *, row_number() OVER (ORDER BY ts, id) - 1 AS rn0 FROM trades
         |  ) WHERE rn0 >= 1
         |)
         |SELECT bar_id, max(ts) AS bar_ts, ${rd("first(price ORDER BY ts, id)")} AS open,
         |       ${rd("max(price)")} AS high, ${rd("min(price)")} AS low,
         |       ${rd("last(price ORDER BY ts, id)")} AS close, ${rd("sum(qty)")} AS volume,
         |       CAST(count(*) AS BIGINT) AS trades,
         |       ${rd("median(qty)")} AS median_trade_size,
         |       ${q6Sql(s"${m6Sql("price * qty")} / ${m6Sql("qty")}")} AS vwap
         |FROM ids GROUP BY bar_id
         |HAVING count(*) = 300 OR (bar_id = 0 AND count(*) = 299)""".stripMargin,

    "cusum_events" ->
      s"""WITH $tradesCte,
         |${cusumSigmaConstCte(2.0)},
         |${cusumFoldCtes(1.0, 1e-12)}
         |SELECT p.ts, p.id, ${rd("p.price")} AS price
         |FROM p JOIN ev USING (rn)""".stripMargin,

    "cusum_events_sym" ->
      s"""WITH $tradesCte,
         |${symCusumConstFoldCtes(2.0, 1.0, 1e-12)}
         |SELECT p.symbol, p.ts, p.id, ${rd("p.price")} AS price
         |FROM p JOIN ev ON p.symbol = ev.symbol AND p.rn = ev.rn""".stripMargin,

    // the Spark side computes the real min |s−λ| margin; the oracle just
    // asserts both variants clear it (see the cusum_slack query comment)
    "cusum_slack" ->
      """SELECT 'const' AS variant, TRUE AS slack_ok
        |UNION ALL
        |SELECT 'adaptive' AS variant, TRUE AS slack_ok
        |UNION ALL
        |SELECT 'const_sym' AS variant, TRUE AS slack_ok""".stripMargin,

    "cusum_events_adaptive" ->
      s"""WITH $tradesCte,
         |${cusumSigmaAdaptiveCte()},
         |${cusumFoldCtes(2.0, 5e-4)}
         |SELECT p.ts, p.id, ${rd("p.price")} AS price, ${rd("p.sigma")} AS sigma
         |FROM p JOIN ev USING (rn)""".stripMargin,

    "cusum_bars" ->
      s"""WITH $tradesCte,
         |${cusumSigmaAdaptiveCte()},
         |${cusumFoldCtes(2.0, 5e-4)},
         |withids AS (
         |  SELECT p.ts, p.id, p.price, p.qty, p.rn,
         |         (ev.rn IS NOT NULL) AS is_event,
         |         coalesce(sum(CASE WHEN ev.rn IS NOT NULL THEN 1 ELSE 0 END)
         |           OVER (ORDER BY p.rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bar_id
         |  FROM p LEFT JOIN ev ON p.rn = ev.rn
         |),
         |complete AS (
         |  SELECT bar_id FROM withids WHERE bar_id >= 1 GROUP BY bar_id HAVING bool_or(is_event)
         |)
         |SELECT CAST(w.bar_id AS BIGINT) AS bar_id, max(w.ts) AS bar_ts,
         |  ${rd("first(w.price ORDER BY w.ts, w.id)")} AS open,
         |  ${rd("max(w.price)")} AS high, ${rd("min(w.price)")} AS low,
         |  ${rd("last(w.price ORDER BY w.ts, w.id)")} AS close,
         |  ${rd("sum(w.qty)")} AS volume,
         |  CAST(count(*) AS BIGINT) AS trades
         |FROM withids w JOIN complete c USING (bar_id)
         |GROUP BY w.bar_id""".stripMargin,

    "imbalance_bars" ->
      s"""WITH $tradesCte, $sidedCte,
         |$imbalanceFoldCtes,
         |$foldBarsSql""".stripMargin,

    "run_bars" ->
      s"""WITH $tradesCte, $sidedCte,
         |$runFoldCtes,
         |$foldBarsSql""".stripMargin,

    "volume_imbalance_bars" ->
      s"""WITH $tradesCte, $sidedCte,
         |${valueImbalanceFoldCtes("qty", volImbInitB)},
         |$foldBarsSql""".stripMargin,

    // identical machine reconstructed from its JSON config — same oracle
    "bar_config_roundtrip" ->
      s"""WITH $tradesCte, $sidedCte,
         |${valueImbalanceFoldCtes("qty", volImbInitB)},
         |$foldBarsSql""".stripMargin,

    "dollar_imbalance_bars" ->
      s"""WITH $tradesCte, $sidedCte,
         |${valueImbalanceFoldCtes("price * qty", dolImbInitB)},
         |$foldBarsSql""".stripMargin,

    "volume_run_bars" ->
      s"""WITH $tradesCte, $sidedCte,
         |${valueRunFoldCtes("qty", volRunInitV)},
         |$foldBarsSql""".stripMargin,

    "dollar_run_bars" ->
      s"""WITH $tradesCte, $sidedCte,
         |${valueRunFoldCtes("price * qty", dolRunInitV)},
         |$foldBarsSql""".stripMargin,

    "volume_imbalance_bars_sym" ->
      s"""WITH $tradesCte, $symSidedCte,
         |${symValueImbalanceFoldCtes("qty", volImbInitB)},
         |$symFoldBarsSql""".stripMargin,

    "dollar_imbalance_bars_sym" ->
      s"""WITH $tradesCte, $symSidedCte,
         |${symValueImbalanceFoldCtes("price * qty", dolImbInitB)},
         |$symFoldBarsSql""".stripMargin,

    "dollar_run_bars_sym" ->
      s"""WITH $tradesCte, $symSidedCte,
         |${symValueRunFoldCtes("price * qty", dolRunInitV)},
         |$symFoldBarsSql""".stripMargin,

    "volume_run_bars_sym" ->
      s"""WITH $tradesCte, $symSidedCte,
         |${symValueRunFoldCtes("qty", volRunInitV)},
         |$symFoldBarsSql""".stripMargin,

    "imbalance_bars_sym" ->
      s"""WITH $tradesCte, $symSidedCte,
         |$symImbalanceFoldCtes,
         |$symFoldBarsSql""".stripMargin,

    "run_bars_sym" ->
      s"""WITH $tradesCte, $symSidedCte,
         |$symRunFoldCtes,
         |$symFoldBarsSql""".stripMargin
  )

  /** Keyed [[imbalanceFoldCtes]] — the tick-imbalance machine replayed as
    * ONE single-group key-run fold ordered (symbol, rn), same shape and
    * same DuckDB grouped-list_reduce reason as
    * [[symValueImbalanceFoldCtes]]; θ stays an exact BIGINT tick count.
    */
  private def symImbalanceFoldCtes: String = {
    val zB = "CAST(0 AS BIGINT)"
    val zD = "CAST(0 AS DOUBLE)"
    s"""p AS (
       |  SELECT ts, id, price, qty, symbol, side,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'sym': CAST(-1 AS BIGINT), 'rn': $zB, 'side': 0,
       |       'th': $zB, 'n': $zB, 'et': $zD, 'eb': $zD, 'ev': ''},
       |      list_sort(list({'sym': symbol, 'rn': rn, 'side': side,
       |                      'th': $zB, 'n': $zB, 'et': $zD, 'eb': $zD,
       |                      'ev': ''}))
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side,
       |         'th': $zB, 'n': $zB,
       |         'et': CAST(${D(symImbInitT)} AS DOUBLE),
       |         'eb': CAST(${D(imbInitB)} AS DOUBLE), 'ev': a.ev}
       |      WHEN CAST(abs(a.th + x.side) AS DOUBLE) >= a.et * a.eb THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side,
       |         'th': $zB, 'n': $zB,
       |         'et': ${D(1 - imbAlphaT)} * a.et + ${D(imbAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'eb': ${D(1 - imbAlphaB)} * a.eb + ${D(imbAlphaB)} * (CAST(abs(a.th + x.side) AS DOUBLE) / CAST(a.n + 1 AS DOUBLE)),
       |         'ev': a.ev || ',' || CAST(x.sym AS VARCHAR) || ':' || CAST(x.rn AS VARCHAR)}
       |      ELSE
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side,
       |         'th': a.th + x.side, 'n': a.n + 1, 'et': a.et, 'eb': a.eb,
       |         'ev': a.ev}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(string_split(e, ':')[1] AS BIGINT) AS symbol,
       |         CAST(string_split(e, ':')[2] AS BIGINT) AS rn
       |  FROM (
       |    SELECT unnest(string_split(ltrim(st.ev, ','), ',')) AS e
       |    FROM folded WHERE st.ev <> ''
       |  )
       |)""".stripMargin
  }

  /** Keyed [[runFoldCtes]] — the tick-run machine's key-run replay
    * (θ = max(buy count, sell count) vs E_T·max(P, 1−P)), single-group
    * fold ordered (symbol, rn) like [[symImbalanceFoldCtes]].
    */
  private def symRunFoldCtes: String = {
    val zB = "CAST(0 AS BIGINT)"
    val zD = "CAST(0 AS DOUBLE)"
    val incB = "CASE WHEN x.side > 0 THEN 1 ELSE 0 END"
    val incS = "CASE WHEN x.side < 0 THEN 1 ELSE 0 END"
    s"""p AS (
       |  SELECT ts, id, price, qty, symbol, side,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'sym': CAST(-1 AS BIGINT), 'rn': $zB, 'side': 0,
       |       'nb': $zB, 'ns': $zB, 'n': $zB, 'et': $zD, 'ep': $zD,
       |       'ev': ''},
       |      list_sort(list({'sym': symbol, 'rn': rn, 'side': side,
       |                      'nb': $zB, 'ns': $zB, 'n': $zB, 'et': $zD,
       |                      'ep': $zD, 'ev': ''}))
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side,
       |         'nb': $zB, 'ns': $zB, 'n': $zB,
       |         'et': CAST(${D(symImbInitT)} AS DOUBLE),
       |         'ep': CAST(${D(runInitP)} AS DOUBLE), 'ev': a.ev}
       |      WHEN CAST(greatest(a.nb + $incB, a.ns + $incS) AS DOUBLE) >=
       |           a.et * greatest(a.ep, CAST(1 AS DOUBLE) - a.ep) THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side,
       |         'nb': $zB, 'ns': $zB, 'n': $zB,
       |         'et': ${D(1 - runAlphaT)} * a.et + ${D(runAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'ep': ${D(1 - runAlphaP)} * a.ep + ${D(runAlphaP)} * (CAST(a.nb + $incB AS DOUBLE) / CAST(a.n + 1 AS DOUBLE)),
       |         'ev': a.ev || ',' || CAST(x.sym AS VARCHAR) || ':' || CAST(x.rn AS VARCHAR)}
       |      ELSE
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side,
       |         'nb': a.nb + $incB, 'ns': a.ns + $incS, 'n': a.n + 1,
       |         'et': a.et, 'ep': a.ep, 'ev': a.ev}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(string_split(e, ':')[1] AS BIGINT) AS symbol,
       |         CAST(string_split(e, ':')[2] AS BIGINT) AS rn
       |  FROM (
       |    SELECT unnest(string_split(ltrim(st.ev, ','), ',')) AS e
       |    FROM folded WHERE st.ev <> ''
       |  )
       |)""".stripMargin
  }

  /** Keyed [[valueRunFoldCtes]] — same single-group key-run replay shape as
    * [[symValueImbalanceFoldCtes]] (and for the same DuckDB 1.0 grouped
    * list_reduce reason), carrying the run machine's four expectations.
    */
  private def symValueRunFoldCtes(measure: String, initV: Double): String = {
    val zB = "CAST(0 AS BIGINT)"
    val zD = "CAST(0 AS DOUBLE)"
    val bsN = s"a.bs + CASE WHEN x.side > 0 THEN x.v ELSE $zD END"
    val ssN = s"a.ss + CASE WHEN x.side < 0 THEN x.v ELSE $zD END"
    val nbN = "a.nb + CASE WHEN x.side > 0 THEN 1 ELSE 0 END"
    val nsN = "a.ns + CASE WHEN x.side < 0 THEN 1 ELSE 0 END"
    s"""p AS (
       |  SELECT ts, id, price, qty, symbol, side, $measure AS v,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'sym': CAST(-1 AS BIGINT), 'rn': $zB, 'side': 0, 'v': $zD,
       |       'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB, 'n': $zB,
       |       'et': $zD, 'ep': $zD, 'evb': $zD, 'evs': $zD, 'ev': ''},
       |      list_sort(list({'sym': symbol, 'rn': rn, 'side': side, 'v': v,
       |                      'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB,
       |                      'n': $zB, 'et': $zD, 'ep': $zD, 'evb': $zD,
       |                      'evs': $zD, 'ev': ''}))
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side, 'v': x.v,
       |         'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB, 'n': $zB,
       |         'et': CAST(${D(symImbInitT)} AS DOUBLE),
       |         'ep': CAST(${D(runInitP)} AS DOUBLE),
       |         'evb': CAST(${D(initV)} AS DOUBLE),
       |         'evs': CAST(${D(initV)} AS DOUBLE), 'ev': a.ev}
       |      WHEN greatest($bsN, $ssN) >=
       |           a.et * greatest(a.ep * a.evb, (CAST(1 AS DOUBLE) - a.ep) * a.evs) THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side, 'v': x.v,
       |         'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB, 'n': $zB,
       |         'et': ${D(1 - runAlphaT)} * a.et + ${D(runAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'ep': ${D(1 - runAlphaP)} * a.ep + ${D(runAlphaP)} * (CAST($nbN AS DOUBLE) / CAST(a.n + 1 AS DOUBLE)),
       |         'evb': CASE WHEN $nbN > 0
       |                THEN ${D(1 - valAlphaV)} * a.evb + ${D(valAlphaV)} * (($bsN) / CAST($nbN AS DOUBLE))
       |                ELSE a.evb END,
       |         'evs': CASE WHEN $nsN > 0
       |                THEN ${D(1 - valAlphaV)} * a.evs + ${D(valAlphaV)} * (($ssN) / CAST($nsN AS DOUBLE))
       |                ELSE a.evs END,
       |         'ev': a.ev || ',' || CAST(x.sym AS VARCHAR) || ':' || CAST(x.rn AS VARCHAR)}
       |      ELSE
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side, 'v': x.v,
       |         'bs': $bsN, 'ss': $ssN, 'nb': $nbN, 'ns': $nsN, 'n': a.n + 1,
       |         'et': a.et, 'ep': a.ep, 'evb': a.evb, 'evs': a.evs,
       |         'ev': a.ev}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(string_split(e, ':')[1] AS BIGINT) AS symbol,
       |         CAST(string_split(e, ':')[2] AS BIGINT) AS rn
       |  FROM (
       |    SELECT unnest(string_split(ltrim(st.ev, ','), ',')) AS e
       |    FROM folded WHERE st.ev <> ''
       |  )
       |)""".stripMargin
  }

  /** Keyed [[valueImbalanceFoldCtes]]: the per-key mirror of the kernel's
    * key-run resets as ONE single-group list_reduce over ALL rows ordered
    * (symbol, rn) — a symbol's `rn = 1` row both marks the key boundary
    * (resetting θ/n AND re-seeding E_T/E_b, exactly the kernel's per-run
    * state) and is skipped as that run's excluded first trade. Fired rows
    * accumulate as `sym:rn` pairs. Same IEEE-exact parity argument as the
    * unkeyed fold.
    *
    * Deliberately NOT `GROUP BY symbol` + per-group folds: DuckDB 1.0's
    * list_reduce over a grouped list aggregate returned ONE group's fold
    * result for every group unless a pushed-down filter reduced it to a
    * single group (observed on this very query; minimal repros pass, so
    * the trigger is plan-shape-specific). The single-group fold is the
    * engine path every unkeyed fold gate has exercised at sf0.01 and
    * sf0.1 since round 8 began.
    */
  private def symValueImbalanceFoldCtes(measure: String, initB: Double): String = {
    val zB = "CAST(0 AS BIGINT)"
    val zD = "CAST(0 AS DOUBLE)"
    val sv = "CAST(x.side AS DOUBLE) * x.v"
    s"""p AS (
       |  SELECT ts, id, price, qty, symbol, side, $measure AS v,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'sym': CAST(-1 AS BIGINT), 'rn': $zB, 'side': 0, 'v': $zD,
       |       'th': $zD, 'n': $zB, 'et': $zD, 'eb': $zD, 'ev': ''},
       |      list_sort(list({'sym': symbol, 'rn': rn, 'side': side, 'v': v,
       |                      'th': $zD, 'n': $zB, 'et': $zD, 'eb': $zD,
       |                      'ev': ''}))
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side, 'v': x.v,
       |         'th': $zD, 'n': $zB,
       |         'et': CAST(${D(symImbInitT)} AS DOUBLE),
       |         'eb': CAST(${D(initB)} AS DOUBLE), 'ev': a.ev}
       |      WHEN abs(a.th + $sv) >= a.et * a.eb THEN
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side, 'v': x.v,
       |         'th': $zD, 'n': $zB,
       |         'et': ${D(1 - imbAlphaT)} * a.et + ${D(imbAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'eb': ${D(1 - imbAlphaB)} * a.eb + ${D(imbAlphaB)} * (abs(a.th + $sv) / CAST(a.n + 1 AS DOUBLE)),
       |         'ev': a.ev || ',' || CAST(x.sym AS VARCHAR) || ':' || CAST(x.rn AS VARCHAR)}
       |      ELSE
       |        {'sym': x.sym, 'rn': x.rn, 'side': x.side, 'v': x.v,
       |         'th': a.th + $sv, 'n': a.n + 1, 'et': a.et, 'eb': a.eb,
       |         'ev': a.ev}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(string_split(e, ':')[1] AS BIGINT) AS symbol,
       |         CAST(string_split(e, ':')[2] AS BIGINT) AS rn
       |  FROM (
       |    SELECT unnest(string_split(ltrim(st.ev, ','), ',')) AS e
       |    FROM folded WHERE st.ev <> ''
       |  )
       |)""".stripMargin
  }

  /** Keyed [[foldBarsSql]]: bar ids and completeness per symbol. */
  private def symFoldBarsSql: String =
    s"""withids AS (
       |  SELECT p.symbol, p.ts, p.id, p.price, p.qty, p.rn,
       |         (ev.rn IS NOT NULL) AS is_event,
       |         coalesce(sum(CASE WHEN ev.rn IS NOT NULL THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY p.symbol ORDER BY p.rn
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bar_id
       |  FROM p LEFT JOIN ev ON p.symbol = ev.symbol AND p.rn = ev.rn
       |  WHERE p.rn >= 2
       |),
       |complete AS (
       |  SELECT symbol, bar_id FROM withids GROUP BY symbol, bar_id
       |  HAVING bool_or(is_event)
       |)
       |SELECT CAST(w.symbol AS BIGINT) AS symbol,
       |  CAST(w.bar_id AS BIGINT) AS bar_id, max(w.ts) AS bar_ts,
       |  ${rd("first(w.price ORDER BY w.ts, w.id)")} AS open,
       |  ${rd("max(w.price)")} AS high, ${rd("min(w.price)")} AS low,
       |  ${rd("last(w.price ORDER BY w.ts, w.id)")} AS close,
       |  ${rd("sum(w.qty)")} AS volume,
       |  CAST(count(*) AS BIGINT) AS trades
       |FROM withids w JOIN complete c ON w.symbol = c.symbol AND w.bar_id = c.bar_id
       |GROUP BY w.symbol, w.bar_id""".stripMargin

  /** Shared bar construction over a fold's `p` (rows + rn) and `ev`
    * (closing rns): row 1 belongs to no bar, bar_id = prefix count of
    * closes, complete bars only — the imbalance/run tail (bar 0 IS a real
    * bar here, unlike cusum's pre-first-event convention).
    */
  private def foldBarsSql: String =
    s"""withids AS (
       |  SELECT p.ts, p.id, p.price, p.qty, p.rn,
       |         (ev.rn IS NOT NULL) AS is_event,
       |         coalesce(sum(CASE WHEN ev.rn IS NOT NULL THEN 1 ELSE 0 END)
       |           OVER (ORDER BY p.rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bar_id
       |  FROM p LEFT JOIN ev ON p.rn = ev.rn
       |  WHERE p.rn >= 2
       |),
       |complete AS (
       |  SELECT bar_id FROM withids GROUP BY bar_id HAVING bool_or(is_event)
       |)
       |SELECT CAST(w.bar_id AS BIGINT) AS bar_id, max(w.ts) AS bar_ts,
       |  ${rd("first(w.price ORDER BY w.ts, w.id)")} AS open,
       |  ${rd("max(w.price)")} AS high, ${rd("min(w.price)")} AS low,
       |  ${rd("last(w.price ORDER BY w.ts, w.id)")} AS close,
       |  ${rd("sum(w.qty)")} AS volume,
       |  CAST(count(*) AS BIGINT) AS trades
       |FROM withids w JOIN complete c USING (bar_id)
       |GROUP BY w.bar_id""".stripMargin

  /** Tick-imbalance fold oracle: DuckDB list_reduce replay of
    * `EventBars.imbalanceBarIds`' recursion. Every op is an
    * exactly-rounded IEEE op (+, ·, /, abs, compare — no
    * transcendentals), so the replay is BIT-IDENTICAL to the Spark
    * kernel — unlike the cusum family, whose ln/exp fork needs a slack
    * guard. Yields `p` (sided rows + rn) and `ev` (closing rns).
    */
  private def imbalanceFoldCtes: String = {
    val zB = "CAST(0 AS BIGINT)"
    s"""p AS (
       |  SELECT ts, id, price, qty, side,
       |         row_number() OVER (ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'th': $zB, 'n': $zB, 'et': CAST(${D(imbInitT)} AS DOUBLE),
       |       'eb': CAST(${D(imbInitB)} AS DOUBLE), 'ev': '',
       |       'side': 0, 'rn': $zB},
       |      list({'th': $zB, 'n': $zB, 'et': CAST(0 AS DOUBLE),
       |            'eb': CAST(0 AS DOUBLE), 'ev': '',
       |            'side': side, 'rn': rn} ORDER BY rn)
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'th': a.th, 'n': a.n, 'et': a.et, 'eb': a.eb, 'ev': a.ev,
       |         'side': x.side, 'rn': x.rn}
       |      WHEN CAST(abs(a.th + x.side) AS DOUBLE) >= a.et * a.eb THEN
       |        {'th': $zB, 'n': $zB,
       |         'et': ${D(1 - imbAlphaT)} * a.et + ${D(imbAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'eb': ${D(1 - imbAlphaB)} * a.eb + ${D(imbAlphaB)} * (CAST(abs(a.th + x.side) AS DOUBLE) / CAST(a.n + 1 AS DOUBLE)),
       |         'ev': a.ev || ',' || CAST(x.rn AS VARCHAR),
       |         'side': x.side, 'rn': x.rn}
       |      ELSE
       |        {'th': a.th + x.side, 'n': a.n + 1, 'et': a.et, 'eb': a.eb,
       |         'ev': a.ev, 'side': x.side, 'rn': x.rn}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(unnest(string_split(ltrim(st.ev, ','), ',')) AS BIGINT) AS rn
       |  FROM folded WHERE st.ev <> ''
       |)""".stripMargin
  }

  /** Tick-run fold oracle — same IEEE-exact replay for
    * `EventBars.runBarIds` (θ = max(buy count, sell count) vs
    * E_T·max(P, 1−P)).
    */
  private def runFoldCtes: String = {
    val zB = "CAST(0 AS BIGINT)"
    val incB = "CASE WHEN x.side > 0 THEN 1 ELSE 0 END"
    val incS = "CASE WHEN x.side < 0 THEN 1 ELSE 0 END"
    s"""p AS (
       |  SELECT ts, id, price, qty, side,
       |         row_number() OVER (ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'nb': $zB, 'ns': $zB, 'n': $zB, 'et': CAST(${D(runInitT)} AS DOUBLE),
       |       'ep': CAST(${D(runInitP)} AS DOUBLE), 'ev': '',
       |       'side': 0, 'rn': $zB},
       |      list({'nb': $zB, 'ns': $zB, 'n': $zB, 'et': CAST(0 AS DOUBLE),
       |            'ep': CAST(0 AS DOUBLE), 'ev': '',
       |            'side': side, 'rn': rn} ORDER BY rn)
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'nb': a.nb, 'ns': a.ns, 'n': a.n, 'et': a.et, 'ep': a.ep,
       |         'ev': a.ev, 'side': x.side, 'rn': x.rn}
       |      WHEN CAST(greatest(a.nb + $incB, a.ns + $incS) AS DOUBLE) >=
       |           a.et * greatest(a.ep, CAST(1 AS DOUBLE) - a.ep) THEN
       |        {'nb': $zB, 'ns': $zB, 'n': $zB,
       |         'et': ${D(1 - runAlphaT)} * a.et + ${D(runAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'ep': ${D(1 - runAlphaP)} * a.ep + ${D(runAlphaP)} * (CAST(a.nb + $incB AS DOUBLE) / CAST(a.n + 1 AS DOUBLE)),
       |         'ev': a.ev || ',' || CAST(x.rn AS VARCHAR),
       |         'side': x.side, 'rn': x.rn}
       |      ELSE
       |        {'nb': a.nb + $incB, 'ns': a.ns + $incS, 'n': a.n + 1,
       |         'et': a.et, 'ep': a.ep, 'ev': a.ev,
       |         'side': x.side, 'rn': x.rn}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(unnest(string_split(ltrim(st.ev, ','), ',')) AS BIGINT) AS rn
       |  FROM folded WHERE st.ev <> ''
       |)""".stripMargin
  }

  /** Value-imbalance fold oracle — the [[imbalanceFoldCtes]] replay with θ
    * a DOUBLE accumulating side·v (v = `measure`, precomputed once in `p`
    * exactly as the Scala kernel computes it once per row). Bit-identical
    * for the same reason: +, ·, /, abs, compare only, and side ∈ {−1,0,1}
    * makes the sign multiplication exact.
    */
  private def valueImbalanceFoldCtes(measure: String, initB: Double): String = {
    val zB = "CAST(0 AS BIGINT)"
    val zD = "CAST(0 AS DOUBLE)"
    val sv = "CAST(x.side AS DOUBLE) * x.v"
    s"""p AS (
       |  SELECT ts, id, price, qty, side, $measure AS v,
       |         row_number() OVER (ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'th': $zD, 'n': $zB, 'et': CAST(${D(imbInitT)} AS DOUBLE),
       |       'eb': CAST(${D(initB)} AS DOUBLE), 'ev': '',
       |       'side': 0, 'v': $zD, 'rn': $zB},
       |      list({'th': $zD, 'n': $zB, 'et': $zD, 'eb': $zD, 'ev': '',
       |            'side': side, 'v': v, 'rn': rn} ORDER BY rn)
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'th': a.th, 'n': a.n, 'et': a.et, 'eb': a.eb, 'ev': a.ev,
       |         'side': x.side, 'v': x.v, 'rn': x.rn}
       |      WHEN abs(a.th + $sv) >= a.et * a.eb THEN
       |        {'th': $zD, 'n': $zB,
       |         'et': ${D(1 - imbAlphaT)} * a.et + ${D(imbAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'eb': ${D(1 - imbAlphaB)} * a.eb + ${D(imbAlphaB)} * (abs(a.th + $sv) / CAST(a.n + 1 AS DOUBLE)),
       |         'ev': a.ev || ',' || CAST(x.rn AS VARCHAR),
       |         'side': x.side, 'v': x.v, 'rn': x.rn}
       |      ELSE
       |        {'th': a.th + $sv, 'n': a.n + 1, 'et': a.et, 'eb': a.eb,
       |         'ev': a.ev, 'side': x.side, 'v': x.v, 'rn': x.rn}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(unnest(string_split(ltrim(st.ev, ','), ',')) AS BIGINT) AS rn
       |  FROM folded WHERE st.ev <> ''
       |)""".stripMargin
  }

  /** Value-run fold oracle — replay of `EventBars.valueRunBarIds`:
    * θ = max(buy value sum, sell value sum) vs
    * E_T·max(P·E[v|buy], (1−P)·E[v|sell]); on close E[v|buy]/E[v|sell]
    * EWMA-update from the realized per-side means, kept unchanged when the
    * bar had no rows on that side. Same IEEE-exact argument (adding a
    * literal 0e0 to a finite non-negative double is exact, mirroring the
    * kernel's skipped accumulation).
    */
  private def valueRunFoldCtes(measure: String, initV: Double): String = {
    val zB = "CAST(0 AS BIGINT)"
    val zD = "CAST(0 AS DOUBLE)"
    val bsN = s"a.bs + CASE WHEN x.side > 0 THEN x.v ELSE $zD END"
    val ssN = s"a.ss + CASE WHEN x.side < 0 THEN x.v ELSE $zD END"
    val nbN = "a.nb + CASE WHEN x.side > 0 THEN 1 ELSE 0 END"
    val nsN = "a.ns + CASE WHEN x.side < 0 THEN 1 ELSE 0 END"
    s"""p AS (
       |  SELECT ts, id, price, qty, side, $measure AS v,
       |         row_number() OVER (ORDER BY ts, id) AS rn
       |  FROM sided
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB, 'n': $zB,
       |       'et': CAST(${D(runInitT)} AS DOUBLE),
       |       'ep': CAST(${D(runInitP)} AS DOUBLE),
       |       'evb': CAST(${D(initV)} AS DOUBLE),
       |       'evs': CAST(${D(initV)} AS DOUBLE), 'ev': '',
       |       'side': 0, 'v': $zD, 'rn': $zB},
       |      list({'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB, 'n': $zB,
       |            'et': $zD, 'ep': $zD, 'evb': $zD, 'evs': $zD, 'ev': '',
       |            'side': side, 'v': v, 'rn': rn} ORDER BY rn)
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN
       |        {'bs': a.bs, 'ss': a.ss, 'nb': a.nb, 'ns': a.ns, 'n': a.n,
       |         'et': a.et, 'ep': a.ep, 'evb': a.evb, 'evs': a.evs,
       |         'ev': a.ev, 'side': x.side, 'v': x.v, 'rn': x.rn}
       |      WHEN greatest($bsN, $ssN) >=
       |           a.et * greatest(a.ep * a.evb, (CAST(1 AS DOUBLE) - a.ep) * a.evs) THEN
       |        {'bs': $zD, 'ss': $zD, 'nb': $zB, 'ns': $zB, 'n': $zB,
       |         'et': ${D(1 - runAlphaT)} * a.et + ${D(runAlphaT)} * CAST(a.n + 1 AS DOUBLE),
       |         'ep': ${D(1 - runAlphaP)} * a.ep + ${D(runAlphaP)} * (CAST($nbN AS DOUBLE) / CAST(a.n + 1 AS DOUBLE)),
       |         'evb': CASE WHEN $nbN > 0
       |                THEN ${D(1 - valAlphaV)} * a.evb + ${D(valAlphaV)} * (($bsN) / CAST($nbN AS DOUBLE))
       |                ELSE a.evb END,
       |         'evs': CASE WHEN $nsN > 0
       |                THEN ${D(1 - valAlphaV)} * a.evs + ${D(valAlphaV)} * (($ssN) / CAST($nsN AS DOUBLE))
       |                ELSE a.evs END,
       |         'ev': a.ev || ',' || CAST(x.rn AS VARCHAR),
       |         'side': x.side, 'v': x.v, 'rn': x.rn}
       |      ELSE
       |        {'bs': $bsN, 'ss': $ssN, 'nb': $nbN, 'ns': $nsN, 'n': a.n + 1,
       |         'et': a.et, 'ep': a.ep, 'evb': a.evb, 'evs': a.evs,
       |         'ev': a.ev, 'side': x.side, 'v': x.v, 'rn': x.rn}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(unnest(string_split(ltrim(st.ev, ','), ',')) AS BIGINT) AS rn
       |  FROM folded WHERE st.ev <> ''
       |)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // CUSUM fold oracle (DuckDB list_reduce replay of the reset state machine)
  // ---------------------------------------------------------------------

  /** Constant per-row threshold source: `sig(ts, id, price, qty, sigma)`. */
  private def cusumSigmaConstCte(sigma: Double): String =
    s"sig AS (SELECT ts, id, price, qty, CAST(${D(sigma)} AS DOUBLE) AS sigma FROM trades)"

  /** Adaptive σ source mirroring the engine's `ewmstExact(log price)`
    * (bar/kit.py:140-181 semantics) via the same truncated-tail closed form
    * as the `ewmst_scan` oracle — tail < 1e-13, far inside the λ-comparison
    * margins observed on the synthetic data.
    */
  private[queries] def cusumSigmaAdaptiveCte(src: String = "trades"): String =
    s"""sa AS (
       |  SELECT ts, id, price, qty, ln(price) AS lp,
       |    CASE WHEN lag(ts) OVER (ORDER BY ts, id) IS NULL THEN NULL
       |         ELSE 1 - exp(-((ts - lag(ts) OVER (ORDER BY ts, id)) / 1e9) / ${D(hlSec)}) END AS alpha
       |  FROM $src
       |),
       |slw AS (
       |  SELECT ts, id, price, qty,
       |    list(alpha) OVER w AS la, list(lp) OVER w AS ly, list(ts) OVER w AS lt
       |  FROM sa
       |  WINDOW w AS (ORDER BY ts RANGE BETWEEN $hlCutNs PRECEDING AND CURRENT ROW)
       |),
       |ssums AS (
       |  SELECT ts, id, price, qty,
       |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS v,
       |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * x * exp(-2 * ((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS v2,
       |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * ly[i] * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS sy,
       |    list_sum(list_transform(la, (x, i) -> CASE WHEN x IS NULL THEN 0.0 ELSE x * ly[i] * ly[i] * exp(-((ts - lt[i]) / 1e9) / ${D(hlSec)}) END)) AS syy
       |  FROM slw
       |),
       |sig AS (
       |  SELECT ts, id, price, qty,
       |    CASE WHEN v > 0 THEN greatest(
       |      sqrt(CASE WHEN (v - v2 / v) > 0 AND (syy / v - (sy / v) * (sy / v)) > 0
       |                THEN (syy / v - (sy / v) * (sy / v)) * v / (v - v2 / v) ELSE 0.0 END),
       |      1e-12) END AS sigma
       |  FROM ssums
       |)""".stripMargin

  /** The CUSUM state machine (EventBars.cusumEventIds) replayed as ONE
    * DuckDB `list_reduce` fold over the (ts, id)-ordered rows — a genuine
    * sequential cross-check of the reset semantics, feasible because the
    * state is O(1) plus the fired-row list. DuckDB 1.0's list_reduce drops
    * nested-LIST accumulator state between steps (appends are lost), so the
    * fired rns accumulate in a VARCHAR and are split back out at the end.
    * Expects `sig(ts, id, price, qty, sigma)`; yields `p` (rn-numbered rows
    * with `blk` = not-last-of-equal-ts-block) and `ev(rn)` (fired rows).
    * λ = max(mult·σ_ffilled, floor); equal-ts blocks cannot close; the
    * first σ-valid row opens the stream; only the breaching side resets.
    */
  private[queries] def cusumFoldCtes(mult: Double, floor: Double): String = {
    val lam = s"greatest(${D(mult)} * coalesce(x.sig, a.ps), ${D(floor)})"
    val z = "CAST(0.0 AS DOUBLE)"
    val ret = "ln(x.price / a.pp)"
    def step(sp: String, sn: String, fire: Boolean) = {
      val ev = if (fire) "a.ev || ',' || CAST(x.rn AS VARCHAR)" else "a.ev"
      s"{'sp': $sp, 'sn': $sn, 'pp': x.price, 'ps': coalesce(x.sig, a.ps), 'seen': true, " +
        s"'ev': $ev, 'price': x.price, 'sig': x.sig, 'blk': x.blk, 'rn': x.rn}"
    }
    s"""p AS (
       |  SELECT ts, id, price, qty, sigma,
       |         row_number() OVER (ORDER BY ts, id) AS rn,
       |         coalesce(lead(ts) OVER (ORDER BY ts, id) = ts, false) AS blk
       |  FROM sig
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'sp': $z, 'sn': $z, 'pp': $z, 'ps': CAST(NULL AS DOUBLE), 'seen': false, 'ev': '',
       |       'price': $z, 'sig': CAST(NULL AS DOUBLE), 'blk': false, 'rn': CAST(0 AS BIGINT)},
       |      list({'sp': $z, 'sn': $z, 'pp': $z, 'ps': CAST(NULL AS DOUBLE), 'seen': false, 'ev': '',
       |            'price': price, 'sig': sigma, 'blk': blk, 'rn': rn} ORDER BY rn)
       |    ),
       |    (a, x) -> CASE
       |      WHEN NOT a.seen AND coalesce(x.sig, a.ps) IS NULL THEN
       |        {'sp': $z, 'sn': $z, 'pp': a.pp, 'ps': coalesce(x.sig, a.ps), 'seen': false,
       |         'ev': a.ev, 'price': x.price, 'sig': x.sig, 'blk': x.blk, 'rn': x.rn}
       |      WHEN NOT a.seen THEN
       |        ${step(z, z, fire = true)}
       |      WHEN NOT x.blk AND greatest($z, a.sp + $ret) >= $lam THEN
       |        ${step(z, s"least($z, a.sn + $ret)", fire = true)}
       |      WHEN NOT x.blk AND least($z, a.sn + $ret) <= -$lam THEN
       |        ${step(s"greatest($z, a.sp + $ret)", z, fire = true)}
       |      ELSE
       |        ${step(s"greatest($z, a.sp + $ret)", s"least($z, a.sn + $ret)", fire = false)}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(unnest(string_split(ltrim(st.ev, ','), ',')) AS BIGINT) AS rn
       |  FROM folded WHERE st.ev <> ''
       |)""".stripMargin
  }

  /** Keyed [[cusumFoldCtes]] specialized to a CONSTANT σ: the per-symbol
    * reset machine replayed as ONE single-group fold ordered (symbol, rn)
    * — a symbol's rn = 1 row re-seeds (s⁺, s⁻, prev price) and fires as
    * that run's opening event, exactly the kernel's key-run boundary
    * (the first σ-valid row of each run opens its stream). Same
    * single-group shape as [[symValueImbalanceFoldCtes]] and for the same
    * reason (DuckDB 1.0's grouped list_reduce returns one group's fold
    * for every group). Constant σ removes the NaN forward-fill state and
    * folds λ to a literal; the only transcendental left in the recursion
    * is ln(price ratio), so cusum_slack's const_sym variant certifies the
    * fire margins. Yields `p` (per-symbol rn + equal-ts blk) and
    * `ev(symbol, rn)`.
    */
  private def symCusumConstFoldCtes(sigma: Double, mult: Double,
                                    floor: Double): String = {
    val zB = "CAST(0 AS BIGINT)"
    val z = "CAST(0.0 AS DOUBLE)"
    val lam = s"greatest(${D(mult)} * ${D(sigma)}, ${D(floor)})"
    val ret = "ln(x.price / a.pp)"
    val fireEv =
      "a.ev || ',' || CAST(x.sym AS VARCHAR) || ':' || CAST(x.rn AS VARCHAR)"
    def step(sp: String, sn: String, ev: String) =
      s"{'sym': x.sym, 'rn': x.rn, 'price': x.price, 'blk': x.blk, " +
        s"'sp': $sp, 'sn': $sn, 'pp': x.price, 'ev': $ev}"
    s"""p AS (
       |  SELECT ts, id, price, qty, symbol,
       |         row_number() OVER (PARTITION BY symbol ORDER BY ts, id) AS rn,
       |         coalesce(lead(ts) OVER (PARTITION BY symbol ORDER BY ts, id) = ts, false) AS blk
       |  FROM trades
       |),
       |folded AS (
       |  SELECT list_reduce(
       |    list_prepend(
       |      {'sym': CAST(-1 AS BIGINT), 'rn': $zB, 'price': $z, 'blk': false,
       |       'sp': $z, 'sn': $z, 'pp': $z, 'ev': ''},
       |      list_sort(list({'sym': symbol, 'rn': rn, 'price': price,
       |                      'blk': blk, 'sp': $z, 'sn': $z, 'pp': $z,
       |                      'ev': ''}))
       |    ),
       |    (a, x) -> CASE
       |      WHEN x.rn = 1 THEN ${step(z, z, fireEv)}
       |      WHEN NOT x.blk AND greatest($z, a.sp + $ret) >= $lam THEN
       |        ${step(z, s"least($z, a.sn + $ret)", fireEv)}
       |      WHEN NOT x.blk AND least($z, a.sn + $ret) <= -$lam THEN
       |        ${step(s"greatest($z, a.sp + $ret)", z, fireEv)}
       |      ELSE
       |        ${step(s"greatest($z, a.sp + $ret)", s"least($z, a.sn + $ret)", "a.ev")}
       |    END
       |  ) AS st
       |  FROM p
       |),
       |ev AS (
       |  SELECT CAST(string_split(e, ':')[1] AS BIGINT) AS symbol,
       |         CAST(string_split(e, ':')[2] AS BIGINT) AS rn
       |  FROM (
       |    SELECT unnest(string_split(ltrim(st.ev, ','), ',')) AS e
       |    FROM folded WHERE st.ev <> ''
       |  )
       |)""".stripMargin
  }
}
