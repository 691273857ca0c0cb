package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** The window-feature library (SURVEY.md §2.5) — every transform in the
  * reference's `feature/transforms.py` that is expressible with built-in
  * Column/Window expressions, re-expressed Catalyst-first so predicate
  * pushdown / CSE / whole-stage codegen apply.
  *
  * All builders take (and return) a bars DataFrame carrying at least
  * (bar_ts: Long ns, open/high/low/close/volume/vwap: Double, trades: Long)
  * ordered by bar_ts, and append named feature columns. Windows are
  * row-count frames over bar_ts ordering; `partCols` parameterizes
  * per-symbol partitioning at scale (the reference is single-series).
  */
object Features {

  def w(partCols: Seq[String] = Nil): WindowSpec =
    Window.partitionBy(partCols.map(col): _*).orderBy("bar_ts")

  def rows(n: Int, partCols: Seq[String] = Nil): WindowSpec =
    w(partCols).rowsBetween(-(n - 1), 0)

  /** Rolling frame guarded to emit NULL until the window is full —
    * mirrors the reference's NaN-until-warm convention (core/ma.py:46-62).
    */
  def full(n: Int, c: Column, partCols: Seq[String] = Nil): Column =
    when(count(lit(1)).over(rows(n, partCols)) === n, c)

  // --- §2.5 simple lags / returns -------------------------------------

  /** `Lag` (transforms.py:63-87) */
  def lagN(c: Column, n: Int, p: Seq[String] = Nil): Column = lag(c, n).over(w(p))

  /** `Return` simple n-period return (transforms.py:120-152) */
  def ret(c: Column, n: Int, p: Seq[String] = Nil): Column = c / lag(c, n).over(w(p)) - 1

  /** `Return` log variant */
  def logRet(c: Column, n: Int, p: Seq[String] = Nil): Column = log(c / lag(c, n).over(w(p)))

  /** `ROC` (transforms.py:155-177, core/momentum.py:6-22) */
  def roc(c: Column, n: Int, p: Seq[String] = Nil): Column = (c / lag(c, n).over(w(p)) - 1) * 100

  /** `PctChange` with NaN-when-base<=0 (core/utils.py:110-124) */
  def pctChange(c: Column, n: Int, p: Seq[String] = Nil): Column = {
    val base = lag(c, n).over(w(p))
    when(base > 0, c / base - 1)
  }

  // --- §2.5 rolling statistics ----------------------------------------

  /** `SMA` (core/ma.py:46-62) — NULL until the window is full. */
  def sma(c: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, avg(c).over(rows(n, p)), p)

  /** `ZScore` (core/utils.py:67-90); ddof=0 default like the reference. */
  def zscore(c: Column, n: Int, ddof: Int = 0, p: Seq[String] = Nil): Column = {
    val sd = if (ddof == 0) stddev_pop(c).over(rows(n, p)) else stddev_samp(c).over(rows(n, p))
    full(n, (c - avg(c).over(rows(n, p))) / nullIfZero(sd), p)
  }

  /** Exact rolling median over a full n-row frame. Spark's `median`/`percentile`
    * aggregates reject window frames, so this sorts the collected frame —
    * the reference's own rolling median is the same O(w log w) per row
    * (core/utils.py:92-108), and w is small by construction.
    */
  def rollingMedian(c: Column, n: Int, p: Seq[String] = Nil): Column = {
    val arr = array_sort(collect_list(c).over(rows(n, p)))
    val m =
      if (n % 2 == 1) element_at(arr, (n + 1) / 2)
      else (element_at(arr, n / 2) + element_at(arr, n / 2 + 1)) / 2
    // guard on size(arr), not the row count: collect_list drops nulls, so
    // a null inside an otherwise-full frame would leave element_at
    // indexing past the array — an ANSI INVALID_ARRAY_INDEX crash instead
    // of the null a partial window should emit
    when(size(arr) === n, m)
  }

  /** `z_score_peak_filter` (sampling/filters.py:73-94 — DECLARED but
    * NotImplementedError in the reference): the real-time z-score peak
    * detector its docstring cites (the published StackOverflow
    * robust-peak algorithm), with documented choices where the
    * declaration leaves freedom: the moving window is the `n` PRECEDING
    * observations (the row under test excluded — "real-time" means the
    * tested value cannot contaminate its own baseline), mean/std are
    * POPULATION moments derived from the window sums through one shared
    * op tree (v = s2/n − (s1/n)², both engines verbatim), influence = 1
    * (the raw series feeds the window; the declared signature carries no
    * influence parameter), and a row is a peak iff v > 0 and
    * |y − s1/n| > threshold·√v. The first n rows carry no signal.
    * Appends `is_peak` and `peak_slack` (the |dev − λ| decision margin,
    * NULL when no comparison ran) — the slack feeds the cusum_slack-style
    * guard gate certifying every fire decision clears cross-engine sum
    * noise.
    */
  def zScorePeaks(df: DataFrame, valueCol: String, n: Int, threshold: Double,
                  orderCols: Seq[String],
                  partCols: Seq[String] = Nil): DataFrame = {
    val f = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*).rowsBetween(-n, -1)
    val y = col(valueCol)
    val s1 = sum(y).over(f)
    val s2 = sum(y * y).over(f)
    val cnt = count(y).over(f)
    val nD = lit(n.toDouble)
    val v = s2 / nD - (s1 / nD) * (s1 / nD)
    val dev = abs(y - s1 / nD)
    val lam = lit(threshold) * sqrt(v)
    df.withColumn("is_peak", cnt === n && v > 0 && dev > lam)
      .withColumn("peak_slack", when(cnt === n && v > 0, abs(dev - lam)))
  }

  /** [[zScorePeaks]]' decision flag as a pure Column on the feature
    * library's canonical bar_ts ordering — the DSL-registrable form
    * (`zscore_peaks` in [[Dsl]]'s registry): 1.0 where the row is a peak,
    * 0.0 otherwise (incl. the first n warm-up rows), same s1/s2 op tree
    * as the DataFrame version so the two share one oracle text.
    */
  def zScorePeaksCol(y: Column, n: Int, threshold: Double,
                     p: Seq[String] = Nil): Column = {
    val f = w(p).rowsBetween(-n, -1)
    val s1 = sum(y).over(f)
    val s2 = sum(y * y).over(f)
    val cnt = count(y).over(f)
    val nD = lit(n.toDouble)
    val v = s2 / nD - (s1 / nD) * (s1 / nD)
    (cnt === n && v > 0 && abs(y - s1 / nD) > lit(threshold) * sqrt(v))
      .cast("double")
  }

  /** `BurstRatio` x / rolling-median (core/utils.py:92-108) */
  def burstRatio(c: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, c / nullIfZero(rollingMedian(c, n, p)), p)

  /** `BollingerPercentB` (core/volatility.py:289-338): bands = SMA ± k·sd(sample). */
  def bollingerPercentB(c: Column, n: Int, k: Double = 2.0, p: Seq[String] = Nil): Column = {
    val m = avg(c).over(rows(n, p))
    val sd = stddev_samp(c).over(rows(n, p))
    full(n, (c - (m - lit(k) * sd)) / nullIfZero(lit(2 * k) * sd), p)
  }

  /** `StochK` (core/momentum.py:68-112) */
  def stochK(n: Int, p: Seq[String] = Nil): Column = {
    val lo = min("low").over(rows(n, p))
    val hi = max("high").over(rows(n, p))
    full(n, lit(100) * (col("close") - lo) / nullIfZero(hi - lo), p)
  }

  /** True range (core/volatility.py:222-253) */
  def trueRange(p: Seq[String] = Nil): Column = {
    val pc = lag("close", 1).over(w(p))
    coalesce(
      greatest(col("high") - col("low"), abs(col("high") - pc), abs(col("low") - pc)),
      col("high") - col("low"))
  }

  /** `ATR` SMA flavor (core/volatility.py:352-437); Wilder flavor is in the
    * recursive family (Ewm.scala).
    */
  def atrSma(n: Int, p: Seq[String] = Nil): Column =
    full(n, avg(trueRange(p)).over(rows(n, p)), p)

  /** `ParkinsonRange` ln(h/l)^2 / (4 ln 2) per row (core/volatility.py:341-349).
    * try_divide: a zero low (bad print) yields NULL instead of an ANSI error.
    */
  def parkinson: Column =
    pow(log(try_divide(col("high"), col("low"))), 2) / (lit(4) * log(lit(2.0)))

  /** `RealizedVolatility` (core/volatility.py:256-287), NaN-aware count. */
  def realizedVol(r: Column, n: Int, ddof: Int = 1, p: Seq[String] = Nil): Column =
    full(n, sqrt(sum(r * r).over(rows(n, p)) / nullIfZero(count(r).over(rows(n, p)) - ddof)), p)

  /** `VarianceRatio14` (core/volatility.py:481-540): var(r1)/ (var(r4)/4). */
  def varianceRatio14(r1: Column, r4: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, var_samp(r1).over(rows(n, p)) / nullIfZero(var_samp(r4).over(rows(n, p)) / 4), p)

  /** `KurtosisTransform` (transforms.py:900-933) — scipy fisher=True,
    * bias=True == population excess kurtosis == Spark's `kurtosis`.
    */
  def rollingKurtosis(c: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, kurtosis(c).over(rows(n, p)), p)

  /** `BiPowerVariation` sqrt(pi/2)·Σ|r||r_lag| (transforms.py:1551-1602).
    * `rLag` must be a materialized lag-1 of `r` (a window expr inside the
    * sum would be an illegal nested window function).
    */
  def biPower(r: Column, rLag: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, sqrt(lit(math.Pi / 2)) * sum(abs(r) * abs(rLag)).over(rows(n, p)), p)

  // --- §2.5 volume / flow ----------------------------------------------

  /** `VWAPDistance` (core/reversion.py:9-56): price / rollingVWAP − 1. */
  def vwapDistance(n: Int, p: Seq[String] = Nil): Column = {
    val rvwap = sum(col("vwap") * col("volume")).over(rows(n, p)) /
      nullIfZero(sum(col("volume")).over(rows(n, p)))
    col("close") / rvwap - 1
  }

  /** `VPIN` (core/volume.py:610-641) over per-bar buy/sell volumes. */
  def vpin(buyVol: Column, sellVol: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, sum(abs(buyVol - sellVol)).over(rows(n, p)) /
      nullIfZero(sum(buyVol + sellVol).over(rows(n, p))), p)

  /** `FlowAcceleration` (core/volume.py:572-607): log((Σ recent + ε)/(Σ prior + ε)). */
  def flowAcceleration(vol: Column, win: Int, recent: Int, eps: Double = 1e-12,
                       p: Seq[String] = Nil): Column = {
    val rec = sum(vol).over(w(p).rowsBetween(-(recent - 1), 0))
    val prior = sum(vol).over(w(p).rowsBetween(-(win - 1), -recent))
    full(win, log((rec + eps) / (prior + eps)), p)
  }

  /** `PriceVolumeCorrelation` — textbook rolling Pearson (the reference's
    * test-data special case at core/correlation.py:41-65 is deliberately NOT
    * reproduced; SURVEY.md §5 item 7).
    */
  def priceVolumeCorr(r: Column, vol: Column, n: Int, p: Seq[String] = Nil): Column = {
    // covar/(sx·sy) instead of the built-in Corr: window aggregates are
    // evaluated unconditionally (a when() guard can't short-circuit them),
    // and ANSI-mode Corr raises DIVIDE_BY_ZERO on zero-variance windows
    // (a run of empty bars) where DuckDB/pandas return NULL/NaN.
    // Pairwise deletion: every moment is computed over rows where BOTH
    // inputs are present, matching textbook/DuckDB corr (per-column null
    // skipping would mix 19-point and 20-point moments at series edges).
    val both = r.isNotNull && !isnan(r) && vol.isNotNull && !isnan(vol)
    val rr = when(both, r)
    val vv = when(both, vol)
    val cov = covar_samp(rr, vv).over(rows(n, p))
    val sx = stddev_samp(rr).over(rows(n, p))
    val sy = stddev_samp(vv).over(rows(n, p))
    full(n, cov / nullIfZero(sx * sy), p)
  }

  // --- §2.5 trend / structure -------------------------------------------

  /** `TrendSlope` (transforms.py:936-988): rolling OLS slope of ln(price) on
    * the bar index, reported as degrees(atan(slope)). The regressor is the
    * global row number — shift-invariant for OLS slope, so no per-window
    * re-indexing is needed (covar/var are translation invariant).
    */
  def trendSlopeDegrees(c: Column, rn: Column, n: Int, p: Seq[String] = Nil): Column =
    full(n, degrees(atan(covar_samp(rn.cast("double"), log(c)).over(rows(n, p)) /
      nullIfZero(var_samp(rn.cast("double")).over(rows(n, p))))), p)

  /** `DirRunLen` (transforms.py:1605-1664): consecutive same-sign return
    * streak, reset on flip or zero — gaps-and-islands in two windows.
    */
  def withDirRunLen(df: DataFrame, r: Column, out: String, p: Seq[String] = Nil): DataFrame = {
    val sgn = signum(r)
    val flip = when(sgn =!= lag(sgn, 1).over(w(p)) || lag(sgn, 1).over(w(p)).isNull, 1).otherwise(0)
    val base = df
      .withColumn("__sgn", sgn)
      .withColumn("__flip", flip)
    val grp = sum("__flip").over(w(p).rowsBetween(Window.unboundedPreceding, 0))
    val base2 = base.withColumn("__grp", grp)
    val islandW = Window.partitionBy((p.map(col) :+ col("__grp")): _*).orderBy("bar_ts")
    base2
      .withColumn(out,
        when(col("__sgn").isNull || col("__sgn") === 0, 0)
          .otherwise(row_number().over(islandW)))
      .drop("__sgn", "__flip", "__grp")
  }

  // --- §2.5 time cues (core/time.py:5-62) --------------------------------

  /** 9 calendar features from a ns epoch — pure scalar expressions.
    * Takes the column NAME: the ns→s conversion must be integer `div`
    * (a double division loses ns precision above 2^53).
    */
  def timeCues(tsName: String): Seq[(String, Column)] = {
    val sec = expr(s"$tsName div 1000000000L")
    val secInDay = pmod(sec, lit(86400L))
    val phase = lit(2 * math.Pi) * secInDay.cast("double") / lit(86400.0)
    val dayWeek = pmod((sec / lit(86400L)).cast("long") + 3, lit(7L))
    val phaseW = lit(2 * math.Pi) * dayWeek.cast("double") / lit(7.0)
    val hour = (secInDay / lit(3600L)).cast("long")
    val minute = (pmod(secInDay, lit(3600L)) / lit(60L)).cast("long")
    Seq(
      "sin_td" -> sin(phase),
      "cos_td" -> cos(phase),
      "sin_dw" -> sin(phaseW),
      "cos_dw" -> cos(phaseW),
      "asia_session" -> (hour >= 0 && hour < 8),
      "eu_session" -> (hour >= 7 && hour < 15),
      "us_session" -> (hour >= 13 && hour < 21),
      "session_transition" -> (hour.isin(0L, 7L, 13L) && minute === 0),
      "top_of_hour" -> (minute === 0))
  }

  // --- §2.5 candle shape (transforms.py:1273-1338) -----------------------

  def candleShape: Seq[(String, Column)] = {
    val range = col("high") - col("low") + lit(1e-12)
    Seq(
      "wick_up" -> (col("high") - greatest(col("open"), col("close"))) / range,
      "wick_dn" -> (least(col("open"), col("close")) - col("low")) / range,
      "body" -> abs(col("close") - col("open")) / range,
      "vwap_drift" -> when(col("trades") > 0, (col("vwap") - col("open")) / col("open")))
  }

  // --- §2.5 session structure --------------------------------------------

  /** `ORBBreak` (transforms.py:1122-1207): first `nOpen` bars of the UTC day
    * define the opening range; later bars flag closes beyond it.
    */
  def withOrbBreak(df: DataFrame, nOpen: Int = 4, p: Seq[String] = Nil): DataFrame = {
    val day = expr("bar_ts div 86400000000000")
    val base = df.withColumn("__day", day)
    val dayW = Window.partitionBy((p.map(col) :+ col("__day")): _*).orderBy("bar_ts")
    val dayAll = Window.partitionBy((p.map(col) :+ col("__day")): _*)
    val base2 = base.withColumn("__rn", row_number().over(dayW))
    base2
      .withColumn("orb_high", max(when(col("__rn") <= nOpen, col("high"))).over(dayAll))
      .withColumn("orb_low", min(when(col("__rn") <= nOpen, col("low"))).over(dayAll))
      .withColumn("orb_long",
        (col("__rn") > nOpen && col("close") > col("orb_high")).cast("int"))
      .withColumn("orb_short",
        (col("__rn") > nOpen && col("close") < col("orb_low")).cast("int"))
      .drop("__rn")
      .withColumnRenamed("__day", "day")
  }

  /** `DailyGap` (transforms.py:1065-1119) — fixed port of the reference's
    * broken all-NaN implementation (SURVEY.md §7.4 item 8): per UTC day,
    * (first close of day − last close of previous day) / previous.
    */
  def dailyGap(bars: DataFrame, p: Seq[String] = Nil): DataFrame = {
    val day = expr("bar_ts div 86400000000000")
    val g = bars.where(col("trades") > 0).withColumn("day", day)
      .groupBy((p.map(col) :+ col("day")): _*)
      .agg(min_by(col("close"), col("bar_ts")).as("first_close"),
           max_by(col("close"), col("bar_ts")).as("last_close"))
    val dw = Window.partitionBy(p.map(col): _*).orderBy("day")
    g.withColumn("prev_last", lag("last_close", 1).over(dw))
      .select((p.map(col) :+ col("day") :+
        ((col("first_close") - col("prev_last")) / col("prev_last")).as("daily_gap")): _*)
  }

  // --- §2.5 long-memory / complexity / structural breaks ------------------

  /** `HurstExponent` (transforms.py:1341-1397) — rolling aggregated-variance
    * Hurst, expressed entirely with built-in window aggregates (no arrays,
    * no UDF): the k-lag differences of the within-window cumsum path are
    * exactly the k-bar rolling return sums, so τ(k) = √var_pop of the k-sum
    * column over the trailing (n−k)-row frame, and the OLS slope of
    * log τ vs log k over the fixed lags {1,2,4,8} collapses to a linear
    * combination of the four log-τ values (equally spaced in log 2).
    */
  def withHurst(df: DataFrame, rCol: String, n: Int, out: String,
                p: Seq[String] = Nil): DataFrame = {
    val lags = Seq(1, 2, 4, 8)
    require(lags.forall(_ < n), s"hurst window $n must exceed max lag 8")
    val withSums = lags.foldLeft(df) { (d, k) =>
      d.withColumn(s"__s$k", sum(col(rCol)).over(w(p).rowsBetween(-(k - 1), 0)))
    }
    val fullWin = rows(n, p)
    val guard = count(lit(1)).over(fullWin) === n &&
      count(col(rCol)).over(fullWin) === n
    val taus = lags.map { k =>
      sqrt(var_pop(col(s"__s$k")).over(w(p).rowsBetween(-(n - 1 - k), 0)))
    }
    val allPos = taus.map(_ > 0).reduce(_ && _)
    // slope of ln τ on ln k for k = 2^j, j = 0..3: coefficients
    // (−1.5, −0.5, 0.5, 1.5)/ (5 ln 2) — the closed-form OLS fit.
    val coefs = Seq(-1.5, -0.5, 0.5, 1.5)
    val slope = taus.zip(coefs).map { case (t, c) => log(t) * c }
      .reduce(_ + _) / (5.0 * math.log(2.0))
    withSums
      .withColumn(out, when(guard && allPos, slope))
      .drop(lags.map(k => s"__s$k"): _*)
  }

  /** `ApproximateEntropy` (transforms.py:1400-1457) — rolling ApEn with
    * m-embedding Chebyshev matching and tolerance = tol·σ_pop(window),
    * matching antropy.app_entropy (self-matches included, d ≤ r inclusive).
    * O(n·w²) via a per-window buffer — the window is small by contract.
    */
  def withApEn(df: DataFrame, rCol: String, n: Int, m: Int, tol: Double,
               out: String, p: Seq[String] = Nil): DataFrame = {
    val apen = udf { arr: Seq[Double] =>
      val ys = arr.toArray
      val nn = ys.length
      val mean = ys.sum / nn
      val r = tol * math.sqrt(ys.map(y => (y - mean) * (y - mean)).sum / nn)
      def phi(k: Int): Double = {
        val big = nn - k + 1
        var acc = 0.0
        var i = 0
        while (i < big) {
          var cnt = 0
          var j = 0
          while (j < big) {
            var d = 0.0
            var t = 0
            while (t < k) {
              val dd = math.abs(ys(i + t) - ys(j + t))
              if (dd > d) d = dd
              t += 1
            }
            if (d <= r) cnt += 1
            j += 1
          }
          acc += math.log(cnt.toDouble / big)
          i += 1
        }
        acc / big
      }
      phi(m) - phi(m + 1)
    }
    val fullWin = rows(n, p)
    val guard = count(lit(1)).over(fullWin) === n &&
      count(col(rCol)).over(fullWin) === n
    df.withColumn(out,
      when(guard, apen(collect_list(col(rCol)).over(fullWin))))
  }

  /** `CUSUMTest` (transforms.py:631-708) — Chu-Stinchcombe-White CUSUM
    * break statistics over a rolling window (cusum.py:11-274). The rolling
    * and initial expanding phases unify: with the trailing min(t, W)+1 log
    * prices, t_loc = len−1, σ̂ = √(Σ Δy² / (t_loc−1)), and the one-sided
    * stats are maxima over n ∈ [1, t_loc−2] of ±(y_t − y_n)/(σ̂·√(t_loc−n)),
    * each with the critical value √(4.6 + ln(t_loc−n)) at its argmax.
    * Emits the reference's six features: clipped break scores, break flags,
    * and bars-since-break ages (pandas groupby-cumsum gaps-and-islands).
    */
  def withCusumBreak(df: DataFrame, priceCol: String, windowSize: Int = 50,
                     warmup: Int = 30, maxAge: Int = 144,
                     prefix: String = "cumote", p: Seq[String] = Nil): DataFrame = {
    val stat = udf { arr: Seq[Double] =>
      val y = arr.toArray
      val t = y.length - 1
      if (t < warmup) None
      else {
        var css = 0.0
        var j = 1
        while (j <= t) { val d = y(j) - y(j - 1); css += d * d; j += 1 }
        val sigma = math.sqrt(css / (t - 1))
        var su = -1e-6; var sd = -1e-6; var cu = 0.0; var cd = 0.0
        if (sigma > 0.0) {
          var nIdx = 1
          while (nIdx < t - 1) {
            val denom = sigma * math.sqrt((t - nIdx).toDouble)
            if (denom > 1e-16) {
              val dyn = y(t) - y(nIdx)
              val up = math.max(0.0, dyn) / denom
              val dn = -math.min(0.0, dyn) / denom
              if (up > su) { su = up; cu = math.sqrt(4.6 + math.log((t - nIdx).toDouble)) }
              if (dn > sd) { sd = dn; cd = math.sqrt(4.6 + math.log((t - nIdx).toDouble)) }
            }
            nIdx += 1
          }
        }
        Some((su - cu, sd - cd))
      }
    }
    val win = w(p).rowsBetween(-windowSize, 0)
    val base = df
      .withColumn("__breaks", stat(collect_list(log(col(priceCol))).over(win)))
      .withColumn("__bu", col("__breaks._1"))
      .withColumn("__bd", col("__breaks._2"))
    def clip10(c: Column) = when(c.isNotNull, least(greatest(c, lit(-10.0)), lit(10.0)))
    val flagged = base
      .withColumn(s"${prefix}_up_score", clip10(col("__bu")))
      .withColumn(s"${prefix}_down_score", clip10(col("__bd")))
      .withColumn(s"${prefix}_up_flag", coalesce(col("__bu") > 0, lit(false)))
      .withColumn(s"${prefix}_down_flag", coalesce(col("__bd") > 0, lit(false)))
    def age(flagCol: String, out: String)(d: DataFrame): DataFrame = {
      val grp = sum(col(flagCol).cast("int"))
        .over(w(p).rowsBetween(Window.unboundedPreceding, 0))
      val d2 = d.withColumn("__grp", grp)
      val ageW = Window.partitionBy((p.map(col) :+ col("__grp")): _*).orderBy("bar_ts")
      d2.withColumn(out,
        least(row_number().over(ageW) - 1, lit(maxAge)).cast("int"))
        .drop("__grp")
    }
    age(s"${prefix}_down_flag", s"${prefix}_down_age")(
      age(s"${prefix}_up_flag", s"${prefix}_up_age")(flagged))
      .drop("__breaks", "__bu", "__bd")
  }

  /** `BarDuration` (transforms.py:1511-1548): n-bar timestamp difference in
    * seconds on the ns-long bar clock.
    */
  def barDuration(n: Int, p: Seq[String] = Nil): Column =
    (col("bar_ts") - lag("bar_ts", n).over(w(p))) / 1e9

  private def nullIfZero(c: Column): Column = when(c =!= 0, c)
}
