package graft.labels

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Triple Barrier Method labeling (finmlkit/label/tbm.py:11-158) as a
  * bucketed range join + one windowed aggregation pass — no per-event
  * sequential walk, no nested-loop join.
  *
  * The event→path expansion is an equi-join on a vert-sized time bucket
  * (each event probes its own bucket and the next), so it shuffles on the
  * bucket key and scales with |events| × avg path length — the same work
  * the reference's kernel does, but shuffle-parallel. First-touch and the
  * post-touch max return/barrier ratios (the reference's soft
  * vertical-touch weight) come from a single window + groupBy over the
  * same event partitioning.
  *
  * Semantics preserved: barriers in log-return space multiplied by event
  * side; path is (t0, t0+vert] start-exclusive end-inclusive; rows closer
  * than minClose are walk-skipped but still anchor the vertical touch (an
  * event whose EVERY in-window trade is inside minClose emits ret 0 /
  * label 1 / weight 0 at the last in-window print — tbm.py:111-113); label
  * = sign(ret) with 0 → +1, or meta-label ret >= minRet. Dropped events,
  * matching the reference: vertical barrier past the end of data
  * (label/kit.py:262-269), and zero trades in (t0, t0+vert] (the kernel's
  * t1_idx <= t0_idx warning-skip, tbm.py:97-100).
  */
object TripleBarrier {

  /** Auto bucket-subdivision for the keyed path join:
    * clamp(⌈cores·hottestKeyShare⌉, 8, 2·cores). Floor 8, never below:
    * subdivision is nearly free (the duplicated side is ~1/29 of the
    * trades) and MEASURED to help even on even keys (SKEW_SCALING r13:
    * probe-derived subdiv 1 ran the uniform fixture at 25.0 s vs 15.5 s
    * at 8 — finer groups balance better regardless of skew). The probe
    * only ever scales UP, to ⌈cores·hottestKeyShare⌉ task fan-out for the
    * hot key. The cap is 2·cores, NOT a constant (r13's min-64 cap
    * re-serialized a >6.4%-hot key on a 1000-core cluster): since
    * mx ≤ n, ⌈mx·cores/n⌉ ≤ cores, so the cap never binds on real probe
    * output — it exists to bound the event-duplication cost (subdiv+1
    * copies) against corrupted stats. At 32 cores every reachable value
    * (≤ 32) is identical to the old clamp(·, 8, 64), so results and
    * measured picks carry over unchanged.
    */
  private[graft] def autoBucketSubdiv(cores: Int, mx: Long, n: Long): Int =
    if (n == 0L) 8
    else math.min(math.max(8L, 2L * cores),
      math.max(8L, (mx * cores + n - 1) / n)).toInt

  /** @param events (event_ts, event_id, p0, tgt[, eside]) — eside ∈ {-1,1}
    *               required when isMeta; must also carry `partCols` columns
    *               when those are given
    * @param partCols optional symbol partitioning: barriers, paths and the
    *                 end-of-data cutoff are evaluated per symbol (the
    *                 bucketed join keys on (symbol, bucket)); empty = the
    *                 reference's single-series semantics
    * @param bucketSubdiv path-join bucket subdivision (bucket width =
    *                 vert/subdiv — see the BUCKET SUBDIVISION comment).
    *                 `Some(k)` forces it; `None` (default) AUTO-derives it
    *                 from the same key-occupancy probe as the Weights
    *                 sweeps: unkeyed runs keep the measured-good 8 (one
    *                 series — within-series parallelism is always needed);
    *                 keyed runs take clamp(⌈cores·hottestKeyShare⌉, 8,
    *                 2·cores) — the floor 8 is measurement-backed (finer
    *                 groups balance better even on even keys, SKEW_SCALING
    *                 r13: subdiv 1 lost 25.0 vs 15.5 s), the scale-up term
    *                 is the hot key's required task fan-out (probe-derived
    *                 auto-25 beat constant-8 390.7 vs 518.7 s on the
    *                 78%-hot fixture), and the cap tracks CORES — on a
    *                 1000-core cluster a >6%-hot key may legitimately need
    *                 hundreds of buckets, which a constant cap would
    *                 re-serialize. ⌈cores·share⌉ ≤ cores by construction,
    *                 so the 2·cores cap only guards pathological probe
    *                 outputs. Pure fan-out parameter: results are
    *                 invariant in it (each event still meets each
    *                 in-window trade exactly once).
    */
  def label(trades: DataFrame, events: DataFrame,
            topMult: Double, botMult: Double,
            vertBarrierSec: Double, minCloseSec: Double = 0.0,
            minRet: Double = 0.0, isMeta: Boolean = false,
            partCols: Seq[String] = Nil,
            bucketSubdiv: Option[Int] = None): DataFrame = {
    val vertNs = (vertBarrierSec * 1e9).toLong
    val minCloseNs = (minCloseSec * 1e9).toLong
    val pc = partCols.map(col)

    // Event preprocessing (label/kit.py:154-178): drop events whose target
    // can never reach the minimum return even at the widest barrier
    // (abs(tgt)·max_mult < min_ret) and events with missing/NaN targets.
    // NaN compares GREATER than any double in Spark — the isnan guard is
    // load-bearing, not defensive.
    val maxMult = math.max(topMult, botMult)
    val ev0 = events
      .where(col("tgt").isNotNull && !isnan(col("tgt")) &&
        abs(col("tgt")) * lit(maxMult) >= lit(minRet))
      .withColumn("eside", if (isMeta) col("eside") else lit(1))
      .withColumn("up", lit(topMult) * col("tgt"))
      .withColumn("lo", lit(-botMult) * col("tgt"))
    // end-of-data cutoff: global scalar (sanctioned 1-row broadcast), or
    // per-symbol max when partitioned — |keys| rows, unbounded in
    // principle, so the hint is AQE's call like every keyed dim here
    val ev = (if (partCols.isEmpty)
        ev0.crossJoin(broadcast(trades.agg(max("ts").as("__max_ts"))))
      else
        ev0.join(trades.groupBy(pc: _*).agg(max("ts").as("__max_ts")),
          partCols))
      .where(col("event_ts") + vertNs <= col("__max_ts"))
      .drop("__max_ts")

    // Bucketed range join: a path row lives in (t0, t0+vert], so with a
    // bucket width `bw` its trade falls in one of the buckets
    // [t0 DIV bw, (t0+vert) DIV bw]. Duplicating each event into those
    // buckets turns the pure-range condition into an equi-join (shuffle
    // hash/sort-merge, parallel) instead of a broadcast nested loop over
    // |events| × |trades|.
    //
    // BUCKET SUBDIVISION (hot-key parallelism): bw = vert/subdiv, not vert.
    // The join's per-key-group work is |trades in bucket| × |events
    // covering bucket| and a sort-merge join cannot split WITHIN one key
    // group (AQE skew handling splits partitions, and a single giant
    // (bucket, symbol) group is indivisible) — measured on SkewBench's
    // 75%-on-one-symbol fixture, bw = vert serialized the hot symbol's
    // entire barrier walk on ~vert-span/vert tasks (89.6 s flat from 8 to
    // 32 cores). Total pair work is invariant in bw (each event still
    // meets each in-window trade exactly once); subdividing only fans the
    // same work out over ~subdiv× more key groups, restoring core
    // scaling. The cost is event-row duplication (subdiv+1 copies instead
    // of 2) on the side that is ~1/29 of the trades — noise in the
    // shuffle. The subdivision factor is probe-derived by default (see
    // @param bucketSubdiv); the probe is the shared cached SkewProbe, so
    // a chain that already tiered its sweeps pays nothing extra.
    // The trade side is renamed (__t_*) before the join so no column
    // reference is ambiguous — events derive from the same trades lineage,
    // and dataframe-tagged references (t("ts")) trip the ambiguous-self-join
    // detector once any shared fragment is cached elsewhere in the session.
    val subdiv = bucketSubdiv.getOrElse {
      if (partCols.isEmpty) 8
      else {
        val cores = math.max(1,
          trades.sparkSession.sparkContext.defaultParallelism)
        val (mx, n) = graft.features.Scan.SkewProbe.occupancy(trades, partCols)
        autoBucketSubdiv(cores, mx, n)
      }
    }
    val bw = math.max(1L, vertNs / subdiv)
    val t = trades.select(pc :+ col("ts").as("__t_ts") :+ col("id").as("__t_id") :+
        col("price").as("__t_price"): _*)
      .withColumn("__b", expr(s"__t_ts DIV ${bw}L"))
    val evb = ev
      .withColumn("__b", explode(expr(
        s"sequence(event_ts DIV ${bw}L, (event_ts + ${vertNs}L) DIV ${bw}L)")))
    // No broadcast hint on either side: events scale with trades (~1/29),
    // so neither side is provably broadcastable at 100 TB — the bucketed
    // equi-join stays AQE's choice (broadcast when one side is measured
    // small, co-partitioned shuffle otherwise).
    // min-close rows stay IN the path but are ineligible (flag, not
    // filter): the reference kernel `continue`s them during the walk yet
    // still counts them toward the vertical-touch index — an event whose
    // every in-window trade sits inside min_close_time is EMITTED with
    // ret 0 / label 1 / weight 0 at the last in-window print
    // (tbm.py:111-113: skipped rows never update ret), not dropped.
    // Filtering them out of the join (the old shape) made such events
    // vanish. With the default minClose = 0 every row is eligible and
    // the constant folds away.
    val path = evb.join(t, "__b" +: partCols)
      .where(
        col("__t_ts") > col("event_ts") &&
        col("__t_ts") <= col("event_ts") + vertNs)
      .drop("__b")
      .withColumn("__elig", col("__t_ts") - col("event_ts") >= minCloseNs)
      .withColumn("ret", (log(col("__t_price")) - log(col("p0"))) * col("eside"))
      .withColumnRenamed("__t_ts", "ts")
      .withColumnRenamed("__t_id", "id")
      .drop("__t_price")

    // Pass 1 — ONE hash-aggregated scan of the path (all fixed-width agg
    // buffers: a struct-keyed min_by here would silently demote the whole
    // pass to SortAggregate and sort |events|×path rows):
    //  - touch0 = first breach ts, vert_ts = path end;
    //  - the max return/barrier ratios feed the soft weight ONLY on a
    //    vertical touch (tbm.py:146-156), where the walk covered the whole
    //    path — so full-path maxima are exact, and horizontal touches take
    //    weight 1.0 regardless.
    val breach = col("__elig") &&
      (col("ret") >= col("up") || col("ret") <= col("lo"))
    val p1 = path
      .groupBy((partCols ++ Seq("event_id", "event_ts", "p0", "tgt", "eside", "up", "lo")).map(col): _*)
      .agg(
        min(when(breach, col("ts"))).as("touch0"),
        max(col("ts")).as("vert_ts"),
        sum(when(col("__elig"), 1L).otherwise(0L)).as("n_elig"),
        coalesce(max(when(col("__elig") && col("ret") > 0,
          col("ret") / col("up"))), lit(0.0)).as("max_urbr"),
        coalesce(max(when(col("__elig") && col("ret") < 0,
          col("ret") / col("lo"))), lit(0.0)).as("max_lrbr"))
      .withColumn("touch_ts", coalesce(col("touch0"), col("vert_ts")))
      // p1 feeds BOTH pass 2 and the final join; without the persist the
      // whole path join + aggregation runs twice. The frame is one row per
      // event; SPARK_GRAFT_STORAGE=DISK_ONLY keeps it off-heap-safe when
      // events reach TB scale (graft.Conf).
      .persist(graft.Conf.storageLevel)

    // Pass 2 — return AT the touch: only trades at the touch timestamp
    // matter, so instead of re-deriving the whole path (a second bucketed
    // join over |events| × path rows) we equi-join the per-event table
    // against the RAW trades on ts == touch_ts — one cheap scan of trades,
    // recomputing ret only for the handful of touch prints. NO broadcast
    // hint: the event table scales with trades (~1/29 — the same argument
    // as the path join above), so a forced broadcast is a driver OOM at
    // 100 TB. The condition is pure-equi, so AQE broadcasts when the
    // measured size allows and shuffle-hash-joins otherwise (PlanSpec pins
    // the small-scale broadcast shape).
    // Tie-break by trade id replays the reference kernel's walk order
    // (first breaching print / last print, tbm.py:99-143), with fixed-width
    // long keys for min_by/max_by. partCols ride the key everywhere here:
    // event ids may restart per symbol in multi-series stores, so
    // (partCols, event_id) is the only safe event identity. Every trade at
    // touch_ts satisfies the path filters by construction: touch_ts came
    // from path rows, and the (minClose, vert] bounds depend on ts only.
    val p1Side = p1.select(
      partCols.map(c => col(c).as(s"__p_$c")) ++ Seq(col("event_id").as("__peid"),
        col("p0").as("__p_p0"), col("eside").as("__p_eside"),
        col("touch0"), col("touch_ts"), col("up").as("__up"), col("lo").as("__lo")): _*)
    val touch = trades
      .select(pc ++ Seq(col("ts").as("__t_ts2"), col("id").as("__t_id2"),
        col("price").as("__t_price2")): _*)
      .join(p1Side,
        partCols.map(c => col(c) === col(s"__p_$c"))
          .foldLeft(col("__t_ts2") === col("touch_ts"))(_ && _))
      .withColumn("__ret",
        (log(col("__t_price2")) - log(col("__p_p0"))) * col("__p_eside"))
      .withColumn("__breach", col("__ret") >= col("__up") || col("__ret") <= col("__lo"))
      .groupBy((pc :+ col("__peid").as("event_id")): _*)
      .agg(
        min_by(col("__ret"), when(col("__breach"), col("__t_id2"))).as("ret_breach"),
        max_by(col("__ret"), col("__t_id2")).as("ret_vert"))

    val p2 = p1.join(touch, partCols :+ "event_id")
      .withColumn("ret_touch",
        // all-ineligible path: the reference walk never computes a return
        // (every row `continue`d) — ret stays 0.0 at the vertical touch
        when(col("n_elig") === 0, lit(0.0))
          .when(col("touch0").isNotNull, col("ret_breach"))
          .otherwise(col("ret_vert")))

    val isVertical = col("touch0").isNull
    val rawLabel =
      if (isMeta) when(col("ret_touch") >= minRet, 1).otherwise(0)
      else when(signum(col("ret_touch")) === 0, 1)
        .otherwise(signum(col("ret_touch")).cast("int"))
    val maxRbr = when(col("ret_touch") > 0, col("max_urbr") / (lit(1.0) + col("max_lrbr")))
      .otherwise(col("max_lrbr") / (lit(1.0) + col("max_urbr")))
    p2.select(pc ++ Seq(
      col("event_ts"), col("event_id"),
      rawLabel.as("label"),
      col("touch_ts"),
      col("ret_touch").as("ret"),
      when(isVertical, least(maxRbr, lit(1.0))).otherwise(lit(1.0))
        .as("vertical_touch_weight")): _*)
  }

  /** The deterministic synthetic event set used by the driver queries:
    * every 29th trade, target = 0.05 + (id mod 7)/100 (log-return scale),
    * side from id parity.
    */
  def syntheticEvents(trades: DataFrame): DataFrame =
    trades.where(col("id") % 29 === 0).select(
      col("ts").as("event_ts"),
      col("id").as("event_id"),
      col("price").as("p0"),
      (lit(0.05) + (col("id") % 7).cast("double") * lit(0.01)).as("tgt"),
      when(col("id") % 2 === 0, 1).otherwise(-1).as("eside"))
}
