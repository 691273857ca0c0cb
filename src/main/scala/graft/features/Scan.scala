package graft.features

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-scan executors for the reference's sequential/stateful kernels
  * (SURVEY.md §4.3 "custom" buckets 1-2, §7.0 `OrderedScan`).
  *
  * Two execution strategies, chosen by the algebra of the state:
  *
  *  1. [[affine]] — EXACT distributed prefix scan for *scalar-affine*
  *     recurrences s' = a·s + b per state component (EWMA/EWMS/EWMST,
  *     steady-state Wilder). Affine maps compose associatively, so each
  *     range partition summarizes itself in O(1) state, a driver fold
  *     stitches boundaries, and a second pass emits — two passes, no global
  *     sort, scales to any data size (the per-partition summary is 2 doubles
  *     per state component).
  *
  *  2. [[keyOrdered]] + a caller's `mapPartitions` kernel — for
  *     reset-on-trigger state machines (CUSUM filter/indexer, volume/dollar
  *     bar ids) whose state is NOT mergeable (finmlkit/bar/logic.py:87-221).
  *     These are order-total per series: parallelism comes from the key
  *     (symbol) dimension, matching the reference's own constraint.
  */
object Scan {

  /** Layout a frame so each key's rows are contiguous and ordered: shuffle
    * by key, sort (key, order...) within partitions. A sequential kernel can
    * then stream each key-run with O(1) memory.
    */
  def keyOrdered(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val sortCols = (keyCols ++ orderCols).map(col)
    if (keyCols.isEmpty)
      df.repartitionByRange(1, orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*)
    else
      df.repartition(keyCols.map(col): _*).sortWithinPartitions(sortCols: _*)
  }

  /** Split a partition iterator into contiguous per-key runs so sequential
    * kernels restart (state reset) at every key change. With empty keyIdxs
    * the whole partition is one run. Requires the [[keyOrdered]] layout
    * (each key's rows contiguous within the partition).
    */
  def keyRuns(it: Iterator[Row], keyIdxs: Seq[Int]): Iterator[Iterator[Row]] =
    if (keyIdxs.isEmpty) {
      if (it.hasNext) Iterator.single(it) else Iterator.empty
    } else new Iterator[Iterator[Row]] {
      // per-row cost matters: this sits on the hot path of every keyed
      // sequential kernel, so compare field-by-field in a while loop
      // instead of building a fresh key collection per hasNext call
      private val idxs = keyIdxs.toArray
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): Iterator[Row] = {
        val k = new Array[Any](idxs.length)
        var i = 0
        while (i < idxs.length) { k(i) = buf.head.get(idxs(i)); i += 1 }
        new Iterator[Row] {
          def hasNext: Boolean = buf.hasNext && {
            val h = buf.head
            var i = 0
            var eq = true
            while (eq && i < idxs.length) { eq = k(i) == h.get(idxs(i)); i += 1 }
            eq
          }
          def next(): Row = buf.next()
        }
      }
    }

  /** Ordered sequential scan appending one double column — for kernels
    * whose state is neither affine nor reset-free (seeded Wilder RSI/ADX).
    * Order-total per series by construction (the reference has the same
    * constraint); with `keyCols` the kernel restarts per key and the scan
    * shuffles by key — parallel across symbols, as the reference's
    * per-series loops are.
    */
  def seqDouble(df: DataFrame, orderCols: Seq[String], out: String,
                keyCols: Seq[String] = Nil)(
      kernel: (StructType, Iterator[Row]) => Iterator[(Row, Double)]): DataFrame = {
    val sorted = keyOrdered(df, keyCols, orderCols)
    val schema = sorted.schema
    val keyIdxs = keyCols.map(schema.fieldIndex)
    val outSchema = StructType(schema.fields :+ StructField(out, DoubleType))
    sorted.mapPartitions { it =>
      keyRuns(it, keyIdxs).flatMap(run =>
        kernel(schema, run).map { case (r, v) => Row.fromSeq(r.toSeq :+ v) })
    }(Encoders.row(outSchema)).toDF()
  }

  /** True when the frame's lineage contains an operator that executes as a
    * shuffle (join / aggregate / window / global sort / repartition). A
    * shuffled lineage can replay rows in a DIFFERENT order when a lost
    * block recomputes (map-output fetch order is nondeterministic), which
    * breaks [[affine]]'s cached two-phase layout contract — such inputs
    * default to pinned mode instead of relying on caller opt-in.
    */
  private[graft] def lineageHasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.exists {
      case _: Aggregate | _: Join | _: Window | _: Sort => true
      case _: RepartitionOperation => true
      case _ => false
    }
  }

  /** One scalar-affine state component: s' = a·s + b. */
  final case class Affine(a: Double, b: Double) {
    /** Composition: apply `this` AFTER `prev`. */
    def after(prev: Affine): Affine = Affine(a * prev.a, a * prev.b + b)
    def apply(s: Double): Double = a * s + b
  }

  /** Exact distributed scan for a vector of independent scalar-affine
    * recurrences over a globally `orderCol`-ordered frame.
    *
    * @param coefs   per-row affine coefficients for each state component;
    *                receives the row and the previous row (null for the
    *                partition's first row — resolved exactly via the
    *                boundary handoff, see `prevFields`)
    * @param init    initial state vector
    * @param emit    output value from (stateAfterUpdate, row)
    * @param prevDependent if true, coefficients depend on the previous row
    *                (e.g. Δt decay) — the first row of each partition is
    *                excluded from the phase-A summary and replayed on the
    *                driver with the true neighbor
    * @param numParts scan partitions; <= 0 (default) derives from the input
    *                (max of cluster parallelism and input partitions) so the
    *                scan widens with data instead of pinning 32
    * @param storage persistence for the sorted frame both phases must see
    *                identically (phase B replays phase A's exact layout —
    *                a recompute with different row order would break the
    *                boundary handoff). MEMORY_AND_DISK locally; pass
    *                DISK_ONLY at TB scale so the scan never competes with
    *                the executors' working memory. On a cluster, a lost
    *                persisted block recomputes from lineage: the range
    *                sampler's seed is deterministic per partition index, so
    *                the rebuilt layout is identical PROVIDED `df`'s own
    *                lineage is deterministic (scans + narrow ops are; an
    *                upstream shuffle with nondeterministic row order is
    *                not — checkpoint such inputs first, or set `pinned`).
    * @param pinned  fully deterministic mode: nothing is persisted; phase B
    *                re-shuffles the input with a custom partitioner whose
    *                boundaries are the first-row order keys phase A
    *                OBSERVED, so its layout provably equals phase A's even
    *                if every block is lost and the upstream shuffle replays
    *                rows in a different order. Costs a second full shuffle
    *                (plain-row serialization) instead of the cache —
    *                the choice at TB scale when the input lineage is not
    *                deterministic. Requires non-null, unique order keys
    *                (ts, id) — which the engine's layouts guarantee.
    *                AUTO-SELECTED (even when passed false) whenever the
    *                input lineage contains a shuffle and the order keys are
    *                integral: a recomputed shuffle replays rows in
    *                nondeterministic order, so the cached path's layout
    *                contract cannot be trusted there.
    */
  def affine(
      df: DataFrame,
      orderCols: Seq[String],
      nStates: Int,
      coefs: (Row, Row) => Array[Affine],
      init: Array[Double],
      emit: (Array[Double], Row) => Any,
      outName: String,
      outType: DataType = DoubleType,
      numParts: Int = 0,
      storage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      pinned: Boolean = false): DataFrame = {

    val parts =
      if (numParts > 0) numParts
      else math.max(df.sparkSession.sparkContext.defaultParallelism,
        df.rdd.getNumPartitions)
    // auto-pin: a shuffle in the input lineage makes the cached layout
    // untrustworthy under block loss (see `pinned` scaladoc); non-integral
    // order keys can't pin and keep the cached path (plus its caveats)
    val integralKeys = orderCols.forall { c =>
      val dt = df.schema(c).dataType
      dt == LongType || dt == IntegerType
    }
    val usePinned = pinned || (integralKeys && lineageHasShuffle(df))
    val sortedA = df.repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val sorted = if (usePinned) sortedA else sortedA.persist(storage)

    // ---- phase A: per-partition summary ---------------------------------
    // (partId, firstRow, lastRow, composed affine map of rows[1..] )
    // NOTE: partition ids are bound with mapPartitionsWithIndex at the RDD
    // level (not TaskContext.getPartitionId): a downstream coalesce would
    // fuse several input partitions into one task and lie about the id.
    val summaries = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val first = rows.next()
        var prev = first
        val comp = Array.fill(nStates)(Affine(1.0, 0.0))
        while (rows.hasNext) {
          val r = rows.next()
          val cs = coefs(r, prev)
          var i = 0
          while (i < nStates) { comp(i) = cs(i).after(comp(i)); i += 1 }
          prev = r
        }
        Iterator.single((pid, first, prev, comp))
      }
    }.collect().sortBy(_._1)

    // ---- driver fold: incoming state per non-empty partition, in order --
    // replays each partition's FIRST row (whose coefficients may depend on
    // the previous partition's last row), then applies the composed map.
    val m = summaries.length
    val incomingSeq = new Array[Array[Double]](m)
    val prevLastSeq = new Array[Row](m)
    var state = init.clone()
    var prevLast: Row = null
    var si = 0
    while (si < m) {
      val (_, first, _, comp) = summaries(si)
      incomingSeq(si) = state.clone()
      prevLastSeq(si) = prevLast
      val cs = coefs(first, prevLast)
      var i = 0
      while (i < nStates) { state(i) = cs(i)(state(i)); i += 1 }
      i = 0
      while (i < nStates) { state(i) = comp(i)(state(i)); i += 1 }
      prevLast = summaries(si)._3
      si += 1
    }

    val spark = df.sparkSession
    val outSchema = StructType(sorted.schema.fields :+ StructField(outName, outType))
    if (m == 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)

    // ---- phase B: replay with exact incoming state -----------------------
    val bState = spark.sparkContext.broadcast((incomingSeq, prevLastSeq))
    val replay: (Int, Iterator[Row]) => Iterator[Row] = { (idx, it) =>
      val (inc, prevArr) = bState.value
      val st = inc(idx).clone()
      var prev: Row = prevArr(idx)
      it.map { r =>
        val cs = coefs(r, prev)
        var i = 0
        while (i < nStates) { st(i) = cs(i)(st(i)); i += 1 }
        prev = r
        Row.fromSeq(r.toSeq :+ emit(st, r))
      }
    }
    val outRdd =
      if (!usePinned) {
        val pidToIdx = summaries.map(_._1).zipWithIndex.toMap
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          pidToIdx.get(pid) match {
            case Some(idx) => replay(idx, it)
            case None      => Iterator.empty // empty in phase A ⇒ empty here
          }
        }
      } else {
        // deterministic re-shuffle pinned to phase A's OBSERVED layout:
        // partition p of the new shuffle = all rows with order key in
        // [firstKey(p), firstKey(p+1)) — exactly phase A's membership,
        // independent of upstream row order or lost blocks (keys unique).
        // Integral keys only: LexKeyOrdering compares via Java Comparable,
        // which agrees with Spark's sort order for longs/ints but NOT for
        // strings (UTF8 byte order vs UTF-16 code units) or doubles (-0.0).
        orderCols.foreach { c =>
          val dt = df.schema(c).dataType
          require(dt == org.apache.spark.sql.types.LongType ||
            dt == org.apache.spark.sql.types.IntegerType,
            s"pinned affine scan requires integral order keys; '$c' is $dt")
        }
        val keyIdxs = orderCols.map(df.schema.fieldIndex).toArray
        val keyOf = (r: Row) => {
          val a = new Array[AnyRef](keyIdxs.length)
          var i = 0
          while (i < keyIdxs.length) {
            a(i) = r.get(keyIdxs(i)).asInstanceOf[AnyRef]; i += 1
          }
          a
        }
        implicit val keyOrd: Ordering[Array[AnyRef]] = new LexKeyOrdering
        val partitioner =
          new BoundaryPartitioner(summaries.map(s => keyOf(s._2)), new LexKeyOrdering)
        df.rdd.map(r => (keyOf(r), r))
          .repartitionAndSortWithinPartitions(partitioner)
          .mapPartitionsWithIndex((idx, it) => replay(idx, it.map(_._2)))
      }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** Lexicographic ordering over boxed, non-null order-key vectors. */
  private class LexKeyOrdering extends Ordering[Array[AnyRef]] {
    def compare(x: Array[AnyRef], y: Array[AnyRef]): Int = {
      var i = 0
      while (i < x.length) {
        val c = x(i).asInstanceOf[Comparable[AnyRef]].compareTo(y(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  /** Routes a key to the last boundary ≤ it (binary search); boundary p is
    * partition p's first-row key from phase A, so membership reproduces
    * phase A's layout exactly.
    */
  private class BoundaryPartitioner(bounds: Array[Array[AnyRef]],
                                    ord: LexKeyOrdering)
      extends org.apache.spark.Partitioner {
    def numPartitions: Int = bounds.length
    def getPartition(key: Any): Int = {
      val k = key.asInstanceOf[Array[AnyRef]]
      var lo = 0
      var hi = bounds.length - 1
      var res = 0
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (ord.compare(bounds(mid), k) <= 0) { res = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      res
    }
  }
}
