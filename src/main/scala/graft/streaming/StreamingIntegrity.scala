package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the integrity scans (`Trades.timeGaps` / `idGaps`,
  * `H5Inspector.inspect_gaps` bar/io.py:200-223, `_validate_data`
  * data_model.py:254-292): per-symbol gap ALERTS as trades arrive, instead
  * of a batch sweep after the fact — the live monitoring shape a 100 TB
  * ingest pipeline runs next to its writers.
  *
  * State is O(1) per symbol (last ts/id). Rows are folded in (ts, id)
  * order WITHIN each batch (buffered and sorted — the same per-batch
  * contract as `directionalStateStream`: per-key ordered arrival across
  * batches, any order within one). DOCUMENTED DEVIATION: the batch
  * `idGaps` sorts globally by id; the stream flags id jumps in (ts, id)
  * arrival order. On a canonical feed (ids and timestamps co-monotonic —
  * what `dedupIds`/`checkTimestampsOrder` certify) the two coincide;
  * StreamingSpec pins that equivalence.
  */
object StreamingIntegrity {

  case class TickIn(ts: Long, id: Long, symbol: Long)
  case class IntegrityAlert(symbol: Long, kind: String,
                            prev_ts: Long, ts: Long,
                            prev_id: Long, id: Long,
                            missing_ids: Long, gap_sec: Double)
  case class GapState(lastTs: Long, lastId: Long, hasLast: Boolean)

  /** Per-symbol integrity monitor: emits a `time_gap` alert when the gap
    * between consecutive trades exceeds `maxGapNs`, and an `id_gap` alert
    * when the trade id jumps by more than one.
    */
  def alerts(trades: Dataset[TickIn], maxGapNs: Long): Dataset[IntegrityAlert] = {
    import trades.sparkSession.implicits._
    trades
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (symbol: Long, rows: Iterator[TickIn], state: GroupState[GapState]) =>
          var st = state.getOption.getOrElse(GapState(0L, 0L, hasLast = false))
          val out = Seq.newBuilder[IntegrityAlert]
          rows.toSeq.sortBy(r => (r.ts, r.id)).foreach { r =>
            if (st.hasLast) {
              if (r.ts - st.lastTs > maxGapNs)
                out += IntegrityAlert(symbol, "time_gap", st.lastTs, r.ts,
                  st.lastId, r.id, 0L, (r.ts - st.lastTs) / 1e9)
              if (r.id - st.lastId > 1)
                out += IntegrityAlert(symbol, "id_gap", st.lastTs, r.ts,
                  st.lastId, r.id, r.id - st.lastId - 1, 0.0)
            }
            st = GapState(r.ts, r.id, hasLast = true)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
