package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the Spark-native
  * form of the reference consumer's per-ticker in-memory buffers
  * (`consumer.py:75-97`: accumulate per ticker, flush on thresholds). The
  * reference keeps its buffer in process memory and loses it on crash;
  * here the per-key state is checkpointed by the engine.
  */
object StatefulOps {

  case class Tick(ticker: String, close: Double, volume: Long)

  /** Per-ticker running aggregate state (the watermark-table shape plus
    * running OHLC-ish stats).
    */
  case class TickerState(n: Long, lastClose: Double, minClose: Double,
      maxClose: Double, totalVolume: Long)

  case class TickerUpdate(ticker: String, n: Long, lastClose: Double,
      minClose: Double, maxClose: Double, totalVolume: Long)

  case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)

  /** Sentinel for "stage not reached": Long.MinValue, NOT -1 — a -1
    * sentinel would collide with legitimate pre-epoch timestamps and
    * silently corrupt both the stage guards and the final-state
    * re-aggregation downstream.
    */
  val FunnelUnset: Long = Long.MinValue

  /** Per-user funnel progress: [[FunnelUnset]] = stage not reached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)

  case class FunnelUpdate(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long)

  /** Streaming twin of the batch `funnel_steps` key: a per-user stage
    * state machine (first view → first click after it → first purchase
    * after that) advanced incrementally as events arrive, instead of
    * re-aggregating history every batch. Persisted state is three longs
    * per user; within a batch only open-stage click/purchase times are
    * retained (a sorted set each) and views fold to a running min, so a
    * bot-hot user costs the candidate times of its UNREACHED stages, not
    * a buffered copy of every event. The per-batch resolution
    * (min view, then smallest click strictly after t1, then smallest
    * purchase strictly after t2) is equivalent to replaying the batch in
    * timestamp order. Like every streaming funnel, cross-batch ordering
    * relies on the source's watermark discipline (an event older than an
    * already-taken stage cannot retroactively rewind it — the batch form
    * over the full history is the reconciliation path, and the parity of
    * the two on in-order input is pinned in SkewStatefulSpec).
    */
  def funnelStages(events: Dataset[FunnelEvent])(implicit spark: SparkSession)
      : Dataset[FunnelUpdate] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          val before = state.getOption
            .getOrElse(FunnelState(FunnelUnset, FunnelUnset, FunnelUnset))
          var minView = Long.MaxValue
          val clicks = scala.collection.mutable.TreeSet.empty[Long]
          val purchases = scala.collection.mutable.TreeSet.empty[Long]
          rows.foreach { e =>
            e.event_type match {
              case "view" if before.t1 == FunnelUnset =>
                minView = math.min(minView, e.ts_us)
              case "click" if before.t2 == FunnelUnset =>
                clicks += e.ts_us
              case "purchase" if before.t3 == FunnelUnset =>
                purchases += e.ts_us
              case _ => ()
            }
          }
          var st = before
          if (st.t1 == FunnelUnset && minView != Long.MaxValue)
            st = st.copy(t1 = minView)
          if (st.t1 != FunnelUnset && st.t2 == FunnelUnset)
            clicks.minAfter(st.t1 + 1).foreach(t => st = st.copy(t2 = t))
          if (st.t2 != FunnelUnset && st.t3 == FunnelUnset)
            purchases.minAfter(st.t2 + 1).foreach(t => st = st.copy(t3 = t))
          if (st != before) {
            state.update(st)
            Iterator(FunnelUpdate(uid, st.t1, st.t2, st.t3))
          } else Iterator.empty
      }
  }

  /** Emit one updated summary row per ticker per micro-batch; state
    * persists across batches (checkpoint-backed, unlike the reference's
    * process-memory buffers).
    */
  def runningSummary(ticks: Dataset[Tick])(implicit spark: SparkSession)
      : Dataset[TickerUpdate] = {
    import spark.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState[TickerState, TickerUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (ticker, rows, state: GroupState[TickerState]) =>
          val prev = state.getOption.getOrElse(
            TickerState(0L, Double.NaN, Double.MaxValue, Double.MinValue, 0L))
          val next = rows.foldLeft(prev) { (s, t) =>
            TickerState(s.n + 1, t.close,
              math.min(s.minClose, t.close), math.max(s.maxClose, t.close),
              s.totalVolume + t.volume)
          }
          if (next.n > prev.n) {
            state.update(next)
            Iterator(TickerUpdate(ticker, next.n, next.lastClose,
              next.minClose, next.maxClose, next.totalVolume))
          } else Iterator.empty
      }
  }
}
