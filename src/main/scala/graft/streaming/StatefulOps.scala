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
