package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Technical-indicator engine — the analytical core of the reference
  * (`/root/reference/spark-job/etl_job.py:271-356`, W1-W10 in SURVEY §2.3).
  *
  * All indicators are built-in window aggregates + column arithmetic — no
  * UDFs anywhere (SURVEY §2.9) — so the whole surface stays inside
  * whole-stage codegen and Catalyst's `ExtractWindowExpressions` groups
  * same-frame functions into shared WindowExec nodes.
  *
  * Reference quirks preserved on purpose (SURVEY §7.4.2):
  *   - "EMA" 12/26 is an SMA approximation (`etl_job.py:294-295`);
  *   - RSI `rs = 100` when avg_loss = 0 (`etl_job.py:312`);
  *   - week/month pct-change null→0 but day-change null stays null
  *     (`etl_job.py:321-333`);
  *   - Bollinger uses sample stddev (`etl_job.py:301`).
  *
  * Scale notes (100 TB): the window partitions by `symbol`; one symbol's
  * full history lands in one task. All frames except OBV are bounded ROWS
  * frames ≤200 rows, so the chunked overlap-and-trim scheme (process date
  * ranges with 199-row tails, drop warm-up rows) keeps partitions bounded;
  * OBV decomposes into per-chunk prefix sums + cumulative chunk offsets
  * (SURVEY §4 skew row). At testdata scale plain partitioning suffices.
  */
object Indicators {

  /** Base window per `etl_job.py:265-269`, with the unique-key tiebreakers
    * required for deterministic results on data where trading_date ties
    * (SURVEY §7.4.1). The default tail includes the value columns because
    * the 4-part lineitem key has one collision at sf0.001 — only the full
    * row set is distinct at every scale factor (see Queries.tieCols).
    */
  def baseWindow(tiebreakers: Seq[String] = Seq("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey", "close", "volume", "open", "low")): WindowSpec =
    Window.partitionBy("symbol")
      .orderBy(("trading_date" +: tiebreakers).map(col): _*)

  val indicatorCols: Seq[String] = Seq(
    "sma_5", "sma_20", "sma_50", "sma_200",
    "macd", "signal_line", "macd_histogram",
    "bb_middle", "bb_upper", "bb_lower",
    "rsi", "obv", "day_change_pct", "week_change_pct", "month_change_pct")

  /** Reference-faithful indicator pipeline (`etl_job.py:271-356`): plain
    * double-typed window avgs/stddev. This is the production path; the
    * oracle-deterministic variants live in [[graft.Queries]].
    */
  def withIndicators(df: DataFrame, w: WindowSpec): DataFrame = {
    val close = col("close")
    var d = df
      .withColumn("sma_5", avg(close).over(w.rowsBetween(-4, 0)))
      .withColumn("sma_20", avg(close).over(w.rowsBetween(-19, 0)))
      .withColumn("sma_50", avg(close).over(w.rowsBetween(-49, 0)))
      .withColumn("sma_200", avg(close).over(w.rowsBetween(-199, 0)))
      .withColumn("_ema_12", avg(close).over(w.rowsBetween(-11, 0)))
      .withColumn("_ema_26", avg(close).over(w.rowsBetween(-25, 0)))
      .withColumn("macd", col("_ema_12") - col("_ema_26"))
    d = d.withColumn("signal_line", avg(col("macd")).over(w.rowsBetween(-8, 0)))
      .withColumn("macd_histogram", col("macd") - col("signal_line"))
      .withColumn("bb_middle", avg(close).over(w.rowsBetween(-19, 0)))
      .withColumn("_bb_stddev", stddev(close).over(w.rowsBetween(-19, 0)))
      .withColumn("bb_upper", col("bb_middle") + (col("_bb_stddev") * lit(2)))
      .withColumn("bb_lower", col("bb_middle") - (col("_bb_stddev") * lit(2)))
      .withColumn("_prev_close", lag(close, 1).over(w))
      .withColumn("_price_change", close - col("_prev_close"))
      .withColumn("_gain", when(col("_price_change") > 0, col("_price_change")).otherwise(0))
      .withColumn("_loss", when(col("_price_change") < 0, -col("_price_change")).otherwise(0))
      .withColumn("_avg_gain", avg("_gain").over(w.rowsBetween(-13, 0)))
      .withColumn("_avg_loss", avg("_loss").over(w.rowsBetween(-13, 0)))
      .withColumn("_rs", when(col("_avg_loss") =!= 0, col("_avg_gain") / col("_avg_loss")).otherwise(lit(100)))
      .withColumn("rsi", lit(100) - (lit(100) / (lit(1) + col("_rs"))))
      .withColumn("_volume_sign",
        when(col("_price_change") > 0, col("volume"))
          .when(col("_price_change") < 0, -col("volume"))
          .otherwise(0))
      .withColumn("obv", sum("_volume_sign").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("day_change_pct", (close - col("_prev_close")) / col("_prev_close") * 100)
      .withColumn("_prev_5d_close", lag(close, 5).over(w))
      .withColumn("week_change_pct",
        when(col("_prev_5d_close").isNotNull,
          (close - col("_prev_5d_close")) / col("_prev_5d_close") * 100)
          .otherwise(lit(0)))
      .withColumn("_prev_20d_close", lag(close, 20).over(w))
      .withColumn("month_change_pct",
        when(col("_prev_20d_close").isNotNull,
          (close - col("_prev_20d_close")) / col("_prev_20d_close") * 100)
          .otherwise(lit(0)))
    // drop exactly the temp columns this function created — a blanket
    // underscore-prefix drop would eat caller-owned bookkeeping columns
    d = d.drop("_ema_12", "_ema_26", "_bb_stddev", "_prev_close",
      "_price_change", "_gain", "_loss", "_avg_gain", "_avg_loss", "_rs",
      "_volume_sign", "_prev_5d_close", "_prev_20d_close")
    // typed-null padding + double cast (`etl_job.py:338-349`, E8)
    indicatorCols.foldLeft(d) { (acc, c) =>
      if (acc.columns.contains(c)) acc.withColumn(c, col(c).cast(DoubleType))
      else acc.withColumn(c, lit(null).cast(DoubleType))
    }
  }

  /** Chunked overlap-and-trim indicator pipeline — the 100 TB skew
    * mitigation (SURVEY §4): `partitionBy(symbol)` puts one symbol's whole
    * history in one task, which breaks when a symbol has billions of rows.
    * Instead:
    *
    *  1. rows are bucketed into time chunks (`chunkExpr`, e.g. year), and
    *     chunk indices are densified per symbol so gaps don't break
    *     adjacency (the dense-rank runs on the tiny distinct chunk set);
    *  2. the last `maxFrame−1` rows of each chunk are CLONED into the next
    *     chunk as warm-up context, so every bounded ROWS frame (longest:
    *     SMA-200, and the nested macd→signal chain of depth 33) sees its
    *     full lookback;
    *  3. indicators run windowed by (symbol, chunk) — bounded partitions —
    *     and warm-up rows are trimmed from the output;
    *  4. OBV, the one unbounded running sum, decomposes into a chunk-local
    *     prefix sum plus the cumulative total of prior chunks (a tiny
    *     per-(symbol, chunk) aggregate cumulated and joined back).
    *
    * Exactness requires each chunk to hold ≥ maxFrame−1 rows (practical at
    * scale; asserted in tests). Results are identical to
    * [[withIndicators]] under that condition.
    */
  /** Dense per-symbol chunk index (shared by both chunked paths): bucket
    * by `chunkExpr`, dense-rank the tiny distinct chunk set so gaps don't
    * break adjacency, broadcast-join the index back.
    */
  private def withDenseChunkIdx(df: DataFrame, chunkExpr: Column): DataFrame = {
    val withChunk = df.withColumn("chunk_raw", chunkExpr)
    val chunkIdx = withChunk.select(col("symbol"), col("chunk_raw")).distinct()
      .withColumn("chunk_id", dense_rank().over(
        Window.partitionBy("symbol").orderBy("chunk_raw")))
    withChunk.join(broadcast(chunkIdx), Seq("symbol", "chunk_raw"))
  }

  // orderCols MUST totally order rows within (symbol, chunk): the OBV
  // offset recompute below re-sorts independently of the indicator
  // window, so a tie would let the two passes disagree. The default is
  // the same value-column-extended total order baseWindow uses (the bare
  // 4-part lineitem key collides once at sf0.001).
  def chunkedIndicators(df: DataFrame, chunkExpr: Column,
      orderCols: Seq[String] = Seq("trading_date", "l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "close", "volume", "open", "low"),
      maxFrame: Int = 200): DataFrame = {
    val indexed = withDenseChunkIdx(df, chunkExpr)

    // clone each chunk's tail (maxFrame-1 rows) into the next chunk
    val tailW = Window.partitionBy("symbol", "chunk_id")
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val warmup = indexed
      .withColumn("rt_tail", row_number().over(tailW))
      .filter(col("rt_tail") <= maxFrame - 1)
      .drop("rt_tail")
      .withColumn("chunk_id", col("chunk_id") + 1)
      .withColumn("is_warmup", lit(true))
    val staged = indexed.withColumn("is_warmup", lit(false)).unionByName(warmup)

    // bounded-partition window: (symbol, chunk)
    val cw = Window.partitionBy("symbol", "chunk_id").orderBy(orderCols.map(col): _*)
    val computed = withIndicators(staged, cw)

    // OBV fix-up: chunk-local prefix over fresh rows + offset of prior chunks
    val signed = computed
      .withColumn("chg_tmp", col("close") - lag(col("close"), 1).over(cw))
      .withColumn("fresh_sign",
        when(col("is_warmup"), lit(0)).otherwise(
          when(col("chg_tmp") > 0, col("volume"))
            .when(col("chg_tmp") < 0, -col("volume"))
            .otherwise(lit(0))))
      .drop("chg_tmp")
    val localObv = signed
      .withColumn("obv_local", sum(col("fresh_sign")).over(cw.rowsBetween(Window.unboundedPreceding, 0)))

    // per-chunk signed-volume totals from a NARROW recompute over
    // `indexed`, NOT from `localObv`: aggregating the window output would
    // re-execute the whole 15-indicator pipeline a second time (Spark
    // rebuilds diamond branches). The total needs only (close, volume) and
    // ONE row of cross-chunk context — each chunk's first change is vs the
    // previous chunk's last close, carried through the same argmax summary
    // used by chunkedWilderRsi. Bit-identical to summing fresh_sign: the
    // staged lag's value at a chunk's first fresh row IS the previous
    // chunk's last close (the warm-up clone tail), and integer volume
    // arithmetic has no association sensitivity.
    val summaryFields = orderCols.map(col) ++
      (if (orderCols.contains("close")) Nil else Seq(col("close")))
    val lastClose = indexed.groupBy(col("symbol"), col("chunk_id"))
      .agg(max(struct(summaryFields: _*)).as("_m"))
      .select(col("symbol"), col("chunk_id"), col("_m.close").as("_last_close"))
    val prevClose = lastClose
      .withColumn("_prev_close", lag(col("_last_close"), 1).over(
        Window.partitionBy("symbol").orderBy("chunk_id")))
      .select(col("symbol"), col("chunk_id"), col("_prev_close"))
    val narrow = indexed.select(
      (Seq("symbol", "chunk_id") ++ orderCols ++ Seq("close", "volume"))
        .distinct.map(col): _*)
    val narrowCw = Window.partitionBy("symbol", "chunk_id").orderBy(orderCols.map(col): _*)
    val offsets = narrow.join(broadcast(prevClose), Seq("symbol", "chunk_id"))
      .withColumn("_chg",
        col("close") - coalesce(lag(col("close"), 1).over(narrowCw), col("_prev_close")))
      .withColumn("_sign",
        when(col("_chg") > 0, col("volume"))
          .when(col("_chg") < 0, -col("volume"))
          .otherwise(lit(0)))
      .groupBy("symbol", "chunk_id").agg(sum(col("_sign")).as("chunk_total"))
      .withColumn("obv_offset",
        coalesce(sum(col("chunk_total")).over(
          Window.partitionBy("symbol").orderBy("chunk_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("symbol"), col("chunk_id"), col("obv_offset"))
    localObv.join(broadcast(offsets), Seq("symbol", "chunk_id"))
      .withColumn("obv", (col("obv_local") + col("obv_offset")).cast(DoubleType))
      .filter(!col("is_warmup"))
      .drop("is_warmup", "chunk_raw", "chunk_id", "obv_local", "obv_offset", "fresh_sign")
  }

  /** True exponential EMA (fidelity upgrade over the reference's SMA
    * approximation, SURVEY §7.3): ema_t = α·x_t + (1−α)·ema_{t−1},
    * α = 2/(n+1), seeded with the first value. Closed form over the
    * unbounded-preceding frame via higher-order `aggregate` on the
    * collected prefix would blow memory at scale; instead the recurrence
    * folds over a bounded lookback. The truncation error of an L-row
    * lookback is (1−α)^(L−1) of the older history's weight — for the
    * default L=512: n=12 → ~4e-41, n=26 → ~3e-17, i.e. at or below double
    * precision. (L must grow ~7.7·(n+1) per decimal digit of accuracy.)
    */
  def trueEma(close: Column, n: Int, w: WindowSpec, lookback: Int = 512): Column = {
    val alpha = 2.0 / (n + 1)
    val xs = collect_list(close).over(w.rowsBetween(-(lookback - 1), 0))
    // Sequential fold reproduces the recurrence exactly over the window.
    aggregate(xs, lit(Double.NaN),
      (acc, x) => when(isnan(acc), x).otherwise(x * lit(alpha) + acc * lit(1 - alpha)))
  }

  /** True EMA, production path (SURVEY §7.3 option a): the
    * [[graft.functions.EmaAggregator]] UDAF over an unbounded-preceding
    * frame. O(1) state per row — no `collect_list` materialization — and
    * EXACT (the bounded-lookback fold in [[trueEma]] truncates ~1e-17 of
    * the weight; kept because the DuckDB oracle can only mirror a bounded
    * fold). Agreement between the two is pinned in IndicatorsSpec.
    */
  def trueEmaExact(close: Column, n: Int, w: WindowSpec): Column = {
    // windowOnly: a grouped (groupBy.agg) use of this udaf would merge
    // partial buffers in task-completion order and return order-dependent
    // EMAs — the flag turns that misuse into an immediate error
    val f = udaf(new graft.functions.EmaAggregator(2.0 / (n + 1), windowOnly = true))
    f(close).over(w.rowsBetween(Window.unboundedPreceding, 0))
  }

  /** Chunked exact EMA — the skew answer for UNBOUNDED exponential
    * recurrences, where [[chunkedIndicators]]' overlap-and-trim cannot
    * apply (the lookback is the entire history, not a bounded frame). The
    * [[graft.functions.EmaAggregator]] affine-map state makes the
    * recurrence chunk-parallel EXACTLY:
    *
    *  1. within each (symbol, chunk) — a bounded partition — the state
    *     aggregator yields per-row (cSeeded, c, m);
    *  2. the chunk's last-row state summarizes the whole chunk; the tiny
    *     per-symbol summary set folds in chunk order,
    *     s_k = c_end(k) + m_end(k)·s_{k−1} with s_1 = cSeeded_end(1),
    *     giving each chunk its incoming EMA;
    *  3. per row: ema = cSeeded (first chunk) or c + m·s_{k−1} (later) —
    *     a broadcast join of the summary table back onto the rows.
    *
    * No warm-up clones, no trimming, exact for ANY chunk sizes (the
    * composition is the same associative affine algebra merge() uses;
    * association differs from the pure sequential fold by O(ulp)).
    * Requires NaN-free input: NaN is the "no prior chunk" sentinel here,
    * so the reseed-on-NaN semantics of the row-level aggregator do not
    * extend across chunk boundaries.
    */
  // default orderCols = the FULL total order on the OHLCV testdata
  // (baseWindow's value-column tail included): the bare 4-part lineitem
  // key has one collision at sf0.001, and a tied pair would make both the
  // state window and the chunk-summary pick nondeterministic.
  /** `materialize = true` persists the per-row state frame
    * (MEMORY_AND_DISK) so the chunk-summary branch reads it back instead
    * of re-executing the scan+window diamond. A knob, not a default:
    * measured on local[16] the cache build COSTS more than the recompute
    * (local shuffle is RAM-speed), but on a cluster where recompute
    * means re-reading remote storage through a full sort, persisting the
    * narrower state frame wins. The caller owns the session's storage
    * lifecycle (blocks evict LRU).
    */
  def chunkedTrueEma(df: DataFrame, n: Int, chunkExpr: Column,
      orderCols: Seq[String] = Seq("trading_date", "l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "close", "volume", "open", "low"),
      valueCol: String = "close", out: String = "ema_chunked",
      materialize: Boolean = false): DataFrame =
    chunkedEmaAlpha(withDenseChunkIdx(df, chunkExpr), 2.0 / (n + 1),
      orderCols, Seq(valueCol -> out), materialize)
      .drop("chunk_raw", "chunk_id")

  /** Alpha-parametrized core of [[chunkedTrueEma]], operating on an
    * already-indexed frame (must carry `chunk_id` from
    * [[withDenseChunkIdx]]). Takes SEVERAL (valueCol → out) recurrences at
    * once so they share one WindowExec, one summary aggregation, and one
    * join — Wilder's gain and loss smoothings ([[chunkedWilderRsi]]) halve
    * their heavy stages this way.
    */
  private def chunkedEmaAlpha(indexed: DataFrame, alpha: Double,
      orderCols: Seq[String], cols: Seq[(String, String)],
      materialize: Boolean = false): DataFrame = {
    val stateAgg = udaf(new graft.functions.EmaStateAggregator(alpha))
    def st(i: Int) = s"_st_$i"

    // all recurrences over the SAME window spec → one WindowExec pass
    val cw = Window.partitionBy("symbol", "chunk_id").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withState0 = cols.zipWithIndex.foldLeft(indexed) {
      case (d, ((valueCol, _), i)) =>
        d.withColumn(st(i), stateAgg(col(valueCol)).over(cw))
    }
    // the state frame feeds BOTH the chunk-summary aggregation and the
    // final join: without materialization Spark re-executes the whole
    // scan+sort+window branch for the summaries (a ~2× constant);
    // persisting trades executor storage for the second pass
    val withState = if (materialize)
      withState0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else withState0

    // chunk summaries: the last row's states per (symbol, chunk), via one
    // argmax over the order key — map-side combinable, no second sort of
    // the full data (a descending row_number window would re-exchange and
    // re-sort everything just to pick one row per chunk)
    val stCols = cols.indices.map(i => col(st(i)))
    val summaries = withState.groupBy(col("symbol"), col("chunk_id"))
      .agg(max(struct(orderCols.map(col) ++ stCols: _*)).as("_m"))
      .select(Seq(col("symbol"), col("chunk_id")) ++
        cols.indices.map(i => col(s"_m.${st(i)}").as(s"_end_$i")): _*)
    // incoming state per chunk: fold PRIOR chunk summaries in order (the
    // collect_list frame is the per-symbol chunk count — tiny)
    val prevW = Window.partitionBy("symbol").orderBy("chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def foldPrev(prevs: Column): Column =
      when(size(prevs) === 0, lit(Double.NaN)).otherwise(
        aggregate(prevs, lit(Double.NaN),
          (acc, s) => when(isnan(acc), s.getField("cSeeded"))
            .otherwise(s.getField("c") + s.getField("m") * acc)))
    val incoming = cols.indices.foldLeft(summaries) { (d, i) =>
      d.withColumn(s"_s_prev_$i", foldPrev(collect_list(col(s"_end_$i")).over(prevW)))
    }.select(Seq(col("symbol"), col("chunk_id")) ++
      cols.indices.map(i => col(s"_s_prev_$i")): _*)

    val joined = withState.join(broadcast(incoming), Seq("symbol", "chunk_id"))
    cols.zipWithIndex.foldLeft(joined) { case (d, ((_, out), i)) =>
      d.withColumn(out,
        when(isnan(col(s"_s_prev_$i")), col(s"${st(i)}.cSeeded"))
          .otherwise(col(s"${st(i)}.c") + col(s"${st(i)}.m") * col(s"_s_prev_$i")))
        .drop(st(i), s"_s_prev_$i")
    }
  }

  /** Chunked Wilder RSI — the full chunk decomposition of
    * [[withWilderRsiExact]], closing the last unbounded recurrence in the
    * indicator family. Two mechanisms compose:
    *
    *  - the price change needs ONE row of cross-chunk context: each
    *    chunk's first `chg` comes from the previous chunk's last close,
    *    carried through the same per-(symbol, chunk) argmax summary +
    *    prefix join used everywhere else (no row clones, no trimming);
    *  - gain and loss then run [[chunkedEmaAlpha]] (α = 1/n) over the
    *    SHARED chunk index.
    *
    * Agreement with the plain-window path is pinned by ChunkedSpec.
    */
  def chunkedWilderRsi(df: DataFrame, chunkExpr: Column,
      orderCols: Seq[String] = Seq("trading_date", "l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "close", "volume", "open", "low"),
      n: Int = 14, out: String = "rsi_wilder_chunked",
      materialize: Boolean = false): DataFrame = {
    val indexed = withDenseChunkIdx(df, chunkExpr)
    val cw = Window.partitionBy("symbol", "chunk_id").orderBy(orderCols.map(col): _*)

    // previous chunk's closing price per (symbol, chunk): argmax summary +
    // lag over the tiny per-symbol chunk set (close appended to the
    // summary struct only when it isn't already an order column)
    val summaryFields = orderCols.map(col) ++
      (if (orderCols.contains("close")) Nil else Seq(col("close")))
    val lastClose = indexed.groupBy(col("symbol"), col("chunk_id"))
      .agg(max(struct(summaryFields: _*)).as("_m"))
      .select(col("symbol"), col("chunk_id"), col("_m.close").as("_last_close"))
    val prevClose = lastClose
      .withColumn("_prev_close", lag(col("_last_close"), 1).over(
        Window.partitionBy("symbol").orderBy("chunk_id")))
      .select(col("symbol"), col("chunk_id"), col("_prev_close"))

    val withChg = indexed.join(broadcast(prevClose), Seq("symbol", "chunk_id"))
      .withColumn("w_chg",
        col("close") - coalesce(lag(col("close"), 1).over(cw), col("_prev_close")))
      .withColumn("w_gain", when(col("w_chg") > 0, col("w_chg")).otherwise(lit(0.0)))
      .withColumn("w_loss", when(col("w_chg") < 0, -col("w_chg")).otherwise(lit(0.0)))

    val smoothed = chunkedEmaAlpha(withChg, 1.0 / n, orderCols,
      Seq("w_gain" -> "w_avg_gain", "w_loss" -> "w_avg_loss"), materialize)
    smoothed
      .withColumn(out, rsiFrom(col("w_avg_gain"), col("w_avg_loss")))
      .drop("chunk_raw", "chunk_id", "_prev_close",
        "w_chg", "w_gain", "w_loss", "w_avg_gain", "w_avg_loss")
  }

  /** The reference's RSI combination quirk, shared by every Wilder path:
    * rs saturates to 100 when the average loss is exactly zero
    * (`etl_job.py:312` fidelity contract — keep all copies identical).
    */
  private def rsiFrom(avgGain: Column, avgLoss: Column): Column =
    lit(100.0) - (lit(100.0) / (lit(1.0) +
      when(avgLoss =!= 0, avgGain / avgLoss).otherwise(lit(100.0))))

  /** Wilder-smoothed RSI (fidelity upgrade over W8's plain-SMA variant,
    * SURVEY §7.3): avg_gain_t = (avg_gain_{t−1}·(n−1) + gain_t)/n — the
    * same exponential recurrence as EMA with α = 1/n, seeded by the first
    * value. Same bounded-lookback closed form as [[trueEma]]: the default
    * 512-row lookback truncates (1−1/14)^511 ≈ 4e-17 of the weight —
    * below double precision.
    */
  def withWilderRsi(df: DataFrame, w: WindowSpec, n: Int = 14, lookback: Int = 512): DataFrame = {
    val alpha = 1.0 / n
    def smooth(c: Column): Column =
      aggregate(collect_list(c).over(w.rowsBetween(-(lookback - 1), 0)),
        lit(Double.NaN),
        (acc, x) => when(isnan(acc), x).otherwise(x * lit(alpha) + acc * lit(1 - alpha)))
    // gains/losses materialized first: the recurrence window cannot nest
    // the lag window in a single pass
    df.withColumn("w_chg", col("close") - lag(col("close"), 1).over(w))
      .withColumn("w_gain", when(col("w_chg") > 0, col("w_chg")).otherwise(lit(0.0)))
      .withColumn("w_loss", when(col("w_chg") < 0, -col("w_chg")).otherwise(lit(0.0)))
      .withColumn("w_avg_gain", smooth(col("w_gain")))
      .withColumn("w_avg_loss", smooth(col("w_loss")))
      .withColumn("rsi_wilder", rsiFrom(col("w_avg_gain"), col("w_avg_loss")))
      .drop("w_chg", "w_gain", "w_loss", "w_avg_gain", "w_avg_loss")
  }

  /** Wilder RSI, production path: same recurrence through the
    * [[graft.functions.EmaAggregator]] (α = 1/n) over an unbounded frame —
    * O(1) state per row instead of the 512-double `collect_list` frame of
    * [[withWilderRsi]], and exact rather than lookback-truncated.
    */
  def withWilderRsiExact(df: DataFrame, w: WindowSpec, n: Int = 14): DataFrame = {
    // windowOnly = true: see trueEmaExact — grouped use would be
    // merge-order-dependent and must fail fast
    val smooth = udaf(new graft.functions.EmaAggregator(1.0 / n, windowOnly = true))
    def run(c: Column): Column = smooth(c).over(w.rowsBetween(Window.unboundedPreceding, 0))
    df.withColumn("w_chg", col("close") - lag(col("close"), 1).over(w))
      .withColumn("w_gain", when(col("w_chg") > 0, col("w_chg")).otherwise(lit(0.0)))
      .withColumn("w_loss", when(col("w_chg") < 0, -col("w_chg")).otherwise(lit(0.0)))
      .withColumn("w_avg_gain", run(col("w_gain")))
      .withColumn("w_avg_loss", run(col("w_loss")))
      .withColumn("rsi_wilder", rsiFrom(col("w_avg_gain"), col("w_avg_loss")))
      .drop("w_chg", "w_gain", "w_loss", "w_avg_gain", "w_avg_loss")
  }
}
