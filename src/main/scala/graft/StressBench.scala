package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Indicators}

/** Hot-key stress bench — the measurement behind the engine's central
  * 100× claim. The reference partitions every window by symbol alone
  * (`/root/reference/spark-job/etl_job.py:267`), so ONE symbol's whole
  * history lands in ONE task: the plain paths here are that wall,
  * reproduced by overwriting `symbol` with a single constant so the full
  * sf frame (~600k rows at sf0.1) becomes one window partition. The
  * chunked decompositions (overlap-and-trim for bounded frames, affine-
  * state composition for EMA/Wilder recurrences, summary carry-forward
  * for as-of) split that partition into bounded (symbol, chunk) tasks —
  * result-identical (pinned by ChunkedSpec/AsOfJoinSpec) but parallel.
  *
  * Prints one JSON line:
  *   {"metric":"stress","rows":N,"cpus":C,"pairs":{"indicators":{"plain":s,
  *    "chunked":s},...}}
  * and appends nothing else to stdout that starts with '{'.
  *
  * Usage: runMain graft.StressBench [sfDir]  (env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_STRESS_OUT for the JSON file copy).
  */
object StressBench {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // .toInt up front: fail fast on a non-integer env value rather than
    // emitting malformed (unquoted-string) JSON at the end of the run
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", GraftSession.ExcludedRules)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ONE symbol's entire history: the skew case the chunked family exists
    // for. The sf frame alone (~600k rows) still single-task-sorts in
    // under a second, so the frame is replicated `scale`× with the date
    // range shifted per replica (the 7-year span is 2557 days) — row
    // order stays total, chunk buckets stay monotone, and the hot key
    // grows to scale·600k rows in ONE window partition, which is where
    // the reference's partition-by-symbol-only layout actually breaks.
    // Chunk width = month: ~84·scale chunks, each ~7k rows — far above
    // the 199-row warm-up minimum chunkedIndicators needs.
    val scale = sys.env.getOrElse("SPARK_GRAFT_STRESS_SCALE", "10").toInt
    val hot = Tables.ohlcv(spark, sfDir)
      .withColumn("symbol", lit("HOT"))
      .withColumn("_rep", explode(sequence(lit(0), lit(scale - 1))))
      .withColumn("trading_date", date_add(col("trading_date"), col("_rep") * 2557))
      .drop("_rep")
    val nRows = hot.count()
    val monthChunk = date_trunc("month", col("trading_date"))
    val w = Indicators.baseWindow()

    // as-of probe/quote frames, all on the hot key: EVERY hot row probes
    // for its prevailing quote — the canonical "trade → latest quote"
    // shape, so the plain path's single-key window really carries
    // 2·nRows stacked rows in ONE task. Quotes stay RAW (duplicate
    // (key, time) rows resolve deterministically to the greatest value on
    // both paths — the asofJoin contract): routing them through
    // latestPerKeyTime would bolt a fine-grained window pass onto BOTH
    // paths equally and measure that shared constant instead of the
    // skew wall (the round-3 bench's mistake — its probes were also a
    // small non-replicated orders frame, so plain≈chunked by
    // construction).
    val quotes = hot.select(col("symbol"), col("trading_date"), col("close"))
    val probes = hot.select(col("symbol"), col("trading_date"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .withColumnRenamed("trading_date", "probe_date")

    // (name, plain, chunked, checksum expr): the consumer AGGREGATES the
    // produced columns — a bare count() would let Catalyst prune the
    // unused Window operators and time an empty plan. The checksum also
    // doubles as the cross-path equality probe at this scale (value
    // equality on exact frames is pinned by ChunkedSpec/AsOfJoinSpec;
    // chunk composition associates doubles differently, so sums agree to
    // relative 1e-9, not bitwise).
    val indicatorSum = Indicators.indicatorCols
      .map(c => coalesce(col(c), lit(0.0))).reduce(_ + _)
    val pairs: Seq[(String, () => DataFrame, () => DataFrame, org.apache.spark.sql.Column)] = Seq(
      ("indicators",
        () => Indicators.withIndicators(hot, w),
        () => Indicators.chunkedIndicators(hot, monthChunk),
        indicatorSum),
      // materialize=false: the persist knob was MEASURED COUNTERPRODUCTIVE
      // here (ema chunked 12→17 s, rsi 27→34 s) — building the in-memory
      // columnar cache of the wide state frame costs more than re-running
      // the scan+shuffle+window diamond when shuffle is local-RAM-speed.
      // The knob exists for clusters where recompute means re-reading
      // remote storage; locally recompute wins.
      ("ema_true",
        () => hot.withColumn("ema", Indicators.trueEmaExact(col("close"), 12, w)),
        () => Indicators.chunkedTrueEma(hot, 12, monthChunk, out = "ema"),
        col("ema")),
      ("rsi_wilder",
        () => Indicators.withWilderRsiExact(hot, w),
        () => Indicators.chunkedWilderRsi(hot, monthChunk, out = "rsi_wilder"),
        col("rsi_wilder")),
      // OBV isolated: the one UNBOUNDED running sum in the indicator
      // family — the pure prefix-sum decomposition without the bounded
      // ROWS frames (no warm-up cloning on the chunked path at all)
      ("obv",
        () => Indicators.withObv(hot, w),
        () => Indicators.chunkedObv(hot, monthChunk),
        col("obv")),
      ("asof_join",
        () => AsOfJoin.asofJoin(probes, quotes, "symbol", "probe_date",
          "trading_date", "close", "asof_close"),
        () => AsOfJoin.asofJoinChunked(probes, quotes, "symbol", "probe_date",
          "trading_date", "close", "asof_close", t => date_trunc("month", t)),
        col("asof_close")))

    // optional pair filter (comma list, e.g. "rsi_wilder,asof_join") —
    // lets targeted reruns (x20 scale on just the previously-weak pairs)
    // skip the quarter-hour indicators pair
    val only = sys.env.get("SPARK_GRAFT_STRESS_PAIRS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail fast on a typo'd pair name (same stance as the .toInt above):
    // a filter that silently selects nothing publishes an empty result
    // after a quarter-hour run
    only.foreach { names =>
      val known = pairs.map(_._1).toSet
      require(names.nonEmpty && names.subsetOf(known),
        s"SPARK_GRAFT_STRESS_PAIRS must name pairs from $known, got $names")
    }
    val selected = only.fold(pairs)(names => pairs.filter(p => names(p._1)))

    // warm-up (codegen + classloading outside timed runs)
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    def force(mk: () => DataFrame, chk: org.apache.spark.sql.Column): Double =
      mk().select(sum(chk)).head.getDouble(0)
    def time(mk: () => DataFrame, chk: org.apache.spark.sql.Column): Double = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        force(mk, chk)
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val results = selected.map { case (name, plain, chunked, chk) =>
      val (sp, sc) = (force(plain, chk), force(chunked, chk))
      // 1e-6 relative: two differently-associated parallel sums of ~10^7
      // doubles legitimately differ by ~n·eps ≈ 1e-9 relative (more under
      // cancellation) — a tolerance at that boundary would abort honest
      // runs at higher SPARK_GRAFT_STRESS_SCALE
      require(math.abs(sp - sc) <= 1e-6 * math.max(math.abs(sp), 1.0),
        s"$name: plain checksum $sp vs chunked $sc")
      val tp = time(plain, chk)
      val tc = time(chunked, chk)
      println(f"[stress] $name%-12s plain=$tp%6.2fs  chunked=$tc%6.2fs  speedup=${tp / tc}%4.1fx")
      name -> ((tp, tc))
    }

    // ---- incremental boundary modes at a hot 6M-row processed history:
    // Truncated (reference semantics: new rows only), OverlapReload
    // without a history bound (tail-finding row_number-sorts the WHOLE
    // history — the honest worst case), and OverlapReload with the
    // realistic time-bound hint (history scan pruned to ~2 chunk-widths
    // before the watermark; the ≤199-row re-read itself is then the only
    // overlap cost). One increment = the last 3 months of the hot frame.
    // a targeted pair rerun (filter set) skips the incremental modes —
    // they measure a different axis (boundary handling, not the chunked
    // window family) — INCLUDING their setup: the max-date aggregation
    // over the hot frame and the temp state dirs are not free either
    val incResults = if (only.isDefined) Nil else {
      val incInput = hot.withColumn("timestamp", to_timestamp(col("trading_date")))
      val maxDate = incInput.agg(max(col("trading_date"))).head.getDate(0)
      val cutoff = java.sql.Date.valueOf(maxDate.toLocalDate.minusDays(90))
      val incOrd = Seq("trading_date", "l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey", "close", "volume", "open", "low")
      val incBase = java.nio.file.Files.createTempDirectory("graft_inc_stress").toString
      import spark.implicits._
      def seedState(name: String): (String, String) = {
        val state = s"$incBase/wm_$name"
        graft.operators.Incremental.advanceWatermarks(spark, state,
          Seq(("HOT", java.sql.Timestamp.valueOf(cutoff.toLocalDate.atStartOfDay())))
            .toDF("symbol", "last_processed_timestamp"))
        (state, s"$incBase/out_$name")
      }
      val incModes: Seq[(String, Option[org.apache.spark.sql.Column], graft.operators.Incremental.BoundaryMode)] = Seq(
        ("truncated", None, graft.operators.Incremental.Truncated),
        ("overlap_unbounded", None, graft.operators.Incremental.OverlapReload),
        ("overlap_bounded",
          // a bound safely covering maxFrame-1 = 199 trading rows: 2 months
          // of this frame carries ~14k rows/month at scale 10
          Some(col("timestamp") >= to_timestamp(lit(
            java.sql.Date.valueOf(cutoff.toLocalDate.minusDays(62))))),
          graft.operators.Incremental.OverlapReload))
      incModes.map { case (name, bound, mode) =>
        val (state, out) = seedState(name)
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val done = graft.operators.Incremental.runIncremental(
          spark, incInput, state, out, mode, incOrd, bound)
        val n = done.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[stress] incremental/$name%-18s $t%6.2fs  ($n rows)")
        name -> t
      }
    }
    val incJson = incResults.map { case (n, t) => s""""$n":$t""" }
      .mkString("{", ",", "}")

    val qs = results.map { case (n, (tp, tc)) =>
      s""""$n":{"plain":$tp,"chunked":$tc}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"stress","rows":$nRows,"cpus":$cpus,"sf":"$sfDir","pairs":$qs,"incremental":$incJson}"""
    println(json)
    sys.env.get("SPARK_GRAFT_STRESS_OUT").foreach { f =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[stress] WARN could not write $f: $e") }
    }
    spark.stop()
  }
}
