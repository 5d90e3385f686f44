package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Queries.Q

/** Warehouse-shaped operators the reference's sink side implies but never
  * states as queries: slowly-changing-dimension history build (the batch
  * analogue of its Mongo/ES upsert-by-key sinks — reference
  * `spark-job/etl_job.py:406-462` keeps only the LATEST row per key; SCD2
  * keeps every version with validity intervals), calendar gap-filling with
  * forward-fill (the `asfreq`/`ffill` step every daily-bar consumer runs
  * before indicators), and the date×symbol wide pivot (the returns-matrix
  * layout portfolio analytics start from).
  *
  * All three are single-exchange window/aggregate plans with exact
  * (decimal/integer/per-row-carried) arithmetic — hash-oracle-able rule-1/2
  * style, no float reductions anywhere.
  */
object QueriesWarehouse {

  private def dailyClose(s: SparkSession, dir: String): DataFrame =
    Tables.ohlcv(s, dir)
      .groupBy(col("symbol"), col("trading_date"))
      .agg(max(struct(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("close"))).as("_m"))
      .select(col("symbol"), col("trading_date"), col("_m.close").as("close"))

  private val dailySql =
    """daily AS (SELECT symbol, trading_date, close FROM base
      |   QUALIFY ROW_NUMBER() OVER (PARTITION BY symbol, trading_date
      |     ORDER BY l_orderkey DESC, l_linenumber DESC, l_partkey DESC, l_suppkey DESC) = 1)""".stripMargin

  // ------------------------------------------------- SCD2 dimension build
  // Type-2 history from the orders fact: per customer, each run of equal
  // o_orderstatus collapses to one version row with
  // [effective_from, effective_to) validity and a version number. The
  // reference's upsert sinks implement SCD1 (overwrite in place,
  // etl_job.py:431-448); this is the auditable twin a warehouse needs.
  //
  // Plan shape: ONE exchange on o_custkey feeds both window passes — the
  // change-detection lag() and, after the filter drops in-run repeats, the
  // lead()/row_number() over the (much smaller) change rows. Filters
  // preserve child distribution and order, so Catalyst plans the second
  // WindowExec without a new shuffle or sort. At 100 TB the version rows
  // are a tiny fraction of the fact — the expensive frame is only sorted
  // once, and nothing is ever collected.
  /** The SCD2 dimension frame — shared by the history key and the
    * point-in-time lookup so the two can never desynchronize.
    */
  private def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("_prev", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("_prev").isNull || col("o_orderstatus") =!= col("_prev"))
      .withColumn("version", row_number().over(w))
      .withColumn("effective_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"), col("o_orderstatus").as("status"),
        col("o_orderdate").as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  /** Shared oracle CTE text for the SCD2 dimension (mirrors [[scd2Dim]]). */
  private val scd2DimCtes =
    """runs AS (
      |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
      |    LAG(o_orderstatus, 1) OVER w AS _prev
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      | changes AS (SELECT * FROM runs WHERE _prev IS NULL OR o_orderstatus <> _prev),
      | dim AS (SELECT o_custkey,
      |  CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |  o_orderstatus AS status,
      |  o_orderdate AS effective_from,
      |  LEAD(o_orderdate, 1) OVER w AS effective_to
      | FROM changes
      | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))""".stripMargin

  private val scd2Q = Q(
    (s, dir) => scd2Dim(s, dir).orderBy(col("o_custkey"), col("version")),
    Some(
      s"""WITH $scd2DimCtes
        | SELECT o_custkey, version, status, effective_from, effective_to,
        |  effective_to IS NULL AS is_current
        | FROM dim
        | ORDER BY o_custkey, version""".stripMargin))

  // ------------------------------------- SCD2 point-in-time lookup join
  // The temporal join the SCD2 history exists FOR: every order fact
  // resolves the dimension version that was valid AT its date —
  // o_custkey equality plus the half-open validity interval
  // [effective_from, effective_to). Versions partition each customer's
  // timeline, so the join is exactly 1:1 (row count = facts; the zero-
  // width intervals a same-date status flip produces match nothing by
  // the half-open rule — both engines agree by construction). 100 TB
  // shape: the interval predicate is a RESIDUAL on a custkey equi-join —
  // never a BNLJ — and the dim side is the tiny version table, so the
  // fact stream shuffles once on the key it already aggregates by.
  private val scd2PitQ = Q(
    (s, dir) => {
      val dim = scd2Dim(s, dir)
        .select(col("o_custkey").as("d_custkey"), col("version"),
          col("status").as("status_at_order"),
          col("effective_from"), col("effective_to"), col("is_current"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .join(dim,
          col("o_custkey") === col("d_custkey") &&
            col("o_orderdate") >= col("effective_from") &&
            (col("effective_to").isNull ||
              col("o_orderdate") < col("effective_to")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("version"), col("status_at_order"), col("is_current"))
        .orderBy(col("o_orderkey"))
    },
    Some(
      s"""WITH $scd2DimCtes
        | SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
        |  d.version, d.status AS status_at_order,
        |  d.effective_to IS NULL AS is_current
        | FROM orders f JOIN dim d ON f.o_custkey = d.o_custkey
        |  AND f.o_orderdate >= d.effective_from
        |  AND (d.effective_to IS NULL OR f.o_orderdate < d.effective_to)
        | ORDER BY f.o_orderkey""".stripMargin))

  // -------------------------------------- calendar gap-fill + forward fill
  // Densify each symbol's daily bars onto its own [min, max] calendar and
  // forward-fill the close across the gaps — the asfreq('D')/ffill step
  // (reference consumers do this in pandas before charting/indicators;
  // the engine states it as one declarative plan).
  //
  // Plan shape: bounds are a map-side-partial groupBy (3 rows per symbol
  // universe); the calendar is sequence()+explode over those rows —
  // O(days) rows generated WITHOUT touching the fact again; the fill is
  // last(ignoreNulls) over an unbounded-preceding frame. At 100 TB the
  // left join ships compact (symbol, date, close) triples and the window
  // is the standard per-symbol carry — a hot symbol takes the
  // chunked-decomposition treatment (chunk-local last + per-chunk summary
  // coalesce, exactly AsOfJoin's carry-forward shape).
  // Forward-fill carries source values verbatim (no arithmetic), so the
  // oracle matches bitwise with no quantization.
  private val ffillQ = Q(
    (s, dir) => {
      val daily = dailyClose(s, dir)
      val cal = daily.groupBy(col("symbol"))
        .agg(min(col("trading_date")).as("_d0"), max(col("trading_date")).as("_d1"))
        .select(col("symbol"),
          explode(sequence(col("_d0"), col("_d1"), expr("INTERVAL 1 DAY"))).as("trading_date"))
      val filled = cal.join(daily, Seq("symbol", "trading_date"), "left")
      val w = Window.partitionBy("symbol").orderBy("trading_date")
        .rowsBetween(Window.unboundedPreceding, 0)
      filled
        .withColumn("close_ff", last(col("close"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("close").isNull)
        .select(col("symbol"), col("trading_date"), col("close_ff"), col("is_gap"))
        .orderBy(col("symbol"), col("trading_date"))
    },
    Some(
      s"""WITH base AS (${Tables.ohlcvSql}),
         | $dailySql,
         | cal AS (SELECT symbol,
         |    unnest(generate_series(_d0, _d1, INTERVAL 1 DAY)) AS trading_date
         |  FROM (SELECT symbol, MIN(trading_date) AS _d0, MAX(trading_date) AS _d1
         |        FROM daily GROUP BY symbol)),
         | j AS (SELECT c.symbol, c.trading_date, d.close
         |  FROM cal c LEFT JOIN daily d
         |    ON d.symbol = c.symbol AND d.trading_date = c.trading_date)
         | SELECT symbol, trading_date,
         |  LAST_VALUE(close IGNORE NULLS) OVER (PARTITION BY symbol ORDER BY trading_date
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ff,
         |  close IS NULL AS is_gap
         | FROM j ORDER BY symbol, trading_date""".stripMargin))

  // --------------------------------------------- date×symbol wide pivot
  // The close matrix: one row per trading date, one column per symbol —
  // the layout cross-sectional analytics (correlation matrices, portfolio
  // weights) start from. The symbol list is passed EXPLICITLY to pivot():
  // without it Spark runs a separate distinct job and collects the values
  // to the driver to plan the schema — at a 1000-name universe that is a
  // silent extra pass over the fact. Post-dedup each (date, symbol) cell
  // holds exactly one value, so max() is the value (and mirrors as
  // conditional aggregation in ANSI SQL). One compact-key shuffle total.
  private val pivotQ = Q(
    (s, dir) => {
      dailyClose(s, dir)
        .groupBy(col("trading_date"))
        .pivot("symbol", Seq("A", "N", "R"))
        .agg(max(col("close")))
        .withColumnsRenamed(Map("A" -> "close_a", "N" -> "close_n", "R" -> "close_r"))
        .orderBy(col("trading_date"))
    },
    Some(
      s"""WITH base AS (${Tables.ohlcvSql}),
         | $dailySql
         | SELECT trading_date,
         |  MAX(CASE WHEN symbol = 'A' THEN close END) AS close_a,
         |  MAX(CASE WHEN symbol = 'N' THEN close END) AS close_n,
         |  MAX(CASE WHEN symbol = 'R' THEN close END) AS close_r
         | FROM daily GROUP BY trading_date ORDER BY trading_date""".stripMargin))

  // ------------------------------------------- ROLLUP subtotal cube
  // Hierarchical subtotals over the lineitem fact (the classic OLAP
  // grouping-sets shape this inventory was still missing): per
  // (returnflag, linestatus), per returnflag, and grand total in ONE
  // pass — Spark plans rollup as a single scan + Expand (each row
  // replicated once per grouping set) feeding one HashAggregate, so the
  // fact is read once however many subtotal levels roll up. grouping()
  // flags disambiguate "NULL because rolled up" from a genuinely null
  // dimension value and make the output ordering total. Measures are
  // decimal-exact sums cast back to double (determinism rule 2).
  private val rollupQ = Q(
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast(IntegerType).as("g_flag"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_status"),
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 6)))
            .cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 6)))
            .cast(DoubleType).as("sum_price"))
        .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"),
          col("l_linestatus")),
    Some(
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        | FROM lineitem
        | GROUP BY ROLLUP (l_returnflag, l_linestatus)
        | ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin))

  // ------------------------------------------------ CUBE grouping lattice
  // The full 2ᵏ grouping lattice over (returnflag, ship year) —
  // rollup's sibling covering the subtotal sets a hierarchy omits
  // (per-year with flags rolled up) — with grouping_id() as the set
  // discriminator:
  // the single integer BI tools pivot on, bit k set when groupBy
  // column k is rolled up (Spark and DuckDB/Postgres agree on the
  // first-column-is-MSB convention, which this key proves). Same
  // one-scan Expand + one HashAggregate plan as rollup; measures
  // decimal-exact.
  private val cubeQ = Q(
    (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("ship_year", year(col("l_shipdate")).cast(LongType))
        .cube(col("l_returnflag"), col("ship_year"))
        .agg(
          grouping_id().cast(LongType).as("gid"),
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 6)))
            .cast(DoubleType).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag"), col("ship_year")),
    Some(
      """WITH f AS (SELECT *, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
        |    AS ship_year FROM lineitem)
        | SELECT CAST(GROUPING(l_returnflag, ship_year) AS BIGINT) AS gid,
        |  l_returnflag, ship_year,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        | FROM f
        | GROUP BY CUBE (l_returnflag, ship_year)
        | ORDER BY gid, l_returnflag, ship_year""".stripMargin))

  // --------------------------------------- bloom-filtered selective join
  // The explicit form of Catalyst's runtime bloom filter
  // (InjectRuntimeFilter): a selective dim (orders above a price
  // threshold) joins the fact, and the fact side is pre-filtered by a
  // bloom built over the dim keys BEFORE the exchange — probe misses
  // never enter the shuffle. At 100 TB this is the pattern for a
  // dim too big to broadcast but selective enough to prune most of the
  // fact: the serialized filter is a few hundred KB (vs GBs of dim
  // rows), ships once per task, and the probe is one codegen'd
  // xxhash64 + bit test per row (operators.BloomJoin).
  //
  // Correctness is exact, not approximate: the bloom has no false
  // negatives and the join itself removes false positives, so the
  // result IS the plain join — which the oracle states. The one-row
  // driver collect is the serialized bloom, same bounded-artifact
  // stance as the ANN centroid collects. The shuffle-hash hint states
  // the big-big shape (without it AQE would broadcast this sf's dim and
  // the pre-filter would be moot); filter selectivity + plan shape are
  // pinned in PlanSpec.
  private val bloomJoinQ = Q(
    (s, dir) => {
      val dim = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 480000.0)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      val fact = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
      graft.operators.BloomJoin
        .bloomJoin(fact, col("l_orderkey"), dim, col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"), col("o_totalprice"),
          col("o_orderdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
    },
    Some(
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | l_extendedprice, o_totalprice, o_orderdate
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_totalprice > 480000.0
        | ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin))

  // ------------------------------------------------ z-order layout key
  // The clustering key behind sources.ZOrderLayout: the Morton
  // interleave of (l_partkey, l_suppkey) as exact long bit math, stated
  // per-row so the oracle can restate the identical mask-spread
  // sequence in ANSI SQL and hash-match it. The layout WRITE
  // (range-partition by z + sort-within + parquet) and its measured
  // row-group-skipping payoff are pinned in LayoutSpec — a write is a
  // side effect and has no place in an oracle key; the z-value is the
  // part with engine-checkable semantics.
  private val zorderQ = Q(
    (s, dir) => {
      import graft.sources.ZOrderLayout.zValue
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          zValue(col("l_partkey"), col("l_suppkey")).as("zvalue"))
        .orderBy(col("zvalue"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
    },
    Some(
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |   l_partkey & 65535 AS x0, l_suppkey & 65535 AS y0 FROM lineitem),
        | s1 AS (SELECT *, (x0 | (x0 << 8)) & 16711935 AS x1,
        |                  (y0 | (y0 << 8)) & 16711935 AS y1 FROM b),
        | s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
        |                  (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        | s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
        |                  (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        | s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |                  (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3)
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  (x4 | (y4 << 1)) AS zvalue
        | FROM s4
        | ORDER BY zvalue, l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin))

  val all: Map[String, Q] = Map(
    "scd2_history" -> scd2Q,
    "ffill_calendar" -> ffillQ,
    "pivot_close" -> pivotQ,
    "sales_rollup" -> rollupQ,
    "sales_cube" -> cubeQ,
    "scd2_pit_lookup" -> scd2PitQ,
    "bloom_join" -> bloomJoinQ,
    "zorder_layout" -> zorderQ
  )
}
