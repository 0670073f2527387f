package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.2-2.3), expressed
  * Spark-first as declarative DataFrame plans so Catalyst gets predicate
  * pushdown / column pruning / join selection for free.
  *
  * Every query here has a DuckDB oracle (SparkEntry.oracleSql); aggregates
  * over doubles are `round`ed identically on both sides so the driver's
  * value-hash compare is stable against floating-point summation order.
  * All outputs carry an explicit total ORDER BY on a unique key set.
  *
  * Reference coverage notes (constellation-rs/amadeus):
  *  - scan+filter+count ≅ tests/parquet.rs:19-35 shape
  *  - histogram ≅ amadeus-core/src/par_sink/histogram.rs
  *  - broadcast joins ≅ amadeus-core/src/par_stream/join.rs (broadcast-only)
  *  - chain ≅ par_stream.rs:129-135 (union-all semantics)
  *  - mean/stddev ≅ par_sink/{mean,stddev}.rs (population stddev)
  *  - top-n ≅ sort_n_by / amadeus-streaming/src/sort.rs (TakeOrderedAndProject)
  *  - fork/tuple sinks ≅ single-pass multi-aggregate agg(a1..a8)
  *  - all/any ≅ par_sink/{all,any}.rs
  * Window/rollup/semi/anti/distinct exceed the reference (listed missing in
  * SURVEY §2.2) and map to Spark built-ins.
  */
/** Typed projection for the q58 Dataset-API gate — top-level so the
  * case-class Encoder derives cleanly (the reference's `#[derive(Data)]`
  * struct analog). */
final case class LineItemSlim(l_orderkey: Long, l_quantity: Double,
    l_returnflag: String)

object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map[String, Q](
    // -- TPC-H Q1 shape: the canonical partial+final aggregation ---------
    "q01_tpch_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // -- scan + pushed filter + count (reference tests/parquet.rs shape) --
    "q02_scan_filter_count" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("n"))
    }),

    // -- histogram: groupBy + count + sort ------------------------------
    "q03_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))),

    // -- broadcast inner equi-join (the reference's only join kind) ------
    "q04_join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // -- bounded top-n (sort_n_by): Catalyst TakeOrderedAndProject -------
    "q05_topn" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    // -- broadcast left outer join + agg ---------------------------------
    "q06_left_join_agg" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // -- chain (union-all bag semantics) ---------------------------------
    "q07_union_chain" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_quantity") < 5).select(col("l_returnflag"))
      val b = li.filter(col("l_quantity") > 48).select(col("l_returnflag"))
      a.union(b).groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // -- exact distinct (exceeds reference: it only has HLL approx) ------
    "q08_count_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))),

    // -- mean (Kahan in reference) + population stddev (Welford) ---------
    "q09_stats" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        round(avg(col("l_quantity")), 4).as("mean_qty"),
        round(stddev_pop(col("l_quantity")), 4).as("sd_qty"),
        round(avg(col("l_extendedprice")), 2).as("mean_price"),
        round(stddev_pop(col("l_extendedprice")), 2).as("sd_price"))),

    // -- min/max combiners ----------------------------------------------
    "q10_minmax" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        min(col("l_returnflag")).as("min_flag"),
        max(col("l_returnflag")).as("max_flag"))),

    // -- window function (exceeds reference): top order per customer -----
    "q11_window_top_order" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("top_price"))
        .orderBy(col("o_custkey"))
    }),

    // -- rollup (exceeds reference) --------------------------------------
    // -- relational DIVISION ("for all"): customers with orders in EVERY
    // priority class — the classic ∀ query, expressed as distinct-count
    // equality against the class-universe cardinality.
    "q61_relational_division" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val nClasses = o.select(col("o_orderpriority")).distinct().count()
      o.groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderpriority")).as("n_classes"),
          count(lit(1)).as("n_orders"))
        .filter(col("n_classes") === nClasses)
        .select(col("o_custkey"), col("n_orders"))
        .orderBy(col("o_custkey"))
    }),

    // -- window suite 2: dense_rank / percent_rank / cume_dist /
    // first_value / last_value / nth_value with EXPLICIT frames (q35
    // covers lag/lead/rank/ntile/running sums). Unique per-partition
    // ordering keeps the rank family deterministic.
    "q60_window_suite2" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wCur = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("drk", dense_rank().over(w))
        .withColumn("prk", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .withColumn("first_c", first(col("cents")).over(wCur))
        .withColumn("last_c", last(col("cents")).over(wAll))
        .withColumn("nth2", nth_value(col("cents"), 2).over(wCur))
        .select(col("o_orderkey"), col("o_custkey"), col("drk"), col("prk"),
          col("cd"), col("first_c"), col("last_c"), col("nth2"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // -- UNPIVOT (wide → long reshape, the q30 pivot inverse): per-flag
    // quantity/price sums stacked back into (flag, measure, value) rows.
    "q59_unpivot" -> ((s, d) => {
      val wide = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"),
          round(sum(col("l_extendedprice")), 2).as("price"))
      wide.selectExpr("l_returnflag",
          "stack(2, 'qty', qty, 'price', price) AS (measure, value)")
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // -- typed Dataset API surface end-to-end: case-class rows, lambda
    // filter, groupByKey + mapGroups — the reference's derive(Data)
    // struct pipeline shape as a GATE (quantities are integral doubles,
    // so the in-group sum is exact regardless of iterator order).
    "q58_typed_dataset" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .as[LineItemSlim]
        .filter(_.l_quantity > 30)
        .groupByKey(_.l_returnflag)
        .mapGroups { (k, it) =>
          var n = 0L; var qty = 0.0
          it.foreach { r => n += 1; qty += r.l_quantity }
          (k, n, math.round(qty * 100))
        }
        .toDF("rf", "n", "qty_x100")
        .orderBy(col("rf"))
    }),

    // -- plain-SQL API surface: the same engine through spark.sql over a
    // registered view — a reference user can keep writing SQL verbatim.
    "q57_sql_surface" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_sql")
      s.sql("""
        SELECT l_returnflag AS rf, l_linestatus AS ls,
          count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
          round(avg(l_extendedprice), 4) AS avg_price
        FROM li_sql WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY rf, ls""")
    }),

    // -- GROUPING SETS with an asymmetric set list ((rf,ls),(rf),(ls)) —
    // not expressible as rollup or cube; one pass, engine expands the
    // grouping combinations in the aggregate (Expand node, no rescan).
    "q56_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))),

    "q12_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))),

    // -- time bucketing ≅ DateTime::truncate_minutes (time.rs:573-580) ---
    "q13_time_bucket" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("bucket"), col("event_type"))),

    // -- all / any (short-circuit in reference par_sink/{all,any}.rs) ----
    "q14_all_any" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        expr("bool_and(l_quantity > 0)").as("all_pos_qty"),
        expr("bool_or(l_discount > 0.09)").as("any_big_disc"),
        expr("bool_and(l_extendedprice > 100000)").as("all_expensive"))),

    // -- semi join (EXISTS; exceeds reference) ---------------------------
    "q15_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // -- anti join (NOT EXISTS; exceeds reference) -----------------------
    "q16_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // -- fork / tuple sinks: N aggregates in ONE pass (par_sink/fork.rs) -
    "q17_multi_agg" -> ((s, d) =>
      Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_orderdate")).as("max_date"),
        countDistinct(col("o_custkey")).as("n_cust"))),

    // -- max_by / min_by (par_sink/max.rs:126-216) -----------------------
    // deterministic tiebreak: rank value folds the unique orderkey in
    "q18_max_by" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice") * lit(1e9) + col("o_orderkey")).as("top_order"),
          min_by(col("o_orderkey"), col("o_totalprice") * lit(1e9) + col("o_orderkey")).as("bottom_order"))
        .orderBy(col("o_orderstatus"))),

    // -- flat_map (par_stream/flat_map.rs) as explode --------------------
    "q19_flatmap_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 3)
        .agg(count(lit(1)).as("n_long_tokens"))),

    // -- map (typed expression transform) + fold-to-sum -------------------
    "q20_map_fold" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select((col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))).as("charge"))
        .agg(round(sum(col("charge")), 2).as("total_charge"),
          count(lit(1)).as("n"))),

    // -- in-memory source (IntoParallelStream for Range/Vec) -------------
    "q21_inmemory_range" -> ((s, _) =>
      s.range(0L, 1000000L)
        .groupBy((col("id") % 7).as("k"))
        .agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
        .orderBy(col("k"))),

    // -- exact interpolated percentiles (exceeds reference) --------------
    "q22_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 2).as("p95_price"),
        round(expr("percentile(l_quantity, 0.25)"), 2).as("q25_qty"))),

    // -- as-of join (reference lacks it; one-shuffle union-window) -------
    "q23_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoinBackward(p, c, "user_id", "ts", "ts", Seq("event_id"))
        .agg(
          count(lit(1)).as("n_purch"),
          count(col("asof")).as("n_matched"),
          round(avg((unix_micros(col("ts")) - unix_micros(col("asof.ts"))) / 1e6), 2)
            .as("avg_gap_s"))
    }),

    // -- as-of join via the native tier-(c) AsofJoinExec (same oracle as
    // q23: DuckDB ASOF LEFT JOIN hash-verifies the custom SparkPlan) ----
    "q27_asof_native" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoinNative(p, c, "user_id", "ts", "ts", Seq("event_id"))
        .agg(
          count(lit(1)).as("n_purch"),
          count(col("asof")).as("n_matched"),
          round(avg((unix_micros(col("ts")) - unix_micros(col("asof.ts"))) / 1e6), 2)
            .as("avg_gap_s"))
    }),

    // -- q62: as-of with a TOLERANCE bound (pandas merge_asof parity) —
    // the feature-store staleness guard: last click before each
    // purchase, but never one older than 10 minutes; stale matches
    // degrade to the null struct and fall out of n_matched. µs-domain
    // arithmetic on both engines. ---------------------------------------
    "q62_asof_tolerance" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoinNative(p, c, "user_id", "ts", "ts", Seq("event_id"),
          tolerance = Some(600L * 1000000L))
        .agg(
          count(lit(1)).as("n_purch"),
          count(col("asof")).as("n_matched"),
          round(avg((unix_micros(col("ts")) - unix_micros(col("asof.ts"))) / 1e6), 2)
            .as("avg_gap_s"))
    }),

    // -- q63: FORWARD as-of — earliest click at or after each purchase
    // (the "next event" join: next heartbeat, next fill, next page view);
    // same one-candidate merge pass, peeked not consumed. ---------------
    "q63_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoinNative(p, c, "user_id", "ts", "ts", Seq("event_id"),
          direction = "forward")
        .agg(
          count(lit(1)).as("n_purch"),
          count(col("asof")).as("n_matched"),
          round(avg((unix_micros(col("asof.ts")) - unix_micros(col("ts"))) / 1e6), 2)
            .as("avg_gap_s"))
    }),

    // -- q64: NEAREST as-of — closest click on either side of each
    // purchase, ties to backward; completes merge_asof parity. ----------
    "q64_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofJoinNative(p, c, "user_id", "ts", "ts", Seq("event_id"),
          direction = "nearest")
        .agg(
          count(lit(1)).as("n_purch"),
          count(col("asof")).as("n_matched"),
          round(avg(abs(unix_micros(col("asof.ts")) - unix_micros(col("ts"))) / 1e6), 2)
            .as("avg_gap_s"))
    }),

    // -- range join (bucketed; clicks within 1h before each purchase) ----
    "q24_range_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val pairs = Joins.rangeJoinBucketed(p, c, "user_id", "ts", "ts",
        beforeSec = 3600, afterSec = 0, rightPayload = Seq.empty)
      val counts = pairs.groupBy(col("event_id")).agg(count(lit(1)).as("n_clicks"))
      p.join(counts, Seq("event_id"), "left_outer")
        .select(coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .groupBy(col("n_clicks")).agg(count(lit(1)).as("n_purchases"))
        .orderBy(col("n_clicks"))
    }),

    // -- set operations (reference has only chain=union; SURVEY §2.2
    // "missing entirely" list) ------------------------------------------
    "q25_setops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val filled = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val both = open.intersect(filled).count()
      val openOnly = open.except(filled).count()
      val filledOnly = filled.except(open).count()
      import s.implicits._
      Seq((both, openOnly, filledOnly))
        .toDF("n_both", "n_open_only", "n_filled_only")
    }),

    // -- exact decimal arithmetic (money semantics; reference's decimal
    // ops are largely unimplemented — SURVEY §2.4) -----------------------
    // decimal all the way through the aggregation (exact, unlike the
    // double-path q01), double only at the very edge so both engines
    // convert the SAME exact decimal once
    "q26_decimal_exact" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_extendedprice").cast("decimal(14,2)").as("p"),
          col("l_discount").cast("decimal(14,2)").as("dc"))
        .agg(
          sum(col("p")).cast("double").as("sum_price"),
          sum(col("p") * (lit(1).cast("decimal(3,2)") - col("dc")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n"))),

    // -- pivot / cross-tab (exceeds reference; RelationalGroupedDataset
    // .pivot with EXPLICIT values — the values-less overload runs an extra
    // distinct job, never do that at scale) ------------------------------
    "q30_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority")))
  ) ++ scaleLeverQueries ++ Map[String, Q](

    // -- cube / grouping sets (exceeds reference): all 2^k grouping
    // combinations in ONE pass — Catalyst expands the cube into a single
    // Expand + partial/final aggregate, so the input is scanned once
    // regardless of how many grouping sets it feeds --------------------
    "q31_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // -- typed cogroup (GraftStream.coGroup): per-order reconciliation of
    // the orders and lineitem sides in one co-partitioned pass. Sums are
    // carried in exact integer cents so the result is independent of the
    // (arbitrary) within-group iteration order ---------------------------
    "q32_cogroup" -> ((s, d) => {
      import s.implicits._
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity")).as[(Long, Double)]
      GraftStream(ord).coGroup(GraftStream(li))(_._1, _._1) { (k, os, ls) =>
        var nOrders = 0L; var priceCents = 0L
        os.foreach { o => nOrders += 1; priceCents += math.round(o._2 * 100) }
        var nItems = 0L; var qtyCents = 0L
        ls.foreach { l => nItems += 1; qtyCents += math.round(l._2 * 100) }
        Iterator((k, nOrders, nItems, priceCents, qtyCents))
      }.ds.toDF("o_orderkey", "n_orders", "n_items", "price_cents", "qty_cents")
        .orderBy(col("o_orderkey"))
    }),

    // -- TPC-H Q3 shape: the canonical shipping-priority 3-way join ------
    // filters pushed into all three scans BEFORE any join; lineitem⋈orders
    // shuffles on the orderkey both sides already produce; the filtered
    // customer side is left to AQE — at this SF it broadcasts, at 100 TB
    // (where BUILDING customers are far over the broadcast threshold) the
    // same plan degrades gracefully to a shuffle join. TakeOrdered caps
    // the result without a global sort.
    "q33_tpch_q3" -> ((s, d) => {
      val cut = lit("1998-06-01").cast("timestamp")
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // -- TPC-H Q5 shape: 6-table join mixing both join strategies --------
    // region→nation→supplier collapse into ONE broadcast dim (fixed-size
    // at ANY corpus scale — the explicit broadcast is the 100 TB-correct
    // call, unlike Q3's data-dependent customer side); lineitem⋈orders⋈
    // customer are the genuine shuffles. The c_nationkey = s_nationkey
    // condition rides the broadcast join, not an extra exchange.
    "q34_tpch_q5" -> ((s, d) => {
      val r = Tables.region(s, d)
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      val n = Tables.nation(s, d)
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, d)
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // -- TPC-H Q18 shape: large-volume orders (groupBy + HAVING before
    // any join). The aggregate runs FIRST — map-side combinable on
    // l_orderkey, reducing the fact table to per-order sums — and the
    // HAVING prunes to the rare big orders BEFORE the joins, so the
    // sparse surviving key set drives cheap joins against orders and
    // customer instead of joining full facts and aggregating last.
    // Money as integer cents (cross-engine bit-exact, as q35). -----------
    "q36_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          (round(col("o_totalprice") * 100)).cast("long").as("cents"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("cents"), col("sum_qty"))
        .orderBy(col("cents").desc, col("o_orderkey"))
        .limit(20)
    }),

    // -- TPC-H Q10 shape: returned-item revenue by customer. Both
    // selective filters (return flag, order quarter) push to the scans;
    // nation is the broadcast dim; the customer join keys the single
    // genuine shuffle; bounded top-20 via TakeOrderedAndProject. ---------
    "q37_tpch_q10" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        // floor form, not round(): a revenue landing on a half-cent
        // boundary splits between engines (see qualityScore's Scaladoc)
        .agg((floor(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            * 100 + lit(0.5)) / 100).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // -- TPC-H Q21 shape: suppliers solely at fault on a finished
    // multi-supplier order — THE fact-self-semi/anti-join stress test
    // (this corpus has no receipt/commit dates, so "at fault" =
    // returned the item, l_returnflag = 'R'; the SHAPE is the point).
    // All three lineitem subsets and orders hash-partition on
    // l_orderkey, so the join chain shuffles once per input with no
    // intermediate re-exchange; EXISTS (another supplier on the order)
    // plans as LEFT SEMI and NOT EXISTS (another supplier ALSO at
    // fault) as LEFT ANTI — both streamed, never materializing the
    // per-order pair blowup a naive self-join would. Supplier is the
    // fixed-size broadcast dim; bounded top-20 via TakeOrdered. ----------
    "q38_tpch_q21" -> ((s, d) => q21SemiAnti(s, d)),

    // -- Q21 AGGREGATE-REWRITE TWIN (same oracle as q38, result-identical
    // by construction): the EXISTS/NOT EXISTS correlation collapses into
    // per-order supplier statistics — group lineitem ONCE by
    // (orderkey, suppkey) with a map-side-combined fault count, then
    // roll THAT up per order with a second hash aggregate. A qualifying
    // order has n_supp > 1 and exactly ONE fault supplier — and because
    // that supplier is unique, conditional max() aggregates recover its
    // suppkey and fault-row count in the same pass, so no window (and
    // no window SORT) is needed at all. This all-hash form replaced an
    // earlier window-sum version and beats it at every measured scale
    // (sf0.1: 1.12 s vs 1.56; sf1: 2.47 vs 3.34; sf10: ~11.8 vs 11.0 —
    // run-variance tie). The fact is scanned once and shuffled once
    // (pre-aggregated); the second aggregate's exchange moves one row
    // per (order, supplier), orders of magnitude below raw lineitem.
    // Size-dependent crossover, documented in BASELINE.md: this form
    // wins over q38's three-shuffle semi/anti twin through sf1 and
    // trails it at sf10 (~11.8 vs ~8.5 s), where AQE drives the
    // semi/anti joins through smaller partial stages than the 15M-group
    // rollup hash — both scale sub-linearly and share one oracle.
    // Plan-guarded: exactly one lineitem scan, no Window node. ----------
    "q40_tpch_q21_agg" -> ((s, d) => q21AggRewrite(s, d)),

    // -- Q21 AUTO DISPATCH (r8 verdict #7 — "the engine picks the
    // regime", completing the d25/t19/d09 dispatcher family): one cheap
    // metadata-backed fact count picks between the twins at the
    // BASELINE.md-measured crossover. Both regimes are result-identical
    // and share q38's oracle; PlanSpec proves the flip on a constructed
    // ceiling. -----------------------------------------------------------
    "q65_tpch_q21_auto" -> ((s, d) => q21Auto(s, d)),

    // -- SHUFFLE ANCHOR (r13 verdict #8): the bench's second host
    // anchor. q01 is scan-bound, so host drift on the EXCHANGE path
    // (GC, disk, network-loopback) is invisible to it; this row is
    // deliberately exchange-dominated — group on (l_orderkey,
    // l_partkey), whose ~per-row cardinality defeats the map-side
    // combine, so the shuffle moves ~|lineitem| rows — and the outer
    // global aggregate shrinks the output to one row so the gate
    // compare stays cheap. Reading BENCH deltas: a uniform slowdown at
    // flat q01 but moving q66 = exchange-path drift; both flat = the
    // common geomean moved on its own. --------------------------------
    "q66_shuffle_anchor" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .groupBy(col("l_orderkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .agg(count(lit(1)).as("n_groups"),
          round(sum(col("qty")), 2).as("total_qty"))
    }),

    // -- TPC-H Q17 shape: small-quantity lineitems for one brand vs the
    // per-part average — the aggregate-join-back (decorrelated scalar
    // subquery) pattern. The broadcast part filter prunes lineitem FIRST
    // (~3% of parts — at 100 TB the difference between scanning 3% and
    // 100% of the fact). The pruned fact is read twice, but column
    // pruning narrows each pass to exactly its columns (2-col scan for
    // the avg, 3-col for the probe) — narrower than the shared-exchange
    // alternative, which would have to carry the probe's columns through
    // the aggregate's shuffle; the avg aggregates map-side down to one
    // row per part before its exchange, and the join-back keys both
    // sides on the same l_partkey (locally the tiny aggregate
    // broadcasts; at scale it's a co-partitioned SMJ — either way no
    // third shuffle). The 0.2·avg threshold is bit-exact cross-engine:
    // quantities are integer-valued, so the sum inside avg is
    // order-independent. --------------------------------------------------
    "q39_tpch_q17" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val l = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val lim = l.groupBy(col("l_partkey"))
        .agg((avg(col("l_quantity")) * lit(0.2)).as("qty_limit"))
      l.join(lim, Seq("l_partkey"))
        .filter(col("l_quantity") < col("qty_limit"))
        .agg((floor(sum(col("l_extendedprice")) / 7.0 * 100 + lit(0.5)) / 100)
          .as("avg_yearly"))
    }),

    // -- window-function suite: lag/lead/rank/ntile/running sum in ONE
    // window pass (one shuffle on the partition key, one sort within) —
    // money carried as integer cents so every engine agrees bit-exactly.
    // The deterministic (o_orderdate, o_orderkey) ordering makes rank,
    // ntile and the frame sums reproducible; the custkey filter is pushed
    // to the scan and bounds the output, not the technique. -------------
    "q35_window_suite" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .withColumn("next_cents", lead(col("cents"), 1).over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("run_cents", sum(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("o_orderkey"), col("o_custkey"), col("prev_cents"),
          col("next_cents"), col("rk"), col("quartile"), col("run_cents"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // -- TPC-H Q13 shape: customer order-count distribution. The naive
    // form outer-joins customer⋈orders THEN counts — shuffling every
    // order row on o_custkey. Here orders pre-aggregates to per-customer
    // counts FIRST (map-side combinable: the shuffle moves one row per
    // customer, not per order), and the LEFT join from customer surfaces
    // never-matched customers as count 0 — the part an inner-join-based
    // rewrite would silently drop. The status filter stands in for Q13's
    // o_comment NOT LIKE (corpus has no comment column); it must apply
    // BEFORE the join, not after, to keep only-filtered-order customers
    // in the zero bucket. ------------------------------------------------
    "q41_tpch_q13" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .filter(col("o_orderstatus") =!= "F")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // -- TPC-H Q22 shape: rich-but-inactive customers. Two decorrelations
    // in one query: the scalar AVG subquery becomes a 1-row aggregate
    // broadcast-nested-loop-joined back (never a shuffle), and NOT EXISTS
    // becomes a LEFT ANTI hash join against the pruned recent-orders
    // projection (the date filter pushes to that scan, so the anti side
    // carries one slim column). "Country code" is nationkey mod 10 — the
    // corpus has no phone column; the original's no-orders-at-all
    // predicate becomes no-RECENT-orders because every synthetic customer
    // has ordered at least once (an empty anti-join would gate nothing). -
    "q42_tpch_q22" -> ((s, d) => {
      val inCodes = Tables.customer(s, d)
        .filter((col("c_nationkey") % 10).isin(1, 3, 5, 7, 9))
        .select((col("c_nationkey") % 10).cast("int").as("cntrycode"),
          col("c_custkey"), col("c_acctbal"))
      val avgBal = inCodes.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      inCodes.join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("cntrycode"))
    }),

    // -- TPC-H Q7 shape: bilateral trade volume by year. Both fixed-size
    // nation dims fold into supplier/customer via broadcast BEFORE the
    // fact joins, so the 2-of-25-nations selectivity prunes lineitem at
    // its first (broadcast) join; with both sides restricted to the same
    // pair, Q7's OR'd nation-pair condition reduces to supp≠cust riding
    // the final join. Customer stays a shuffle join on purpose: at real
    // scale two nations of customers is still ~8% of a data-dependent
    // table (AQE may demote it to broadcast at bench sf — that's its
    // call, not the plan's assumption). ----------------------------------
    "q43_tpch_q7" -> ((s, d) => {
      val pair = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(pair.select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cus = Tables.customer(s, d)
        .join(broadcast(pair.select(col("n_nationkey").as("nk2"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("nk2"))
        .select(col("c_custkey"), col("cust_nation"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1998-12-31").cast("timestamp")))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cus, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(round(sum(col("volume")), 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // -- TPC-H Q4 shape: order-priority histogram over EXISTS. The
    // correlated EXISTS plans as a LEFT SEMI join — each order row
    // passes at most once no matter how many flagged lines it has (a
    // join+distinct rewrite would materialize every match first). The
    // returnflag filter pushes into the lineitem scan so the semi
    // side ships one slim column of pre-filtered keys. (No commit/
    // receipt dates in this corpus; late-delivery = returned item.) -----
    "q44_tpch_q4" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val flagged = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(flagged, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- TPC-H Q12 shape: two-way conditional aggregation over the fact
    // join — both CASE branches ride ONE partial+final aggregate pass
    // (never two scans, never a pivot); the ship-window filter pushes
    // to the lineitem scan. l_linestatus stands in for Q12's shipmode
    // (corpus has no l_shipmode column). -------------------------------
    "q45_tpch_q12" -> ((s, d) => {
      val hi = Seq("1-URGENT", "2-HIGH")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin(hi: _*), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // -- TPC-H Q14 shape: conditional-percentage aggregate (promo
    // revenue share). part is the fixed-size broadcast dim; numerator
    // and denominator come out of the SAME single aggregate pass; the
    // one-month window prunes the fact scan. floor-at-4-decimals keeps
    // the cross-engine ratio IEEE-stable (same accepted-risk class as
    // t11's LM score — see LanguageModel's Scaladoc). -------------------
    "q46_tpch_q14" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg((floor(lit(100.0)
            * sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0)))
            / sum(col("rev")) * 10000 + lit(0.5)) / 10000)
          .as("promo_pct"))
    }),

    // -- TPC-H Q19 shape: disjunction of AND-clauses spanning BOTH join
    // sides. The full OR-of-ANDs can only evaluate inside the join, so
    // each side also gets its coarse single-side envelope (brand set,
    // size/quantity hull — semantically implied by the disjunction)
    // pushed into its scan, the same CNF trick the TPC-H kits apply: at
    // 100 TB the envelope is what keeps the fact scan from reading every
    // row only to drop 99% of them at the join. ------------------------
    "q47_tpch_q19" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#4", "Brand#12", "Brand#23") &&
          col("p_size").between(1, 15))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val cond =
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey") && cond)
        .agg(round(sum(col("rev")), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // -- TPC-H Q2 shape: correlated min-per-group subquery (min-cost
    // supplier per part). The naive decorrelation aggregates the fact a
    // second time and joins back — two wide exchanges plus a rescan.
    // Here the min evaluates as a window over the ALREADY dim-pruned
    // fact: one shuffle on p_partkey total, and the region/size
    // selectivity (broadcast dims, fixed-size at any corpus scale)
    // prunes before that only wide exchange. No partsupp in the corpus:
    // lineitem plays the part-supplier price fact. ----------------------
    "q48_tpch_q2" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val suppAsia = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "ASIA")
        .select(col("s_suppkey"), col("s_acctbal"), col("n_name"))
      val partSlice = Tables.part(s, d)
        .filter(col("p_size").between(1, 15)).select(col("p_partkey"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .join(broadcast(partSlice), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppAsia), col("l_suppkey") === col("s_suppkey"))
      fact
        .withColumn("min_price",
          min(col("l_extendedprice")).over(Window.partitionBy(col("p_partkey"))))
        .filter(col("l_extendedprice") === col("min_price"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("wins"), round(sum(col("s_acctbal")), 2).as("bal"))
        .orderBy(col("n_name"))
    }),

    // -- TPC-H Q11 shape: group value vs a global-total threshold
    // (HAVING sum > fraction * grand total). The grand total derives
    // from the per-supplier aggregate itself — a group-count-sized
    // re-aggregation whose exchange Spark REUSES — never a second fact
    // scan; the threshold then rides a broadcast nested-loop join. The
    // nearest supplier sits 845 absolute (~3e-5 relative) off the
    // threshold at sf0.01, far above cross-engine FP summation noise. ---
    "q49_tpch_q11" -> ((s, d) => {
      val perSupp = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("v"))
        .groupBy(col("l_suppkey")).agg(sum(col("v")).as("value"))
      val threshold = perSupp.agg((sum(col("value")) * 0.0102).as("threshold"))
      perSupp.join(broadcast(threshold), col("value") > col("threshold"))
        .select(col("l_suppkey"), round(col("value"), 2).as("val"))
    }),

    // -- TPC-H Q15 shape: the max-revenue supplier (ties kept, as the
    // spec demands). Both the per-supplier revenue AND its max come from
    // ONE aggregate (exchange reuse — the fact is scanned once); the
    // 1-row max broadcasts back as a join condition, and the supplier
    // dim broadcasts onto the handful of winners. Winner margin at
    // sf0.01: 240k over the runner-up — no cross-engine FP tie risk. ----
    "q50_tpch_q15" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
          // explicit, though vacuous: the supplier join would constraint-
          // propagate isnotnull into only ONE branch of the shared
          // aggregate, making the two exchange subtrees unequal and
          // defeating ReuseExchange — i.e. a second full fact scan
          col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total"))
      val mx = rev.agg(max(col("total")).as("mx"))
      rev.join(broadcast(mx), col("total") === col("mx"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total"), 2).as("total_revenue"))
    }),

    // -- TPC-H Q16 shape: distinct-supplier census with a NOT IN
    // exclusion. NOT IN becomes a broadcast LEFT ANTI hash join (the
    // excluded-supplier set is tiny and null-free, so the NOT IN NULL
    // trap doesn't apply); count(DISTINCT) partial-deduplicates
    // (group, suppkey) pairs map-side, so the shuffle moves distinct
    // pairs, not lineitem rows. Part attributes ride the broadcast. -----
    "q51_tpch_q16" -> ((s, d) => {
      val excl = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val pslice = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(pslice), col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // -- TPC-H Q20 shape: nested IN subqueries = a semi-join chain. The
    // part-name slice broadcast-SEMI-prunes the fact BEFORE its only
    // shuffle (the per-supplier quantity aggregate); the qualified-
    // supplier set that survives HAVING is group-count-sized and
    // broadcasts into the supplier dim's semi join, so no exchange ever
    // carries more than one row per supplier. ---------------------------
    "q52_tpch_q20" -> ((s, d) => {
      val redParts = Tables.part(s, d)
        .filter(col("p_name").like("red%")).select(col("p_partkey"))
      val qualified = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 50)
        .select(col("l_suppkey"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_3", "NATION_7"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(qualified), col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // -- TPC-H Q8 shape: one nation's market share of a region's demand,
    // by year. The share is ONE conditional-sum pass (no second scan for
    // the numerator); region→nation→customer collapses to a broadcast
    // semi, supplier carries its nation name via broadcast, the part
    // slice broadcast-semi-prunes lineitem — the only genuine shuffles
    // are lineitem⋈orders and orders⋈customer, exactly the two
    // SF-scaled joins. Integer-scaled floor keeps the ratio
    // engine-exact at 4 decimals. ---------------------------------------
    "q53_tpch_q8" -> ((s, d) => {
      val amerKeys = Tables.nation(s, d)
        .join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "AMERICA")
        .select(col("n_nationkey"))
      val custAmer = Tables.customer(s, d)
        .join(broadcast(amerKeys), col("c_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("c_custkey"))
      val suppN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val pslice = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD").select(col("p_partkey"))
      val ord = Tables.orders(s, d)
        .join(custAmer, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .join(broadcast(pslice), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg((floor(
          sum(when(col("supp_nation") === "NATION_5", col("rev"))
            .otherwise(lit(0.0)))
            / sum(col("rev")) * 10000 + lit(0.5)) / 10000).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // -- TPC-H Q9 shape: profit by supplier nation and order year over a
    // part-name slice. No partsupp in the corpus, so supply cost is
    // p_retailprice*0.1 riding the part broadcast. The profit expression
    // partial-aggregates map-side; the only genuine shuffle is
    // lineitem⋈orders (the year lives on orders) plus the tiny
    // (nation, year) final group. ---------------------------------------
    "q54_tpch_q9" -> ((s, d) => {
      val pslice = Tables.part(s, d)
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val suppN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .join(broadcast(pslice), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(round(sum(col("rev")
          - col("p_retailprice") * col("l_quantity") * 0.1), 2).as("profit"))
    }),

    // -- TPC-H Q6 shape: the forecasting-revenue-change scan. Trivial by
    // construction — and that IS the shape: every predicate (date window,
    // discount band, quantity cap) must reach the parquet scan as a
    // PushedFilter and the sum partial-aggregates, so at 100 TB this is
    // a zero-shuffle embarrassingly-parallel pass over row-group-pruned
    // files. Completes the literal 22/22 TPC-H shape family. ------------
    "q55_tpch_q6" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n"))
    })
  )

  /** Scale-lever operators gated against the plain-join oracle: the salted
    * and bucketed formulations must be RESULT-IDENTICAL to the naive join
    * (the whole point — they change the physical shuffle shape, not the
    * semantics), so the DuckDB plain-join SQL hash-verifies both.
    */
  private def scaleLeverQueries: Map[String, Q] = Map(
    // -- skew-salted join (Skew.saltedJoin): hot l_partkey keys spread over
    // 8 sub-keys; aggregate downstream proves semantic equality ----------
    "q28_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val p = Tables.part(s, d)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      Skew.saltedJoin(li, p, "l_partkey", "l_orderkey", n = 8)
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // -- bucketed co-located join (Bucketing): both sides written
    // bucketed+sorted by custkey, then joined with no Exchange (asserted
    // in BucketingSpec; here the RESULT is hash-gated vs the plain join) -
    "q29_bucketed_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      Bucketing.writeBucketed(o, "graft_q29_orders", "custkey", nBuckets = 8)
      Bucketing.writeBucketed(c, "graft_q29_customer", "custkey", nBuckets = 8)
      Bucketing.bucketedJoin(s, "graft_q29_orders", "graft_q29_customer", "custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    })
  )

  /** TPC-H Q21 shape: shared by q38 (semi/anti form) and q40 (aggregate
    * rewrite) — the two must produce identical rows. */
  /** TPC-H Q21, semi/anti-join form (gate q38; the large-scale regime):
    * suppliers solely at fault on finished multi-supplier orders. All
    * three lineitem subsets and orders hash-partition on l_orderkey, so
    * the join chain shuffles once per input; EXISTS plans LEFT SEMI and
    * NOT EXISTS LEFT ANTI — both streamed, never the per-order pair
    * blowup. At sf10 AQE drives these through smaller partial stages
    * than the rollup hash of [[q21AggRewrite]] (~8.5 vs ~11.8 s,
    * BASELINE.md). */
  def q21SemiAnti(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val l1 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
    val l3 = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    l1.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(l2, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q21, aggregate-rewrite form (gate q40; the small/mid-scale
    * regime): one (orderkey, suppkey) rollup with map-side combine, then
    * a per-order hash aggregate whose conditional max() recovers the
    * unique fault supplier — one fact scan, one pre-aggregated fact
    * shuffle, no window. Result-identical to [[q21SemiAnti]] (shared
    * oracle); wins through sf1 and trails at sf10 (BASELINE.md). */
  def q21AggRewrite(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    // ONE fact exchange for both aggregate levels (guide §2.4): hash
    // partitioning on l_orderkey alone satisfies the (orderkey, suppkey)
    // grouping AND the per-order rollup, so the explicit repartition
    // replaces the previous two back-to-back fact shuffles (partial agg
    // on the near-unique (orderkey, suppkey) key reduced ~nothing, so the
    // second shuffle moved the same rows again). No explicit partition
    // count: AQE sizes/coalesces it, so the plan stays scale-adaptive.
    val perOrd = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(when(col("l_returnflag") === "R", 1)).as("n_fault_rows"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum((col("n_fault_rows") > 0).cast("long")).as("n_fault_supp"),
        max(when(col("n_fault_rows") > 0, col("l_suppkey"))).as("fault_suppkey"),
        max(when(col("n_fault_rows") > 0, col("n_fault_rows"))).as("fault_rows"))
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    perOrd
      .filter(col("n_supp") > 1 && col("n_fault_supp") === 1)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("fault_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("fault_rows")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q21 auto dispatcher: picks [[q21AggRewrite]] while the fact row
    * count sits at or below `aggCeiling`, [[q21SemiAnti]] beyond — the
    * engine-picks-the-regime discipline (d25 / perplexityBucketsAuto /
    * d09 confirm=auto). The census reads parquet FOOTERS only
    * ([[graft.operators.DataSkipping.footerRowCount]] — milliseconds,
    * no job, no data IO; a `count()` would re-scan the fact per
    * invocation and at sf10 that scan was visible in the dispatcher's
    * bench row), falling back to a count() for non-parquet inputs. The
    * default ceiling splits the measured inversion: the rewrite wins at
    * sf1 (6M rows: 2.47 vs 3.71 s) and loses at sf10 (60M: ~11.8 vs
    * ~8.5 s) — 30M is the midpoint decade boundary. */
  def q21Auto(s: org.apache.spark.sql.SparkSession, d: String,
      aggCeiling: Long = 30000000L): DataFrame = {
    val factRows =
      try graft.operators.DataSkipping.footerRowCount(s, s"$d/lineitem.parquet")
      catch { case scala.util.control.NonFatal(_) =>
        Tables.lineitem(s, d).count() }
    if (factRows <= aggCeiling) q21AggRewrite(s, d) else q21SemiAnti(s, d)
  }

  private val q21Oracle: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "q01_tpch_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scan_filter_count" ->
      """SELECT count(*) AS n FROM lineitem
        |WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1999-01-01'""".stripMargin,
    "q03_histogram" ->
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
    "q04_join_broadcast" ->
      """SELECT p_brand,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q05_topn" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q06_left_join_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q07_union_chain" ->
      """SELECT l_returnflag, count(*) AS n FROM (
        |  SELECT l_returnflag FROM lineitem WHERE l_quantity < 5
        |  UNION ALL
        |  SELECT l_returnflag FROM lineitem WHERE l_quantity > 48
        |) GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q08_count_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin,
    "q09_stats" ->
      """SELECT round(avg(l_quantity),4) AS mean_qty,
        | round(stddev_pop(l_quantity),4) AS sd_qty,
        | round(avg(l_extendedprice),2) AS mean_price,
        | round(stddev_pop(l_extendedprice),2) AS sd_price
        |FROM lineitem""".stripMargin,
    "q10_minmax" ->
      """SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        | min(l_returnflag) AS min_flag, max(l_returnflag) AS max_flag
        |FROM lineitem""".stripMargin,
    "q11_window_top_order" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS top_price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q61_relational_division" ->
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING count(DISTINCT o_orderpriority) =
        |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
        |ORDER BY o_custkey""".stripMargin,
    "q60_window_suite2" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 100 = 0)
        |SELECT o_orderkey, o_custkey,
        |  CAST(dense_rank() OVER w AS INT) AS drk,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  first_value(cents) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_c,
        |  last_value(cents) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_c,
        |  nth_value(cents, 2) OVER
        |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth2
        |FROM o WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q59_unpivot" ->
      """WITH w AS (SELECT l_returnflag, round(sum(l_quantity), 2) AS qty,
        |    round(sum(l_extendedprice), 2) AS price
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'price' AS measure, price AS value FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q58_typed_dataset" ->
      """SELECT l_returnflag AS rf, count(*) AS n,
        | CAST(round(sum(l_quantity) * 100) AS BIGINT) AS qty_x100
        |FROM lineitem WHERE l_quantity > 30
        |GROUP BY l_returnflag ORDER BY rf""".stripMargin,
    "q57_sql_surface" ->
      """SELECT l_returnflag AS rf, l_linestatus AS ls,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        | round(avg(l_extendedprice), 4) AS avg_price
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY rf, ls""".stripMargin,
    "q56_grouping_sets" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf,
        | coalesce(l_linestatus,'ALL') AS ls,
        | count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS
        |  ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin,
    "q12_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf,
        | coalesce(l_linestatus,'ALL') AS ls,
        | count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q13_time_bucket" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        | count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin,
    "q14_all_any" ->
      """SELECT bool_and(l_quantity > 0) AS all_pos_qty,
        | bool_or(l_discount > 0.09) AS any_big_disc,
        | bool_and(l_extendedprice > 100000) AS all_expensive
        |FROM lineitem""".stripMargin,
    "q15_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q16_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q17_multi_agg" ->
      """SELECT count(*) AS n, round(sum(o_totalprice),2) AS sum_price,
        | round(avg(o_totalprice),4) AS avg_price,
        | min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        | count(DISTINCT o_custkey) AS n_cust
        |FROM orders""".stripMargin,
    "q18_max_by" ->
      """SELECT o_orderstatus,
        | max_by(o_orderkey, o_totalprice*1e9 + o_orderkey) AS top_order,
        | min_by(o_orderkey, o_totalprice*1e9 + o_orderkey) AS bottom_order
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q19_flatmap_tokens" ->
      """SELECT count(*) AS n_long_tokens FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        |) WHERE length(tok) > 3""".stripMargin,
    "q20_map_fold" ->
      """SELECT round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS total_charge,
        | count(*) AS n FROM lineitem""".stripMargin,
    "q21_inmemory_range" ->
      """SELECT i % 7 AS k, CAST(sum(i) AS BIGINT) AS s, count(*) AS n
        |FROM range(0, 1000000) t(i) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_percentiles" ->
      """SELECT round(quantile_cont(l_extendedprice, 0.5),2) AS p50_price,
        | round(quantile_cont(l_extendedprice, 0.95),2) AS p95_price,
        | round(quantile_cont(l_quantity, 0.25),2) AS q25_qty
        |FROM lineitem""".stripMargin,
    "q23_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click')
        |SELECT count(*) AS n_purch, count(c.event_id) AS n_matched,
        | round(avg(epoch(p.ts) - epoch(c.ts)), 2) AS avg_gap_s
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,
    "q27_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click')
        |SELECT count(*) AS n_purch, count(c.event_id) AS n_matched,
        | round(avg(epoch(p.ts) - epoch(c.ts)), 2) AS avg_gap_s
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin,
    // q62/q63: correlated-subquery replays in the µs domain (Spark
    // truncates the nanos timestamps to µs at load, so the match
    // predicate AND the tolerance bound must both be evaluated at µs)
    "q62_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
        |m AS (SELECT p.event_id, epoch_us(p.ts) AS pt,
        |   (SELECT max(epoch_us(c.ts)) FROM c
        |    WHERE c.user_id = p.user_id AND epoch_us(c.ts) <= epoch_us(p.ts)) AS mt
        | FROM p)
        |SELECT count(*) AS n_purch,
        | count(CASE WHEN mt IS NOT NULL AND pt - mt <= 600000000 THEN 1 END)
        |   AS n_matched,
        | round(avg(CASE WHEN mt IS NOT NULL AND pt - mt <= 600000000
        |   THEN (pt - mt) / 1e6 END), 2) AS avg_gap_s
        |FROM m""".stripMargin,
    "q63_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
        |m AS (SELECT p.event_id, epoch_us(p.ts) AS pt,
        |   (SELECT min(epoch_us(c.ts)) FROM c
        |    WHERE c.user_id = p.user_id AND epoch_us(c.ts) >= epoch_us(p.ts)) AS mt
        | FROM p)
        |SELECT count(*) AS n_purch, count(mt) AS n_matched,
        | round(avg((mt - pt) / 1e6), 2) AS avg_gap_s
        |FROM m""".stripMargin,
    "q64_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
        |m AS (SELECT epoch_us(p.ts) AS pt,
        |   (SELECT max(epoch_us(c.ts)) FROM c
        |    WHERE c.user_id = p.user_id AND epoch_us(c.ts) <= epoch_us(p.ts)) AS bt,
        |   (SELECT min(epoch_us(c.ts)) FROM c
        |    WHERE c.user_id = p.user_id AND epoch_us(c.ts) >= epoch_us(p.ts)) AS ft
        | FROM p),
        |g AS (SELECT pt, CASE
        |   WHEN bt IS NOT NULL AND (ft IS NULL OR pt - bt <= ft - pt)
        |     THEN pt - bt
        |   WHEN ft IS NOT NULL THEN ft - pt END AS gap FROM m)
        |SELECT count(*) AS n_purch, count(gap) AS n_matched,
        | round(avg(gap / 1e6), 2) AS avg_gap_s FROM g""".stripMargin,
    "q24_range_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase'),
        |     c AS (SELECT user_id, ts FROM events WHERE event_type='click')
        |SELECT n_clicks, count(*) AS n_purchases FROM (
        |  SELECT p.event_id, count(c.ts) AS n_clicks
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id
        |    AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |  GROUP BY p.event_id)
        |GROUP BY n_clicks ORDER BY n_clicks""".stripMargin,
    "q25_setops" ->
      """WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus='O'),
        |  filled AS (SELECT o_custkey FROM orders WHERE o_orderstatus='F')
        |SELECT
        | (SELECT count(*) FROM (SELECT * FROM open INTERSECT SELECT * FROM filled)) AS n_both,
        | (SELECT count(*) FROM (SELECT * FROM open EXCEPT SELECT * FROM filled)) AS n_open_only,
        | (SELECT count(*) FROM (SELECT * FROM filled EXCEPT SELECT * FROM open)) AS n_filled_only""".stripMargin,
    "q26_decimal_exact" ->
      """SELECT
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS n
        |FROM lineitem""".stripMargin,
    "q30_pivot" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus='F') AS n_f,
        | count(*) FILTER (WHERE o_orderstatus='O') AS n_o,
        | count(*) FILTER (WHERE o_orderstatus='P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // plain-join oracles: salting/bucketing must not change results
    "q28_salted_join" ->
      """SELECT p_brand, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q29_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        | round(sum(o_totalprice),2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q31_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // cogroup == two grouped aggregates reconciled by a full outer join
    // (integer-cents sums keep both engines bit-exact)
    "q32_cogroup" ->
      """WITH o AS (SELECT o_orderkey, count(*) AS n_orders,
        |   CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        | FROM orders GROUP BY o_orderkey),
        |l AS (SELECT l_orderkey, count(*) AS n_items,
        |   CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT coalesce(o.o_orderkey, l.l_orderkey) AS o_orderkey,
        | coalesce(o.n_orders, 0) AS n_orders,
        | coalesce(l.n_items, 0) AS n_items,
        | coalesce(o.price_cents, 0) AS price_cents,
        | coalesce(l.qty_cents, 0) AS qty_cents
        |FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q33_tpch_q3" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q34_tpch_q5" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q36_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | CAST(round(o_totalprice*100) AS BIGINT) AS cents, sum_qty
        |FROM (SELECT l_orderkey, round(sum(l_quantity),2) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300) big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY cents DESC, o_orderkey LIMIT 20""".stripMargin,
    "q37_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | floor(sum(l_extendedprice*(1-l_discount))*100 + 0.5)/100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q38_tpch_q21" -> q21Oracle,
    // q40 is the aggregate rewrite of the same query — one oracle gates
    // both, the same pattern as d07/d09 and d02/d10; q65 is the auto
    // dispatcher over the two (regime choice never changes the result)
    "q40_tpch_q21_agg" -> q21Oracle,
    "q65_tpch_q21_auto" -> q21Oracle,
    "q66_shuffle_anchor" ->
      """SELECT count(*) AS n_groups, round(sum(qty), 2) AS total_qty
        |FROM (SELECT l_orderkey, l_partkey, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY 1, 2) z""".stripMargin,
    "q39_tpch_q17" ->
      """WITH l AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#1'),
        |a AS (SELECT l_partkey, avg(l_quantity) * 0.2 AS qty_limit
        |      FROM l GROUP BY l_partkey)
        |SELECT floor(sum(l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
        |FROM l JOIN a USING (l_partkey)
        |WHERE l_quantity < qty_limit""".stripMargin,
    "q35_window_suite" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 100 = 0)
        |SELECT o_orderkey, o_custkey,
        |  lag(cents, 1) OVER win AS prev_cents,
        |  lead(cents, 1) OVER win AS next_cents,
        |  rank() OVER win AS rk,
        |  ntile(4) OVER win AS quartile,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
        |FROM o
        |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // the oracle keeps Q13's textbook outer-join-then-count form; the
    // Spark side pre-aggregates before the join — result-identical
    "q41_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        |      GROUP BY c_custkey) x
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // correlated original form — DuckDB decorrelates it its own way,
    // gating that the Spark-side manual decorrelation is semantics-exact
    "q42_tpch_q22" ->
      """SELECT cntrycode, count(*) AS numcust,
        | round(sum(c_acctbal),2) AS totacctbal
        |FROM (SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode,
        |             c_custkey, c_acctbal
        |      FROM customer WHERE c_nationkey % 10 IN (1,3,5,7,9)) c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0
        |                     AND c_nationkey % 10 IN (1,3,5,7,9))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "q43_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        | round(sum(volume),2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |             l_extendedprice * (1 - l_discount) AS volume
        |      FROM supplier, lineitem, orders, customer,
        |           nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey
        |        AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
        |                           AND TIMESTAMP '1998-12-31') s
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q44_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q45_tpch_q12" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q46_tpch_q14" ->
      """SELECT floor(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice*(1-l_discount) ELSE 0 END)
        |  / sum(l_extendedprice*(1-l_discount)) * 10000 + 0.5)/10000
        |  AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "q47_tpch_q19" ->
      """SELECT round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand='Brand#4' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand='Brand#12' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand='Brand#23' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q48_tpch_q2" ->
      """SELECT n_name, count(*) AS wins, round(sum(s_acctbal),2) AS bal
        |FROM lineitem l, supplier s, nation n, region r, part p
        |WHERE l.l_suppkey=s.s_suppkey AND s.s_nationkey=n.n_nationkey
        |  AND n.n_regionkey=r.r_regionkey AND r.r_name='ASIA'
        |  AND l.l_partkey=p.p_partkey AND p.p_size BETWEEN 1 AND 15
        |  AND l.l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = l.l_partkey AND l2.l_suppkey=s2.s_suppkey
        |      AND s2.s_nationkey=n2.n_nationkey
        |      AND n2.n_regionkey=r2.r_regionkey AND r2.r_name='ASIA')
        |GROUP BY 1""".stripMargin,
    "q49_tpch_q11" ->
      """SELECT l_suppkey,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS val
        |FROM lineitem GROUP BY 1
        |HAVING sum(l_extendedprice*(1-l_discount)) >
        |  (SELECT sum(l_extendedprice*(1-l_discount))*0.0102 FROM lineitem)
        |""".stripMargin,
    "q50_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(l_extendedprice*(1-l_discount)) AS total
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, round(total,2) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total = (SELECT max(total) FROM rev)""".stripMargin,
    "q51_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1,4,7,10,13,16,19,22)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1,2,3""".stripMargin,
    "q52_tpch_q20" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey=n_nationkey
        |WHERE n_name IN ('NATION_3','NATION_7')
        |AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)""".stripMargin,
    "q53_tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |  floor(sum(CASE WHEN n2.n_name='NATION_5'
        |      THEN l_extendedprice*(1-l_discount) ELSE 0 END)
        |    / sum(l_extendedprice*(1-l_discount)) * 10000 + 0.5)/10000
        |    AS mkt_share
        |FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
        |  JOIN customer c ON o.o_custkey=c.c_custkey
        |  JOIN nation n1 ON c.c_nationkey=n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey=r.r_regionkey
        |    AND r.r_name='AMERICA'
        |  JOIN supplier s ON l.l_suppkey=s.s_suppkey
        |  JOIN nation n2 ON s.s_nationkey=n2.n_nationkey
        |  JOIN part p ON l.l_partkey=p.p_partkey AND p.p_type='STANDARD'
        |GROUP BY 1""".stripMargin,
    "q54_tpch_q9" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  round(sum(l_extendedprice*(1-l_discount)
        |            - p_retailprice*l_quantity*0.1),2) AS profit
        |FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
        |  JOIN supplier s ON l.l_suppkey=s.s_suppkey
        |  JOIN nation n ON s.s_nationkey=n.n_nationkey
        |  JOIN part p ON l.l_partkey=p.p_partkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1,2""".stripMargin,
    "q55_tpch_q6" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
  )
}
