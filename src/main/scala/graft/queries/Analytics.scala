package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Analytic extensions beyond the reference's three queries
  * (SURVEY.md §7.2 step 7): the star-schema joins the reference's
  * design implies but never exercises, window functions, grouping
  * sets, set operations, JSON extraction, and event-time windowing
  * over the events feed. All oracle-verified except approx sketches.
  */
object Analytics {
  import Q._

  /** Exact ⌊a/b⌋ for a non-negative DECIMAL numerator: (a − a%b)/b —
    * the numerator is made exactly divisible first, so the decimal
    * divide is rounding-free and stays decimal end to end (Spark's
    * DIV converts its quotient back to LONG, re-introducing the
    * 64-bit wrap the decimal cast exists to avoid). Equals DuckDB's
    * `//` on HUGEINT for the same operands. */
  def exactFloorDiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((a - a % b) / b).cast("decimal(38,0)")

  /** Typed row for the Dataset-API query (top-level: local case
    * classes cannot derive Encoders). */
  final case class Cust(c_custkey: Long, c_name: String,
      c_nationkey: Int, c_acctbal: Double, c_mktsegment: String)

  val queries: Map[String, Fn] = Map(
    // Star join: fact ⋈ supplier ⋈ nation ⋈ region, revenue per
    // region/nation. All three dims are bounded → broadcast; the only
    // shuffle is the final aggregation on a 25-key space. At 100 TB
    // this plan is scan-heavy but exchange-light — the ideal shape.
    "q12_star_join_revenue" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
        .select($"l_suppkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      val sup = Tables.table(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      val nat = Tables.table(s, dir, "nation")
      val reg = Tables.table(s, dir, "region")
      li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"revenue").as("total_revenue"), count(lit(1)).as("n_lines"))
        .orderBy($"r_name", $"n_name")
    }),

    // TPC-H Q5 shape — local supplier volume: revenue per nation for
    // orders placed in 1996 where the CUSTOMER and the SUPPLIER sit
    // in the same ASIA nation. The canonical 6-table OLAP join, and
    // the plan the engine should produce without hints beyond the
    // bounded-dim broadcasts: the o_orderdate year filter prunes
    // orders BEFORE the fact-fact join (predicate pushdown to the
    // scan), lineitem ⋈ orders shuffles once on orderkey (the only
    // big exchange), customer joins on the shuffled side's custkey,
    // and supplier/nation/region ride as broadcasts with the
    // same-nation equi-constraint (c_nationkey = s_nationkey) applied
    // as a join condition, not a post-filter. At 100 TB this is the
    // recurring fact-fact economics: co-partition lineitem/orders on
    // orderkey at rest (the q163 bucketing move) and the one shuffle
    // disappears too.
    "q174_local_supplier_volume" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.table(s, dir, "orders")
        .filter(year($"o_orderdate".cast("date")) === 1996)
        .select($"o_orderkey", $"o_custkey")
      val li = Tables.table(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      val cust = Tables.table(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey")
      val sup = Tables.table(s, dir, "supplier")
        .select($"s_suppkey", $"s_nationkey")
      val nat = Tables.table(s, dir, "nation")
        .select($"n_nationkey", $"n_name", $"n_regionkey")
      val reg = Tables.table(s, dir, "region")
        .filter($"r_name" === "ASIA").select($"r_regionkey")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(sup),
          $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(dsum($"revenue").as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Per-group top-k via row_number window (SURVEY.md §2.7 gap):
    // top-3 customers by account balance per nation. One shuffle on
    // nationkey; rank prunes before any further join.
    "q13_topk_per_group" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.table(s, dir, "customer")
        .withColumn("rank_in_nation", row_number().over(w))
        .filter($"rank_in_nation" <= 3)
        .select($"c_nationkey", $"rank_in_nation", $"c_custkey", $"c_acctbal")
        .orderBy($"c_nationkey", $"rank_in_nation")
    }),

    // Running (cumulative) sum window. DECIMAL inside the frame sum:
    // DuckDB evaluates window aggregates with a segment tree (varying
    // association order), Spark incrementally — only an exact type
    // makes the two agree bit-for-bit.
    "q14_running_sum" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.table(s, dir, "orders")
        .withColumn("running_spend",
          sum($"o_totalprice".cast("decimal(18,4)")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"running_spend")
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // ROLLUP grouping sets: order counts at (region, nation), (region),
    // () levels. grouping_id disambiguates genuine NULLs from subtotal
    // rows.
    "q15_rollup_counts" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.table(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      val nat = Tables.table(s, dir, "nation")
      val reg = Tables.table(s, dir, "region")
      val ords = Tables.table(s, dir, "orders").select($"o_custkey")
      ords.join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_orders"),
          grouping_id($"r_name", $"n_name").as("gid"))
        .orderBy($"gid", asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    // Exact distinct aggregation (expands to a two-phase aggregate).
    "q16_distinct_counts" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
      li.groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_suppkey").as("n_suppliers"),
          countDistinct($"l_partkey").as("n_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy($"l_returnflag")
    }),

    // Approximate distinct (HLL++). Sketch REGISTERS are
    // engine-specific, so the raw estimate can't be hash-compared —
    // but its ACCURACY CONTRACT can (the q220 move, applied here in
    // r10 to retire the oracle exemption): the audit output carries
    // the exact count (replayable) plus the contract predicate
    // "estimate within 5% of exact" as a boolean the oracle expects
    // TRUE. The HLL sketch still RUNS and feeds the predicate from
    // its live estimate, so a Spark upgrade that drifted the sketch
    // out of contract flips the boolean and the driver row goes red —
    // the bound is now gate-checked, not just spec-pinned
    // (CoreQueriesSpec keeps the raw-value assertion). The exact
    // companion is a test-scale audit column — at 100 TB you ship
    // only the sketch, which is the whole point (constant-size merge
    // vs full distinct shuffle) — so it is gated on
    // spark.graft.sketchAudit (default on; Bench turns it off so the
    // timed body is the sketch path alone).
    "q17_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      val audit = s.conf.get("spark.graft.sketchAudit", "true").toBoolean
      val grouped = Tables.table(s, dir, "lineitem").groupBy($"l_returnflag")
      if (audit)
        grouped
          .agg(
            approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
            countDistinct($"l_orderkey").as("exact_orders"))
          .select($"l_returnflag", $"exact_orders",
            (abs($"approx_orders" - $"exact_orders").cast("double") <=
              $"exact_orders".cast("double") * 0.05)
              .as("hll_within_5pct"))
          .orderBy($"l_returnflag")
      else
        grouped
          .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
          .orderBy($"l_returnflag")
    }),

    // Date/time function pack (cross-engine-safe subset: weekday is
    // Spark's Monday=0 == DuckDB isodow-1; dayofweek's Sunday origin
    // differs between engines and is avoided).
    "q52_date_functions" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "orders")
        .select($"o_orderkey", $"o_orderdate".cast("date").as("d"))
        .select(
          $"o_orderkey",
          $"d",
          month($"d").as("order_month"),
          quarter($"d").as("order_quarter"),
          weekday($"d").as("order_weekday"),
          last_day($"d").as("month_end"),
          date_trunc("month", $"d").cast("date").as("month_start"),
          add_months($"d", 3).as("plus_quarter"))
        .orderBy($"o_orderkey")
    }),

    // Null-handling semantics: coalesce, nullif, null-safe equality
    // (<=> / IS NOT DISTINCT FROM). Nulls are synthesized via nullif
    // since the testdata is null-free.
    "q53_null_semantics" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_discount", $"l_tax")
        .select(
          $"l_orderkey", $"l_linenumber",
          nullif($"l_discount", lit(0.0)).as("disc_or_null"),
          coalesce(nullif($"l_discount", lit(0.0)), lit(-1.0)).as("disc_coalesced"),
          (nullif($"l_discount", lit(0.0)) <=> nullif($"l_tax", lit(0.0)))
            .cast("int").as("null_safe_eq"))
        .orderBy($"l_orderkey", $"l_linenumber", $"disc_coalesced", $"null_safe_eq")
    }),

    // UNPIVOT/melt — wide metrics to long (metric, value) rows, the
    // inverse of pivot (q37); plans as a generator expand, no shuffle.
    "q51_unpivot_metrics" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax")
        .unpivot(
          ids = Array($"l_orderkey", $"l_linenumber"),
          values = Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          variableColumnName = "metric",
          valueColumnName = "value")
        // (l_orderkey, l_linenumber) is not unique in the testdata —
        // value joins the sort key for a total order
        .orderBy($"l_orderkey", $"l_linenumber", $"metric", $"value")
    }),

    // Approximate percentiles (Greenwald-Khanna sketch): like HLL for
    // distincts, the sketch replaces a full sort with a constant-size
    // mergeable summary — the 100 TB path for quantiles. GK internals
    // are engine-specific, so the raw estimate can't be hash-compared
    // — but (the q220 move, r10) the audit output is replayable: the
    // RANK-EXACT median (the element at rank ⌈n/2⌉ under a total
    // order — a data VALUE, no interpolation ambiguity; the
    // q171/q221 selection machinery) plus the contract predicate
    // "GK estimate within 1% of exact" as a boolean the oracle
    // expects TRUE. The GK sketch still RUNS and feeds the predicate
    // live, so a drift out of contract flips the driver row red.
    // Exact companion is test-scale audit only — at 100 TB the
    // sketch replaces it — so it is gated on spark.graft.sketchAudit
    // (default on; Bench turns it off so the timed body is the
    // sketch alone, not the exact sort it replaces).
    "q50_percentile_approx" -> ((s, dir) => {
      import s.implicits._
      val audit = s.conf.get("spark.graft.sketchAudit", "true").toBoolean
      val src = Tables.table(s, dir, "lineitem")
      if (audit) {
        val byG = Window.partitionBy($"l_returnflag")
        val exact = src
          .select($"l_returnflag", $"l_extendedprice",
            $"l_orderkey", $"l_linenumber")
          .withColumn("rn", row_number().over(byG.orderBy(
            $"l_extendedprice", $"l_orderkey", $"l_linenumber")))
          .withColumn("n", count(lit(1)).over(byG))
          .groupBy($"l_returnflag", $"n")
          .agg(max(when($"rn" === expr("(n + 1) div 2"),
            $"l_extendedprice")).as("p50_exact"))
        val gk = src.groupBy($"l_returnflag")
          .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
            .as("gk"))
        exact.join(gk, "l_returnflag")
          .select($"l_returnflag", $"n", $"p50_exact",
            (abs($"gk" - $"p50_exact") <= $"p50_exact" * 0.01)
              .as("gk_within_1pct"))
          .orderBy($"l_returnflag")
      } else
        src.groupBy($"l_returnflag")
          .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
            .as("p50_price_approx"))
          .orderBy($"l_returnflag")
    }),

    // Anti join (NOT EXISTS): customers with no 1998 orders. The
    // filter shrinks the build side before the join.
    "q18_customers_without_orders" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.table(s, dir, "customer")
      val ords = Tables.table(s, dir, "orders")
        .filter($"o_orderdate" >= to_timestamp_ntz(lit("1998-01-01")) &&
          $"o_orderdate" < to_timestamp_ntz(lit("1999-01-01")))
        .select($"o_custkey")
      cust.join(ords, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Set operations: INTERSECT and EXCEPT over derived key sets,
    // tagged and unioned into one result.
    "q19_set_ops" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.table(s, dir, "customer")
      val building = cust.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val rich = cust.filter($"c_acctbal" > 5000.0).select($"c_custkey")
      val both = building.intersect(rich).withColumn("set_op", lit("building_and_rich"))
      val only = building.except(rich).withColumn("set_op", lit("building_not_rich"))
      both.unionByName(only).orderBy($"set_op", $"c_custkey")
    }),

    // JSON extraction from the events props column (SURVEY.md §7.2
    // step 8): get_json_object path access + typed cast.
    "q20_json_extract" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "events")
        .select($"event_id",
          get_json_object($"props", "$.k").cast("int").as("k_value"))
        .orderBy($"event_id")
    }),

    // Event-time tumbling window aggregation (1 day) — the batch
    // rendering of the streaming windowed agg; window boundaries are
    // epoch-aligned so they equal date_trunc on the oracle side.
    "q21_tumbling_window" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "events")
        .groupBy(window($"ts", "1 day").as("w"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select($"w.start".cast("date").as("day"), $"event_type",
          $"n_events", $"total_value")
        .orderBy($"day", $"event_type")
    }),

    // Sliding windows (2-day width, 1-day slide): every event lands in
    // two windows.
    "q22_sliding_window" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "events")
        .groupBy(window($"ts", "2 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select($"w.start".cast("date").as("window_start"), $"n_events")
        .orderBy($"window_start")
    }),

    // Pricing-summary aggregate suite (TPC-H Q1 shape): multiple
    // exact sums + averages per small group key — the map-side
    // partial aggregation workhorse. Averages are dsum/count in
    // double (both engines divide identical exact values).
    "q42_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
        .filter($"l_shipdate" < to_timestamp_ntz(lit("1998-09-01")))
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          dsumAt($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"),
            scale = 8).as("sum_charge"),
          (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
          (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
          (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Ranking-function family over one per-nation window: rank,
    // dense_rank, ntile, percent_rank, lag/lead — one shuffle total
    // (all functions share the window spec).
    "q38_rank_functions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.table(s, dir, "customer")
        .select(
          $"c_nationkey", $"c_custkey", $"c_acctbal",
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          lag($"c_custkey", 1).over(w).as("prev_cust"),
          lead($"c_custkey", 1).over(w).as("next_cust"))
        .orderBy($"c_nationkey", $"rnk")
    }),

    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`: both linear interpolation over the
    // sorted values).
    "q39_percentiles" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
        .orderBy($"l_returnflag")
    }),

    // Array higher-order functions over the embedding column:
    // transform / filter / exists / element stats — the array-function
    // surface, per-row (scan-parallel).
    "q47_array_functions" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "embeddings")
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          round(array_max(transform($"embedding", x => abs(x.cast("double")))), 6)
            .as("max_abs"),
          size(filter($"embedding", x => x > 0f)).as("n_positive"),
          exists($"embedding", x => x.cast("double") > 0.3)
            .cast("int").as("has_large"),
          round(element_at($"embedding", 1).cast("double"), 6).as("first_component"))
        .orderBy($"vec_id")
    }),

    // String-function pack: case mapping, substring, regexp capture,
    // concat, trim-family, edit distance (levenshtein exists on both
    // engines with identical semantics).
    "q48_string_functions" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "customer")
        .select(
          $"c_custkey",
          upper($"c_mktsegment").as("seg_upper"),
          lower($"c_name").as("name_lower"),
          regexp_extract($"c_name", "([0-9]+)", 1).as("name_digits"),
          substring($"c_name", 1, 8).as("name_prefix"),
          concat_ws("-", $"c_mktsegment", $"c_custkey").as("seg_key"),
          length($"c_name").as("name_len"),
          levenshtein($"c_name", $"c_mktsegment").as("edit_dist"))
        .orderBy($"c_custkey")
    }),

    // Correlated scalar subquery through the SQL front end: orders
    // worth more than 3x their customer's average order. Catalyst
    // decorrelates this into an aggregate + join — no per-row
    // subquery execution.
    "q46_correlated_subquery" -> ((s, dir) => {
      Tables.table(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders_v o
            WHERE o_totalprice > 3.0 * (
              SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(1)
              FROM orders_v i WHERE i.o_custkey = o.o_custkey)
            ORDER BY o_orderkey""")
    }),

    // Typed Dataset path: case-class rows, groupByKey + custom
    // Aggregators (compile-time field checks; the aggregator mirrors
    // dsum's decimal-exact semantics so it still oracle-matches).
    "q45_typed_segment_stats" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.TypedAggregators._
      val ds = Tables.table(s, dir, "customer").as[Cust]
      ds.groupByKey(_.c_mktsegment)
        .agg(
          new DecimalSumAgg[Cust](_.c_acctbal).toColumn.name("sum_acctbal"),
          new CountAgg[Cust].toColumn.name("n_customers"))
        .toDF("c_mktsegment", "sum_acctbal", "n_customers")
        .orderBy($"c_mktsegment")
    }),

    // RANGE window frame (value-based, not row-based): per customer,
    // spend in the 30 days up to and including each order. Ordered by
    // epoch-day so the frame is numeric on both engines.
    "q43_range_frame" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"order_day")
        .rangeBetween(-30, Window.currentRow)
      Tables.table(s, dir, "orders")
        .withColumn("order_day", datediff($"o_orderdate".cast("date"),
          lit("1970-01-01").cast("date")))
        .withColumn("spend_30d",
          sum($"o_totalprice".cast("decimal(18,4)")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"order_day", $"spend_30d")
        .orderBy($"o_custkey", $"order_day", $"o_orderkey")
    }),

    // JSON → typed map → explode: from_json into map<string,bigint>,
    // one row per key, aggregated per key.
    "q44_json_map_explode" -> ((s, dir) => {
      import s.implicits._
      // fanout: per-row JSON parsing must not run on the small scan's
      // single partition (see Q.fanout)
      Q.fanout(Tables.table(s, dir, "events"))
        .select($"event_id",
          explode(from_json($"props", lit("map<string,bigint>"))))
        .groupBy($"key")
        .agg(count(lit(1)).as("n"), sum($"value").as("total"))
        .orderBy($"key")
    }),

    // Gap-based sessionization (30-min inactivity) as window
    // functions: new-session flag via lag, session id via running sum
    // — the batch equivalent of session_window, expressible on both
    // engines. Two window passes over one user_id shuffle; the gap
    // test is in exact MICROseconds on both engines (second-truncated
    // unix_timestamp vs the oracle's fractional epoch() moved
    // borderline events between adjacent sessions). See
    // operators.Sessionize.chunked (q63) for the skewed-key form.
    // TPC-H Q10 shape — returned-item customer ranking: the top-20
    // customers by revenue lost to returns in one quarter, with their
    // nation. Complements q174's Q5: same fact-fact orderkey join,
    // but the aggregate keys on the CUSTOMER (high cardinality — the
    // group-by side a TopK must not pre-truncate) and the final
    // top-20 plans as TakeOrderedAndProject over the aggregate, never
    // a global sort. Date range is a pushable o_orderdate predicate;
    // nation broadcasts.
    "q179_returned_item_ranking" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.table(s, dir, "orders")
        .filter($"o_orderdate".cast("date") >= lit("1996-01-01") &&
          $"o_orderdate".cast("date") < lit("1996-04-01"))
        .select($"o_orderkey", $"o_custkey")
      val li = Tables.table(s, dir, "lineitem")
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      val cust = Tables.table(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
      val nat = Tables.table(s, dir, "nation")
        .select($"n_nationkey", $"n_name")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
        .agg(dsum($"revenue").as("revenue"),
          count(lit(1)).as("n_return_lines"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    // TPC-H Q3 shape — shipping priority: unshipped-revenue top-10 of
    // orders from one market segment. Completes the join-shape trio
    // with q174 (Q5) and q179 (Q10). Both date predicates are
    // pushable scan filters (l_shipdate on lineitem, o_orderdate on
    // orders); the segment membership is a LEFT SEMI against the
    // filtered customer — only keys move, no customer payload is
    // shuffled. The aggregate keys on orderkey, so Catalyst reuses
    // the join's orderkey partitioning (no second exchange of the
    // fact rows); top-10 plans as TakeOrderedAndProject.
    "q180_shipping_priority" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.table(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val ord = Tables.table(s, dir, "orders")
        .filter($"o_orderdate".cast("date") < lit("1998-01-01"))
        .select($"o_orderkey", $"o_custkey", $"o_orderdate",
          $"o_orderpriority")
      val li = Tables.table(s, dir, "lineitem")
        .filter($"l_shipdate".cast("date") > lit("1998-01-01"))
        .select($"l_orderkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
        .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(dsum($"revenue").as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }),

    // TPC-H Q18 shape — large-volume orders: orders whose TOTAL line
    // quantity clears a threshold, with their customer. The HAVING-
    // on-aggregate membership is computed aggregate-first: lineitem
    // shuffles ONCE on orderkey, the surviving (few) order keys join
    // orders on the same key — Catalyst reuses the aggregate's
    // partitioning, so only orders re-shuffles — and the customer
    // lookup joins a result already shrunk to the threshold
    // survivors. The anti-pattern this query exists to pin down is
    // joining lineitem to orders FIRST and aggregating the wide join
    // (twice the shuffled bytes); PlanAuditSpec-style shape: two
    // exchanges total on the fact side.
    "q181_big_order_customers" -> ((s, dir) => {
      import s.implicits._
      val big = Tables.table(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
        .groupBy($"l_orderkey")
        .agg(dsum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 250.0)
      val ord = Tables.table(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      val cust = Tables.table(s, dir, "customer")
        .select($"c_custkey", $"c_name")
      big.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
          $"o_totalprice", $"total_qty")
        .orderBy($"total_qty".desc, $"o_orderkey")
        .limit(50)
    }),

    // Semi-structured props through the VARIANT type (Spark 4's
    // binary-encoded JSON): parse_json materializes the open-schema
    // payload ONCE into the columnar-friendly variant encoding and
    // variant_get does typed path access — the engine-native upgrade
    // over per-row string re-parsing (q20 get_json_object / q44
    // from_json), and the representation a 100 TB telemetry column
    // should land in (parse at ingest, shred at read). Same census
    // shape as q44 so the two JSON tiers stay comparable.
    "q195_variant_props" -> ((s, dir) => {
      import s.implicits._
      Q.fanout(Tables.table(s, dir, "events"))
        .select($"event_type", parse_json($"props").as("v"))
        .select($"event_type",
          expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    // Last-touch attribution — each purchase's value is credited to
    // the user's most recent PRIOR non-purchase event type, or
    // 'direct' when none exists within the 1-day lookback. The carry
    // is one ignore-nulls last() over the user timeline (frame ends
    // at -1, so a purchase never attributes to itself or a later
    // event); one exchange on user_id feeds the window, the channel
    // rollup is a bounded hash aggregate. The gap test is exact
    // integer microseconds (the q23 discipline).
    "q188_last_touch_attribution" -> ((s, dir) => {
      import s.implicits._
      val prior = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.table(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
        .withColumn("prev_type", last(
          when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(prior))
        .withColumn("prev_ts", last(
          when($"event_type" =!= "purchase", $"ts"),
          ignoreNulls = true).over(prior))
        .filter($"event_type" === "purchase")
        .withColumn("channel", when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 86400000000L,
          "direct").otherwise($"prev_type"))
        .groupBy($"channel")
        .agg(count(lit(1)).as("n_purchases"),
          dsum($"value").as("attributed_value"))
        .orderBy($"channel")
    }),

    // Multi-granularity census in ONE pass — GROUPING SETS plans as a
    // single Expand (each input row fans to its 4 grains) feeding ONE
    // hash aggregate: the day×type, day, type, and grand-total rows
    // share one shuffle instead of four scans+unions. grouping_id
    // disambiguates a real value from an aggregated-out one (the
    // coalesce to 'ALL' is display only). Completes the grouping
    // family: q15 ROLLUP (hierarchical), this one mixed grains.
    "q189_grouping_sets_census" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "events")
        .select(to_date($"ts").as("day"), $"event_type", $"value")
        .groupingSets(
          Seq(Seq($"day", $"event_type"), Seq($"day"),
            Seq($"event_type"),
            Seq.empty[org.apache.spark.sql.Column]),
          $"day", $"event_type")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .select(coalesce($"day".cast("string"), lit("ALL")).as("day"),
          coalesce($"event_type", lit("ALL")).as("event_type"),
          $"gid", $"n", $"total_value")
        .orderBy($"gid", $"day", $"event_type")
    }),

    // Journey trigram mining — the top 25 three-step event paths
    // across user timelines (q119's transition matrix extended to
    // order-3 context; the sequence-mining shape behind "what do
    // users do right before an error"). Two leads ride ONE user
    // window sort; path cardinality is bounded by |types|³, so the
    // count aggregate and TakeOrdered are fixed-size regardless of
    // event volume.
    "q190_journey_trigrams" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.table(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("t2", lead($"event_type", 1).over(byUser))
        .withColumn("t3", lead($"event_type", 2).over(byUser))
        .filter($"t3".isNotNull)
        .select($"event_type".as("s1"), $"t2".as("s2"), $"t3".as("s3"))
        .groupBy($"s1", $"s2", $"s3")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"s1", $"s2", $"s3")
        .limit(25)
    }),

    // Conversation assembly — the SFT-example builder over
    // interaction logs: each multi-turn session (q23's gap rule)
    // renders as an ordered dialogue string of its event types. The
    // ORDER of turns inside the aggregate is pinned by array_sort on
    // (ts, event_id, type) structs — collect_list order is free to
    // vary across partitionings; the sort, not luck, fixes the text
    // (the q161 discipline). Distinct from q89 (document context
    // packing): the unit here is the interaction session, the shape a
    // conversational fine-tuning set is actually built from. One
    // window chain on user + one hash aggregate; turn strings are
    // bounded by session length.
    "q176_conversation_build" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = Tables.table(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session", when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
          .otherwise(0L))
        .withColumn("session_seq", sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_turns"),
          array_join(
            transform(
              array_sort(collect_list(
                struct($"ts", $"event_id", $"event_type"))),
              x => x.getField("event_type")), " -> ").as("dialogue"))
        .filter($"n_turns" >= 3)
        .orderBy($"user_id", $"session_seq")
    }),

    // Chat-template rendering + loss-mask spans — the step between
    // q176's assembled dialogues and an SFT dataloader: each session
    // renders as "<|user|>…<|assistant|>…" (roles alternate from
    // user) and the ASSISTANT content spans come out as [start:end)
    // char offsets into the rendered string — the loss mask an SFT
    // trainer applies so user turns never contribute gradient.
    // Offsets are a per-session running length sum (window partitioned
    // by session — bounded by session length, embarrassingly parallel
    // across sessions at any scale); the hash gate pins the RENDERED
    // BYTES (md5) and the span arithmetic, not just counts. One
    // window chain + one hash aggregate — q176's exact scale shape.
    "q209_chat_template" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = Tables.table(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session", when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
          .otherwise(0L))
        .withColumn("session_seq", sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy($"user_id", $"session_seq")
        .orderBy($"ts", $"event_id")
      val turns = sess
        .withColumn("turn", row_number().over(bySess))
        .withColumn("role",
          when($"turn" % 2 === 1, lit("user")).otherwise(lit("assistant")))
        .withColumn("piece",
          concat(lit("<|"), $"role", lit("|>"), $"event_type"))
        .withColumn("cum_len", sum(length($"piece").cast("long")).over(
          bySess.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      turns.groupBy($"user_id", $"session_seq")
        .agg(count(lit(1)).as("n_turns"),
          md5(array_join(transform(
            array_sort(collect_list(struct($"turn", $"piece"))),
            x => x.getField("piece")), "")).as("text_md5"),
          array_join(transform(
            array_sort(collect_list(when($"role" === "assistant",
              struct($"turn", concat(
                ($"cum_len" - length($"event_type")).cast("string"),
                lit(":"), $"cum_len".cast("string")).as("span"))))),
            x => x.getField("span")), ",").as("mask_spans"),
          sum(when($"role" === "assistant",
            length($"event_type").cast("long")).otherwise(0L))
            .as("n_assistant_chars"))
        .filter($"n_turns" >= 3)
        .orderBy($"user_id", $"session_seq")
    }),

    "q23_sessionize" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sessionize.plain(
        Tables.table(s, dir, "events")
          .select($"user_id", $"event_id", $"ts", $"value"),
        "user_id", "ts", "event_id", "value", gapMicros = 1800000000L)
        .orderBy($"user_id", $"session_seq")
    }),

    // The THIRD sessionize rendering: Spark's native session_window
    // operator (one MergingSessionsExec pass — no lag/running-sum
    // window chain), renumbered to q23's per-user sequence and
    // verified against the SAME oracle. Boundary nuance: session_window
    // merges on gap < 30 min (window end exclusive) while the lag form
    // merges on gap ≤ 30 min; the renderings differ only for deltas of
    // EXACTLY 1800.000000s, of which the events table has zero at
    // every SF — a data property ENFORCED by CoreQueriesSpec's
    // "q70 precondition" test (not merely remembered), since real
    // event-time data practically never hits a microsecond-exact
    // boundary but a regenerated table must prove it.
    "q70_session_window" -> ((s, dir) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"session_start")
      Tables.table(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(
          min($"ts").as("session_start"),
          max($"ts").as("session_end"),
          count(lit(1)).as("n_events"),
          dsum($"value").as("session_value"))
        .withColumn("session_seq", row_number().over(byUser).cast("long"))
        .select($"user_id", $"session_seq", $"session_start",
          $"session_end", $"n_events", $"session_value")
        .orderBy($"user_id", $"session_seq")
    }),

    // Cohort retention matrix — the classic product-analytics
    // operator: cohort = ISO week of a user's FIRST event; cell
    // (cohort_week, activity_week) counts the cohort's users active
    // that week. Three aggregates and one key-shuffle join: min-week
    // per user, distinct (user, week), join on user_id, final count.
    // Every shuffle is on user_id or a week pair — partial-aggregable
    // and co-partitioned, the shape that survives a billion users.
    "q96_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val byWeek = Tables.table(s, dir, "events")
        .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
      val cohort = byWeek.groupBy($"user_id")
        .agg(min($"wk").as("cohort_week"))
      byWeek.distinct()
        .join(cohort, "user_id")
        .groupBy($"cohort_week", $"wk".as("activity_week"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"cohort_week", $"activity_week")
    }),

    // Session funnel: within each 30-minute session (q23's boundary
    // semantics), did the user view → then click → then purchase, in
    // event-time order? Stages are cumulative window flags over ONE
    // extra window pass sharing the sessionize partition+order (no
    // extra shuffle beyond the user_id exchange all window steps
    // share), then one per-session max-reduce and a per-day rollup.
    "q97_session_funnel" -> ((s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val cum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flagged = Tables.table(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_seq", sum($"new_session").over(cum))
      val wSess = Window.partitionBy($"user_id", $"session_seq")
        .orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = flagged
        .withColumn("saw_view",
          max(when($"event_type" === "view", 1).otherwise(0)).over(wSess))
        .withColumn("saw_vc",
          max(when($"event_type" === "click" && $"saw_view" === 1, 1)
            .otherwise(0)).over(wSess))
        .withColumn("saw_vcp",
          max(when($"event_type" === "purchase" && $"saw_vc" === 1, 1)
            .otherwise(0)).over(wSess))
      staged.groupBy($"user_id", $"session_seq")
        .agg(min($"ts").cast("date").as("day"),
          max($"saw_view").as("v"), max($"saw_vc").as("vc"),
          max($"saw_vcp").as("vcp"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"v").cast("long").as("n_view"),
          sum($"vc").cast("long").as("n_view_click"),
          sum($"vcp").cast("long").as("n_full_funnel"))
        .orderBy($"day")
    }),

    // User-journey transition matrix: count of consecutive
    // (event_type → next event_type) steps per user timeline — the
    // Markov-chain summary product analytics builds funnels from.
    // One lag window on the user key, then a partial-aggregable count.
    "q119_journey_transitions" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.table(s, dir, "events")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull)
        .groupBy($"prev_type", $"event_type")
        .agg(count(lit(1)).as("n_transitions"))
        .orderBy($"prev_type", $"event_type")
    }),

    // Recursive-CTE reachability (Spark 4's WITH RECURSIVE /
    // UnionLoop): min-hop transitive closure of q119's journey graph
    // — "can a user path ever lead from src to dst, and in how few
    // steps?" The recursion is the OPERATOR being exercised; its
    // input is deliberately the BOUNDED transition graph (≤ |types|²
    // edges regardless of corpus size — the lineage-DAG/metadata
    // class recursive CTEs are for at 100 TB, never a fact table).
    // The fact-scale work is one lag window + distinct; the loop then
    // iterates on a frame of at most |types|² rows, hop-capped so a
    // cyclic graph terminates under UNION ALL on both engines.
    "q207_transition_closure" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.table(s, dir, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull && $"next_type" =!= $"event_type")
        .select($"event_type".as("src"), $"next_type".as("dst"))
        .distinct()
        // pin the tiny edge frame BEFORE the loop: UnionLoop
        // re-evaluates its step plan every iteration, so an unpinned
        // view would re-run the fact-scale lag window + distinct once
        // per hop (measured: 14 s -> ~2 s at sf0.1)
        .localCheckpoint()
        .createOrReplaceTempView("q207_edges")
      s.sql("""
        WITH RECURSIVE reach(src, dst, hops) AS (
          SELECT src, dst, 1 AS hops FROM q207_edges
          UNION ALL
          SELECT r.src, e.dst, r.hops + 1
          FROM reach r JOIN q207_edges e ON r.dst = e.src
          WHERE r.hops < 4)
        SELECT src, dst, CAST(min(hops) AS BIGINT) AS min_hops
        FROM reach GROUP BY src, dst ORDER BY src, dst""")
    }),

    // SQL pipe syntax (Spark 4's `|>` operator chaining — SIGMOD'24
    // "SQL Has Problems..."/GoogleSQL pipes): the TPC-H Q1 pricing
    // summary written as a linear pipeline instead of inside-out SQL.
    // Same plan as the classic spelling (parser-level sugar — WHERE
    // before AGGREGATE pushes to the scan exactly as ever); the
    // oracle runs the classic form in DuckDB, so the gate also pins
    // that the sugar changes nothing semantically. Decimal-exact sums
    // (Q.dsum's discipline) keep the doubles engine-portable.
    "q215_pipe_syntax_q1" -> ((s, dir) => {
      Tables.table(s, dir, "lineitem").createOrReplaceTempView("q215_lineitem")
      s.sql("""
        FROM q215_lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |> AGGREGATE
             count(*) AS count_order,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
               AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus""")
    }),

    // Correlated LATERAL subquery — the per-group top-k spelled the
    // way an analyst writes it (join each source to ITS best 3 docs
    // by quality), exercising Catalyst's lateral-join decorrelation:
    // the correlated ORDER BY … LIMIT subquery must rewrite to a
    // per-source rank, never an expensive per-row re-execution. The
    // quality scorer rides in the view so both the outer DISTINCT and
    // the lateral leg read one scan shape.
    "q211_lateral_topk" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select($"doc_id", $"source",
          graft.text.TextFunctions.qualityScore($"text").as("q"))
        .createOrReplaceTempView("q211_scored")
      s.sql("""
        SELECT s.source, l.doc_id, l.q
        FROM (SELECT DISTINCT source FROM q211_scored) s,
        LATERAL (SELECT doc_id, q FROM q211_scored d
                 WHERE d.source = s.source
                 ORDER BY d.q DESC, d.doc_id LIMIT 3) l
        ORDER BY s.source, l.q DESC, l.doc_id""")
    }),

    // Session-duration histogram: q23's sessionization (the SAME
    // Sessionize.plain operator) rolled into equi-width 5-minute bins
    // — the distribution view capacity planning reads. Bin ids via
    // integer `div` (a fractional divide + cast would trunc on Spark
    // but round on DuckDB); the histogram is one partial-aggregable
    // GROUP BY on the bin id.
    "q120_session_duration_histogram" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sessionize.plain(
        Tables.table(s, dir, "events")
          .select($"user_id", $"event_id", $"ts", $"value"),
        "user_id", "ts", "event_id", "value", gapMicros = 1800000000L)
        .withColumn("dur_us",
          unix_micros($"session_end") - unix_micros($"session_start"))
        .withColumn("bin", expr("dur_us div 300000000"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_sessions"),
          min($"dur_us").as("min_us"), max($"dur_us").as("max_us"))
        .orderBy($"bin")
    }),

    // Per-user EWMA over the trailing 8 events with DYADIC decay
    // (α = 1/2): the weight 2^(-k) only shifts the double's exponent,
    // so every product is EXACT and the bounded order-fixed fold is
    // bit-identical on any engine — exponential smoothing without the
    // cross-engine pow() hazard. One window shuffle on the user key;
    // the trailing frame keeps per-row state bounded (8 doubles).
    // Rolling robust anomaly flag per user timeline: |x − median₇| >
    // 1.5·(Q3 − Q1) over a trailing 7-row window. Median/quartiles
    // are EXACT ELEMENT PICKS from the sorted trail (ceil-index
    // convention) — never interpolated: Spark's percentile blends as
    // (1−g)·a + g·b while DuckDB's quantile_cont computes
    // a + (b−a)·g, which differ in the last ulp; picked elements are
    // raw data values, identical by construction. 1.5 is dyadic so
    // the single multiply is exact. One per-user window shuffle.
    "q132_rolling_anomaly" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-6, Window.currentRow)
      Tables.table(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", $"value")
        .withColumn("trail", sort_array(collect_list($"value").over(w)))
        .select($"event_id", $"user_id", $"value",
          // `div`, not `/` (Column./ is double division); div yields
          // BIGINT — element_at wants INT
          expr("element_at(trail, int((size(trail) + 1) div 2))")
            .as("med"),
          expr("element_at(trail, int((size(trail) * 3 + 3) div 4))")
            .as("hi"),
          expr("element_at(trail, int((size(trail) + 3) div 4))")
            .as("lo"))
        .select($"event_id", $"user_id", $"value", $"med",
          (abs($"value" - $"med") > lit(1.5) * ($"hi" - $"lo"))
            .as("is_anomaly"))
        .orderBy($"event_id")
    }),

    "q113_ewma_smoothing" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-7, Window.currentRow)
      Tables.table(s, dir, "events")
        .withColumn("trail", collect_list($"value").over(w))
        // element i of L (0-based, oldest→newest) gets weight
        // 2^-(L-1-i); 1/(1L<<k) is exact, never pow()
        .withColumn("ewma", aggregate(
          zip_with($"trail",
            sequence(lit(0), size($"trail") - 1),
            (v, i) => v / call_function("shiftleft", lit(1L),
              size($"trail") - 1 - i).cast("double")),
          lit(0.0), (acc, x) => acc + x))
        .select($"event_id", $"user_id", $"ts", $"value", $"ewma")
        .orderBy($"event_id")
    }),

    // Date-spine gap fill: one contiguous day row per user between
    // their first and last active day, zero-filled — the time-series
    // completion every per-day model input needs (missing day ≠
    // absent row). The spine is GENERATED per user (sequence +
    // explode, no calendar table join); days created ∝ output rows.
    "q114_date_spine" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .withColumn("day", $"ts".cast("date"))
      val daily = ev.groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_events"))
      val spine = ev.groupBy($"user_id")
        .agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"user_id",
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day",
          coalesce($"n_events", lit(0L)).as("n_events"))
        .orderBy($"user_id", $"day")
    }),

    // Rank sources by long-doc rate with the Wilson 95% lower bound —
    // the uncertainty-aware ranking (Agresti & Coull 1998 family)
    // that stops a 2-doc source from outranking a 2 000-doc one on
    // raw proportion. Every term is IEEE-pinned (division, multiply,
    // and sqrt are all correctly-rounded single ops; z = 1.96 is an
    // exact literal) and the oracle writes the IDENTICAL expression
    // tree, so the double result replays bit-exactly — the Shannon/ln
    // trap (q103's comment) does not apply. One partial-aggregable
    // count pass; the ranking sorts |sources| rows.
    "q230_wilson_ranking" -> ((s, dir) => {
      import s.implicits._
      val z = lit(1.96)
      val agg = Tables.table(s, dir, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"n_chars" >= 400, 1)).as("n_long"))
      val nD = $"n_docs".cast("double")
      val p = $"n_long".cast("double") / nD
      val low = (p + z * z / (lit(2.0) * nD) -
        z * sqrt((p * (lit(1.0) - p) + z * z / (lit(4.0) * nD)) / nD)) /
        (lit(1.0) + z * z / nD)
      agg.select($"source", $"n_docs", $"n_long",
          round(p, 6).as("p_raw"), round(low, 6).as("wilson_low"))
        .orderBy($"wilson_low".desc, $"source")
    }),

    // Robust outlier gate per event type: median/MAD (the
    // breakdown-point-0.5 alternative to mean/σ, Hampel's rule with
    // the 1.4826 normal-consistency constant) — values beyond
    // med ± 3·1.4826·MAD flagged. Two interpolated-percentile
    // aggregates (Spark percentile ≡ DuckDB quantile_cont, the q43
    // precedent), each followed by a broadcast join of the ≤|types|
    // model rows back onto the scan — the per-group median never
    // pivots through a global sort. At 100 TB the exact percentile
    // becomes the q221 histogram twin; the gate logic is unchanged.
    "q231_mad_outliers" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select($"event_type", $"value")
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val mad = ev.join(broadcast(med), "event_type")
        .groupBy($"event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      ev.join(broadcast(med), "event_type")
        .join(broadcast(mad), "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          max(round($"med", 6)).as("med"),
          max(round($"mad", 6)).as("mad"),
          count(when(abs($"value" - $"med") >
            lit(3.0) * lit(1.4826) * $"mad", 1)).as("n_outliers"))
        .withColumn("outlier_rate",
          round($"n_outliers".cast("double") / $"n".cast("double"), 6))
        .orderBy($"event_type")
    }),

    // Lag-1 autocorrelation of each event type's daily-revenue
    // series — the seasonality/trend screen run before forecasting.
    // Daily sums are EXACT integers (floor(value·100) cents — floor
    // of a double product is deterministic on every IEEE engine, the
    // q109 fixed-point discipline), the five Pearson moment sums
    // accumulate in DECIMAL (order-independent), and only the final
    // closed form divides in double (division and sqrt are
    // correctly-rounded; the oracle writes the identical tree). The
    // series per group is one row per day — the lag window and the
    // moment aggregate run over |days| rows, not |events|; the only
    // data-sized pass is the first partial-aggregable daily sum.
    "q232_autocorr_daily" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("x"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val pairs = daily
        .withColumn("y", lag($"x", 1).over(w))
        .filter($"y".isNotNull)
        .select($"event_type",
          $"x".cast("decimal(19,0)").as("x"),
          $"y".cast("decimal(19,0)").as("y"))
      val m = pairs.groupBy($"event_type").agg(
        count(lit(1)).as("n_pairs"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"y").cast("double").as("sxy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y" * $"y").cast("double").as("syy"))
      val nD = $"n_pairs".cast("double")
      val r = (nD * $"sxy" - $"sx" * $"sy") /
        (sqrt(nD * $"sxx" - $"sx" * $"sx") *
          sqrt(nD * $"syy" - $"sy" * $"sy"))
      m.select($"event_type", $"n_pairs", round(r, 6).as("r_lag1"))
        .orderBy($"event_type")
    }),

    // Financial reconciliation: does o_totalprice equal the order's
    // lineitem total (the TPC-H invariant)? On this synthetic feed it
    // does NOT — which is exactly what the operator exists to report:
    // a relative-error census a finance/data-contract team reads
    // before trusting either column. Both sides are EXACT integer
    // cents (floor of the identical double product — the q109/q232
    // fixed-point discipline), the comparison joins once on the order
    // key (a 100 TB-safe shuffle join on the natural key), and the
    // output is a bounded bucket histogram. Orders with no lineitems
    // surface as their own bucket, not a silent drop (q111's NOT
    // EXISTS lesson).
    "q235_order_reconciliation" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum(floor($"l_extendedprice" * (lit(1.0) + $"l_tax") *
          (lit(1.0) - $"l_discount") * lit(100.0)).cast("long"))
          .as("line_cents"))
      val ords = Tables.table(s, dir, "orders")
        .select($"o_orderkey",
          floor($"o_totalprice" * lit(100.0)).cast("long")
            .as("total_cents"))
      val rel = abs($"line_cents" - $"total_cents").cast("double") /
        $"total_cents".cast("double")
      ords.join(li, $"o_orderkey" === $"l_orderkey", "left_outer")
        .withColumn("bucket",
          when($"line_cents".isNull, "no_lineitems")
            .when($"line_cents" === $"total_cents", "exact")
            .when(rel < 0.01, "lt_1pct")
            .when(rel < 0.1, "lt_10pct")
            .when(rel < 0.5, "lt_50pct")
            .otherwise("ge_50pct"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_orders"),
          max(round(rel, 6)).as("max_rel_err"))
        .orderBy($"bucket")
    }),

    // Revenue-concentration audit: the Gini coefficient and top-decile
    // share of per-customer revenue — the inequality screen a curation
    // team also runs on per-SOURCE token counts before sampling. The
    // rank-weighted sum Σ i·rᵢ needs a GLOBAL rank over customers:
    // that is GlobalIndex.withGlobalSeq (range exchange + per-
    // partition local index — q167's distributed prefix machinery),
    // never `row_number() OVER ()`'s single-task window. Revenues are
    // exact integer cents; Σ i·rᵢ accumulates in DECIMAL; only the
    // closed form G = 2Σirᵢ/(nΣr) − (n+1)/n divides in double.
    "q236_revenue_gini" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.GlobalIndex
      val rev = Tables.table(s, dir, "lineitem")
        .join(Tables.table(s, dir, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") *
          lit(100.0)).cast("long")).as("r"))
      val ranked = GlobalIndex.withGlobalSeq(rev,
        Seq($"r".asc, $"o_custkey".asc), seqCol = "i")
      // top-decile share needs n first: one bounded count over the
      // checkpointed ranked frame (1 driver long, the IVF-model class)
      val n = ranked.agg(count(lit(1)).as("n")).head.getLong(0)
      val top = ranked.filter($"i" > n - n / 10)
        .agg(coalesce(sum($"r".cast("decimal(19,0)")), lit(0L))
          .cast("double").as("top_cents"))
      val base = ranked.agg(
        count(lit(1)).as("n_customers"),
        sum($"r".cast("decimal(19,0)")).cast("double").as("tot"),
        sum($"i".cast("decimal(19,0)") * $"r".cast("decimal(19,0)"))
          .cast("double").as("s_ir"))
      val nD = $"n_customers".cast("double")
      base.crossJoin(broadcast(top)) // 1-row × 1-row
        .select($"n_customers",
          round(lit(2.0) * $"s_ir" / (nD * $"tot") -
            (nD + lit(1.0)) / nD, 6).as("gini"),
          round($"top_cents" / $"tot", 6).as("top10_share"))
    }),

    // Benford first-digit audit over order totals — the fraud/
    // synthetic-data screen: observed first-significant-digit shares
    // against Benford's log₁₀(1+1/d), with the per-digit χ²
    // contribution in-row. The first digit comes from the INTEGER
    // cents' decimal rendering (never log₁₀ of a double — the q103
    // no-transcendentals rule; the nine Benford probabilities are
    // 12-decimal literals, parsed to identical doubles by both
    // engines). One partial-aggregable digit census + a broadcast
    // 1-row total; 9 output rows at any scale.
    "q238_benford_audit" -> ((s, dir) => {
      import s.implicits._
      val bp = typedlit(Map(
        "1" -> 0.301029995664, "2" -> 0.176091259056,
        "3" -> 0.124938736608, "4" -> 0.096910013008,
        "5" -> 0.079181246048, "6" -> 0.066946789631,
        "7" -> 0.057991946978, "8" -> 0.051152522447,
        "9" -> 0.045757490561))
      val digits = Tables.table(s, dir, "orders")
        .select(substring(floor($"o_totalprice" * lit(100.0))
          .cast("long").cast("string"), 1, 1).as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
      val tot = digits.agg(sum($"n_obs").as("n_total"))
      digits.crossJoin(broadcast(tot))
        .withColumn("p_benford", element_at(bp, $"digit"))
        .withColumn("p_obs", round($"n_obs".cast("double") /
          $"n_total".cast("double"), 6))
        .withColumn("chi2_contrib", round(
          ($"n_obs".cast("double") -
            $"n_total".cast("double") * $"p_benford") *
          ($"n_obs".cast("double") -
            $"n_total".cast("double") * $"p_benford") /
          ($"n_total".cast("double") * $"p_benford"), 6))
        .select($"digit", $"n_obs", $"n_total", $"p_obs",
          $"p_benford", $"chi2_contrib")
        .orderBy($"digit")
    }),

    // Seasonal-baseline anomaly: each day's revenue per event type
    // against that type's SAME-WEEKDAY mean — the day-of-week-
    // adjusted monitor that doesn't page on every quiet Sunday.
    // Daily sums are exact integer cents (q232's series); the
    // baseline is a 7-row-per-type model joined back broadcast; the
    // ratio divides once in double. weekday() is the cross-engine-
    // safe day index (Spark Monday=0 ≡ DuckDB isodow−1, the q44
    // precedent). Every day rides out with its ratio and flag — the
    // gate thresholds (±30%) are literals, and flagged-only output
    // would be empty on calm data.
    "q239_weekday_anomaly" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("x"))
        .withColumn("wd", weekday($"day"))
      val base = daily.groupBy($"event_type", $"wd")
        .agg((sum($"x".cast("decimal(19,0)")).cast("double") /
          count(lit(1)).cast("double")).as("wd_mean"))
      daily.join(broadcast(base), Seq("event_type", "wd"))
        .withColumn("ratio", round($"x".cast("double") / $"wd_mean", 6))
        .withColumn("is_anomaly",
          ($"ratio" > 1.3 || $"ratio" < 0.7).cast("int"))
        .select($"event_type", $"day", $"x", $"ratio", $"is_anomaly")
        .orderBy($"event_type", $"day")
    }),

    // RFM segmentation — the classic customer-value cube: quintile
    // scores for Recency (days since last order, smaller is better),
    // Frequency (order count) and Monetary (exact cents), segment =
    // the three digits concatenated, reported as a segment census.
    // The quintile thresholds come from ONE interpolated-percentile
    // aggregate (Spark percentile ≡ DuckDB quantile_cont, the q43
    // precedent) riding back as a broadcast 1-row frame — never
    // ntile()'s global single-task window (the GlobalIndex rationale
    // applied to scoring). Scores are comparison sums against the
    // broadcast thresholds: pure scan work after two bounded
    // aggregates.
    "q240_rfm_segments" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.table(s, dir, "orders")
        .select($"o_custkey", $"o_orderdate".cast("date").as("d"),
          floor($"o_totalprice" * lit(100.0)).cast("long").as("cents"))
      val cust = o.groupBy($"o_custkey").agg(
        max($"d").as("last_d"),
        count(lit(1)).as("f"),
        sum($"cents".cast("decimal(19,0)")).cast("long").as("m"))
      val maxd = o.agg(max($"d").as("maxd"))
      val r = cust.crossJoin(broadcast(maxd))
        .withColumn("rec", datediff($"maxd", $"last_d"))
      val th = r.agg(
        expr("percentile(rec, array(0.2, 0.4, 0.6, 0.8))").as("rq"),
        expr("percentile(f, array(0.2, 0.4, 0.6, 0.8))").as("fq"),
        expr("percentile(m, array(0.2, 0.4, 0.6, 0.8))").as("mq"))
      def up(v: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column): org.apache.spark.sql.Column = // bigger is better
        lit(1) + (1 to 4).map(i =>
          when(v > element_at(q, i), 1).otherwise(0)).reduce(_ + _)
      def down(v: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column): org.apache.spark.sql.Column = // smaller is better
        lit(1) + (4 to 1 by -1).map(i =>
          when(v <= element_at(q, i), 1).otherwise(0)).reduce(_ + _)
      r.crossJoin(broadcast(th))
        .withColumn("seg", concat(
          down($"rec".cast("double"), $"rq").cast("string"),
          up($"f".cast("double"), $"fq").cast("string"),
          up($"m".cast("double"), $"mq").cast("string")))
        .groupBy($"seg")
        .agg(count(lit(1)).as("n_customers"),
          sum($"m".cast("decimal(19,0)")).cast("long").as("total_cents"))
        .orderBy($"seg")
    }),

    // Pareto frontier (skyline) per brand: the parts no other part of
    // the brand beats on BOTH price (lower) and size (higher) — the
    // multi-criteria shortlist operator. O(n log n), not the naive
    // all-pairs dominance join: after deduping to distinct
    // (brand, price, size) points, sort each brand by (price asc,
    // size desc) and keep a row iff the running max size over
    // STRICTLY-preceding rows doesn't reach it — a cheaper-or-equal
    // part with ≥ size then implies strict dominance (equal-equal
    // pairs were deduped). The window partitions by brand (dimension
    // cardinality), so no global sort task; price is exact cents.
    "q244_pareto_frontier" -> ((s, dir) => {
      import s.implicits._
      val pts = Tables.table(s, dir, "part")
        .select($"p_brand",
          floor($"p_retailprice" * lit(100.0)).cast("long")
            .as("price_cents"),
          $"p_size")
        .groupBy($"p_brand", $"price_cents", $"p_size")
        .agg(count(lit(1)).as("n_parts"))
      val w = Window.partitionBy($"p_brand")
        .orderBy($"price_cents".asc, $"p_size".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("max_sz_before", max($"p_size").over(w))
        .filter($"max_sz_before".isNull ||
          $"max_sz_before" < $"p_size")
        .select($"p_brand", $"price_cents", $"p_size", $"n_parts")
        .orderBy($"p_brand", $"price_cents")
    }),

    // Growth accounting — the daily new/retained/resurrected/churned
    // decomposition (the "startup growth accounting" identity:
    // active(d) = new + retained + resurrected; churned(d) =
    // active(d−1) − retained(d)). q96's cohort matrix says WHERE
    // retention decays; this says what yesterday's actives did TODAY.
    // All exact integer counts: first-day per user is one hash
    // aggregate, "active yesterday" is a self-equi-join of the
    // (user, day) frame on (user, day−1) — never a window over the
    // full timeline — and churn joins yesterday's 1-row-per-day
    // census back broadcast-size.
    "q248_growth_accounting" -> ((s, dir) => {
      import s.implicits._
      val ud = Tables.table(s, dir, "events")
        .select($"user_id", $"ts".cast("date").as("day"))
        .distinct()
        .localCheckpoint() // 4 consumers below
      val first = ud.groupBy($"user_id").agg(min($"day").as("first_day"))
      // "active yesterday" as an equi-join flag: shift each active day
      // forward one and join on (user, day) — no per-user window
      val yest = ud.select($"user_id", date_add($"day", 1).as("day"))
        .distinct()
        .withColumn("was_yesterday", lit(1))
      val states = ud.join(first, "user_id")
        .join(yest, Seq("user_id", "day"), "left_outer")
        .select($"day",
          when($"day" === $"first_day", "new")
            .when($"was_yesterday".isNotNull, "retained")
            .otherwise("resurrected").as("state"))
        .groupBy($"day").pivot("state", Seq("new", "retained", "resurrected"))
        .agg(count(lit(1)))
        .select($"day",
          coalesce($"new", lit(0L)).as("n_new"),
          coalesce($"retained", lit(0L)).as("n_retained"),
          coalesce($"resurrected", lit(0L)).as("n_resurrected"))
      val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
      val dauPrev = dau.select(date_add($"day", 1).as("day"),
        $"dau".as("dau_prev"))
      states.join(dau, "day")
        .join(dauPrev, Seq("day"), "left_outer")
        .select($"day", $"dau", $"n_new", $"n_retained", $"n_resurrected",
          (coalesce($"dau_prev", lit(0L)) - $"n_retained").as("n_churned"))
        .orderBy($"day")
    }),

    // Sweep-line peak concurrency: how many 5-minute activity
    // intervals overlap at once, per event type — the load-planning
    // operator (max concurrent sessions / connections / jobs). Each
    // event opens [ts, ts+300s); ends sort BEFORE starts at the same
    // instant (half-open). The prefix sum is TWO-LEVEL so no single
    // task ever sorts a type's whole timeline: a within-(type, day)
    // running sum (bounded partitions, default RANGE frame so tied
    // timestamps share one concurrency value — deterministic under
    // any partitioning) plus a per-day offset cumulated over the tiny
    // (type × day) totals frame and joined back broadcast. At 100 TB
    // the day split is the q236 range-exchange discipline: finer
    // buckets (hours) if a day is still too hot, same two frames.
    "q249_peak_concurrency" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events").select($"event_type", $"ts")
      val deltas = ev.select($"event_type", $"ts".as("t"), lit(1).as("d"))
        .union(ev.select($"event_type",
          ($"ts" + expr("INTERVAL 300 SECONDS")).as("t"),
          lit(-1).as("d")))
        .withColumn("day", $"t".cast("date"))
      val wInDay = Window.partitionBy($"event_type", $"day")
        .orderBy($"t", $"d")
      val dayTot = deltas.groupBy($"event_type", $"day")
        .agg(sum($"d").as("day_sum"))
      val wDays = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = dayTot
        .select($"event_type", $"day",
          coalesce(sum($"day_sum").over(wDays), lit(0L)).as("off"))
      val cums = deltas
        .join(broadcast(offsets), Seq("event_type", "day"))
        .select($"event_type", $"t",
          ($"off" + sum($"d").over(wInDay)).as("cum"))
        .localCheckpoint() // two consumers: peak agg + argmax filter
      val peaks = cums.groupBy($"event_type").agg(max($"cum").as("peak"))
      cums.join(broadcast(peaks), "event_type")
        .filter($"cum" === $"peak")
        .groupBy($"event_type")
        .agg(max($"cum").as("peak"), min($"t").as("first_peak_ts"),
          count(lit(1)).as("n_at_peak"))
        .orderBy($"event_type")
    }),

    // Market-basket brand affinity: support and lift for every brand
    // pair co-purchased in one order — the co-occurrence mining
    // operator behind "frequently bought together". Pairs are
    // expanded AT THE ORDER from the sorted distinct-brand set
    // (≤25 brands → ≤300 pairs per order, one shuffle — never an
    // unbounded self-join), marginals and the order total are
    // 25-row/1-row broadcast frames, and lift is one IEEE division
    // of exactly-representable counts (the q230 discipline). The
    // whole plan is one data-sized pass at any scale.
    "q250_basket_lift" -> ((s, dir) => {
      import s.implicits._
      val pb = Tables.table(s, dir, "part")
        .select($"p_partkey", $"p_brand")
      val ob = Tables.table(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey")
        .join(broadcast(pb), $"l_partkey" === $"p_partkey")
        .select($"l_orderkey".as("ok"), $"p_brand".as("brand"))
        .distinct()
        .localCheckpoint() // three consumers: pairs, marginals, total
      val pairs = ob.groupBy($"ok")
        .agg(sort_array(collect_set($"brand")).as("bs"))
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
               transform(slice(bs, i + 2, size(bs)), y ->
                 struct(x AS a, y AS b))))""")).as("p"))
        .select($"p.a", $"p.b")
      val nOrders = broadcast(
        ob.select($"ok").distinct().agg(count(lit(1)).as("n_orders")))
      val single = ob.groupBy($"brand").agg(count(lit(1)).as("n1"))
      pairs.groupBy($"a", $"b").agg(count(lit(1)).as("n_ab"))
        .join(broadcast(single.toDF("a", "n_a")), "a")
        .join(broadcast(single.toDF("b", "n_b")), "b")
        .crossJoin(nOrders) // 1-row broadcast total
        .filter($"n_ab" >= 20)
        .select($"a".as("brand_a"), $"b".as("brand_b"),
          $"n_ab", $"n_a", $"n_b",
          round(($"n_ab".cast("double") * $"n_orders".cast("double")) /
            ($"n_a".cast("double") * $"n_b".cast("double")), 6).as("lift"))
        .orderBy($"lift".desc, $"brand_a", $"brand_b")
        .limit(25)
    }),

    // Two-proportion z-test — the experiment-readout operator: users
    // are deterministically split into two arms by the portable
    // salted hash (the assignment an A/B platform persists; replayed
    // bit-exactly by the oracle), conversion = "has a purchase above
    // 150" (~46% base rate — every user purchases SOMETHING, so bare
    // purchase would be degenerate p = 1), and the pooled-variance z
    // statistic decides
    // significance. Per-user state folds in ONE partial-aggregable
    // pass (groupBy user → conditional-sum agg to a single row); the
    // closed form is the q230 Wilson discipline — every operand an
    // exactly-representable count, every op IEEE-correctly-rounded,
    // identical expression tree in both engines.
    "q252_ab_ztest" -> ((s, dir) => {
      import s.implicits._
      val u = Tables.table(s, dir, "events")
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase" && $"value" > 150.0, 1)
          .otherwise(0)).as("conv"))
        .select((graft.text.TextFunctions.hash60(
          concat($"user_id".cast("string"), lit("_ab"))) % 2).as("arm"),
          $"conv")
      val t = u.agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"arm" === 0, $"conv".cast("long")).otherwise(0L))
          .as("conv_a"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when($"arm" === 1, $"conv".cast("long")).otherwise(0L))
          .as("conv_b"))
      val (na, ca, nb, cb) = ($"n_a".cast("double"),
        $"conv_a".cast("double"), $"n_b".cast("double"),
        $"conv_b".cast("double"))
      val p = (ca + cb) / (na + nb)
      val z = (ca / na - cb / nb) /
        sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb))
      t.select($"n_a", $"conv_a", $"n_b", $"conv_b",
        round(ca / na, 6).as("rate_a"), round(cb / nb, 6).as("rate_b"),
        round(z, 4).as("z"), (abs(z) > 1.96).as("significant"))
    }),

    // Equi-depth histogram — the value-distribution summary a query
    // optimizer or data-quality dashboard keeps per column: 8 buckets
    // of (near-)equal population over o_totalprice, boundaries being
    // ACTUAL data values selected by exact rank. Ranks come from
    // GlobalIndex.withGlobalSeq (range exchange + per-partition
    // numbering — never a single-task global window); the 7 selected
    // boundary rows are the only thing collected (a bounded model, as
    // IVF centroids), and the census re-scans the checkpointed sorted
    // frame once with a broadcast boundary array. Bucket rule: 1 +
    // #(boundaries < v), so ties at a boundary land deterministically
    // in the lower bucket on both engines.
    "q253_equidepth_hist" -> ((s, dir) => {
      import s.implicits._
      val seqd = graft.operators.GlobalIndex.withGlobalSeq(
        Tables.table(s, dir, "orders")
          .select($"o_totalprice".as("v"), $"o_orderkey"),
        Seq($"v", $"o_orderkey"))
      val n = seqd.count()
      val ranks = (1 to 7).map(k => (n * k + 7) / 8)
      val bounds = seqd.filter($"global_seq".isin(ranks: _*))
        .select($"v").as[Double].collect().sorted.toSeq
      seqd.select($"v",
          (lit(1) + bounds.map(b => when($"v" > b, 1).otherwise(0))
            .reduce(_ + _)).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_rows"), min($"v").as("lo"),
          max($"v").as("hi"), dsum($"v").as("total"))
        .orderBy($"bucket")
    }),

    // Linear multi-touch attribution — q188's last-touch fold with
    // the credit SPREAD equally over every strictly-prior non-purchase
    // event in the 1-day lookback (the other standard attribution
    // model; purchases with no prior touch credit 'direct'). The four
    // per-type counts are conditional sums over ONE per-user RANGE
    // window on the micros axis (user timelines are bounded — no
    // global window), and each touch's share is floor(1e6·cnt/n) ppm
    // in pure long division, so credit is integer-exact and the
    // floor-remainder ≤ 3 ppm per purchase is the only loss
    // (conservation pinned in CensusOpsSpec).
    "q255_linear_attribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-86400000000L, -1L)
      def c(t: String) = coalesce(
        sum(when($"event_type" === t, 1L).otherwise(0L)).over(w), lit(0L))
      val pur = Tables.table(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        .withColumn("c_click", c("click"))
        .withColumn("c_view", c("view"))
        .withColumn("c_signup", c("signup"))
        .withColumn("c_error", c("error"))
        .filter($"event_type" === "purchase")
        .withColumn("n", $"c_click" + $"c_view" + $"c_signup" + $"c_error")
      def leg(t: String) = struct(lit(t).as("touch"),
        expr(s"CASE WHEN n > 0 THEN (1000000 * c_$t) div n " +
          "ELSE CAST(0 AS BIGINT) END").as("credit"))
      val direct = struct(lit("direct").as("touch"),
        when($"n" === 0L, 1000000L).otherwise(0L).as("credit"))
      pur.select(explode(array(leg("click"), leg("view"),
          leg("signup"), leg("error"), direct)).as("x"))
        .select($"x.touch", $"x.credit")
        .filter($"credit" > 0L)
        .groupBy($"touch")
        .agg(count(lit(1)).as("n_purchases"),
          sum($"credit").as("credit_ppm"))
        .orderBy($"touch")
    }),

    // CUSUM changepoint screen — "did this series shift level, and
    // when?": per event type, the cumulative sum of deviations of
    // daily revenue cents from the type mean, argmax |C_t| = the
    // classic changepoint estimate. Deviations are scaled by n_days
    // (C'_t = n·prefix_t − t·S) so everything stays EXACT integer
    // arithmetic in DECIMAL — no float mean, no drift; the one double
    // appears at render time. Day frames are ~hundreds of rows per
    // type (the per-type window is bounded); the argmax reuses the
    // q249 broadcast-peak shape.
    "q257_cusum_changepoint" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("x"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val tot = daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"), sum($"x").as("s_tot"))
      val cum = daily
        .withColumn("pref", sum($"x").over(w))
        .withColumn("t", row_number().over(w))
        .join(broadcast(tot), "event_type")
        .select($"event_type", $"day", $"n_days",
          ($"n_days".cast("decimal(38,0)") * $"pref".cast("decimal(38,0)")
            - $"t".cast("decimal(38,0)") * $"s_tot".cast("decimal(38,0)"))
            .as("c"))
        .localCheckpoint() // two consumers: peak agg + argmax filter
      val peaks = cum.groupBy($"event_type")
        .agg(max(abs($"c")).as("c_abs_max"))
      cum.join(broadcast(peaks), "event_type")
        .filter(abs($"c") === $"c_abs_max")
        .groupBy($"event_type")
        .agg(max($"n_days").as("n_days"), min($"day").as("cp_day"),
          max($"c_abs_max").as("cmax"),
          min(signum($"c").cast("int")).as("shift_sign"))
        .select($"event_type", $"n_days", $"cp_day",
          round($"cmax".cast("double") /
            ($"n_days".cast("double") * lit(100.0)), 4)
            .as("max_dev_dollar_days"),
          $"shift_sign")
        .orderBy($"event_type")
    }),

    // Inter-arrival screen — the arrival-process profile a capacity
    // planner reads: per event type, the distribution of per-user
    // gaps between consecutive events (one lag over bounded
    // (user, type) timelines — no global window), the
    // method-of-moments exponential rate (λ = 1/mean), and a coarse
    // gap census (<1 min / <1 h / <1 d / ≥1 d) as conditional sums in
    // the same aggregate. Gap micros sum exactly as longs; the two
    // doubles are one division each at render time.
    "q259_interarrival" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"us")
      val gaps = Tables.table(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        .withColumn("gap", $"us" - lag($"us", 1).over(w))
        .filter($"gap".isNotNull)
      gaps.groupBy($"event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum($"gap").as("sum_us"),
          sum(when($"gap" < 60000000L, 1L).otherwise(0L)).as("n_lt_1m"),
          sum(when($"gap" >= 60000000L && $"gap" < 3600000000L, 1L)
            .otherwise(0L)).as("n_lt_1h"),
          sum(when($"gap" >= 3600000000L && $"gap" < 86400000000L, 1L)
            .otherwise(0L)).as("n_lt_1d"),
          sum(when($"gap" >= 86400000000L, 1L).otherwise(0L))
            .as("n_ge_1d"))
        .select($"event_type", $"n_gaps",
          round($"sum_us".cast("double") /
            ($"n_gaps".cast("double") * lit(1000000.0)), 3)
            .as("mean_gap_sec"),
          round($"n_gaps".cast("double") * lit(3600000000.0) /
            $"sum_us".cast("double"), 4).as("rate_per_hour"),
          $"n_lt_1m", $"n_lt_1h", $"n_lt_1d", $"n_ge_1d")
        .orderBy($"event_type")
    }),

    // OLS trend line per event type — least-squares slope/intercept/r²
    // of daily revenue (exact cents) against the day index, the
    // trend-detection primitive behind every "is this metric growing"
    // dashboard. The five moments (n, Σt, Σy, Σty, Σt², Σy²) are
    // EXACT integer DECIMALs from one aggregate over the bounded
    // per-type daily frame; slope/intercept/r² are each ONE IEEE
    // division of exact operands at render time (the q230/q257
    // discipline), so DuckDB replays them bit-for-bit. Two shuffles
    // total (daily rollup + per-type moments); no global window —
    // the day index is a per-type row_number over ≤n_days rows.
    "q262_ols_trend" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val d38 = "decimal(38,0)"
      val m = daily
        .withColumn("t", row_number().over(w).cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).cast(d38).as("n"),
          sum($"t").cast(d38).as("st"),
          sum($"y").cast(d38).as("sy"),
          sum($"t" * $"y").cast(d38).as("sty"),
          sum($"t" * $"t").cast(d38).as("stt"),
          sum($"y".cast(d38) * $"y".cast(d38)).as("syy"))
      val covN = ($"n" * $"sty" - $"st" * $"sy").as("cov_n")
      val varTn = ($"n" * $"stt" - $"st" * $"st").as("var_t_n")
      val varYn = ($"n" * $"syy" - $"sy" * $"sy").as("var_y_n")
      m.select($"event_type", $"n", covN, varTn, varYn,
          // intercept numerator n·(Σy·Σt² − Σt·Σty) stays exact:
          // Σy·Σt² − Σt·Σty = (Σy·varTn − Σt·covN)/n, so scale by n
          ($"sy" * $"stt" - $"st" * $"sty").as("ic_n"))
        .select($"event_type", $"n".cast("long").as("n_days"),
          round($"cov_n".cast("double") / $"var_t_n".cast("double"), 4)
            .as("slope_cents_per_day"),
          round($"ic_n".cast("double") / $"var_t_n".cast("double"), 4)
            .as("intercept_cents"),
          round(($"cov_n".cast("double") * $"cov_n".cast("double")) /
            ($"var_t_n".cast("double") * $"var_y_n".cast("double")), 6)
            .as("r2"))
        .orderBy($"event_type")
    }),

    // Kaplan-Meier churn curve — the product-limit survival estimator
    // over customer order lifetimes, with RIGHT CENSORING done
    // properly: a customer whose last order falls inside the final
    // 90 days is still alive (observation time = study end − first
    // order), everyone else churned at their last order. Lifetimes
    // land in 180-day buckets, so the step table is a BOUNDED model
    // frame (≤ span/180 ≈ 14 rows at any data scale — the q253
    // collect-the-boundaries move); the data-sized work is one
    // per-customer min/max aggregate. The survival recurrence
    // S_k = ⌊S_{k−1}·(n_k−d_k)/n_k⌋ runs in EXACT integer
    // parts-per-billion (no float product chain), so the DuckDB
    // oracle replays it step for step with WITH RECURSIVE.
    "q263_kaplan_meier" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.table(s, dir, "orders")
        .select($"o_custkey", $"o_orderdate".cast("date").as("d"))
      val dmax = ord.agg(max($"d").as("dmax"))
      val steps = ord.groupBy($"o_custkey")
        .agg(min($"d").as("first"), max($"d").as("last"))
        .crossJoin(broadcast(dmax)) // 1-row study-end frame
        .select($"first", $"last",
          ($"last" > date_sub($"dmax", 90)).as("censored"), $"dmax")
        .select($"censored",
          when($"censored", datediff($"dmax", $"first"))
            .otherwise(datediff($"last", $"first")).as("td"))
        .groupBy(floor($"td" / 180).cast("long").as("bucket"))
        .agg(sum(when(!$"censored", 1L).otherwise(0L)).as("d"),
          sum(when($"censored", 1L).otherwise(0L)).as("c"))
        .orderBy($"bucket")
        .collect() // bounded: one row per 180-day bucket of the span
      val total = steps.map(r => r.getLong(1) + r.getLong(2)).sum
      var atRisk = total
      var sPpb = 1000000000L
      val out = steps.toSeq.map { r =>
        val (b, d, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val n = atRisk
        sPpb = sPpb * (n - d) / n // exact integer floor recurrence
        atRisk -= d + c
        (b, b * 180L, n, d, c, sPpb)
      }
      s.createDataFrame(out)
        .toDF("bucket", "t_days", "n_risk", "d_churn", "c_censored",
          "surv_ppb")
        .orderBy($"bucket")
    }),

    // Simple-exponential-smoothing forecast (α = 1/2) — one-step-ahead
    // daily-revenue prediction per event type, the classic smoother
    // made EXACT: with a dyadic α the truncated weight series
    // 1/2, 1/4, …, 2⁻¹³, 2⁻¹³ sums to exactly 1, so the forecast
    // ×8192 is a PURE INTEGER combination Σ 2^(13−i)·y_(t−i) + y_(t−14)
    // of cents — no float recurrence, no libm, and the DuckDB oracle
    // replays every row bit-for-bit. The 14 lags ride ONE bounded
    // per-type day window (the q257 shape, never a global window);
    // at any data scale the state is 14 numbers per key — the same
    // footprint an incremental streaming smoother would carry.
    "q265_ses_forecast" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val lagged = (1 to 14).foldLeft(daily) { (df, i) =>
        df.withColumn(s"l$i", lag($"y", i).over(w))
      }
      val f8192 = ((1 to 13).map(i => col(s"l$i") * lit(1L << (13 - i)))
        .reduce(_ + _) + col("l14")).as("f8192")
      lagged.filter($"l14".isNotNull)
        .select($"event_type", $"day", $"y".as("actual_cents"), f8192)
        .withColumn("forecast_cents", expr("f8192 DIV 8192"))
        .withColumn("err_cents", $"actual_cents" - $"forecast_cents")
        .orderBy($"event_type", $"day")
    }),

    // Mann-Kendall trend test — the NONPARAMETRIC companion to q262's
    // OLS: S = Σ_{i<j} sign(y_j − y_i) over each type's daily series,
    // immune to outliers and monotone transforms. The pair frame is
    // bounded per type (the daily rollup is calendar-bounded at any
    // data scale — n·(n−1)/2 ≈ 1.8k pairs for a 60-day window), so
    // the self-join never explodes; S and the tie-corrected variance
    // numerator 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) are EXACT
    // integers, and z touches IEEE only in the final
    // (S∓1)/sqrt(var/18) — sqrt is correctly rounded by IEEE 754, so
    // DuckDB replays the double bit-for-bit.
    "q267_mann_kendall" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .localCheckpoint() // feeds pairs twice + ties once
      val a = daily.select($"event_type", $"day".as("d1"), $"y".as("y1"))
      val b = daily.select($"event_type".as("et2"), $"day".as("d2"),
        $"y".as("y2"))
      val sStat = a.join(b, $"event_type" === $"et2" && $"d1" < $"d2")
        .groupBy($"event_type")
        .agg(sum(signum($"y2" - $"y1").cast("long")).as("s_stat"))
      val ties = daily.groupBy($"event_type", $"y")
        .agg(count(lit(1)).as("t"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_vals"), sum($"t").as("n"),
          sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tie_adj"))
      sStat.join(ties, "event_type")
        .select($"event_type", $"n".as("n_days"), $"s_stat",
          ($"n" * ($"n" - 1L) * (lit(2L) * $"n" + 5L) - $"tie_adj")
            .as("var_s18"))
        .withColumn("z", round(
          when($"s_stat" > 0, ($"s_stat" - 1L).cast("double"))
            .when($"s_stat" < 0, ($"s_stat" + 1L).cast("double"))
            .otherwise(lit(0.0)) /
            sqrt($"var_s18".cast("double") / lit(18.0)), 6))
        .orderBy($"event_type")
    }),

    // Theil-Sen robust slope — the median of all pairwise slopes
    // (y_j − y_i)/(t_j − t_i), the 29%-breakdown-point estimator next
    // to q267's test and q262's OLS fit. Slopes are quantized to
    // EXACT integer micro-cents/day via BIGINT DIV (the q264 move),
    // the median is exact rank selection over the bounded per-type
    // pair frame (row_number on ~1.8k rows per type — never a
    // data-sized window), and even-count medians ship as lo/hi/sum
    // integers plus one IEEE division, so DuckDB replays every row.
    "q268_theil_sen" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val idx = daily.withColumn("t", row_number().over(w).cast("long"))
        .localCheckpoint() // self-joined below
      val a = idx.select($"event_type", $"t".as("t1"), $"y".as("y1"))
      val b = idx.select($"event_type".as("et2"), $"t".as("t2"),
        $"y".as("y2"))
      val slopes = a.join(b, $"event_type" === $"et2" && $"t1" < $"t2")
        .select($"event_type",
          expr("(y2 - y1) * 1000000 DIV (t2 - t1)").as("su"))
      val ws = Window.partitionBy($"event_type").orderBy($"su")
      val ranked = slopes
        .withColumn("r", row_number().over(ws).cast("long"))
      val m = slopes.groupBy($"event_type")
        .agg(count(lit(1)).as("m"))
      ranked.join(broadcast(m), "event_type")
        .filter($"r" === expr("(m + 1) DIV 2") ||
          $"r" === expr("(m + 2) DIV 2"))
        .groupBy($"event_type")
        .agg(max($"m").as("n_pairs"), min($"su").as("lo_ucents"),
          max($"su").as("hi_ucents"))
        .withColumn("slope_cents_per_day", round(
          ($"lo_ucents" + $"hi_ucents").cast("double") / lit(2000000.0),
          4))
        .orderBy($"event_type")
    }),

    // Lead-lag cross-correlation screen — does click revenue LEAD
    // purchase revenue? Pearson r between the two daily series at
    // every offset in ±7 days, the causal-direction scan a growth
    // analyst runs before claiming attribution. The lag dimension is
    // an exploded 15-literal array (never 15 scans — ONE pass builds
    // the daily frame, one equijoin per the shifted key matches the
    // series), moments are exact integer DECIMALs per lag, and r
    // touches IEEE only as covN/(sqrt(varXn)·sqrt(varYn)) of exact
    // operands — both engines compute the same three roots and two
    // products. |r| peaking at a nonzero lag is the lead signal.
    "q269_leadlag_corr" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .localCheckpoint()
      val clicks = daily.filter($"event_type" === "click")
        .select($"day", $"y".as("x"))
      val purch = daily.filter($"event_type" === "purchase")
        .select($"day".as("pday"), $"y".as("py"))
      val lags = clicks
        .select($"day", $"x",
          explode(array((-7 to 7).map(l => lit(l)): _*)).as("lg"))
        .withColumn("mday", date_add($"day", $"lg"))
      val d38 = "decimal(38,0)"
      val mom = lags.join(purch, $"mday" === $"pday")
        .groupBy($"lg")
        .agg(count(lit(1)).cast(d38).as("n"),
          sum($"x").cast(d38).as("sx"), sum($"py").cast(d38).as("sy"),
          sum($"x".cast(d38) * $"py".cast(d38)).as("sxy"),
          sum($"x".cast(d38) * $"x".cast(d38)).as("sxx"),
          sum($"py".cast(d38) * $"py".cast(d38)).as("syy"))
      mom.select($"lg".as("lag_days"), $"n".cast("long").as("n_days"),
          ($"n" * $"sxy" - $"sx" * $"sy").as("cov_n"),
          ($"n" * $"sxx" - $"sx" * $"sx").as("var_x_n"),
          ($"n" * $"syy" - $"sy" * $"sy").as("var_y_n"))
        .select($"lag_days", $"n_days",
          round($"cov_n".cast("double") /
            (sqrt($"var_x_n".cast("double")) *
              sqrt($"var_y_n".cast("double"))), 6).as("r"))
        .orderBy($"lag_days")
    }),

    // Deterministic k-means (Lloyd, k=4, 3 unrolled rounds) over
    // customer (total spend, avg order value) in exact cents — the
    // workhorse clustering operator made ENGINE-EXACT: init is the 4
    // lowest-custkey points, assignment is integer squared distance
    // with ties to the lower centroid id, and centroid updates are
    // BIGINT DIV means (empty cluster keeps its centroid), so every
    // round is bit-deterministic and the DuckDB oracle unrolls the
    // same 3 rounds as chained CTEs. The per-round collect is the
    // k-row model frame (the IVF/q253 move — at 100 TB assignment
    // stays a stateless broadcast-literal expression over one scan;
    // k·rounds tiny frames never touch a shuffle).
    "q270_kmeans_lloyd" -> ((s, dir) => {
      import s.implicits._
      val pts = Tables.table(s, dir, "orders")
        .groupBy($"o_custkey".as("pid"))
        .agg(sum(floor($"o_totalprice" * lit(100.0)).cast("long"))
          .as("x"), count(lit(1)).as("n"))
        .withColumn("y", expr("x DIV n"))
        .select($"pid", $"x", $"y")
        .localCheckpoint() // scanned once per round
      var cents: Seq[(Int, Long, Long)] = pts.orderBy($"pid").limit(4)
        .collect().toSeq.zipWithIndex
        .map { case (r, i) => (i + 1, r.getLong(1), r.getLong(2)) }
      def assignCol = {
        val ds = cents.map { case (cid, cx, cy) =>
          struct((($"x" - lit(cx)) * ($"x" - lit(cx)) +
            ($"y" - lit(cy)) * ($"y" - lit(cy))).as("d"),
            lit(cid).as("c"))
        }
        least(ds: _*).getField("c").as("cid")
      }
      for (_ <- 1 to 3) {
        val upd = pts.select($"x", $"y", assignCol)
          .groupBy($"cid")
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
            sum($"y").as("sy"))
          .collect().map(r => r.getInt(0) ->
            (r.getLong(2) / r.getLong(1), r.getLong(3) / r.getLong(1)))
          .toMap
        cents = cents.map { case (cid, cx, cy) =>
          upd.get(cid).map { case (nx, ny) => (cid, nx, ny) }
            .getOrElse((cid, cx, cy))
        }
      }
      val cdf = cents.toDF("cid", "cx_cents", "cy_cents")
      pts.select($"x", $"y", assignCol)
        .withColumn("sqd", {
          val d = cents.map { case (cid, cx, cy) =>
            when($"cid" === cid, ($"x" - lit(cx)) * ($"x" - lit(cx)) +
              ($"y" - lit(cy)) * ($"y" - lit(cy)))
          }
          coalesce(d: _*)
        })
        .groupBy($"cid")
        .agg(count(lit(1)).as("n_points"),
          sum(expr("sqd DIV 10000")).as("wcss_sqdollars"))
        .join(broadcast(cdf), "cid")
        .select($"cid", $"n_points", $"cx_cents", $"cy_cents",
          $"wcss_sqdollars")
        .orderBy($"cid")
    }),

    // Poisson-bootstrap confidence interval for the mean order value
    // — the bootstrap that actually DISTRIBUTES: instead of resampling
    // n rows with replacement (impossible without a global draw),
    // each of 32 replicates weights every row by an independent
    // Poisson(1) multiplicity (Chamandy et al., Google 2012),
    // decided by the PORTABLE salted hash over (orderkey, replicate)
    // so the DuckDB oracle replays the exact draws. One explode ×32 +
    // one 32-group aggregate; replicate means are single IEEE
    // divisions of exact integer sums; the CI is exact rank selection
    // over the 32-row replicate frame (min/max at B=32 ≈ the 2.5/97.5
    // band), and the bootstrap SE touches IEEE only in the final
    // sqrt of exact-moment operands.
    "q271_poisson_bootstrap" -> ((s, dir) => {
      import s.implicits._
      val cuts = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
        999406L)
      val base = Tables.table(s, dir, "orders")
        .select($"o_orderkey",
          floor($"o_totalprice" * lit(100.0)).cast("long").as("v"))
      val rep = base
        .select($"o_orderkey", $"v",
          explode(array((1 to 32).map(lit): _*)).as("b"))
        .withColumn("u", graft.text.TextFunctions.hash60(
          concat($"o_orderkey".cast("string"), lit("_bs"),
            $"b".cast("string"))) % 1000000L)
        .withColumn("mult",
          cuts.zipWithIndex.foldRight(lit(6L)) { case ((c, k), e) =>
            when($"u" < c, k.toLong).otherwise(e)
          })
        .groupBy($"b")
        .agg(sum($"mult" * $"v").as("sv"), sum($"mult").as("sn"))
        .select(($"sv".cast("double") / $"sn".cast("double"))
          .as("mean_b"))
      val point = base.agg(
        (sum($"v").cast("double") / count(lit(1)).cast("double"))
          .as("mean_hat"))
      rep.agg(count(lit(1)).as("n_reps"),
          round(min($"mean_b"), 4).as("ci_lo_cents"),
          round(max($"mean_b"), 4).as("ci_hi_cents"),
          round(sqrt((Q.dsumAt($"mean_b" * $"mean_b", 4) -
            Q.dsumAt($"mean_b", 4) * Q.dsumAt($"mean_b", 4) /
              count(lit(1)).cast("double")) /
            (count(lit(1)).cast("double") - 1.0)), 4).as("se_cents"))
        .crossJoin(point) // 1-row frames
        .select($"n_reps", round($"mean_hat", 4).as("mean_cents"),
          $"ci_lo_cents", $"ci_hi_cents", $"se_cents")
    }),

    // Time-weighted average value (TWAP) — the right daily mean for a
    // SAMPLED-WHEN-IT-CHANGES signal: each event's value holds until
    // the next event of that type, so it's weighted by its holding
    // time in micros (last event holds to end of day, UTC). One lead()
    // over bounded (type, day) timelines; Σ(cents·micros) is an exact
    // integer DECIMAL (no float accumulation), TWAP is one IEEE
    // division per group, and the arithmetic-mean companion rides
    // in-row to show WHERE time weighting matters.
    "q272_twap_daily" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select($"event_type", $"ts".cast("date").as("day"),
          unix_micros($"ts").as("us"),
          floor($"value" * lit(100.0)).cast("long").as("cents"))
      val w = Window.partitionBy($"event_type", $"day").orderBy($"us")
      val eod = unix_micros(date_add($"day", 1).cast("timestamp"))
      val d38 = "decimal(38,0)"
      ev.withColumn("hold", coalesce(lead($"us", 1).over(w), eod) - $"us")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"hold").cast(d38).as("sw"),
          sum($"cents".cast(d38) * $"hold".cast(d38)).as("swv"),
          sum($"cents").cast(d38).as("sv"))
        .select($"event_type", $"n_events",
          round($"swv".cast("double") /
            ($"sw".cast("double") * lit(100.0)), 4).as("twap_dollars"),
          round($"sv".cast("double") /
            ($"n_events".cast("double") * lit(100.0)), 4)
            .as("mean_dollars"))
        .orderBy($"event_type")
    }),

    // Trimmed + winsorized mean of order value — the robust-location
    // pair every metrics pipeline needs once heavy tails appear:
    // drop (trim) or clamp (winsorize) the outer 5% by EXACT global
    // rank. Rank comes from GlobalIndex.withGlobalSeq (range exchange
    // + per-partition offsets — never a single-task global window);
    // the two clamp boundaries are the rank-(k+1) and rank-(n−k) rows
    // (a 2-row collect); all three means are single IEEE divisions of
    // exact integer-cent sums, so DuckDB replays every digit.
    "q273_trimmed_mean" -> ((s, dir) => {
      import s.implicits._
      val seqd = graft.operators.GlobalIndex.withGlobalSeq(
        Tables.table(s, dir, "orders")
          .select(floor($"o_totalprice" * lit(100.0)).cast("long")
            .as("cents"), $"o_orderkey"),
        Seq($"cents", $"o_orderkey"))
        .localCheckpoint() // 3 consumers below
      val n = seqd.count()
      val k = n * 5 / 100
      val bounds = seqd
        .filter($"global_seq" === (k + 1) || $"global_seq" === (n - k))
        .select($"global_seq", $"cents").as[(Long, Long)]
        .collect().sortBy(_._1).map(_._2) // 2-row boundary frame
      val (loB, hiB) = (bounds.head, bounds.last)
      seqd.agg(
          count(lit(1)).as("n_rows"),
          sum(when($"global_seq" > k && $"global_seq" <= n - k,
            $"cents").otherwise(0L)).as("s_trim"),
          sum(when($"global_seq" > k && $"global_seq" <= n - k, 1L)
            .otherwise(0L)).as("n_trim"),
          sum(when($"global_seq" <= k, lit(loB))
            .when($"global_seq" > n - k, lit(hiB))
            .otherwise($"cents")).as("s_wins"),
          sum($"cents").as("s_raw"))
        .select($"n_rows", lit(k).as("k_trimmed_each_side"),
          lit(loB).as("lo_clamp_cents"), lit(hiB).as("hi_clamp_cents"),
          round($"s_trim".cast("double") /
            ($"n_trim".cast("double") * lit(100.0)), 4)
            .as("trimmed_mean_dollars"),
          round($"s_wins".cast("double") /
            ($"n_rows".cast("double") * lit(100.0)), 4)
            .as("winsor_mean_dollars"),
          round($"s_raw".cast("double") /
            ($"n_rows".cast("double") * lit(100.0)), 4)
            .as("raw_mean_dollars"))
    }),

    // Trend + weekday decomposition — the "STL-lite" additive model
    // y = trend + weekday + residual a seasonality-aware monitor
    // fits, in PURE INTEGER arithmetic: the trend line is q262's OLS
    // fit kept as an exact rational (fit·10⁶ = (ic_n + cov_n·t)·10⁶
    // DIV var_t_n — numerators in DECIMAL(38,0), one integral
    // divide), the weekday effect is the per-(type, weekday) mean of
    // the detrended series as a micro-cents DIV (a 7-row-per-type
    // model joined back broadcast, the q239 shape), and the residual
    // is a subtraction. weekday() is the cross-engine-safe Monday=0
    // index (≡ DuckDB isodow−1). No float ever appears, so every row
    // replays bit-for-bit.
    "q279_seasonal_decomp" -> ((s, dir) =>
      decomposed(s, dir)
        .selectExpr("event_type", "day", "wd", "y AS actual_cents",
          "trend_ucents", "weekday_ucents",
          "d_u - weekday_ucents AS resid_ucents")
        .orderBy(col("event_type"), col("day"))),

    // Pairwise correlation matrix of the five per-type daily revenue
    // series — q269's lead-lag generalized to every same-day type
    // pair: one pivot to a (day × 5) frame (a single hash aggregate
    // with conditional sums — never 5 scans), then exact integer
    // DECIMAL moments per pair over the bounded pair set, Pearson r
    // as one IEEE expression of exact operands. Missing days count as
    // zero revenue (the pivot's semantic), which is the right reading
    // for an arrival stream.
    "q280_corr_matrix" -> ((s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val daily = Tables.table(s, dir, "events")
        .groupBy($"ts".cast("date").as("day"))
        .pivot("event_type", types)
        .agg(sum(floor($"value" * lit(100.0)).cast("long")))
        .select($"day" +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .localCheckpoint() // all 10 pair aggregates scan it once each
      val d38 = "decimal(38,0)"
      val pairs = for {
        i <- types.indices; j <- i + 1 until types.length
      } yield (types(i), types(j))
      pairs.map { case (a, b) =>
        daily.agg(count(lit(1)).cast(d38).as("n"),
            sum(col(a)).cast(d38).as("sx"),
            sum(col(b)).cast(d38).as("sy"),
            sum(col(a).cast(d38) * col(b).cast(d38)).as("sxy"),
            sum(col(a).cast(d38) * col(a).cast(d38)).as("sxx"),
            sum(col(b).cast(d38) * col(b).cast(d38)).as("syy"))
          .select(lit(a).as("type_a"), lit(b).as("type_b"),
            $"n".cast("long").as("n_days"),
            round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
                sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))),
              6).as("r"))
      }.reduce(_ union _).orderBy($"type_a", $"type_b")
    }),

    // Distribution drift monitor — first-week vs last-week value
    // distribution per event type, the input-drift gate a model
    // pipeline runs before trusting fresh data: total-variation
    // distance and a χ² drift score over 8 fixed value buckets,
    // both in EXACT integer arithmetic (TV as
    // ⌊10⁶·Σ|n_i·M − m_i·N| / (2·N·M)⌋, χ² per bucket as a
    // DECIMAL-numerator integral divide with +1 Laplace smoothing on
    // the reference so empty buckets never divide by zero). The
    // window bounds ride as a broadcast 1-row frame; the census is
    // one conditional-sum aggregate — a single data pass at any
    // scale.
    "q281_dist_drift" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .select($"event_type", $"ts".cast("date").as("day"),
          least(lit(7), floor($"value" / lit(62.5)).cast("int"))
            .as("bucket"))
      val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
      val cens = ev.crossJoin(broadcast(span))
        .select($"event_type", $"bucket",
          when(datediff($"day", $"d0") < 7, 1L).otherwise(0L).as("rf"),
          when(datediff($"d1", $"day") < 7, 1L).otherwise(0L).as("cu"))
        .groupBy($"event_type", $"bucket")
        .agg(sum($"rf").as("n"), sum($"cu").as("m"))
        .withColumn("n1", $"n" + 1L) // Laplace on the reference
      val tot = cens.groupBy($"event_type")
        .agg(sum($"n1").as("nn"), sum($"m").as("mm"))
      cens.join(broadcast(tot), "event_type")
        .select($"event_type", $"n1", $"m", $"nn", $"mm",
          abs($"n1" * $"mm" - $"m" * $"nn").as("dv"))
        .withColumn("chi_u",
          expr("CAST((m * nn - n1 * mm) AS DECIMAL(38,0))" +
            " * (m * nn - n1 * mm) * 1000000" +
            " DIV (CAST(mm AS DECIMAL(38,0)) * n1 * nn)"))
        .groupBy($"event_type")
        .agg(max($"nn").as("n_ref"), max($"mm").as("n_cur"),
          expr("sum(dv) * 1000000 DIV (2 * max(nn) * max(mm))")
            .as("tv_ppm"),
          sum($"chi_u").as("chi2_micro"))
        .orderBy($"event_type")
    }),

    // UNPIVOT round-trip — Spark's relational melt (SQL UNPIVOT,
    // 3.4+) driven through actual SQL text: the q37 per-day pivot is
    // folded back to long form, pinning that pivot∘unpivot ≡ the
    // plain GROUP BY census (the oracle runs the census directly).
    // The unpivot itself is a generator projection — scan-parallel,
    // no exchange beyond the pivot's own aggregate.
    "q282_unpivot_melt" -> ((s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.table(s, dir, "events")
        .groupBy($"ts".cast("date").as("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select($"day" +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .createOrReplaceTempView("graft_q282_pivoted")
      s.sql(s"""
        SELECT day, event_type, n_events
        FROM graft_q282_pivoted
        UNPIVOT (n_events FOR event_type IN (${types.mkString(", ")}))
        ORDER BY day, event_type""")
    }),

    // Binary-segmentation changepoints — q257's CUSUM applied
    // HIERARCHICALLY (Scott–Knott / binary segmentation): level 1
    // finds each type's global changepoint, level 2 re-runs the same
    // exact-integer CUSUM inside the two resulting segments. The
    // recursion is just a second window pass partitioned by
    // (type, segment) — same bounded per-type day frames, same
    // DECIMAL deviation n'·P'_t − t'·S' (telescoping to zero at each
    // segment end), same broadcast-peak argmax; no new machinery and
    // no float anywhere except the dollar rendering.
    "q284_binary_segmentation" -> ((s, dir) => {
      import s.implicits._
      val d38 = "decimal(38,0)"
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("x"))
        .localCheckpoint()
      // one CUSUM level over an arbitrary partitioning
      def level(df: org.apache.spark.sql.DataFrame,
          parts: Seq[String]): org.apache.spark.sql.DataFrame = {
        val pcols = parts.map(col)
        val w = Window.partitionBy(pcols: _*).orderBy($"day")
        val tot = df.groupBy(pcols: _*)
          .agg(count(lit(1)).as("n_days"), sum($"x").as("s_tot"))
        val cum = df
          .withColumn("pref", sum($"x").over(w))
          .withColumn("t", row_number().over(w))
          .join(broadcast(tot), parts)
          .select(pcols :+ $"day" :+ $"n_days" :+
            (($"n_days".cast(d38) * $"pref".cast(d38)
              - $"t".cast(d38) * $"s_tot".cast(d38)).as("c")): _*)
          .localCheckpoint()
        val peaks = cum.groupBy(pcols: _*)
          .agg(max(abs($"c")).as("c_abs_max"))
        cum.join(broadcast(peaks), parts)
          .filter(abs($"c") === $"c_abs_max")
          .groupBy(pcols: _*)
          .agg(max($"n_days").as("n_days"), min($"day").as("cp_day"),
            max($"c_abs_max").as("cmax"))
      }
      // r15: the level-1 CUSUM pass was computed TWICE (once for the
      // split point, once for the "all" output row) — one checkpointed
      // pass (≤ #event_type rows) now feeds both. Same rows.
      val lAll = level(daily, Seq("event_type")).localCheckpoint()
      val l1 = lAll.select($"event_type", $"cp_day".as("cp1"))
      val seg = daily.join(broadcast(l1), "event_type")
        .withColumn("segment",
          when($"day" <= $"cp1", "pre").otherwise("post"))
      val l2 = level(seg, Seq("event_type", "segment"))
      val out1 = lAll
        .withColumn("segment", lit("all"))
      (out1.select($"event_type", $"segment", $"n_days", $"cp_day",
          round($"cmax".cast("double") /
            ($"n_days".cast("double") * lit(100.0)), 4)
            .as("max_dev_dollar_days"))
        union
        l2.select($"event_type", $"segment", $"n_days", $"cp_day",
          round($"cmax".cast("double") /
            ($"n_days".cast("double") * lit(100.0)), 4)
            .as("max_dev_dollar_days")))
        .orderBy($"event_type", $"segment")
    }),

    // Log₂ latency histogram (the HdrHistogram shape) — per-type
    // inter-arrival gaps bucketed by ⌊log₂(micros)⌋, the constant-
    // size latency profile an SLO monitor keeps per key: exponential
    // buckets cover nine decades in ~47 rows where a linear histogram
    // needs millions. The bucket index is EXACT — a generated
    // power-of-two threshold CASE (never libm log2, whose result at a
    // boundary value could round either way); gaps come from one lag
    // over bounded (user, type) timelines; per-bucket min/max/sum
    // micros are exact longs. The census is partial-aggregable — at
    // 100 TB each executor ships ≤47 rows per type.
    "q285_log2_histogram" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"us")
      val gaps = Tables.table(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        .withColumn("gap", $"us" - lag($"us", 1).over(w))
        .filter($"gap".isNotNull && $"gap" > 0)
      // ⌊log₂⌋ as a threshold chain: highest k with 2^k ≤ gap — the
      // ascending fold leaves the LARGEST threshold outermost
      val b = (1 to 46).foldLeft(lit(0)) { (e, k) =>
        when($"gap" >= lit(1L << k), lit(k)).otherwise(e)
      }
      gaps.withColumn("bucket", b)
        .groupBy($"event_type", $"bucket")
        .agg(count(lit(1)).as("n_gaps"), min($"gap").as("min_us"),
          max($"gap").as("max_us"), sum($"gap").as("sum_us"))
        .orderBy($"event_type", $"bucket")
    }),

    // Two-sample Kolmogorov–Smirnov test — does click value follow
    // the same distribution as purchase value? D = max|F₁−F₂| as an
    // EXACT integer: group both samples by distinct value (the only
    // data-sized pass), then GlobalIndex.withGlobalCumSum runs each
    // ECDF as a range exchange + per-partition offsets — never a
    // single-task global window — and the sup-gap |ca·n₂ − cb·n₁| is
    // pure BIGINT. The asymptotic λ = D·√(n₁n₂/(n₁+n₂)) touches IEEE
    // once at render. The distribution-free drift companion to
    // q281's binned TV/χ².
    "q286_ks_test" -> ((s, dir) => {
      import s.implicits._
      val g = Tables.table(s, dir, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_type",
          floor($"value" * lit(100.0)).cast("long").as("v"))
        .groupBy($"v")
        .agg(sum(when($"event_type" === "click", 1L).otherwise(0L))
          .as("ac"),
          sum(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("bc"))
      val c1 = graft.operators.GlobalIndex.withGlobalCumSum(
        g, Seq($"v"), $"ac", sumCol = "ca", seqCol = "sq1")
      val cum = graft.operators.GlobalIndex.withGlobalCumSum(
        c1, Seq($"v"), $"bc", sumCol = "cb", seqCol = "sq2")
      val tot = g.agg(sum($"ac").as("n1"), sum($"bc").as("n2"))
      cum.crossJoin(broadcast(tot)) // 1-row totals frame
        .select($"n1", $"n2",
          abs($"ca" * $"n2" - $"cb" * $"n1").as("gap"))
        .groupBy($"n1", $"n2")
        .agg(max($"gap").as("d_num"))
        .select($"n1", $"n2",
          expr("d_num * 1000000 DIV (n1 * n2)").as("d_ppm"),
          round(($"d_num".cast("double") /
            ($"n1".cast("double") * $"n2".cast("double"))) *
            sqrt(($"n1" * $"n2").cast("double") /
              ($"n1" + $"n2").cast("double")), 6).as("lambda"))
    }),

    // Wald–Wolfowitz runs test on q279's residuals — IS the
    // decomposition's leftover actually random? Count sign runs in
    // each type's residual sequence (one lag over the bounded
    // per-type day frame), compare to the exact expected-runs model:
    // z = (R·N − 2n₊n₋ − N) / √(2n₊n₋(2n₊n₋−N)/(N−1)) — integer
    // operands, IEEE once. Too FEW runs = leftover structure (the
    // decomposition missed a component); too many = oscillation.
    "q287_runs_test" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val seq = decomposed(s, dir)
        .select($"event_type", $"day",
          when($"d_u" - $"weekday_ucents" >= 0, 1L).otherwise(0L)
            .as("s"))
        .withColumn("brk",
          when(lag($"s", 1).over(w).isNull ||
            lag($"s", 1).over(w) =!= $"s", 1L).otherwise(0L))
      seq.groupBy($"event_type")
        .agg(sum($"brk").as("runs"), sum($"s").as("n_pos"),
          sum(lit(1L) - $"s").as("n_neg"))
        .select($"event_type", $"runs", $"n_pos", $"n_neg",
          round(($"runs" * ($"n_pos" + $"n_neg") -
            lit(2L) * $"n_pos" * $"n_neg" - ($"n_pos" + $"n_neg"))
            .cast("double") /
            sqrt((lit(2L) * $"n_pos" * $"n_neg" *
              (lit(2L) * $"n_pos" * $"n_neg" - $"n_pos" - $"n_neg"))
              .cast("double") /
              ($"n_pos" + $"n_neg" - 1L).cast("double")), 6).as("z"))
        .orderBy($"event_type")
    }),

    // Neyman allocation — the variance-optimal survey design the
    // proportional stratified sample (q153 family) leaves on the
    // table: allocate a 1000-row budget to strata ∝ N_h·σ_h. Because
    // N_h·σ_h = √(N_h·Σx² − (Σx)²) the weight is ONE sqrt of an
    // exact DECIMAL scatter numerator per stratum; weights sum
    // through dsumAt (decimal — order-independent across the 5
    // strata), and the proportional companion rides in-row as an
    // exact DIV so the table shows exactly where Neyman shifts
    // budget toward high-variance strata. One data pass.
    "q288_neyman_allocation" -> ((s, dir) => {
      import s.implicits._
      val d38 = "decimal(38,0)"
      val st = Tables.table(s, dir, "events")
        .select($"event_type",
          floor($"value" * lit(100.0)).cast("long").as("x"))
        .groupBy($"event_type")
        .agg(count(lit(1)).cast(d38).as("nh"),
          sum($"x").cast(d38).as("sx"),
          sum($"x".cast(d38) * $"x".cast(d38)).as("sxx"))
        .select($"event_type", $"nh".cast("long").as("n_h"),
          sqrt(($"nh" * $"sxx" - $"sx" * $"sx").cast("double"))
            .as("w"))
        .localCheckpoint() // 5-row strata model, joined to its total
      val tot = st.agg(Q.dsumAt($"w", 4).as("wsum"),
        sum($"n_h").as("n"))
      st.crossJoin(broadcast(tot)) // 5 × 1-row
        .select($"event_type", $"n_h",
          round($"w" / $"n_h".cast("double") / lit(100.0), 4)
            .as("sigma_dollars"),
          floor(lit(1000.0) * $"w" / $"wsum").cast("long")
            .as("neyman_n"),
          expr("1000 * n_h DIV n").as("prop_n"))
        .orderBy($"event_type")
    }),

    // Difference-in-differences — the experiment readout when
    // treatment lands mid-stream: arms from q252's portable salted
    // hash, periods split at the stream midpoint (a broadcast 1-row
    // bound), per-(arm, period) mean purchase value from exact cent
    // sums, DiD = (B₁−B₀) − (A₁−A₀) composed from the four means in
    // one fixed IEEE expression. ONE conditional-sum aggregate is the
    // whole data pass; the oracle replays arm assignment, split, and
    // the arithmetic bit-for-bit.
    "q289_diff_in_diff" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select(
          (graft.text.TextFunctions.hash60(
            concat($"user_id".cast("string"), lit("_ab"))) % 2)
            .as("arm"),
          unix_micros($"ts").as("us"),
          floor($"value" * lit(100.0)).cast("long").as("v"))
      val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid"))
      val cells = ev.crossJoin(broadcast(mid))
        .withColumn("post", ($"us" >= $"mid").cast("int"))
        .groupBy($"arm", $"post")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
        .select($"arm", $"post", $"n",
          ($"sv".cast("double") / $"n".cast("double")).as("mean_c"))
        .localCheckpoint() // 4-row cell frame
      val get = (a: Int, p: Int) => cells
        .filter($"arm" === a && $"post" === p)
        .select($"n".as(s"n_$a$p"), $"mean_c".as(s"m_$a$p"))
      get(0, 0).crossJoin(get(0, 1)).crossJoin(get(1, 0))
        .crossJoin(get(1, 1)) // 1-row × 1-row chains
        .select($"n_00", $"n_01", $"n_10", $"n_11",
          round($"m_00" / 100.0, 4).as("a_pre_dollars"),
          round($"m_01" / 100.0, 4).as("a_post_dollars"),
          round($"m_10" / 100.0, 4).as("b_pre_dollars"),
          round($"m_11" / 100.0, 4).as("b_post_dollars"),
          round((($"m_11" - $"m_10") - ($"m_01" - $"m_00")) / 100.0,
            4).as("did_dollars"))
    }),

    // Split-conformal prediction interval for the q265 forecaster —
    // the distribution-free uncertainty band modern forecast evals
    // ship: calibrate on the first half of forecastable days (q̂ =
    // the ⌈0.9·(n+1)⌉-th smallest |error| by EXACT rank over the
    // bounded per-type day frame), then measure empirical coverage
    // of ±q̂ on the held-out second half — integer cents throughout,
    // coverage as an exact ppm DIV. If the residuals are exchangeable
    // the guarantee says coverage ≳ 90%; the table shows it.
    "q291_conformal_forecast" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val lagged = (1 to 14).foldLeft(daily) { (df, i) =>
        df.withColumn(s"l$i", lag($"y", i).over(w))
      }
      val f8192 = (1 to 13).map(i => col(s"l$i") * lit(1L << (13 - i)))
        .reduce(_ + _) + col("l14")
      val errs = lagged.filter($"l14".isNotNull)
        .withColumn("f8192", f8192) // non-negative: DIV == floor
        .select($"event_type", $"day",
          expr("abs(y - f8192 DIV 8192)").as("aerr"))
        .withColumn("i", row_number().over(w))
        .localCheckpoint() // split + rank + coverage share it
      val n = errs.groupBy($"event_type")
        .agg(count(lit(1)).as("nf"))
        .withColumn("n_cal", expr("nf DIV 2"))
      val cal = errs.join(broadcast(n), "event_type")
        .filter($"i" <= $"n_cal")
      val wr = Window.partitionBy($"event_type").orderBy($"aerr", $"day")
      val qhat = cal.withColumn("r", row_number().over(wr))
        .filter($"r" === expr("CAST(ceil((n_cal + 1) * 0.9) AS INT)")
          || ($"r" === $"n_cal" &&
            expr("ceil((n_cal + 1) * 0.9)") > $"n_cal"))
        .groupBy($"event_type").agg(min($"aerr").as("q90_cents"))
      errs.join(broadcast(n), "event_type")
        .filter($"i" > $"n_cal")
        .join(broadcast(qhat), "event_type")
        .groupBy($"event_type")
        .agg(max($"n_cal").as("n_cal"), count(lit(1)).as("n_test"),
          max($"q90_cents").as("q90_cents"),
          expr("sum(CASE WHEN aerr <= q90_cents THEN 1 ELSE 0 END)" +
            " * 1000000 DIV count(1)").as("coverage_ppm"))
        .orderBy($"event_type")
    }),

    // Quadratic trend fit — y = a + b·t + c·t² per type by EXACT
    // Cramér's rule on the 3×3 normal equations: the six power sums
    // Σt⁰..Σt⁴ and three cross-moments Σy, Σty, Σt²y are exact
    // DECIMAL(38,0) integers from one aggregate, every 3×3
    // determinant expands exactly in DECIMAL (entries ≤10⁸, dets
    // ≤10³⁰ — headroom pinned by the calendar-bounded day index),
    // and the three coefficients are single IEEE divisions. The
    // CURVATURE sign answers what q262's line can't: is growth
    // accelerating or saturating?
    "q294_quadratic_trend" -> ((s, dir) => {
      import s.implicits._
      val d38 = "decimal(38,0)"
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val m = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .withColumn("t", row_number().over(w).cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).cast(d38).as("s0"),
          sum($"t").cast(d38).as("s1"),
          sum($"t" * $"t").cast(d38).as("s2"),
          sum($"t" * $"t" * $"t").cast(d38).as("s3"),
          sum($"t" * $"t" * $"t" * $"t").cast(d38).as("s4"),
          sum($"y").cast(d38).as("b0"),
          sum($"t" * $"y").cast(d38).as("b1"),
          sum($"t".cast(d38) * $"t".cast(d38) * $"y".cast(d38))
            .as("b2"))
      type C = org.apache.spark.sql.Column
      def det3(a: C, b: C, c: C, d: C, e: C, f: C,
          g: C, h: C, i: C): C =
        a * (e * i - f * h) - b * (d * i - f * g) +
          c * (d * h - e * g)
      val dd = det3($"s0", $"s1", $"s2", $"s1", $"s2", $"s3",
        $"s2", $"s3", $"s4")
      val da = det3($"b0", $"s1", $"s2", $"b1", $"s2", $"s3",
        $"b2", $"s3", $"s4")
      val db = det3($"s0", $"b0", $"s2", $"s1", $"b1", $"s3",
        $"s2", $"b2", $"s4")
      val dc = det3($"s0", $"s1", $"b0", $"s1", $"s2", $"b1",
        $"s2", $"s3", $"b2")
      m.select($"event_type", $"s0".cast("long").as("n_days"),
          round(da.cast("double") / dd.cast("double") / 100.0, 4)
            .as("a_dollars"),
          round(db.cast("double") / dd.cast("double") / 100.0, 4)
            .as("b_dollars_per_day"),
          round(dc.cast("double") / dd.cast("double") / 100.0, 6)
            .as("c_dollars_per_day2"))
        .orderBy($"event_type")
    }),

    // Rolling 14-day OLS slope — the LOCAL trend signal per day (the
    // "rolling beta" of a monitoring dashboard): all five regression
    // moments ride ONE bounded 14-row sliding window per type (exact
    // long sums — day index and cents are integers), the slope is
    // q262's closed form per row, one IEEE division each. Days with
    // a short history emit their partial-window fit (n < 14 rides
    // out with the row, so the reader can mask the warm-up).
    "q295_rolling_slope" -> ((s, dir) => {
      import s.implicits._
      val wSeq = Window.partitionBy($"event_type").orderBy($"day")
      val roll = Window.partitionBy($"event_type").orderBy($"t")
        .rowsBetween(-13, 0)
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .withColumn("t", row_number().over(wSeq).cast("long"))
      daily
        .withColumn("n", count(lit(1)).over(roll))
        .withColumn("st", sum($"t").over(roll))
        .withColumn("sy", sum($"y").over(roll))
        .withColumn("sty", sum($"t" * $"y").over(roll))
        .withColumn("stt", sum($"t" * $"t").over(roll))
        .select($"event_type", $"day", $"n".as("n_window"),
          $"y".as("actual_cents"),
          round(($"n" * $"sty" - $"st" * $"sy").cast("double") /
            ($"n" * $"stt" - $"st" * $"st").cast("double"), 4)
            .as("slope_cents_per_day"))
        .filter($"n_window" >= 2) // slope undefined on 1 point
        .orderBy($"event_type", $"day")
    }),

    // Hysteresis (two-threshold) alerting — the debounced monitor
    // real alerting uses so a metric hovering AT one threshold
    // doesn't flap: ALERT arms when daily revenue exceeds 120% of the
    // type's mean and disarms only below 80%. The state machine is
    // relational: each day emits its crossing signal (arm/disarm/
    // hold-as-null) and the armed state is last(signal IGNORE NULLS)
    // over the bounded per-type day window — no sequential fold, no
    // UDF, and DuckDB replays it with the same IGNORE NULLS frame.
    // Thresholds are exact integer comparisons (5·y vs 6·mean·n
    // cross-multiplied — no division), so arming replays exactly.
    "q297_hysteresis_alerts" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      val tot = daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"y").as("sy"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val sig = daily.join(broadcast(tot), "event_type")
        // y > 1.2·mean  ⇔  5·y·n > 6·sy   (exact integers)
        .withColumn("crossing",
          when($"y" * 5L * $"n" > $"sy" * 6L, lit(1))
            .when($"y" * 5L * $"n" < $"sy" * 4L, lit(0))
            .otherwise(lit(null).cast("int")))
        .withColumn("armed",
          coalesce(last($"crossing", ignoreNulls = true).over(w),
            lit(0)))
      val wo = Window.partitionBy($"event_type").orderBy($"day")
      sig.withColumn("prev", lag($"armed", 1, 0).over(wo))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          sum($"armed".cast("long")).as("days_armed"),
          sum(when($"armed" > $"prev", 1L).otherwise(0L))
            .as("n_alerts_fired"),
          min(when($"armed" === 1, $"day")).as("first_alert_day"))
        .orderBy($"event_type")
    }),

    // Top-k + OTHERS rollup — the report shape every BI page ends
    // with: the five highest-revenue customers as rows, everything
    // else collapsed into one OTHERS line so the table still sums to
    // the total. Top-5 is a TakeOrderedAndProject (never a global
    // sort); OTHERS = broadcast total − Σtop5, both exact cents, so
    // the invariant Σrows = total is arithmetic, not hope.
    "q298_topk_others" -> ((s, dir) => {
      import s.implicits._
      val per = Tables.table(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(sum(floor($"o_totalprice" * lit(100.0)).cast("long"))
          .as("cents"), count(lit(1)).as("n_orders"))
        .localCheckpoint() // top-5 leg + total leg
      val top = per.orderBy($"cents".desc, $"o_custkey").limit(5)
        .select($"o_custkey".cast("string").as("customer"),
          $"n_orders", $"cents")
      val tot = per.agg(sum($"cents").as("t_cents"),
        sum($"n_orders").as("t_orders"), count(lit(1)).as("t_cust"))
      val topSum = top.agg(sum($"cents").as("k_cents"),
        sum($"n_orders").as("k_orders"), count(lit(1)).as("k_cust"))
      val others = tot.crossJoin(topSum) // 1-row × 1-row
        .select(lit("OTHERS").as("customer"),
          ($"t_orders" - $"k_orders").as("n_orders"),
          ($"t_cents" - $"k_cents").as("cents"))
      top.union(others)
        .select($"customer", $"n_orders",
          round($"cents".cast("double") / 100.0, 2).as("dollars"))
        .orderBy($"dollars".desc, $"customer")
    }),

    // Weighted median — the "typical price per UNIT SOLD" (each line
    // weighted by its quantity), which answers a different question
    // than q273's row-median: smallest price v with cumulative
    // quantity ≥ half the total. The cumulative weight runs through
    // GlobalIndex.withGlobalCumSum (range exchange + per-partition
    // offsets — never a single-task window); the qualifying-row pick
    // is min(struct(seq, v)) over the filtered frame (exact integer
    // comparison 2·cum ≥ W), and the UNWEIGHTED median companion
    // reads the same pass's row index — one exchange for both.
    "q299_weighted_median" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.table(s, dir, "lineitem")
        .select(floor($"l_extendedprice" * lit(100.0)).cast("long")
          .as("v"), $"l_quantity".cast("long").as("q"),
          $"l_orderkey", $"l_linenumber")
      val cum = graft.operators.GlobalIndex.withGlobalCumSum(
        li, Seq($"v", $"l_orderkey", $"l_linenumber"), $"q")
        .localCheckpoint() // totals + two median picks share it
      val tot = cum.agg(count(lit(1)).as("n_rows"),
        sum($"q").as("w_total"))
      val wMed = cum.crossJoin(broadcast(tot))
        .filter($"global_csum" * 2L >= $"w_total")
        .agg(min(struct($"global_seq", $"v")).as("m"))
        .select($"m.v".as("w_median_cents"))
      val uMed = cum.crossJoin(broadcast(tot))
        .filter($"global_seq" * 2L >= $"n_rows")
        .agg(min(struct($"global_seq", $"v")).as("m"))
        .select($"m.v".as("u_median_cents"))
      tot.crossJoin(wMed).crossJoin(uMed) // 1-row frames
        .select($"n_rows", $"w_total".as("total_qty"),
          round($"w_median_cents".cast("double") / 100.0, 2)
            .as("weighted_median_dollars"),
          round($"u_median_cents".cast("double") / 100.0, 2)
            .as("unweighted_median_dollars"))
    }),

    // Pipeline-health one-pager — the capstone composition: one
    // (metric, value) table a data-platform on-call reads first,
    // each row produced by machinery verified elsewhere in the
    // registry: table volumes, referential orphans (the q111 check),
    // near-dup burden (q75's closure), worst distribution drift
    // (q281's TV), alert pressure (q297's hysteresis count), and the
    // hottest join key's salt factor (q283). Every leg is a 1-row
    // integer aggregate; the union is a 7-row frame. One query to
    // demo the engine end-to-end.
    "q300_pipeline_health" -> ((s, dir) => {
      import s.implicits._
      def metric(name: String, v: org.apache.spark.sql.Column,
          df: org.apache.spark.sql.DataFrame) =
        df.agg(v.cast("long").as("value"))
          .select(lit(name).as("metric"), $"value")
      val orders = Tables.table(s, dir, "orders")
      val events = Tables.table(s, dir, "events")
      val rows = metric("rows_orders", count(lit(1)), orders)
        .union(metric("rows_events", count(lit(1)), events))
      val orphans = metric("orphan_lineitems", count(lit(1)),
        Tables.table(s, dir, "lineitem").join(orders,
          $"l_orderkey" === $"o_orderkey", "left_anti"))
      val dups = graft.dedup.ConnectedComponents.nearDupClusters(
        Tables.table(s, dir, "documents"), "doc_id", "text", 0.9)
      val dupRemoved = metric("neardup_docs_removable",
        count(lit(1)) - countDistinct($"cluster_id"), dups)
      val drift = metric("max_drift_tv_ppm", max($"tv_ppm"),
        queries("q281_dist_drift")(s, dir))
      val alerts = metric("alerts_fired", sum($"n_alerts_fired"),
        queries("q297_hysteresis_alerts")(s, dir))
      val salt = metric("max_salt_factor", max($"salt_factor"),
        graft.queries.OpsQueries.queries("q283_skew_advisor")(s, dir))
      Seq(rows, orphans, dupRemoved, drift, alerts, salt)
        .reduce(_ union _).orderBy($"metric")
    }),

    // Uplift by spend decile — the heterogeneous-treatment-effect
    // table an experimenter reads after q252's flat z-test: users
    // bucketed by pre-assignment spend decile (thresholds from ONE
    // percentile aggregate broadcast back — the q240 move, never a
    // global ntile window), arms by the portable salted hash, and
    // per decile the conversion-rate LIFT between arms in exact ppm
    // (two conditional sums, integer cross-multiplication). Where
    // the lift concentrates tells you WHO the treatment moves.
    "q306_uplift_deciles" -> ((s, dir) => {
      import s.implicits._
      val users = Tables.table(s, dir, "events")
        .groupBy($"user_id")
        .agg(sum(floor($"value" * lit(100.0)).cast("long"))
          .as("spend"),
          max(when($"event_type" === "purchase" && $"value" > 150.0,
            1L).otherwise(0L)).as("conv"))
        .select($"user_id", $"spend", $"conv",
          (graft.text.TextFunctions.hash60(
            concat($"user_id".cast("string"), lit("_ab"))) % 2)
            .as("arm"))
        .localCheckpoint() // thresholds + scoring share it
      val qCols = (1 to 4).map(k =>
        expr(s"percentile(spend, ${k * 0.2})").as(s"q$k"))
      val qs = users.agg(qCols.head, qCols.tail: _*)
      users.crossJoin(broadcast(qs)) // 1-row threshold model
        .withColumn("decile",
          when($"spend" <= $"q1", 1).when($"spend" <= $"q2", 2)
            .when($"spend" <= $"q3", 3).when($"spend" <= $"q4", 4)
            .otherwise(5))
        .groupBy($"decile")
        .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"arm" === 0, $"conv").otherwise(0L)).as("c_a"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when($"arm" === 1, $"conv").otherwise(0L)).as("c_b"))
        .select($"decile", $"n_a", $"c_a", $"n_b", $"c_b",
          expr("c_a * 1000000 DIV n_a").as("rate_a_ppm"),
          expr("c_b * 1000000 DIV n_b").as("rate_b_ppm"),
          expr("c_b * 1000000 DIV n_b - c_a * 1000000 DIV n_a")
            .as("uplift_ppm"))
        .orderBy($"decile")
    }),

    // MASE forecast skill — the scale-free forecast eval (Hyndman &
    // Koehler 2006): the q265 smoother's MAE divided by the
    // seasonal-naive (lag-7) baseline's MAE on the same days. Both
    // error sums are EXACT integers from the same one-window pass
    // (the SES forecast is the exact ⌊f/8192⌋ integer, the naive is
    // a lag), so the only IEEE op is the final ratio — MASE < 1
    // means the smoother beats "same day last week".
    "q307_mase_forecast_skill" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val lagged = (1 to 14).foldLeft(daily) { (df, i) =>
        df.withColumn(s"l$i", lag($"y", i).over(w))
      }
      val f8192 = (1 to 13).map(i => col(s"l$i") * lit(1L << (13 - i)))
        .reduce(_ + _) + col("l14")
      lagged.filter($"l14".isNotNull)
        .withColumn("f8192", f8192)
        .select($"event_type",
          expr("abs(y - f8192 DIV 8192)").as("e_model"),
          abs($"y" - $"l7").as("e_naive"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          sum($"e_model").as("sae_model"),
          sum($"e_naive").as("sae_naive"))
        .select($"event_type", $"n_days",
          round($"sae_model".cast("double") /
            ($"n_days".cast("double") * lit(100.0)), 4)
            .as("mae_model_dollars"),
          round($"sae_naive".cast("double") /
            ($"n_days".cast("double") * lit(100.0)), 4)
            .as("mae_naive_dollars"),
          round($"sae_model".cast("double") /
            $"sae_naive".cast("double"), 6).as("mase"))
        .orderBy($"event_type")
    }),

    // Gap-fill linear interpolation — the timeseries fill() operator
    // (InfluxDB/TimescaleDB class), SELF-EVALUATING: 20% of each
    // type's days are deterministically hidden (portable salted
    // hash, so the oracle replays the holes), the neighbors are
    // recovered with last/first(IGNORE NULLS) windows over the
    // bounded per-type day frame, the fill is EXACT integer
    // micro-cents ⌊(prev·(nd−d) + next·(d−pd))·10⁶ / (nd−pd)⌋, and
    // because the hidden truth is known, per-type MAE of the
    // interpolation rides out in-row — the fill operator and its
    // accuracy report in one pass.
    "q305_gapfill_interpolation" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .withColumn("hidden",
          graft.text.TextFunctions.hash60(
            concat($"event_type", lit("_gap"),
              $"day".cast("string"))) % 5L === 0L)
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val before = w.rowsBetween(Window.unboundedPreceding, -1)
      val after = w.rowsBetween(1, Window.unboundedFollowing)
      val obs = when(!$"hidden", $"y")
      val obsDay = when(!$"hidden", $"day")
      val filled = daily
        .withColumn("pv", last(obs, ignoreNulls = true).over(before))
        .withColumn("pd", last(obsDay, ignoreNulls = true)
          .over(before))
        .withColumn("nv", first(obs, ignoreNulls = true).over(after))
        .withColumn("nd", first(obsDay, ignoreNulls = true)
          .over(after))
        .filter($"hidden" && $"pv".isNotNull && $"nv".isNotNull)
        .select($"event_type", $"y",
          expr("(pv * (datediff(nd, day)) + nv * (datediff(day, pd)))" +
            " * 1000000 DIV datediff(nd, pd)").as("fill_u"))
      filled.groupBy($"event_type")
        .agg(count(lit(1)).as("n_filled"),
          sum(abs($"fill_u" - $"y" * 1000000L)).as("sae_u"))
        .select($"event_type", $"n_filled",
          round($"sae_u".cast("double") /
            ($"n_filled".cast("double") * lit(100000000.0)), 4)
            .as("mae_dollars"))
        .orderBy($"event_type")
    }),

    // Overdispersion census (Fano factor / index of dispersion) — IS
    // daily event arrival Poisson? The assumption q271's Poisson
    // bootstrap and q256's Poisson sampler lean on, finally TESTED:
    // per event type, variance/mean of the daily counts, with the
    // χ²-style dispersion statistic (n−1)·F whose expectation under
    // Poisson is n−1. Exact integer moments via the q262 decimal
    // discipline (n·Σx² − (Σx)² never re-enters 64-bit); F and the
    // verdict margin are single IEEE renders. One daily census + one
    // 5-group aggregate — nothing data-sized after the first pass.
    "q324_dispersion_index" -> ((s, dir) => {
      import s.implicits._
      val d38 = "decimal(38,0)"
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      daily.groupBy($"event_type")
        .agg(count(lit(1)).cast(d38).as("n"),
          sum($"x").cast(d38).as("sx"),
          sum($"x".cast(d38) * $"x".cast(d38)).as("sxx"))
        .select($"event_type", $"n".cast("long").as("n_days"),
          ($"sx".cast("double") / $"n".cast("double")).as("mean_daily"),
          // F = [(n·Σx² − (Σx)²)/(n·(n−1))] / (Σx/n)
          //   = (n·Σx² − (Σx)²) / ((n−1)·Σx), one division chain
          (($"n" * $"sxx" - $"sx" * $"sx").cast("double") /
            (($"n" - 1).cast("double") * $"sx".cast("double")))
            .as("fano"),
          // overdispersed iff the dispersion statistic (n−1)·F
          // exceeds n−1 by more than 50% — an exact integer-side
          // comparison: n·Σx² − (Σx)² > 1.5·(n−1)·Σx rendered as
          // 2·(n·Σx² − (Σx)²) > 3·(n−1)·Σx (all decimal-exact)
          (($"n" * $"sxx" - $"sx" * $"sx") * 2 >
            ($"n" - 1) * $"sx" * 3).as("overdispersed"))
        .orderBy($"event_type")
    }),

    // k-anonymity / l-diversity census (Sweeney 2002; Machanavajjhala
    // et al. 2007) — the PRIVACY-side release gate the governance pack
    // (PII masking q06, decontamination, retention) lacked: before a
    // dataset leaves the lake, every row must hide in an equivalence
    // class of ≥ k rows over its QUASI-IDENTIFIERS, and each class
    // must carry ≥ l distinct values of the SENSITIVE attribute (else
    // membership in the class leaks it). Quasi-identifiers here:
    // (nation, market segment, account-balance decile — a coarse bin,
    // exactly how releases generalize a continuous column); sensitive:
    // the order priority mix of the customer's orders (via one
    // semi-aggregate). ONE hash aggregate over the classes + a
    // bounded census rollup — the same partial-aggregable scale shape
    // as any GROUP BY; at 100 TB the class table is ≪ rows (that is
    // the point of generalization). Output: per k-risk band, how many
    // classes/rows, and the census booleans a release gate checks.
    "q327_k_anonymity" -> ((s, dir) => {
      import s.implicits._
      val k = 5L
      val l = 2L
      val cust = Tables.table(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
          // decile bin of the balance: floor((bal+1000)/1200) — a
          // FIXED generalization grid (data-independent, so the
          // class key is stable release to release)
          floor(($"c_acctbal" + lit(1000.0)) / lit(1200.0))
            .cast("long").as("bal_bin"))
      // sensitive attribute: the customer's dominant order priority
      val sens = Tables.table(s, dir, "orders")
        .groupBy($"o_custkey", $"o_orderpriority")
        .agg(count(lit(1)).as("c"))
        .groupBy($"o_custkey")
        .agg(max(struct($"c", $"o_orderpriority")).as("m"))
        .select($"o_custkey".as("c_custkey"),
          $"m.o_orderpriority".as("priority"))
      val classes = cust.join(sens, Seq("c_custkey"), "left")
        .groupBy($"c_nationkey", $"c_mktsegment", $"bal_bin")
        .agg(count(lit(1)).as("class_size"),
          countDistinct(coalesce($"priority", lit("NONE")))
            .as("l_div"))
      classes
        .groupBy(when($"class_size" >= k, lit("ok_k"))
          .otherwise(lit("at_risk_k")).as("k_band"))
        .agg(count(lit(1)).as("n_classes"),
          sum($"class_size").as("n_rows"),
          min($"class_size").as("min_class_size"),
          max($"class_size").as("max_class_size"),
          sum(when($"l_div" < l, 1L).otherwise(0L))
            .as("n_low_diversity_classes"),
          sum(when($"l_div" < l, $"class_size").otherwise(0L))
            .as("n_low_diversity_rows"))
        .orderBy($"k_band")
    }),

    // Gaps-and-islands activity streaks — the classic consecutive-run
    // operator the 40+ window queries never exercised: a user's
    // longest run of CONSECUTIVE active days. The island trick makes
    // it one per-user window pass: for each distinct (user, day),
    // day − row_number() is CONSTANT within a consecutive run and
    // distinct across runs — no self-join, no recursion; then two
    // bounded aggregates (per-island length, per-user max) and a
    // global histogram. Every window is keyed by user (15k+ keys at
    // sf0.01, millions at scale — one shuffle, parallel everywhere);
    // the histogram is ≤ max-streak rows. The operator behind
    // engagement streaks, sensor-uptime runs, and SLA window audits.
    "q328_activity_streaks" -> ((s, dir) => {
      import s.implicits._
      val days = Tables.table(s, dir, "events")
        .select($"user_id", $"ts".cast("date").as("day"))
        .distinct()
      val w = Window.partitionBy($"user_id").orderBy($"day")
      val streaks = days
        .withColumn("island",
          date_sub($"day", row_number().over(w)))
        .groupBy($"user_id", $"island")
        .agg(count(lit(1)).as("len"))
        .groupBy($"user_id")
        .agg(max($"len").as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum($"len").as("n_active_days"))
      streaks.groupBy($"longest_streak")
        .agg(count(lit(1)).as("n_users"),
          min($"user_id").as("min_user"),
          sum($"n_streaks").as("sum_streaks"),
          sum($"n_active_days").as("sum_active_days"))
        .orderBy($"longest_streak")
    }),

    // Temporal training-label assembly — the leakage-free example
    // builder every churn/propensity model needs: at each observation
    // cut, features come ONLY from the past window [cut−28d, cut) and
    // the label ONLY from the future window [cut, cut+28d) — the
    // point-in-time hygiene that q164's split audit checks, here as
    // the CONSTRUCTIVE operator. Two cuts derive from the global span
    // (a 1-row frame exploded to a 2-row spine — broadcast); per
    // (cut, user) one aggregate computes past activity and the
    // future-purchase label in the same pass via windowed conditional
    // sums; the output census shows the class balance and the
    // feature-by-label separation in exact ppm.
    "q323_temporal_labels" -> ((s, dir) => {
      import s.implicits._
      val d28 = 28L * 86400L * 1000000L
      val ev = Tables.table(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("us"), $"event_type")
      val cuts = ev.agg(min($"us").as("lo"), max($"us").as("hi"))
        .select(explode(sequence(lit(1L), lit(2L))).as("cut_i"),
          $"lo", $"hi")
        .select($"cut_i",
          expr("lo + (hi - lo) * cut_i DIV 3").as("cut_us"))
      val labeled = ev.crossJoin(broadcast(cuts)) // 2-row spine
        .filter($"us" >= $"cut_us" - d28 && $"us" < $"cut_us" + d28)
        .groupBy($"cut_i", $"user_id")
        .agg(
          sum(when($"us" < $"cut_us", 1L).otherwise(0L)).as("n_past"),
          sum(when($"us" < $"cut_us" &&
            $"event_type" === "purchase", 1L).otherwise(0L))
            .as("past_purchases"),
          max(when($"us" >= $"cut_us" &&
            $"event_type" === "purchase", 1L).otherwise(0L))
            .as("label"))
        .filter($"n_past" > 0L) // observable at the cut
      labeled.groupBy($"cut_i", $"label")
        .agg(count(lit(1)).as("n_users"),
          sum($"n_past").as("sum_past_events"),
          sum($"past_purchases").as("sum_past_purchases"))
        .select($"cut_i", $"label", $"n_users", $"sum_past_events",
          $"sum_past_purchases",
          expr("sum_past_events * 1000000 DIV n_users")
            .as("events_per_user_ppm"),
          expr("sum_past_purchases * 1000000 DIV n_users")
            .as("purchases_per_user_ppm"))
        .orderBy($"cut_i", $"label")
    }),

    // Leave-one-out target encoding — the categorical feature
    // encoding gradient-boosted models train on: replace a category
    // with the mean target of OTHER rows in that category
    // ((Σ_cat − y_i)/(n_cat − 1)), the one-line trick that blocks the
    // self-leakage plain mean-encoding suffers. Exact integer cents
    // end to end, one IEEE division per row; the category census is a
    // 5-row broadcast model frame and the dimension join broadcasts —
    // zero data-sized shuffles beyond the scan.
    "q322_target_encoding_loo" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.table(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment".as("segment"))
      val scored = Tables.table(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey",
          floor($"o_totalprice" * lit(100.0)).cast("long")
            .as("y_cents"))
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      val census = scored.groupBy($"segment")
        .agg(count(lit(1)).as("n_cat"),
          sum($"y_cents".cast("decimal(38,0)")).as("sum_cat"))
      scored.join(broadcast(census), "segment")
        .select($"o_orderkey", $"segment", $"y_cents",
          (($"sum_cat" - $"y_cents").cast("double") /
            ($"n_cat" - 1L).cast("double")).as("loo_enc_cents"))
        .orderBy($"o_orderkey")
    }),

    // Window-function surface completion — ntile / cume_dist /
    // nth_value (the three the registry's 40+ window queries never
    // exercised), all in ONE per-customer pass under a TOTAL order
    // (price, then orderkey) so every rank-adjacent function is
    // deterministic: which spend quartile each order falls in within
    // its customer's history, its exact cumulative share, and the
    // customer's second-cheapest order as the nth_value anchor.
    // Keyed windows (15k+ customers), never global — one shuffle on
    // the key, the shape that holds at any scale.
    "q320_window_surface" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"price_cents", $"o_orderkey")
      Tables.table(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          floor($"o_totalprice" * lit(100.0)).cast("long")
            .as("price_cents"))
        .withColumn("spend_quartile", ntile(4).over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("second_cheapest_cents",
          nth_value($"price_cents", 2).over(
            w.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        .select($"o_custkey", $"o_orderkey", $"price_cents",
          $"spend_quartile", $"cume", $"second_cheapest_cents")
        .orderBy($"o_orderkey")
    }),

    // Rolling-origin backtest (Tashman's temporal cross-validation —
    // the eval q307's single split can't give): 4 origins per event
    // type, each training on observations ≤ o and scoring the next 7,
    // comparing seasonal-naive (y[t−7], observation-indexed) against
    // a trailing 14-observation mean. A forecaster that wins once may
    // be lucky; winning across origins is the deployable signal.
    // Everything exact integer cents: per-(type, origin) summed
    // absolute errors, winner by comparison — no division anywhere.
    // One daily census + one window pass + two bounded equi-joins
    // (the origin frame is 4 rows per type — a model frame).
    "q319_rolling_backtest" -> ((s, dir) => {
      import s.implicits._
      val byT = Window.partitionBy($"event_type").orderBy($"day")
      val daily = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .withColumn("t", row_number().over(byT).cast("long"))
        .localCheckpoint() // shared by 4 derived frames
      val origins = daily.groupBy($"event_type")
        .agg(max($"t").as("n"))
        .select($"event_type", explode(sequence(lit(1L), lit(4L)))
          .as("i"))
        .join(daily.groupBy($"event_type").agg(max($"t").as("n")),
          "event_type")
        .select($"event_type", $"i", ($"n" - lit(7L) * $"i").as("o"))
      val ma = daily
        .withColumn("wsum", sum($"y").over(byT.rowsBetween(-13, 0)))
        .withColumn("wcnt", count(lit(1)).over(byT.rowsBetween(-13, 0)))
        .select($"event_type", $"t".as("o"),
          expr("wsum DIV wcnt").as("y_ma"))
      val snaive = daily.select($"event_type", ($"t" + 7L).as("t"),
        $"y".as("y_sn"))
      daily.join(origins, "event_type")
        .filter($"t" > $"o" && $"t" <= $"o" + 7L)
        .join(snaive, Seq("event_type", "t"))
        .join(ma, Seq("event_type", "o"))
        .groupBy($"event_type", $"i")
        .agg(min($"o").as("origin_t"),
          sum(abs($"y" - $"y_sn")).as("sae_snaive_cents"),
          sum(abs($"y" - $"y_ma")).as("sae_mavg_cents"))
        .select($"event_type", $"i", $"origin_t",
          $"sae_snaive_cents", $"sae_mavg_cents",
          when($"sae_snaive_cents" < $"sae_mavg_cents", "snaive")
            .when($"sae_mavg_cents" < $"sae_snaive_cents", "mavg14")
            .otherwise("tie").as("winner"))
        .orderBy($"event_type", $"i")
    }),

    // Markov removal-effect attribution (Anderl et al.'s data-driven
    // multi-touch model): which channel actually CARRIES conversions,
    // measured by deleting it — journeys truncate at first purchase
    // (CONV absorbing), trail off to END otherwise; transition
    // probabilities quantize to exact ppm; conversion probability
    // from START is 8 quantized value-iteration rounds (ppb floors —
    // every number an exact integer both engines reproduce);
    // removal effect for channel c = relative drop in P(conv) when
    // state c is forced dead; shares normalize the effects. The
    // transition matrix is a ≤|types|²-row METADATA frame — the
    // IVF-centroid collect class — so the 5 chain evaluations run
    // driver-side in integer arithmetic; the data-sized work is ONE
    // lag-window pass + one count aggregate. The oracle replays all
    // 5 × 8 rounds as chained CTEs over the same quantized matrix.
    "q318_markov_attribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val seq0 = Tables.table(s, dir, "events")
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("rn", row_number().over(w))
      val cut = seq0.filter($"event_type" === "purchase")
        .groupBy($"user_id").agg(min($"rn").as("cut"))
      val seq = seq0.join(cut, Seq("user_id"), "left")
        .filter($"cut".isNull || $"rn" <= $"cut")
        .withColumn("st", when($"event_type" === "purchase",
          lit("CONV")).otherwise($"event_type"))
      val wk = Window.partitionBy($"user_id").orderBy($"rn")
      val mid = seq.withColumn("nxt", lead($"st", 1).over(wk))
        .filter($"st" =!= "CONV")
        .select($"st".as("src"),
          coalesce($"nxt", lit("END")).as("dst"))
      val start = seq.filter($"rn" === 1)
        .select(lit("START").as("src"), $"st".as("dst"))
      val trans = mid.unionByName(start)
        .groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
      val tot = trans.groupBy($"src").agg(sum($"n").as("nt"))
      // bounded model collect: ≤ |types+2|² rows by construction
      val tppm: Map[(String, String), Long] = trans.join(tot, "src")
        .select($"src", $"dst", expr("n * 1000000 DIV nt").as("t_ppm"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          r.getLong(2)).toMap
      val states = (tppm.keys.map(_._1) ++ tppm.keys.map(_._2)).toSet
      def pStart(removed: String): Long = {
        var p = states.map(st =>
          st -> (if (st == "CONV") 1000000000L else 0L)).toMap
        for (_ <- 1 to 8) {
          p = states.map { st =>
            st -> (if (st == "CONV") 1000000000L
              else if (st == "END" || st == removed) 0L
              else states.toSeq.map(t =>
                tppm.getOrElse((st, t), 0L) * p(t)).sum / 1000000L)
          }.toMap
        }
        p.getOrElse("START", 0L)
      }
      val pFull = pStart("__none")
      val channels = Seq("click", "error", "signup", "view")
      val effects = channels.map(c =>
        c -> ((pFull - pStart(c)) * 1000000L / pFull))
      val sumEff = effects.map(_._2).sum
      effects.map { case (c, e) =>
        (c, pFull, pStart(c), e,
          if (sumEff == 0L) 0L else e * 1000000L / sumEff)
      }.toDF("channel", "p_full_ppb", "p_removed_ppb",
          "removal_effect_ppm", "share_ppm")
        .orderBy($"channel")
    }),

    // Off-policy (counterfactual) evaluation — "what would a NEW
    // action policy have earned on the logged traffic?", the eval
    // every logged-interaction pipeline runs before an A/B test:
    // IPS (Horvitz-Thompson importance weighting), its clipped
    // variant (cap w at 3 — the variance/bias knob), SNIPS
    // (self-normalized), and the effective sample size that says how
    // much of the log the reweighting actually uses. Logged policy =
    // the empirical action distribution; target policy = a fixed
    // prior over event types (π ∝ 0..4/10). Weights depend only on
    // the ACTION, so everything reduces to a 5-row census; they are
    // QUANTIZED to exact ppm integers (the q133 dyadic-grid
    // discipline applied to importance weights, via exactFloorDiv so
    // nothing re-enters 64-bit), making every sum exact decimal and
    // each final metric ONE IEEE division chain the oracle replays.
    "q315_ips_offpolicy" -> ((s, dir) => {
      import s.implicits._
      val piNum = when($"event_type" === "view", 1L)
        .when($"event_type" === "click", 2L)
        .when($"event_type" === "signup", 3L)
        .when($"event_type" === "purchase", 4L).otherwise(0L)
      val perA = Tables.table(s, dir, "events")
        .select($"event_type",
          floor($"value" * lit(1000000.0)).cast("long").as("r_u"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_a"),
          sum($"r_u".cast("decimal(38,0)")).as("sum_r_u"))
        .withColumn("pi_num", piNum)
      val j = perA
        .crossJoin(broadcast(perA.agg(sum($"n_a").as("n")))) // 1-row N
        .withColumn("w_ppm", Analytics.exactFloorDiv(
          expr("CAST(pi_num AS DECIMAL(38,0)) * n * 1000000"),
          expr("10 * n_a")))
        .withColumn("w_clip_ppm",
          least($"w_ppm", lit(3000000L).cast("decimal(38,0)")))
      j.groupBy($"n")
        .agg(sum($"w_ppm" * $"sum_r_u").as("v_num"),
          sum($"w_clip_ppm" * $"sum_r_u").as("vc_num"),
          sum($"w_ppm" * $"n_a").as("sw"),
          sum($"w_ppm" * $"w_ppm" * $"n_a").as("sw2"))
        .select($"n",
          ($"v_num".cast("double") /
            ($"n".cast("double") * lit(1.0e12))).as("v_ips"),
          ($"v_num".cast("double") /
            (lit(1.0e6) * $"sw".cast("double"))).as("v_snips"),
          ($"vc_num".cast("double") /
            ($"n".cast("double") * lit(1.0e12))).as("v_clip"),
          // double route (not exactFloorDiv): sw²·10⁶ would pass 10³⁸
          // near 3e9 rows; the IEEE chain is identical on both
          // engines and has no cliff
          floor($"sw".cast("double") * $"sw".cast("double") *
            lit(1.0e6) / ($"sw2".cast("double") * $"n".cast("double")))
            .cast("long").as("ess_share_ppm"))
    }),

    // KEYLESS interval-overlap join (the classical "interval join"):
    // user sessions [start, end] × derived campaign windows, no join
    // key at all — the naive form is an O(n·m) inequality product.
    // Rendered scale-right via GRID BUCKETING: both interval sets
    // explode onto the day grid they span (sessions cover ≤ 2 day
    // buckets — gap-bounded; campaigns 3 — fixed), the join becomes a
    // day-bucket EQUI-join, duplicates from multi-bucket spans drop
    // by key, and the exact overlap refines per pair. At 100 TB this
    // is how every temporal-overlap workload (ads attribution,
    // downtime × jobs, promo exposure) avoids the product: work is
    // Σ per-bucket |sessions|·|campaigns-that-day| with campaigns
    // per day O(1). Overlap math in exact integer micros.
    "q314_interval_overlap" -> ((s, dir) => {
      import s.implicits._
      val dayUs = 86400L * 1000000L
      val ev = Tables.table(s, dir, "events")
        .select($"user_id", $"ts", $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = ev
        .withColumn("prev", lag($"ts", 1).over(w))
        .withColumn("brk", when($"prev".isNull ||
          unix_micros($"ts") - unix_micros($"prev") > 1800000000L, 1L)
          .otherwise(0L))
        .withColumn("sid", sum($"brk").over(w))
        .groupBy($"user_id", $"sid")
        .agg(min(unix_micros($"ts")).as("s_us"),
          max(unix_micros($"ts")).as("e_us"))
      // campaign windows: 3 days on / 4 off from the global min ts —
      // a calendar-bounded spine (1-row span frame, the q263 move)
      val camps = ev.agg(min(unix_micros($"ts")).as("lo"),
          max(unix_micros($"ts")).as("hi"))
        .select($"lo", explode(sequence(lit(0L),
          floor(($"hi" - $"lo") / lit(7L * dayUs)).cast("long")))
          .as("cid"))
        .select($"cid", ($"lo" + $"cid" * lit(7L * dayUs)).as("c_s"))
        .select($"cid", $"c_s", ($"c_s" + lit(3L * dayUs)).as("c_e"))
        .localCheckpoint() // bounded spine, reused by the bucket join
      def grid(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) = // buckets [a, b) touches
        sequence((a / dayUs).cast("long"), ((b - 1) / dayUs).cast("long"))
      val sb = sess.select($"user_id", $"sid", $"s_us", $"e_us",
        explode(grid($"s_us", $"e_us" + 1)).as("bucket"))
      val cb = camps.select($"cid", $"c_s", $"c_e",
        explode(grid($"c_s", $"c_e")).as("bucket"))
      sb.join(cb, "bucket")
        .filter($"s_us" < $"c_e" && $"c_s" <= $"e_us")
        .select($"user_id", $"sid", $"cid",
          (least($"e_us", $"c_e") - greatest($"s_us", $"c_s"))
            .as("ov_us"))
        .distinct() // a pair sharing 2 buckets must count once
        .groupBy($"cid")
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct($"user_id").as("n_users"),
          expr("sum(ov_us) DIV 1000000").as("overlap_sec"))
        .orderBy($"cid")
    }),

    // One-way ANOVA F — does WEEKDAY explain daily revenue? The
    // classical F = (SSB/(k−1)) / (SSW/(N−k)) per event type from
    // exact integer moments: per-(type, weekday) sums feed the q274
    // scatter identities (t_g = ⌊2²⁰·S_g²/n_g⌋ exact BIGINT DIVs,
    // order-free), SSB/SSW are integer differences, and F is one
    // IEEE ratio. The weekday effect q279 MODELS, this one TESTS.
    "q304_anova_weekday" -> ((s, dir) => {
      import s.implicits._
      val g = Tables.table(s, dir, "events")
        .groupBy($"event_type", $"ts".cast("date").as("day"))
        .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
        .select($"event_type", weekday($"day").as("wd"),
          expr("y DIV 1024").as("x")) // kilo-cents-ish: keeps
        // S_g²·2²⁰ inside BIGINT at any realistic daily revenue
        .groupBy($"event_type", $"wd")
        .agg(count(lit(1)).as("ng"), sum($"x").as("sg"),
          sum($"x" * $"x").as("sgg"))
        // square in DECIMAL(38,0): sg² wraps BIGINT once a weekday
        // bucket's kilo-cent sum passes ~3e9 (the q274 advisory); the
        // ⌊a/b⌋ = (a − a%b)/b form keeps the quotient decimal too (DIV
        // would convert it back to LONG). Oracle mirrors in HUGEINT.
        .withColumn("tg", Analytics.exactFloorDiv(
          expr("CAST(sg AS DECIMAL(38,0)) * sg * 1048576"), $"ng"))
      g.groupBy($"event_type")
        .agg(count(lit(1)).as("k"), sum($"ng").as("n"),
          sum($"sg").as("s"), sum($"sgg".cast("decimal(38,0)")).as("ss"),
          sum($"tg").as("t"))
        .select($"event_type", $"k".cast("int").as("k_groups"),
          $"n".as("n_days"),
          ($"t" - Analytics.exactFloorDiv(
            expr("CAST(s AS DECIMAL(38,0)) * s * 1048576"), $"n"))
            .as("ssb_u"),
          ($"ss" * lit(1048576L) - $"t").as("ssw_u"))
        .select($"event_type", $"k_groups", $"n_days",
          round(($"ssb_u".cast("double") /
            ($"k_groups" - 1).cast("double")) /
            ($"ssw_u".cast("double") /
              ($"n_days" - $"k_groups").cast("double")), 6).as("f"))
        .orderBy($"event_type")
    }))

  /** Shared engine body of q279/q287: the integer trend+weekday
    * decomposition — per-(type, day) columns (event_type, day, wd, y,
    * trend_ucents, d_u, weekday_ucents), all exact integers (OLS fit
    * as a DECIMAL-numerator integral divide, weekday effect a 7-row
    * DIV model joined back broadcast). */
  private def decomposed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.table(s, dir, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
    val d38 = "decimal(38,0)"
    val idx = daily
      .withColumn("t", row_number().over(w).cast("long"))
      .localCheckpoint() // feeds moments + the decomposition scan
    val m = idx.groupBy($"event_type")
      .agg(count(lit(1)).cast(d38).as("n"),
        sum($"t").cast(d38).as("st"), sum($"y").cast(d38).as("sy"),
        sum($"t" * $"y").cast(d38).as("sty"),
        sum($"t" * $"t").cast(d38).as("stt"))
      .select($"event_type",
        ($"n" * $"sty" - $"st" * $"sy").as("cov_n"),
        ($"n" * $"stt" - $"st" * $"st").as("var_t_n"),
        ($"sy" * $"stt" - $"st" * $"sty").as("ic_n"))
    val detrended = idx.join(broadcast(m), "event_type")
      .select($"event_type", $"day", $"y",
        expr(s"CAST((ic_n + cov_n * CAST(t AS $d38)) * 1000000" +
          s" AS $d38) DIV var_t_n").as("trend_ucents"))
      .withColumn("wd", weekday($"day"))
      .withColumn("d_u", $"y" * lit(1000000L) - $"trend_ucents")
      .localCheckpoint() // feeds weekday model + final join
    val wdEffect = detrended.groupBy($"event_type", $"wd")
      .agg(expr("sum(d_u) DIV count(1)").as("weekday_ucents"))
    detrended.join(broadcast(wdEffect), Seq("event_type", "wd"))
  }

  /** Shared WITH-body of the q279/q287 oracles: the integer
    * trend+weekday decomposition CTEs up to det2 (per-day detrended
    * values) and wde (the 7-row weekday model). */
  private val seasonalCte: String =
    """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, day, y,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS t
           FROM daily),
         m AS (
           SELECT event_type,
                  CAST(count(*) AS DECIMAL(38,0)) AS n,
                  CAST(sum(t) AS DECIMAL(38,0)) AS st,
                  CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                  CAST(sum(t * y) AS DECIMAL(38,0)) AS sty,
                  CAST(sum(t * t) AS DECIMAL(38,0)) AS stt
           FROM idx GROUP BY 1),
         d AS (
           SELECT event_type,
                  n * sty - st * sy AS cov_n,
                  n * stt - st * st AS var_t_n,
                  sy * stt - st * sty AS ic_n
           FROM m),
         det AS (
           SELECT i.event_type, i.day, i.y,
                  isodow(i.day) - 1 AS wd,
                  CAST(CAST((d.ic_n + d.cov_n
                      * CAST(i.t AS DECIMAL(38,0))) * 1000000
                    AS HUGEINT) // CAST(d.var_t_n AS HUGEINT)
                    AS BIGINT) AS trend_ucents
           FROM idx i JOIN d ON i.event_type = d.event_type),
         det2 AS (
           SELECT *, y * 1000000 - trend_ucents AS d_u FROM det),
         wde AS (
           SELECT event_type, wd,
                  CAST(CAST(sum(d_u) AS HUGEINT) // count(*)
                    AS BIGINT) AS weekday_ucents
           FROM det2 GROUP BY 1, 2)"""

  /** q281's oracle text, shared with the q300 one-pager. */
  private val q281Sql: String =
    """WITH ev AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  least(7, CAST(floor(value / 62.5) AS INT)) AS bucket
           FROM events),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
         cens AS (
           SELECT event_type, bucket,
                  CAST(sum(CASE WHEN day - (SELECT d0 FROM span) < 7
                    THEN 1 ELSE 0 END) AS BIGINT) + 1 AS n1,
                  CAST(sum(CASE WHEN (SELECT d1 FROM span) - day < 7
                    THEN 1 ELSE 0 END) AS BIGINT) AS m
           FROM ev GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(sum(n1) AS BIGINT) AS nn,
                  CAST(sum(m) AS BIGINT) AS mm
           FROM cens GROUP BY 1)
         SELECT c.event_type, max(t.nn) AS n_ref, max(t.mm) AS n_cur,
                CAST(sum(abs(c.n1 * t.mm - c.m * t.nn)) AS BIGINT)
                  * 1000000 // (2 * max(t.nn) * max(t.mm)) AS tv_ppm,
                CAST(sum(CAST((c.m * t.nn - c.n1 * t.mm) AS HUGEINT)
                    * (c.m * t.nn - c.n1 * t.mm) * 1000000
                    // (CAST(t.mm AS HUGEINT) * c.n1 * t.nn))
                  AS BIGINT) AS chi2_micro
         FROM cens c JOIN tot t USING (event_type)
         GROUP BY c.event_type ORDER BY c.event_type"""

  /** q297's oracle text, shared with the q300 one-pager. */
  private val q297Sql: String =
    """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, count(*)::BIGINT AS n,
                  CAST(sum(y) AS BIGINT) AS sy
           FROM daily GROUP BY 1),
         sig AS (
           SELECT d.event_type, d.day,
                  CASE WHEN d.y * 5 * t.n > t.sy * 6 THEN 1
                       WHEN d.y * 5 * t.n < t.sy * 4 THEN 0
                  END AS crossing
           FROM daily d JOIN tot t ON d.event_type = t.event_type),
         st AS (
           SELECT event_type, day,
                  coalesce(last_value(crossing IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    0) AS armed
           FROM sig),
         pv AS (
           SELECT event_type, day, armed,
                  coalesce(lag(armed) OVER (PARTITION BY event_type
                    ORDER BY day), 0) AS prev
           FROM st)
         SELECT event_type, count(*)::BIGINT AS n_days,
                CAST(sum(armed) AS BIGINT) AS days_armed,
                CAST(sum(CASE WHEN armed > prev THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_alerts_fired,
                min(CASE WHEN armed = 1 THEN day END)
                  AS first_alert_day
         FROM pv GROUP BY 1 ORDER BY 1"""

  val oracles: Map[String, String] = Map(
    "q306_uplift_deciles" ->
      """WITH users AS (
           SELECT user_id,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS spend,
                  CAST(max(CASE WHEN event_type = 'purchase'
                      AND value > 150.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS conv
           FROM events GROUP BY 1),
         u2 AS (
           SELECT *, CAST('0x' || substr(md5(user_id::VARCHAR
                    || '_ab'), 1, 15) AS BIGINT) % 2 AS arm
           FROM users),
         qs AS (
           SELECT quantile_cont(spend, 0.2) AS q1,
                  quantile_cont(spend, 0.4) AS q2,
                  quantile_cont(spend, 0.6) AS q3,
                  quantile_cont(spend, 0.8) AS q4
           FROM users),
         d AS (
           SELECT u2.*, CASE WHEN spend <= q1 THEN 1
                             WHEN spend <= q2 THEN 2
                             WHEN spend <= q3 THEN 3
                             WHEN spend <= q4 THEN 4
                             ELSE 5 END AS decile
           FROM u2, qs)
         SELECT CAST(decile AS INT) AS decile,
                CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                  AS BIGINT) AS c_a,
                CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                  AS BIGINT) AS c_b,
                CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                  AS BIGINT) * 1000000
                  // CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rate_a_ppm,
                CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                  AS BIGINT) * 1000000
                  // CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rate_b_ppm,
                CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                  AS BIGINT) * 1000000
                  // CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                    AS BIGINT)
                - CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                  AS BIGINT) * 1000000
                  // CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS uplift_ppm
         FROM d GROUP BY decile ORDER BY decile""",
    "q307_mase_forecast_skill" -> {
      val lags = (1 to 14).map(i =>
        s"lag(y, $i) OVER (PARTITION BY event_type ORDER BY day) AS l$i")
        .mkString(", ")
      val f = (1 to 13).map(i => s"l$i * ${1L << (13 - i)}")
        .mkString(" + ") + " + l14"
      s"""WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, day, y, $lags FROM daily),
         e AS (
           SELECT event_type,
                  abs(y - CAST($f AS BIGINT) // 8192) AS e_model,
                  abs(y - l7) AS e_naive
           FROM lagged WHERE l14 IS NOT NULL)
         SELECT event_type, count(*)::BIGINT AS n_days,
                round(CAST(sum(e_model) AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * 100.0), 4)
                  AS mae_model_dollars,
                round(CAST(sum(e_naive) AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * 100.0), 4)
                  AS mae_naive_dollars,
                round(CAST(sum(e_model) AS DOUBLE)
                  / CAST(sum(e_naive) AS DOUBLE), 6) AS mase
         FROM e GROUP BY 1 ORDER BY 1"""
    },
    "q305_gapfill_interpolation" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y,
                  CAST('0x' || substr(md5(event_type || '_gap'
                    || CAST(ts AS DATE)::VARCHAR), 1, 15) AS BIGINT)
                    % 5 = 0 AS hidden
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         nb AS (
           SELECT event_type, day, y, hidden,
                  last_value(CASE WHEN NOT hidden THEN y END
                    IGNORE NULLS) OVER wb AS pv,
                  last_value(CASE WHEN NOT hidden THEN day END
                    IGNORE NULLS) OVER wb AS pd,
                  first_value(CASE WHEN NOT hidden THEN y END
                    IGNORE NULLS) OVER wa AS nv,
                  first_value(CASE WHEN NOT hidden THEN day END
                    IGNORE NULLS) OVER wa AS nd
           FROM daily
           WINDOW wb AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING),
                  wa AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 1 FOLLOWING
                    AND UNBOUNDED FOLLOWING)),
         f AS (
           SELECT event_type, y,
                  (pv * (nd - day) + nv * (day - pd)) * 1000000
                    // (nd - pd) AS fill_u
           FROM nb
           WHERE hidden AND pv IS NOT NULL AND nv IS NOT NULL)
         SELECT event_type, count(*)::BIGINT AS n_filled,
                round(CAST(sum(abs(fill_u - y * 1000000)) AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * 100000000.0), 4)
                  AS mae_dollars
         FROM f GROUP BY 1 ORDER BY 1""",
    // same DECIMAL(38,0) moment identities, same division chains
    "q324_dispersion_index" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  count(*)::BIGINT AS x
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type,
                  CAST(count(*) AS DECIMAL(38,0)) AS n,
                  CAST(sum(x) AS DECIMAL(38,0)) AS sx,
                  sum(CAST(x AS DECIMAL(38,0))
                      * CAST(x AS DECIMAL(38,0))) AS sxx
           FROM daily GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n_days,
                CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_daily,
                CAST(n * sxx - sx * sx AS DOUBLE)
                  / (CAST(n - 1 AS DOUBLE) * CAST(sx AS DOUBLE))
                  AS fano,
                (n * sxx - sx * sx) * 2 > (n - 1) * sx * 3
                  AS overdispersed
         FROM m ORDER BY event_type""",

    // same fixed generalization grid, same dominant-priority tiebreak
    // (count desc, then priority desc), same k=5 / l=2 bands
    "q327_k_anonymity" ->
      """WITH sens AS (
           SELECT o_custkey AS c_custkey, o_orderpriority AS priority,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY count(*) DESC, o_orderpriority DESC) AS rn
           FROM orders GROUP BY o_custkey, o_orderpriority),
         cust AS (
           SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
                  CAST(floor((c.c_acctbal + 1000.0) / 1200.0) AS BIGINT)
                    AS bal_bin,
                  coalesce(s.priority, 'NONE') AS priority
           FROM customer c
           LEFT JOIN (SELECT * FROM sens WHERE rn = 1) s
             ON c.c_custkey = s.c_custkey),
         classes AS (
           SELECT c_nationkey, c_mktsegment, bal_bin,
                  count(*)::BIGINT AS class_size,
                  count(DISTINCT priority)::BIGINT AS l_div
           FROM cust GROUP BY 1, 2, 3)
         SELECT CASE WHEN class_size >= 5 THEN 'ok_k'
                     ELSE 'at_risk_k' END AS k_band,
                count(*)::BIGINT AS n_classes,
                sum(class_size)::BIGINT AS n_rows,
                min(class_size)::BIGINT AS min_class_size,
                max(class_size)::BIGINT AS max_class_size,
                sum(CASE WHEN l_div < 2 THEN 1 ELSE 0 END)::BIGINT
                  AS n_low_diversity_classes,
                sum(CASE WHEN l_div < 2 THEN class_size ELSE 0 END)::BIGINT
                  AS n_low_diversity_rows
         FROM classes GROUP BY 1 ORDER BY k_band""",

    // same island trick: day − row_number() is constant within a
    // consecutive run
    "q328_activity_streaks" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         isl AS (
           SELECT user_id,
                  day - CAST(row_number() OVER (PARTITION BY user_id
                             ORDER BY day) AS INTEGER) AS island
           FROM days),
         runs AS (
           SELECT user_id, island, count(*)::BIGINT AS len
           FROM isl GROUP BY 1, 2),
         per_user AS (
           SELECT user_id, max(len) AS longest_streak,
                  count(*)::BIGINT AS n_streaks,
                  sum(len)::BIGINT AS n_active_days
           FROM runs GROUP BY 1)
         SELECT longest_streak, count(*)::BIGINT AS n_users,
                min(user_id) AS min_user,
                sum(n_streaks)::BIGINT AS sum_streaks,
                sum(n_active_days)::BIGINT AS sum_active_days
         FROM per_user GROUP BY 1 ORDER BY longest_streak""",

    // same 2-cut spine, same windowed conditional sums, exact ppm
    "q323_temporal_labels" ->
      """WITH span AS (
           SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
           FROM events),
         cuts AS (
           SELECT cut_i, lo + (hi - lo) * cut_i // 3 AS cut_us
           FROM span, unnest(generate_series(1, 2)) AS g(cut_i)),
         labeled AS (
           SELECT c.cut_i, e.user_id,
                  sum(CASE WHEN epoch_us(e.ts) < c.cut_us
                      THEN 1 ELSE 0 END) AS n_past,
                  sum(CASE WHEN epoch_us(e.ts) < c.cut_us
                       AND e.event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS past_purchases,
                  max(CASE WHEN epoch_us(e.ts) >= c.cut_us
                       AND e.event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS label
           FROM events e JOIN cuts c
             ON epoch_us(e.ts) >= c.cut_us - 2419200000000
            AND epoch_us(e.ts) < c.cut_us + 2419200000000
           GROUP BY c.cut_i, e.user_id
           HAVING sum(CASE WHEN epoch_us(e.ts) < c.cut_us
                      THEN 1 ELSE 0 END) > 0)
         SELECT CAST(cut_i AS BIGINT) AS cut_i,
                CAST(label AS BIGINT) AS label,
                count(*)::BIGINT AS n_users,
                CAST(sum(n_past) AS BIGINT) AS sum_past_events,
                CAST(sum(past_purchases) AS BIGINT)
                  AS sum_past_purchases,
                CAST(sum(n_past) * 1000000 // count(*) AS BIGINT)
                  AS events_per_user_ppm,
                CAST(sum(past_purchases) * 1000000 // count(*)
                  AS BIGINT) AS purchases_per_user_ppm
         FROM labeled
         GROUP BY cut_i, label
         ORDER BY cut_i, label""",

    // same census, same exact-cents LOO arithmetic
    "q322_target_encoding_loo" ->
      """WITH scored AS (
           SELECT o.o_orderkey, c.c_mktsegment AS segment,
                  CAST(floor(o.o_totalprice * 100.0) AS BIGINT)
                    AS y_cents
           FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey),
         census AS (
           SELECT segment, count(*)::BIGINT AS n_cat,
                  CAST(sum(y_cents) AS HUGEINT) AS sum_cat
           FROM scored GROUP BY segment)
         SELECT s.o_orderkey, s.segment, s.y_cents,
                CAST(c.sum_cat - s.y_cents AS DOUBLE)
                  / CAST(c.n_cat - 1 AS DOUBLE) AS loo_enc_cents
         FROM scored s JOIN census c ON c.segment = s.segment
         ORDER BY s.o_orderkey""",

    // same total order, same functions — DuckDB's ntile/cume_dist/
    // nth_value share Spark's SQL-standard definitions
    "q320_window_surface" ->
      """SELECT o_custkey, o_orderkey,
                CAST(floor(o_totalprice * 100.0) AS BIGINT)
                  AS price_cents,
                ntile(4) OVER w AS spend_quartile,
                cume_dist() OVER w AS cume,
                nth_value(CAST(floor(o_totalprice * 100.0) AS BIGINT),
                  2) OVER (PARTITION BY o_custkey
                    ORDER BY floor(o_totalprice * 100.0), o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
                  AS second_cheapest_cents
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY floor(o_totalprice * 100.0), o_orderkey)
         ORDER BY o_orderkey""",

    // same observation-indexed daily frame, same trailing window,
    // same exact-cents error sums
    "q319_rolling_backtest" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, y,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS t
           FROM daily),
         origins AS (
           SELECT event_type, i, n - 7 * i AS o
           FROM (SELECT event_type, max(t) AS n FROM idx GROUP BY 1),
                unnest(generate_series(1, 4)) AS g(i)),
         ma AS (
           SELECT event_type, t AS o,
                  CAST(sum(y) OVER w // count(*) OVER w AS BIGINT)
                    AS y_ma
           FROM idx
           WINDOW w AS (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
         sn AS (SELECT event_type, t + 7 AS t, y AS y_sn FROM idx)
         SELECT d.event_type, CAST(og.i AS BIGINT) AS i,
                CAST(min(og.o) AS BIGINT) AS origin_t,
                CAST(sum(abs(d.y - sn.y_sn)) AS BIGINT)
                  AS sae_snaive_cents,
                CAST(sum(abs(d.y - ma.y_ma)) AS BIGINT)
                  AS sae_mavg_cents,
                CASE WHEN sum(abs(d.y - sn.y_sn))
                       < sum(abs(d.y - ma.y_ma)) THEN 'snaive'
                     WHEN sum(abs(d.y - ma.y_ma))
                       < sum(abs(d.y - sn.y_sn)) THEN 'mavg14'
                     ELSE 'tie' END AS winner
         FROM idx d
         JOIN origins og ON og.event_type = d.event_type
          AND d.t > og.o AND d.t <= og.o + 7
         JOIN sn ON sn.event_type = d.event_type AND sn.t = d.t
         JOIN ma ON ma.event_type = d.event_type AND ma.o = og.o
         GROUP BY d.event_type, og.i
         ORDER BY d.event_type, i""",

    // all 5 chains × 8 quantized value-iteration rounds replayed as
    // chained CTEs over the same ppm transition matrix
    "q318_markov_attribution" -> {
      def chain(tag: String, removed: String): String = {
        val base = s"""p${tag}0 AS (
            SELECT state, CASE WHEN state = 'CONV'
              THEN 1000000000 ELSE 0 END AS p FROM states)"""
        val steps = (1 to 8).map { k =>
          s"""p$tag$k AS (
            SELECT s.state,
                   CASE WHEN s.state = 'CONV' THEN 1000000000
                        WHEN s.state = 'END' OR s.state = '$removed'
                          THEN 0
                        ELSE coalesce((
                          SELECT sum(t.t_ppm * p.p) // 1000000
                          FROM tppm t JOIN p$tag${k - 1} p
                            ON p.state = t.dst
                          WHERE t.src = s.state), 0) END AS p
            FROM states s)"""
        }
        (base +: steps).mkString(",\n          ")
      }
      val variants = Seq("full" -> "__none", "click" -> "click",
        "error" -> "error", "signup" -> "signup", "view" -> "view")
      val chains = variants.map { case (tag, r) => chain(tag, r) }
        .mkString(",\n          ")
      val res = variants.filter(_._1 != "full").map { case (tag, _) =>
        s"""SELECT '$tag' AS channel,
              (SELECT p FROM pfull8 WHERE state = 'START')
                AS p_full_ppb,
              (SELECT p FROM p${tag}8 WHERE state = 'START')
                AS p_removed_ppb"""
      }.mkString("\n            UNION ALL ")
      s"""WITH seq0 AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS rn
            FROM events),
          cut AS (
            SELECT user_id, min(rn) AS cut FROM seq0
            WHERE event_type = 'purchase' GROUP BY user_id),
          seq AS (
            SELECT s.user_id, s.rn,
                   CASE WHEN s.event_type = 'purchase' THEN 'CONV'
                        ELSE s.event_type END AS st
            FROM seq0 s LEFT JOIN cut c USING (user_id)
            WHERE c.cut IS NULL OR s.rn <= c.cut),
          mid AS (
            SELECT src, dst FROM (
              SELECT st AS src,
                     coalesce(lead(st) OVER (PARTITION BY user_id
                       ORDER BY rn), 'END') AS dst
              FROM seq) WHERE src <> 'CONV'),
          strt AS (SELECT 'START' AS src, st AS dst FROM seq
                   WHERE rn = 1),
          trans AS (
            SELECT src, dst, count(*)::BIGINT AS n FROM (
              SELECT * FROM mid UNION ALL SELECT * FROM strt)
            GROUP BY src, dst),
          tppm AS (
            SELECT t.src, t.dst, t.n * 1000000 // nt.nt AS t_ppm
            FROM trans t JOIN (
              SELECT src, CAST(sum(n) AS BIGINT) AS nt
              FROM trans GROUP BY src) nt ON nt.src = t.src),
          states AS (
            SELECT DISTINCT state FROM (
              SELECT src AS state FROM tppm
              UNION SELECT dst FROM tppm)),
          $chains,
          res AS (
            $res),
          eff AS (
            SELECT channel, p_full_ppb, p_removed_ppb,
                   (p_full_ppb - p_removed_ppb) * 1000000 // p_full_ppb
                     AS removal_effect_ppm
            FROM res),
          tot AS (SELECT sum(removal_effect_ppm) AS se FROM eff)
          SELECT channel, CAST(p_full_ppb AS BIGINT) AS p_full_ppb,
                 CAST(p_removed_ppb AS BIGINT) AS p_removed_ppb,
                 CAST(removal_effect_ppm AS BIGINT)
                   AS removal_effect_ppm,
                 CAST(CASE WHEN se = 0 THEN 0
                      ELSE removal_effect_ppm * 1000000 // se END
                   AS BIGINT) AS share_ppm
          FROM eff, tot ORDER BY channel"""
    },

    // same 5-row census, HUGEINT-exact weight quantization, the same
    // single-division renders
    "q315_ips_offpolicy" ->
      """WITH a AS (
           SELECT event_type, count(*)::BIGINT AS n_a,
                  CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT))
                    AS HUGEINT) AS sum_r_u,
                  CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                       WHEN 'signup' THEN 3 WHEN 'purchase' THEN 4
                       ELSE 0 END AS pi_num
           FROM events GROUP BY event_type),
         t AS (SELECT CAST(sum(n_a) AS BIGINT) AS n FROM a),
         w AS (
           SELECT a.*, t.n,
                  CAST(pi_num AS HUGEINT) * n * 1000000 // (10 * n_a)
                    AS w_ppm
           FROM a, t),
         wc AS (
           SELECT *, least(w_ppm, 3000000::HUGEINT) AS w_clip_ppm
           FROM w),
         s AS (
           SELECT n,
                  sum(w_ppm * sum_r_u) AS v_num,
                  sum(w_clip_ppm * sum_r_u) AS vc_num,
                  sum(w_ppm * n_a) AS sw,
                  sum(w_ppm * w_ppm * n_a) AS sw2
           FROM wc GROUP BY n)
         SELECT n,
                CAST(v_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e12)
                  AS v_ips,
                CAST(v_num AS DOUBLE) / (1.0e6 * CAST(sw AS DOUBLE))
                  AS v_snips,
                CAST(vc_num AS DOUBLE) / (CAST(n AS DOUBLE) * 1.0e12)
                  AS v_clip,
                CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                    * 1.0e6
                    / (CAST(sw2 AS DOUBLE) * CAST(n AS DOUBLE)))
                  AS BIGINT) AS ess_share_ppm
         FROM s""",

    // the oracle affords the O(n·m) inequality join the engine's grid
    // bucketing exists to avoid — same sessions, same spine, same
    // exact-micros overlap
    "q314_interval_overlap" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, sid, min(epoch_us(ts)) AS s_us,
                  max(epoch_us(ts)) AS e_us
           FROM (
             SELECT user_id, ts, SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM flagged)
           GROUP BY user_id, sid),
         span AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
                  FROM events),
         camps AS (
           SELECT cid, lo + cid * 604800000000 AS c_s,
                  lo + cid * 604800000000 + 259200000000 AS c_e
           FROM span, unnest(generate_series(0,
             (hi - lo) // 604800000000)) AS t(cid)),
         pairs AS (
           SELECT s.user_id, s.sid, c.cid,
                  least(s.e_us, c.c_e) - greatest(s.s_us, c.c_s) AS ov_us
           FROM sess s JOIN camps c
             ON s.s_us < c.c_e AND c.c_s <= s.e_us)
         SELECT cid, count(*)::BIGINT AS n_sessions,
                count(DISTINCT user_id)::BIGINT AS n_users,
                CAST(sum(ov_us) // 1000000 AS BIGINT) AS overlap_sec
         FROM pairs GROUP BY cid ORDER BY cid""",

    "q304_anova_weekday" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         x AS (
           SELECT event_type, isodow(day) - 1 AS wd,
                  y // 1024 AS x
           FROM daily),
         g AS (
           SELECT event_type, wd, count(*)::BIGINT AS ng,
                  CAST(sum(x) AS BIGINT) AS sg,
                  CAST(sum(x * x) AS BIGINT) AS sgg
           FROM x GROUP BY 1, 2),
         tg AS (
           SELECT event_type, wd, ng, sg, sgg,
                  CAST(sg AS HUGEINT) * sg * 1048576 // ng AS tg
           FROM g),
         a AS (
           SELECT event_type, count(*)::BIGINT AS k,
                  CAST(sum(ng) AS BIGINT) AS n,
                  CAST(sum(sg) AS HUGEINT) AS s,
                  CAST(sum(sgg) AS HUGEINT) AS ss,
                  CAST(sum(tg) AS HUGEINT) AS t
           FROM tg GROUP BY 1)
         SELECT event_type, CAST(k AS INT) AS k_groups, n AS n_days,
                round((CAST(t - (s * s * 1048576 // n) AS DOUBLE)
                    / CAST(k - 1 AS DOUBLE))
                  / (CAST(ss * 1048576 - t AS DOUBLE)
                    / CAST(n - k AS DOUBLE)), 6) AS f
         FROM a ORDER BY event_type""",
    "q300_pipeline_health" ->
      s"""WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
         d AS (SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
               FROM w),
         e AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM d a JOIN d b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                       (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                        - len(list_intersect(a.sh, b.sh))::DOUBLE)
                     >= 0.9),
         sym AS (SELECT ia, ib FROM e
                 UNION SELECT ib AS ia, ia AS ib FROM e),
         reach(id, r) AS (
           SELECT ia, ib FROM sym
           UNION
           SELECT s.ia, reach.r FROM sym s JOIN reach
             ON s.ib = reach.id),
         lab AS (SELECT id, least(min(r), id) AS cluster_id
                 FROM reach GROUP BY id)
         SELECT * FROM (
           SELECT 'rows_orders' AS metric,
                  (SELECT count(*) FROM orders)::BIGINT AS value
           UNION ALL
           SELECT 'rows_events' AS metric,
                  (SELECT count(*) FROM events)::BIGINT AS value
           UNION ALL
           SELECT 'orphan_lineitems' AS metric,
                  (SELECT count(*) FROM lineitem l
                   LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                   WHERE o.o_orderkey IS NULL)::BIGINT AS value
           UNION ALL
           SELECT 'neardup_docs_removable' AS metric,
                  (SELECT count(*) - count(DISTINCT cluster_id)
                   FROM lab)::BIGINT AS value
           UNION ALL
           SELECT 'max_drift_tv_ppm' AS metric,
                  (SELECT CAST(max(tv_ppm) AS BIGINT)
                   FROM ($q281Sql)) AS value
           UNION ALL
           SELECT 'alerts_fired' AS metric,
                  (SELECT CAST(sum(n_alerts_fired) AS BIGINT)
                   FROM ($q297Sql)) AS value
           UNION ALL
           SELECT 'max_salt_factor' AS metric,
                  (SELECT CAST(max(salt_factor) AS BIGINT)
                   FROM (${graft.queries.OpsQueries
                     .oracles("q283_skew_advisor")})) AS value)
         ORDER BY metric""",
    "q281_dist_drift" -> q281Sql,
    "q297_hysteresis_alerts" -> q297Sql,
    "q299_weighted_median" ->
      """WITH li AS (
           SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT)
                    AS v,
                  CAST(l_quantity AS BIGINT) AS q,
                  l_orderkey, l_linenumber
           FROM lineitem),
         cum AS (
           SELECT v, q,
                  CAST(sum(q) OVER (ORDER BY v, l_orderkey,
                    l_linenumber) AS BIGINT) AS csum,
                  CAST(row_number() OVER (ORDER BY v, l_orderkey,
                    l_linenumber) AS BIGINT) AS seq
           FROM li),
         tot AS (
           SELECT count(*)::BIGINT AS n_rows,
                  CAST(sum(q) AS BIGINT) AS w_total
           FROM li),
         wm AS (
           SELECT v FROM cum, tot WHERE csum * 2 >= w_total
           ORDER BY seq LIMIT 1),
         um AS (
           SELECT v FROM cum, tot WHERE seq * 2 >= n_rows
           ORDER BY seq LIMIT 1)
         SELECT tot.n_rows, tot.w_total AS total_qty,
                round(CAST(wm.v AS DOUBLE) / 100.0, 2)
                  AS weighted_median_dollars,
                round(CAST(um.v AS DOUBLE) / 100.0, 2)
                  AS unweighted_median_dollars
         FROM tot, wm, um""",
    "q298_topk_others" ->
      """WITH per AS (
           SELECT o_custkey,
                  CAST(sum(CAST(floor(o_totalprice * 100.0)
                    AS BIGINT)) AS BIGINT) AS cents,
                  count(*)::BIGINT AS n_orders
           FROM orders GROUP BY 1),
         top AS (
           SELECT o_custkey::VARCHAR AS customer, n_orders, cents
           FROM per ORDER BY cents DESC, o_custkey LIMIT 5),
         tot AS (
           SELECT CAST(sum(cents) AS BIGINT) AS t_cents,
                  CAST(sum(n_orders) AS BIGINT) AS t_orders
           FROM per),
         ks AS (
           SELECT CAST(sum(cents) AS BIGINT) AS k_cents,
                  CAST(sum(n_orders) AS BIGINT) AS k_orders
           FROM top)
         SELECT * FROM (
           SELECT customer, n_orders,
                  round(CAST(cents AS DOUBLE) / 100.0, 2) AS dollars
           FROM top
           UNION ALL
           SELECT 'OTHERS' AS customer,
                  t_orders - k_orders AS n_orders,
                  round(CAST(t_cents - k_cents AS DOUBLE) / 100.0, 2)
                    AS dollars
           FROM tot, ks)
         ORDER BY dollars DESC, customer""",
    "q295_rolling_slope" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, day, y,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS t
           FROM daily),
         r AS (
           SELECT event_type, day, y,
                  CAST(count(*) OVER w AS BIGINT) AS n,
                  CAST(sum(t) OVER w AS BIGINT) AS st,
                  CAST(sum(y) OVER w AS BIGINT) AS sy,
                  CAST(sum(t * y) OVER w AS BIGINT) AS sty,
                  CAST(sum(t * t) OVER w AS BIGINT) AS stt
           FROM idx
           WINDOW w AS (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT event_type, day, n AS n_window, y AS actual_cents,
                round(CAST(n * sty - st * sy AS DOUBLE)
                  / CAST(n * stt - st * st AS DOUBLE), 4)
                  AS slope_cents_per_day
         FROM r WHERE n >= 2 ORDER BY event_type, day""",
    "q294_quadratic_trend" -> {
      def det3(m: Seq[String]): String = {
        val Seq(a, b, c, d, e, f, g, h, i) = m
        s"($a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g)" +
          s" + $c * ($d * $h - $e * $g))"
      }
      val dd = det3(Seq("s0", "s1", "s2", "s1", "s2", "s3",
        "s2", "s3", "s4"))
      val da = det3(Seq("b0", "s1", "s2", "b1", "s2", "s3",
        "b2", "s3", "s4"))
      val db = det3(Seq("s0", "b0", "s2", "s1", "b1", "s3",
        "s2", "b2", "s4"))
      val dc = det3(Seq("s0", "s1", "b0", "s1", "s2", "b1",
        "s2", "s3", "b2"))
      s"""WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, y,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS t
           FROM daily),
         m AS (
           SELECT event_type,
                  CAST(count(*) AS DECIMAL(38,0)) AS s0,
                  CAST(sum(t) AS DECIMAL(38,0)) AS s1,
                  CAST(sum(t * t) AS DECIMAL(38,0)) AS s2,
                  CAST(sum(t * t * t) AS DECIMAL(38,0)) AS s3,
                  CAST(sum(t * t * t * t) AS DECIMAL(38,0)) AS s4,
                  CAST(sum(y) AS DECIMAL(38,0)) AS b0,
                  CAST(sum(t * y) AS DECIMAL(38,0)) AS b1,
                  sum(CAST(t AS DECIMAL(38,0))
                    * CAST(t AS DECIMAL(38,0))
                    * CAST(y AS DECIMAL(38,0))) AS b2
           FROM idx GROUP BY 1)
         SELECT event_type, CAST(s0 AS BIGINT) AS n_days,
                round(CAST($da AS DOUBLE) / CAST($dd AS DOUBLE)
                  / 100.0, 4) AS a_dollars,
                round(CAST($db AS DOUBLE) / CAST($dd AS DOUBLE)
                  / 100.0, 4) AS b_dollars_per_day,
                round(CAST($dc AS DOUBLE) / CAST($dd AS DOUBLE)
                  / 100.0, 6) AS c_dollars_per_day2
         FROM m ORDER BY event_type"""
    },
    "q291_conformal_forecast" -> {
      val lags = (1 to 14).map(i =>
        s"lag(y, $i) OVER (PARTITION BY event_type ORDER BY day) AS l$i")
        .mkString(", ")
      val f = (1 to 13).map(i => s"l$i * ${1L << (13 - i)}")
        .mkString(" + ") + " + l14"
      s"""WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM daily_src GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, day, y, $lags FROM daily),
         errs AS (
           SELECT event_type, day,
                  abs(y - CAST($f AS BIGINT) // 8192) AS aerr,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS INT) AS i
           FROM lagged WHERE l14 IS NOT NULL),
         n AS (
           SELECT event_type, count(*)::BIGINT // 2 AS n_cal
           FROM errs GROUP BY 1),
         rk AS (
           SELECT e.event_type, n.n_cal, e.aerr,
                  CAST(row_number() OVER (PARTITION BY e.event_type
                    ORDER BY e.aerr, e.day) AS BIGINT) AS r
           FROM errs e JOIN n ON e.event_type = n.event_type
           WHERE e.i <= n.n_cal),
         qh AS (
           SELECT event_type, CAST(min(aerr) AS BIGINT) AS q90_cents
           FROM rk
           WHERE r = CAST(ceil((n_cal + 1) * 0.9) AS BIGINT)
              OR (r = n_cal AND ceil((n_cal + 1) * 0.9) > n_cal)
           GROUP BY 1)
         SELECT e.event_type, max(n.n_cal) AS n_cal,
                count(*)::BIGINT AS n_test,
                max(q.q90_cents) AS q90_cents,
                CAST(sum(CASE WHEN e.aerr <= q.q90_cents
                  THEN 1 ELSE 0 END) AS BIGINT) * 1000000
                  // CAST(count(*) AS BIGINT) AS coverage_ppm
         FROM errs e JOIN n ON e.event_type = n.event_type
         JOIN qh q ON e.event_type = q.event_type
         WHERE e.i > n.n_cal
         GROUP BY 1 ORDER BY 1""".replace("daily_src", "events")
    },
    "q289_diff_in_diff" ->
      """WITH ev AS (
           SELECT CAST('0x' || substr(md5(user_id::VARCHAR || '_ab'),
                    1, 15) AS BIGINT) % 2 AS arm,
                  epoch_us(ts) AS us,
                  CAST(floor(value * 100.0) AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase'),
         mid AS (
           SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
         cells AS (
           SELECT arm,
                  CASE WHEN us >= (SELECT mid FROM mid)
                    THEN 1 ELSE 0 END AS post,
                  count(*)::BIGINT AS n,
                  CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    AS mean_c
           FROM ev GROUP BY 1, 2)
         SELECT a00.n AS n_00, a01.n AS n_01,
                a10.n AS n_10, a11.n AS n_11,
                round(a00.mean_c / 100.0, 4) AS a_pre_dollars,
                round(a01.mean_c / 100.0, 4) AS a_post_dollars,
                round(a10.mean_c / 100.0, 4) AS b_pre_dollars,
                round(a11.mean_c / 100.0, 4) AS b_post_dollars,
                round(((a11.mean_c - a10.mean_c)
                  - (a01.mean_c - a00.mean_c)) / 100.0, 4)
                  AS did_dollars
         FROM (SELECT * FROM cells WHERE arm = 0 AND post = 0) a00,
              (SELECT * FROM cells WHERE arm = 0 AND post = 1) a01,
              (SELECT * FROM cells WHERE arm = 1 AND post = 0) a10,
              (SELECT * FROM cells WHERE arm = 1 AND post = 1) a11""",
    "q288_neyman_allocation" -> (
      s"""WITH st AS (
           SELECT event_type,
                  CAST(count(*) AS BIGINT) AS n_h,
                  sqrt(CAST(CAST(count(*) AS DECIMAL(38,0))
                      * sum(CAST(CAST(floor(value * 100.0) AS BIGINT)
                          AS DECIMAL(38,0))
                        * CAST(CAST(floor(value * 100.0) AS BIGINT)
                          AS DECIMAL(38,0)))
                    - CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                        AS DECIMAL(38,0))
                      * CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                        AS DECIMAL(38,0)) AS DOUBLE)) AS w
           FROM events GROUP BY 1),
         tot AS (
           SELECT ${Q.dsumAtSql("w", 4)} AS wsum,
                  CAST(sum(n_h) AS BIGINT) AS n
           FROM st)
         SELECT st.event_type, st.n_h,
                round(st.w / CAST(st.n_h AS DOUBLE) / 100.0, 4)
                  AS sigma_dollars,
                CAST(floor(1000.0 * st.w / tot.wsum) AS BIGINT)
                  AS neyman_n,
                1000 * st.n_h // tot.n AS prop_n
         FROM st, tot ORDER BY st.event_type"""),
    "q286_ks_test" ->
      """WITH a AS (
           SELECT CAST(floor(value * 100.0) AS BIGINT) AS v
           FROM events WHERE event_type = 'click'),
         b AS (
           SELECT CAST(floor(value * 100.0) AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase'),
         g AS (
           SELECT v,
                  CAST(sum(CASE WHEN src = 'a' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ac,
                  CAST(sum(CASE WHEN src = 'b' THEN 1 ELSE 0 END)
                    AS BIGINT) AS bc
           FROM (SELECT v, 'a' AS src FROM a
                 UNION ALL SELECT v, 'b' AS src FROM b)
           GROUP BY 1),
         c AS (
           SELECT v,
                  CAST(sum(ac) OVER (ORDER BY v) AS BIGINT) AS ca,
                  CAST(sum(bc) OVER (ORDER BY v) AS BIGINT) AS cb
           FROM g),
         t AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n1,
                      (SELECT CAST(count(*) AS BIGINT) FROM b) AS n2)
         SELECT t.n1, t.n2,
                CAST(max(abs(c.ca * t.n2 - c.cb * t.n1)) AS BIGINT)
                  * 1000000 // (t.n1 * t.n2) AS d_ppm,
                round((CAST(max(abs(c.ca * t.n2 - c.cb * t.n1))
                    AS DOUBLE) / (CAST(t.n1 AS DOUBLE)
                      * CAST(t.n2 AS DOUBLE)))
                  * sqrt(CAST(t.n1 * t.n2 AS DOUBLE)
                    / CAST(t.n1 + t.n2 AS DOUBLE)), 6) AS lambda
         FROM c, t GROUP BY t.n1, t.n2""",
    "q287_runs_test" -> (seasonalCte +
      """, r AS (
           SELECT t.event_type, t.day,
                  CASE WHEN t.d_u - w.weekday_ucents >= 0
                    THEN 1 ELSE 0 END AS s
           FROM det2 t JOIN wde w
             ON t.event_type = w.event_type AND t.wd = w.wd),
         seq AS (
           SELECT event_type, s,
                  CASE WHEN lag(s) OVER (PARTITION BY event_type
                      ORDER BY day) IS DISTINCT FROM s
                    THEN 1 ELSE 0 END AS brk
           FROM r),
         agg AS (
           SELECT event_type,
                  CAST(sum(brk) AS BIGINT) AS runs,
                  CAST(sum(s) AS BIGINT) AS n_pos,
                  CAST(sum(1 - s) AS BIGINT) AS n_neg
           FROM seq GROUP BY 1)
         SELECT event_type, runs, n_pos, n_neg,
                round(CAST(runs * (n_pos + n_neg) - 2 * n_pos * n_neg
                      - (n_pos + n_neg) AS DOUBLE)
                  / sqrt(CAST(2 * n_pos * n_neg
                      * (2 * n_pos * n_neg - n_pos - n_neg)
                    AS DOUBLE) / CAST(n_pos + n_neg - 1 AS DOUBLE)),
                  6) AS z
         FROM agg ORDER BY event_type"""),
    "q285_log2_histogram" -> {
      val caseExpr = "CASE " + (46 to 1 by -1).map(k =>
        s"WHEN gap >= ${1L << k} THEN $k").mkString(" ") +
        " ELSE 0 END"
      s"""WITH g AS (
           SELECT event_type,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY epoch_us(ts)) AS gap
           FROM events)
         SELECT event_type, CAST($caseExpr AS INT) AS bucket,
                count(*)::BIGINT AS n_gaps,
                CAST(min(gap) AS BIGINT) AS min_us,
                CAST(max(gap) AS BIGINT) AS max_us,
                CAST(sum(gap) AS BIGINT) AS sum_us
         FROM g WHERE gap IS NOT NULL AND gap > 0
         GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    "q284_binary_segmentation" -> {
      // one exact-integer CUSUM level over `src` partitioned by
      // `parts`, named with suffix `sfx` — the q257 CTE shape reused
      // at both levels of the segmentation
      def levelSql(src: String, parts: Seq[String], sfx: String) = {
        val p = parts.mkString(", ")
        s"""tot$sfx AS (
           SELECT $p, count(*)::BIGINT AS n_days,
                  CAST(sum(x) AS BIGINT) AS s_tot
           FROM $src GROUP BY $p),
         cum$sfx AS (
           SELECT d.*, t.n_days,
                  CAST(t.n_days AS DECIMAL(38,0))
                    * CAST(sum(d.x) OVER (PARTITION BY ${parts.map(
                        "d." + _).mkString(", ")}
                        ORDER BY d.day) AS DECIMAL(38,0))
                  - CAST(row_number() OVER (PARTITION BY ${parts.map(
                        "d." + _).mkString(", ")}
                        ORDER BY d.day) AS DECIMAL(38,0))
                    * CAST(t.s_tot AS DECIMAL(38,0)) AS c
           FROM $src d JOIN tot$sfx t
             ON ${parts.map(c => s"d.$c = t.$c").mkString(" AND ")}),
         pk$sfx AS (
           SELECT $p, max(abs(c)) AS c_abs_max
           FROM cum$sfx GROUP BY $p),
         arg$sfx AS (
           SELECT ${parts.map("c." + _).mkString(", ")},
                  max(c.n_days) AS n_days, min(c.day) AS cp_day,
                  max(p.c_abs_max) AS cmax
           FROM cum$sfx c JOIN pk$sfx p
             ON ${parts.map(k => s"c.$k = p.$k").mkString(" AND ")}
               AND abs(c.c) = p.c_abs_max
           GROUP BY ${parts.map("c." + _).mkString(", ")})"""
      }
      s"""WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         ${levelSql("daily", Seq("event_type"), "1")},
         seg AS (
           SELECT d.event_type, d.day, d.x,
                  CASE WHEN d.day <= a.cp_day THEN 'pre'
                       ELSE 'post' END AS segment
           FROM daily d JOIN arg1 a ON d.event_type = a.event_type),
         ${levelSql("seg", Seq("event_type", "segment"), "2")}
         SELECT * FROM (
           SELECT event_type, 'all' AS segment, n_days, cp_day,
                  round(CAST(cmax AS DOUBLE)
                    / (CAST(n_days AS DOUBLE) * 100.0), 4)
                    AS max_dev_dollar_days
           FROM arg1
           UNION ALL
           SELECT event_type, segment, n_days, cp_day,
                  round(CAST(cmax AS DOUBLE)
                    / (CAST(n_days AS DOUBLE) * 100.0), 4)
                    AS max_dev_dollar_days
           FROM arg2)
         ORDER BY event_type, segment"""
    },
    "q282_unpivot_melt" ->
      """WITH days AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
         t AS (
           SELECT unnest(['click', 'error', 'purchase', 'signup',
             'view']) AS event_type),
         c AS (
           SELECT CAST(ts AS DATE) AS day, event_type,
                  count(*)::BIGINT AS n
           FROM events GROUP BY 1, 2)
         SELECT d.day, t.event_type,
                CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
         FROM days d CROSS JOIN t
         LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
         ORDER BY d.day, t.event_type""",
    "q279_seasonal_decomp" -> (seasonalCte +
      """
         SELECT t.event_type, t.day, CAST(t.wd AS INT) AS wd,
                t.y AS actual_cents, t.trend_ucents,
                w.weekday_ucents,
                t.d_u - w.weekday_ucents AS resid_ucents
         FROM det2 t JOIN wde w
           ON t.event_type = w.event_type AND t.wd = w.wd
         ORDER BY t.event_type, t.day"""),
    "q280_corr_matrix" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map(t =>
        s"""CAST(coalesce(sum(CASE WHEN event_type = '$t'
              THEN CAST(floor(value * 100.0) AS BIGINT) END), 0)
            AS BIGINT) AS $t""").mkString(", ")
      val pairs = for {
        i <- types.indices; j <- i + 1 until types.length
      } yield (types(i), types(j))
      val legs = pairs.map { case (a, b) =>
        s"""SELECT '$a' AS type_a, '$b' AS type_b,
                CAST(count(*) AS BIGINT) AS n_days,
                round(CAST(CAST(count(*) AS DECIMAL(38,0))
                      * sum(CAST($a AS DECIMAL(38,0))
                        * CAST($b AS DECIMAL(38,0)))
                    - CAST(sum($a) AS DECIMAL(38,0))
                      * CAST(sum($b) AS DECIMAL(38,0)) AS DOUBLE)
                  / (sqrt(CAST(CAST(count(*) AS DECIMAL(38,0))
                      * sum(CAST($a AS DECIMAL(38,0))
                        * CAST($a AS DECIMAL(38,0)))
                    - CAST(sum($a) AS DECIMAL(38,0))
                      * CAST(sum($a) AS DECIMAL(38,0)) AS DOUBLE))
                    * sqrt(CAST(CAST(count(*) AS DECIMAL(38,0))
                      * sum(CAST($b AS DECIMAL(38,0))
                        * CAST($b AS DECIMAL(38,0)))
                    - CAST(sum($b) AS DECIMAL(38,0))
                      * CAST(sum($b) AS DECIMAL(38,0)) AS DOUBLE))),
                  6) AS r
           FROM pivoted"""
      }.mkString(" UNION ALL ")
      s"""WITH pivoted AS (
           SELECT CAST(ts AS DATE) AS day, $cols
           FROM events GROUP BY 1)
         SELECT * FROM ($legs) ORDER BY type_a, type_b"""
    },
    "q272_twap_daily" ->
      """WITH ev AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  epoch_us(ts) AS us,
                  CAST(floor(value * 100.0) AS BIGINT) AS cents
           FROM events),
         h AS (
           SELECT event_type, cents,
                  coalesce(lead(us) OVER (PARTITION BY event_type, day
                      ORDER BY us),
                    epoch_us(CAST(day + 1 AS TIMESTAMP))) - us AS hold
           FROM ev)
         SELECT event_type, count(*)::BIGINT AS n_events,
                round(CAST(sum(CAST(cents AS DECIMAL(38,0))
                      * CAST(hold AS DECIMAL(38,0))) AS DOUBLE)
                  / (CAST(sum(CAST(hold AS DECIMAL(38,0))) AS DOUBLE)
                     * 100.0), 4) AS twap_dollars,
                round(CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * 100.0), 4)
                  AS mean_dollars
         FROM h GROUP BY 1 ORDER BY 1""",
    "q273_trimmed_mean" ->
      """WITH o AS (
           SELECT CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents,
                  o_orderkey
           FROM orders),
         r AS (
           SELECT cents,
                  CAST(row_number() OVER (ORDER BY cents, o_orderkey)
                    AS BIGINT) AS rk,
                  CAST(count(*) OVER () AS BIGINT) AS n
           FROM o),
         p AS (SELECT cents, rk, n, n * 5 // 100 AS k FROM r),
         b AS (
           SELECT max(CASE WHEN rk = k + 1 THEN cents END) AS lo,
                  max(CASE WHEN rk = n - k THEN cents END) AS hi
           FROM p)
         SELECT max(n) AS n_rows, max(k) AS k_trimmed_each_side,
                (SELECT lo FROM b) AS lo_clamp_cents,
                (SELECT hi FROM b) AS hi_clamp_cents,
                round(CAST(sum(CASE WHEN rk > k AND rk <= n - k
                    THEN cents ELSE 0 END) AS DOUBLE)
                  / (CAST(sum(CASE WHEN rk > k AND rk <= n - k
                      THEN 1 ELSE 0 END) AS DOUBLE) * 100.0), 4)
                  AS trimmed_mean_dollars,
                round(CAST(sum(CASE WHEN rk <= k
                      THEN (SELECT lo FROM b)
                    WHEN rk > n - k THEN (SELECT hi FROM b)
                    ELSE cents END) AS DOUBLE)
                  / (CAST(max(n) AS DOUBLE) * 100.0), 4)
                  AS winsor_mean_dollars,
                round(CAST(sum(cents) AS DOUBLE)
                  / (CAST(max(n) AS DOUBLE) * 100.0), 4)
                  AS raw_mean_dollars
         FROM p""",
    "q270_kmeans_lloyd" -> {
      // one Lloyd round: assign by squared distance (ties → lower
      // cid), recompute centroids as BIGINT // means, empty cluster
      // keeps its centroid — unrolled 3× as chained CTEs
      def round(i: Int) =
        s"""a$i AS (
           SELECT pid, x, y, cid,
                  row_number() OVER (PARTITION BY pid ORDER BY
                    (x - cx) * (x - cx) + (y - cy) * (y - cy), cid)
                    AS rn
           FROM p CROSS JOIN c${i - 1}),
         c$i AS (
           SELECT c.cid, coalesce(u.ncx, c.cx) AS cx,
                  coalesce(u.ncy, c.cy) AS cy
           FROM c${i - 1} c LEFT JOIN (
             SELECT cid, CAST(sum(x) AS BIGINT) // count(*) AS ncx,
                    CAST(sum(y) AS BIGINT) // count(*) AS ncy
             FROM a$i WHERE rn = 1 GROUP BY cid) u
             ON u.cid = c.cid)"""
      s"""WITH pts AS (
           SELECT o_custkey AS pid,
                  CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS x,
                  count(*)::BIGINT AS n
           FROM orders GROUP BY 1),
         p AS (SELECT pid, x, x // n AS y FROM pts),
         c0 AS (
           SELECT CAST(row_number() OVER (ORDER BY pid) AS INT) AS cid,
                  x AS cx, y AS cy
           FROM (SELECT pid, x, y FROM p ORDER BY pid LIMIT 4)),
         ${round(1)},
         ${round(2)},
         ${round(3)},
         af AS (
           SELECT pid, x, y, cid, cx, cy,
                  row_number() OVER (PARTITION BY pid ORDER BY
                    (x - cx) * (x - cx) + (y - cy) * (y - cy), cid)
                    AS rn
           FROM p CROSS JOIN c3)
         SELECT cid, count(*)::BIGINT AS n_points,
                CAST(min(cx) AS BIGINT) AS cx_cents,
                CAST(min(cy) AS BIGINT) AS cy_cents,
                CAST(sum(((x - cx) * (x - cx) + (y - cy) * (y - cy))
                  // 10000) AS BIGINT) AS wcss_sqdollars
         FROM af WHERE rn = 1
         GROUP BY cid ORDER BY cid"""
    },
    "q271_poisson_bootstrap" ->
      s"""WITH base AS (
           SELECT o_orderkey,
                  CAST(floor(o_totalprice * 100.0) AS BIGINT) AS v
           FROM orders),
         rep AS (
           SELECT b.b, v,
                  CAST('0x' || substr(md5(o_orderkey::VARCHAR || '_bs'
                    || b.b::VARCHAR), 1, 15) AS BIGINT) % 1000000 AS u
           FROM base CROSS JOIN
             (SELECT unnest(range(1, 33)) AS b) b),
         mult AS (
           SELECT b, v,
                  CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                       WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                       WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
                       ELSE 6 END AS m
           FROM rep),
         means AS (
           SELECT CAST(sum(m * v) AS DOUBLE)
                    / CAST(sum(m) AS DOUBLE) AS mean_b
           FROM mult GROUP BY b),
         pt AS (
           SELECT CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                    AS mean_hat
           FROM base)
         SELECT count(*)::BIGINT AS n_reps,
                round((SELECT mean_hat FROM pt), 4) AS mean_cents,
                round(min(mean_b), 4) AS ci_lo_cents,
                round(max(mean_b), 4) AS ci_hi_cents,
                round(sqrt((${Q.dsumAtSql("mean_b * mean_b", 4)}
                  - ${Q.dsumAtSql("mean_b", 4)}
                    * ${Q.dsumAtSql("mean_b", 4)}
                    / CAST(count(*) AS DOUBLE))
                  / (CAST(count(*) AS DOUBLE) - 1.0)), 4) AS se_cents
         FROM means""",
    "q267_mann_kendall" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
                  CAST(sum(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         tg AS (
           SELECT event_type, count(*)::BIGINT AS t
           FROM daily GROUP BY event_type, y),
         ties AS (
           SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
                  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                    AS tie_adj
           FROM tg GROUP BY 1)
         SELECT s.event_type, ties.n AS n_days, s.s_stat,
                ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie_adj
                  AS var_s18,
                round((CASE WHEN s.s_stat > 0
                         THEN CAST(s.s_stat - 1 AS DOUBLE)
                       WHEN s.s_stat < 0
                         THEN CAST(s.s_stat + 1 AS DOUBLE)
                       ELSE 0.0 END)
                  / sqrt(CAST(ties.n * (ties.n - 1) * (2 * ties.n + 5)
                      - ties.tie_adj AS DOUBLE) / 18.0), 6) AS z
         FROM s JOIN ties ON s.event_type = ties.event_type
         ORDER BY s.event_type""",
    "q268_theil_sen" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, y,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS t
           FROM daily),
         slopes AS (
           SELECT a.event_type,
                  (b.y - a.y) * 1000000 // (b.t - a.t) AS su
           FROM idx a JOIN idx b
             ON a.event_type = b.event_type AND a.t < b.t),
         ranked AS (
           SELECT event_type, su,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY su) AS BIGINT) AS r,
                  CAST(count(*) OVER (PARTITION BY event_type)
                    AS BIGINT) AS m
           FROM slopes)
         SELECT event_type, max(m) AS n_pairs,
                CAST(min(su) AS BIGINT) AS lo_ucents,
                CAST(max(su) AS BIGINT) AS hi_ucents,
                round(CAST(min(su) + max(su) AS DOUBLE) / 2000000.0, 4)
                  AS slope_cents_per_day
         FROM ranked
         WHERE r = (m + 1) // 2 OR r = (m + 2) // 2
         GROUP BY event_type ORDER BY event_type""",
    "q269_leadlag_corr" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         clicks AS (SELECT day, y AS x FROM daily
                    WHERE event_type = 'click'),
         purch AS (SELECT day AS pday, y AS py FROM daily
                   WHERE event_type = 'purchase'),
         lagged AS (
           SELECT c.day, c.x, l.lg,
                  c.day + CAST(l.lg AS INTEGER) AS mday
           FROM clicks c CROSS JOIN (
             SELECT unnest(range(-7, 8)) AS lg) l),
         mom AS (
           SELECT lg,
                  CAST(count(*) AS DECIMAL(38,0)) AS n,
                  CAST(sum(x) AS DECIMAL(38,0)) AS sx,
                  CAST(sum(py) AS DECIMAL(38,0)) AS sy,
                  sum(CAST(x AS DECIMAL(38,0))
                    * CAST(py AS DECIMAL(38,0))) AS sxy,
                  sum(CAST(x AS DECIMAL(38,0))
                    * CAST(x AS DECIMAL(38,0))) AS sxx,
                  sum(CAST(py AS DECIMAL(38,0))
                    * CAST(py AS DECIMAL(38,0))) AS syy
           FROM lagged JOIN purch ON mday = pday
           GROUP BY 1)
         SELECT CAST(lg AS INT) AS lag_days, CAST(n AS BIGINT) AS n_days,
                round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
                  AS r
         FROM mom ORDER BY lag_days""",
    "q265_ses_forecast" -> {
      val lags = (1 to 14).map(i =>
        s"lag(y, $i) OVER (PARTITION BY event_type ORDER BY day) AS l$i")
        .mkString(", ")
      val f = (1 to 13).map(i => s"l$i * ${1L << (13 - i)}")
        .mkString(" + ") + " + l14"
      s"""WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT event_type, day, y, $lags FROM daily),
         f AS (
           SELECT event_type, day, y AS actual_cents,
                  CAST($f AS BIGINT) AS f8192
           FROM lagged WHERE l14 IS NOT NULL)
         SELECT event_type, day, actual_cents, f8192,
                f8192 // 8192 AS forecast_cents,
                actual_cents - (f8192 // 8192) AS err_cents
         FROM f ORDER BY event_type, day"""
    },
    "q263_kaplan_meier" ->
      """WITH RECURSIVE dm AS (
           SELECT max(CAST(o_orderdate AS DATE)) AS dmax FROM orders),
         cust AS (
           SELECT min(CAST(o_orderdate AS DATE)) AS f,
                  max(CAST(o_orderdate AS DATE)) AS l
           FROM orders GROUP BY o_custkey),
         t AS (
           SELECT l > (SELECT dmax - 90 FROM dm) AS censored,
                  CASE WHEN l > (SELECT dmax - 90 FROM dm)
                       THEN (SELECT dmax FROM dm) - f
                       ELSE l - f END AS td
           FROM cust),
         steps AS (
           SELECT CAST(td // 180 AS BIGINT) AS bucket,
                  sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT
                    AS d,
                  sum(CASE WHEN censored THEN 1 ELSE 0 END)::BIGINT
                    AS c
           FROM t GROUP BY 1),
         ordered AS (
           SELECT bucket, d, c,
                  CAST(row_number() OVER (ORDER BY bucket) AS BIGINT)
                    AS i,
                  CAST((SELECT sum(d + c) FROM steps)
                    - coalesce(sum(d + c) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
           FROM steps),
         km AS (
           SELECT CAST(0 AS BIGINT) AS i, CAST(1000000000 AS BIGINT)
                    AS s
           UNION ALL
           SELECT o.i, k.s * (o.n_risk - o.d) // o.n_risk
           FROM km k JOIN ordered o ON o.i = k.i + 1)
         SELECT o.bucket, o.bucket * 180 AS t_days, o.n_risk,
                o.d AS d_churn, o.c AS c_censored, k.s AS surv_ppb
         FROM ordered o JOIN km k ON k.i = o.i
         ORDER BY o.bucket""",
    "q262_ols_trend" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  sum(CAST(floor(value * 100.0) AS BIGINT)) AS y
           FROM events GROUP BY 1, 2),
         idx AS (
           SELECT event_type, y,
                  CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS t
           FROM daily),
         m AS (
           SELECT event_type,
                  CAST(count(*) AS DECIMAL(38,0)) AS n,
                  CAST(sum(t) AS DECIMAL(38,0)) AS st,
                  CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                  CAST(sum(t * y) AS DECIMAL(38,0)) AS sty,
                  CAST(sum(t * t) AS DECIMAL(38,0)) AS stt,
                  sum(CAST(y AS DECIMAL(38,0))
                      * CAST(y AS DECIMAL(38,0))) AS syy
           FROM idx GROUP BY 1),
         d AS (
           SELECT event_type, n,
                  n * sty - st * sy AS cov_n,
                  n * stt - st * st AS var_t_n,
                  n * syy - sy * sy AS var_y_n,
                  sy * stt - st * sty AS ic_n
           FROM m)
         SELECT event_type, CAST(n AS BIGINT) AS n_days,
                round(CAST(cov_n AS DOUBLE) / CAST(var_t_n AS DOUBLE), 4)
                  AS slope_cents_per_day,
                round(CAST(ic_n AS DOUBLE) / CAST(var_t_n AS DOUBLE), 4)
                  AS intercept_cents,
                round((CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE))
                  / (CAST(var_t_n AS DOUBLE) * CAST(var_y_n AS DOUBLE)), 6)
                  AS r2
         FROM d ORDER BY event_type""",
    "q259_interarrival" ->
      """WITH g AS (
           SELECT event_type,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY epoch_us(ts)) AS gap
           FROM events)
         SELECT event_type, count(*)::BIGINT AS n_gaps,
           round(CAST(sum(gap) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 1000000.0), 3)
             AS mean_gap_sec,
           round(CAST(count(*) AS DOUBLE) * 3600000000.0
             / CAST(sum(gap) AS DOUBLE), 4) AS rate_per_hour,
           sum(CASE WHEN gap < 60000000 THEN 1 ELSE 0 END)::BIGINT
             AS n_lt_1m,
           sum(CASE WHEN gap >= 60000000 AND gap < 3600000000
             THEN 1 ELSE 0 END)::BIGINT AS n_lt_1h,
           sum(CASE WHEN gap >= 3600000000 AND gap < 86400000000
             THEN 1 ELSE 0 END)::BIGINT AS n_lt_1d,
           sum(CASE WHEN gap >= 86400000000 THEN 1 ELSE 0 END)::BIGINT
             AS n_ge_1d
         FROM g WHERE gap IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    "q255_linear_attribution" ->
      """WITH cn AS (
           SELECT user_id, event_type, epoch_us(ts) AS us,
             coalesce(sum(CASE WHEN event_type = 'click' THEN 1
                 ELSE 0 END) OVER uw, 0) AS c_click,
             coalesce(sum(CASE WHEN event_type = 'view' THEN 1
                 ELSE 0 END) OVER uw, 0) AS c_view,
             coalesce(sum(CASE WHEN event_type = 'signup' THEN 1
                 ELSE 0 END) OVER uw, 0) AS c_signup,
             coalesce(sum(CASE WHEN event_type = 'error' THEN 1
                 ELSE 0 END) OVER uw, 0) AS c_error
           FROM events
           WINDOW uw AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)),
         pur AS (
           SELECT c_click, c_view, c_signup, c_error,
                  c_click + c_view + c_signup + c_error AS n
           FROM cn WHERE event_type = 'purchase'),
         legs AS (
           SELECT 'click' AS touch, CASE WHEN n > 0
             THEN (1000000 * c_click) // n ELSE 0 END AS credit FROM pur
           UNION ALL
           SELECT 'view', CASE WHEN n > 0
             THEN (1000000 * c_view) // n ELSE 0 END FROM pur
           UNION ALL
           SELECT 'signup', CASE WHEN n > 0
             THEN (1000000 * c_signup) // n ELSE 0 END FROM pur
           UNION ALL
           SELECT 'error', CASE WHEN n > 0
             THEN (1000000 * c_error) // n ELSE 0 END FROM pur
           UNION ALL
           SELECT 'direct', CASE WHEN n = 0 THEN 1000000 ELSE 0 END
           FROM pur)
         SELECT touch, count(*)::BIGINT AS n_purchases,
                sum(credit)::BIGINT AS credit_ppm
         FROM legs WHERE credit > 0
         GROUP BY touch ORDER BY touch""",
    "q257_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  sum(CAST(floor(value * 100.0) AS BIGINT)) AS x
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, count(*)::BIGINT AS n_days,
                  sum(x)::BIGINT AS s_tot
           FROM daily GROUP BY 1),
         cum AS (
           SELECT d.event_type, d.day, t.n_days,
                  CAST(t.n_days AS DECIMAL(38,0))
                    * CAST(sum(d.x) OVER (PARTITION BY d.event_type
                        ORDER BY d.day) AS DECIMAL(38,0))
                  - CAST(row_number() OVER (PARTITION BY d.event_type
                        ORDER BY d.day) AS DECIMAL(38,0))
                    * CAST(t.s_tot AS DECIMAL(38,0)) AS c
           FROM daily d JOIN tot t ON d.event_type = t.event_type),
         peaks AS (
           SELECT event_type, max(abs(c)) AS c_abs_max
           FROM cum GROUP BY 1)
         SELECT c.event_type, max(c.n_days) AS n_days,
                min(c.day) AS cp_day,
                round(CAST(max(p.c_abs_max) AS DOUBLE)
                  / (CAST(max(c.n_days) AS DOUBLE) * 100.0), 4)
                  AS max_dev_dollar_days,
                CAST(min(CASE WHEN c.c > 0 THEN 1 WHEN c.c < 0 THEN -1
                  ELSE 0 END) AS INT) AS shift_sign
         FROM cum c JOIN peaks p
           ON c.event_type = p.event_type AND abs(c.c) = p.c_abs_max
         GROUP BY c.event_type ORDER BY c.event_type""",
    "q252_ab_ztest" ->
      """WITH u AS (
           SELECT CAST('0x' || substr(md5(user_id::VARCHAR || '_ab'),
                    1, 15) AS BIGINT) % 2 AS arm,
                  max(CASE WHEN event_type = 'purchase'
                               AND value > 150.0 THEN 1
                      ELSE 0 END) AS conv
           FROM events GROUP BY user_id),
         t AS (
           SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT
                    AS n_a,
                  sum(CASE WHEN arm = 0 THEN conv ELSE 0 END)::BIGINT
                    AS conv_a,
                  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_b,
                  sum(CASE WHEN arm = 1 THEN conv ELSE 0 END)::BIGINT
                    AS conv_b
           FROM u)
         SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
             AS rate_a,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
             AS rate_b,
           round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt(((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                 * (1.0 - (CAST(conv_a AS DOUBLE)
                           + CAST(conv_b AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                 * (1.0 / CAST(n_a AS DOUBLE)
                    + 1.0 / CAST(n_b AS DOUBLE))), 4) AS z,
           abs((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt(((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                 * (1.0 - (CAST(conv_a AS DOUBLE)
                           + CAST(conv_b AS DOUBLE))
                      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                 * (1.0 / CAST(n_a AS DOUBLE)
                    + 1.0 / CAST(n_b AS DOUBLE)))) > 1.96
             AS significant
         FROM t""",
    "q253_equidepth_hist" ->
      // boundary values by exact rank over (v, key); bucket = 1 +
      // #(boundaries < v) — identical tie rule to the engine
      s"""WITH ranked AS (
            SELECT o_totalprice AS v,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                     AS rn,
                   count(*) OVER () AS n
            FROM orders),
          bounds AS (
            SELECT v AS bv FROM ranked r
            WHERE EXISTS (SELECT 1 FROM (VALUES (1),(2),(3),(4),(5),
                            (6),(7)) t(k)
                          WHERE r.rn = (r.n * t.k + 7) // 8)),
          bkt AS (
            SELECT v, 1 + (SELECT count(*) FROM bounds b
                           WHERE b.bv < ranked.v) AS bucket
            FROM ranked)
          SELECT CAST(bucket AS INT) AS bucket,
                 count(*)::BIGINT AS n_rows,
                 min(v) AS lo, max(v) AS hi,
                 ${dsumSql("v")} AS total
          FROM bkt GROUP BY bucket ORDER BY bucket""",
    "q249_peak_concurrency" ->
      // one global-per-type window replays the engine's two-level
      // decomposition — same default RANGE frame, so tied (t, d)
      // rows share one concurrency value in both engines
      """WITH deltas AS (
           SELECT event_type, ts AS t, 1 AS d FROM events
           UNION ALL
           SELECT event_type, ts + INTERVAL 300 SECOND AS t, -1 AS d
           FROM events),
         cums AS (
           SELECT event_type, t,
                  CAST(sum(d) OVER (PARTITION BY event_type
                                    ORDER BY t, d) AS BIGINT) AS cum
           FROM deltas),
         peaks AS (
           SELECT event_type, max(cum) AS peak FROM cums GROUP BY 1)
         SELECT c.event_type, max(c.cum) AS peak,
                min(c.t) AS first_peak_ts,
                count(*)::BIGINT AS n_at_peak
         FROM cums c JOIN peaks p
           ON c.event_type = p.event_type AND c.cum = p.peak
         GROUP BY c.event_type ORDER BY c.event_type""",
    "q250_basket_lift" ->
      """WITH ob AS (
           SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob),
         s AS (SELECT brand, count(*)::BIGINT AS n1 FROM ob
               GROUP BY brand),
         p AS (SELECT x.brand AS a, y.brand AS b,
                      count(*)::BIGINT AS n_ab
               FROM ob x JOIN ob y
                 ON x.ok = y.ok AND x.brand < y.brand
               GROUP BY 1, 2)
         SELECT a AS brand_a, b AS brand_b, n_ab,
                sa.n1 AS n_a, sb.n1 AS n_b,
                round(CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE) /
                  (CAST(sa.n1 AS DOUBLE) * CAST(sb.n1 AS DOUBLE)), 6)
                  AS lift
         FROM p JOIN s sa ON p.a = sa.brand
                JOIN s sb ON p.b = sb.brand
                CROSS JOIN n
         WHERE n_ab >= 20
         ORDER BY lift DESC, brand_a, brand_b LIMIT 25""",
    "q235_order_reconciliation" ->
      """WITH li AS (
           SELECT l_orderkey,
                  sum(CAST(floor(l_extendedprice
                    * (CAST(1.0 AS DOUBLE) + l_tax)
                    * (CAST(1.0 AS DOUBLE) - l_discount)
                    * CAST(100.0 AS DOUBLE)) AS BIGINT))::BIGINT
                    AS line_cents
           FROM lineitem GROUP BY l_orderkey),
         o AS (SELECT o_orderkey,
                 CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE))
                   AS BIGINT) AS total_cents
               FROM orders),
         j AS (SELECT o.total_cents, li.line_cents,
                 abs(li.line_cents - o.total_cents)::DOUBLE
                   / o.total_cents::DOUBLE AS rel
               FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
         SELECT CASE WHEN line_cents IS NULL THEN 'no_lineitems'
                     WHEN line_cents = total_cents THEN 'exact'
                     WHEN rel < 0.01 THEN 'lt_1pct'
                     WHEN rel < 0.1 THEN 'lt_10pct'
                     WHEN rel < 0.5 THEN 'lt_50pct'
                     ELSE 'ge_50pct' END AS bucket,
                count(*)::BIGINT AS n_orders,
                max(round(rel, 6)) AS max_rel_err
         FROM j GROUP BY 1 ORDER BY bucket""",
    "q236_revenue_gini" ->
      """WITH rev AS (
           SELECT o_custkey,
                  sum(CAST(floor(l_extendedprice
                    * (CAST(1.0 AS DOUBLE) - l_discount)
                    * CAST(100.0 AS DOUBLE)) AS BIGINT))::BIGINT AS r
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY o_custkey),
         ranked AS (SELECT r,
                      row_number() OVER (ORDER BY r, o_custkey) AS i
                    FROM rev),
         base AS (SELECT count(*)::BIGINT AS n_customers,
                    CAST(sum(CAST(r AS DECIMAL(19,0))) AS DOUBLE) AS tot,
                    CAST(sum(CAST(i AS DECIMAL(19,0))
                      * CAST(r AS DECIMAL(19,0))) AS DOUBLE) AS s_ir
                  FROM ranked),
         top AS (SELECT CAST(coalesce(sum(CAST(r AS DECIMAL(19,0))), 0)
                   AS DOUBLE) AS top_cents
                 FROM ranked, base
                 WHERE i > n_customers - n_customers // 10)
         SELECT n_customers,
                round(CAST(2.0 AS DOUBLE) * s_ir
                    / (n_customers::DOUBLE * tot)
                  - (n_customers::DOUBLE + CAST(1.0 AS DOUBLE))
                    / n_customers::DOUBLE, 6) AS gini,
                round(top_cents / tot, 6) AS top10_share
         FROM base, top""",
    "q238_benford_audit" ->
      """WITH d AS (
           SELECT substr(CAST(CAST(floor(o_totalprice
                    * CAST(100.0 AS DOUBLE)) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit,
                  count(*)::BIGINT AS n_obs
           FROM orders GROUP BY 1),
         t AS (SELECT sum(n_obs)::BIGINT AS n_total FROM d),
         b(digit, p_benford) AS (VALUES
           ('1', CAST('0.301029995664' AS DOUBLE)),
           ('2', CAST('0.176091259056' AS DOUBLE)),
           ('3', CAST('0.124938736608' AS DOUBLE)),
           ('4', CAST('0.096910013008' AS DOUBLE)),
           ('5', CAST('0.079181246048' AS DOUBLE)),
           ('6', CAST('0.066946789631' AS DOUBLE)),
           ('7', CAST('0.057991946978' AS DOUBLE)),
           ('8', CAST('0.051152522447' AS DOUBLE)),
           ('9', CAST('0.045757490561' AS DOUBLE)))
         SELECT d.digit, d.n_obs, t.n_total,
                round(d.n_obs::DOUBLE / t.n_total::DOUBLE, 6) AS p_obs,
                b.p_benford,
                round((d.n_obs::DOUBLE - t.n_total::DOUBLE * b.p_benford)
                  * (d.n_obs::DOUBLE - t.n_total::DOUBLE * b.p_benford)
                  / (t.n_total::DOUBLE * b.p_benford), 6) AS chi2_contrib
         FROM d JOIN b USING (digit), t
         ORDER BY d.digit""",
    "q239_weekday_anomaly" ->
      """WITH daily AS (
           SELECT event_type, ts::DATE AS day,
                  sum(CAST(floor(value * CAST(100.0 AS DOUBLE))
                    AS BIGINT))::BIGINT AS x
           FROM events GROUP BY 1, 2),
         d2 AS (SELECT *, isodow(day) - 1 AS wd FROM daily),
         base AS (SELECT event_type, wd,
                    CAST(sum(CAST(x AS DECIMAL(19,0))) AS DOUBLE)
                      / count(*)::DOUBLE AS wd_mean
                  FROM d2 GROUP BY 1, 2)
         SELECT d.event_type, d.day, d.x,
                round(d.x::DOUBLE / b.wd_mean, 6) AS ratio,
                CASE WHEN round(d.x::DOUBLE / b.wd_mean, 6)
                         > CAST('1.3' AS DOUBLE)
                       OR round(d.x::DOUBLE / b.wd_mean, 6)
                         < CAST('0.7' AS DOUBLE)
                     THEN 1 ELSE 0 END AS is_anomaly
         FROM d2 d JOIN base b USING (event_type, wd)
         ORDER BY d.event_type, d.day""",
    "q248_growth_accounting" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, ts::DATE AS day FROM events),
         fst AS (SELECT user_id, min(day) AS first_day
                 FROM ud GROUP BY user_id),
         yest AS (SELECT DISTINCT user_id, day + 1 AS day FROM ud),
         st AS (SELECT u.day,
                  CASE WHEN u.day = f.first_day THEN 'new'
                       WHEN y.user_id IS NOT NULL THEN 'retained'
                       ELSE 'resurrected' END AS state
                FROM ud u
                JOIN fst f ON u.user_id = f.user_id
                LEFT JOIN yest y
                  ON y.user_id = u.user_id AND y.day = u.day),
         states AS (
           SELECT day,
             count(CASE WHEN state = 'new' THEN 1 END)::BIGINT AS n_new,
             count(CASE WHEN state = 'retained' THEN 1 END)::BIGINT
               AS n_retained,
             count(CASE WHEN state = 'resurrected' THEN 1 END)::BIGINT
               AS n_resurrected
           FROM st GROUP BY day),
         dau AS (SELECT day, count(*)::BIGINT AS dau
                 FROM ud GROUP BY day),
         dp AS (SELECT day + 1 AS day, dau AS dau_prev FROM dau)
         SELECT s.day, d.dau, s.n_new, s.n_retained, s.n_resurrected,
                (coalesce(dp.dau_prev, 0) - s.n_retained)::BIGINT
                  AS n_churned
         FROM states s
         JOIN dau d ON s.day = d.day
         LEFT JOIN dp ON dp.day = s.day
         ORDER BY s.day""",
    "q244_pareto_frontier" ->
      """WITH pts AS (
           SELECT p_brand,
                  CAST(floor(p_retailprice * CAST(100.0 AS DOUBLE))
                    AS BIGINT) AS price_cents,
                  p_size, count(*)::BIGINT AS n_parts
           FROM part GROUP BY 1, 2, 3),
         m AS (SELECT *,
                 max(p_size) OVER (PARTITION BY p_brand
                   ORDER BY price_cents ASC, p_size DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS max_sz_before
               FROM pts)
         SELECT p_brand, price_cents, p_size, n_parts
         FROM m
         WHERE max_sz_before IS NULL OR max_sz_before < p_size
         ORDER BY p_brand, price_cents""",
    "q240_rfm_segments" ->
      """WITH o AS (
           SELECT o_custkey, o_orderdate::DATE AS d,
                  CAST(floor(o_totalprice * CAST(100.0 AS DOUBLE))
                    AS BIGINT) AS cents
           FROM orders),
         c AS (SELECT o_custkey, max(d) AS last_d,
                      count(*)::BIGINT AS f,
                      CAST(sum(CAST(cents AS DECIMAL(19,0))) AS BIGINT)
                        AS m
               FROM o GROUP BY o_custkey),
         mx AS (SELECT max(d) AS maxd FROM o),
         r AS (SELECT c.*, date_diff('day', last_d, maxd) AS rec
               FROM c, mx),
         th AS (SELECT
                  quantile_cont(rec, 0.2) AS r1, quantile_cont(rec, 0.4) AS r2,
                  quantile_cont(rec, 0.6) AS r3, quantile_cont(rec, 0.8) AS r4,
                  quantile_cont(f, 0.2) AS f1, quantile_cont(f, 0.4) AS f2,
                  quantile_cont(f, 0.6) AS f3, quantile_cont(f, 0.8) AS f4,
                  quantile_cont(m, 0.2) AS m1, quantile_cont(m, 0.4) AS m2,
                  quantile_cont(m, 0.6) AS m3, quantile_cont(m, 0.8) AS m4
                FROM r),
         seg AS (SELECT
                   ((1 + (rec::DOUBLE <= r4)::INT + (rec::DOUBLE <= r3)::INT
                       + (rec::DOUBLE <= r2)::INT + (rec::DOUBLE <= r1)::INT)
                     ::VARCHAR
                    || (1 + (f::DOUBLE > f1)::INT + (f::DOUBLE > f2)::INT
                          + (f::DOUBLE > f3)::INT + (f::DOUBLE > f4)::INT)
                        ::VARCHAR
                    || (1 + (m::DOUBLE > m1)::INT + (m::DOUBLE > m2)::INT
                          + (m::DOUBLE > m3)::INT + (m::DOUBLE > m4)::INT)
                        ::VARCHAR) AS seg,
                   m
                 FROM r, th)
         SELECT seg, count(*)::BIGINT AS n_customers,
                CAST(sum(CAST(m AS DECIMAL(19,0))) AS BIGINT)
                  AS total_cents
         FROM seg GROUP BY seg ORDER BY seg""",
    "q230_wilson_ranking" ->
      // the IDENTICAL expression tree as the Spark side: every op is
      // IEEE correctly-rounded, so same tree → same double
      """WITH agg AS (
           SELECT source, count(*)::BIGINT AS n_docs,
                  count(CASE WHEN n_chars >= 400 THEN 1 END)::BIGINT
                    AS n_long
           FROM documents GROUP BY source)
         SELECT source, n_docs, n_long,
                round(n_long::DOUBLE / n_docs::DOUBLE, 6) AS p_raw,
                round(
                  ((n_long::DOUBLE / n_docs::DOUBLE)
                    + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                      / (CAST(2.0 AS DOUBLE) * n_docs::DOUBLE)
                    - CAST(1.96 AS DOUBLE) * sqrt(
                        ((n_long::DOUBLE / n_docs::DOUBLE)
                          * (CAST(1.0 AS DOUBLE)
                             - n_long::DOUBLE / n_docs::DOUBLE)
                         + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                           / (CAST(4.0 AS DOUBLE) * n_docs::DOUBLE))
                        / n_docs::DOUBLE))
                  / (CAST(1.0 AS DOUBLE)
                     + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                       / n_docs::DOUBLE), 6) AS wilson_low
         FROM agg
         ORDER BY wilson_low DESC, source""",
    "q231_mad_outliers" ->
      """WITH med AS (
           SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY event_type),
         mad AS (
           SELECT e.event_type,
                  quantile_cont(abs(e.value - m.med), 0.5) AS mad
           FROM events e JOIN med m USING (event_type)
           GROUP BY e.event_type)
         SELECT e.event_type, count(*)::BIGINT AS n,
                max(round(m.med, 6)) AS med,
                max(round(d.mad, 6)) AS mad,
                count(CASE WHEN abs(e.value - m.med) >
                  CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * d.mad
                  THEN 1 END)::BIGINT AS n_outliers,
                round(count(CASE WHEN abs(e.value - m.med) >
                    CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * d.mad
                    THEN 1 END)::DOUBLE / count(*)::DOUBLE, 6)
                  AS outlier_rate
         FROM events e JOIN med m USING (event_type)
                       JOIN mad d USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    "q232_autocorr_daily" ->
      """WITH daily AS (
           SELECT event_type, ts::DATE AS day,
                  sum(CAST(floor(value * CAST(100.0 AS DOUBLE)) AS BIGINT))
                    ::BIGINT AS x
           FROM events GROUP BY event_type, ts::DATE),
         pairs AS (
           SELECT event_type,
                  CAST(x AS DECIMAL(19,0)) AS x,
                  CAST(lag(x) OVER (PARTITION BY event_type
                    ORDER BY day) AS DECIMAL(19,0)) AS y
           FROM daily
           QUALIFY y IS NOT NULL),
         m AS (
           SELECT event_type, count(*)::BIGINT AS n_pairs,
                  CAST(sum(x) AS DOUBLE) AS sx,
                  CAST(sum(y) AS DOUBLE) AS sy,
                  CAST(sum(x * y) AS DOUBLE) AS sxy,
                  CAST(sum(x * x) AS DOUBLE) AS sxx,
                  CAST(sum(y * y) AS DOUBLE) AS syy
           FROM pairs GROUP BY event_type)
         SELECT event_type, n_pairs,
                round((n_pairs::DOUBLE * sxy - sx * sy) /
                  (sqrt(n_pairs::DOUBLE * sxx - sx * sx) *
                   sqrt(n_pairs::DOUBLE * syy - sy * sy)), 6) AS r_lag1
         FROM m ORDER BY event_type""",
    "q119_journey_transitions" ->
      """SELECT prev_type, event_type,
                count(*)::BIGINT AS n_transitions
         FROM (
           SELECT event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS prev_type
           FROM events)
         WHERE prev_type IS NOT NULL
         GROUP BY prev_type, event_type
         ORDER BY prev_type, event_type""",

    "q207_transition_closure" ->
      """WITH RECURSIVE ordered AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_type
            FROM events),
          edges AS (
            SELECT DISTINCT event_type AS src, next_type AS dst
            FROM ordered
            WHERE next_type IS NOT NULL AND next_type <> event_type),
          reach(src, dst, hops) AS (
            SELECT src, dst, 1 AS hops FROM edges
            UNION ALL
            SELECT r.src, e.dst, r.hops + 1
            FROM reach r JOIN edges e ON r.dst = e.src
            WHERE r.hops < 4)
          SELECT src, dst, CAST(min(hops) AS BIGINT) AS min_hops
          FROM reach GROUP BY src, dst ORDER BY src, dst""",

    "q215_pipe_syntax_q1" ->
      """SELECT l_returnflag, l_linestatus,
                count(*) AS count_order,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                  AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q211_lateral_topk" ->
      s"""WITH sc AS (
            SELECT doc_id, source, ${TextQueries.qualitySql("w")} AS q
            FROM (SELECT doc_id, source, string_split(text, ' ') AS w
                  FROM documents))
          SELECT s.source, l.doc_id, l.q
          FROM (SELECT DISTINCT source FROM sc) s,
          LATERAL (SELECT doc_id, q FROM sc d
                   WHERE d.source = s.source
                   ORDER BY d.q DESC, d.doc_id LIMIT 3) l
          ORDER BY s.source, l.q DESC, l.doc_id""",
    "q120_session_duration_histogram" ->
      """WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sessions AS (
            SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
            FROM flagged),
          durs AS (
            SELECT user_id, session_seq,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
            FROM sessions GROUP BY user_id, session_seq)
          SELECT dur_us // 300000000 AS bin,
                 count(*)::BIGINT AS n_sessions,
                 min(dur_us) AS min_us, max(dur_us) AS max_us
          FROM durs GROUP BY bin ORDER BY bin""",
    // exact element picks, never quantile_cont (see the q132 body)
    "q132_rolling_anomaly" ->
      """WITH t AS (
           SELECT event_id, user_id, value,
                  list_sort(list(value) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS trail
           FROM events),
         m AS (SELECT event_id, user_id, value,
                      trail[(len(trail) + 1) // 2] AS med,
                      trail[(len(trail) * 3 + 3) // 4] AS hi,
                      trail[(len(trail) + 3) // 4] AS lo
               FROM t)
         SELECT event_id, user_id, value, med,
                (abs(value - med) > CAST(1.5 AS DOUBLE) * (hi - lo))
                  AS is_anomaly
         FROM m ORDER BY event_id""",
    // µs-truncated ts in both the emit and the trail order — see q105
    "q113_ewma_smoothing" ->
      """SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts,
                value,
                list_reduce(
                  list_transform(trail, (v, i) ->
                    v / (1::BIGINT << (len(trail) - i))::DOUBLE),
                  (acc, x) -> acc + x) AS ewma
         FROM (
           SELECT event_id, user_id, ts, value,
                  list(value) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS trail
           FROM events)
         ORDER BY event_id""",
    "q114_date_spine" ->
      """WITH ev AS (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         daily AS (
           SELECT user_id, day, count(*)::BIGINT AS n_events
           FROM ev GROUP BY user_id, day),
         spine AS (
           SELECT user_id,
                  CAST(unnest(generate_series(d0, d1,
                    INTERVAL 1 DAY)) AS DATE) AS day
           FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
                 FROM ev GROUP BY user_id))
         SELECT s.user_id, s.day,
                coalesce(d.n_events, 0)::BIGINT AS n_events
         FROM spine s LEFT JOIN daily d
           ON s.user_id = d.user_id AND s.day = d.day
         ORDER BY s.user_id, s.day""",
    "q174_local_supplier_volume" ->
      s"""SELECT n_name,
            ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
            count(1) AS n_lines
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
                       AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND year(CAST(o_orderdate AS DATE)) = 1996
          GROUP BY n_name
          ORDER BY revenue DESC, n_name""",
    "q12_star_join_revenue" ->
      s"""SELECT r_name, n_name,
            ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue,
            count(1) AS n_lines
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name
          ORDER BY r_name, n_name""",
    "q13_topk_per_group" ->
      """SELECT c_nationkey, rank_in_nation, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC, c_custkey) AS rank_in_nation
           FROM customer)
         WHERE rank_in_nation <= 3
         ORDER BY c_nationkey, rank_in_nation""",
    "q14_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS running_spend
         FROM orders
         ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "q15_rollup_counts" ->
      """SELECT r_name, n_name, count(1) AS n_orders,
                GROUPING(r_name, n_name) AS gid
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY gid, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q16_distinct_counts" ->
      """SELECT l_returnflag,
                count(DISTINCT l_suppkey) AS n_suppliers,
                count(DISTINCT l_partkey) AS n_parts,
                count(1) AS n_lines
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // q17/q50: the sketch VALUES are engine-specific, but the audit
    // output is replayable — exact companion plus the accuracy
    // contract as a boolean the oracle expects TRUE (the live sketch
    // feeds the predicate on the Spark side; a contract breach flips
    // the driver row red). Retired from the oracle-exempt list in r10.
    "q17_approx_distinct" ->
      """SELECT l_returnflag,
                count(DISTINCT l_orderkey)::BIGINT AS exact_orders,
                TRUE AS hll_within_5pct
         FROM lineitem
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q50_percentile_approx" ->
      """WITH s AS (
           SELECT l_returnflag, l_extendedprice,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                    AS rn,
                  count(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                max(CASE WHEN rn = (n + 1) // 2
                    THEN l_extendedprice END) AS p50_exact,
                TRUE AS gk_within_1pct
         FROM s
         GROUP BY l_returnflag, n
         ORDER BY l_returnflag""",
    "q18_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND year(CAST(o_orderdate AS DATE)) = 1998)
         ORDER BY c_custkey""",
    "q19_set_ops" ->
      """WITH building AS (
           SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
         SELECT c_custkey, 'building_and_rich' AS set_op
         FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM rich)
         UNION ALL
         SELECT c_custkey, 'building_not_rich' AS set_op
         FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM rich)
         ORDER BY set_op, c_custkey""",
    "q20_json_extract" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
         FROM events ORDER BY event_id""",
    "q21_tumbling_window" ->
      s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
            count(1) AS n_events, ${dsumSql("value")} AS total_value
          FROM events
          GROUP BY day, event_type
          ORDER BY day, event_type""",
    "q22_sliding_window" ->
      """SELECT CAST(date_trunc('day', ts) - (o.off * INTERVAL 1 DAY) AS DATE)
                  AS window_start,
                count(1) AS n_events
         FROM events CROSS JOIN (VALUES (0), (1)) AS o(off)
         GROUP BY window_start
         ORDER BY window_start""",
    "q42_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${dsumSql("l_quantity")} AS sum_qty,
            ${dsumSql("l_extendedprice")} AS sum_base_price,
            ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
            ${dsumAtSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 8)} AS sum_charge,
            ${dsumSql("l_quantity")} / count(1) AS avg_qty,
            ${dsumSql("l_extendedprice")} / count(1) AS avg_price,
            ${dsumSql("l_discount")} / count(1) AS avg_disc,
            count(1) AS count_order
          FROM lineitem
          WHERE l_shipdate < TIMESTAMP '1998-09-01'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""",
    "q38_rank_functions" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
                rank() OVER w AS rnk,
                dense_rank() OVER w AS drnk,
                ntile(4) OVER w AS quartile,
                round(percent_rank() OVER w, 9) AS pct_rank,
                lag(c_custkey, 1) OVER w AS prev_cust,
                lead(c_custkey, 1) OVER w AS next_cust
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_nationkey, rnk""",
    "q39_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
                round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
                round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
         FROM lineitem
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q52_date_functions" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
                month(CAST(o_orderdate AS DATE)) AS order_month,
                quarter(CAST(o_orderdate AS DATE)) AS order_quarter,
                isodow(CAST(o_orderdate AS DATE)) - 1 AS order_weekday,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
                  AS month_start,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                  AS plus_quarter
         FROM orders ORDER BY o_orderkey""",
    "q53_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
                nullif(l_discount, 0.0) AS disc_or_null,
                coalesce(nullif(l_discount, 0.0), -1.0) AS disc_coalesced,
                CASE WHEN nullif(l_discount, 0.0)
                       IS NOT DISTINCT FROM nullif(l_tax, 0.0)
                     THEN 1 ELSE 0 END AS null_safe_eq
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, disc_coalesced, null_safe_eq""",
    "q51_unpivot_metrics" ->
      """SELECT l_orderkey, l_linenumber, metric, value
         FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                      l_extendedprice, l_discount, l_tax FROM lineitem)
         UNPIVOT (value FOR metric IN
           (l_quantity, l_extendedprice, l_discount, l_tax))
         ORDER BY l_orderkey, l_linenumber, metric, value""",
    "q47_array_functions" ->
      """SELECT vec_id,
                len(embedding) AS dim,
                round(list_max(list_transform(embedding,
                  x -> abs(x::DOUBLE))), 6) AS max_abs,
                len(list_filter(embedding, x -> x > 0)) AS n_positive,
                CASE WHEN len(list_filter(embedding,
                  x -> x::DOUBLE > 0.3)) > 0 THEN 1 ELSE 0 END AS has_large,
                round(embedding[1]::DOUBLE, 6) AS first_component
         FROM embeddings
         ORDER BY vec_id""",
    "q48_string_functions" ->
      """SELECT c_custkey,
                upper(c_mktsegment) AS seg_upper,
                lower(c_name) AS name_lower,
                regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
                substr(c_name, 1, 8) AS name_prefix,
                concat_ws('-', c_mktsegment, c_custkey) AS seg_key,
                length(c_name) AS name_len,
                levenshtein(c_name, c_mktsegment) AS edit_dist
         FROM customer
         ORDER BY c_custkey""",
    "q46_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders o
         WHERE o_totalprice > 3.0 * (
           SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  / COUNT(1)
           FROM orders i WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",
    "q45_typed_segment_stats" ->
      s"""SELECT c_mktsegment, ${dsumSql("c_acctbal")} AS sum_acctbal,
            count(1) AS n_customers
          FROM customer
          GROUP BY c_mktsegment
          ORDER BY c_mktsegment""",
    "q43_range_frame" ->
      """SELECT o_custkey, o_orderkey,
                datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS order_day,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE))
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS spend_30d
         FROM orders
         ORDER BY o_custkey, order_day, o_orderkey""",
    "q44_json_map_explode" ->
      """SELECT k AS key, count(1) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS BIGINT))
                     AS BIGINT) AS total
         FROM (SELECT event_id, props,
                      unnest(json_keys(props::JSON)) AS k
               FROM events)
         GROUP BY k
         ORDER BY k""",
    "q179_returned_item_ranking" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
            ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
            count(1) AS n_return_lines
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
            AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
          GROUP BY c_custkey, c_name, c_acctbal, n_name
          ORDER BY revenue DESC, c_custkey
          LIMIT 20""",

    "q195_variant_props" ->
      """SELECT event_type, count(1) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS BIGINT) AS sum_k,
                CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS BIGINT) AS max_k
         FROM events
         GROUP BY event_type
         ORDER BY event_type""",

    "q188_last_touch_attribution" ->
      s"""WITH w AS (
            SELECT event_id, user_id, ts, event_type, value,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                     OVER prior AS prev_type,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN ts END IGNORE NULLS)
                     OVER prior AS prev_ts
            FROM events
            WINDOW prior AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
          SELECT CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 86400000000
                      THEN 'direct' ELSE prev_type END AS channel,
                 count(1) AS n_purchases,
                 ${dsumSql("value")} AS attributed_value
          FROM w
          WHERE event_type = 'purchase'
          GROUP BY 1
          ORDER BY channel""",

    "q189_grouping_sets_census" ->
      s"""SELECT coalesce(CAST(day AS VARCHAR), 'ALL') AS day,
                 coalesce(event_type, 'ALL') AS event_type,
                 CAST(GROUPING(day, event_type) AS BIGINT) AS gid,
                 count(1) AS n,
                 ${dsumSql("value")} AS total_value
          FROM (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                       event_type, value
                FROM events)
          GROUP BY GROUPING SETS ((day, event_type), (day),
                                  (event_type), ())
          ORDER BY gid, day, event_type""",

    "q190_journey_trigrams" ->
      """WITH w AS (
           SELECT user_id, event_type AS s1,
                  lead(event_type, 1) OVER u AS s2,
                  lead(event_type, 2) OVER u AS s3
           FROM events
           WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT s1, s2, s3, count(1) AS n
         FROM w
         WHERE s3 IS NOT NULL
         GROUP BY s1, s2, s3
         ORDER BY n DESC, s1, s2, s3
         LIMIT 25""",

    "q180_shipping_priority" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
            ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE CAST(l_shipdate AS DATE) > DATE '1998-01-01'
            AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
            AND o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
          GROUP BY o_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, o_orderkey
          LIMIT 10""",

    "q181_big_order_customers" ->
      s"""WITH big AS (
            SELECT l_orderkey,
                   ${dsumSql("l_quantity")} AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING ${dsumSql("l_quantity")} > 250.0)
          SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                 o_totalprice, total_qty
          FROM big
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          ORDER BY total_qty DESC, o_orderkey
          LIMIT 50""",

    "q176_conversation_build" ->
      """WITH flagged AS (
            SELECT user_id, event_id, ts, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sessions AS (
            SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
            FROM flagged)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 count(1) AS n_turns,
                 string_agg(event_type, ' -> ' ORDER BY ts, event_id)
                   AS dialogue
          FROM sessions
          GROUP BY user_id, session_seq
          HAVING count(1) >= 3
          ORDER BY user_id, session_seq""",

    "q209_chat_template" ->
      """WITH flagged AS (
            SELECT user_id, event_id, ts, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sessions AS (
            SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_seq
            FROM flagged),
          turns AS (
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id, session_seq
                     ORDER BY ts, event_id) AS turn
            FROM sessions),
          pieces AS (
            SELECT *,
                   CASE WHEN turn % 2 = 1 THEN 'user'
                        ELSE 'assistant' END AS role,
                   '<|' || CASE WHEN turn % 2 = 1 THEN 'user'
                                ELSE 'assistant' END
                        || '|>' || event_type AS piece
            FROM turns),
          cum AS (
            SELECT *, CAST(sum(len(piece)) OVER (
                     PARTITION BY user_id, session_seq ORDER BY turn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_len
            FROM pieces)
          SELECT user_id, session_seq,
                 count(1) AS n_turns,
                 md5(string_agg(piece, '' ORDER BY turn)) AS text_md5,
                 COALESCE(string_agg(
                   CASE WHEN role = 'assistant' THEN
                     (cum_len - len(event_type))::VARCHAR || ':'
                       || cum_len::VARCHAR END,
                   ',' ORDER BY turn), '') AS mask_spans,
                 CAST(COALESCE(sum(CASE WHEN role = 'assistant'
                     THEN len(event_type) END), 0) AS BIGINT)
                   AS n_assistant_chars
          FROM cum
          GROUP BY user_id, session_seq
          HAVING count(1) >= 3
          ORDER BY user_id, session_seq""",
    "q23_sessionize" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          sessions AS (
            SELECT *, SUM(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged)
          SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                 min(ts) AS session_start, max(ts) AS session_end,
                 count(1) AS n_events, ${dsumSql("value")} AS session_value
          FROM sessions
          GROUP BY user_id, session_seq
          ORDER BY user_id, session_seq""",
    "q96_cohort_retention" ->
      """WITH byw AS (
           SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
           FROM events),
         coh AS (
           SELECT user_id, min(wk) AS cohort_week FROM byw GROUP BY user_id),
         act AS (SELECT DISTINCT user_id, wk FROM byw)
         SELECT c.cohort_week, a.wk AS activity_week, count(1) AS n_users
         FROM act a JOIN coh c ON a.user_id = c.user_id
         GROUP BY c.cohort_week, a.wk
         ORDER BY cohort_week, activity_week""",
    "q97_session_funnel" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT *, SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM flagged),
         s1 AS (
           SELECT *, max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  OVER ws AS saw_view
           FROM sessions
           WINDOW ws AS (PARTITION BY user_id, session_seq
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         s2 AS (
           SELECT *, max(CASE WHEN event_type = 'click' AND saw_view = 1
                              THEN 1 ELSE 0 END) OVER ws AS saw_vc
           FROM s1
           WINDOW ws AS (PARTITION BY user_id, session_seq
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         s3 AS (
           SELECT *, max(CASE WHEN event_type = 'purchase' AND saw_vc = 1
                              THEN 1 ELSE 0 END) OVER ws AS saw_vcp
           FROM s2
           WINDOW ws AS (PARTITION BY user_id, session_seq
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         per_session AS (
           SELECT user_id, session_seq, CAST(min(ts) AS DATE) AS day,
                  max(saw_view) AS v, max(saw_vc) AS vc,
                  max(saw_vcp) AS vcp
           FROM s3 GROUP BY user_id, session_seq)
         SELECT day, count(1) AS n_sessions,
                CAST(SUM(v) AS BIGINT) AS n_view,
                CAST(SUM(vc) AS BIGINT) AS n_view_click,
                CAST(SUM(vcp) AS BIGINT) AS n_full_funnel
         FROM per_session GROUP BY day ORDER BY day""")

  /** q63 (chunked) and q70 (native session_window) share q23's oracle
    * — three renderings, one semantics, one SQL text. */
  val oraclesAliased: Map[String, String] = Map(
    "q70_session_window" -> oracles("q23_sessionize"))
}
