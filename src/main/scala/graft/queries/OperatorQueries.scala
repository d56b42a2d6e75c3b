package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Queries exercising the composed custom operators (as-of join,
  * pivot) with DuckDB oracles.
  */
object OperatorQueries {
  import Q._

  val queries: Map[String, Fn] = Map(
    // As-of join: attach to every purchase event the user's latest
    // view event at or before it (session attribution). The right
    // side is pre-deduped to one row per (user, ts) so the match is
    // unambiguous on both engines.
    "q36_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts")
        .agg(max($"event_id").as("view_event_id"))
      AsOfJoin.asOf(purchases, views, Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightPayload = Seq("view_event_id"))
        .select($"event_id", $"user_id", $"ts", $"value",
          $"__match.ts".as("view_ts"),
          $"__match.view_event_id".as("view_event_id"))
        .orderBy($"event_id")
    }),

    // The same as-of semantics through the custom PHYSICAL operator
    // (AsOfJoinNode → AsOfStrategy → sort-merge AsOfJoinExec): one
    // streaming merge over co-partitioned (key, ts)-sorted children,
    // no union/window pass. Verified against the identical DuckDB
    // ASOF-join oracle as q36.
    "q60_asof_join_exec" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts")
        .agg(max($"event_id").as("view_event_id"))
      graft.plans.AsOfJoinPhysical.asOf(
        purchases, views, Seq("user_id"), leftTs = "ts", rightTs = "ts")
        .select($"event_id", $"user_id", $"ts", $"value",
          $"r_ts".as("view_ts"), $"r_view_event_id".as("view_event_id"))
        .orderBy($"event_id")
    }),

    // Banded time-range join: for each purchase, count and value-sum
    // of the same user's events strictly within the preceding hour —
    // the equi-join-on-(key, band) rendering of an interval predicate
    // Spark would otherwise plan as a nested loop.
    "q56_range_join_prior_activity" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.table(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val prior = RangeJoin.timeRange(
        purchases, ev.select($"user_id", $"ts", $"value"),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        before = 3600L, after = 0L)
        .filter($"r_ts" < $"ts") // strictly before (drops self-match)
        .groupBy($"event_id")
        .agg(count(lit(1)).as("n_prior"),
          dsum($"value").as("prior_value"))
      purchases.join(prior, Seq("event_id"), "left")
        .select($"event_id", $"user_id",
          coalesce($"n_prior", lit(0L)).as("n_prior"),
          coalesce($"prior_value", lit(0.0)).as("prior_value"))
        .orderBy($"event_id")
    }),

    // Gap-sessionization through the skew-resilient chunked operator:
    // events shuffle on (user, 6 h time-chunk) instead of user alone,
    // so a hot key's history splits across timespan/chunk tasks; the
    // cross-chunk stitch is exact (SessionizeChunkedSpec proves
    // equality with the plain window form for arbitrary chunk
    // lengths). Same oracle as q23.
    "q63_sessionize_chunked" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sessionize.chunked(
        Tables.table(s, dir, "events")
          .select($"user_id", $"event_id", $"ts", $"value"),
        "user_id", "ts", "event_id", "value",
        gapMicros = 1800000000L, chunkMicros = 6L * 3600L * 1000000L)
        .orderBy($"user_id", $"session_seq")
    }),

    // Pivot: per-day event counts spread into one column per type —
    // plans as a single hash aggregate with conditional counters, the
    // same shape as the oracle's FILTER aggregation.
    "q37_pivot_event_counts" -> ((s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.table(s, dir, "events")
        .withColumn("day", $"ts".cast("date"))
        .groupBy($"day")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      pivoted
        .select(($"day" +: types.map(t => coalesce(col(t), lit(0L)).as(t))): _*)
        .orderBy($"day")
    }))

  /** Shared by q36 (composed union+window rendering) and q60 (custom
    * physical sort-merge exec) — same semantics, one oracle text. */
  private val asofOracle =
    """WITH purchases AS (
         SELECT event_id, user_id, ts, value FROM events
         WHERE event_type = 'purchase'),
       views AS (
         SELECT user_id, ts, max(event_id) AS view_event_id FROM events
         WHERE event_type = 'view' GROUP BY user_id, ts)
       SELECT p.event_id, p.user_id, p.ts, p.value,
              v.ts AS view_ts, v.view_event_id
       FROM purchases p
       ASOF LEFT JOIN views v
         ON p.user_id = v.user_id AND v.ts <= p.ts
       ORDER BY p.event_id"""

  val oracles: Map[String, String] = Map(
    "q60_asof_join_exec" -> asofOracle,
    // identical semantics to q23 — one oracle text, can't drift
    "q63_sessionize_chunked" -> Analytics.oracles("q23_sessionize"),
    "q56_range_join_prior_activity" ->
      s"""WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase')
          SELECT p.event_id, p.user_id,
                 count(e.ts) AS n_prior,
                 COALESCE(${Q.dsumSql("e.value")}, 0) AS prior_value
          FROM purchases p LEFT JOIN events e
            ON e.user_id = p.user_id
           AND epoch_us(e.ts) >= epoch_us(p.ts) - 3600000000
           AND epoch_us(e.ts) < epoch_us(p.ts)
          GROUP BY p.event_id, p.user_id
          ORDER BY p.event_id""",
    "q36_asof_join" -> asofOracle,
    "q37_pivot_event_counts" ->
      """SELECT CAST(ts AS DATE) AS day,
                count(1) FILTER (event_type = 'click') AS click,
                count(1) FILTER (event_type = 'error') AS error,
                count(1) FILTER (event_type = 'purchase') AS purchase,
                count(1) FILTER (event_type = 'signup') AS signup,
                count(1) FILTER (event_type = 'view') AS view
         FROM events
         GROUP BY day
         ORDER BY day""")
}
