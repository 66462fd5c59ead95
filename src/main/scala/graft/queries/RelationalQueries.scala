package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import ParityQueries.t

/** Relational breadth beyond the reference's own surface — the rest of
  * what "an engine a reference user could switch to" needs: multi-level
  * grouping, pivot, running/offset windows, scalar string/date/math
  * functions, subquery forms, HAVING, and the `spark.sql` text entry
  * point. Same oracle conventions as ParityQueries (exact values,
  * aligned aliases, total ORDER BY).
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q3 shape (shipping priority): selective dim filter →
    // 3-way join → grouped measure → top-N. Quantity-keyed measure
    // (integer-valued doubles cast long) so the hash check is exact;
    // customer broadcasts, orders⋈lineitem shuffles on the join key.
    "r_tpch_q3" -> ((s, d) => {
      val c = t(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, d, "orders")
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = t(s, d, "lineitem")
        .where(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_quantity"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("qty").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape (local volume): the full snowflake —
    // region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier with
    // the customer-and-supplier-same-nation condition. Dims broadcast;
    // only the two fact joins shuffle.
    "r_tpch_q5" -> ((s, d) => {
      val n = t(s, d, "nation")
        .join(broadcast(t(s, d, "region")
          .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("qty").desc, col("n_name"))
    }),

    // CUBE: all grouping combinations in one pass.
    "r_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))),

    // PIVOT: event counts per user across event types (explicit value
    // list → stable schema; coalesce(0) to match conditional-aggregate
    // semantics).
    "r_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, d, "events").groupBy(col("user_id"))
        .pivot("event_type", types).agg(count(lit(1)))
      p.select(col("user_id") +:
        types.map(ty => coalesce(col(ty), lit(0L)).as(ty)): _*)
        .orderBy(col("user_id"))
    }),

    // Running-total window (rows frame), fully ordered for determinism.
    "r_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("run_qty"))
        // run_qty completes the total order (lineitem rows can tie on
        // (orderkey, linenumber) in this synthetic data)
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("run_qty"))
    }),

    // Offset windows: lag/lead against adjacent lines of the same order.
    "r_lead_lag" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the test data —
      // include l_quantity so tied rows are output-identical and the
      // offset values are deterministic.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("prev_qty"), col("next_qty"))
    }),

    // Scalar string functions.
    "r_string_funcs" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("u_name"),
        substring(col("c_name"), 1, 8).as("pfx"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("r_name"),
        length(col("c_name")).cast("long").as("name_len"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("tagged"))
        .orderBy(col("c_custkey"))),

    // Date-part extraction.
    "r_date_parts" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"))
        .orderBy(col("o_orderkey"))),

    // Math scalars (exact-on-doubles subset: floor/ceil/abs/sign).
    "r_math_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        floor(col("o_totalprice")).as("fl"),
        ceil(col("o_totalprice")).as("cl"),
        abs(col("o_totalprice") - 200000.0).as("dist"),
        signum(col("o_totalprice") - 200000.0).as("sgn"))
        .orderBy(col("o_orderkey"))),

    // Null-handling scalars.
    "r_null_funcs" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        coalesce(nullif(col("event_type"), lit("click")), lit("was_click"))
          .as("et"),
        isnull(nullif(col("event_type"), lit("view"))).as("is_view"))
        .orderBy(col("event_id"))),

    // IN-subquery (semi-join form).
    "r_in_subquery" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // HAVING: post-aggregation filter.
    "r_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("o_totalprice")).as("max_price"))
        .where(col("n_orders") >= 12)
        .orderBy(col("o_custkey"))),

    // As-of join (union+window formulation; oracle = DuckDB native ASOF
    // JOIN): latest order at-or-before each event for that user.
    "r_asof_join" -> ((s, d) => {
      val dedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val o = t(s, d, "orders")
        .withColumn("__rn", row_number().over(dedup))
        .where(col("__rn") === 1).drop("__rn")
      graft.operators.TimeSeries.asofJoinLast(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("ts")),
        o, col("user_id"), col("o_custkey"), col("ts"), col("o_orderdate"),
        Seq("o_orderkey", "o_totalprice"))
        .orderBy(col("event_id"))
    }),

    // Gap sessionization (12 h): session stats per (user, session).
    "r_sessionize" -> ((s, d) =>
      graft.operators.TimeSeries.sessionize(
        t(s, d, "events"), col("user_id"), col("ts"), col("event_id"),
        gapSeconds = 43200L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
        .orderBy(col("user_id"), col("session_idx"))),

    // Outer joins with one-sided regions: customers < 100 vs orders of
    // custkeys 50-149 → left-only, matched, right-only rows.
    "r_full_outer" -> ((s, d) =>
      t(s, d, "customer").where(col("c_custkey") < 100)
        .select(col("c_custkey"), col("c_name"))
        .join(t(s, d, "orders")
          .where(col("o_custkey") >= 50 && col("o_custkey") < 150)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
        .orderBy(asc_nulls_first("c_custkey"),
          asc_nulls_first("o_orderkey"))),

    // Rank-function family (dense_rank / percent_rank / ntile) — all
    // over a total order, percent_rank is an exact int ratio.
    "r_rank_funcs" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drank"),
          percent_rank().over(w).as("prank"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // MERGE/upsert: re-priced update batch wins by key, rest carries
    // over (Upsert.mergeByKey — anti join + union).
    "r_upsert" -> ((s, d) => {
      val base = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val updates = base.where(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      graft.operators.Upsert.mergeByKey(base, updates, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // BPE-ish regex tokenization: words plus single non-space symbols.
    "r_regex_tokens" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
          .cast("long").as("n_bpe_tokens"),
        regexp_count(col("text"), lit("[A-Za-z0-9_]+")).cast("long")
          .as("n_words"))
        .orderBy(col("doc_id"))),

    // RANGE frame: per customer, how many of their orders fall within
    // $1000 below this order's price (value-based frame, not row-based).
    "r_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_close"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // first/last/nth value over a total order within each group.
    "r_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("cheapest_ok"),
          last(col("o_orderkey")).over(w).as("priciest_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Typed Aggregator (UDAF): top-3 prices per return flag, exploded to
    // rows for the oracle compare.
    "r_topk_agg" -> ((s, d) => {
      val topk = udaf(new graft.functions.TopKAggregator(3))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(topk(col("l_extendedprice")).as("top_prices"))
        .select(col("l_returnflag"), posexplode(col("top_prices")))
        .select(col("l_returnflag"),
          (col("pos") + 1).cast("long").as("rank"),
          col("col").as("price"))
        .orderBy(col("l_returnflag"), col("rank"))
    }),

    // spark.sql text entry point over registered temp views.
    "r_sql_text" -> ((s, d) => {
      t(s, d, "nation").createOrReplaceTempView("v_nation")
      t(s, d, "region").createOrReplaceTempView("v_region")
      s.sql("""
        SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
        FROM v_nation JOIN v_region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "r_tpch_q3" ->
      """SELECT o.o_orderkey, o.o_orderdate,
        |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2 ORDER BY qty DESC, o.o_orderkey LIMIT 10""".stripMargin,
    "r_tpch_q5" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY 1 ORDER BY qty DESC, n.n_name""".stripMargin,
    "r_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin,
    "r_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "r_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, run_qty"""
        .stripMargin,
    "r_lead_lag" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_quantity)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, prev_qty, next_qty"""
        .stripMargin,
    "r_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS u_name,
        |  substr(c_name, 1, 8) AS pfx,
        |  regexp_replace(c_name, 'Customer', 'Cust') AS r_name,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat_ws('/', c_mktsegment, c_name) AS tagged
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "r_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "r_math_funcs" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS cl,
        |  abs(o_totalprice - 200000.0) AS dist,
        |  CAST(sign(o_totalprice - 200000.0) AS DOUBLE) AS sgn
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "r_null_funcs" ->
      """SELECT event_id,
        |  coalesce(nullif(event_type, 'click'), 'was_click') AS et,
        |  (nullif(event_type, 'view') IS NULL) AS is_view
        |FROM events ORDER BY event_id""".stripMargin,
    "r_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "r_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin,
    "r_topk_agg" ->
      """SELECT l_returnflag,
        |  CAST(generate_subscripts(tp, 1) AS BIGINT) AS rank,
        |  unnest(tp) AS price
        |FROM (
        |  SELECT l_returnflag,
        |    list_sort(list(l_extendedprice), 'DESC')[1:3] AS tp
        |  FROM lineitem GROUP BY l_returnflag) g
        |ORDER BY l_returnflag, rank""".stripMargin,
    "r_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_close
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "r_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS cheapest_ok,
        |  last_value(o_orderkey) OVER w AS priciest_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "r_full_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_custkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 100) c
        |FULL OUTER JOIN (SELECT o_orderkey, o_custkey, o_totalprice
        |  FROM orders WHERE o_custkey >= 50 AND o_custkey < 150) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST"""
        .stripMargin,
    "r_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
        |  percent_rank() OVER w AS prank,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "r_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |updates AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0
        |    AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0)
        |SELECT * FROM updates
        |UNION ALL
        |SELECT b.* FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM updates u
        |  WHERE u.o_orderkey = b.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "r_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT)
        |    AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "r_asof_join" ->
      """WITH o AS (
        |  SELECT * FROM orders
        |  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |    ORDER BY o_orderkey DESC) = 1)
        |SELECT e.event_id, e.user_id, e.ts,
        |  o.o_orderkey AS asof_o_orderkey,
        |  o.o_totalprice AS asof_o_totalprice
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    "r_sessionize" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 12 HOUR
        |      THEN 1 ELSE 0 END AS nw
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s2 AS (
        |  SELECT user_id, ts,
        |    CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM s)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts) AS s_start, max(ts) AS s_end
        |FROM s2 GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "r_sql_text" ->
      """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
