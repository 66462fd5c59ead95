package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity operator inventory (SURVEY.md §2), each expressed over
  * the driver's Parquet test tables so the DuckDB oracle can replay it.
  *
  * Conventions shared with the oracle SQL (SparkEntry.oracleSql):
  *  - every computed column is aliased identically on both sides (the
  *    driver sorts columns by name before hashing);
  *  - every query ends in a deterministic total ORDER BY (unique
  *    tie-break key) so row order can never differ;
  *  - numeric outputs are either raw stored values or arithmetic that is
  *    IEEE-exact and order-independent (integer-valued sums, min/max,
  *    exact-int divisions) — never an order-dependent float reduction.
  *
  * Scale posture: dimension joins are broadcast; window arg-max relies on
  * `InferWindowGroupLimit` (partial top-k before the shuffle); filters and
  * projections are plain Catalyst expressions so pushdown/pruning reach
  * the parquet scan.
  */
object ParityQueries {

  /** Read a test table. `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses to read as a timestamp — read it as nanos-long and
    * truncate to micros, the same ns→µs truncation DuckDB applies, so
    * values stay oracle-identical.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Map of query name → (session, sfDir) => result. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S6/S7 + P10: catalog scan + projection (`stg...sql:10,38-48`).
    "q_scan_project" -> ((s, d) =>
      t(s, d, "region").select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))),

    // P1: JSON parse with explicit schema (`stg...sql:9,15-21`).
    "q_json_parse" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
        .orderBy(col("event_id"))),

    // P2/P3: string-typed JSON path extract (`stg...sql:15-21,28`).
    "q_json_get" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("ks"))
        .orderBy(col("event_id"))),

    // P4/P6: array explode with position — the reference's
    // generate_series lateral unnest (`stg...sql:22,35-36`).
    "q_explode_pos" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos"),
          col("col").cast("double").as("val"))
        .orderBy(col("vec_id"), col("pos"))),

    // P8: string → timestamp parse round-trip (`stg...sql:39`).
    "q_ts_parse" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        to_timestamp(
          date_format(col("ts"), "yyyy-MM-dd HH:mm"),
          "yyyy-MM-dd HH:mm").as("ts_min"))
        .orderBy(col("event_id"))),

    // P9 + P7: date truncation + cast (`stg...sql:47`).
    "q_date_trunc" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_dt"))
        // ship_dt completes the total order over duplicate line keys
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_dt"))),

    // P11: filter + projection (`int...sql:30`).
    "q_filter_project" -> ((s, d) =>
      t(s, d, "events")
        .where(col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))),

    // W1: ranking window, top-3 kept (`int...sql:13-16`).
    "q_rank_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("dt"))
        .orderBy(col("value").desc, col("ts").desc, col("event_id"))
      t(s, d, "events")
        .withColumn("dt", to_date(col("ts")))
        .withColumn("rn", row_number().over(w).cast("int"))
        .where(col("rn") <= 3)
        .select(col("user_id"), col("dt"), col("rn"),
          col("event_id"), col("value"))
        .orderBy(col("user_id"), col("dt"), col("rn"))
    }),

    // W2: the reference's flagship arg-max — top event per (user, day),
    // ties → latest ts (`int...sql:10-30` shape on the events table).
    "q_argmax_daily" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("dt"))
        .orderBy(col("value").desc, col("ts").desc, col("event_id"))
      t(s, d, "events")
        .withColumn("dt", to_date(col("ts")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).drop("rn", "props", "event_type", "ts")
        .select(col("user_id"), col("dt"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("dt"))
    }),

    // W2 variant: max-price lineitem per order, ties → lowest linenumber.
    "q_argmax_lineitem" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"))
    }),

    // Aggregation (TPC-H Q1 shape, hash-safe aggregates only: integer
    // sums / counts / min / max / exact-ratio avg).
    "q_agg_pricing" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("count_order"),
          avg(col("l_quantity")).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Broadcast dimension join chain: customer ⋈ nation ⋈ region.
    "q_join_dims" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("r_name"))
        .orderBy(col("c_custkey"))),

    // Join + aggregation: orders per nation (shuffle join on the fact,
    // broadcast dims, count-distinct).
    "q_join_agg" -> ((s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy(col("n_name"))),

    // Semi join: customers with at least one order (EXISTS).
    "q_semi_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // Anti join: customers with no high-value order (NOT EXISTS with a
    // pushed-down predicate on the probe side).
    "q_anti_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // Set op: UNION DISTINCT of two label domains.
    "q_union_distinct" -> ((s, d) =>
      t(s, d, "customer").select(col("c_mktsegment").as("label"))
        .union(t(s, d, "orders").select(col("o_orderpriority")))
        .distinct()
        .orderBy(col("label"))),

    // Global sort + limit (top-N), deterministic tie-break.
    "q_sort_limit" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // Multi-level aggregate: ROLLUP over (returnflag, linestatus).
    "q_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")))
  )

  /** DuckDB-executable oracle SQL, column-aligned with `queries`. */
  val oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q_json_parse" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_json_get" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS ks
        |FROM events ORDER BY event_id""".stripMargin,
    "q_explode_pos" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "q_ts_parse" ->
      """SELECT event_id,
        |  strptime(strftime(ts, '%Y-%m-%d %H:%M'), '%Y-%m-%d %H:%M') AS ts_min
        |FROM events ORDER BY event_id""".stripMargin,
    "q_date_trunc" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_dt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, ship_dt"""
        .stripMargin,
    "q_filter_project" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 100.0
        |ORDER BY event_id""".stripMargin,
    "q_rank_window" ->
      """SELECT user_id, CAST(ts AS DATE) AS dt,
        |  CAST(row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |    ORDER BY value DESC, ts DESC, event_id) AS INT) AS rn,
        |  event_id, value
        |FROM events
        |QUALIFY rn <= 3
        |ORDER BY user_id, dt, rn""".stripMargin,
    "q_argmax_daily" ->
      """SELECT user_id, CAST(ts AS DATE) AS dt, event_id, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |  ORDER BY value DESC, ts DESC, event_id) = 1
        |ORDER BY user_id, dt""".stripMargin,
    "q_argmax_lineitem" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS count_order,
        |  avg(l_quantity) AS avg_qty,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_dims" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_mktsegment AS label FROM customer
        |UNION
        |SELECT o_orderpriority FROM orders
        |ORDER BY label""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin
  )
}
