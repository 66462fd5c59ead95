package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import ParityQueries.t

/** Second relational-breadth batch: grouping sets, set operations,
  * correlated subqueries (EXISTS / scalar / LATERAL), distribution
  * windows (ntile / percent_rank / cume_dist / sliding frames),
  * conditional & bitwise & boolean aggregates, exact percentiles,
  * integer-exact variance, date spines, unpivot, and array/regexp
  * function families. Same oracle conventions: exact values, aligned
  * aliases, total ORDER BY, and only IEEE-exact float math (integer
  * sums, exact ratios, min/max).
  */
object RelationalQueries2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_asof_native" -> (asofNative(_, _)),
    "r_asof_bucketed" -> (asofBucketed(_, _)),
    "r_asof_auto" -> (asofAuto(_, _)),
    "r_asof_broadcast" -> (asofBroadcast(_, _)),
    "r_asof_broadcast_win" -> (asofBroadcastWin(_, _)),

    // String scalar family 2: padding, reverse/repeat, translate,
    // split_part, position, left/right, edit distance.
    "r_string_funcs2" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        lpad(col("c_name"), 22, "*").as("lp"),
        rpad(col("c_mktsegment"), 12, ".").as("rp"),
        reverse(col("c_name")).as("rev"),
        repeat(col("c_mktsegment"), 2).as("rep2"),
        translate(col("c_name"), "Cust", "Kvst").as("tr"),
        expr("split_part(c_name, '#', 2)").as("num_part"),
        instr(col("c_name"), "#").cast("int").as("hash_pos"),
        expr("left(c_name, 8)").as("l8"),
        expr("right(c_name, 4)").as("r4"),
        levenshtein(col("c_name"), lit("Customer#000000000"))
          .cast("int").as("lev"))
        .orderBy(col("c_custkey"))),

    // Date scalar family 2: day/month arithmetic with end-of-month
    // clamping, last_day, ISO week, day-of-week, diffs, make_date.
    "r_date_funcs2" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("dt"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        last_day(to_date(col("o_orderdate"))).as("eom"),
        dayofweek(col("o_orderdate")).cast("int").as("dow"),
        weekofyear(col("o_orderdate")).cast("int").as("woy"),
        datediff(lit("1998-12-31").cast("date"),
          to_date(col("o_orderdate"))).cast("int").as("days_to_end"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
          lit(1)).as("som"))
        .orderBy(col("o_orderkey"))),

    // ANSI-safe try_* family: failed casts, divide-by-zero, and
    // out-of-bounds element access all yield NULL instead of erroring
    // (Spark 4 runs ANSI mode by default).
    "r_try_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        expr("try_cast(o_orderpriority AS INT)").as("bad_int"),
        expr("try_cast(split_part(o_orderpriority, '-', 1) AS INT)")
          .as("prio_num"),
        try_divide(col("o_totalprice"),
          (col("o_orderkey") % 2).cast("double")).as("odd_div"),
        try_element_at(split(col("o_orderpriority"), "-"), lit(2))
          .as("prio_word"),
        try_element_at(split(col("o_orderpriority"), "-"), lit(5))
          .as("oob"))
        .orderBy(col("o_orderkey"))),

    // Native session_window gap sessions (batch form of the streaming
    // merging-window aggregation; same oracle technique as
    // r_sessionize but with session_window's strict-gap semantics and
    // end = last event + gap).
    "r_session_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("n_events"))
        .orderBy(col("user_id"), col("s_start"))),

    // Bitwise scalar family: shifts, popcount, xor/and/or.
    "r_bit_scalar" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        shiftleft(col("o_orderkey"), 3).as("shl"),
        shiftright(col("o_orderkey"), 2).as("shr"),
        bit_count(col("o_orderkey")).cast("int").as("bc"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("xo"),
        col("o_orderkey").bitwiseAND(col("o_custkey")).as("an"),
        col("o_orderkey").bitwiseOR(col("o_custkey")).as("orr"))
        .orderBy(col("o_orderkey"))),

    // GROUPING SETS with grouping() markers — one pass, three groupings.
    "r_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_lineitem_gs")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) AS INT) AS g_flag,
          CAST(grouping(l_linestatus) AS INT) AS g_status,
          count(*) AS n, sum(l_quantity) AS sum_qty
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
          l_linestatus NULLS FIRST""")
    }),

    // INTERSECT (set semantics): customers that do have orders.
    "r_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("ck"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("ck")))
        .orderBy(col("ck"))),

    // EXCEPT (set semantics): customers with no large order (every
    // customer has SOME order at every SF, so the plain anti set would
    // be empty at sf0.001).
    "r_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("ck"))
        .except(t(s, d, "orders").where(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("ck")))
        .orderBy(col("ck"))),

    // INTERSECT ALL / EXCEPT ALL — multiset semantics (duplicate
    // counts preserved), not the distinct set forms above.
    "r_intersect_all" -> ((s, d) =>
      t(s, d, "lineitem").where(col("l_returnflag") === "A")
        .select(col("l_suppkey"), col("l_quantity"))
        .intersectAll(
          t(s, d, "lineitem").where(col("l_returnflag") === "R")
            .select(col("l_suppkey"), col("l_quantity")))
        .orderBy(col("l_suppkey"), col("l_quantity"))),
    "r_except_all" -> ((s, d) =>
      t(s, d, "lineitem").where(col("l_returnflag") === "A")
        .select(col("l_suppkey"), col("l_quantity"))
        .exceptAll(
          t(s, d, "lineitem").where(col("l_returnflag") === "R")
            .select(col("l_suppkey"), col("l_quantity")))
        .orderBy(col("l_suppkey"), col("l_quantity"))),

    // Correlated NOT EXISTS — decorrelated to an anti join by Catalyst.
    "r_exists_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("v_cust_ex")
      t(s, d, "orders").createOrReplaceTempView("v_ord_ex")
      s.sql("""
        SELECT c_custkey, c_name FROM v_cust_ex c
        WHERE NOT EXISTS (SELECT 1 FROM v_ord_ex o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
        ORDER BY c_custkey""")
    }),

    // Correlated scalar subquery in the select list.
    "r_scalar_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_ord_sc")
      t(s, d, "lineitem").createOrReplaceTempView("v_li_sc")
      s.sql("""
        SELECT o_orderkey, o_orderstatus,
          (SELECT max(l_quantity) FROM v_li_sc l
           WHERE l.l_orderkey = o.o_orderkey) AS max_qty
        FROM v_ord_sc o
        WHERE o_orderkey < 1000
        ORDER BY o_orderkey""")
    }),

    // LATERAL correlated derived table.
    "r_lateral" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("v_ord_lat")
      t(s, d, "lineitem").createOrReplaceTempView("v_li_lat")
      s.sql("""
        SELECT o.o_orderkey, m.n_lines, m.max_qty
        FROM v_ord_lat o CROSS JOIN LATERAL (
          SELECT count(*) AS n_lines, max(l_quantity) AS max_qty
          FROM v_li_lat l WHERE l.l_orderkey = o.o_orderkey) m
        WHERE o.o_orderkey < 1000
        ORDER BY o.o_orderkey""")
    }),

    // Distribution windows: ntile / percent_rank / cume_dist (exact
    // integer-ratio doubles — deterministic both engines).
    "r_ntile_cume" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .where(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Sliding rows-frame average of integer-valued quantities.
    "r_sliding_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "lineitem")
        .where(col("l_suppkey") < 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          sum(col("l_quantity")).over(w).as("win_sum"),
          count(lit(1)).over(w).as("win_n"))
        .withColumn("win_avg", col("win_sum") / col("win_n"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("win_sum"))
    }),

    // Conditional aggregates (FILTER clause) + boolean aggregates.
    "r_cond_agg" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_li_cond")
      s.sql("""
        SELECT l_returnflag,
          count(*) AS n,
          count(*) FILTER (WHERE l_quantity > 25) AS n_big,
          bool_and(l_quantity > 0) AS all_pos,
          bool_or(l_discount > 0.09) AS any_deep_disc
        FROM v_li_cond GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // Bitwise aggregates over integer keys.
    "r_bit_agg" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_li_bit")
      s.sql("""
        SELECT l_returnflag,
          bit_and(l_orderkey) AS b_and,
          bit_or(l_orderkey) AS b_or,
          bit_xor(l_orderkey) AS b_xor
        FROM v_li_bit GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // Variance/stddev computed from integer-exact sums — deterministic
    // (never order-dependent float accumulation; the engine-native
    // stddev/var aggs are NOT run-to-run stable on doubles at scale).
    "r_var_manual" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_q"),
          sum((col("l_quantity") * col("l_quantity")).cast("long"))
            .as("sumsq_q"))
        .select(col("l_returnflag"), col("n"), col("sum_q"), col("sumsq_q"),
          ((col("sumsq_q") - col("sum_q") * col("sum_q") /
            col("n").cast("double")) / (col("n") - 1).cast("double"))
            .as("var_q"))
        .orderBy(col("l_returnflag"))),

    // Exact percentiles (linear interpolation) per group.
    "r_percentiles" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("v_li_pct")
      s.sql("""
        SELECT l_returnflag,
          percentile(l_quantity, 0.5) AS median_qty,
          percentile(l_quantity, 0.9) AS p90_qty,
          min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        FROM v_li_pct GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // Approximate-percentile error gate: the sketch must land within 2
    // quantity units of the exact median — empty-set oracle, same
    // pattern as x_approx_distinct_err.
    "r_approx_pct_err" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_percentile(col("l_quantity"), lit(0.5), lit(10000))
          .as("approx_med"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000000))
            .as("tight_med"),
          expr("percentile(l_quantity, 0.5)").as("exact_med"))
        .where(abs(col("approx_med") - col("exact_med")) > 2.0)
        .select(col("l_returnflag"))),

    // Date spine: generated calendar left-joined to per-day order
    // counts, gaps zero-filled — the standard incremental-pipeline
    // backbone (generate → explode → left join → coalesce).
    "r_date_spine" -> ((s, d) => {
      val spine = s.range(1)
        .select(explode(sequence(
          to_date(lit("1995-01-01")), to_date(lit("1995-03-31")),
          expr("INTERVAL 1 DAY"))).as("dt"))
      val daily = t(s, d, "orders")
        .where(col("o_orderdate") >= "1995-01-01" &&
          col("o_orderdate") < "1995-04-01")
        .groupBy(to_date(col("o_orderdate")).as("dt"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(daily, Seq("dt"), "left")
        .select(col("dt"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("dt"))
    }),

    // UNPIVOT / melt via stack(): wide part metrics → long rows.
    "r_unpivot" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          expr("stack(2, 'retailprice', p_retailprice, " +
            "'size', CAST(p_size AS DOUBLE))").as(Seq("metric", "val")))
        .orderBy(col("p_partkey"), col("metric"))),

    // Array function family over tokenized text.
    "r_array_funcs" -> ((s, d) => {
      val toks = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"),
          size(toks).cast("int").as("n_toks"),
          size(array_distinct(toks)).cast("int").as("n_uniq"),
          array_contains(toks, "the").as("has_the"),
          array_position(toks, "the").as("pos_the"),
          element_at(sort_array(toks), 1).as("first_sorted"),
          array_join(slice(toks, 1, 3), " ").as("head3"))
        .orderBy(col("doc_id"))
    }),

    // Algebraic arg-max: max_by with a composite ordering struct — the
    // aggregate form of q_argmax_lineitem. At scale this beats the
    // window form (measured 2.7× at sf0.1): partial max_by runs
    // map-side, so the shuffle carries one candidate per (partition,
    // key) instead of every row through a sort. Only the ordering
    // columns are carried, so exact-duplicate ties stay deterministic.
    "r_argmax_maxby" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max_by(
          struct(col("l_linenumber"), col("l_quantity")),
          struct(col("l_quantity"), col("l_linenumber"))).as("m"))
        .select(col("l_orderkey"), col("m.l_linenumber"),
          col("m.l_quantity"))
        .orderBy(col("l_orderkey"))),

    // LOCF gap fill: sparse per-user purchase values carried forward.
    "r_locf" -> ((s, d) =>
      graft.operators.TimeSeries.fillForward(
          t(s, d, "events")
            .select(col("user_id"), col("event_id"), col("ts"),
              when(col("event_type") === "purchase", col("value"))
                .as("v_sparse")),
          col("user_id"), Seq(col("ts"), col("event_id")),
          col("v_sparse"), "v_filled")
        .select(col("user_id"), col("event_id"), col("v_sparse"),
          col("v_filled"))
        .orderBy(col("user_id"), col("event_id"))),

    // MapType surface: build a map, explode entries back to rows.
    "r_map_entries" -> ((s, d) =>
      t(s, d, "events").where(col("event_id") < 2000)
        .select(col("event_id"),
          explode(map(lit("et"), col("event_type"),
            lit("uid"), col("user_id").cast("string"))))
        .orderBy(col("event_id"), col("key"))),

    // Ordered string aggregation (listagg): deterministic via sort.
    "r_string_agg" -> ((s, d) =>
      t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy(col("n_regionkey"))),

    // Range (interval) join: clicks within the hour before each
    // purchase by the same user. Equality on the key bounds the pair
    // space; the time range is a post-join filter — the scalable shape
    // for interval joins on a keyed stream.
    "r_range_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
      p.join(c, Seq("user_id"))
        .where(col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"))
        .groupBy(col("user_id"), col("p_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy(col("user_id"), col("p_id"))
    }),

    // KEYLESS interval join through RangeJoin.intervalJoinTs: clicks
    // against 24 h windows opened by sampled purchases, NO equality
    // key. Spark's native plan for this predicate is a nested loop /
    // cartesian; binning turns it into a shuffled HASH join on the bin
    // id (plan-asserted in PlanAssertionsSpec) with exact post-filter —
    // each qualifying pair meets in exactly one bin, so no dedup pass.
    "r_interval_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val iv = e.where(col("event_type") === "purchase" &&
          col("event_id") % 41 === 0)
        .select(col("event_id").as("iv_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 24 HOURS")).as("hi"))
      val pts = e.where(col("event_type") === "click")
        .select(col("event_id").as("point_id"), col("ts"))
      graft.operators.RangeJoin.intervalJoinTs(pts, col("ts"), iv,
          col("lo"), col("hi"), binWidthMicros = 24L * 3600 * 1000000)
        .groupBy(col("iv_id")).agg(count(lit(1)).as("n_points"))
        .orderBy(col("iv_id"))
    }),

    // Bucketed-layout co-located fact⋈fact join: both sides written
    // ONCE as bucketed + per-bucket-sorted external tables on the join
    // key (Layout.writeBucketed), then joined AND aggregated on that
    // key — the standard cure for a recurring pipeline re-shuffling
    // 100 TB of fact data every run. The bucket layout satisfies both
    // the join and the aggregation distribution, so the only Exchange
    // left in the plan is the presentation sort (machine-asserted in
    // PlanAssertionsSpec; ScaleLayoutSpec shows the unbucketed twin
    // shuffling both sides). The result is layout-independent — it
    // hash-matches the plain-join oracle.
    "r_bucketed_join" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val liT = s"graft_bkt_lineitem_$tag"
      val ordT = s"graft_bkt_orders_$tag"
      if (!s.catalog.tableExists(liT))
        graft.operators.Layout.writeBucketed(
          t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity")),
          liT, s"/tmp/graft_bucketed/$tag/lineitem", buckets = 8,
          bucketCols = Seq("l_orderkey"), sortCols = Seq("l_orderkey"))
      if (!s.catalog.tableExists(ordT))
        graft.operators.Layout.writeBucketed(
          t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
          ordT, s"/tmp/graft_bucketed/$tag/orders", buckets = 8,
          bucketCols = Seq("o_orderkey"), sortCols = Seq("o_orderkey"))
      graft.operators.Layout.readBucketed(s, liT)
        .join(graft.operators.Layout.readBucketed(s, ordT),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("bigint").as("qty"))
        .orderBy(col("l_orderkey"))
    }),

    // Deterministic salted join (Skew.saltedJoin): the fact side gets a
    // content-derived salt, the dim side replicates once per salt, and
    // the join key becomes (key, salt) — a hot fact key spreads over 8
    // reducers instead of melting one. Salting is pure partitioning:
    // the aggregated result must hash-match the plain-join oracle.
    "r_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("l_quantity"))
      val sup = t(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      graft.operators.Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
          saltSource = col("l_orderkey") * 8 + col("l_linenumber"),
          salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("bigint").as("qty"))
        .orderBy(col("s_nationkey"))
    }),

    // Explicit CROSS JOIN (bounded cartesian — dims only).
    "r_cross_join" -> ((s, d) =>
      t(s, d, "region").select(col("r_name"))
        .crossJoin(t(s, d, "nation").select(col("n_name")))
        .orderBy(col("r_name"), col("n_name"))),

    // Self join: nation pairs sharing a region (a < b).
    "r_self_join" -> ((s, d) => {
      val n1 = t(s, d, "nation")
        .select(col("n_name").as("na"), col("n_regionkey").as("rk"))
      val n2 = t(s, d, "nation")
        .select(col("n_name").as("nb"), col("n_regionkey").as("rk"))
      n1.join(n2, Seq("rk")).where(col("na") < col("nb"))
        .select(col("rk"), col("na"), col("nb"))
        .orderBy(col("rk"), col("na"), col("nb"))
    }),

    // UNION BY NAME: column-order-independent union (schema aligned by
    // name, the safe form for evolving sources).
    "r_union_by_name" -> ((s, d) => {
      val a = t(s, d, "supplier")
        .select(col("s_suppkey").as("k"), col("s_name").as("nm"))
      val b = t(s, d, "supplier")
        .where(col("s_suppkey") < 10)
        .select(col("s_name").as("nm"), col("s_suppkey").as("k")) // swapped
      a.unionByName(b)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), min(col("nm")).as("nm"))
        .orderBy(col("k"))
    }),

    // Multiple DISTINCT aggregates in one pass (Expand-based rewrite).
    "r_multi_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          sum_distinct(col("l_quantity")).as("sum_uniq_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys
    // match each other instead of vanishing.
    "r_null_safe_join" -> ((s, d) => {
      val a = t(s, d, "nation")
        .select(col("n_nationkey").as("ak"),
          nullif(col("n_regionkey"), lit(1)).as("rk"))
      val b = t(s, d, "nation")
        .select(col("n_nationkey").as("bk"),
          nullif(col("n_regionkey"), lit(1)).as("rk2"))
      a.join(b, col("rk") <=> col("rk2"))
        .groupBy(col("ak")).agg(count(lit(1)).as("n_matches"))
        .orderBy(col("ak"))
    }),

    // Value histogram: fixed-width buckets via floor arithmetic — the
    // standard profiling sweep (exact: one double division + floor,
    // identical both engines).
    "r_histogram" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bucket"))),

    // nth_value / first_value over an explicit frame.
    "r_nth_value" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").where(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
          last(col("o_orderkey")).over(w).as("last_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Pearson correlation from integer-exact sums (same determinism
    // rationale as r_var_manual: never order-dependent float sums).
    "r_corr_manual" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sx"),
          sum(col("l_linenumber").cast("long")).as("sy"),
          sum((col("l_quantity") * col("l_quantity")).cast("long"))
            .as("sxx"),
          sum((col("l_linenumber") * col("l_linenumber")).cast("long"))
            .as("syy"),
          sum((col("l_quantity") * col("l_linenumber")).cast("long"))
            .as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy"))
               .cast("double")))).as("corr_qty_line"))
        .orderBy(col("l_returnflag"))),

    // Struct → JSON serialization (int/string fields: both engines emit
    // identical compact JSON; nulls kept for parity).
    "r_to_json" -> ((s, d) =>
      t(s, d, "nation")
        .select(col("n_nationkey"),
          to_json(struct(col("n_nationkey").as("k"),
            col("n_name").as("name")),
            Map("ignoreNullFields" -> "false")).as("j"))
        .orderBy(col("n_nationkey"))),

    // Higher-order function family: filter / transform / aggregate /
    // slice over token arrays (the composable surface — hot paths use
    // native expressions instead, see functions/).
    "r_hof_funcs" -> ((s, d) => {
      val toks = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"),
          size(filter(toks, t => length(t) > 4)).cast("int")
            .as("n_long"),
          aggregate(transform(toks, t => length(t).cast("long")),
            lit(0L), (h, x) => h + x).as("sum_len"),
          array_join(transform(slice(toks, 1, 3), t => upper(t)), " ")
            .as("head3_upper"))
        .orderBy(col("doc_id"))
    }),

    // One-row table profile: the usual pre-ingest data-quality summary
    // (row/distinct/null counts, domain bounds) in a single aggregate.
    "r_profile_stats" -> ((s, d) =>
      t(s, d, "orders")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_custkey")).as("n_cust"),
          sum(col("o_orderkey")).as("sum_key"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          count(when(col("o_orderpriority").isNull, 1)).as("null_prio"))),

    // regexp_extract_all: letter-run tokens, count + first.
    "r_regexp_extract" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)))
            .cast("int").as("n_words"),
          element_at(
            regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)), 1)
            .as("first_word"))
        .orderBy(col("doc_id")))
  )

  /** Same workload and oracle as r_asof_join, executed by the custom
    * AsOfJoinExec (LogicalPlan + Strategy + streaming-merge SparkPlan)
    * instead of the union+window composition — the DuckDB native ASOF
    * JOIN hash-checks a custom physical operator end to end.
    */
  /** The regime-auto entry point over the same shape as r_asof_native —
    * whichever physical formulation the stats pick, the answer must
    * hash-match the one DuckDB ASOF oracle.
    */
  private def asofAuto(s: SparkSession, d: String): DataFrame = {
    val dedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val o = t(s, d, "orders")
      .withColumn("__rn", row_number().over(dedup))
      .where(col("__rn") === 1)
      .select(col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp_ntz").as("rt"),
        col("o_orderkey").as("asof_o_orderkey"),
        col("o_totalprice").as("asof_o_totalprice"))
    val e = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.TimeSeries.asofJoinAuto(e, o,
        "user_id", "k", "ts", "rt")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_o_orderkey"), col("asof_o_totalprice"))
      .orderBy(col("event_id"))
  }

  private def asofNative(s: SparkSession, d: String): DataFrame = {
    // dedup via the natural row_number() idiom: with ~unique
    // (custkey, orderdate) groups the ArgMax max_by rewrite would be
    // counterproductive (two SortAggregates vs one group-limit
    // window), and the rule's sample-based ndv gate measures exactly
    // that and keeps the windowed plan — no rank() workaround needed
    val dedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val o = t(s, d, "orders")
      .withColumn("__rn", row_number().over(dedup))
      .where(col("__rn") === 1)
      .select(col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp_ntz").as("rt"),
        col("o_orderkey").as("asof_o_orderkey"),
        col("o_totalprice").as("asof_o_totalprice"))
    val e = t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.TimeSeries.asofJoinNative(e, o,
        "user_id", "k", "ts", "rt")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_o_orderkey"), col("asof_o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** The fact⋈fact as-of regime at 100 TB: BOTH sides too big to
    * broadcast, re-joined every run. Writing probe and reference ONCE
    * as bucketed tables on the as-of key (sorted by key, time) lets
    * the native merge as-of consume the bucket layout directly —
    * AsOfJoinExec's ClusteredDistribution(key) requirement is
    * satisfied by the bucket scans' HashPartitioning, so neither side
    * shuffles, and with one file per bucket the sortBy order also
    * stands in for the merge's (key, time) sort. Machine-asserted in
    * PlanAssertionsSpec (0 shuffle exchanges below the presentation
    * sort under the merge regime); the result is layout- and
    * regime-independent and hash-matches the ASOF JOIN oracle.
    */
  private def asofBucketed(s: SparkSession, d: String): DataFrame = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val probeT = s"graft_bkt_asof_events_$tag"
    val refT = s"graft_bkt_asof_ref_$tag"
    if (!s.catalog.tableExists(probeT))
      graft.operators.Layout.writeBucketed(
        t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts")),
        probeT, s"/tmp/graft_bucketed/$tag/asof_events", buckets = 8,
        bucketCols = Seq("user_id"), sortCols = Seq("user_id", "ts"))
    if (!s.catalog.tableExists(refT)) {
      val dedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val o = t(s, d, "orders")
        .withColumn("__rn", row_number().over(dedup))
        .where(col("__rn") === 1)
        .select(col("o_custkey").as("k"),
          col("o_orderdate").cast("timestamp_ntz").as("rt"),
          col("o_orderkey").as("asof_o_orderkey"),
          col("o_totalprice").as("asof_o_totalprice"))
      graft.operators.Layout.writeBucketed(o, refT,
        s"/tmp/graft_bucketed/$tag/asof_ref", buckets = 8,
        bucketCols = Seq("k"), sortCols = Seq("k", "rt"))
    }
    graft.operators.TimeSeries.asofJoinNative(
        graft.operators.Layout.readBucketed(s, probeT),
        graft.operators.Layout.readBucketed(s, refT),
        "user_id", "k", "ts", "rt")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_o_orderkey"), col("asof_o_totalprice"))
      .orderBy(col("event_id"))
  }

  /** The broadcast as-of's DESIGN regime: a big probe stream against a
    * ~150-row reference history. The native operator answers with a
    * broadcast + per-key binary search — the probe side is never
    * shuffled or sorted; the union+window twin (r_asof_broadcast_win,
    * same oracle) must shuffle and sort probe+reference together.
    * Benched head-to-head. At sf0.1 (100k probe rows) the two are
    * within fixed-cost noise of each other: the broadcast variant's
    * extra ~0.2 s is the BroadcastExchange job itself, a constant,
    * while the window twin's probe shuffle+sort grows linearly with
    * |L| — the crossover is ~1M probe rows and by 100 TB the window
    * form is shuffling the whole corpus where the native plan shuffles
    * nothing. The same-scale comparison (r_asof_native, |L| ≈ |R|)
    * documents the opposite regime, where union+window wins.
    */
  /** One oracle, two engines-side physical strategies (native
    * broadcast vs union+window) — both must hash-match it.
    */
  private[queries] val asofBroadcastOracle: String =
    """WITH o AS (
      |  SELECT o_custkey % 25 AS k, o_orderdate AS rt,
      |    o_orderkey AS ref_orderkey, o_totalprice AS ref_price
      |  FROM orders WHERE o_orderkey % 997 = 0
      |  QUALIFY row_number() OVER (PARTITION BY o_custkey % 25,
      |    o_orderdate ORDER BY o_orderkey DESC) = 1
      |), e AS (
      |  SELECT event_id, user_id % 25 AS uk, ts FROM events
      |)
      |SELECT e.event_id, o.ref_orderkey, o.ref_price
      |FROM e ASOF LEFT JOIN o ON e.uk = o.k AND e.ts >= o.rt
      |ORDER BY e.event_id""".stripMargin

  private def asofRefSides(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val dedup = Window.partitionBy(col("k"), col("rt"))
      .orderBy(col("ref_orderkey").desc)
    val r = t(s, d, "orders")
      .where(col("o_orderkey") % 997 === 0)
      .select((col("o_custkey") % 25).as("k"),
        col("o_orderdate").cast("timestamp_ntz").as("rt"),
        col("o_orderkey").as("ref_orderkey"),
        col("o_totalprice").as("ref_price"))
      .withColumn("__rn", rank().over(dedup))
      .where(col("__rn") === 1).drop("__rn")
    val e = t(s, d, "events")
      .select(col("event_id"), (col("user_id") % 25).as("uk"), col("ts"))
    (e, r)
  }

  private def asofBroadcast(s: SparkSession, d: String): DataFrame = {
    val (e, r) = asofRefSides(s, d)
    graft.operators.TimeSeries.asofJoinNative(e, r, "uk", "k", "ts", "rt")
      .select(col("event_id"), col("ref_orderkey"), col("ref_price"))
      .orderBy(col("event_id"))
  }

  private def asofBroadcastWin(s: SparkSession, d: String): DataFrame = {
    val (e, r) = asofRefSides(s, d)
    graft.operators.TimeSeries.asofJoinLast(e, r,
        col("uk"), col("k"), col("ts"), col("rt"),
        Seq("ref_orderkey", "ref_price"))
      .select(col("event_id"),
        col("asof_ref_orderkey").as("ref_orderkey"),
        col("asof_ref_price").as("ref_price"))
      .orderBy(col("event_id"))
  }

  val oracleSql: Map[String, String] = Map(
    "r_string_funcs2" ->
      """SELECT c_custkey,
        |  lpad(c_name, 22, '*') AS lp,
        |  rpad(c_mktsegment, 12, '.') AS rp,
        |  reverse(c_name) AS rev,
        |  repeat(c_mktsegment, 2) AS rep2,
        |  translate(c_name, 'Cust', 'Kvst') AS tr,
        |  split_part(c_name, '#', 2) AS num_part,
        |  CAST(instr(c_name, '#') AS INT) AS hash_pos,
        |  left(c_name, 8) AS l8,
        |  right(c_name, 4) AS r4,
        |  CAST(levenshtein(c_name, 'Customer#000000000') AS INT) AS lev
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "r_date_funcs2" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS dt,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
        |    AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE),
        |    DATE '1998-12-31') AS INT) AS days_to_end,
        |  make_date(CAST(year(o_orderdate) AS BIGINT),
        |    CAST(month(o_orderdate) AS BIGINT), 1) AS som
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "r_try_funcs" ->
      """SELECT o_orderkey,
        |  TRY_CAST(o_orderpriority AS INT) AS bad_int,
        |  TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT)
        |    AS prio_num,
        |  CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |    ELSE o_totalprice / (o_orderkey % 2) END AS odd_div,
        |  string_split(o_orderpriority, '-')[2] AS prio_word,
        |  string_split(o_orderpriority, '-')[5] AS oob
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "r_session_window" ->
      """WITH s AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL 12 HOUR
        |      THEN 1 ELSE 0 END AS nw
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s2 AS (
        |  SELECT user_id, ts, sum(nw) OVER (PARTITION BY user_id
        |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, min(ts) AS s_start,
        |  max(ts) + INTERVAL 12 HOUR AS s_end,
        |  count(*) AS n_events
        |FROM s2 GROUP BY user_id, sid ORDER BY user_id, s_start"""
        .stripMargin,
    "r_bit_scalar" ->
      """SELECT o_orderkey,
        |  o_orderkey << 3 AS shl,
        |  o_orderkey >> 2 AS shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS bc,
        |  xor(o_orderkey, o_custkey) AS xo,
        |  o_orderkey & o_custkey AS an,
        |  o_orderkey | o_custkey AS orr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "r_asof_broadcast" -> RelationalQueries2.asofBroadcastOracle,
    "r_asof_broadcast_win" -> RelationalQueries2.asofBroadcastOracle,
    "r_asof_auto" ->
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
    "r_asof_native" ->
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
    "r_asof_bucketed" ->
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
    "r_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
        |  l_linestatus NULLS FIRST""".stripMargin,
    "r_intersect" ->
      """SELECT c_custkey AS ck FROM customer
        |INTERSECT SELECT o_custkey AS ck FROM orders
        |ORDER BY ck""".stripMargin,
    "r_except" ->
      """SELECT c_custkey AS ck FROM customer
        |EXCEPT SELECT o_custkey AS ck FROM orders
        |WHERE o_totalprice > 300000
        |ORDER BY ck""".stripMargin,
    "r_intersect_all" ->
      """SELECT l_suppkey, l_quantity FROM lineitem
        |WHERE l_returnflag = 'A'
        |INTERSECT ALL
        |SELECT l_suppkey, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R'
        |ORDER BY l_suppkey, l_quantity""".stripMargin,
    "r_except_all" ->
      """SELECT l_suppkey, l_quantity FROM lineitem
        |WHERE l_returnflag = 'A'
        |EXCEPT ALL
        |SELECT l_suppkey, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R'
        |ORDER BY l_suppkey, l_quantity""".stripMargin,
    "r_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "r_scalar_subquery" ->
      """SELECT o_orderkey, o_orderstatus,
        |  (SELECT max(l_quantity) FROM lineitem l
        |   WHERE l.l_orderkey = o.o_orderkey) AS max_qty
        |FROM orders o WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin,
    "r_lateral" ->
      """SELECT o.o_orderkey, m.n_lines, m.max_qty
        |FROM orders o CROSS JOIN LATERAL (
        |  SELECT count(*) AS n_lines, max(l_quantity) AS max_qty
        |  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) m
        |WHERE o.o_orderkey < 1000
        |ORDER BY o.o_orderkey""".stripMargin,
    "r_ntile_cume" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "r_sliding_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  sum(l_quantity) OVER w AS win_sum,
        |  count(*) OVER w AS win_n,
        |  sum(l_quantity) OVER w / count(*) OVER w AS win_avg
        |FROM lineitem WHERE l_suppkey < 20
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  win_sum""".stripMargin,
    "r_cond_agg" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  bool_and(l_quantity > 0) AS all_pos,
        |  bool_or(l_discount > 0.09) AS any_deep_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "r_bit_agg" ->
      """SELECT l_returnflag,
        |  bit_and(l_orderkey) AS b_and,
        |  bit_or(l_orderkey) AS b_or,
        |  bit_xor(l_orderkey) AS b_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "r_var_manual" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
        |  CAST(sum(CAST(l_quantity * l_quantity AS BIGINT)) AS BIGINT)
        |    AS sumsq_q,
        |  (CAST(sum(CAST(l_quantity * l_quantity AS BIGINT)) AS BIGINT)
        |    - CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |      * CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |      / CAST(count(*) AS DOUBLE))
        |    / CAST(count(*) - 1 AS DOUBLE) AS var_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "r_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "r_approx_pct_err" ->
      """SELECT l_returnflag FROM lineitem GROUP BY 1 HAVING 1 = 0"""
        .stripMargin,
    "r_date_spine" ->
      """WITH spine AS (
        |  SELECT CAST(unnest(generate_series(DATE '1995-01-01',
        |    DATE '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS dt
        |), daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS dt, count(*) AS n_orders
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1
        |)
        |SELECT s.dt, coalesce(d.n_orders, 0) AS n_orders
        |FROM spine s LEFT JOIN daily d ON s.dt = d.dt
        |ORDER BY s.dt""".stripMargin,
    "r_unpivot" ->
      """SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
        |FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "r_array_funcs" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT)
        |    AS n_uniq,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  CAST(coalesce(list_position(string_split(text, ' '), 'the'), 0)
        |    AS BIGINT) AS pos_the,
        |  list_sort(string_split(text, ' '))[1] AS first_sorted,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS head3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "r_argmax_maxby" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_quantity DESC, l_linenumber DESC) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "r_locf" ->
      """SELECT user_id, event_id,
        |  CASE WHEN event_type = 'purchase' THEN value END AS v_sparse,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_filled
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "r_map_entries" ->
      """SELECT event_id, 'et' AS key, event_type AS value
        |FROM events WHERE event_id < 2000
        |UNION ALL
        |SELECT event_id, 'uid' AS key, CAST(user_id AS VARCHAR) AS value
        |FROM events WHERE event_id < 2000
        |ORDER BY event_id, key""".stripMargin,
    "r_string_agg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""
        .stripMargin,
    "r_range_join" ->
      """SELECT p.user_id, p.event_id AS p_id, count(*) AS n_clicks
        |FROM (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, ts FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "r_interval_join" ->
      """SELECT i.iv_id, count(*) AS n_points
        |FROM (SELECT event_id AS iv_id, ts AS lo,
        |        ts + INTERVAL 24 HOURS AS hi
        |      FROM events
        |      WHERE event_type = 'purchase' AND event_id % 41 = 0) i
        |JOIN (SELECT ts FROM events WHERE event_type = 'click') p
        |  ON p.ts >= i.lo AND p.ts <= i.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "r_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |       CAST(sum(l_quantity) AS BIGINT) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,
    "r_bucketed_join" ->
      """SELECT l_orderkey, o_orderdate, count(*) AS n_items,
        |       CAST(sum(l_quantity) AS BIGINT) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY l_orderkey""".stripMargin,
    "r_self_join" ->
      """SELECT a.n_regionkey AS rk, a.n_name AS na, b.n_name AS nb
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
        |ORDER BY rk, na, nb""".stripMargin,
    "r_union_by_name" ->
      """WITH u AS (
        |  SELECT s_suppkey AS k, s_name AS nm FROM supplier
        |  UNION ALL BY NAME
        |  SELECT s_name AS nm, s_suppkey AS k FROM supplier
        |  WHERE s_suppkey < 10
        |)
        |SELECT k, count(*) AS n, min(nm) AS nm FROM u
        |GROUP BY k ORDER BY k""".stripMargin,
    "r_multi_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
        |  sum(DISTINCT l_quantity) AS sum_uniq_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,
    "r_null_safe_join" ->
      """SELECT a.ak, count(*) AS n_matches
        |FROM (SELECT n_nationkey AS ak, nullif(n_regionkey, 1) AS rk
        |      FROM nation) a
        |JOIN (SELECT n_nationkey AS bk, nullif(n_regionkey, 1) AS rk2
        |      FROM nation) b
        |  ON a.rk IS NOT DISTINCT FROM b.rk2
        |GROUP BY a.ak ORDER BY a.ak""".stripMargin,
    "r_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "r_nth_value" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  last_value(o_orderkey) OVER w AS last_key
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "r_corr_manual" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sy,
        |    CAST(sum(CAST(l_quantity * l_quantity AS BIGINT)) AS BIGINT)
        |      AS sxx,
        |    CAST(sum(CAST(l_linenumber * l_linenumber AS BIGINT))
        |      AS BIGINT) AS syy,
        |    CAST(sum(CAST(l_quantity * l_linenumber AS BIGINT)) AS BIGINT)
        |      AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_line
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "r_to_json" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(k := n_nationkey, name := n_name)) AS j
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "r_hof_funcs" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> len(t) > 4)) AS INT) AS n_long,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ' '),
        |      t -> CAST(len(t) AS BIGINT))), (h, x) -> h + x) AS sum_len,
        |  array_to_string(list_transform(string_split(text, ' ')[1:3],
        |    t -> upper(t)), ' ') AS head3_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
    "r_profile_stats" ->
      """SELECT count(*) AS n_rows,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  CAST(count(CASE WHEN o_orderpriority IS NULL THEN 1 END)
        |    AS BIGINT) AS null_prio
        |FROM orders""".stripMargin,
    "r_regexp_extract" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INT)
        |    AS n_words,
        |  regexp_extract_all(text, '[A-Za-z]+')[1] AS first_word
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
