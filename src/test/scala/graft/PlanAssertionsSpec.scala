package graft

import org.apache.spark.sql.DataFrame
import graft.queries.ParityQueries

/** Machine-checked plan properties: the scale-critical optimizations must
  * actually appear in the physical plan, not just in comments.
  */
class PlanAssertionsSpec extends SparkSuite {

  def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.executedPlan.toString()
  }

  test("q_filter_project pushes its predicate into the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters") &&
      p.contains("IsNotNull(event_type)"), p.take(800))
  }

  test("q_scan_project prunes the read schema to selected columns") {
    val df = SparkEntry.queries("q_scan_project")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("ReadSchema: struct<r_regionkey:int,r_name:string>"),
      p.take(800))
  }

  test("q_join_dims uses broadcast hash joins for the dimensions") {
    val p = plan("q_join_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("arg-max queries hit partial WindowGroupLimit before the shuffle") {
    Seq("q_argmax_daily", "q_argmax_lineitem").foreach { q =>
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q:\n${p.take(800)}")
      assert(p.contains("Partial"), s"$q misses partial mode")
    }
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("r_interval_join plans a HASH join on the bin id, not a nested " +
      "loop (keyless range join scale path)") {
    val p = plan("r_interval_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.take(1200))
    assert(p.contains("Join") || p.contains("join"), p.take(400))
  }

  test("runtime bloom-filter join pruning engages on a selective " +
      "shuffle join (100 TB fact-scan reduction path)") {
    // At 100 TB a selective dim filter should prune the fact scan
    // BEFORE the join via Spark's runtime bloom filter (injected on the
    // application side when the creation side is filtered + shuffled).
    // Default thresholds target >10 GB scans; lower them to observe the
    // mechanism on test data with broadcast off (BHJ path uses its own
    // pruning).
    import org.apache.spark.sql.functions.col
    import graft.queries.ParityQueries.t
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "100MB",
      "spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = t(spark, sf0001, "lineitem")
      val ords = t(spark, sf0001, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ords,
        li("l_orderkey") === ords("o_orderkey"))
      val opt = joined.queryExecution.optimizedPlan.toString()
      assert(opt.contains("might_contain") &&
        opt.contains("bloom_filter_agg"), opt.take(1200))
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("r_bucketed_join: bucket layout eliminates the join and agg " +
      "shuffles — only the presentation sort exchanges") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // writeBucketed guarantees one file per bucket, which licenses the
    // scan reporting its sortBy order — that's what eliminates the SMJ
    // sorts on top of the exchanges
    spark.conf.set(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val df = SparkEntry.queries("r_bucketed_join")(spark, sf0001)
      df.collect() // finalize the AQE plan
      val nodes = physicalNodes(df)
      val str = df.queryExecution.executedPlan.toString()
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 1, s"expected only the orderBy shuffle:\n" +
        str.take(1500))
      assert(str.contains("SortMergeJoin"), str.take(800))
      // single-file-per-bucket sorted scans feed the SMJ directly: the
      // only Sort node is the top-level presentation sort
      val sorts = nodes.count(_.isInstanceOf[SortExec])
      assert(sorts == 1, s"expected only the orderBy sort:\n" +
        str.take(1500))
      // both scans report their bucket layout
      assert(str.contains("SelectedBucketsCount"), str.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("r_asof_bucketed: bucket layout makes the merge-regime as-of " +
      "join shuffle-free on both sides") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // force the merge regime (at test scale the reference side would
    // broadcast) and let the one-file-per-bucket sorted scans report
    // their order, standing in for the merge's (key, time) sorts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val df = SparkEntry.queries("r_asof_bucketed")(spark, sf0001)
      df.collect() // finalize the AQE plan
      val nodes = physicalNodes(df)
      val str = df.queryExecution.executedPlan.toString()
      assert(str.contains("AsOfJoin"), str.take(800))
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 1, s"expected only the orderBy shuffle:\n" +
        str.take(1500))
      val sorts = nodes.count(_.isInstanceOf[SortExec])
      assert(sorts == 1, s"expected only the orderBy sort:\n" +
        str.take(1500))
      assert(str.contains("SelectedBucketsCount"), str.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("r_asof_auto picks the window composition at test scale " +
      "(comparable sides — no custom node, no broadcast job)") {
    val p = plan("r_asof_auto")
    assert(!p.contains("AsOfJoin") && p.contains("Window"), p.take(800))
  }

  test("r_salted_join joins on (key, salt) with a hash join, not a " +
      "nested loop") {
    val p = plan("r_salted_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.take(1200))
    assert(p.contains("Join"), p.take(400))
  }

  test("native MinHash/SimHash signatures are exchange-free narrow maps") {
    import org.apache.spark.sql.functions.col
    import graft.queries.ParityQueries.t
    Seq(
      graft.operators.Dedup.minhashSigsNative(
        t(spark, sf0001, "documents"), col("doc_id"), col("text")),
      graft.operators.Dedup.simhash(
        t(spark, sf0001, "documents"), col("doc_id"), col("text"))
    ).foreach { df =>
      val p = df.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"),
        s"signature computation must not shuffle:\n${p.take(800)}")
    }
  }

  test("NOT EXISTS decorrelates to an anti join (no subquery at runtime)") {
    val p = plan("r_exists_subquery")
    assert(p.contains("LeftAnti"), p.take(800))
  }

  test("date spine joins the generated calendar by broadcast") {
    val p = plan("r_date_spine")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("grouping sets aggregate in one pass (single Expand, no re-scan)") {
    val p = plan("r_grouping_sets")
    assert(p.linesIterator.count(_.contains("Expand [")) == 1,
      p.take(1200))
    assert(p.linesIterator.count(_.contains("FileScan")) == 1, p.take(1200))
  }

  test("x_ngram_jaccard: two full-row shuffles plus the fixed-width cap pass") {
    val p = plan("x_ngram_jaccard")
    // single-pass core: the bucket member collect and the pair-count
    // aggregate (full rows); the boundedBucketMembers cap adds ONE
    // 8-byte count pre-pass whose eligible-key set rides a broadcast
    // into the semi join — the buffer-bounding trade adopted round 9
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    val bcasts = "BroadcastExchange".r.findAllIn(p).size
    assert(shuffles == 3,
      s"expected 3 shuffle exchanges, got $shuffles:\n${p.take(1600)}")
    assert(bcasts <= 1,
      s"expected <= 1 broadcast, got $bcasts:\n${p.take(1600)}")
  }

  test("flagship pipeline scan reads only the referenced columns") {
    import org.apache.spark.sql.functions._
    val raw = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.Schemas.raw)
    val p = graft.pipeline.SwellPipeline.full(raw)
      .queryExecution.optimizedPlan.toString()
    // ingestion timestamp column must be pruned away (payload carries its
    // own hourly timestamps)
    assert(!p.contains("timestamp#0"), p.take(500))
  }
}
