package graft.tools

import org.apache.spark.sql.SparkSession

/** Disposable per-job profiler for one shipped query: runs it twice
  * (cold, warm) and prints every Spark job's wall time + description
  * for the WARM run — where does a 4 s query spend its jobs?
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count(): Unit  // cold: artifact builds, codegen
    graft.operators.Checkpoints.freeTransient(spark)
    val jobs =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(
            e.properties.getProperty("spark.job.description"))
            .orElse(Option(
              e.properties.getProperty("callSite.short")))
            .getOrElse("?")
          jobs.put(e.jobId, (e.time, d)): Unit
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, d) = jobs.getOrDefault(e.jobId, (e.time, "?"))
          System.err.println(
            f"[job] ${e.jobId}%3d ${(e.time - t0) / 1000.0}%6.2fs  $d")
        }
      })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count(): Unit
    System.err.println(
      f"[warm-total] ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
