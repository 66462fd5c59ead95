package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named shipped queries to files —
  * the before/after plan evidence of an optimization round. Local
  * tool, not a driver surface.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...>
  * writes <outDir>/<query>_<suffix>.txt per query. Session mirrors
  * Bench's (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus,
  * extensions installed) so the captured plans are the benched plans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir)): Unit
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan =
        try {
          val df = fn(spark, sfDir)
          // queryExecution.explainString gives the formatted text
          // without printing to stdout
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR: ${e}" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8")): Unit
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
