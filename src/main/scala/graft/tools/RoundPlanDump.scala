package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the PER-ROUND physical plans of the iterative graph operators
  * — the committed evidence that a round's vote/contribution path has
  * (or has not) an `Exchange` in the broadcast regime. The shipped
  * query's own explain covers only the final readout fragment of a
  * driver-side job loop; this tool taps [[graft.operators.Graph]]'s
  * `roundPlanProbe` hook to capture the FIRST occurrence of each
  * distinct round tag while the query actually runs.
  *
  * Usage: runMain graft.tools.RoundPlanDump <outDir> <suffix> <q1,...>
  * writes <outDir>/<query>__<tag>_<suffix>.txt per (query, tag).
  * Session mirrors Bench's (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, extensions) so captured plans are the
  * benched plans. Local tool, not a driver surface.
  */
object RoundPlanDump {
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
      val seen = scala.collection.mutable.Map.empty[String, String]
      graft.operators.Graph.roundPlanProbe = Some { (tag, df) =>
        if (!seen.contains(tag)) {
          // execute the fragment first so the captured plan is the
          // FINAL adaptive plan (AQE runtime join rewrites included),
          // not the isFinalPlan=false initial guess — round fragments
          // are fixture-sized, the extra execution is milliseconds
          df.collect(): Unit
          seen(tag) = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        }
      }
      try {
        val fn = graft.SparkEntry.queries(name)
        fn(spark, sfDir).count(): Unit
      } catch { case e: Throwable =>
        System.err.println(s"[roundplan] $name failed: $e")
      } finally {
        graft.operators.Graph.roundPlanProbe = None
        graft.operators.Checkpoints.freeTransient(spark)
      }
      seen.foreach { case (tag, plan) =>
        val f = s"${name}__${tag}_$suffix.txt"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, f),
          plan.getBytes("UTF-8")): Unit
        println(s"wrote $outDir/$f")
      }
    }
    spark.stop()
  }
}
