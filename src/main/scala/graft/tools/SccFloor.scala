package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot floor measurement for the chain-of-SCCs adversary
  * (x_scc_chain): counts the Spark JOBS the alternating-direction
  * forward-backward drain schedules and the wall each pays, to pin
  * the claim that the query's cost at local[32] is per-round job
  * SCHEDULING latency (rounds are topology-bound), not data volume.
  * Usage: `runMain graft.tools.SccFloor /root/testdata/sf0.1`.
  */
object SccFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobWallNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    // boxed values: CHM.remove on a missing key returns null, which a
    // primitive-Long map would silently unbox to 0 and mis-count
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts.put(e.jobId, java.lang.Long.valueOf(System.nanoTime())): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(e.jobId)
        if (t0 ne null) {
          jobs.incrementAndGet(): Unit
          jobWallNanos.addAndGet(System.nanoTime() - t0.longValue()): Unit
        }
      }
    })
    // two passes: cold (JVM/codegen warmup) then warm — the warm line
    // is the floor the bench's min-of-2 sees
    Seq("cold", "warm").foreach { label =>
      jobs.set(0L); jobWallNanos.set(0L)
      val t0 = System.nanoTime()
      val n = graft.queries.TrainingQueries
        .queries("x_scc_chain")(spark, sfDir)
        .count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; a short settle suffices
      Thread.sleep(2000L)
      val j = jobs.get()
      val jw = jobWallNanos.get() / 1e9
      println(f"[scc-floor] $label sf=$sfDir rows=$n wall=$wall%.2f s " +
        f"jobs=$j jobWallSum=$jw%.2f s avgJob=${jw / math.max(j, 1)}%.4f s")
      graft.operators.Checkpoints.freeTransient(spark)
    }
    spark.stop()
  }
}
