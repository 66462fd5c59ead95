package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SwellStream
import java.sql.Timestamp

/** Streaming daily-max: drive the windowed arg-max with a MemoryStream,
  * assert batch-equivalent results and idempotent re-delivery.
  */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  def payload(times: Seq[String], swells: Seq[Double]): String = {
    val t = times.map("\"" + _ + "\"").mkString("[", ",", "]")
    val arr = swells.mkString("[", ",", "]")
    val zeros = swells.map(_ => "0.0").mkString("[", ",", "]")
    s"""{"hourly":{"time":$t,"wave_height":$zeros,
       |"wave_direction":$zeros,"wind_wave_direction":$zeros,
       |"swell_wave_height":$arr,"swell_wave_direction":$zeros,
       |"swell_wave_period":$zeros}}""".stripMargin.replace("\n", "")
  }

  test("streaming daily max matches batch semantics incl. tie-break") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val raw = in.toDF().toDF("timestamp", "location", "data")
    val q = SwellStream.dailyMax(raw).writeStream
      .format("memory").queryName("daily").outputMode("complete").start()
    try {
      // tie on swell 1.1 at 00:00 and 01:00 → latest hour must win
      in.addData((Timestamp.valueOf("2026-08-12 00:00:00"), "Tamarack",
        payload(Seq("2026-08-10T00:00", "2026-08-10T01:00"), Seq(1.1, 1.1))))
      q.processAllAvailable()
      val r1 = spark.table("daily").collect()
      assert(r1.length == 1)
      assert(r1(0).getAs[Timestamp]("timestamp") ==
        Timestamp.valueOf("2026-08-10 01:00:00"))

      // duplicate re-delivery + a new higher hour on the same day
      in.addData((Timestamp.valueOf("2026-08-12 01:00:00"), "Tamarack",
        payload(Seq("2026-08-10T01:00", "2026-08-10T02:00"), Seq(1.1, 2.0))))
      q.processAllAvailable()
      val r2 = spark.table("daily").collect()
      assert(r2.length == 1)
      assert(r2(0).getAs[Double]("swell_wave_height") == 2.0)
      assert(r2(0).getAs[java.sql.Date]("dt") ==
        java.sql.Date.valueOf("2026-08-10"))

      // second location lands in its own group
      in.addData((Timestamp.valueOf("2026-08-12 02:00:00"), "Oside_pier",
        payload(Seq("2026-08-10T05:00"), Seq(0.4))))
      q.processAllAvailable()
      assert(spark.table("daily").count() == 2)
    } finally q.stop()
  }
}
