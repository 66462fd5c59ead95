package graft

import org.apache.spark.sql.Row
import graft.model.Schemas
import graft.pipeline.SwellPipeline
import java.sql.Timestamp

/** Property tests for the arg-max core (SURVEY.md §5.4): result ⊆ input,
  * exactly one row per non-empty (dt, location), selected swell = group
  * max, tie-break = latest timestamp. Seeded random inputs (duplicate
  * swell values force ties).
  */
class ArgMaxPropertySpec extends SparkSuite {

  case class H(tsHour: Int, location: String, swell: Double)

  def ts(hour: Int): Timestamp = Timestamp.valueOf(
    f"2026-08-${10 + hour / 24}%02d ${hour % 24}%02d:00:00")

  def staged(rows: List[H]) = {
    val data = rows.map { h =>
      val t = ts(h.tsHour)
      Row(t, h.location, 1.0, 2.0, 3.0, h.swell, 4.0, 5.0,
        java.sql.Date.valueOf(t.toLocalDateTime.toLocalDate))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), Schemas.staged)
  }

  test("argmax invariants hold for seeded random inputs") {
    val swells = Array(0.5, 1.0, 1.0, 1.5, 2.0)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val rows = List.fill(40)(H(rnd.nextInt(72),
        Seq("A", "B", "C")(rnd.nextInt(3)),
        swells(rnd.nextInt(swells.length))))
      val out = SwellPipeline.dailyMax(staged(rows)).collect()
      val groups = rows.groupBy(h => (10 + h.tsHour / 24, h.location))
      assert(out.length == groups.size, s"seed=$seed group count")
      out.foreach { r =>
        val day = r.getDate(8).toString.takeRight(2).toInt
        val g = groups((day, r.getString(1)))
        val maxSwell = g.map(_.swell).max
        assert(r.getDouble(5) == maxSwell, s"seed=$seed max")
        val wantHour = g.filter(_.swell == maxSwell).map(_.tsHour).max
        assert(r.getTimestamp(0) == ts(wantHour), s"seed=$seed tiebreak")
      }
    }
  }
}
