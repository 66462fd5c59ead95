package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.operators.Selection

/** DSIR importance resampling: arm agreement, determinism, model
  * boundedness, and the broadcast-join scale shape.
  */
class SelectionSpec extends SparkSuite {
  import spark.implicits._

  // raw corpus: half "web sports news" flavored, half "code docs"
  // flavored; target corpus is purely code-flavored — DSIR must
  // up-rank the code-flavored raw docs
  private lazy val raw = (1 to 40).map { i =>
    if (i % 2 == 0)
      (i.toLong, s"match score goal team win $i league play fans")
    else
      (i.toLong, s"def parse return value $i type struct compile link")
  }.toDF("doc_id", "text")
  private lazy val target = (1 to 6).map { i =>
    (100L + i, s"def compile return type $i struct parse value link")
  }.toDF("doc_id", "text")

  private lazy val rawFeats =
    Selection.dsirFeatures(raw, col("doc_id"), col("text"), 1024)
  private lazy val tgtFeats =
    Selection.dsirFeatures(target, col("doc_id"), col("text"), 1024)
  private lazy val bt = Selection.dsirBucketTable(rawFeats, tgtFeats)

  test("the fitted model is bounded by the bucket count") {
    assert(bt.count() <= 1024)
    // schema: (f, tcnt, rcnt) with no nulls
    assert(bt.where(col("tcnt").isNull || col("rcnt").isNull).count() === 0)
  }

  test("quantized scores up-rank target-flavored raw docs") {
    val top = Selection.dsirTopK(
      Selection.dsirQuantizedScores(rawFeats, bt), 20)
      .select("id").as[Long].collect().toSet
    // the 20 code-flavored docs are exactly the odd ids
    assert(top === (1 to 40).filter(_ % 2 == 1).map(_.toLong).toSet)
  }

  test("ln arm agrees with the quantized arm on selection") {
    val lnTop = Selection.dsirTopK(
      Selection.dsirLogWeights(rawFeats, bt, 1024)
        .withColumnRenamed("logw", "score"), 20)
      .select("id").as[Long].collect().toSet
    val qTop = Selection.dsirTopK(
      Selection.dsirQuantizedScores(rawFeats, bt), 20)
      .select("id").as[Long].collect().toSet
    assert(lnTop === qTop)
  }

  test("qlog3 is floor(3*log2) with saturation at the clamp") {
    val vals = Seq(1L, 2L, 3L, 7L, 8L, 1000L,
      Selection.QlogClamp, Selection.QlogClamp + 5000)
    val got = vals.toDF("v").select(Selection.qlog3(col("v")))
      .as[Long].collect().toSeq
    val want = vals.map(v => math.floor(3.0 *
      (math.log(math.min(v, Selection.QlogClamp).toDouble) /
        math.log(2.0))).toLong)
    // floating log can sit a hair under an exact power of two —
    // compare against the exact integer formulation instead
    def exact(v: Long): Long = {
      val c = math.min(v, Selection.QlogClamp)
      63L - java.lang.Long.numberOfLeadingZeros(c * c * c)
    }
    assert(got === vals.map(exact))
    assert(want.zip(vals.map(exact)).forall { case (a, b) =>
      (a - b).abs <= 1 }) // sanity: the two formulations track
  }

  test("Gumbel top-k is deterministic and shifts with temperature") {
    val w = Selection.dsirLogWeights(rawFeats, bt, 1024)
      .join(raw.select(col("doc_id").as("id"), col("text")), Seq("id"))
    val a = Selection.dsirGumbelTopK(w, col("text"), 10)
      .select("id").as[Long].collect().toSeq
    val b = Selection.dsirGumbelTopK(w, col("text"), 10)
      .select("id").as[Long].collect().toSeq
    assert(a === b) // content-hash noise: reproducible run-over-run
    // at very low temperature the weights dominate the noise — the
    // selection converges to the deterministic top-k
    val cold = Selection.dsirGumbelTopK(w, col("text"), 10,
      temperature = 1e-9).select("id").as[Long].collect().toSet
    val det = Selection.dsirTopK(
      Selection.dsirLogWeights(rawFeats, bt, 1024)
        .withColumnRenamed("logw", "score"), 10)
      .select("id").as[Long].collect().toSet
    assert(cold === det)
  }

  test("incremental model refresh equals the from-scratch fit; " +
      "persisted table round-trips") {
    val batch = (100 to 110).map(i =>
      (i.toLong, s"def struct compile $i parse")).toDF("doc_id", "text")
    val batchFeats =
      Selection.dsirFeatures(batch, col("doc_id"), col("text"), 1024)
    val refreshed = Selection.refreshBucketTable(bt, batchFeats)
    val scratch = Selection.dsirBucketTable(
      rawFeats.unionByName(batchFeats), tgtFeats)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(key(refreshed) === key(scratch)) // bit-identical model
    // persisted artifact round-trips exactly
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dsir-").toString + "/bt"
    Selection.saveBucketTable(refreshed, dir)
    assert(key(Selection.loadBucketTable(spark, dir)) === key(refreshed))
  }

  test("model retraction equals the from-scratch fit over survivors; " +
      "fully-retracted buckets drop; scores forget the deleted docs") {
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    // retract the even (sports-flavored) raw docs
    val doomed = raw.where(col("doc_id") % 2 === 0)
    val doomedFeats =
      Selection.dsirFeatures(doomed, col("doc_id"), col("text"), 1024)
    val survFeats = Selection.dsirFeatures(
      raw.where(col("doc_id") % 2 =!= 0), col("doc_id"), col("text"),
      1024)
    val retracted = Selection.retractBucketTable(bt, doomedFeats)
    val scratch = Selection.dsirBucketTable(survFeats, tgtFeats)
    assert(key(retracted) === key(scratch)) // bit-identical model
    // sports-only buckets (rcnt from deleted docs only, tcnt 0) are
    // gone, not zeroed — the from-scratch fit has no such rows
    assert(retracted.where(col("tcnt") === 0L && col("rcnt") === 0L)
      .isEmpty)
    // survivor scoring with the retracted model ≡ from-scratch
    val gotScores = Selection.dsirQuantizedScores(survFeats, retracted)
      .as[(Long, Long)].collect().toSet
    val wantScores = Selection.dsirQuantizedScores(survFeats, scratch)
      .as[(Long, Long)].collect().toSet
    assert(gotScores === wantScores)
  }

  test("scoring joins the model by broadcast; one shuffle for the doc sum") {
    val scored = Selection.dsirQuantizedScores(rawFeats, bt)
    scored.collect()
    val nodes = physicalNodes(scored)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "bucket table must ride a broadcast, never a shuffle join")
    // shuffles: the two fit aggregations + the per-doc sum; the
    // corpus-side feature explode itself never shuffles
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 3, s"expected <= 3 exchanges, got $shuffles")
  }
}
