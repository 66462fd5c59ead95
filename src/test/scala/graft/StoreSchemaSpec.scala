package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Stats}

/** Schema guards at store open: every graph-family store read asserts
  * its family's (name → type) schema and fails LOUDLY with
  * [[Stats.StoreSchemaException]] on a drifted or corrupted store dir
  * — "store at PATH: expected/found" — instead of an obscure analysis
  * error mid-query (or a silent cast).
  */
class StoreSchemaSpec extends SparkSuite {
  import spark.implicits._

  test("a drifted store dir fails at open with the named error; a " +
      "healthy store answers unchanged") {
    val base = s"/tmp/graft-schemaguard-${System.nanoTime()}"
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    Graph.writeCCStore(edges, col("u"), col("v"), s"$base/cc")
    assert(Graph.ccStoreLabels(spark, s"$base/cc").count() == 3)
    // drift 1: a retyped column (comp written as string)
    Seq((1L, "a", 0L)).toDF("id", "comp", "__b")
      .write.parquet(s"$base/bad/batch=0")
    val ex = intercept[Stats.StoreSchemaException] {
      Graph.ccStoreLabels(spark, s"$base/bad")
    }
    assert(ex.getMessage.contains(s"$base/bad") &&
      ex.getMessage.contains("expected") &&
      ex.getMessage.contains("found"), ex.getMessage)
    // drift 2: a missing/renamed column (rank absent from a PageRank
    // store dir — e.g. a foreign store mounted at the wrong path)
    Seq((1L, 5L, 0L)).toDF("id", "score", "__b")
      .write.parquet(s"$base/pr/batch=0")
    val ex2 = intercept[Stats.StoreSchemaException] {
      Graph.pageRankStoreRanks(spark, s"$base/pr")
    }
    assert(ex2.getMessage.contains("pageRankStore"), ex2.getMessage)
  }

  test("gate stores (name-declared columns) fail loudly on a missing " +
      "column with the store path, not an unresolved-column error") {
    val base = s"/tmp/graft-gateguard-${System.nanoTime()}"
    Seq((1L, 2L)).toDF("wrong", "cols")
      .write.parquet(s"$base/store/batch=0")
    val ex = intercept[Stats.StoreSchemaException] {
      graft.streaming.StreamOps.gateStoreView(spark, s"$base/store",
        Seq("band", "bucket", "id", "sig"))
    }
    assert(ex.getMessage.contains(s"$base/store") &&
      ex.getMessage.contains("missing"), ex.getMessage)
  }
}
