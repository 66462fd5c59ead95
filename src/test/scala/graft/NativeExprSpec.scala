package graft

import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import org.apache.spark.sql.functions._
import graft.functions.{CharTrigramsExpr, ShinglesExpr, SimHash64Expr}
import graft.queries.ParityQueries.t

/** The native expressions must match their composable (lambda-based)
  * formulations exactly — they are performance rewrites, not semantic
  * changes.
  */
class NativeExprSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = t(spark, sf0001, "documents").limit(100)

  test("ShinglesExpr ≡ split/transform/slice/concat_ws lambdas") {
    val toks = split($"text", " ")
    val idx = when(size(toks) >= 3, sequence(lit(0), size(toks) - 3))
      .otherwise(array().cast("array<int>"))
    val lambdaForm = transform(idx,
      i => concat_ws(" ", slice(toks, i + lit(1), lit(3))))
    val nativeForm = toColumn(ShinglesExpr(toExpression($"text"), 3))
    val diff = docs.select($"doc_id", lambdaForm.as("a"), nativeForm.as("b"))
      .where(not($"a" <=> $"b")).count()
    assert(diff == 0)
    // edge cases: short doc, empty text, consecutive spaces
    val edge = Seq("one two", "", "a  b  c d", "x y z").toDF("text")
    val ediff = edge.select(lambdaForm.as("a"), nativeForm.as("b"))
      .where(not($"a" <=> $"b")).count()
    assert(ediff == 0)
  }

  test("CharTrigramsExpr ≡ sequence/transform/substr lambdas") {
    val lambdaForm = when(length($"text") < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), length($"text") - 3),
        i => $"text".substr(i + lit(1), lit(3))))
    val nativeForm = toColumn(CharTrigramsExpr(toExpression($"text")))
    val diff = docs.select($"doc_id", lambdaForm.as("a"), nativeForm.as("b"))
      .where(not($"a" <=> $"b")).count()
    assert(diff == 0)
    // edge cases: short/empty text, multi-byte chars (char not byte windows)
    val edge = Seq("", "ab", "abc", "abcd", "héllo wörld", "日本語テキスト")
      .toDF("text")
    val ediff = edge.select(lambdaForm.as("a"), nativeForm.as("b"))
      .where(not($"a" <=> $"b")).count()
    assert(ediff == 0)
  }

  test("LinearTextScoreExpr ≡ explode + per-token fingerprint weight sum; " +
      "hand values on empty/multi-space/multi-byte") {
    val weights = Array.tabulate(256)(j =>
      ((j * 2654435761L + 12345L) % 2003L) - 1001L)
    val native = graft.operators.TextAnalysis.linearQualityScore(
      docs, $"doc_id", $"text", weights)
    val composed = docs
      .select($"doc_id".as("id"), explode(split($"text", " ")).as("tok"))
      .withColumn("f", graft.operators.TextAnalysis.fingerprint($"tok"))
      .withColumn("w", (($"f" % 256) * 2654435761L + 12345L) % 2003L - 1001L)
      .groupBy($"id").agg(sum($"w").as("score"))
    val diff = native.as("a").join(composed.as("b"), Seq("id"))
      .where($"a.score" =!= $"b.score").count()
    assert(diff == 0)
    // hand-computed (independent python reference, incl. DuckDB parity):
    // empty text = one empty token = w(0); consecutive spaces add empty
    // tokens; é folds as one code point
    val edge = Seq((0L, "the cat"), (1L, ""), (2L, "a  b"), (3L, "héllo"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.linearQualityScore(
        edge, $"doc_id", $"text", weights)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 2L, -164L), (1L, 1L, -674L),
      (2L, 3L, -195L), (3L, 1L, -69L)))
  }

  test("PqCodesExpr ≡ the unrolled struct-min trees it replaced, " +
      "bit for bit, plain and residual modes, on real embeddings") {
    import graft.operators.Similarity
    val embs = t(spark, sf0001, "embeddings")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val cents = Similarity.fitCentroids(embs, k = 16, iters = 3)
    val books = Similarity.fitPqCodebooks(embs, m = 16, ks = 16,
      iters = 2, coarse = Some(cents))
    val withCell = embs.withColumn("cell",
      element_at(Similarity.topCellsCol($"vec", cents, 1), 1))
    val plain = withCell.select(
        Similarity.pqCodesCol($"vec", books).as("a"),
        Similarity.pqCodesColStructMin($"vec", books).as("b"))
      .where(not($"a" <=> $"b")).count()
    assert(plain == 0)
    val residual = withCell.select(
        Similarity.pqCodesColResidual($"vec", $"cell", cents, books)
          .as("a"),
        Similarity.pqCodesColResidualStructMin($"vec", $"cell",
          cents, books).as("b"))
      .where(not($"a" <=> $"b")).count()
    assert(residual == 0)
  }

  test("SimHash64Expr ≡ explode + 64 bit-sum aggregates over xxhash64") {
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("tok"))
      .withColumn("h", xxhash64($"tok"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val composed = agg.select($"doc_id",
      (0 until 64).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
        .reduce(_ + _).as("simhash"))
    val native = docs.select($"doc_id",
      toColumn(SimHash64Expr(toExpression($"text"))).as("simhash"))
    val joined = composed.as("c").join(native.as("n"), "doc_id")
      .where($"c.simhash" =!= $"n.simhash")
    assert(joined.count() == 0)
  }
}
