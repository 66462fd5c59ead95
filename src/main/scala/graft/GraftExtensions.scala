package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CharTrigramsExpr, MinHashSigExpr, ShinglesExpr, SimHash64Expr, SimHashFpExpr, VecDot}

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions to SQL users.
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ =>
      graft.functions.RemoveRedundantUtf8Encode)
    ext.injectOptimizerRule(_ =>
      graft.functions.ArgMaxWindowToMaxBy)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "shingles"),
      (args: Seq[Expression]) =>
        ShinglesExpr(args(0), intArg(args(1), "shingle size"))))
    ext.injectFunction((
      FunctionIdentifier("char_trigrams"),
      new ExpressionInfo(classOf[CharTrigramsExpr].getName, "char_trigrams"),
      (args: Seq[Expression]) => CharTrigramsExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFpExpr].getName, "simhash_fp"),
      (args: Seq[Expression]) => SimHashFpExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0),
        intArg(args(1), "shingle size"), intArg(args(2), "k"))))
  }
}
