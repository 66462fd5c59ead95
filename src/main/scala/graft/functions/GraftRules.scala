package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Encode, OctetLength}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** Optimizer rule: `octet_length(encode(s, 'UTF-8'))` ≡ `octet_length(s)`
  * — Spark strings are UTF-8 internally (UTF8String), so the encode is a
  * byte-for-byte copy. Saves one full materialization of every payload's
  * bytes in multimodal-metadata scans.
  *
  * Registered through GraftExtensions.injectOptimizerRule — the engine's
  * `Rule[LogicalPlan]` extension surface.
  */
object RemoveRedundantUtf8Encode extends Rule[LogicalPlan] {
  private val Utf8Names = Set("utf-8", "utf8")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case OctetLength(e: Encode)
          if e.charset.foldable && e.str.dataType == StringType &&
            Option(e.charset.eval()).exists(c =>
              Utf8Names.contains(c.toString.toLowerCase)) =>
        OctetLength(e.str)
    }
}
