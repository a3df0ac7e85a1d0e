package graft.plans

import graft.functions.Md5Prefix64
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Semantics-preserving rewrite: the portable cross-engine hash pattern
  *
  *   cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint)
  *
  * (written that way so the DuckDB oracles can evaluate the identical
  * expression) becomes the single-pass native [[Md5Prefix64]]. The rewrite
  * is exact: conv-of-15-hex-chars parses the first 60 digest bits, which is
  * precisely what Md5Prefix64 computes, for every input including the empty
  * string; null propagation is identical (all nodes are null-intolerant).
  */
object NativeHashRule extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  /** Md5 takes BINARY; the analyzer wraps string args in a cast-to-binary
    * (UTF-8 bytes — exactly what Md5Prefix64 hashes).
    */
  private object StringToMd5Input {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(s, BinaryType, _, _) if s.dataType.isInstanceOf[StringType] => Some(s)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressionsWithSubqueries {
    case Cast(Conv(Substring(Md5(StringToMd5Input(x)), IntLit(1), IntLit(15)), IntLit(16), IntLit(10), _),
        LongType, _, _) =>
      Md5Prefix64(x)
  }
}
