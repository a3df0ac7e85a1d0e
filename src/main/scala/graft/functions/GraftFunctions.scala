package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Imperative registration of the engine's native functions, for sessions
  * built WITHOUT `spark.sql.extensions=graft.GraftExtensions` (a host that
  * calls `SparkEntry.queries` from its own bare session). Idempotent;
  * operator code that uses the functions calls this first.
  */
object GraftFunctions {
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(new FunctionIdentifier("vec_dot")))
      reg.registerFunction(
        new FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VecDot(children.head, children(1)))
    if (!reg.functionExists(new FunctionIdentifier("md5prefix64")))
      reg.registerFunction(
        new FunctionIdentifier("md5prefix64"),
        new ExpressionInfo(classOf[Md5Prefix64].getName, "md5prefix64"),
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Md5Prefix64(children.head))
  }
}
