package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Imperative registration of the engine's native functions, for sessions
  * built WITHOUT `spark.sql.extensions=graft.GraftExtensions` (a host that
  * calls `SparkEntry.queries` from its own bare session). Idempotent;
  * operator code that uses the functions calls this first.
  */
object GraftFunctions {

  /** Arity-checked builders, shared with [[graft.GraftExtensions]] — the
    * functions are injected session-wide for arbitrary SQL, so `vec_dot(a)`
    * must fail analysis with a clear message rather than throw an index
    * error, and `vec_dot(a, b, c)` must not silently ignore the third
    * argument.
    */
  private[graft] def vecDotBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"vec_dot requires exactly 2 arguments (two float/double arrays), got ${children.length}")
    VecDot(children.head, children(1))
  }

  private[graft] def md5Prefix64Builder(children: Seq[Expression]): Expression = {
    require(children.length == 1,
      s"md5prefix64 requires exactly 1 argument, got ${children.length}")
    Md5Prefix64(children.head)
  }

  private[graft] def minHashSigsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"minhash_sigs requires exactly 2 arguments (array<string>, numHashes literal), got ${children.length}")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sigs numHashes must be an integer literal, got $other")
    }
    MinHashSigs(children.head, n)
  }

  private[graft] def winnowPairsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"winnow_pairs requires exactly 2 arguments (array<bigint>, window literal), got ${children.length}")
    val w = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"winnow_pairs window must be an integer literal, got $other")
    }
    WinnowPairs(children.head, w)
  }

  private[graft] def simHashBitsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      s"simhash_bits requires exactly 2 arguments (array<bigint>, numBits literal), got ${children.length}")
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"simhash_bits numBits must be an integer literal, got $other")
    }
    SimHashBits(children.head, n)
  }

  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(new FunctionIdentifier("vec_dot")))
      reg.registerFunction(
        new FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        vecDotBuilder _)
    if (!reg.functionExists(new FunctionIdentifier("md5prefix64")))
      reg.registerFunction(
        new FunctionIdentifier("md5prefix64"),
        new ExpressionInfo(classOf[Md5Prefix64].getName, "md5prefix64"),
        md5Prefix64Builder _)
    if (!reg.functionExists(new FunctionIdentifier("minhash_sigs")))
      reg.registerFunction(
        new FunctionIdentifier("minhash_sigs"),
        new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
        minHashSigsBuilder _)
    if (!reg.functionExists(new FunctionIdentifier("simhash_bits")))
      reg.registerFunction(
        new FunctionIdentifier("simhash_bits"),
        new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
        simHashBitsBuilder _)
    if (!reg.functionExists(new FunctionIdentifier("winnow_pairs")))
      reg.registerFunction(
        new FunctionIdentifier("winnow_pairs"),
        new ExpressionInfo(classOf[WinnowPairs].getName, "winnow_pairs"),
        winnowPairsBuilder _)
  }
}
