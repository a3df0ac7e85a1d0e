package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static helpers referenced from generated code. */
object VecDotUtil {
  /** dot(a, b) over float arrays: per-element cast to double, accumulated in
    * index order from 0.0 — bit-identical to the portable
    * `aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
    *  cast(0.0 as double), (acc, v) -> acc + v)` and to DuckDB's
    * list_aggregate('sum') over the same casts.
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vec_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vec_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Null-aware variants for ArrayType(..., containsNull = true) inputs —
    * parquet-read arrays always carry that flag. A null element makes the
    * whole dot null, matching the portable HOF form exactly: in
    * `aggregate(zip_with(...), 0.0, (acc, v) -> acc + v)` one null product
    * poisons the running sum to null. (The per-element isNullAt is a bit
    * test on the Unsafe null bitmap — negligible next to the multiply.)
    */
  def dotFN(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vec_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def dotDN(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"vec_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native codegen'd dot product over two equal-length float/double arrays —
  * the hot scalar of every ANN / dense-retrieval query. The portable HOF
  * formulation (`aggregate(zip_with(...))`) never enters whole-stage codegen
  * (higher-order functions are interpreted) and allocates a zipped
  * intermediate array per row; this is one fused primitive loop. Accumulation
  * order and casts match the portable form exactly, so swapping it in cannot
  * change any cross-engine-checked result bit.
  *
  * Arrays must be equal-length (a mismatch fails fast rather than returning
  * a silent null); a null ELEMENT yields a null result — exactly the HOF
  * form's semantics, where one null product poisons the running sum.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two arrays of the same float/double element type, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat = elemType(left).contains(FloatType)

  /** Either input may carry null elements (parquet arrays always declare
    * containsNull = true) → the result can be null even when both array
    * values are non-null, matching the HOF form's null poisoning.
    */
  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullable: Boolean = left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    (isFloat, elementsNullable) match {
      case (true, false)  => VecDotUtil.dotF(x, y)
      case (false, false) => VecDotUtil.dotD(x, y)
      case (true, true)   => VecDotUtil.dotFN(x, y)
      case (false, true)  => VecDotUtil.dotDN(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!elementsNullable) {
      val fn = if (isFloat) "dotF" else "dotD"
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDotUtil.$fn($a, $b)")
    } else {
      val fn = if (isFloat) "dotFN" else "dotDN"
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r = graft.functions.VecDotUtil.$fn($a, $b);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
    }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
