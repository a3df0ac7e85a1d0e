package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helper referenced from generated code. */
object SimHashBitsUtil {

  /** SimHash majority vote over `numBits` bit positions — value-identical to
    * the portable fold (the DuckDB oracle text)
    *
    *   aggregate(sequence(0, numBits-1), 0L, (acc, b) ->
    *     acc + if(2 * size(filter(hashes, h -> shiftright(h, b) % 2 = 1)) >= size(hashes),
    *              shiftleft(1L, b), 0L))
    *
    * for non-null inputs: null elements never pass the bit test but DO count
    * in the denominator (size counts nulls), and an empty array sets every
    * bit (2*0 >= 0). Negative hashes also never pass it — `shiftright` sign-
    * extends, so `% 2` yields 0 or -1, never 1 — but count in the
    * denominator too; matched here by skipping their bits. One pass over the
    * hashes, no per-bit lambda dispatch.
    */
  def simhash(arr: ArrayData, numBits: Int): Long = {
    val m = arr.numElements()
    val counts = new Array[Int](numBits)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        if (h >= 0) {
          var b = 0
          while (b < numBits) {
            counts(b) += ((h >>> b) & 1L).toInt
            b += 1
          }
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < numBits) {
      if (2 * counts(b) >= m) acc |= 1L << b
      b += 1
    }
    acc
  }
}

/** Native codegen'd SimHash: the majority-vote signature in one tight pass
  * over the hash array. The portable form interprets `numBits` filter
  * lambdas (one full scan of the array per bit position — O(numBits x |doc|)
  * lambda dispatches per document); this is a single scan updating bit
  * counters, inside whole-stage codegen. Null input array yields null (the
  * expression is null-intolerant); the per-element/empty semantics match the
  * portable fold exactly (see [[SimHashBitsUtil.simhash]] and
  * SimHashBitsSpec).
  */
case class SimHashBits(child: Expression, numBits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numBits > 0 && numBits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires 1 <= numBits <= 64, got $numBits")
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SimHashBitsUtil.simhash(input.asInstanceOf[ArrayData], numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashBitsUtil.simhash($c, $numBits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}
