package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Static helper referenced from generated code. */
object MinHashSigsUtil {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // "#j" salt bytes, cached per signature count (tiny, bounded by callers)
  private val saltCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def salts(n: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(n,
      m => Array.tabulate(m)(j => ("#" + j).getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** out(j) = min over non-null elements s of the 60-bit md5 prefix of
    * `s || '#' || j` — element-for-element equal to the portable
    *   array_min(transform(shingles, s -> conv(substring(md5(concat(s, '#j')), 1, 15), 16, 10)))
    * for j in 0 until n, including the null semantics: null elements are
    * skipped, and an empty (or all-null) input yields null minima.
    */
  def sigs(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var found = false
    val d = md5.get()
    val salt = salts(n)
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        found = true
        val s = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < n) {
          d.reset()
          d.update(s)
          d.update(salt(j))
          val dig = d.digest()
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (dig(k) & 0xffL); k += 1 }
          v = v >>> 4
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!found) new GenericArrayData(new Array[Any](n)) // n null minima
    else new GenericArrayData(mins)
  }
}

/** Native codegen'd batch MinHash: ALL `numHashes` signature minima in one
  * pass over the shingle array. The portable form runs `numHashes`
  * interpreted `transform` lambdas (HOFs never enter whole-stage codegen),
  * each allocating an intermediate hash array, then `numHashes` `array_min`
  * passes — this expression is one tight loop with no intermediate arrays,
  * and `doGenCode` keeps it inside whole-stage codegen. Bit-identical to the
  * portable fold (see [[MinHashSigsUtil.sigs]]), which remains the DuckDB
  * oracle text. The signature pass is the dominant cost of every LSH query
  * at 100 TB, so this is the hot loop of the dedup family.
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if numHashes > 0 && numHashes <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires 1 <= numHashes <= 64, got $numHashes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${other.catalogString}")
  }

  // containsNull: an empty/all-null shingle array yields null minima,
  // matching array_min-over-empty in the portable form
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigsUtil.sigs(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigsUtil.sigs($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
