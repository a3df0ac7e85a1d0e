package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkTestBase {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double))," +
      " cast(0.0 as double), (acc, v) -> acc + v)"

  test("vec_dot is bit-identical to the portable aggregate(zip_with(...)) fold") {
    GraftFunctions.ensure(spark)
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.75f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(Float.MinPositiveValue, 1e30f, -1e-30f), Array(1e30f, 1e-30f, Float.MinPositiveValue))
    ).toDF("a", "b")
    val out = df.select(expr("vec_dot(a, b)").as("native"), expr(hof).as("portable")).collect()
    for (r <- out)
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), r.toString)
  }

  test("vec_dot stays inside whole-stage codegen") {
    GraftFunctions.ensure(spark)
    // a real scan, so the projection isn't constant-folded to a LocalTableScan
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(expr("vec_dot(embedding, embedding)").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes are the whole-stage-codegen markers in this string form
    assert(plan.contains("*(1) Project [vec_dot"), plan.take(2000))
    // the HOF formulation would sit outside codegen as ArrayAggregate
    assert(!plan.contains("aggregate(zip_with"), plan.take(2000))
  }

  test("vec_dot fails fast on length mismatch instead of silently nulling") {
    GraftFunctions.ensure(spark)
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(expr("vec_dot(a, b)")).collect()
    }
    assert(e.getMessage != null)
  }

  test("vec_dot null semantics match the HOF form: null element -> null, null array -> null") {
    GraftFunctions.ensure(spark)
    val df = Seq(
      (Array[java.lang.Float](1.0f, null, 3.0f), Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](3.0f, null)),
      (null, Array[java.lang.Float](1.0f)),
      (Array[java.lang.Float](1.0f, 2.0f, 3.0f), Array[java.lang.Float](4.0f, 5.0f, 6.0f))
    ).toDF("a", "b")
    val out = df.select(expr("vec_dot(a, b)").as("native"), expr(hof).as("portable")).collect()
    for (r <- out) {
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    assert(out.take(3).forall(_.isNullAt(0)))
    assert(out(3).getDouble(0) == 32.0)
  }

  test("vec_dot arity is validated at registration-builder level") {
    GraftFunctions.ensure(spark)
    val df = Seq((Array(1.0f), Array(2.0f))).toDF("a", "b")
    val e1 = intercept[Exception] { df.select(expr("vec_dot(a)")).collect() }
    assert(e1.getMessage.contains("2 arguments"), e1.getMessage)
    val e2 = intercept[Exception] { df.select(expr("vec_dot(a, b, a)")).collect() }
    assert(e2.getMessage.contains("2 arguments"), e2.getMessage)
  }
}
