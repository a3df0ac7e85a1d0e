package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the executed plan of the fused extraction path to count
  * input scans (skew-routing one-pass evidence).
  */
object ProbeExtractPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args.head else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.pipeline.ExtractJob.extractFromRaw(spark, sfDir, replicate = 3).toDF()
    // collect() executes df's OWN QueryExecution, so the printed adaptive
    // plan below is the final runtime plan (a write would execute a fresh one)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(p)
    println("== FileScan count: " + "FileScan".r.findAllIn(p).size)
    println("== ReusedExchange count: " + "ReusedExchange".r.findAllIn(p).size)
    spark.stop()
  }
}
