package graft.pipeline

import org.apache.spark.sql.SparkSession

/** spark-submit entrypoint for the corpus-curation pipeline: writes the
  * curated table (doc_id, lang, quality, split) and the per-stage funnel
  * report next to it, then prints the funnel. Idempotent: plain overwrite —
  * the job is a pure function of the input, so a re-run after a crash
  * converges to the same bytes (the resume machinery lives in the
  * extraction path, where per-group progress matters; curation is one job).
  *
  *   spark-submit --class graft.pipeline.CurateMain <jar> <sfDir> <outDir>
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateMain <inputSfDir> <outDir>")
    val Array(inDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .appName("graft-curate")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one shared stage computation feeds both outputs (invoking the two
    // registry queries separately would run the LSH + connected-components
    // DAG twice)
    val (curated, funnel) = graft.operators.DedupOps.curationRun(spark, inDir)
    curated.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/curated")
    // materialize the 6 funnel rows ONCE: print from the collected copy and
    // write them back as a local DataFrame instead of re-executing the plan
    val rows = funnel.collect()
    rows.foreach(r => println(s"[curate] ${r.getString(0)}: ${r.getLong(1)} docs"))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), funnel.schema)
      .write.mode("overwrite").parquet(s"$outDir/funnel")
    spark.stop()
  }
}
