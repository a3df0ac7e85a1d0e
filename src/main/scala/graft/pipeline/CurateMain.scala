package graft.pipeline

import org.apache.spark.sql.SparkSession

/** spark-submit entrypoint for the corpus-curation pipeline: stages the
  * doc-feature table durably, then writes the curated table (doc_id, lang,
  * quality, split) and the per-stage funnel report (stage, docs, dropped,
  * reason) next to it, and prints the funnel.
  *
  * Crash/resume semantics:
  *  - the feature stage commits via marker-after-data (`_features_done`);
  *    a re-run after a crash mid-stage rewrites it, a re-run after the
  *    marker landed never re-reads the input;
  *  - everything downstream is a pure function of the staged table and is
  *    written with plain overwrite, so a re-run after ANY crash converges
  *    to the same bytes (validated by the kill-resume case in
  *    `PipelineSpec`); a lost executor mid-job recomputes from the durable
  *    stage instead of failing the job (the localCheckpoint form used by
  *    the in-query registry entries cannot survive that).
  *
  *   spark-submit --class graft.pipeline.CurateMain <jar> <sfDir> <outDir> [stageDir]
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurateMain <inputSfDir> <outDir> [stageDir]")
    val Array(inDir, outDir) = args.take(2)
    val stageDir = if (args.length >= 3) args(2) else s"$outDir/_stage"
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
    val (curated, funnel) = graft.operators.DedupOps.curationRunStaged(spark, inDir, stageDir)
    curated.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/curated")
    // materialize the funnel rows ONCE: print from the collected copy and
    // write them back as a local DataFrame instead of re-executing the plan
    val rows = funnel.collect()
    rows.foreach(r => println(
      s"[curate] ${r.getString(0)}: ${r.getLong(1)} docs (dropped ${r.getLong(2)}: ${r.getString(3)})"))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), funnel.schema)
      .write.mode("overwrite").parquet(s"$outDir/funnel")
    spark.stop()
  }
}
