package graft.pipeline

import graft.kernel.ExtractMode
import graft.sources.DocSynth
import org.apache.spark.sql.SparkSession

/** Production entrypoint (north_rule: "runs via spark-submit"):
  *
  *   spark-submit --class graft.pipeline.ExtractMain \
  *     --conf spark.sql.extensions=graft.GraftExtensions \
  *     target/scala-2.13/ragdocumentparserspark_2.13-0.1.0.jar \
  *     <inputSfDir> <outDir> [chunk|paragraph|semantic] [numGroups] [parquet|jsonl]
  *
  * Reads the docs table, runs the resumable group-committed extraction
  * (Checkpoint: MERGE-on-doc_id-equivalent over parquet), prints the lineage
  * summary. Re-running after a kill resumes from the last committed group.
  */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExtractMain <inputSfDir> <outDir> [mode] [numGroups]")
    val Array(inDir, outDir) = args.take(2)
    val mode = args.lift(2).getOrElse("chunk") match {
      case "paragraph" => ExtractMode.ParagraphMode
      case "semantic"  => ExtractMode.SemanticMode
      case _           => ExtractMode.ChunkMode
    }
    val numGroups = args.lift(3).map(_.toInt).getOrElse(8)

    // spark-submit provides master/conf; default local[*] for bare runs.
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = DocSynth.docs(spark, inDir)
    // Storage backend for the group-committed checkpoint: parquet (dynamic
    // partition-overwrite) or jsonl (explicit staging+rename protocol) —
    // both pass the SpanWriterContractSpec behavioral contract. The backend
    // is PINNED per outDir via a `_writer` marker: resuming a parquet run
    // with the jsonl reader (or vice versa) would misparse the lineage and
    // silently mix formats, so a mismatch — or a typo'd backend name —
    // fails fast instead.
    val backend = args.lift(4).getOrElse("parquet")
    require(backend == "parquet" || backend == "jsonl",
      s"unknown writer backend '$backend' — expected parquet or jsonl")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val writerMarker = new org.apache.hadoop.fs.Path(s"$outDir/_writer")
    // shared helper: a marker left empty by a kill between create and
    // write reads as absent, so the legacy check below re-derives the pin
    // instead of leaving the outDir permanently unresumable; a garbage
    // value is likewise treated as absent
    val pinnedOpt = graft.util.Markers.read(fs, writerMarker)
      .filter(v => v == "parquet" || v == "jsonl")
    pinnedOpt match {
      case Some(pinned) =>
        require(pinned == backend,
          s"outDir $outDir was written with the '$pinned' backend; resuming with " +
            s"'$backend' would misread its lineage — pass '$pinned' (or a fresh outDir)")
      case None =>
        // legacy outDirs (created before the marker existed) carry lineage
        // OR span data but no pin — they are parquet by construction, so
        // resuming one with 'jsonl' must fail instead of silently pinning
        // the wrong backend over parquet files (a run killed before its
        // first group commit has spans but no lineage yet)
        val legacy =
          fs.exists(new org.apache.hadoop.fs.Path(Checkpoint.lineageDir(outDir))) ||
          fs.exists(new org.apache.hadoop.fs.Path(Checkpoint.spansDir(outDir)))
        require(!legacy || backend == "parquet",
          s"outDir $outDir holds a pre-existing (unpinned) parquet checkpoint; " +
            s"resuming it with '$backend' would mix formats — pass 'parquet'")
        graft.util.Markers.write(fs, writerMarker, backend)
    }
    val (writer, readLineage) = backend match {
      case "jsonl" =>
        (new JsonlSpanWriter(spark, outDir),
          () => JsonlSpanWriter.readLineage(spark, outDir))
      case _ =>
        (new Checkpoint.ParquetSpanWriter(spark, outDir),
          () => Checkpoint.readLineage(spark, outDir))
    }
    val processed = Checkpoint.runResumable(docs, writer,
      ExtractJob.Config(mode = mode), numGroups = numGroups, maxGroups = Int.MaxValue)
    val lineage = readLineage()
    val summary = lineage.groupBy().sum("docs_parsed", "spans_emitted", "parse_failures").collect()(0)
    println(s"[extract] groups processed this run: $processed/$numGroups; " +
      s"totals: docs=${summary.getLong(0)} spans=${summary.getLong(1)} failures=${summary.getLong(2)}")
    spark.stop()
  }
}
