package graft.pipeline

import graft.SparkTestBase
import graft.kernel.ExtractMode
import graft.model.{Doc, Span}
import graft.sources.DocSynth
import java.nio.file.Files

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def collectSorted(ds: org.apache.spark.sql.Dataset[Doc]): Seq[Doc] =
    ds.collect().sortBy(_.doc_id).toSeq

  test("extraction is deterministic across partitionings (2 vs 8)") {
    val docs = DocSynth.docs(spark, sfDir)
    val a = collectSorted(ExtractJob.extract(docs, ExtractJob.Config(numPartitions = 2)))
    val b = collectSorted(ExtractJob.extract(docs, ExtractJob.Config(numPartitions = 8)))
    assert(a.nonEmpty && a == b)
  }

  test("output span invariants: offsets sequential, media refs preserved, chunks <= 500") {
    val docs = DocSynth.docs(spark, sfDir)
    val out = ExtractJob.extract(docs).collect()
    assert(out.length == 500) // sf0.001 documents row count
    for (d <- out) {
      assert(d.spans.map(_.offset) == d.spans.indices)
      assert(d.spans.forall(s => s.kind == "chunk" || s.kind == "media"))
      assert(d.spans.filter(_.kind == "chunk").forall(s => s.text.nonEmpty && s.text.codePointCount(0, s.text.length) <= 500))
      assert(d.spans.filter(_.kind == "media").forall(_.media_ref.startsWith("media://")))
    }
  }

  test("semantic mode: html boilerplate stripped, headings emitted, layout reordered") {
    val html = Doc("h1", Seq(Span("html",
      "<html><body><nav><a href='/'>home</a></nav><h1>Title Here</h1>" +
        "<p>" + ("real content words here ok fine " * 10) + "</p>" +
        "<footer><a href='/t'>terms</a></footer></body></html>", "", 0)))
    val layout = Doc("p1", Seq(Span("pdf_layout",
      "50\t10\tleft one\n50\t22\tleft two\n320\t10\tright one\n320\t22\tright two", "", 0)))
    val out = ExtractJob.extract(spark.createDataset(Seq(html, layout)),
      ExtractJob.Config(mode = ExtractMode.SemanticMode)).collect().sortBy(_.doc_id)
    val hSpans = out.find(_.doc_id == "h1").get.spans
    assert(hSpans.exists(s => s.kind == "heading" && s.text == "Title Here"))
    assert(hSpans.filter(_.kind == "chunk").forall(s => !s.text.contains("home") && !s.text.contains("terms")))
    val pSpans = out.find(_.doc_id == "p1").get.spans
    assert(pSpans.map(_.text).mkString == "left one\nleft two\n\nright one\nright two")
  }

  test("fused raw->spans path equals synth-then-extract path (both modes)") {
    import graft.kernel.ExtractMode
    for (mode <- Seq(ExtractMode.ChunkMode, ExtractMode.SemanticMode)) {
      val cfg = ExtractJob.Config(mode = mode)
      val fused = collectSorted(ExtractJob.extractFromRaw(spark, sfDir, replicate = 1, cfg))
      val staged = collectSorted(ExtractJob.extract(DocSynth.docs(spark, sfDir), cfg))
      assert(fused == staged, s"fused/staged mismatch in $mode")
    }
  }

  test("replicated corpus: every replica is a distinct deterministic doc") {
    val out = ExtractJob.extractFromRaw(spark, sfDir, replicate = 3).collect()
    assert(out.length == 1500)
    assert(out.map(_.doc_id).distinct.length == 1500)
  }

  test("lineage: docs_parsed sums to input count, zero failures, spans consistent") {
    val docs = DocSynth.docs(spark, sfDir)
    val (spans, lineage) = ExtractJob.extractWithLineage(docs)
    val lin = lineage.collect()
    assert(lin.map(_.docs_parsed).sum == 500)
    assert(lin.map(_.parse_failures).sum == 0)
    val totalSpans = spans.collect().map(_.spans.size.toLong).sum
    assert(lin.map(_.spans_emitted).sum == totalSpans)
  }

  test("skew: giant docs spread across partitions (targeted salt exchange)") {
    import org.apache.spark.sql.functions._
    // replicate enough that several giant docs (1/97 of ids) exist
    val out = ExtractJob.extractFromRaw(spark, sfDir, replicate = 4,
      ExtractJob.Config(numPartitions = 8))
    val byPart = out.toDF()
      .select(spark_partition_id().as("pid"),
        aggregate(col("spans"), lit(0L), (acc, s) => acc + length(s.getField("text"))).as("chars"))
      .groupBy("pid").agg(sum("chars").as("chars"), count(lit(1)).as("docs"))
      .collect()
    // union of (salted giants, pass-through normals): ≤ 2×8 partitions
    assert(byPart.length <= 16 && byPart.length >= 8)
    val loads = byPart.map(r => r.getAs[Long]("chars").toDouble)
    // giants are ~40x normal docs; without spreading, one partition would
    // carry multiples of the mean. The targeted exchange keeps max within
    // 3x the mean over the actual task count.
    assert(loads.max < loads.sum / loads.length * 3.0,
      s"skewed partition loads: ${loads.sorted.reverse.take(3).mkString(",")} vs mean ${loads.sum / loads.length}")
  }

  test("skew routing is observable-size-based: non-hash-selected giants spread") {
    import org.apache.spark.sql.functions._
    // Hand-built raw table: ids chosen so NONE are hash-selected giants
    // (DocSynth.giantOf is false for all), but six rows carry genuinely long
    // text — on a real table that's the only signal there is.
    val ids = (0 until 400).map(i => s"doc$i").filterNot(DocSynth.giantOf)
    val giants = ids.take(6).map(id => (id, "real content words here ok fine " * 200))
    val normals = ids.drop(6).map(id => (id, "short normal text row"))
    val raw = (giants ++ normals).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long")) // observable size only
      .repartition(2) // pretend the source had 2 splits
    val cfg = ExtractJob.Config(numPartitions = 8)
    val out = ExtractJob.extractRaw(raw, cfg)
    // giant rows landed on multiple partitions (their own exchange), and the
    // output is complete and per-doc correct regardless of routing
    val giantParts = out.toDF()
      .select(spark_partition_id().as("pid"), col("doc_id"))
      .where(col("doc_id").isin(giants.map(_._1): _*))
      .select("pid").distinct().count()
    assert(giantParts >= 2, s"giants all serialized on $giantParts partition(s)")
    val docs = out.collect()
    assert(docs.length == ids.length)
    assert(docs.map(_.doc_id).toSet == ids.toSet)
  }

  test("extractRaw: a NULL n_chars row routes to the normals branch, never dropped") {
    import org.apache.spark.sql.functions._
    val raw = Seq(
      ("docA", "tiny row", Some(8L)),
      ("docB", "size column not populated on this row", None),
      ("docC", "real content words here ok fine " * 200, None), // big but unsized: normals (perf-only misroute)
      ("docD", null.asInstanceOf[String], None) // null text AND size: empty doc, never dropped
    ).toDF("doc_id", "text", "n_chars")
    val out = ExtractJob.extractRaw(raw, ExtractJob.Config(numPartitions = 4)).collect()
    assert(out.map(_.doc_id).toSet == Set("docA", "docB", "docC", "docD"))
  }

  test("curation staging: marker-after-data commit; resume never re-reads the input") {
    import graft.operators.DedupOps
    val stage = Files.createTempDirectory("graft-curate-stage").toString
    val (c1, f1) = DedupOps.curationRunStaged(spark, sfDir, stage)
    val curated1 = c1.collect().map(_.toSeq).toSeq
    val funnel1 = f1.collect().map(_.toSeq).toSeq
    assert(curated1.nonEmpty && funnel1.length == 6)
    // the staged form is bit-identical to the in-query localCheckpoint form
    val (c0, f0) = DedupOps.curationRun(spark, sfDir)
    assert(curated1 == c0.collect().map(_.toSeq).toSeq)
    assert(funnel1 == f0.collect().map(_.toSeq).toSeq)
    // resume with the marker present: the input dir is gone, so identical
    // output PROVES everything came from the durable stage
    val (c2, f2) = DedupOps.curationRunStaged(spark, "/nonexistent-input-dir", stage)
    assert(c2.collect().map(_.toSeq).toSeq == curated1)
    assert(f2.collect().map(_.toSeq).toSeq == funnel1)
    // crash BEFORE the marker landed (partial feature data, no marker):
    // the stage is ignored and rewritten from the input
    val fs = new org.apache.hadoop.fs.Path(stage).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stage/_features_done"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$stage/features"), true)
    docFeaturesPartial(stage) // half-written stage data, as a crash leaves it
    val (c3, f3) = DedupOps.curationRunStaged(spark, sfDir, stage)
    assert(c3.collect().map(_.toSeq).toSeq == curated1)
    assert(f3.collect().map(_.toSeq).toSeq == funnel1)
  }

  /** Simulate a feature-stage crash: some rows durable, no commit marker. */
  private def docFeaturesPartial(stage: String): Unit =
    graft.operators.DedupOps.docFeatures(spark, sfDir).limit(7)
      .write.mode("overwrite").parquet(s"$stage/features")

  test("curation staging: a visibly CHANGED input invalidates the stage (no stale serve)") {
    import graft.operators.DedupOps
    import org.apache.spark.sql.functions.col
    val stage = Files.createTempDirectory("graft-curate-stale").toString
    val inDir = Files.createTempDirectory("graft-curate-input").toString
    // v1 input: the full documents table, copied so it can be replaced
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.mode("overwrite").parquet(s"$inDir/documents.parquet")
    val (c1, _) = DedupOps.curationRunStaged(spark, inDir, stage)
    val v1 = c1.count()
    // v2 input: the corpus visibly changes (halved) at the same path
    spark.read.parquet(s"$sfDir/documents.parquet").where(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$inDir/documents.parquet")
    val (c2, _) = DedupOps.curationRunStaged(spark, inDir, stage)
    val v2 = c2.count()
    assert(v2 < v1, s"stage served stale v1 features for the v2 input (v1=$v1 v2=$v2)")
    // and the v2 stage is itself stable on an unchanged re-run
    val (c3, _) = DedupOps.curationRunStaged(spark, inDir, stage)
    assert(c3.count() == v2)
  }

  test("paragraph mode: spans are kernel extract_paragraphs outputs in order") {
    import graft.kernel.{ExtractMode, Paragraphs}
    val docs = DocSynth.docs(spark, sfDir)
    val out = ExtractJob.extract(docs, ExtractJob.Config(mode = ExtractMode.ParagraphMode))
      .collect().sortBy(_.doc_id)
    val in = docs.collect().sortBy(_.doc_id)
    assert(out.nonEmpty && out.length == in.length)
    for ((i, o) <- in.zip(out)) {
      val expected = i.spans.sortBy(_.offset).flatMap { s =>
        if (s.kind == "image" || s.kind == "figure" || s.kind == "table") Seq(("media", "", s.media_ref))
        else Paragraphs.extractParagraphs(s.text).map(p => ("paragraph", p, ""))
      }
      assert(o.spans.map(s => (s.kind, s.text, s.media_ref)) == expected, s"doc ${i.doc_id}")
    }
  }

  test("observe(): live ingest counters surface docs/spans totals") {
    val (spans, _) = ExtractJob.extractWithLineage(DocSynth.docs(spark, sfDir))
    val observed = spans.toDF().observe("ingest",
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("docs"),
      org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("spans"))).as("spans"))
    observed.collect() // run through THIS Dataset's queryExecution (write would spawn a new one)
    val row = observed.queryExecution.observedMetrics("ingest")
    assert(row.getAs[Long]("docs") == 500L)
    assert(row.getAs[Long]("spans") > 500L)
  }

  test("resume: empty groups are durably marked done (marker row commits them)") {
    // 1 doc across 8 groups -> 7 empty groups; without the lineage marker row
    // every resume would re-run the empties forever.
    val one = DocSynth.docs(spark, sfDir).limit(1)
    val dir = Files.createTempDirectory("graft-resume-empty").toString
    assert(Checkpoint.runResumable(one, dir, numGroups = 8) == 8)
    assert(Checkpoint.runResumable(one, dir, numGroups = 8) == 0) // nothing re-runs
    assert(Checkpoint.readLineage(spark, dir).select("grp").distinct().count() == 8)
    // real metrics are unaffected by markers
    val real = Checkpoint.readLineage(spark, dir).where($"status" === "complete")
    assert(real.agg(org.apache.spark.sql.functions.sum($"docs_parsed")).head.getLong(0) == 1L)
  }

  test("resume: kill after 3 groups -> re-run converges to single-shot output") {
    val docs = DocSynth.docs(spark, sfDir)
    val dirA = Files.createTempDirectory("graft-resume-a").toString
    val dirB = Files.createTempDirectory("graft-resume-b").toString

    // simulated kill: only 3 of 8 groups commit
    val first = Checkpoint.runResumable(docs, dirA, numGroups = 8, maxGroups = 3)
    assert(first == 3)
    // resume: finishes the remaining 5, skips the done 3
    val second = Checkpoint.runResumable(docs, dirA, numGroups = 8)
    assert(second == 5)
    // re-run again: nothing to do (idempotent)
    assert(Checkpoint.runResumable(docs, dirA, numGroups = 8) == 0)

    // single-shot reference run
    Checkpoint.runResumable(docs, dirB, numGroups = 8)

    val a = Checkpoint.readSpans(spark, dirA).as[Doc].collect().sortBy(_.doc_id).toSeq
    val b = Checkpoint.readSpans(spark, dirB).as[Doc].collect().sortBy(_.doc_id).toSeq
    assert(a == b)
    assert(a.map(_.doc_id).distinct.size == 500) // no duplicates: MERGE semantics
    assert(Checkpoint.readLineage(spark, dirA).select("grp").distinct().count() == 8)
  }

  test("resume through JsonlSpanWriter converges to the parquet writer's output") {
    val docs = DocSynth.docs(spark, sfDir)
    val dirJ = Files.createTempDirectory("graft-resume-jsonl").toString
    val dirP = Files.createTempDirectory("graft-resume-parq").toString
    val cfg = ExtractJob.Config()

    // kill after 3 of 8 groups, then resume — all through the JSONL writer
    val wJ = new JsonlSpanWriter(spark, dirJ)
    assert(Checkpoint.runResumable(docs, wJ, cfg, numGroups = 8, maxGroups = 3) == 3)
    assert(Checkpoint.runResumable(docs, wJ, cfg, numGroups = 8, maxGroups = Int.MaxValue) == 5)
    assert(Checkpoint.runResumable(docs, wJ, cfg, numGroups = 8, maxGroups = Int.MaxValue) == 0)

    // single-shot parquet reference run: the two writers must agree exactly
    Checkpoint.runResumable(docs, dirP, cfg, numGroups = 8)
    val j = collectSorted(JsonlSpanWriter.readSpans(spark, dirJ).as[Doc])
    val p = collectSorted(Checkpoint.readSpans(spark, dirP).as[Doc])
    assert(j.nonEmpty && j == p)
    assert(JsonlSpanWriter.readLineage(spark, dirJ).select("grp").distinct().count() == 8)
  }

  test("backend pin: marker-less checkpoint re-derives its format from file magic, not assumed parquet") {
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkCheckpoint(firstBytes: Array[Byte]): String = {
      val dir = Files.createTempDirectory("graft-pin").toString
      val f = new org.apache.hadoop.fs.Path(s"${Checkpoint.lineageDir(dir)}/part-00000")
      val out = fs.create(f, true)
      try out.write(firstBytes) finally out.close()
      dir
    }
    // a jsonl checkpoint whose _writer marker was lost: resuming as parquet
    // must fail NAMING the sniffed format, and resuming as jsonl must re-pin
    val dirJ = mkCheckpoint("""{"grp":0,"docs_parsed":1}""".getBytes("UTF-8"))
    val eJ = intercept[IllegalArgumentException] {
      ExtractMain.resolveBackendPin(fs, dirJ, "parquet")
    }
    assert(eJ.getMessage.contains("'jsonl'"), eJ.getMessage)
    ExtractMain.resolveBackendPin(fs, dirJ, "jsonl") // re-pins
    assert(graft.util.Markers.read(fs,
      new org.apache.hadoop.fs.Path(s"$dirJ/_writer")).contains("jsonl"))
    // the marker now takes the fast path: mismatch still rejected
    val eJ2 = intercept[IllegalArgumentException] {
      ExtractMain.resolveBackendPin(fs, dirJ, "parquet")
    }
    assert(eJ2.getMessage.contains("was written with the 'jsonl' backend"), eJ2.getMessage)

    // the symmetric legacy-parquet case (PAR1 magic)
    val dirP = mkCheckpoint("PAR1xxxx".getBytes("UTF-8"))
    val eP = intercept[IllegalArgumentException] {
      ExtractMain.resolveBackendPin(fs, dirP, "jsonl")
    }
    assert(eP.getMessage.contains("'parquet'"), eP.getMessage)
    ExtractMain.resolveBackendPin(fs, dirP, "parquet")

    // hidden files (staging dirs, crc) never decide the sniff; a dir with
    // only hidden data pins fresh without complaint
    val dirH = Files.createTempDirectory("graft-pin-hidden").toString
    val hf = new org.apache.hadoop.fs.Path(
      s"${Checkpoint.spansDir(dirH)}/_staging_grp_0/part-00000")
    val out = fs.create(hf, true)
    try out.write("PAR1xxxx".getBytes("UTF-8")) finally out.close()
    ExtractMain.resolveBackendPin(fs, dirH, "jsonl")
    assert(graft.util.Markers.read(fs,
      new org.apache.hadoop.fs.Path(s"$dirH/_writer")).contains("jsonl"))
  }
}
