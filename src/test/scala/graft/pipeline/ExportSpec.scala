package graft.pipeline

import graft.SparkTestBase
import graft.operators.{CorpusOps, DedupOps, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ExportSpec extends SparkTestBase {
  import spark.implicits._

  private def assembled() = {
    val curated = DedupOps.curationRun(spark, sfDir)._1
    ExportJob.assembleFrom(curated, Tables.documents(spark, sfDir), nShards = 4)
  }

  test("assemble: admission = train split ∩ mixture rule; packing arithmetic exact per shard") {
    val curated = DedupOps.curationRun(spark, sfDir)._1
    val out = assembled().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))

    // admission set: exactly the curated-train docs passing the mixture hash
    val expectedIds = CorpusOps.withMixture(
        Tables.documents(spark, sfDir)
          .join(curated.where($"split" === "train").select("doc_id"), "doc_id"))
      .where($"mix_u" < $"target_ppm").select("doc_id").as[Long].collect().toSet
    assert(out.map(_._3).toSet == expectedIds)
    assert(out.nonEmpty && expectedIds.size < curated.count(),
      "mixture sampled nothing out — degenerate test input")

    // per-shard: dense positions and the exact running-sum packing identity
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val byPos = rows.sortBy(_._2)
      assert(byPos.map(_._2).toSeq == (1L to rows.length).toSeq, s"shard $shard positions")
      var cum = 0L
      byPos.foreach { case (_, _, id, _, nTok, seqId, seqOff) =>
        assert(seqId == cum / 512, s"doc $id seq_id")
        assert(seqOff == cum % 512, s"doc $id seq_offset")
        cum += nTok
      }
    }
  }

  test("assemble: deterministic under input repartitioning") {
    val base = assembled().collect().toSet
    val curated = DedupOps.curationRun(spark, sfDir)._1.repartition(7)
    val again = ExportJob
      .assembleFrom(curated, Tables.documents(spark, sfDir).repartition(5), nShards = 4)
      .collect().toSet
    assert(again == base)
  }

  test("ExportMain.run: marker-after-data commit — crash rewrites, committed run is a no-op") {
    val outDir = Files.createTempDirectory("graft-export").toString
    ExportMain.run(spark, sfDir, outDir, nShards = 4)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$outDir/_export_done")
    val recorded = graft.util.Markers.read(fs, marker)
    assert(recorded.isDefined && recorded.get.contains("docs="), recorded.toString)

    def signature(): Seq[String] = spark.read.parquet(s"$outDir/data")
      .select(md5(concat_ws("|", $"shard", $"pos", $"doc_id", $"n_tokens",
        $"seq_id", $"seq_offset", $"text")))
      .as[String].collect().sorted.toSeq
    val sig = signature()
    assert(sig.nonEmpty)
    // summary agrees with the written data
    val sum = spark.read.parquet(s"$outDir/summary")
      .agg(org.apache.spark.sql.functions.sum($"docs")).as[Long].collect()(0)
    assert(sum == sig.length.toLong)

    // committed: a re-run must not rewrite (sentinel survives)
    val sentinel = new org.apache.hadoop.fs.Path(s"$outDir/data/_sentinel")
    fs.create(sentinel, true).close()
    ExportMain.run(spark, sfDir, outDir, nShards = 4)
    assert(fs.exists(sentinel), "committed export was rewritten on resume")

    // crash simulation: marker missing + a shard destroyed -> full rewrite
    // converges to the identical content signature
    fs.delete(marker, false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/data/shard=2"), true)
    ExportMain.run(spark, sfDir, outDir, nShards = 4)
    assert(signature() == sig, "resume after crash diverged from the clean run")
    assert(graft.util.Markers.read(fs, marker) == recorded)
  }

  test("ExportMain.run: a refreshed input corpus invalidates a committed export") {
    // private input copy so the test can change its identity
    val inDir = Files.createTempDirectory("graft-export-in").toString
    val fsIn = new org.apache.hadoop.fs.Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsIn.mkdirs(new org.apache.hadoop.fs.Path(inDir))
    org.apache.hadoop.fs.FileUtil.copy(
      fsIn, new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet"),
      fsIn, new org.apache.hadoop.fs.Path(s"$inDir/documents.parquet"),
      false, spark.sparkContext.hadoopConfiguration)

    val outDir = Files.createTempDirectory("graft-export-refresh").toString
    ExportMain.run(spark, inDir, outDir, nShards = 4)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$outDir/_export_done")
    val recorded = graft.util.Markers.read(fs, marker)
    assert(recorded.exists(_.contains("input=")), recorded.toString)

    // unchanged input: still a no-op
    val sentinel = new org.apache.hadoop.fs.Path(s"$outDir/data/_sentinel")
    fs.create(sentinel, true).close()
    ExportMain.run(spark, inDir, outDir, nShards = 4)
    assert(fs.exists(sentinel), "same-input resume should be a no-op")

    // refreshed input (an mtime bump changes the file-metadata identity):
    // the committed marker must NOT short-circuit — the export re-runs
    val someFile = {
      val it = fsIn.listFiles(new org.apache.hadoop.fs.Path(s"$inDir/documents.parquet"), true)
      var p: org.apache.hadoop.fs.Path = null
      while (it.hasNext) { val f = it.next(); if (f.isFile) p = f.getPath }
      p
    }
    fsIn.setTimes(someFile, System.currentTimeMillis() + 60000, -1)
    ExportMain.run(spark, inDir, outDir, nShards = 4)
    assert(!fs.exists(sentinel), "refreshed input served a stale committed export")
    val after = graft.util.Markers.read(fs, marker)
    assert(after.isDefined && after != recorded, "marker should record the new input identity")
  }
}
