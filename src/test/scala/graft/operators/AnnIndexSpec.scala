package graft.operators

import graft.SparkTestBase
import java.nio.file.Files

class AnnIndexSpec extends SparkTestBase {

  test("persisted IVF: build partitions by cell, probe prunes, full-probe recall = 1.0") {
    val dir = Files.createTempDirectory("graft-ann").toString + "/index"
    val emb = Tables.embeddings(spark, sfDir)
    AnnIndex.build(emb, dir, nCells = 16)

    // index covers every vector exactly once, laid out one dir per cell
    val idx = spark.read.parquet(dir)
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())
    val cellDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("cell="))
    assert(cellDirs == 16, s"expected 16 cell partitions, got $cellDirs")

    // probing ALL cells must reproduce brute force exactly (same scoring path)
    val full = AnnIndex.search(spark, dir, emb, queryVecId = 0, nCells = 16, nprobe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val brute = AnnIndex.bruteForce(emb, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute)

    // narrow probe: results are a subset of the probed cells and contain the
    // query itself (vector 0 defines centroid cell 0, always probed first)
    val narrow = AnnIndex.search(spark, dir, emb, 0, nCells = 16, nprobe = 4, k = 10).collect()
    assert(narrow.length == 10)
    assert(narrow.map(_.getLong(0)).contains(0L))
    val probedRecall = narrow.map(_.getLong(0)).toSet
      .intersect(brute.map(_._1).toSet).size / 10.0
    info(s"recall@10 with nprobe=4/16: $probedRecall")
    assert(probedRecall >= 0.3) // random gaussian embeddings: modest but nonzero

    // the probe plan is partition-pruned: scan lists only the probed cells
    val plan = AnnIndex.search(spark, dir, emb, 0, 16, 4, 10).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(2000))
  }

  test("k-means refined IVF: index stays complete, probes use persisted centroids") {
    val emb = Tables.embeddings(spark, sfDir)
    val dirs = Seq(0, 2).map { iters =>
      val d = Files.createTempDirectory(s"graft-ann-km$iters").toString + "/index"
      AnnIndex.build(emb, d, nCells = 16, refineIters = iters)
      d
    }
    val Seq(seedDir, refinedDir) = dirs
    // refinement never loses or duplicates vectors
    val idx = spark.read.parquet(refinedDir)
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())

    // full probe reproduces brute force regardless of the centroid set
    val brute = AnnIndex.bruteForce(emb, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fullRefined = AnnIndex.search(spark, refinedDir, emb, 0, 16, nprobe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(fullRefined == brute)

    // Lloyd keeps cells balanced (these gaussian vectors seed fairly evenly
    // already, so assert no WORSE than mild skew rather than strict gain)
    def maxCell(d: String) =
      spark.read.parquet(d).groupBy("cell").count()
        .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    val (seedMax, refinedMax) = (maxCell(seedDir), maxCell(refinedDir))
    info(s"largest cell: seeded=$seedMax refined=$refinedMax")
    assert(refinedMax <= (seedMax * 1.25).toLong + 1)

    def recall(d: String) =
      AnnIndex.search(spark, d, emb, 0, 16, nprobe = 4, k = 10)
        .collect().map(_.getLong(0)).toSet.intersect(brute.map(_._1).toSet).size / 10.0
    info(s"recall@10 nprobe=4: seeded=${recall(seedDir)} refined=${recall(refinedDir)}")
  }
}
