package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class AnnIndexSpec extends SparkTestBase {

  private def bruteTop10(emb: DataFrame, q: Long): Set[Long] =
    AnnIndex.bruteForce(emb, q, 10).collect().map(_.getLong(0)).toSet

  test("persisted IVF: build partitions by cell, probe prunes, full-probe recall = 1.0") {
    val dir = Files.createTempDirectory("graft-ann").toString + "/index"
    val emb = Tables.embeddings(spark, sfDir)
    AnnIndex.build(emb, dir, nCells = 16)

    // index covers every vector exactly once, laid out one dir per cell
    val idx = spark.read.parquet(AnnIndex.cellsDir(dir))
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())
    val cellDirs = new java.io.File(AnnIndex.cellsDir(dir)).listFiles()
      .count(_.getName.startsWith("cell="))
    assert(cellDirs == 16, s"expected 16 cell partitions, got $cellDirs")

    // probing ALL cells must reproduce brute force exactly (same scoring path)
    val full = AnnIndex.search(spark, dir, emb, queryVecId = 0, nprobe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val brute = AnnIndex.bruteForce(emb, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute)

    // narrow probe returns k rows from the probed cells only
    val narrow = AnnIndex.search(spark, dir, emb, 0, nprobe = 4, k = 10).collect()
    assert(narrow.length == 10)

    // the probe plan is partition-pruned: scan lists only the probed cells
    val plan = AnnIndex.search(spark, dir, emb, 0, 4, 10).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(2000))
  }

  test("rebuild with fewer cells wipes stale cell partitions, even under dynamic overwrite") {
    val dir = Files.createTempDirectory("graft-ann-rebuild").toString + "/index"
    val emb = Tables.embeddings(spark, sfDir)
    // round-3 advice scenario: some earlier component (e.g. a span writer)
    // left the session in dynamic partition-overwrite mode; a rebuild at a
    // smaller nCells must still wipe the whole cells/ tree, or probes would
    // read stale cell=N vectors assigned under the OLD centroids
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try {
      AnnIndex.build(emb, dir, nCells = 8, refineIters = 0)
      AnnIndex.build(emb, dir, nCells = 4, refineIters = 0)
    } finally spark.conf.set(key, prev)
    val cellDirs = new java.io.File(AnnIndex.cellsDir(dir)).listFiles()
      .count(_.getName.startsWith("cell="))
    assert(cellDirs == 4, s"stale cell partitions survived the rebuild: $cellDirs dirs")
    val idx = spark.read.parquet(AnnIndex.cellsDir(dir))
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())
  }

  test("seeding fails with a clear message on NaN embeddings, not an index error") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(Float.NaN, 1.0f)),
      (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.seedCentroids(emb, nCells = 2).collect()
    }
    assert(e.getMessage.contains("NaN"), e.getMessage)
  }

  test("build commits centroids before cells; search fails fast without them") {
    val root = Files.createTempDirectory("graft-ann-order").toString
    val emb = Tables.embeddings(spark, sfDir)
    val dir = s"$root/index"
    AnnIndex.build(emb, dir, nCells = 8)
    // simulate a crash mid-build by deleting the commit marker: search must
    // refuse rather than probe cells whose centroids may not match
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_committed"), false)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.search(spark, dir, emb, 0, 4, 10).collect()
    }
    assert(e.getMessage.contains("incomplete build"), e.getMessage)
  }

  test("k-means refined IVF: deterministic, complete, probes use persisted centroids") {
    val emb = Tables.embeddings(spark, sfDir)
    val dirs = Seq(0, 2).map { iters =>
      val d = Files.createTempDirectory(s"graft-ann-km$iters").toString + "/index"
      AnnIndex.build(emb, d, nCells = 16, refineIters = iters)
      d
    }
    val Seq(seedDir, refinedDir) = dirs
    // refinement never loses or duplicates vectors
    val idx = spark.read.parquet(AnnIndex.cellsDir(refinedDir))
    assert(idx.count() == emb.count())
    assert(idx.select("vec_id").distinct().count() == emb.count())

    // full probe reproduces brute force regardless of the centroid set
    val brute = AnnIndex.bruteForce(emb, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fullRefined = AnnIndex.search(spark, refinedDir, emb, 0, nprobe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(fullRefined == brute)

    // determinism: rebuilding yields the identical centroid table
    val d2 = Files.createTempDirectory("graft-ann-km2b").toString + "/index"
    AnnIndex.build(emb, d2, nCells = 16, refineIters = 2)
    val c1 = spark.read.parquet(s"$refinedDir/_centroids").orderBy("cell")
      .collect().map(_.toString).toSeq
    val c2 = spark.read.parquet(s"$d2/_centroids").orderBy("cell")
      .collect().map(_.toString).toSeq
    assert(c1 == c2)

    // Lloyd keeps cells balanced (these isotropic unit vectors seed fairly
    // evenly already, so assert no WORSE than mild skew rather than strict gain)
    def maxCell(d: String) =
      spark.read.parquet(AnnIndex.cellsDir(d)).groupBy("cell").count()
        .agg(max("count")).head.getLong(0)
    val (seedMax, refinedMax) = (maxCell(seedDir), maxCell(refinedDir))
    info(s"largest cell: seeded=$seedMax refined=$refinedMax")
    assert(refinedMax <= (seedMax * 1.25).toLong + 1)
  }

  /** Recall grid over the driver testdata. These embeddings are UNIT
    * NORMALIZED and ISOTROPIC (no cluster structure — verified: mean
    * |off-diagonal correlation| ≈ 0.036), which is the worst case for IVF:
    * the true top-10 of a query spread across cells near-uniformly, so
    * expected recall is bounded by roughly the probed fraction plus the
    * query-locality bonus. The grid documents the honest numbers; the
    * clustered-data test below shows the same index hitting ≥0.95 when the
    * corpus has the structure real-world embeddings have.
    */
  test("recall@10 grid on isotropic testdata (honest ceiling), mean over 64 queries") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = (0L until 64L).toSeq
    val brute = queries.map(q => q -> bruteTop10(emb, q)).toMap
    for (nCells <- Seq(8, 16)) {
      val d = Files.createTempDirectory(s"graft-ann-grid$nCells").toString + "/index"
      AnnIndex.build(emb, d, nCells = nCells, refineIters = 2)
      val assignment = spark.read.parquet(AnnIndex.cellsDir(d))
        .select(col("vec_id"), col("cell").cast("long")) // partition col reads back as int
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cent = spark.read.parquet(s"$d/_centroids")
      val cvecs = cent.orderBy("cell").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      val evecs = emb.where(col("vec_id") < 64)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
      for (nprobe <- Seq(1, 2, 4, 8)) {
        val recalls = queries.map { q =>
          val qv = evecs(q)
          val probed = cvecs.map { case (c, v) =>
            (c, v.zip(qv).map { case (a, b) => a * b }.sum)
          }.sortBy { case (c, s) => (-s, c) }.take(nprobe).map(_._1).toSet
          brute(q).count(j => probed(assignment(j))) / 10.0
        }
        val mean = recalls.sum / recalls.length
        info(f"nCells=$nCells nprobe=$nprobe: mean recall@10 = $mean%.3f")
        // probing everything always recovers everything; sanity floor below that
        if (nprobe >= nCells) assert(mean == 1.0)
        else assert(mean >= nprobe.toDouble / nCells,
          f"recall $mean%.3f below probed-fraction floor ${nprobe.toDouble / nCells}%.3f")
      }
    }
  }

  /** Deterministic CLUSTERED corpus (what real embedding spaces look like):
    * 16 well-separated unit anchors + small per-vector noise. The build's
    * farthest-first seeding + 2 Lloyd iterations must place centroids on the
    * clusters, giving recall@10 ≥ 0.95 at nprobe=4 of nCells=16.
    */
  test("recall@10 >= 0.95 at nprobe 4/16 on clustered embeddings") {
    import spark.implicits._
    val dim = 32
    val nClusters = 16
    val perCluster = 64
    // deterministic pseudo-random doubles from a splitmix-style hash
    def h(seed: Long): Double = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val anchors = (0 until nClusters).map(c =>
      unit(Array.tabulate(dim)(d => h(c.toLong * 1000 + d))))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val id = (c * perCluster + i).toLong
      val noisy = anchors(c).zipWithIndex.map { case (a, d) =>
        a + 0.15 * h(id * 131 + d + 7)
      }
      (id, unit(noisy).map(_.toFloat).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-ann-clustered").toString + "/index"
    AnnIndex.build(emb, dir, nCells = nClusters, refineIters = 2)

    val queries = (0 until nClusters).map(c => (c * perCluster).toLong) ++
      Seq(5L, 77L, 200L, 513L, 1000L)
    val recalls = queries.map { q =>
      val brute = bruteTop10(emb, q)
      val got = AnnIndex.search(spark, dir, emb, q, nprobe = 4, k = 10)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(f"clustered corpus: mean recall@10 at nprobe 4/16 = $mean%.3f over ${queries.length} queries")
    assert(mean >= 0.95, f"mean recall $mean%.3f < 0.95")
  }

  test("incremental append: new vectors searchable, idempotent, crash-invisible") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft-ann-append").toString + "/index"
    // base index over the even vec_ids; odd ids arrive later as a batch
    val base = emb.where($"vec_id" % 2 === 0)
    val batch = emb.where($"vec_id" % 2 === 1)
    AnnIndex.build(base, dir, nCells = 16)

    // before append: an odd id can never be returned
    val pre = AnnIndex.search(spark, dir, emb, 0, nprobe = 16, k = 10)
      .collect().map(_.getLong(0))
    assert(pre.forall(_ % 2 == 0))

    val bid = AnnIndex.append(spark, dir, batch)
    // full probe after append == brute force over the WHOLE corpus
    val post = AnnIndex.search(spark, dir, emb, 0, nprobe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val brute = AnnIndex.bruteForce(emb, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(post == brute)

    // idempotent: re-appending the identical batch is a committed no-op
    assert(AnnIndex.append(spark, dir, batch) == bid)
    val total = spark.read.parquet(s"$dir/delta").count()
    assert(total == batch.count(), s"re-append duplicated rows: $total")

    // an overlapping-but-DIFFERENT batch (same ids, different content id)
    // must be rejected — upsert is unsupported, duplicates would corrupt top-k
    val overlap = batch.limit(3)
    val dupErr = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir, overlap)
    }
    assert(dupErr.getMessage.contains("already in the index"), dupErr.getMessage)

    // a batch duplicated WITHIN itself must also be rejected: both copies
    // would land in the delta and appear twice in top-k
    val fresh = emb.select(($"vec_id" + 5000000L).as("vec_id"), $"embedding").limit(2)
    val selfDup = fresh.unionAll(fresh)
    val internalErr = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir, selfDup)
    }
    assert(internalErr.getMessage.contains("within itself"), internalErr.getMessage)

    // a crashed append (data present, manifest row missing) is invisible
    val fakeBid = 123456789L
    batch.limit(5)
      .select($"vec_id" + 1000000L as "vec_id",
        org.apache.spark.sql.functions.lit(0L).as("cell"), $"embedding")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/delta/batch=$fakeBid")
    val afterCrash = AnnIndex.search(spark, dir, emb, 0, nprobe = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(afterCrash == brute, "uncommitted batch leaked into search results")

    // rebuild drops deltas: centroids changed, stale assignments must die
    AnnIndex.build(base, dir, nCells = 8)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/delta")))
    val rebuilt = AnnIndex.search(spark, dir, emb, 0, nprobe = 8, k = 10)
      .collect().map(_.getLong(0))
    assert(rebuilt.forall(_ % 2 == 0))
  }

  test("append refuses an uncommitted base index") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft-ann-append-bad").toString + "/index"
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir, emb.limit(3))
    }
    assert(e.getMessage.contains("commit marker"))
  }
}
