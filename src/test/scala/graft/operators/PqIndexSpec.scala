package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization: 32x compression with honest recall measurement.
  * ADC alone ranks approximately; the production two-stage shape (ADC prune
  * -> exact re-rank) must recover near-exact top-k on clustered data.
  */
class PqIndexSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic clustered corpus (same construction as AnnIndexSpec)
  private def h(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }
  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
  }
  private lazy val clustered: DataFrame = {
    val dim = 32; val nClusters = 16; val perCluster = 64
    val anchors = (0 until nClusters).map(c =>
      unit(Array.tabulate(dim)(d => h(c.toLong * 1000 + d))))
    val rows = for { c <- 0 until nClusters; i <- 0 until perCluster } yield {
      val id = (c * perCluster + i).toLong
      val noisy = anchors(c).zipWithIndex.map { case (a, d) => a + 0.15 * h(id * 131 + d + 7) }
      (id, unit(noisy).map(_.toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def bruteTop10(emb: DataFrame, qid: Long): Set[Long] = {
    graft.functions.GraftFunctions.ensure(spark)
    val q = emb.where(col("vec_id") === qid).select(col("embedding")).head().getSeq[Float](0)
    emb.withColumn("qv", typedLit(q))
      .select(col("vec_id"), expr("vec_dot(embedding, qv)").as("s"))
      .orderBy(desc("s"), asc("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
  }

  test("train is deterministic and codebooks have the declared shape") {
    val cb1 = PqIndex.train(clustered, numSub = 8, k = 16)
    val cb2 = PqIndex.train(clustered, numSub = 8, k = 16)
    assert(cb1.length == 8 && cb1(0).length == 16 && cb1(0)(0).length == 4)
    for (s <- 0 until 8; c <- 0 until 16)
      assert(cb1(s)(c).toSeq == cb2(s)(c).toSeq, s"sub $s code $c")
  }

  test("encode: one packed BIGINT per vector (8 bytes vs 128 float bytes), deterministic across partitionings") {
    val cb = PqIndex.train(clustered, numSub = 8, k = 16)
    def codesOf(parts: Int) =
      PqIndex.encode(clustered.repartition(parts), cb).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = codesOf(3); val b = codesOf(11)
    assert(a == b && a.size == 1024)
    // every unpacked byte-code is a valid codebook index
    assert(a.values.forall(c =>
      (0 until 8).forall(s => { val x = (c >> (8 * s)) & 255; x >= 0 && x < 16 })))
  }

  test("two-stage search (ADC prune -> exact re-rank) recovers near-exact top-10") {
    val cb = PqIndex.train(clustered, numSub = 8, k = 16)
    val encoded = PqIndex.encode(clustered, cb).cache()
    val queries = Seq(0L, 64L, 130L, 513L, 999L, 320L, 777L, 448L)
    val embByIdQ = clustered.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val (adcCluster, rrR) = queries.map { qid =>
      val brute = bruteTop10(clustered, qid)
      val q = embByIdQ(qid)
      // ADC quantizes within-cluster distances away (cluster-mates share
      // codes), so its own top-10 only resolves to CLUSTER granularity —
      // the honest ADC-only check is that it retrieves the right cluster;
      // exact ranking is the re-rank stage's job.
      val adc = PqIndex.search(encoded, cb, q, 10).collect().map(_.getLong(0))
      val sameCluster = adc.count(_ / 64 == qid / 64) / 10.0
      val rr = PqIndex.searchRerank(encoded, clustered, cb, q, 10, candidates = 100)
        .collect().map(_.getLong(0)).toSet
      (sameCluster, brute.intersect(rr).size / 10.0)
    }.unzip
    val adcMean = adcCluster.sum / adcCluster.length
    val rrMean = rrR.sum / rrR.length
    info(f"PQ: ADC-only right-cluster rate $adcMean%.3f; recall@10 with exact re-rank $rrMean%.3f over ${queries.length} queries")
    assert(adcMean >= 0.9, f"ADC right-cluster rate $adcMean%.3f < 0.9")
    assert(rrMean >= 0.95, f"two-stage recall $rrMean%.3f < 0.95")
    encoded.unpersist()
  }

  test("IVF x PQ composed index: recall@10 >= 0.95 scoring only the probed cells' codes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString + "/index"
    IvfPq.build(clustered, dir, nCells = 16, refineIters = 2, numSub = 8, codebookK = 16)
    val codes = spark.read.parquet(IvfPq.codesDir(dir))
    assert(codes.count() == 1024) // every vector exactly once, 8 B each
    val queries = Seq(0L, 64L, 130L, 513L, 999L, 320L, 777L, 448L)
    val embById = clustered.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    var scoredMax = 0L
    val recalls = queries.map { qid =>
      val brute = bruteTop10(clustered, qid)
      // rows the ADC stage can touch = rows in the probed cells only
      val cells = IvfPq.probeCells(spark, dir, embById(qid), nprobe = 4)
      scoredMax = math.max(scoredMax, codes.where(col("cell").isin(cells: _*)).count())
      val got = IvfPq.search(spark, dir, clustered, qid, nprobe = 4, k = 10, candidates = 64)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(f"IVFxPQ: recall@10 $mean%.3f over ${queries.length} queries; max ADC-scored rows $scoredMax of 1024")
    assert(mean >= 0.95, f"recall $mean%.3f < 0.95")
    // nprobe/nCells of the table (4/16 of 1024 = 256), x2 slack for cell imbalance
    assert(scoredMax <= 512, s"probe scored $scoredMax of 1024 rows — cell pruning broken")
    // probe plan: the codes scan is partition-pruned; ADC top-k never shuffles
    val plan = IvfPq.search(spark, dir, clustered, 0L, 4, 10, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    // an unmarked (crashed mid-build) index is refused, like AnnIndex
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_committed"), false)
    val e = intercept[IllegalArgumentException] {
      IvfPq.search(spark, dir, clustered, 0L, 4, 10, 64).collect()
    }
    assert(e.getMessage.contains("incomplete build"), e.getMessage)
  }

  test("codebooks round-trip persistence bit-identically") {
    val cb = PqIndex.train(clustered, numSub = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-cb").toString + "/cb"
    PqIndex.saveCodebooks(spark, cb, dir)
    val cb2 = PqIndex.loadCodebooks(spark, dir)
    assert(cb2.length == cb.length)
    for (s <- cb.indices; c <- cb(s).indices)
      assert(cb2(s)(c).toSeq == cb(s)(c).toSeq, s"sub $s code $c")
  }

  test("ADC search compiles to TakeOrderedAndProject over a scan (no shuffle, no join)") {
    val cb = PqIndex.train(clustered, numSub = 8, k = 16)
    val encoded = PqIndex.encode(clustered, cb)
    val q = clustered.where(col("vec_id") === 0L).head().getSeq[Float](1).toArray
    val plan = PqIndex.search(encoded, cb, q, 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("IVF x PQ incremental append: new vectors searchable under frozen models, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-append").toString + "/index"
    val base = clustered.where(col("vec_id") % 2 === 0)
    val batch = clustered.where(col("vec_id") % 2 === 1)
    // models trained on the base half only; the appended half reuses them
    IvfPq.build(base, dir, nCells = 16, refineIters = 2, numSub = 8, codebookK = 16)
    val bid = IvfPq.append(spark, dir, batch)

    // recall over the COMBINED corpus stays high even though the appended
    // half never influenced centroids or codebooks
    val queries = Seq(0L, 64L, 130L, 513L, 999L, 777L)
    val recalls = queries.map { qid =>
      val brute = bruteTop10(clustered, qid)
      val got = IvfPq.search(spark, dir, clustered, qid, nprobe = 4, k = 10, candidates = 64)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    info(f"IVFxPQ append: recall@10 $mean%.3f over ${queries.length} queries (models from half the corpus)")
    assert(mean >= 0.9, f"recall $mean%.3f < 0.9 after append")

    // idempotent re-append; rebuild clears deltas
    assert(IvfPq.append(spark, dir, batch) == bid)
    assert(spark.read.parquet(s"$dir/delta").count() == batch.count())
    IvfPq.build(base, dir, nCells = 16)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/delta")))
  }
}
