package graft.operators

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import java.nio.file.Files

/** The round-4 `weak`: the append duplicate-id guard used to scan the full
  * index vec_id column per append, so the streaming sink paid O(index) per
  * micro-batch. Now the guard is digest-based (base `_idbloom` + one bloom
  * per committed batch in the manifest): these cases pin, via actual
  * records-read task metrics, that a disjoint append reads batch+manifest-
  * sized input — independent of index size — while the fallback path (bloom
  * hit) still performs the exact scan and duplicates are still rejected.
  */
class DeltaGuardSpec extends SparkTestBase {

  /** Deterministic local (non-file-backed) embeddings so the only parquet
    * input during an append is the index itself — records-read then
    * measures exactly what the guard touches.
    */
  private def localEmb(ids: Range, dim: Int = 8): DataFrame = {
    import spark.implicits._
    def h(seed: Long): Float = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      (((z ^ (z >>> 27)) >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
    }
    ids.map(i => (i.toLong, Seq.tabulate(dim)(d => h(i.toLong * 131 + d))))
      .toDF("vec_id", "embedding")
  }

  /** Total input records read by jobs triggered inside `f` (listener bus is
    * async — poll until the counter goes quiet).
    */
  private def recordsReadDuring[A](f: => A): (A, Long) = {
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { counter.addAndGet(m.inputMetrics.recordsRead); () }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = f
      var prev = -1L
      var spins = 0
      while (counter.get() != prev && spins < 100) {
        prev = counter.get(); Thread.sleep(100); spins += 1
      }
      (a, counter.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private val indexRows = 4000

  test("disjoint append reads batch+manifest-sized input, not the index") {
    val dir = Files.createTempDirectory("graft-guard").toString + "/index"
    AnnIndex.build(localEmb(0 until indexRows), dir, nCells = 8, refineIters = 0)

    // first delta: guard must prove disjointness from the base digest alone
    val (_, read1) = recordsReadDuring {
      AnnIndex.append(spark, dir, localEmb(100000 until 100200))
    }
    info(s"append #1 over a $indexRows-row index read $read1 records")
    assert(read1 < indexRows / 2,
      s"guard read $read1 records against a $indexRows-row index — O(index) scan is back")

    // second delta: manifest now has one committed batch; still no index scan
    val (_, read2) = recordsReadDuring {
      AnnIndex.append(spark, dir, localEmb(200000 until 200200))
    }
    info(s"append #2 read $read2 records")
    assert(read2 < indexRows / 2,
      s"guard read $read2 records with one committed batch — digest path regressed")

    // appended rows are searchable: digest guard didn't weaken the protocol
    val all = localEmb(0 until indexRows)
      .unionAll(localEmb(100000 until 100200)).unionAll(localEmb(200000 until 200200))
    val got = AnnIndex.search(spark, dir, all, 100005L, nprobe = 8, k = 5)
      .collect().map(_.getLong(0))
    assert(got.length == 5)
  }

  test("duplicate ids are still rejected — against the base and against a committed delta") {
    val dir = Files.createTempDirectory("graft-guard-dup").toString + "/index"
    AnnIndex.build(localEmb(0 until 500), dir, nCells = 4, refineIters = 0)
    AnnIndex.append(spark, dir, localEmb(10000 until 10100))

    // id 42 lives in the BASE (different embedding -> new content id, so
    // this is a genuine upsert attempt, not a replay)
    val baseDup = localEmb(42 to 42, dim = 8).unionAll(localEmb(20000 until 20005))
    val e1 = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir,
        baseDup.selectExpr("vec_id", "transform(embedding, x -> x + 0.25f) as embedding"))
    }
    assert(e1.getMessage.contains("already in the index"), e1.getMessage)

    // id 10050 lives in a committed DELTA — its digest rides the manifest
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir,
        localEmb(10050 to 10050).unionAll(localEmb(30000 until 30005))
          .selectExpr("vec_id", "transform(embedding, x -> x + 0.25f) as embedding"))
    }
    assert(e2.getMessage.contains("already in the index"), e2.getMessage)
  }

  test("bloom false-positive path: saturated digests fall back to the EXACT scan") {
    val key = "spark.graft.index.bloomCap"
    // cap=1 builds ~10-bit blooms that saturate instantly: every membership
    // test hits, so EVERY append takes the fallback — disjoint appends must
    // still succeed (exact scan finds nothing) and must visibly read the index
    spark.conf.set(key, "1")
    try {
      val dir = Files.createTempDirectory("graft-guard-fp").toString + "/index"
      AnnIndex.build(localEmb(0 until indexRows), dir, nCells = 8, refineIters = 0)
      val (_, read) = recordsReadDuring {
        AnnIndex.append(spark, dir, localEmb(500000 until 500050))
      }
      info(s"saturated-digest append read $read records (index=$indexRows)")
      assert(read >= indexRows,
        s"fallback was supposed to scan the index exactly, but read only $read records")
      // and the exact path still rejects a real duplicate
      val e = intercept[IllegalArgumentException] {
        AnnIndex.append(spark, dir,
          localEmb(7 to 7).selectExpr("vec_id", "transform(embedding, x -> x + 0.25f) as embedding"))
      }
      assert(e.getMessage.contains("already in the index"), e.getMessage)
    } finally spark.conf.unset(key)
  }

  test("IvfPq append is digest-guarded through the same protocol") {
    val dir = Files.createTempDirectory("graft-guard-pq").toString + "/index"
    IvfPq.build(localEmb(0 until indexRows), dir, nCells = 8, refineIters = 0,
      numSub = 4, codebookK = 8)
    val (_, read) = recordsReadDuring {
      IvfPq.append(spark, dir, localEmb(100000 until 100100))
    }
    info(s"IvfPq append over a $indexRows-row index read $read records")
    assert(read < indexRows / 2,
      s"IvfPq guard read $read records against a $indexRows-row index")
    val e = intercept[IllegalArgumentException] {
      IvfPq.append(spark, dir,
        localEmb(3 to 3).unionAll(localEmb(40000 until 40002))
          .selectExpr("vec_id", "transform(embedding, x -> x + 0.25f) as embedding"))
    }
    assert(e.getMessage.contains("already in the index"), e.getMessage)
  }

  test("seeding fails fast when nCells exceeds the seed sample bound") {
    val emb = localEmb(0 until 100)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.seedCentroids(emb, nCells = 16, sampleSize = 8).collect()
    }
    assert(e.getMessage.contains("sampleSize"), e.getMessage)
    // fewer ROWS than nCells is not the failure case: an index cannot have
    // more cells than vectors, nothing was silently dropped
    assert(AnnIndex.seedCentroids(localEmb(0 until 5), nCells = 16).count() == 5)
  }
}
