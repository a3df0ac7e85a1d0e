package graft

import graft.pipeline.ExtractJob
import graft.sources.DocSynth
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Timings force full evaluation through a noop-format write — a bare
  * count() would let Catalyst prune the expensive projections and measure
  * nothing. Headline extra fields: extraction docs/sec for the flagship
  * pipeline (BASELINE.json metric) alongside the per-query suite seconds.
  */
object Bench {

  def session(cpus: String): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .withExtensions(new GraftExtensions) // native-hash rewrite rule + md5prefix64
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // spark.local.dir stays on disk: tmpfs (/dev/shm) measured 10x WORSE at
    // local[32] in this sandbox (memory-reclaim pressure), disk page cache
    // absorbs the shuffle fine.
    val localDir = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "")
    if (localDir.nonEmpty) b.config("spark.local.dir", localDir)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Extraction bench: the fused production path (one salted shuffle of raw
    * rows, synth + kernel map-side), both live-parity chunk mode and the
    * north-star semantic mode.
    */
  def extractionBench(spark: SparkSession, sfDir: String): (Long, Double, Double) = {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val chunkSec = (1 to 2).map(_ =>
      timeSec(force(ExtractJob.extractFromRaw(spark, sfDir).toDF()))).min
    val semanticSec = (1 to 2).map(_ =>
      timeSec(force(ExtractJob.extractFromRaw(spark, sfDir,
        cfg = ExtractJob.Config(mode = graft.kernel.ExtractMode.SemanticMode)).toDF()))).min
    (nDocs, chunkSec, semanticSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = session(cpus)

    // warm the JVM/codegen (queries + both extraction modes) on the smallest input
    try {
      force(SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001"))
      force(ExtractJob.extractFromRaw(spark, "/root/testdata/sf0.001").toDF())
      force(ExtractJob.extractFromRaw(spark, "/root/testdata/sf0.001",
        cfg = ExtractJob.Config(mode = graft.kernel.ExtractMode.SemanticMode)).toDF())
    } catch { case _: Throwable => () }

    val (nDocs, chunkSec, semSec) = extractionBench(spark, sfDir)
    val docsPerSec = nDocs / math.max(chunkSec, 1e-9)
    val semDocsPerSec = nDocs / math.max(semSec, 1e-9)
    // sustained throughput: replicated corpus large enough that fixed cost
    // (~3s of JIT + codegen + shuffle machinery on the FIRST full-size run)
    // is amortized — the number that extrapolates to a long-running 100 TB
    // job. Round-1 lesson: single-shot at repl=200 measured the fixed cost,
    // not the pipeline (82k/s reported vs 1.85M/s steady-state). min-of-3
    // also rides out this VM's 5-20x co-tenant spikes.
    val repl = sys.env.getOrElse("SPARK_GRAFT_SUSTAINED_REPL", "1200").toInt
    val sustainedSec = (1 to 3).map { _ =>
      timeSec(force(ExtractJob.extractFromRaw(spark, sfDir, repl,
        ExtractJob.Config(mode = graft.kernel.ExtractMode.SemanticMode)).toDF()))
    }.min
    val sustained = nDocs * repl / math.max(sustainedSec, 1e-9)

    // min-of-N per query: this VM's co-tenant load spikes random intervals
    // 5-20x (BENCH_r02 recorded 199.8s for a ~60s suite) — the official
    // artifact must not depend on landing in a quiet window. min (not mean)
    // because noise is strictly additive.
    // clamp: reps < 1 would make the empty-range .min throw, which the
    // per-query catch records as -1.0 for EVERY query (a silently-poisoned
    // official artifact) instead of flagging the bad env var; a non-numeric
    // value must likewise fail loudly naming the variable, not NFE mid-run
    val qreps = sys.env.get("SPARK_GRAFT_QUERY_REPS") match {
      case None => 3
      case Some(v) => v.toIntOption.map(math.max(1, _)).getOrElse(
        sys.error(s"SPARK_GRAFT_QUERY_REPS must be an integer, got: '$v'"))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try (1 to qreps).map(_ => timeSec(force(fn(spark, sfDir)))).min
        catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + chunkSec + semSec
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extraction_sec":$chunkSec%.3f,"extraction_docs_per_sec":$docsPerSec%.1f,"semantic_extraction_sec":$semSec%.3f,"semantic_docs_per_sec":$semDocsPerSec%.1f,"sustained_semantic_docs_per_sec":$sustained%.1f,"docs":$nDocs}""")
    spark.stop()
  }
}
