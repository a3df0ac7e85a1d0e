package graft

import graft.pipeline.ExtractJob
import graft.sources.DocSynth
import org.apache.spark.sql.SparkSession

/** N -> 4N scaling evidence (BASELINE.json: efficiency >= 0.8 between two
  * cluster sizes; no cluster in this sandbox, so per driver instruction the
  * same job runs at local[8] and local[32] on the same input and reports
  * throughput at both plus efficiency = T_32 / (4 * T_8).
  *
  * Each parallelism level gets its own SparkSession (sequentially; Spark
  * allows re-creation after stop()) with shuffle partitions = cores. The
  * extraction is run `reps` times per level and the best run is kept
  * (steady-state throughput, JIT/page-cache warmed).
  */
object ScalingBench {

  def run(cpus: Int, sfDir: String, reps: Int): (Long, Double) = {
    val spark = Bench.session(cpus.toString)
    try {
      val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      // warm-up
      Bench.force(ExtractJob.extract(DocSynth.docs(spark, sfDir)).toDF())
      val best = (1 to reps).map { _ =>
        Bench.timeSec(Bench.force(ExtractJob.extract(DocSynth.docs(spark, sfDir)).toDF()))
      }.min
      (nDocs, best)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val (n8, t8) = run(8, sfDir, reps)
    val (_, t32) = run(32, sfDir, reps)
    val tp8 = n8 / t8
    val tp32 = n8 / t32
    val eff = tp32 / (4.0 * tp8)
    println(f"""{"sf":"$sfDir","docs":$n8,"local8_sec":$t8%.3f,"local8_docs_per_sec":$tp8%.1f,"local32_sec":$t32%.3f,"local32_docs_per_sec":$tp32%.1f,"scaling_efficiency":$eff%.3f}""")
  }
}
