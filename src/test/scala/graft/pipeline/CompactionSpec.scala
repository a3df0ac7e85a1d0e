package graft.pipeline

import graft.SparkTestBase
import java.nio.file.Files

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction shrinks file count, preserves the row multiset") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // 64 tiny files of 500 rows
    spark.range(500).selectExpr("id AS doc_id", "repeat('x', 100) AS text")
      .repartition(64).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1).toSeq

    val r = Compact.compact(spark, dir, targetFileBytes = 8L * 1024 * 1024)
    assert(r.filesBefore == 64)
    assert(r.filesAfter < 8, s"expected few output files, got ${r.filesAfter}")

    val afterRows = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(afterRows == beforeRows)
    // no staging residue
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}__compact_tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}__compact_old")))
  }

  test("partitioned compaction preserves the partition layout (pruning survives)") {
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    spark.range(400)
      .selectExpr("id AS doc_id", "id % 4 AS grp", "repeat('y', 50) AS text")
      .repartition(16).write.partitionBy("grp").parquet(dir)
    val before = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq

    val r = Compact.compact(spark, dir, targetFileBytes = 8L * 1024 * 1024,
      partitionBy = Seq("grp"))
    assert(r.filesAfter < r.filesBefore)

    // layout: grp=* directories still exist -> partition pruning still works
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 4).foreach { g =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/grp=$g")), s"grp=$g dir missing")
    }
    val after = spark.read.parquet(dir)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(after == before)
    // pruned read touches one partition's files only
    val pruned = spark.read.parquet(dir).where($"grp" === 2)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(grp"), scanned.take(2000))
  }
}
