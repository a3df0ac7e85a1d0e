package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for a parquet table directory — the Iceberg
  * `rewrite_data_files` maintenance action re-expressed over plain parquet.
  *
  * Long-running ingest (streaming micro-batches, per-group checkpoint
  * commits) accretes many small files; at 100 TB the scan-planning and
  * open() overhead of millions of tiny files dominates read cost, so
  * compaction is a first-class maintenance job, not a nicety.
  *
  * Protocol — write-new then swap, never in-place (a kill at any point
  * leaves either the old table or the new one, both complete):
  *
  *   1. read the table, coalesce to ceil(totalBytes / targetFileBytes)
  *      output tasks (partitioned tables: one shuffle keyed by the
  *      partition columns so each partition directory compacts to its own
  *      file set and partition pruning is preserved);
  *   2. write to a sibling `<dir>__compact_tmp` directory;
  *   3. swap: rename old → `<dir>__compact_old`, tmp → dir, delete old.
  *
  * Row multiset is unchanged (parquet table semantics carry no row order);
  * `CompactionSpec` asserts content equality and the file-count drop.
  */
object Compact {

  final case class Result(filesBefore: Int, filesAfter: Int, bytes: Long)

  private def dataFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) buf += f.getPath
      }
      buf.toSeq
    }
  }

  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): Result = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = dataFiles(spark, dir)
    val totalBytes = before.map(p => fs.getFileStatus(p).getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.parquet(dir)
    val compacted =
      if (partitionBy.isEmpty) df.repartition(nOut)
      // partitioned table: shuffle on the partition columns so every
      // partition directory's rows land in as few tasks as possible while
      // the directory layout (and thus pruning) survives the rewrite
      else df.repartition(math.max(nOut, partitionBy.size), partitionBy.map(col): _*)

    val tmp = s"${dir}__compact_tmp"
    val old = s"${dir}__compact_old"
    val w = compacted.write.mode(SaveMode.Overwrite)
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*)).parquet(tmp)

    // swap: old table aside, new table in, old table dropped
    fs.delete(new Path(old), true)
    if (!fs.rename(new Path(dir), new Path(old)))
      sys.error(s"compaction swap failed renaming $dir aside; table untouched")
    if (!fs.rename(new Path(tmp), new Path(dir))) {
      fs.rename(new Path(old), new Path(dir)) // roll back
      sys.error(s"compaction swap failed installing $tmp; original restored")
    }
    fs.delete(new Path(old), true)

    Result(before.size, dataFiles(spark, dir).size, totalBytes)
  }
}
