package graft.pipeline

import graft.util.Markers
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-versioned parquet table — the snapshot half of an Iceberg
  * table re-expressed over a plain directory, built so MAINTENANCE REWRITES
  * ARE INVISIBLE TO CONCURRENT READERS (the gap `Compact.compact`'s rename
  * swap cannot close; see ADVICE on the absent-path window).
  *
  * Layout:
  * {{{
  *   <root>/gen-00000001/  ... parquet data + _committed marker
  *   <root>/gen-00000002/  ... parquet data + _committed marker
  * }}}
  *
  * The directory name deliberately uses `gen-N`, not `gen=N`: Spark's
  * partition discovery claims ANY `name=value` directory as a partition
  * column, even when it is meant as plumbing.
  *
  * Commit protocol (marker-after-data, same rule as `DeltaBatches` /
  * `ExportMain`): a writer creates the next `gen-N` directory, writes data
  * into it, and only then writes the non-empty `_committed` marker
  * ([[Markers]] — an empty marker, the footprint of a kill mid-create,
  * reads as absent). Readers resolve the HIGHEST committed generation; a
  * crashed install is an uncommitted directory no reader ever sees, swept
  * by the next successful install.
  *
  * Why this closes the swap gap: installation never touches the live
  * generation — the old directory stays readable, byte-identical, until
  * retention removes it. A reader that resolved gen N keeps reading gen N
  * while gen N+1 commits; the next resolve sees N+1. There is no instant
  * at which `resolve` can observe a missing or partially-written table.
  *
  * Retention: `install`/`compact` keep the newest `keepGenerations`
  * committed generations (default 2) and drop older ones plus any stale
  * uncommitted debris. As with Iceberg's `expire_snapshots`, a reader must
  * finish within the retention horizon — one full rewrite cycle by default.
  *
  * Single-writer per root (same contract as `DeltaBatches`): two concurrent
  * installs could allocate the same generation number. Readers are
  * unrestricted.
  */
object VersionedTable {

  private val GenRe = "^gen-(\\d{8})$".r
  private def genName(n: Int): String = f"gen-$n%08d"
  private def marker(gen: Path): Path = new Path(gen, "_committed")

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All generation numbers present under root, committed or not. */
  private def generations(fs: FileSystem, root: Path): Seq[(Int, Path, Boolean)] = {
    if (!fs.exists(root)) Seq.empty
    else
      fs.listStatus(root).toSeq.collect {
        case st if st.isDirectory =>
          st.getPath.getName match {
            case GenRe(n) =>
              Some((n.toInt, st.getPath, Markers.read(fs, marker(st.getPath)).isDefined))
            case _ => None
          }
        case _ => None
      }.flatten.sortBy(_._1)
  }

  /** Path of the newest committed generation, or None for an empty/new root. */
  def resolve(spark: SparkSession, root: String): Option[String] = {
    val fs = fsOf(spark, new Path(root).toString)
    generations(fs, new Path(root)).filter(_._3).lastOption.map(_._2.toString)
  }

  /** Read the current generation as a DataFrame (fails on an empty root). */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(resolve(spark, root).getOrElse(
      sys.error(s"versioned table $root has no committed generation")))

  /** Install the next generation: `write(genDir)` produces the data, the
    * commit marker lands after it returns, then retention prunes. Returns
    * the committed generation directory. Works for initial creation too
    * (an empty root commits gen 1).
    */
  def install(spark: SparkSession, root: String, keepGenerations: Int = 2)(
      write: String => Unit): String = {
    require(keepGenerations >= 1, s"keepGenerations must be >= 1, got $keepGenerations")
    val rootPath = new Path(root)
    val fs = fsOf(spark, root)
    val existing = generations(fs, rootPath)
    val next = existing.lastOption.map(_._1 + 1).getOrElse(1)
    val genDir = new Path(rootPath, genName(next))
    fs.delete(genDir, true) // stale debris from a crashed prior install
    write(genDir.toString)
    Markers.write(fs, marker(genDir), next.toString)
    prune(fs, rootPath, keepGenerations)
    // filesystem-qualified, matching what resolve returns (listStatus paths
    // carry the scheme; an unqualified sibling string would compare unequal)
    fs.makeQualified(genDir).toString
  }

  /** Drop all but the newest `keep` committed generations, and any
    * uncommitted directory that is not the newest entry (a crashed install
    * below the tip can never be completed — its number is burned).
    */
  private def prune(fs: FileSystem, root: Path, keep: Int): Unit = {
    val gens = generations(fs, root)
    val committed = gens.filter(_._3)
    val keepNums = committed.takeRight(keep).map(_._1).toSet
    gens.foreach { case (n, p, isCommitted) =>
      val stale = if (isCommitted) !keepNums.contains(n) else n < gens.last._1
      if (stale) fs.delete(p, true)
    }
  }

  /** Reader-safe compaction: rewrite the current generation into the next
    * one at ~targetFileBytes per file (same redistribution as
    * [[Compact.compact]], including the per-partition salt budget), commit,
    * prune. Concurrent readers of the old generation are undisturbed.
    */
  def compact(
      spark: SparkSession,
      root: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil,
      keepGenerations: Int = 2): Compact.Result = {
    val cur = resolve(spark, root).getOrElse(
      sys.error(s"versioned table $root has no committed generation to compact"))
    var stats = (0, 0L)
    val installed = install(spark, root, keepGenerations) { dest =>
      stats = Compact.rewrite(spark, cur, dest, targetFileBytes, partitionBy)
    }
    Compact.Result(stats._1, Compact.countDataFiles(spark, installed), stats._2)
  }
}
