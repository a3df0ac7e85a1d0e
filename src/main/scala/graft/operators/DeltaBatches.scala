package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The shared incremental-append commit protocol used by [[AnnIndex]] and
  * [[IvfPq]] — one implementation so the two indexes can never diverge on
  * durability semantics:
  *
  *   - `contentId` derives the batch id from the batch CONTENT (XOR-fold of
  *     xxhash64(vec_id) ⊕ count — order-independent, overflow-free), so a
  *     crashed-and-retried append overwrites its own `delta/batch=<bid>`
  *     directory instead of duplicating rows;
  *   - `commit` appends the id to the `_batches` manifest strictly AFTER
  *     the batch data is durable — the manifest row IS the commit marker,
  *     and `committed` is the only set a search may read;
  *   - `requireDisjoint` enforces the append precondition: a vec_id may
  *     live in the index exactly once. Upsert is NOT supported — a batch
  *     re-carrying an existing id would make top-k return the id twice
  *     (silently shrinking effective k), so the append fails fast instead.
  *     The check is one narrow scan of the index's vec_id column against
  *     the broadcast batch — acceptable for a maintenance job;
  *   - `clear` drops deltas + manifest; a rebuild calls it because its
  *     re-derived models invalidate every prior assignment.
  */
private[operators] object DeltaBatches {

  def deltaDir(indexDir: String): String    = s"$indexDir/delta"
  def manifestDir(indexDir: String): String = s"$indexDir/_batches"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def contentId(batch: DataFrame, what: String): Long = {
    // hash BOTH the id and the vector payload: a batch re-carrying the same
    // ids with refreshed embeddings must get a NEW id (and then be rejected
    // by requireDisjoint as an unsupported upsert) — hashing ids alone
    // would silently no-op it as a "committed replay" and keep stale
    // vectors. TWO independent folds combine into the id: XOR alone cancels
    // duplicate rows (two different all-duplicate batches would collide and
    // the second be skipped as a replay); the wide-decimal SUM fold does
    // not cancel, so the combination is robust to that class.
    val r = batch.agg(
      expr("bit_xor(xxhash64(vec_id, embedding))").as("h1"),
      expr("cast(sum(cast(xxhash64(embedding, vec_id) as decimal(38, 0))) % 9223372036854775783 as bigint)").as("h2"),
      count(lit(1)).as("n")).collect()(0)
    require(r.getLong(2) > 0, s"$what: empty batch")
    r.getLong(0) ^ java.lang.Long.rotateLeft(r.getLong(1), 17) ^ r.getLong(2)
  }

  def commit(spark: SparkSession, indexDir: String, bid: Long): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(bid)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType, false))))
      .write.mode("append").parquet(manifestDir(indexDir))

  def committed(spark: SparkSession, indexDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir(indexDir))
    if (!fsOf(spark, indexDir).exists(p)) Seq.empty
    else spark.read.parquet(manifestDir(indexDir))
      .select("batch").distinct().collect().map(_.getLong(0)).toSeq
  }

  def clear(spark: SparkSession, indexDir: String): Unit = {
    val fs = fsOf(spark, indexDir)
    fs.delete(new org.apache.hadoop.fs.Path(deltaDir(indexDir)), true)
    fs.delete(new org.apache.hadoop.fs.Path(manifestDir(indexDir)), true)
  }

  /** Committed delta rows with the given columns, or None if no batch was
    * ever committed. Always filter by `committed` — an uncommitted (crashed)
    * batch directory must stay invisible.
    */
  def committedDeltaRows(spark: SparkSession, indexDir: String, cols: Seq[String]): Option[DataFrame] =
    committedDeltaRows(spark, indexDir, cols, committed(spark, indexDir))

  /** Overload taking a pre-read committed set — callers that already read
    * the manifest (append does, for the replay check) avoid a second
    * read+collect of it.
    */
  def committedDeltaRows(spark: SparkSession, indexDir: String, cols: Seq[String],
      batches: Seq[Long]): Option[DataFrame] = {
    if (batches.isEmpty) None
    else Some(spark.read.parquet(deltaDir(indexDir))
      .where(col("batch").isin(batches: _*))
      .select(cols.map(col): _*))
  }

  def requireDisjoint(existingIds: DataFrame, batch: DataFrame, what: String): Unit = {
    // the batch must also be duplicate-free WITHIN itself — both copies of
    // an internally repeated id would land and appear twice in top-k
    val internal = batch.groupBy(col("vec_id")).count()
      .where(col("count") > 1).limit(5).collect().map(_.getLong(0))
    require(internal.isEmpty,
      s"$what: batch carries duplicate vec_ids within itself (${internal.mkString(", ")}…) — " +
        "dedup the batch before appending; a duplicated id would appear twice in top-k")
    val dup = existingIds.select(col("vec_id"))
      .join(broadcast(batch.select(col("vec_id"))), "vec_id")
      .limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"$what: batch re-carries vec_ids already in the index (${dup.mkString(", ")}…) — " +
        "upsert is not supported; a duplicated id would appear twice in top-k. " +
        "Rebuild the index, or assign fresh ids to the new vectors")
  }
}
