package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The shared incremental-append commit protocol used by [[AnnIndex]] and
  * [[IvfPq]] — one implementation so the two indexes can never diverge on
  * durability semantics:
  *
  *   - `contentStats` derives the batch id from the batch CONTENT — two
  *     independent order-free folds over `xxhash64(vec_id, embedding)` (an
  *     XOR fold plus a wide-decimal modular SUM fold; XOR alone cancels
  *     duplicate rows, the sum fold does not, so two different batches
  *     cannot collide through duplicate-pair cancellation) combined with
  *     the row count. A crashed-and-retried append therefore overwrites
  *     its own `delta/batch=<bid>` directory instead of duplicating rows,
  *     and a batch re-carrying the same ids with refreshed embeddings gets
  *     a NEW id (then rejected as an unsupported upsert). The same
  *     aggregation also returns the distinct-id count, so the
  *     batch-internal duplicate guard costs no extra job;
  *   - `commit` appends the id to the `_batches` manifest strictly AFTER
  *     the batch data is durable — the manifest row IS the commit marker,
  *     and `committed` is the only set a search may read. The manifest
  *     carries a `_format` version file: the id formula is part of the
  *     on-disk contract, so a manifest written under a different formula
  *     fails fast instead of mis-classifying replays;
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

  /** Bump when the `contentStats` id formula changes — mismatched manifests
    * must fail fast, not silently mis-classify replays.
    */
  private val FormatVersion = "2"

  def deltaDir(indexDir: String): String    = s"$indexDir/delta"
  def manifestDir(indexDir: String): String = s"$indexDir/_batches"
  private def formatMarker(indexDir: String) = s"${manifestDir(indexDir)}/_format"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  final case class ContentStats(bid: Long, n: Long, nDistinct: Long)

  def contentStats(batch: DataFrame, what: String): ContentStats = {
    val r = batch.agg(
      expr("bit_xor(xxhash64(vec_id, embedding))").as("h1"),
      expr("cast(sum(cast(xxhash64(embedding, vec_id) as decimal(38, 0))) % 9223372036854775783 as bigint)").as("h2"),
      count(lit(1)).as("n"),
      countDistinct(col("vec_id")).as("nd"),
      count(col("vec_id")).as("nonNull")).collect()(0)
    require(r.getLong(2) > 0, s"$what: empty batch")
    // reject null ids explicitly — countDistinct ignores nulls, so without
    // this a null id would masquerade as an internal duplicate (or NPE in
    // the error path naming the offenders)
    require(r.getLong(4) == r.getLong(2),
      s"$what: batch carries ${r.getLong(2) - r.getLong(4)} null vec_id row(s) — ids must be non-null")
    ContentStats(
      r.getLong(0) ^ java.lang.Long.rotateLeft(r.getLong(1), 17) ^ r.getLong(2),
      r.getLong(2), r.getLong(3))
  }

  /** Fails naming up to five offending ids — only called once `contentStats`
    * has already detected `nDistinct < n`, so the extra job runs only on
    * the error path.
    */
  def failInternalDuplicates(batch: DataFrame, what: String): Nothing = {
    val ids = batch.groupBy(col("vec_id")).count()
      .where(col("count") > 1).limit(5).collect().map(_.getLong(0))
    throw new IllegalArgumentException(
      s"$what: batch carries duplicate vec_ids within itself (${ids.mkString(", ")}…) — " +
        "dedup the batch before appending; a duplicated id would appear twice in top-k")
  }

  private val manifestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("batch",
      org.apache.spark.sql.types.LongType, false)))

  def commit(spark: SparkSession, indexDir: String, bid: Long): Unit = {
    val fs = fsOf(spark, indexDir)
    // version marker FIRST: a manifest row must never exist without its
    // format recorded. Markers go through the shared helper, so a marker
    // left empty by a kill between create and write reads as absent and is
    // simply rewritten here — never a bricked third state.
    val marker = new org.apache.hadoop.fs.Path(formatMarker(indexDir))
    if (graft.util.Markers.read(fs, marker).isEmpty)
      graft.util.Markers.write(fs, marker, FormatVersion)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(bid)), 1), manifestSchema)
      .write.mode("append").parquet(manifestDir(indexDir))
  }

  /** Append-time gate: replay classification compares content ids against
    * the manifest, which is only sound when the manifest was written under
    * THIS id formula. Searches never classify replays, so they read the
    * manifest without this check — a working index stays searchable across
    * a formula upgrade; only further appends demand a rebuild.
    */
  def requireFormatCurrent(spark: SparkSession, indexDir: String, what: String): Unit = {
    val fs = fsOf(spark, indexDir)
    if (fs.exists(new org.apache.hadoop.fs.Path(manifestDir(indexDir)))) {
      val ver = graft.util.Markers.read(fs, new org.apache.hadoop.fs.Path(formatMarker(indexDir)))
      require(ver.contains(FormatVersion),
        s"$what: the delta manifest at ${manifestDir(indexDir)} was written under content-id " +
          s"format ${ver.getOrElse("<unrecorded>")} but this build uses '$FormatVersion' — batch " +
          "ids are not comparable across formats (a replay could be mis-classified); rebuild " +
          "the index before appending (existing searches remain valid)")
    }
  }

  def committed(spark: SparkSession, indexDir: String): Seq[Long] = {
    val fs = fsOf(spark, indexDir)
    val p = new org.apache.hadoop.fs.Path(manifestDir(indexDir))
    if (!fs.exists(p)) Seq.empty
    // explicit schema: a marker-only manifest (crash before the first
    // batch row landed) must read as empty, not fail schema inference.
    // No version gate here — see requireFormatCurrent: only appends
    // compare content ids, searches just need the committed set.
    else spark.read.schema(manifestSchema).parquet(manifestDir(indexDir))
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
    val dup = existingIds.select(col("vec_id"))
      .join(broadcast(batch.select(col("vec_id"))), "vec_id")
      .limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"$what: batch re-carries vec_ids already in the index (${dup.mkString(", ")}…) — " +
        "upsert is not supported; a duplicated id would appear twice in top-k. " +
        "Rebuild the index, or assign fresh ids to the new vectors")
  }
}
