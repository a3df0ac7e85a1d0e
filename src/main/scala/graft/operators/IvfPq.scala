package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The production ANN stack: IVF cell pruning × product-quantized storage
  * (Jégou et al., TPAMI 2011 — the "IVFADC" composition). [[AnnIndex]]
  * prunes WHICH rows a probe reads (partition pruning on the cell column);
  * [[PqIndex]] shrinks WHAT a read costs (8-byte codes instead of 256-byte
  * float vectors) and scores without decompression. Composed:
  *
  *   build:  k-means centroids → assign → PQ-encode per cell →
  *           `codes/cell=N/` parquet (8 B/vector)
  *   search: probe top-`nprobe` cells (centroid table is nCells rows,
  *           driver-side) → partition-pruned scan of the probed codes →
  *           codegen'd ADC top-`candidates` (TakeOrderedAndProject, no
  *           shuffle) → exact `vec_dot` re-rank of just the candidates
  *           against the source vectors (broadcast semi-join).
  *
  * At 100 TB scale this is the only tractable shape: a probe touches
  * `nprobe/nCells` of an 8-bytes-per-vector table — ~0.03% of the raw
  * float bytes at the defaults — and the full vectors are read only for
  * `candidates` rows.
  *
  * Durability: same marker discipline as [[AnnIndex]] — centroids and
  * codebooks commit before the cell data they explain, `_committed` lands
  * strictly last, and `search` refuses an unmarked index.
  */
object IvfPq {

  private def centroidsDir(d: String) = s"$d/_centroids"
  private def codebooksDir(d: String) = s"$d/_codebooks"
  def codesDir(d: String): String     = s"$d/codes"
  private def commitMarker(d: String) = s"$d/_committed"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def build(
      embeddings: DataFrame,
      indexDir: String,
      nCells: Int = 16,
      refineIters: Int = 2,
      numSub: Int = 8,
      codebookK: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    val fs = fsOf(spark, indexDir)
    fs.delete(new org.apache.hadoop.fs.Path(commitMarker(indexDir)), false)
    // a rebuild re-derives centroids AND codebooks — appended deltas were
    // encoded under the old models, so they die with the marker down
    DeltaBatches.clear(spark, indexDir)
    // centroids materialized ONCE (the AnnIndex rule: a lazily re-evaluated
    // Lloyd plan could round a boundary assignment differently)
    val centPlan = AnnIndex.kmeansCentroids(embeddings, nCells, refineIters)
    val centRows = centPlan.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(centRows.toIndexedSeq, 1), centPlan.schema)
      .write.mode("overwrite").parquet(centroidsDir(indexDir))
    val cb = PqIndex.train(embeddings, numSub, codebookK)
    PqIndex.saveCodebooks(spark, cb, codebooksDir(indexDir))
    // one pass: assign to the PERSISTED centroids, PQ-encode map-side, land
    // partitioned by cell (static overwrite: stale cells must never survive)
    val assigned = AnnIndex.assignTo(embeddings,
      spark.read.parquet(centroidsDir(indexDir)))
    PqIndex.encodeAssigned(assigned, PqIndex.loadCodebooks(spark, codebooksDir(indexDir)))
      .write.mode("overwrite").partitionBy("cell")
      .option("partitionOverwriteMode", "static").parquet(codesDir(indexDir))
    // base id digest lands before the commit marker — a committed index
    // always carries it, so appends never pay an O(index) duplicate scan
    DeltaBatches.writeBaseBloom(spark, indexDir,
      spark.read.parquet(codesDir(indexDir)).select("vec_id"))
    fs.create(new org.apache.hadoop.fs.Path(commitMarker(indexDir)), true).close()
  }

  private def requireCommitted(spark: SparkSession, indexDir: String): Unit =
    require(fsOf(spark, indexDir).exists(new org.apache.hadoop.fs.Path(commitMarker(indexDir))),
      s"IvfPq.search: no commit marker at ${commitMarker(indexDir)} — the index at $indexDir " +
        "is from an incomplete build (centroid/codebook/code writes may disagree); rebuild it")

  /** Incremental append — the [[AnnIndex.append]] protocol lifted to the
    * composed index: the new batch is assigned under the PERSISTED
    * centroids and encoded with the PERSISTED codebooks (both are frozen —
    * that consistency is what keeps probes and ADC lookup tables valid for
    * old and new rows alike), written to `delta/batch=<bid>/cell=N`, and
    * committed by a manifest row AFTER the data is durable. The
    * content-derived batch id makes retried appends overwrite themselves;
    * `build` clears the deltas because it re-derives both models.
    *
    * SINGLE WRITER per indexDir (see [[DeltaBatches]]): concurrent appends
    * could both pass the disjointness guard and commit overlapping ids.
    */
  def append(spark: SparkSession, indexDir: String, newVectors: DataFrame): Long = {
    requireCommitted(spark, indexDir)
    DeltaBatches.requireFormatCurrent(spark, indexDir, "IvfPq.append")
    val stats = DeltaBatches.contentStats(newVectors, "IvfPq.append")
    if (stats.nDistinct < stats.n) DeltaBatches.failInternalDuplicates(newVectors, "IvfPq.append")
    val bid = stats.bid
    val manifest = DeltaBatches.committedManifest(spark, indexDir)
    // replaying an ALREADY-COMMITTED batch (at-least-once retry after a
    // successful commit) is a no-op — that, plus overwrite-on-retry below,
    // is what gives the streaming sink its exactly-once effect
    if (manifest.exists(_.bid == bid)) return bid
    // a vec_id may live in the index once — digest-guarded (O(batch), not
    // O(index)); the exact base+delta scan below is planned ONLY on a
    // digest hit (real duplicate or bloom false positive)
    val batchBloom = DeltaBatches.guardDisjoint(spark, indexDir, newVectors, stats, manifest, {
      val existing = spark.read.parquet(codesDir(indexDir)).select("vec_id")
      DeltaBatches.committedDeltaRows(spark, indexDir, Seq("vec_id"), manifest.map(_.bid))
        .map(existing.unionByName(_)).getOrElse(existing)
    }, "IvfPq.append")
    val assigned = AnnIndex.assignTo(newVectors,
      spark.read.parquet(centroidsDir(indexDir)))
    PqIndex.encodeAssigned(assigned, PqIndex.loadCodebooks(spark, codebooksDir(indexDir)))
      .write.mode("overwrite").partitionBy("cell")
      .option("partitionOverwriteMode", "static")
      .parquet(s"${DeltaBatches.deltaDir(indexDir)}/batch=$bid")
    DeltaBatches.commit(spark, indexDir, bid, stats.n, batchBloom)
    bid
  }

  /** Top-`nprobe` cells for a query vector — nCells driver-side dot
    * products against the persisted centroid table (ties broken by cell).
    */
  def probeCells(spark: SparkSession, indexDir: String, query: Array[Float], nprobe: Int): Seq[Long] = {
    requireCommitted(spark, indexDir)
    spark.read.parquet(centroidsDir(indexDir)).collect()
      .map { r =>
        val cv = r.getSeq[Float](1)
        var s = 0.0; var i = 0
        while (i < cv.length) { s += cv(i).toDouble * query(i); i += 1 }
        (r.getLong(0), s)
      }
      .sortBy { case (c, s) => (-s, c) }.take(nprobe).map(_._1).toSeq
  }

  /** Two-stage probe: partition-pruned ADC over the probed cells' codes,
    * then exact re-rank of the `candidates` survivors against the full
    * vectors. Output: (vec_id, score) — `score` is the exact dot product,
    * rounded like [[AnnIndex.search]] for oracle comparability.
    */
  def search(
      spark: SparkSession,
      indexDir: String,
      embeddings: DataFrame,
      queryVecId: Long,
      nprobe: Int = 4,
      k: Int = 10,
      candidates: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.ensure(spark)
    requireCommitted(spark, indexDir)
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cells = probeCells(spark, indexDir, q, nprobe)
    val cb = PqIndex.loadCodebooks(spark, codebooksDir(indexDir))
    val baseCodes = spark.read.parquet(codesDir(indexDir))
      .where(col("cell").isin(cells: _*)) // partition-pruned scan of 8 B/vec codes
      .select(col("vec_id"), col("cell"), col("codes"))
    val codes = DeltaBatches
      .committedDeltaRows(spark, indexDir, Seq("vec_id", "cell", "codes"))
      .map(d => baseCodes.unionByName(d.where(col("cell").isin(cells: _*))))
      .getOrElse(baseCodes)
    val cand = codes
      .select(col("vec_id"), PqIndex.adcScore(cb, q).as("score_adc"))
      .orderBy(desc("score_adc"), asc("vec_id")).limit(candidates)
      .select(col("vec_id"))
    embeddings.join(broadcast(cand), "vec_id")
      .withColumn("qv", typedLit(q.toSeq))
      .select(col("vec_id"), expr("vec_dot(embedding, qv)").as("score"))
      .orderBy(desc("score"), asc("vec_id")).limit(k)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
  }
}
