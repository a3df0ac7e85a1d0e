package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index for embedding similarity — the production ANN shape
  * (q_ann_ivf shows the one-shot query; this module materializes the index).
  *
  * Build: seed centroids kmeans++-style (deterministic farthest-first over a
  * bounded hash-sample), refine with Lloyd iterations (default 2), assign
  * every vector to its nearest centroid (inner product) and write the
  * assignment partitioned by cell — at 100 TB each cell becomes a parquet
  * partition, so a probe reads only `nprobe/nCells` of the data via
  * partition pruning.
  *
  * Search: score the query against the (tiny, broadcast) centroid set, read
  * only the top-`nprobe` cells, exact-score the candidates, top-k.
  *
  * Durability ordering: the centroid table commits BEFORE the cell data —
  * probes MUST use the exact centroids the cells were assigned under, so a
  * crash mid-build must never leave cells on disk with no (or newer)
  * centroids. A missing centroid table fails fast instead of silently
  * re-deriving seeds that may not match the persisted assignment.
  *
  * Everything is deterministic: hash-ordered sampling, vec_id tie-breaks,
  * and a single materialization of the refined centroids (Lloyd's avg()
  * merges partials in shuffle-fetch order, so re-evaluating the plan could
  * round a boundary assignment differently).
  */
object AnnIndex {

  // Native codegen'd dot (bit-identical to the portable HOF form).
  private def dot(a: String, b: String) = expr(s"vec_dot($a, $b)")

  /** kmeans++-style deterministic seeding: farthest-first traversal over a
    * bounded pseudo-random sample.
    *
    * One distributed pass takes the `sampleSize` vectors with the smallest
    * `xxhash64(vec_id)` (a deterministic "random" sample independent of id
    * order); the greedy then runs driver-side over that ~1 MB sample: start
    * from the sampled vector with the smallest vec_id, repeatedly add the
    * vector whose maximum dot with the chosen set is smallest (the
    * farthest-first rule — kmeans++'s D²-sampling with the argmax instead of
    * a draw, so no RNG). Ties break by vec_id. At 100 TB the sample bound
    * keeps seeding one scan + O(sampleSize × nCells) driver work.
    *
    * `nCells` must not exceed `sampleSize`: the seeds come FROM the sample,
    * so a larger nCells would silently under-cell the index (fewer, fatter
    * partitions than the caller sized probes for). Fail fast naming the
    * knob — raising `sampleSize` is legitimate, it just scales driver
    * memory/CPU with it (the sample is collected). A table with fewer rows
    * than nCells still caps at the row count: an index cannot have more
    * cells than vectors, and nothing was silently lost.
    */
  def seedCentroids(embeddings: DataFrame, nCells: Int, sampleSize: Int = 4096): DataFrame = {
    require(nCells <= sampleSize,
      s"seedCentroids: nCells=$nCells exceeds sampleSize=$sampleSize — seeds are drawn from " +
        "the collected sample, so this would silently build fewer cells than asked; raise " +
        "sampleSize to at least nCells (driver memory scales with it)")
    val spark = embeddings.sparkSession
    val sample = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(sampleSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    require(sample.nonEmpty, "seedCentroids: empty embeddings table")
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val k = math.min(nCells, sample.length)
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head)
    val picked = new Array[Boolean](sample.length) // O(1) membership, not an O(k) buffer scan
    picked(0) = true
    // maxSim(i) = max dot between sample(i) and any chosen seed
    val maxSim = sample.map(v => dotd(v._2, sample.head._2))
    while (chosen.length < k) {
      var best = -1
      var bestSim = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        if (!picked(i) && maxSim(i) < bestSim) {
          bestSim = maxSim(i); best = i
        }
        i += 1
      }
      // best stays -1 only if every candidate similarity is NaN — fail with
      // the cause rather than an index error from sample(-1)
      require(best >= 0,
        "seedCentroids: no selectable seed (NaN similarities — check embeddings for NaN/Inf values)")
      val next = sample(best)
      chosen += next
      picked(best) = true
      var j = 0
      while (j < sample.length) {
        val s = dotd(sample(j)._2, next._2)
        if (s > maxSim(j)) maxSim(j) = s
        j += 1
      }
    }
    val rows = chosen.zipWithIndex.map { case ((_, v), cell) =>
      Row(cell.toLong, v.map(_.toFloat).toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("cvec",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false), false))))
  }

  /** Assignment table (vec_id, cell, embedding) against an explicit centroid
    * table (cell, cvec).
    *
    * Nearest-centroid is a map-side fold over ONE broadcast row carrying the
    * sorted centroid array — max(struct(dot, -cell)) == (dot DESC, cell ASC)
    * argmax — so the assignment stage is shuffle-free (round-1 fix: the
    * crossJoin × row_number-over-Window plan shuffled nCells× the table).
    */
  def assignTo(embeddings: DataFrame, cent: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensure(embeddings.sparkSession)
    val centArr = cent.agg(sort_array(collect_list(struct(col("cell"), col("cvec")))).as("cents"))
    embeddings.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        "array_max(transform(cents, c -> named_struct('d', vec_dot(embedding, c.cvec), 'ncell', -c.cell)))"))
      .select(col("vec_id"), (-col("best.ncell")).as("cell"), col("embedding"))
  }

  /** Assignment under the default first-`nCells` seed rule. */
  def assign(embeddings: DataFrame, nCells: Int): DataFrame =
    assignTo(embeddings,
      embeddings.where(col("vec_id") < nCells)
        .select(col("vec_id").as("cell"), col("embedding").as("cvec")))

  /** One Lloyd step: element-wise mean of each cell's members becomes the
    * new centroid. Distributed via posexplode to (cell, dim) keyed rows —
    * partial aggregation combines map-side, so the shuffle carries at most
    * nCells × dim partial sums per task regardless of table size. Index
    * build is an offline job; this is its only shuffle. A cell that loses
    * all members keeps its previous centroid (left join + coalesce), so the
    * cell count never silently shrinks between iterations.
    */
  def lloydStep(embeddings: DataFrame, cent: DataFrame): DataFrame = {
    val means = assignTo(embeddings, cent)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(named_struct('dim', dim, 'm', m)))," +
        " x -> cast(x.m as float))").as("mvec"))
    cent.select(col("cell"), col("cvec"))
      .join(means, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("mvec"), col("cvec")).as("cvec"))
  }

  /** Farthest-first seeds refined by `iters` Lloyd steps. */
  def kmeansCentroids(embeddings: DataFrame, nCells: Int, iters: Int): DataFrame =
    (1 to iters).foldLeft(seedCentroids(embeddings, nCells))((c, _) => lloydStep(embeddings, c))

  private def centroidsDir(indexDir: String) = s"$indexDir/_centroids"
  def cellsDir(indexDir: String): String     = s"$indexDir/cells"
  private def commitMarker(indexDir: String) = s"$indexDir/_committed"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build and persist: `indexDir/_centroids` (the tiny centroid table),
    * `indexDir/cells` (the assignment, partitioned by cell — partition
    * pruning = probe), and a `_committed` marker written LAST. The marker is
    * deleted before any write starts, so a crash at ANY point mid-build —
    * including between the centroid and cell writes, which would otherwise
    * leave cells pruned under centroids they weren't assigned under — leaves
    * an index that `search` refuses with a clear error instead of silently
    * losing recall.
    */
  def build(embeddings: DataFrame, indexDir: String, nCells: Int = 16,
      refineIters: Int = 2): Unit = {
    val spark = embeddings.sparkSession
    val fs = fsOf(spark, indexDir)
    fs.delete(new org.apache.hadoop.fs.Path(commitMarker(indexDir)), false)
    // a rebuild changes the centroids, so every appended delta batch was
    // assigned under stale centroids — drop them with the marker down
    DeltaBatches.clear(spark, indexDir)
    // Materialize the centroids ONCE (nCells rows): Lloyd's avg() merges
    // partial sums in shuffle-fetch order, so two lazy evaluations of the
    // same plan could round a boundary assignment differently — the cells
    // on disk MUST be assigned under exactly the persisted centroids.
    val centPlan = kmeansCentroids(embeddings, nCells, refineIters)
    val centRows = centPlan.collect()
    val cent = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows.toIndexedSeq, 1), centPlan.schema)
    cent.write.mode("overwrite").parquet(centroidsDir(indexDir))
    // STATIC overwrite pinned per-write: a rebuild with fewer cells must
    // wipe the whole cells/ tree. Under an (inherited) dynamic mode, stale
    // cell=N partitions from a previous larger index would survive with the
    // fresh _committed marker, and probes would read vectors assigned under
    // the old centroids.
    assignTo(embeddings, spark.read.parquet(centroidsDir(indexDir)))
      .write.mode("overwrite").partitionBy("cell")
      .option("partitionOverwriteMode", "static").parquet(cellsDir(indexDir))
    // base id digest lands before the commit marker — a committed index
    // always carries it, so appends never pay an O(index) duplicate scan
    DeltaBatches.writeBaseBloom(spark, indexDir,
      spark.read.parquet(cellsDir(indexDir)).select("vec_id"))
    fs.create(new org.apache.hadoop.fs.Path(commitMarker(indexDir)), true).close()
  }

  /** Append a batch of new vectors to a COMMITTED index without rebuilding
    * — daily index maintenance (the ANN analog of `q_incremental_dedup`):
    * new vectors are assigned under the index's EXISTING persisted
    * centroids (consistency with the base cells is what makes the probe
    * stay correct), written to `delta/batch=<bid>/cell=N`, and committed by
    * appending the batch id to the `_batches` manifest AFTER the data is
    * durable.
    *
    * `bid` derives deterministically from the batch's content — id AND
    * embedding payload, via the two-fold hash in [[DeltaBatches.contentStats]]
    * — so a crashed-and-retried append
    * OVERWRITES its own batch directory instead of duplicating rows, and a
    * batch dir with no manifest row is invisible to `search`. Rebuilding
    * the base index (`build`) invalidates deltas by centroid change, so it
    * clears `delta/` and the manifest first.
    *
    * SINGLE WRITER per indexDir (see [[DeltaBatches]]): concurrent appends
    * could both pass the disjointness guard and commit overlapping ids.
    */
  def append(spark: SparkSession, indexDir: String, newVectors: DataFrame): Long = {
    require(fsOf(spark, indexDir).exists(new org.apache.hadoop.fs.Path(commitMarker(indexDir))),
      s"AnnIndex.append: no commit marker at ${commitMarker(indexDir)} — append requires a " +
        "complete base index (new vectors must be assigned under its persisted centroids)")
    DeltaBatches.requireFormatCurrent(spark, indexDir, "AnnIndex.append")
    val stats = DeltaBatches.contentStats(newVectors, "AnnIndex.append")
    if (stats.nDistinct < stats.n) DeltaBatches.failInternalDuplicates(newVectors, "AnnIndex.append")
    val bid = stats.bid
    val manifest = DeltaBatches.committedManifest(spark, indexDir) // read ONCE, reused below
    // replaying an ALREADY-COMMITTED batch (at-least-once retry after a
    // successful commit) is a no-op — that, plus overwrite-on-retry below,
    // is what gives the streaming sink its exactly-once effect
    if (manifest.exists(_.bid == bid)) return bid
    // a vec_id may live in the index once — digest-guarded (O(batch), not
    // O(index)); the exact base+delta scan below is planned ONLY on a
    // digest hit (real duplicate or bloom false positive)
    val batchBloom = DeltaBatches.guardDisjoint(spark, indexDir, newVectors, stats, manifest, {
      val existing = spark.read.parquet(cellsDir(indexDir)).select("vec_id")
      DeltaBatches.committedDeltaRows(spark, indexDir, Seq("vec_id"), manifest.map(_.bid))
        .map(existing.unionByName(_)).getOrElse(existing)
    }, "AnnIndex.append")
    val cent = spark.read.parquet(centroidsDir(indexDir))
    assignTo(newVectors, cent)
      .write.mode("overwrite").partitionBy("cell")
      .option("partitionOverwriteMode", "static")
      .parquet(s"${DeltaBatches.deltaDir(indexDir)}/batch=$bid")
    // the manifest append IS the batch's commit marker; it carries the
    // batch's id digest, so digest and commit are atomic
    DeltaBatches.commit(spark, indexDir, bid, stats.n, batchBloom)
    bid
  }

  /** Probe the persisted index: only `nprobe` cell partitions are scanned
    * — in the base cells AND in every committed appended batch (uncommitted
    * batch dirs are excluded by the manifest filter, so a crashed append is
    * invisible). Probes use the centroid table persisted with the index; a
    * missing commit marker means a build died mid-write and fails fast —
    * silently probing cells under re-derived or mismatched centroids could
    * prune the wrong cells and lose recall.
    */
  def search(spark: SparkSession, indexDir: String, embeddings: DataFrame,
      queryVecId: Long, nprobe: Int = 4, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.ensure(spark)
    val q = embeddings.where(col("vec_id") === queryVecId).select(col("embedding").as("qvec"))
    require(fsOf(spark, indexDir).exists(new org.apache.hadoop.fs.Path(commitMarker(indexDir))),
      s"AnnIndex.search: no commit marker at ${commitMarker(indexDir)} — the index at " +
        s"$indexDir is from an incomplete build (centroid/cell writes may disagree); rebuild it")
    val cent = spark.read.parquet(centroidsDir(indexDir))
    val probeCells = cent.crossJoin(broadcast(q))
      .withColumn("qdot", dot("cvec", "qvec"))
      .orderBy(desc("qdot"), asc("cell")).limit(nprobe)
      .select(col("cell")).collect().map(_.getLong(0))
    val base = spark.read.parquet(cellsDir(indexDir))
      .where(col("cell").isin(probeCells.toIndexedSeq: _*)) // partition-pruned scan
      .select(col("vec_id"), col("cell"), col("embedding"))
    val candidates = DeltaBatches
      .committedDeltaRows(spark, indexDir, Seq("vec_id", "cell", "embedding"))
      .map(d => base.unionByName(
        d.where(col("cell").isin(probeCells.toIndexedSeq: _*)))) // same pruning
      .getOrElse(base)
    candidates
      .crossJoin(broadcast(q))
      .withColumn("score_exact", dot("embedding", "qvec"))
      .orderBy(desc("score_exact"), asc("vec_id")).limit(k)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        round(col("score_exact"), 4).as("score"))
  }

  /** Exact brute-force top-k (recall baseline). */
  def bruteForce(embeddings: DataFrame, queryVecId: Long, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.ensure(embeddings.sparkSession)
    val q = embeddings.where(col("vec_id") === queryVecId).select(col("embedding").as("qvec"))
    embeddings.crossJoin(broadcast(q))
      .withColumn("score_exact", dot("embedding", "qvec"))
      .orderBy(desc("score_exact"), asc("vec_id")).limit(k)
      .select(col("vec_id"), round(col("score_exact"), 4).as("score"))
  }
}
