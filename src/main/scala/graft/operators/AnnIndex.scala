package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index for embedding similarity — the production ANN shape
  * (q_ann_ivf shows the one-shot query; this module materializes the index).
  *
  * Build: assign every vector to its nearest centroid (inner product) and
  * write the assignment partitioned by cell — at 100 TB each cell becomes a
  * parquet partition, so a probe reads only `nprobe/nCells` of the data via
  * partition pruning.
  *
  * Search: score the query against the (tiny, broadcast) centroid set, read
  * only the top-`nprobe` cells, exact-score the candidates, top-k.
  *
  * Deterministic: centroids = the first `nCells` vectors; ties broken by id.
  */
object AnnIndex {

  // Native codegen'd dot (bit-identical to the portable HOF form).
  private def dot(a: String, b: String) = expr(s"vec_dot($a, $b)")

  def centroids(embeddings: DataFrame, nCells: Int): DataFrame =
    embeddings.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))

  /** Assignment table (vec_id, cell, embedding).
    *
    * Nearest-centroid is a map-side fold over ONE broadcast row carrying the
    * sorted centroid array — max(struct(dot, -cell)) == (dot DESC, cell ASC)
    * argmax — so the assignment stage is shuffle-free (round-1 fix: the
    * crossJoin × row_number-over-Window plan shuffled nCells× the table).
    */
  def assign(embeddings: DataFrame, nCells: Int): DataFrame =
    assignTo(embeddings, centroids(embeddings, nCells))

  /** Same, against an explicit centroid table (cell, cvec). */
  def assignTo(embeddings: DataFrame, cent: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensure(embeddings.sparkSession)
    val centArr = cent.agg(sort_array(collect_list(struct(col("cell"), col("cvec")))).as("cents"))
    embeddings.crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        "array_max(transform(cents, c -> named_struct('d', vec_dot(embedding, c.cvec), 'ncell', -c.cell)))"))
      .select(col("vec_id"), (-col("best.ncell")).as("cell"), col("embedding"))
  }

  /** One Lloyd step: element-wise mean of each cell's members becomes the
    * new centroid. Distributed via posexplode to (cell, dim) keyed rows —
    * partial aggregation combines map-side, so the shuffle carries at most
    * nCells × dim partial sums per task regardless of table size. Index
    * build is an offline job; this is its only shuffle.
    */
  def lloydStep(embeddings: DataFrame, cent: DataFrame): DataFrame =
    assignTo(embeddings, cent)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim")).agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(named_struct('dim', dim, 'm', m)))," +
        " x -> cast(x.m as float))").as("cvec"))

  /** Seeded with the first `nCells` vectors, refined by `iters` Lloyd steps. */
  def kmeansCentroids(embeddings: DataFrame, nCells: Int, iters: Int): DataFrame =
    (1 to iters).foldLeft(centroids(embeddings, nCells))((c, _) => lloydStep(embeddings, c))

  private def centroidsDir(indexDir: String) = s"$indexDir/_centroids"

  /** Build and persist, partitioned by cell (partition pruning = probe).
    * The centroid table ships WITH the index (underscore-prefixed dir, so
    * parquet readers of the cells skip it) — probes must use the exact
    * centroids the cells were assigned under, not a re-derivation.
    */
  def build(embeddings: DataFrame, indexDir: String, nCells: Int = 16,
      refineIters: Int = 0): Unit = {
    val spark = embeddings.sparkSession
    // Materialize the centroids ONCE (nCells rows): Lloyd's avg() merges
    // partial sums in shuffle-fetch order, so two lazy evaluations of the
    // same plan could round a boundary assignment differently — the cells
    // on disk MUST be assigned under exactly the persisted centroids.
    val centPlan = kmeansCentroids(embeddings, nCells, refineIters)
    val centRows = centPlan.collect()
    val cent = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows.toIndexedSeq, 1), centPlan.schema)
    assignTo(embeddings, cent)
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    cent.write.mode("overwrite").parquet(centroidsDir(indexDir))
  }

  /** Probe the persisted index: only `nprobe` cell partitions are scanned.
    * Probes use the centroid table persisted with the index; indexes written
    * before centroids were persisted fall back to the deterministic
    * first-`nCells` derivation (which is what built them).
    */
  def search(spark: SparkSession, indexDir: String, embeddings: DataFrame,
      queryVecId: Long, nCells: Int = 16, nprobe: Int = 4, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.ensure(spark)
    val q = embeddings.where(col("vec_id") === queryVecId).select(col("embedding").as("qvec"))
    val centPath = new org.apache.hadoop.fs.Path(centroidsDir(indexDir))
    val fs = centPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cent =
      if (fs.exists(centPath)) spark.read.parquet(centroidsDir(indexDir))
      else centroids(embeddings, nCells)
    val probeCells = cent.crossJoin(broadcast(q))
      .withColumn("qdot", dot("cvec", "qvec"))
      .orderBy(desc("qdot"), asc("cell")).limit(nprobe)
      .select(col("cell")).collect().map(_.getLong(0))
    spark.read.parquet(indexDir)
      .where(col("cell").isin(probeCells: _*)) // partition-pruned scan
      .crossJoin(broadcast(q))
      .withColumn("score_exact", dot("embedding", "qvec"))
      .orderBy(desc("score_exact"), asc("vec_id")).limit(k)
      .select(col("vec_id"), col("cell"), round(col("score_exact"), 4).as("score"))
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
