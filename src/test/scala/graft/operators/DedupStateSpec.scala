package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted dedup-state contract: batch-vs-state verdicts must equal the
  * from-scratch oracled operator, the probe must never rescan the corpus,
  * crashed builds must be invisible, and a refreshed corpus must
  * invalidate the committed state.
  */
class DedupStateSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("dedup_state").toString

  test("dedupBatch against the persisted state equals q_incremental_dedup exactly") {
    val stateDir = freshDir()
    // state over the corpus MINUS the incoming batch — the q_incremental_dedup split
    val corpusTmp = freshDir()
    Tables.documents(spark, sfDir).where(col("doc_id") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$corpusTmp/documents.parquet")
    assert(DedupState.build(spark, corpusTmp, stateDir))

    val batch = Tables.documents(spark, sfDir).where(col("doc_id") % 10 === 0)
    val got = DedupState.dedupBatch(spark, stateDir, batch)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val expected = graft.SparkEntry.queries("q_incremental_dedup")(spark, sfDir)
      .as[(Long, String)].collect().toSeq
    assert(got == expected, s"state-backed verdicts diverge: ${got.diff(expected).take(3)}")
    assert(got.exists(_._2 == "dup") && got.exists(_._2 == "kept"),
      "degenerate fixture: need both verdicts")
  }

  test("the probe plan reads the state parquet, not the corpus") {
    val stateDir = freshDir()
    assert(DedupState.build(spark, sfDir, stateDir))
    val batch = Tables.documents(spark, sfDir).where(col("doc_id") % 10 === 0)
    val p = DedupState.dedupBatch(spark, stateDir, batch)
      .queryExecution.executedPlan.toString
    assert(p.contains(s"$stateDir/bands"), p.take(3000))
    // every documents.parquet scan belongs to the BATCH input (two batch
    // branches: band derivation + the verdict left-join base) — the corpus
    // side must contribute none, so the count is exactly 2
    val corpusScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents.parquet"))
    assert(corpusScans == 2, s"corpus rescanned: $corpusScans documents scans\n${p.take(3000)}")
  }

  test("second build is a committed no-op; crashed build is invisible and fails fast") {
    val stateDir = freshDir()
    assert(DedupState.build(spark, sfDir, stateDir))
    assert(!DedupState.build(spark, sfDir, stateDir), "committed state rebuilt for identical input")
    // simulate the worst-window crash: data present, marker gone
    Files.delete(Paths.get(stateDir, "_state_done"))
    val batch = Tables.documents(spark, sfDir).limit(5)
    intercept[IllegalStateException] {
      DedupState.dedupBatch(spark, stateDir, batch)
    }
    assert(DedupState.build(spark, sfDir, stateDir), "crashed build not rebuilt")
  }

  test("a refreshed corpus invalidates the committed state") {
    val stateDir = freshDir()
    val corpusTmp = freshDir()
    def writeCorpus(mod: Long) =
      Tables.documents(spark, sfDir).where(col("doc_id") % 10 =!= mod)
        .write.mode("overwrite").parquet(s"$corpusTmp/documents.parquet")
    writeCorpus(0)
    assert(DedupState.build(spark, corpusTmp, stateDir))
    assert(!DedupState.build(spark, corpusTmp, stateDir))
    writeCorpus(1) // refreshed input: different files/lengths/mtimes
    assert(DedupState.build(spark, corpusTmp, stateDir),
      "stale state served for a refreshed corpus")
  }

  test("a decommissioned input resumes from the committed state alone") {
    val stateDir = freshDir()
    val corpusTmp = freshDir()
    Tables.documents(spark, sfDir).where(col("doc_id") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$corpusTmp/documents.parquet")
    assert(DedupState.build(spark, corpusTmp, stateDir))
    // input decommissioned after staging
    def deleteRec(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(c => deleteRec(c))
      Files.delete(p)
    }
    deleteRec(Paths.get(corpusTmp, "documents.parquet"))
    assert(!DedupState.build(spark, corpusTmp, stateDir),
      "committed state not trusted when input is gone")
    val batch = Tables.documents(spark, sfDir).where(col("doc_id") % 10 === 0)
    val rows = DedupState.dedupBatch(spark, stateDir, batch).count()
    assert(rows == batch.count())
  }
}
