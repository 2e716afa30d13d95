package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q211 incremental vector-index maintenance contracts: the maintained
  * code table equals a from-scratch encode of the union through the
  * SAME frozen codebooks (the q152 law applied to vectors), occupancy
  * accounts for every vector exactly once, the PSI readout is finite
  * and zero only where base/new occupancy agrees, and a crash-replayed
  * ingest batch appended through the fenced snapshot sink is a no-op.
  */
class VectorMaintainSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q211 on testdata: maintained == rebuilt (zero mismatches), " +
    "occupancy partitions the corpus, SSE present where batches land") {
    val out = VectorIndexMaintain.maintainQuery(spark, dir).collect()
    assert(out.nonEmpty)
    // the law: no list carries a code mismatch
    out.foreach { r =>
      assert(r.getAs[Long]("n_code_mismatch") === 0L,
        s"list ${r.getAs[Long]("list_id")} diverged from the rebuild")
    }
    val emb = graft.Tables.embeddings(spark, dir)
    val nAll = emb.count()
    val nNew = emb
      .filter(col("vec_id") % VectorIndexMaintain.BatchMod
        === VectorIndexMaintain.BatchMod - 1).count()
    assert(out.map(_.getAs[Long]("n_base")).sum === nAll - nNew)
    assert(out.map(_.getAs[Long]("n_new")).sum === nNew)
    // batch vectors exist, so some list carries reconstruction error
    assert(out.map(_.getAs[Long]("new_sse_micro")).sum > 0L)
    // PSI terms are finite; the smoothed term is 0 only when the
    // base/new shares coincide exactly
    out.foreach { r =>
      val psi = r.getAs[Double]("psi_contrib")
      assert(!psi.isNaN && !psi.isInfinite, s"PSI degenerate: $psi")
    }
  }

  test("fenced ingest: a crash-replayed batch append is a no-op and the " +
    "committed code table equals the maintained one") {
    import graft.stream.Ingest
    val emb = graft.Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % VectorIndexMaintain.BatchMod
      =!= VectorIndexMaintain.BatchMod - 1)
    val batch = emb.filter(col("vec_id") % VectorIndexMaintain.BatchMod
      === VectorIndexMaintain.BatchMod - 1)
    // frozen index state, trained on base only
    val coarse = Similarity.kmeansCentroids(base, IvfPq.NList, iters = 2)
      .localCheckpoint()
    def encode(e: org.apache.spark.sql.DataFrame) = {
      val res = IvfPq.residuals(e, coarse).localCheckpoint()
      val baseEmb = res.select(col("vec_id"), col("res").as("embedding"))
      val subs = ProductQuantization.subspaces(baseEmb).localCheckpoint()
      (res, subs)
    }
    val (resBase, subsBase) = encode(base)
    val codebook = ProductQuantization
      .trainCodebook(resBase.select(col("vec_id"),
        col("res").as("embedding")), subsBase)
      .localCheckpoint()
    def codes(res: org.apache.spark.sql.DataFrame,
              subs: org.apache.spark.sql.DataFrame) =
      ProductQuantization.assign(subs, codebook)
        .select(col("s"), col("vec_id"), col("cid"))
        .join(res.select(col("vec_id"), col("list_id")), "vec_id")
    val baseCodes = codes(resBase, subsBase).localCheckpoint()
    val (resBatch, subsBatch) = encode(batch)
    val batchCodes = codes(resBatch, subsBatch).localCheckpoint()

    val table = java.nio.file.Files
      .createTempDirectory("vec-maintain").toString
    def append(delta: org.apache.spark.sql.DataFrame, epoch: Long): String =
      Ingest.advanceSnapshotFenced(spark, table, epoch,
        delta.limit(0)) { stored => stored.unionByName(delta) }
    val p0 = append(baseCodes, epoch = 0L)   // index build commit
    val p1 = append(batchCodes, epoch = 1L)  // the ingest batch
    // the at-least-once crash case: the same batch re-delivered
    val p1again = append(batchCodes, epoch = 1L)
    assert(p1again === p1, "fenced replay must return the committed path")
    val stored = spark.read.parquet(p1)
    assert(stored.count() ===
      baseCodes.count() + batchCodes.count(),
      s"replay double-appended (p0=$p0)")
    // the committed table IS the maintained table: diff empty both ways
    val maintained = baseCodes.unionByName(batchCodes)
    assert(stored.exceptAll(maintained).count() === 0L)
    assert(maintained.exceptAll(stored).count() === 0L)
  }
}
