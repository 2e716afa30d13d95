package graft.similarity

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType,
  IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables

/** INCREMENTAL maintenance of the IVF-PQ vector index — the q152 IVM
  * law applied to vectors. Production ANN indexes are never retrained
  * per ingest (FAISS's add-after-train contract; Jégou et al.
  * TPAMI'11 train once on a sample): a new embedding batch ASSIGNS to
  * the EXISTING coarse centroids and PQ codebooks — pure broadcast
  * scoring, the q37/q206 assign stages reused verbatim with zero Lloyd
  * rounds — and the maintained code table is the stored base codes
  * plus the appended batch codes. The retrain decision is driven by a
  * DRIFT readout: the q156 PSI shape over coarse-list occupancy (base
  * distribution vs the new batch's), plus the batch's reconstruction
  * error through the frozen codebooks — when either degrades, you
  * retrain; until then, ingest is assignment-only.
  *
  * The maintenance LAW (what the oracle gates): the maintained code
  * table must equal a from-scratch encode of the union corpus through
  * the SAME codebooks — assignment is per-vector, so append-only
  * maintenance is exact, and `n_code_mismatch` must be 0 on every
  * list. The engine computes the two sides as genuinely different
  * plans (stored-union vs re-encode-all) and diffs them; a drifted
  * broadcast, a stale codebook, or a torn append all surface here.
  *
  * Exactness discipline: occupancy and mismatch counts are integers;
  * the batch's reconstruction error is the q206 micro-unit integer
  * sum (order-free); the PSI contribution is the q156 Laplace-smoothed
  * form rounded at 6 dp, replayed by the oracle through the
  * VARCHAR→DECIMAL(30,12) round-trip.
  *
  * 100 TB shape: the only work per ingest batch is |batch| broadcast
  * scorings (coarse cosine + M·K ADC assigns) and a batch-sized
  * append — the base corpus is NOT re-read (the verification re-encode
  * exists for the gate; production appends through the fenced snapshot
  * sink, [[graft.stream.Ingest.advanceSnapshotFenced]] — the replay
  * spec proves a redelivered batch is a no-op, see
  * VectorMaintainSpec). Occupancy/PSI state is nlist rows.
  */
object VectorIndexMaintain {

  /** vec_id % BatchMod == BatchMod−1 is the "new ingest batch" (~20%);
    * the rest is the base corpus the index was trained on.
    */
  val BatchMod = 5L

  /** q211: maintain the IVF-PQ index through one ingest batch — per
    * coarse list: base/new occupancy, the new batch's reconstruction
    * error through the FROZEN codebooks, the maintained-vs-rebuilt
    * mismatch count (the law: all 0), and the PSI drift contribution.
    */
  def maintainQuery(s: SparkSession, dir: String): DataFrame =
    maintain(Tables.embeddings(s, dir))

  def maintain(emb: DataFrame): DataFrame = {
    val base = emb.filter(col("vec_id") % BatchMod =!= BatchMod - 1)
    val batch = emb.filter(col("vec_id") % BatchMod === BatchMod - 1)

    // ---- index build time: codebooks trained ONCE, on base only ----
    val coarse = Similarity.kmeansCentroids(base, IvfPq.NList, iters = 2)
      .localCheckpoint()
    // the three residual encodes (base / batch / union-verification) all
    // depend on `coarse` only — overlap them with the PQ training chain
    // (guide §2.6) instead of serializing three broadcast-scoring passes
    // behind it
    val ((resBase, subsBase, codebook), resBatch, resAll) =
      graft.tools.Overlap.par3(
      {
        val resBase = IvfPq.residuals(base, coarse).localCheckpoint()
        val baseEmb = resBase.select(col("vec_id"),
          col("res").as("embedding"))
        val subsBase = ProductQuantization.subspaces(baseEmb)
          .localCheckpoint()
        val codebook = ProductQuantization.trainCodebook(baseEmb, subsBase)
          .localCheckpoint()
        (resBase, subsBase, codebook)
      },
      IvfPq.residuals(batch, coarse).localCheckpoint(),
      IvfPq.residuals(emb, coarse).localCheckpoint())
    // the three PQ assigns (base codes / batch ingest / the law's
    // from-scratch union re-encode) depend only on the frozen codebook
    // and their own residuals — one more §2.6 overlap, so the final
    // compose execution does id-keyed joins only instead of re-running
    // two full broadcast-scoring passes inline
    val (baseCodes, batchAssigned, rebuilt) = graft.tools.Overlap.par3(
      ProductQuantization.assign(subsBase, codebook)
        .select(col("s"), col("vec_id"), col("cid"))
        .join(resBase.select(col("vec_id"), col("list_id")), "vec_id")
        .localCheckpoint(),
      // ---- ingest time: the batch ONLY flows through assign stages ----
      ProductQuantization.assign(
          ProductQuantization.subspaces(
            resBatch.select(col("vec_id"), col("res").as("embedding"))),
          codebook)
        .join(resBatch.select(col("vec_id"), col("list_id")), "vec_id")
        .localCheckpoint(),
      // ---- the law: maintained ≡ from-scratch encode of the union ----
      ProductQuantization.assign(
          ProductQuantization.subspaces(
            resAll.select(col("vec_id"), col("res").as("embedding"))),
          codebook)
        .select(col("s"), col("vec_id"), col("cid"))
        .join(resAll.select(col("vec_id"), col("list_id")), "vec_id")
        .localCheckpoint())
    val maintained = baseCodes.unionByName(
      batchAssigned.select(col("s"), col("vec_id"), col("cid"),
        col("list_id")))
    val mismatch = maintained
      .select(col("vec_id"), col("s"), col("cid").as("m_cid"),
        col("list_id").as("m_list"))
      .join(rebuilt.select(col("vec_id"), col("s"), col("cid").as("r_cid"),
        col("list_id").as("r_list")), Seq("vec_id", "s"), "full_outer")
      .filter(col("m_cid").isNull || col("r_cid").isNull
        || col("m_cid") =!= col("r_cid") || col("m_list") =!= col("r_list"))
      .groupBy(coalesce(col("m_list"), col("r_list")).as("list_id"))
      .agg(count(lit(1)).as("n_code_mismatch"))

    // ---- drift readout: occupancy, batch SSE, PSI ----
    val occBase = resBase.groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_base"))
    val occNew = resBatch.groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_new"))
    val sseNew = batchAssigned
      .groupBy(col("list_id"))
      .agg(sum(round(col("d2") * 1e6, 0).cast("long")).as("new_sse_micro"))
    val lists = coarse.select(col("centroid_id").as("list_id"))
    val occ = lists
      .join(occBase, Seq("list_id"), "left")
      .join(occNew, Seq("list_id"), "left")
      .join(sseNew, Seq("list_id"), "left")
      .join(mismatch, Seq("list_id"), "left")
      .select(col("list_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("new_sse_micro"), lit(0L)).as("new_sse_micro"),
        coalesce(col("n_code_mismatch"), lit(0L)).as("n_code_mismatch"))
    val tot = occ.agg(sum(col("n_base")).as("t_base"),
      sum(col("n_new")).as("t_new"), count(lit(1)).as("n_lists"))
    // the q156 Laplace-smoothed PSI term per list: empty cells get the
    // +1 floor so the log never sees a zero
    val pb = (col("n_base") + 1).cast("double") /
      (col("t_base") + col("n_lists")).cast("double")
    val pn = (col("n_new") + 1).cast("double") /
      (col("t_new") + col("n_lists")).cast("double")
    occ.crossJoin(broadcast(tot)) // one-row scalar attach
      .select(col("list_id"), col("n_base"), col("n_new"),
        col("new_sse_micro"), col("n_code_mismatch"),
        round((pb - pn) * log(pb / pn), 6).as("psi_contrib"))
      .orderBy(col("list_id"))
  }

  // ---------------------------------------------------------------------
  // PERSISTED index state + the STREAMING leg. The IVF-PQ index a
  // deployment serves is three stored tables — coarse centroids, the
  // shared residual codebook, and the code table — packed into ONE
  // kind-tagged parquet snapshot so the fenced commit protocol advances
  // them ATOMICALLY (a code append can never land without the codebooks
  // that define it). Element types are preserved exactly (centroids
  // array<float>, codebook array<double>), so the round-trip through
  // parquet is bit-identical and the maintenance law keeps holding
  // across restarts.
  // ---------------------------------------------------------------------

  /** kind ∈ coarse | cb | code; each kind populates its own columns. */
  val IndexStateSchema: StructType = StructType(Seq(
    StructField("kind", StringType), StructField("vec_id", LongType),
    StructField("s", IntegerType), StructField("cid", LongType),
    StructField("list_id", LongType),
    StructField("vecf", ArrayType(FloatType)),
    StructField("vecd", ArrayType(DoubleType))))

  def emptyIndexState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row], IndexStateSchema)

  def packIndexState(coarse: DataFrame, codebook: DataFrame,
      codes: DataFrame): DataFrame = {
    def nlL = lit(null).cast("long")
    def nlI = lit(null).cast("int")
    def nlF = lit(null).cast("array<float>")
    def nlD = lit(null).cast("array<double>")
    coarse.select(lit("coarse").as("kind"), nlL.as("vec_id"), nlI.as("s"),
        nlL.as("cid"), col("centroid_id").cast("long").as("list_id"),
        col("centroid").cast("array<float>").as("vecf"), nlD.as("vecd"))
      .unionByName(codebook.select(lit("cb").as("kind"), nlL.as("vec_id"),
        col("s").cast("int").as("s"), col("cid").cast("long").as("cid"),
        nlL.as("list_id"), nlF.as("vecf"),
        col("c").cast("array<double>").as("vecd")))
      .unionByName(codes.select(lit("code").as("kind"),
        col("vec_id").cast("long").as("vec_id"),
        col("s").cast("int").as("s"), col("cid").cast("long").as("cid"),
        col("list_id").cast("long").as("list_id"), nlF.as("vecf"),
        nlD.as("vecd")))
  }

  def coarseOf(state: DataFrame): DataFrame =
    state.filter(col("kind") === "coarse")
      .select(col("list_id").as("centroid_id"), col("vecf").as("centroid"))
  def codebookOf(state: DataFrame): DataFrame =
    state.filter(col("kind") === "cb")
      .select(col("s"), col("cid"), col("vecd").as("c"))
  def codesOf(state: DataFrame): DataFrame =
    state.filter(col("kind") === "code")
      .select(col("s"), col("vec_id"), col("cid"), col("list_id"))

  /** Encode a vector batch through FROZEN index state — the
    * assignment-only ingest path (zero Lloyd rounds): coarse residual,
    * subspace split, broadcast argmin per subspace.
    */
  def encodeBatch(batch: DataFrame, coarse: DataFrame,
      codebook: DataFrame): DataFrame = {
    val res = IvfPq.residuals(batch, coarse).localCheckpoint()
    ProductQuantization.assign(
        ProductQuantization.subspaces(
          res.select(col("vec_id"), col("res").as("embedding"))),
        codebook)
      .select(col("s"), col("vec_id"), col("cid"))
      .join(res.select(col("vec_id"), col("list_id")), "vec_id")
  }

  /** One state transition of the CONTINUOUS index: the FIRST batch
    * trains the index (FAISS's train-then-add contract — coarse Lloyd +
    * residual-PQ Lloyd, [[IvfPq.buildIndex]]); every later batch flows
    * through [[encodeBatch]] only and appends its codes. The codebooks
    * are FROZEN after batch one — the retrain decision is an offline
    * call driven by [[maintain]]'s PSI/SSE drift readout, never an
    * in-stream side effect.
    */
  def nextIndexState(state: DataFrame, batch: DataFrame): DataFrame =
    if (state.isEmpty) {
      val idx = IvfPq.buildIndex(batch)
      packIndexState(idx.coarse, idx.codebook,
        idx.codes.select(col("s"), col("vec_id"), col("cid"),
          col("list_id")))
    } else {
      val coarse = coarseOf(state).localCheckpoint()
      val cb = codebookOf(state).localCheckpoint()
      packIndexState(coarse, cb,
        codesOf(state).unionByName(encodeBatch(batch, coarse, cb)))
    }

  /** DELETION transition of the continuous index — the erasure half
    * of FAISS's `remove_ids` contract: drop the deleted vec_ids' code
    * rows, nothing else. Assignment is per-vector (each code depends
    * only on its own vector and the frozen codebooks), so removing a
    * vector cannot change any surviving code — the transition is one
    * anti-join, and the coarse/cb rows pass through untouched (their
    * vec_id is null, which never matches the join key). Codebooks stay
    * frozen: shrinking lists skew the occupancy PSI, and THAT readout
    * (not the delete) drives the offline retrain call, exactly as on
    * the insert path. With [[nextIndexState]] this closes the index
    * CRUD contract: insert = nextIndexState, delete = this, update =
    * deleteIndexState ∘ nextIndexState.
    *
    * Law (same gate as inserts): [[reencodeDiff]] of the new state vs
    * the SURVIVING vectors stays empty — VectorMaintainSpec proves it,
    * including for deletes interleaved between appends.
    */
  def deleteIndexState(state: DataFrame, delIds: DataFrame): DataFrame =
    state.join(delIds.select(col("vec_id").cast("long").as("vec_id")),
      Seq("vec_id"), "left_anti")

  /** The STREAMING leg of the maintained vector index — the
    * [[graft.etl.Ivm.maintainStream]] composition applied to IVF-PQ: a
    * stream of embedding batches drains through foreachBatch into the
    * FENCED snapshot chain, each micro-batch advancing the packed state
    * through [[nextIndexState]] exactly once under at-least-once
    * redelivery (code appends are NOT idempotent — a replayed batch
    * would duplicate its rows — so the batchId rides the manifest's
    * atomic PUT as the fencing epoch). The INVARIANT after every
    * commit is the q211 law: the state's code table equals a
    * from-scratch encode of every ingested vector through the state's
    * own frozen codebooks ([[reencodeDiff]] empty —
    * VectorMaintainSpec proves it per batch; the fuzz family per
    * seeded split).
    *
    * Contract (inherited from the fence): one writer, one checkpoint
    * lineage per table. Returns the latest committed snapshot path.
    */
  def maintainStream(emb: DataFrame, tablePath: String,
      checkpoint: String): Option[String] = {
    val spark = emb.sparkSession
    val q = emb.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
          graft.stream.Ingest.advanceSnapshotFenced(spark, tablePath, id,
            emptyIndexState(spark)) { st => nextIndexState(st, batch.toDF()) }
          ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.stream.Ingest.latestSnapshotPath(spark, tablePath)
  }

  /** The STREAMING CRUD leg — the dedup-index
    * [[graft.dedup.DedupMaintain.maintainStreamCrud]] composition
    * applied to the vector index: op-tagged batches (`op` ∈ insert |
    * delete; deletes need only `vec_id`), one fenced advance per batch
    * applying DELETES first then INSERTS ([[deleteIndexState]] ∘
    * [[nextIndexState]]), so an UPDATE (re-embedded document) is one
    * batch's delete(old)+insert(new vector). Deletes are a pure
    * anti-join (codes are per-vector, codebooks frozen) and so ARE
    * idempotent — but the insert half is not (appending twice
    * duplicates codes), so the fence stays load-bearing for the
    * composition. If the FIRST batch mixes ops, training sees only its
    * insert rows (delete-of-nothing is a no-op on empty state).
    *
    * Law per commit (spec-proven): [[reencodeDiff]] of the state vs
    * (inserts so far ∖ deletes so far) stays empty, and codebooks are
    * bit-identical across assign-only commits.
    */
  def maintainStreamCrud(ops: DataFrame, tablePath: String,
      checkpoint: String): Option[String] = {
    val spark = ops.sparkSession
    val q = ops.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
          val b = batch.toDF().localCheckpoint()
          graft.stream.Ingest.advanceSnapshotFenced(spark, tablePath, id,
            emptyIndexState(spark)) { st =>
            val dels = b.filter(col("op") === "delete").select(col("vec_id"))
            val ins = b.filter(col("op") === "insert")
              .select(col("vec_id"), col("embedding"))
            val deleted = deleteIndexState(st, dels)
            // a delete-only batch on still-untrained state must no-op:
            // advancing through nextIndexState would train k-means on an
            // EMPTY insert slice and kill the stream
            if (ins.isEmpty && deleted.isEmpty) deleted
            else nextIndexState(deleted, ins)
          }
          ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.stream.Ingest.latestSnapshotPath(spark, tablePath)
  }

  /** The maintenance law as a queryable diff: rows where the state's
    * code table disagrees with a from-scratch re-encode of `emb`
    * (which must be exactly the vectors ingested so far) through the
    * state's OWN codebooks. Empty ⟺ the law holds.
    */
  def reencodeDiff(state: DataFrame, emb: DataFrame): DataFrame = {
    val coarse = coarseOf(state).localCheckpoint()
    val rebuilt = encodeBatch(emb, coarse, codebookOf(state))
    codesOf(state)
      .select(col("vec_id"), col("s"), col("cid").as("m_cid"),
        col("list_id").as("m_list"))
      .join(rebuilt.select(col("vec_id"), col("s"), col("cid").as("r_cid"),
        col("list_id").as("r_list")), Seq("vec_id", "s"), "full_outer")
      .filter(col("m_cid").isNull || col("r_cid").isNull
        || col("m_cid") =!= col("r_cid") || col("m_list") =!= col("r_list"))
  }
}
