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

  test("streaming index maintenance: batch 1 TRAINS (train-then-add), " +
    "later batches assign-only append; after every drain the state's " +
    "code table re-encodes exactly through its own frozen codebooks") {
    import VectorIndexMaintain._
    val root = java.nio.file.Files
      .createTempDirectory("vec-stream").toString
    val in = s"$root/in"; val table = s"$root/state"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val sch = "vec_id LONG, embedding ARRAY<FLOAT>"
    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // land one json file atomically in the watched dir (json floats
      // round-trip: shortest-repr write, FLOAT schema read — and the
      // law below re-reads the SAME files, so ingested ≡ re-encoded)
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
        .get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(in, s"$name.json"))
    }
    def drain(): String = {
      val emb = spark.readStream.schema(sch).json(in)
      maintainStream(emb, table, ckpt)
        .getOrElse(sys.error("no committed snapshot"))
    }
    val all = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(col("vec_id") % BatchMod =!= BatchMod - 1)
    val batch = all.filter(col("vec_id") % BatchMod === BatchMod - 1)
    def ingested() = spark.read.schema(sch).json(in)

    drop("b1", base)
    val v1 = drain()
    val st1 = spark.read.schema(IndexStateSchema).parquet(v1)
    assert(reencodeDiff(st1, ingested()).isEmpty,
      "law violated after the training batch")
    assert(codesOf(st1).select(col("vec_id")).distinct().count()
      === ingested().count())

    drop("b2", batch)
    val v2 = drain()
    val st2 = spark.read.schema(IndexStateSchema).parquet(v2)
    assert(reencodeDiff(st2, ingested()).isEmpty,
      "law violated after the assign-only batch")
    // train-then-add: the codebooks are FROZEN — batch 2 must not have
    // touched them (bit-identical coarse + PQ tables across commits)
    assert(coarseOf(st2).exceptAll(coarseOf(st1)).isEmpty
      && coarseOf(st1).exceptAll(coarseOf(st2)).isEmpty,
      "coarse centroids drifted on an assign-only batch")
    assert(codebookOf(st2).exceptAll(codebookOf(st1)).isEmpty
      && codebookOf(st1).exceptAll(codebookOf(st2)).isEmpty,
      "PQ codebook drifted on an assign-only batch")
    // the appended rows are exactly the second batch's encodes
    assert(codesOf(st2).count()
      === codesOf(st1).count() + batch.count() * ProductQuantization.M)

    // exactly-once: nothing new → state content unchanged
    val v3 = drain()
    val st3 = spark.read.schema(IndexStateSchema).parquet(v3)
    assert(codesOf(st3).exceptAll(codesOf(st2)).isEmpty
      && codesOf(st2).exceptAll(codesOf(st3)).isEmpty,
      "an empty drain changed the code table")
  }

  test("streaming CRUD index maintenance: op-tagged batches (deletes " +
    "applied before inserts) drain through the fenced chain — after " +
    "every commit the state re-encodes exactly over inserts-so-far " +
    "minus deletes-so-far, codebooks frozen, in-batch update included") {
    import VectorIndexMaintain._
    val root = java.nio.file.Files
      .createTempDirectory("vec-crud-stream").toString
    val in = s"$root/in"; val table = s"$root/state"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val sch = "op STRING, vec_id LONG, embedding ARRAY<FLOAT>"
    def drop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
        .get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(in, s"$name.json"))
    }
    def drain(): String = {
      val ops = spark.readStream.schema(sch).json(in)
      maintainStreamCrud(ops, table, ckpt)
        .getOrElse(sys.error("no committed snapshot"))
    }
    // test-side replay of the op stream (batch files in drain order,
    // deletes-before-inserts within each): the law's survivor frame
    // re-reads the SAME json files, so floats are bit-identical
    def survivors(): org.apache.spark.sql.DataFrame =
      new java.io.File(in).listFiles().map(_.getName).sorted
        .map(f => spark.read.schema(sch).json(s"$in/$f"))
        .foldLeft(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "vec_id LONG, embedding ARRAY<FLOAT>"))) { (acc, b) =>
          acc.join(b.filter(col("op") === "delete").select(col("vec_id")),
              Seq("vec_id"), "left_anti")
            .unionByName(b.filter(col("op") === "insert")
              .select(col("vec_id"), col("embedding")))
        }
    def ins(df: org.apache.spark.sql.DataFrame) =
      df.select(lit("insert").as("op"), col("vec_id"), col("embedding"))
    def del(df: org.apache.spark.sql.DataFrame) =
      df.select(lit("delete").as("op"), col("vec_id"),
        lit(null).cast("array<float>").as("embedding"))

    val all = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(col("vec_id") % BatchMod =!= BatchMod - 1)
    val later = all.filter(col("vec_id") % BatchMod === BatchMod - 1)

    // batch 1: inserts only → trains
    drop("b1", ins(base))
    val st1 = spark.read.schema(IndexStateSchema).parquet(drain())
    assert(reencodeDiff(st1, survivors()).isEmpty,
      "law violated after the training batch")

    // batch 2: MIXED — delete a residue of the trained base, insert
    // the later slice; deletes land first, codebooks stay frozen
    drop("b2", del(base.filter(col("vec_id") % 5 === 0))
      .unionByName(ins(later)))
    val st2 = spark.read.schema(IndexStateSchema).parquet(drain())
    assert(reencodeDiff(st2, survivors()).isEmpty,
      "law violated after the mixed delete+insert batch")
    assert(coarseOf(st2).exceptAll(coarseOf(st1)).isEmpty
      && codebookOf(st2).exceptAll(codebookOf(st1)).isEmpty,
      "codebooks drifted on a CRUD batch")
    assert(codesOf(st2).select(col("vec_id")).distinct().count()
      === survivors().count())

    // batch 3: an in-batch UPDATE — re-embed a surviving slice (scaled
    // vectors) as delete(old)+insert(new) under the same vec_ids; the
    // new codes come from the FROZEN codebooks
    val updated = base.filter(col("vec_id") % 5 =!= 0
        && col("vec_id") % 3 === 1)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    drop("b3", del(updated).unionByName(ins(updated)))
    val st3 = spark.read.schema(IndexStateSchema).parquet(drain())
    assert(reencodeDiff(st3, survivors()).isEmpty,
      "law violated after the update batch")
    assert(coarseOf(st3).exceptAll(coarseOf(st1)).isEmpty
      && codebookOf(st3).exceptAll(codebookOf(st1)).isEmpty,
      "codebooks drifted on an update batch")
  }

  test("deletion: deleteIndexState drops exactly the deleted ids' " +
    "codes, freezes the codebooks, re-encodes clean over the " +
    "survivors, and composes with inserts into the update contract") {
    import VectorIndexMaintain._
    import spark.implicits._
    val all = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val base = all.filter(col("vec_id") % BatchMod =!= BatchMod - 1)
    val batch = all.filter(col("vec_id") % BatchMod === BatchMod - 1)
    val st1 = nextIndexState(emptyIndexState(spark), base)
      .localCheckpoint()
    val st2 = nextIndexState(st1, batch).localCheckpoint()
    // delete a mixed slice: ids from the training batch AND the
    // appended batch (FAISS remove_ids does not care which epoch a
    // vector arrived in)
    val delIds = all.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
      .localCheckpoint()
    val nDel = delIds.count()
    assert(nDel > 0, "slice empty — the test would prove nothing")
    val st3 = deleteIndexState(st2, delIds).localCheckpoint()
    // exactly the deleted rows left; nothing else moved
    assert(codesOf(st3).count()
      === codesOf(st2).count() - nDel * ProductQuantization.M)
    assert(codesOf(st3).join(delIds, Seq("vec_id"), "left_semi")
      .isEmpty, "a deleted id still has codes")
    assert(codesOf(st2).exceptAll(codesOf(st3))
      .join(delIds, Seq("vec_id"), "left_anti").isEmpty,
      "a surviving code row changed under deletion")
    // codebooks frozen — deletion is code-table-only
    assert(coarseOf(st3).exceptAll(coarseOf(st2)).isEmpty
      && coarseOf(st2).exceptAll(coarseOf(st3)).isEmpty)
    assert(codebookOf(st3).exceptAll(codebookOf(st2)).isEmpty
      && codebookOf(st2).exceptAll(codebookOf(st3)).isEmpty)
    // the law over the survivors
    val survivors = all.join(delIds, Seq("vec_id"), "left_anti")
    assert(reencodeDiff(st3, survivors).isEmpty,
      "law violated after deletion")
    // UPDATE = delete ∘ insert: re-ingest one deleted id with a NEW
    // vector; the law must hold over the updated corpus
    val updId = delIds.orderBy(col("vec_id")).limit(1)
      .collect()(0).getLong(0)
    val updated = all.filter(col("vec_id") === updId)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f).cast("float"))
          .as("embedding"))
      .localCheckpoint()
    val st4 = nextIndexState(st3, updated).localCheckpoint()
    assert(reencodeDiff(st4, survivors.unionByName(updated)).isEmpty,
      "law violated after the retract+insert update")
  }
}
