package graft.dedup

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables

/** INCREMENTAL maintenance of the near-dup PAIR index — the q152/q211
  * IVM law applied to the dedup tier. A production dedup index (the
  * shingle inverted index + the accepted pair set) is never rebuilt
  * per ingest: a new document batch updates the doc-frequency table,
  * re-keys only the index buckets it touches, and the pair set is
  * maintained as KEPT pairs (provably unchanged) plus RECOMPUTED pairs
  * (those adjacent to the batch). This is the text twin of q211's
  * add-after-train vector contract and the batch twin of
  * [[Dedup.screenBatch]]'s admission screen — the screen gates what
  * enters; this maintains the pair evidence after it enters.
  *
  * The subtlety the naive version misses is the DF-CAP RETRACTION: the
  * stop-shingle rule (df ≤ maxDf, [[Dedup.cappedShingles]]) is a
  * predicate over the WHOLE corpus, so an arriving batch can push a
  * shingle's df across the cap and retroactively shrink BASE docs'
  * capped shingle sets — deleting or weakening pairs the base index
  * already holds. Maintenance is therefore dirty-scoped, not
  * append-only (the [[graft.operators.Ivm.maintainMin]]
  * rebuild-on-retraction discipline):
  *
  *   - dirty docs = the batch docs ∪ base docs holding a CAP-CROSSING
  *     shingle (base_df ≤ maxDf < union_df). A batch shingle that stays
  *     under the cap cannot change any base–base pair (both sides
  *     already held or lacked it), so those do NOT dirty base docs.
  *   - KEPT: stored base pairs with both endpoints clean — exact, by
  *     the theorem: a clean doc holds no crossing shingle, so its
  *     capped shingle set is IDENTICAL under the base and union
  *     universes, hence so are n_common/n_a/n_b with any other clean
  *     doc (DedupMaintainSpec proves the leg is not recomputed by
  *     poisoning it).
  *   - RECOMPUTED: pairs with ≥ 1 dirty endpoint, rebuilt from the
  *     capped UNION index restricted to dirty-side rows — candidate
  *     generation is dirty×all through the inverted index, never
  *     corpus×corpus and never a full re-dedup.
  *
  * The LAW (what the oracle gates): maintained ≡ the from-scratch pair
  * set of the union corpus. The engine emits the maintained (kept ∪
  * recomputed) plan; the DuckDB oracle computes the from-scratch union
  * plan — hash equality at the driver gate IS the theorem, proven on
  * every corpus (and per-seed by the fuzz family).
  *
  * Exactness discipline: ALL-INTEGER output (id_a, id_b, n_common,
  * n_a, n_b, leg) — the q210 rule: the J ≥ 1/5 threshold is the exact
  * integer test 6·n_common ≥ n_a + n_b, so there is no rounded
  * quotient anywhere (consumers derive J at whatever precision they
  * need).
  *
  * 100 TB shape: the df table is maintained state (union df =
  * stored base df + batch df — one batch-sized aggregate); the
  * inverted index is keyed by shingle, so the dirty×all join touches
  * only buckets containing a dirty doc's shingles; sizes are computed
  * for pair PARTICIPANTS only (a production store keeps (doc_id, n_sh)
  * as state — clean docs' sizes are unchanged by the same theorem).
  * Per-ingest cost is O(batch + dirty-adjacent buckets), never a
  * corpus rescan.
  */
object DedupMaintain {

  /** Word-shingle width — 3 keeps the driver corpus' df spectrum wide
    * enough that cap crossings actually occur (4-grams are near-unique
    * there; 2-grams are so hot every doc would be dirty).
    */
  val K = 3

  /** Stop-shingle doc-frequency cap over the union corpus. */
  val MaxDf = 5

  /** doc_id % BatchMod == BatchMod−1 is the "new ingest batch" (~14%);
    * the rest is the base corpus whose index already exists.
    */
  val BatchMod = 7L

  /** The exact J ≥ 1/5 membership test: J = c/(a+b−c) ≥ 1/5 ⟺
    * 6c ≥ a + b — integers end to end.
    */
  private def passes(c: org.apache.spark.sql.Column,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c * 6 >= a + b

  /** The from-scratch pair set over a capped (doc_id, shingle) table:
    * inverted-index self-join, integer sizes, the exact J ≥ 1/5 test.
    * Shared by the base-state build and the spec's in-memory rebuild.
    */
  def pairsFromShingles(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .filter(passes(col("n_common"), col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
        col("n_b"))
  }

  /** The stored base state a production index holds: the base-universe
    * capped shingle table and its pair set (df computed over base ONLY
    * — the index was built before the batch existed).
    */
  def baseState(base: DataFrame, k: Int, maxDf: Int): DataFrame =
    pairsFromShingles(Dedup.cappedShingles(base, k, maxDf))

  // ---------------------------------------------------------------------
  // PERSISTED index state. The dedup index a production deployment
  // maintains is three stored tables — the uncapped distinct (doc_id,
  // shingle) inverted index, its doc-frequency table, and the accepted
  // pair set — packed into ONE kind-tagged parquet snapshot so the
  // versioned-commit protocol (graft.stream.Ingest) advances all three
  // ATOMICALLY: a crash between per-table commits can never leave the df
  // table ahead of the index it describes. Readers prune by `kind`
  // (parquet predicate pushdown) and by column, so each unpacked view
  // scans only its own row group slice.
  // ---------------------------------------------------------------------

  /** The packed state schema: `kind` ∈ sh | df | pair, with each kind
    * populating its own columns (sh: doc_id+shingle; df: shingle+n;
    * pair: id_a..n_b).
    */
  val StateSchema: StructType = StructType(Seq(
    StructField("kind", StringType), StructField("doc_id", LongType),
    StructField("shingle", StringType), StructField("n", LongType),
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("n_common", LongType), StructField("n_a", LongType),
    StructField("n_b", LongType)))

  def emptyState(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row], StateSchema)

  /** Pack (sh, df, pairs) views into one kind-tagged state frame.
    * `sh` = (doc_id, shingle) uncapped distinct; `df` = (shingle, n);
    * `pairs` = (id_a, id_b, n_common, n_a, n_b).
    */
  def packState(sh: DataFrame, df: DataFrame, pairs: DataFrame): DataFrame = {
    def nl = lit(null).cast("long")
    sh.select(lit("sh").as("kind"), col("doc_id").cast("long").as("doc_id"),
        col("shingle"), nl.as("n"), nl.as("id_a"), nl.as("id_b"),
        nl.as("n_common"), nl.as("n_a"), nl.as("n_b"))
      .unionByName(df.select(lit("df").as("kind"), nl.as("doc_id"),
        col("shingle"), col("n").cast("long").as("n"), nl.as("id_a"),
        nl.as("id_b"), nl.as("n_common"), nl.as("n_a"), nl.as("n_b")))
      .unionByName(pairs.select(lit("pair").as("kind"), nl.as("doc_id"),
        lit(null).cast("string").as("shingle"), nl.as("n"),
        col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"),
        col("n_common").cast("long").as("n_common"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b")))
  }

  def shOf(state: DataFrame): DataFrame =
    state.filter(col("kind") === "sh").select(col("doc_id"), col("shingle"))
  def dfOf(state: DataFrame): DataFrame =
    state.filter(col("kind") === "df").select(col("shingle"), col("n"))
  def pairsOf(state: DataFrame): DataFrame =
    state.filter(col("kind") === "pair").select(col("id_a"), col("id_b"),
      col("n_common"), col("n_a"), col("n_b"))

  /** Build the packed index state from a document corpus — one shingle
    * scan feeds all three views (the df aggregate doubles as the cap
    * filter for the pair build).
    */
  def buildState(docs: DataFrame, k: Int = K, maxDf: Int = MaxDf): DataFrame = {
    val sh = Dedup.shingles(docs, k).localCheckpoint()
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val pairs = pairsFromShingles(
      sh.join(df.filter(col("n") <= maxDf).select(col("shingle")),
        Seq("shingle"), "left_semi"))
    packState(sh, df, pairs)
  }

  /** Where the q213 base-index snapshot chain lives for a corpus — keyed
    * on the corpus FINGERPRINT (file paths/lengths/mtimes), so a
    * rewritten corpus gets a fresh chain instead of stale state, and on
    * the index parameters, so a parameter change can never read another
    * configuration's state.
    *
    * SINGLE-WRITER CONTRACT (inherited from the snapshot protocol):
    * one process owns a chain at a time. Two JVMs over the SAME corpus
    * map to the same path and could race the v000000 build — the graft
    * drivers (Verify/Bench/tests/fuzz) are sequential single-process by
    * construction, and fuzz seeds live in distinct corpus dirs (distinct
    * fingerprints), so the contract holds everywhere the engine runs;
    * a multi-writer deployment would key an extra owner component here.
    */
  def stateTablePath(s: SparkSession, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-state/dedup-index-k$K-df$MaxDf-" +
      s"mod$BatchMod/${graft.tools.CorpusMemo.fingerprint(s, dir)}"

  /** Fingerprint chains retained per params dir — bounds the tmpdir
    * footprint across corpus rewrites and fuzz sweeps (each seeded
    * corpus creates a chain that its own fingerprint key can never
    * reclaim). Pruned ONLY on a fresh-chain build, oldest-mtime first,
    * so steady-state reads never delete anything.
    */
  val StateChainsKept = 8

  private def pruneStaleChains(s: SparkSession, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(table)
    val parent = p.getParent
    val fs = parent.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(parent)) {
      fs.listStatus(parent).filter(_.isDirectory)
        .filterNot(_.getPath.getName == p.getName)
        .sortBy(-_.getModificationTime)
        .drop(StateChainsKept - 1) // current chain takes one slot
        .foreach { st =>
          try fs.delete(st.getPath, true)
          catch { case scala.util.control.NonFatal(_) => () }
        }
    }
  }

  /** The PERSISTED base state for the q213 split: read the committed
    * snapshot if one exists; otherwise build it once from the base
    * corpus and commit it through the snapshot protocol
    * ([[graft.stream.Ingest.advanceSnapshot]] — manifest-last,
    * object-store safe). Every call after the first — including the
    * second bench pass, and every future session over the unchanged
    * corpus — prices ONLY the maintenance, which is the production
    * amortization this table models (the index is built at ingest,
    * not per query).
    */
  def persistedBaseState(s: SparkSession, dir: String,
      base: => DataFrame): DataFrame = {
    val table = stateTablePath(s, dir)
    val p = graft.stream.Ingest.latestSnapshotPath(s, table).getOrElse {
      pruneStaleChains(s, table) // reclaim rewritten-corpus chains
      graft.stream.Ingest.advanceSnapshot(s, table, emptyState(s)) { _ =>
        buildState(base)
      }
    }
    s.read.schema(StateSchema).parquet(p)
  }

  /** q213: maintain the near-dup pair index through one ingest batch —
    * the maintained (kept ∪ recomputed) pair set, each row tagged with
    * the leg that produced it. The oracle recomputes the union corpus
    * from scratch; hash equality proves the maintenance exact.
    *
    * The stored state (inverted index, df table, pair set) is READ from
    * the persisted snapshot chain ([[persistedBaseState]]; one-time
    * build fallback on a fresh corpus), so the query prices maintenance
    * over stored state — the in-query state construction that used to
    * dominate the 100× leg is paid once per corpus lifetime, like the
    * production deployment it models.
    */
  def maintainQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % BatchMod === BatchMod - 1)
    val state = persistedBaseState(s, dir,
      docs.filter(col("doc_id") % BatchMod =!= BatchMod - 1))
    maintainCore(shOf(state), Dedup.shingles(batch, K).localCheckpoint(),
      dfOf(state).select(col("shingle"), col("n").as("base_df")),
      pairsOf(state), MaxDf).pairs
  }

  /** The maintenance plan over explicit state — `basePairs` is the
    * STORED pair set (normally [[baseState]]; the spec poisons it to
    * prove the kept leg is never recomputed).
    */
  def maintainPairs(base: DataFrame, batch: DataFrame,
      basePairs: DataFrame, k: Int, maxDf: Int): DataFrame = {
    val shBase = Dedup.shingles(base, k).localCheckpoint()
    val dfBase = shBase.groupBy(col("shingle"))
      .agg(count(lit(1)).as("base_df"))
    maintainCore(shBase, Dedup.shingles(batch, k).localCheckpoint(),
      dfBase, basePairs, maxDf).pairs
  }

  /** What one maintenance step produces: the maintained legged pair
    * set, plus the UNION df table — (shingle, base_df, df) where df is
    * the post-batch doc frequency — which becomes the next state's df
    * view in the continuous ([[maintainStream]]) composition.
    */
  case class MaintainOut(pairs: DataFrame, dfUnion: DataFrame)

  /** The maintenance core over prebuilt shingle views and the stored
    * base df table. `shBase`/`shBatch` are uncapped distinct
    * (doc_id, shingle); union df = base df + batch df — the
    * incremental state update (base df is stored state in a real
    * deployment; only the batch aggregate is new work).
    */
  private def maintainCore(shBase: DataFrame, shBatch: DataFrame,
      dfBase: DataFrame, basePairs: DataFrame, maxDf: Int): MaintainOut = {
    val dfBatch = shBatch.groupBy(col("shingle"))
      .agg(count(lit(1)).as("batch_df"))
    val dfU = dfBase.join(dfBatch, Seq("shingle"), "full_outer")
      .select(col("shingle"),
        coalesce(col("base_df"), lit(0L)).as("base_df"),
        (coalesce(col("base_df"), lit(0L))
          + coalesce(col("batch_df"), lit(0L))).as("df"))
      .localCheckpoint()

    // cap-crossing shingles retract: base_df ≤ maxDf < union df
    val crossing = dfU
      .filter(col("base_df") <= maxDf && col("df") > maxDf)
      .select(col("shingle"))
    // dirty docs: every batch doc (shingle-bearing — a shingle-less doc
    // appears in no pair, so the tag is never consulted) + base docs
    // holding a crossing shingle (shingle-keyed semi-join — only
    // crossed buckets touched)
    val dirty = shBatch.select(col("doc_id"))
      .unionByName(shBase.join(crossing, Seq("shingle"), "left_semi")
        .select(col("doc_id")))
      .distinct()
      .localCheckpoint()

    // the capped UNION index (shingle-keyed; production updates the
    // stored index in place: batch rows in, crossed buckets out)
    val shU = shBase.unionByName(shBatch)
      .join(dfU.filter(col("df") <= maxDf).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .localCheckpoint()
    MaintainOut(
      keptPairs(basePairs, dirty)
        .unionByName(recomputedPairs(shU, dirty))
        .orderBy(col("id_a"), col("id_b")),
      dfU)
  }

  /** The RECOMPUTED leg, shared by insert ([[maintainCore]]) and delete
    * ([[deleteCore]]) maintenance: pairs with ≥ 1 dirty endpoint,
    * rebuilt from the capped post-change index `shU` restricted to
    * dirty-side rows. Candidates are dirty×clean + dirty×dirty through
    * the inverted index — each common shingle of a pair appears exactly
    * once per leg (dirty/clean sides are disjoint; the dirty–dirty
    * self-join is ordered), so the counts are exact.
    */
  private def recomputedPairs(shU: DataFrame, dirty: DataFrame): DataFrame = {
    val shD = shU.join(dirty, Seq("doc_id"), "left_semi")
    val shC = shU.join(dirty, Seq("doc_id"), "left_anti")
    val dc = shD.as("a").join(shC.as("b"),
        col("a.shingle") === col("b.shingle"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("id_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("id_b"))
    val dd = shD.as("a").join(shD.as("b"),
        col("a.shingle") === col("b.shingle")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val common = dc.unionByName(dd)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))

    // sizes under the post-change cap, for pair PARTICIPANTS only —
    // clean docs' sizes are provably unchanged, so a production store
    // reads them from state; dirty docs' sizes are |dirty| agg rows
    val participants = common.select(col("id_a").as("doc_id"))
      .unionByName(common.select(col("id_b").as("doc_id")))
      .distinct()
    val sizes = shU.join(participants, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")),
        Seq("id_b"))
      .filter(passes(col("n_common"), col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
        col("n_b"), lit("recomputed").as("leg"))
  }

  /** The KEPT leg: stored pairs with NO endpoint in any `excludes` set
    * (dirty docs — and, for deletes, the deleted docs themselves) —
    * carried verbatim from state, never recomputed. Each exclusion set
    * is its own anti-join pair rather than a pre-union: unioning `dirty`
    * (whose plan already references the delete-id frame through the
    * survivor anti-join) with the delete ids themselves trips Catalyst's
    * Union constraint rewrite on the shared attribute ids.
    */
  private def keptPairs(basePairs: DataFrame,
      excludes: DataFrame*): DataFrame =
    excludes.foldLeft(basePairs) { (acc, ex) =>
      acc.join(ex.select(col("doc_id").as("id_a")), Seq("id_a"),
          "left_anti")
        .join(ex.select(col("doc_id").as("id_b")), Seq("id_b"),
          "left_anti")
    }.select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
      col("n_b"), lit("kept").as("leg"))

  /** One state transition of the CONTINUOUS index: absorb a document
    * batch into the packed state — the next state's inverted index is
    * base ∪ batch (uncapped distinct), its df view is the maintained
    * union df, and its pair set is the maintained kept ∪ recomputed
    * pairs (leg dropped — the tag is per-step evidence, not state).
    *
    * Contract: batch doc_ids are NEW (an ingest stream appends
    * documents; re-ingesting an existing doc_id would double-count its
    * shingles in the df state). An UPDATE routes through a
    * retract+insert pair: [[deleteState]] on the old doc_id, then this
    * on the new rows — both transitions are exact, so the composition
    * is too.
    */
  def nextState(state: DataFrame, batch: DataFrame, k: Int = K,
      maxDf: Int = MaxDf): DataFrame = {
    val shBase = shOf(state)
    val shBatch = Dedup.shingles(batch, k).localCheckpoint()
    val out = maintainCore(shBase, shBatch,
      dfOf(state).select(col("shingle"), col("n").as("base_df")),
      pairsOf(state), maxDf)
    packState(shBase.unionByName(shBatch),
      out.dfUnion.select(col("shingle"), col("df").as("n")),
      out.pairs.drop("leg"))
  }

  // ---------------------------------------------------------------------
  // DELETION maintenance — the erasure half of the index contract. The
  // q173 governance tier PLANS erasure cascades (which rows must go when
  // a user exercises deletion); this is the operator that lets a
  // MAINTAINED index absorb them without a rebuild. The physics mirror
  // the insert case: df only DECREASES under deletion, so the only
  // cap-status change is the UN-CROSSING shingle (base_df > maxDf ≥
  // df_after) — a formerly-stopped shingle comes back to life, which can
  // RESURRECT pairs between surviving docs that the stored pair set
  // never held (the exact mirror of the insert case's retraction).
  // ---------------------------------------------------------------------

  /** doc_id % DeleteMod == DeleteMod−1 is the q215 "erasure batch"
    * (~11%); the rest survives. Coprime to [[BatchMod]] so the q213 and
    * q215 slices cut the corpus differently.
    */
  val DeleteMod = 9L

  /** One DELETION transition over explicit state: remove `delIds`'
    * docs from the index and maintain the pair set dirty-scoped.
    *
    *   - df decrement: df_after = stored df − deleted docs' shingle
    *     df (batch-sized aggregate; rows reaching 0 leave the state).
    *   - un-crossing shingles: base_df > maxDf ≥ df_after — deletion
    *     can only lower df, so no shingle ever crosses INTO the cap,
    *     and a clean surviving doc's capped shingle set is IDENTICAL
    *     under the base and survivor universes (the kept-leg theorem,
    *     same proof shape as the insert case).
    *   - dirty docs = surviving docs holding an un-crossing shingle.
    *     Deleted docs' pair PARTNERS are NOT dirty per se: dropping a
    *     partner changes no surviving pair's evidence except through
    *     df — which the un-crossing set captures exactly.
    *   - KEPT: stored pairs with no deleted and no dirty endpoint.
    *   - RECOMPUTED: pairs with ≥ 1 dirty endpoint, rebuilt from the
    *     capped survivor index — including RESURRECTED pairs the
    *     stored set never held (two clean-looking docs joined by an
    *     un-crossed shingle).
    *
    * The LAW (what the q215 oracle gates): maintained ≡ the
    * from-scratch pair set of corpus ∖ deleted.
    *
    * 100 TB shape: the decrement is a |deleted-docs'-shingles|
    * aggregate joined into the stored df table; the dirty scope
    * touches only un-crossed buckets; candidate generation is
    * dirty×all through the inverted index — never a survivor rescan.
    */
  def deleteCore(shBase: DataFrame, delIds: DataFrame, dfBase: DataFrame,
      basePairs: DataFrame, maxDf: Int): MaintainOut = {
    val shDel = shBase.join(delIds, Seq("doc_id"), "left_semi")
    val dfDel = shDel.groupBy(col("shingle"))
      .agg(count(lit(1)).as("del_df"))
    // survivor-universe df: stored df minus the deleted docs' counts;
    // base_df rides along so consumers (and the next state) see both
    val dfA = dfBase.join(dfDel, Seq("shingle"), "left_outer")
      .select(col("shingle"), col("n").as("base_df"),
        (col("n") - coalesce(col("del_df"), lit(0L))).as("df"))
      .filter(col("df") > 0)
      .localCheckpoint()

    // un-crossing: stopped under the base universe, active under the
    // survivor universe — the ONLY cap-status change deletion can cause
    val uncross = dfA.filter(col("base_df") > maxDf && col("df") <= maxDf)
      .select(col("shingle"))
    val shSurv = shBase.join(delIds, Seq("doc_id"), "left_anti")
    val dirty = shSurv.join(uncross, Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
      .localCheckpoint()

    // the capped SURVIVOR index (production deletes the doc rows and
    // re-admits un-crossed buckets in place)
    val shU = shSurv
      .join(dfA.filter(col("df") <= maxDf).select(col("shingle")),
        Seq("shingle"), "left_semi")
      .localCheckpoint()

    // kept excludes deleted endpoints too: a stored pair touching a
    // deleted doc must not survive the erasure
    MaintainOut(
      keptPairs(basePairs, dirty, delIds)
        .unionByName(recomputedPairs(shU, dirty))
        .orderBy(col("id_a"), col("id_b")),
      dfA)
  }

  /** One DELETION state transition of the continuous index: the next
    * state's inverted index drops the deleted docs' rows, its df view
    * is the decremented survivor df, and its pair set is the
    * maintained kept ∪ recomputed set. With [[nextState]] this closes
    * the index CRUD contract: insert = nextState, delete = this,
    * update = deleteState ∘ nextState (retract+insert).
    */
  def deleteState(state: DataFrame, delIds: DataFrame,
      maxDf: Int = MaxDf): DataFrame = {
    val shBase = shOf(state)
    val out = deleteCore(shBase, delIds, dfOf(state), pairsOf(state), maxDf)
    packState(shBase.join(delIds, Seq("doc_id"), "left_anti"),
      out.dfUnion.select(col("shingle"), col("df").as("n")),
      out.pairs.drop("leg"))
  }

  /** The persisted FULL-corpus index state the q215 erasure reads —
    * the q213 chain holds the base-slice universe (df over base only),
    * which is the wrong stored state for a deletion over the whole
    * corpus, so erasure maintenance owns a sibling params dir. Same
    * fingerprint keying, retention, and single-writer contract as
    * [[stateTablePath]].
    */
  def fullStateTablePath(s: SparkSession, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-state/dedup-index-full-k$K-" +
      s"df$MaxDf/${graft.tools.CorpusMemo.fingerprint(s, dir)}"

  def persistedFullState(s: SparkSession, dir: String,
      docs: => DataFrame): DataFrame = {
    val table = fullStateTablePath(s, dir)
    val p = graft.stream.Ingest.latestSnapshotPath(s, table).getOrElse {
      pruneStaleChains(s, table)
      graft.stream.Ingest.advanceSnapshot(s, table, emptyState(s)) { _ =>
        buildState(docs)
      }
    }
    s.read.schema(StateSchema).parquet(p)
  }

  /** q215: maintain the near-dup pair index through one ERASURE batch
    * (the %[[DeleteMod]] slice) — the maintained (kept ∪ recomputed)
    * pair set over the survivors, leg-tagged. The oracle recomputes
    * corpus ∖ deleted from scratch; hash equality proves the erasure
    * exact — including the resurrection of pairs the stored set never
    * held. Reads the same persisted-snapshot amortization as q213:
    * the full-corpus state is built once per corpus lifetime, the
    * query prices only the maintenance.
    */
  def deleteQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val delIds = docs.filter(col("doc_id") % DeleteMod === DeleteMod - 1)
      .select(col("doc_id"))
    val state = persistedFullState(s, dir, docs)
    deleteCore(shOf(state), delIds, dfOf(state), pairsOf(state), MaxDf)
      .pairs
  }

  /** The STREAMING leg of the maintained dedup index — the
    * [[graft.etl.Ivm.maintainStream]] composition applied to the pair
    * index: a stream of document batches drains through foreachBatch
    * into the FENCED snapshot chain ([[graft.stream.Ingest
    * .advanceSnapshotFenced]]), each micro-batch advancing the packed
    * state through [[nextState]] exactly once even under at-least-once
    * redelivery (index maintenance is NOT idempotent — replaying a
    * batch would double its shingles' df — so the batchId rides the
    * manifest's atomic PUT as the fencing epoch). Because every
    * transition is the dirty-scoped maintenance, the INVARIANT after
    * each commit is the q213 law: the state's pair set equals the
    * from-scratch pair set of every document ingested so far
    * (DedupMaintainSpec proves it per batch; the fuzz family per seed).
    *
    * Contract (inherited from the fence): one writer, one checkpoint
    * lineage per table. Returns the latest committed snapshot path.
    */
  def maintainStream(docs: DataFrame, tablePath: String,
      checkpoint: String): Option[String] = {
    val spark = docs.sparkSession
    val q = docs.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
          graft.stream.Ingest.advanceSnapshotFenced(spark, tablePath, id,
            emptyState(spark)) { state => nextState(state, batch.toDF()) }
          ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.stream.Ingest.latestSnapshotPath(spark, tablePath)
  }

  /** The STREAMING CRUD leg — the full index contract under
    * at-least-once delivery: each micro-batch carries op-tagged rows
    * (`op` ∈ insert | delete; deletes need only `doc_id`), and one
    * fenced snapshot advance applies the batch's DELETES first, then
    * its INSERTS ([[deleteState]] ∘ [[nextState]] — both transitions
    * exact, so the composition is, and an UPDATE is expressible inside
    * ONE batch as delete(old id) + insert(new row) because the retract
    * lands before the insert reads the state). Deletes-before-inserts
    * is the batch's defined semantics: an insert-then-delete of the
    * same id within one batch is NOT expressible (split it across
    * batches). The composed transition is as non-idempotent as its
    * halves — a replayed batch would decrement df twice — so the
    * batchId fence on the manifest PUT is load-bearing exactly as on
    * the insert-only leg.
    *
    * INVARIANT after every commit (spec-proven): the state ≡ the
    * from-scratch build of (all inserts so far) ∖ (all deletes so
    * far) — resurrections from un-crossing df decrements included.
    */
  def maintainStreamCrud(ops: DataFrame, tablePath: String,
      checkpoint: String): Option[String] = {
    val spark = ops.sparkSession
    val q = ops.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
          val b = batch.toDF().localCheckpoint()
          graft.stream.Ingest.advanceSnapshotFenced(spark, tablePath, id,
            emptyState(spark)) { state =>
            val dels = b.filter(col("op") === "delete")
              .select(col("doc_id"))
            val ins = b.filter(col("op") === "insert")
              .select(col("doc_id"), col("text"))
            nextState(deleteState(state, dels), ins)
          }
          ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.stream.Ingest.latestSnapshotPath(spark, tablePath)
  }
}
