package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** SemDeDup-style semantic (embedding-space) deduplication [Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540]: quantize the embedding space into
  * clusters, then WITHIN each cluster drop every item that is too close
  * (cosine ≥ τ) to an earlier-ranked clustermate. This is the modern
  * curation step that removes *semantic* duplicates — paraphrases,
  * templated rewrites, translations-of-the-same-page — which survive every
  * lexical dedup tier (exact hash / MinHash / SimHash / edit distance).
  *
  * Reference tie: the clustering row of the reference's ML feature surface
  * (/root/reference/README.md:321-336); the composition itself follows the
  * published SemDeDup recipe.
  *
  * Semantics (the paper's upper-triangular screen): items in a cluster are
  * ranked by similarity to their centroid ASCENDING (the paper keeps the
  * LOW-centroid-similarity representatives — they are the informative
  * outliers); item i is dropped iff SOME j with rank_j < rank_i has
  * cos(i, j) ≥ τ — including j's that are themselves dropped (the screen is
  * against all earlier items, not just survivors, exactly as in the paper's
  * `torch.triu` implementation). Greedy, deterministic, NOT transitive
  * closure — a chain a~b~c with cos(a,c) < τ keeps a and c.
  *
  * 100 TB shape: the centroid table is tiny → broadcast argmax assignment
  * (one narrow pass, map-side `max_by` collapse, no window). The screen
  * self-join is keyed on `centroid_id` — both sides shuffle once on the
  * cluster id and every pair evaluation is cluster-local. Per-cluster work
  * is O(|cluster|²) *by the algorithm's own definition*; the scaling knob is
  * the quantizer's `nlist` (the paper runs 50k clusters over 5B items,
  * keeping clusters at ~10⁵ and the quadratic term bounded). Rank keys use
  * round(·, 6) so the DuckDB oracle reproduces ordering decisions exactly.
  */
object SemDedup {

  /** Per-vector verdict: (vec_id, centroid_id, rnk, kept).
    *
    * @param centroids (centroid_id, centroid) — fixed or k-means-trained
    *                  ([[graft.similarity.Similarity.kmeansCentroids]]); the
    *                  screen is agnostic to how the quantizer was built.
    * @param tau       drop threshold on round(cosine, 6).
    */
  def semDedup(embeddings: DataFrame, centroids: DataFrame, tau: Double): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    // nearest-centroid assignment: argmax over the broadcast centroid table,
    // partial-aggregated map-side so the exchange carries one row per vector
    // (the ivfAssign nprobe=1 shape); ties break toward the smaller
    // centroid_id via the negated id in the max key
    val scored = embeddings.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("c_cos",
        round(GraftFunctions.cosine(col("embedding"), col("centroid")), 6))
    val assigned = scored.groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("centroid_id"), col("c_cos")),
          struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        col("best.centroid_id").as("centroid_id"),
        col("best.c_cos").as("c_cos"))
    screenAssigned(assigned, tau)
  }

  /** The rank-and-screen half, on an already-assigned corpus — shared by
    * the exact single-level assignment above (q106, oracle-expressible)
    * and the two-level [[graft.similarity.Similarity.hierAssign]] scale
    * path (q134).
    *
    * @param assigned (vec_id, embedding, centroid_id, c_cos) with c_cos
    *                 already rounded to 6 (every rank key the oracle
    *                 reproduces uses that discipline).
    */
  def screenAssigned(assigned: DataFrame, tau: Double): DataFrame = {
    GraftFunctions.register(assigned.sparkSession)
    // within-cluster rank, farthest-from-centroid first (the paper's
    // keep-the-outliers order), vec_id tie-break
    val w = Window.partitionBy(col("centroid_id"))
      .orderBy(col("c_cos").asc, col("vec_id"))
    val ranked = assigned
      .withColumn("rnk", row_number().over(w).cast("long"))
      .localCheckpoint() // screened against itself — scan the ranking once
    // the screen: i is a duplicate iff ∃ j in the same cluster with
    // rnk_j < rnk_i and cos(i, j) ≥ τ
    val dups = ranked.as("a").join(ranked.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("b.rnk") < col("a.rnk") &&
          round(GraftFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
            >= tau)
      .select(col("a.vec_id").as("vec_id"))
      .distinct()
    ranked
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("centroid_id"), col("rnk"),
        col("dup").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Default router boundary: corpora whose n/64 nlist stays ≤ 64 (i.e.
    * n ≤ ~4096 vectors at the ratio discipline) take the exact
    * single-level assignment; beyond it the n·nlist term is the audit's
    * one named super-linear curve, and the router takes the n·√nlist
    * two-level trained path (q134's) instead.
    */
  val MaxNlistExact = 64

  /** The q106/q134 AUTO-SWITCH: pick the assignment path by the corpus's
    * own nlist = max(8, n/64) knob. nlist ≤ `maxNlistExact` → the exact
    * fixed-codebook single-level argmax (oracle-expressible, constant-
    * factor-fastest at small n — SCALING.md measures it 4.4× faster than
    * the trained path at sf0.1); nlist beyond it → the two-level trained
    * quantizer, whose n·√nlist assignment is the measured fix for the
    * audit's one super-linear curve. The corpus count is a driver-side
    * SCALAR aggregate (the legitimate 1-row pattern — both the routing
    * decision and the quantizer's literal sizes need it).
    *
    * SemDedupSpec's boundary case proves the router is exactly its two
    * legs: at nlist = maxNlistExact it returns the exact path's rows
    * bit-for-bit, one vector later (nlist = maxNlistExact + 1) the
    * trained path's.
    */
  def semDedupAuto(e: DataFrame, tau: Double,
                   maxNlistExact: Int = MaxNlistExact): DataFrame = {
    val n = e.count()
    val nlist = math.max(8L, n / 64L).toInt
    if (nlist <= maxNlistExact) {
      val centroids = e
        .filter(col("vec_id") < nlist)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      semDedup(e, centroids, tau)
    } else {
      val (supers, children) = graft.similarity.Similarity.hierQuantizer(
        e.select(col("vec_id"), col("embedding")), nlist, iters = 2)
      val assigned = graft.similarity.Similarity.hierAssign(
        e.select(col("vec_id"), col("embedding")), supers, children)
      screenAssigned(assigned, tau)
    }
  }

  /** q106: semantic dedup of the embeddings table, through the router.
    * At every driver scale factor (nlist ≤ 31 at sf0.1) the router picks
    * the exact path: the FIXED first-`nlist`-vectors codebook (centroid
    * c = embedding of vec_id c) — deliberately oracle-expressible; the
    * trained path plugs into the same screen and takes over beyond the
    * boundary (the 10×/100× SCALING legs route there — measured, closing
    * the audit's one missing 100× cell). τ = 0.4 sits in this synthetic
    * corpus's near-dup band (max pairwise cosine ≈ 0.5–0.6 across SFs).
    *
    * nlist SCALES WITH THE CORPUS: max(8, n/64) keeps the expected cluster
    * at ~64 vectors, so the within-cluster O(|cluster|²) screen stays
    * bounded by the knob (the paper's 50k-cluster regime at 5B items is
    * this same ratio discipline), not by n — a fixed nlist would make the
    * benched plan quadratic in corpus size.
    */
  def semDedupQuery(s: SparkSession, dir: String): DataFrame =
    semDedupAuto(Tables.embeddings(s, dir), tau = 0.4)

  /** q134: the TRAINED-quantizer twin of q106 (oracle-verified since
    * r10: the DuckDB oracle unrolls the fixed-iteration Lloyd training
    * at BOTH levels — the q37 pattern — with round(mean, 6) → FLOAT
    * re-quantizing both engines onto identical centroid bits between
    * rounds; SemDedupSpec additionally floors its planted dup-recall
    * against the fixed codebook's). Same corpus, same τ, same n/64 nlist
    * discipline, but the codebook is the TWO-LEVEL k-means quantizer
    * ([[graft.similarity.Similarity.hierQuantizer]]): √nlist supers
    * route, children quantize, so training and assignment both cost
    * n·√nlist instead of the n·nlist that made q106/q134 the one
    * super-linear pair in the sf0.1→sf1 scaling audit (SCALING.md names
    * the term and this fix; q106 deliberately keeps the exact
    * single-level argmax the DuckDB oracle can express).
    *
    * The corpus count is a driver-side SCALAR aggregate (the legitimate
    * 1-row pattern): the quantizer's hash-ordered inits need literal
    * sizes, so the knob cannot ride a broadcast column here.
    */
  def semDedupTrainedQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val nlist = math.max(8, (e.count() / 64L).toInt)
    val (supers, children) = graft.similarity.Similarity.hierQuantizer(
      e.select(col("vec_id"), col("embedding")), nlist, iters = 2)
    val assigned = graft.similarity.Similarity.hierAssign(
      e.select(col("vec_id"), col("embedding")), supers, children)
    screenAssigned(assigned, tau = 0.4)
  }
}
