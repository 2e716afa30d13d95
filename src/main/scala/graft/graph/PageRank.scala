package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** DataFrame PageRank — the centrality analytics the reference names as
  * its reason for building the graph projection ("graph algorithms like
  * centrality … useful for influencer analysis", `README.md:348-350`),
  * runnable directly on [[GraphExport]] edge tables (src, dst).
  *
  * Standard damped formulation with dangling-mass redistribution: each
  * round every vertex receives (1−d)/N plus d·(Σ incoming rank/out_deg +
  * dangling/N), so the rank vector stays a probability distribution
  * (Σ = 1) and convergence is measurable as the L1 delta between rounds.
  *
  * Scale shape per round: one edges⋈ranks hash join (shuffle on the join
  * key — co-partition `edges` by src beforehand to make it one-sided),
  * one aggregate for the contribution sums, one scalar aggregate for the
  * dangling mass. Lineage is truncated per round with `localCheckpoint`,
  * the same iterative discipline as [[graft.dedup.Dedup.connectedComponents]].
  */
object PageRank {

  /** @return (id, rank) — ranks sum to 1 over all vertices that appear in
    *         the edge list (either endpoint).
    */
  def run(edges: DataFrame, damping: Double = 0.85, maxIter: Int = 30,
      tol: Double = 1e-6): DataFrame = {
    val e = edges.select(col("src"), col("dst")).cache()
    // ONE setup pass computes the vertex set AND out-degrees: flatten each
    // edge into (src, o=1) + (dst, o=0) and sum — a vertex's out-degree is
    // its src-occurrence count, and a sum of 0 (never a src) means dangling
    // (kept as NULL so the per-round filters stay index-free predicates).
    // The separate union-distinct + groupBy formulation cost two shuffles
    // and two checkpoints here.
    val verts = e.select(explode(array(
        struct(col("src").as("id"), lit(1L).as("o")),
        struct(col("dst").as("id"), lit(0L).as("o")))).as("v"))
      .groupBy(col("v.id").as("id"))
      .agg(sum(col("v.o")).as("d"))
      .select(col("id"), when(col("d") > 0, col("d")).as("out_deg"))
      .localCheckpoint()
    val n = verts.count()
    require(n > 0, "PageRank needs at least one edge")

    // Rank state CARRIES out_deg so a round never re-joins a degree table:
    // each round is one lazy plan over (checkpointed ranks, cached e) —
    // the dangling mass rides along as a broadcast 1-row aggregate instead
    // of a driver collect, so fixed-round mode runs exactly ONE Spark job
    // per round (the next-state checkpoint).
    var ranks = verts.select(col("id"), col("out_deg"),
        lit(1.0 / n).as("rank"))
      .localCheckpoint()
    var iter = 0
    var delta = Double.MaxValue
    while (delta > tol && iter < maxIter) {
      val dangling = ranks.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      val contribs = e.join(ranks.filter(col("out_deg").isNotNull),
          e("src") === col("id"))
        .select(col("dst").as("id"), (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("in_c"))
      val next = verts.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("out_deg"),
          (lit((1.0 - damping) / n)
            + lit(damping) * (coalesce(col("in_c"), lit(0.0))
              + col("dm") / n))
            .as("rank"))
        .localCheckpoint()
      // tol ≤ 0 means "run exactly maxIter rounds" (the deterministic
      // oracle mode): skip the delta join entirely — measuring convergence
      // would cost an extra ranks⋈ranks join per round for a value no one
      // reads
      delta = if (tol > 0.0)
        next.join(ranks.select(col("id"), col("rank").as("old")), "id")
          .agg(sum(abs(col("rank") - col("old")))).collect()(0).getDouble(0)
      else Double.MaxValue
      ranks = next
      iter += 1
    }
    e.unpersist()
    ranks.select(col("id"), col("rank"))
  }

  /** BFS shortest paths from a source vertex — the "pathfinding" leg of
    * the reference's graph-analytics trio (`README.md:348-350`; centrality
    * = [[run]], community detection = connected components in Dedup).
    * Returns (id, dist) for every vertex reachable from `source`, hop
    * counts over the directed edge list. Frontier expansion: each round
    * joins the (small) frontier against edges and anti-joins the visited
    * set, so work per round is O(frontier adjacency), not O(graph).
    */
  def shortestPaths(edges: DataFrame, source: String,
      maxDepth: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    shortestPathsFrom(edges, Seq(source).toDF("id"), maxDepth)
      .orderBy(col("dist"), col("id"))
  }

  /** [[shortestPaths]] generalized to a seed-vertex DataFrame (one `id`
    * column, any key type) — the iterative body is key-type-agnostic, so
    * integer-keyed graphs avoid pushing strings through every frontier
    * shuffle. Unordered output.
    */
  def shortestPathsFrom(edges: DataFrame, sources: DataFrame,
      maxDepth: Int = 30): DataFrame = {
    // Pre-partition the edge set by src ONCE and cache that layout: the
    // per-round expand join then reuses the cached partitioning (an
    // InMemoryTableScan reports its HashPartitioning), so each round
    // shuffles only the FRONTIER — O(frontier) exchange per round instead
    // of re-exchanging all |E| edges every round. The shuffle_hash hint
    // keeps the per-partition join a hash build over the frontier rather
    // than a sort-merge, which would re-sort the cached edge partitions
    // each round. This is also the 100 TB shape: edges partitioned once,
    // rounds touch them in place.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).cache()
    var frontier = sources.select(col("id"), lit(0L).as("dist"))
      .localCheckpoint()
    // visited = the lazy union of per-round frontiers, each checkpointed
    // ONCE when produced — re-checkpointing a single growing visited set
    // every round would rewrite O(V) rows per round (O(V·depth) total)
    var frontiers = List(frontier)
    var depth = 0L
    while (frontier.limit(1).count() > 0 && depth < maxDepth) {
      depth += 1
      val visited = frontiers.map(_.select(col("id").as("seen"))).reduce(_ union _)
      frontier = e.join(frontier.select(col("id")).hint("shuffle_hash"),
          e("src") === col("id"))
        .select(col("dst").as("id")).distinct()
        .join(visited.hint("shuffle_hash"), col("id") === col("seen"), "left_anti")
        .select(col("id"), lit(depth).as("dist"))
        .localCheckpoint()
      frontiers = frontier :: frontiers
    }
    e.unpersist()
    // same contract as connectedComponents: a truncated traversal would
    // report reachable vertices as unreachable — refuse to return it
    if (frontier.limit(1).count() > 0) throw new IllegalStateException(
      s"BFS frontier still non-empty at maxDepth=$maxDepth — raise maxDepth")
    frontiers.reduce(_ union _)
  }

  /** Directed customer→supplier "buys from" edges from orders⋈lineitem —
    * the purchase graph both driver queries run on. Vertex ids are
    * prefixed (`c:`/`s:`) because custkey and suppkey share a key space.
    * Distinct-ed: the graph operators want a simple edge SET, not one
    * edge per lineitem.
    */
  def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    purchaseEdgesInt(s, dir)
      .select(decodeId(col("src")).as("src"), decodeId(col("dst")).as("dst"))

  /** Integer-keyed purchase graph: customer c ↦ 2c, supplier s ↦ 2s+1 —
    * the two key spaces interleave into one long, so every iterative
    * shuffle (frontier joins, rank joins, distincts) carries an 8-byte
    * key instead of a built string; [[decodeId]] reconstructs the
    * `c:`/`s:` ids on the final (vertex-sized) projection only.
    */
  def purchaseEdgesInt(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    // distinct on the integer pair: the dedup shuffle carries two longs
    // per row, once per distinct pair — not once per lineitem
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
      .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
  }

  private val edgeMemo = graft.tools.CorpusMemo.ofDf

  /** [[purchaseEdgesInt]] memoized per (session, dir) — the
    * [[Triangles.coPurchaseEdgesShared]] discipline on the directed
    * purchase graph its four consumers project (q57 PageRank, q58 BFS,
    * q94 k-core, q121 label propagation): the orders⋈lineitem distinct
    * runs once per corpus. Row-identical to a rebuild; single-entry,
    * fingerprint-keyed, evict-unpersists ([[graft.tools.CorpusMemo]]).
    */
  def purchaseEdgesIntShared(s: SparkSession, dir: String): DataFrame =
    edgeMemo.get(s, dir) { purchaseEdgesInt(s, dir).localCheckpoint() }

  /** Inverse of the [[purchaseEdgesInt]] encoding (valid for both parities:
    * (2k)>>1 = (2k+1)>>1 = k).
    */
  def decodeId(id: Column): Column =
    concat(when(id.bitwiseAND(1) === 0, "c:").otherwise("s:"),
      shiftright(id, 1))

  /** q57: PageRank over the directed purchase graph at exactly 5
    * iterations (tol=0 ⇒ the round count is fixed, so the unrolled
    * DuckDB oracle computes the identical sequence). Suppliers have no
    * out-edges, so the dangling-mass redistribution path is exercised on
    * every round, not just in a corner case. Ranks rounded to 8 dp —
    * cross-engine fp summation order differs at ~1e-15 relative, far
    * below the rounding grain.
    */
  def pagerankQuery(s: SparkSession, dir: String): DataFrame =
    run(purchaseEdgesIntShared(s, dir), damping = 0.85, maxIter = 5, tol = 0.0)
      .select(decodeId(col("id")).as("id"), round(col("rank"), 8).as("rank"))
      .orderBy(col("id"))

  /** q58: BFS hop counts from customer 1 over the UNDIRECTED purchase
    * graph (symmetrized edges — suppliers at distance 1, customers that
    * share a supplier at 2, …). Small-world: the co-purchase closure
    * reaches everything within a few hops, so maxDepth=10 is a safe
    * truncation guard, not a tuning knob.
    */
  def bfsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = purchaseEdgesIntShared(s, dir)
    shortestPathsFrom(
      e.union(e.select(col("dst").as("src"), col("src").as("dst"))),
      Seq(2L).toDF("id"), // c:1 under the 2c encoding
      maxDepth = 10)
      .select(decodeId(col("id")).as("id"), col("dist"))
      .orderBy(col("dist"), col("id"))
  }
}
