package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Triangle counting — the motif-counting leg of the graph analytics the
  * reference's README motivates alongside centrality ([[PageRank.run]]),
  * pathfinding ([[PageRank.shortestPaths]]) and community detection
  * ([[graft.dedup.Dedup.connectedComponents]]); cf. `README.md:348-350`.
  *
  * Scale design: the naive triangle join (edges³ on shared endpoints) does
  * Σ deg(v)² work, which a single celebrity vertex turns quadratic. The
  * standard fix [Suri & Vassilvitskii, "Counting Triangles and the Curse of
  * the Last Reducer", WWW'11] orients every edge from its lower
  * (degree, id) endpoint to the higher and enumerates wedges only at the
  * LOW vertex: out-degrees under that orientation are O(√m), so total wedge
  * work is O(m^{3/2}) regardless of skew. Both the orientation and the
  * wedge order use the full (degree, id) pair, so ties are deterministic.
  */
object Triangles {

  /** Undirected customer co-purchase edges: two customers are linked when
    * they bought the same part. Parts bought by more than `maxDf` distinct
    * customers are dropped FIRST — a popular part's projection is a clique
    * (df² pairs of zero signal), the same quadratic risk the stop-shingle
    * cap guards against in [[graft.dedup.Dedup.jaccardPairs]]. The df
    * window shuffles on the same key (`p`) the pair self-join uses.
    */
  def coPurchaseEdges(s: SparkSession, dir: String, maxDf: Int): DataFrame = {
    val cp = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val capped = cp
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("p"))))
      .filter(col("df") <= maxDf)
    capped.as("x").join(capped.as("y"),
        col("x.p") === col("y.p") && col("x.c") < col("y.c"))
      .select(col("x.c").as("u"), col("y.c").as("v"))
      .distinct()
  }

  private val edgeMemo = graft.tools.CorpusMemo.ofDf

  /** [[coPurchaseEdges]] memoized per (session, dir, maxDf) — the
    * materialized graph view three consumers project (q69 triangles,
    * q145 Adamic–Adar, the q177/q183/q187 reach propagation): the
    * orders⋈lineitem distinct + df cap + part-keyed self-join runs once
    * per corpus and every reader gets the same checkpointed edge table.
    * A pure function of the corpus, so memo-vs-rebuild is row-identical
    * and every oracle replays it unchanged (single-entry,
    * fingerprint-keyed, evict-unpersists — [[graft.tools.CorpusMemo]]).
    */
  def coPurchaseEdgesShared(s: SparkSession, dir: String,
      maxDf: Int): DataFrame =
    edgeMemo.get(s, dir, s"maxDf=$maxDf") {
      coPurchaseEdges(s, dir, maxDf).localCheckpoint()
    }

  /** Per-vertex triangle participation counts over a canonical undirected
    * edge set (u < v, distinct): (id, n_triangles) for every vertex in at
    * least one triangle.
    *
    * Caching contract: the oriented edge set feeds three branches of one
    * lazy plan (both wedge sides + the closure probe) — cached like the
    * Dedup pair miners; callers `clearCache()` after materializing.
    */
  def perVertexTriangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    // orient low→high by (degree, id); keep the head's order key (bd, b)
    // so the wedge join can order the two out-neighbors the same way
    val lowFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val directed = withDeg.select(
        when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("bd"))
      .cache()
    // wedges at the low vertex: unordered out-neighbor pairs, enumerated
    // once via the strict (bd, b) < (cd, c) order; a wedge closes into a
    // triangle iff the directed edge b→c exists (b ≺ c matches orientation)
    val wedges = directed.as("e1").join(directed.as("e2"),
        col("e1.a") === col("e2.a")
          && struct(col("e1.bd"), col("e1.b")) < struct(col("e2.bd"), col("e2.b")))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val tri = wedges.join(
      directed.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** q69: per-customer triangle counts over the co-purchase projection —
    * "customers embedded in tight co-buying clusters", the cohesion signal
    * triangle participation is the standard primitive for.
    */
  def trianglesQuery(s: SparkSession, dir: String): DataFrame =
    perVertexTriangles(coPurchaseEdgesShared(s, dir, maxDf = 18))
      .select(col("id").as("cust_id"), col("n_triangles"))
      .orderBy(col("cust_id"))
}
