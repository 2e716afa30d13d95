package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction with Adamic–Adar weighting [Adamic &
  * Adar, "Friends and neighbors on the Web", Social Networks 25(3);
  * Liben-Nowell & Kleinberg, "The link-prediction problem for social
  * networks", CIKM'03] — the classic "who should be connected next"
  * primitive over the same co-purchase projection the motif (q69),
  * centrality (q57) and cohesion (q94) queries analyze. A predicted
  * pair is two non-adjacent vertices sharing neighbors; its score sums
  * 1/ln(deg(z)) over the common neighbors z, discounting promiscuous
  * hubs exactly where a raw common-neighbor count over-credits them.
  *
  * Scale design: wedges are enumerated THROUGH the middle vertex z, so
  * the work is Σ deg(z)² — the same celebrity-vertex quadratic the
  * triangle count dodges by orientation (Suri–Vassilvitskii). Orientation
  * doesn't apply here (both wedge ends must surface, not just ordered
  * ones), so the standard discipline is a HUB CAP on the middle vertex:
  * z with deg(z) > maxHub contribute wedges of weight < 1/ln(maxHub)
  * each — the lowest-signal wedges on the board by AA's own argument —
  * and dropping them bounds per-vertex wedge work at maxHub² while
  * biasing every remaining score DOWN by a known ceiling. The cap is
  * the graph twin of the q25/q92 stop-shingle df cap, and like those
  * it is enforced, not advisory.
  *
  * Everything else is exchanges keyed on z (wedge join), the canonical
  * pair (existing-edge anti-join, score aggregate) — no corpus-sized
  * window, no driver loop. Weights round to 6 before ranking (the
  * engine-wide fp-tie discipline), so the DuckDB oracle replays scores
  * and order exactly.
  */
object LinkPrediction {

  /** Top-`topK` predicted links over a canonical (u < v, distinct)
    * undirected edge set: (u, v, common_neighbors, aa_score).
    */
  def adamicAdar(edges: DataFrame, maxHub: Int, topK: Int): DataFrame = {
    // the edge plan feeds four branches (both undirected directions, the
    // degree aggregate, the open-pair anti-join) — cache it like the
    // Triangles caching contract, or an expensive upstream projection
    // (q69's join + distinct + window) recomputes per branch
    val e = edges.cache()
    // full adjacency (both directions) + true degrees — degrees are
    // computed BEFORE the hub cap so the weight is the vertex's real
    // 1/ln(deg), not an artifact of the cap
    val und = e.select(col("u").as("z"), col("v").as("n"))
      .unionByName(e.select(col("v").as("z"), col("u").as("n")))
    val deg = und.groupBy(col("z")).agg(count(lit(1)).as("d"))
    val adj = und.join(deg, Seq("z")).filter(col("d") <= maxHub)
    // wedges through z: unordered neighbor pairs, canonical n1 < n2
    val wedges = adj.as("a").join(adj.as("b"),
        col("a.z") === col("b.z") && col("a.n") < col("b.n"))
      .select(col("a.n").as("u"), col("b.n").as("v"), col("a.d").as("dz"))
    // keep only NON-adjacent pairs (the wedge endpoints are already
    // canonical u < v, matching the edge set's orientation)
    val open = wedges.join(e, Seq("u", "v"), "left_anti")
    open.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        round(sum(lit(1.0) / log(col("dz"))), 6).as("aa_score"))
      .orderBy(col("aa_score").desc, col("u"), col("v"))
      .limit(topK)
  }

  /** q145: top-20 predicted co-purchase links by Adamic–Adar over the
    * q69 projection (df-capped parts, hub-capped middles).
    */
  def linkPredictionQuery(s: SparkSession, dir: String): DataFrame =
    adamicAdar(Triangles.coPurchaseEdgesShared(s, dir, maxDf = 18),
      maxHub = 40, topK = 20)
}
