package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bounded-round Bellman–Ford single-source shortest paths over a
  * WEIGHTED graph — the min-plus tier above q58's unweighted BFS
  * (hop counts answer "how far"; weighted distances answer "how
  * strongly connected", the relationship-strength metric co-purchase
  * analysis actually wants). Edge weight = round(1/shared-parts, 6):
  * many shared parts → short edge, so path length reads as cumulative
  * relationship looseness.
  *
  * Scale design: classic synchronous Bellman–Ford, one relax round per
  * iteration — `dist ⋈ edges` keyed on the 8-byte vertex id (the q58
  * exchange), a union with the incumbent table, one min aggregate; no
  * frontier tracking because min-plus relaxation is idempotent and the
  * dist table is vertex-sized, not path-sized. `localCheckpoint` per
  * round truncates lineage exactly like BFS/k-core/LPA. ROUNDS is fixed
  * (the q121/q57 fixed-iteration discipline, which is also what makes
  * the DuckDB oracle an exact unroll rather than an unbounded
  * recursion); distances are a lower envelope that has converged for
  * every path of ≤ ROUNDS edges — on the small-world co-purchase
  * closure, 4 rounds cover the q58-measured diameter.
  *
  * Every accumulation re-rounds to 6 (round(d + w, 6)), so a path's
  * length is the same left fold in both engines and min-plus picks
  * identical envelopes — no summation-order drift by construction
  * (min and the per-path fold are both order-pinned).
  */
object WeightedPaths {

  val Rounds = 4

  /** Weighted co-purchase edges (u < v): weight = round(1/|shared
    * parts|, 6) over the q69 df-capped projection — the projection's
    * natural tie strength, inverted into a distance.
    */
  def weightedEdges(s: SparkSession, dir: String, maxDf: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
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
      .groupBy(col("x.c").as("u"), col("y.c").as("v"))
      .agg(count(lit(1)).as("cn"))
      .select(col("u"), col("v"),
        round(lit(1.0) / col("cn"), 6).as("w"))
  }

  private val edgeMemo = graft.tools.CorpusMemo.ofDf

  /** [[weightedEdges]] memoized per (session, dir, maxDf) — the
    * [[graft.graph.Triangles.coPurchaseEdgesShared]] discipline on the
    * weighted projection its two consumers share (q146 Bellman-Ford,
    * q161 Boruvka MSF): the orders⋈lineitem distinct + df cap +
    * part-keyed self-join + weight aggregate runs once per corpus.
    * Row-identical to a rebuild; single-entry, fingerprint-keyed,
    * evict-unpersists ([[graft.tools.CorpusMemo]]).
    */
  def weightedEdgesShared(s: SparkSession, dir: String,
      maxDf: Int): DataFrame =
    edgeMemo.get(s, dir, s"maxDf=$maxDf") {
      weightedEdges(s, dir, maxDf).localCheckpoint()
    }

  /** `rounds` synchronous relax rounds from `seeds` (one column `id`):
    * (seed, id, dist) for every vertex reached within `rounds` edges.
    */
  def bellmanFord(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst"), col("w")))
      .localCheckpoint()
    var dist = seeds.select(col("id").as("seed"), col("id"),
      lit(0.0).as("dist"))
    for (_ <- 1 to rounds) {
      val relax = dist.join(und, dist("id") === und("src"))
        .select(col("seed"), col("dst").as("id"),
          round(col("dist") + col("w"), 6).as("dist"))
      dist = dist.unionByName(relax)
        .groupBy(col("seed"), col("id"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** q146: weighted distances from the 3 smallest graph vertices over
    * the co-purchase projection, ROUNDS relax rounds.
    */
  def weightedPathsQuery(s: SparkSession, dir: String): DataFrame = {
    val edges = weightedEdgesShared(s, dir, maxDf = 18)
    val seeds = edges.select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id")))
      .distinct().orderBy(col("id")).limit(3)
    bellmanFord(edges, seeds, Rounds)
      .select(col("seed"), col("id").as("cust_id"), col("dist"))
      .orderBy(col("seed"), col("cust_id"))
  }
}
