package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete vertices
  * of degree < k (and their edges) until the remainder is stable — the
  * standard "dense cohesive subgraph" extractor (community cores, spam
  * farms, co-purchase backbones; generalizes the degree checks of
  * q13/q69's graph family).
  *
  * Each round is two bounded steps over the shrinking edge set: a grouped
  * degree count (map-side combined, shuffles (vertex, partial) pairs) and
  * a semi-join of edges against surviving vertices on each endpoint.
  * `localCheckpoint` cuts the plan per round — the round-R lineage would
  * otherwise nest R copies of the join DAG (same discipline as PageRank /
  * CC / BFS). The one `.count()` per round is the scalar convergence
  * probe, not a data collect, and doubles as the checkpoint
  * materialization.
  *
  * Rounds-to-fixpoint is data-dependent (a path graph peels O(n) rounds);
  * like BFS's truncation guard, the operator THROWS if maxRounds passes
  * without stabilizing rather than return a non-core remainder. On
  * near-bipartite purchase graphs the peel stabilizes in 1-2 effective
  * rounds (measured at all test SFs).
  */
object KCore {

  /** @param undirected symmetrized (src, dst) edge set — one row per
    *                    direction, no duplicates; degree = row count per src
    */
  def kcore(undirected: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    require(k >= 1 && maxRounds >= 1, "k and maxRounds must be positive")
    var e = undirected.localCheckpoint()
    var prev = e.count()
    var stable = false
    var round = 0
    while (!stable && round < maxRounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src"))
      val next = e
        .join(keep, Seq("src"), "left_semi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val n = next.count()
      // no vertex loses an edge without the edge count shrinking, so
      // |E| unchanged ⟺ no deletion this round ⟺ fixpoint
      stable = n == prev
      prev = n
      e = next
      round += 1
    }
    if (!stable) throw new IllegalStateException(
      s"$k-core peel still shrinking after $maxRounds rounds — raise maxRounds")
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** q94: the 10-core of the undirected customer–supplier purchase graph
    * — vertices whose co-purchase neighborhood survives mutual degree-10
    * pruning, with their in-core degree.
    */
  def kcoreQuery(s: SparkSession, dir: String): DataFrame = {
    val b = PageRank.purchaseEdgesInt(s, dir)
    val und = b.union(b.select(col("dst").as("src"), col("src").as("dst")))
    kcore(und, k = 10, maxRounds = 8)
      .select(PageRank.decodeId(col("id")).as("id"), col("deg"))
      .orderBy(col("id"))
  }
}
