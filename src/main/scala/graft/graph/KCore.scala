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
  def kcore(undirected: DataFrame, k: Int, maxRounds: Int): DataFrame =
    kcoreCounted(undirected, k, maxRounds)._1

  /** [[kcore]] plus the rounds-to-fixpoint count (known eagerly — each
    * round materializes through the convergence `count()`); the scaling
    * audit records it, and `tools.GraphProbe` prints it per SF.
    */
  def kcoreCounted(undirected: DataFrame, k: Int, maxRounds: Int)
      : (DataFrame, Int) = {
    require(k >= 1 && maxRounds >= 1, "k and maxRounds must be positive")
    // Edge-sized iterative state checkpoints to DISK_ONLY — measured at
    // the 100× audit leg (117M-edge graph, 8g heap, SCALING.md r10):
    // the default deserialized cache OOM'd outright (~56 B per cached
    // UnsafeRow object); MEMORY_AND_DISK_SER fit at 16g but still OOM'd
    // 8g, because re-reading a spilled block PROMOTES it back through a
    // whole-block ByteBuffer allocation (BlockManager
    // maybeCacheDiskBytesInMemory) exactly when memory is scarcest.
    // DISK_ONLY never promotes: per-round state streams from local disk
    // (~2.8 GB/round here — NVMe noise) and the heap stays free for the
    // join/agg execution. Same discipline in Dedup.connectedComponents;
    // vertex-sized loops (PageRank/LPA/BFS) keep the in-memory default.
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    var e = undirected.localCheckpoint(eager = true, storageLevel = ser)
    var prev = e.count()
    var stable = false
    var round = 0
    while (!stable && round < maxRounds) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src"))
      val next = peelJoin(e, keep)
        .localCheckpoint(eager = true, storageLevel = ser)
      val n = next.count()
      // no vertex loses an edge without the edge count shrinking, so
      // |E| unchanged ⟺ no deletion this round ⟺ fixpoint
      stable = n == prev
      prev = n
      // the edge set is the LARGE state here: free the superseded round's
      // checkpoint blocks or the peel holds every round's edge copy at
      // once (the 100× OOM, see PlanWalk.freeCheckpoint)
      graft.operators.PlanWalk.freeCheckpoint(e)
      e = next
      round += 1
    }
    if (!stable) throw new IllegalStateException(
      s"$k-core peel still shrinking after $maxRounds rounds — raise maxRounds")
    (e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")), round)
  }

  /** One peel round's edge filtering: keep edges whose BOTH endpoints
    * survive. shuffle_hash on the vertex-sized survivor side: under the
    * default preference Spark picks sort-merge once `keep` outgrows the
    * broadcast threshold — measured at the 100× leg as three full sorts
    * of the 117M-row edge set per round (119 s; the plan silently
    * flipped from the broadcast semi-joins the small SFs get). Hashing
    * the survivors and STREAMING the edges drops the sorts while
    * staying scale-safe where a forced broadcast would not (the
    * survivor set is vertex-bounded, not constant-bounded) — the same
    * discipline as LabelProp's edge-layout join. PlanSpec pins the
    * no-sort-merge shape with broadcast disabled, so the hint can't be
    * silently lost in a refactor.
    */
  private[graft] def peelJoin(e: DataFrame, keep: DataFrame): DataFrame =
    e.join(keep.hint("shuffle_hash"), Seq("src"), "left_semi")
      .join(keep.select(col("src").as("dst")).hint("shuffle_hash"),
        Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))

  /** q94: the 10-core of the undirected customer–supplier purchase graph
    * — vertices whose co-purchase neighborhood survives mutual degree-10
    * pruning, with their in-core degree.
    */
  def kcoreQuery(s: SparkSession, dir: String): DataFrame = {
    val b = PageRank.purchaseEdgesIntShared(s, dir)
    val und = b.union(b.select(col("dst").as("src"), col("src").as("dst")))
    kcore(und, k = 10, maxRounds = 8)
      .select(PageRank.decodeId(col("id")).as("id"), col("deg"))
      .orderBy(col("id"))
  }
}
