package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Semi-supervised label propagation [Zhu & Ghahramani, CMU-CALD-02-107;
  * the frozen-seed variant of Raghavan et al.'s LPA, arXiv:0709.2938]:
  * a sparse seed set carries known labels; each synchronous round, every
  * still-unlabeled vertex adjacent to labeled vertices takes the majority
  * label among its labeled neighbors (ties toward the smallest label) and
  * is FROZEN from then on. Deterministic by construction — no float, no
  * RNG, no update races — which is what makes a SQL oracle possible where
  * classic oscillating LPA has none.
  *
  * Reference tie: the reference's Neo4j community queries
  * (`neo4j_test.cypher`'s graph exploration) — the label-spreading
  * counterpart of q58's distance spreading.
  *
  * 100 TB shape: per round ONE hash join keyed on the 8-byte src id
  * (frontier-sized probe side — only vertices labeled LAST round emit
  * votes... every labeled vertex re-votes here for oracle parity, see
  * below), one partial-aggregated (dst, label) count, one per-dst argmax,
  * one anti-join against the labeled set; `localCheckpoint` truncates the
  * lineage per round exactly like BFS/k-core. Vote counts are integers —
  * the argmax needs no rounding discipline at all.
  */
object LabelProp {

  /** Propagate `seeds` (id, label) over undirected `edges` (src, dst) for
    * exactly `rounds` synchronous rounds. Returns (id, label, round) with
    * round = 0 for seeds, r for vertices first labeled in round r.
    */
  def propagate(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    // pre-partition the symmetrized edge set by src ONCE and cache that
    // layout (the BFS trick): each round's vote join reuses the cached
    // HashPartitioning and shuffles only the vertex-sized labeled set;
    // shuffle_hash keeps it a hash probe instead of re-sorting the edges
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src")).cache()
    var labeled = seeds.select(col("id"), col("label"), lit(0).as("round"))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      // drop votes aimed at already-labeled vertices BEFORE the count —
      // they are frozen, so their winners would be discarded anyway
      val votes = e
        .join(labeled.select(col("id").as("src"), col("label"))
          .hint("shuffle_hash"), Seq("src"))
        .join(labeled.select(col("id").as("dst")).hint("shuffle_hash"),
          Seq("dst"), "left_anti")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
      val fresh = votes
        .groupBy(col("dst").as("id"))
        .agg(min(struct((-col("c")).as("neg"), col("label")))
          .getField("label").as("label"))
        .select(col("id"), col("label"), lit(r).as("round"))
      labeled = labeled.union(fresh).localCheckpoint()
    }
    e.unpersist()
    labeled
  }

  /** q121: region labels seeded on every 10th customer, spread over the
    * undirected purchase graph for 3 rounds; ids decoded on the final
    * vertex-sized projection only.
    */
  def regionPropagationQuery(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.customer(s, dir)
      .filter(col("c_custkey") % 10 === 0)
      .join(Tables.nation(s, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select((col("c_custkey") * 2).as("id"), col("n_regionkey").as("label"))
    propagate(PageRank.purchaseEdgesIntShared(s, dir), seeds, rounds = 3)
      .select(PageRank.decodeId(col("id")).as("id"), col("label"),
        col("round"))
      .orderBy(col("id"))
  }
}
