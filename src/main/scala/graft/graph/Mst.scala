package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Borůvka minimum-spanning-forest over a weighted undirected graph —
  * the backbone-extraction operator for similarity/relationship graphs
  * (the MST of a co-purchase or near-dup graph is its "skeleton": the
  * strongest tie structure with every cycle's weakest link removed, and
  * single-linkage clustering's dendrogram is exactly this forest).
  *
  * Algorithm [Borůvka 1926; the canonical parallel MST — each round
  * every component picks its minimum outgoing edge, components merge
  * along picked edges, component count at least halves, so ≤ log₂ V
  * rounds]. Edge comparison is the LEXICOGRAPHIC total order
  * (w, u, v) — all edges distinct, so the MSF is UNIQUE and both the
  * cycle and cut properties hold exactly; the DuckDB oracle exploits
  * this by testing each edge against the CUT PROPERTY independently
  * (edge ∈ MSF ⟺ its endpoints are disconnected in the strictly-lighter
  * subgraph) — a completely different algorithm, so agreement is a
  * two-algorithm proof, not a mirror.
  *
  * Scale design: per round, ONE edges⋈labels join (keyed on the 8-byte
  * vertex id, the q58/q146 exchange) + one per-component min aggregate
  * (component-count-sized exchange); component labeling of the chosen
  * forest reuses [[graft.dedup.Dedup.connectedComponents]] —
  * star-contraction, O(log n) rounds on any topology, the q40 machinery
  * with its 100×-audited DISK_ONLY checkpoint discipline. The
  * driver-side loop runs ≤ maxRounds scalar emptiness checks (the
  * legitimate 1-row pattern, same as CC's convergence fingerprint).
  */
object Mst {

  /** The minimum spanning forest of `edges` (`u`, `v`, `w`; undirected,
    * u ≠ v, one row per edge) under the (w, u, v) lexicographic order.
    * Returns the chosen edges (`u`, `v`, `w`).
    *
    * Labels are maintained INCREMENTALLY: each round contracts on the
    * COMPONENT graph (the selected min-edges viewed as edges between
    * current component ids — ≤ #components rows, a set that at least
    * halves per round), never re-clustering the accumulated vertex-scale
    * forest. Total contraction work is therefore O(V) across all rounds
    * (geometric series), and the only vertex-scale joins are the
    * per-round cross-edge relabel and the final label application —
    * the first cut re-ran full star-contraction CC over the whole
    * chosen forest every round and its 100× leg showed it.
    */
  def boruvka(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    // Edges CARRY their current endpoint component labels (cu, cv), and
    // each round keeps only the edges still CROSSING after contraction.
    // Components only merge, so an edge whose endpoints ever share a
    // component can never cross again — the per-round working set is the
    // shrinking cross set (geometric total work), where the previous
    // formulation re-joined the FULL edge set against a vertex-sized
    // label table every round (two O(E) exchanges per round) and
    // re-checkpointed the growing chosen set (O(V·rounds) rewrites).
    // The vertex-sized component map is never needed at all: only edge
    // endpoint labels drive the pick, and only the chosen edges are
    // returned.
    var cross = edges.select(col("u"), col("v"), col("w"),
        col("u").as("cu"), col("v").as("cv"))
      .filter(col("cu") =!= col("cv"))
      .localCheckpoint(eager = true, storageLevel = ser)
    var chosenParts = List.empty[DataFrame]
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      if (cross.isEmpty) done = true
      else {
        // per-component minimum outgoing edge under (w, u, v) — struct
        // min IS the lexicographic min; the unique (w, u, v) prefix
        // decides, the component ids just ride along for contraction
        val key = struct(col("w"), col("u"), col("v"),
          col("cu"), col("cv"))
        val sel = cross.select(col("cu").as("comp"), key.as("k"))
          .unionByName(cross.select(col("cv").as("comp"), key.as("k")))
          .groupBy(col("comp")).agg(min(col("k")).as("k"))
          .select(col("k.u").as("u"), col("k.v").as("v"),
            col("k.w").as("w"), col("k.cu").as("cu"), col("k.cv").as("cv"))
          .distinct() // both endpoints' components may pick the same edge
          .localCheckpoint(eager = true, storageLevel = ser)
        // chosen edges accumulate LAZILY (unioned once at the end): each
        // sel is already checkpointed, so deferring the union avoids
        // rewriting the accumulated forest every round
        chosenParts = sel.select(col("u"), col("v"), col("w")) :: chosenParts
        // contract: CC over the component-id graph of this round's picks
        // (component-count-sized, at least halves per round)
        val lbl = graft.dedup.Dedup.connectedComponents(
          sel.select(col("cu").as("id_a"), col("cv").as("id_b")))
          .select(col("doc_id").as("c"), col("cluster_id").as("c2"))
          .localCheckpoint(eager = true, storageLevel = ser)
        val nextCross = cross
          .join(lbl.select(col("c").as("cu"), col("c2").as("cu2")),
            Seq("cu"), "left")
          .join(lbl.select(col("c").as("cv"), col("c2").as("cv2")),
            Seq("cv"), "left")
          .select(col("u"), col("v"), col("w"),
            coalesce(col("cu2"), col("cu")).as("cu"),
            coalesce(col("cv2"), col("cv")).as("cv"))
          .filter(col("cu") =!= col("cv"))
          .localCheckpoint(eager = true, storageLevel = ser)
        graft.operators.PlanWalk.freeCheckpoint(cross)
        cross = nextCross
        graft.operators.PlanWalk.freeCheckpoint(lbl)
      }
      round += 1
    }
    if (!done) throw new IllegalStateException(
      s"boruvka did not converge in $maxRounds rounds — raise maxRounds " +
        "(components at least halve per round, so this means > " +
        s"2^$maxRounds initial components or a bug)")
    if (chosenParts.isEmpty)
      edges.select(col("u"), col("v"), col("w")).limit(0)
    else chosenParts.reduce(_ unionByName _)
  }

  /** q161: the minimum spanning forest of the q146 weighted co-purchase
    * graph — its single-linkage backbone. Forest edges + each one's
    * round weight, plus the component label both endpoints collapse to
    * under the forest (= single-linkage cluster at full merge height).
    */
  def mstQuery(s: SparkSession, dir: String): DataFrame = {
    val edges = WeightedPaths.weightedEdgesShared(s, dir, maxDf = 18)
    boruvka(edges)
      .orderBy(col("u"), col("v"))
      .select(col("u").as("cust_u"), col("v").as("cust_v"), col("w"))
  }
}
