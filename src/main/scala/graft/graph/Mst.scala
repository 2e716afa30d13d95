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
    val e0 = edges.select(col("u"), col("v"), col("w"))
      .localCheckpoint(eager = true, storageLevel = ser)
    var comp = e0.select(col("u").as("id"))
      .unionByName(e0.select(col("v").as("id"))).distinct()
      .select(col("id"), col("id").as("c"))
      .localCheckpoint(eager = true, storageLevel = ser)
    var chosen = e0.limit(0).localCheckpoint(eager = true, storageLevel = ser)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val cross = e0
        .join(comp.select(col("id").as("u"), col("c").as("cu")), Seq("u"))
        .join(comp.select(col("id").as("v"), col("c").as("cv")), Seq("v"))
        .filter(col("cu") =!= col("cv"))
        .localCheckpoint(eager = true, storageLevel = ser)
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
        val nextChosen = chosen
          .unionByName(sel.select(col("u"), col("v"), col("w")))
          .localCheckpoint(eager = true, storageLevel = ser)
        // contract: CC over the component-id graph of this round's picks
        val lbl = graft.dedup.Dedup.connectedComponents(
          sel.select(col("cu").as("id_a"), col("cv").as("id_b")))
          .select(col("doc_id").as("c"), col("cluster_id").as("c2"))
        val nextComp = comp.join(lbl, Seq("c"), "left")
          .select(col("id"), coalesce(col("c2"), col("c")).as("c"))
          .localCheckpoint(eager = true, storageLevel = ser)
        graft.operators.PlanWalk.freeCheckpoint(chosen)
        graft.operators.PlanWalk.freeCheckpoint(comp)
        graft.operators.PlanWalk.freeCheckpoint(sel)
        chosen = nextChosen
        comp = nextComp
      }
      graft.operators.PlanWalk.freeCheckpoint(cross)
      round += 1
    }
    if (!done) throw new IllegalStateException(
      s"boruvka did not converge in $maxRounds rounds — raise maxRounds " +
        "(components at least halve per round, so this means > " +
        s"2^$maxRounds initial components or a bug)")
    chosen
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
