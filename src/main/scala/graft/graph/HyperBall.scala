package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HyperBall neighborhood function [Boldi & Vigna, "In-Core Computation
  * of Geometric Centralities with HyperBall", 2013; Palmer et al.'s ANF
  * is the exact-bitmap ancestor]: per-vertex HyperLogLog registers
  * propagated along edges, so after h rounds vertex v's sketch
  * estimates |ball(v, h)| — the number of vertices within distance h.
  * Summing over v gives the neighborhood function N(h), the curve
  * behind effective-diameter and average-distance estimates.
  *
  * Why this exists at 100 TB: the EXACT neighborhood function
  * materializes the reachable-pair set — Θ(|V|²) rows on any graph
  * with a giant component, dead on arrival at scale. HyperBall stores
  * m = 64 fixed-width register cells per vertex and each round costs
  * ONE join of the register table with the edge list plus ONE
  * (v, bucket) max-aggregation — linear state, mergeable combine,
  * map-side partial max. The exact pair iteration rides along here as
  * the verification twin (q142's lesson applied from the start: it has
  * an off switch — `exactCheck = false` skips every pair-scale plan).
  *
  * Determinism/oracle: same integer quadratic mixer as the q82 sketch
  * (`analytics.Hll` — mod-2³¹−1 arithmetic DuckDB replays exactly),
  * 6 bucket bits, ρ ∈ [1, 26] from the remaining 25 hash bits. The
  * oracle unrolls the propagation rounds as SQL max-merges, so the
  * ESTIMATES match bit-for-bit, not just the exact column.
  */
object HyperBall {

  import graft.analytics.Hll.P

  /** Registers per vertex (6 bucket bits) — HyperBall runs many small
    * sketches, so m = 64 (rsd ≈ 13%) is the classic space/error point,
    * not q82's m = 1024 (one sketch per corpus slice can afford 3%).
    */
  val M: Int = 64

  /** (P−1) >> 6 < 2²⁵, so ρ ∈ [1, 26]. */
  val WBits: Int = 25

  /** α₆₄ · m² · 2²⁶ — the raw-estimate numerator (α₆₄ = 0.709, the
    * published small-m constant). The oracle embeds
    * `Double.toString(AlphaNum)` so both engines divide the SAME double.
    */
  val AlphaNum: Double = 0.709 * 64.0 * 64.0 * 67108864.0

  /** The q82/q141 quadratic mixer (mod 2³¹−1), shared so the oracle's
    * integer replay is already proven.
    */
  private def mix(id: Column): Column = {
    val m1 = (lit(506952114L) * (((id % P) + P) % P) + lit(1013904223L)) % P
    (lit(1566083941L) * ((m1 * m1) % P) + m1) % P
  }

  private def rho(h: Column): Column = {
    val w = shiftright(h, 6)
    lit(WBits + 1) - when(w === 0L, lit(0)).otherwise(length(bin(w)))
  }

  /** Hop-0 register table: each vertex's sketch holds exactly its own
    * hash — one (v, bucket, reg) cell per vertex (registers are sparse;
    * absent cells are zero, exactly as in `analytics.HllRollup`).
    */
  def vertexRegisters(vertices: DataFrame): DataFrame =
    vertices.select(col("v"), mix(col("v")).as("h"))
      .select(col("v"), col("h").bitwiseAND(lit(63L)).as("bucket"),
        rho(col("h")).as("reg"))

  /** One HyperBall round: v's sketch absorbs every out-neighbor's
    * sketch (register-wise max). `edges` must already be bidirectional
    * for undirected semantics. One shuffle on the neighbor key, one
    * (v, bucket) max — both partial-aggregate map-side.
    */
  def propagate(regs: DataFrame, edges: DataFrame): DataFrame =
    regs.unionByName(
        edges.join(regs.withColumnRenamed("v", "nb"),
            col("v") === col("nb")) // regs of the neighbor end...
          .select(col("u").as("v"), col("bucket"), col("reg")))
      .groupBy(col("v"), col("bucket")).agg(max(col("reg")).as("reg"))

  /** One SYSTOLIC HyperBall round [Boldi & Vigna §4.1 — their own key
    * optimization]: v's sketch absorbs only the register cells that
    * INCREASED last round (`delta`). Every unchanged neighbor cell was
    * already absorbed the round it last changed, and max is idempotent,
    * so the merged registers are BIT-IDENTICAL to the dense
    * [[propagate]] — while the edges-side join volume shrinks round
    * over round as balls saturate (the changed-cell frontier dies out
    * at the component diameter). At 100 TB this is the difference
    * between every round costing |E|·64 and only round 1 costing it.
    *
    * The next frontier costs NO extra pass: the same (v, bucket)
    * aggregate that merges the max also tracks the old-cell max, so
    * new regs and new delta are two projections of ONE checkpointed
    * result — same memory/checkpoint footprint as the dense round.
    *
    * Checkpoint discipline: register state is |V|·64 cells — edge-ish
    * sized at the 100× audit leg — and EVERY hop's registers feed the
    * final per-hop output (superseded rounds can't be freed the KCore
    * way), so the round checkpoints DISK_ONLY: the q94 lesson —
    * deserialized/promoting caches hold the heap hostage exactly when
    * the register⋈edges exchange needs it; disk-resident rounds stream
    * back once each at final execution.
    */
  def systolicRound(regs: DataFrame, delta: DataFrame,
                    edges: DataFrame): DataFrame =
    regs.withColumn("is_old", lit(true))
      .unionByName(
        edges.join(delta.withColumnRenamed("v", "nb"),
            col("v") === col("nb")) // changed cells of the neighbor end
          .select(col("u").as("v"), col("bucket"), col("reg"))
          .withColumn("is_old", lit(false)))
      .groupBy(col("v"), col("bucket"))
      .agg(max(col("reg")).as("reg"),
        max(when(col("is_old"), col("reg"))).as("old_reg"))
      .localCheckpoint(eager = true,
        storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY)

  /** The register projection of a [[systolicRound]] result. */
  def roundRegs(merged: DataFrame): DataFrame =
    merged.select(col("v"), col("bucket"), col("reg"))

  /** The changed-cell frontier projection of a [[systolicRound]]
    * result: cells newly present or strictly above their pre-round
    * value — the only cells the next round must push along edges.
    */
  def roundDelta(merged: DataFrame): DataFrame =
    merged.where(col("old_reg").isNull || col("reg") > col("old_reg"))
      .select(col("v"), col("bucket"), col("reg"))

  /** Per-vertex ball-size estimates from a (v, bucket, reg) table —
    * the m = 64 estimator (linear counting below 2.5·m, the regime
    * almost every ball in a sparse graph lives in).
    */
  def estimateBalls(regs: DataFrame): DataFrame =
    regs.groupBy(col("v"))
      .agg(count(lit(1)).as("used"),
        expr("sum(shiftleft(CAST(1 AS BIGINT), 26 - reg))").as("s_part"))
      .select(col("v"), col("used"),
        (lit(AlphaNum) / (col("s_part")
          + (lit(M.toLong) - col("used")) * lit(1L << 26)).cast("double"))
          .as("raw"))
      .select(col("v"),
        round(when(col("raw") <= lit(2.5 * M) && col("used") < M,
          lit(M.toDouble)
            * log(lit(M.toDouble) / (lit(M.toLong) - col("used"))
              .cast("double")))
          .otherwise(col("raw"))).cast("long").as("est_ball"))

  /** Neighborhood function over `edges` (directed rows; pass both
    * directions for undirected): one row per hop h ∈ [0, hops] with the
    * HyperBall estimate of Σ_v |ball(v, h)|. With `exactCheck` the
    * exact reachable-pair iteration rides along (test scale only — the
    * pair table is the Θ(|V|²) object the sketch exists to avoid);
    * without it no pair-scale plan is built.
    */
  def neighborhood(edges: DataFrame, hops: Int,
                   exactCheck: Boolean): DataFrame = {
    // union BOTH endpoints: on directed input a zero-out-degree vertex
    // still owns a ball (itself + nothing), and dropping it from the
    // register table undercounts N(h); on bidirectional input the union
    // is a no-op (every v appears as a u), so hashes are unchanged
    val verts = edges.select(col("u").as("v"))
      .unionByName(edges.select(col("v"))).distinct()
    var regs = vertexRegisters(verts).localCheckpoint()
    var delta = regs // hop 0: every cell is new
    var reach = verts.select(col("v").as("a"), col("v").as("b"))
      .localCheckpoint()
    val perHop = (0 to hops).map { h =>
      if (h > 0) {
        val merged = systolicRound(regs, delta, edges)
        regs = roundRegs(merged); delta = roundDelta(merged)
        if (exactCheck)
          reach = reach.unionByName(
              reach.join(edges, col("b") === col("u"))
                .select(col("a"), col("v").as("b")))
            .distinct().localCheckpoint()
      }
      val est = estimateBalls(regs)
        .agg(sum(col("est_ball")).as("est_reach"))
        .select(lit(h.toLong).as("h"), col("est_reach"))
      if (exactCheck)
        est.crossJoin(reach.agg(count(lit(1)).as("exact_reach")))
      else est
    }
    val all = perHop.reduce(_ unionByName _)
    val out =
      if (exactCheck)
        all.select(col("h"), col("est_reach"), col("exact_reach"),
          round((col("est_reach") - col("exact_reach")) * 100.0
            / col("exact_reach"), 4).as("err_pct"))
      else all
    out.orderBy(col("h"))
  }

  /** Neighborhood function with a PROBE-SET exact twin (the q126
    * discipline): the full-graph estimate column is unchanged — the
    * registers are the same bit-identical systolic propagation — but
    * the exact verification iterates reachable pairs only from the
    * `nProbes` smallest vertex ids, so its state is Θ(probes·ball)
    * instead of the Θ(|V|²) full pair set that made the exact twin the
    * single most expensive gate at bench scale. Output per hop:
    * (h, est_reach, probe_est, probe_exact, err_pct) where err compares
    * the probe-scoped estimate against the probe-scoped truth.
    */
  def neighborhoodProbed(edges: DataFrame, hops: Int,
                         nProbes: Int): DataFrame = {
    val verts = edges.select(col("u").as("v"))
      .unionByName(edges.select(col("v"))).distinct()
    // deterministic probe set: the nProbes smallest vertex ids
    // (TakeOrderedAndProject over the vertex table — never a full sort)
    val probes = verts.orderBy(col("v")).limit(nProbes).localCheckpoint()
    var regs = vertexRegisters(verts).localCheckpoint()
    var delta = regs // hop 0: every cell is new
    var reach = probes.select(col("v").as("a"), col("v").as("b"))
      .localCheckpoint()
    val perHop = (0 to hops).map { h =>
      if (h > 0) {
        val merged = systolicRound(regs, delta, edges)
        regs = roundRegs(merged); delta = roundDelta(merged)
        reach = reach.unionByName(
            reach.join(edges, col("b") === col("u"))
              .select(col("a"), col("v").as("b")))
          .distinct().localCheckpoint()
      }
      val balls = estimateBalls(regs).localCheckpoint()
      balls.agg(sum(col("est_ball")).as("est_reach"))
        .select(lit(h.toLong).as("h"), col("est_reach"))
        .crossJoin(balls.join(broadcast(probes), Seq("v"))
          .agg(sum(col("est_ball")).as("probe_est")))
        .crossJoin(reach.agg(count(lit(1)).as("probe_exact")))
    }
    perHop.reduce(_ unionByName _)
      .select(col("h"), col("est_reach"), col("probe_est"),
        col("probe_exact"),
        round((col("probe_est") - col("probe_exact")) * 100.0
          / col("probe_exact"), 4).as("err_pct"))
      .orderBy(col("h"))
  }

  /** Probe count for the q177 gate: enough balls to pin the estimator
    * on every branch, bounded so the exact column stays O(64·ball).
    */
  val Q177Probes: Int = 64

  /** The shared register state of the 3-hop co-purchase reach suite:
    * the bidirectional q69 edge list plus the per-hop register tables
    * of the systolic propagation (hop 0 = own hash; hops 1..3 merged).
    */
  case class ReachState(edges: DataFrame, hopRegs: IndexedSeq[DataFrame])

  /** Reach-suite hops, shared by q177/q183/q187. */
  val ReachHops: Int = 3

  private val reachMemo = new graft.tools.CorpusMemo[ReachState](
    // edges is this memo's own bidirectional checkpoint (derived from —
    // but block-independent of — Triangles' memoized frame), so it is
    // freed here along with the hop registers
    st => st.edges +: st.hopRegs)

  /** The co-purchase [[ReachState]], memoized per (session, dir) —
    * single entry, fingerprint-keyed, evict-unpersists its hop
    * registers ([[graft.tools.CorpusMemo]]) so fuzz sweeps don't
    * pin 20 seeds of checkpoints. q177, q183 and q187 all consume the
    * SAME propagation (same graph, same rounds); before the share,
    * every bench pass re-ran the identical systolic chain three times.
    * Registers are a pure function of the graph and every consumer
    * reads the same checkpointed tables, so sharing cannot change a
    * byte of any result — the three oracles pin that.
    */
  def coPurchaseReach(s: SparkSession, dir: String): ReachState =
    reachMemo.get(s, dir) {
          val e = Triangles.coPurchaseEdgesShared(s, dir, maxDf = 18)
          val bi = e.select(col("u"), col("v"))
            .unionByName(e.select(col("v").as("u"), col("u").as("v")))
            .localCheckpoint()
          val verts = bi.select(col("u").as("v"))
            .unionByName(bi.select(col("v"))).distinct()
          var regs = vertexRegisters(verts).localCheckpoint()
          var delta = regs // hop 0: every cell is new
          val hops = IndexedSeq.newBuilder[DataFrame]
          hops += regs
          for (_ <- 1 to ReachHops) {
            val merged = systolicRound(regs, delta, bi)
            regs = roundRegs(merged); delta = roundDelta(merged)
            hops += regs
          }
          ReachState(bi, hops.result())
    }

  /** q177: the neighborhood function of the q69 co-purchase graph to
    * 3 hops — full-graph estimates per hop, verified exactly on a
    * 64-vertex probe set (the full Θ(|V|²) exact twin lives in
    * [[neighborhood]] for spec-scale graphs; here it would dominate
    * every bench run forever — the q126 probe discipline instead).
    * Registers come from the shared [[coPurchaseReach]] propagation;
    * only the probe-reach iteration is q177's own cost.
    */
  def hllReachQuery(s: SparkSession, dir: String): DataFrame = {
    val st = coPurchaseReach(s, dir)
    val verts = st.edges.select(col("u").as("v"))
      .unionByName(st.edges.select(col("v"))).distinct()
    // deterministic probe set: the nProbes smallest vertex ids
    val probes = verts.orderBy(col("v")).limit(Q177Probes).localCheckpoint()
    var reach = probes.select(col("v").as("a"), col("v").as("b"))
      .localCheckpoint()
    val perHop = (0 to ReachHops).map { h =>
      if (h > 0)
        reach = reach.unionByName(
            reach.join(st.edges, col("b") === col("u"))
              .select(col("a"), col("v").as("b")))
          .distinct().localCheckpoint()
      val balls = estimateBalls(st.hopRegs(h)).localCheckpoint()
      balls.agg(sum(col("est_ball")).as("est_reach"))
        .select(lit(h.toLong).as("h"), col("est_reach"))
        .crossJoin(balls.join(broadcast(probes), Seq("v"))
          .agg(sum(col("est_ball")).as("probe_est")))
        .crossJoin(reach.agg(count(lit(1)).as("probe_exact")))
    }
    perHop.reduce(_ unionByName _)
      .select(col("h"), col("est_reach"), col("probe_est"),
        col("probe_exact"),
        round((col("probe_est") - col("probe_exact")) * 100.0
          / col("probe_exact"), 4).as("err_pct"))
      .orderBy(col("h"))
  }

  /** q183: the sketch-only twin — the plan a 100 TB run uses (the
    * exact pair set is Θ(|V|²); registers are |V|·64 cells). Same
    * registers, same estimates; SCALING.md carries its 10×/100× legs.
    */
  def hllReachSketchQuery(s: SparkSession, dir: String): DataFrame = {
    val st = coPurchaseReach(s, dir)
    st.hopRegs.zipWithIndex.map { case (r, h) =>
      estimateBalls(r).agg(sum(col("est_ball")).as("est_reach"))
        .select(lit(h.toLong).as("h"), col("est_reach"))
    }.reduce(_ unionByName _).orderBy(col("h"))
  }
}
