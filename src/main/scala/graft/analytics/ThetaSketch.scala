package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** KMV/Theta distinct-value sketch with SET OPERATIONS — the member of the
  * engine's mergeable-sketch suite (HLL q31/q82, Count–Min q141,
  * Misra–Gries q93, Bloom q96, top-k q66) that HLL cannot replace:
  * k-minimum-values sketches support estimated INTERSECTION and UNION
  * between groups [Bar-Yossef et al., "Counting distinct elements in a
  * data stream", RANDOM 2002; the θ-sketch generalization of Dasgupta et
  * al., "Theta sketch framework", 2016 — the design behind Apache
  * DataSketches' theta family], which is what corpus-overlap questions
  * actually need.
  *
  * Reference tie: the cross-source containment diagnostic q117
  * (`dedup/SourceOverlap.scala`) is the EXACT twin — this is its sketch
  * path. q117 shuffles every distinct (source, shingle) pair and
  * self-joins on the shingle key; at 100 TB that join is the bill. The
  * sketch pass reduces each source to k=128 hashes FIRST (the map-side-
  * collapsing [[graft.functions.TopKAggregate]] — the exchange carries
  * ≤ k rows per source), after which every pairwise estimate is
  * arithmetic on dimension-sized (|sources| × k) frames. The driver row
  * keeps q117's exact `n_common` alongside the estimates (the q82
  * est-vs-exact discipline) so every round documents the sketch error on
  * real data; at scale the exact column is the one you drop.
  *
  * Determinism/oracle: the element hash is the engine's polynomial
  * rolling hash (q23 fingerprint) spread by the [[graft.functions
  * .VectorHash]] quadratic-congruential mixer over the Mersenne prime —
  * pure BIGINT arithmetic, so the DuckDB oracle replays sketch build,
  * θ thresholds, and every estimate bit-for-bit (the q141/q82 pattern).
  *
  * KMV math (k-th minimum value, strict-θ sample):
  *  - per group keep the k smallest distinct hashes h ∈ [0, P);
  *  - θ_g = h_(k) (the k-th smallest) if the group has ≥ k distinct
  *    hashes, else P (exact mode — the sketch IS the set);
  *  - sample_g = {h ∈ sketch : h < θ_g} (k−1 values, or all in exact mode);
  *  - pair (a, b): θ = min(θ_a, θ_b); S∩ = sample_a ∩ sample_b ∩ [0, θ);
  *    S∪ = (sample_a ∪ sample_b) ∩ [0, θ); estimate |A∩B| ≈ |S∩|·P/θ and
  *    |A∪B| ≈ |S∪|·P/θ (unbiased at θ < P, exact at θ = P up to hash
  *    collisions); Jaccard ≈ |S∩|/|S∪| directly (the θ terms cancel).
  */
object ThetaSketch {

  /** Sketch size: rsd ≈ 1/√(k−1) ≈ 8.9%. */
  val K = 128

  /** Element hash: rolling-hash fingerprint ∈ [0, 1e9+7) spread by the
    * quadratic mixer to h ∈ [0, P). fp < P already, so no pre-reduction;
    * A₁·fp < 5.1e17 and every later intermediate < P² ≈ 4.6e18 — Spark
    * longs and DuckDB BIGINTs agree exactly.
    */
  def thetaHash(s: Column): Column =
    mixFingerprint(GraftFunctions.fingerprint(s))

  /** The quadratic-congruential spread over an ALREADY-computed rolling-
    * hash fingerprint — split out so the sketch build can ride the
    * one-pass window-fingerprint kernel (`graft_shingle_fps`).
    */
  def mixFingerprint(fp: Column): Column = {
    import graft.functions.VectorHash._
    val m1 = (lit(PlaneA1) * fp + lit(PlaneB1)) % lit(PlaneP)
    val m2 = (m1 * m1) % lit(PlaneP)
    (lit(PlaneA2) * m2 + m1) % lit(PlaneP)
  }

  /** Per-source KMV sketches over distinct word-`shingleK`-shingle hashes:
    * (source, n_h ≥ |sketch|, hs ascending ≤ k hashes, theta).
    *
    * One exchange for the hash distinct (collisions collapse here —
    * deterministically, in both engines), then the top-k aggregate
    * collapses map-side to ≤ k rows per source; no window over the corpus.
    */
  def sourceSketches(docs: DataFrame, k: Int, shingleK: Int): DataFrame = {
    import graft.functions.VectorHash.PlaneP
    GraftFunctions.register(docs.sparkSession)
    val toks = graft.text.TextOps.tokens(col("text"))
    // window fingerprints in one compiled pass (the q27 shingle-layer
    // discipline — ShingleFingerprintSpec pins equality with the
    // fingerprint-of-concat shape the oracle replays), mixer on top
    val hashes = docs
      .select(col("source"), toks.as("toks"))
      .filter(size(col("toks")) >= shingleK)
      .select(col("source"),
        explode(GraftFunctions.shingleFps(col("toks"), shingleK)).as("fp"))
      .select(col("source"), mixFingerprint(col("fp")).as("h"))
      .distinct()
    hashes
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"),
        GraftFunctions.topk(struct((-col("h")).as("negh")), k).as("top"))
      .select(col("source"), col("n_h"),
        array_sort(transform(col("top"), t => -t.getField("negh"))).as("hs"))
      .withColumn("theta",
        when(col("n_h") < k, lit(PlaneP)).otherwise(element_at(col("hs"), k)))
  }

  /** Pairwise estimated overlap between sources — and, when `exactCheck`
    * is on, q117's exact distinct-shingle common count joined in as
    * ground truth: (source_a, source_b, est_common, est_union,
    * est_jaccard[, exact_common]), all pairs a < b.
    *
    * `exactCheck = false` is the production-scale mode: it skips the
    * q117-shape corpus-scale shingle self-join entirely, so the whole
    * query after the sketch build is arithmetic on |sources|×k frames —
    * the flat curve the sketch exists to buy (PlanSpec pins that the
    * sketch-only plan contains exactly one corpus-side exchange: the
    * distinct; SCALING.md carries its 10×/100× legs). The default stays
    * `true` because the driver-gated q142 row deliberately publishes the
    * sketch error against measured truth each round (the q82 discipline).
    */
  def thetaOverlap(docs: DataFrame, k: Int = K, shingleK: Int = 5,
                   exactCheck: Boolean = true): DataFrame = {
    import graft.functions.VectorHash.PlaneP
    val sk = sourceSketches(docs, k, shingleK)
      .withColumn("sample", filter(col("hs"), x => x < col("theta")))
      .select(col("source"), col("sample"), col("theta"))
      .localCheckpoint() // |sources| rows; both sides of the pair join
    val pairs = sk.as("a")
      .crossJoin(sk.as("b"))
      .filter(col("a.source") < col("b.source"))
      .withColumn("th", least(col("a.theta"), col("b.theta")))
      .withColumn("sa", filter(col("a.sample"), x => x < col("th")))
      .withColumn("sb", filter(col("b.sample"), x => x < col("th")))
      .withColumn("n_i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("n_u", size(array_union(col("sa"), col("sb"))).cast("long"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        round((col("n_i") * lit(PlaneP)).cast("double") / col("th"))
          .cast("long").as("est_common"),
        round((col("n_u") * lit(PlaneP)).cast("double") / col("th"))
          .cast("long").as("est_union"),
        when(col("n_u") === 0L, lit(0.0))
          .otherwise(round(col("n_i").cast("double") / col("n_u"), 4))
          .as("est_jaccard"))
    if (!exactCheck)
      pairs.select(col("source_a"), col("source_b"), col("est_common"),
          col("est_union"), col("est_jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    else {
      // exact twin (q117 shape); pairs sharing no shingle are absent there
      val exact = graft.dedup.SourceOverlap.sourceOverlap(docs, shingleK)
        .select(col("source_a"), col("source_b"),
          col("n_common").as("exact_common"))
      pairs.join(exact, Seq("source_a", "source_b"), "left")
        .select(col("source_a"), col("source_b"), col("est_common"),
          col("est_union"), col("est_jaccard"),
          coalesce(col("exact_common"), lit(0L)).as("exact_common"))
        .orderBy(col("source_a"), col("source_b"))
    }
  }

  def thetaOverlapQuery(s: SparkSession, dir: String): DataFrame =
    thetaOverlap(Tables.documents(s, dir))

  /** q153: the sketch-only production mode — same estimates, no exact
    * twin, so the whole post-sketch query is |sources|×k arithmetic
    * (SCALING.md carries its flat 10×/100× curve next to q142's).
    */
  def thetaSketchOnlyQuery(s: SparkSession, dir: String): DataFrame =
    thetaOverlap(Tables.documents(s, dir), exactCheck = false)
}
