package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization (PQ) — the industry-standard embedding
  * compression for billion-vector ANN (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split each
  * d-dim vector into M d/M-dim SUBSPACES, run k-means independently in
  * each, and store a vector as M small centroid codes (here 8 × 4 bits
  * = 4 bytes for a 64-dim float vector, 64×). Search runs in code
  * space via ADC (asymmetric distance computation): per query, a tiny
  * M×K table of query-subvector→centroid distances, then every
  * database vector's distance is M table lookups summed — no float
  * vector is ever touched again. This completes the engine's vector
  * tier: q118 scalar-quantizes (4×), q37/q134 coarse-quantize for
  * routing; PQ is the in-list storage/search format those systems pair
  * with (IVF-PQ).
  *
  * Exactness discipline: training follows the q37 Lloyd contract
  * (hash-ordered init from [[Similarity.seedHash]], argmin-L2
  * assignment with the (l2, cid) struct-min tie-break, per-dimension
  * round(mean, 6) → FLOAT between rounds — the 6-dp rounding swallows
  * shuffle-order ulp drift, which is what lets DuckDB replay the
  * rounds bit-for-bit). Every OUTPUT is an integer: distances convert
  * to exact micro-units (round(l2 · 10⁶) — the oracle reproduces
  * Spark's shortest-string rounding via the VARCHAR→DECIMAL(30,12)
  * round-trip), so the ADC sum over M subspaces is an INTEGER sum —
  * associativity-free, no float-summation drift, no rounded-quotient
  * exposure at all.
  *
  * 100 TB shape: training is the q37 shape per subspace — broadcast
  * codebook (M·K rows), one narrow scored pass, map-side-combined
  * (s, cid, pos) mean aggregation; the code table is 2 bytes/vector of
  * state. ADC search broadcasts the per-query distance tables
  * (|Q|·M·K rows) onto the code table and partial-aggregates the
  * per-(query, vector) sums map-side — the shuffle carries |Q| rows
  * per vector, which is why production batches queries; the float
  * embeddings are read exactly once, at encode time.
  */
object ProductQuantization {

  val M = 8            // subspaces
  val SubDim = 8       // dims per subspace at the driver corpus' d = 64
  val K = 16           // centroids per subspace (4-bit codes)
  val Iters = 2        // Lloyd rounds (the q37 convention)
  val NQueries = 8     // query ids: vec_id < 8
  val TopK = 5

  /** Index-order L2 fold — mirrors the oracle's list_reduce exactly. */
  private def l2(sub: Column, c: Column): Column =
    aggregate(zip_with(sub, c, (x, y) => (x - y.cast("double"))
      * (x - y.cast("double"))), lit(0.0), (acc, v) => acc + v)

  /** (s, vec_id, sv): the M subspace views of each vector, double-cast
    * once — one narrow pass, no shuffle.
    */
  def subspaces(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("dv"))
      // the stages downstream multiply compute 128× (explode × M, then
      // score × K against the broadcast codebook, thrice per training),
      // while the parquet scan packs ~500 MB of vectors into a handful
      // of input partitions — spread the rows across the cluster BEFORE
      // the fan-out (the PerceptualHash.imageCorpus lesson at a
      // different byte size; one corpus-sized exchange of (id, vector)
      // rows buys 3 fully-parallel scoring passes). Measured at 100×:
      // q206 72.0 → 12.4 s, q207 74.6 → 14.3 s.
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(M - 1))).as("s"), col("dv"))
      // subspace width d/M derived from the vector itself — the PQ
      // family is dimension-generic (d = 64 → 8-dim subspaces on the
      // driver corpus; the fuzz corpora run it at d = 16)
      .select(col("s"), col("vec_id"),
        slice(col("dv"), col("s") * (size(col("dv")) / M) + 1,
          size(col("dv")) / M).as("sv"))

  /** Hash-ordered init (the [[Similarity.ivfCentroids]] discipline):
    * the K seed vectors are chosen ONCE by vec_id hash order and
    * sliced per subspace — (s, cid, c) with c as the double list.
    */
  def initCodebook(embeddings: DataFrame): DataFrame = {
    val init = Similarity.ivfCentroids(embeddings, K)
      .select(col("centroid_id").as("cid"),
        transform(col("centroid"), x => x.cast("double")).as("dv"))
      .select(col("cid"), explode(sequence(lit(0), lit(M - 1))).as("s"),
        col("dv"))
      .select(col("s"), col("cid"),
        slice(col("dv"), col("s") * (size(col("dv")) / M) + 1,
          size(col("dv")) / M).as("c"))
    init
  }

  /** Nearest-centroid code per (s, vec_id): broadcast the M·K codebook,
    * argmin L2 with the (l2, cid) struct-min tie-break, map-side
    * collapsed by the min_by partial aggregate.
    */
  def assign(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), "s")
      .withColumn("d2", l2(col("sv"), col("c")))
      .groupBy(col("s"), col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
        min(col("d2")).as("d2"),
        first(col("sv")).as("sv")) // constant per (s, vec_id) group

  /** `Iters` Lloyd rounds per subspace: assign, recompute means
    * (round 6 → FLOAT → double, the q37 drift-swallowing contract),
    * drop emptied clusters. Returns the trained (s, cid, c) codebook.
    *
    * `subs` must be [[subspaces]] of the same embeddings, prebuilt and
    * checkpointed by the caller — every consumer (audit, ADC, IVF-PQ)
    * also needs the subspace view for the final assignment, and
    * rebuilding it here would repeat its corpus-sized repartition
    * exchange per training.
    */
  def trainCodebook(embeddings: DataFrame, subs: DataFrame): DataFrame =
    // the codebook is M·K-BOUNDED metadata — single-partition checkpoints
    // (see kmeansCentroids) so downstream broadcasts collect one partition
    trainLoop(subs, initCodebook(embeddings).coalesce(1).localCheckpoint())

  /** Convenience for one-shot callers (specs): builds its own subspace
    * view. Query paths pass a shared one — see the 2-arg overload.
    */
  def trainCodebook(embeddings: DataFrame): DataFrame =
    trainCodebook(embeddings, subspaces(embeddings).localCheckpoint())

  private def trainLoop(subs: DataFrame, init: DataFrame): DataFrame = {
    var codebook = init
    for (_ <- 0 until Iters) {
      codebook = assign(subs, codebook)
        .select(col("s"), col("cid"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("cid"), col("pos"))
        .agg(round(avg(col("v")), 6).as("m"))
        .groupBy(col("s"), col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m").cast("float").cast("double")).as("c"))
        .coalesce(1)
        .localCheckpoint() // truncate lineage between rounds
    }
    codebook
  }

  /** The full-corpus trained state q206 and q207 both consume: the
    * checkpointed subspace view and the trained codebook.
    */
  case class Trained(subs: DataFrame, codebook: DataFrame)

  private val trainedMemo = new graft.tools.CorpusMemo[Trained](
    t => Seq(t.subs, t.codebook))

  /** The full-corpus PQ training, memoized per (session, dir) — the
    * [[graft.graph.HyperBall.coPurchaseReach]] discipline applied to
    * codebooks: q206 (the codebook audit) and q207 (ADC search) train
    * the IDENTICAL codebook on the identical corpus, and a production
    * store trains once and serves every reader. The codebook is a pure
    * deterministic function of the corpus (hash-ordered init,
    * round(mean, 6) between rounds), so memo-vs-retrain is
    * bit-identical and every oracle replays it unchanged. Single-entry:
    * a bench/verify session visits one dir at a time (fuzz sweeps use a
    * fresh dir per seed, so a stale entry is structurally unreachable).
    * Holds the subspace view's checkpoint blocks for the session —
    * M rows of d/M doubles per vector, the same footprint the reach
    * memo pins for the graph tier.
    */
  def fullTrained(s: SparkSession, dir: String): Trained =
    trainedMemo.get(s, dir) {
      val emb = Tables.embeddings(s, dir)
      val subs = subspaces(emb).localCheckpoint()
      Trained(subs, trainCodebook(emb, subs))
    }

  /** Exact micro-unit conversion: round(d² · 10⁶) as BIGINT — Spark
    * rounds the double's shortest decimal string (HALF_UP); the oracle
    * reproduces that via the VARCHAR→DECIMAL(30,12) round-trip (at
    * d² ≤ ~10³ the full shortest string fits 12 fractional digits, so
    * the round-trip is lossless).
    */
  private def micro(d2: Column): Column =
    round(d2 * 1e6, 0).cast("long")

  /** q206: the trained-codebook audit — per (subspace, centroid):
    * member count and the summed squared reconstruction error in
    * micro-units. ALL-INTEGER output (the quantization loss a storage
    * review reads, with no rounded-quotient exposure; consumers divide
    * sse_micro/n_members at whatever grain they need).
    */
  def codebookAuditQuery(s: SparkSession, dir: String): DataFrame = {
    val t = fullTrained(s, dir)
    val codes = assign(t.subs, t.codebook)
    codes.groupBy(col("s").as("subspace"), col("cid").as("centroid_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(micro(col("d2"))).as("sse_micro"))
      .select(col("subspace"), col("centroid_id"), col("n_members"),
        col("sse_micro"))
      .orderBy(col("subspace"), col("centroid_id"))
  }

  /** q207: PQ-ADC top-k — queries are vec_id < [[NQueries]]; per query
    * a broadcast M×K distance table in micro-units; every database
    * vector's approximate distance is the INTEGER sum of its M table
    * entries (order-free); top-[[TopK]] by (adist_micro, neighbor_id).
    */
  def adcTopKQuery(s: SparkSession, dir: String): DataFrame = {
    val t = fullTrained(s, dir)
    adcTopK(t.subs, t.codebook)
  }

  /** One-shot ADC over any (vec_id, embedding, …) table — specs/fuzz
    * helpers that bring their own corpus; query paths go through the
    * [[fullTrained]] memo.
    */
  def adcTopK(emb: DataFrame): DataFrame = {
    val subs = subspaces(emb).localCheckpoint()
    adcTopK(subs, trainCodebook(emb, subs))
  }

  /** The ADC pipeline over a prebuilt subspace view + codebook. */
  def adcTopK(subs: DataFrame, codebook: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = assign(subs, codebook)
      .select(col("s"), col("vec_id"), col("cid"))
    // per-query distance table: |Q|·M·K rows, broadcast
    val dt = subs.filter(col("vec_id") < NQueries)
      .withColumnRenamed("vec_id", "query_id")
      .join(codebook, "s")
      .select(col("query_id"), col("s"), col("cid"),
        micro(l2(col("sv"), col("c"))).as("du"))
    val scored = codes.join(broadcast(dt), Seq("s", "cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("du")).as("adist_micro"), count(lit(1)).as("n_s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro"), col("vec_id"))
    scored
      // a vector missing a subspace row would silently shrink its sum —
      // structurally impossible (every vector has all M codes), enforced
      .filter(col("n_s") === M)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), col("adist_micro"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
