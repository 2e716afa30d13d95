package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Two tiers:
  *
  *  - [[cosineTopK]] — brute-force exact cosine top-k. The query side is
  *    broadcast (small), so the "cross join" is a broadcast-nested-loop with
  *    no shuffle of the big side; per-partition the dot products are pure
  *    codegen'd higher-order-array math. This is the correctness baseline
  *    and also the right plan when |queries| is small.
  *  - [[lshCosineTopK]] — the scale path: random-hyperplane LSH. Vectors are
  *    bucketed by a b-bit sign sketch; each query probes only its own bucket
  *    (plus multi-probe neighbors if recall demands), so work per query is
  *    O(bucket) not O(N). Recall vs brute force is approximate by
  *    construction, but the buckets themselves are deterministic integer
  *    arithmetic since round 10, so the DuckDB oracle REPLAYS the sketch
  *    and checks the pipeline end-to-end (q29/q30 hash-verified; the
  *    recall floors in QualityFloorsSpec cover the quality axis).
  *
  * All math is done in Double after an explicit upcast so results are
  * reproducible across engines (float accumulation order would not be).
  */
object Similarity {

  /** Elementwise Float→Double upcast. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product (same evaluation order as a naive loop). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (s, x) => s + x * x))

  /** Exact cosine top-k: for each query vector, the k nearest neighbors by
    * cosine similarity (self excluded). Ranking uses round(cos, 6) with the
    * neighbor id as tie-break so order is stable across engines.
    *
    * The cosine itself is the engine's custom codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — bit-identical to the composed
    * `zip_with`/`aggregate` fold (same sequential double accumulation) but
    * a tight primitive loop, no per-row intermediate arrays.
    */
  def cosineTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", GraftFunctions.cosine(col("q_embedding"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  def cosineTopKQuery(s: SparkSession, dir: String): DataFrame =
    cosineTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5)

  /** q166: MUTUAL nearest neighbors — pairs where each vector is the
    * other's top-1 within its IVF list. Reciprocal-best-match is the
    * high-precision pair miner (entity alignment, translation mining
    * [Artetxe & Schwenk 2019's margin-based mining starts from exactly
    * this reciprocal filter], semantic-dup seeding): a one-directional
    * top-1 is often an asymmetric hub attraction; mutuality kills hubs.
    *
    * Scale shape: candidates come from the nprobe=1 IVF co-assignment —
    * the centroid_id-keyed shuffle join (q148's audited exchange), never
    * the n² table; per-list pair work is Σ n_c², density-bounded by the
    * quantizer (the q106/q134 knob). Top-1 is a per-vector window over
    * list-local candidates; the mutual filter is a self-join of the
    * vector-sized top-1 table on the reversed pair. Ties pin
    * (round(cos, 6) DESC, neighbor_id) — the q26 discipline, which is
    * what lets DuckDB replay the whole trajectory.
    *
    * nlist = max(16, ⌈√n⌉) — the q148 balance point: within-list pair
    * work is n²/nlist and assignment is n·nlist, so √n makes both
    * n^1.5 (a FIXED nlist is quadratic in the pair term — the 10× leg
    * showed 13.7× before this; the n count() is the documented 1-row
    * pattern, and the oracle derives the same nlist by scalar
    * subquery).
    */
  def mutualNnQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    GraftFunctions.register(e.sparkSession)
    val nlist = math.max(16L, math.ceil(math.sqrt(e.count().toDouble)).toLong)
    val asg = ivfAssign(e, ivfCentroids(e, nlist.toInt), nprobe = 1)
    val a = asg.select(col("centroid_id"), col("vec_id").as("qid"),
      col("embedding").as("qv"))
    val b = asg.select(col("centroid_id"), col("vec_id").as("nid"),
      col("embedding").as("nv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("cos"), 6).desc, col("nid"))
    val top1 = a.join(b, Seq("centroid_id"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", GraftFunctions.cosine(col("qv"), col("nv")))
      .select(col("qid"), col("nid"), col("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    top1.as("x").join(top1.as("y"),
        col("x.qid") === col("y.nid") && col("x.nid") === col("y.qid")
          && col("x.qid") < col("x.nid"))
      .select(col("x.qid").as("id_a"), col("x.nid").as("id_b"),
        round(col("x.cos"), 4).as("cosine"))
      .orderBy(col("id_a"))
  }

  /** q80: per-vector feature statistics through the higher-order array
    * functions — L2 norm (left-fold of squares), positive-dimension count
    * (filter), and a clip-then-mean (transform folded). Shuffle-free
    * per-row expressions; every fold is LEFT-ordered so the DuckDB
    * `list_reduce` mirror reproduces the fp summation bit-for-bit (the
    * same discipline as the q26 cosine kernel oracle).
    */
  def vectorStats(embeddings: DataFrame): DataFrame = {
    val e = col("embedding")
    embeddings.select(col("vec_id"),
      size(e).cast("long").as("dim"),
      round(sqrt(aggregate(e, lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))), 6).as("norm2"),
      size(filter(e, x => x > 0f)).cast("long").as("n_pos"),
      round(aggregate(e, lit(0.0),
        (a, x) => a + greatest(least(x.cast("double"), lit(0.1)), lit(-0.1)))
        / size(e), 6).as("clipped_mean"))
      .orderBy(col("vec_id"))
  }

  def vectorStatsQuery(s: SparkSession, dir: String): DataFrame =
    vectorStats(Tables.embeddings(s, dir))

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * hash-derived value in [-1, 1) — reproducible with no RNG state, and
    * since round 10 computed by the quadratic-congruential integer mixer
    * in [[graft.functions.VectorHash]] (shared constants), which the
    * q29/q30 DuckDB oracles replay exactly.
    */
  private def planeComponent(p: Int, j: Column): Column = {
    import graft.functions.VectorHash._
    val i = lit(p * PlaneDimStride) + j + 1L
    val m1 = (lit(PlaneA1) * i + lit(PlaneB1)) % lit(PlaneP)
    val m2 = (m1 * m1) % lit(PlaneP)
    val m3 = (lit(PlaneA2) * m2 + m1) % lit(PlaneP)
    ((m3 % lit(2000001L)) - 1000000L).cast("double") / 1000000.0
  }

  /** b-bit random-hyperplane sign sketch — composed-HOF reference
    * implementation over a DOUBLE array; the production path is the
    * bit-identical codegen'd [[graft.functions.HyperplaneSketch]] over the
    * raw float array (see the parity test in VectorExpressionsSpec).
    */
  def lshBucketComposed(v: Column, bits: Int): Column =
    (0 until bits).map { p =>
      val proj = aggregate(zip_with(v, sequence(lit(0L), size(v).cast("long") - 1L),
        (x, j) => x * planeComponent(p, j)), lit(0.0), (s, x) => s + x)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: exact cosine, but each query only scans its own
    * sign-sketch bucket. Returns the same schema as [[cosineTopK]]; recall
    * < 1 (a true neighbor on the far side of a hyperplane is missed).
    *
    * `multiProbe = d` also probes every bucket within Hamming distance d
    * of the query's sketch (standard multi-probe LSH): a neighbor at
    * angle θ agrees with the sketch per-bit w.p. 1−θ/π, so allowing
    * flipped bits multiplies recall several-fold at moderate θ while
    * scanning Σ_{i≤d} C(bits,i) of the 2^bits buckets. The fan-out
    * happens on the QUERY side (small, broadcast) — the corpus is still
    * bucketed exactly once.
    */
  def lshCosineTopK(embeddings: DataFrame, queryPred: Column, k: Int,
      bits: Int = 8, multiProbe: Int = 1): DataFrame = {
    require(bits <= 20, "mask enumeration is 2^bits — keep bits ≤ 20")
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", GraftFunctions.lshBucket(col("embedding"), bits))
    val masks: Seq[Column] = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= multiProbe)
      .map(lit)
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(m)): _*)).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", GraftFunctions.cosine(col("q_embedding"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  def lshCosineTopKQuery(s: SparkSession, dir: String): DataFrame =
    lshCosineTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5)

  /** Embedding-cosine near-duplicate pairs (dedup flavor): all pairs with
    * cosine ≥ threshold, generated through LSH buckets (not all-pairs).
    *
    * Banded OR-construction [Indyk & Motwani STOC'98; the MinHash band
    * trick of Leskovec et al., "Mining of Massive Datasets" ch.3, applied
    * to sign-random-projection]: ONE wide hyperplane sketch of
    * `tables × bandBits` planes is computed per vector, sliced into
    * `tables` independent bands, and a pair is a candidate iff it collides
    * in ANY band. Per-pair recall at cosine c is 1 − (1 − p^bandBits)^tables
    * with p = 1 − θ(c)/π — `tables` buys recall without inflating
    * single-bucket size, `bandBits` caps bucket size; both knobs are
    * independent of corpus size. A single table (tables = 1) degenerates
    * to the plain bucket equi-join.
    *
    * 100 TB shape: the band explode fans each vector out `tables` times and
    * the candidate join is keyed on (band, bucket) — a bucketed equi-join,
    * never all-pairs; multi-band collisions collapse in the final
    * fixed-width `distinct`.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double,
      bandBits: Int = 8, tables: Int = 1): DataFrame = {
    require(bandBits * tables <= 64, "the sketch is one long: tables × bandBits ≤ 64")
    GraftFunctions.register(embeddings.sparkSession)
    val mask = (1L << bandBits) - 1L
    val bands = embeddings
      .select(col("vec_id"), col("embedding"))
      .withColumn("sketch",
        GraftFunctions.lshBucket(col("embedding"), bandBits * tables))
      .select(col("vec_id"), col("embedding"),
        explode(array((0 until tables).map(t => struct(
          lit(t).as("band"),
          shiftright(col("sketch"), t * bandBits).bitwiseAND(lit(mask)).as("bucket")
        )): _*)).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", GraftFunctions.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(col("cos"), 4).as("cosine"))
      .distinct() // a pair colliding in several bands reports once
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q30: τ = 0.4 sits in this synthetic corpus's near-dup band (pairwise
    * cosine tops out ≈ 0.5; ~60 pairs ≥ 0.4 at sf0.01 — see SemDedup's
    * q106 note), and 8 bands × 6 bits gives ≈ 40% per-pair recall there,
    * so the driver row exercises the band join on real collisions every
    * round instead of returning an empty frame.
    */
  def nearDupQuery(s: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(Tables.embeddings(s, dir), threshold = 0.4,
      bandBits = 6, tables = 8)

  /** Centroid-seed ordering hash: the [[graft.functions.VectorHash]]
    * quadratic-congruential mixer applied to the vector id — replayable
    * BIGINT arithmetic in DuckDB, unlike the xxhash64 it replaced (the
    * same swap that made q27–q30 hash-verified). The id is floor-reduced
    * below P first so A₁·v stays under 2⁶³ even for 100-TB-scale ids;
    * every later intermediate is bounded by P² ≈ 4.6e18.
    */
  private[graft] def seedHash(vid: Column): Column = {
    import graft.functions.VectorHash._
    val v = vid % lit(PlaneP)
    val m1 = (lit(PlaneA1) * v + lit(PlaneB1)) % lit(PlaneP)
    val m2 = (m1 * m1) % lit(PlaneP)
    (lit(PlaneA2) * m2 + m1) % lit(PlaneP)
  }

  /** Deterministic IVF coarse quantizer: `nlist` centroids chosen by
    * vector-id hash order (reproducible, no RNG/training iterations — at
    * scale swap in k-means centroids without touching the probe path).
    * `orderBy + limit` plans as TakeOrderedAndProject (per-partition
    * top-nlist, merge of nlist rows — never a full sort); the numbering
    * window then runs over that ≤ nlist-row frame only, which also
    * replaces the old `monotonically_increasing_id` (partition-layout-
    * dependent) with an id the DuckDB oracle reproduces exactly.
    */
  def ivfCentroids(embeddings: DataFrame, nlist: Int): DataFrame = {
    val w = Window.orderBy(seedHash(col("vec_id")), col("vec_id")) // ≤ nlist rows
    embeddings
      .orderBy(seedHash(col("vec_id")), col("vec_id"))
      .limit(nlist)
      .select((row_number().over(w) - 1).cast("long").as("centroid_id"),
        col("embedding").as("centroid"))
  }

  /** Nearest-`nprobe` centroid assignment per vector (IVF list membership).
    * The centroid table is tiny → broadcast cross join; per-row cost is
    * nlist cosine evaluations through the codegen'd expression.
    *
    * nprobe = 1 (the corpus-side list assignment — the big input) is an
    * argmax, expressed as a `max_by` aggregate instead of a row_number
    * window: the partial (map-side) aggregate collapses the nlist scored
    * copies of each vector before the exchange, so the shuffle carries one
    * row per vector and there is no per-partition sort. The window path
    * remains for nprobe > 1 (query-side probing — small input).
    */
  def ivfAssign(embeddings: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val scored = embeddings.crossJoin(broadcast(centroids))
      .withColumn("c_cos", GraftFunctions.cosine(col("embedding"), col("centroid")))
    if (nprobe == 1) {
      // ties break toward the smallest centroid_id, matching the window's
      // (c_cos desc, centroid_id asc) — hence the negated id in the max key
      scored.groupBy(col("vec_id"))
        .agg(
          max_by(col("centroid_id"),
            struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("centroid_id"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
    } else {
      ivfProbesRanked(embeddings, centroids, nprobe)
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
    }
  }

  /** The nprobe > 1 probing path of [[ivfAssign]] with the probe RANK
    * kept on the row (c_rnk = 1 is the nearest list). Probe sets are
    * NESTED across nprobe (top-n′ is a prefix of top-n for n′ ≤ n), so
    * a sweep over several nprobe values scores ONCE at the largest and
    * filters `c_rnk <= n′` per leg — the q212 recall curve's shared
    * stage — instead of re-running the assignment per leg.
    */
  def ivfProbesRanked(embeddings: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    embeddings.crossJoin(broadcast(centroids))
      .withColumn("c_cos", GraftFunctions.cosine(col("embedding"), col("centroid")))
      .withColumn("c_rnk", row_number().over(w))
      .filter(col("c_rnk") <= nprobe)
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        col("c_rnk"))
  }

  /** Lloyd (k-means) refinement of [[ivfCentroids]]: each round assigns
    * every vector to its nearest centroid (the same broadcast argmax as
    * [[ivfAssign]] nprobe=1) and recomputes centroids as the elementwise
    * mean of their members. Fully deterministic: hash-ordered init, argmax
    * tie-breaks, and the per-dimension mean is rounded to 6 before the
    * float cast — `avg` merges partial sums in shuffle order, so the raw
    * double is deterministic only up to fp association; the rounding
    * swallows that ulp drift (the [[hierQuantizer]] discipline), which is
    * also what lets the q37 DuckDB oracle replay the training rounds
    * bit-for-bit. Clusters that lose all members drop out (standard Lloyd
    * behavior), so the result may have fewer than `nlist` rows.
    *
    * Per round: one narrow broadcast-scored pass + two hash aggregations
    * (on (centroid, dim) then centroid) — no driver-side data movement.
    * Better centroids concentrate true neighbors into fewer probed lists,
    * which is where IVF recall comes from at scale.
    */
  def kmeansCentroids(embeddings: DataFrame, nlist: Int, iters: Int): DataFrame = {
    // the centroid table is nlist-BOUNDED metadata at any corpus size —
    // coalesce(1) before each checkpoint so the final (tiny) reduce runs
    // one task and every downstream broadcast collects one partition
    // instead of shuffle.partitions-many near-empty ones
    var centroids = ivfCentroids(embeddings, nlist).coalesce(1)
      .localCheckpoint()
    for (_ <- 0 until iters) {
      centroids = ivfAssign(embeddings, centroids, nprobe = 1)
        .select(col("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(round(avg(col("v")), 6).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
        .coalesce(1)
        .localCheckpoint() // truncate lineage between rounds
    }
    centroids
  }

  /** Two-level (hierarchical) quantizer — the O(n·√nlist) scale path for
    * cluster counts that grow with the corpus. [[kmeansCentroids]] pays
    * n·nlist per round (every vector scored against every centroid);
    * with SemDeDup's nlist ∝ n cluster-size discipline that term is
    * O(n²/64) — the one super-linear curve the sf0.1→sf1 scaling audit
    * measured (SCALING.md). Here √nlist "super" centroids route, and each
    * vector only ever competes among its super's ~√nlist children:
    * training AND assignment cost n·√nlist per round (n^1.5/8 per decade
    * under the n/64 knob, vs n²/64), the two-level layout of IVF-HNSW /
    * inverted-multi-index coarse quantizers. Routing is approximate at
    * cluster boundaries — exactly the trade those systems make — so this
    * backs the trained path (q134), while q106 keeps the exact
    * single-level argmax as the simpler reference construction.
    *
    * Deterministic end to end: hash-ordered inits, argmax id tie-breaks,
    * mean recompute as avg aggregates — the double-run determinism gate
    * covers q134, and since r10 the DuckDB oracle replays the whole
    * two-level training (both levels' Lloyd rounds unrolled, the q37
    * pattern) so q134 is hash-verified, not rows-only.
    *
    * @return (supers, children): (super_id, super) routing table and
    *         (super_id, centroid_id, centroid) leaf codebook, both tiny.
    */
  def hierQuantizer(embeddings: DataFrame, nlist: Int, iters: Int)
      : (DataFrame, DataFrame) = {
    GraftFunctions.register(embeddings.sparkSession)
    val nsuper = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val supers = kmeansCentroids(embeddings, nsuper, iters)
      .select(col("centroid_id").as("super_id"), col("centroid").as("super"))
      .localCheckpoint()
    val routed = routeToSuper(embeddings, supers, probe = 1).localCheckpoint()
    // leaf init: per-super hash-ordered pick (ivfCentroids, per partition),
    // with the child BUDGET proportional to the super's routed member
    // count (floor 1) — a uniform nlist/nsuper split starves dense supers
    // and wastes leaves on sparse ones, which is exactly where the
    // cluster-local screen loses planted near-dups (SemDedupSpec's hier
    // floor caught the uniform version at 0.8 recall). The counts table is
    // nsuper rows; its total rides a window over that tiny frame, never
    // the corpus. Ids are super-prefixed (super_id·nlist + rank) — unique
    // without any global numbering pass.
    val counts = routed.groupBy(col("super_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("budget",
        greatest(lit(1L), round(lit(nlist) * col("cnt") /
          sum(col("cnt")).over(Window.partitionBy())).cast("long")))
      .select(col("super_id"), col("budget"))
    val wInit = Window.partitionBy(col("super_id"))
      .orderBy(seedHash(col("vec_id")), col("vec_id"))
    var children = routed.join(broadcast(counts), Seq("super_id"))
      .withColumn("r", row_number().over(wInit))
      .filter(col("r") <= col("budget"))
      .select(col("super_id"),
        (col("super_id") * nlist + col("r") - 1).cast("long").as("centroid_id"),
        col("embedding").as("centroid"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      // Lloyd round, super-local: the join is KEYED on super_id (broadcast
      // codebook), so each vector scores only its super's children
      children = routed.join(broadcast(children), Seq("super_id"))
        .withColumn("c_cos", GraftFunctions.cosine(col("embedding"), col("centroid")))
        .groupBy(col("vec_id"))
        .agg(
          max_by(struct(col("super_id"), col("centroid_id")),
            struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
          first(col("embedding")).as("embedding"))
        .select(col("best.super_id").as("super_id"),
          col("best.centroid_id").as("centroid_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("super_id"), col("centroid_id"), col("pos"))
        // round the mean BEFORE the float cast: avg() merges partial sums
        // in shuffle order, so the raw double is deterministic only up to
        // fp association — round(·,6) swallows that ulp drift so the
        // downstream rank keys (and the double-run determinism gate on
        // q134) never hinge on a near-tie flipping across partitionings
        .agg(round(avg(col("v")), 6).as("m"))
        .groupBy(col("super_id"), col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
        .localCheckpoint()
    }
    (supers, children)
  }

  /** Nearest-`probe`-supers routing: the n·√nlist half of two-level
    * assignment. probe = 1 is a `max_by` argmax; probe > 1 reuses the
    * engine's own [[graft.functions.TopKLargest]] aggregate — the same
    * map-side-collapse shape (the exchange carries ≤ probe rows per
    * vector), no per-vector window sort.
    */
  private def routeToSuper(embeddings: DataFrame, supers: DataFrame,
                           probe: Int): DataFrame = {
    val scored = embeddings.crossJoin(broadcast(supers))
      .withColumn("s_cos", GraftFunctions.cosine(col("embedding"), col("super")))
    if (probe == 1)
      scored.groupBy(col("vec_id"))
        .agg(
          max_by(col("super_id"),
            struct(col("s_cos"), (-col("super_id")).as("neg_id"))).as("super_id"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("embedding"), col("super_id"))
    else
      scored.groupBy(col("vec_id"))
        .agg(
          GraftFunctions.topk(
            struct(col("s_cos"), (-col("super_id")).as("neg_id")), probe).as("top"),
          first(col("embedding")).as("embedding"))
        .select(col("vec_id"), col("embedding"),
          explode(col("top")).as("t"))
        .select(col("vec_id"), col("embedding"),
          (-col("t.neg_id")).as("super_id"))
  }

  /** Two-level nearest-centroid assignment against a [[hierQuantizer]]
    * codebook: route to the nearest `probe` supers (n·√nlist), then
    * argmax among those supers' children only (probe·n·√nlist) — never
    * n·nlist. probe = 2 (the IVF multi-probe move) recovers the
    * cluster-boundary cases single-super routing loses — SemDedupSpec
    * floors its planted dup-recall against the exact fixed codebook.
    * Emits the same (vec_id, embedding, centroid_id, c_cos) shape as the
    * exact assignment inside [[graft.dedup.SemDedup.semDedup]], c_cos
    * rounded to 6 like every rank key the screen uses.
    */
  def hierAssign(embeddings: DataFrame, supers: DataFrame,
                 children: DataFrame, probe: Int = 2): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    routeToSuper(embeddings, supers, probe)
      .join(broadcast(children), Seq("super_id"))
      .withColumn("c_cos",
        round(GraftFunctions.cosine(col("embedding"), col("centroid")), 6))
      .groupBy(col("vec_id"))
      .agg(
        max_by(struct(col("centroid_id"), col("c_cos")),
          struct(col("c_cos"), (-col("centroid_id")).as("neg_id"))).as("best"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        col("best.centroid_id").as("centroid_id"),
        col("best.c_cos").as("c_cos"))
  }

  /** Mean best-cosine of every vector against its nearest centroid — the
    * (cosine-flavored) k-means objective, for asserting refinement helps.
    */
  def quantizerObjective(embeddings: DataFrame, centroids: DataFrame): Double = {
    GraftFunctions.register(embeddings.sparkSession)
    embeddings.crossJoin(broadcast(centroids))
      .withColumn("c_cos", GraftFunctions.cosine(col("embedding"), col("centroid")))
      .groupBy(col("vec_id")).agg(max(col("c_cos")).as("best"))
      .agg(avg(col("best"))).collect()(0).getDouble(0)
  }

  /** IVF ANN top-k: vectors live in their single nearest list; each query
    * probes its `nprobe` nearest lists and scans only those inverted lists.
    * Work per query ≈ nprobe/nlist of the corpus (vs all of it brute-force);
    * recall < 1 when a true neighbor's list isn't probed.
    */
  def ivfCosineTopK(
      embeddings: DataFrame, queryPred: Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4, trainIters: Int = 0): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val centroids =
      if (trainIters > 0) kmeansCentroids(e, nlist, trainIters)
      else ivfCentroids(e, nlist)
    val lists = ivfAssign(e, centroids, nprobe = 1) // each vector in ONE list
    val probes = ivfAssign(e.filter(queryPred), centroids, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"),
        col("centroid_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    lists.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", GraftFunctions.cosine(col("q_embedding"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .dropDuplicates("query_id", "neighbor_id") // multi-probe overlap
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Top principal direction of the (mean-centered) embedding cloud via
    * MATRIX-FREE distributed power iteration: v ← normalize(Σᵢ xᵢ(xᵢ·v)).
    * The d×d covariance is never materialized — each round is one
    * scored-posexplode aggregation over the corpus (shuffle keyed by
    * dimension index, d rows out), so the method scales to dimensions
    * where d² would not fit a task, and the corpus is never collected.
    * Deterministic: fixed init (normalized 1+j/d ramp — never orthogonal
    * to a planted axis by symmetry), fixed iteration count, double math.
    * Sign is normalized so the largest-|component| coordinate is
    * positive (power iteration's sign is otherwise arbitrary).
    *
    * The d-vector result is collected to the driver — d scalars, the
    * legitimate scalar-aggregate pattern.
    */
  def topPrincipalComponent(embeddings: DataFrame, iters: Int = 8): Array[Double] = {
    val spark = embeddings.sparkSession
    val x = embeddings.select(toDouble(col("embedding")).as("x"))
      .localCheckpoint() // scanned once per iteration
    val d = x.select(size(col("x"))).head().getInt(0)
    val mean = x.select(posexplode(col("x")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(avg(col("v")).as("m"))
      .orderBy(col("pos")).collect().map(_.getDouble(1))
    val meanCol = array(mean.map(lit(_)): _*)
    val xc = x.select(zip_with(col("x"), meanCol, (a, b) => a - b).as("x"))
      .localCheckpoint()
    var v = Array.tabulate(d)(j => 1.0 + j.toDouble / d)
    def normalize(u: Array[Double]): Array[Double] = {
      val n = math.sqrt(u.map(a => a * a).sum)
      u.map(_ / n)
    }
    v = normalize(v)
    for (_ <- 0 until iters) {
      val vCol = array(v.map(lit(_)): _*)
      val next = xc
        .withColumn("s", dot(col("x"), vCol))
        .select(posexplode(col("x")).as(Seq("pos", "xv")), col("s"))
        .groupBy(col("pos")).agg(sum(col("xv") * col("s")).as("nv"))
        .orderBy(col("pos")).collect().map(_.getDouble(1))
      v = normalize(next)
    }
    val pivot = v.indices.maxBy(j => math.abs(v(j)))
    if (v(pivot) < 0) v.map(-_) else v
  }

  /** q67: every vector's score along the corpus's top principal axis —
    * the projection feeding whitening / spectral filtering / outlier
    * trimming. Oracle-checked: the fixed 8 rounds unroll into DuckDB SQL
    * (the q57 pattern) and power iteration's contraction keeps both
    * engines ≥4 orders of magnitude inside the 4-dp projection rounding;
    * QualityFloorsSpec additionally pins planted-direction recovery.
    */
  def pcaProjectQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val pc = topPrincipalComponent(e.select(col("vec_id"), col("embedding")))
    val pcCol = array(pc.map(lit(_)): _*)
    e.select(col("vec_id"),
        round(dot(toDouble(col("embedding")), pcCol), 4).as("pc_score"))
      .orderBy(col("vec_id"))
  }

  /** q37 ships with the trained quantizer (2 Lloyd rounds) — the gate path
    * exercises k-means training, not just the hash-ordered init;
    * QualityFloorsSpec pins trained recall ≥ untrained on the planted
    * corpus. Oracle-verified since round 10: the [[seedHash]] init order,
    * both unrolled Lloyd rounds (argmax assignment + round(mean, 6) →
    * float centroids), the final list/probe assignments, and the ranked
    * probe join all replay in DuckDB — the q57/q67 fixed-iteration-unroll
    * pattern composed with the q26 cosine fold mirror.
    */
  def ivfTopKQuery(s: SparkSession, dir: String): DataFrame =
    ivfCosineTopK(Tables.embeddings(s, dir), col("vec_id") < 10, k = 5,
      trainIters = 2)
}
