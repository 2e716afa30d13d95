package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Count–Min sketch [Cormode & Muthukrishnan, "An Improved Data Stream
  * Summary: The Count-Min Sketch and its Applications", J. Algorithms
  * 55(1)] — the point-query frequency sketch that completes the engine's
  * mergeable-summary suite (HLL q31/q82 for cardinality, Misra–Gries q93
  * for heavy hitters, Bloom q96 for membership, top-k q66 for order
  * statistics).
  *
  * Deliberately built RELATIONALLY, not as a UDAF: the d×w counter
  * matrix is `groupBy(row, bucket).sum` — Spark's partial aggregation
  * IS the sketch merge (map-side partials are per-partition sketches,
  * the exchange merges them), so the mergeability the sketch exists for
  * comes from the engine's aggregation machinery instead of hand-rolled
  * buffers. d=4 pairwise-independent affine hashes over a Mersenne
  * prime; integer keys and integer arithmetic end-to-end, so — unlike
  * the xxhash64-seeded HLL/MinHash family — the DuckDB oracle replays
  * the sketch bit-for-bit (q141 is hash-verified, not rows-only).
  *
  * 100 TB shape: one exchange keyed on the sketch cell (d·w = 4096
  * cells regardless of corpus size), after a map-side combine on the
  * (key)-grain. The probe side joins the top-k keys to the cell matrix
  * on the cell key — dimension-sized, broadcast. The classic
  * overestimate-only guarantee (est ≥ exact; P[err > εN] ≤ δ with
  * ε = e/w, δ = e^−d) is asserted in CountMinSpec.
  */
object CountMin {

  val P: Long = 2147483647L // 2^31 − 1, Mersenne prime
  val W: Long = 1024L
  /** Fixed odd affine params (a, b), one per sketch row. Each a < 2³¹, so
    * after the key is floor-mod-reduced below P the product a·x stays
    * under 2⁶² — no silent Spark wrap (and no DuckDB overflow error) for
    * ANY 64-bit key.
    */
  val Hashes: Seq[(Int, Long, Long)] = Seq(
    (0, 1103515245L, 12345L),
    (1, 214013L, 2531011L),
    (2, 69069L, 362437L),
    (3, 134775813L, 1L))

  private[analytics] def bucket(a: Long, b: Long, k: org.apache.spark.sql.Column) = {
    // floor-mod FIRST: a raw negative key would make Scala-style % return
    // a negative bucket, and a·key overflows long for |key| > ~4.3e9 —
    // reducing the key below P makes both impossible, for the full key
    // domain, identically in Spark and the DuckDB oracle
    val x = ((k % lit(P)) + lit(P)) % lit(P)
    ((lit(a) * x + lit(b)) % lit(P)) % lit(W)
  }

  /** The d×w counter matrix for a weighted key frequency table
    * `(key, n)` — one row per NON-EMPTY cell (the zero cells of a 100 TB
    * sketch are implicit; materializing 4096 mostly-zero rows would be
    * harmless, but the sparse form is what a sketch store persists).
    */
  def sketch(counts: DataFrame): DataFrame = {
    val cells = Hashes.map { case (i, a, b) =>
      counts.select(lit(i).as("r"),
        bucket(a, b, col("key")).as("bucket"), col("n"))
    }.reduce(_ unionByName _)
    cells.groupBy(col("r"), col("bucket")).agg(sum(col("n")).as("c"))
  }

  /** q141: build the sketch over order counts per customer, then probe
    * it for the 20 heaviest customers — exact count next to the CMS
    * estimate, the overestimate visible in-row. Oracle replays both the
    * build and the probe in SQL.
    */
  def countMinQuery(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n"))
    val matrix = sketch(counts)
    val top = counts.orderBy(col("n").desc, col("key")).limit(20)
    val probes = Hashes.map { case (i, a, b) =>
      top.select(col("key"), col("n"), lit(i).as("r"),
        bucket(a, b, col("key")).as("bucket"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(matrix), Seq("r", "bucket"))
      .groupBy(col("key").as("o_custkey"))
      .agg(max(col("n")).as("exact_n"), min(col("c")).as("cms_est"))
      .orderBy(col("exact_n").desc, col("o_custkey"))
  }

  /** Equi-join CARDINALITY estimate from two Count–Min sketches — the
    * inner-product estimator [Cormode & Muthukrishnan, "An improved data
    * stream summary: the count-min sketch and its applications", §4.2]:
    * |A ⋈ₖ B| = Σₖ fₐ(k)·f_b(k), estimated per sketch row as
    * Σ_bucket cmA[r][b]·cmB[r][b] and min'd over rows. Always an
    * OVERESTIMATE (hash collisions only add non-negative cross terms),
    * within ε·N_A·N_B with probability 1−δ — so the optimizer-style
    * question ("will this join explode?") is answered from two d×w
    * counter matrices that were built independently, stream-mergeable,
    * and never see each other's keys. This is the planning primitive a
    * 100 TB engine runs BEFORE committing to a join strategy: the
    * sketches are per-table metadata (built at ingest, one pass), and
    * the estimate itself is d×w arithmetic — no data touched.
    *
    * The join of the two sparse matrices is inner on (r, bucket):
    * a bucket missing from either side contributes a zero product.
    */
  def joinSizeEstimate(countsA: DataFrame, countsB: DataFrame): DataFrame = {
    val inner = sketch(countsA).withColumnRenamed("c", "ca")
      .join(sketch(countsB).withColumnRenamed("c", "cb"), Seq("r", "bucket"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("est"))
    inner.agg(min(col("est")).as("cms_est"))
  }

  /** q163: sketch-estimated vs exact join cardinality for two join
    * shapes the optimizer actually fears — the orders⋈events key overlap
    * (partial-domain match: how much of the fact table will survive?)
    * and the lineitem SELF-join on part (Σf² — the skew-explosion
    * number, F₂ of the key distribution). The exact twin is the
    * frequency-vector inner product, computed join-free from the same
    * count tables. `err_pct` makes the one-sided error visible in-row.
    */
  def joinSizeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // each freq table feeds THREE consumers (its sketch build — twice
    // for the self-join pair — and the exact twin); materialize once so
    // the corpus-scale scan+aggregate never re-runs (the 100× leg
    // showed 3 lineitem scans before this). Key-count-sized state.
    def freqs(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).cast("long").as("key")).agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true,
          storageLevel = org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val custOrders = freqs(Tables.orders(s, dir), "o_custkey")
    val userEvents = freqs(Tables.events(s, dir), "user_id")
    val partLines = freqs(Tables.lineitem(s, dir), "l_partkey")
    def one(name: String, a: DataFrame, b: DataFrame): DataFrame = {
      val exact = a.join(b.select(col("key"), col("n").as("nb")), Seq("key"))
        .agg(coalesce(sum(col("n") * col("nb")), lit(0L)).as("exact_n"))
      joinSizeEstimate(a, b).crossJoin(exact)
        .select(lit(name).as("join_name"), col("exact_n"),
          col("cms_est").as("cms_est"),
          round((col("cms_est") - col("exact_n")) * 100.0 / col("exact_n"), 4)
            .as("err_pct"))
    }
    one("orders_events_cust", custOrders, userEvents)
      .unionByName(one("lineitem_self_part", partLines, partLines))
      .orderBy(col("join_name"))
  }
}
