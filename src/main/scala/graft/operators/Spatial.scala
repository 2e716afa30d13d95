package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Planar + spherical spatial operators: uniform-grid cell bucketing,
  * a grid-blocked radius self-join, rectangle containment joins, and a
  * haversine great-circle distance column.
  *
  * Reference tie: the reference ingests business latitude/longitude and
  * type-checks them (`test_cases/business.py:22-24`) but computes
  * nothing spatial — proximity ("competitors within r of each
  * business", "density per map tile") is the first question a
  * location-bearing dataset gets asked at scale, so the engine ships
  * the operators the reference's schema is clearly headed toward.
  *
  * 100 TB shape — the same blocking discipline as the dedup/ANN suite:
  * an all-pairs distance join is O(n²) and unrunnable; assigning every
  * point to a `⌊x/cs⌋,⌊y/cs⌋` grid cell with `cs ≥ r` makes every
  * true pair co-located in adjacent cells, so one 5-replica explode +
  * one cell-keyed shuffle join replaces the quadratic scan — candidate
  * volume is Σ_cell 9·n_cell², data-density-bound, not corpus-bound
  * (pick `cs` so the expected cell occupancy is O(1) and the join is
  * linear). No false negatives BY CONSTRUCTION: |Δcell| ≤ 1 on both
  * axes whenever dist ≤ r ≤ cs (SpatialSpec proves equality against
  * the brute-force join). Same trick as MinHash banding (q27) and IVF
  * lists (q37), but on geometry instead of hash space.
  *
  * Exactness discipline for the oracle-gated queries: the fixture
  * derives INTEGER-VALUED coordinates from `c_custkey`, so every
  * downstream double (differences, squares, sums, means over < 2^53)
  * is exact IEEE integer arithmetic — order-independent and bit-equal
  * across engines with zero rounding. [[haversineMeters]] is the
  * real-geo column (libm trig, so ulp-implementation-defined — spec
  * tested with tolerance, deliberately not oracle-gated).
  */
object Spatial {

  /** Grid cell coordinate on one axis: `⌊v / cellSize⌋`. Floor (not
    * integer division) so negative coordinates bucket consistently —
    * floor(-0.5) = -1 in Spark and DuckDB alike.
    */
  def cellOf(v: Column, cellSize: Double): Column =
    floor(v / lit(cellSize)).cast("long")

  /** Per-cell density rollup: point count and exact centroid per
    * occupied grid cell. One hash-aggregate exchange keyed on the cell
    * pair — the map-tile heatmap query, and the occupancy census you
    * run to PICK `cellSize` before a [[radiusPairs]] campaign (target
    * O(1) mean occupancy; a hot cell here is a skew warning there).
    */
  def cellDensity(points: DataFrame, xCol: String, yCol: String,
                  cellSize: Double): DataFrame =
    points
      .select(cellOf(col(xCol), cellSize).as("cell_x"),
        cellOf(col(yCol), cellSize).as("cell_y"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n"),
        avg(col("x")).as("avg_x"), avg(col("y")).as("avg_y"))

  /** All unordered point pairs within `radius` (closed: dist ≤ r),
    * grid-blocked. Requires `cellSize ≥ radius` — the no-false-negative
    * precondition (a pair within r then spans at most one cell step per
    * axis).
    *
    * Candidate generation replicates each point to its own cell plus
    * the four FORWARD neighbor cells ((+1,-1),(+1,0),(+1,1),(0,+1)) and
    * joins replicas against home points on cell equality. Every
    * unordered pair is emitted exactly once — same-cell pairs via the
    * home replica with the `id <` tiebreak, cross-cell pairs via
    * whichever point sits backward of the other (the forward offsets
    * cover one half-plane of the 8-neighborhood; the join's asymmetry
    * covers the mirror half) — so no distinct/dedup pass is needed.
    * 5n replicated rows against the 9n of the naive full-neighborhood
    * expansion, one shuffle each side, keyed on the cell.
    *
    * Output: `(id_a, id_b, dist2)` with `id_a < id_b`; `dist2` is the
    * squared distance — the comparison needs no sqrt, and on
    * integer-valued coordinates it is exact.
    */
  def radiusPairs(points: DataFrame, idCol: String, xCol: String,
                  yCol: String, radius: Double, cellSize: Double): DataFrame = {
    require(cellSize >= radius,
      s"cellSize ($cellSize) must be >= radius ($radius): a pair within " +
        "radius may otherwise span 2+ cells per axis and the 3x3 " +
        "neighborhood join silently drops it")
    val p = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", cellOf(col("x"), cellSize))
      .withColumn("cy", cellOf(col("y"), cellSize))
    val offsets = array(
      struct(lit(0L).as("dx"), lit(0L).as("dy")),
      struct(lit(1L).as("dx"), lit(-1L).as("dy")),
      struct(lit(1L).as("dx"), lit(0L).as("dy")),
      struct(lit(1L).as("dx"), lit(1L).as("dy")),
      struct(lit(0L).as("dx"), lit(1L).as("dy")))
    val replicas = p.withColumn("o", explode(offsets))
      .select(col("id").as("id_r"), col("x").as("xr"), col("y").as("yr"),
        (col("cx") + col("o.dx")).as("jx"),
        (col("cy") + col("o.dy")).as("jy"),
        (col("o.dx") === 0L && col("o.dy") === 0L).as("home"))
    val homes = p.select(col("id").as("id_h"), col("x").as("xh"),
      col("y").as("yh"), col("cx").as("jx"), col("cy").as("jy"))
    val d2 = (col("xr") - col("xh")) * (col("xr") - col("xh")) +
      (col("yr") - col("yh")) * (col("yr") - col("yh"))
    replicas.join(homes, Seq("jx", "jy"))
      .filter(!col("home") || col("id_r") < col("id_h"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(radius * radius))
      .select(least(col("id_r"), col("id_h")).as("id_a"),
        greatest(col("id_r"), col("id_h")).as("id_b"), col("dist2"))
  }

  /** Points-in-rectangle containment counts: for each box (closed on
    * all four edges), how many points it contains — zero-count boxes
    * kept. `boxes` is dimension-sized (map regions, geofences) and
    * broadcasts; the points side streams through the broadcast
    * nested-loop containment filter once, aggregates on the box key,
    * and the box table left-joins the (≤ |boxes|-row) counts back. The
    * fact side never shuffles on anything but the final |boxes|-bounded
    * aggregate. For box tables too large to broadcast, block boxes AND
    * points to grid cells with cs ≥ max box extent and equi-join on the
    * cell first — the [[radiusPairs]] discipline; not needed here.
    */
  def boxJoin(points: DataFrame, xCol: String, yCol: String,
              boxes: DataFrame, keyCols: Seq[String]): DataFrame = {
    val inside = points.join(broadcast(boxes),
      col(xCol) >= col("x_lo") && col(xCol) <= col("x_hi") &&
        col(yCol) >= col("y_lo") && col(yCol) <= col("y_hi"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    boxes.join(broadcast(inside), keyCols, "left")
      .select(keyCols.map(col) :+
        coalesce(col("cnt"), lit(0L)).as("n_pts"): _*)
  }

  /** Great-circle distance in meters (haversine, mean earth radius
    * R=6371008.8 m). Builtin trig only — whole-stage-codegen'd, no UDF.
    * The `least(1, h)` clamp guards asin against h = 1 + ulp on
    * antipodal inputs. Accuracy is the haversine model's (~0.5% vs the
    * ellipsoid), fine for radius screens; NOT oracle-gated because libm
    * sin/cos ulp differences across engines break bit-equality.
    */
  def haversineMeters(lat1: Column, lon1: Column,
                      lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1)
    val dlon = radians(lon2 - lon1)
    val h = pow(sin(dlat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon / 2), 2)
    lit(2.0 * 6371008.8) * asin(sqrt(least(lit(1.0), h)))
  }

  // ---------------------------------------------------------------- fixture

  /** Deterministic point cloud: two points per customer ("home" at a
    * hash-scattered location in [0,65536)², "work" offset by a
    * per-customer delta in [-200,200]²) — so near pairs exist at every
    * scale factor and the work-point distances straddle the q159 radius
    * boundary (|offset| ranges 0..~283 around r=200). All coordinates
    * are INTEGER-VALUED doubles: every downstream difference, square,
    * sum and mean is exact IEEE arithmetic, bit-equal in DuckDB
    * (OracleSql mirrors this derivation verbatim).
    */
  def spatialPoints(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey").cast("long").as("k"))
    val hx = (col("k") * lit(2654435761L)) % 65536L
    val hy = (col("k") * lit(40503L)) % 65536L
    val home = c.select((col("k") * 2L).as("id"),
      hx.cast("double").as("x"), hy.cast("double").as("y"))
    val work = c.select((col("k") * 2L + 1L).as("id"),
      (hx + (col("k") * lit(48271L)) % 401L - 200L).cast("double").as("x"),
      (hy + (col("k") * lit(16807L)) % 401L - 200L).cast("double").as("y"))
    home.unionAll(work)
  }

  /** q158: map-tile density — per-cell count and exact centroid at
    * cellSize 256 (a power of two: x/256 is exact, so the floor is).
    */
  def cellDensityQuery(s: SparkSession, dir: String): DataFrame =
    cellDensity(spatialPoints(s, dir), "x", "y", cellSize = 256.0)
      .orderBy(col("cell_x"), col("cell_y"))

  /** q159: all point pairs within r=200 (closed), grid-blocked at
    * cs=256 ≥ r. The oracle is the O(n²) brute-force distance join —
    * agreement proves the blocking exhaustive, the same
    * candidate-generation proof pattern as q28's pigeonhole oracle.
    */
  def radiusPairsQuery(s: SparkSession, dir: String): DataFrame =
    radiusPairs(spatialPoints(s, dir), "id", "x", "y",
        radius = 200.0, cellSize = 256.0)
      .orderBy(col("id_a"), col("id_b"))

  /** q160: points-in-rectangle counts over 25 nation-derived geofence
    * boxes (closed edges, zero-count boxes kept). Boxes broadcast; the
    * point side never shuffles before the |boxes|-bounded aggregate.
    */
  def boxJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey").cast("long")
    val boxes = Tables.nation(s, dir).select(
      col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
      ((k * 9973L) % 60000L).cast("double").as("x_lo"),
      ((k * 9973L) % 60000L + 4000L + (k % 7L) * 1000L)
        .cast("double").as("x_hi"),
      ((k * 12007L) % 60000L).cast("double").as("y_lo"),
      ((k * 12007L) % 60000L + 4000L + (k % 5L) * 1500L)
        .cast("double").as("y_hi"))
    boxJoin(spatialPoints(s, dir), "x", "y", boxes,
        Seq("n_nationkey", "n_name"))
      .orderBy(col("n_nationkey"))
  }
}
