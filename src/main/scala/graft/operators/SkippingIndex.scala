package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-file skipping index — the third leg of the storage-layout trio
  * (partition pruning `Layout.readDateRange` → clustering `zorderBy` →
  * FILE skipping), and the mechanism that decides at 100 TB whether a
  * point probe reads 3 files or 30,000. Parquet row-group min/max stats
  * prune range predicates on the CLUSTERED column, but for a point probe
  * on an UNCORRELATED column every file's [min, max] spans nearly the
  * whole domain and min/max skips nothing — that is precisely the gap
  * per-file Bloom indexes fill (Parquet's own bloom_filter column
  * feature, Delta/Iceberg bloom index files). q144 measures both on the
  * same layout, side by side, per probe key.
  *
  * Construction (all relational, all integer — the DuckDB oracle
  * replays index build and probe planning bit-for-bit):
  *  - "files": lineitem range-binned on `l_orderkey` into `NFiles`
  *    equal key spans (the shape a clustered/compacted table has on
  *    disk; file id = key div span, one broadcast scalar).
  *  - min/max leg: per-file [min, max] of `l_partkey` — the stats
  *    parquet already stores; a probe key passes iff it lies inside.
  *  - bloom leg: per-file set of DISTINCT probed-column keys → k=3
  *    affine-hash bits (the q141 hash family) into an m-bit space sized
  *    from the data: m = BitsPerKey · ⌈stored entries / NFiles⌉, where
  *    entries are distinct (file, key) PAIRS — the bits-per-element
  *    sizing real bloom indexes use. Sizing from global distinct keys
  *    would saturate (an uncorrelated column repeats most keys in
  *    every file), and a FIXED m would saturate at 100× — both ways
  *    the filter silently passes everything. A file passes iff ALL k
  *    bits for the key are set.
  *
  * Scale shape: the distinct-(file, key) reduction is the only
  * corpus-sized exchange; bit explode (×k) happens after it, on the
  * deduped grain, and the index itself is ≤ files·m bits of metadata.
  * Probing never touches the corpus — probe keys × bits join against
  * the index only. No false negatives, by construction (asserted per
  * probe in SkippingIndexSpec along with the fp-rate band).
  */
object SkippingIndex {

  val NFiles = 64
  val BloomK = 3
  val BitsPerKey = 16L

  import graft.analytics.CountMin.P

  /** q144: build the index over lineitem's partkey at the orderkey-
    * clustered file grain, then plan 13 point probes (the 10 smallest
    * present partkeys + 3 absent ones past the max). One row per probe:
    * total files, min/max-passing files, bloom-passing files, and the
    * key's TRUE file count — bloom_pass ≥ true_files always, and the
    * min/max column shows why stats alone can't skip uncorrelated
    * probes.
    */
  def fileSkippingQuery(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    // file id = orderkey div span: the on-disk grain of a table
    // clustered on orderkey (one tiny scalar frame, broadcast)
    val span = li.agg(
      (ceil((max(col("l_orderkey")) + 1) / lit(NFiles.toDouble)))
        .cast("long").as("span"))
    // integer division on BOTH engines (`div` / `//`): a double divide
    // here would round differently under Spark's truncating cast vs
    // DuckDB's rounding cast
    val filed = li.crossJoin(broadcast(span))
      .select(expr("l_orderkey div span").as("file"),
        col("l_partkey").as("key"))
    // the only corpus-grain exchange: distinct (file, key)
    val fileKeys = filed.distinct().localCheckpoint()
    val stats = fileKeys.groupBy(col("file"))
      .agg(min(col("key")).as("mn"), max(col("key")).as("mx"))
    // data-sized bit space: BitsPerKey bits per STORED ENTRY per file —
    // entries are distinct (file, key) pairs, NOT global distinct keys:
    // an uncorrelated column repeats most keys in every file, so sizing
    // from global distinct would saturate the filter (integer ceil both
    // engines evaluate identically)
    val m = fileKeys.agg(count(lit(1)).as("nent"))
      .select((lit(BitsPerKey) *
        expr(s"(nent + ${NFiles - 1}) div ${NFiles}")).as("m"))
    def bit(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
            k: org.apache.spark.sql.Column,
            mCol: org.apache.spark.sql.Column) =
      ((a * ((k % lit(P) + lit(P)) % lit(P)) + b) % lit(P)) % mCol
    val hashes = graft.analytics.CountMin.Hashes.take(BloomK)
    // the k hash rows explode per stored entry (ONE pass over the deduped
    // (file, key) index) instead of unioning k full re-scans of it
    val hs = array(hashes.map { case (j, a, b) =>
      struct(lit(j).as("j"), lit(a).as("a"), lit(b).as("b"))
    }: _*)
    val bloomBits = fileKeys.crossJoin(broadcast(m))
      .select(col("file"), col("key"), col("m"), explode(hs).as("h"))
      .select(col("file"), col("h.j").as("j"),
        bit(col("h.a"), col("h.b"), col("key"), col("m")).as("bit"))
      .distinct()
    // probe set: 10 smallest present keys + 3 certainly-absent ones
    val present = fileKeys.select(col("key")).distinct()
      .orderBy(col("key")).limit(10)
    val mxKey = fileKeys.agg(max(col("key")).as("mxk"))
    val absent = mxKey.select(
      explode(array((1 to 3).map(i => col("mxk") + i): _*)).as("key"))
    val probes = present.unionByName(absent).localCheckpoint()
    val nFilesActual = stats.agg(count(lit(1)).as("n_files"))
    // min/max leg: files whose [mn, mx] contains the key
    val mmPass = probes.join(broadcast(stats),
        col("key") >= col("mn") && col("key") <= col("mx"))
      .groupBy(col("key")).agg(count(lit(1)).as("minmax_pass"))
    // bloom leg: files holding ALL k bits of the key (same one-pass
    // explode as the index build)
    val probeBits = probes.crossJoin(broadcast(m))
      .select(col("key"), col("m"), explode(hs).as("h"))
      .select(col("key"), col("h.j").as("j"),
        bit(col("h.a"), col("h.b"), col("key"), col("m")).as("bit"))
    val blPass = bloomBits.join(broadcast(probeBits), Seq("j", "bit"))
      .groupBy(col("key"), col("file"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === BloomK)
      .groupBy(col("key")).agg(count(lit(1)).as("bloom_pass"))
    val truth = probes.join(fileKeys, Seq("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("true_files"))
    probes
      .crossJoin(broadcast(mxKey))
      .withColumn("present", col("key") <= col("mxk"))
      .crossJoin(broadcast(nFilesActual))
      .join(mmPass, Seq("key"), "left")
      .join(blPass, Seq("key"), "left")
      .join(truth, Seq("key"), "left")
      .select(col("key").as("probe_key"), col("present"), col("n_files"),
        coalesce(col("minmax_pass"), lit(0L)).as("minmax_pass"),
        coalesce(col("bloom_pass"), lit(0L)).as("bloom_pass"),
        coalesce(col("true_files"), lit(0L)).as("true_files"))
      .orderBy(col("probe_key"))
  }
}
