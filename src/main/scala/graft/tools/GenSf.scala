package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-factor amplifier for the driver testdata (`TESTDATA.md`): builds
  * an sf-N× directory from an existing one, preserving schemas, per-column
  * empirical distributions, and referential integrity, so the engine's
  * scaling behavior can be MEASURED instead of argued from plan shapes
  * (SCALING.md records the audit).
  *
  *   sbt "runMain graft.tools.GenSf /root/testdata/sf0.1 /tmp/graft-sf1 10"
  *
  * Construction, per table family:
  *
  *  - region/nation: copied verbatim (dimensions don't scale, as in TPC-H).
  *  - customer/supplier/part/orders/lineitem: K key-offset replicas. Every
  *    non-key column keeps its exact empirical distribution (values are
  *    reused); key-derived names are re-derived from the new key, so
  *    uniqueness properties survive. Foreign keys are offset consistently,
  *    which preserves join fan-outs exactly (each replica is a disjoint
  *    copy of the relationship graph — the honest shape for an entity-
  *    partitioned 10× world; time columns are NOT shifted, so per-day
  *    densities grow K× like a busier system).
  *  - events: same key-offset treatment (event_id, user_id); `ts` stays a
  *    raw nanosecond long exactly as the driver writes it (see
  *    `Tables.events`).
  *  - documents: replica 0 is the original corpus; replicas k>0 are FRESH
  *    texts sampled from the per-language empirical unigram distribution
  *    at the original doc's length (the original corpus is itself iid
  *    word-salad, so this is the same generative process), with planted
  *    structure re-created per replica: ~1 in 40 docs is a ~15%-mutated
  *    copy of its language neighbor (near-dup pairs) and ~1 in 625 an
  *    exact copy (exact-dup rate matches the source corpus). ids
  *    interleave (orig*K + k) so id-prefix query predicates keep sampling
  *    all replicas.
  *  - embeddings: replica k>0 applies a fixed seeded ROTATION to the unit
  *    sphere — within-replica pairwise cosines (cluster spread, near-dup
  *    pairs, label geometry) are preserved EXACTLY, while cross-replica
  *    similarities scramble to background level. ids interleave.
  *
  * All randomness is java.util.Random seeded from (replica, row id) —
  * byte-identical output regardless of partitioning.
  */
object GenSf {

  private def replicas(spark: SparkSession, k: Int): DataFrame =
    broadcast(spark.range(k).select(col("id").cast("int").as("k")))

  /** Deterministic orthonormal matrix (Gram-Schmidt over seeded
    * gaussians); replica 0 gets the identity. */
  private def rotation(seed: Long, d: Int): Array[Array[Float]] = {
    if (seed == 0L) return Array.tabulate(d, d)((i, j) => if (i == j) 1.0f else 0.0f)
    val rnd = new java.util.Random(seed * 0x9E3779B97F4A7C15L + 1L)
    val m = Array.fill(d, d)(rnd.nextGaussian())
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) {
        var dot = 0.0; var c = 0
        while (c < d) { dot += m(i)(c) * m(j)(c); c += 1 }
        c = 0
        while (c < d) { m(i)(c) -= dot * m(j)(c); c += 1 }
        j += 1
      }
      var n = 0.0; var c = 0
      while (c < d) { n += m(i)(c) * m(i)(c); c += 1 }
      n = math.sqrt(n); c = 0
      while (c < d) { m(i)(c) /= n; c += 1 }
      i += 1
    }
    m.map(_.map(_.toFloat))
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    val ks = replicas(spark, factor)

    // dimensions: verbatim
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    // relational tables: key-offset replicas, names re-derived from keys
    val cust = read("customer")
    val nCust = cust.agg(max("c_custkey")).head().getLong(0) + 1L
    write(cust.crossJoin(ks).select(
      (col("c_custkey") + col("k") * nCust).as("c_custkey"),
      format_string("Customer#%09d", col("c_custkey") + col("k") * nCust).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer", 4)

    val supp = read("supplier")
    val nSupp = supp.agg(max("s_suppkey")).head().getLong(0) + 1L
    write(supp.crossJoin(ks).select(
      (col("s_suppkey") + col("k") * nSupp).as("s_suppkey"),
      format_string("Supplier#%09d", col("s_suppkey") + col("k") * nSupp).as("s_name"),
      col("s_nationkey"), col("s_acctbal")),
      "supplier", 1)

    val part = read("part")
    val nPart = part.agg(max("p_partkey")).head().getLong(0) + 1L
    write(part.crossJoin(ks).select(
      (col("p_partkey") + col("k") * nPart).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")),
      "part", 4)

    val orders = read("orders")
    val nOrd = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
    write(orders.crossJoin(ks).select(
      (col("o_orderkey") + col("k") * nOrd).as("o_orderkey"),
      (col("o_custkey") + col("k") * nCust).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")),
      "orders", 8)

    write(read("lineitem").crossJoin(ks).select(
      (col("l_orderkey") + col("k") * nOrd).as("l_orderkey"),
      (col("l_partkey") + col("k") * nPart).as("l_partkey"),
      (col("l_suppkey") + col("k") * nSupp).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")),
      "lineitem", 16)

    // events: ts passes through VERBATIM in whatever encoding the driver
    // shipped this round — long (the nanosAsLong read of the old
    // TIMESTAMP(NANOS) files) or native TIMESTAMP(MICROS) since round 9.
    // Tables.events inspects the loaded schema and adapts to either.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = read("events")
    val nEv = events.agg(max("event_id")).head().getLong(0) + 1L
    val nUser = events.agg(max("user_id")).head().getLong(0) + 1L
    write(events.crossJoin(ks).select(
      (col("event_id") + col("k") * nEv).as("event_id"),
      col("ts"),
      (col("user_id") + col("k") * nUser).as("user_id"),
      col("event_type"), col("value"), col("props")),
      "events", 8)

    // documents: per-language empirical unigram model, collected to the
    // driver (the vocab is dimension-sized) and broadcast in the sampler
    val docs = read("documents")
    val vocabRows = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("lang", "tok").count()
      .collect()
    val vocab: Map[String, (Array[String], Array[Double])] =
      vocabRows.groupBy(_.getString(0)).map { case (lang, rows) =>
        val toks = rows.map(r => (r.getString(1), r.getLong(2).toDouble))
          .sortBy(_._1)
        val total = toks.map(_._2).sum
        val cum = toks.map(_._2 / total).scanLeft(0.0)(_ + _).tail
        lang -> (toks.map(_._1), cum)
      }
    val bVocab = spark.sparkContext.broadcast(vocab)

    def sampleTok(lang: String, rnd: java.util.Random): String = {
      val (toks, cum) = bVocab.value(lang)
      val u = rnd.nextDouble()
      var lo = 0; var hi = cum.length - 1
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (cum(mid) < u) lo = mid + 1 else hi = mid
      }
      toks(lo)
    }
    val freshText = udf { (lang: String, origText: String, docId: Long, k: Int) =>
      if (k == 0) origText
      else {
        val n = origText.split(" ").count(_.nonEmpty)
        val rnd = new java.util.Random(k.toLong * 1000003L + docId * 7919L + 17L)
        Array.fill(math.max(1, n))(sampleTok(lang, rnd)).mkString(" ")
      }
    }
    val mutate = udf { (lang: String, partner: String, docId: Long, k: Int) =>
      val rnd = new java.util.Random(k.toLong * 999983L + docId * 104729L + 29L)
      partner.split(" ").filter(_.nonEmpty)
        .map(t => if (rnd.nextDouble() < 0.15) sampleTok(lang, rnd) else t)
        .mkString(" ")
    }
    val fresh = docs.crossJoin(ks)
      .withColumn("text", freshText(col("lang"), col("text"), col("doc_id"), col("k")))
    // planted structure per (replica>0, lang): every 40th doc a ~15%
    // mutation of its language neighbor, every 625th an exact copy —
    // matching the source corpus's near-/exact-dup rates
    val w = Window.partitionBy(col("k"), col("lang")).orderBy(col("doc_id"))
    val planted = fresh
      .withColumn("rn", row_number().over(w))
      .withColumn("prev", lag(col("text"), 1).over(w))
      .withColumn("text",
        when(col("k") === 0 || col("prev").isNull, col("text"))
          .when(col("rn") % 625 === 0, col("prev"))
          .when(col("rn") % 40 === 0,
            mutate(col("lang"), col("prev"), col("doc_id"), col("k")))
          .otherwise(col("text")))
    write(planted.select(
      (col("doc_id") * factor + col("k")).as("doc_id"),
      col("text"), col("lang"), col("source"),
      length(col("text")).cast("long").as("n_chars")),
      "documents", 4)

    // embeddings: seeded per-replica rotation of the unit sphere
    val dims = read("embeddings").select(size(col("embedding"))).head().getInt(0)
    val rots = spark.sparkContext.broadcast(
      Array.tabulate(factor)(k => rotation(k.toLong, dims)))
    val rotate = udf { (v: Seq[Float], k: Int) =>
      if (k == 0) v
      else {
        val r = rots.value(k)
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length) {
          var s = 0.0; var j = 0
          while (j < v.length) { s += r(i)(j) * v(j); j += 1 }
          out(i) = s.toFloat
          i += 1
        }
        out.toSeq
      }
    }
    write(read("embeddings").crossJoin(ks).select(
      (col("vec_id") * factor + col("k")).as("vec_id"),
      rotate(col("embedding"), col("k")).as("embedding"),
      col("label")),
      "embeddings", 2)

    spark.stop()
  }
}
