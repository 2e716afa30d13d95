package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // orthogonal + parallel vectors with known cosines
  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)),   // cos(0,1)=1
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // cos(0,2)=0
    (3L, Array(1.0f, 1.0f, 0.0f, 0.0f)),   // cos(0,3)=√2/2≈0.7071
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))  // cos(0,4)=-1
    .toDF("vec_id", "embedding")

  test("brute-force cosine top-k: exact values, correct order, self excluded") {
    val out = Similarity.cosineTopK(vecs, col("vec_id") === 0L, k = 4).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L, 2L, 4L))
    val cos = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(cos(1L) == 1.0 && cos(2L) == 0.0 && cos(4L) == -1.0)
    assert(math.abs(cos(3L) - 0.7071) < 1e-9)
  }

  test("lsh ann: same-direction vectors share a bucket; results subset of exact") {
    val out = Similarity.lshCosineTopK(vecs, col("vec_id") === 0L, k = 4, bits = 4)
      .collect()
    // parallel vector 1 is always in vec 0's bucket (identical projections)
    assert(out.map(_.getLong(2)).contains(1L))
    val exact = Similarity.cosineTopK(vecs, col("vec_id") === 0L, k = 4)
      .collect().map(_.getLong(2)).toSet
    assert(out.map(_.getLong(2)).toSet.subsetOf(exact))
  }

  test("ivf ann: results are a subset of exact top-k; probing finds the parallel vector") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.cosineTopK(e, col("vec_id") < 5, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfCosineTopK(e, col("vec_id") < 5, k = 5,
      nlist = 8, nprobe = 8) // nprobe = nlist ⇒ exhaustive ⇒ full recall
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf == exact) // probing every list must reproduce brute force
    val partial = Similarity.ivfCosineTopK(e, col("vec_id") < 5, k = 5,
      nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(partial.subsetOf(exact) || partial.nonEmpty) // approximate but sane
  }

  test("embedding near-dup pairs: parallel vectors found at high threshold") {
    val out = Similarity.embeddingNearDupPairs(vecs, threshold = 0.95, bandBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((0L, 1L)))
    assert(!out.exists { case (a, b) => Set(a, b).contains(2L) && Set(a, b).contains(0L) })
  }

  test("banded near-dup: multi-table recall dominates single-table; no dup pairs") {
    // On real embeddings (sf0.001), the OR-construction must find at least
    // every pair a single band finds, and each pair reports exactly once
    // even when it collides in several bands.
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val one = Similarity.embeddingNearDupPairs(e, threshold = 0.3,
      bandBits = 6, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.embeddingNearDupPairs(e, threshold = 0.3,
      bandBits = 6, tables = 8).collect()
    val bandedPairs = banded.map(r => (r.getLong(0), r.getLong(1)))
    assert(bandedPairs.length == bandedPairs.toSet.size) // distinct collapsed
    assert(one.subsetOf(bandedPairs.toSet)) // band 0 is table 0's bucket
    assert(bandedPairs.toSet.size >= one.size)
  }

  test("q30 driver row is non-vacuous: the banded join returns rows at sf0.001") {
    val out = Similarity.nearDupQuery(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) >= 0.4))
  }

  test("q166 mutual-NN: every pair is reciprocal-top-1 within its IVF " +
    "list (in-memory recompute), ordered, duplicate-free, and hubs " +
    "yield at most one mutual partner") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val nlist = math.max(16L,
      math.ceil(math.sqrt(e.count().toDouble)).toLong).toInt
    val asg = Similarity.ivfAssign(e,
        Similarity.ivfCentroids(e, nlist), nprobe = 1)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Long]("centroid_id"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // in-memory reciprocal-top-1 within each list, same tie-break
    val byList = asg.groupBy(_._2)
    val top1 = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    for ((_, vs) <- byList; (id, _, v) <- vs if vs.length > 1) {
      val best = vs.filter(_._1 != id)
        .map { case (j, _, u) => (j, cos(v, u)) }
        .minBy { case (j, c) =>
          (-BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP), j) }
      top1(id) = best
    }
    val want = (for ((a, (b, c)) <- top1
      if top1.get(b).exists(_._1 == a) && a < b)
      yield (a, b, BigDecimal(c).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = Similarity.mutualNnQuery(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine"))).toSet
    assert(got == want, s"mutual sets differ: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty, "the planted near-dup corpus must yield mutual pairs")
    // mutuality means no id appears in two pairs
    val ids = got.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(ids.length == ids.distinct.length, "an id can have only one mutual partner")
  }
}
