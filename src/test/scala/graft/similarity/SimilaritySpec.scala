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
}
