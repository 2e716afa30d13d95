package graft.similarity

import graft.SparkSpec

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("component means are exact per (label, dim)") {
    val d = emb(
      (1L, Seq(1f, 0f, 2f), 0),
      (2L, Seq(3f, 2f, 0f), 0),
      (3L, Seq(0f, 5f, 5f), 1))
    val m = Centroids.componentMeans(d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m((0, 0)) === 2.0 && m((0, 1)) === 1.0 && m((0, 2)) === 1.0)
    assert(m((1, 0)) === 0.0 && m((1, 1)) === 5.0 && m((1, 2)) === 5.0)
  }

  test("orthogonal centroids score 0, parallel centroids score 1") {
    val d = emb(
      (1L, Seq(2f, 0f), 0), (2L, Seq(4f, 0f), 0),   // centroid (3, 0)
      (3L, Seq(0f, 5f), 1),                          // centroid (0, 5)
      (4L, Seq(1f, 0f), 2))                          // centroid (1, 0) ∥ label 0
    val m = Centroids.labelCentroidMatrix(d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m((0, 1)) === 0.0)
    assert(m((0, 2)) === 1.0)
    assert(m((1, 2)) === 0.0)
    assert(m.size === 3, "upper triangle only: k(k-1)/2 pairs")
  }

  test("cosine matches a hand-computed mixed-sign pair") {
    val d = emb(
      (1L, Seq(1f, 1f), 0),
      (2L, Seq(1f, -1f), 1),
      (3L, Seq(1f, 0f), 2))
    val m = Centroids.labelCentroidMatrix(d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m((0, 1)) === 0.0)                     // (1,1)·(1,-1) = 0
    assert(math.abs(m((0, 2)) - 0.707107) < 1e-6) // cos 45°
  }
}
