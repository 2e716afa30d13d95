package graft.similarity

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")

  test("projection is linear: proj(a+b) = proj(a) + proj(b)") {
    val a = Seq.tabulate(8)(i => (i + 1).toFloat)
    val b = Seq.tabulate(8)(i => (2 * i - 3).toFloat)
    val ab = a.zip(b).map { case (x, y) => x + y }
    val p = RandomProjection.project(emb((1L, a), (2L, b), (3L, ab)), k = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](3)).toMap
    p(1L).indices.foreach { j =>
      assert(math.abs(p(1L)(j) + p(2L)(j) - p(3L)(j)) < 1e-9)
    }
  }

  test("identical vectors project identically (deterministic signs)") {
    val v = Seq.tabulate(16)(i => (i * 0.5f - 3f))
    val p = RandomProjection.project(emb((1L, v), (2L, v)), k = 8)
      .collect().map(r => r.getSeq[Double](3))
    assert(p(0) === p(1))
  }

  test("audit counts all probe pairs and zero-distance pairs are excluded") {
    val v1 = Seq(1f, 0f, 0f, 0f)
    val v2 = Seq(0f, 1f, 0f, 0f)
    val d = emb((0L, v1), (1L, v2), (2L, v1), (50L, Seq(9f, 9f, 9f, 9f)))
    val r = RandomProjection.distortionAudit(d, k = 4, probeIds = 40L)
      .collect().head
    // probe ids 0,1,2 -> 3 pairs, but (0,2) has dx=0 -> 2 ratios
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Long]("n_in_band") <= 2L)
  }

  test("the Wang sign matrix is roughly balanced per projection dim") {
    // a one-hot input reads out one sign-matrix ROW; sum |mean| over dims
    val rows = (0 until 64).map { i =>
      (i.toLong, Seq.tabulate(64)(d => if (d == i) 1f else 0f))
    }
    val p = RandomProjection.project(emb(rows: _*), k = 16)
      .collect().map(_.getSeq[Double](3))
    val k = 16
    (0 until k).foreach { j =>
      val colSum = p.map(_(j)).sum * math.sqrt(k.toDouble) // undo 1/sqrt(k)
      assert(math.abs(colSum) <= 16.0,
        s"projection dim $j sign imbalance $colSum out of 64")
    }
  }
}
