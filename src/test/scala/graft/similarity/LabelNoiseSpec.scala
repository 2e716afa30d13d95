package graft.similarity

import graft.SparkSpec

/** Label-noise screen contracts: planted flips dominate the flagged
  * set on clustered labels (the quality floor the geometry-free driver
  * testdata cannot provide), the integer majority rule, and the
  * singleton-list n_nbrs = 0 edge.
  */
class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  test("planted label flips on clustered data are caught with high recall " +
    "and precision") {
    // 4 labels on 4 orthogonal axes in 8-dim, small deterministic noise;
    // every 17th vector gets its label FLIPPED to the next class (17 is
    // coprime to 4, so the flips spread across all clusters — flips
    // concentrated in ONE cluster would start agreeing with each other)
    val rnd = new java.util.Random(11)
    val rows = (0 until 160).map { i =>
      val trueLabel = i % 4
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.15f)
      v(trueLabel) = v(trueLabel) + 1f
      val stored = if (i % 17 == 0) (trueLabel + 1) % 4 else trueLabel
      (i.toLong, v, stored)
    }
    val flipped = rows.filter(_._1 % 17 == 0).map(_._1).toSet
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = LabelNoise.knnDisagreement(df).collect()
    assert(out.length === 160)
    val flaggedIds = out.filter(_.getAs[Boolean]("flagged"))
      .map(_.getAs[Long]("vec_id")).toSet
    val caught = (flaggedIds & flipped).size.toDouble / flipped.size
    assert(caught >= 0.8, s"recall $caught below 0.8 " +
      s"(flagged ${flaggedIds.size}, flips ${flipped.size})")
    val precision =
      if (flaggedIds.isEmpty) 1.0
      else (flaggedIds & flipped).size.toDouble / flaggedIds.size
    assert(precision >= 0.7, s"precision $precision below 0.7 " +
      s"(flagged ${flaggedIds.mkString(",")})")
  }

  test("majority rule is strict: 2 disagree of 4 neighbors does not flag, " +
    "3 of 5 does") {
    // one tight clump of 5 sharing label 0 plus one query labeled 1:
    // the query's 5 neighbors all disagree -> flagged; each clump
    // member sees 4 same + 1 different -> not flagged
    val clump = (0 until 5).map(i =>
      (i.toLong, Array(1f, 0.01f * i, 0f, 0f), 0))
    val q = Seq((5L, Array(1f, 0.025f, 0f, 0f), 1))
    val df = (clump ++ q).toDF("vec_id", "embedding", "label")
    // nlist = 1: everything in one list (the derived default would give
    // each of the 6 vectors its own singleton list)
    val out = LabelNoise.knnDisagreement(df, nlist = 1).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_nbrs"), r.getAs[Long]("n_disagree"),
          r.getAs[Boolean]("flagged"))).toMap
    assert(out(5L) === ((5L, 5L, true)))
    (0L to 4L).foreach { id =>
      val (n, d, f) = out(id)
      assert(n === 5L && d === 1L && !f, s"clump member $id: ($n, $d, $f)")
    }
  }

  test("a vector alone in its list surfaces with n_nbrs = 0, not flagged, " +
    "not dropped") {
    // nlist = max(16, ...) with only 3 vectors: 3 centroids exist (one
    // per vector, codebook is min(n, nlist) rows) but assignment is by
    // cosine, so craft mutually-distant vectors that each win their own
    // centroid -- with 3 vectors and 16 requested lists the codebook is
    // the 3 vectors themselves, and each assigns to itself
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f, 0f), 1),
      (2L, Array(0f, 0f, 1f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = LabelNoise.knnDisagreement(df).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_nbrs") === 0L)
      assert(r.getAs[Long]("n_disagree") === 0L)
      assert(!r.getAs[Boolean]("flagged"))
    }
  }
}
