package graft.similarity

import graft.SparkSpec

/** k-NN classifier contracts: high accuracy on planted clustered
  * labels (the quality floor the geometry-free driver testdata cannot
  * provide), and the pinned vote tie-break.
  */
class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  test("planted label clusters classify at >= 0.9 accuracy") {
    // 4 labels on 4 orthogonal axes in 8-dim, small deterministic noise
    val rnd = new java.util.Random(7)
    val rows = (0 until 160).map { i =>
      // (i/2) % 4, NOT i % 4: the latter correlates label parity with
      // the even/odd split and empties every label from one side
      val label = (i / 2) % 4
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.15f)
      v(label) = v(label) + 1f
      (i.toLong, v, label)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cm = KnnClassify.knnConfusion(df).collect()
    val total = cm.map(_.getAs[Long]("n")).sum
    val diag = cm.filter(r =>
      r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    assert(total === 80L) // the odd holdout
    assert(diag.toDouble / total >= 0.9,
      s"planted-cluster accuracy ${diag.toDouble / total} below 0.9")
  }

  test("vote ties break toward the smaller label") {
    // two train vectors exactly symmetric about the query: one vote
    // each in the top-2, so the pinned (count desc, label asc) argmax
    // must pick the SMALLER label
    val df = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 3),
      (2L, Array(0f, 1f, 0f, 0f), 1),
      (1L, Array(1f, 1f, 0f, 0f), 9)) // query; its own label is ignored
      .toDF("vec_id", "embedding", "label")
    val cm = KnnClassify.knnConfusion(df, nlist = 1, nprobe = 1, k = 2)
      .collect()
    assert(cm.length === 1)
    assert(cm.head.getAs[Int]("true_label") === 9)
    assert(cm.head.getAs[Int]("pred_label") === 1)
    assert(cm.head.getAs[Long]("n") === 1L)
  }
}
