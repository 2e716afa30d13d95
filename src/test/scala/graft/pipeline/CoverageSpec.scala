package graft.pipeline

import graft.SparkSpec

class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 5): Seq[(Long, Long, Long, Long)] =
    Coverage.greedyCover(docs.toDF("doc_id", "text"), k).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

  test("hand-traced greedy trajectory: biggest vocabulary first, " +
    "marginal (not raw) gains after, ties to the smaller doc_id") {
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens
      (2L, "a b c d e"),      // 5 tokens — picked first
      (3L, "d e f"),          // marginal after 2: {f} = 1
      (4L, "f g"),            // marginal after 2: {f, g} = 2 — picked second
      (5L, "a b"))            // marginal 0 after pick 1
    // round 3: doc 1 gains 0, doc 3 gains {f}\{f}=0 ... doc 3's f is
    // covered by 4; everything residual is covered => stops at 2 picks
    assert(run(docs) == Seq((1L, 2L, 5L, 5L), (2L, 4L, 2L, 7L)))
  }

  test("equal-gain tie at round 1 goes to the smaller doc_id") {
    val docs = Seq((7L, "x y"), (3L, "p q"), (9L, "r s"))
    val got = run(docs)
    assert(got.head == (1L, 3L, 2L, 2L))
    assert(got.map(_._2).toSet == Set(3L, 7L, 9L), "all three get picked")
  }

  test("duplicate tokens inside a doc count once; empty docs never picked") {
    val docs = Seq((1L, "a a a a a a"), (2L, "b c"), (3L, ""), (4L, "  "))
    val got = run(docs)
    assert(got == Seq((1L, 2L, 2L, 2L), (2L, 1L, 1L, 3L)))
  }

  test("greedy matches an in-memory reference on seeded random corpora") {
    for (seed <- Seq(5L, 13L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      val docs = (0 until 60).map(i => (i.toLong,
        Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
      var covered = Set.empty[String]
      val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var r = 1L
      var go = true
      while (r <= 5 && go) {
        val cands = sets.map { case (id, s) => (id, (s -- covered).size) }
          .filter(_._2 > 0)
        if (cands.isEmpty) go = false
        else {
          val (id, g) = cands.toSeq.minBy { case (i, g) => (-g, i) }
          covered ++= sets(id)
          want += ((r, id, g.toLong, covered.size.toLong))
          r += 1
        }
      }
      assert(run(docs) == want.toSeq, s"seed $seed")
    }
  }

  test("covered_total is the running cumulative gain and is monotone " +
    "with decreasing marginal gains on the real corpus") {
    val got = Coverage.greedyCoverQuery(spark, "/root/testdata/sf0.001")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.map(_._2).scanLeft(0L)(_ + _).tail == got.map(_._3))
    // submodularity: marginal gains never increase along the trajectory
    assert(got.map(_._2) == got.map(_._2).sorted.reverse)
  }
}
