package graft.analytics

import graft.SparkSpec

/** Isotonic contracts: minimax ≡ sequential PAVA on seeded grids (two
  * algorithms, one solution — the uniqueness of the isotonic fit),
  * monotonicity, conservation, and the no-op on already-monotone data.
  */
class IsotonicSpec extends SparkSpec {

  private def fit(cells: (Long, Long, Long)*) = {
    import spark.implicits._
    Isotonic.fit(cells.toDF("bin", "n", "conv")).collect()
      .map(r => (r.getLong(0), r.getDouble(4)))
  }

  /** Textbook sequential PAVA (pool adjacent violators). */
  private def pava(cells: Seq[(Long, Long, Long)]): Seq[(Long, Double)] = {
    case class Block(bins: List[Long], n: Long, c: Long) {
      def avg: Double = c.toDouble / n
    }
    var stack = List.empty[Block]
    cells.sortBy(_._1).foreach { case (b, n, c) =>
      var blk = Block(List(b), n, c)
      while (stack.nonEmpty && stack.head.avg >= blk.avg) {
        val top = stack.head; stack = stack.tail
        blk = Block(top.bins ++ blk.bins, top.n + blk.n, top.c + blk.c)
      }
      stack = blk :: stack
    }
    stack.reverse.flatMap(b => b.bins.map(_ -> b.avg))
  }

  test("minimax identity equals sequential PAVA on seeded random grids") {
    val rnd = new scala.util.Random(11)
    (1 to 8).foreach { _ =>
      val cells = (0L until 10L).map(b =>
        (b, 1L + rnd.nextInt(50).toLong, 0L))
        .map { case (b, n, _) => (b, n, rnd.nextInt(n.toInt + 1).toLong) }
      val exp = pava(cells).toMap
      fit(cells: _*).foreach { case (b, f) =>
        assert(math.abs(f - exp(b)) < 1e-6, s"bin $b")
      }
    }
  }

  test("the fit is monotone and conserves total conversions") {
    val cells = Seq((0L, 10L, 8L), (1L, 10L, 3L), (2L, 10L, 5L),
      (3L, 10L, 9L), (4L, 10L, 2L))
    val out = fit(cells: _*)
    val fs = out.sortBy(_._1).map(_._2)
    assert(fs.zip(fs.tail).forall { case (a, b) => a <= b + 1e-12 })
    val mass = out.sortBy(_._1).map(_._2).zip(cells.map(_._2))
      .map { case (f, n) => f * n }.sum
    assert(math.abs(mass - cells.map(_._3).sum) < 1e-4) // 6-dp fitted
  }

  test("already-monotone rates pass through untouched") {
    val out = fit((0L, 10L, 1L), (1L, 10L, 4L), (2L, 10L, 9L))
    assert(out.sortBy(_._1).map(_._2).toSeq === Seq(0.1, 0.4, 0.9))
  }

  test("q194: fitted is monotone in bin on testdata") {
    val rows = Isotonic.isotonicQuery(spark, "/root/testdata/sf0.001")
      .collect()
    val fs = rows.map(_.getDouble(4))
    assert(fs.zip(fs.tail).forall { case (a, b) => a <= b + 1e-12 })
  }
}
