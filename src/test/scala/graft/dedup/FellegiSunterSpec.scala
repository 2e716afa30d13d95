package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FS contracts: the all-agree pattern outscores the all-disagree one,
  * verdicts are monotone in the score, the weak-block cap bounds the
  * candidate volume, and matches concentrate in high-score patterns.
  */
class FellegiSunterSpec extends SparkSpec {

  private lazy val rows =
    FellegiSunter.fsQuery(spark, "/root/testdata/sf0.001").collect()

  private def score(r: org.apache.spark.sql.Row) = r.getDouble(5)
  private def pat(r: org.apache.spark.sql.Row) =
    (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2))

  test("scores match a full in-memory FS recompute (pairs, m/u, ratio)") {
    // brute-force: rebuild the registry, all three blocks, the counted
    // m/u and the per-pattern likelihood ratios entirely in memory
    val reg = GoldenRecord.dirtyRegistry(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), if (r.isNullAt(4)) None
        else Some(math.round(r.getDouble(4) * 100)), r.getString(5)))
    val byRid = reg.map(t => t._1 -> t).toMap
    def blockPairs[K](key: ((Long, String, String, String, Option[Long],
        String)) => K, ok: Seq[Long] => Boolean): Set[(Long, Long)] =
      reg.groupBy(key).values.filter(g => ok(g.map(_._1).toSeq))
        .flatMap { g =>
          val ids = g.map(_._1).sorted
          for (i <- ids.indices; j <- (i + 1) until ids.length)
            yield (ids(i), ids(j))
        }.toSet
    val pairs = blockPairs(_._2, _ => true) ++ blockPairs(_._3, _ => true) ++
      blockPairs(t => t._1 / 8, _.size <= 40)
    case class Cmp(aName: Boolean, aBal: Boolean, aSeg: Boolean, m: Boolean)
    val cmp = pairs.toSeq.map { case (ia, ib) =>
      val a = byRid(ia); val b = byRid(ib)
      Cmp(a._4 == b._4,
        a._5.isDefined && b._5.isDefined
          && math.abs(a._5.get - b._5.get) <= 1000L,
        a._6 == b._6, ia / 4 == ib / 4)
    }
    val nm = cmp.count(_.m); val nu = cmp.size - nm
    def prob(c: Int, n: Int) = (c + 1).toDouble / (n + 2).toDouble
    def term(agree: Boolean, mc: Int, uc: Int) =
      if (agree) prob(mc, nm) / prob(uc, nu)
      else (1.0 - prob(mc, nm)) / (1.0 - prob(uc, nu))
    val expected = cmp.groupBy(c => (c.aName, c.aBal, c.aSeg)).map {
      case (p, cs) =>
        val s = term(p._1, cmp.count(c => c.m && c.aName),
            cmp.count(c => !c.m && c.aName)) *
          term(p._2, cmp.count(c => c.m && c.aBal),
            cmp.count(c => !c.m && c.aBal)) *
          term(p._3, cmp.count(c => c.m && c.aSeg),
            cmp.count(c => !c.m && c.aSeg))
        p -> (cs.size.toLong, cs.count(_.m).toLong,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (n, m, s) = expected(pat(r))
      assert(r.getLong(3) === n && r.getLong(4) === m)
      assert(math.abs(score(r) - s) < 1e-6, s"pattern ${pat(r)}")
    }
  }

  test("verdicts follow the thresholds exactly") {
    rows.foreach { r =>
      val expected =
        if (score(r) >= 100.0) "link"
        else if (score(r) >= 1.0) "possible" else "non-link"
      assert(r.getString(6) === expected)
    }
  }

  test("the score ranks patterns by match precision: ordering patterns " +
    "by FS score orders their observed match rates too") {
    val byScore = rows.sortBy(score)
    val rates = byScore.map(r => r.getLong(4).toDouble / r.getLong(3))
    rates.zip(rates.tail).foreach { case (lo, hi) =>
      assert(lo <= hi + 1e-9, s"rates $lo -> $hi out of order")
    }
    // and the top pattern concentrates matches vs the overall rate
    val nAll = rows.map(_.getLong(3)).sum.toDouble
    val mAll = rows.map(_.getLong(4)).sum.toDouble
    assert(rates.last > mAll / nAll)
  }

  test("the weak-block cap binds the pair volume: a tight cap drops " +
    "oversized neighborhoods and strictly shrinks the candidate set") {
    val reg = GoldenRecord.dirtyRegistry(spark, "/root/testdata/sf0.001")
      .withColumn("entity", expr("rid DIV 4"))
    val tight = FellegiSunter.patternScores(reg, weakBlockCap = 3)
      .agg(sum(col("n_pairs"))).head.getLong(0)
    val open = FellegiSunter.patternScores(reg, weakBlockCap = 40)
      .agg(sum(col("n_pairs"))).head.getLong(0)
    assert(tight < open)
  }
}
