package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Randomized invariants for the pure-logic operators, each checked
  * against an independent in-memory brute-force reference (not against
  * the operator's own formulation). Inputs stay small (≤ ~40 rows) —
  * the point is semantic coverage of edge shapes (ties, duplicates,
  * empty groups), not volume.
  */
object GraftProperties extends Properties("graft") {

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.functions.{col, to_date}

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(10)

  private val dayGen = Gen.chooseNum(0, 40)
    .map(d => java.time.LocalDate.of(2024, 1, 1).plusDays(d))

  property("streaks: island lengths partition the distinct-day set") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(1L, 3L), dayGen))) { pairs =>
      import spark.implicits._
      val distinctPairs = pairs.distinct
      val days = distinctPairs.map { case (u, d) => (u, d.toString) }
        .toDF("user_id", "day")
        .withColumn("day", to_date(col("day")))
      val out = graft.operators.TimeSeries.streaks(days, "user_id", "day")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
      // reference: group consecutive runs per user in memory
      val ref = distinctPairs.groupBy(_._1).view.mapValues { ds =>
        val sorted = ds.map(_._2).distinct.sorted(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
        sorted.foldLeft(List.empty[(java.time.LocalDate, Long)]) {
          case ((start, len) :: rest, d)
            if start.plusDays(len).isEqual(d) => (start, len + 1) :: rest
          case (acc, d) => (d, 1L) :: acc
        }.map { case (s, l) => (s, l) }.toSet
      }.toMap
      out.groupBy(_._1).forall { case (u, rows) =>
        rows.map(r => (r._3, r._2)).toSet == ref(u)
      } && out.length == ref.values.map(_.size).sum
    }

  property("paretoFrontier equals the brute-force non-dominated set") =
    forAll(Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(1, 6), Gen.chooseNum(1, 6)))) { pts =>
      import spark.implicits._
      val df = pts.map { case (c, b) => ("g", c.toDouble, b) }
        .toDF("g", "cost", "benefit")
      val out = graft.analytics.CoreQueries
        .paretoFrontier(df, "g", "cost", "benefit")
        .collect().map(r => (r.getDouble(1), r.getInt(2))).toSet
      val prof = pts.map { case (c, b) => (c.toDouble, b) }.distinct
      val ref = prof.filter { case (c, b) =>
        !prof.exists { case (c2, b2) =>
          c2 <= c && b2 >= b && (c2 < c || b2 > b) }
      }.toSet
      out == ref
    }

  private val docGen: Gen[String] = Gen.chooseNum(1, 6).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    .map(_.mkString(" "))

  property("PPJoin equals the unfiltered inverted-index join") =
    forAll(Gen.listOfN(15, docGen),
        Gen.oneOf(0.34, 0.51, 0.75, 0.9)) { (texts, t) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val pp = graft.dedup.PPJoin.similarPairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val bf = graft.dedup.PPJoin.bruteForcePairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      pp == bf
    }

  property("gini bucket-offset ranking equals the direct formula") =
    forAll(Gen.listOfN(30, Gen.chooseNum(0, 100000))) { cents =>
      import spark.implicits._
      val xs = cents.zipWithIndex.map { case (c, i) =>
        (i.toLong, c.toDouble / 100.0) }
      val g = graft.analytics.CoreQueries
        .gini(xs.toDF("id", "x"), bucketW = 117.0, maxBucket = 9L)
        .collect()(0).getAs[Double]("gini")
      val sorted = xs.sortBy { case (id, x) => (x, id) }.map(_._2)
      val n = sorted.size
      val sx = sorted.sum
      val six = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val ref = if (sx == 0.0) Double.NaN
                else 2.0 * six / (n * sx) - (n + 1).toDouble / n
      (sx == 0.0 && g.isNaN) || math.abs(g - math.rint(ref * 1e6) / 1e6) < 2e-6
    }

  property("snapshot diff statuses match set-theoretic classification") =
    forAll(Gen.mapOf(Gen.zip(Gen.chooseNum(1L, 25L), Gen.chooseNum(0, 3))),
        Gen.mapOf(Gen.zip(Gen.chooseNum(1L, 25L), Gen.chooseNum(0, 3)))) {
      (oldM, newM) =>
        import spark.implicits._
        val o = oldM.toSeq.toDF("k", "v")
        val n = newM.toSeq.toDF("k", "v")
        val out = graft.operators.SnapshotDiff.diff(o, n, "k", Seq("v"))
          .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
        (oldM.keySet ++ newM.keySet).forall { k =>
          out(k) == ((oldM.get(k), newM.get(k)) match {
            case (None, Some(_)) => "added"
            case (Some(_), None) => "removed"
            case (Some(a), Some(b)) if a == b => "unchanged"
            case _ => "changed"
          })
        }
    }
}
