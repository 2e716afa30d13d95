package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style parity: the optimized operators must agree exactly with
  * naive reference plans (inequality join + per-row argmax) on seeded
  * random datasets — the same oracle idea as DuckDB, but in-process and
  * over many shapes (duplicate timestamps, missing keys, empty sides).
  */
class JoinParitySpec extends SparkSpec {
  import spark.implicits._

  def randomData(seed: Int): (DataFrame, DataFrame) = {
    val rnd = new Random(seed)
    val keys = Seq("a", "b", "c", "d")
    val points = (0 until 80).map { i =>
      (i.toLong, keys(rnd.nextInt(keys.length)), rnd.nextInt(1000).toLong)
    }.toDF("pid", "k", "t")
    val intervals = (0 until 40).map { i =>
      val s = rnd.nextInt(1000).toLong
      (100L + i, keys(rnd.nextInt(keys.length)), s, s + rnd.nextInt(120).toLong)
    }.toDF("iid", "k", "start", "end")
    (points, intervals)
  }

  test("range join ≡ naive inequality join across seeds and bucket widths") {
    (1 to 5).foreach { seed =>
      val (points, intervals) = randomData(seed)
      val naive = points.join(intervals, Seq("k"))
        .filter(col("start") <= col("t") && col("t") < col("end"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      Seq(7L, 64L, 1000L).foreach { w =>
        val fast = RangeJoin.pointInInterval(points, intervals,
            "k", "t", "start", "end", w)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(fast == naive, s"seed=$seed width=$w")
      }
    }
  }

  test("as-of join ≡ naive join + argmax across seeds (with ties)") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val keys = Seq("a", "b", "c")
      // duplicate (key, ts) on the left is allowed; right side is unique
      // per (key, ts) by construction (the operator's contract)
      val right = (0 until 30).map { i =>
        (keys(rnd.nextInt(keys.length)), (rnd.nextInt(50) * 20).toLong, s"r$i")
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "rts", "payload")
      val left = (0 until 60).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.length)), rnd.nextInt(1100).toLong)
      }.toDF("lid", "k", "lts")

      val naive = left.join(right, Seq("k"), "left")
        .filter(col("rts").isNull || col("rts") <= col("lts"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("lid")).orderBy(col("rts").desc_nulls_last)))
        .filter(col("rnk") === 1)
        .select(col("lid"), col("payload"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

      val fast = AsOfJoin.backward(left, right, "k", "lts", "rts", Seq("payload"))
        .collect().map(r => r.getAs[Long]("lid") -> Option(r.getAs[String]("payload")))
        .toMap

      // the naive plan loses lefts whose key has no right rows at all —
      // align domains before comparing
      val lids = left.select("lid").as[Long].collect()
      lids.foreach { lid =>
        assert(fast.getOrElse(lid, None) == naive.getOrElse(lid, None),
          s"seed=$seed lid=$lid")
      }
    }
  }

  test("forward as-of ≡ naive join + argmin across seeds, incl. tolerance") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val keys = Seq("a", "b", "c")
      val right = (0 until 30).map { i =>
        (keys(rnd.nextInt(keys.length)), (rnd.nextInt(50) * 20).toLong, s"r$i")
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "rts", "payload")
      val left = (0 until 60).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.length)), rnd.nextInt(1100).toLong)
      }.toDF("lid", "k", "lts")

      for (tol <- Seq(None, Some(100L))) {
        val naive = left.join(right, Seq("k"), "left")
          .filter(col("rts").isNull
            || (col("rts") >= col("lts")
              && tol.map(t => col("rts") - col("lts") <= t).getOrElse(lit(true))))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("lid")).orderBy(col("rts").asc_nulls_last)))
          .filter(col("rnk") === 1)
          // a row may survive the left join but fail the direction filter's
          // rts bound for every right row — those lefts match nothing
          .select(col("lid"),
            when(col("rts").isNotNull, col("payload")).as("payload"))
          .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap

        val fast = AsOfJoin.forward(left, right, "k", "lts", "rts",
            Seq("payload"), tolerance = tol)
          .collect().map(r => r.getAs[Long]("lid") -> Option(r.getAs[String]("payload")))
          .toMap

        val lids = left.select("lid").as[Long].collect()
        lids.foreach { lid =>
          assert(fast.getOrElse(lid, None) == naive.getOrElse(lid, None),
            s"seed=$seed tol=$tol lid=$lid")
        }
      }
    }
  }
}
