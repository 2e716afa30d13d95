package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

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

  // in-memory mirrors for the SemDeDup property: index-order double
  // accumulation (the engine's fold order) and Spark's HALF_UP round(·, 6)
  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.chooseNum(-2, 2).map(_.toFloat))
      .suchThat(_.exists(_ != 0f)).map(_.toArray)

  property("semDedup equals the in-memory greedy screen") =
    forAll(Gen.listOfN(12, vecGen), Gen.listOfN(3, vecGen),
        Gen.oneOf(0.3, 0.6, 0.9)) { (vs, cs, tau) =>
      import spark.implicits._
      val vecs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val cents = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      val out = graft.dedup.SemDedup.semDedup(
          vecs.toDF("vec_id", "embedding"),
          cents.toDF("centroid_id", "centroid"), tau)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
      // reference: argmax assignment → (c_cos asc, id) rank → greedy screen
      val assigned = vecs.map { case (id, v) =>
        val (cid, s) = cents.map { case (cid, c) => (cid, r6(cosRef(v, c))) }
          .maxBy { case (cid, s) => (s, -cid) }
        (id, v, cid, s)
      }
      val ranked = assigned.groupBy(_._3).toSeq.flatMap { case (_, ms) =>
        ms.sortBy { case (id, _, _, s) => (s, id) }.zipWithIndex
          .map { case ((id, v, c, s), idx) => (id, v, c, idx + 1L) }
      }
      val byCluster = ranked.groupBy(_._3)
      val ref = ranked.map { case (id, v, c, rnk) =>
        val dropped = byCluster(c).exists { case (_, jv, _, jrnk) =>
          jrnk < rnk && r6(cosRef(v, jv)) >= tau
        }
        (id, c, rnk, !dropped)
      }.toSet
      out == ref
    }

  private val wordGen: Gen[String] = Gen.chooseNum(1, 4)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b"))).map(_.mkString)

  property("BPE training equals the in-memory Sennrich reference") =
    forAll(Gen.nonEmptyListOf(Gen.zip(wordGen, Gen.chooseNum(1L, 3L)))) { ws =>
      import spark.implicits._
      val words = ws.toMap.toSeq // distinct words
      val got = graft.text.Bpe.train(words.toDF("word", "w"), nMerges = 3)
        .map(m => (m.step, m.lhs, m.rhs, m.freq))
      // reference: pair counts + (−freq, l, r) argmin + greedy index walk
      var vocab = words.map { case (w, c) =>
        (w.map(_.toString).toVector :+ "</w>", c) }
      val ref = scala.collection.mutable.Buffer[(Long, String, String, Long)]()
      var step = 1
      var done = false
      while (step <= 3 && !done) {
        val pairs = scala.collection.mutable.Map[(String, String), Long]()
        for ((seq, c) <- vocab; i <- 0 until seq.length - 1)
          pairs((seq(i), seq(i + 1))) =
            pairs.getOrElse((seq(i), seq(i + 1)), 0L) + c
        if (pairs.isEmpty) done = true
        else {
          val ((l, r), f) = pairs.toSeq
            .minBy { case ((l, r), f) => (-f, l, r) }
          ref += ((step.toLong, l, r, f))
          vocab = vocab.map { case (seq, c) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < seq.length) {
              if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += seq(i); i += 1 }
            }
            (b.result(), c)
          }
          step += 1
        }
      }
      got == ref.toSeq
    }

  property("bucket-offset quantiles equal the sorted nearest-rank values") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-500, 500)),
        Gen.nonEmptyListOf(Gen.chooseNum(1, 99)),
        Gen.oneOf(3.0, 17.0, 64.0, 1000.0)) { (xs, pcts, width) =>
      import spark.implicits._
      val df = xs.map(_.toDouble).toDF("x")
      val qs = pcts.distinct.map(_ / 100.0)
      val got = graft.analytics.Quantiles.globalQuantiles(df, "x", qs, width)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = xs.map(_.toDouble).sorted
      qs.forall { q =>
        val k = math.ceil(q * xs.size).toInt
        got(q) == sorted(k - 1)
      } && got.size == qs.size
    }

  property("grouped bucket-offset quantiles equal per-group nearest-rank values") =
    forAll(Gen.nonEmptyListOf(
          Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-500, 500))),
        Gen.nonEmptyListOf(Gen.chooseNum(1, 99)),
        Gen.oneOf(3.0, 17.0, 64.0, 1000.0)) { (rows, pcts, width) =>
      import spark.implicits._
      val df = rows.map { case (g, x) => (g, x.toDouble) }.toDF("g", "x")
      val qs = pcts.distinct.map(_ / 100.0)
      val got = graft.analytics.Quantiles.groupedQuantiles(df, "g", "x", qs, width)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val byGroup = rows.groupBy(_._1)
      byGroup.forall { case (g, vs) =>
        val sorted = vs.map(_._2.toDouble).sorted
        qs.forall { q =>
          val k = math.ceil(q * vs.size).toInt
          got((g, q)) == sorted(k - 1)
        }
      } && got.size == byGroup.size * qs.size
    }

  property("streaming sessionization equals batch under chronological batch splits") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(1L, 200L))),
        Gen.chooseNum(1, 4)) { (raw, nChunks) =>
      import java.sql.Timestamp
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.stream.Sessionize
      import spark.implicits._
      // unique, strictly-increasing-capable timestamps: minute*100 + index
      // (equal-to-watermark rows would drop as late at chunk boundaries)
      val events = raw.take(12).zipWithIndex.map { case ((u, min), i) =>
        (u, (i + 1).toLong, min * 100L + i) }
      // chronological chunks: each later chunk is not older than any
      // earlier one (the delay<=gap contract); order WITHIN a chunk is
      // reversed to exercise the out-of-order interval merge
      val sorted = events.sortBy(_._3)
      val size = math.max(1, math.ceil(sorted.size.toDouble / nChunks).toInt)
      val chunks = sorted.grouped(size).toSeq
      val input = MemoryStream[(Long, Long, Timestamp)](spark)
      val name = s"sess_prop_${System.nanoTime()}"
      val q = Sessionize.streamingSessions(
          input.toDS().withColumnRenamed("_3", "ts")
            .withWatermark("ts", "0 seconds")
            .as[(Long, Long, Timestamp)])
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        def ts(m: Long) = new Timestamp(m * 60000L)
        chunks.foreach { c =>
          input.addData(c.reverse.map { case (u, id, m) => (u, id, ts(m)) }: _*)
          q.processAllAvailable()
        }
        input.addData((99L, 99L, ts(10000000L))); q.processAllAvailable()
        input.addData((99L, 98L, ts(10000001L))); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table(name).as[Sessionize.Sess].collect()
        .filter(_.user_id != 99L).toSet
      val batch = Sessionize.sessions(
          events.map { case (u, id, m) => Sessionize.Ev(u, id, m * 60L * 1000000L) }.toDS())
        .collect().toSet
      streamed == batch
    }

  property("label propagation equals a synchronous in-memory BFS vote") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L))),
        Gen.mapOf(Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(0, 2)))) {
      (rawEdges, seedMap) =>
        import spark.implicits._
        val edges = rawEdges.filter { case (a, b) => a != b }
        (edges.nonEmpty && seedMap.nonEmpty) ==> {
          val e = edges.toDF("src", "dst")
          val s = seedMap.toSeq.toDF("id", "label")
          val got = graft.graph.LabelProp.propagate(e, s, rounds = 3)
            .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
          // reference: synchronous frozen-seed majority vote in memory
          val undirected = (edges ++ edges.map(_.swap)).distinct
            .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
          var ref = seedMap.map { case (k, v) => k -> ((v, 0)) }
          for (r <- 1 to 3) {
            val fresh = undirected.keys.filterNot(ref.contains).flatMap { v =>
              val votes = undirected(v).flatMap(n => ref.get(n).map(_._1))
              if (votes.isEmpty) None
              else {
                val grouped = votes.groupBy(identity).view.mapValues(_.size)
                val win = grouped.toSeq.map { case (l, c) => (-c, l) }.min._2
                Some(v -> ((win, r)))
              }
            }.toMap
            ref = ref ++ fresh
          }
          got == ref
        }
    }

  property("typed sessionization equals the in-memory gap cut") =
    forAll(Gen.listOfN(30,
        Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 200L)))) { raw =>
      import spark.implicits._
      val gapUs = graft.stream.Sessionize.GapUs
      // minutes -> micros; duplicate (user, t) pairs allowed, distinct ids
      val evs = raw.zipWithIndex.map { case ((u, min), i) =>
        graft.stream.Sessionize.Ev(u, i.toLong, min * 60000000L)
      }
      val got = graft.stream.Sessionize.sessions(evs.toDS()).collect()
        .map(s => (s.user_id, s.session_id, s.n_events, s.start_us, s.end_us))
        .toSet
      val ref = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.t, e.event_id))
        val sessions = sorted.foldLeft(List.empty[List[Long]]) {
          case (cur :: rest, e) if e.t - cur.max <= gapUs =>
            (e.t :: cur) :: rest
          case (acc, e) => List(e.t) :: acc
        }.reverse
        sessions.zipWithIndex.map { case (ts, i) =>
          (u, (i + 1).toLong, ts.size.toLong, ts.min, ts.max)
        }
      }.toSet
      got == ref
    }

  property("ttlOrdinals equals the in-memory gap+ttl restart walk") =
    forAll(Gen.listOfN(30,
        Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 500L)))) { raw =>
      import spark.implicits._
      val gapUs = graft.stream.Sessionize.GapUs
      val ttlUs = 45L * 60L * 1000000L // restart boundary = 75 min
      val evs = raw.zipWithIndex.map { case ((u, min), i) =>
        graft.stream.Sessionize.Ev(u, i.toLong, min * 60000000L)
      }
      val got = graft.stream.Sessionize.ttlOrdinals(
          graft.stream.Sessionize.sessions(evs.toDS()).toDF(), ttlUs)
        .select("user_id", "session_id", "restarted", "start_us")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
        .toSet
      // reference: brute-force sessions, then the restart walk — a
      // session restarts the ordinal iff the gap since the user's
      // previous session's END exceeds gap+ttl
      val ref = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val sorted = es.map(_.t).sorted
        val sessions = sorted.foldLeft(List.empty[List[Long]]) {
          case (cur :: rest, t) if t - cur.max <= gapUs => (t :: cur) :: rest
          case (acc, t) => List(t) :: acc
        }.map(g => (g.min, g.max)).reverse
        var sid = 0L
        var prevEnd = Option.empty[Long]
        sessions.map { case (s, e) =>
          val restart = prevEnd.exists(pe => s - pe > gapUs + ttlUs)
          sid = if (restart) 1L else sid + 1L
          prevEnd = Some(e)
          (u, sid, restart, s)
        }
      }.toSet
      got == ref
    }

  property("MERGE INTO equals the set-theoretic outcome table") =
    forAll(Gen.mapOf(Gen.zip(Gen.chooseNum(1L, 20L), Gen.chooseNum(0, 99))),
        Gen.mapOf(Gen.zip(Gen.chooseNum(1L, 25L),
          Gen.zip(Gen.chooseNum(0, 99), Gen.oneOf("upsert", "delete"))))) {
      (baseM, chgM) =>
        import spark.implicits._
        (baseM.nonEmpty && chgM.nonEmpty) ==> {
          val b = baseM.toSeq.map { case (k, p) => (k, p.toDouble) }.toDF("k", "p")
          val c = chgM.toSeq.map { case (k, (p, a)) => (k, p.toDouble, a) }
            .toDF("k", "p", "action")
          val got = graft.operators.MergeInto.merge(b, c, "k", Seq("p"))
            .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2))))
            .toMap
          val ref = (baseM.keySet ++ chgM.keySet).flatMap { k =>
            (baseM.get(k), chgM.get(k)) match {
              case (Some(_), Some((_, "delete")))  => None
              case (Some(_), Some((p, "upsert")))  => Some(k -> ((p.toDouble, "updated")))
              case (None, Some((p, "upsert")))     => Some(k -> ((p.toDouble, "inserted")))
              case (None, Some((_, "delete")))     => None
              case (Some(p), None)                 => Some(k -> ((p.toDouble, "kept")))
              case _                               => None
            }
          }.toMap
          got == ref
        }
    }

  property("anchor-hop dedup equals the per-key in-memory fold") =
    forAll(Gen.listOf(Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 50L)))) {
      evs =>
        import spark.implicits._
        val horizon = 7L
        // unique (t, id) per row: id is the list index
        val rows = evs.zipWithIndex.map { case ((u, t), i) =>
          graft.stream.DedupWithin.KEv(u, "a", i.toLong, t)
        }
        val got = graft.stream.DedupWithin
          .dedupWithin(rows.toDS(), horizon)
          .collect().map(_.event_id).toSet
        val ref = rows.groupBy(e => (e.user_id, e.event_type)).values.flatMap {
          ks =>
            var last = Long.MinValue / 2
            ks.sortBy(e => (e.t, e.event_id)).filter { e =>
              if (e.t - last > horizon) { last = e.t; true } else false
            }
        }.map(_.event_id).toSet
        got == ref
    }

  property("Count-Min estimates never fall below exact counts") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 30L))) { keys =>
      import spark.implicits._
      keys.isEmpty || {
        val counts = keys.groupBy(identity).view
          .mapValues(_.size.toLong).toSeq.toDF("key", "n")
        val cells = graft.analytics.CountMin.sketch(counts).collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        keys.distinct.forall { k =>
          val exact = keys.count(_ == k).toLong
          val est = graft.analytics.CountMin.Hashes.map { case (i, a, b) =>
            cells((i, ((a * k + b) % graft.analytics.CountMin.P)
              % graft.analytics.CountMin.W))
          }.min
          est >= exact
        }
      }
    }

  property("planCompaction bins equal floor(bytes-before / target)") =
    forAll(Gen.listOf(Gen.chooseNum(1L, 300L))) { sizes =>
      import spark.implicits._
      sizes.isEmpty || {
        val target = 100L
        val files = sizes.zipWithIndex
          .map { case (b, i) => (f"f$i%04d", b) }
        val got = graft.operators.Layout
          .planCompaction(files.toDF("file", "bytes"), target)
          .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
        val before = files.sortBy(_._1)
          .scanLeft(("", 0L)) { case ((_, acc), (f, b)) => (f, acc + b) }
        // scanLeft pairs each file with the PRIOR cumulative total
        val ref = files.sortBy(_._1).zip(before.dropRight(1).map(_._2))
          .map { case ((f, _), bef) => f -> bef / target }.toMap
        got == ref
      }
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
