package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IVM contracts: maintained state equals a from-scratch rebuild of
  * the post-delta world, zero-count groups vanish, and an update
  * modeled as a −/+ pair adjusts the sum without touching the count.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  test("maintained view equals the from-scratch rebuild (testdata)") {
    val dir = "/root/testdata/sf0.001"
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"), col("o_orderkey").as("okey"),
        col("o_totalprice").as("value"))
    val maintained = Ivm.ivmQuery(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // post-delta world: base minus the %7 deletions, plus the %10 rows
    val world = o.filter(col("okey") % 10 =!= 0 && col("okey") % 7 =!= 0)
      .unionByName(o.filter(col("okey") % 10 === 0))
    val rebuilt = world.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(maintained.keySet === rebuilt.keySet)
    // counts are exact; totals compare with a cent tolerance because the
    // maintained total sums PARTIALS while the rebuild sums raw rows —
    // different fp association, same value up to ulps
    maintained.foreach { case (k, (n, total, avg)) =>
      val (rn, rtotal) = rebuilt(k)
      assert(n === rn, s"count diverged for key $k")
      assert(math.abs(total - rtotal) <= 0.011, s"total diverged for key $k")
      assert(math.abs(avg - total / n) <= 0.011, s"avg inconsistent for key $k")
    }
  }

  test("a delete to zero eliminates the group; an update pair keeps the count") {
    val view = Seq((1L, 1L, 10.0), (2L, 2L, 30.0)).toDF("key", "n", "total")
    val delta = Seq(
      (1L, -1L, 10.0),          // key 1: deleted to zero
      (2L, -1L, 20.0), (2L, 1L, 25.0)) // key 2: update 20 -> 25
      .toDF("key", "sign", "value")
    val out = Ivm.maintain(view, delta).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("key") === 2L)
    assert(out.head.getAs[Long]("n") === 2L)
    assert(math.abs(out.head.getAs[Double]("total") - 35.0) < 1e-9)
  }

  test("an inconsistent delta (delete of a never-contained row) raises, not masks") {
    // a delete for a key the view doesn't hold would drive the maintained
    // count negative — folding that into zero-elimination would silently
    // mask the corrupt delta, so maintain must raise (distributed-side)
    val view = Seq((1L, 1L, 10.0)).toDF("key", "n", "total")
    val delta = Seq((2L, -1L, 3.0)).toDF("key", "sign", "value")
    val e = intercept[Exception] { Ivm.maintain(view, delta).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("went negative")), messages(e).mkString(" | "))
    // while a CONSISTENT delete straight to zero still just eliminates
    val ok = Ivm.maintain(view, Seq((1L, -1L, 10.0)).toDF("key", "sign", "value"))
      .collect()
    assert(ok.isEmpty)
  }

  test("multi-batch chain: maintained ≡ rebuilt after every commit, " +
    "through crash debris") {
    // the engine's two lifecycle abstractions composed: Z-set maintenance
    // riding the versioned-snapshot commit protocol. Four delta batches
    // (inserts, delete+insert, an update pair, a delete-to-zero), with a
    // torn uncommitted version injected AHEAD of the manifest before
    // batch 2 — the retry must reuse its number and stay correct.
    val dir = java.nio.file.Files.createTempDirectory("ivm-chain").toString
    val batches = Seq(
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (1L, 1L, 5.0)),
      Seq((1L, -1L, 10.0), (3L, 1L, 7.0)),
      Seq((2L, -1L, 20.0), (2L, 1L, 22.0)),
      Seq((3L, -1L, 7.0)))
    var world = Vector.empty[(Long, Double)]
    val paths = batches.zipWithIndex.map { case (b, i) =>
      if (i == 2) {
        // crash debris: a fully-written (parquet + _SUCCESS) version the
        // manifest never pointed at — invisible as a base by protocol
        Seq((99L, 99L, 9999.0)).toDF("key", "n", "total")
          .write.parquet(s"$dir/v000002")
      }
      val path = Ivm.maintainChain(spark, dir, b.toDF("key", "sign", "value"))
      b.foreach { case (k, s, v) =>
        if (s > 0) world :+= ((k, v))
        else {
          val idx = world.indexOf((k, v))
          assert(idx >= 0, "test bookkeeping: delete of absent row")
          world = world.patch(idx, Nil, 1)
        }
      }
      val maintained = spark.read.parquet(path).collect()
        .map(r => r.getAs[Long]("key") ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
      val rebuilt = world.groupBy(_._1).map { case (k, vs) =>
        k -> (vs.size.toLong, vs.map(_._2).sum)
      }
      assert(maintained.keySet == rebuilt.keySet, s"after batch $i")
      rebuilt.foreach { case (k, (n, total)) =>
        assert(maintained(k)._1 == n, s"count for key $k after batch $i")
        assert(math.abs(maintained(k)._2 - total) < 1e-9,
          s"total for key $k after batch $i")
      }
      path
    }
    // the debris version number was reused by batch 2's commit
    assert(paths(2).endsWith("v000002"))
    val debris = spark.read.parquet(paths(2)).collect()
    assert(!debris.exists(_.getAs[Long]("key") == 99L),
      "debris payload leaked into the committed chain")
    // vacuum keeps the manifest-pointed tail readable
    graft.stream.Ingest.vacuumSnapshots(spark, dir, keep = 1)
    val after = spark.read.parquet(paths.last).collect()
      .map(r => r.getAs[Long]("key")).toSet
    assert(after == Set(1L, 2L), "post-vacuum view must remain readable")
  }

  test("epoch fence: a crash-replayed delta batch is a no-op, not a " +
    "double count") {
    import graft.stream.Ingest
    val dir = java.nio.file.Files.createTempDirectory("ivm-fence").toString
    val d1 = Seq((1L, 1L, 10.0)).toDF("key", "sign", "value")
    val d2 = Seq((1L, 1L, 5.0)).toDF("key", "sign", "value")
    def apply(delta: org.apache.spark.sql.DataFrame, epoch: Long): String =
      Ingest.advanceSnapshotFenced(spark, dir, epoch,
        delta.limit(0).select(col("key"), lit(0L).as("n"),
          lit(0.0).as("total"))) { base => Ivm.maintain(base, delta) }
    val p0 = apply(d1, epoch = 0L)
    val p1 = apply(d2, epoch = 1L)
    // the at-least-once crash case: epoch 1 re-delivered after commit
    val p1again = apply(d2, epoch = 1L)
    assert(p1again == p1, "fenced replay must return the committed path")
    val st = spark.read.parquet(p1again).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("total"))).toSet
    assert(st == Set((1L, 2L, 15.0)),
      s"replay double-counted: $st (p0=$p0)")
    // a stale epoch (0) after epoch 1 is also fenced
    assert(apply(d1, epoch = 0L) == p1)
    assert(Ingest.latestEpoch(spark, dir).contains(1L))
  }

  test("maintainMin: inserts and min-preserving deletes stay " +
    "incremental; a retracted minimum rebuilds from base and converges") {
    // world: key 1 -> {1.0, 1.0, 5.0}; key 2 -> {3.0, 7.0}
    val view = Seq((1L, 3L, 1.0), (2L, 2L, 3.0)).toDF("key", "n", "vmin")
    // insert-only + delete-above-min delta: base values are POISONED
    // (all -999) to prove the incremental path never consults base
    val d1 = Seq((1L, 1L, 0.5), (2L, -1L, 7.0), (3L, 1L, 9.0))
      .toDF("key", "sign", "value")
    val poisoned = Seq((1L, -999.0), (2L, -999.0), (3L, -999.0))
      .toDF("key", "value")
    val s1 = Ivm.maintainMin(view, d1, poisoned).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("vmin"))).toSet
    assert(s1 == Set((1L, 4L, 0.5), (2L, 1L, 3.0), (3L, 1L, 9.0)),
      s"incremental leg consulted base or mis-merged: $s1")
    // retract key 1's minimum (0.5): ONLY that group rebuilds from the
    // post-delta base; key 2 (untouched) must ignore base's poison
    val world1 = Seq((1L, 1.0), (1L, 1.0), (1L, 5.0), (1L, 0.5),
      (2L, 3.0), (3L, 9.0))
    val view1 = Seq((1L, 4L, 0.5), (2L, 1L, 3.0), (3L, 1L, 9.0))
      .toDF("key", "n", "vmin")
    val d2 = Seq((1L, -1L, 0.5)).toDF("key", "sign", "value")
    val base2 = world1.filterNot(_ == (1L, 0.5)).toDF("key", "value")
      // poison the non-dirty groups to prove rebuild is group-scoped
      .withColumn("value",
        when(col("key") =!= 1L, lit(-999.0)).otherwise(col("value")))
    val s2 = Ivm.maintainMin(view1, d2, base2).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("vmin"))).toSet
    assert(s2 == Set((1L, 3L, 1.0), (2L, 1L, 3.0), (3L, 1L, 9.0)),
      s"retraction rebuild wrong or over-scoped: $s2")
    // a group fully deleted is eliminated without any rebuild
    val d3 = Seq((3L, -1L, 9.0)).toDF("key", "sign", "value")
    val s3 = Ivm.maintainMin(view1, d3,
        Seq.empty[(Long, Double)].toDF("key", "value")).collect()
      .map(r => r.getAs[Long]("key")).toSet
    assert(s3 == Set(1L, 2L), s"zero-count group survived: $s3")
  }

  test("maintainMax: inserts and max-preserving deletes stay " +
    "incremental; a retracted maximum rebuilds group-scoped from base") {
    // world: key 1 -> {1.0, 5.0, 5.0}; key 2 -> {3.0, 7.0}
    val view = Seq((1L, 3L, 5.0), (2L, 2L, 7.0)).toDF("key", "n", "vmax")
    // insert-only + delete-below-max delta: base values are POISONED
    // (all 999) to prove the incremental path never consults base
    val d1 = Seq((1L, 1L, 9.0), (2L, -1L, 3.0), (3L, 1L, 0.5))
      .toDF("key", "sign", "value")
    val poisoned = Seq((1L, 999.0), (2L, 999.0), (3L, 999.0))
      .toDF("key", "value")
    val s1 = Ivm.maintainMax(view, d1, poisoned).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("vmax"))).toSet
    assert(s1 == Set((1L, 4L, 9.0), (2L, 1L, 7.0), (3L, 1L, 0.5)),
      s"incremental leg consulted base or mis-merged: $s1")
    // retract key 1's maximum (9.0): ONLY that group rebuilds from the
    // post-delta base; keys 2/3 (untouched) must ignore base's poison
    val view1 = Seq((1L, 4L, 9.0), (2L, 1L, 7.0), (3L, 1L, 0.5))
      .toDF("key", "n", "vmax")
    val d2 = Seq((1L, -1L, 9.0)).toDF("key", "sign", "value")
    val base2 = Seq((1L, 1.0), (1L, 5.0), (1L, 5.0),
      (2L, 7.0), (3L, 0.5)).toDF("key", "value")
      .withColumn("value",
        when(col("key") =!= 1L, lit(999.0)).otherwise(col("value")))
    val s2 = Ivm.maintainMax(view1, d2, base2).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("vmax"))).toSet
    assert(s2 == Set((1L, 3L, 5.0), (2L, 1L, 7.0), (3L, 1L, 0.5)),
      s"retraction rebuild wrong or over-scoped: $s2")
    // a group fully deleted is eliminated without any rebuild
    val d3 = Seq((3L, -1L, 0.5)).toDF("key", "sign", "value")
    val s3 = Ivm.maintainMax(view1, d3,
        Seq.empty[(Long, Double)].toDF("key", "value")).collect()
      .map(r => r.getAs[Long]("key")).toSet
    assert(s3 == Set(1L, 2L), s"zero-count group survived: $s3")
  }

  test("maintainMax contract: a delete above the maintained maximum, or " +
    "against an absent group, raises instead of folding into a rebuild") {
    val view = Seq((1L, 2L, 3.0)).toDF("key", "n", "vmax")
    val base = Seq((1L, 3.0)).toDF("key", "value")
    val above = Seq((1L, -1L, 9.0)).toDF("key", "sign", "value")
    val eAbove = intercept[Exception] {
      Ivm.maintainMax(view, above, base).collect()
    }
    assert(eAbove.getMessage.contains("above the maintained maximum"),
      s"wrong error: ${eAbove.getMessage}")
    val absent = Seq((9L, -1L, 1.0)).toDF("key", "sign", "value")
    val eAbsent = intercept[Exception] {
      Ivm.maintainMax(view, absent, base).collect()
    }
    assert(eAbsent.getMessage.contains("never contained"),
      s"wrong error: ${eAbsent.getMessage}")
  }

  test("maintainMin contract: a delete below the maintained minimum, or " +
    "against an absent group, raises instead of folding into a rebuild") {
    val view = Seq((1L, 2L, 3.0)).toDF("key", "n", "vmin")
    val base = Seq((1L, 3.0)).toDF("key", "value")
    val below = Seq((1L, -1L, 1.0)).toDF("key", "sign", "value")
    val eBelow = intercept[Exception] {
      Ivm.maintainMin(view, below, base).collect()
    }
    assert(eBelow.getMessage.contains("below the maintained minimum"),
      s"wrong error: ${eBelow.getMessage}")
    val absent = Seq((9L, -1L, 1.0)).toDF("key", "sign", "value")
    val eAbsent = intercept[Exception] {
      Ivm.maintainMin(view, absent, base).collect()
    }
    assert(eAbsent.getMessage.contains("never contained"),
      s"wrong error: ${eAbsent.getMessage}")
  }

  test("epoch fence fresh-table crash window: a torn first write " +
    "(_SUCCESS, no manifest) must not become the replay base") {
    import graft.stream.Ingest
    val dir = java.nio.file.Files.createTempDirectory("ivm-fresh").toString
    val d1 = Seq((1L, 1L, 10.0)).toDF("key", "sign", "value")
    def empty = d1.limit(0).select(col("key"), lit(0L).as("n"),
      lit(0.0).as("total"))
    // simulate the crash: batch 0's parquet (incl. _SUCCESS) landed at
    // v000000, the writer died BEFORE the first manifest PUT
    Ivm.maintain(empty, d1).write.parquet(s"$dir/v000000")
    assert(new java.io.File(s"$dir/v000000/_SUCCESS").exists())
    assert(!new java.io.File(s"$dir/_latest").exists())
    // the at-least-once replay of epoch 0: with no recorded epoch the
    // fence can't trip — the writer must treat the table as FRESH and
    // overwrite the torn v000000, not merge the delta on top of it
    val p0 = Ingest.advanceSnapshotFenced(spark, dir, epoch = 0L, empty) {
      base => Ivm.maintain(base, d1)
    }
    val st = spark.read.parquet(p0).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("total"))).toSet
    assert(st == Set((1L, 1L, 10.0)),
      s"torn first write was resurrected as the base (double count): $st")
    assert(Ingest.latestEpoch(spark, dir).contains(0L))
    // and the next epoch applies exactly once on top of the repaired base
    val p1 = Ingest.advanceSnapshotFenced(spark, dir, epoch = 1L, empty) {
      base => Ivm.maintain(base, Seq((1L, 1L, 5.0)).toDF("key", "sign", "value"))
    }
    val st1 = spark.read.parquet(p1).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Double]("total"))).toSet
    assert(st1 == Set((1L, 2L, 15.0)), s"epoch-1 state wrong: $st1")
  }

  test("streaming IVM: JSON delta files drain exactly-once into the " +
    "fenced chain; a second drain picks up only new files") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("ivm-stream").toString
    val in = s"$root/in"; val table = s"$root/view"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("sign", LongType), StructField("value", DoubleType)))
    def drop(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(in, name), lines.mkString("\n"))
    def drain(): String = {
      val deltas = spark.readStream.schema(schema).json(in)
      Ivm.maintainStream(deltas, table, ckpt)
        .getOrElse(sys.error("no committed snapshot"))
    }
    drop("b1.json", """{"key":1,"sign":1,"value":10.0}""",
      """{"key":2,"sign":1,"value":20.0}""")
    val v1 = drain()
    val s1 = spark.read.parquet(v1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(s1 == Set((1L, 1L, 10.0), (2L, 1L, 20.0)))
    // second drain, SAME checkpoint: only the new file applies
    drop("b2.json", """{"key":1,"sign":-1,"value":10.0}""",
      """{"key":2,"sign":1,"value":2.5}""")
    val v2 = drain()
    val s2 = spark.read.parquet(v2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(s2 == Set((2L, 2L, 22.5)), s"got $s2")
    // idempotent tail: a drain with nothing new commits nothing
    val v3 = drain()
    assert(spark.read.parquet(v3).collect().length == 1)
  }
}
