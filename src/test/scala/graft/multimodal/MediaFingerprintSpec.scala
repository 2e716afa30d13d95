package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio-fingerprint (q204) and video-keyframe (q205) contracts: the
  * byte round-trips are exact (big-endian s16 reconstruction, the
  * multi-frame pixel walk), corrupt payloads are rejected, the planted
  * structure separates (near-dup clips within a few bits, fresh clips
  * far; within-scene frames under the cut threshold, cross-scene
  * over), band completeness holds vs an in-test brute force, and the
  * planted recall floors hold with zero un-planted findings.
  */
class MediaFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- q204 audio ----

  test("A6 round-trip: frame energies from the payload equal energies " +
    "from the sample formula") {
    val e = AudioFingerprint.frameEnergies(AudioFingerprint.encode(42L))
    assert(e.length === AudioFingerprint.Frames)
    val direct = new Array[Long](AudioFingerprint.Frames)
    var t = 0
    while (t < AudioFingerprint.Samples) {
      direct(t / AudioFingerprint.FrameLen) +=
        math.abs(AudioFingerprint.sample(42L, t)).toLong
      t += 1
    }
    assert(e.toSeq === direct.toSeq)
    assert(e.sum > 0L)
  }

  test("corrupt A6 payloads are rejected, not mis-parsed") {
    val good = AudioFingerprint.encode(7L)
    intercept[IllegalArgumentException] {
      AudioFingerprint.frameEnergies(good.drop(1)) // magic gone
    }
    intercept[IllegalArgumentException] {
      AudioFingerprint.frameEnergies(good.dropRight(2)) // one sample short
    }
  }

  test("planted near-dup clips (doc 4k vs 4k+1) stay within a few " +
    "fingerprint bits; fresh clips differ by many") {
    def fp(id: Long) =
      AudioFingerprint.fingerprint(
        AudioFingerprint.frameEnergies(AudioFingerprint.encode(id)))
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(ham(fp(8L), fp(9L)) <= 5, s"planted pair too far")
    assert(ham(fp(8L), fp(10L)) >= 15, s"fresh pair too close")
  }

  test("q204 on testdata: banding matches brute force, every pair is " +
    "planted, recall above the floor") {
    val fps = AudioFingerprint.fingerprintClips(spark,
      AudioFingerprint.audioCorpus(spark, graft.Tables.documents(spark, dir)))
      .toDF()
    val rows = fps.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, hiA, loA) <- rows; (ib, hiB, loB) <- rows if ia < ib
      h = java.lang.Long.bitCount(hiA ^ hiB) + java.lang.Long.bitCount(loA ^ loB)
      if h <= 3
    } yield (ia, ib, h)).toSet
    val banded = PerceptualHash.nearDupPairs(fps, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute)

    val pairs = AudioFingerprint.audioNearDupQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a % 4 === 0L && b === a + 1, s"un-planted pair ($a, $b)")
    }
    val nGroups = graft.Tables.documents(spark, dir)
      .select(max(col("doc_id"))).collect()(0).getLong(0) / 4 + 1
    val recall = pairs.length.toDouble / nGroups
    assert(recall >= 0.9, s"audio recall $recall (${pairs.length}/$nGroups)")
  }

  // ---- q205 video ----

  test("V8 round-trip: frame hashes from the payload equal hashes " +
    "from the pixel formula") {
    val hs = VideoKeyframes.frameHashes(VideoKeyframes.encode(42L))
    assert(hs.length === VideoKeyframes.NFrames)
    (0 until VideoKeyframes.NFrames).foreach { f =>
      val bs = new Array[Long](16)
      var total = 0L
      var i = 0
      while (i < VideoKeyframes.FramePx) {
        val p = VideoKeyframes.pixel(42L, f, i).toLong
        bs(((i / 16) / 4) * 4 + (i % 16) / 4) += p
        total += p
        i += 1
      }
      var h = 0
      (0 until 16).foreach(b => if (bs(b) * 16L > total) h |= 1 << b)
      assert(hs(f) === h, s"frame $f")
    }
  }

  test("corrupt V8 payloads are rejected, not mis-parsed") {
    val good = VideoKeyframes.encode(7L)
    intercept[IllegalArgumentException] {
      VideoKeyframes.frameHashes(good.drop(1)) // magic gone
    }
    intercept[IllegalArgumentException] {
      VideoKeyframes.frameHashes(good.dropRight(1)) // truncated frame
    }
  }

  test("within-scene consecutive frames sit under the cut threshold; " +
    "cross-scene frames sit over it") {
    // doc 0: scene length 2 — frames (0,1) share a scene, (1,2) cut
    val hs = VideoKeyframes.frameHashes(VideoKeyframes.encode(0L))
    def ham(a: Int, b: Int) = java.lang.Integer.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) <= VideoKeyframes.CutThreshold,
      s"within-scene ham ${ham(hs(0), hs(1))}")
    assert(ham(hs(1), hs(2)) > VideoKeyframes.CutThreshold,
      s"cross-scene ham ${ham(hs(1), hs(2))}")
  }

  test("q205 on testdata: planted scene-start recall above the floor, " +
    "false cuts rare, frame 0 always emitted") {
    val kf = VideoKeyframes.keyframesQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val nDocs = graft.Tables.documents(spark, dir).count()
    val found = kf.toSet
    // frame 0 is a keyframe of every clip
    assert((0L until nDocs).forall(d => found((d, 0))), "missing frame 0")
    val planted = (for {
      d <- 0L until nDocs
      len = VideoKeyframes.sceneLen(d)
      f <- 0 until VideoKeyframes.NFrames by len
    } yield (d, f)).toSet
    val hits = (found & planted).size
    val falseCuts = (found -- planted).size
    val recall = hits.toDouble / planted.size
    assert(recall >= 0.93, s"scene recall $recall ($hits/${planted.size})")
    assert(falseCuts <= found.size / 100,
      s"$falseCuts false cuts of ${found.size} keyframes")
  }

  // ---- q210 video near-dup ----

  test("planted variant clips (doc 4k+2 vs 4k+3) share all pre-splice " +
    "scene streams exactly; fresh clips share none") {
    // variant = base except the re-seeded last scene
    val base = VideoKeyframes.frameHashes(VideoKeyframes.encode(6L))
    val variant = VideoKeyframes.frameHashes(VideoKeyframes.encode(7L))
    val len = VideoKeyframes.sceneLen(7L)
    val lastStart = ((VideoKeyframes.NFrames - 1) / len) * len
    (0 until lastStart).foreach { f =>
      assert(base(f) === variant(f), s"pre-splice frame $f diverged")
    }
    // residues 0/1/2 are mutually fresh streams
    val other = VideoKeyframes.frameHashes(VideoKeyframes.encode(8L))
    assert(base.toSet.intersect(other.toSet).size <= 2,
      "fresh clips share too many frame hashes")
  }

  test("q210 small-set leg: J >= 1/2 pairs among <= 2-keyframe clips " +
    "(shared = 1 is legal there) survive the pair-key blocking rework") {
    import spark.implicits._
    // clip 1: {7}, clip 2: {7, 9}  -> shared 1, 3*1 >= 1+2  (J = 1/2)
    // clip 3: {7, 9, 11}           -> vs 2: shared 2, 3*2 >= 2+3
    //                              -> vs 1: shared 1, 3*1 <  1+3 (out)
    // clip 4: {21}                 -> shares nothing
    val kf = Seq((1L, 7), (2L, 7), (2L, 9), (3L, 7), (3L, 9), (3L, 11),
      (4L, 21)).toDF("media_id", "frame_hash")
    val got = VideoKeyframes.videoNearDupPairs(kf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 2L)),
      s"small-set completeness broke: $got")
  }

  test("q210 on testdata: inverted-index pairs match the brute-force " +
    "set scan, every pair is planted, recall above the floor") {
    val kf = VideoKeyframes.keyframes(spark,
      VideoKeyframes.videoCorpus(spark, graft.Tables.documents(spark, dir)))
      .toDF()
    // in-test brute force over the keyframe hash sets
    val sets = kf.select(col("media_id"), col("frame_hash")).distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (d, hs) => (d, hs.map(_._2).toSet) }
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      shared = (sa & sb).size
      if 3 * shared >= sa.size + sb.size
    } yield (a, b, shared.toLong, sa.size.toLong, sb.size.toLong)).toSet
    val engine = VideoKeyframes.videoNearDupPairs(kf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(engine === brute)

    val pairs = engine.map(p => (p._1, p._2))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a % 4 === 2L && b === a + 1, s"un-planted pair ($a, $b)")
    }
    val nDocs = graft.Tables.documents(spark, dir).count()
    val nGroups = (2L until nDocs by 4L).count(_ + 1 < nDocs)
    val recall = pairs.size.toDouble / nGroups
    assert(recall >= 0.9, s"video recall $recall (${pairs.size}/$nGroups)")
  }
}
