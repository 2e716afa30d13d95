package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Content-level VIDEO frame sampling — keyframe (scene-cut) selection
  * over real multi-frame `binary` payloads, the video leg of the
  * perceptual suite ([[PerceptualHash]] images, [[AudioFingerprint]]
  * audio; [[Mp4Meta]] walks container boxes, never pixels). This is
  * the standard training-data video op: a 100 TB corpus can't afford
  * to keep every frame, so the pipeline samples one frame per SCENE —
  * detected as a jump in consecutive frames' perceptual hashes
  * (shot-boundary detection by frame-difference thresholding; the
  * perceptual-hash variant of Zhang et al., "Automatic partitioning of
  * full-motion video", Multimedia Systems 1993).
  *
  * Per frame: 16×16 grayscale → 4×4 block grid → 16-bit aHash (bit b:
  * block sum · 16 > frame total — equal block sizes clear both
  * denominators, the [[PerceptualHash]] integer mean test). Frame 0 is
  * always a keyframe; frame f > 0 is a keyframe iff
  * Hamming(hash(f), hash(f−1)) > 4 — within-scene jitter moves 0–2
  * bits, a scene cut ~8 of 16.
  *
  * Exactness discipline: pixels, block sums, hashes, Hamming distances
  * and the threshold are ALL integer, so the DuckDB oracle replays the
  * selected keyframes bit-for-bit from the same deterministic pixel
  * streams — the engine's multi-frame byte decode (magic, frame
  * count/dims parse, per-frame pixel walk) is oracle-verified
  * end-to-end.
  *
  * Corpus: one 16-frame 16×16 clip per `documents` row ("V8" magic +
  * big-endian u16 frame count/width/height + raw frames), generated
  * DISTRIBUTED. Scene structure: doc d cuts every 2 + (eff(d) mod 3)
  * frames (8/6/4 scenes per clip); frames within a scene share a base
  * pixel stream with ~5 of 256 pixels jittered per frame (motion), so
  * consecutive within-scene hashes differ by ~0–2 bits while cross-
  * scene frames are fresh draws (~8 bits). Doc ≡ 3 (mod 4) is a
  * planted near-duplicate of its ≡ 2 neighbor — identical except a
  * re-seeded final scene (see [[pixel]]) — the recall target of the
  * q210 set-similarity near-dup leg.
  *
  * 100 TB shape: ZERO SHUFFLE — every frame of a clip lives in one
  * payload row, so decode → per-frame hash → cut detection → keyframe
  * emission is a single `flatMap` per partition; no window exchange,
  * no join, no driver involvement. The only exchange in the plan is
  * the output presentation sort.
  */
object VideoKeyframes {

  val FrameW = 16              // frame side (pixels)
  val Grid = 4                 // hash grid side (blocks)
  val BlockPx = FrameW / Grid  // 4×4 pixels per block
  val NFrames = 16
  val FramePx = FrameW * FrameW
  val HeaderLen = 8            // 'V' '8' n_hi n_lo w_hi w_lo h_hi h_lo
  val CutThreshold = 4         // Hamming > 4 → scene cut

  /** The clip a doc's pixel streams derive from: doc_id ≡ 3 (mod 4) is
    * a planted NEAR-DUPLICATE of its ≡ 2 neighbor (same scene
    * structure, same streams, one re-seeded scene — see [[pixel]]);
    * every other residue is a fresh clip. Disjoint from the image and
    * audio legs' planted groups (≡ 1 of ≡ 0), so the media dedup plan
    * (q209) gets video-only clusters alongside the image+audio ones.
    */
  def effId(docId: Long): Long = if (docId % 4 == 3) docId - 1 else docId

  /** Scene length of doc `d`'s clip: 2 + (eff mod 3) frames. */
  def sceneLen(docId: Long): Int = (2 + effId(docId) % 3).toInt

  /** Scene index of frame `f` in doc `d`. */
  def scene(docId: Long, f: Int): Long = f / sceneLen(docId)

  /** Pixel `i` of frame `f` in clip `docId`: frames of a scene share
    * the scene's base stream; every 53rd pixel takes a per-frame
    * jitter seed (~5 of 256 pixels of motion per frame). Seed spaces
    * are disjoint from the image (131071·i over doc_id) and audio
    * (524287·t) legs via the 1000003/8191/127 mix.
    *
    * The seed reduces mod 2³¹−1 BEFORE the 131071 multiply (and the
    * oracle does the same): the mixer only ever reads the product mod
    * P, so the reduction changes no pixel — but without it the raw
    * product overflows Int64 once doc_id exceeds ~7e7, where Scala
    * wraps silently while DuckDB raises, a divergent failure mode
    * instead of a caught mismatch.
    *
    * Near-dup planting: a variant clip (doc ≡ 3 mod 4) shares its
    * base's scene structure and pixel streams EXACTLY except the LAST
    * scene, which re-seeds from its own doc_id — a fresh final shot
    * spliced onto an otherwise identical clip (re-edit with a new
    * outro, the standard video near-dup shape). All earlier scenes
    * being pixel-identical makes their keyframe hashes EXACT matches,
    * which is what the set-similarity pair rule (q210) keys on.
    */
  def pixel(docId: Long, f: Int, i: Int): Int = {
    val eff = effId(docId)
    val sc = scene(docId, f)
    val lastScene = (NFrames - 1) / sceneLen(docId)
    val seedDoc = if (docId % 4 == 3 && sc == lastScene) docId else eff
    val base = seedDoc * 1000003L + sc * 8191L
    val seed = if (i % 53 == 0) base + (f + 1) * 127L else base
    (PerceptualHash.mixLong((seed % PerceptualHash.P) * 131071L + i)
      & 255L).toInt
  }

  /** The raw "V8" clip payload: 2-byte magic, big-endian u16 frame
    * count, width, height, then `n` frames of w·h pixel bytes.
    */
  def encode(docId: Long): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + NFrames * FramePx)
    out(0) = 'V'; out(1) = '8'
    out(2) = (NFrames >> 8).toByte; out(3) = (NFrames & 0xFF).toByte
    out(4) = (FrameW >> 8).toByte; out(5) = (FrameW & 0xFF).toByte
    out(6) = (FrameW >> 8).toByte; out(7) = (FrameW & 0xFF).toByte
    var f = 0
    while (f < NFrames) {
      var i = 0
      while (i < FramePx) {
        out(HeaderLen + f * FramePx + i) = pixel(docId, f, i).toByte
        i += 1
      }
      f += 1
    }
    out
  }

  /** Parse a V8 payload into per-frame 16-bit aHashes — the REAL
    * multi-frame decode (magic check, count/dim parse, per-frame
    * pixel walk, integer mean test). Any payload this rejects is not
    * a V8 clip.
    */
  def frameHashes(content: Array[Byte]): Array[Int] = {
    require(content.length >= HeaderLen
      && content(0) == 'V' && content(1) == '8', "not a V8 payload")
    val n = ((content(2) & 0xFF) << 8) | (content(3) & 0xFF)
    val w = ((content(4) & 0xFF) << 8) | (content(5) & 0xFF)
    val h = ((content(6) & 0xFF) << 8) | (content(7) & 0xFF)
    require(content.length == HeaderLen + n * w * h, "truncated V8 payload")
    require(w % Grid == 0 && h % Grid == 0, s"dims not /$Grid: ${w}x$h")
    val (bw, bh) = (w / Grid, h / Grid)
    val out = new Array[Int](n)
    var f = 0
    while (f < n) {
      val bs = new Array[Long](Grid * Grid)
      var total = 0L
      var y = 0
      while (y < h) {
        val rowBlock = (y / bh) * Grid
        var x = 0
        while (x < w) {
          val p = (content(HeaderLen + f * w * h + y * w + x) & 0xFF).toLong
          bs(rowBlock + x / bw) += p
          total += p
          x += 1
        }
        y += 1
      }
      var hash = 0
      var b = 0
      while (b < Grid * Grid) {
        if (bs(b) * (Grid * Grid).toLong > total) hash |= 1 << b
        b += 1
      }
      out(f) = hash
      f += 1
    }
    out
  }

  case class VideoPayload(media_id: Long, content: Array[Byte])
  case class Keyframe(media_id: Long, frame_idx: Int, frame_hash: Int,
                      ham_prev: Option[Int])

  /** The synthetic clip corpus: one V8 payload per documents row,
    * generated per-partition on the executors.
    */
  def videoCorpus(spark: SparkSession, docs: DataFrame): Dataset[VideoPayload] = {
    import spark.implicits._
    // spread the byte-thin id scan before the CPU-dense decode stage
    // (the [[PerceptualHash.imageCorpus]] rationale)
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id => VideoPayload(id, encode(id))))
  }

  /** Decode + keyframe stage: one flatMap per partition — all frames
    * of a clip are in its payload row, so cut detection needs no lag
    * window and no shuffle. Emits frame 0 (ham_prev = None) plus every
    * frame whose hash moved > [[CutThreshold]] bits from its
    * predecessor.
    */
  def keyframes(spark: SparkSession,
      clips: Dataset[VideoPayload]): Dataset[Keyframe] = {
    import spark.implicits._
    clips.flatMap { c =>
      val hs = frameHashes(c.content)
      hs.indices.flatMap { f =>
        if (f == 0) Some(Keyframe(c.media_id, 0, hs(0), None))
        else {
          val ham = java.lang.Integer.bitCount(hs(f) ^ hs(f - 1))
          if (ham > CutThreshold) Some(Keyframe(c.media_id, f, hs(f), Some(ham)))
          else None
        }
      }
    }
  }

  /** q205: sampled keyframes (scene starts) per clip over the
    * documents-derived video corpus.
    */
  private val kfMemo = graft.tools.CorpusMemo.ofDf

  /** The per-clip keyframe table, memoized per (session, dir) — the
    * [[PerceptualHash.hashTable]] discipline for the video modality:
    * decode, hash and scene-cut once at ingest; q205 (the sample
    * readout), q210 (near-dup pairs) and q209's video leg read the
    * stored table. Pinned state is a few (frame_idx, hash) rows per
    * clip, not the frames.
    */
  def keyframeTable(s: SparkSession, dir: String): DataFrame =
    kfMemo.get(s, dir) {
      keyframes(s, videoCorpus(s, Tables.documents(s, dir)))
        .toDF().localCheckpoint()
    }

  def keyframesQuery(s: SparkSession, dir: String): DataFrame =
    keyframeTable(s, dir)
      .select(col("media_id").as("doc_id"), col("frame_idx"),
        col("frame_hash"), col("ham_prev"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Video NEAR-DUPLICATE pairs by keyframe-set similarity — the q25
    * set-similarity shape over [[keyframes]] output: a clip is its SET
    * of distinct keyframe hashes (the scene signature), and two clips
    * sharing most of it are near-duplicates (re-edits, re-encodes,
    * spliced outros). The pair test is the exact integer
    * `3·shared ≥ |A| + |B|` (⟺ Jaccard ≥ 1/2); ALL-INTEGER output
    * (id_a, id_b, n_shared, n_a, n_b).
    *
    * Candidate generation is an inverted index on sorted keyframe-hash
    * PAIRS, not single hashes: J ≥ 1/2 with both sets ≥ 2 implies
    * shared ≥ ⌈(|A|+|B|)/3⌉ ≥ 2, so the pair agrees on ≥ 1 sorted
    * 2-combination — and the 32-bit pair key space keeps buckets
    * collision-sized where single 16-bit hashes degenerate (measured:
    * single-hash blocking at the 500k-clip 100× leg put ~46 clips per
    * bucket per value → ~7e7 candidates, 35 s; pair keys → 4.3 s).
    * Sets of size ≤ 2 can satisfy J ≥ 1/2 with shared = 1 (only
    * against other sets ≤ 2 — 3·1 ≥ n_a+n_b bounds both), so a
    * second, small-side-only single-hash leg covers them:
    * completeness is exact, never probabilistic. The per-clip
    * 2-combination fan-out is C(|set|,2) ≤ C(16,2) = 120 rows — and
    * the exact intersection is computed on the candidate pairs from
    * the two (≤ 16-element) hash arrays directly, so the corpus is
    * never paired n². The brute-force all-pairs scan exists only in
    * the DuckDB oracle.
    */
  def videoNearDupPairs(keyframes: DataFrame): DataFrame = {
    val sets = keyframes
      .select(col("media_id"), col("frame_hash")).distinct()
      .groupBy(col("media_id"))
      .agg(array_sort(collect_set(col("frame_hash"))).as("hs"))
    // all sorted 2-combinations, packed into one 32-bit key
    val pairKeys = flatten(transform(col("hs"), (x, i) =>
      transform(slice(col("hs"), i + lit(2),
          greatest(size(col("hs")) - i - 1, lit(0))),
        y => x.cast("long") * 65536L + y.cast("long"))))
    val keyed = sets.select(col("media_id"), explode(pairKeys).as("pk"))
    val cand2 = keyed.select(col("media_id").as("id_a"), col("pk"))
      .join(keyed.select(col("media_id").as("id_b"), col("pk")), Seq("pk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // the ≤2-keyframe remainder: a J >= 1/2 pair with shared = 1 needs
    // n_a + n_b <= 3, so BOTH sides are small — tiny index, tiny join
    val small = sets.filter(size(col("hs")) <= 2)
      .select(col("media_id"), explode(col("hs")).as("h"))
    val cand1 = small.select(col("media_id").as("id_a"), col("h"))
      .join(small.select(col("media_id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val cand = cand2.unionByName(cand1).distinct()
    // exact intersection on the candidate pairs from the two hash
    // arrays (<= 16 elements each); sets is corpus-sized (one row per
    // clip) — shuffled equi-joins, never a broadcast
    cand
      .join(sets.select(col("media_id").as("id_a"), col("hs").as("hs_a")),
        Seq("id_a"))
      .join(sets.select(col("media_id").as("id_b"), col("hs").as("hs_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long")
          .as("n_shared"),
        size(col("hs_a")).cast("long").as("n_a"),
        size(col("hs_b")).cast("long").as("n_b"))
      .filter(lit(3) * col("n_shared") >= col("n_a") + col("n_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("n_a"), col("n_b"))
  }

  /** q210: video near-dup pairs (keyframe-set Jaccard ≥ 1/2) over the
    * documents-derived clip corpus — the third modality of the media
    * dedup plan (q209).
    */
  def videoNearDupQuery(s: SparkSession, dir: String): DataFrame =
    videoNearDupPairs(keyframeTable(s, dir))
      .orderBy(col("id_a"), col("id_b"))
}
