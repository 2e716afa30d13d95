package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Content-level AUDIO near-duplicate fingerprinting — the audio leg of
  * the perceptual-dedup suite ([[PerceptualHash]] is the image leg;
  * q36's metadata walk reads headers, never samples). The fingerprint
  * is the sign of the frame-energy delta — the core of the classic
  * Haitsma–Kalker audio fingerprint ("A Highly Robust Audio
  * Fingerprinting System", ISMIR 2002), simplified from a
  * time–frequency band grid to a time-only energy track: split the PCM
  * stream into fixed frames, bit t = energy(frame t+1) > energy(frame
  * t). Re-encodes and light retouches preserve almost every energy
  * ordering; unrelated clips agree on ~half the bits.
  *
  * Exactness discipline (the [[PerceptualHash]] contract): every step
  * is INTEGER arithmetic over sample words — frame energy is a sum of
  * |sample|, the bit test a BIGINT comparison, the packing two
  * non-negative 32-bit halves — so the DuckDB oracle replays the
  * fingerprint BIT-FOR-BIT from the same deterministic sample stream,
  * and any byte-offset mistake in the engine's PCM decode fails the
  * driver's hash gate.
  *
  * Corpus: one 1040-sample signed-16-bit mono clip per `documents` row
  * (65 frames × 16 samples → exactly 64 delta bits), generated
  * DISTRIBUTED as a real `binary` payload ("A6" magic + big-endian
  * u16 sample count + big-endian s16 samples). Planted near-dups:
  * doc_id ≡ 1 (mod 4) is its ≡ 0 neighbor with every 211th sample
  * replaced (5 of 1040 — a re-encode-style perturbation touching ~10
  * of the 64 delta bits' inputs, flipping ~1); ≡ 2/3 are fresh. The
  * sample stream is the q82 quadratic mixer both engines replay.
  *
  * 100 TB shape: fingerprinting is per-partition batch compute over
  * payload bytes (no shuffle, no driver); candidate pairing reuses the
  * image leg's 4 × 16-bit LSH banding ([[PerceptualHash.nearDupPairs]]
  * — pigeonhole-complete for Hamming ≤ 3), so the pair table is
  * collision-sized, never n². The brute-force pair scan exists ONLY in
  * the DuckDB oracle.
  */
object AudioFingerprint {

  val FrameLen = 16            // samples per energy frame
  val Frames   = 65            // → 64 delta bits
  val Samples  = FrameLen * Frames
  val HeaderLen = 4            // 'A' '6' n_hi n_lo

  /** Sample t of clip `docId` (signed 16-bit): ≡ 0 (mod 4) fresh,
    * ≡ 1 its ≡ 0 neighbor with every 211th sample replaced (the
    * planted near-dup), ≡ 2/3 fresh. Distinct seed multiplier from the
    * image leg (524287 vs 131071) so the two corpora share nothing.
    */
  def sample(docId: Long, t: Int): Int = {
    val v = docId % 4
    val seed =
      if (v == 1 && t % 211 == 0) docId          // perturbed samples
      else if (v <= 1) docId - v                 // base clip
      else docId                                 // fresh clip
    (PerceptualHash.mixLong(seed * 524287L + t) & 65535L).toInt - 32768
  }

  /** The raw "A6" PCM payload: 2-byte magic, big-endian u16 sample
    * count, then big-endian s16 samples.
    */
  def encode(docId: Long): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + 2 * Samples)
    out(0) = 'A'; out(1) = '6'
    out(2) = (Samples >> 8).toByte; out(3) = (Samples & 0xFF).toByte
    var t = 0
    while (t < Samples) {
      val s = sample(docId, t)
      out(HeaderLen + 2 * t) = ((s >> 8) & 0xFF).toByte
      out(HeaderLen + 2 * t + 1) = (s & 0xFF).toByte
      t += 1
    }
    out
  }

  /** Parse an A6 payload and compute per-frame energies (Σ|sample|) —
    * the REAL byte-level decode (magic check, count parse, big-endian
    * sign reconstruction). Any payload this rejects is not A6 PCM.
    */
  def frameEnergies(content: Array[Byte]): Array[Long] = {
    require(content.length >= HeaderLen
      && content(0) == 'A' && content(1) == '6', "not an A6 payload")
    val n = ((content(2) & 0xFF) << 8) | (content(3) & 0xFF)
    require(content.length == HeaderLen + 2 * n, "truncated A6 payload")
    require(n % FrameLen == 0, s"sample count not /$FrameLen: $n")
    val e = new Array[Long](n / FrameLen)
    var t = 0
    while (t < n) {
      val s = (((content(HeaderLen + 2 * t) & 0xFF) << 8)
        | (content(HeaderLen + 2 * t + 1) & 0xFF)).toShort.toInt
      e(t / FrameLen) += math.abs(s).toLong
      t += 1
    }
    e
  }

  /** (fp_hi, fp_lo) from frame energies: bit t set when
    * e(t+1) > e(t), bits 0–31 in `fp_lo`, 32–63 in `fp_hi` — two
    * always-non-negative longs, band-shift-safe in both engines.
    */
  def fingerprint(e: Array[Long]): (Long, Long) = {
    var lo = 0L; var hi = 0L
    var t = 0
    while (t < e.length - 1) {
      if (e(t + 1) > e(t)) {
        if (t < 32) lo |= 1L << t else hi |= 1L << (t - 32)
      }
      t += 1
    }
    (hi, lo)
  }

  case class AudioPayload(media_id: Long, content: Array[Byte])
  case class AudioFp(media_id: Long, hash_hi: Long, hash_lo: Long)

  /** The synthetic clip corpus: one A6 payload per documents row,
    * generated per-partition on the executors. At 100 TB the same
    * decode/fingerprint stage runs over a real media table's `binary`
    * column — the payload builder is the only synthetic piece.
    */
  def audioCorpus(spark: SparkSession, docs: DataFrame): Dataset[AudioPayload] = {
    import spark.implicits._
    // spread the byte-thin id scan before the CPU-dense decode stage
    // (the [[PerceptualHash.imageCorpus]] rationale)
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id => AudioPayload(id, encode(id))))
  }

  /** Decode + fingerprint stage: per-partition batch over payload
    * bytes — the [[Multimodal.decode]] shape with an integer-exact
    * feature. Columns named for [[PerceptualHash.nearDupPairs]] reuse.
    */
  def fingerprintClips(spark: SparkSession,
      clips: Dataset[AudioPayload]): Dataset[AudioFp] = {
    import spark.implicits._
    clips.mapPartitions(_.map { c =>
      val (hi, lo) = fingerprint(frameEnergies(c.content))
      AudioFp(c.media_id, hi, lo)
    })
  }

  /** q204: audio near-dup pairs (energy-delta fingerprint, Hamming
    * ≤ 3) over the documents-derived clip corpus — the image leg's
    * band join verbatim (the fingerprint has the same (hi, lo) 64-bit
    * shape, so the pigeonhole bound carries over).
    */
  private val fpMemo = graft.tools.CorpusMemo.ofDf

  /** The per-clip fingerprint table, memoized per (session, dir) — the
    * [[PerceptualHash.hashTable]] discipline for the audio modality:
    * decode and fingerprint once at ingest; q204 and q209's audio leg
    * read the stored table. One 2×64-bit row per clip is pinned, not
    * the samples.
    */
  def fingerprintTable(s: SparkSession, dir: String): DataFrame =
    fpMemo.get(s, dir) {
      fingerprintClips(s, audioCorpus(s, Tables.documents(s, dir)))
        .toDF().localCheckpoint()
    }

  def audioNearDupQuery(s: SparkSession, dir: String): DataFrame =
    PerceptualHash.nearDupPairs(fingerprintTable(s, dir), maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
}
