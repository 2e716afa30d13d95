package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Perceptual near-duplicate IMAGE hashing — the content-level leg of
  * the multimodal suite (q36's metadata walk never looks at pixels;
  * this does). Classic aHash/dHash [average hash / difference hash,
  * the standard perceptual-dedup fingerprints — e.g. Zauner,
  * "Implementation and Benchmarking of Perceptual Image Hash
  * Functions", 2010]: downscale to an 8×8 block grid, then one bit per
  * block — aHash: block mean above the global mean; dHash: block mean
  * above its right neighbor (7×8 = 56 gradient bits). Near-duplicate
  * images (re-encodes, small retouches, watermarks) land within a few
  * Hamming bits; unrelated images differ in ~32.
  *
  * Exactness discipline: every step is INTEGER arithmetic over pixel
  * bytes — block sums, the mean test as `block_sum·64 > total_sum`
  * (clearing both /16 and /1024 denominators), bit-packing into two
  * 32-bit halves (`hash_hi`, `hash_lo` — never a set sign bit, so
  * band shifts stay arithmetic-safe in both engines) — which is what
  * makes the oracle able to replay the hash BIT-FOR-BIT from the same
  * deterministic pixel matrix. The decode step (header parse + pixel
  * walk over the `binary` payload) is therefore oracle-verified
  * end-to-end: any byte-offset mistake changes hashes and fails the
  * driver's hash gate.
  *
  * Corpus: one 32×32 grayscale image per `documents` row, generated
  * DISTRIBUTED (mapPartitions over the doc_id scan — no driver-side
  * rows) as a real `binary` payload ("G8" header + raw pixels), with
  * planted near-duplicates: doc_id ≡ 1 (mod 4) is a pixel-level
  * perturbation of its ≡ 0 neighbor (~10 of 1024 pixels replaced),
  * ≡ 2/3 are fresh. The pixel matrix is the q82 quadratic mixer
  * (mod 2³¹−1) both engines already replay.
  *
  * 100 TB shape: hashing is per-partition batch compute over the
  * payload bytes (no shuffle, no driver); candidate pairing is
  * LSH-style BANDING — 4 × 16-bit bands of the 64-bit hash, exchange
  * keyed on (band_idx, band_value), so by pigeonhole every pair within
  * Hamming ≤ 3 shares a band and the pair table is collision-sized,
  * never n². The exact Hamming recheck runs only on band collisions.
  * The brute-force pair scan exists ONLY in the DuckDB oracle.
  */
object PerceptualHash {

  val W = 32                 // image side (pixels)
  val Grid = 8               // hash grid side (blocks)
  val BlockPx = W / Grid     // 4×4 pixels per block
  val HeaderLen = 6          // 'G' '8' w_hi w_lo h_hi h_lo

  val P = 2147483647L

  /** JVM twin of the q82/q177 quadratic mixer (`analytics.Hll`'s
    * Column form) — same constants, same mod-2³¹−1 arithmetic, so the
    * oracle replays pixels with the SQL expression it already proves.
    */
  def mixLong(x: Long): Long = {
    val m1 = (506952114L * (((x % P) + P) % P) + 1013904223L) % P
    (1566083941L * ((m1 * m1) % P) + m1) % P
  }

  /** Pixel byte of image `docId` at row-major index `idx`: doc_id ≡ 0
    * (mod 4) is a fresh image seeded by itself; ≡ 1 is its ≡ 0
    * neighbor with every 101st pixel replaced (the planted near-dup —
    * ~10 of 1024 pixels, a few Hamming bits); ≡ 2/3 are fresh.
    */
  def pixel(docId: Long, idx: Int): Int = {
    val v = docId % 4
    val seed =
      if (v == 1 && idx % 101 == 0) docId        // perturbed pixels
      else if (v <= 1) docId - v                 // base image
      else docId                                 // fresh image
    (mixLong(seed * 131071L + idx) & 255L).toInt
  }

  /** The raw "G8" grayscale payload: 2-byte magic, big-endian u16
    * width/height, then w·h pixel bytes.
    */
  def encode(docId: Long): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + W * W)
    out(0) = 'G'; out(1) = '8'
    out(2) = (W >> 8).toByte; out(3) = (W & 0xFF).toByte
    out(4) = (W >> 8).toByte; out(5) = (W & 0xFF).toByte
    var i = 0
    while (i < W * W) { out(HeaderLen + i) = pixel(docId, i).toByte; i += 1 }
    out
  }

  /** Parse a G8 payload and compute the 8×8 block sums — the REAL
    * byte-level decode (header check, dimension parse, pixel walk).
    * Any payload this rejects is not a G8 image.
    */
  def blockSums(content: Array[Byte]): Array[Long] = {
    require(content.length >= HeaderLen
      && content(0) == 'G' && content(1) == '8', "not a G8 payload")
    val w = ((content(2) & 0xFF) << 8) | (content(3) & 0xFF)
    val h = ((content(4) & 0xFF) << 8) | (content(5) & 0xFF)
    require(content.length == HeaderLen + w * h, "truncated G8 payload")
    require(w % Grid == 0 && h % Grid == 0, s"dims not /$Grid: ${w}x$h")
    val (bw, bh) = (w / Grid, h / Grid)
    val bs = new Array[Long](Grid * Grid)
    var y = 0
    while (y < h) {
      val rowBlock = (y / bh) * Grid
      var x = 0
      while (x < w) {
        bs(rowBlock + x / bw) += (content(HeaderLen + y * w + x) & 0xFF).toLong
        x += 1
      }
      y += 1
    }
    bs
  }

  /** (hash_hi, hash_lo, dhash) from block sums. aHash bit b: block b's
    * mean above the global mean — `bs(b)·64 > total` exactly (equal
    * block sizes clear both denominators). Bits 0–31 pack into
    * `hash_lo`, 32–63 into `hash_hi` — two always-non-negative longs.
    * dHash bit (y,x): block (y,x+1) above block (y,x) — 7 bits × 8
    * rows = 56 bits, sign-safe in one long.
    */
  def hashes(bs: Array[Long]): (Long, Long, Long) = {
    var total = 0L
    var b = 0
    while (b < bs.length) { total += bs(b); b += 1 }
    var lo = 0L; var hi = 0L; var dh = 0L
    b = 0
    while (b < 64) {
      if (bs(b) * 64L > total) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
      b += 1
    }
    var y = 0
    while (y < Grid) {
      var x = 0
      while (x < Grid - 1) {
        if (bs(y * Grid + x + 1) > bs(y * Grid + x))
          dh |= 1L << (y * (Grid - 1) + x)
        x += 1
      }
      y += 1
    }
    (hi, lo, dh)
  }

  case class ImagePayload(media_id: Long, content: Array[Byte])
  case class ImageHash(media_id: Long, hash_hi: Long, hash_lo: Long,
                       dhash: Long)

  /** The synthetic image corpus: one G8 payload per documents row,
    * generated per-partition on the executors (the driver never sees a
    * pixel). At 100 TB the same decode/hash stage runs over a real
    * media table's `binary` column — the payload builder is the only
    * synthetic piece.
    */
  def imageCorpus(spark: SparkSession, docs: DataFrame): Dataset[ImagePayload] = {
    import spark.implicits._
    // The doc_id scan is BYTE-thin (one pruned column — file-packing puts
    // the whole table in 1-2 input partitions) but the stage it feeds is
    // CPU-dense (per-row payload build + 1024-pixel decode), so spread the
    // ids across the cluster first: an 8-byte-per-row round-robin exchange
    // is ~free and turns the decode from single-core into embarrassingly
    // parallel. Measured at 100×: q205's decode went 24.0 → ~2 s. (A real
    // media table's payload column makes the scan itself wide enough; this
    // matters exactly when a narrow scan feeds heavy per-row compute.)
    docs.select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id => ImagePayload(id, encode(id))))
  }

  /** Decode + hash stage: per-partition batch over the payload bytes —
    * the [[Multimodal.decode]] shape with an integer-exact feature.
    */
  def hashImages(spark: SparkSession, images: Dataset[ImagePayload]): Dataset[ImageHash] = {
    import spark.implicits._
    images.mapPartitions(_.map { img =>
      val (hi, lo, dh) = hashes(blockSums(img.content))
      ImageHash(img.media_id, hi, lo, dh)
    })
  }

  /** LSH banding of a (hi, lo) 64-bit hash into 4 × 16-bit bands:
    * every pair within Hamming ≤ 3 agrees on ≥ 1 band (pigeonhole),
    * so the band join is the complete candidate generator for the
    * ≤ 3 recheck. Shifts only ever see non-negative inputs.
    */
  private def bands(hi: Column, lo: Column): Column = array(
    struct(lit(0).as("bi"), lo.bitwiseAND(lit(65535L)).as("bv")),
    struct(lit(1).as("bi"), shiftright(lo, 16).as("bv")),
    struct(lit(2).as("bi"), hi.bitwiseAND(lit(65535L)).as("bv")),
    struct(lit(3).as("bi"), shiftright(hi, 16).as("bv")))

  private def hamming64(hiA: Column, loA: Column,
                        hiB: Column, loB: Column): Column =
    bit_count(hiA.bitwiseXOR(hiB)) + bit_count(loA.bitwiseXOR(loB))

  /** Near-duplicate pairs within `maxHamming` (≤ 3 for the 4-band
    * guarantee) of the 64-bit aHash: band-join candidates, distinct
    * pair, exact Hamming recheck.
    */
  def nearDupPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, s"4x16 bands only guarantee <= 3, got $maxHamming")
    val banded = hashed.select(col("media_id"), col("hash_hi"),
        col("hash_lo"), explode(bands(col("hash_hi"), col("hash_lo"))).as("b"))
      .select(col("media_id"), col("hash_hi"), col("hash_lo"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = banded.select(col("bi"), col("bv"), col("media_id").as("id_a"),
      col("hash_hi").as("hi_a"), col("hash_lo").as("lo_a"))
    val b = banded.select(col("bi"), col("bv"), col("media_id").as("id_b"),
      col("hash_hi").as("hi_b"), col("hash_lo").as("lo_b"))
    a.join(b, a("bi") === b("bi") && a("bv") === b("bv")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("hi_a"), col("lo_a"), col("hi_b"), col("lo_b"))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may collide in several bands
  }

  /** dHash gradient pairs within `maxHamming` of the 56-bit dhash:
    * 4 × 14-bit bands (same pigeonhole bound). The dhash is
    * non-negative (56 < 63 bits), so shifts are safe.
    */
  def dhashPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, s"4x14 bands only guarantee <= 3, got $maxHamming")
    val dbands = array((0 until 4).map(i =>
      struct(lit(i).as("bi"),
        shiftright(col("dhash"), 14 * i).bitwiseAND(lit(16383L)).as("bv"))): _*)
    val banded = hashed.select(col("media_id"), col("dhash"),
        explode(dbands).as("b"))
      .select(col("media_id"), col("dhash"),
        col("b.bi").as("bi"), col("b.bv").as("bv"))
    val a = banded.select(col("bi"), col("bv"), col("media_id").as("id_a"),
      col("dhash").as("dh_a"))
    val b = banded.select(col("bi"), col("bv"), col("media_id").as("id_b"),
      col("dhash").as("dh_b"))
    a.join(b, a("bi") === b("bi") && a("bv") === b("bv")
        && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("dh_a").bitwiseXOR(col("dh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  private val hashMemo = graft.tools.CorpusMemo.ofDf

  /** The per-doc image hash table, memoized per (session, dir) — the
    * [[graft.similarity.ProductQuantization.fullTrained]] discipline
    * applied to media: a production store decodes and fingerprints
    * each asset ONCE at ingest and every consumer (q202 aHash pairs,
    * q203 dHash pairs, q209's image leg) reads the stored table.
    * Hashes are a pure deterministic function of the corpus, so
    * memo-vs-redecode is bit-identical; the pinned state is one
    * 3×64-bit row per doc, not the pixels.
    */
  def hashTable(s: SparkSession, dir: String): DataFrame =
    hashMemo.get(s, dir) {
      hashImages(s, imageCorpus(s, Tables.documents(s, dir)))
        .toDF().localCheckpoint()
    }

  /** q202: perceptual near-dup image pairs (aHash Hamming ≤ 3) over
    * the documents-derived image corpus.
    */
  def imageNearDupQuery(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(hashTable(s, dir), maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  /** q203: gradient (dHash) near-dup pairs (Hamming ≤ 3) — the
    * mean-insensitive twin (aHash misses brightness-shifted dups;
    * dHash misses contrast flips; production dedup runs both).
    */
  def imageDhashQuery(s: SparkSession, dir: String): DataFrame =
    dhashPairs(hashTable(s, dir), maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
}
