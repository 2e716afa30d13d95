package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.syntheticMedia(spark, 30)
  lazy val feats = Multimodal.decode(spark, media)

  test("decode: one feature row per media row, deterministic, fixed-width") {
    assert(feats.count() == 30)
    val f1 = feats.filter(_.media_id == 1L).collect().head
    val f1again = Multimodal.decode(spark, media).filter(_.media_id == 1L).collect().head
    assert(f1.checksum == f1again.checksum) // stub is deterministic
    assert(f1.feature.length == Multimodal.FeatureDim)
    assert(f1.feature.forall(v => v >= 0.0f && v < 1.0f))
  }

  test("real decoders: true PNG dimensions, WAV duration, payload fallback") {
    import spark.implicits._
    val png = Multimodal.syntheticPng(37, 23, seed = 5)
    val wav = Multimodal.syntheticWav(8000, seed = 5) // 8000 frames @ 8kHz = 1s
    val junk = Array.tabulate[Byte](100)(_.toByte)    // not a decodable image
    val media = Seq(
      Multimodal.MediaRow(900L, "image", "mem://png", png, png.length.toLong, "image/png"),
      Multimodal.MediaRow(901L, "audio", "mem://wav", wav, wav.length.toLong, "audio/wav"),
      Multimodal.MediaRow(902L, "image", "mem://junk", junk, 100L, "image/png")).toDF()
    val out = Multimodal.decode(spark, media).collect().map(f => f.media_id -> f).toMap
    assert(out(900L).width == 37 && out(900L).height == 23)
    assert(math.abs(out(900L).feature.sum - 1.0) < 1e-3) // true histogram
    assert(out(901L).duration_ms == 1000L)
    assert(out(902L).width > 0) // junk image falls back to the stub, not an error
  }

  test("mp4 parser: real box-walk metadata, not the fake") {
    // known-parameter fixture → exact parsed values
    val mp4 = Mp4Meta.syntheticMp4(durationMs = 7500L, width = 640,
      height = 360, nFrames = 180, timescale = 600)
    val info = Mp4Meta.parse(mp4).get
    assert(info.durationMs == 7500L && info.timescale == 600L)
    assert(info.width == 640 && info.height == 360 && info.nSamples == 180L)
    // structural rejections → None, never a throw
    assert(Mp4Meta.parse(Array[Byte](1, 2, 3)).isEmpty)           // no header
    assert(Mp4Meta.parse(Array.fill[Byte](64)(0x41)).isEmpty)     // not boxes
    val noFtyp = mp4.drop(mp4(3))                                  // moov only
    assert(Mp4Meta.parse(noFtyp).isEmpty)
    val truncated = mp4.dropRight(10)                              // box overrun
    assert(Mp4Meta.parse(truncated).isEmpty)
    // and the decode stage uses the parsed values end-to-end
    import spark.implicits._
    val row = Seq(Multimodal.MediaRow(950L, "video", "mem://v", mp4,
      mp4.length.toLong, "video/mp4")).toDF()
    val f = Multimodal.decode(spark, row).collect().head
    assert(f.width == 640 && f.height == 360
      && f.duration_ms == 7500L && f.n_frames == 180)
    // a non-MP4 "video" payload degrades to the stub, not an error
    val junk = Seq(Multimodal.MediaRow(951L, "video", "mem://j",
      Array.tabulate[Byte](100)(_.toByte), 100L, "video/mp4")).toDF()
    assert(Multimodal.decode(spark, junk).collect().head.width > 0)
  }

  test("mp4 parser: 64-bit largesize and to-end-of-container boxes") {
    import java.nio.ByteBuffer
    val base = Mp4Meta.syntheticMp4(3000L, 128, 64, 30)
    // rewrite the leading ftyp as a largesize box: size=1 + 64-bit length
    val ftypLen = ByteBuffer.wrap(base, 0, 4).getInt
    val (ftyp, rest) = base.splitAt(ftypLen)
    val wide = ByteBuffer.allocate(ftyp.length + 8)
      .putInt(1).put(ftyp, 4, 4)            // size=1, type
      .putLong(ftyp.length + 8L)            // largesize includes the 16B header
      .put(ftyp, 8, ftyp.length - 8).array()
    val info = Mp4Meta.parse(wide ++ rest).get
    assert(info.durationMs == 3000L && info.width == 128 && info.nSamples == 30L)
    // size=0: last box extends to the end of the container
    val zeroEnd = (wide ++ rest).clone()
    val moovOff = wide.length
    ByteBuffer.wrap(zeroEnd, moovOff, 4).putInt(0)
    val info0 = Mp4Meta.parse(zeroEnd).get
    assert(info0.durationMs == 3000L && info0.height == 64)
    // a largesize smaller than its own header is rejected
    val broken = wide.clone()
    ByteBuffer.wrap(broken, 8, 8).putLong(7L)
    assert(Mp4Meta.parse(broken ++ rest).isEmpty)
  }

  test("kind-specific metadata: image has dims, audio duration, video both") {
    val byKind = feats.collect().groupBy(_.kind)
    assert(byKind("image").forall(f => f.width > 0 && f.duration_ms == 0L))
    assert(byKind("audio").forall(f => f.width == 0 && f.duration_ms > 0L))
    assert(byKind("video").forall(f => f.width > 0 && f.duration_ms > 0L && f.n_frames > 0))
  }

  test("byte-budgeted repartition: partition count from payload bytes") {
    // 30 rows × ~128B; 1KB budget → ceil-ish small partition count ≥ 1
    val rp = Multimodal.repartitionForMedia(media, targetBytesPerPartition = 1024L)
    assert(rp.rdd.getNumPartitions >= 2)
    assert(rp.count() == 30)
    val one = Multimodal.repartitionForMedia(media) // default 128MB ⇒ 1 partition
    assert(one.rdd.getNumPartitions == 1)
  }

  test("frame sample plan: stride + cap, video only") {
    val plan = Multimodal.frameSamplePlan(feats.toDF(), stride = 10, maxFrames = 5)
      .collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val idx = r.getSeq[Long](1)
      assert(idx.size <= 5)
      assert(idx.zipWithIndex.forall { case (v, i) => v == i * 10L })
    }
  }

  test("resize plan: aspect ratio preserved, no upscaling") {
    val plan = Multimodal.resizePlan(feats.toDF(), maxDim = 256).collect()
    plan.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w <= 256 && h <= 256 && w > 0 && h > 0)
    }
    // join back to originals: a smaller-than-max image is untouched
    val smalls = feats.toDF().filter(col("kind") === "image"
      && greatest(col("width"), col("height")) <= 256)
    val joined = smalls.join(Multimodal.resizePlan(feats.toDF(), 256), "media_id")
    joined.collect().foreach { r =>
      assert(r.getAs[Int]("target_width") == r.getAs[Int]("width"))
    }
  }

  test("resizeImages: real pixel downscale, pass-through for small/non-image/corrupt") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "mem://big",
        Multimodal.syntheticPng(64, 32, 1), 0L, "image/png"),
      Multimodal.MediaRow(2L, "image", "mem://small",
        Multimodal.syntheticPng(10, 8, 2), 0L, "image/png"),
      Multimodal.MediaRow(3L, "audio", "mem://wav",
        Multimodal.syntheticWav(100, 3), 0L, "audio/wav"),
      Multimodal.MediaRow(4L, "image", "mem://corrupt",
        Array[Byte](1, 2, 3), 3L, "image/png"))
    val out = Multimodal.resizeImages(spark, rows.toDS(), maxDim = 16)
      .collect().map(r => r.media_id -> r).toMap
    // 64x32 → 16x8, genuinely re-encoded and decodable at the new dims
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).content))
    assert(resized.getWidth == 16 && resized.getHeight == 8)
    assert(out(1L).content_length == out(1L).content.length.toLong)
    // already within bounds → byte-identical pass-through (no re-encode)
    assert(out(2L).content.sameElements(rows(1).content))
    // non-image and undecodable rows flow through unchanged
    assert(out(3L).content.sameElements(rows(2).content))
    assert(out(4L).content.sameElements(rows(3).content))
  }

  test("metadata ops prune the binary payload from the scan") {
    // write as parquet, read back, and check the physical ReadSchema
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val meta = spark.read.parquet(dir)
      .select("media_id", "kind", "content_length")
      .filter(col("kind") === "image")
    val physical = meta.queryExecution.executedPlan.toString
    assert(!physical.contains("content#") || !physical.split("ReadSchema")(1).contains("content"),
      s"binary column not pruned:\n$physical")
  }
}
