package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for the training-data
  * pipeline posture: media as opaque `binary` columns with typed metadata,
  * processed by per-partition batch operators.
  *
  * The actual codec work (JPEG decode, audio resample, video frame-split)
  * needs native libraries that are NOT in this environment — those steps are
  * STUBBED with a deterministic fake (clearly marked below) so the
  * Spark-side plumbing is real and testable: schemas, partitioning, batch
  * iteration shape, and the metadata contracts are exactly what a real
  * decoder plugs into.
  *
  * Scale design:
  *  - media rows are large (MBs); `repartitionForMedia` sizes partitions by
  *    total *bytes*, not row count, so a partition fits executor memory;
  *  - decode runs via `mapPartitions` on a typed Dataset — one JVM-side
  *    batch per partition, no per-row driver involvement, no collect;
  *  - metadata-only transforms (filter by width, sample frames) operate on
  *    the typed columns and never touch the payload, so column pruning keeps
  *    the binary out of the scan entirely (`ReadSchema` shows no `content`).
  */
object Multimodal {

  /** Raw media table schema: opaque payload + typed envelope. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),         // "image" | "audio" | "video"
    StructField("uri", StringType),
    StructField("content", BinaryType),
    StructField("content_length", LongType),
    StructField("mime", StringType)))

  case class MediaRow(
      media_id: Long, kind: String, uri: String,
      content: Array[Byte], content_length: Long, mime: String)

  /** Decoded-feature envelope produced by the decode stage. */
  case class MediaFeatures(
      media_id: Long, kind: String,
      width: Int, height: Int,            // image/video
      duration_ms: Long,                  // audio/video
      n_frames: Int,                      // video
      checksum: Long,                     // payload integrity hash
      feature: Array[Float])              // fixed-width feature vector

  val FeatureDim = 16

  /** ==== STUB ====
    * Deterministic fake decoder standing in for the native codec call
    * (e.g. libjpeg / ffmpeg). Derives stable pseudo-metadata from the
    * payload bytes so tests are reproducible. A real implementation
    * replaces ONLY this function; every caller keeps its shape.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val h = row.content.foldLeft(1125899906842597L)((a, b) => a * 31 + b)
    def pick(lo: Int, hi: Int, salt: Int): Int =
      lo + math.floorMod(h ^ salt, (hi - lo).toLong).toInt
    val feature = Array.tabulate(FeatureDim)(i =>
      (math.floorMod(h * (i + 1), 1000L) / 1000.0f))
    row.kind match {
      case "image" => MediaFeatures(row.media_id, row.kind,
        pick(64, 4096, 1), pick(64, 4096, 2), 0L, 1, h, feature)
      case "audio" => MediaFeatures(row.media_id, row.kind,
        0, 0, pick(1000, 600000, 3).toLong, 0, h, feature)
      case "video" => MediaFeatures(row.media_id, row.kind,
        pick(64, 1920, 4), pick(64, 1080, 5), pick(1000, 600000, 6).toLong,
        pick(24, 7200, 7), h, feature)
      case _ => MediaFeatures(row.media_id, row.kind, 0, 0, 0L, 0, h, feature)
    }
  }

  /** Byte-budgeted repartition: choose partition count so each holds about
    * `targetBytesPerPartition` of payload. At 100 TB this is the difference
    * between a stable decode stage and an OOM loop — row-count partitioning
    * is meaningless when row size varies by 1000×.
    */
  def repartitionForMedia(
      df: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val totalBytes = df.agg(sum(col("content_length"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, (totalBytes / targetBytesPerPartition).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** Decode stage: per-partition batch map on a typed Dataset. The real
    * decoder would initialize its native context once per partition
    * (the `mapPartitions` body), amortizing setup across the batch —
    * this is the JVM analog of a vectorized pandas-batch UDF.
    */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init hook for the native codec would go here
      it.map(decodeStub)
    }
  }

  /** Metadata-only ops — never deserialize the payload. */
  def filterBySize(feats: Dataset[MediaFeatures], minW: Int, minH: Int): Dataset[MediaFeatures] =
    feats.filter(f => f.width >= minW && f.height >= minH)

  /** Deterministic frame sampling plan for videos: every `stride`-th frame
    * index, capped at `maxFrames` — a pure-metadata computation the real
    * frame extractor consumes.
    */
  def frameSamplePlan(feats: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    feats.filter(col("kind") === "video")
      .select(col("media_id"),
        slice(sequence(lit(0L),
          greatest(col("n_frames") - 1, lit(0)).cast("long"), lit(stride.toLong)),
          1, maxFrames).as("frame_indices"))

  /** "Resize" planning: target dims preserving aspect ratio (metadata only;
    * the pixel work belongs to the stubbed codec layer).
    */
  def resizePlan(feats: DataFrame, maxDim: Int): DataFrame =
    feats.filter(col("kind").isin("image", "video"))
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .select(col("media_id"),
        round(col("width") * col("scale")).cast("int").as("target_width"),
        round(col("height") * col("scale")).cast("int").as("target_height"))

  /** Synthetic media table for tests/demos (deterministic payloads). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val content = Array.tabulate[Byte](64 + i % 128)(j => ((i * 31 + j) % 127).toByte)
      MediaRow(i.toLong, kind, s"mem://media/$i", content, content.length.toLong,
        s"$kind/x-test")
    }.toDF()
  }
}
