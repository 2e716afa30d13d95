package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming replacement for the reference's event-driven
  * ingest (S3 ObjectCreated → Lambda → per-file notebook run,
  * `lambda/trigeer_ETL_Pipeline.py:29-88`, `Business_ETL.py:13-19,46-51`).
  *
  * The streaming file source's checkpointed file index subsumes the whole
  * Lambda: new files in the domain directory are discovered per micro-batch,
  * each processed exactly once (re-delivered/duplicate S3 keys — the
  * reference's append-duplication trap, SURVEY.md §7.4 — are simply never
  * reprocessed). `Trigger.AvailableNow` gives the reference's "run-now,
  * drain everything, stop" job semantics; a continuous trigger gives true
  * streaming with no code change.
  *
  * Domain routing (key-prefix → notebook, `lambda:70-71`) becomes one
  * stream per domain directory with `pathGlobFilter("*.json")`.
  */
object Ingest {

  /** Checkpointed JSON-lines file stream over a domain directory. */
  def jsonStream(
      spark: SparkSession, schema: StructType, inputDir: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "*.json")
      // bound per-micro-batch work so one huge backlog can't OOM a batch
      .option("maxFilesPerTrigger", 64)
      .json(inputDir)

  /** Drain all currently-available files through `transform` into an
    * append-mode parquet sink, then stop (the reference's jobs/run-now).
    * Returns after the drain completes.
    */
  def drainToParquet(
      spark: SparkSession,
      schema: StructType,
      inputDir: String,
      transform: DataFrame => DataFrame,
      outPath: String,
      checkpoint: String): Unit = {
    val q: StreamingQuery = jsonStream(spark, schema, inputDir)
      .transform(transform)
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** MERGE-upsert drain: each micro-batch is applied to a versioned parquet
    * snapshot through [[graft.operators.MergeInto.merge]] — the reference's
    * append/overwrite split (`README.md:217-223`) upgraded to the lakehouse
    * write path the engine already implements. A batch row with an `action`
    * column drives UPDATE/DELETE; without one every row is an upsert, so
    * re-delivered CONTENT (same key, same payload, new file) converges to
    * the same state instead of appending a duplicate.
    *
    * Snapshot versioning stands in for the table-format transaction log
    * (out of scope, `operators/MergeInto.scala:20-29`): batch N reads
    * `v{N-1}`, merges, writes `v{N}` — never overwriting its own input,
    * the read-your-own-write trap a naive overwrite sink hits. Exact
    * duplicates WITHIN a batch collapse first; MERGE's unique-key
    * precondition covers conflicting same-key rows in one batch.
    *
    * Returns the path of the latest snapshot version.
    */
  def drainMergeToParquet(
      spark: SparkSession,
      schema: StructType,
      inputDir: String,
      transform: DataFrame => DataFrame,
      key: String,
      payload: Seq[String],
      tablePath: String,
      checkpoint: String): String = {
    import org.apache.spark.sql.functions.{col, lit}
    // only COMMITTED versions count (parquet's _SUCCESS marker): a torn
    // write from a crashed batch is invisible as a base and its version
    // number is simply re-used — the overwrite self-heals it
    def versions: Seq[Long] =
      Option(new java.io.File(tablePath).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.matches("v\\d+")
          && new java.io.File(f, "_SUCCESS").isFile)
        .map(_.getName.stripPrefix("v").toLong)
    drainForeachBatch(spark, schema, inputDir, transform, checkpoint) { (batch, _) =>
      val cols = key +: payload
      val vs = versions
      val base =
        if (vs.isEmpty) batch.select(cols.map(col): _*).limit(0)
        else spark.read.parquet(f"$tablePath/v${vs.max}%06d")
      val changes0 =
        if (batch.columns.contains("action")) batch
        else batch.withColumn("action", lit("upsert"))
      // collapse exact re-deliveries inside one micro-batch; conflicting
      // payloads for one key remain the caller's precondition (as in MERGE)
      val changes = changes0.select((cols :+ "action").map(col): _*).distinct()
      graft.operators.MergeInto.merge(base, changes, key, payload)
        .drop("op")
        .write.mode("overwrite")
        .parquet(f"$tablePath/v${vs.maxOption.getOrElse(-1L) + 1L}%06d")
    }
    versions.maxOption.map(v => f"$tablePath/v$v%06d").getOrElse(tablePath)
  }

  /** Drop all but the newest `keep` snapshot versions under a
    * [[drainMergeToParquet]] table — the VACUUM that bounds snapshot
    * storage at O(keep × table) instead of O(batches × table). Local-FS
    * only (like the drain's version listing); a table format's log-based
    * retention replaces this on object storage. Returns the removed
    * version names.
    */
  def vacuumSnapshots(tablePath: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete(): Unit
    }
    val (committed, torn) =
      Option(new java.io.File(tablePath).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
        .sortBy(_.getName.stripPrefix("v").toLong)
        .partition(f => new java.io.File(f, "_SUCCESS").isFile)
    // torn versions are crash debris (single-writer assumption, as in the
    // drain): vacuum removes them along with the superseded snapshots
    val doomed = committed.dropRight(keep) ++ torn
    doomed.foreach(deleteRec)
    doomed.map(_.getName).sorted
  }

  /** foreachBatch variant for sinks that need batch-side logic (e.g. the
    * unified-join recompute after each micro-batch, `README.md:217-223`).
    */
  def drainForeachBatch(
      spark: SparkSession,
      schema: StructType,
      inputDir: String,
      transform: DataFrame => DataFrame,
      checkpoint: String)(onBatch: (DataFrame, Long) => Unit): Unit = {
    val q = jsonStream(spark, schema, inputDir)
      .transform(transform)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        onBatch(batch.toDF(), id)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
