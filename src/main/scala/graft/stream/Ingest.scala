package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}
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

  // ---------------------------------------------------------------------
  // Versioned-snapshot MERGE table: commit protocol
  //
  // Layout: tablePath/v000000, v000001, ... (parquet dirs) plus a tiny
  // `_latest` manifest holding the committed version number. The manifest
  // is written LAST and is the commit point: a snapshot directory without
  // a manifest pointing at (or past) it is invisible as a base and its
  // number is simply re-used — the overwrite self-heals torn writes.
  //
  // Everything goes through org.apache.hadoop.fs.FileSystem, so the chain
  // is correct on object stores where rename is non-atomic and listing
  // lags: the reader never trusts a directory listing for commit state,
  // only the single-object manifest PUT (atomic on S3/GCS/ABFS). The
  // parquet `_SUCCESS` marker is kept as a secondary sanity check — a
  // manifest pointing at a version with no `_SUCCESS` is ignored.
  // ---------------------------------------------------------------------

  private val ManifestName = "_latest"
  private val VersionRe = "v\\d+"

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versionPath(table: Path, v: Long): Path =
    new Path(table, f"v$v%06d")

  private def isCommittedDir(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** All snapshot versions whose parquet write completed (`_SUCCESS`),
    * regardless of manifest state — the legacy/fallback view.
    */
  private[stream] def committedVersions(fs: FileSystem, table: Path): Seq[Long] =
    if (!fs.exists(table)) Nil
    else fs.listStatus(table).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches(VersionRe)
        && isCommittedDir(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("v").toLong)

  /** The latest COMMITTED version: manifest-first (the manifest is the
    * commit point — a fully-written snapshot the manifest does not point
    * at is an uncommitted batch that streaming will replay). The bare
    * max-`_SUCCESS` listing is the fallback STRICTLY for manifest-less
    * legacy tables: when a manifest exists but points at a missing/torn
    * directory, the fallback only considers versions <= the manifest
    * value — an unconstrained max could select a completed-but-
    * uncommitted snapshot AHEAD of the last real commit (writer crashed
    * after parquet `_SUCCESS`, before the manifest PUT), silently
    * resurrecting an unreplayed batch — the exact state the manifest
    * protocol exists to hide. A manifest that exists but does not parse
    * is a refuse-don't-guess error: the PUT is atomic on object stores,
    * so corruption implies tampering or a torn local write, and either
    * repair choice (resurrect vs drop) is wrong to make silently.
    */
  /** Manifest format: `"<version>"` (legacy) or `"<version> <epoch>"`
    * (epoch-fenced writers, [[advanceSnapshotFenced]]) — one line, one
    * atomic object PUT either way. Parsing takes the first whitespace
    * token as the version, so legacy manifests and readers interoperate.
    */
  private def readManifest(fs: FileSystem, table: Path): Option[(Long, Option[Long])] = {
    val manifest = new Path(table, ManifestName)
    if (!fs.exists(manifest)) None
    else {
      val in = fs.open(manifest)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val toks = txt.split("\\s+")
      toks.headOption.flatMap(_.toLongOption) match {
        case Some(v) =>
          Some((v, toks.lift(1).flatMap(_.toLongOption)))
        case None => throw new IllegalStateException(
          s"unparseable snapshot manifest $manifest (contents: " +
            s"'${txt.take(64)}'): refusing to guess the commit point — " +
            "restore the manifest, or delete it to fall back to the " +
            "_SUCCESS listing on a table known to have no uncommitted " +
            "snapshots")
      }
    }
  }

  private[stream] def latestVersion(fs: FileSystem, table: Path): Option[Long] =
    readManifest(fs, table) match {
      case None => committedVersions(fs, table).maxOption
      case Some((v, _)) if isCommittedDir(fs, versionPath(table, v)) => Some(v)
      case Some((v, _)) => committedVersions(fs, table).filter(_ <= v).maxOption
    }

  /** The epoch recorded by the last committed fenced write, if any. Only
    * meaningful while the manifest's version is itself committed (the
    * epoch rides the same atomic PUT).
    */
  private[graft] def latestEpoch(spark: SparkSession, tablePath: String): Option[Long] = {
    val (fs, table) = fsFor(spark, tablePath)
    readManifest(fs, table).flatMap(_._2)
  }

  /** The latest COMMITTED snapshot path (manifest-first resolution) —
    * the public read handle for snapshot-chain composers outside this
    * package (e.g. [[graft.etl.Ivm.maintainStream]]).
    */
  def latestSnapshotPath(spark: SparkSession, tablePath: String): Option[String] = {
    val (fs, table) = fsFor(spark, tablePath)
    latestVersion(fs, table).map(v => versionPath(table, v).toString)
  }

  private def writeManifest(fs: FileSystem, table: Path, v: Long,
                            epoch: Option[Long] = None): Unit = {
    val out = fs.create(new Path(table, ManifestName), true)
    val txt = epoch.fold(v.toString)(e => s"$v $e")
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  /** Apply one MERGE batch to the snapshot chain: read the latest
    * committed snapshot, merge, write the next version, then commit it by
    * writing the manifest last. Single-writer (as documented on
    * [[drainMergeToParquet]]); a crash at any point leaves the previous
    * commit intact and the replayed batch re-uses the torn version number.
    */
  private def applyMergeBatch(
      spark: SparkSession,
      batch: DataFrame,
      key: String,
      payload: Seq[String],
      tablePath: String): Unit = {
    val (fs, table) = fsFor(spark, tablePath)
    val cols = key +: payload
    val cur = latestVersion(fs, table)
    val base = cur match {
      case Some(v) => spark.read.parquet(versionPath(table, v).toString)
      case None    => batch.select(cols.map(col): _*).limit(0)
    }
    // a null action is an upsert (the append-only producer case); any
    // OTHER unrecognized action makes MergeInto.merge raise — a typo'd
    // "update" must fail the batch, not silently delete the row
    val changes0 =
      if (batch.columns.contains("action"))
        batch.withColumn("action", coalesce(col("action"), lit("upsert")))
      else batch.withColumn("action", lit("upsert"))
    // collapse exact re-deliveries inside one micro-batch; conflicting
    // payloads for one key remain the caller's precondition (as in MERGE)
    val changes = changes0.select((cols :+ "action").map(col): _*).distinct()
    val next = cur.getOrElse(-1L) + 1L
    graft.operators.MergeInto.merge(base, changes, key, payload)
      .drop("op")
      .write.mode("overwrite")
      .parquet(versionPath(table, next).toString)
    writeManifest(fs, table, next)
  }

  /** MERGE-upsert drain: each micro-batch is applied to a versioned parquet
    * snapshot through [[graft.operators.MergeInto.merge]] — the reference's
    * append/overwrite split (`README.md:217-223`) upgraded to the lakehouse
    * write path the engine already implements. A batch row with an `action`
    * column drives UPDATE/DELETE (null action = upsert; any other value
    * fails the batch); without one every row is an upsert, so re-delivered
    * CONTENT (same key, same payload, new file) converges to the same state
    * instead of appending a duplicate.
    *
    * Snapshot versioning stands in for the table-format transaction log
    * (out of scope, `operators/MergeInto.scala:20-29`): batch N reads the
    * manifest's version, merges, writes the next version, and commits by
    * rewriting the manifest LAST — never overwriting its own input, and
    * never trusting a directory listing for commit state (object-store
    * safe; see the commit-protocol note above).
    *
    * Returns the path of the latest committed snapshot, or None when no
    * batch ever committed (empty input and an empty/absent table) — the
    * caller must not read the bare tablePath.
    */
  def drainMergeToParquet(
      spark: SparkSession,
      schema: StructType,
      inputDir: String,
      transform: DataFrame => DataFrame,
      key: String,
      payload: Seq[String],
      tablePath: String,
      checkpoint: String): Option[String] = {
    drainForeachBatch(spark, schema, inputDir, transform, checkpoint) { (batch, _) =>
      applyMergeBatch(spark, batch, key, payload, tablePath)
    }
    val (fs, table) = fsFor(spark, tablePath)
    latestVersion(fs, table).map(v => versionPath(table, v).toString)
  }

  /** Drain ANY streaming DataFrame into a versioned MERGE table — the
    * [[drainMergeToParquet]] sink detached from the JSON file source, so
    * stateful pipelines (e.g. [[Sessionize.streamingSessions]]) can land
    * their output with upsert-convergence semantics: an at-least-once
    * re-emission of the same key converges to one row instead of
    * appending a duplicate. Same single-writer commit protocol.
    */
  def drainStreamMerge(
      stream: DataFrame,
      key: String,
      payload: Seq[String],
      tablePath: String,
      checkpoint: String): Option[String] = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyMergeBatch(spark, batch.toDF(), key, payload, tablePath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val (fs, table) = fsFor(spark, tablePath)
    latestVersion(fs, table).map(v => versionPath(table, v).toString)
  }

  /** Drop all but the newest `keep` committed snapshot versions under a
    * [[drainMergeToParquet]] table — the VACUUM that bounds snapshot
    * storage at O(keep × table) instead of O(batches × table). Runs
    * through the Hadoop FileSystem like the drain; the manifest-pointed
    * version is always among the survivors (keep ≥ 1 and the manifest
    * points at the newest commit). Returns the removed version names.
    */
  def vacuumSnapshots(spark: SparkSession, tablePath: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val (fs, table) = fsFor(spark, tablePath)
    val dirs =
      if (!fs.exists(table)) Nil
      else fs.listStatus(table).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches(VersionRe))
        .sortBy(_.getPath.getName.stripPrefix("v").toLong)
    val latest = latestVersion(fs, table)
    // committed = fully written AND at-or-below the manifest pointer: a
    // completed parquet dir AHEAD of the manifest is an uncommitted batch
    // (its writer died before the manifest update; streaming replays it)
    val (committed, torn) = dirs.partition { st =>
      val v = st.getPath.getName.stripPrefix("v").toLong
      isCommittedDir(fs, st.getPath) && latest.exists(v <= _)
    }
    // never vacuum the manifest's version even if _SUCCESS listing lags
    val pinned = latest.map(v => versionPath(table, v).getName).toSet
    // torn versions are crash debris (single-writer assumption, as in the
    // drain): vacuum removes them along with the superseded snapshots
    val doomed = (committed.dropRight(keep) ++ torn)
      .filterNot(st => pinned.contains(st.getPath.getName))
    doomed.foreach(st => fs.delete(st.getPath, true))
    doomed.map(_.getPath.getName).sorted
  }

  /** Generic snapshot TRANSACTION on a versioned table — the commit
    * protocol detached from the MERGE sink so any state-evolution step
    * can ride it (the IVM chain, [[graft.etl.Ivm.maintainChain]], is the
    * first composer): read the latest committed state (or `empty` for a
    * fresh table), apply `step`, write the next version, commit by
    * writing the manifest LAST. Crash-safe exactly like the MERGE drain:
    * a torn write without its manifest PUT is invisible as a base, and
    * its version number is re-used by the retry (single-writer
    * assumption, as documented on [[drainMergeToParquet]]).
    *
    * Returns the committed snapshot path.
    */
  def advanceSnapshot(
      spark: SparkSession,
      tablePath: String,
      empty: => DataFrame)(step: DataFrame => DataFrame): String =
    advanceSnapshotImpl(spark, tablePath, empty, None)(step)

  /** [[advanceSnapshot]] with EPOCH FENCING — the idempotent-commit
    * pattern a NON-idempotent step (a Z-set delta merge, a counter
    * increment) needs under at-least-once delivery: the caller tags each
    * attempt with a monotonically increasing epoch (a foreachBatch
    * batchId), the commit records it in the manifest's atomic PUT, and a
    * re-delivered epoch ≤ the last committed one is SKIPPED — the crash-
    * replayed batch was already absorbed, applying it again would
    * double-count. (MERGE upserts don't need this: re-applying them
    * converges. Signed deltas don't converge — they accumulate.)
    *
    * Contract: one writer, one monotone epoch sequence per table — a
    * foreachBatch lineage on ONE checkpoint. Losing the checkpoint
    * restarts batchIds at 0, which the fence reads as already-applied:
    * rebuild the view (or move the table) rather than re-pointing a
    * fresh query at it.
    *
    * Returns the committed (or already-committed, when fenced) snapshot
    * path.
    */
  def advanceSnapshotFenced(
      spark: SparkSession,
      tablePath: String,
      epoch: Long,
      empty: => DataFrame)(step: DataFrame => DataFrame): String =
    advanceSnapshotImpl(spark, tablePath, empty, Some(epoch))(step)

  private def advanceSnapshotImpl(
      spark: SparkSession,
      tablePath: String,
      empty: => DataFrame,
      epoch: Option[Long])(step: DataFrame => DataFrame): String = {
    val (fs, table) = fsFor(spark, tablePath)
    // WRITER-side resolution: manifest-absent means FRESH, full stop. The
    // committedVersions fallback latestVersion uses is for READ paths on
    // manifest-less legacy tables only — here it would resurrect a torn
    // first write (crash between v000000's parquet _SUCCESS and the first
    // manifest PUT) as the base, and with no manifest there is no recorded
    // epoch for the fence to trip on, so the replayed first batch would be
    // applied TWICE. Every table this writer ever committed has a
    // manifest (the manifest PUT is the commit point), so ignoring
    // _SUCCESS-only debris and overwriting v000000 is always correct.
    val cur = readManifest(fs, table) match {
      case None => None
      case Some(_) => latestVersion(fs, table)
    }
    for (e <- epoch; prev <- latestEpoch(spark, tablePath); v <- cur)
      if (prev >= e) return versionPath(table, v).toString // fenced replay
    val base = cur match {
      case Some(v) => spark.read.parquet(versionPath(table, v).toString)
      case None    => empty
    }
    val next = cur.getOrElse(-1L) + 1L
    step(base).write.mode("overwrite")
      .parquet(versionPath(table, next).toString)
    writeManifest(fs, table, next, epoch)
    versionPath(table, next).toString
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
