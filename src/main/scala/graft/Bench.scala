package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionDefaults.silenceProvenBenignWarnings()
    // Untimed PER-QUERY warmup at the smallest SF: whole-stage-codegen
    // (janino) compile and first-touch IO otherwise bill to the timed run
    // — observed as 15.2→1.85 s swings on identical code. Running every
    // query once at sf0.001 compiles each plan's generated code before
    // anything is measured; the timed sf pass then measures execution,
    // not compilation.
    // Dev-loop filter: SPARK_GRAFT_ONLY=q57,q62 times just those queries.
    // Unset (the driver's mode) runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        if (unknown.nonEmpty) {
          // A typo'd filter must not produce an empty-but-green bench run.
          System.err.println(
            s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
          sys.exit(2)
        }
        SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
        spark.catalog.clearCache()
      }
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Materialize through the noop sink: count() would let Catalyst prune
      // projections/sorts/aggregate expressions and time a bare row count
      // instead of the query's actual work.
      def timedPass(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        // queries that cache intermediates (LSH signatures, shingle tables)
        // must not hold executor memory across the rest of the run
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // Min of TWO timed passes: a shared bench host under contention has
      // swung identical code 2x across rounds; the min is the stable
      // "machine was available" number and still includes every Spark-side
      // cost (planning, shuffle, spill) — only the noise is dropped.
      val (s1, ok1) = timedPass()
      if (!ok1) { failed += name; name -> -s1 }
      else {
        val (s2, ok2) = timedPass()
        if (!ok2) { failed += name; name -> -s2 }
        else name -> math.min(s1, s2)
      }
    }.toMap
    // failed queries carry a negative timing AND are listed explicitly —
    // a silent time-to-exception must not pass as a plausible measurement
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ > 0).sum
    // The driver archives only a ~2 KB tail of stdout, and the full-name
    // full-precision map for 141 queries is ~5 KB — it was getting cut
    // mid-line and recorded as unparseable. Two-part fix: the PRINTED
    // line is compacted to fit the tail (query names shortened to their
    // unique qNN prefix, seconds rounded; precision drops further if the
    // registry ever outgrows the budget), and the complete map is
    // written to BENCH_FULL_LATEST.json alongside the repo artifacts.
    def compactLine(scale: Int, minimal: Boolean,
        dropZeros: Boolean = false): String = {
      val failedShort = failed.map(_.takeWhile(_ != '_')).toSet
      val qs = results.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        val short = k.takeWhile(_ != '_')
        val bd = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
        // the drop-zeros tier omits sub-half-second queries (the full map
        // is always in BENCH_FULL_LATEST.json) but never a failed one
        if (dropZeros && bd.signum == 0 && !failedShort(short)) None
        else Some("\"" + short + "\":" +
          (if (scale == 0) bd.toBigInt.toString else bd.toDouble.toString))
      }.mkString("{", ",", "}")
      val t = BigDecimal(total).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      // minimal drops "sf" (recoverable from the driver's own config) and
      // an EMPTY failed list; a non-empty failed list is never dropped —
      // silently hiding failures to fit a byte budget would be worse than
      // truncation
      val failedPart =
        if (minimal && failed.isEmpty) "" else s""","failed":$failedJson"""
      val sfPart = if (minimal) "" else s""","sf":"$sfDir""""
      s"""{"metric":"total","value":$t,"unit":"sec","queries":$qs$failedPart$sfPart}"""
    }
    // Degrade precision (2 → 1 → 0 dp), then fields, until the line fits
    // the driver's ~2 KB stdout tail; if even the minimal form overflows,
    // say so on stderr so a truncated round is diagnosable.
    val line = {
      val attempts = Seq(compactLine(2, minimal = false),
        compactLine(1, minimal = false), compactLine(0, minimal = false),
        compactLine(0, minimal = true),
        compactLine(0, minimal = true, dropZeros = true))
      attempts.find(_.length <= 1800).getOrElse {
        System.err.println("bench: compact JSON line exceeds the 1800-byte " +
          "budget even at minimal precision — the driver's stdout tail will " +
          "truncate it; read BENCH_FULL_LATEST.json instead")
        attempts.last
      }
    }
    val fullQs = results.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"queries":$fullQs,"failed":$failedJson,"sf":"$sfDir"}"""
    // Default path derives from the working directory (the repo root when
    // the driver runs sbt there); only expected IO failures are swallowed
    // (read-only checkout), and always with a stderr notice — a silent
    // write failure would leave a stale committed artifact masquerading as
    // the current run.
    // A filtered (SPARK_GRAFT_ONLY) run must NEVER overwrite the default
    // artifact: BENCH_FULL_LATEST.json's documented contract is the
    // full-surface per-query map, and a 2-query A/B run once clobbered it
    // (round-14 ADVICE). Partial runs go to an explicit path or nowhere.
    val fullPath = sys.env.get("SPARK_GRAFT_BENCH_FULL").getOrElse {
      if (only.isDefined) {
        System.err.println("bench: SPARK_GRAFT_ONLY is set and " +
          "SPARK_GRAFT_BENCH_FULL is not — skipping the full-map write so " +
          "the partial run cannot clobber BENCH_FULL_LATEST.json")
        null
      } else new java.io.File("BENCH_FULL_LATEST.json").getAbsolutePath
    }
    if (fullPath != null) try {
      val w = new java.io.PrintWriter(fullPath, "UTF-8")
      try w.println(full) finally w.close()
    } catch {
      case e @ (_: java.io.IOException | _: SecurityException) =>
        System.err.println(s"bench: could not write $fullPath (${e.getMessage}) " +
          "— the compact stdout line is the only record of this run")
    }
    println(line)
    spark.stop()
  }
}
