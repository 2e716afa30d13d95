package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-job profiler (not part of the driver contract): runs the
  * named queries through the noop sink and prints every Spark job's
  * duration with the call site that launched it — the exact breakdown of
  * where a multi-job (checkpoint-heavy / iterative) query spends its
  * time, attributable to source lines without touching query code.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobProfile q216_curation_plan_maintain"`.
  * Methodology matches Bench: warm pass at sf0.001 (codegen), then TWO
  * timed passes at the target SF; the per-job table is printed for the
  * SECOND pass (memoized state priced at the margin, like the bench min).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // quick A/B knob: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" layered on top of
    // the session defaults (dev-only; Bench/Verify never read this)
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_CONFS").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = extra.foldLeft(graft.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))) {
        case (b, (k, v)) => b.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SessionDefaults.silenceProvenBenignWarnings()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the result stage (last) carries the call site that launched the
        // job, e.g. "localCheckpoint at CurationMaintain.scala:267";
        // broadcast/subquery jobs run on a thread pool whose short name is
        // a CompletableFuture frame — dig the first graft frame out of the
        // long-form details instead
        val site = js.stageInfos.lastOption.map { si =>
          if (si.name.contains("CompletableFuture"))
            si.details.split('\n').find(_.contains("graft."))
              .map("broadcast/subquery via " + _.trim).getOrElse(si.name)
          else si.name
        }.getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (record && s != null)
          rows.add((je.jobId, (System.nanoTime() - s._1) / 1e9, s._2))
      }
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm codegen at the smallest SF
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      spark.catalog.clearCache()
      def pass(rec: Boolean): Double = {
        record = rec
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        record = false
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = pass(rec = false)
      rows.clear()
      val t2 = pass(rec = true)
      // two extra unprofiled passes: host-load noise at this scale swamps
      // ±1 s effects, so report the bench-style min as the stable number
      val tmin = math.min(math.min(t2, pass(rec = false)), pass(rec = false))
      println(f"\n===== $name pass1=$t1%.2f s pass2=$t2%.2f s min=$tmin%.2f s (profiled) =====")
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(_._1)
      val bySite = all.groupBy(_._3).map { case (site, js) =>
        (site, js.map(_._2).sum, js.size)
      }.toSeq.sortBy(-_._2)
      println(f"${"TOTAL jobs"}%-60s ${all.map(_._2).sum}%8.2f s n=${all.size}")
      bySite.take(40).foreach { case (site, sec, n) =>
        println(f"$site%-60s $sec%8.2f s n=$n")
      }
    }
    spark.stop()
  }
}
