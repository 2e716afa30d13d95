package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the iterative queries (not part of the
  * driver contract; run via `sbt "runMain graft.Profile"`).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SessionDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm codegen once
    graft.graph.PageRank.pagerankQuery(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    val edges = time("purchaseEdges materialize") {
      val e = graft.graph.PageRank.purchaseEdges(spark, dir).localCheckpoint()
      e.count(); e
    }
    for (it <- Seq(1, 3, 5)) {
      time(s"pagerank iters=$it") {
        graft.graph.PageRank.run(edges, 0.85, maxIter = it, tol = 0.0)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.catalog.clearCache()
    time("bfs full") {
      graft.graph.PageRank.bfsQuery(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("q40 clusters") {
      graft.dedup.Dedup.clustersQuery(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
