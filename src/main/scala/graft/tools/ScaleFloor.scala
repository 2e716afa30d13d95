package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING.md's q134-vs-q106 recall floor at bench scale: brute-force the
  * exact cosine >= tau pair set of `dir`'s embeddings table on the driver
  * (2000 vectors at sf0.1 — 2M pairs, fine locally; the floor is audit
  * tooling, not an engine operator), then measure each screen's PAIR
  * RESOLUTION — the fraction of tau-pairs with at least one endpoint
  * dropped. Same ground-truth metric as SemDedupSpec's sf0.001 floor.
  *
  *   sbt "runMain graft.tools.ScaleFloor /root/testdata/sf0.1"
  *
  * Prints one JSON line: {"pairs":N,"res_fixed":x,"res_trained":y}.
  */
object ScaleFloor {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tau = 0.4
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val n = vecs.length
    val pairs = (for {
      i <- 0 until n; j <- i + 1 until n
      if cos(vecs(i)._2, vecs(j)._2) >= tau
    } yield (vecs(i)._1, vecs(j)._1)).toSeq

    def resolution(rows: Array[org.apache.spark.sql.Row]): Double = {
      val kept = rows.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
      pairs.count { case (a, b) => !kept(a) || !kept(b) }.toDouble /
        math.max(1, pairs.size)
    }
    val resFixed = resolution(
      graft.dedup.SemDedup.semDedupQuery(spark, dir).collect())
    val resTrained = resolution(
      graft.dedup.SemDedup.semDedupTrainedQuery(spark, dir).collect())
    println(f"""{"pairs":${pairs.size},"res_fixed":$resFixed%.4f,"res_trained":$resTrained%.4f}""")
    spark.stop()
  }
}
