package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero shuffle exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    // the default warehouse dir is fixed at session creation; use a
    // db-scoped location instead
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '$wh'")
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"payload_$i"))
      .toDF("k", "payload")
    val dims = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    Bucketing.writeBucketed(facts, "bktdb.facts_b", "k", buckets = 8)
    Bucketing.writeBucketed(dims, "bktdb.dims_b", "k", buckets = 8)
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bktdb.facts_b", "bktdb.dims_b", "k")
      assert(joined.count() == 1000)
      assert(Bucketing.numShuffles(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      // contrast: the same join over the non-bucketed parquet shuffles
      facts.write.mode("overwrite").parquet(s"$wh/facts_plain")
      dims.write.mode("overwrite").parquet(s"$wh/dims_plain")
      val plain = spark.read.parquet(s"$wh/facts_plain")
        .join(spark.read.parquet(s"$wh/dims_plain"), Seq("k"))
      assert(Bucketing.numShuffles(plain) >= 2,
        plain.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")
    }
  }
}
