package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The k = 1 argmax aggregate's contract: bit-identical to the built-in
  * `max` on every orderable type (including the struct winners the
  * built-in can only SortAggregate), across partition layouts that force
  * the partial/merge/serialize paths, with SQL max's null semantics.
  */
class MaxOrderableSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("agrees with built-in max on real CDC struct winners, any partitioning") {
    GraftFunctions.register(spark)
    val log = graft.etl.Cdc.cdcOrdersLog(spark, dir)
    val packed = struct(col("ts"), col("seq"), col("op"), col("status"),
      col("price"))
    def collect(winner: org.apache.spark.sql.Column,
        df: org.apache.spark.sql.DataFrame): Set[(Long, String, Option[Double])] =
      df.groupBy(col("o_orderkey")).agg(winner.as("w"))
        .select(col("o_orderkey"), col("w.op"), col("w.price"))
        .as[(Long, String, Option[Double])].collect().toSet
    val builtin = collect(max(packed), log)
    assert(collect(GraftFunctions.maxOrderable(packed), log) == builtin)
    // 32 input partitions force real partial buffers + serialize/merge
    assert(collect(GraftFunctions.maxOrderable(packed),
      log.repartition(32)) == builtin)
  }

  test("SQL path: null skipping, all-null group → null, empty serialization") {
    GraftFunctions.register(spark)
    Seq((1L, Some(5L)), (1L, None), (1L, Some(9L)), (2L, Option.empty[Long]))
      .toDF("g", "v").repartition(8).createOrReplaceTempView("maxo_in")
    val rows = spark.sql(
      "SELECT g, graft_max_orderable(v) AS m FROM maxo_in GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getLong(1) == 9L)
    assert(rows(1).isNullAt(1)) // all-null group: max semantics, not 0
  }

  test("unorderable input fails analysis, not runtime") {
    GraftFunctions.register(spark)
    Seq((1L, Map("a" -> 1L))).toDF("g", "m").createOrReplaceTempView("maxo_bad")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_max_orderable(m) FROM maxo_bad").collect()
    }
  }
}
