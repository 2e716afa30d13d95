package graft.operators

import graft.SparkSpec

/** Cascade-plan contracts: exact per-file casualty counts on a
  * hand-built layout, no row multiplication through the cascade joins,
  * and the orphan/no-orders edges.
  */
class ForgetPlanSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("hand-built cascade: per-file counts, full-rewrite and " +
    "surgical-rewrite files both surface") {
    // orders 0..63 (one per customer id mod 4), span = 1 -> 64 files of
    // one order each... keep it denser: orderkeys 0..15, NFiles = 64 ->
    // span = ceil(16/64) = 1, file = orderkey. Forget customers {1, 3}.
    val orders = (0L until 16L).map(ok => (ok, ok % 4)).toDF(
      "o_orderkey", "o_custkey")
    // 2 lineitems per order -> file = orderkey (span 1)
    val lineitem = (0L until 16L).flatMap(ok => Seq(ok, ok)).map(ok =>
      Tuple1(ok)).toDF("l_orderkey")
    val plan = ForgetPlan.cascadePlan(
      Seq(1L, 3L).toDF("k"), orders, lineitem).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[Long]("file_id")) ->
        (r.getAs[Long]("n_delete"), r.getAs[Long]("n_file_rows"),
          r.getAs[Double]("pct_rewrite"))).toMap
    // odd custkeys own odd orderkeys: orders files 1,3,5,...,15 die
    // entirely (1 row each, 100%); lineitem same files lose both rows
    val oddFiles = (1L until 16L by 2)
    oddFiles.foreach { f =>
      assert(plan(("orders", f)) === ((1L, 1L, 100.0)))
      assert(plan(("lineitem", f)) === ((2L, 2L, 100.0)))
    }
    assert(plan.size === oddFiles.size * 2) // even files untouched
  }

  test("partial files report the amplification honestly") {
    // one file (span: max key 9 -> ceil(10/64) = 1... use keys packed
    // into one file: orderkeys 0..9 with span from max 9 -> 1 per file.
    // Instead force one file by making all keys < span: max = 639 ->
    // span = 10, keys 0..9 all in file 0
    val orders = ((0L until 10L).map(ok => (ok, ok)) :+ ((639L, 999L)))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = (0L until 10L).map(Tuple1(_)).toDF("l_orderkey")
    val plan = ForgetPlan.cascadePlan(Seq(4L).toDF("k"), orders, lineitem)
      .collect()
    val o = plan.filter(_.getAs[String]("table_name") == "orders")
    assert(o.length === 1)
    assert(o.head.getAs[Long]("file_id") === 0L)
    assert(o.head.getAs[Long]("n_delete") === 1L)
    assert(o.head.getAs[Long]("n_file_rows") === 10L)
    assert(o.head.getAs[Double]("pct_rewrite") === 10.0)
  }

  test("orphan lineitems and customers without orders never enter the " +
    "plan; cascade totals conserve") {
    val orders = Seq((0L, 5L), (1L, 6L)).toDF("o_orderkey", "o_custkey")
    // orderkey 7 is an orphan (no parent order)
    val lineitem = Seq(0L, 0L, 1L, 7L).map(Tuple1(_)).toDF("l_orderkey")
    // customer 9 has no orders; customer 5 cascades
    val plan = ForgetPlan.cascadePlan(Seq(5L, 9L).toDF("k"),
      orders, lineitem)
    val deletes = plan.groupBy("table_name")
      .agg(sum("n_delete").as("d")).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("d")).toMap
    assert(deletes === Map("orders" -> 1L, "lineitem" -> 2L))
  }
}
