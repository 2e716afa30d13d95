package graft.etl

import graft.SparkSpec

/** Bitemporal resolution contracts on a hand ledger: restatement vs
  * late-arrival vs retraction each behave differently across the
  * (T, V) grid, and past cells are REPRODUCIBLE — appending later
  * transactions never changes what an earlier T resolved to (the
  * append-only audit law).
  */
class BitemporalSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // key 1: base 10.0, RESTATED at tx2 to 11.0 (valid_from stays 1)
  // key 2: base 20.0, prompt change at tx2: valid_from 2, 70.0
  // key 3: base 30.0, LATE ARRIVAL at tx3 backdated to v2: 105.0
  // key 4: base 40.0, RETRACTED at tx3 from v3 on
  private val ledger = Seq(
    (1L, 1L, 1L, true, Some(10.0)),
    (1L, 1L, 2L, true, Some(11.0)),
    (2L, 1L, 1L, true, Some(20.0)),
    (2L, 2L, 2L, true, Some(70.0)),
    (3L, 1L, 1L, true, Some(30.0)),
    (3L, 2L, 3L, true, Some(105.0)),
    (4L, 1L, 1L, true, Some(40.0)),
    (4L, 3L, 3L, false, None))
    .toDF("key", "valid_from", "recorded_tx", "alive", "price")

  private def grid3 = {
    val t = spark.range(1, 4).select(col("id").as("T"))
    t.crossJoin(spark.range(1, 4).select(col("id").as("V")))
  }

  private def cell(df: Array[org.apache.spark.sql.Row], t: Long, v: Long) =
    df.filter(r => r.getLong(0) == t && r.getLong(1) == v)
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap

  test("restatement, prompt change, late arrival, retraction each cut " +
    "the grid differently") {
    val out = Bitemporal.resolve(ledger, grid3, Seq("price"))
      .select("T", "V", "key", "price").collect()
    // key 1 restatement: T=1 sees 10.0 at every V; T>=2 sees 11.0 at every V
    (1L to 3L).foreach { v =>
      assert(cell(out, 1L, v)(1L) === 10.0)
      assert(cell(out, 2L, v)(1L) === 11.0)
      assert(cell(out, 3L, v)(1L) === 11.0)
    }
    // key 2 prompt change: the (T, V) diagonal splits at V=2
    assert(cell(out, 2L, 1L)(2L) === 20.0)
    assert(cell(out, 2L, 2L)(2L) === 70.0)
    // key 3 late arrival: at T=2 the v2 change is UNKNOWN even at V=2;
    // at T=3 it is visible for V>=2 but V=1 still reads the base
    assert(cell(out, 2L, 2L)(3L) === 30.0)
    assert(cell(out, 3L, 2L)(3L) === 105.0)
    assert(cell(out, 3L, 1L)(3L) === 30.0)
    // key 4 retraction: gone ONLY where both axes reach it
    assert(cell(out, 2L, 3L).contains(4L))
    assert(cell(out, 3L, 2L).contains(4L))
    assert(!cell(out, 3L, 3L).contains(4L))
  }

  test("append-only reproducibility: every T<=2 cell resolves identically " +
    "before and after the tx-3 assertions land") {
    val prefix = ledger.filter(col("recorded_tx") <= 2L)
    val g = grid3.filter(col("T") <= 2L)
    val before = Bitemporal.resolve(prefix, g, Seq("price"))
      .collect().map(_.toSeq).toSet
    val after = Bitemporal.resolve(ledger, g, Seq("price"))
      .collect().map(_.toSeq).toSet
    assert(before === after)
  }

  test("q176 grid on testdata: restatements shift every T>=2 column, " +
    "late arrivals only the T=3/V>=2 cells, retractions only (3,3)") {
    val out = Bitemporal.bitemporalQuery(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_keys"), r.getAs[Double]("sum_price"))).toMap
    assert(out.size === 9)
    // key counts: only the (3,3) cell loses the retracted %9=7 keys
    val n11 = out((1L, 1L))._1
    assert(out.filterNot(_._1 == (3L, 3L)).values.forall(_._1 == n11))
    assert(out((3L, 3L))._1 < n11)
    // T=1 cells are version-blind (nothing but base known): equal sums
    assert(out((1L, 1L))._2 === out((1L, 3L))._2)
    // restatement raises every T>=2 cell even at V=1
    assert(out((2L, 1L))._2 > out((1L, 1L))._2)
    // late arrival separates (2,2) from (3,2)
    assert(out((3L, 2L))._2 > out((2L, 2L))._2)
  }
}
