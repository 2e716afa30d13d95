package graft.operators

import graft.SparkSpec

/** Skipping-index contracts: neither leg may false-negative, the bloom
  * leg must actually skip where min/max cannot, and absent keys must
  * stay inside the sized-for fp band.
  */
class SkippingIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SkippingIndex.fileSkippingQuery(spark, dir).collect()

  test("no false negatives on either leg, and file counts are sane") {
    assert(rows.length === 13)
    rows.foreach { r =>
      val nFiles = r.getAs[Long]("n_files")
      val mm = r.getAs[Long]("minmax_pass")
      val bl = r.getAs[Long]("bloom_pass")
      val tr = r.getAs[Long]("true_files")
      assert(nFiles > 0 && nFiles <= SkippingIndex.NFiles)
      assert(mm >= tr, s"min/max false negative: $r")
      assert(bl >= tr, s"bloom false negative: $r")
      assert(mm <= nFiles && bl <= nFiles)
    }
  }

  test("bloom skips where min/max cannot, on present uncorrelated probes") {
    val present = rows.filter(_.getAs[Boolean]("present"))
    assert(present.length === 10)
    // partkey is uncorrelated with the orderkey-clustered layout, so
    // per-file [min, max] spans most of the domain: min/max passes the
    // bulk of the files while bloom stays near the true count
    val mmTotal = present.map(_.getAs[Long]("minmax_pass")).sum
    val blTotal = present.map(_.getAs[Long]("bloom_pass")).sum
    val trTotal = present.map(_.getAs[Long]("true_files")).sum
    assert(mmTotal > 2 * trTotal,
      s"layout unexpectedly correlated: minmax=$mmTotal true=$trTotal")
    assert(blTotal < mmTotal,
      s"bloom no better than stats: bloom=$blTotal minmax=$mmTotal")
    // fp band: bits-per-entry sizing keeps fill ~k/BitsPerKey -> per-file
    // fpp ~(0.17)^3; allow a generous 25% envelope over truth
    assert(blTotal <= trTotal + math.max(2, trTotal / 4),
      s"bloom fp rate above the sized-for band: bloom=$blTotal true=$trTotal")
  }

  test("absent keys skip (almost) everything through the bloom leg") {
    val absent = rows.filter(!_.getAs[Boolean]("present"))
    assert(absent.length === 3)
    absent.foreach { r =>
      assert(r.getAs[Long]("true_files") === 0L)
      assert(r.getAs[Long]("minmax_pass") === 0L) // past the global max
      val nFiles = r.getAs[Long]("n_files")
      assert(r.getAs[Long]("bloom_pass") <= nFiles / 4,
        s"absent key passed too many files: $r")
    }
  }
}
