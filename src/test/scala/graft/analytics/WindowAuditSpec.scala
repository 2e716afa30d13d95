package graft.analytics

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

import graft.SparkSpec

/** The EMPTY-KEY window audit — the closed list of `Window.orderBy`
  * (no partitionBy) sites in the query surface, each proven
  * dimension-sized at runtime. An unpartitioned window moves its whole
  * input to ONE partition; that is fine for a buckets/days/bins prefix
  * table and a scale-killer for anything corpus-sized, so the contract
  * is: (a) no query outside this list plans a global window, and
  * (b) every listed window's INPUT is at most `Bound` rows at sf0.01 —
  * aggregates over fixed-cardinality dimensions (order dates, buckets,
  * deciles, channels, files, survival timestamps), which do not grow
  * with the corpus. A corpus-sized input here fails the bound, and a
  * NEW global window in any other query fails the membership check —
  * both before any bench run can inherit the regression (the
  * "No Partition Defined for Window" warnings at bench time are
  * exactly this list, now pinned).
  */
class WindowAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Dimension ceiling: the largest legitimate prefix tables are the
    * $100 price-bucket domain (~4.7k buckets — bounded by the price
    * RANGE, not the corpus) and the order-date dimension (~2.4k days).
    * The discriminating bound is against the TABLES the windows could
    * accidentally see — lineitem/orders/events, all ≥ 13k rows at
    * sf0.01 and growing linearly with scale where the dimensions
    * don't.
    */
  private val Bound = 8192L

  /** Every query whose OPTIMIZED plan owns ≥ 1 empty-key window (the
    * optimizer folds several source-level `Window.orderBy` sites away —
    * this list is the surviving physical reality, not the grep).
    */
  private val Audited: Set[String] = Set(
    "q97_chi_square", "q98_gini_spend", "q100_sequence_packing",
    "q102_hybrid_rrf", "q103_seasonal_anomalies", "q116_global_quantiles",
    "q131_dsir_weights", "q138_compaction_plan", "q166_mutual_nn",
    "q169_partition_plan", "q171_label_noise", "q184_km_survival",
    "q189_uplift_deciles", "q194_isotonic", "q196_rank_sum",
    "q197_log_rank", "q198_cusum")

  test("no query outside the audited list plans an empty-key window, " +
    "and every audited window's input is dimension-sized") {
    val found = scala.collection.mutable.Map.empty[String, Seq[LWindow]]
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val wins = fn(spark, dir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      if (wins.nonEmpty) found(name) = wins
      spark.catalog.clearCache()
    }
    assert(found.keySet == Audited,
      s"membership drift — new global windows: " +
        s"${(found.keySet -- Audited).toSeq.sorted}; " +
        s"stale audit entries: ${(Audited -- found.keySet).toSeq.sorted}")
    found.toSeq.sortBy(_._1).foreach { case (name, wins) =>
      wins.zipWithIndex.foreach { case (w, i) =>
        val n = spark.sessionState.executePlan(w.child).toRdd.count()
        assert(n <= Bound,
          s"$name window #$i: empty-key window sees $n input rows " +
            s"(> $Bound) — corpus-sized data is flowing into a " +
            "single-partition sort")
      }
      spark.catalog.clearCache()
    }
  }
}
