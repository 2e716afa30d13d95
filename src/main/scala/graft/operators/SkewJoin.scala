package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * runtime skew-join split isn't available (e.g. the skew is in a
  * broadcast-ineligible dimension, or the join feeds an operator AQE can't
  * re-plan).
  *
  * Standard technique: the skewed (large) side gets a random salt in
  * [0, salts); the small side is exploded `salts`× so every (key, salt)
  * bucket finds its match. One hot key's rows now land on `salts`
  * partitions instead of one.
  *
  * At 100 TB: salts sized to the worst key's row count / target partition
  * size; salting cost is `salts`× duplication of the SMALL side only.
  * Prefer AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) when
  * the plan shape allows — this utility is for the residual cases and for
  * pre-partitioned writes where deterministic placement matters.
  */
object SkewJoin {

  /** Inner/left equi-join of `big ⋈ small ON key`, salted.
    *
    * The salt on the big side is `pmod(xxhash64(monotonically_increasing_id))`
    * — deterministic per run, uniform, and crucially NOT derived from the
    * join key (hashing the key would re-create the same hot partition).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit every unmatched small-side row `salts`
    // times (one per exploded salt) — only shapes where the small side's
    // unmatched rows are dropped are salting-safe
    require(Set("inner", "left", "leftouter", "leftsemi")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi joins, got '$joinType'")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already contain a _salt column")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** q60: supplier-nation revenue through the SALTED join — the oracle's
    * plain-SQL join proves salting is semantics-neutral (identical
    * aggregates), which is the whole contract: redistribute the hot key's
    * rows without changing a single matched pair. lineitem⋈supplier is
    * the natural demo (every supplier key is ~6000× hot at sf1).
    */
  def saltedRevenueQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(s, dir)
      .select(col("l_suppkey").as("suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val sup = graft.Tables.supplier(s, dir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    saltedJoin(li, sup, "suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(round(sum(col("rev")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_nationkey"))
  }

  /** Top-n hottest keys with counts — the sizing input for `salts` (run on
    * a sample at scale: `df.sample(0.01)`).
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
}
