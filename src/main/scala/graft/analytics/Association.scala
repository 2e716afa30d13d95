package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket association mining: support / confidence / lift for
  * item pairs that co-occur in the same basket — the classic
  * "bought X, also bought Y" rule base (and the item-item counterpart of
  * q85's user-level PMI).
  *
  * Scale shape: the pair generator is a basket-keyed self-join of the
  * DISTINCT (basket, item) table, so the shuffle key is the basket id
  * and the per-basket blow-up is C(|basket|, 2) — bounded by basket
  * size, which is a domain constant (an order has a handful of parts),
  * never by catalog size. Item marginals and the basket count are
  * dimension-sized broadcasts. Nothing is ever item × item.
  *
  * The min-co-occurrence cut (`minCount`) happens straight after the
  * pair count — singleton pairs dominate a sparse catalog (measured:
  * ~1.2M pairs at sf0.1, 3.6k with n ≥ 2) and carry no rule signal.
  */
object Association {

  /** @param baskets distinct (basket, item) rows
    * @param minCount emit only pairs co-occurring in ≥ minCount baskets
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minCount: Long): DataFrame = {
    // five consumers (both self-join sides, two marginal builds, the
    // basket count) — materialize the distinct basket table once, like
    // the shingle table in jaccardPairs (at warehouse scale: persist)
    val b = baskets.select(col(basketCol).as("o"), col(itemCol).as("p"))
      .distinct().cache()
    val nBaskets = b.agg(countDistinct(col("o")).as("n_baskets"))
    val itemCounts = b.groupBy(col("p")).agg(count(lit(1)).as("n_item"))
    b.as("a")
      .join(b.as("b2"), col("a.o") === col("b2.o") && col("a.p") < col("b2.p"))
      .groupBy(col("a.p").as("item_a"), col("b2.p").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .join(broadcast(itemCounts.select(col("p").as("item_a"),
        col("n_item").as("n_a"))), Seq("item_a"))
      .join(broadcast(itemCounts.select(col("p").as("item_b"),
        col("n_item").as("n_b"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab").cast("double")
          / col("n_baskets").cast("double"), 6).as("support"),
        round(col("n_ab").cast("double")
          / col("n_a").cast("double"), 6).as("conf_a_to_b"),
        round(col("n_ab").cast("double")
          / col("n_b").cast("double"), 6).as("conf_b_to_a"),
        round((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** q95: part pairs co-ordered at least twice, with rule strengths —
    * baskets are orders, items are parts.
    */
  def partRulesQuery(s: SparkSession, dir: String): DataFrame =
    pairRules(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minCount = 2L)
}
