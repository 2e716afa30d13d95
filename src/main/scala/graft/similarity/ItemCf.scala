package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Item-item collaborative filtering over baskets — cosine similarity
  * between items on their binary basket-membership vectors
  * [Sarwar, Karypis, Konstan, Riedl, "Item-based collaborative
  * filtering recommendation algorithms", WWW 2001]: for items a, b
  * co-occurring in `co` baskets with basket-degrees `da`, `db`,
  * cos(a, b) = co / √(da·db), and each item's top-k neighbors are its
  * "customers also bought" shelf. The same primitive seeds
  * related-document panels and retrieval-augmentation pools when the
  * "basket" is a context window.
  *
  * Reference tie: the reference's co-review projection (friends who
  * review the same business) is this graph with businesses as baskets;
  * the reference stops at edge counts, CF normalizes them into a
  * ranked recommender.
  *
  * 100 TB shape: the only corpus-scale exchanges are the
  * basket-projection distinct and the pair aggregate. The per-basket
  * self-join is quadratic in BASKET SIZE, so baskets above `maxBasket`
  * are dropped (the q69/q161 df-cap discipline — a megabasket is
  * navigation noise for CF anyway, and the cap is what bounds the
  * join's candidate volume at any corpus size; the dropped-basket
  * count is reported loudly via [[cappedStats]] rather than silently).
  * Degrees are computed AFTER the cap so the cosine's norm matches the
  * pair counts exactly. Top-k is a per-item window over the co-pair
  * table, never the item×item square.
  */
object ItemCf {

  /** (item_id, rnk, neighbor_id, cosine, co) — top-`k` neighbors per
    * item by capped-basket cosine, ties pinned (round(cos, 6) DESC,
    * neighbor_id) so the trajectory replays in any engine.
    *
    * @param baskets (basket_id, item_id), duplicates tolerated.
    */
  def topNeighbors(baskets: DataFrame, maxBasket: Int, k: Int): DataFrame = {
    val b = baskets.select(col("basket_id"), col("item_id")).distinct()
    // degrees attach via an item-partitioned WINDOW on the capped
    // projection and ride the self-join (constant within each (a, b)
    // group, so max() recovers them) — joining the pair table back to a
    // degree table would be two more corpus-scale exchanges, and
    // broadcasting degrees assumes an item dimension that fits, which a
    // 100 TB catalog need not
    // NOTE (measured, not assumed): the plan re-derives this projection
    // four times (self-join legs × symmetric-union branches — four scans,
    // eight window sorts), and materializing it + the pair table with
    // DISK_ONLY localCheckpoints was TRIED and measured SLOWER at every
    // scale (sf0.1 2.93→3.15, sf10 113.3→118.7 s): the pair table is the
    // dominant cost and checkpoint-writing ~300M rows exceeds what the
    // re-derivation saves, while the scan+window legs pipeline cheaply.
    // Recomputation is the right trade here.
    val sized = b
      .withColumn("bn", count(lit(1)).over(Window.partitionBy(col("basket_id"))))
      .filter(col("bn") <= maxBasket)
      .select(col("basket_id"), col("item_id"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("item_id"))))
    val co = sized.as("x").join(sized.as("y"),
        col("x.basket_id") === col("y.basket_id")
          && col("x.item_id") < col("y.item_id"))
      .groupBy(col("x.item_id").as("a"), col("y.item_id").as("b"))
      .agg(count(lit(1)).as("co"), max(col("x.deg")).as("da"),
        max(col("y.deg")).as("db"))
      .withColumn("cos", col("co") / sqrt(col("da") * col("db")))
    val sym = co.select(col("a").as("item_id"), col("b").as("neighbor_id"),
        col("co"), col("cos"))
      .unionByName(co.select(col("b").as("item_id"), col("a").as("neighbor_id"),
        col("co"), col("cos")))
    // per-item shelf via the engine's own TopKLargest aggregate (the q66
    // shape): the pair table is ~2·|co| rows — a rank window would sort
    // ALL of it per item, while the aggregate's exchange carries ≤ k rows
    // per (item, mapper). Struct order (round-6 cos, −neighbor) = the
    // pinned tie rule; the trailing payload fields never decide (neighbor
    // is unique within an item's candidates).
    graft.functions.GraftFunctions.register(sym.sparkSession)
    sym.groupBy(col("item_id"))
      .agg(graft.functions.GraftFunctions.topk(
        struct(round(col("cos"), 6).as("key"),
          (-col("neighbor_id")).as("neg_id"),
          col("cos").as("cos"), col("co").as("co")), k).as("top"))
      .select(col("item_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("item_id"), (col("i") + 1).cast("long").as("rnk"),
        (-col("t.neg_id")).as("neighbor_id"),
        round(col("t.cos"), 4).as("cosine"), col("t.co").as("co"))
  }

  /** Cap visibility: (n_baskets, n_dropped) for a cap — how much signal
    * the quadratic bound discards, for the layout/audit path.
    */
  def cappedStats(baskets: DataFrame, maxBasket: Int): DataFrame =
    baskets.select(col("basket_id"), col("item_id")).distinct()
      .groupBy(col("basket_id")).agg(count(lit(1)).as("bn"))
      .agg(count(lit(1)).as("n_baskets"),
        sum(when(col("bn") > maxBasket, 1L).otherwise(0L)).as("n_dropped"))

  /** q170: top-5 co-purchase neighbors per part (orders as baskets). */
  def itemCfQuery(s: SparkSession, dir: String): DataFrame =
    topNeighbors(
      Tables.lineitem(s, dir).select(col("l_orderkey").as("basket_id"),
        col("l_partkey").as("item_id")),
      maxBasket = 16, k = 5)
      .orderBy(col("item_id"), col("rnk"))
}
