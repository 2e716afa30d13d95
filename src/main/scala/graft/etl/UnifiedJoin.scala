package graft.etl

import org.apache.spark.sql.DataFrame

/** Schema-drift-tolerant 3-way left join into one wide "unified analytics"
  * table (reference semantics: `join/unified_data_analytics.py:23-47`).
  *
  * Column-name collisions are resolved *dynamically* from `df.columns`:
  *   - fact columns that also appear in dim1 (minus join keys) are renamed
  *     `{factPrefix}_{col}` in the fact;
  *   - dim2 columns that appear in fact ∪ dim1 (minus join keys) are renamed
  *     `{dim2Prefix}_{col}` in dim2;
  * then `fact ⟕ dim1 ON key1` and `⟕ dim2 ON key2`.
  *
  * Unlike the reference (which iterates Python sets, so output column names
  * are run-order-dependent), overlaps are sorted before folding — output
  * schema is deterministic (SURVEY.md §7.4 "schema drift").
  *
  * Scale note: this is driver-side metadata work only (no plan surgery); the
  * joins themselves are plain equi-joins, so Catalyst/AQE pick broadcast-hash
  * for dim-sized inputs and sort-merge otherwise.
  */
object UnifiedJoin {

  /** Rename every column of `df` in `overlap` to `{prefix}_{col}`. */
  def prefixRename(df: DataFrame, overlap: Set[String], prefix: String): DataFrame =
    overlap.toSeq.sorted.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${prefix}_$c"))

  /** The reference's overlap rule, generalized. Join keys are excluded from
    * renaming (they must keep their shared name for the USING-style join).
    */
  def unify(
      fact: DataFrame,
      dim1: DataFrame,
      dim2: DataFrame,
      key1: String,
      key2: String,
      factPrefix: String = "review",
      dim2Prefix: String = "business"): DataFrame = {
    val keys = Set(key1, key2)
    val factCols = fact.columns.toSet
    val dim1Cols = dim1.columns.toSet
    val overlapFactDim1 = (factCols & dim1Cols) -- keys
    val overlapDim2     = ((factCols | dim1Cols) & dim2.columns.toSet) -- keys
    val f  = prefixRename(fact, overlapFactDim1, factPrefix)
    // If BOTH fact and dim1 carry key2, the first join would emit two key2
    // columns and the second join's USING-resolution would be ambiguous.
    // The fact side's key2 drives the dim2 lookup (review.business_id in the
    // reference); dim1's copy is prefix-renamed out of the way.
    val d1 =
      if (factCols.contains(key2) && dim1Cols.contains(key2))
        dim1.withColumnRenamed(key2, s"${dim2Prefix}_ref_$key2")
      else dim1
    val d2 = prefixRename(dim2, overlapDim2, dim2Prefix)
    f.join(d1, Seq(key1), "left").join(d2, Seq(key2), "left")
  }
}
