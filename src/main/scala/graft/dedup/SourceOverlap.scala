package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-source contamination matrix: for every pair of corpus sources,
  * the number of distinct word k-shingles they share and the containment
  * coefficient n_common / min(n_a, n_b). This is the corpus-level view of
  * the q53 benchmark-decontamination check — instead of asking "does MY
  * eval set leak into the corpus", it asks "which ingest feeds duplicate
  * each other", the first diagnostic before choosing dedup keys and
  * mixture weights (cf. Dodge et al., "Documenting Large Webtext Corpora",
  * arXiv:2104.08758 §5, which measures exactly this between C4 shards and
  * eval sets).
  *
  * 100 TB shape: `distinct (source, shingle)` bounds the per-shingle
  * fanout to the number of SOURCES (dozens) — unlike document-pair mining
  * there is no quadratic bucket to cap, so no df guard is needed: the
  * self-join on the shingle key emits at most |sources|² rows per shingle.
  * Both join sides shuffle once, keyed on the shingle; the pair rollup
  * partial-aggregates map-side onto a dimension-sized (|sources|²) result.
  * The containment ratio compares on round(·, 4) like every ratio gate.
  */
object SourceOverlap {

  def sourceOverlap(docs: DataFrame, k: Int): DataFrame = {
    val toks = graft.text.TextOps.tokens(col("text"))
    val sh = docs
      .select(col("source"), toks.as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("source"),
        explode(graft.text.TextOps.tokenWindows(col("toks"), k)).as("shingle"))
      .distinct()
      // consumed three times (both self-join legs + the size rollup):
      // checkpoint so the tokenize→shingle→distinct corpus pass runs once
      .localCheckpoint()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n_sh").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_common"),
        round(col("n_common").cast("double") / least(col("n_a"), col("n_b")), 4)
          .as("containment"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def sourceOverlapQuery(s: SparkSession, dir: String): DataFrame =
    sourceOverlap(Tables.documents(s, dir), k = 5)
}
