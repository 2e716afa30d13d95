package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.QualityRules

/** The release funnel — the training-data pipeline's own audit trail:
  * ingested → quality-gated (q112's rule battery) → exact-deduplicated
  * (q24's min-id keeper, applied among the quality survivors) →
  * decontaminated (q53's benchmark containment screen) → released,
  * with document AND token counts at every stage. This is the "release
  * card" a data-governance review reads: every row a curation decision
  * with its cost in data, every count replayable. The capstone
  * COMPOSITION of the engine's curation operators — each stage is an
  * already-verified operator re-used, not re-implemented.
  *
  * Exactness: all counts are integers; the only doubles are the final
  * share-of-ingested ratios. The stage flags are computed per document
  * in ONE pipeline (quality flags, the passer-scoped keeper window,
  * the contamination anti-set), then a single 1-row conditional
  * aggregate rolls the funnel up — the stages never rescan the corpus.
  *
  * 100 TB shape: one documents scan feeds the flag pipeline; the
  * keeper window is text-partitioned (bounded by duplicate
  * multiplicity, the q24 discipline); contamination is the q53 blocked
  * inverted-index join (df-capped); the rollup is 1 row exploded to 4.
  */
object ReleaseFunnel {

  /** The per-document TEXT-CURATION FLAG table — (doc_id, n_tokens,
    * pass, keep, contaminated) over the non-benchmark corpus: the
    * quality battery, the passer-scoped exact keeper, and the q53
    * containment screen in one pipeline. This is the stage evidence
    * BOTH readouts consume — q200 rolls it up into the funnel, q214
    * joins it per document — so it computes once per corpus.
    */
  def curationFlags(docs: DataFrame): DataFrame = {
    val corpus = docs.filter(col("source") =!= "src0")
    val evalSet = docs.filter(col("source") === "src0")
    // stage flags, one corpus pipeline
    val flags = QualityRules.qualityFlags(corpus)
      .select(col("doc_id"), col("n_tokens"), col("pass"))
    val withText = corpus.select(col("doc_id"), col("text"))
      .join(flags, Seq("doc_id"))
    val byText = Window.partitionBy(col("text"))
    val kept = withText
      .withColumn("keeper",
        min(when(col("pass"), col("doc_id"))).over(byText))
      .withColumn("keep", col("pass") && col("doc_id") === col("keeper"))
    val contaminated = Dedup
      .containmentPairs(corpus, evalSet, k = 5, threshold = 0.5)
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    kept.join(contaminated, Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      .select(col("doc_id"), col("n_tokens"), col("pass"), col("keep"),
        col("contaminated"))
  }

  private val flagsMemo = graft.tools.CorpusMemo.ofDf

  /** [[curationFlags]] memoized per (session, dir) — the
    * [[graft.dedup.Dedup.clustersShared]] discipline on the text
    * curation evidence its two consumers share (q200's funnel, q214's
    * unified plan): one doc-sized flag row per document, a pure
    * deterministic function of the corpus, so sharing is row-identical
    * and both oracles replay unchanged.
    */
  def curationFlagsShared(s: SparkSession, dir: String): DataFrame =
    flagsMemo.get(s, dir) {
      curationFlags(Tables.documents(s, dir)).localCheckpoint()
    }

  /** 4 rows: stage, documents and tokens surviving, share of ingested. */
  def funnel(docs: DataFrame): DataFrame =
    funnelFromFlags(curationFlags(docs))

  /** The funnel roll-up over a prebuilt flag table. */
  def funnelFromFlags(flagged: DataFrame): DataFrame = {
    val one = flagged.agg(
      count(lit(1)).as("d1"), sum(col("n_tokens")).as("t1"),
      coalesce(sum(when(col("pass"), 1L)), lit(0L)).as("d2"),
      coalesce(sum(when(col("pass"), col("n_tokens"))), lit(0L)).as("t2"),
      coalesce(sum(when(col("keep"), 1L)), lit(0L)).as("d3"),
      coalesce(sum(when(col("keep"), col("n_tokens"))), lit(0L)).as("t3"),
      coalesce(sum(when(col("keep") && !col("contaminated"), 1L)), lit(0L))
        .as("d4"),
      coalesce(sum(when(col("keep") && !col("contaminated"),
        col("n_tokens"))), lit(0L)).as("t4"))
    one
      .select(explode(array(
        struct(lit(1L).as("stage_idx"), lit("ingested").as("stage"),
          col("d1").as("n_docs"), col("t1").as("n_tokens")),
        struct(lit(2L).as("stage_idx"), lit("quality_pass").as("stage"),
          col("d2").as("n_docs"), col("t2").as("n_tokens")),
        struct(lit(3L).as("stage_idx"), lit("exact_dedup").as("stage"),
          col("d3").as("n_docs"), col("t3").as("n_tokens")),
        struct(lit(4L).as("stage_idx"), lit("released").as("stage"),
          col("d4").as("n_docs"), col("t4").as("n_tokens"))))
        .as("s"), col("d1"))
      .select(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"),
        col("s.n_docs").as("n_docs"), col("s.n_tokens").as("n_tokens"),
        round(col("s.n_docs").cast("double") / col("d1").cast("double"), 6)
          .as("share_of_ingested"))
      .orderBy(col("stage_idx"))
  }

  /** q200: the release card of the documents corpus, benchmark = the
    * src0 slice (the q53 convention) — rolled up from the shared flag
    * view q214 also reads.
    */
  def funnelQuery(s: SparkSession, dir: String): DataFrame =
    funnelFromFlags(curationFlagsShared(s, dir))
}
