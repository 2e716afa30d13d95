package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Executable end-to-end example of the TRAINING-DATA side of the engine:
  * one corpus walked through the curation stages a pretraining pipeline
  * actually runs, each stage an operator the driver gates elsewhere —
  *
  *   quality rules → exact dedup → near-dup clusters → semantic dedup →
  *   DSIR selection → mixture plan → fertility check → packing
  *
  * Run: `sbt "runMain graft.examples.CorpusDemo [sfDir]"` (defaults to
  * the sf0.001 testdata).
  */
object CorpusDemo {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir)
    println(s"CORPUS: ${docs.count()} docs")

    // 1. cheap per-row quality rules kill gibberish before anything costly
    val gated = graft.text.QualityRules.qualityFlags(docs)
      .filter(col("pass")).select("doc_id")
      .join(docs, "doc_id")
    println(s"1 quality gate     -> ${gated.count()} docs pass")

    // 2. exact dedup on the 8-byte text hash
    val exact = graft.dedup.Dedup.exactKeepRows(gated)
    println(s"2 exact dedup      -> ${exact.count()} distinct texts")

    // 3. near-dup clusters (MinHash bands -> connected components)
    val clusters = graft.dedup.Dedup.clustersQuery(spark, dir)
    val nClusters = clusters.select("cluster_id").distinct().count()
    println(s"3 near-dup         -> ${clusters.count()} docs in $nClusters clusters")

    // 4. semantic dedup over the embedding space (corpus-scaled nlist)
    val sem = graft.dedup.SemDedup.semDedupQuery(spark, dir)
    println(s"4 SemDeDup         -> ${sem.filter(col("kept")).count()} kept")

    // 5. DSIR: keep the raw-pool docs that look like the English target
    val dsir = graft.text.Dsir.dsirWeightsQuery(spark, dir)
    println(s"5 DSIR selection   -> ${dsir.filter(col("selected")).count()} selected")

    // 6. mixture plan across sources for a fixed token budget
    println("6 mixture plan (head):")
    graft.pipeline.Mixture.mixturePlanQuery(spark, dir).show(5, truncate = false)

    // 7. tokenizer fertility per language under corpus-trained merges
    println("7 BPE fertility per language:")
    graft.text.Bpe.bpeFertilityQuery(spark, dir).show(10, truncate = false)

    // 8. pack the surviving docs into fixed-size context bins
    val packed = graft.operators.Packing.packingQuery(spark, dir)
    println(s"8 packing          -> ${packed.count()} bins")

    println("corpus pipeline complete")
    spark.stop()
  }
}
