package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Label-noise screening by k-NN disagreement — the data-curation twin
  * of q148's k-NN classifier: instead of predicting a holdout's labels,
  * every labeled vector is scored against its own neighborhood, and a
  * vector whose neighbors MAJORITY-disagree with its stored label is
  * flagged as probable annotation noise. This is the confident-
  * learning-style screen [Northcutt, Jiang, Chuang, "Confident
  * learning: estimating uncertainty in dataset labels", JAIR 70 (2021)
  * traces the family back to exactly this neighborhood-disagreement
  * heuristic] a labeled training corpus runs before fine-tuning:
  * mislabeled examples cost more than missing ones.
  *
  * Scale design: the q166 mutual-NN candidate shape — neighbors come
  * from the nprobe=1 IVF co-assignment, so candidates are within-list
  * pairs on the `centroid_id`-keyed exchange (never n²), per-list work
  * is density-bounded by nlist = max(16, ⌈√n⌉) (the q148 balance
  * point: assignment n·nlist and pair volume n²/nlist both n^1.5), and
  * the per-vector top-k collapses map-side through the TopK aggregate
  * — no window ever sorts the full candidate table. The disagreement
  * verdict is integer arithmetic (2·disagree > n_nbrs), so the DuckDB
  * oracle replays codebook, lists, top-k, and verdict exactly.
  *
  * Vectors alone in their list have no candidates; they surface with
  * n_nbrs = 0 and flagged = false (no evidence either way) rather than
  * silently dropping — at 100 TB a singleton list is a codebook-skew
  * symptom worth seeing in the output.
  *
  * Honest data note (the q148 caveat applies): the driver testdata's
  * labels carry no geometric signal, so most vectors read as
  * "disagreeing" BY THE DATA; LabelNoiseSpec proves the screen's
  * precision on planted clustered labels with injected flips, where
  * the flipped vectors must dominate the flagged set.
  */
object LabelNoise {

  val K = 5

  /** Per-vector disagreement verdicts over (vec_id, embedding, label):
    * (vec_id, label, n_nbrs, n_disagree, flagged). `flagged` iff a
    * strict majority of the ≤ k within-list neighbors carries a
    * different label. Neighbor ranking pins (round(cos, 6) DESC,
    * neighbor_id) — the q26 tie discipline.
    */
  def knnDisagreement(embeddings: DataFrame, k: Int = K,
                      nlist: Int = -1): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding"), col("label"))
    // data-derived list count by default (the documented 1-row scalar
    // pattern — ivfCentroids needs a literal limit)
    val nl =
      if (nlist > 0) nlist
      else math.max(16,
        math.ceil(math.sqrt(e.count().toDouble)).toInt)
    val asg = Similarity.ivfAssign(
        e.select(col("vec_id"), col("embedding")),
        Similarity.ivfCentroids(e.select(col("vec_id"), col("embedding")),
          nl),
        nprobe = 1)
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
    // within-list candidate pairs on the centroid_id-keyed exchange;
    // each vector lives in exactly one list so pairs are distinct
    val cand = asg.as("a").join(asg.as("b"),
        col("a.centroid_id") === col("b.centroid_id")
          && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"),
        struct(
          round(GraftFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
            .as("c"),
          (-col("b.vec_id")).as("nid"),
          col("b.label").as("nlabel")).as("cand"))
    val verdicts = cand.groupBy(col("qid"))
      .agg(GraftFunctions.topk(col("cand"), k).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .join(e.select(col("vec_id").as("qid"), col("label")), Seq("qid"))
      .groupBy(col("qid"), col("label"))
      .agg(count(lit(1)).as("n_nbrs"),
        sum(when(col("t.nlabel") =!= col("label"), 1L).otherwise(0L))
          .as("n_disagree"))
    e.select(col("vec_id"), col("label"))
      .join(verdicts.select(col("qid").as("vec_id"), col("n_nbrs"),
        col("n_disagree")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        coalesce(col("n_disagree"), lit(0L)).as("n_disagree"))
      .withColumn("flagged", col("n_disagree") * 2 > col("n_nbrs"))
  }

  /** q171: the embeddings table screened at k = 5, nlist = √n. */
  def labelNoiseQuery(s: SparkSession, dir: String): DataFrame =
    knnDisagreement(Tables.embeddings(s, dir))
      .orderBy(col("vec_id"))
}
