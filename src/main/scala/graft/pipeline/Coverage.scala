package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Greedy maximum-coverage document selection — the submodular
  * data-subset primitive [Nemhauser–Wolsey–Fisher 1978: greedy is a
  * (1−1/e)-approximation for monotone submodular maximization; the
  * facility-location/coverage objective is the standard relaxation used
  * for training-data subset selection]: pick K documents one at a time,
  * each maximizing the number of NOT-YET-COVERED vocabulary tokens it
  * contributes. The selected prefix is the smallest set of documents
  * that (greedily) spans the corpus vocabulary — the "maximally diverse
  * seed set" a curation pipeline wants for annotation budgets, prompt
  * libraries, or eval-set seeding, and the complement of what DSIR-style
  * importance sampling (q131) gives you (coverage, not typicality).
  *
  * Scale design: greedy selection is inherently sequential in K, but
  * each round is ONE distributed pass — `tokens ⟕̸ covered` (anti-join
  * against the covered set, which is vocabulary-bounded and broadcasts)
  * → per-doc count (the token-grain exchange) → a 1-row argmax pull
  * (the legitimate scalar pattern: K rounds = K driver actions, the
  * Lloyd/Borůvka discipline). The distinct token table builds once and
  * localCheckpoints; K stays small because the marginal-gain curve is
  * concave — past the elbow you switch to sampling. Ties break
  * (gain DESC, doc_id ASC), making the whole trajectory deterministic —
  * which is what lets the DuckDB oracle unroll the same K rounds and
  * the driver hash-compare the result.
  */
object Coverage {

  val K = 5

  /** The K greedy picks over `docs` (`doc_id`, `text`): one row per
    * round — (rank, doc_id, gain, covered_total), where gain is the
    * pick's marginal new-token count and covered_total the running
    * distinct-coverage after it. Stops early (< K rows) once no document
    * adds a new token.
    */
  def greedyCover(docs: DataFrame, k: Int = K): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val toks = docs
      .select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("token"))
      .distinct()
      .localCheckpoint(eager = true, storageLevel = ser)
    var covered = toks.select(col("token")).limit(0)
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var coveredTotal = 0L
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val marg = toks.join(broadcast(covered), Seq("token"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
        .filter(col("gain") > 0L)
        .orderBy(col("gain").desc, col("doc_id")).limit(1)
        .collect()
      if (marg.isEmpty) exhausted = true
      else {
        val pick = marg(0).getAs[Long]("doc_id")
        val gain = marg(0).getAs[Long]("gain")
        coveredTotal += gain
        picks += ((round, pick, gain, coveredTotal))
        covered = covered
          .unionByName(toks.filter(col("doc_id") === pick).select(col("token")))
          .localCheckpoint(eager = true, storageLevel = ser)
        round += 1
      }
    }
    graft.operators.PlanWalk.freeCheckpoint(toks)
    picks.toSeq.toDF("rank", "doc_id", "gain", "covered_total")
      .select(col("rank").cast("long").as("rank"), col("doc_id"),
        col("gain"), col("covered_total"))
  }

  /** q162: the K=5 greedy coverage picks over the documents corpus. */
  def greedyCoverQuery(s: SparkSession, dir: String): DataFrame =
    greedyCover(Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .orderBy(col("rank"))
}
