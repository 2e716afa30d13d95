package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** IVF-PQ — the composition billion-vector ANN indexes actually ship
  * (FAISS IVFPQ; Jégou et al. TPAMI'11 §IV.B): the q37 coarse
  * quantizer routes every vector to an inverted list, and within lists
  * vectors are stored as PQ codes of their RESIDUAL x − c(list) (the
  * residual is what's left after the coarse centroid explains the
  * vector, so the same K codewords spend their resolution on a much
  * smaller ball than raw-vector PQ). Search probes the query's
  * nprobe nearest lists; per probed list the query's own residual
  * builds an M×K ADC distance table, and every candidate's distance is
  * M integer table lookups summed.
  *
  * This composes three verified pieces, re-verified end-to-end as one
  * oracle: the q37 coarse Lloyd chain (cosine argmax, round(mean,6)),
  * the q206 PQ Lloyd chain (argmin-L2 on residual subspaces, one
  * codebook shared across lists — the FAISS default), and the q207
  * integer micro-unit ADC (order-free sums, zero rounded-quotient
  * exposure).
  *
  * 100 TB shape: everything is the q37/q207 shapes glued — broadcast
  * centroid/codebook tables, map-side-combined argmax/argmin, the code
  * table at ~6 bytes/vector (list id + M 4-bit codes); the candidate
  * set is the probed lists' membership (≈ nprobe/nlist of the corpus),
  * not the corpus, and the float vectors are read exactly once.
  */
object IvfPq {

  val NList = 16       // coarse lists (the q37 convention)
  val NProbe = 4       // probed lists per query (the q37 convention)
  val NQueries = 8
  val TopK = 5

  /** The coarse table re-projected under fresh column ids — ivfAssign's
    * output already carries `coarse` lineage, so re-joining the same
    * frame would be an ambiguous self-join.
    */
  private def listTable(coarse: DataFrame): DataFrame =
    coarse.select(col("centroid_id").as("list_id"),
      col("centroid").as("list_centroid"))

  /** (vec_id, list_id, res): coarse assignment + double residuals. */
  def residuals(emb: DataFrame, coarse: DataFrame): DataFrame = {
    val assigned = Similarity.ivfAssign(emb, coarse, nprobe = 1)
    assigned
      .join(broadcast(listTable(coarse)),
        col("centroid_id") === col("list_id"))
      .select(col("vec_id"), col("list_id"),
        zip_with(col("embedding"), col("list_centroid"),
          (x, c) => x.cast("double") - c.cast("double")).as("res"))
  }

  /** The trained index state: coarse centroids, the shared residual-PQ
    * codebook, and the code table (list id + M codes per vector) — the
    * ~6 bytes/vector object a 100 TB deployment persists; everything
    * the search side needs, with the float vectors already forgotten.
    */
  case class Index(coarse: DataFrame, codebook: DataFrame,
                   codes: DataFrame)

  /** Train the IVF-PQ index: coarse Lloyd → residual encode → shared
    * PQ codebook on residuals → code table. Checkpointed so multiple
    * searches (q208's one shot, q212's nprobe sweep) share one build.
    */
  def buildIndex(emb: DataFrame): Index = {
    val coarse = Similarity.kmeansCentroids(emb, NList, iters = 2)
      .localCheckpoint()
    val res = residuals(emb, coarse).localCheckpoint()
    // PQ on residuals: the q206 chain over (vec_id, embedding = res)
    val resEmb = res.select(col("vec_id"), col("res").as("embedding"))
    val subs = ProductQuantization.subspaces(resEmb).localCheckpoint()
    val codebook = ProductQuantization.trainCodebook(resEmb, subs)
      .localCheckpoint()
    val codes = ProductQuantization.assign(subs, codebook)
      .select(col("s"), col("vec_id"), col("cid"))
      .join(res.select(col("vec_id"), col("list_id")), "vec_id")
      .localCheckpoint()
    Index(coarse, codebook, codes)
  }

  private val indexMemo = new graft.tools.CorpusMemo[Index](
    idx => Seq(idx.coarse, idx.codebook, idx.codes))

  /** The trained [[Index]], memoized per (session, dir) — the
    * [[ProductQuantization.fullTrained]] discipline one level up: q208
    * (the one-shot search) and q212 (the nprobe sweep) consume the
    * IDENTICAL index, and a production deployment builds it once and
    * serves every query batch from it. The build is a pure
    * deterministic function of the corpus (hash-ordered inits,
    * round(mean, 6) chains), so memo-vs-rebuild is bit-identical and
    * the oracles replay it unchanged. Single-entry, fingerprint-keyed,
    * evict-unpersists ([[graft.tools.CorpusMemo]]).
    */
  def sharedIndex(s: SparkSession, dir: String): Index =
    indexMemo.get(s, dir) { buildIndex(Tables.embeddings(s, dir)) }

  /** q208: IVF-PQ top-k. Coarse train → residual encode → PQ train on
    * residuals (one shared codebook) → per-(query, probed-list) ADC
    * tables → integer distance sums over probed candidates only.
    */
  def ivfPqTopKQuery(s: SparkSession, dir: String): DataFrame =
    searchTopK(Tables.embeddings(s, dir), sharedIndex(s, dir), NProbe)

  /** The IVF-PQ pipeline over any (vec_id, embedding, …) table. */
  def ivfPqTopK(emb: DataFrame): DataFrame =
    searchTopK(emb, buildIndex(emb), NProbe)

  /** The search side over a trained [[Index]]: probe the query's
    * `nprobe` nearest lists, build per-(query, probed-list) residual
    * ADC tables, integer-sum over probed candidates, rank.
    */
  def searchTopK(emb: DataFrame, idx: Index, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro"), col("vec_id"))
    adcScores(emb, idx, nprobe)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), col("adist_micro"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Stage 1 of both search modes: every probed candidate's ADC
    * distance per query — (query_id, vec_id, adist_micro).
    */
  private def adcScores(emb: DataFrame, idx: Index, nprobe: Int): DataFrame =
    adcScoresRanked(emb, idx, nprobe)
      .select(col("query_id"), col("vec_id"), col("adist_micro"))

  /** [[adcScores]] with each candidate's PROBE RANK kept (the rank of
    * its list among the query's nprobe nearest — constant per
    * candidate, since a vector lives in exactly one list). Probe sets
    * nest across nprobe, so one pass at the LARGEST nprobe serves every
    * smaller leg as a `probe_rnk <= n'` filter — integer ADC sums are
    * order-free, so the filtered aggregate is bit-identical to an
    * independent run at n'.
    */
  private def adcScoresRanked(emb: DataFrame, idx: Index,
      nprobe: Int): DataFrame = {
    val coarse = idx.coarse
    val codebook = idx.codebook
    val codes = idx.codes

    // query-side: nprobe nearest lists by the same coarse cosine rule,
    // then the query's residual PER PROBED LIST and its ADC table
    val probes = Similarity
      .ivfProbesRanked(emb.filter(col("vec_id") < NQueries), coarse, nprobe)
      .select(col("vec_id").as("query_id"), col("embedding"),
        col("centroid_id").as("probe_id"), col("c_rnk").as("probe_rnk"))
    val qres = probes
      .join(broadcast(listTable(coarse)), col("probe_id") === col("list_id"))
      .select(col("query_id"), col("list_id"), col("probe_rnk"),
        zip_with(col("embedding"), col("list_centroid"),
          (x, c) => x.cast("double") - c.cast("double")).as("res"))
    val qsubs = qres.select(col("query_id"), col("list_id"), col("probe_rnk"),
        explode(sequence(lit(0), lit(ProductQuantization.M - 1))).as("s"),
        col("res"))
      .select(col("query_id"), col("list_id"), col("probe_rnk"), col("s"),
        slice(col("res"),
          col("s") * (size(col("res")) / ProductQuantization.M) + 1,
          size(col("res")) / ProductQuantization.M).as("sv"))
    val dt = qsubs.join(broadcast(codebook), "s")
      .select(col("query_id"), col("list_id"), col("probe_rnk"), col("s"),
        col("cid"),
        round(aggregate(zip_with(col("sv"), col("c"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v) * 1e6, 0).cast("long").as("du"))

    // ADC over probed candidates only: join on (list, s, cid)
    codes
      .join(broadcast(dt),
        codes("list_id") === dt("list_id") && codes("s") === dt("s")
          && codes("cid") === dt("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("du")).as("adist_micro"), count(lit(1)).as("n_s"),
        min(col("probe_rnk")).as("probe_rnk")) // constant per group
      .filter(col("n_s") === ProductQuantization.M)
      .select(col("query_id"), col("vec_id"), col("probe_rnk"),
        col("adist_micro"))
  }

  /** Shortlist size of the refined search — 3·k, the standard small
    * multiple (Jégou et al. TPAMI'11 §V verify up to R = 2k–10k; the
    * re-rank cost is R float distances per query, so R is cheap to
    * raise when the q212 readout says the recall gap warrants it).
    */
  val ShortlistR: Int = 3 * TopK

  /** TWO-STAGE search (ADC shortlist → exact re-rank) — the production
    * IVFPQ composition (FAISS refine / IndexRefineFlat; Jégou §V.A):
    * stage 1 ranks probed candidates by quantized ADC distance and
    * keeps the top `shortlistR` per query; stage 2 re-scores ONLY the
    * shortlist against the full float vectors and returns the exact-L2
    * top-[[TopK]] of it. Buys back the quantization error at the rank
    * boundary for R·|Q| exact distances — the corpus vectors are
    * touched for the shortlist only, via a vec_id-keyed join, so the
    * scan stays candidate-sized at any corpus scale.
    *
    * Refined recall dominates ADC recall BY CONSTRUCTION: the ADC
    * top-k is contained in the shortlist, and any true neighbor in the
    * shortlist has < k exact-closer vectors corpus-wide (it is in the
    * exact top-k), hence < k within the shortlist — the re-rank cannot
    * push it out. IvfPqSpec pins the dominance at every nprobe.
    */
  def searchRefined(emb: DataFrame, idx: Index, nprobe: Int,
      shortlistR: Int = ShortlistR): DataFrame =
    rerankShortlist(
      rankedAdc(emb, idx, nprobe, shortlistR)
        .select(col("query_id"), col("vec_id")),
      emb)

  /** ADC scores ranked per query, kept to the top `keep` — the shared
    * stage the ADC top-k (prefix ≤ [[TopK]]) and the refined shortlist
    * are both read from.
    */
  private def rankedAdc(emb: DataFrame, idx: Index, nprobe: Int,
      keep: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wa = Window.partitionBy(col("query_id"))
      .orderBy(col("adist_micro"), col("vec_id"))
    adcScores(emb, idx, nprobe)
      .withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= keep)
  }

  /** Stage 2: exact-L2 re-rank of a (query_id, vec_id) shortlist
    * against the full float vectors — vec_id-keyed candidate join,
    * broadcast query rows, top-[[TopK]] of the shortlist.
    */
  private def rerankShortlist(shortlist: DataFrame,
      emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("dv"))
    val we = Window.partitionBy(col("query_id"))
      .orderBy(col("dist_micro"), col("vec_id"))
    shortlist
      .join(d, "vec_id")          // candidate floats: vec_id-keyed
      .join(broadcast(q), "query_id") // |Q| rows
      .withColumn("dist_micro",
        round(aggregate(zip_with(col("qv"), col("dv"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v) * 1e6, 0).cast("long"))
      .withColumn("rnk", row_number().over(we).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), col("dist_micro"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The nprobe sweep of the q212 recall readout. */
  val RecallProbes: Seq[Int] = Seq(1, 2, 4, 8)

  /** q212: the recall@k-vs-nprobe curve — the one-page answer to "what
    * nprobe do I run". ONE index build, [[RecallProbes]] searches, each
    * intersected with the EXACT L2 top-k truth ([[exactTopK]] — the
    * brute force a tuning run affords over its query sample, never the
    * corpus pair set). ALL-INTEGER output per nprobe: rows returned,
    * truth hits, truth size — recall is n_hits/n_total at whatever
    * grain the reader wants, with zero rounded-quotient exposure.
    */
  def recallCurveQuery(s: SparkSession, dir: String): DataFrame =
    recallCurve(Tables.embeddings(s, dir), sharedIndex(s, dir))

  /** One-shot sweep for corpus-bearing specs. */
  def recallCurve(emb: DataFrame): DataFrame =
    recallCurve(emb, buildIndex(emb))

  def recallCurve(emb: DataFrame, idx: Index): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val truth = exactTopK(emb)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()
    // Probe sets NEST across nprobe, so the whole 1/2/4/8 sweep reads
    // ONE probe-ranked ADC pass at the largest nprobe: each leg is a
    // `probe_rnk <= np` filter + per-query re-rank over the (tiny)
    // candidate score table — bit-identical to an independent search at
    // np because the ADC sums are order-free integers and a candidate's
    // probe rank is constant. The previous cut ran the 4 ADC legs as 4
    // independent scoring subplans (ReuseExchange dedupes only the two
    // MODES' identical subtrees, never across nprobe values): one scan
    // of the code table instead of four, measured 5.0 → 2.2 s at sf0.1.
    val cand = adcScoresRanked(emb, idx, RecallProbes.max).localCheckpoint()
    def rankedAt(np: Int, keep: Int): DataFrame = {
      val wa = Window.partitionBy(col("query_id"))
        .orderBy(col("adist_micro"), col("vec_id"))
      cand.filter(col("probe_rnk") <= np)
        .withColumn("rnk", row_number().over(wa))
        .filter(col("rnk") <= keep)
    }
    val adcLegs = RecallProbes.map { np =>
      rankedAt(np, TopK).select(lit(np).as("nprobe"), col("query_id"),
        col("vec_id").as("neighbor_id"))
    }.reduce(_ unionByName _)
    // the four refined shortlists re-rank in ONE batched candidate join,
    // window-partitioned by (nprobe, query) — exact distances are per
    // (query, vec), so the batched re-rank is row-identical to per-leg
    // re-ranks
    val shortlists = RecallProbes.map { np =>
      rankedAt(np, ShortlistR).select(lit(np).as("nprobe"),
        col("query_id"), col("vec_id"))
    }.reduce(_ unionByName _)
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("dv"))
    val we = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("dist_micro"), col("vec_id"))
    val refLegs = shortlists
      .join(d, "vec_id")          // candidate floats: vec_id-keyed
      .join(broadcast(q), "query_id") // |Q| rows
      .withColumn("dist_micro",
        round(aggregate(zip_with(col("qv"), col("dv"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v) * 1e6, 0).cast("long"))
      .withColumn("rnk", row_number().over(we))
      .filter(col("rnk") <= TopK)
      .select(col("nprobe"), col("query_id"),
        col("vec_id").as("neighbor_id"))
    def counts(legs: DataFrame, retCol: String, hitCol: String): DataFrame = {
      val ret = legs.groupBy(col("nprobe")).agg(count(lit(1)).as(retCol))
      val hits = legs.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("nprobe")).agg(count(lit(1)).as(hitCol))
      ret.join(hits, Seq("nprobe"), "left")
        .select(col("nprobe"), col(retCol),
          coalesce(col(hitCol), lit(0L)).as(hitCol))
    }
    counts(adcLegs, "n_returned", "n_hits")
      .join(counts(refLegs, "n_returned_ref", "n_hits_ref"), Seq("nprobe"))
      .select(col("nprobe"), col("n_returned"), col("n_hits"),
        col("n_returned_ref"), col("n_hits_ref"),
        lit((NQueries * TopK).toLong).as("n_total"))
      .orderBy(col("nprobe"))
  }

  /** Exact L2 top-[[TopK]] over the full float vectors for the
    * [[NQueries]] query sample — micro-unit integer distances,
    * (dist_micro, vec_id) total order. |Q|·n broadcast scoring: the
    * queries are broadcast, the corpus streams once.
    */
  def exactTopK(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val d = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("dv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist_micro"), col("vec_id"))
    d.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dist_micro",
        round(aggregate(zip_with(col("qv"), col("dv"),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v) * 1e6, 0).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), col("dist_micro"))
  }
}
