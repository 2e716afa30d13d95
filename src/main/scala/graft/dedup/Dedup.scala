package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextOps

/** Deduplication operators for the training-data pipeline posture:
  * exact (hash-groupBy), word-shingle Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): every variant avoids the O(n²) all-pairs join —
  * candidates are generated through an inverted index (shared shingle),
  * LSH band buckets, or SimHash chunk buckets, so the shuffle carries
  * (bucket-key, doc) pairs and only bucket-local pairs are materialized.
  * Skewed buckets (a shingle shared by very many docs) are the known hot
  * spot; `maxBucket` caps them (standard LSH practice — a bucket that large
  * is a stop-shingle, not a near-dup signal).
  *
  * Caching contract: the pair-mining operators (`jaccardPairs`,
  * `minhashLshPairs`, `simhashPairs`) `cache()` an intermediate that is
  * consumed from several branches of the returned (lazy) plan, so they
  * cannot unpersist it themselves. Long-lived sessions should
  * `spark.catalog.clearCache()` after materializing results — Verify and
  * Bench do exactly that per query.
  */
object Dedup {

  /** shiftright/shiftleft with a *column* shift amount (the Scala
    * `functions.shiftright` overload only takes a literal Int).
    */
  private def shr(x: Column, n: Column): Column = call_function("shiftright", x, n)
  private def shl(x: Column, n: Column): Column = call_function("shiftleft", x, n)

  /** Exact dedup by content: one representative (min id) per distinct text.
    * groupBy (not `dropDuplicates`) so the representative is deterministic.
    *
    * Shuffle-key layout (100 TB): the explicit `repartition(xxhash64(text))`
    * makes the exchange partition on an 8-BYTE key — never on the multi-KB
    * document itself. The grouping key stays `(h, text)`, so semantics are
    * exact (a 2⁻⁶⁴ hash collision costs one extra group in a bucket, never a
    * wrong merge), and Catalyst adds no second exchange: HashPartitioning(h)
    * already clusters every (h, text) group. When byte-exactness isn't
    * required at all, [[exactByHash]] drops the text from the key entirely.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), xxhash64(col("text")).as("__h"))
      .repartition(col("__h"))
      .groupBy(col("__h"), col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  def exactQuery(s: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(s, dir))

  /** Keep-rows variant of [[exact]]: returns the representative rows
    * themselves (all columns), dropping every non-min duplicate. Same
    * shuffle-key layout as [[exact]] — one exchange on the 8-byte
    * xxhash64, window partitioned by (hash, text) so the sort comparator
    * touches the full text only on hash collisions. Used by the curation
    * pipeline, where the kept row's payload columns must survive.
    */
  def exactKeepRows(docs: DataFrame): DataFrame = {
    val byText = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h"), col("text"))
    docs
      .withColumn("__h", xxhash64(col("text")))
      .repartition(col("__h"))
      .withColumn("__keep", min(col("doc_id")).over(byText))
      .filter(col("doc_id") === col("__keep"))
      .drop("__keep", "__h")
  }

  /** Same semantics as [[exact]], but text is dropped from the key
    * entirely — 8-byte keys, 2⁻⁶⁴-ish collision risk per pair; acceptable
    * for dedup, not for the oracle.
    */
  def exactByHash(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Array of word k-shingle strings over a token-array column — shared
    * with the n-gram stats in [[graft.text.TextOps.tokenWindows]].
    */
  private def shingleArray(toks: Column, k: Int): Column =
    TextOps.tokenWindows(toks, k)

  /** Distinct word k-shingles per document: (doc_id, shingle) rows. */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(shingleArray(col("toks"), k)).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via a shingle inverted index:
    * docs sharing ≥1 shingle are candidates; J = |A∩B| / (|A|+|B|-|A∩B|).
    * The self-join is on the shingle (inverted index), never doc×doc.
    *
    * Scale guard: a shingle appearing in more than `maxDf` documents is a
    * stop-shingle — its inverted-index bucket alone would emit O(df²)
    * candidate pairs (one hot 5-gram shared by 10⁶ docs → 10¹² pairs), and
    * it carries no near-dup signal. Such shingles are dropped from the
    * universe BEFORE sizes and intersections are computed, so the result
    * is the exact Jaccard over the non-stop shingle sets — a predicate the
    * DuckDB oracle mirrors verbatim (same df window + filter). The df
    * window shuffles by shingle, the same key the self-join shuffles by.
    */
  /** [[shingles]] with the stop-shingle doc-frequency cap applied (df
    * computed over `docs`, shingles with df > maxDf dropped) — the shared
    * front end of [[jaccardPairs]] and [[containmentPairs]].
    */
  def cappedShingles(docs: DataFrame, k: Int, maxDf: Int): DataFrame = {
    val dfWin = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    shingles(docs, k)
      .withColumn("df", count(lit(1)).over(dfWin))
      .filter(col("df") <= maxDf)
      .drop("df")
  }

  def jaccardPairs(docs: DataFrame, k: Int, threshold: Double,
      maxDf: Int = 100): DataFrame = {
    val sh = cappedShingles(docs, k, maxDf).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(col("n_common").cast("double")
          / (col("n_a") + col("n_b") - col("n_common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val pairsMemo = graft.tools.CorpusMemo.ofDf
  private val clusterMemo = graft.tools.CorpusMemo.ofDf

  /** The canonical (k=5, J ≥ 0.2, maxDf=100) near-dup pair table,
    * memoized per (session, dir) — the materialized dedup view FOUR
    * queries project (q25 reads it, q40/q48/q111 cluster it): the
    * shingle scan + df cap + inverted-index self-join runs once per
    * corpus. A pure function of the corpus, so memo-vs-rebuild is
    * row-identical and every oracle replays it unchanged.
    */
  def jaccardPairsShared(s: SparkSession, dir: String): DataFrame =
    pairsMemo.get(s, dir) {
      jaccardPairs(Tables.documents(s, dir), k = 5,
        threshold = 0.2, maxDf = 100).localCheckpoint()
    }

  /** Connected components of [[jaccardPairsShared]], memoized — the
    * cluster table q40 (clusters), q48 (curation keep/drop) and q111
    * (leakage-safe split) all join; star-contraction CC is
    * deterministic (min-label), so sharing is row-identical.
    */
  def clustersShared(s: SparkSession, dir: String): DataFrame =
    clusterMemo.get(s, dir) {
      connectedComponents(jaccardPairsShared(s, dir)
        .select(col("id_a"), col("id_b"))).localCheckpoint()
    }

  def jaccardQuery(s: SparkSession, dir: String): DataFrame =
    jaccardPairsShared(s, dir).orderBy(col("id_a"), col("id_b"))

  /** Mersenne prime 2³¹ − 1: the modulus of the MinHash permutation
    * family and the band-bucket fold. Every value in the pipeline stays
    * below 2³¹, so products against sub-2³¹ multipliers stay below 2⁶² —
    * no silent Spark wrap, no DuckDB overflow error.
    */
  val MinhashP: Long = 2147483647L

  /** Multiplier of the band-bucket fold (prime, ~2²⁰). */
  val MinhashBandBase: Long = 1000003L

  /** Fixed affine-permutation params (aᵢ, bᵢ): hᵢ(x) = (aᵢ·x + bᵢ) mod P —
    * the textbook 2-universal family over the prime field [Carter &
    * Wegman '79], the standard MinHash permutation surrogate. Constants
    * derive from the golden-ratio and Numerical-Recipes multipliers; any
    * fixed family member is valid, and aᵢ ≠ 0 because P is prime and
    * neither factor is ≡ 0 (mod P). Shared VERBATIM with the q27 oracle —
    * `OracleSql` interpolates this seq into its SQL, so the constants
    * live in exactly one place.
    */
  val MinhashParams: IndexedSeq[(Long, Long)] =
    (0 until 64).map { i =>
      val a = (2654435761L * (2L * i + 1L)) % MinhashP
      val b = (1013904223L * (i + 1L)) % MinhashP
      (a, b)
    }

  /** Distinct (doc_id, shingle) pairs with the shingle pre-hashed to an
    * integer key — the scale variant feeding MinHash: the dedup shuffle
    * and every downstream row carry 8 bytes instead of a k-token string
    * (collision odds ~n²/2·10⁻⁹ per shared-bucket pair — irrelevant for
    * near-dup mining, which is why the exact-Jaccard path keeps real
    * strings). The hash is the engine's codegen'd rolling-hash
    * fingerprint (mod 10⁹+7, `TextHash.Modulus`) rather than xxhash64:
    * integer-arithmetic end-to-end makes the whole MinHash pipeline
    * DuckDB-replayable (the q141 pattern), which is what turned q27 from
    * rows-only into hash-verified. Mixing-quality risk was gated on the
    * existing QualityFloorsSpec precision/recall floors before the swap
    * (the q126 discipline).
    */
  def shingleHashes(docs: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = TextOps.tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= k)
      // one compiled pass over the token array — value-identical to
      // fingerprint(concat_ws(" ", window)) per window, but without the
      // per-window string build or the O(k·chars) re-hash
      // (ShingleFingerprintSpec pins the equality)
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.shingleFps(col("toks"), k))
          .as("shingle"))
      .distinct() // dedup on the 8-byte hash, not the string — that IS the point
  }

  /** MinHash signatures: for each of the first `numHashes` affine
    * permutations hᵢ(x) = (aᵢ·x + bᵢ) mod P ([[MinhashParams]]), the min
    * over the doc's shingle hashes. One aggregation pass; signature is a
    * fixed-width array column. Input contract: `shingle` is a
    * non-negative integer below 2³¹ ([[shingleHashes]] provides it).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    require(numHashes <= MinhashParams.length,
      s"at most ${MinhashParams.length} permutations are parameterized")
    val mins = (0 until numHashes).map { i =>
      val (a, b) = MinhashParams(i)
      min((lit(a) * col("shingle") + lit(b)) % lit(MinhashP)).as(s"mh_$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows each; docs colliding on any full band are
    * candidate pairs; candidates are then verified against the estimated
    * Jaccard (fraction of matching minhashes). P[band collision] = s^rows,
    * so 20 hashes / 5 bands (r=4) fires around s ≈ 0.5-0.7.
    */
  def minhashLshPairs(
      docs: DataFrame,
      k: Int = 5,
      numHashes: Int = 20,
      bands: Int = 5,
      estThreshold: Double = 0.5,
      maxBucket: Int = 50): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignatures(shingleHashes(docs, k), numHashes).cache()
    // band bucket: left fold of the band's signature values,
    // (acc·B + v) mod P — acc and v stay below P < 2³¹ and B ~ 2²⁰, so
    // the product stays below 2⁵¹; DuckDB's list_reduce replays the fold
    // bit-for-bit (the q89/q107 fold-mirror trick)
    val bandRows = sig.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => aggregate(slice(col("sig"), b * rows + 1, lit(rows)),
            lit(0L), (acc, v) => (acc * MinhashBandBase + v) % lit(MinhashP))))
        .as(Seq("band", "bucket")))
    // Cap pathological buckets (stop-shingle skew guard).
    val bucketed = bandRows
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bucket_n") <= maxBucket)
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Verify candidates with the estimated Jaccard from full signatures.
    cand
      .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          (x === y).cast("int")), v => v === 1)).cast("double") / numHashes, 4))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def minhashQuery(s: SparkSession, dir: String): DataFrame =
    minhashLshPairs(Tables.documents(s, dir))

  /** 62-bit SimHash over the document's distinct tokens: bit j of the
    * signature is the sign of the per-token votes, where token t votes on
    * bit j through its own affine hash yⱼ = (aⱼ·fp(t) + bⱼ) mod P of the
    * rolling-hash fingerprint fp (constants in
    * [[graft.functions.TextHash]], shared with the q28 oracle — the
    * integer construction is what makes q28 hash-verified rather than
    * rows-only). Production path: the codegen'd
    * [[graft.functions.SimHash62]] kernel (two tight loops);
    * [[simhashComposed]] keeps the pure-column variant whose per-token ×
    * per-bit lambdas run interpreted (the parity spec pins the two
    * together).
    */
  def simhash(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.simhash62(
        array_distinct(TextOps.tokens(col("text")))).as("simhash"))
  }

  /** Composed-HOF SimHash reference implementation (see [[simhash]]). */
  def simhashComposed(docs: DataFrame): DataFrame = {
    import graft.functions.TextHash
    val toks = array_distinct(TextOps.tokens(col("text")))
    val aCol = array(TextHash.SimA.map(lit(_)): _*)
    val bCol = array(TextHash.SimB.map(lit(_)): _*)
    val bits = TextHash.SimBits - 1
    docs
      .select(col("doc_id"),
        transform(toks, t => TextOps.fingerprint(t)).as("xs"))
      .withColumn("votes", aggregate(
        col("xs"),
        transform(sequence(lit(0), lit(bits)), _ => lit(0L)),
        (acc, x) => zip_with(acc, sequence(lit(0), lit(bits)),
          (a, j) => a + when(
            (element_at(aCol, j + 1) * x + element_at(bCol, j + 1))
              % TextHash.SimP <= TextHash.SimHalf, 1L).otherwise(-1L))))
      .select(col("doc_id"), aggregate(
        zip_with(col("votes"), sequence(lit(0), lit(bits)),
          (v, j) => when(v >= 0L, shl(lit(1L), j.cast("int"))).otherwise(0L)),
        lit(0L), (s, b) => s.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup candidate pairs with Hamming distance ≤ maxHamming
    * (≤ 3 with 4 chunks): pigeonhole — any pair within distance 3 agrees
    * on at least one of the 4 disjoint 16-bit chunks (the top chunk holds
    * the signature's remaining 14 bits), so the join is on chunk
    * equality, never all-pairs. Exact Hamming verified with
    * bit_count(xor). The q28 oracle recomputes the ≤ maxHamming pair set
    * by brute force, which independently verifies the pigeonhole
    * candidate generation is exhaustive.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs).cache()
    val chunked = sig.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => shr(col("simhash"), c.cast("int") * 16).bitwiseAND(0xFFFFL)))
        .as(Seq("chunk_idx", "chunk")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      // filter BEFORE distinct: chunk collisions vastly outnumber true
      // near-dups, so dropping them first shrinks the dedup shuffle
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  def simhashQuery(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir))

  /** Benchmark decontamination: cross-corpus n-gram CONTAINMENT — for
    * each (training doc, eval doc) pair sharing shingles, the fraction of
    * the EVAL doc's shingles that appear in the training doc,
    * C = |A∩B| / |B_eval|. The eval-side denominator is what makes this
    * the contamination score (vs Jaccard): a short eval prompt embedded
    * verbatim in a long training doc scores 1.0 even though the training
    * doc has thousands of other shingles.
    *
    * Same inverted-index shape as [[jaccardPairs]], but the join is
    * BIPARTITE (corpus ⋈ eval), so cost per shingle is bucket_corpus ×
    * bucket_eval — and the eval set is tiny next to the corpus. The df
    * cap applies to the CORPUS side (where the quadratic risk lives);
    * eval shingle counts stay uncapped, so a stop-shingle shared with an
    * eval doc slightly UNDERestimates its containment (conservative, no
    * false flags from boilerplate) — mirrored verbatim in the q53 oracle.
    */
  def containmentPairs(corpus: DataFrame, evalSet: DataFrame, k: Int,
      threshold: Double, maxDf: Int = 100): DataFrame = {
    val shC = cappedShingles(corpus, k, maxDf)
    val shE = shingles(evalSet, k).cache()
    val evalSizes = shE.groupBy(col("doc_id").as("eval_id"))
      .agg(count(lit(1)).as("n_eval_sh"))
    shC.as("c").join(shE.as("e"), col("c.shingle") === col("e.shingle"))
      .groupBy(col("c.doc_id").as("doc_id"), col("e.doc_id").as("eval_id"))
      .agg(count(lit(1)).as("n_common"))
      .join(evalSizes, "eval_id")
      .withColumn("containment",
        round(col("n_common").cast("double") / col("n_eval_sh"), 4))
      .filter(col("containment") >= threshold)
      .select(col("doc_id"), col("eval_id"), col("containment"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** q53: docs from every other source screened against the 'src0' slice
    * as a stand-in benchmark set.
    */
  def containmentQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    containmentPairs(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      k = 5, threshold = 0.5, maxDf = 100)
  }

  /** Incremental batch-vs-corpus screening — the admission control step of
    * a continuously-growing corpus: every NEW batch row is checked against
    * the EXISTING corpus before it is appended, so dedup cost per ingest is
    * O(batch × bucket), never a full-corpus re-dedup. Two tiers, cheapest
    * first:
    *
    *  1. exact text (the [[exact]] shape made bipartite): equi-join on
    *     `xxhash64(text)` — 8-byte exchange keys — verified on the real
    *     text, so a hash collision can never flag a non-duplicate;
    *  2. shingle containment (the [[containmentPairs]] bipartite inverted
    *     index, batch = eval side): max containment of each batch doc in
    *     any corpus doc, df cap on the corpus side.
    *
    * A batch row is `admitted` iff it is not an exact copy and its max
    * containment stays below `threshold`. This is the batch twin of the
    * streaming ingest path: the checkpointed file index
    * ([[graft.stream.Ingest]]) makes re-delivered FILES no-ops, and this
    * screen makes re-delivered CONTENT a no-op (IngestSpec proves both).
    *
    * Returns one row per batch doc:
    * (doc_id, exact_dup, max_containment, admitted).
    */
  def screenBatch(corpus: DataFrame, batch: DataFrame, k: Int,
      threshold: Double, maxDf: Int = 100): DataFrame = {
    val exactHits = batch
      .select(col("doc_id"), col("text"), xxhash64(col("text")).as("__h"))
      .join(corpus.select(col("text").as("__ct"),
          xxhash64(col("text")).as("__h")).distinct(),
        Seq("__h"))
      .filter(col("text") === col("__ct"))
      .select(col("doc_id"))
      .distinct()
      .withColumn("exact_dup", lit(true))
    val contMax = containmentPairs(corpus, batch, k, threshold = 0.0, maxDf)
      .groupBy(col("eval_id").as("doc_id"))
      .agg(max(col("containment")).as("max_containment"))
    batch.select(col("doc_id"))
      .join(exactHits, Seq("doc_id"), "left")
      .join(contMax, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(false)).as("exact_dup"),
        coalesce(col("max_containment"), lit(0.0)).as("max_containment"))
      .withColumn("admitted",
        !col("exact_dup") && col("max_containment") < threshold)
      .orderBy(col("doc_id"))
  }

  /** q108: every fifth document replayed as an incoming batch against the
    * rest of the corpus — the incremental-ingest admission screen.
    */
  def incrementalScreenQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    screenBatch(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      k = 5, threshold = 0.5, maxDf = 100)
  }

  /** Verbatim repeated-substring span detection [Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL 2022]
    * — the sub-document tier of dedup: find the SPANS of each document
    * whose k-gram content appears elsewhere in the corpus (boilerplate,
    * quoted passages, templated sections), which document-level exact and
    * near dedup both leave untouched.
    *
    * Semantics: a k-gram position is repeated iff its gram occurs ≥
    * `minCount` times corpus-wide; per doc, the repeated positions'
    * [i, i+k−1] token intervals are unioned (classic running-max interval
    * merge — adjacent intervals coalesce), and each maximal merged
    * interval is one repeated span. Reported per doc: span count, longest
    * span, and the fraction of tokens covered.
    *
    * Scale shape: there is NO pair join anywhere — the gram table is
    * counted (one shuffle keyed by gram; hot boilerplate grams make big
    * COUNT buckets, never candidate-pair blow-ups), and everything after
    * is windows/aggregates keyed by doc_id. This is why the span tier
    * scales where a substring self-join could not. (At 100 TB the gram
    * strings would ride as xxhash64 keys — the [[shingleHashes]]
    * discipline; the oracle-checked query keeps strings so DuckDB can
    * reproduce it.)
    */
  def repeatedSpans(docs: DataFrame, k: Int, minCount: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextOps.tokens(col("text"))
    val base = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        col("toks"))
      .filter(col("n_tokens") >= k)
    val grams = base.select(col("doc_id"), col("n_tokens"),
      posexplode(shingleArray(col("toks"), k)).as(Seq("i", "gram")))
    val dfw = Window.partitionBy(col("gram"))
    val rep = grams
      .withColumn("c", count(lit(1)).over(dfw))
      .filter(col("c") >= minCount)
      .select(col("doc_id"), col("n_tokens"),
        col("i").cast("long").as("s"),
        (col("i") + k - 1).cast("long").as("e"))
    // interval union: a position starts a new span iff it begins after the
    // running max end of everything before it (+1 keeps adjacency merged)
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = rep
      .withColumn("ni",
        when(prevMax.isNull || col("s") > prevMax + 1, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = islands
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg((max(col("e")) - min(col("s")) + 1).as("cov"))
    val stats = spans
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("cov")).as("longest_span"),
        sum(col("cov")).as("covered"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"),
        round(coalesce(col("covered"), lit(0L)).cast("double")
          / col("n_tokens"), 4).as("repeated_frac"))
      .orderBy(col("doc_id"))
  }

  /** q110: corpus-wide verbatim 5-gram repetition spans per document. */
  def repeatedSpansQuery(s: SparkSession, dir: String): DataFrame =
    repeatedSpans(Tables.documents(s, dir), k = 5, minCount = 2)

  /** Edit-distance (Levenshtein) near-dup pairs within blocking buckets —
    * the record-linkage flavor of near-dup mining: names/titles that differ
    * by a few character edits, where shingle/minhash methods (built for
    * long documents) have nothing to grip.
    *
    * Scale shape: the candidate set is an equi-join on the blocking key
    * (never all-pairs — same discipline as the inverted-index miners), a
    * length-difference pre-filter discards most candidates before any DP
    * runs (|len(a)−len(b)| ≤ d is necessary for distance ≤ d), and the
    * distance itself uses Spark's thresholded `levenshtein`, whose banded
    * DP abandons a pair as soon as the distance provably exceeds `maxDist`
    * (returning −1) — O(d·min(n,m)) per pair instead of O(n·m).
    */
  def editDistancePairs(recs: DataFrame, blockCol: String, idCol: String,
      textCol: String, maxDist: Int): DataFrame = {
    val a = recs.select(col(blockCol).as("block"), col(idCol).as("id_a"),
      col(textCol).as("s_a"))
    val b = recs.select(col(blockCol).as("block"), col(idCol).as("id_b"),
      col(textCol).as("s_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("block"), col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("block"), col("id_a"), col("id_b"))
  }

  /** Segment-blocked edit-distance pairs (PassJoin-style, Li et al.
    * VLDB'11): EXACTLY the same pairs as [[editDistancePairs]], found
    * without enumerating the block cross product.
    *
    * Pigeonhole: d edits distribute over d+1 disjoint segments of one
    * string, so some segment survives unedited and appears VERBATIM in
    * the other string, position-shifted by at most d. Each record is
    * therefore indexed by its d+1 segments, and probes with every
    * substring that could match a segment of a length-l string
    * (l ∈ [len−d, len+d], start within ±d of the segment's home
    * position). Candidates are the (i, l, substring) key collisions —
    * near-identical strings only — then verified with the exact banded
    * DP.
    *
    * Scale: the blocking key becomes (block, l, segment-index, content) —
    * fine-grained regardless of the block column's cardinality (a
    * 25-value brand column caps the naive join at 25-way parallelism and
    * O(Σ block²) work; segment keys restore both). Probe fan-out is
    * O((2d+1)²·(d+1)) keys per row — constant.
    */
  def editDistancePairsSegmented(recs: DataFrame, blockCol: String,
      idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val d = maxDist
    val k = d + 1 // segment count
    // scheme(l): segment i of a length-l string has length
    //   base (+1 for the last l%k segments), start = i·base + overflow
    def segLen(l: Column, i: Column): Column =
      (l / k).cast("int") + when(i >= lit(k) - pmod(l, lit(k)), 1).otherwise(0)
    def segStart(l: Column, i: Column): Column =
      (i * (l / k).cast("int")
        + greatest(lit(0), i - (lit(k) - pmod(l, lit(k))))).cast("int")

    val base = recs.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(textCol).as("s"), length(col(textCol)).as("n"))
    // index side: the d+1 segments of each string with n ≥ k (every
    // segment non-empty — the pigeonhole needs one unedited NON-EMPTY
    // segment), keyed by (l = n, i, content)
    val idx = base.filter(col("n") >= k)
      .select(col("block"), col("id"), col("s"), col("n"),
        explode(transform(sequence(lit(0), lit(d)), i =>
          struct(i.as("i"),
            col("s").substr(segStart(col("n"), i) + 1, segLen(col("n"), i))
              .as("seg"))))
          .as("e"))
      .select(col("block"), col("id").as("id_b"), col("s").as("s_b"),
        col("n").as("l"), col("e.i").as("i"), col("e.seg").as("seg"))
    // probe side: for each plausible indexed length l ≥ k and segment i,
    // every substring of this string with segment i's length at a start
    // within ±d of the segment's home position (the shift window)
    val probe = base.select(col("block"), col("id").as("id_a"),
        col("s").as("s_a"),
        explode(flatten(transform(
          // both bounds clamped to ≥ k: for n+d < k the range would be
          // DESCENDING (sequence never returns empty); the clamped l=k
          // probe matches nothing because short strings are not indexed
          sequence(greatest(col("n") - d, lit(k)),
            greatest(col("n") + d, lit(k))), l0 => {
            val l = l0.cast("int")
            flatten(transform(sequence(lit(0), lit(d)), i => {
              val li = segLen(l, i)
              val pi = segStart(l, i)
              val lo = greatest(lit(0), pi - d)
              val hi = least(col("n").cast("int") - li, pi + d)
              // sequence() is DESCENDING for hi < lo, never empty — clamp
              // the bound, then drop the out-of-window positions
              transform(filter(sequence(lo, greatest(hi, lo)), p => p <= hi),
                p => struct(l.as("l"), i.as("i"),
                  col("s").substr(p + 1, li).as("seg")))
            }))
          })))
          .as("e"))
      .select(col("block"), col("id_a"), col("s_a"),
        col("e.l").as("l"), col("e.i").as("i"), col("e.seg").as("seg"))
    val segCands = probe.join(idx, Seq("block", "l", "i", "seg"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"), col("s_a"), col("s_b"))
    // catch-all for strings SHORTER than k, which the pigeonhole can't
    // cover: they only reach strings of length ≤ n+d ≤ 2d, so both sides
    // of this little block-local join hold ≤ 2d-char strings — bounded,
    // and empty whenever the corpus has no near-empty strings
    val shortCands = base.filter(col("n") <= d).as("x")
      .join(base.filter(col("n") <= 2 * d).as("y"),
        col("x.block") === col("y.block") && col("x.id") =!= col("y.id"))
      .select(col("x.block").as("block"),
        least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"),
        when(col("x.id") < col("y.id"), col("x.s")).otherwise(col("y.s"))
          .as("s_a"),
        when(col("x.id") < col("y.id"), col("y.s")).otherwise(col("x.s"))
          .as("s_b"))
    segCands.union(shortCands)
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), d).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("block"), col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("block"), col("id_a"), col("id_b"))
  }

  /** [[editDistancePairsSegmented]] over DISTINCT text values, expanded
    * back to record pairs — the canonicalize-then-mine discipline (the
    * same move [[exactByHash]] makes for exact dedup): when the text
    * column is low-cardinality (product names, titles, usernames), the
    * miner touches each distinct string once and the per-record work
    * collapses to output-bound expansion joins. Identical result set to
    * the naive block join: cross-name pairs come from the distinct-level
    * mining × the two name groups; same-name record pairs are distance 0
    * by definition.
    */
  def editDistancePairsByText(recs: DataFrame, blockCol: String,
      idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val rows = recs.select(col(blockCol).as("block"), col(idCol).as("rid"),
      col(textCol).as("nm"))
    val names = rows.select(col("block"), col("nm")).distinct()
    // text as its own id: distinct strings, so ids are unique and the
    // miner's strict id_a < id_b order is a total order over names
    val namePairs = editDistancePairsSegmented(names, "block", "nm", "nm",
      maxDist)
    val expanded = namePairs
      .join(rows.select(col("block"), col("nm").as("id_a"),
        col("rid").as("ra")), Seq("block", "id_a"))
      .join(rows.select(col("block"), col("nm").as("id_b"),
        col("rid").as("rb")), Seq("block", "id_b"))
      .select(col("block"), least(col("ra"), col("rb")).as("id_a"),
        greatest(col("ra"), col("rb")).as("id_b"), col("dist"))
    val sameName = rows.as("x").join(rows.as("y"),
        col("x.block") === col("y.block") && col("x.nm") === col("y.nm")
          && col("x.rid") < col("y.rid"))
      .select(col("x.block").as("block"), col("x.rid").as("id_a"),
        col("y.rid").as("id_b"), lit(0L).as("dist"))
    expanded.union(sameName)
      .orderBy(col("block"), col("id_a"), col("id_b"))
  }

  /** q70: part names within distance ≤ 2 of each other, blocked by brand —
    * distinct-name segment mining + expansion (identical pairs to the
    * naive block join, EditDistanceSpec-pinned both ways).
    */
  def editDistanceQuery(s: SparkSession, dir: String): DataFrame =
    editDistancePairsByText(Tables.part(s, dir), "p_brand", "p_partkey",
      "p_name", maxDist = 2)

  /** Connected components over an undirected near-dup pair graph:
    * (doc_id, cluster_id) where cluster_id is the minimum doc_id reachable
    * through any chain of pairs — the step that turns pairwise near-dup
    * hits into keep/drop groups (transitive closure of "is a near-dup of").
    *
    * Algorithm: alternating large-star/small-star [Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14] — O(log n)
    * rounds on ANY topology, where min-label propagation
    * ([[connectedComponentsLabelProp]]) needs O(diameter). Near-dup
    * clusters are near-cliques (both converge in ~3 rounds there), but at
    * 100 TB one chain-shaped pathology — a long plagiarism ring, a
    * boilerplate gradient — would stall a diameter-bound loop; star
    * contraction makes the worst case logarithmic instead.
    *
    * Each star op is one window shuffle (per-node min over the adjacency)
    * plus one distinct; `localCheckpoint` truncates lineage per round.
    * Convergence = the canonical edge set reaching the star-forest
    * fixpoint, detected by an (edge count, Σ xxhash64(u,v)) fingerprint —
    * one scalar aggregate, no edges⋈edges diff join. A non-converged
    * result throws rather than returning silently wrong clusters.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // canonical undirected edge set, directed big→small: (u, v), u > v.
    // DISK_ONLY checkpoint storage for the edge-sized per-round state —
    // the q94 100× OOM lesson (in-memory row caches and even SER
    // promotion OOM under pressure; see KCore.kcoreCounted's note).
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = true, storageLevel = ser)

    // Set-identity fingerprint: count + decimal sum of per-edge hashes
    // (decimal(38,0) — a long sum over ±2⁶³ hashes would overflow).
    def fingerprint(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }

    // large-star(a): m = min(Γ(a) ∪ {a}); link every neighbor b > a to m.
    // Emitted (b, m) keeps the u > v invariant (b > a ≥ m).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
      val w = Window.partitionBy(col("a"))
      sym.withColumn("m", least(min(col("b")).over(w), col("a")))
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star(u) over the big→small edges: m = min of u's smaller
    // neighborhood ∪ {u}; link u and each smaller neighbor (except m) to m.
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("u"))
      val withMin = e.withColumn("m", min(col("v")).over(w))
      withMin.select(col("v").as("node"), col("m"))
        .union(withMin.select(col("u").as("node"), col("m")))
        .filter(col("node") =!= col("m"))
        .distinct()
        .select(col("node").as("u"), col("m").as("v"))
    }

    var (prevCnt, prevSum) = fingerprint(edges)
    var converged = prevCnt == 0L // empty graph: nothing to contract
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges))
        .localCheckpoint(eager = true, storageLevel = ser)
      val (cnt, sm) = fingerprint(next)
      converged = cnt == prevCnt && sm.compareTo(prevSum) == 0
      prevCnt = cnt
      prevSum = sm
      // edge-sized per-round state: free the superseded checkpoint
      // (PlanWalk.freeCheckpoint — the q94 100× lesson applied here too)
      graft.operators.PlanWalk.freeCheckpoint(edges)
      edges = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    // fixpoint is a star forest: every edge is (member, root-min); roots
    // appear only on the v side and label themselves
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .distinct()
  }

  /** Min-label propagation CC — O(diameter) rounds, kept as the parity
    * reference for [[connectedComponents]] (DedupSpec pins the two
    * algorithms to identical clusters): each round every vertex takes the
    * min of its own and its neighbors' labels, one edges⋈labels shuffle.
    */
  def connectedComponentsLabelProp(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .cache() // re-joined every round
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    // Convergence via the label-sum invariant: each vertex's label is
    // non-increasing across rounds (min over self ∪ neighbors), so the
    // TOTAL decreases iff any label changed — one scalar aggregate over
    // the checkpointed labels instead of a labels⋈labels diff join.
    // Summed as decimal(38,0): ids may span the full ±2^63 range (e.g.
    // xxhash64 keys), where a long sum would overflow (ANSI throw);
    // coalesce covers the empty pair graph (sum over zero rows is null).
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)))
        .collect()(0).getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbors = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      labels = labels.union(viaNeighbors)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val newSum = labelSum(labels)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** q40: near-dup clusters from the exact-Jaccard pair graph. */
  def clustersQuery(s: SparkSession, dir: String): DataFrame =
    clustersShared(s, dir).orderBy(col("doc_id"))
}
