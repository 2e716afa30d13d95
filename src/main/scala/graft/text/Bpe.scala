package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Byte-pair-encoding merge training [Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016] — the tokenizer-
  * construction step of an LLM data pipeline: learn the first N merge rules
  * from corpus statistics. Extends q38's single-shot pair counting into the
  * full iterative trainer.
  *
  * Scale shape (the Sennrich trick): training runs over the DISTINCT-word
  * vocabulary weighted by corpus counts — never over running text — so the
  * per-round cost is bounded by vocabulary size (~10⁷ at web scale), not
  * corpus size (~10¹¹ tokens). Each round is one narrow pair-count shuffle
  * over the vocab table, one TakeOrdered top-1 (a scalar collect — the
  * legitimate pattern), and a pure per-row fold applying the merge;
  * `localCheckpoint` truncates lineage between rounds.
  *
  * Merge application uses a left fold over the symbol sequence with a
  * pipe-encoded accumulator: symbol x appends as `'|' + x`, except when the
  * accumulator ends with `'|' + lhs` and x == rhs, where it appends bare x
  * (fusing the pair). This reproduces greedy left-to-right non-overlapping
  * replacement exactly — a freshly fused token never re-matches as the
  * RIGHT side of the same merge (its tail has no separator), which is the
  * standard BPE single-pass semantics ("aaa" + (a,a) → ["aa","a"]). The
  * DuckDB oracle runs the identical fold via `list_reduce`. Symbols are
  * restricted to `^[a-z]+$` words (+ the `</w>` terminal), so the pipe
  * separator can never collide with a symbol.
  */
object Bpe {

  /** Learned merge rule: at `step`, fuse adjacent (lhs, rhs) with weighted
    * adjacency frequency `freq`.
    */
  final case class Merge(step: Long, lhs: String, rhs: String, freq: Long)

  /** Train `nMerges` BPE merges over a weighted vocabulary.
    *
    * @param vocab (word: String, w: Long) — distinct words with corpus
    *              counts; words must not contain `'|'`.
    * @return the merge table, ties broken by (freq desc, lhs asc, rhs asc).
    */
  def train(vocab: DataFrame, nMerges: Int): Seq[Merge] = {
    // word → character symbols + terminal marker
    var seqs = vocab.select(
      concat(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
        array(lit("</w>"))).as("t"),
      col("w"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // adjacent-pair counts: zip t[0..n-2] with t[1..n-1] (overlapping
      // occurrences each count, as in the reference algorithm)
      val top = seqs
        .select(explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("w"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("w")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step.toLong, l, r, f)
        val folded = aggregate(col("t"), lit(""),
          (acc, x) => when(acc.endsWith(lit("|" + l)) && x === r,
              concat(acc, x))
            .otherwise(concat(acc, lit("|"), x)))
        seqs = seqs
          .select(split(trim(folded, "|"), "\\|").as("t"), col("w"))
          .localCheckpoint()
        step += 1
      }
    }
    merges.result()
  }

  /** Apply an ordered merge list to one word (as a Column): character
    * symbols + `</w>`, then each merge as the same pipe-encoded greedy
    * fold used in training — the ENCODE half of the tokenizer. The merge
    * rules are driver-side literals baked into the expression tree, so
    * application is a pure per-row expression chain: embarrassingly
    * parallel, no joins, no state.
    */
  def applyMerges(word: org.apache.spark.sql.Column, merges: Seq[Merge]): org.apache.spark.sql.Column = {
    var t = concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit("</w>")))
    for (m <- merges) {
      val folded = aggregate(t, lit(""),
        (acc, x) => when(acc.endsWith(lit("|" + m.lhs)) && x === lit(m.rhs),
            concat(acc, x))
          .otherwise(concat(acc, lit("|"), x)))
      t = split(trim(folded, "|"), "\\|")
    }
    t
  }

  /** q109: encode the corpus with the 10 learned merges — per-doc subword
    * statistics (the token-counting step a training pipeline runs after
    * tokenizer construction). Segmentation is computed once per DISTINCT
    * word (the same vocabulary trick as training) and broadcast back onto
    * the per-doc word stream, so the corpus-side cost is one explode +
    * one broadcast join + one grouped sum.
    */
  def bpeEncodeQuery(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("w"))
    val merges = train(vocab, nMerges = 10)
    val seg = vocab.select(col("word"),
      size(applyMerges(col("word"), merges)).cast("long").as("n_sub"),
      (length(col("word")) + 1).cast("long").as("n_sym"))
    words.join(broadcast(seg), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"),
        sum(col("n_sym")).as("n_symbols"))
      .withColumn("compression",
        round(col("n_subwords").cast("double") / col("n_symbols"), 4))
      .orderBy(col("doc_id"))
  }

  /** q133: per-language tokenizer fertility — subwords per word under the
    * corpus-trained merges. THE multilingual tokenizer-fairness
    * diagnostic (languages the tokenizer fragments pay more context per
    * sentence [Sennrich ACL'16 §5 discusses exactly this lengthening]);
    * run after q107-training to decide whether the merge budget serves
    * every language in the blend.
    *
    * Same vocabulary trick as q109, but the segmentation table joins the
    * word stream HINT-FREE on the word key: the distinct-word table grows
    * with the corpus (Heaps' law), so whether it broadcasts is the
    * optimizer's size-based call, never a hint the 100 TB plan inherits.
    */
  def fertility(docs: DataFrame, nMerges: Int): DataFrame = {
    val words = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("w"))
    val merges = train(vocab, nMerges)
    val seg = vocab.select(col("word"),
      size(applyMerges(col("word"), merges)).cast("long").as("n_sub"),
      (length(col("word")) + 1).cast("long").as("n_sym"))
    words.join(seg, Seq("word"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"),
        sum(col("n_sym")).as("n_symbols"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 4))
      .withColumn("compression",
        round(col("n_subwords").cast("double") / col("n_symbols"), 4))
      .orderBy(col("lang"))
  }

  def bpeFertilityQuery(s: SparkSession, dir: String): DataFrame =
    fertility(Tables.documents(s, dir), nMerges = 10)

  /** q107: the first 10 merges learned from the documents corpus
    * (whitespace tokens restricted to `^[a-z]+$`, weighted by count).
    */
  def bpeMergesQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("w"))
    train(vocab, nMerges = 10)
      .toDF()
      .select(col("step"), col("lhs"), col("rhs"), col("freq"))
      .orderBy(col("step"))
  }
}
