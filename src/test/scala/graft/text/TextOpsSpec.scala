package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "el gato y la casa y los perros", "es"),
    (3L, "a a a b", "en"))
    .toDF("doc_id", "text", "lang")

  test("tokens: empties filtered (double-space guard)") {
    val t = Seq((1L, "a  b   c")).toDF("id", "text")
      .select(TextOps.tokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(t == Seq("a", "b", "c"))
  }

  test("topTokens: frequency order with alphabetical tie-break") {
    val top = TextOps.topTokens(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a"×3, "the"×2, "y"×2 — tie between the/y broken alphabetically
    assert(top == Seq(("a", 3L), ("the", 2L), ("y", 2L)))
  }

  test("repetition stats: dup and top-bigram fractions on known docs") {
    val m = TextOps.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 3 "a a a b": bigrams (a a)×2, (a b) → 3 total, 2 distinct, max 2
    assert(m(3L) == ((3L, 0.3333, 0.6667)))
    // doc 1: 5 bigrams, all distinct → no repetition, top share 1/5
    assert(m(1L) == ((5L, 0.0, 0.2)))
  }

  test("bigram surprisal: corpus-MLE -ln P(w2|w1), hand-computed") {
    val tiny = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val m = TextOps.surprisalStats(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // c(a·)=3, c(a b)=2, c(a c)=1: -ln(2/3)=0.4055, -ln(1/3)=1.0986
    assert(m(1L) == ((1L, 0.4055)) && m(2L) == m(1L))
    assert(m(3L) == ((1L, 1.0986)))
    spark.catalog.clearCache() // surprisal caches its bigram table
  }

  test("textStats: counts, ratios, quality on known doc") {
    val r = TextOps.textStats(docs.filter(col("doc_id") === 3L)).collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_distinct_tokens") == 2L)
    assert(r.getAs[Double]("avg_token_len") == 1.0)
    assert(r.getAs[Double]("stop_ratio") == 0.75) // 3×"a" of 4
    // quality = round(ln(5)·0.25, 4)
    assert(math.abs(r.getAs[Double]("quality_score")
      - BigDecimal(math.log(5.0) * 0.25).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("langId: marker voting classifies en and es") {
    val preds = docs.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "es")
  }

  test("bpe-ish tokens: contractions, digit runs, punctuation runs split out") {
    val toks = Seq((1L, "it's 42 degrees, isn't it?!")).toDF("doc_id", "text")
      .select(TextOps.bpeTokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("it", "'s", " 42", " degrees", ",", " isn", "'t", " it", "?!"))
    val counts = TextOps.tokenCounts(
      Seq((1L, "it's 42 degrees, isn't it?!")).toDF("doc_id", "text")).collect().head
    assert(counts.getLong(1) == 5L) // whitespace tokens
    assert(counts.getLong(2) == 9L) // bpe-ish pre-tokens
  }

  test("tfidf: corpus-unique terms outrank ubiquitous ones") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana durian durian durian")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(corpus, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getDouble(3)))
      .toMap
    // banana is in every doc → idf = ln(1) = 0 → never rank 1
    assert(out((1L, 1L))._1 == "apple")
    assert(math.abs(out((1L, 1L))._2 - 2.1972) < 1e-4) // 2·ln(3)
    assert(out((3L, 1L))._1 == "durian")
    assert(math.abs(out((3L, 1L))._2 - 3.2958) < 1e-4) // 3·ln(3)
    assert(out((2L, 2L)) == ("banana", 0.0))
  }

  test("fingerprint: deterministic rolling hash, distinct for distinct text") {
    val fp = TextOps.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute doc 3's hash in plain Scala
    val expected = "a a a b".foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    assert(fp(3L) == expected)
    assert(fp.values.toSet.size == 3)
  }
}
