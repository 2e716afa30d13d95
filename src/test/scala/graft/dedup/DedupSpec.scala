package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "a b c d e f g h"),          // base
    (2L, "a b c d e f g h"),          // exact dup of 1
    (3L, "a b c d e f g x"),          // near dup of 1 (7/9 shingle-ish)
    (4L, "q r s t u v w z"))          // unrelated
    .toDF("doc_id", "text")

  test("exact dedup keeps min doc_id as representative") {
    val out = Dedup.exact(docs).collect()
    assert(out.length == 3)
    val m = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 2L) // doc 1+2 collapsed, representative is min id
    assert(m(3L) == 1L && m(4L) == 1L)
    // hash-keyed variant agrees (constant-width shuffle keys at scale)
    val byHash = Dedup.exactByHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byHash == m)
  }

  test("shingles: distinct k-grams, short docs filtered") {
    val sh = Dedup.shingles(docs.filter(col("doc_id") === 1L), k = 5)
    assert(sh.count() == 4) // 8 tokens → 4 distinct 5-shingles
    val short = Dedup.shingles(Seq((9L, "a b c")).toDF("doc_id", "text"), k = 5)
    assert(short.count() == 0)
  }

  test("jaccard pairs: exact dup = 1.0, near dup high, unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, k = 5, threshold = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard: stop-shingle df cap kills the quadratic candidate blowup") {
    // 30 decoy docs share one hot 5-gram and nothing else; 2 genuine dups
    // share only rare shingles. Uncapped, the hot shingle's inverted-index
    // bucket alone emits C(30,2)=435 candidate pairs (the quadratic path);
    // capped, the hot shingle leaves the universe and only the real dup
    // pair survives — computed over its rare shingles, so still J=1.0.
    val stop = "the quick brown fox jumps"
    val decoys = (1 to 30).map(i => (i.toLong, s"$stop only$i unique$i here$i"))
    val dups = Seq((100L, "zebra yak xylo wolf vole umbra"),
      (101L, "zebra yak xylo wolf vole umbra"))
    val corpus = (decoys ++ dups).toDF("doc_id", "text")
    // each decoy: 8 tokens → 4 shingles, 1 shared → J = 1/7 ≈ 0.143 ≥ 0.1
    val uncapped = Dedup.jaccardPairs(corpus, k = 5, threshold = 0.1,
      maxDf = Int.MaxValue)
    assert(uncapped.count() == 435 + 1)
    val capped = Dedup.jaccardPairs(corpus, k = 5, threshold = 0.1, maxDf = 10)
      .collect()
    assert(capped.length == 1)
    assert(capped.head.getLong(0) == 100L && capped.head.getLong(1) == 101L
      && capped.head.getDouble(2) == 1.0)
  }

  test("minhash-lsh finds exact and near dups, est_jaccard=1 for identical") {
    val out = Dedup.minhashLshPairs(docs, k = 5, numHashes = 20, bands = 5,
      estThreshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: codegen kernel matches the composed-HOF implementation") {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val expr = Dedup.simhash(real).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = Dedup.simhashComposed(real).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expr == hof)
  }

  test("containment: embedded eval prompt scores 1.0, jaccard would miss it") {
    // training doc 1 CONTAINS eval doc 100's text verbatim plus lots more:
    // every eval shingle recurs → containment 1.0 at the production 0.5
    // threshold, while Jaccard is ~2/25 = 0.08 (the extra training
    // shingles swamp the union) and would never flag it
    val evalDoc = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val training = Seq(
      (1L, "intro words here alpha beta gamma delta epsilon zeta " +
        (1 to 20).map(i => s"tail$i").mkString(" ")),
      (2L, "completely unrelated content with many distinct tokens here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(training, evalDoc, k = 5,
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 100L)) == 1.0)
    assert(!out.keys.exists(_._1 == 2L))
    // the union-denominated score really is below the threshold — the
    // property that makes containment (not Jaccard) the right metric
    val jac = Dedup.jaccardPairs(training.union(evalDoc), k = 5,
      threshold = 0.5).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 100L))
    spark.catalog.clearCache()
  }

  test("connected components: chains close transitively, islands stay apart") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain → one cluster rooted at 1
      (10L, 11L), (10L, 12L),       // star → cluster rooted at 10
      (20L, 21L))                   // island pair
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: empty pair graph and full-range 64-bit ids") {
    // empty input → empty clusters (not an NPE from a null sum)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    // hash-scale ids whose long sum would overflow: must still converge
    val big = Seq(
      (Long.MinValue + 1, Long.MaxValue - 1),
      (Long.MaxValue - 1, Long.MaxValue))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(big).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(Long.MinValue + 1))
    assert(cc.size == 3)
  }

  test("connected components: non-convergence throws instead of lying") {
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2)
    }
    // and the same chain converges with room to spare
    val cc = Dedup.connectedComponents(chain).collect()
    assert(cc.forall(_.getLong(1) == 1L))
  }

  test("connected components: 2048-vertex path converges within 2·log₂ n rounds") {
    // the diameter pathology that stalls label propagation (O(diameter)
    // rounds — 2047 here, far past any sane maxIter): star contraction
    // must close it within the Kiveris bound, 2·log₂ 2048 = 22 rounds
    val n = 2048L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 22).collect()
    assert(cc.length == n.toInt)
    assert(cc.forall(_.getLong(1) == 1L))
  }

  test("connected components: star algorithm ≡ label propagation") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L), // chain joined from both ends
      (10L, 11L), (10L, 12L), (12L, 13L),     // star with a tail
      (20L, 21L), (21L, 20L))                 // island with a mirrored dup
      .toDF("id_a", "id_b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toMap(Dedup.connectedComponents(pairs))
      == toMap(Dedup.connectedComponentsLabelProp(pairs)))
  }

  test("exact dedup: multi-KB documents, exact result on the hash-bucketed key") {
    // the 100 TB layout concern: the shuffle must partition on the 8-byte
    // xxhash64, but the RESULT must still be byte-exact — docs differing
    // only in the last character of 100 KB stay distinct
    val big = "lorem ipsum " * 9000 // ~108 KB
    val docs = Seq((7L, big), (3L, big), (9L, big.dropRight(1) + "X"))
      .toDF("doc_id", "text")
    val m = Dedup.exact(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(3L -> 2L, 9L -> 1L))
  }

  test("simhash: identical docs → distance 0; pairs respect maxHamming") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined && p12.get.getLong(2) == 0) // hamming cast to long
  }
}
