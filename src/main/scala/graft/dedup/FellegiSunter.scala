package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage [Fellegi & Sunter, "A
  * Theory for Record Linkage", JASA 1969 — the model behind Splink,
  * the Census Bureau matchers, and essentially every production
  * linkage system]: candidate pairs get an AGREEMENT PATTERN γ over
  * compare fields, each field contributes the likelihood ratio
  * m_f/u_f (agree) or (1−m_f)/(1−u_f) (disagree) with m = P(agree |
  * match), u = P(agree | non-match), and the pattern's product ratio
  * classifies link / possible / non-link. This is the SCORING layer
  * the deterministic suite lacks: q164 merges records that share a
  * hard key; FS grades the fuzzy middle where no key agrees exactly.
  *
  * m/u here are estimated SUPERVISED from the registry's known entity
  * labels (rid div 4 — the q164 fixture's ground truth) with add-one
  * smoothing, so every probability is an exact counted ratio; the
  * unsupervised-EM variant changes only where the two count rows come
  * from. The score stays a PRODUCT of exact-ratio doubles in fixed
  * field order (no logs — ln is the one libm call DuckDB and the JVM
  * may round differently; the likelihood RATIO carries the identical
  * ordering), so the oracle replays it bit-for-bit.
  *
  * 100 TB shape: candidate generation is blocked equi-joins only — the
  * two hard link keys plus one WEAK block (rid DIV 8 near-id
  * neighborhoods: the deterministic systematic sample of mostly
  * non-match pairs u-estimation needs, LINEAR pair volume by
  * construction) with an enforced block-size cap as the loud guard
  * (the PPJoin budget discipline). The m/u moment row is a 1-row
  * broadcast; patterns are a ≤ 2³-row table. No corpus-scale window,
  * no cartesian.
  */
object FellegiSunter {

  /** Pattern-level FS readout over `records` (rid, email, phone, name,
    * acctbal, mktsegment, and an `entity` truth column): one row per
    * agreement pattern with counts, the likelihood-ratio score and the
    * verdict at ratio thresholds 100 (link) / 1 (possible).
    */
  def patternScores(records: DataFrame, weakBlockCap: Int): DataFrame = {
    val r = records.select(col("rid"), col("entity"), col("email"),
      col("phone"), col("name"),
      when(col("acctbal").isNotNull, round(col("acctbal") * 100).cast("long"))
        .as("cents"),
      col("mktsegment").as("seg"))
    def hardPairs(key: String): DataFrame =
      r.select(col(key).as("k"), col("rid").as("id_a"))
        .join(r.select(col(key).as("k"), col("rid").as("id_b")), Seq("k"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    // weak block: systematic near-id neighborhoods (rid DIV 8 — two
    // entities' records per block), the deterministic stand-in for the
    // random-pair sample u-estimation needs. Pair volume is LINEAR in
    // the corpus by construction (≤ C(blockSize, 2) per block); the cap
    // is the loud guard should a registry ever batter one block.
    val weakKeyed = r.select(expr("rid DIV 8").as("wblock"), col("rid"))
    val weakOk = weakKeyed.groupBy(col("wblock"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= weakBlockCap)
      .select(col("wblock"))
    val weakPairs = weakKeyed.join(weakOk, Seq("wblock"))
      .select(col("wblock"), col("rid").as("id_a"))
      .join(weakKeyed.select(col("wblock"), col("rid").as("id_b")),
        Seq("wblock"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val pairs = hardPairs("email").unionByName(hardPairs("phone"))
      .unionByName(weakPairs).distinct()
    // agreement vector + truth label, one row per candidate pair
    val a = r.select(col("rid").as("id_a"), col("entity").as("ent_a"),
      col("name").as("name_a"), col("cents").as("cents_a"),
      col("seg").as("seg_a"))
    val b = r.select(col("rid").as("id_b"), col("entity").as("ent_b"),
      col("name").as("name_b"), col("cents").as("cents_b"),
      col("seg").as("seg_b"))
    val cmp = pairs.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .select(
        (col("name_a") === col("name_b")).as("a_name"),
        (col("cents_a").isNotNull && col("cents_b").isNotNull
          && abs(col("cents_a") - col("cents_b")) <= 1000L).as("a_bal"),
        (col("seg_a") === col("seg_b")).as("a_seg"),
        (col("ent_a") === col("ent_b")).as("is_match"))
    // supervised m/u with add-one smoothing: one broadcastable row
    val cnt = (p: Column) => sum(when(p, 1L).otherwise(0L))
    val mu = cmp.agg(
      cnt(col("is_match")).as("nm"),
      cnt(!col("is_match")).as("nu"),
      cnt(col("is_match") && col("a_name")).as("m_name_c"),
      cnt(!col("is_match") && col("a_name")).as("u_name_c"),
      cnt(col("is_match") && col("a_bal")).as("m_bal_c"),
      cnt(!col("is_match") && col("a_bal")).as("u_bal_c"),
      cnt(col("is_match") && col("a_seg")).as("m_seg_c"),
      cnt(!col("is_match") && col("a_seg")).as("u_seg_c"))
    def prob(c: String, n: String): Column =
      (col(c) + 1L).cast("double") / (col(n) + 2L).cast("double")
    val patterns = cmp.groupBy(col("a_name"), col("a_bal"), col("a_seg"))
      .agg(count(lit(1)).as("n_pairs"), cnt(col("is_match")).as("n_match"))
    def term(agree: String, mc: String, uc: String): Column =
      when(col(agree), prob(mc, "nm") / prob(uc, "nu"))
        .otherwise((lit(1.0) - prob(mc, "nm")) / (lit(1.0) - prob(uc, "nu")))
    patterns.crossJoin(broadcast(mu))
      .withColumn("score", round(term("a_name", "m_name_c", "u_name_c")
        * term("a_bal", "m_bal_c", "u_bal_c")
        * term("a_seg", "m_seg_c", "u_seg_c"), 6))
      .select(col("a_name"), col("a_bal"), col("a_seg"),
        col("n_pairs"), col("n_match"), col("score"),
        when(col("score") >= 100.0, lit("link"))
          .when(col("score") >= 1.0, lit("possible"))
          .otherwise(lit("non-link")).as("verdict"))
      .orderBy(col("a_name"), col("a_bal"), col("a_seg"))
  }

  /** q188: FS pattern scores over the q164 dirty registry (entity truth
    * = rid div 4, the registry's construction key).
    */
  def fsQuery(s: SparkSession, dir: String): DataFrame =
    patternScores(
      GoldenRecord.dirtyRegistry(s, dir)
        .withColumn("entity", expr("rid DIV 4")),
      weakBlockCap = 40)
}
