package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity resolution to a GOLDEN RECORD — the master-data-management
  * completion of the dedup suite: the near-dup operators FIND duplicate
  * records; this one MERGES each identity cluster into one canonical
  * row under per-attribute survivorship rules [Talburt, "Entity
  * Resolution and Information Quality", ch. 6 — the
  * recency/frequency/presence rule taxonomy every MDM system ships].
  *
  * Identity is TRANSITIVE: records match pairwise on ANY shared link key
  * (same email OR same phone), and A–B on email + B–C on phone makes
  * {A,B,C} one entity even though A and C share nothing directly — so
  * clustering is connected components over the match graph
  * ([[Dedup.connectedComponents]], the star-contraction q40 machinery),
  * not a blocking-key groupBy.
  *
  * Survivorship, per cluster:
  *   - `name`: most RECENT value (max version — "latest system wins");
  *   - `acctbal`: most recent NON-NULL (a newer record with a missing
  *     balance must not erase an older known one — the rule that
  *     separates survivorship from a plain latest-wins upsert);
  *   - `mktsegment`: most FREQUENT value, ties to the lexicographically
  *     smallest ("consensus wins" for attributes where recency is
  *     noise).
  *
  * Scale shape: match-pair generation is two blocked equi-joins (email,
  * phone — each a hash shuffle on the link key, the dedup discipline;
  * never a cross join); CC is O(log n) star contraction; survivorship is
  * two cluster-keyed aggregates (the recency/presence rules ride ONE
  * exchange as struct-max's; the frequency rule needs its own
  * (cluster, value)-grain pre-count). Everything is cluster-bounded —
  * no corpus-scale window, no collect.
  */
object GoldenRecord {

  /** Merge `records` (`rid`, link keys `email`/`phone`, payload `name`/
    * `acctbal`/`mktsegment`, recency `version`) into one golden row per
    * connected identity cluster.
    */
  def golden(records: DataFrame): DataFrame = {
    def linkPairs(key: String): DataFrame =
      records.select(col(key).as("k"), col("rid").as("id_a"))
        .join(records.select(col(key).as("k"), col("rid").as("id_b")), Seq("k"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    val pairs = linkPairs("email").unionByName(linkPairs("phone")).distinct()
    val labeled = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("rid"), col("cluster_id"))
    val clustered = records.join(labeled, Seq("rid"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("rid")))
    // recency + presence rules: one cluster-keyed exchange (struct-max
    // ignores null structs, so the non-null filter IS the presence rule)
    val base = clustered.groupBy(col("cluster_id")).agg(
      count(lit(1)).as("n_records"),
      max(struct(col("version"), col("name"))).getField("name").as("name"),
      max(when(col("acctbal").isNotNull,
        struct(col("version"), col("acctbal")))).getField("acctbal")
        .as("acctbal"))
    // frequency rule: (cluster, value)-grain count, then argmax with the
    // lexicographic tie-break (min of (-cnt, value))
    val seg = clustered.groupBy(col("cluster_id"), col("mktsegment"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("cnt")).as("neg"), col("mktsegment").as("v")))
        .getField("v").as("mktsegment"))
    base.join(seg, Seq("cluster_id"))
  }

  /** Deterministic dirty registry from the customer table: every entity
    * contributes its base record; every third also a NEWER email-linked
    * variant (name uppercased, balance MISSING); every sixth also a
    * phone-linked third record (suffixed name, adjusted balance, segment
    * flipped) that shares NOTHING with the base directly — the
    * transitive chain base –email– v1 –phone– v2.
    */
  def dirtyRegistry(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey").cast("long").as("k"),
      col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    val base = c.select((col("k") * 4L).as("rid"),
      concat(lit("e"), col("k")).as("email"),
      concat(lit("p"), col("k")).as("phone"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("mktsegment"), lit(1L).as("version"))
    val v1 = c.filter(col("k") % 3L === 0L).select((col("k") * 4L + 1L).as("rid"),
      concat(lit("e"), col("k")).as("email"),
      concat(lit("px"), col("k")).as("phone"),
      upper(col("c_name")).as("name"), lit(null).cast("double").as("acctbal"),
      col("c_mktsegment").as("mktsegment"), lit(2L).as("version"))
    val v2 = c.filter(col("k") % 6L === 0L).select((col("k") * 4L + 2L).as("rid"),
      concat(lit("ex"), col("k")).as("email"),
      concat(lit("px"), col("k")).as("phone"),
      concat(col("c_name"), lit(" JR")).as("name"),
      round(col("c_acctbal") + 5.0, 2).as("acctbal"),
      lit("MACHINERY").as("mktsegment"), lit(3L).as("version"))
    base.unionByName(v1).unionByName(v2)
  }

  /** q164: golden records of the dirty registry. The interesting rows:
    * 3-record chains surface the transitive merge (name from v2 via
    * recency, balance from v2, segment by 2-of-3 consensus unless the
    * entity already was MACHINERY), 2-record clusters surface the
    * presence rule (v1's null balance must NOT survive over the base's
    * known one while v1's newer name DOES).
    */
  def goldenQuery(s: SparkSession, dir: String): DataFrame =
    golden(dirtyRegistry(s, dir))
      .select(col("cluster_id"), col("n_records"), col("name"),
        col("acctbal"), col("mktsegment"))
      .orderBy(col("cluster_id"))
}
