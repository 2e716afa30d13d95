package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Johnson–Lindenstrauss random projection [Achlioptas, "Database-friendly
  * random projections", PODS'01 — the ±1 sign-matrix variant]: project
  * d-dim embeddings to k ≪ d dims via y_j = (1/√k)·Σ_i s(i,j)·x_i, then
  * audit how well pairwise squared distances survive on a bounded probe
  * set. The cheap, data-independent complement of q67's PCA (which learns
  * directions) — at corpus scale JL is the first dimensionality cut
  * because it needs NO training pass at all.
  *
  * The sign matrix is a deterministic LCG over the (i, j) cell index —
  * both engines compute `((i·k+j)·1103515245 + 12345) mod 2³¹`, bit 16 —
  * so the oracle reproduces the projection bit-for-bit (Spark's xxhash64
  * would be rows-only; a seeded LCG keeps the query oracle-checkable, the
  * same trade q44's multiplicative-hash sampler makes).
  *
  * 100 TB shape: the projection is pure per-row compute (a k×d fold
  * inside whole-stage codegen — no shuffle, no model, no training pass);
  * the distance audit runs on an id-bounded probe subset whose pair count
  * is fixed by construction, broadcast-joined. Squared distances round to
  * 6 dp before the ratio, ratios round before the band census.
  */
object RandomProjection {

  /** Deterministic ±1 from the (i, j) cell: a Wang-style 32-bit integer
    * hash (two xor-shift-multiply rounds, constants < 2³¹ so the widest
    * intermediate stays < 2⁶⁴ — DuckDB BIGINT errors on overflow rather
    * than wrapping). A plain LCG bit here correlates matrix columns badly
    * enough to halve the JL in-band fraction (0.48 vs 0.86 measured).
    */
  private def sign(i: Column, j: Column, k: Int): Column = {
    val m = lit(4294967296L)
    val cell = (i * k + j).cast("long")
    val h1 = pmod(shiftright(cell, 16).bitwiseXOR(cell) * 73244475L, m)
    val h2 = pmod(shiftright(h1, 16).bitwiseXOR(h1) * 73244475L, m)
    val h3 = shiftright(h2, 16).bitwiseXOR(h2)
    when(h3 % 2 === 1L, 1.0).otherwise(-1.0)
  }

  /** Append `proj` (array<double>, length k) to `embeddings`. */
  def project(embeddings: DataFrame, k: Int): DataFrame = {
    val scale = 1.0 / math.sqrt(k.toDouble)
    embeddings.withColumn("proj",
      transform(sequence(lit(0), lit(k - 1)), j =>
        aggregate(
          sequence(lit(0), size(col("embedding")) - 1),
          lit(0.0),
          (acc, i) => acc +
            element_at(col("embedding"), i + 1).cast("double") * sign(i, j, k))
          * scale))
  }

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Distortion audit over the probe subset vec_id < `probeIds`:
    * (n_pairs, avg_ratio, min_ratio, max_ratio, n_in_band) where ratio =
    * ‖y_a − y_b‖² / ‖x_a − x_b‖² and the band is [0.5, 1.5].
    */
  def distortionAudit(embeddings: DataFrame, k: Int,
                      probeIds: Long): DataFrame = {
    val p = project(embeddings, k)
      .filter(col("vec_id") < probeIds)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("x"), col("proj"))
    val a = p.select(col("vec_id").as("ia"), col("x").as("xa"), col("proj").as("ya"))
    val b = p.select(col("vec_id").as("ib"), col("x").as("xb"), col("proj").as("yb"))
    a.join(broadcast(b), col("ia") < col("ib"))
      .select(
        round(sqDist(col("ya"), col("yb")), 6).as("dp"),
        round(sqDist(col("xa"), col("xb")), 6).as("dx"))
      .filter(col("dx") > 0.0)
      .select(round(col("dp") / col("dx"), 6).as("ratio"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(avg(col("ratio")), 6).as("avg_ratio"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"),
        sum(when(col("ratio") >= 0.5 && col("ratio") <= 1.5, 1L).otherwise(0L))
          .as("n_in_band"))
  }

  def jlAuditQuery(s: SparkSession, dir: String): DataFrame =
    distortionAudit(Tables.embeddings(s, dir), k = 16, probeIds = 40L)
}
