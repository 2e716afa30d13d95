package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Int8 scalar quantization of an embedding column with a per-dimension
  * [min, max] codebook, plus the per-label reconstruction-error audit —
  * the storage tier every vector index at corpus scale runs (FAISS
  * ScalarQuantizer QT_8bit; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI'11 §II for the error analysis). A
  * 64-dim float32 vector compresses 4× with sub-percent recall loss; the
  * audit quantifies exactly what was lost, per data slice.
  *
  * Reference tie: the vector/feature-store row of the reference's ML
  * surface (/root/reference/README.md:321-336) — the part of serving that
  * decides whether quantized vectors are usable.
  *
  * 100 TB shape: the codebook is per-DIMENSION min/max — posexplode to
  * (dim, v) rows, partial-aggregated map-side, exchange carries one row
  * per dimension; the dimension-sized codebook broadcasts back onto a
  * single per-row pass that quantizes, reconstructs, and scores without
  * any further shuffle (the only remaining exchange is the |labels|-sized
  * rollup). min/max are order-insensitive (no float-summation drift), so
  * codes are bit-exact vs the oracle; the only rounded outputs are the
  * two error statistics, scaled to ppm so the 6-dp rounding keeps full
  * signal.
  */
object Quantization {

  /** Per-label audit: (label, n_vecs, n_saturated, avg_code, mse_ppm).
    *   - code(v, d)  = round(255 · (v − min_d) / (max_d − min_d)), the
    *     int8 bin (constant dims collapse to code 0)
    *   - n_saturated = count of codes at the 0 / 255 rails
    *   - avg_code    = mean code over every (vector, dim) — integer sums,
    *     exact
    *   - mse_ppm     = mean squared reconstruction error × 10⁶
    */
  def labelAudit(embeddings: DataFrame): DataFrame = {
    // per-dimension codebook: one row per dim on the exchange
    val codebook = embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(min(col("v")).cast("double").as("lo"),
           max(col("v")).cast("double").as("hi"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("dim"), col("lo"), col("hi"))))
        .as("cb"))
    // one narrow pass: quantize + reconstruct + score per row
    val scored = embeddings
      .crossJoin(broadcast(codebook))
      .withColumn("codes",
        zip_with(col("embedding"), col("cb"), (v, c) => {
          val lo = c.getField("lo"); val hi = c.getField("hi")
          when(hi === lo, lit(0.0))
            .otherwise(round((v.cast("double") - lo) * 255.0 / (hi - lo), 0))
        }))
      .withColumn("sq_err",
        aggregate(
          zip_with(col("embedding"), zip_with(col("codes"), col("cb"), (q, c) => {
            val lo = c.getField("lo"); val hi = c.getField("hi")
            lo + q * (hi - lo) / 255.0
          }), (v, r) => v.cast("double") - r),
          lit(0.0), (acc, e) => acc + e * e))
      .withColumn("n_sat",
        size(filter(col("codes"), q => q === 0.0 || q === 255.0)).cast("long"))
      .withColumn("code_sum",
        aggregate(col("codes"), lit(0L), (acc, q) => acc + q.cast("long")))
      .withColumn("d", size(col("embedding")).cast("long"))
    scored
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("n_sat")).as("n_saturated"),
        round(sum(col("code_sum")).cast("double") / sum(col("d")), 4)
          .as("avg_code"),
        round(avg(col("sq_err") / col("d")) * 1e6, 6).as("mse_ppm"))
      .orderBy(col("label"))
  }

  def labelAuditQuery(s: SparkSession, dir: String): DataFrame =
    labelAudit(Tables.embeddings(s, dir))
}
