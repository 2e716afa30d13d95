package graft.similarity

import graft.SparkSpec

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("codes hit the rails exactly at per-dim min and max") {
    val d = emb(
      (1L, Seq(0f, 10f), 0),   // dim0 min, dim1 max
      (2L, Seq(2f, 0f), 0),
      (3L, Seq(4f, 5f), 1))    // dim0 max, dim1 midpoint
    val m = Quantization.labelAudit(d).collect()
      .map(r => r.getInt(0) -> r).toMap
    // label 0: vec1 = (min,max) -> 2 saturated; vec2 = (mid, min) -> 1
    assert(m(0).getLong(2) === 3L)
    // label 1: vec3 = (max, mid) -> 1 saturated
    assert(m(1).getLong(2) === 1L)
  }

  test("perfectly reconstructible vectors have zero error") {
    // two distinct values per dim: min -> code 0, max -> code 255, both
    // reconstruct exactly; constant dim collapses to code 0 with lo = v
    val d = emb(
      (1L, Seq(1f, 7f, 3f), 0),
      (2L, Seq(5f, 9f, 3f), 0))
    val r = Quantization.labelAudit(d).collect()
    assert(r.length === 1)
    assert(r.head.getDouble(4) === 0.0, "mse_ppm must be exactly 0")
  }

  test("avg_code is the exact integer mean over all (vec, dim) cells") {
    // dim0: values 0,4 -> codes 0,255; dim1 constant -> codes 0,0
    val d = emb(
      (1L, Seq(0f, 2f), 0),
      (2L, Seq(4f, 2f), 0))
    val r = Quantization.labelAudit(d).collect().head
    assert(r.getDouble(3) === (0 + 255 + 0 + 0) / 4.0)
  }

  test("midpoint quantization error is bounded by half a step") {
    // dim range [0, 255] -> step 1.0; value 100.3 -> code 100, err 0.3
    val d = emb(
      (1L, Seq(0f), 0),
      (2L, Seq(255f), 0),
      (3L, Seq(100.3f), 0))
    val r = Quantization.labelAudit(d).collect().head
    val msePpm = r.getDouble(4)
    // per-vector mse: 0, 0, ~0.09 -> avg ~0.03 -> ppm ~30000
    assert(msePpm > 0.0 && msePpm < 0.25 * 1e6 / 3)
  }
}
