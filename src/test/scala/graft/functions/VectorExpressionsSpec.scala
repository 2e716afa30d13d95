package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(-1.0f, -2.0f, -3.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f)),
    (4L, null.asInstanceOf[Array[Float]]))
    .toDF("vec_id", "embedding")

  def cosOf(aId: Long, bId: Long): Option[Double] = {
    GraftFunctions.register(spark)
    val a = vecs.filter(col("vec_id") === aId).select(col("embedding").as("a"))
    val b = vecs.filter(col("vec_id") === bId).select(col("embedding").as("b"))
    val r = a.crossJoin(b)
      .select(GraftFunctions.cosine(col("a"), col("b"))).collect().head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("identical → 1, opposite → -1, zero-norm and null → NULL") {
    assert(math.abs(cosOf(0L, 1L).get - 1.0) < 1e-15)
    assert(math.abs(cosOf(0L, 2L).get + 1.0) < 1e-15)
    assert(cosOf(0L, 3L).isEmpty) // zero vector
    assert(cosOf(0L, 4L).isEmpty) // null input
  }

  test("bit-identical to the composed zip_with/aggregate fold") {
    GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val both = e.select(col("vec_id"),
        GraftFunctions.cosine(col("embedding"), col("embedding")).as("expr_cos"),
        (Similarity.dot(Similarity.toDouble(col("embedding")),
          Similarity.toDouble(col("embedding")))
          / (Similarity.norm(Similarity.toDouble(col("embedding")))
            * Similarity.norm(Similarity.toDouble(col("embedding"))))).as("fold_cos"))
    // exact double equality — both sides accumulate in the same order
    assert(both.filter(col("expr_cos") =!= col("fold_cos")).count() == 0)
  }

  test("hyperplane sketch expression bit-identical to the composed column version") {
    GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(100)
    val both = e.select(col("vec_id"),
      GraftFunctions.lshBucket(col("embedding"), 8).as("expr_b"),
      Similarity.lshBucketComposed(Similarity.toDouble(col("embedding")), 8).as("hof_b"))
    assert(both.filter(col("expr_b") =!= col("hof_b")).count() == 0)
    // buckets are spread, not degenerate
    assert(both.select(col("expr_b")).distinct().count() > 1)
  }

  test("SQL path after registration: graft_cosine callable from spark.sql") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vx")
    val r = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c
        |FROM vx a JOIN vx b ON b.vec_id = 1 WHERE a.vec_id = 2""".stripMargin)
      .collect().head
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-15)
  }

  test("codegen and interpreted paths agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val conv = CatalystTypeConverters.createToCatalystConverter(ArrayType(FloatType))
    val a = Literal(conv(Seq(1.0f, 2.0f)), ArrayType(FloatType))
    val b = Literal(conv(Seq(2.0f, 4.0f)), ArrayType(FloatType))
    val expr = CosineSimilarity(a, b)
    // interpreted eval
    assert(math.abs(expr.eval(null).asInstanceOf[Double] - 1.0) < 1e-15)
  }
}
