package graft.etl

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.SparkSpec

class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions drifted file schemas and null-fills per file") {
    val dir = Files.createTempDirectory("drift").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/v1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/v2")
    val merged = SchemaDrift.readMerged(spark, s"$dir/v1", s"$dir/v2")
    assert(merged.columns.toSet === Set("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score")),
      "v1 rows null-fill the column they never had")
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) === 9.5)
  }

  test("alignTo projects onto the contract: null-fill, drop, reorder, cast") {
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType),
      StructField("name", StringType)))
    val drifted = Seq((1, "x", "extra")).toDF("id", "name", "junk")
    val aligned = SchemaDrift.alignTo(drifted, target)
    // compare names + types; nullability may tighten (source id is non-null)
    assert(aligned.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === target.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = aligned.collect().head
    assert(r.getLong(0) === 1L)        // int -> long cast
    assert(r.isNullAt(1))              // missing column null-filled
    assert(r.getString(2) === "x")     // reordered, junk dropped
  }

  test("aligned drifted frames union cleanly into a fixed sink") {
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val a = SchemaDrift.alignTo(Seq((1L, 1.0)).toDF("id", "v"), target)
    val b = SchemaDrift.alignTo(Seq(2L).toDF("id"), target)
    val u = a.unionByName(b).orderBy("id").collect()
    assert(u.length === 2 && u(1).isNullAt(1))
  }
}
