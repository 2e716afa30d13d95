package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("emails, phones, urls → typed placeholders; clean text untouched") {
    val df = Seq(
      "contact john.doe@foo.org or call +1 (555) 123-4567",
      "see https://x.io/page?id=1 now",
      "mail user7@mail.example.com and +1-555-07 twice: a@b.io",
      "nothing to hide here").toDF("t")
    val out = df.select(Redact.redact(col("t")).as("c")).as[String].collect()
    assert(out(0) == "contact [EMAIL] or call [PHONE]")
    assert(out(1) == "see [URL] now")
    assert(out(2) == "mail [EMAIL] and [PHONE] twice: [EMAIL]")
    assert(out(3) == "nothing to hide here")
  }

  test("a URL embedding an @ is one [URL], not an [EMAIL]") {
    val out = Seq("go http://u:p@host.com/x y").toDF("t")
      .select(Redact.redact(col("t"))).as[String].collect().head
    assert(out == "go [URL] y")
  }
}
