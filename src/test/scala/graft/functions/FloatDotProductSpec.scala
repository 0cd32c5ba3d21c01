package graft.functions

import graft.{GraftSpec, Tables}
import graft.ext.Similarity
import org.apache.spark.sql.functions._

class FloatDotProductSpec extends GraftSpec {
  import spark.implicits._

  test("graft_dot matches the higher-order-function fold bit-exactly") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings").limit(100)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b"))
    val mismatches = a.crossJoin(b.limit(5))
      .select(
        Similarity.dot(col("a"), col("b")).as("hof"),
        Similarity.nativeDot(col("a"), col("b")).as("native"))
      .filter(col("hof") =!= col("native")) // exact double compare
      .count()
    assert(mismatches == 0)
  }

  test("null semantics: length mismatch, null element, null array → NULL") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),         // 11.0
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),               // length mismatch
      (Some(Seq(1.0f, 2.0f)), None)                           // null array
    ).toDF("a", "b")
    val r = df.select(Similarity.nativeDot(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))

    val withNullElem = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, NULL) AS ARRAY<FLOAT>), " +
        "CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS d")
    val row = withNullElem.collect()(0)
    info(s"null-element row: $row")
    assert(row.isNullAt(0))
  }

  test("registered as a SQL function via session extensions") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>), " +
        "CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d")
    assert(r.collect()(0).getDouble(0) == 32.0)
  }

  test("native functions reject wrong arity instead of ignoring arguments") {
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // an extra argument must error, never be silently discarded
    val e1 = intercept[Throwable](
      spark.sql("SELECT graft_top_bigram(array('a', 'b'), 5)").collect())
    assert(messages(e1).contains("exactly 1 argument"), messages(e1))
    val e2 = intercept[Throwable](
      spark.sql("SELECT graft_dot(CAST(array(1.0) AS ARRAY<FLOAT>))").collect())
    assert(messages(e2).contains("exactly 2 arguments"), messages(e2))
  }
}
