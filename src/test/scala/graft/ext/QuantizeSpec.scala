package graft.ext

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

class QuantizeSpec extends GraftSpec {
  import spark.implicits._

  test("int8 codes bounded, error within scale/2, zero vector safe") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .unionAll(Seq((-1L, Seq.fill(8)(0.0f), 0)).toDF("vec_id", "embedding", "label"))
    val q = Quantize.quantizeInt8(emb, "vec_id", "embedding")
    val n = q.count()
    assert(n == emb.count())
    // |code| ≤ 127 everywhere
    assert(q.filter(exists(col("q"), c => abs(c) > 127)).count() == 0)
    // symmetric HALF_UP bound: |q_i·scale − x_i| ≤ scale/2 exactly
    assert(q.filter(col("max_err") > col("scale") / 2).count() == 0)
    val zero = q.filter(col("vec_id") === -1L).collect()(0)
    assert(zero.getAs[Double]("scale") == 0.0)
    assert(zero.getAs[Double]("max_err") == 0.0)
    assert(zero.getSeq[Int](zero.fieldIndex("q")).forall(_ == 0))
  }

  test("quantized cosine approximates exact cosine") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings").limit(200)
    val q = Quantize.quantizeInt8(emb, "vec_id", "embedding")
      .join(emb, "vec_id")
      .select(col("vec_id"),
        transform(col("q"), c => (c.cast("double") * col("scale")).cast("float"))
          .as("deq"), col("embedding"))
    val err = q.select(
        (Similarity.nativeDot(col("deq"), col("embedding"))
          / (Similarity.norm(col("deq")) * Similarity.norm(col("embedding"))))
          .as("cos"))
      .agg(min(col("cos"))).collect()(0).getDouble(0)
    assert(err > 0.999, s"dequantized self-cosine dropped to $err")
  }
}
