package graft

import org.apache.spark.sql.functions._

/** The mergeable-HLL distinct-count workflow (q69): per-group sketches
  * folded with hll_union_agg must estimate exactly what one direct
  * global sketch estimates (register-wise union is lossless), and at
  * harness cardinalities the DataSketches HLL stays in its exact
  * (coupon) regime, so the estimate IS the exact distinct count — the
  * same argument that makes q58's sketch top-k oracle exact. */
class HllMergeSpec extends GraftSpec {
  import spark.implicits._

  test("union of per-group sketches == direct sketch == exact, in the coupon regime") {
    // 2000 distinct keys spread over 7 groups. The coupon (exact) regime
    // ends when the coupon set outgrows ~k/4 — 4096 at lgK=14 (measured:
    // 5000 keys already estimates 4979) — so 2000 sits safely inside,
    // and the q69 harness cardinality (150 users) more so.
    val df = (1L to 20000L).map(i => (i % 7, (i * 2654435761L) % 2000L))
      .toDF("g", "k")

    val merged = df.groupBy("g")
      .agg(hll_sketch_agg(col("k"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(14))).as("est"))
      .head().getLong(0)
    val exact = df.select("k").distinct().count()

    assert(merged == direct, s"merge lost information: $merged vs $direct")
    assert(merged == exact, s"expected exact coupon-regime count: $merged vs $exact")
  }

  test("dense regime: estimate stays within 3 standard errors") {
    val n = 200000L
    val df = (1L to n).toDF("k")
    val est = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), lit(14))).as("est"))
      .head().getLong(0)
    val rse = 1.04 / math.sqrt(1 << 14)
    assert(math.abs(est - n).toDouble / n < 3 * rse,
      s"estimate $est too far from $n (rse $rse)")
  }
}
