package graft

import org.apache.spark.sql.functions._

/** q58's validity argument, pinned: with maxItemsTracked ≥ the distinct
  * key count the DataSketches frequent-items map never purges, so every
  * reported count is exact — which is what lets q58 share a plain exact
  * top-k oracle. If a Spark upgrade changes the function's shape
  * (argument order, struct field names) or its no-purge exactness, this
  * fails before the correctness gate does. */
class HeavyHittersSpec extends GraftSpec {
  import spark.implicits._

  test("approx_top_k counts are exact when the tracked map fits the domain") {
    val e = Tables(spark, "/root/testdata/sf0.01", "events")
      .filter(col("user_id").isNotNull)
    val sketch = e
      .agg(call_function("approx_top_k",
        col("user_id"), lit(200), lit(1024)).as("tk"))
      .select(explode(col("tk")).as("s"))
      .select(col("s.item").as("user_id"), col("s.count").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = e.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sketch == exact, "sketch diverged from exact counts — purge happened?")
  }

  test("accumulate → combine → estimate equals the single-pass sketch") {
    // the mergeable-sketch workflow: per-type sub-sketches combined into
    // one, estimates still exact while no purge happens — what a 100-TB
    // pipeline persists per day/partition and folds at query time
    val e = Tables(spark, "/root/testdata/sf0.01", "events")
      .filter(col("user_id").isNotNull)
    val merged = e.groupBy(col("event_type"))
      .agg(call_function("approx_top_k_accumulate",
        col("user_id"), lit(1024)).as("sk"))
      .agg(call_function("approx_top_k_combine", col("sk"), lit(1024)).as("sk"))
      .select(explode(call_function("approx_top_k_estimate",
        col("sk"), lit(200))).as("s"))
      .select(col("s.item").as("user_id"), col("s.count").as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = e.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == exact, "combined sub-sketches diverged from exact counts")
  }

  test("q58 equals the exact top-10 with the (cnt desc, user) tie-break") {
    val got = SparkEntry.queries("q58_heavy_hitters")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Tables(spark, "/root/testdata/sf0.01", "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (u, c) => (-c, u) }.take(10).toSeq
    assert(got == expected)
  }
}
