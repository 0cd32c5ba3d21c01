package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends GraftSpec {
  import spark.implicits._

  private lazy val docs = (1L to 100L)
    .map(i => (i, s"document number $i body", if (i % 2 == 0) "en" else "es"))
    .toDF("doc_id", "text", "lang")

  test("hashSample: deterministic, repartition-stable, pure filter") {
    val a = Sampling.hashSample(docs, col("text"), "80")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), col("text"), "80")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)                       // stable under repartitioning
    assert(a.nonEmpty && a.size < 100)   // ceil "80" keeps ≈ half
    // no shuffle: the sample is a filter over the scan
    val p = Sampling.hashSample(docs, col("text"), "80")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"))
  }

  test("stratifiedTake: exactly k per stratum, rank order stable") {
    val taken = Sampling.stratifiedTake(docs, "lang", col("text"), "doc_id", 5)
      .select($"lang", $"doc_id", $"rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(taken.count(_._1 == "en") == 5 && taken.count(_._1 == "es") == 5)
    assert(taken.filter(_._1 == "en").map(_._3).sorted.sameElements(1L to 5L))
    // same quota on a reshuffled input → identical selection
    val again = Sampling.stratifiedTake(docs.repartition(13), "lang",
        col("text"), "doc_id", 5)
      .select($"lang", $"doc_id", $"rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(taken.toSet == again.toSet)
  }

  test("pack: offsets are per-shard prefix sums; bins chunk the stream") {
    val r = Packing.pack(docs, "doc_id", size(TextOps.tokens(col("text"))),
        contextLen = 10L, shards = 2)
      .collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("shard"), x.getAs[Long]("n_tokens"),
          x.getAs[Long]("tok_offset"), x.getAs[Long]("bin")))
      .toMap
    // every doc is "document number N body" → 4 tokens
    assert(r.values.forall(_._2 == 4L))
    // shard 0 = even ids ordered 2,4,6,…: offsets 0,4,8,…
    assert(r(2L) == (0L, 4L, 0L, 0L))
    assert(r(4L) == (0L, 4L, 4L, 0L))
    assert(r(6L) == (0L, 4L, 8L, 0L))   // starts inside bin 0 (8 < 10)
    assert(r(8L) == (0L, 4L, 12L, 1L))  // next context window
    // shard 1 = odd ids 1,3,5,…
    assert(r(1L) == (1L, 4L, 0L, 0L))
    assert(r(3L) == (1L, 4L, 4L, 0L))
  }
}
