package graft

import org.apache.spark.sql.functions._

import graft.analytics.StatsTests
import graft.ext.Eval

/** The super-linear-operator contract guards: a doc-comment contract
  * ("run on the eval sample", "aggregate to buckets first") becomes a
  * fail-fast runtime check — the r12 advice for liftTable/mannKendall. */
class GuardsSpec extends GraftSpec {
  import spark.implicits._

  test("requireRowsAtMost: passes at the cap, throws over it, 0 opts out") {
    val df = spark.range(100).toDF("x")
    Guards.requireRowsAtMost(df, 100L, "test") // exactly at cap: fine
    val e = intercept[IllegalArgumentException] {
      Guards.requireRowsAtMost(df, 99L, "test-contract")
    }
    assert(e.getMessage.contains("test-contract"))
    Guards.requireRowsAtMost(df, 0L, "test") // explicit opt-out
  }

  test("requireBlockPairsAtMost: probes the within-block pair count " +
    "exactly, throws over the cap naming the scale path, 0 opts out") {
    // two blocks of 4 and 3 rows → 4·3/2 + 3·2/2 = 9 within-block pairs
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
                 ("b", 5), ("b", 6), ("b", 7)).toDF("blk", "x")
    Guards.requireBlockPairsAtMost(df, "blk", 9L, "test") // at the cap: fine
    val e = intercept[IllegalArgumentException] {
      Guards.requireBlockPairsAtMost(df, "blk", 8L, "test-contract")
    }
    assert(e.getMessage.contains("test-contract"))
    assert(e.getMessage.contains("q21"), "must name the LSH scale path")
    assert(e.getMessage.contains("q84"), "must name the ANN-dedup scale path")
    Guards.requireBlockPairsAtMost(df, "blk", 0L, "test") // explicit opt-out
    // empty input: zero pairs, any positive cap passes
    Guards.requireBlockPairsAtMost(df.filter(lit(false)), "blk", 1L, "test")
  }

  test("nearDupPairsBlocked: the Σ|block|² contract is enforced at plan " +
    "build; an in-contract frame is unaffected; 0 opts out") {
    val emb = Seq((1L, Array(1.0f, 0.0f), "x"), (2L, Array(1.0f, 0.0f), "x"),
                  (3L, Array(0.0f, 1.0f), "x"), (4L, Array(1.0f, 0.0f), "y"))
      .toDF("id", "vec", "blk")
    // 3-row block x + 1-row block y = 3 pairs; cap 2 must throw
    intercept[IllegalArgumentException] {
      graft.ext.Similarity.nearDupPairsBlocked(
        emb, "id", "vec", "blk", threshold = 0.9, maxBlockPairs = 2L)
    }
    // default cap: unaffected result; opt-out: identical result
    val guarded = graft.ext.Similarity.nearDupPairsBlocked(
      emb, "id", "vec", "blk", threshold = 0.9).collect()
    val optOut = graft.ext.Similarity.nearDupPairsBlocked(
      emb, "id", "vec", "blk", threshold = 0.9, maxBlockPairs = 0L).collect()
    assert(guarded.toSeq == optOut.toSeq)
    assert(guarded.map(r => (r.getLong(1), r.getLong(2))).toSet == Set((1L, 2L)))
  }

  test("liftTable: the eval-sample contract is enforced, and an " +
    "in-contract frame is unaffected") {
    val df = (1 to 50)
      .map(i => (i.toDouble, i % 3 == 0, i.toLong)).toDF("s", "y", "id")
    intercept[IllegalArgumentException] {
      Eval.liftTable(df, col("s"), col("y"), col("id"),
        buckets = 5, maxRows = 10L)
    }
    assert(Eval.liftTable(df, col("s"), col("y"), col("id"), buckets = 5)
      .count() == 5L)
  }

  test("mannKendall: the series contract is enforced (the all-pairs " +
    "self-join is series-squared), in-contract series unaffected") {
    val series = (1 to 50).map(i => (i, (i % 7).toDouble)).toDF("o", "v")
    intercept[IllegalArgumentException] {
      StatsTests.mannKendall(series, "o", "v", maxPoints = 10L)
    }
    assert(StatsTests.mannKendall(series, "o", "v").count() == 1L)
  }
}
