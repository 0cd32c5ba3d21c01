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
