package graft.functions

import graft.GraftSpec
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggSpec extends GraftSpec {
  import spark.implicits._

  private val topk5 = udaf(new TopKAggregator(5), ExpressionEncoder[TopKEntry]())

  test("equals the window top-k twin on fuzzed grouped counts") {
    // 40 groups × skewed item counts, deterministic LCG "randomness"
    val rows = (1L to 20000L).map { i =>
      val g = (i * 2654435761L) % 40L
      val item = (i * 40503L) % 500L
      (g, item)
    }
    val counts = rows.toDF("g", "item")
      .groupBy("g", "item").agg(count(lit(1)).as("cnt"))

    val viaAgg = counts
      .groupBy("g")
      .agg(topk5(col("cnt"), col("item")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("e.item").as("item"), col("e.metric").as("cnt"))

    val w = Window.partitionBy("g").orderBy(col("cnt").desc, col("item").asc)
    val viaWindow = counts
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk"), col("item"), col("cnt"))

    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "aggregator top-k diverged from the window formulation")
  }

  test("groups smaller than k return all their rows, ordered") {
    val df = Seq((1L, 10L, 7L), (1L, 11L, 7L), (1L, 12L, 9L))
      .toDF("g", "item", "cnt")
    val out = df.groupBy("g")
      .agg(topk5(col("cnt"), col("item")).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.metric"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // metric desc, item asc on ties — and nothing invented beyond 3 rows
    assert(out == Seq((12L, 9L), (10L, 7L), (11L, 7L)))
  }

  test("the plan is a partial/final aggregate pair — map-side combine, no sort of the input") {
    val counts = (1L to 1000L).map(i => (i % 10, i % 97, i))
      .toDF("g", "item", "cnt")
    val plan = counts.groupBy("g")
      .agg(topk5(col("cnt"), col("item")).as("tk"))
      .queryExecution.executedPlan.toString
    // typed Aggregator → ObjectHashAggregate, and two of them
    // (partial before the exchange, final after): the k-bounded buffer
    // is what crosses the shuffle, never the input rows
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("Sort "), s"unexpected input sort:\n$plan")
  }
}
