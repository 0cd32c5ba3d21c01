package graft.ext

import graft.{GraftSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends GraftSpec {
  import spark.implicits._

  test("salted join equals the plain inner join on real tables") {
    val events = Tables(spark, "/root/testdata/sf0.01", "events")
    val customer = Tables(spark, "/root/testdata/sf0.01", "customer")
    val plain = events.join(customer, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_custkey"))
    val salted = SkewJoin.saltedJoin(events, customer,
        "user_id", "c_custkey", saltSrc = col("event_id"), salts = 8)
      .select(col("event_id"), col("c_custkey"))
    assert(plain.count() > 0)
    assert(plain.unionAll(salted).distinct().count() == plain.distinct().count(),
      "salted join diverged from the plain join")
    assert(salted.count() == plain.count(), "row multiplicity changed")
  }

  test("both sides naming the key identically still joins (frame-qualified condition)") {
    // the most common join shape: fact.user_id == dim.user_id — an
    // unqualified col("user_id") condition would die with an
    // ambiguous-reference AnalysisException before running
    val big = ((1L to 100L).map(i => (42L, i)) ++ Seq((7L, 0L)))
      .toDF("user_id", "src")
    val small = Seq((42L, "hot"), (7L, "cold")).toDF("user_id", "v")
    val out = SkewJoin.saltedJoin(big, small,
      "user_id", "user_id", saltSrc = col("src"), salts = 4)
    assert(out.count() == 101L)
    assert(out.filter(col("v") === "hot").count() == 100L)
  }

  test("a hot key's rows spread over multiple salt partitions; join shuffles") {
    // one hot key carrying 1000 rows, 10 cold keys
    val big = ((1L to 1000L).map(i => (42L, i)) ++ (1L to 10L).map(i => (i, -i)))
      .toDF("k", "src")
    val small = ((1L to 10L).map(i => (i, s"v$i")) :+ (42L, "hot")).toDF("sk", "v")
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", col("src"), salts = 8)
    assert(salted.count() == 1000L + 10L)
    // the hot key actually uses > 1 distinct salt (the spread is real)
    val spread = big.filter(col("k") === 42L)
      .select(pmod(xxhash64(col("src")), lit(8L)).as("salt"))
      .distinct().count()
    assert(spread > 1, s"hot key landed on $spread salt(s)")
    // the hint holds: a shuffled hash join, not a broadcast
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p.linesIterator.take(8).mkString("\n"))
  }
}
