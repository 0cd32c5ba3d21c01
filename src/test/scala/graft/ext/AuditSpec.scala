package graft.ext

import org.apache.spark.sql.functions._

import graft.GraftSpec

class AuditSpec extends GraftSpec {
  import spark.implicits._

  test("profile: null counts, exact cardinality, native-type min/max") {
    val df = Seq[(java.lang.Long, String)](
      (9L, "b"), (10L, "a"), (10L, null), (null, "a")
    ).toDF("id", "s")
    val got = Audit.profile(df, Seq("id", "s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    // min/max on the NATIVE long: 9 < 10 — a string-ordered profile
    // would report min "10", the classic silent-corruption bug
    assert(got == Seq(
      ("id", 4L, 1L, 2L, "9", "10"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profile: NULL-only and empty inputs degrade to NULL range") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((null, 1L), (null, 2L))
      .toDF("a", "b")
    val row = Audit.profile(df, Seq("a")).collect()(0)
    assert((row.getLong(1), row.getLong(2), row.getLong(3)) == (2L, 2L, 0L))
    assert(row.isNullAt(4) && row.isNullAt(5))
    val empty = Audit.profile(df.filter(lit(false)), Seq("a")).collect()(0)
    assert((empty.getLong(1), empty.getLong(2), empty.getLong(3)) == (0L, 0L, 0L))
    intercept[IllegalArgumentException] { Audit.profile(df, Seq.empty) }
  }

  test("profile: approx mode folds all columns without Expand; exact pays it") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "s")
    val exactPlan = Audit.profile(df, Seq("id", "s"), exact = true)
      .queryExecution.executedPlan.toString
    val approxPlan = Audit.profile(df, Seq("id", "s"), exact = false)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan)
    assert(!approxPlan.contains("Expand"), approxPlan)
    // approx counts are exact at this cardinality (HLL++ tiny range)
    val a = Audit.profile(df, Seq("id", "s"), exact = false).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(a == Map("id" -> 3L, "s" -> 2L))
  }

  test("integrity: dups, orphans, and NULL keys are each counted once, " +
    "in the right bucket") {
    val left = Seq[java.lang.Long](1L, 1L, 2L, 3L, null)
      .toDF("lk")
    val right = Seq[java.lang.Long](2L, 2L, 4L, null, null)
      .toDF("rk")
    val got = Audit.integrity(left, "lk", right, "rk").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map(
      "left_null_keys" -> 1L, "right_null_keys" -> 2L,
      "left_dup_keys" -> 1L,  // key 1 appears twice
      "right_dup_keys" -> 1L, // key 2 appears twice
      "left_orphans" -> 2L,   // keys 1, 3 have no right match
      "right_orphans" -> 1L,  // key 4 has no left match
      "matched_keys" -> 1L))  // key 2
  }

  test("integrity: a clean 1:1 keyed pair reports all-zero defects") {
    val a = Seq(1L, 2L, 3L).toDF("k1")
    val b = Seq(3L, 1L, 2L).toDF("k2")
    val got = Audit.integrity(a, "k1", b, "k2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.filterNot(_._1 == "matched_keys").values.forall(_ == 0L))
    assert(got("matched_keys") == 3L)
  }

  test("skewProfile: heaviest keys first, exact shares, NULL ranked as a " +
    "first-class key, k caps the output") {
    val df = (Seq.fill(6)(Option(7L)) ++ Seq.fill(3)(Option(8L)) ++
      Seq.fill(3)(Option.empty[Long]))
      .toDF("k")
    val got = Audit.skewProfile(df, "k", k = 2)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    // 12 rows total: key 7 owns 0.5; the 3-row tie between NULL and 8
    // breaks NULLS FIRST
    assert(got == Seq(
      (Some("7"), 6L, 0.5, 1L),
      (None, 3L, 0.25, 2L)))
    assert(Audit.skewProfile(df, "k", k = 10).count() == 3L)
    intercept[IllegalArgumentException] { Audit.skewProfile(df, "k", 0) }
  }

  test("valueDeciles: ntile splits per group with the id tiebreak; NULL " +
    "values carry no rank") {
    // group A: 5 values into 2 bins → sizes 3+2, ordered by (value, id);
    // the duplicate value 2.0 bins deterministically by id
    val df = Seq(
      (1L, "A", Some(1.0)), (2L, "A", Some(2.0)), (3L, "A", Some(2.0)),
      (4L, "A", Some(3.0)), (5L, "A", Some(4.0)),
      (6L, "B", Some(9.0)), (7L, "B", None)
    ).toDF("event_id", "k", "v")
    val got = Audit.valueDeciles(df, "k", "v", "event_id", bins = 2)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(("A", 1L)) == ((3L, 1.0, 2.0))) // ids 1,2,3
    assert(got(("A", 2L)) == ((2L, 3.0, 4.0))) // ids 4,5
    assert(got(("B", 1L)) == ((1L, 9.0, 9.0)))
    assert(!got.contains(("B", 2L)), "a 1-row group fills only bin 1")
    intercept[IllegalArgumentException] {
      Audit.valueDeciles(df, "k", "v", "event_id", 0)
    }
  }

  test("groupQuantiles: type-7 interpolation on a hand case; NULLs out; " +
    "probs validated") {
    val df = Seq(("A", Some(1.0)), ("A", Some(2.0)), ("A", Some(3.0)),
      ("A", Some(4.0)), ("A", None), ("B", Some(10.0)))
      .toDF("k", "v")
    val got = Audit.groupQuantiles(df, "k", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    // A: sorted 1,2,3,4 → p50 at (4-1)*0.5=1.5 → 2.5; p90 at 2.7 → 3.7
    assert(got("A") == ((2.5, 3.7)))
    assert(got("B") == ((10.0, 10.0)))
    intercept[IllegalArgumentException] {
      Audit.groupQuantiles(df, "k", "v", Seq(1.0))
    }
  }
}
