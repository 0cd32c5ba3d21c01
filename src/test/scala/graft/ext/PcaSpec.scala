package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class PcaSpec extends GraftSpec {
  import spark.implicits._

  /** Points along a planted direction u plus small deterministic
    * off-axis wiggle — the top component must recover u. */
  private def planted(n: Int, dim: Int, axis: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { r =>
      val t = (r - n / 2).toDouble / n * 10.0 // dominant coordinate
      (r.toLong, (0 until dim).map { c =>
        val noise = math.sin(r * 12.9898 + c * 78.233) % 1.0 * 0.05
        (if (c == axis) t + noise else noise).toFloat
      })
    }

  test("planted dominant direction is recovered with a dominant " +
    "variance share; orientation is positive") {
    val df = planted(400, 6, axis = 2).toDF("id", "v")
    val (comp, lambda, trace) = Pca.topComponent(df, "v", dim = 6)
    assert(math.abs(comp(2)) > 0.99, comp.toSeq.toString)
    assert(comp(2) > 0, "largest-|coord| entry oriented positive")
    assert(lambda / trace > 0.9, s"share ${lambda / trace}")
    assert(math.abs(comp.map(x => x * x).sum - 1.0) < 1e-6)
  }

  test("partitioning-invariant (exact scaled-long moments) and " +
    "dirty rows are invisible") {
    val base = planted(200, 4, axis = 1)
    val df = base.toDF("id", "v")
    val a = Pca.topComponent(df.repartition(1), "v", 4)
    val b = Pca.topComponent(df.repartition(7), "v", 4)
    assert(a._1.toSeq == b._1.toSeq && a._2 == b._2 && a._3 == b._3)
    val dirty = base.map { case (i, v) => (i, Option(v)) } ++ Seq(
      (900L, Option.empty[Seq[Float]]),
      (901L, Option(Seq(1.0f)))) // wrong dim
    val c = Pca.topComponent(dirty.toDF("id", "v"), "v", 4)
    assert(c._1.toSeq == a._1.toSeq && c._2 == a._2)
  }

  test("removalReport: mean projection ~0 (centered), ms_proj ~ lambda " +
    "(internal consistency), removed_share dominant on planted data") {
    val df = planted(400, 6, axis = 2).toDF("id", "v")
    val (_, lambda, trace) = Pca.topComponent(df, "v", dim = 6)
    val r = Pca.removalReport(df, "v", dim = 6).collect().head
    assert(r.getLong(0) == 400L)
    assert(math.abs(r.getDouble(1)) < 1e-4, s"mean_proj ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - lambda) < 1e-3 * lambda,
      s"ms_proj ${r.getDouble(2)} vs lambda $lambda")
    assert(math.abs(r.getDouble(3) - lambda / trace) < 1e-3,
      "share consistent with the spectrum")
    assert(r.getDouble(3) > 0.9, "planted direction dominates")
  }

  test("frame face carries the component plus tagged lambda/trace rows; " +
    "degenerate inputs are rejected") {
    val df = planted(50, 3, axis = 0).toDF("id", "v")
    val rows = Pca.topComponentFrame(spark, df, "v", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(-2L, -1L, 0L, 1L, 2L))
    val (comp, lambda, trace) = Pca.topComponent(df, "v", 3)
    assert(rows(0L) == comp(0) && rows(-1L) == lambda &&
      rows(-2L) == trace)
    intercept[IllegalArgumentException] {
      Pca.topComponent(df.filter(col("id") < 0), "v", 3)
    }
    intercept[IllegalArgumentException] {
      // constant vectors: zero variance, the power step collapses
      Pca.topComponent(
        (0 until 10).map(i => (i.toLong, Seq(1.0f, 1.0f))).toDF("id", "v"),
        "v", 2)
    }
  }

  test("moment merge law on the spectrum face: split partials fold to " +
    "the one-pass decomposition exactly (q212)") {
    val df = planted(300, 5, axis = 1).toDF("id", "v")
    val one = Pca.decomposition(df, "v", 5)
    val partials = Seq(df.filter(col("id") < 100),
      df.filter(col("id") >= 100))
      .map(Probe.momentPartials(_, "v", lit(0.0), 5))
      .reduce(_ unionByName _)
    val merged = Pca.decompositionFromMoments(
      Probe.mergeMoments(partials), 5)
    assert(merged._1.toSeq == one._1.toSeq &&
      merged._2.toSeq == one._2.toSeq &&
      merged._3 == one._3 && merged._4 == one._4)
  }
}
