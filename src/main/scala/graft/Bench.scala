package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: times every declared query on `SPARK_GRAFT_SF_DIR`
 * (default sf0.1) and prints ONE JSON line for the driver.
 *
 * Steady-state measurement: each query first runs once on the tiny
 * sf0.001 tables (untimed) so Janino codegen + C2 JIT of its operator
 * pipeline happen outside the timed region. A fresh JVM otherwise charges
 * ~5-10 s of one-time compilation to whichever query first touches an
 * operator (measured: first `explode` in a session = 5.7 s, second = 0.3 s
 * — the entire BENCH_r01 q18 anomaly). The warm-up data is 100× smaller
 * than the timed data, so it contributes compilation, not caching, and the
 * timed numbers reflect what a long-lived cluster session would see.
 *
 * A query that throws is recorded under "errors" and makes the exit code
 * nonzero — a broken query must never look green in BENCH.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () } // warm-up failure surfaces in the timed run
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
