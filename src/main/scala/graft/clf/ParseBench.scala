package graft.clf

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: single-pass parse vs the old per-group-extract shape. */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    val ev = Tables(spark, "/root/testdata/sf0.1", "events")
    val lines = ev.select(ClfParser.format(
      ip = lit("10.0.0.1"), userId = col("user_id"), ts = col("ts"),
      method = lit("GET"), resource = concat(lit("/r/"), col("event_type")),
      protocol = lit("HTTP/1.1"), status = lit(200L), size = col("event_id"),
      referer = lit("https://example.com/x"), agent = lit("graft/1.0")
    ).as("value"))
      .withColumn("value", explode(array_repeat(col("value"), 10)))
      .cache()
    lines.count()

    def grp(v: Column, i: Int): Column =
      nullif(nullif(regexp_extract(v, ClfParser.clfRegex, i), lit("")), lit("-"))
    def oldParse = lines.select((1 to 9).map(i => grp(col("value"), i).as(s"f$i")): _*)
    def newParse = ClfParser.parse(lines)

    // force evaluation of every parsed column (bare count() lets the
    // optimizer prune the projection away entirely)
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
        .agg(sum(pmod(col("h"), lit(1000000L)))).collect()(0).getLong(0)
    def time(n: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("[parsebench] warming old"); force(oldParse)
    println("[parsebench] warming new"); force(newParse)
    val o = (1 to 3).map(_ => time("old")(force(oldParse)))
    val n = (1 to 3).map(_ => time("new")(force(newParse)))
    def noTs = ClfParser.parse(lines).drop("time")
    force(noTs)
    val nt = (1 to 3).map(_ => time("nots")(force(noTs)))
    println(f"[parsebench] new minus timestamp:  ${nt.min}%.3f s")
    println(f"[parsebench] old per-group extract: ${o.min}%.3f s min of ${o.map(x => f"$x%.2f").mkString(",")}")
    println(f"[parsebench] new single-pass:       ${n.min}%.3f s min of ${n.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
