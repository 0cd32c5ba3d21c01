package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Loader for the driver-generated parquet tables (TESTDATA.md).
 *
 * The testdata was written with nanosecond-precision timestamps
 * (parquet INT64 TIMESTAMP(NANOS)), which Spark's vectorized reader
 * rejects. We read them as nano longs (legacy conf) and convert to
 * TimestampType (micros) right at the scan, so every downstream operator
 * sees plain timestamps.
 */
object Tables {

  /** Timestamp columns per table that arrive as TIMESTAMP(NANOS). */
  private val tsCols: Map[String, Seq[String]] = Map(
    "events"   -> Seq("ts"),
    "orders"   -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate")
  )

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The DuckDB oracle compares naive UTC-stored parquet values; every
    // timestamp-rendering function (date_format/to_date) must therefore run
    // in UTC regardless of the host machine's zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    tsCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.columns.contains(c) && d.schema(c).dataType == LongType)
        // integer `div` (not `/`, which is double and loses nano precision)
        d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      else d
    }
  }
}
