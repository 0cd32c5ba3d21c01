package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Loader for the driver-generated parquet tables (TESTDATA.md).
 *
 * The generator's timestamp encoding has varied across harness rounds —
 * nanosecond INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader
 * rejects; read as nano longs via the legacy conf and converted here)
 * and microsecond TIMESTAMP with isAdjustedToUTC=false (which Spark
 * infers as TIMESTAMP_NTZ). Both are naive UTC wall-clock values, and
 * the DuckDB oracle reads them as naive timestamps, so we normalize
 * every variant to plain TimestampType (session TZ is pinned to UTC,
 * making the NTZ→TZ cast value-preserving) right at the scan — every
 * downstream operator sees one timestamp type regardless of the
 * generator's encoding.
 */
object Tables {

  /** Timestamp columns per table whose physical encoding varies. */
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
      if (!d.columns.contains(c)) d
      else d.schema(c).dataType match {
        case LongType =>
          // integer `div` (not `/`, which is double and loses nano precision)
          d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case TimestampNTZType =>
          // value-preserving under the UTC session zone pinned above
          d.withColumn(c, col(c).cast(TimestampType))
        case _ => d
      }
    }
  }
}
