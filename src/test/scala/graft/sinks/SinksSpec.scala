package graft.sinks

import graft.GraftSpec

class SinksSpec extends GraftSpec {
  import spark.implicits._

  test("ParquetSink: overwrite replaces, append accumulates") {
    val root = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val sink = new ParquetSink(root)

    sink.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t1")
    sink.overwrite(Seq((3L, "c")).toDF("k", "v"), "t1")
    assert(spark.read.parquet(s"$root/t1").count() == 1L) // replaced

    sink.append(Seq((1L, 10L)).toDF("d", "n"), "t2")
    sink.append(Seq((2L, 20L)).toDF("d", "n"), "t2")
    val rows = spark.read.parquet(s"$root/t2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L), (2L, 20L))) // accumulated
  }

  test("JdbcSink: overwrite/append execute through DataFrameWriter.jdbc (Derby)") {
    // Embedded Derby (on Spark's classpath for the Hive metastore) stands in
    // for the reference's Oracle endpoint — same writer path, same modes
    // (`sree-etl-tdk-glue-job.py:71-77` overwrite, `:88-94` append), no
    // network. In-memory DB, unique per run, lives for the JVM.
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val sink = new JdbcSink(url, props)

    // overwrite: second write fully replaces the table
    sink.overwrite(Seq((1L, 5L), (2L, 7L)).toDF("user_id", "requests_count"),
      "user_requests")
    sink.overwrite(Seq((3L, 9L)).toDF("user_id", "requests_count"),
      "user_requests")
    val ur = spark.read.jdbc(url, "user_requests", props)
    assert(ur.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 9L)))

    // append: one totals row per run accumulates
    val t1 = Seq(("2026-08-12", 10L, 42L))
      .toDF("run_date", "user_count", "total_successful_requests")
    val t2 = Seq(("2026-08-13", 11L, 43L))
      .toDF("run_date", "user_count", "total_successful_requests")
    sink.append(t1, "total_requests")
    sink.append(t2, "total_requests")
    val tot = spark.read.jdbc(url, "total_requests", props)
    assert(tot.count() == 2L)
    assert(tot.select("run_date").collect().map(_.getString(0)).toSet ==
      Set("2026-08-12", "2026-08-13"))
  }
}
