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
}
