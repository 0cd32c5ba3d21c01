package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sinks.ParquetSink

/** Golden end-to-end test: fixture CLF files through the full pipeline,
  * compared to hand-computed values (the reference's Athena validation
  * checks, `/root/reference/README.md:64-66`, as assertions). */
class PipelineSpec extends GraftSpec {

  private val lines1 = Seq(
    // user 7: two GETs, one 200 one 404
    """10.0.0.1 - 7 [13/Nov/2015:11:45:42 +0000] "GET /a HTTP/1.0" 200 100 "-" "ua/1"""",
    """10.0.0.1 - 7 [13/Nov/2015:11:46:00 +0000] "GET /b HTTP/1.0" 404 50 "-" "ua/1"""",
    // user 9: one POST 200, null identity and size
    """10.0.0.2 - 9 [13/Nov/2015:12:00:00 +0000] "POST /c HTTP/1.1" 200 - "http://r" "ua/2""""
  )
  private val lines2 = Seq(
    // anonymous user (null user_id), 200
    """10.0.0.3 - - [13/Nov/2015:13:00:00 +0000] "GET /d HTTP/1.1" 200 10 "-" "ua/3"""",
    "this line is not CLF at all" // reject
  )

  test("fixture logs → staged partition, golden aggregates, archived inputs") {
    val root = Files.createTempDirectory("graft_pipeline").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    Files.write(Paths.get(inbox, "2015-11-13.log"),
      String.join("\n", lines1: _*).getBytes)
    Files.write(Paths.get(inbox, "2015-11-13b.log"),
      String.join("\n", lines2: _*).getBytes)
    Files.write(Paths.get(inbox, "notes.txt"), "ignore me".getBytes)

    val report = Pipeline.run(spark,
      inputDir = inbox,
      stagingPath = s"$root/staging",
      date = "2015-11-13",
      sink = new ParquetSink(s"$root/results"),
      archiveDir = Some(s"$root/processed"),
      catalogTable = Some("graft_pipeline_staged"))

    // only *.log files admitted
    assert(report.inputFiles.length == 2)
    assert(report.inputFiles.forall(_.endsWith(".log")))
    // 5 lines parsed into rows (malformed → all-null row), 1 reject counted
    assert(report.parsedRows == 5)
    assert(report.rejectRows == 1)
    // golden scalars: distinct users {7, 9}; successful = 3 (two users + anon)
    assert(report.userCount == 2)
    assert(report.totalSuccessful == 3)

    // staged layout is partition-pruned readable, directly and via catalog
    val day = graft.stage.Staging.readDay(spark, s"$root/staging", "2015-11-13")
    assert(day.count() == 5)
    assert(Files.exists(Paths.get(s"$root/staging/date=2015-11-13")))
    assert(spark.table("graft_pipeline_staged").count() == 5)
    // catalog schema is the DECLARED canonical cleansed schema (SURVEY
    // §1.3) + date partition — not whatever inference produced
    assert(spark.table("graft_pipeline_staged").schema ==
      graft.stage.Staging.stagedSchema)

    // per-user counts golden: 7→2, 9→1 (null user counted too: count(request_resource))
    val rpu = spark.read.parquet(s"$root/results/user_requests")
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(rpu(Some(7L)) == 2L && rpu(Some(9L)) == 1L)

    // totals appended exactly one row
    val totals = spark.read.parquet(s"$root/results/total_requests").collect()
    assert(totals.length == 1 && totals(0).getAs[String]("run_date") == "2015-11-13")

    // inputs archived out of the inbox; non-log file untouched
    assert(!Files.exists(Paths.get(inbox, "2015-11-13.log")))
    assert(Files.exists(Paths.get(s"$root/processed/2015-11-13.log")))
    assert(Files.exists(Paths.get(s"$root/processed/2015-11-13b.log")))
    assert(Files.exists(Paths.get(inbox, "notes.txt")))

    // second run on the drained inbox: nothing to do, earlier staging intact
    val again = Pipeline.run(spark, inbox, s"$root/staging", "2015-11-14",
      new ParquetSink(s"$root/results"), Some(s"$root/processed"))
    assert(again.parsedRows == 0)
    assert(graft.stage.Staging.readDay(spark, s"$root/staging", "2015-11-13").count() == 5)
  }

  test("dynamic partition overwrite: re-staging one day leaves others intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stage_dyn").toString
    val d1 = Seq(("a", "2020-01-01"), ("b", "2020-01-02")).toDF("v", "date")
    graft.stage.Staging.stage(d1, root)
    val d2 = Seq(("c", "2020-01-02")).toDF("v", "date") // re-stage day 2 only
    graft.stage.Staging.stage(d2, root)
    val all = spark.read.parquet(root)
      .select(col("v"), col("date").cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(all == Set(("a", "2020-01-01"), ("c", "2020-01-02")))
  }
}
