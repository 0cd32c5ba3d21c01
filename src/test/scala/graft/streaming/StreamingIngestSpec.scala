package graft.streaming

import java.nio.file.{Files, Path, Paths}
import graft.GraftSpec

class StreamingIngestSpec extends GraftSpec {

  private def line(user: Long, res: String): String =
    s"""10.0.0.1 - $user [13/Nov/2015:11:45:42 +0000] "GET $res HTTP/1.0" 200 1 "-" "ua""""

  private def countArchived(dir: String): Long = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(f => f.toString.endsWith(".log")).count()
      finally s.close()
    }
  }

  test("two drains over one checkpoint: exactly-once, archived inputs") {
    val root = Files.createTempDirectory("graft_stream").toString
    val inbox = s"$root/inbox"; Files.createDirectories(Paths.get(inbox))
    def staged(): Long = spark.read.parquet(s"$root/staging").count()

    Files.write(Paths.get(inbox, "a.log"),
      (line(1, "/x") + "\n" + line(2, "/y")).getBytes)
    StreamingIngest.runOnce(spark, inbox, s"$root/staging",
      s"$root/checkpoint", s"$root/archive")
    assert(staged() == 2)

    // second drain with one new file: only the new rows append
    Files.write(Paths.get(inbox, "b.log"), line(3, "/z").getBytes)
    StreamingIngest.runOnce(spark, inbox, s"$root/staging",
      s"$root/checkpoint", s"$root/archive")
    assert(staged() == 3)

    // third drain, nothing new: no duplicates, and by now the earlier
    // batches' files have been archived out of the inbox
    StreamingIngest.runOnce(spark, inbox, s"$root/staging",
      s"$root/checkpoint", s"$root/archive")
    assert(staged() == 3)
    assert(countArchived(s"$root/archive") >= 1)
    assert(!Files.exists(Paths.get(inbox, "a.log")))

    // staged layout is date-partitioned from event time
    assert(Files.exists(Paths.get(s"$root/staging/date=2015-11-13")))
  }
}
