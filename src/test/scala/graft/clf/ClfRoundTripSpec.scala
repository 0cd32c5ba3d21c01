package graft.clf

import graft.GraftSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

// top-level: Spark product encoders cannot reach test-class inner scopes
private[clf] case class RoundTripFields(
    ip: Option[String], userId: Option[Long], epoch: Long,
    method: String, resource: String, protocol: String,
    status: Option[Long], size: Option[Long],
    referer: Option[String], agent: Option[String])

/** ScalaCheck round-trip property: for generated field tuples,
  * `parse(format(fields)) == fields` (SURVEY.md §5.2). Deterministic seed
  * so the suite never flakes; 200 cases per run in one Spark job. */
class ClfRoundTripSpec extends GraftSpec {
  import spark.implicits._

  // printable, no '"' or '\' (format() writes them raw — escape handling
  // is covered separately in ClfParserSpec), no whitespace
  private val safeChar: Gen[Char] =
    Gen.oneOf(('!' to '~').filterNot(c => c == '"' || c == '\\'))
  private def safeStr(min: Int, max: Int): Gen[String] =
    Gen.chooseNum(min, max).flatMap(n => Gen.listOfN(n, safeChar).map(_.mkString))
      // "-" IS the CLF null token — a field equal to it round-trips to
      // NULL by design, so it is not a representable value
      .map(s => if (s == "-") "_" else s)

  private val fieldsGen: Gen[RoundTripFields] = for {
    ip      <- Gen.option(Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString(".")))
    userId  <- Gen.option(Gen.chooseNum(0L, 99999L))
    epoch   <- Gen.chooseNum(0L, 4102444800L) // 1970..2100, second precision
    method  <- Gen.oneOf("GET", "POST", "PUT", "DELETE", "HEAD")
    // resource may contain single spaces (space-tolerant middle tokens)
    resToks <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, safeStr(1, 12)))
    proto   <- Gen.oneOf("HTTP/1.0", "HTTP/1.1", "HTTP/2")
    status  <- Gen.option(Gen.chooseNum(100L, 599L))
    size    <- Gen.option(Gen.chooseNum(0L, 1000000L))
    referer <- Gen.option(safeStr(1, 30))
    agent   <- Gen.option(safeStr(1, 30))
  } yield RoundTripFields(ip, userId, epoch, method, resToks.mkString(" "), proto,
    status, size, referer, agent)

  test("parse ∘ format is identity on 200 generated field tuples") {
    val cases = Gen.listOfN(200, fieldsGen)
      .pureApply(Gen.Parameters.default, Seed(42L))
    val df = cases.toDF()
    val line = ClfParser.format(
      ip = col("ip"), userId = col("userId"),
      ts = timestamp_seconds(col("epoch")),
      method = col("method"), resource = col("resource"),
      protocol = col("protocol"), status = col("status"), size = col("size"),
      referer = col("referer"), agent = col("agent"))
    // parse() keeps only the canonical columns, so re-attach the originals
    // by aligning ids: both frames share the same local partition layout,
    // so monotonically_increasing_id assigns identical ids row-for-row
    val both = df.select(struct(df.columns.map(col): _*).as("o"), line.as("value"))
    val round = ClfParser.parse(both.select(col("value")))
    val checked = both.select(col("o"), col("value"))
      .withColumn("rn", monotonically_increasing_id())
      .join(round.withColumn("rn", monotonically_increasing_id()), "rn")
      .select(
        (col("o.ip") <=> col("ip_address")).as("c1"),
        (col("o.userId") <=> col("user_id")).as("c2"),
        (unix_timestamp(col("time")) <=> col("o.epoch")).as("c3"),
        (col("o.method") <=> col("request_method")).as("c4"),
        (col("o.resource") <=> col("request_resource")).as("c5"),
        (col("o.protocol") <=> col("request_protocol")).as("c6"),
        (col("o.status") <=> col("status_code")).as("c7"),
        (col("o.size") <=> col("size")).as("c8"),
        (col("o.referer") <=> col("referer")).as("c9"),
        (col("o.agent") <=> col("user_agent")).as("c10"))
    val bad = checked.filter(not((1 to 10).map(i => col(s"c$i")).reduce(_ && _)))
    assert(bad.count() == 0, s"round-trip mismatches: ${bad.take(3).mkString("; ")}")
    assert(round.count() == 200)
  }
}
