package graft.clf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Apache combined-log-format parser, expressed entirely with built-in
 * Catalyst expressions (codegen'd, null-safe, pushdown-transparent) — no
 * UDFs.
 *
 * Capability parity with the reference's regex-tokenizing CSV read
 * (`/root/reference/sree-etl-tdk-lambda.py:167-186`): 9 whitespace-separated
 * fields where `[...]` wraps the timestamp and `"..."` wraps request /
 * referer / user-agent; `-` means NULL; the request is split positionally
 * into method / resource / protocol
 * (`/root/reference/sree-etl-tdk-lambda.py:182-186`).
 *
 * Deliberate improvements over the reference:
 *  - quoted fields may contain backslash-escaped quotes (we unescape);
 *  - a resource containing spaces stays intact (first token = method, last
 *    token = protocol, middle = resource) instead of being truncated;
 *  - malformed lines yield an all-NULL row instead of failing the job
 *    (null-row tolerance; count rejects with [[rejects]]).
 */
object ClfParser {

  /** One regex over the whole line; groups 1-9 are the CLF fields. */
  private[graft] val clfRegex =
    """^(\S+)\s+(\S+)\s+(\S+)\s+\[([^\]]*)\]\s+"((?:[^"\\]|\\.)*)"\s+(\S+)\s+(\S+)\s+"((?:[^"\\]|\\.)*)"\s+"((?:[^"\\]|\\.)*)"\s*$"""

  /** CLF timestamp pattern, e.g. `13/Nov/2015:11:45:42 +0000`. */
  private[graft] val tsPattern = "dd/MMM/yyyy:HH:mm:ss Z"

  /** Extract group `i`; `""` (no match / empty) and `-` both mean NULL. */
  private def grp(line: Column, i: Int): Column =
    nullif(nullif(regexp_extract(line, clfRegex, i), lit("")), lit("-"))

  /** Unescape `\"` and `\\` inside a quoted field. */
  private def unescape(c: Column): Column =
    regexp_replace(c, """\\(["\\])""", "$1")

  /** ANSI-safe long cast: non-numeric → NULL (never a runtime error). */
  private def asLong(c: Column): Column =
    when(c.rlike("^-?[0-9]+$"), c.cast("long"))

  /** ANSI-safe double cast. */
  private def asDouble(c: Column): Column =
    when(c.rlike("^-?[0-9]+(\\.[0-9]+)?$"), c.cast("double"))

  /**
   * Raw log-directory read (S1/S2/S3): distributed line-oriented text scan
   * of every file matching `glob` under `dir` — the Spark-native form of
   * the reference's list-fetch-decode loop
   * (`/root/reference/sree-etl-tdk-lambda.py:147-164`), which materialized
   * whole files in one process. Returns `value: string` lines ready for
   * [[parse]]; `input_file_name()` is available for provenance.
   */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
           glob: String = "*.log"): DataFrame =
    spark.read.option("pathGlobFilter", glob).text(dir)

  /**
   * Parse raw log lines (`value: string`, as produced by `spark.read.text`)
   * into the canonical 11-column cleansed schema (SURVEY.md §1.3).
   */
  def parse(raw: DataFrame): DataFrame = {
    val v   = col("value")
    val req = unescape(grp(v, 5))
    raw.select(
      grp(v, 1).as("ip_address"),
      asDouble(grp(v, 2)).as("rfc_1413_identity"),
      asLong(grp(v, 3)).as("user_id"),
      try_to_timestamp(grp(v, 4), lit(tsPattern)).as("time"),
      regexp_extract(req, """^(\S+)""", 1).as("request_method"),
      when(req.rlike("""^\S+\s+.*\s+\S+$"""),
           regexp_extract(req, """^\S+\s+(.*)\s+\S+$""", 1))
        .as("request_resource"),
      when(req.rlike("""^\S+\s+.*\s+\S+$"""),
           regexp_extract(req, """(\S+)$""", 1))
        .as("request_protocol"),
      asLong(grp(v, 6)).as("status_code"),
      asLong(grp(v, 7)).as("size"),
      unescape(grp(v, 8)).as("referer"),
      unescape(grp(v, 9)).as("user_agent")
    )
  }

  /** Lines that do not match the CLF grammar at all (reject counter). */
  def rejects(raw: DataFrame): DataFrame =
    raw.filter(!col("value").rlike(clfRegex))

  /**
   * Render the canonical columns back into a CLF line (parse⁻¹ for
   * non-null fields; used by round-trip property tests and the q05/q07/q08
   * synthesis queries).
   */
  def format(
      ip: Column, userId: Column, ts: Column, method: Column,
      resource: Column, protocol: Column, status: Column, size: Column,
      referer: Column, agent: Column): Column =
    concat(
      coalesce(ip, lit("-")), lit(" - "),
      coalesce(userId.cast("string"), lit("-")), lit(" ["),
      date_format(ts, tsPattern), lit("] \""),
      method, lit(" "), resource, lit(" "), protocol, lit("\" "),
      coalesce(status.cast("string"), lit("-")), lit(" "),
      coalesce(size.cast("string"), lit("-")), lit(" \""),
      coalesce(referer, lit("-")), lit("\" \""),
      coalesce(agent, lit("-")), lit("\"")
    )
}
