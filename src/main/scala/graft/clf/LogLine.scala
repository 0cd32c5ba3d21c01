package graft.clf

/** Typed view of the canonical cleansed schema (SURVEY.md §1.3) — every
  * field optional because `-`, malformed lines, and absent values all map
  * to NULL by the parser's tolerance contract. */
final case class LogLine(
    ip_address: Option[String],
    rfc_1413_identity: Option[Double],
    user_id: Option[Long],
    time: Option[java.sql.Timestamp],
    request_method: Option[String],
    request_resource: Option[String],
    request_protocol: Option[String],
    status_code: Option[Long],
    size: Option[Long],
    referer: Option[String],
    user_agent: Option[String])
