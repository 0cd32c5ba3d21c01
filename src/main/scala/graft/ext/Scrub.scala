package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for log and text corpora — the anonymization pass that runs
 * before staged data becomes training data or leaves its retention
 * boundary. Every operator is a deterministic, codegen'd built-in
 * expression (regexp_replace / sha2), so scrubbed outputs are
 * reproducible and oracle-verifiable; nothing shuffles — the pass fuses
 * into whatever scan or stage write surrounds it.
 *
 * The reference stages raw client IPs and user ids verbatim
 * (`/root/reference/sree-etl-tdk-lambda.py:62-78` — `ip_address`,
 * `user_id` land in the cleansed layer untouched); this adds the
 * anonymization its pipeline would need under a data-protection regime.
 */
object Scrub {

  /** GDPR-style IPv4 coarsening: zero the host octet (`1.2.3.45` →
    * `1.2.3.0`) — the widely deployed anonymization that keeps /24
    * locality for analytics while dropping the host identity. Non-IPv4
    * strings pass through unchanged (no match, no replace). */
  def anonymizeIpv4(ip: Column): Column =
    regexp_replace(ip, "\\.[0-9]{1,3}$", ".0")

  /** Deterministic pseudonymization: sha2-256 of `pepper || id`. The same
    * id always maps to the same token (joins and per-user aggregates still
    * work on scrubbed data); without the pepper the mapping would be
    * trivially reversible for small id spaces by enumeration. */
  def pseudonymizeId(id: Column, pepper: String): Column =
    sha2(concat(lit(pepper), id.cast("string")), 256)

  /** Mask email addresses embedded in free text. */
  def maskEmails(text: Column, replacement: String = "<email>"): Column =
    regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", replacement)
}
