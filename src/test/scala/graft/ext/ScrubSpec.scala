package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends GraftSpec {
  import spark.implicits._

  test("anonymizeIpv4 zeroes the host octet only; non-IPs pass through") {
    // anchored to a full dotted-quad: values that merely END in dot-digits
    // (version strings, dotted hostnames, five-part sequences) must come
    // back byte-identical, not corrupted
    val r = Seq("192.168.1.45", "10.0.0.255", "not-an-ip", "1.2.3.4.5",
      "v1.2.3", "server.42", "1.2.3.4:8080")
      .toDF("ip")
      .select(Scrub.anonymizeIpv4(col("ip")).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("192.168.1.0", "10.0.0.0", "not-an-ip", "1.2.3.4.5",
      "v1.2.3", "server.42", "1.2.3.4:8080"))
  }

  test("pseudonymizeId: stable, peppered, 64-hex") {
    val df = Seq(1L, 1L, 2L).toDF("id")
      .select(Scrub.pseudonymizeId(col("id"), "pep").as("tok"))
    val toks = df.collect().map(_.getString(0)).toSeq
    assert(toks(0) == toks(1) && toks(0) != toks(2))
    assert(toks.forall(_.matches("[0-9a-f]{64}")))
    // pepper changes the mapping
    val other = Seq(1L).toDF("id")
      .select(Scrub.pseudonymizeId(col("id"), "other").as("tok"))
      .collect()(0).getString(0)
    assert(other != toks(0))
  }

  test("maskEmails replaces addresses, leaves surrounding text") {
    val r = Seq("contact a.b+c@ex-ample.org or admin@x.io today", "no mail here")
      .toDF("t")
      .select(Scrub.maskEmails(col("t")).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("contact <email> or <email> today", "no mail here"))
  }
}
