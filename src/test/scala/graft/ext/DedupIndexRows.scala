package graft.ext

import org.apache.spark.sql.DataFrame

/** Shared collector for dedup-index rows: one canonical notion of index
  * equality — `(ghash, shingles, Option(signature))` as a set — used by
  * every suite that asserts the append loop against a from-scratch
  * rebuild, so a future index-schema change is reflected in one place. */
object DedupIndexRows {
  def apply(df: DataFrame): Set[(String, List[String], Option[List[Long]])] =
    df.select("ghash", "sh", "sig").collect().map(x =>
      (x.getString(0), x.getSeq[String](1).toList,
        Option(x.getSeq[Long](2)).map(_.toList))).toSet
}
