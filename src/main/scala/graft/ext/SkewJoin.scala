package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join — the standard answer to a shuffled join whose key
 * distribution is skewed: a handful of hot keys (the boilerplate user, the
 * null-ish default, the crawler IP) put their entire volume into single
 * reducer partitions, and one straggler task runs for hours while the
 * cluster idles. Salting splits every big-side key into `salts` synthetic
 * sub-keys and replicates the small side once per salt, so a hot key's
 * volume spreads over `salts` parallel tasks at the cost of a
 * `salts`-times-larger small side — the classic skew/replication trade.
 *
 * The result is IDENTICAL to the plain inner join (each big row meets
 * exactly the one matching salt copy of each small row — q51 shares a
 * plain-join oracle, and the spec asserts set equality): salting changes
 * the partitioning, never the semantics.
 *
 * Complements AQE's reactive skew-join splitting (`skewJoin.enabled`,
 * which this engine leaves on): AQE repairs skew it can SEE in shuffle
 * stats at runtime; explicit salting is the planned layout when the hot
 * keys are known and the small side is replicable — and the only option
 * when the skewed side feeds an aggregation AQE can't split.
 */
object SkewJoin {

  /**
   * Inner-join `big` with `small` on `bigKey == smallKey`, salted with
   * `salts` sub-keys. `saltSrc` seeds the big side's salt — any column
   * that varies within a hot key (an event id, a timestamp); the salt is
   * its xxhash64 mod `salts`, so the spread is deterministic. The small
   * side is replicated `salts`× via one explode (rows, not a shuffle).
   * The shuffle-hash hint keeps the demonstration honest — without it the
   * planner would broadcast a harness-sized small side and there would be
   * no shuffle to de-skew.
   */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltSrc: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val b = big.withColumn("_salt_b", pmod(xxhash64(saltSrc), lit(salts.toLong)))
    val sm = small.withColumn("_salt_s",
        explode(sequence(lit(0L), lit(salts - 1L))))
      .hint("shuffle_hash")
    // frame-qualified key references: unqualified col(bigKey) would be
    // ambiguous whenever both sides name their key the same way — the
    // most common join shape (RangeJoin takes the same care)
    b.join(sm, b(bigKey) === sm(smallKey) && b("_salt_b") === sm("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }
}
