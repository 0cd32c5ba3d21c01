package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._

class BloomIndexSpec extends GraftSpec {
  import spark.implicits._

  // the engine's bucket function replayed independently: first 12 md5
  // nibbles of "salt:j:key" mod words*63
  private def bucketOf(salt: String, j: Long, key: String,
      words: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$j:$key".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % (words.toLong * 63L)
  }

  private def wordsOf(salt: String, keys: Seq[String], words: Int,
      k: Int): Map[Long, Long] =
    keys.flatMap(key => (0L until k.toLong).map(j =>
        bucketOf(salt, j, key, words)))
      .groupBy(_ / 63)
      .map { case (w, bs) =>
        w -> bs.map(b => 1L << (b % 63).toInt).reduce(_ | _)
      }

  test("bloomBuild: the sparse word frame equals the hand-folded bits " +
      "for every inserted key, duplicates idempotent") {
    val d = Seq(1L -> "alpha", 2L -> "beta", 3L -> "alpha")
      .toDF("id", "key")
    val got = BloomIndex.bloomBuild(d, col("key"), words = 4, k = 2,
        salt = "bl1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = wordsOf("bl1", Seq("alpha", "beta"), 4, 2)
    assert(got == want, s"$got vs $want")
  }

  test("bloomScreen: NO false negatives ever; a fresh key with an " +
      "unset probe bit screens definitely-new; NULL keys take the " +
      "sentinel and match each other") {
    val hist = (1 to 40).map(i => (i.toLong, s"doc-$i")).toDF("id", "key")
    val bloom = BloomIndex.bloomBuild(hist, col("key"), words = 256,
      k = 3, salt = "bl2")
    // every inserted key must come back maybe_dup (the structural
    // guarantee routing depends on), regardless of collisions
    val seen = BloomIndex.bloomScreen(
        (1 to 40).map(i => (100L + i, s"doc-$i")).toDF("id", "key"),
        "id", col("key"), bloom, 256, 3, "bl2")
      .collect()
    assert(seen.length == 40 && seen.forall(_.getBoolean(1)),
      "false negative: an inserted key screened as new")
    // a hand-picked fresh key whose probe bits are NOT all set (found
    // by replaying the bucket function, so the assertion cannot flake)
    val bits = wordsOf("bl2", (1 to 40).map(i => s"doc-$i"), 256, 3)
    val fresh = (1 to 9999).map(i => s"new-$i").find { key =>
      (0L until 3L).exists { j =>
        val b = bucketOf("bl2", j, key, 256)
        (bits.getOrElse(b / 63, 0L) & (1L << (b % 63).toInt)) == 0L
      }
    }.get
    val novel = BloomIndex.bloomScreen(
        Seq((999L, fresh)).toDF("id", "key"),
        "id", col("key"), bloom, 256, 3, "bl2")
      .collect()(0)
    assert(!novel.getBoolean(1), s"$fresh should screen definitely-new")
    // NULL hashes via the sentinel: inserted null => probed null hits
    val withNull = BloomIndex.bloomBuild(
      Seq((1L, Option.empty[String])).toDF("id", "key"),
      col("key"), 256, 3, "bl2")
    val nullSeen = BloomIndex.bloomScreen(
        Seq((2L, Option.empty[String])).toDF("id", "key"),
        "id", col("key"), withNull, 256, 3, "bl2")
      .collect()(0)
    assert(nullSeen.getBoolean(1))
    intercept[IllegalArgumentException] {
      BloomIndex.bloomBuild(hist, col("key"), 0, 3, "bl2")
    }
    intercept[IllegalArgumentException] {
      BloomIndex.bloomScreen(hist, "id", col("key"), bloom, 256, 0, "bl2")
    }
  }

  test("bloomMerge: merge(build(A), build(B)) == build(A union B) " +
      "exactly — OR's merge law, overlapping partials included") {
    val a = (1 to 30).map(i => (i.toLong, s"k-$i")).toDF("id", "key")
    val b = (20 to 55).map(i => (i.toLong, s"k-$i")).toDF("id", "key")
    def build(df: org.apache.spark.sql.DataFrame) =
      BloomIndex.bloomBuild(df, col("key"), words = 64, k = 3,
        salt = "bl3")
    val merged = BloomIndex.bloomMerge(build(a).unionByName(build(b)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val whole = build(a.unionByName(b))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(merged.sameElements(whole))
  }

  test("suggestedShape pins the textbook operating point: hand-replayed " +
      "m/k at 1%, ~9.6 bits per key, monotone in the target, k floors " +
      "at 1, and the degenerate inputs are rejected") {
    // n = 1000, p = 0.01: m_raw = 1000·ln(100)/(ln 2)² = 9585.06 →
    // words = ⌈9585.06/63⌉ = 153, k = round((153·63/1000)·ln 2) = 7
    assert(BloomIndex.suggestedShape(1000L, 0.01) == (153, 7))
    val (w1, _) = BloomIndex.suggestedShape(1000L, 0.01)
    assert(w1 * 63 >= 9.0 * 1000 && w1 * 63 <= 10.5 * 1000,
      "~9.6 bits/key at 1%")
    val (w2, k2) = BloomIndex.suggestedShape(1000L, 0.001)
    assert(w2 > w1 && k2 >= 7, "tighter target costs more bits + hashes")
    // a huge corpus against a loose target still floors k at 1
    assert(BloomIndex.suggestedShape(1L, 0.6)._2 >= 1)
    intercept[IllegalArgumentException](BloomIndex.suggestedShape(0L, 0.01))
    intercept[IllegalArgumentException](BloomIndex.suggestedShape(10L, 0.0))
    intercept[IllegalArgumentException](BloomIndex.suggestedShape(10L, 1.0))
  }

  test("fppTelemetry reports the exact fill and fill^k prediction; a " +
      "suggestedShape-sized filter lands near half-full and the novel-" +
      "probe false-positive rate sits at the operating point's scale") {
    val n = 600
    val keys = (0 until n).map(i => s"doc_$i")
    val (words, k) = BloomIndex.suggestedShape(n.toLong, 0.01)
    val bloom = BloomIndex.bloomBuild(
      keys.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "key"),
      col("key"), words, k, salt = "blt")
    val t = BloomIndex.fppTelemetry(bloom).collect()(0)
    assert(t.getLong(0) == words.toLong * 63 && t.getLong(1) == k.toLong)
    // exact fill replay off the filter's own words
    val setBits = bloom.collect()
      .map(r => java.lang.Long.bitCount(r.getLong(1)).toLong).sum
    assert(t.getLong(2) == setBits)
    val rho = setBits.toDouble / (words.toLong * 63)
    assert(math.abs(t.getDouble(3) - math.rint(rho * 1e6) / 1e6) < 1e-9)
    assert(math.abs(t.getDouble(4) -
      math.rint(math.exp(k * math.log(rho)) * 1e6) / 1e6) < 1e-9)
    // the sized filter realizes the design: fill near 1/2, predicted
    // near the 1% target (both within loose structural bands)
    assert(rho > 0.35 && rho < 0.65, s"fill $rho should be near 0.5")
    assert(t.getDouble(4) > 0.001 && t.getDouble(4) < 0.05,
      s"predicted ${t.getDouble(4)} should be near the 1% target")
    // measured on 2000 provably-novel probes: same order of magnitude
    val novel = (0 until 2000).map(i => (i.toLong, s"new_$i"))
      .toDF("id", "key")
    val fp = BloomIndex.bloomScreen(novel, "id", col("key"), bloom,
        words, k, salt = "blt")
      .filter(col("maybe_dup")).count()
    assert(fp < 2000 * 0.05,
      s"$fp false positives on 2000 novel probes at a 1% design point")
  }

  test("geometry travels WITH the filter: mismatched probe geometry is " +
      "rejected, a hand-assembled frame is rejected, and the metadata " +
      "survives a parquet round-trip") {
    val hist = (1 to 40).map(i => (i.toLong, s"k-$i")).toDF("id", "key")
    val bloom = BloomIndex.bloomBuild(hist, col("key"), words = 256,
      k = 3, salt = "blg")
    // every axis of a geometry mismatch voids zero-false-negatives —
    // each must throw, not silently mis-probe
    Seq((128, 3, "blg"), (256, 2, "blg"), (256, 3, "other")).foreach {
      case (w, k, s) =>
        val ex = intercept[IllegalArgumentException] {
          BloomIndex.bloomScreen(hist, "id", col("key"), bloom, w, k, s)
        }
        assert(ex.getMessage.contains("does not match"), ex.getMessage)
    }
    // a frame not built by bloomBuild/bloomMerge carries no geometry
    val fake = Seq((0L, 7L)).toDF("word", "bits")
    assert(intercept[IllegalArgumentException] {
      BloomIndex.bloomScreen(hist, "id", col("key"), fake, 256, 3, "blg")
    }.getMessage.contains("no geometry metadata"))
    assert(intercept[IllegalArgumentException] {
      BloomIndex.bloomMerge(fake)
    }.getMessage.contains("no geometry metadata"))
    // the persisted-filter path: metadata rides the parquet footer
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloomgeo").toString
    bloom.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val ok = BloomIndex.bloomScreen(
        hist.limit(5), "id", col("key"), reread, 256, 3, "blg")
      .collect()
    assert(ok.length == 5 && ok.forall(_.getBoolean(1)),
      "re-read filter must still screen with zero false negatives")
    // merged filters keep the geometry too
    val merged = BloomIndex.bloomMerge(bloom)
    val ok2 = BloomIndex.bloomScreen(
      hist.limit(3), "id", col("key"), merged, 256, 3, "blg").collect()
    assert(ok2.forall(_.getBoolean(1)))
  }
}
