package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.Materialize

/**
 * Benchmark main: times every declared query on `SPARK_GRAFT_SF_DIR`
 * (default sf0.1) and prints the full JSON record as BOTH the FIRST and
 * the LAST stdout line (head-keeping and tail-keeping capture windows
 * each hold a whole copy), with a short summary line between them
 * carrying the totals and the durable record path.
 *
 * What a timed run executes: [[Harness.consume]] — a noop-sink write that
 * produces every output column and honors the final sort. `count()` would
 * let Catalyst prune the very compute some queries exist to measure (see
 * the consume scaladoc; round-3 finding).
 *
 * Steady-state measurement, three mechanisms:
 *
 *  - JIT/codegen warm-up: each query first runs once on the tiny sf0.001
 *    tables (untimed) so Janino codegen + C2 JIT of its operator pipeline
 *    happen outside the timed region. A fresh JVM otherwise charges
 *    ~5-10 s of one-time compilation to whichever query first touches an
 *    operator (measured: first `explode` in a session = 5.7 s, second =
 *    0.3 s — the entire BENCH_r01 q18 anomaly).
 *  - min of 2 timed runs + per-query release: the round-2 bench charged
 *    38.9 s to a query whose steady state is ~1 s because lineage-cut
 *    blocks from 30+ earlier queries had accumulated in the BlockManager
 *    (GC pressure) and the first sf0.1 run still pays scale-dependent
 *    one-offs. `Materialize.release` between runs (scoped + blocking, so
 *    cleanup cost lands here, not in a later query's timed region) keeps
 *    the block population flat; the min of two runs reports the repeatable
 *    number.
 *  - FRESH-SESSION re-run guard (the r12 finding): min-of-N within ONE
 *    accumulated session cannot catch a session-state pathology — r12
 *    recorded 21.95 s for a query whose steady state is ~2 s because
 *    every run in the sweep shared the polluted session. Any entry
 *    reading > 3x its prior round's durable record (and > 1 s absolute,
 *    so scheduling jitter on sub-second queries never triggers it) is
 *    re-measured in a brand-new SparkSession before recording; the min
 *    of sweep and fresh wins, and both numbers land in the meta so a
 *    cross-round reader sees the adjudication. The prior record is read
 *    from the durable path BEFORE this run overwrites it (override:
 *    SPARK_GRAFT_BENCH_BASELINE).
 *
 * A query that throws in ANY timed run is recorded under "errors" ONLY —
 * it is omitted from "queries" (a partial timing would read as a fast
 * success) — and makes the exit code nonzero.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus    = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      Harness.quietRddWarnings()
      s
    }
    var spark = newSession()

    val base = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    // Prior round's per-query steady state, read BEFORE this run
    // overwrites the durable record — the reference the fresh-session
    // guard compares against. Missing/corrupt file = no guard (first
    // run on a machine has nothing to compare to).
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", base)
    val baseline: Map[String, Double] = try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(baselinePath)),
        java.nio.charset.StandardCharsets.UTF_8)
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(txt) \ "queries" match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v))    => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty[String, Double] }

    // Optional comma-separated query-name filter (substring match) for
    // local iteration — e.g. SPARK_GRAFT_ONLY=q18,q37. Unset OR set-but-
    // empty = all queries, the driver contract: without the nonEmpty
    // filters an empty var would run the full set (every name contains "")
    // yet route the durable record to the .partial path, leaving the real
    // full-run file stale.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // name -> (sweep seconds, fresh-session seconds): every guard firing
    // is recorded, so the round record explains itself
    val reruns = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    var rerunBudget = 8 // restarts are ~5 s each; a sweep-wide pathology
                        // should surface as a few entries, not consume the run
    // Sweep order (r16 verdict item 5): the accumulation hypothesis says
    // in-sweep inflation tracks POSITION (session-state buildup over 370+
    // queries), not query identity. SPARK_GRAFT_SWEEP_ORDER=reverse runs
    // the same set back-to-front so ONE comparison run can confirm or
    // kill it — if totals match and per-query deltas move with position,
    // the inflation is accumulation; if a band inflates regardless of
    // position, it is real. Default name-sorted order stays the
    // cross-round comparable series (pair a reverse run with
    // SPARK_GRAFT_BENCH_BASELINE=/dev/null so the fresh-session guard
    // does not replace the very sweep numbers under test).
    val sweepOrder = sys.env.getOrElse("SPARK_GRAFT_SWEEP_ORDER", "sorted")
    require(sweepOrder == "sorted" || sweepOrder == "reverse",
      s"SPARK_GRAFT_SWEEP_ORDER must be sorted|reverse, got $sweepOrder")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = (if (sweepOrder == "reverse") ordered.reverse else ordered)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .flatMap { case (name, fn) =>
      def warmUp(): Unit =
        try { Harness.consume(fn(spark, warmDir)); Materialize.release(spark) }
        catch { case _: Throwable => () } // warm-up failure surfaces in the timed run
      def timedRun(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok =
          try { Harness.consume(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}"
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        Materialize.release(spark) // outside the timed region: session hygiene, not query cost
        if (ok) Some(dt) else None
      }
      warmUp()
      // min of 2 runs; when the two disagree badly the machine was loaded
      // during one of them (the round-6 harness bench read 84 s on code
      // that steady-states at 35 s), so spend ONE extra run for a stable
      // minimum rather than report a co-tenancy artifact
      val sweepSecs = timedRun().map { a =>
        val b = timedRun().getOrElse(a)
        val m = math.min(a, b)
        if (math.max(a, b) > 1.5 * m)
          math.min(m, timedRun().getOrElse(m))
        else m
      }
      // fresh-session guard: >2x the prior round's durable number AND >1s
      // absolute — a session-state pathology, not run-to-run jitter. The
      // accumulated session is torn down, the query re-warmed and re-timed
      // in a clean one (codegen/JIT stay warm: same JVM), and the min wins.
      // Threshold history: 3x through r13 let a real 2.14x q75 drift ship
      // unadjudicated (r13 verdict item 1 — standalone re-measure showed
      // the steady state unchanged); 2x catches that class while the 1 s
      // absolute floor still keeps sub-second scheduling jitter out.
      val secs = sweepSecs match {
        case Some(s) if !errors.contains(name) && rerunBudget > 0 &&
            baseline.get(name).exists(b => s > 2.0 * b && s > 1.0) =>
          rerunBudget -= 1
          spark.stop()
          spark = newSession()
          warmUp()
          val fresh = timedRun()
          fresh.foreach(f => reruns(name) = (s, f))
          fresh.map(math.min(s, _)).orElse(sweepSecs)
        case other => other
      }
      if (sys.env.contains("SPARK_GRAFT_DEBUG")) {
        val sc = spark.sparkContext
        val blocks = sc.getPersistentRDDs.values.map(_.partitions.length).sum
        System.err.println(f"[bench-debug] $name%-26s ${secs.getOrElse(-1.0)}%7.2f s " +
          f"rdds=${sc.getPersistentRDDs.size} parts=$blocks " +
          f"mem=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)}MB")
      }
      // an error in either run disqualifies the timing: errors-only reporting
      if (errors.contains(name)) None else secs.map(name -> _)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      } + "\""
    // 4-dp timings: 0.1 ms resolution is below run-to-run noise, and the
    // compact line keeps ALL per-query entries inside whatever stdout
    // window the driver's round record captures (the r10 record's tail
    // truncation lost q100+ — full-precision doubles doubled the line)
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => s"${jstr(k)}:${sec(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // q37 telemetry: label-propagation rounds of the LAST components run
    // (the second timed sf run) — a data-shape change that deepens the
    // dedup chain shows up here across bench rounds before it shows up as
    // a timing regression
    // Per-job floor: the min wall time of a trivial 32-row one-shuffle
    // job. Small queries here are SCHEDULING-bound, not data-bound (q30 at
    // sf0.1 ≈ 2× this floor; trainCentroids' three sequential collects ≈
    // 3×), and the floor swings 4× across sandbox VM generations — the
    // entire round-9 q30/q33 "regression" was a floor move on byte-
    // identical plans. Recording it per run lets a cross-round diff
    // normalize: timing deltas on untouched queries that track the floor
    // ratio are environment, not plans. Measured AFTER the queries so the
    // floor itself is steady-state (scheduler warm), min-of-5.
    val jobFloor = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 1000, 1, cpus.toInt).groupBy(col("id") % 7).count().collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    // Cross-round variance adjudications live in a checked-in artifact
    // (BENCH_NOTES.json — measurement prose stays out of the engine
    // binary; the r12 advice). Must be a single JSON object; anything
    // unreadable/unparseable degrades to {} rather than corrupting the
    // record line.
    // r16 verdict: embedding the notes VERBATIM made the record line
    // outgrow the driver's 2000-char stdout tail window — 16 rounds of
    // unparseable records. The record now carries a POINTER; the notes
    // stay a checked-in artifact read at adjudication time.
    val notesPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_NOTES", "BENCH_NOTES.json")
    val notes = s"""{"path":${jstr(notesPath)}}"""
    val rerunsJson = reruns.map { case (k, (s, f)) =>
      s"${jstr(k)}:{" + s""""sweep_sec":${sec(s)},"fresh_sec":${sec(f)}}"""
    }.mkString("{", ",", "}")
    val meta = s"""{"q37_cc_rounds":${graft.ext.Dedup.lastComponentsRounds.get()},"job_floor_sec":${sec(jobFloor)},"sweep_order":${jstr(sweepOrder)},"fresh_session_reruns":$rerunsJson,"notes":$notes}"""
    // a reverse-order experiment must never overwrite the durable
    // forward series the cross-round drift compare reads
    val out = if (only.isEmpty && sweepOrder == "sorted") base
      else base + ".partial"
    // total_sec and n_queries lead the line (head-truncation-proof), and
    // the durable path tells a reader where the untruncated copy lives
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","total_sec":${sec(total)},"n_queries":${results.size},"durable":${jstr(out)},"queries":$qs,"errors":$es,"meta":$meta,"sf":"$sfDir"}"""
    // The FULL record is the FIRST stdout line AND the LAST (the r14/r15
    // verdict parse fixes): a head-keeping capture window holds the first
    // copy, a tail-keeping window (the driver keeps a tail — r15's record
    // parsed null because only the head-emission existed) holds the last
    // copy; the short summary between them restates the totals and the
    // durable path for a human reader, and the durable file is the
    // always-whole fallback either way.
    val summary =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","total_sec":${sec(total)},"n_queries":${results.size},"n_errors":${errors.size},"durable":${jstr(out)},"record":"summary","sf":"$sfDir"}"""
    println(line)
    println(summary)
    // Durable copy: stdout capture windows can truncate a long run's tail,
    // losing early per-query timings; the file always carries the full line.
    // A query-filtered run writes to a .partial path — also when the
    // destination came from the env override — so a local iteration can
    // never masquerade as a full run's durable record. Best-effort by
    // design: a bad path must never turn a green run's exit code red.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $out: $e") }
    spark.stop()
    // The TAIL record — printed after spark.stop() so no shutdown log
    // can land between it and sbt's trailing [success] line, and sized
    // to FIT the driver's 2000-char tail window whole: full totals, but
    // "queries" restricted to the 19 round-1 BASELINE keys (what
    // BENCH_r01/BASELINE.md grade against; ~900 chars all-in). The full
    // 369-entry map lives in the durable file named right here and in
    // the head-emitted full record.
    val baselineQs = results.filter { case (k, _) =>
      k.matches("^q(0[1-9]|1[0-9])_.*")
    }.map { case (k, v) => s"${jstr(k)}:${sec(v)}" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","total_sec":${sec(total)},"n_queries":${results.size},"n_errors":${errors.size},"durable":${jstr(out)},"queries":$baselineQs,"queries_truncated_to_baseline":true,"sf":"$sfDir"}""")
    if (errors.nonEmpty) sys.exit(1)
  }
}
