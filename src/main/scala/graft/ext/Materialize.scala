package graft.ext

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Managed lineage-cut points for the dedup/ANN operators.
 *
 * Why cuts exist at all: Catalyst's projection collapse inlines a column's
 * defining expression into every consumer, so an expensive narrow
 * intermediate (MinHash signature, parsed JSON map, SimHash) placed under a
 * generator or self-join fan-out gets recomputed once per fan-out row —
 * measured 200s+ vs ~1s on the LSH band explode. Materializing the
 * intermediate is the textbook recompute-vs-store win.
 *
 * Two modes, selected by `spark.graft.materialize`:
 *
 *  - `local` (default): `localCheckpoint()` — blocks live in the executors'
 *    BlockManager. Fastest, but blocks are lost with an executor, so a
 *    downstream stage failure cannot recompute them: right for local mode
 *    and short-lived jobs, wrong for a 1000-executor cluster where executor
 *    loss is routine.
 *  - `parquet`: spill to `spark.graft.materialize.dir` (any Hadoop FS —
 *    HDFS/S3 on a cluster) and read back. Survives executor loss and keeps
 *    no BlockManager state; the reliable choice for long cluster jobs.
 *
 * Lifecycle: every cut pins resources (blocks or files) for the life of the
 * session unless released. Callers that fully consume their results (one
 * action, result leaves Spark) should call [[release]] afterwards — Bench
 * and Verify do, per query — which unpersists the pinned blocks and deletes
 * the spill files created since the last release. Do NOT release while a
 * DataFrame derived from a cut is still to be consumed: the cut truncated
 * its lineage, so the data is unrecoverable after release.
 *
 * [[release]] is scoped and synchronous by design:
 *
 *  - Scoped: only the RDDs that [[cut]] itself pinned are unpersisted —
 *    caller-owned `cache()`/`localCheckpoint()` DataFrames (e.g. the
 *    pipeline's cached day slice) are left intact, and a caller can never
 *    lose an unrelated lineage-truncated DataFrame to a release it didn't
 *    ask for.
 *  - Blocking: `unpersist(blocking = true)`. The round-3 bench showed the
 *    async form letting a backlog of block-removal work from earlier
 *    queries collide with later ones (q33 measured ~4× its isolated
 *    steady state); a synchronous release keeps cleanup cost attributed to
 *    the release call site, outside any timed region.
 */
object Materialize {

  private val counter = new AtomicLong(0)
  private val spillPaths = scala.collection.mutable.ArrayBuffer[String]()
  private val cutRddIds = scala.collection.mutable.ArrayBuffer[Int]()
  // active per-thread scope (see [[scoped]]); null outside any scope
  private val scopeIds = new ThreadLocal[scala.collection.mutable.ArrayBuffer[Int]]()
  private val scopeSpills = new ThreadLocal[scala.collection.mutable.ArrayBuffer[String]]()

  /** Materialize `df` and cut its lineage (see class doc for mode choice). */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    mode(spark) match {
      case "parquet" =>
        val path = s"${spillDir(spark)}/${spark.sparkContext.applicationId}" +
          s"_cut${counter.incrementAndGet()}"
        df.write.mode("overwrite").parquet(path)
        spillPaths.synchronized { spillPaths += path }
        Option(scopeSpills.get()).foreach(_ += path)
        spark.read.parquet(path)
      case _ =>
        // record exactly the RDD this cut pins: eager localCheckpoint wraps
        // the persisted RDD in a LogicalRDD leaf of the returned plan, so
        // the id comes from the DataFrame itself — never from a before/
        // after diff of the context-global persistent-RDD registry, which
        // under concurrent cuts (or a caller persisting on another thread
        // between the snapshots) could adopt and later force-unpersist an
        // unrelated caller-owned RDD
        val out = df.localCheckpoint()
        val ids = out.queryExecution.analyzed.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        }
        cutRddIds.synchronized { cutRddIds ++= ids }
        Option(scopeIds.get()).foreach(_ ++= ids)
        out
    }
  }

  /**
   * Run `f` in a cut scope and release ONLY the cuts `f` made on this
   * thread when it completes — the release discipline for callers that
   * share the session with concurrent work (e.g. a `foreachBatch` stage
   * running next to other streams or batch jobs), where the whole-session
   * [[release]] would unpersist someone else's in-flight checkpoints.
   * Scopes nest: an inner scope releases only its own cuts and the outer
   * scope's tracking resumes when it exits. Cuts made by `f` on OTHER
   * threads (Spark actions are synchronous, so this does not happen in
   * practice) stay tracked for the session-wide release.
   */
  def scoped[T](spark: SparkSession)(f: => T): T = {
    val ids = scala.collection.mutable.ArrayBuffer[Int]()
    val spills = scala.collection.mutable.ArrayBuffer[String]()
    val prevIds = scopeIds.get()
    val prevSpills = scopeSpills.get()
    scopeIds.set(ids)
    scopeSpills.set(spills)
    try f
    finally {
      if (prevIds == null) scopeIds.remove() else scopeIds.set(prevIds)
      if (prevSpills == null) scopeSpills.remove() else scopeSpills.set(prevSpills)
      cutRddIds.synchronized { cutRddIds --= ids }
      spillPaths.synchronized { spillPaths --= spills }
      val live = spark.sparkContext.getPersistentRDDs
      ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = true)))
      spills.foreach { p =>
        val path = new Path(p)
        path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(path, true)
      }
    }
  }

  /** Ids currently tracked for the next [[release]] — test visibility. */
  private[ext] def trackedIds: Seq[Int] = cutRddIds.synchronized(cutRddIds.toSeq)

  /**
   * Release everything pinned by [[cut]] since the last release — and ONLY
   * that: tracked checkpoint blocks are unpersisted synchronously and
   * tracked parquet spill directories deleted; persisted RDDs the caller
   * created itself are untouched. Only call once every DataFrame built from
   * the cuts has been consumed.
   */
  def release(spark: SparkSession): Unit = {
    val ids = cutRddIds.synchronized {
      val i = cutRddIds.toList; cutRddIds.clear(); i
    }
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = true)))
    val paths = spillPaths.synchronized {
      val p = spillPaths.toList; spillPaths.clear(); p
    }
    paths.foreach { p =>
      val path = new Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(path, true)
    }
  }

  private def mode(spark: SparkSession): String =
    spark.conf.get("spark.graft.materialize", "local")

  private def spillDir(spark: SparkSession): String =
    spark.conf.get("spark.graft.materialize.dir",
      s"${sys.props("java.io.tmpdir")}/graft_materialize")
}
