package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/**
 * Crash-safe advance of a parquet state directory, shared by the
 * `foreachBatch` stores ([[StreamingDedup]], [[StreamingAsof]]): write the
 * new state to `<statePath>.swap-tmp`, stamp our OWN commit marker (only
 * after the write returned — independent of whether the cluster's
 * committer conf writes `_SUCCESS`; marksuccessfuljobs is often off on
 * object stores), un-commit then delete the old directory (its marker
 * removed first — one atomic file delete — so a crash inside the
 * non-atomic recursive delete can never leave a partially-deleted
 * directory that still looks complete), rename. All crash
 * half-states are recovered by [[recover]] on the next batch; a swap step
 * that reports failure throws so the batch retries instead of silently
 * not advancing.
 *
 * The swap relies on atomic directory rename, so `statePath` must live on
 * a filesystem that has it (HDFS, POSIX); on an object store without
 * atomic rename (plain S3A) a crash INSIDE the rename can still tear the
 * store — keep the (small, horizon-bounded) store on real-rename storage
 * even when the corpus lives on S3.
 */
private[streaming] object StateSwap {

  private def tmpPath(statePath: String): String = statePath + ".swap-tmp"
  private val CommitMarker = "_GRAFT_COMMIT"

  /** True iff the directory holds a COMPLETE store write: the marker this
    * object creates itself after every successful write. */
  private def complete(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, CommitMarker))

  /** Replace the store at `statePath` with `rows`. Every input plan
    * feeding `rows` must already be lineage-cut, so the write never reads
    * the directory being replaced. `partitionCols` writes the new store
    * Hive-partitioned (the [[StreamingGrowth.compactIndex]] `batch=`
    * layout); the swap semantics are unchanged. */
  def advance(fs: FileSystem, statePath: String, rows: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = rows.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmpPath(statePath))
    val tmp = new Path(tmpPath(statePath))
    fs.create(new Path(tmp, CommitMarker), true).close()
    val dest = new Path(statePath)
    // un-commit dest BEFORE the recursive delete: directory delete is not
    // atomic, and a crash partway through must not leave a dest that lost
    // data files yet still carries its marker — recovery would trust it
    // and discard the complete tmp. Removing the single marker file first
    // is atomic; any crash after it leaves dest torn, which recovery
    // resolves by promoting the (already complete) tmp.
    val destMarker = new Path(dest, CommitMarker)
    if (fs.exists(destMarker) && !fs.delete(destMarker, false))
      throw new IllegalStateException(s"store swap: could not un-commit $dest")
    if (fs.exists(dest) && !fs.delete(dest, true))
      throw new IllegalStateException(s"store swap: could not delete $dest")
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"store swap: could not rename $tmp to $dest")
  }

  /** [[recover]] for the hybrid append/swap lifecycle
    * ([[StreamingGrowth]]: an append-only `batch=` root that is only
    * OCCASIONALLY swap-compacted): a markerless root with no complete
    * tmp is the ORDINARY append-managed state, not a torn swap —
    * [[advance]] never touches the root before its tmp committed, so
    * every markerless-root crash window either left the root untouched
    * (tmp missing/torn → discard) or holds a complete tmp to promote.
    * The strict [[recover]] would refuse exactly that valid state. */
  def recoverHybrid(fs: FileSystem, statePath: String): Unit = {
    val dest = new Path(statePath)
    val tmp = new Path(tmpPath(statePath))
    if (fs.exists(tmp)) {
      if (complete(fs, tmp) && !(fs.exists(dest) && complete(fs, dest))) {
        if (fs.exists(dest) && !fs.delete(dest, true))
          throw new IllegalStateException(
            s"swap recovery: could not delete torn $dest")
        if (!fs.rename(tmp, dest))
          throw new IllegalStateException(
            s"swap recovery: could not promote $tmp")
      } else if (!fs.delete(tmp, true))
        throw new IllegalStateException(
          s"swap recovery: could not discard $tmp")
    }
  }

  /** Complete or discard a half-finished store swap, trusting only
    * directories whose write committed: dest missing + tmp complete
    * (crash between delete and rename) → the tmp IS the advanced store,
    * finish the rename; tmp torn (crash mid-write) → discard it, whatever
    * store state exists stands; both complete (crash before the delete) →
    * the dest is the consistent pre-advance store, discard the tmp. A
    * torn dest with no complete tmp is unrecoverable — throw rather than
    * silently treat partial state as the store. */
  def recover(fs: FileSystem, statePath: String): Unit = {
    val dest = new Path(statePath)
    val tmp = new Path(tmpPath(statePath))
    val destOk = fs.exists(dest) && complete(fs, dest)
    if (fs.exists(tmp)) {
      if (complete(fs, tmp) && !destOk) {
        if (fs.exists(dest) && !fs.delete(dest, true))
          throw new IllegalStateException(s"swap recovery: could not delete torn $dest")
        if (!fs.rename(tmp, dest))
          throw new IllegalStateException(s"swap recovery: could not promote $tmp")
      } else if (!fs.delete(tmp, true))
        throw new IllegalStateException(s"swap recovery: could not discard $tmp")
    } else if (fs.exists(dest) && !destOk)
      throw new IllegalStateException(
        s"store at $dest is a torn write with no recovery candidate; " +
          "delete it to restart from empty state")
  }
}
