package graft.streaming

import org.apache.spark.sql.SparkSession

/** File-level snapshot plumbing shared by the incremental-state
  * compactors ([[StreamTextIndex]], [[StreamSketch]], [[StreamIvfPq]]).
  *
  * The compaction contract they all follow is MERGE-AND-RETIRE:
  * snapshot the data-file list, compute the merged delta FROM THAT
  * SNAPSHOT ONLY, append it as new files, then delete exactly the
  * snapshot files. An `upsertBatch` that lands at any point during the
  * compaction writes files that are not in the snapshot, so they are
  * never deleted — compaction is safe beside a live ingest, which is
  * the whole point of an at-ingest index (the reference's supervisor
  * runs its 5-minute maintenance loop beside live result writes,
  * `supervisor/filter_manager.go:519-576`). This replaces the earlier
  * `mode("overwrite")` design, whose read→rewrite window silently
  * erased a concurrent append.
  *
  * Sidecars (`_meta`, `_graft_buckets`, `<root>_watermark`) are
  * underscore/dot-prefixed or siblings, so they are never part of a
  * snapshot and survive every compaction — a crash can no longer lose
  * a trained model or a bucket modulus.
  */
private[graft] object StreamState {

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every data file currently under `root` (recursive), skipping
    * hidden/metadata entries (`_meta`, markers, in-flight `.` temp
    * files). This IS the compaction snapshot: merged output is
    * computed from, and only ever retires, these paths. */
  def listDataFiles(spark: SparkSession, root: String): Seq[String] = {
    val hfs = fs(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!hfs.exists(rootPath)) return Nil
    val out = Seq.newBuilder[String]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      hfs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath)
          else out += st.getPath.toString
        }
      }
    walk(rootPath)
    out.result()
  }

  /** Retire a compaction's snapshot files. Idempotent: a file already
    * gone (a crashed earlier retire got partway) is skipped. */
  def deleteFiles(spark: SparkSession, root: String,
      files: Seq[String]): Unit = {
    val hfs = fs(spark, root)
    files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      if (hfs.exists(p)) hfs.delete(p, false)
    }
  }
}
