package graft

/** Test-only Hadoop FileSystem under the `torn:` scheme: local-disk
  * semantics (RawLocalFileSystem) with a one-shot fault — the first
  * `create` after [[TornClaimFs.failNextWrite]] is armed returns a
  * stream whose write throws AFTER the file exists in the namespace.
  * This reproduces the HDFS torn-claim window
  * ([[graft.streaming.StreamState.claimSidecar]]'s create branch):
  * the claim create succeeded, the content write died.
  */
class TornClaimFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("torn:///")

  override def create(f: org.apache.hadoop.fs.Path,
      overwrite: Boolean): org.apache.hadoop.fs.FSDataOutputStream = {
    val out = super.create(f, overwrite)
    if (TornClaimFs.failNextWrite.compareAndSet(true, false))
      new org.apache.hadoop.fs.FSDataOutputStream(
        new java.io.OutputStream {
          override def write(b: Int): Unit =
            throw new java.io.IOException("torn write (injected)")
          override def write(b: Array[Byte], off: Int, len: Int): Unit =
            throw new java.io.IOException("torn write (injected)")
          override def close(): Unit = out.close()
        }, null)
    else out
  }
}

object TornClaimFs {
  /** Arm the one-shot write fault for the NEXT create. */
  val failNextWrite = new java.util.concurrent.atomic.AtomicBoolean(false)
}
