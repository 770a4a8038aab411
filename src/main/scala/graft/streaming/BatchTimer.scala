package graft.streaming

/** Opt-in wall-clock recorder for the incremental operators' per-batch
  * entry points (ingest/upsert/delete/refit). Disabled it is one
  * volatile read per batch — nothing allocates, nothing synchronizes —
  * so production ingest pays nothing. [[graft.Bench]] enables it
  * around each ingest SCENARIO so the gate artifact can publish the
  * per-batch p95 beside the scenario's wall time (the round-12
  * verdict: the at-ingest story's cost evidence belongs in the
  * driver's artifact, not only in builder-run survey prose).
  *
  * Scenarios run one at a time on the bench thread, but batch entry
  * points may be called from streaming micro-batch threads — the
  * buffer is a concurrent queue, drained between scenarios.
  */
object BatchTimer {
  @volatile private var enabled = false
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]

  /** Time `f` as one batch of kind `kind` when enabled; transparent
    * otherwise. Failures propagate untimed — a crashed batch is not a
    * latency sample. */
  def timed[T](kind: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      val r = f
      buf.add(kind -> (System.nanoTime() - t0) / 1e9)
      r
    }

  def start(): Unit = { buf.clear(); enabled = true }

  /** Stop recording and return the collected (kind, seconds) samples. */
  def stop(): Seq[(String, Double)] = {
    enabled = false
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.toSeq
  }

  /** Nearest-rank p95 (the StreamBench convention). */
  def p95(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0
    else {
      val s = xs.sorted
      s(math.min(s.size - 1, math.ceil(s.size * 0.95).toInt - 1))
    }
}
