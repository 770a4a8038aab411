package graft.queries

/** ASCII time-series chart — the reference CLI's stats renderer
  * (`cli/stats.go:59-201`): terminal-width bucket truncation
  * (`:116-123`), height scaling (`:148-151`), dual series drawn as
  * `o` (regular/metric-1) and `*` (error/metric-2) (`:69-90`).
  * Pure function of the series — no terminal dependencies.
  */
object Chart {

  /** Render one or two aligned series (bucket → count). Buckets are
    * the union of both series' keys, sorted; when there are more
    * buckets than `width`, buckets are merged left-to-right like the
    * reference's column squeeze.
    */
  def render(regular: Seq[(Long, Long)], error: Seq[(Long, Long)] = Seq.empty,
      width: Int = 60, height: Int = 10): String = {
    val buckets = (regular.map(_._1) ++ error.map(_._1)).distinct.sorted
    if (buckets.isEmpty) return "(no data)\n"
    val reg = regular.toMap
    val err = error.toMap

    // squeeze buckets into ≤ width columns (sum within each column)
    val perCol = math.max(1, math.ceil(buckets.size / width.toDouble).toInt)
    val cols = buckets.grouped(perCol).map { bs =>
      (bs.head,
        bs.map(b => reg.getOrElse(b, 0L)).sum,
        bs.map(b => err.getOrElse(b, 0L)).sum)
    }.toVector

    val maxV = math.max(1L, cols.map(c => math.max(c._2, c._3)).max)
    val rows = (height to 1 by -1).map { level =>
      // a value fills every cell at or below its scaled height; any
      // non-zero value shows at least the bottom cell
      val threshold = maxV.toDouble * (level - 1) / height
      cols.map { case (_, r, e) =>
        // error dominates the cell (reference draws error over regular)
        if (e > 0 && e > threshold) '*'
        else if (r > 0 && r > threshold) 'o'
        else ' '
      }.mkString
    }
    val axis = "-" * cols.size
    val firstTs = java.time.Instant.ofEpochSecond(buckets.head)
    val lastTs = java.time.Instant.ofEpochSecond(buckets.last)
    (rows :+ axis :+ s"$firstTs .. $lastTs  (max=$maxV, o=match, *=error)")
      .mkString("\n") + "\n"
  }
}
