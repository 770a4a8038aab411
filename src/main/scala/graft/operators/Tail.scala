package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tail / cursor semantics — the reference's ring-buffer read path
  * (`supervisor/filter_manager.go:298-346` monotonic ids + newest-N
  * eviction; `supervisor/supervisor.go:450-513` offset cursor;
  * CLI last-N slice `cli/cloudpelican-lsd.go:629-636`).
  *
  * Spark: "last N by recency" is a global top-k — `orderBy(desc).limit`
  * compiles to TakeOrderedAndProject, which keeps a size-k heap per
  * partition and merges k·P rows on the driver: no full sort, no
  * shuffle of the data, scale-safe for small N at any input size.
  */
object Tail {

  /** Newest `n` rows by the given ordering columns (all descending,
    * later columns break ties so the result is deterministic).
    */
  def lastN(df: DataFrame, n: Int, orderCols: Seq[String]): DataFrame =
    df.orderBy(orderCols.map(c => col(c).desc): _*).limit(n)

  /** Resume-from-cursor: rows strictly after offset `k` of a monotonic
    * id column — reference `supervisor/supervisor.go:493-497`.
    */
  def afterOffset(df: DataFrame, idCol: String, k: Long): DataFrame =
    df.filter(col(idCol) > lit(k))
}
