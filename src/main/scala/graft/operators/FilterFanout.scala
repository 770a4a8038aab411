package graft.operators

import graft.model.FilterDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-filter regex fan-out — the reference's core streaming operator
  * (`storm/.../MatchBolt.java:189-202`): every line is tested against
  * EVERY registered filter; a line emits one `(filter_id, ...)` row per
  * matching filter (multicast, 0..N outputs per input).
  *
  * Spark-first design: the registry is tiny (tens of rows) and the
  * stream is huge, so this is a broadcast nested-loop join in spirit —
  * but instead of `crossJoin(broadcast(filters)).where(rlike)` (which
  * re-compiles the regex per row because the pattern is non-literal), we
  * inline each filter as a *literal-pattern* predicate into one
  * projection: `explode(filter(array(when(p1,id1), ...), notnull))`.
  * Each regex compiles once at codegen time and the whole operator stays
  * inside WholeStageCodegen — no shuffle, no join, scales linearly with
  * input partitions.
  */
object FilterFanout {

  /** Word-only pattern test — reference `Filter.java:33-41` hoists these
    * to `String.contains` ("2-30x faster" per `Filter.java:96`).
    */
  private val WordOnly = "^[A-Za-z0-9_-]+$".r

  /** A compiled match predicate — the JVM-side twin of [[predicate]],
    * used by the large-registry path where per-filter Column codegen
    * would produce an unboundedly large codegen unit.
    */
  sealed trait Matcher extends Serializable {
    /** True when this matcher needs the pre-lowercased form — callers
      * testing many matchers against one line lower-case it once and
      * pass it here, instead of each CI matcher re-lowering the line.
      */
    def needsLower: Boolean = false
    /** @param s        the raw line
      * @param sLowered the lower-cased line; may be null when
      *                 `needsLower` is false
      */
    def matches(s: String, sLowered: String): Boolean
    final def matches(s: String): Boolean =
      matches(s, if (needsLower) s.toLowerCase(java.util.Locale.ROOT) else null)
  }
  final case class ContainsWord(w: String) extends Matcher {
    def matches(s: String, sLowered: String): Boolean = s.contains(w)
  }
  final case class ContainsWordCi(wLower: String) extends Matcher {
    override def needsLower: Boolean = true
    def matches(s: String, sLowered: String): Boolean = sLowered.contains(wLower)
  }
  final case class RegexFind(pattern: String) extends Matcher {
    @transient private lazy val p = java.util.regex.Pattern.compile(pattern)
    def matches(s: String, sLowered: String): Boolean = p.matcher(s).find()
  }

  /** Compile one filter regex to its cheapest [[Matcher]] — same fast
    * paths as [[predicate]] (reference `Filter.java:33-52`).
    */
  def compileMatcher(regex: String): Matcher = regex match {
    case WordOnly() => ContainsWord(regex)
    case r if r.startsWith("(?i)") && WordOnly.matches(r.stripPrefix("(?i)")) =>
      ContainsWordCi(r.stripPrefix("(?i)").toLowerCase(java.util.Locale.ROOT))
    case r => RegexFind(r)
  }

  /** Above this registry size, fan-out switches from the inline
    * when-array (one codegen branch per filter — unbounded codegen
    * unit) to the single compiled [[graft.functions.MultiRegexMatch]]
    * expression.
    */
  val InlineRegistryLimit = 16

  /** Compile one filter regex to the cheapest equivalent Catalyst
    * predicate (reference fast-path analysis `Filter.java:33-52`,
    * match semantics `Filter.java:88-105` = Java `Matcher.find`, which
    * Spark's `rlike` shares):
    *   - plain word          → Contains (codegen'd, no regex)
    *   - `(?i)` + plain word → Contains on lower()
    *   - anything else       → RLike with a literal pattern
    */
  def predicate(raw: Column, regex: String): Column = regex match {
    case WordOnly() => raw.contains(regex)
    case r if r.startsWith("(?i)") && WordOnly.matches(r.stripPrefix("(?i)")) =>
      lower(raw).contains(r.stripPrefix("(?i)").toLowerCase(java.util.Locale.ROOT))
    case r => raw.rlike(r)
  }

  /** Array of matched filter ids for one line (null-free). */
  def matchedIds(raw: Column, filters: Seq[FilterDef]): Column = {
    require(filters.nonEmpty, "empty filter registry")
    val hits = array(filters.map(f =>
      when(predicate(raw, f.regex), lit(f.id))): _*)
    filter(hits, x => x.isNotNull)
  }

  /** Fan a line DataFrame out to `(filter_id, <original columns>)`, one
    * row per (line, matching filter). Lines matching nothing disappear
    * (explode of an empty array), matching the reference's multicast.
    *
    * Small registries inline one predicate per filter (fully codegen'd);
    * large registries use one compiled expression evaluating all
    * matchers in a single pass (codegen unit stays O(1) as the registry
    * grows to hundreds of filters).
    */
  def explodeMatches(lines: DataFrame, rawCol: String,
      filters: Seq[FilterDef]): DataFrame =
    if (filters.size <= InlineRegistryLimit)
      lines.withColumn("filter_id",
        explode(matchedIds(col(rawCol), filters)))
    else {
      import org.apache.spark.sql.GraftExprBridge
      val matchedIdx = GraftExprBridge.column(
        graft.functions.MultiRegexMatch(
          GraftExprBridge.expression(col(rawCol)),
          filters.map(_.regex)))
      val ids = array(filters.map(f => lit(f.id)): _*)
      lines
        .withColumn("_mi", explode(matchedIdx))
        .withColumn("filter_id", element_at(ids, col("_mi") + 1))
        .drop("_mi")
    }

  /** Per-filter match counts — the `match_stats` side-output
    * (reference `MatchBolt.java:198` emits metric-1 counters).
    */
  def matchCounts(lines: DataFrame, rawCol: String,
      filters: Seq[FilterDef]): DataFrame =
    explodeMatches(lines, rawCol, filters)
      .groupBy("filter_id").agg(count(lit(1)).as("matches"))
}
