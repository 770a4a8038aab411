package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Contains, Expression, Literal, Lower, RLike, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite `RLike` with a word-only literal pattern to
  * a plain `Contains` (and `(?i)word` to `Contains(Lower(x), word)`).
  *
  * This is the reference's hand-rolled regex fast path
  * (`storm/.../Filter.java:33-52`, claimed "2-30x" at `:96`) promoted
  * to a Catalyst rule, so it applies to ANY rlike in ANY plan — SQL
  * strings, Column DSL, the grep front-end — not just the fan-out
  * operator's own pre-analysis. Catalyst's built-in
  * `LikeSimplification` does this for LIKE but not for RLIKE.
  *
  * Semantics: Java regex `find()` over a pattern with no
  * metacharacters is exactly substring containment, and `(?i)` on a
  * word is containment on the lower-cased pair (safe here because the
  * rewrite is limited to ASCII `[A-Za-z0-9_-]` patterns — no Turkish-I
  * style case-folding edge cases).
  *
  * Known (?i) divergence, SUBJECT side: Java's `(?i)` without
  * `UNICODE_CASE` folds ASCII only, while `Lower` folds full Unicode —
  * a subject containing a non-ASCII letter whose lower-case IS the
  * ASCII pattern letter (Kelvin sign U+212A → 'k', Å U+212B → 'å'…)
  * matches the rewrite but not the original regex. The rewrite
  * therefore assumes ASCII-dominant log subjects (the reference's
  * domain; its own fast path lower-cases with Java `toLowerCase`,
  * `storm/.../Filter.java:44-47`, and so carries the same fold). The
  * deviation is deliberate, matched by an `(?iu)` regex instead, and
  * pinned with a Kelvin-sign fixture in RegexFastPathSpec.
  */
object RegexFastPathRule extends Rule[LogicalPlan] {

  // ASCII-only pattern guard; see the header's subject-side caveat
  // for why the ci rewrites still assume ASCII subjects
  private val WordOnly = "^[A-Za-z0-9_-]+$".r
  private val CiPrefix = "(?i)"

  // `^word` is also exact: `^` in Java's default mode matches only at
  // input start, so find() ⇔ startsWith. The mirrored `word$` rewrite
  // is deliberately ABSENT: `$` additionally matches just before a
  // trailing line terminator (find("c$") is true on "abc\n"), so
  // EndsWith would diverge on lines carrying one.
  private def rewrite(e: Expression): Expression = e match {
    case RLike(subject, Literal(p: UTF8String, StringType)) =>
      val pattern = p.toString
      def lw(w: String) =
        Literal(UTF8String.fromString(
          w.toLowerCase(java.util.Locale.ROOT)), StringType)
      pattern match {
        case WordOnly() =>
          Contains(subject, Literal(p, StringType))
        case ci if ci.startsWith(CiPrefix) &&
            WordOnly.matches(ci.stripPrefix(CiPrefix)) =>
          Contains(Lower(subject), lw(ci.stripPrefix(CiPrefix)))
        case anch if anch.startsWith("^") &&
            WordOnly.matches(anch.stripPrefix("^")) =>
          StartsWith(subject,
            Literal(UTF8String.fromString(anch.stripPrefix("^")), StringType))
        case cia if (cia.startsWith(CiPrefix + "^") &&
              WordOnly.matches(cia.stripPrefix(CiPrefix + "^"))) =>
          StartsWith(Lower(subject), lw(cia.stripPrefix(CiPrefix + "^")))
        case _ => e
      }
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e: RLike => rewrite(e) }
}

/** Session extension installing the graft optimizer rules:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RegexFastPathRule)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
