package graft.model

import java.sql.Timestamp

/** Core data model of the engine (SURVEY.md §1).
  *
  * The reference's four abstractions (log event, filter, stats series,
  * persistent results — see reference `storm/.../ParseBolt.java:95-97`,
  * `supervisor/filter_manager.go:49-57`) become explicit case classes with
  * Spark `Encoder`s instead of implicit row-map envelopes.
  */

/** A parsed log event: `(_raw, ts)` — reference `ParseBolt.java:87`. */
final case class LogEvent(_raw: String, ts: Timestamp)

/** A registered filter: a named, persistent regex predicate over the
  * stream — reference `supervisor/filter_manager.go:49-57`.
  * `temp` marks auto-expiring `__tmp__<ts>` filters
  * (reference `storm/.../Filter.java:64-75`).
  */
final case class FilterDef(
    id: String,
    name: String,
    regex: String,
    clientHost: String = "",
    temp: Boolean = false)

/** One matched line for one filter — reference `MatchBolt.java:197`. */
final case class MatchRow(filter_id: String, ts: Timestamp, _raw: String)

/** A time-series counter point. metric: 1=match, 2=error
  * (reference `storm/.../MetricsEnum.java:6-9`). bucket is epoch seconds
  * aligned to the rollup step.
  */
final case class StatPoint(
    filter_id: String,
    metric: Int,
    bucket: Long,
    count: Long)

/** A detected time-series outlier —
  * reference `supervisor/filter_manager.go:169-174`.
  */
final case class Outlier(
    filter_id: String,
    timestamp: Long,
    score: Double,
    details: String)

/** Per-member scores from the deterministic outlier-ensemble vote
  * surface ([[graft.ml.Outliers.voteScores]]); top-level so the
  * Dataset encoder stays codegen-compatible.
  */
final case class MemberScores(
    filter_id: String,
    bucket: Long,
    s_normal: Double,
    s_interval: Double,
    s_random_walk: Double,
    s_moving_avg: Double)
