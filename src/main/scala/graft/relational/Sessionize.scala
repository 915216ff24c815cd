package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: the classic clickstream operator the
  * reference's marketing domain implies (its event stream feeds
  * engagement activation) but that neither Spark nor the reference ships
  * as a built-in.
  *
  * A session is a maximal run of one entity's events where consecutive
  * gaps are <= `gapSeconds`. Assignment is two narrow window functions
  * over ONE hash shuffle on the entity: lag(ts) marks session starts,
  * a running sum numbers them. All arithmetic is exact integer micros —
  * bit-exact against any engine, no float drift at gate boundaries.
  *
  * At 100 TB: the only shuffle is the entity hash partition; window
  * state is a single lag value, session numbering a running count —
  * both O(1) per row, never a per-entity buffer. The downstream rollup
  * in [[sessionStats]] groups on (entity, session) which
  * HashPartitioning(entity) already satisfies (ClusteredDistribution
  * subset rule), so the whole pipeline is one shuffle end-to-end.
  * Skewed entities (a bot with 10^8 events) stay single-partition by
  * semantic necessity — the numbering is a sequential scan — but the
  * state is O(1), so the cost is IO-bound, not memory-bound; AQE cannot
  * split it and does not need to.
  */
object Sessionize {

  /** Annotate `events` with a per-entity session sequence number
    * (1-based, in time order) in column `out`. Ties on the timestamp
    * are ordered by `tiebreakCol` so the numbering is deterministic.
    * A gap strictly greater than `gapSeconds` starts a new session. */
  def sessionize(events: DataFrame, entityCol: String, tsCol: String,
                 tiebreakCol: String, gapSeconds: Long,
                 out: String = "session_seq"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    require(!events.columns.contains(out),
      s"sessionize: output column $out already exists in input")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull.or(us - prev > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    events.withColumn(out, sum(isNew).over(w))
  }

  /** Per-session rollup: start/end/duration (exact micros), event count,
    * and distinct event types. Runs on [[sessionize]]'s output without a
    * second shuffle (group keys extend the window's partition keys). */
  def sessionStats(events: DataFrame, entityCol: String, tsCol: String,
                   tiebreakCol: String, typeCol: String,
                   gapSeconds: Long): DataFrame = {
    val tagged = sessionize(events, entityCol, tsCol, tiebreakCol,
      gapSeconds)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    tagged
      .groupBy(col(entityCol), col("session_seq"))
      .agg(
        min(us).as("start_us"),
        max(us).as("end_us"),
        (max(us) - min(us)).as("duration_us"),
        count(lit(1)).as("n_events"),
        count_distinct(col(typeCol)).as("n_types"))
  }
}
