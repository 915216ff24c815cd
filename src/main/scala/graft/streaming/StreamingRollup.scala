package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming MAINTENANCE of the round-15 incremental rollup states —
  * the third leg of the q169 discipline: the batch operator computes
  * the report, the mergeable state makes refresh incremental
  * ([[graft.analyze.Reach.reachState]] /
  * [[graft.analyze.Timeseries.dailySpendState]], q195/q196), and these
  * streaming twins keep the SAME state continuously current so the
  * finalize step reads an always-fresh table instead of waiting for
  * the nightly merge.
  *
  * Both are plain streaming aggregations — Spark's incremental
  * execution IS the merge (each micro-batch folds its delta into the
  * aggregation state), so "stream ≡ batch-on-the-union" holds by the
  * engine's own contract and the Round15 spec pins it with values.
  */
object StreamingRollup {

  /** [[graft.analyze.Reach.reachState]] over a streaming event frame:
    * per (type, entity) exposure counts, update-mode upserts. State is
    * audience-sized (the (type, entity) domain), never stream-length —
    * the identical bound the batch state table has on disk. No
    * watermark: reach is lifetime-cumulative by definition; callers
    * wanting windowed reach bound state via [[dailySpendStream]]'s
    * day-window shape instead. */
  def reachStateStream(events: DataFrame, entityCol: String,
                       typeCol: String): DataFrame =
    graft.analyze.Reach.reachState(events, entityCol, typeCol)

  /** [[graft.analyze.Timeseries.dailySpendState]] over a streaming
    * event frame: per (key, day) exact decimal spend. Days tumble as
    * 1-day event-time windows (UTC session ≡ the batch `to_date`), and
    * the watermark closes a day's state `lateness` past its end — state
    * is O(keys × open days), the archive never re-aggregates. The
    * output carries the same (key, day, spend) shape as the batch
    * state, ready for [[graft.analyze.Timeseries.mergeDailySpend]] /
    * [[graft.analyze.Timeseries.pacingFromDaily]]. */
  def dailySpendStream(events: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, lateness: String): DataFrame =
    events.withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), window(col(tsCol), "1 day"))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("spend"))
      .select(col(keyCol), to_date(col("window.start")).as("day"),
        col("spend"))

  /** KMV audience sketch over a streaming frame: per segment the O(k)
    * k-min hash state ([[graft.analyze.KmvState]]), update-mode
    * upserts. Each micro-batch folds its hashes into the SAME
    * Aggregator state the batch path builds — insert is idempotent and
    * merge associative/commutative, so stream ≡ batch-on-the-union by
    * the engine contract (Round15 spec pins values), and the state is
    * k longs per segment REGARDLESS of stream length: the segment
    * overlap matrix ([[graft.analyze.KmvAlgebra.audienceOverlap]])
    * reads an always-fresh sketch table instead of re-scanning the
    * archive. No watermark: audiences are lifetime-cumulative, and the
    * state bound is structural (O(segments × k)), not time-based. */
  def kmvStateStream(events: DataFrame, entityCol: String,
                     typeCol: String, k: Int = 64): DataFrame =
    events
      .select(col(typeCol).as("segment"),
        graft.analyze.KmvDistinct.md5Low64(col(entityCol).cast("string"))
          .as("__h"))
      .groupBy(col("segment"))
      .agg(graft.analyze.KmvDistinct.stateUdaf(k)(col("__h")).as("state"))

  /** Streaming twin of [[graft.analyze.Hdr.hdrState]]: the per-(key,
    * bin) count table maintained continuously (update-mode
    * aggregation). Counts add, so stream ≡ batch-on-the-union by the
    * engine contract, and the state bound is STRUCTURAL — ≤
    * (64−s)·2^s bins per key regardless of stream length (no
    * watermark needed; the quantile read
    * [[graft.analyze.Hdr.hdrQuantiles]] runs over the always-fresh
    * state table instead of the archive). */
  def hdrStateStream(events: DataFrame, keyCol: String, valueCol: String,
                     subBits: Int = 6): DataFrame =
    events
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .groupBy(col(keyCol),
        graft.analyze.Hdr.hdrBin(col(valueCol), subBits).as("bin"))
      .agg(count(lit(1)).as("cnt"))
}
