package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reach & frequency — the audience-measurement report every campaign
  * readout needs: how many entities saw a treatment exactly f times,
  * and the classic "reach at f+" curve (entities reached AT LEAST f
  * times), per treatment type.
  *
  * Two partial-aggregating groupBys do all the fact-scale work (the
  * per-entity count map-side combines, its output is audience-sized;
  * the histogram rollup is distinct-frequency-sized — tiny). The f+
  * cumulation is a window over HISTOGRAM rows, thousands at most, so
  * the unavoidable per-type running sum costs nothing at any scale.
  * Counts are exact integers; the only division is the display-time
  * reach share (exact long → double, one IEEE divide — replayable).
  */
object Reach {

  /** Per (type, frequency): exact entity count, f+ cumulative reach,
    * and f+ share of the type's reached audience. */
  def reachFrequency(events: DataFrame, entityCol: String,
                     typeCol: String): DataFrame =
    reachFrequencyFromState(reachState(events, entityCol, typeCol),
      entityCol, typeCol)

  /** The MERGEABLE state behind [[reachFrequency]]: per (type, entity)
    * exposure counts — the q169 incremental-aggregate discipline
    * applied to audience measurement. Daily/shard states roll up by
    * [[mergeReachStates]] (counts add), so the nightly reach report
    * aggregates only the day's delta, never re-scans the archive; the
    * state is audience-sized (entities x types), the only fact-scale
    * pass is this one map-side-combining groupBy. */
  def reachState(events: DataFrame, entityCol: String,
                 typeCol: String): DataFrame =
    events.groupBy(col(typeCol), col(entityCol))
      .agg(count(lit(1)).as("freq"))

  /** Combine two [[reachState]] relations (full outer on the keys;
    * frequencies ADD — an entity reached in both shards is one entity
    * at the summed exposure count, which a histogram-level merge could
    * never reconstruct: mergeability lives at the entity grain). */
  def mergeReachStates(a: DataFrame, b: DataFrame, entityCol: String,
                       typeCol: String): DataFrame = {
    val bb = b.select(col(typeCol), col(entityCol), col("freq").as("__f2"))
    a.join(bb, Seq(typeCol, entityCol), "full_outer")
      .select(col(typeCol), col(entityCol),
        (coalesce(col("freq"), lit(0L)) + coalesce(col("__f2"), lit(0L)))
          .as("freq"))
  }

  /** Frequency-response curve — the "optimal frequency" read the
    * [[reachFrequency]] histogram feeds: per capped exposure-frequency
    * bucket (1, 2, …, cap+ — the tail pools, every real report caps),
    * exposed entities, converters among them, and the conversion rate.
    * `exposures` is a [[reachState]]-shaped (entity, freq) relation
    * for ONE treatment (pre-filter the type); `converters` is a
    * distinct entity set. Counts are exact longs from two
    * audience-sized aggs (the entity grain is the state the rollup
    * already maintains — this report is a finalize step over it, never
    * a fact re-scan); the rate is one display division. Entities in
    * `converters` but never exposed are OUT by construction (left
    * semi/anti logic — a frequency-response row needs a frequency). */
  def frequencyResponse(exposures: DataFrame, entityCol: String,
                        converters: DataFrame, cap: Int = 10): DataFrame = {
    require(cap >= 1, s"cap must be >= 1; got $cap")
    val conv = converters.select(col(entityCol)).distinct()
      .withColumn("__c", lit(1L))
    exposures
      .select(col(entityCol), least(col("freq"), lit(cap.toLong))
        .as("freq_bucket"))
      .join(conv, Seq(entityCol), "left")
      .groupBy(col("freq_bucket"))
      .agg(count(lit(1)).as("n_exposed"),
        sum(coalesce(col("__c"), lit(0L))).as("n_converted"))
      .select(col("freq_bucket"), col("n_exposed"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_exposed").cast("double"))
          .as("conv_rate"))
  }

  /** Finalize a (merged) [[reachState]] into the histogram + f+ curve
    * — histogram-cardinality work only. */
  def reachFrequencyFromState(perEntity: DataFrame, entityCol: String,
                              typeCol: String): DataFrame = {
    val hist = perEntity
      .groupBy(col(typeCol), col("freq"))
      .agg(count(lit(1)).as("n_entities"))
    val fplus = Window.partitionBy(col(typeCol))
      .orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val audience = Window.partitionBy(col(typeCol))
    hist
      .withColumn("reach_ge", sum(col("n_entities")).over(fplus))
      .withColumn("__aud", sum(col("n_entities")).over(audience))
      .select(col(typeCol), col("freq"), col("n_entities"),
        col("reach_ge"),
        (col("reach_ge").cast("double") / col("__aud").cast("double"))
          .as("reach_share"))
  }
}
