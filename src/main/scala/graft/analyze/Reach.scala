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
                     typeCol: String): DataFrame = {
    val perEntity = events
      .groupBy(col(typeCol), col(entityCol))
      .agg(count(lit(1)).as("freq"))
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
