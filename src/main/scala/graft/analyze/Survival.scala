package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Discrete-time survival (churn) analysis — the Kaplan–Meier hazard
  * table over entity lifetimes, with right-censoring for entities still
  * active at the end of the observation window.
  *
  * An entity's lifetime is `(last − first) div period` periods; it is
  * CENSORED (not churned — we just stopped watching) when its last
  * event falls within `censorSeconds` of the corpus end. The classic KM
  * quantities per tenure period w are pure integers: at_risk(w) =
  * #entities with lifetime ≥ w (censored or not — they were alive
  * through w), churned(w) = #UNCENSORED entities with lifetime = w.
  * The hazard is the one display-time IEEE division churned/at_risk;
  * the survival curve is the running product of (1 − hazard), left to
  * the caller/presentation layer because a float product has no
  * bit-exact cross-engine form — the integer table IS the analysis.
  *
  * At 100 TB: one fact-scale groupBy (per-entity min/max, map-side
  * combining), then a lifetime histogram (periods-sized, tiny) whose
  * at-risk cumulation is a window over histogram rows — the same flat
  * shape as the reach f+ curve. The corpus end is a 1-row aggregate
  * broadcast by the cross join. */
object Survival {

  def survivalHazard(events: DataFrame, entityCol: String, tsCol: String,
                     periodSeconds: Long, censorSeconds: Long): DataFrame = {
    require(periodSeconds > 0, s"periodSeconds must be > 0, got $periodSeconds")
    require(censorSeconds >= 0, s"censorSeconds must be >= 0, got $censorSeconds")
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val end = events.agg(max(us).as("__end_us"))
    val lives = events
      .groupBy(col(entityCol))
      .agg(min(us).as("__first"), max(us).as("__last"))
      .crossJoin(broadcast(end))
      .select(
        expr(s"(__last - __first) div ${periodSeconds * 1000000L}")
          .as("life"),
        (col("__last") > col("__end_us") - censorSeconds * 1000000L)
          .as("censored"))
    val hist = lives.groupBy(col("life"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("censored"), 0L).otherwise(1L)).as("churned"))
    val atRisk = Window.orderBy(col("life").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("at_risk", sum(col("__n")).over(atRisk))
      .select(col("life").as("period"), col("at_risk"), col("churned"),
        (col("churned").cast("double") / col("at_risk").cast("double"))
          .as("hazard"))
  }
}
