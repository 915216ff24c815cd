package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic-style record linkage (Fellegi–Sunter shape, integer
  * weights): multi-field agreement scoring over blocked candidate
  * pairs — the entity-resolution step between exact dedup (q30) and
  * fuzzy single-field joins (q126): real duplicate customers disagree
  * on SOME fields, so one field can never decide alone.
  */
object Linkage {

  /** One agreement rule: `agree` is a boolean Column over the paired
    * projection (fields appear as `<field>_a` / `<field>_b`), worth
    * `weight` score points when true. Integer weights keep every
    * score an exact integer — classification thresholds are integer
    * compares, engine-replayable (true Fellegi–Sunter log-odds need
    * libm; ranking by Σ integer weights preserves the decision
    * structure). */
  final case class LinkRule(name: String, agree: Column, weight: Int)

  /** Score all same-block pairs:
    * `(id_a, id_b, <rule>_agree…, score, tier)` with
    * tier = match (score ≥ matchMin) / possible (≥ possibleMin) /
    * non_match. Blocking bounds the pair work to Σ|block|² — the
    * standard linkage bound; pick `blockCol` with bounded block sizes
    * (at 100 TB a hot block is the basket-miner caveat: cap or
    * sub-block it). The self-join is an EQUI join on the block key
    * (hash shuffle, AQE-splittable), id_a < id_b dedups pairs, and
    * only (id, block, fields) ride the join — project payload off
    * first. */
  def scorePairs(df: DataFrame, idCol: String, blockCol: String,
                 fields: Seq[String], rules: Seq[LinkRule],
                 matchMin: Int, possibleMin: Int): DataFrame = {
    require(rules.nonEmpty, "scorePairs needs at least one rule")
    require(matchMin >= possibleMin,
      s"matchMin ($matchMin) must be >= possibleMin ($possibleMin)")
    val slim = df.select((idCol +: blockCol +: fields).map(col): _*)
    def side(suffix: String) = fields.foldLeft(
      slim.withColumnRenamed(idCol, s"id$suffix")) {
        (d, f) => d.withColumnRenamed(f, s"$f$suffix")
      }
    val pairs = side("_a").join(side("_b"), Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
    val flags = rules.map(r =>
      when(r.agree, 1).otherwise(0).as(s"${r.name}_agree"))
    val withFlags = pairs.select(
      (Seq(col("id_a"), col("id_b")) ++ flags): _*)
    val score = rules.map(r =>
      col(s"${r.name}_agree") * r.weight).reduce(_ + _)
    withFlags
      .withColumn("score", score)
      .withColumn("tier",
        when(col("score") >= matchMin, "match")
          .when(col("score") >= possibleMin, "possible")
          .otherwise("non_match"))
  }
}
