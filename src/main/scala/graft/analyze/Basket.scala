package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — the cross-sell/affinity operator of
  * the martech-analytics tier (the reference's domain activates
  * marketing audiences, `conf/deployment.json:5-20`; "customers who
  * bought A also bought B" is its oldest query).
  */
object Basket {

  /** Item-pair co-occurrence with support / confidence / lift.
    *
    * Output per unordered pair (item_a < item_b):
    * `(item_a, item_b, n_a, n_b, n_ab, n_baskets, support,
    * conf_a_to_b, conf_b_to_a, lift)` where n_x counts BASKETS
    * containing x (multiplicity inside a basket is ignored — items
    * are distinct-ed per basket first), support = n_ab/N,
    * conf_a_to_b = n_ab/n_a, and lift = (n_ab·N)/(n_a·n_b). Every
    * ratio is ONE IEEE division whose operands are exact integers
    * (the lift's products stay in long — exact while
    * n_ab·N < 2^63), so the doubles replay bit-for-bit.
    *
    * `minPairCount` is the standard frequent-pair support prune and
    * the scale lever: it filters BEFORE the per-item-count joins, so
    * the 1-count pair tail (the vast majority — 97% on the test
    * data) never rides a join.
    *
    * Shape: per-basket distinct (one groupBy-free dropDuplicates =
    * hash shuffle on (basket, item)), pair generation as a self
    * equi-join ON THE BASKET KEY (shuffle on basket; work is
    * Σ k_b² over baskets — bounded by the per-basket item count, the
    * classic market-basket bound, never a global cross join), one
    * pair-count agg, two joins against the metadata-sized item-count
    * relation. A pathological basket with 10⁶ items would quadratically
    * explode ANY pair miner; cap baskets upstream if the domain allows
    * them. */
  def coOccurrence(facts: DataFrame, basketCol: String, itemCol: String,
                   minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1; got $minPairCount")
    val items = facts
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull && col("__b").isNotNull)
      .dropDuplicates("__b", "__i")
    val nBaskets = items.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("__i"))
      .agg(count(lit(1)).as("__n"))
    val pairs = items.select(col("__b"), col("__i").as("item_a"))
      .join(items.select(col("__b"), col("__i").as("item_b")), Seq("__b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.select(col("__i").as("item_a"), col("__n").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"), col("__n").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_baskets"),
        (col("n_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double"))
          .as("conf_b_to_a"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** Audience/segment overlap matrix — co-occurrence transposed to the
    * martech question "how much do my segments overlap?": baskets are
    * MEMBERS, items are the segments they belong to. One row per
    * segment pair with overlap counts and Jaccard
    * `n_overlap / (n_a + n_b − n_overlap)` (one IEEE division of
    * exact integers). Pairs with zero overlap do not appear (their
    * Jaccard is 0 and the pair never forms in the member self-join —
    * the segment-count² zero tail would be pure noise at scale).
    * Same scale bound as [[coOccurrence]]: work is Σ (segments per
    * member)², never segments². */
  def audienceOverlap(members: DataFrame, memberCol: String,
                      segmentCol: String): DataFrame =
    coOccurrence(members, memberCol, segmentCol, minPairCount = 1L)
      .select(col("item_a").as("segment_a"), col("item_b").as("segment_b"),
        col("n_a"), col("n_b"), col("n_ab").as("n_overlap"),
        col("n_baskets").as("n_members"),
        (col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double"))
          .as("jaccard"))
}
