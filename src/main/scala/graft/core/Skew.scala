package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew utilities (SURVEY §7 "100 TB posture"). AQE's skew-join handling
  * covers sort-merge joins automatically; explicit salting remains the
  * tool when one side has pathological hot keys and the other side is
  * small enough to replicate `salts` times but too big to broadcast. */
object Skew {

  /** Salted inner equi-join: the skewed (big) side gets a random salt in
    * [0, salts); the small side is replicated across every salt value, so
    * each hot key spreads over `salts` reducers. Semantically identical
    * to big.join(small, key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame =
    saltedJoinBy(big, small, key, (rand(42) * salts).cast("int"), salts)

  /** Salted join with a CALLER-SUPPLIED salt expression for the big
    * side. The salt should be uniform over [0, salts) and independent of
    * the join key (a hot key must spread across salts — deriving the
    * salt from the key would put it back on one reducer). Deriving it
    * deterministically from a row identity column, e.g.
    * `hash(col("row_id"))`, keeps re-runs (and task RETRIES — `rand`
    * re-draws per attempt, so a retried partition can change row→salt
    * routing mid-job) bit-identical, which is what lets the rewrite be
    * oracle-verified equal to the plain join.
    *
    * The expression is normalized internally with
    * `coalesce(pmod(_, salts), 0)`: `hash()` is signed, and a raw
    * negative / >= salts value — or a null salt (non-numeric column,
    * null input) — would land outside the replicated small side's
    * [0, salts) range and SILENTLY DROP the row from the inner join.
    * Misuse cannot cause row loss, only (at worst) a skewed salt
    * distribution (null-salt rows all land on salt 0). */
  def saltedJoinBy(big: DataFrame, small: DataFrame, key: String,
                   saltExpr: Column, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1; got $salts")
    val saltedBig = big.withColumn("__salt",
      coalesce(pmod(saltExpr.cast("long"), lit(salts.toLong)), lit(0L))
        .cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key diagnosis: per-key counts above a threshold — run on a
    * sample before choosing between AQE, salting, or broadcast. */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc)
}
