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

  /** Skew-spread FULL-output `row_number` — exact global per-key rank
    * attached to EVERY row, with the hot key's sort spread over up to
    * `buckets` tasks.
    *
    * Why it exists: Spark 3.5+'s `InferWindowGroupLimit` already makes the
    * rank-then-`filter(rn <= k)` shape skew-proof (each map task forwards
    * at most k rows per key), so latest-per-key needs no salting there.
    * The regime that still dies on a hot key is a window whose output is
    * needed for every row — no filter, nothing to prune map-side; the
    * whole key's history sorts in ONE reducer (measured on the skew
    * fixture: 7.9 s hot vs 0.9 s uniform at sf0.1×10, one 7.2 s task).
    *
    * A hash salt cannot fix this form — a per-(key, random-salt) rank is
    * not a global rank. A RANGE bucket can: bucket rows by quantile
    * boundaries of the order column (bucket order aligned with sort
    * order), rank locally within (key, bucket), then add the count of all
    * rows in earlier buckets of the same key:
    *
    *   rn(row) = local_rank(key, bucket) + Σ counts(key, earlier buckets)
    *
    * Exact because bucket boundaries partition the order-column RANGE:
    * every row of an earlier bucket precedes every row of a later one, and
    * equal order values land in the same bucket (ties then resolved by
    * `tieBreakers` inside one bucket). Plan shape: one quantile pass
    * (driver holds `buckets-1` doubles), one shuffle on (keys, bucket) —
    * reused by both the local-rank window and the final offset join — plus
    * a counts aggregation that is skew-proof by partial aggregation and an
    * offsets window over ≤ `buckets` rows per key. Largest single-task
    * sort drops from |hot key| to ~|hot key|/buckets.
    *
    * The order is (rangeOn asc/desc) then `tieBreakers`; pass tie-breakers
    * forming a total order for deterministic output (same requirement as
    * any `row_number`). Quantile boundaries adapt to the data, so a 50 %
    * hot key — whose distribution dominates the global quantiles — splits
    * evenly. Nulls in `rangeOn` sort the way Spark windows sort them
    * (asc = nulls first, desc = nulls last) and land in the matching edge
    * bucket. Null values in `keys` form their own group (the offsets
    * join is null-safe), matching `Window.partitionBy` semantics.
    * `out` must not collide with an existing column. */
  def saltedRowNumber(df: DataFrame, keys: Seq[String], rangeOn: Column,
                      descending: Boolean, tieBreakers: Seq[Column],
                      buckets: Int, out: String = "rn"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1; got $buckets")
    val tmp = Seq("__srn_v", "__srn_bkt", "__srn_lrn", "__srn_cnt", "__srn_off") ++
      (keys :+ "__srn_bkt").map(c => s"__srn_r_$c")
    val clash = (tmp :+ out).filter(df.columns.contains)
    require(clash.isEmpty,
      s"saltedRowNumber: column(s) ${clash.mkString(", ")} already exist in input")
    import org.apache.spark.sql.expressions.Window
    val vcol = rangeOn.cast("double")
    // quantile pass: metadata-sized driver result (buckets-1 doubles)
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else df.select(vcol.as("__srn_v")).na.drop
        .stat.approxQuantile("__srn_v",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted
    // bucket index = #boundaries strictly below v (ascending); a null v
    // contributes 0 to every term → edge bucket matching null-sort order
    val idxAsc = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(vcol > lit(b), 1).otherwise(0)
    }
    val idx = if (descending) lit(bounds.length) - idxAsc else idxAsc
    val ord = (if (descending) rangeOn.desc else rangeOn.asc) +: tieBreakers
    val withB = df.withColumn("__srn_bkt", idx)
    val keyCols = keys.map(col)
    val w1 = Window.partitionBy(keyCols :+ col("__srn_bkt"): _*).orderBy(ord: _*)
    val local = withB.withColumn("__srn_lrn", row_number().over(w1))
    val counts = withB.groupBy(keyCols :+ col("__srn_bkt"): _*)
      .agg(count(lit(1)).as("__srn_cnt"))
    val wOff = Window.partitionBy(keyCols: _*).orderBy(col("__srn_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__srn_off", coalesce(sum("__srn_cnt").over(wOff), lit(0L)))
      .drop("__srn_cnt")
    // null-safe join: windows/groupBy treat a null key as its own group,
    // so the offsets join must too — a plain USING join would drop every
    // null-key row (null = null is null), breaking the "rank attached to
    // EVERY row" contract for nullable keys
    val joinCols = keys :+ "__srn_bkt"
    val offsR = joinCols.foldLeft(offs)((d, c) =>
      d.withColumnRenamed(c, s"__srn_r_$c"))
    val cond = joinCols.map(c => local(c) <=> offsR(s"__srn_r_$c")).reduce(_ && _)
    local.join(offsR, cond)
      .withColumn(out,
        (col("__srn_lrn").cast("long") + col("__srn_off")).cast("int"))
      .select(df.columns.map(col) :+ col(out): _*)
  }

  /** Hot-key diagnosis: per-key counts above a threshold — run on a
    * sample before choosing between AQE, salting, or broadcast. */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc)
}
