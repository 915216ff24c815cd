package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-bucketed quantile states (the HdrHistogram layout,
  * Gil Tene's high-dynamic-range histogram, reduced to its portable
  * integer core) — the QUANTILE member of the mergeable-rollup family
  * (reach q195, pacing q196, KMV distinct q202/q204): nightly latency
  * percentiles refresh by ADDING bin-count tables instead of
  * re-scanning the fact archive, and shard/stream states merge
  * losslessly because the state IS a count table.
  *
  * Design, deliberately NOT a probabilistic sketch: a positive long
  * buckets into `2^subBits` sub-buckets per power of two —
  *
  *   v < 2^s           → bin = v                    (EXACT region)
  *   v ≥ 2^s, e=⌊log2 v⌋ → bin = (e−s)·2^s + (v >> (e−s))
  *
  * — so every operation is deterministic integer arithmetic (e comes
  * from `length(bin(v))−1`, a pure string op identical in Spark and
  * DuckDB), the max relative error is structural (bin width / bin low
  * = 2^−s), merge is exact count addition (associative, commutative,
  * idempotent-safe under re-aggregation), and the quantile read —
  * smallest bin whose running count reaches rank ⌈p·n/100⌉, reported
  * as the bin's LOWER BOUND — replays bit-for-bit in any engine. The
  * true discrete percentile lies in [q_low, q_low·(1+2^−s)), and
  * below 2^s the read is exactly the discrete percentile.
  *
  * At 100 TB: the state table is ≤ (64−s)·2^s rows per key (s=6:
  * ≤ 3 712 bins) whatever the fact volume; building it is one
  * map-side-combining groupBy; merging N shards is a groupBy-sum over
  * bin rows; the read is a window over bins. Nothing touches the
  * archive after the state build. */
object Hdr {

  /** Bin index of a POSITIVE long value (callers filter/cast first —
    * zero/negative/null have no log bucket and are rejected loudly). */
  def hdrBin(v: Column, subBits: Int): Column = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in 1..16; got $subBits")
    val s = subBits
    val guarded = when(v.isNull || v <= 0, raise_error(
        concat(lit("hdrBin: value must be a positive long; got "),
          v.cast("string")))).otherwise(v)
    val e = (length(bin(guarded)) - 1).cast("long")
    when(guarded < (1L << s), guarded)
      .otherwise((e - s) * (1L << s) +
        call_function("shiftright", guarded, (e - s).cast("int")))
  }

  /** Lower bound of a bin — the reported quantile representative. */
  def hdrLow(binIdx: Column, subBits: Int): Column = {
    val s = subBits
    val b = call_function("div", binIdx, lit(1L << s))
    val m = binIdx % (1L << s)
    when(binIdx < (1L << s), binIdx)
      .otherwise(call_function("shiftleft", lit(1L << s) + m,
        (b - 1).cast("int")))
  }

  /** Build the per-key state table (key, bin, cnt) from positive-long
    * `valueCol`. One map-side-combining aggregation; the result is the
    * MERGEABLE state (rows add). */
  def hdrState(df: DataFrame, keyCol: String, valueCol: String,
               subBits: Int = 6): DataFrame =
    df.filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .groupBy(col(keyCol), hdrBin(col(valueCol), subBits).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge state tables — exact: counts add. Shard/nightly rollup. */
  def mergeHdrStates(keyCol: String, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy(col(keyCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile read over a state table: per (key, p ∈ `ps`, percent
    * points) the smallest bin whose cumulative count reaches rank
    * ⌈p·n/100⌉ (cum·100 ≥ p·n in exact integers — the
    * discretePercentiles rank), reported as (bin, q_low, n). */
  def hdrQuantiles(state: DataFrame, keyCol: String, ps: Seq[Int],
                   subBits: Int = 6): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percent points must be in 1..100; got $ps")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(col(keyCol))
    state
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(n))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("__cum") * 100 >= col("p") * col("__n"))
      .groupBy(col(keyCol), col("p"))
      .agg(min(col("bin")).as("bin"), max(col("__n")).as("n"))
      .withColumn("q_low", hdrLow(col("bin"), subBits))
      .select(col(keyCol), col("p"), col("n"), col("bin"), col("q_low"))
  }
}
