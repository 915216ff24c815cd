package graft.analyze

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07) as a typed Spark `Aggregator` —
  * the bounded, mergeable custom aggregate:
  *
  *   state    = the k smallest DISTINCT 64-bit hashes seen (unsigned
  *              order), so O(k) memory per group regardless of input;
  *   merge    = set-union + trim to k (associative, commutative — safe
  *              under partial aggregation and any shuffle order);
  *   estimate = |H| when |H| < k (exact), else (k−1)·2⁶⁴ / kth-min,
  *              computed in exact integer arithmetic (BigInteger), so the
  *              result is bit-reproducible by any engine with the same
  *              hash — the DuckDB oracle replicates it with UHUGEINT math.
  *
  * Feed it md5-low64 hashes (`TokenHash.md5Low64`-compatible; see the q55
  * oracle) for cross-engine verification, or xxhash64 for raw speed.
  */
/** The shared KMV kernel: sorted-distinct unsigned k-min buffers.
  * Factored out (r15) so the SKETCH STATE itself can be a first-class
  * mergeable value — per-day states roll up to week/month without
  * re-touching entities ([[graft.analyze.Timeseries.activeUserLadderSketch]]). */
private[analyze] object KmvOps {
  // buffers are kept sorted (unsigned) and distinct, length <= k
  def insert(k: Int)(buf: Array[Long], h: Long): Array[Long] = {
    val pos = unsignedSearch(buf, h)
    if (pos < buf.length && buf(pos) == h) return buf // already present
    if (buf.length == k &&
        java.lang.Long.compareUnsigned(h, buf(k - 1)) >= 0) return buf
    val out = new Array[Long](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, pos)
    out(pos) = h
    System.arraycopy(buf, pos, out, pos + 1,
      math.min(buf.length - pos, out.length - pos - 1))
    out
  }

  def unsignedSearch(buf: Array[Long], h: Long): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Long.compareUnsigned(buf(mid), h) < 0) lo = mid + 1
      else hi = mid
    }
    lo
  }

  def estimate(k: Int)(buf: Array[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else {
      // (k-1) * 2^64 / kthMin, exact unsigned integer arithmetic
      val kth = new java.math.BigInteger(java.lang.Long.toUnsignedString(buf(k - 1)))
      java.math.BigInteger.valueOf(k - 1L)
        .shiftLeft(64).divide(kth).longValueExact()
    }

  val bufEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Long]
    with Serializable {
  require(k >= 2)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    KmvOps.insert(k)(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(KmvOps.insert(k))
  override def finish(buf: Array[Long]): Long = KmvOps.estimate(k)(buf)
  override def bufferEncoder: Encoder[Array[Long]] = KmvOps.bufEncoder
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Hashes → KMV STATE (the k-min array itself), for incremental
  * rollups: persist per-day states, merge upward with [[KmvMerge]].
  * Union-then-trim is EXACT: the k smallest hashes of a union are a
  * subset of the per-part k-smallest, so merged states equal the
  * state a direct pass over the union would build. */
class KmvState(k: Int) extends Aggregator[Long, Array[Long], Array[Long]]
    with Serializable {
  require(k >= 2)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    KmvOps.insert(k)(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(KmvOps.insert(k))
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = KmvOps.bufEncoder
  override def outputEncoder: Encoder[Array[Long]] = KmvOps.bufEncoder
}

/** KMV STATES → merged distinct estimate (the rollup side). */
class KmvMerge(k: Int)
    extends Aggregator[Array[Long], Array[Long], Long] with Serializable {
  require(k >= 2)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], st: Array[Long]): Array[Long] =
    (if (st == null) Array.emptyLongArray else st).foldLeft(buf)(KmvOps.insert(k))
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(KmvOps.insert(k))
  override def finish(buf: Array[Long]): Long = KmvOps.estimate(k)(buf)
  override def bufferEncoder: Encoder[Array[Long]] = KmvOps.bufEncoder
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvDistinct {
  /** Untyped-DataFrame form: `df.agg(KmvDistinct.udafFor(64)(col("h")))`. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvDistinct(k))

  /** hashes → state array (the incremental-rollup building block). */
  def stateUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvState(k))

  /** state arrays → merged estimate. */
  def mergeUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvMerge(k), KmvOps.bufEncoder)

  /** SQL-surface registration (UDAFs register per session, not via
    * SparkSessionExtensions): `SELECT kmv_distinct_64(h) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int): Unit =
    spark.udf.register(s"kmv_distinct_$k", udafFor(k))

  /** Engine-portable 64-bit hash of a string column: first 16 md5 hex
    * chars as a big-endian long — all codegen'd built-ins; equal to
    * DuckDB's ('0x'||substr(md5(c),1,16))::UBIGINT bit pattern. */
  def md5Low64(c: Column): Column = {
    import org.apache.spark.sql.functions._
    shiftleft(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(c), 9, 8), 16, 10).cast("long"))
  }
}

/** Set ALGEBRA over KMV sketches — the piece that makes the k-min
  * state more than a distinct counter: because the k smallest hashes
  * of A ∪ B are a subset of A's k-mins ∪ B's k-mins, union sketches
  * compose EXACTLY from per-segment states, and the classic
  * intersection estimator (Beyer et al., SIGMOD'07) needs only
  * membership tests inside the union sketch:
  *
  *   K  = k-min(A_sketch ∪ B_sketch)        (= k-min(A ∪ B), exact)
  *   ρ  = |{h ∈ K : h ∈ A_sketch ∧ h ∈ B_sketch}| / k
  *   |A ∩ B| ≈ ρ · est(|A ∪ B|)
  *
  * At 100 TB this is the audience-overlap matrix that never touches
  * the fact table twice: per-segment states are O(k) each, every
  * pair's algebra runs over ≤ 2k METADATA rows. */
object KmvAlgebra {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.DataFrame

  /** Pairwise audience overlap across segments (`typeCol` values): for
    * every unordered segment pair, the union sketch's size and kth-min
    * hash, the intersection match count ρ·k, and — for evaluation at
    * gate scale — the exact distinct audience sizes and overlap.
    *
    * Determinism: everything gated is integer — the kth-min is the
    * md5-low64 bit pattern itself ([[KmvDistinct.md5Low64]]), match
    * counts are set cardinalities, exact counts are distinct counts.
    * The IEEE estimates (`est_union`, `est_intersection`,
    * `jaccard_est`) are display-only (spec-checked against
    * [[KmvOps.estimate]]'s exact integer form).
    *
    * Shape: ONE fact-scale pass builds the O(k) per-segment states
    * (partial-aggregating UDAF — the q55 machinery); one distinct
    * (segment, entity) relation feeds the exact-eval columns (drop it
    * at true scale: production keeps sketches only). The pair algebra
    * — type-table cross (T² rows), union ranking, membership counts —
    * runs entirely over (T² × 2k)-row relations: metadata, whatever
    * the fact volume. The unsigned hash order Spark lacks natively is
    * the signed order of `h XOR Long.MinValue` (sign-flip trick; DuckDB
    * orders its UBIGINT natively — same total order). */
  def audienceOverlap(events: DataFrame, entityCol: String,
                      typeCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2; got $k")
    val base = events
      .filter(col(typeCol).isNotNull && col(entityCol).isNotNull)
    val states = base
      .select(col(typeCol).as("__t"),
        KmvDistinct.md5Low64(col(entityCol).cast("string")).as("__h"))
      .groupBy(col("__t"))
      .agg(KmvDistinct.stateUdaf(k)(col("__h")).as("__st"))
    val sketch = overlapFromStates(states, "__t", "__st", k)
    val et = base
      .select(col(typeCol).as("__t"), col(entityCol).as("__e")).distinct()
    val sizes = et.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val tp = sizes.select(col("__t").as("type_a"), col("__n").as("exact_a"))
      .crossJoin(
        sizes.select(col("__t").as("type_b"), col("__n").as("exact_b")))
      .filter(col("type_a") < col("type_b"))
    val inter = et.select(col("__t").as("__ta"), col("__e"))
      .join(et.select(col("__t").as("__tb"), col("__e")), Seq("__e"))
      .filter(col("__ta") < col("__tb"))
      .groupBy(col("__ta").as("type_a"), col("__tb").as("type_b"))
      .agg(count(lit(1)).as("__xi"))
    sketch.join(broadcast(tp), Seq("type_a", "type_b"))
      .join(broadcast(inter), Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("exact_a"), col("exact_b"),
        coalesce(col("__xi"), lit(0L)).as("exact_inter"),
        (col("exact_a") + col("exact_b") -
          coalesce(col("__xi"), lit(0L))).as("exact_union"),
        col("n_union_sketch"), col("inter_matches"), col("union_kth"),
        col("est_union"), col("est_intersection"), col("jaccard_est"))
  }

  /** The PRODUCTION read path: the pairwise overlap matrix straight
    * from a stored/streamed per-segment state table (`segCol`,
    * `stateCol: array<long>`) — e.g. the output of
    * [[graft.streaming.StreamingRollup.kmvStateStream]] or a nightly
    * state merge — WITHOUT touching the fact archive. Everything here
    * is (segments² × 2k)-row metadata work; the estimates are the
    * display-only IEEE forms (the exact integer estimator lives in
    * [[KmvOps.estimate]]/[[KmvDistinct]]). */
  def overlapFromStates(states: DataFrame, segCol: String,
                        stateCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2; got $k")
    import org.apache.spark.sql.expressions.Window
    val sk = states
      .select(col(segCol).as("__t"), explode(col(stateCol)).as("__h"))
    val tp = states.select(col(segCol).as("type_a"))
      .crossJoin(states.select(col(segCol).as("type_b")))
      .filter(col("type_a") < col("type_b"))
    val ph = tp
      .join(sk,
        col("__t") === col("type_a") || col("__t") === col("type_b"))
      .groupBy(col("type_a"), col("type_b"), col("__h"))
      .agg(max(when(col("__t") === col("type_a"), 1).otherwise(0))
          .as("__ina"),
        max(when(col("__t") === col("type_b"), 1).otherwise(0))
          .as("__inb"))
    val wu = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(col("__h").bitwiseXOR(lit(Long.MinValue)).asc)
    val u = ph.withColumn("__rn", row_number().over(wu))
      .filter(col("__rn") <= k)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_union_sketch"),
        sum(col("__ina") * col("__inb")).cast("long").as("inter_matches"),
        max(col("__h").bitwiseXOR(lit(Long.MinValue)))
          .bitwiseXOR(lit(Long.MinValue)).as("union_kth"))
    // display-only estimates: unsigned kth as a double via the flipped
    // value + 2^63 (exact for the magnitude class; gated columns stay
    // integer)
    val kthU = col("union_kth").bitwiseXOR(lit(Long.MinValue))
      .cast("double") + lit(math.pow(2.0, 63))
    val estU = when(col("n_union_sketch") < k,
        col("n_union_sketch").cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 64)) / kthU)
    // rho denominator = effective sketch size: below k the union sketch
    // holds the WHOLE union, so dividing by the constant k would shrink
    // exact answers (k=64, union 40, inter 10 must read 10, not 6.25).
    val rhoDen = least(col("n_union_sketch"), lit(k.toLong)).cast("double")
    u.select(col("type_a"), col("type_b"), col("n_union_sketch"),
      col("inter_matches"), col("union_kth"),
      estU.as("est_union"),
      (col("inter_matches").cast("double") / rhoDen * estU)
        .as("est_intersection"),
      (col("inter_matches").cast("double") / rhoDen)
        .as("jaccard_est"))
  }

  /** ROLLING reach from stored DAILY sketch states — the 7-day-active
    * timeline without re-scanning the fact archive: k-min sketches
    * compose under union (k-min(∪ days) ⊆ ∪ day k-mins), so each
    * day's trailing-`windowDays` reach reads only the window's daily
    * state rows. Each stored hash fans out to the ≤ `windowDays`
    * target days it can serve (sequence + explode — days × k × w
    * metadata rows, never facts), distinct-per-(day, hash) collapses
    * cross-day repeats, and the per-day union sketch ranks by the
    * unsigned order (sign-flip trick). Target days are the OBSERVED
    * days (a day with no events reports no row — absence, not zero).
    *
    * Gated INTEGER-ONLY columns (q202 discipline): the union sketch
    * size, the kth-min hash bit pattern, and — for gate-scale
    * evaluation only when `includeExact = true` — the exact rolling
    * distinct count. Set `includeExact = false` at true scale: the
    * exact branch explodes the fact-grain distinct (day, hash)
    * relation windowDays× and inner-joins it, i.e. it pays exactly
    * the fact-scale recompute the sketch exists to avoid; with the
    * flag off, that relation and the join are never built (plan-
    * gated — the sketch-only timeline is a pure read of the daily
    * states). For a production read of PRE-STORED states, use
    * [[dailyReachStates]] (the nightly writer) +
    * [[rollingReachFromStates]] (the state-only reader) — this
    * function is the two composed plus the optional exact anchor.
    * `est_reach` is the display-only IEEE estimate, exact below k. */
  def rollingReachFromDaily(events: DataFrame, entityCol: String,
                            tsCol: String, windowDays: Int,
                            k: Int = 64,
                            includeExact: Boolean = true): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1; got $windowDays")
    require(k >= 2, s"k must be >= 2; got $k")
    val base = events
      .filter(col(tsCol).isNotNull && col(entityCol).isNotNull)
      .select(
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("__day"),
        KmvDistinct.md5Low64(col(entityCol).cast("string")).as("__h"))
    val daily = base.groupBy(col("__day"))
      .agg(KmvDistinct.stateUdaf(k)(col("__h")).as("__st"))
      .select(col("__day").as("day"), col("__st").as("state"))
    val sketchTimeline = rollingReachFromStates(daily, windowDays, k)
    if (!includeExact) return sketchTimeline
    val spine = daily.select(col("day"))
    // gate-scale exact eval: distinct entities in each trailing window
    val exact = base.select(col("__day"), col("__h")).distinct()
      .withColumn("day",
        explode(sequence(col("__day"), col("__day") + (windowDays - 1))))
      .join(spine, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("__h")).as("exact_reach"))
    sketchTimeline.join(exact, Seq("day"))
      .select(col("day"), col("n_sketch"), col("kth_min"),
        col("exact_reach"), col("est_reach"))
  }

  /** The nightly DAILY-STATE writer for [[rollingReachFromStates]]:
    * one (day, state) row per observed day, state = the day's k-min
    * hash array over distinct entities. This is the only stage that
    * reads facts; persist its output and every downstream rolling
    * window is a state-only read. */
  def dailyReachStates(events: DataFrame, entityCol: String,
                       tsCol: String, k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2; got $k")
    events
      .filter(col(tsCol).isNotNull && col(entityCol).isNotNull)
      .select(
        datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("__day"),
        KmvDistinct.md5Low64(col(entityCol).cast("string")).as("__h"))
      .groupBy(col("__day"))
      .agg(KmvDistinct.stateUdaf(k)(col("__h")).as("state"))
      .select(col("__day").as("day"), col("state"))
  }

  /** The PRODUCTION rolling-reach read: trailing-`windowDays`
    * distinct-entity timeline from stored (day, state) rows ONLY —
    * the plan never touches the fact archive (spec-gated). Each
    * stored hash fans out to the ≤ `windowDays` target days it can
    * serve (sequence + explode — days × k × w metadata rows),
    * distinct-per-(day, hash) collapses cross-day repeats, and the
    * per-day union sketch ranks by the unsigned order (sign-flip
    * trick). Target days are the OBSERVED days (a day with no state
    * row reports no row — absence, not zero). */
  def rollingReachFromStates(dailyStates: DataFrame, windowDays: Int,
                             k: Int = 64): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1; got $windowDays")
    require(k >= 2, s"k must be >= 2; got $k")
    val spine = dailyStates.select(col("day"))
    // each stored hash serves target days srcDay .. srcDay + w - 1
    val contrib = dailyStates
      .select(col("day").as("__srcday"), explode(col("state")).as("__h"))
      .withColumn("day",
        explode(sequence(col("__srcday"), col("__srcday") + (windowDays - 1))))
      .join(spine, Seq("day"), "left_semi")
      .select(col("day"), col("__h")).distinct()
    val wu = org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
      .orderBy(col("__h").bitwiseXOR(lit(Long.MinValue)).asc)
    val sk = contrib.withColumn("__rn", row_number().over(wu))
      .filter(col("__rn") <= k)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sketch"),
        max(col("__h").bitwiseXOR(lit(Long.MinValue)))
          .bitwiseXOR(lit(Long.MinValue)).as("kth_min"))
    val kthU = col("kth_min").bitwiseXOR(lit(Long.MinValue))
      .cast("double") + lit(math.pow(2.0, 63))
    sk.select(col("day"), col("n_sketch"), col("kth_min"),
      when(col("n_sketch") < k, col("n_sketch").cast("double"))
        .otherwise(lit((k - 1).toDouble * math.pow(2.0, 64)) / kthU)
        .as("est_reach"))
  }
}
