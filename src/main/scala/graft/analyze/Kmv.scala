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
