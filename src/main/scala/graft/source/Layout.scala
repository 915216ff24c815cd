package graft.source

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout utilities — the 100 TB knobs that live at WRITE time:
  *
  * - **Partitioned** layout (`partitionBy`): directory-level pruning; a
  *   filter on the partition column skips whole directories at the
  *   listing stage (PlanSpec asserts the scan's PartitionFilters).
  *   Choose low-cardinality columns (date, source, language) — one
  *   directory per value per write.
  * - **Bucketed** layout (`bucketBy` + `sortBy`): co-located joins and
  *   aggregations; two tables bucketed on the same key by the same count
  *   sort-merge join with NO exchange (PlanSpec asserts the shuffle-free
  *   plan). The layout for fact-fact joins repeated across jobs.
  *
  * Both are plain Spark writers; these helpers just pin the conventions.
  */
object Layout {

  /** Write a directory-partitioned parquet dataset. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a bucketed + in-bucket-sorted table (requires the session
    * catalog — bucketing metadata lives in the table, not the files). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  // --- Z-order (Morton) clustering: multi-dimensional data skipping ----
  //
  // Directory partitioning prunes ONE low-cardinality column; a plain
  // sort prunes one high-cardinality column. A selective filter on TWO
  // high-cardinality columns (user_id × time, key × score) prunes
  // nothing on either layout: every file's min/max on the second column
  // spans the whole domain. Z-ordering interleaves the bits of
  // equi-depth bucket ranks, so curve-adjacent rows are close in EVERY
  // dimension — each output file covers a small sub-rectangle and
  // parquet row-group stats prune both dimensions at once. Layout-only:
  // results never change, only which bytes are read (the same trade
  // Delta OPTIMIZE ZORDER BY makes).

  /** Equi-depth bucket rank of `c` against precomputed ascending
    * boundaries (from [[zorderBoundaries]]): the count of boundaries
    * strictly below the value, evaluated with a constant-size
    * `aggregate` over an array literal (a 255-term when-chain would blow
    * up codegen). Equi-depth, not min/max linear scaling: one outlier
    * would otherwise collapse every real value into one bucket and the
    * curve into a line. Nulls rank 0 (they sort together; layout-only
    * so correctness is unaffected). The cast to double is layout-only
    * too: a lossy cast (int64 > 2^53) can only merge adjacent buckets
    * and cost pruning efficiency, never rows. */
  def zorderBucket(c: Column, boundaries: Array[Double]): Column =
    aggregate(
      lit(boundaries),
      lit(0),
      (acc, b) => acc + when(c.cast("double") > b, 1).otherwise(0))

  /** Interleave the low `bits` bits of the given bucket ranks into one
    * Morton key: result bit (i*n + j) = bit i of column j. Bounded by
    * 63 total bits (LongType). */
  def zorderKey(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 1, "zorderKey needs at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"bits-per-column $bits x $n columns must stay within a Long")
    val terms = for (j <- 0 until n; i <- 0 until bits) yield
      shiftleft(
        shiftright(buckets(j).cast("long"), i).bitwiseAND(lit(1L)),
        i * n + j)
    terms.reduce(_ + _)  // disjoint bit positions: + is bitwise-or here
  }

  /** Driver-side equi-depth boundaries for each column: 2^bits - 1
    * approximate quantiles (metadata-sized — the same legitimate-collect
    * class as Skew's range boundaries). */
  def zorderBoundaries(df: DataFrame, cols: Seq[String], bits: Int)
      : Seq[Array[Double]] = {
    val fracs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    cols.map(c =>
      df.select(col(c).cast("double").as("__zq"))
        .stat.approxQuantile("__zq", fracs, 0.001))
  }

  /** Z-order-cluster `df` by `cols` into `files` parquet files at
    * `path`: equi-depth bucket each column (2^bits buckets), interleave
    * into the Morton key, range-repartition + sort by it, drop the
    * helper, write. One shuffle; the key never lands in the files. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int, bits: Int = 8): Unit = {
    val bounds = zorderBoundaries(df, cols, bits)
    val zk = zorderKey(
      cols.zip(bounds).map { case (c, b) => zorderBucket(col(c), b) }, bits)
    df.withColumn("__zkey", zk)
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  case class CompactionStats(rows: Long, files: Int, bytesPerRow: Long,
                             targetFileBytes: Long, totalBytes: Long)

  /** Target-file-size compacting writer — the 100 TB small-file /
    * skewed-file problem next to Z-order: a naive `df.write.parquet`
    * emits ONE file per task partition, so a skewed upstream (one hot
    * key's partition 100× the median) lands as one 100×-sized file
    * next to thousands of KB-sized ones, and every later scan pays
    * listing overhead per tiny file while the giant file serializes
    * one task. AQE coalesces SHUFFLE partitions, not bytes-per-output-
    * file on an already-partitioned write — this is the writer-side
    * knob (what Delta OPTIMIZE bin-packing does for existing tables).
    *
    * Mechanics: (1) the input is lazily checkpointed (count + sizing +
    * final write must not re-run an expensive upstream three times);
    * (2) real on-disk bytes/row come from writing a `sampleRows`-row
    * SAMPLE as actual parquet and measuring it — compressed width is
    * not derivable from the schema, and a logical-plan estimate misses
    * encoding wins entirely (the sample slightly UNDER-benefits from
    * dictionary/RLE vs the full file, so files land a little under
    * target — the safe side); (3) rows/file = target / bytesPerRow,
    * file count = ⌈rows / rowsPerFile⌉, ROUND-ROBIN repartition to
    * that count. Round-robin, not range: each output file gets an
    * arbitrary interleaving of input rows, so per-file byte sizes
    * CONCENTRATE around the mean regardless of input skew (sort-
    * preserving compaction is [[writeZOrdered]]'s job — this writer
    * trades ordering for uniform file sizes). Layout-only: the row SET
    * is untouched (spec-gated).
    *
    * At 100 TB: the sizing sample is one tiny extra job; the
    * repartition is the one unavoidable full shuffle (you cannot remix
    * bytes into right-sized files without moving them); file count
    * scales with data volume, never with upstream partitioning
    * accidents. */
  def writeCompacted(df: DataFrame, path: String, targetFileBytes: Long,
                     sampleRows: Int = 20000): CompactionStats = {
    require(targetFileBytes >= 64 * 1024,
      s"targetFileBytes must be >= 64 KiB; got $targetFileBytes")
    require(sampleRows >= 100, s"sampleRows must be >= 100; got $sampleRows")
    val spark = df.sparkSession
    val src = df.localCheckpoint(false)
    val total = src.count()
    val hconf = spark.sparkContext.hadoopConfiguration
    def dirBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      fs.listStatus(hp).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }
    if (total == 0L) {
      src.write.mode(SaveMode.Overwrite).parquet(path)
      return CompactionStats(0L, 1, 0L, targetFileBytes, dirBytes(path))
    }
    // UNIFORM seeded sample, not limit(n): the first N rows of an
    // input ordered by a width-correlated column (growing strings,
    // nulls-first) systematically misestimate bytes/row and files
    // land far from target. Unique temp dir (UUID suffix), not a
    // predictable sibling — a fixed "__sizing" name could clobber
    // pre-existing data on re-entrant/concurrent runs. Same FS as the
    // destination: executors must reach it, and measured compression
    // should see the destination codec defaults.
    val sizingPath = path.stripSuffix("/") + "__sizing_" +
      java.util.UUID.randomUUID().toString.take(8)
    val frac = math.min(1.0, sampleRows.toDouble / total * 1.1)
    val sample = src.sample(withReplacement = false, frac, seed = 42L)
      .localCheckpoint(true)
    val sRows = math.max(1L, sample.count())
    sample.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(sizingPath)
    val bytesPerRow = math.max(1L, dirBytes(sizingPath) / sRows)
    new org.apache.hadoop.fs.Path(sizingPath)
      .getFileSystem(hconf)
      .delete(new org.apache.hadoop.fs.Path(sizingPath), true)
    val rowsPerFile = math.max(1L, targetFileBytes / bytesPerRow)
    val nFiles = math.min(((total + rowsPerFile - 1) / rowsPerFile),
      1000000L).toInt
    src.repartition(nFiles).write.mode(SaveMode.Overwrite).parquet(path)
    CompactionStats(total, nFiles, bytesPerRow, targetFileBytes,
      dirBytes(path))
  }
}
