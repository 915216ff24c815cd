package graft.source

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
