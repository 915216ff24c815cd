package graft.source

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental change-feed reading (SURVEY.md §1.4, §2.1 R6).
  *
  * The reference reads a Delta Change Data Feed bookmarked by an
  * application-managed job-run table (`tasks/user_profile/clevertap.py:10-27`).
  * Without the Delta jar we standardize a *changelog table* convention: an
  * append-only table carrying `_change_type` / a commit-timestamp column;
  * the incremental read is a timestamp-range filter, which Catalyst pushes
  * into the parquet scan (partition pruning when the table is
  * date-partitioned — the 100 TB posture).
  */
trait ChangeFeedSource {
  /** All changes strictly after `bookmark` (None ⇒ full history, the
    * reference's startingVersion=0 path). */
  def since(bookmark: Option[Timestamp]): DataFrame
}

/** Changelog-table implementation over any path Spark can read. */
class ChangelogTableSource(spark: SparkSession, path: String,
                           tsCol: String = "_commit_timestamp")
    extends ChangeFeedSource {
  def since(bookmark: Option[Timestamp]): DataFrame = {
    val df = spark.read.parquet(path)
    bookmark match {
      case Some(ts) => df.filter(col(tsCol) > lit(ts))
      case None     => df
    }
  }
}

/** Application-managed incremental bookmark, mirroring the reference's
  * `streaming_job_runs(query_name, last_job_run)` table. */
object Bookmarks {
  val table = "streaming_job_runs"

  /** Look up the bookmark for a job; absent row ⇒ None (full scan). */
  def lookup(spark: SparkSession, bookmarkPath: String, jobName: String): Option[Timestamp] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(bookmarkPath), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(bookmarkPath))) return None
    spark.read.parquet(bookmarkPath)
      .filter(col("query_name") === lit(jobName))   // parameterized, not interpolated (B11)
      .select("last_job_run")
      .collect()                                    // metadata-sized read; legitimate collect (R5)
      .headOption.map(_.getTimestamp(0))
  }

  /** Upsert the bookmark after a successful run (read-merge-write; the
    * table is metadata-sized). The new table is staged to a sibling path
    * and swapped in with delete+rename, so a crash mid-upsert leaves the
    * OLD bookmark intact (re-running the job re-sends, never skips) —
    * a plain overwrite deletes first and a crash then loses every
    * bookmark. Rename is atomic on HDFS/file; on object stores prefer a
    * transactional table for this metadata. */
  def upsert(spark: SparkSession, bookmarkPath: String, jobName: String,
             ts: Timestamp): Unit = {
    import spark.implicits._
    val updated = lookupAll(spark, bookmarkPath)
      .filter(_._1 != jobName) :+ (jobName, ts)
    val tmp = bookmarkPath.stripSuffix("/") + "__staging"
    updated.toDF("query_name", "last_job_run")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(bookmarkPath), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(bookmarkPath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  private def lookupAll(spark: SparkSession, path: String): Seq[(String, Timestamp)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) Seq.empty
    else spark.read.parquet(path)
      .select("query_name", "last_job_run") // by name, not position
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSeq
  }
}
