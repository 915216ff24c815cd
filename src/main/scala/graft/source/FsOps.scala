package graft.source

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem control plane (SURVEY §2.3 S9 — the S3Hook subset the
  * reference actually uses: exists/list/read/write/delete/copy).
  *
  * Data-plane IO goes through `spark.read`/`spark.write`; these are the
  * driver-side control operations, on the Hadoop FileSystem API so the
  * same code runs against file:// in tests and s3a://, hdfs://, etc. in
  * production (S8: credentials become fs.s3a.* Hadoop conf, no bespoke
  * client).
  */
class FsOps(conf: Configuration) {
  def this(spark: SparkSession) = this(spark.sparkContext.hadoopConfiguration)

  private def fs(path: String): FileSystem =
    FileSystem.get(new URI(path), conf)

  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  /** check_for_prefix analogue: true iff any key matches the prefix —
    * the prefix itself (object or directory) or any path starting with it
    * (S3-style prefixes need not be objects themselves; a glob probe
    * matches `prefix*` the way ListObjectsV2 with Prefix= does). */
  def existsPrefix(prefix: String): Boolean = {
    val f = fs(prefix)
    f.exists(new Path(prefix)) ||
      Option(f.globStatus(new Path(prefix + "*"))).exists(_.nonEmpty)
  }

  /** list_keys analogue: file paths under a prefix (non-recursive). */
  def listKeys(prefix: String): Seq[String] = {
    val f = fs(prefix); val p = new Path(prefix)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
  }

  def readString(path: String): String = {
    val in = fs(path).open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  def writeString(path: String, content: String): Unit = {
    val out = fs(path).create(new Path(path), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** list_prefixes analogue: immediate sub-directories under a prefix. */
  def listPrefixes(prefix: String): Seq[String] = {
    val f = fs(prefix); val p = new Path(prefix)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.toString)
  }

  /** load_file(gzip=true) analogue: write gzip-compressed content. */
  def writeStringGzip(path: String, content: String): Unit = {
    val out = new java.util.zip.GZIPOutputStream(fs(path).create(new Path(path), true))
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** read a gzip object back to a string. */
  def readStringGzip(path: String): String = {
    val in = new java.util.zip.GZIPInputStream(fs(path).open(new Path(path)))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** download_file analogue: remote object → local file path. */
  def downloadFile(remote: String, localPath: String): Unit =
    fs(remote).copyToLocalFile(new Path(remote), new Path(localPath))

  /** delete_objects analogue (recursive for prefixes). */
  def delete(path: String): Boolean = fs(path).delete(new Path(path), true)

  /** copy_object analogue. */
  def copy(src: String, dst: String): Boolean =
    FileUtil.copy(fs(src), new Path(src), fs(dst), new Path(dst),
      false, true, conf)
}

/** CSV ingress (S12): header + schema inference, matching the reference's
  * pandas read_csv defaults (`operators/clevertap_user_profile.py:86-91`). */
object CsvSource {
  def read(spark: SparkSession, path: String,
           inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", "true")
      .option("inferSchema", inferSchema.toString).csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** upload_df_to_s3 analogue (`hooks/aws_s3.py:387-400`): write CSV then
    * VERIFY by reading the row count back; throws on mismatch. */
  def writeVerified(df: DataFrame, path: String): Long = {
    val expected = df.count()
    write(df, path)
    val got = read(df.sparkSession, path, inferSchema = false).count()
    require(got == expected, s"csv verify failed: wrote $expected rows, read back $got")
    got
  }
}

/** Egress source selection (reference `clevertap_user_profile.py:34` —
  * B1): the operator takes EITHER an in-memory dataset OR a staged CSV
  * path, never both, never neither. The reference's check has an
  * operator-precedence bug (`not df or not bucket and not key`) and
  * `not df` raises on a pandas frame; this implements the evident
  * intent as a total function. */
object ProfileSource {
  def resolve(spark: SparkSession, df: Option[DataFrame],
              csvPath: Option[String]): DataFrame = (df, csvPath) match {
    case (Some(d), None) => d
    case (None, Some(p)) => CsvSource.read(spark, p)
    case (Some(_), Some(_)) =>
      throw new IllegalArgumentException(
        "provide exactly one source: in-memory dataset OR csv path, not both")
    case (None, None) =>
      throw new IllegalArgumentException(
        "provide exactly one source: in-memory dataset OR csv path")
  }
}
