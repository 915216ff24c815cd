package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sink.{HttpSink, SinkResult}
import graft.source.{Bookmarks, ChangelogTableSource}
import graft.transform.Sanity

/** Job harness (reference `tasks/base.py:12-98`): a trait instead of a
  * base class with dbutils probing; config is a typed case class, not a
  * Spark text-read of a JSON file. */
trait SparkJob[C] {
  def run(spark: SparkSession, conf: C): Unit
}

/** E2 — the reference's sample job (`tasks/sample/entrypoint.py:4-20`):
  * range → format write → used as the harness smoke test. */
object SampleJob {
  case class Conf(outputFormat: String, outputPath: String)
  def run(spark: SparkSession, conf: Conf): Long = {
    spark.range(0, 1000).write.format(conf.outputFormat)
      .mode(SaveMode.Overwrite).save(conf.outputPath)
    spark.read.format(conf.outputFormat).load(conf.outputPath).count()
  }
}

/** E1 completed (SURVEY §3 E1 step 8): the reference's production job
  * computes latest-change-per-key and the attribute list but never wires
  * them to the sink; this job closes the loop:
  *
  *   changelog since bookmark → latest change per key → attribute
  *   projection (mapping table) → sanity type map → payload envelope →
  *   batched HTTP egress → bookmark upsert.
  *
  * Scale posture: the only shuffle is the dedup window's hash partition
  * on the key; the mapping table is metadata-sized (collected like R5 but
  * only column NAMES, never data rows); transforms are narrow codegen'd
  * expressions; egress is partition-local.
  */
object UserProfileJob {
  case class Conf(
      jobName: String,
      changelogPath: String,
      bookmarkPath: String,
      keyCol: String,
      tsCol: String,
      tiebreakCol: String,
      platform: String,
      mappingPath: String,           // parquet: property_name + per-platform bool cols
      typeMap: Map[String, String],  // T4 per-key tags
      swapKeyMap: Map[String, String],
      batchSize: Int = 1000)

  case class Result(validRows: Long, invalidRows: Long, sink: Seq[SinkResult],
                    newBookmark: Option[Timestamp])

  def run(spark: SparkSession, conf: Conf,
          send: Seq[String] => (Int, String)): Result = {
    // 1. bookmark lookup (metadata-sized; absent ⇒ full history)
    val bookmark = Bookmarks.lookup(spark, conf.bookmarkPath, conf.jobName)

    // 2. incremental changelog read — timestamp filter pushed into the scan.
    //    Persisted: a raw parquet directory is not snapshot-isolated, so
    //    without pinning, the bookmark read (step 8) would re-scan and count
    //    rows appended AFTER egress — which the next run would then skip.
    //    The cache makes every downstream action see one fixed snapshot.
    val changes = new ChangelogTableSource(spark, conf.changelogPath, conf.tsCol)
      .since(bookmark)
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // 3. latest change per key (single window, deterministic tiebreak)
    val latest = Dedup.latestPerKey(changes, Seq(conf.keyCol),
      Seq(col(conf.tsCol).desc, col(conf.tiebreakCol).desc))

    // 4. attribute selection from the mapping table: collect NAMES only
    //    (the reference collects the same metadata, clevertap.py:56-58)
    val attrs = spark.read.parquet(conf.mappingPath)
      .filter(col(conf.platform) === true)
      .select("property_name").collect().map(_.getString(0)).toSeq
      .filter(latest.columns.contains)

    // 5. sanity transforms (T4 compile) + projection + rename
    val typed = Sanity.compileTypeMap(
      Sanity.extractAttributes(latest, Seq(conf.keyCol) ++ attrs), conf.typeMap)
    val renamed = Sanity.swapKeys(typed, conf.swapKeyMap)

    // 6. envelope + invalid split (R21)
    val keyOut = conf.swapKeyMap.getOrElse(conf.keyCol, conf.keyCol)
    val attrCols = renamed.columns.filter(_ != keyOut).toSeq
    val payloads = renamed.select(
      Sanity.identity(Seq(col(keyOut))).as("identity"),
      Sanity.profileEnvelope(Sanity.identity(Seq(col(keyOut))),
        attrCols.map(a => a -> col(a))).as("payload"))
    val (valid, invalid) = HttpSink.splitInvalid(payloads, "identity")
    val nInvalid = invalid.count()

    // 7. distributed egress
    val results = HttpSink.sendBatches(valid, "payload", conf.batchSize, send)
      .collect().toSeq
    val nValid = results.map(_.records).sum

    // 8. bookmark upsert: max commit timestamp actually processed — read
    //    from the pinned snapshot, so it covers exactly the rows egressed
    //    in step 7, never rows appended concurrently.
    val maxTs = changes.agg(max(col(conf.tsCol))).collect().head
    val newBookmark =
      if (maxTs.isNullAt(0)) bookmark else Some(maxTs.getTimestamp(0))
    newBookmark.foreach(ts =>
      Bookmarks.upsert(spark, conf.bookmarkPath, conf.jobName, ts))

    Result(nValid, nInvalid, results, newBookmark)
    } finally changes.unpersist(blocking = false)
  }
}
