package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sink.HttpSink
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
      batchSize: Int = 1000,
      sinkResultsPath: Option[String] = None,
      /** Latest-per-key strategy: "window" (row_number over one hash
        * shuffle — the default) or "agg" (max(struct(...)) with map-side
        * partial aggregation — one candidate per key per upstream task
        * crosses the shuffle; prefer it when profile keys are skewed,
        * e.g. bot accounts with millions of changes). Both forms are
        * semantically identical under the (tsCol, tiebreakCol) order —
        * JobSpec proves it on a skewed fixture. */
      dedupForm: String = "window",
      /** Drift-tolerant changelog read: treat `changelogPath`'s
        * sub-directories as per-batch parquet with possibly DIFFERENT
        * schemas (union by name, missing-as-null, widened types — the
        * wide-evolving profile table of SURVEY §1.3). The mapping-
        * driven attribute selection downstream already tolerates
        * absent columns, so a drifted batch flows through end-to-end;
        * JobSpec proves it. Off by default: the plain single-schema
        * read skips the footer listing. */
      driftTolerant: Boolean = false) {
    /** Where per-batch sink results land (parquet). A sibling of the
      * bookmark store by default — NOT nested inside it, which would
      * corrupt the bookmark parquet directory. */
    def resultsPath: String =
      sinkResultsPath.getOrElse(s"${bookmarkPath}_sink_results/$jobName")
  }

  /** Driver-sized job outcome: counters + the path holding the per-batch
    * audit detail. Per-batch rows scale with the data (~10⁸ at 100 TB) and
    * deliberately never reach the driver — query `resultsPath` for them. */
  case class Result(validRows: Long, invalidRows: Long, batches: Long,
                    okBatches: Long, firstError: String, resultsPath: String,
                    newBookmark: Option[Timestamp])

  /** Steps 1–5, shared by every destination: bookmark lookup, pinned
    * incremental read, latest-per-key dedup, mapping-driven attribute
    * projection, sanity transforms + rename. */
  private[jobs] case class Prepared(renamed: DataFrame, keyOut: String,
                                    changes: DataFrame, bookmark: Option[Timestamp])

  /** Runs `egress` on the prepared frame, then upserts the bookmark from
    * the SAME pinned snapshot and releases it. A raw parquet directory is
    * not snapshot-isolated: without the persist, the bookmark read would
    * re-scan and count rows appended AFTER egress — which the next
    * incremental run would then silently skip. */
  private[jobs] def withPrepared[T](spark: SparkSession, conf: Conf)(
      egress: Prepared => T): (T, Option[Timestamp]) = {
    // 0. egress-safety guard: the destination APIs don't dedupe, so a
    //    speculating cluster would double-POST every batch (see
    //    HttpSink.requireNoSpeculation) — refuse to run
    HttpSink.requireNoSpeculation(spark)
    // 1. bookmark lookup (metadata-sized; absent ⇒ full history)
    val bookmark = Bookmarks.lookup(spark, conf.bookmarkPath, conf.jobName)

    // 2. incremental changelog read — timestamp filter pushed into the
    //    scan; drift-tolerant form unions mixed-schema batch dirs by
    //    name (missing-as-null) so an evolving producer can't fail the
    //    nightly run
    val feed: graft.source.ChangeFeedSource =
      if (conf.driftTolerant)
        // _change_type is required in every batch: the isin filter
        // below would silently drop a whole null-filled batch otherwise.
        // tsCol too (ADVICE r18): the since(bookmark) path only needs it
        // when a bookmark exists, so a FIRST, bookmark-less run over a
        // batch missing tsCol would otherwise egress those rows with
        // null timestamps and exclude them from the new bookmark — the
        // loud failure must fire before the first egress, not the second
        new graft.source.DriftTolerantChangelogSource(
          spark, conf.changelogPath, conf.tsCol,
          requiredCols = Seq("_change_type", conf.tsCol))
      else new ChangelogTableSource(spark, conf.changelogPath, conf.tsCol)
    val changes = feed.since(bookmark)
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 3. latest change per key (strategy per Conf.dedupForm)
      val latest = conf.dedupForm match {
        case "window" => Dedup.latestPerKey(changes, Seq(conf.keyCol),
          Seq(col(conf.tsCol).desc, col(conf.tiebreakCol).desc))
        case "agg" => Dedup.latestPerKeyAgg(changes, Seq(conf.keyCol),
          Seq(conf.tsCol, conf.tiebreakCol))
        case other => throw new IllegalArgumentException(
          s"dedupForm must be 'window' or 'agg', got '$other'")
      }

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
      val keyOut = conf.swapKeyMap.getOrElse(conf.keyCol, conf.keyCol)

      val out = egress(Prepared(renamed, keyOut, changes, bookmark))

      // 8. bookmark upsert: max commit timestamp actually processed — read
      //    from the pinned snapshot, so it covers exactly the egressed rows
      val maxTs = changes.agg(max(col(conf.tsCol))).collect().head
      val newBookmark =
        if (maxTs.isNullAt(0)) bookmark else Some(maxTs.getTimestamp(0))
      newBookmark.foreach(ts =>
        Bookmarks.upsert(spark, conf.bookmarkPath, conf.jobName, ts))
      (out, newBookmark)
    } finally changes.unpersist(blocking = false)
  }

  /** CleverTap-shaped egress (the reference's one wired production job):
    * JSON profile envelopes, ≤1000-record POST batches.
    *
    * Single-action egress: the valid/invalid counters ride the results
    * write as observed metrics (no separate `count()` pass re-executing
    * the dedup + transforms), and the per-batch results go to parquet —
    * the driver receives only the EgressStats summary. */
  def run(spark: SparkSession, conf: Conf,
          send: Seq[String] => (Int, String)): Result = {
    val ((stats, nInvalid), newBookmark) = withPrepared(spark, conf) { p =>
      // 6. envelope + invalid split (R21) — counted via observe, not count()
      val attrCols = p.renamed.columns.filter(_ != p.keyOut).toSeq
      val obs = org.apache.spark.sql.Observation()
      val payloads = HttpSink.observeEgress(p.renamed.select(
        Sanity.identity(Seq(col(p.keyOut))).as("identity"),
        Sanity.profileEnvelope(Sanity.identity(Seq(col(p.keyOut))),
          attrCols.map(a => a -> col(a))).as("payload")), obs, "identity")
      val (valid, _) = HttpSink.splitInvalid(payloads, "identity")
      // 7. distributed egress, materialized once by the results write
      val stats = HttpSink.writeResults(
        HttpSink.sendBatches(valid, "payload", conf.batchSize, send),
        conf.resultsPath)
      (stats, obs.get("records_invalid").asInstanceOf[Long])
    }
    Result(stats.records, nInvalid, stats.batches, stats.okBatches,
      stats.firstError, conf.resultsPath, newBookmark)
  }
}

/** spark-submit entrypoint with the reference's `--conf-file` contract
  * (`tasks/base.py:64-80`, `conf/deployment.json:5-20`): parse the JSON
  * conf (date macros substituted), build the destination client from the
  * connection registry, run the job, print the result summary.
  *
  *   spark-submit --class graft.jobs.UserProfileMain app.jar \
  *     --conf-file conf/user_profile/clevertap.json
  *
  * Conf keys (flat JSON strings; *_json keys hold nested JSON):
  * job_name, changelog_path, bookmark_path, key_col, ts_col,
  * tiebreak_col, platform, mapping_path, type_map_json, swap_key_json,
  * base_url, account_id, passcode, batch_size (optional, default 1000).
  */
object UserProfileMain {
  def parseConf(m: Map[String, String]): UserProfileJob.Conf = {
    def json2map(s: String): Map[String, String] = {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      import scala.jdk.CollectionConverters._
      root.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
    UserProfileJob.Conf(
      jobName = m("job_name"),
      changelogPath = m("changelog_path"),
      bookmarkPath = m("bookmark_path"),
      keyCol = m("key_col"),
      tsCol = m("ts_col"),
      tiebreakCol = m("tiebreak_col"),
      platform = m("platform"),
      mappingPath = m("mapping_path"),
      typeMap = m.get("type_map_json").map(json2map).getOrElse(Map.empty),
      swapKeyMap = m.get("swap_key_json").map(json2map).getOrElse(Map.empty),
      batchSize = m.get("batch_size").map(_.toInt).getOrElse(1000),
      sinkResultsPath = m.get("sink_results_path"),
      dedupForm = m.getOrElse("dedup_form", "window"))
  }

  def main(args: Array[String]): Unit = {
    val confPath = args.sliding(2).collectFirst {
      case Array("--conf-file", p) => p
    }.getOrElse(sys.error("usage: --conf-file <path>"))
    val m = graft.core.AppConfig.load(confPath)
    val conf = parseConf(m)
    // only stop a session this main itself created — under spark-submit
    // there is none yet; embedded callers (tests, notebooks) keep theirs
    val ownsSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isEmpty
    val spark = SparkSession.builder().appName(conf.jobName).getOrCreate()
    val client = new graft.sink.ClevertapClient(
      m("base_url"), m("account_id"), m("passcode"))
    val res = UserProfileJob.run(spark, conf, b => client.uploadProfiles(b))
    // counters the reference logs (TOTAL_RECORD_PROCESSED/SEND/INVALID)
    println(s"""{"valid":${res.validRows},"invalid":${res.invalidRows},""" +
      s""""batches":${res.batches},"ok":${res.okBatches}}""")
    if (ownsSession) spark.stop()
  }
}

/** Netcore-shaped job twin (reference `hooks/netcore.py:18-119` never got
  * a production task): same incremental pipeline, egress = CSV rows packed
  * into ≤4.5 MB staged files + one bulk-upload notification per file. */
object NetcoreUserProfileJob {
  import graft.sink.{NetcoreClient, NetcoreSink}

  /** Driver-sized outcome; per-file detail lives at `resultsPath`. */
  case class Result(files: Long, okFiles: Long, records: Long, bytes: Long,
                    invalidRows: Long, resultsPath: String,
                    newBookmark: Option[Timestamp])

  def run(spark: SparkSession, conf: UserProfileJob.Conf,
          client: NetcoreClient, stagingPrefix: String): Result = {
    val ((stats, nInvalid), newBookmark) =
      UserProfileJob.withPrepared(spark, conf) { p =>
        val cols = p.renamed.columns.toSeq
        // RFC-4180 CSV line per record: fields with commas, quotes, or
        // newlines are quoted/escaped exactly like the reference's pandas
        // to_csv (hooks/netcore.py:83-90) — free-text attributes survive.
        val obs = org.apache.spark.sql.Observation()
        val csv = HttpSink.observeEgress(p.renamed.select(
          Sanity.identity(Seq(col(p.keyOut))).as("identity"),
          Sanity.csvLine(cols.map(c => col(c).cast("string"))).as("csv")),
          obs, "identity")
        val (valid, _) = HttpSink.splitInvalid(csv, "identity")
        val header = cols.map(Sanity.csvQuoteString).mkString(",")
        val stats = NetcoreSink.writeResults(
          NetcoreSink.stageAndNotify(valid, "csv", header, stagingPrefix,
            client, client.maxChunkBytes),
          conf.resultsPath)
        (stats, obs.get("records_invalid").asInstanceOf[Long])
      }
    Result(stats.files, stats.okFiles, stats.records, stats.bytes,
      nInvalid, conf.resultsPath, newBookmark)
  }
}

/** Gamooga-shaped job twin (reference `hooks/gamooga.py:12-74`): same
  * incremental pipeline, egress = `{props, c, prop_types}` bulk-profile
  * POSTs, ≤1000 records per batch (the API contract in the docstring). */
object GamoogaUserProfileJob {
  import graft.sink.GamoogaClient

  def run(spark: SparkSession, conf: UserProfileJob.Conf,
          client: GamoogaClient, propTypesJson: String): UserProfileJob.Result = {
    val ((stats, nInvalid), newBookmark) =
      UserProfileJob.withPrepared(spark, conf) { p =>
        val attrCols = p.renamed.columns.filter(_ != p.keyOut).toSeq
        // per-record props object {key: id, attr: value, ...}
        val obs = org.apache.spark.sql.Observation()
        val props = HttpSink.observeEgress(p.renamed.select(
          Sanity.identity(Seq(col(p.keyOut))).as("identity"),
          to_json(struct(col(p.keyOut) +: attrCols.map(col): _*)).as("payload")),
          obs, "identity")
        val (valid, _) = HttpSink.splitInvalid(props, "identity")
        val stats = HttpSink.writeResults(
          HttpSink.sendBatches(valid, "payload", conf.batchSize,
            batch => client.uploadProfiles(batch.mkString("[", ",", "]"), propTypesJson)),
          conf.resultsPath)
        (stats, obs.get("records_invalid").asInstanceOf[Long])
      }
    UserProfileJob.Result(stats.records, nInvalid, stats.batches,
      stats.okBatches, stats.firstError, conf.resultsPath, newBookmark)
  }
}
