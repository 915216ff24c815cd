package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.CopyOnWriteArrayList

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.jobs.{SampleJob, UserProfileJob}
import graft.source.{Bookmarks, ChangelogTableSource}

/** JVM-wide send counter for the single-action spec (see comment at the
  * use site: captured counters get copied into serialized task closures). */
object JobSpecSendCounter {
  val n = new java.util.concurrent.atomic.AtomicInteger()
  val bodies = new CopyOnWriteArrayList[String]()
}

/** End-to-end pipeline tests: the E1-completed UserProfileJob over a
  * file:// changelog with a live HTTP stub, plus the E2 sample job and
  * the bookmark/changefeed protocol. */
class JobSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("SampleJob: range → write → read-back count (E2 smoke)") {
    val dir = Files.createTempDirectory("graft-sample").toString
    assert(SampleJob.run(spark, SampleJob.Conf("parquet", s"$dir/out")) == 1000L)
  }

  test("Bookmarks: absent → None; upsert → roundtrip; per-job isolation") {
    val path = Files.createTempDirectory("graft-bm").toString + "/bookmarks"
    assert(Bookmarks.lookup(spark, path, "job1").isEmpty)
    Bookmarks.upsert(spark, path, "job1", ts("2024-01-10 00:00:00"))
    Bookmarks.upsert(spark, path, "job2", ts("2024-02-01 00:00:00"))
    Bookmarks.upsert(spark, path, "job1", ts("2024-01-15 00:00:00"))
    assert(Bookmarks.lookup(spark, path, "job1").contains(ts("2024-01-15 00:00:00")))
    assert(Bookmarks.lookup(spark, path, "job2").contains(ts("2024-02-01 00:00:00")))
  }

  test("ChangelogTableSource.since filters strictly after bookmark") {
    val dir = Files.createTempDirectory("graft-cl").toString + "/log"
    Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-02 00:00:00")))
      .toDF("id", "_commit_timestamp").write.parquet(dir)
    val src = new ChangelogTableSource(spark, dir)
    assert(src.since(None).count() == 2)
    assert(src.since(Some(ts("2024-01-01 00:00:00"))).count() == 1)
    assert(src.since(Some(ts("2024-01-02 00:00:00"))).count() == 0)
  }

  test("AutoChangeFeedSource: Delta probe gates the CDF path; convention fallback") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-cdf").toString + "/log"
    Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-02 00:00:00")))
      .toDF("id", "_commit_timestamp").write.parquet(dir)
    // no Delta jar in this environment: the real probe is false, and the
    // source must behave exactly like the changelog-table convention
    assert(!graft.source.DeltaCdf.available)
    val auto = new graft.source.AutoChangeFeedSource(spark, dir)
    assert(auto.since(None).count() == 2)
    assert(auto.since(Some(ts("2024-01-01 00:00:00"))).count() == 1)
    // probe mocked TRUE: the injected CDF reader is used and the strict
    // bookmark filter still applies on top of whatever CDF returns
    val cdfCalls = new CopyOnWriteArrayList[String]()
    val mocked = new graft.source.AutoChangeFeedSource(spark, dir,
      probe = () => true,
      cdfReader = (s, p, bm) => {
        cdfCalls.add(s"$p@$bm")
        Seq((10L, ts("2024-02-01 00:00:00")), (11L, ts("2023-12-01 00:00:00")))
          .toDF("id", "_commit_timestamp")
      })
    val out = mocked.since(Some(ts("2024-01-01 00:00:00")))
      .select("id").as[Long].collect().toSet
    assert(out == Set(10L))          // 11 is before the bookmark → filtered
    assert(cdfCalls.size == 1)
  }

  test("Delta CDF LIVE path: real readChangeFeed end-to-end when delta-spark is on the classpath") {
    import org.apache.spark.sql.functions.col
    // auto-skip without the jar: this environment ships none, so the
    // branch above is probe/mock-tested; on a classpath WITH delta-spark
    // this test exercises the true format("delta") CDF read instead.
    // Resolution was attempted and is IMPOSSIBLE here (verified round 12,
    // do not re-litigate): `find ~/.cache/coursier ~/.ivy2 -iname '*delta*'`
    // and `ls /opt/spark/jars | grep -i delta` both return nothing, and
    // COURSIER_MODE=offline + zero egress means a libraryDependencies
    // entry cannot fetch it. The missing artifact is exactly
    // io.delta:delta-spark_2.13:4.x (+ io.delta:delta-storage). On any
    // classpath that carries those two jars (e.g. Databricks, or sbt with
    // network), this test runs as-is with no code change.
    if (!graft.source.DeltaCdf.available) {
      info("delta-spark not on classpath — live CDF read skipped " +
        "(probe gating and fallback are covered by the previous test)")
      cancel("missing artifact: io.delta:delta-spark_2.13 (+delta-storage) — " +
        "absent from /opt/spark/jars and the offline coursier/ivy caches; " +
        "unfetchable with zero egress. Runs unmodified once those jars are present.")
    }
    val dir = Files.createTempDirectory("graft-delta-live").toString + "/tbl"
    val cdfDefault = "spark.databricks.delta.properties.defaults.enableChangeDataFeed"
    spark.conf.set(cdfDefault, "true") // new tables get CDF from version 0
    try {
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format("delta").save(dir)
      Seq((3L, "c")).toDF("id", "v")
        .write.format("delta").mode("append").save(dir)
      // the REAL branch: probe true → format("delta").option("readChangeFeed")
      val src = new graft.source.AutoChangeFeedSource(spark, dir)
      val all = src.since(None)
      assert(all.columns.contains("_change_type"), all.columns.mkString(","))
      assert(all.filter(col("_change_type") === "insert").count() == 3)
      // strict > bookmark filtering applies on top of the CDF read
      val latest = all.agg(org.apache.spark.sql.functions.max(
        col("_commit_timestamp"))).head.getTimestamp(0)
      assert(src.since(Some(latest)).count() == 0)
    } finally spark.conf.unset(cdfDefault)
  }

  test("UserProfileJob end-to-end: dedup → transforms → egress → bookmark") {
    val root = Files.createTempDirectory("graft-job").toString
    // changelog: two changes for user 1 (latest wins), one for user 2,
    // a delete (filtered), and an empty-identity row (invalid)
    Seq(
      ("1", "9876543210", "50.5", "1985-09-03", "insert", ts("2024-01-01 10:00:00"), 1L),
      ("1", "919876543210", "99.0", "1890-01-05", "update_postimage", ts("2024-01-01 11:00:00"), 2L),
      ("2", "12345", "x", "garbage", "insert", ts("2024-01-01 09:00:00"), 3L),
      ("3", "9999999999", "1.0", "2000-02-29", "delete", ts("2024-01-01 12:00:00"), 4L),
      ("", "8888888888", "2.0", "2001-01-01", "insert", ts("2024-01-01 13:00:00"), 5L)
    ).toDF("customer_id", "mobile", "reward", "dob", "_change_type", "_commit_timestamp", "_commit_version")
      .write.parquet(s"$root/changelog")
    // mapping table: mobile+reward+dob routed to clevertap, dob not to netcore
    Seq(("mobile", true, false), ("reward", true, true), ("dob", true, false),
      ("unused_col", true, true))
      .toDF("property_name", "clevertap", "netcore").write.parquet(s"$root/mapping")

    val bodies = new CopyOnWriteArrayList[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        bodies.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        ex.sendResponseHeaders(200, 2); ex.getResponseBody.write("ok".getBytes); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new graft.sink.ClevertapClient(url, "a", "p")
      val conf = UserProfileJob.Conf(
        jobName = "up_test", changelogPath = s"$root/changelog",
        bookmarkPath = s"$root/bookmarks", keyCol = "customer_id",
        tsCol = "_commit_timestamp", tiebreakCol = "_commit_version",
        platform = "clevertap", mappingPath = s"$root/mapping",
        typeMap = Map("mobile" -> "mobile_sanity", "reward" -> "modify_reward",
          "dob" -> "date"),
        swapKeyMap = Map("customer_id" -> "identity_id"))
      val res = UserProfileJob.run(spark, conf, b => client.uploadProfiles(b))

      assert(res.validRows == 2)   // users 1 and 2 (delete filtered, "" invalid)
      assert(res.invalidRows == 1)
      assert(res.batches > 0 && res.okBatches == res.batches)
      // per-batch audit detail is ON STORAGE, not the driver
      val audit = spark.read.parquet(res.resultsPath)
      assert(audit.count() == res.batches)
      assert(audit.columns.contains("idempotencyKey"))
      assert(res.newBookmark.contains(ts("2024-01-01 13:00:00")))
      val body = bodies.toArray.map(_.toString).mkString
      // user 1: the LATEST change (mobile 91..→ last10, reward 99→9900, dob 1890→1952)
      assert(body.contains(""""identity":"1""""))
      assert(body.contains(""""mobile":"9876543210""""))
      assert(body.contains(""""reward":"9900""""))
      assert(body.contains(""""dob":"1952-01-05""""))
      // user 2: keep-original on failed casts (B7)
      assert(body.contains(""""reward":"""") || body.contains(""""identity":"2""""))

      // incremental re-run: nothing new after the bookmark
      val res2 = UserProfileJob.run(spark, conf, b => client.uploadProfiles(b))
      assert(res2.validRows == 0 && res2.newBookmark == res.newBookmark)
    } finally server.stop(0)
  }

  test("Netcore and Gamooga job twins share the incremental pipeline") {
    val root = Files.createTempDirectory("graft-twin").toString
    Seq(
      ("1", "9876543210", "50.5", "insert", ts("2024-03-01 10:00:00"), 1L),
      ("1", "919876543210", "99.0", "update_postimage", ts("2024-03-01 11:00:00"), 2L),
      ("2", "7777777777", "3.25", "insert", ts("2024-03-01 09:00:00"), 3L),
      ("", "8888888888", "2.0", "insert", ts("2024-03-01 13:00:00"), 5L)
    ).toDF("customer_id", "mobile", "reward", "_change_type", "_commit_timestamp", "_commit_version")
      .write.parquet(s"$root/changelog")
    Seq(("mobile", true), ("reward", true))
      .toDF("property_name", "netcore").write.parquet(s"$root/mapping")

    val notified = new CopyOnWriteArrayList[String]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        notified.add(ex.getRequestURI.toString + "\n" +
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        ex.sendResponseHeaders(200, 2); ex.getResponseBody.write("ok".getBytes); ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val conf = UserProfileJob.Conf(
        jobName = "twin_test", changelogPath = s"$root/changelog",
        bookmarkPath = s"$root/bookmarks_nc", keyCol = "customer_id",
        tsCol = "_commit_timestamp", tiebreakCol = "_commit_version",
        platform = "netcore", mappingPath = s"$root/mapping",
        typeMap = Map("mobile" -> "mobile_sanity", "reward" -> "modify_reward"),
        swapKeyMap = Map.empty)

      val nc = graft.jobs.NetcoreUserProfileJob.run(spark, conf,
        new graft.sink.NetcoreClient(url, "key", "me@x.com"),
        "file://" + root + "/staging")
      assert(nc.files > 0 && nc.okFiles == nc.files)
      assert(nc.records == 2) // latest-of-1 + 2; "" invalid
      assert(spark.read.parquet(nc.resultsPath).count() == nc.files)
      assert(nc.invalidRows == 1)
      assert(nc.newBookmark.contains(ts("2024-03-01 13:00:00")))
      assert(notified.toArray.exists(_.toString.contains("bulkupload")))

      val gconf = conf.copy(bookmarkPath = s"$root/bookmarks_gm")
      val gm = graft.jobs.GamoogaUserProfileJob.run(spark, gconf,
        new graft.sink.GamoogaClient(url, "c42", "sec"),
        """{"mobile":"string","reward":"numeric"}""")
      assert(gm.validRows == 2 && gm.invalidRows == 1)
      assert(gm.okBatches == gm.batches && gm.batches > 0)
      val gBody = notified.toArray.map(_.toString).find(_.contains("bulkvpr")).get
      assert(gBody.contains(""""c":"c42"""") && gBody.contains("prop_types"))
      assert(gm.newBookmark.contains(ts("2024-03-01 13:00:00")))
    } finally server.stop(0)
  }

  test("job egress is single-action: no count() pass; one send per batch") {
    val root = Files.createTempDirectory("graft-1act").toString
    // 2500 valid rows + 1 invalid → 3 batches at batchSize 1000
    val rows = (1 to 2500).map(i =>
      (i.toString, s"98765432${"%02d".format(i % 100)}", "insert",
        ts("2024-05-01 10:00:00"), i.toLong)) :+
      (("", "8888888888", "insert", ts("2024-05-01 11:00:00"), 9999L))
    rows.toDF("customer_id", "mobile", "_change_type", "_commit_timestamp", "_commit_version")
      .write.parquet(s"$root/changelog")
    Seq(("mobile", true)).toDF("property_name", "clevertap")
      .write.parquet(s"$root/mapping")

    val funcNames = new CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        funcNames.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // static counter: task closures are serialized even in local mode, so
    // a captured AtomicInteger would increment a per-task COPY
    JobSpecSendCounter.n.set(0)
    try {
      val conf = UserProfileJob.Conf(
        jobName = "one_action", changelogPath = s"$root/changelog",
        bookmarkPath = s"$root/bookmarks", keyCol = "customer_id",
        tsCol = "_commit_timestamp", tiebreakCol = "_commit_version",
        platform = "clevertap", mappingPath = s"$root/mapping",
        typeMap = Map.empty, swapKeyMap = Map.empty)
      val res = UserProfileJob.run(spark, conf,
        b => { JobSpecSendCounter.n.incrementAndGet(); (200, "ok") })
      // drain the async listener bus (stable size for 400ms), THEN
      // snapshot and unregister — the audit read-back below runs its own
      // count() and must not pollute the job's event window
      val deadline = System.currentTimeMillis() + 8000
      var last = -1
      while (System.currentTimeMillis() < deadline &&
        (funcNames.size != last || last == 0)) {
        last = funcNames.size; Thread.sleep(400)
      }
      val jobEvents = funcNames.toArray.map(_.toString).toSeq
      spark.listenerManager.unregister(listener)

      assert(res.validRows == 2500 && res.invalidRows == 1)
      // batching is partition-local: ≥3 batches (2500 rows, ≤1000 each)
      assert(res.batches >= 3 && res.okBatches == res.batches)
      // each batch POSTed exactly once — egress materialized by the one
      // results-write action, never re-run by a counting pass
      assert(JobSpecSendCounter.n.get == res.batches)
      assert(spark.read.parquet(res.resultsPath).count() == res.batches)
      // the invalid counter rode the write as an observed metric; the old
      // shape ran a dedicated Dataset.count() action (listener-visible)
      assert(!jobEvents.contains("count"),
        s"egress ran a count() action: ${jobEvents.mkString(",")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("dedupForm window vs agg: identical results on a skewed changelog") {
    val root = Files.createTempDirectory("graft-skew").toString
    // hot key "1": 5000 changes; cold keys 2..40: one change each
    val hot = (1 to 5000).map(v =>
      ("1", s"98765000${"%02d".format(v % 100)}", "insert",
        ts(f"2024-06-01 ${v % 24}%02d:${v % 60}%02d:00"), v.toLong))
    val cold = (2 to 40).map(k =>
      (k.toString, s"97765000${"%02d".format(k % 100)}", "insert",
        ts("2024-06-01 09:00:00"), 100000L + k))
    (hot ++ cold).toDF("customer_id", "mobile", "_change_type",
        "_commit_timestamp", "_commit_version")
      .write.parquet(s"$root/changelog")
    Seq(("mobile", true)).toDF("property_name", "clevertap")
      .write.parquet(s"$root/mapping")

    // static holder: the send closure is serialized per task, so a
    // captured local list would collect into per-task copies
    def runForm(form: String): graft.jobs.UserProfileJob.Result = {
      val conf = UserProfileJob.Conf(
        jobName = s"skew_$form", changelogPath = s"$root/changelog",
        bookmarkPath = s"$root/bm_$form", keyCol = "customer_id",
        tsCol = "_commit_timestamp", tiebreakCol = "_commit_version",
        platform = "clevertap", mappingPath = s"$root/mapping",
        typeMap = Map.empty, swapKeyMap = Map.empty, dedupForm = form)
      UserProfileJob.run(spark, conf,
        b => { b.foreach(JobSpecSendCounter.bodies.add); (200, "ok") })
    }
    JobSpecSendCounter.bodies.clear()
    val w = runForm("window")
    val sentWindow = JobSpecSendCounter.bodies.toArray.map(_.toString).toSet
    JobSpecSendCounter.bodies.clear()
    val a = runForm("agg")
    val sentAgg = JobSpecSendCounter.bodies.toArray.map(_.toString).toSet
    // identical outcome: same counters, same bookmark, SAME payloads —
    // including the hot key's single surviving (latest) change
    assert(w.validRows == 40 && a.validRows == w.validRows)
    assert(a.invalidRows == w.invalidRows && a.newBookmark == w.newBookmark)
    assert(sentAgg == sentWindow)
    assert(sentWindow.exists(_.contains(""""identity":"1"""")))
    intercept[IllegalArgumentException](runForm("bogus"))
  }

  test("UserProfileMain.parseConf: conf-file contract roundtrip with macros") {
    val conf = java.nio.file.Files.createTempFile("graft-conf", ".json")
    java.nio.file.Files.writeString(conf, """{
      "job_name": "up_{today}",
      "changelog_path": "/data/changelog",
      "bookmark_path": "/data/bookmarks",
      "key_col": "customer_id", "ts_col": "_commit_timestamp",
      "tiebreak_col": "_commit_version", "platform": "clevertap",
      "mapping_path": "/data/mapping",
      "type_map_json": "{\"mobile\":\"mobile_sanity\",\"reward\":\"modify_reward\"}",
      "swap_key_json": "{\"customer_id\":\"identity\"}",
      "base_url": "https://api.example.com", "account_id": "a",
      "passcode": "p", "batch_size": "500"}""")
    val m = graft.core.AppConfig.load(conf.toString)
    val parsed = graft.jobs.UserProfileMain.parseConf(m)
    assert(parsed.jobName.startsWith("up_20")) // {today} macro substituted
    assert(parsed.typeMap == Map("mobile" -> "mobile_sanity", "reward" -> "modify_reward"))
    assert(parsed.swapKeyMap == Map("customer_id" -> "identity"))
    assert(parsed.batchSize == 500)
  }

  test("UserProfileMain e2e: --conf-file → job → JSON counters on stdout") {
    val root = Files.createTempDirectory("graft-main").toString
    Seq(("1", "9876543210", "insert", ts("2024-07-01 10:00:00"), 1L),
        ("2", "9876543211", "insert", ts("2024-07-01 11:00:00"), 2L))
      .toDF("customer_id", "mobile", "_change_type", "_commit_timestamp", "_commit_version")
      .write.parquet(s"$root/changelog")
    Seq(("mobile", true)).toDF("property_name", "clevertap")
      .write.parquet(s"$root/mapping")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        ex.sendResponseHeaders(200, 2); ex.getResponseBody.write("ok".getBytes); ex.close()
      }
    })
    server.start()
    try {
      val conf = java.nio.file.Files.createTempFile("graft-mainconf", ".json")
      java.nio.file.Files.writeString(conf, s"""{
        "job_name": "main_e2e", "changelog_path": "$root/changelog",
        "bookmark_path": "$root/bookmarks", "key_col": "customer_id",
        "ts_col": "_commit_timestamp", "tiebreak_col": "_commit_version",
        "platform": "clevertap", "mapping_path": "$root/mapping",
        "base_url": "http://127.0.0.1:${server.getAddress.getPort}",
        "account_id": "a", "passcode": "p"}""")
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        graft.jobs.UserProfileMain.main(Array("--conf-file", conf.toString))
      }
      val line = out.toString.linesIterator.find(_.startsWith("{")).get
      assert(line.contains(""""valid":2""") && line.contains(""""invalid":0"""), line)
      // the shared test session must have survived (main doesn't own it)
      assert(!spark.sparkContext.isStopped)
    } finally server.stop(0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
