package graft

import org.apache.spark.sql.functions._

/** The events loader must adapt to whatever ts encoding the testdata
  * generator ships (it has changed across regenerations — TIMESTAMP(NANOS)
  * through round 9, timestamp[us] NTZ from round 11). These cases pin the
  * two branch behaviors that can be synthesized without a nanos writer:
  * raw-long nanos (what nanosAsLong reading yields) and TIMESTAMP_NTZ. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_tables").toString

  test("events loader: raw nanos-long ts converts to micros timestamps") {
    val dir = tmpDir()
    // 2024-01-01 10:00:00 UTC in nanos, plus sub-micro residue that the
    // DIV 1000 truncation must drop (DuckDB's TIMESTAMP_NS read truncates
    // identically, which is what keeps the oracle aligned)
    val nanos = 1704103200L * 1000000000L + 123456789L
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val ts = got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(ts == "2024-01-01 10:00:00.123456")
  }

  test("events loader: TIMESTAMP_NTZ ts casts to the same UTC instant") {
    val dir = tmpDir()
    Seq(1L).toDF("event_id")
      .withColumn("ts", to_timestamp_ntz(lit("2024-01-01 10:00:00.123456")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // confirm the fixture really wrote NTZ (no timezone in the footer)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val ts = got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    // session TZ is UTC, so the NTZ wall-clock IS the UTC instant
    assert(ts == "2024-01-01 10:00:00.123456")
  }

  test("events loader: real TIMESTAMP(NANOS) parquet takes the narrowed retry path") {
    // A genuine nanos file (committed fixture — Spark cannot write one):
    // the plain read throws AnalysisException [PARQUET_TYPE_ILLEGAL], the
    // loader retries under nanosAsLong, and the value truncates to micros
    // exactly like DuckDB's TIMESTAMP_NS read. Pins the catch matcher —
    // a message change in a Spark upgrade should fail HERE, not in prod.
    val dir = getClass.getResource("/nanos_events").getPath
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val ts = got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(ts == "2024-01-01 10:00:00.123456")
    // the retry must NOT leak the legacy flag into the session: the flag
    // rides as a per-relation reader option, so a later read of a
    // different table's genuine NANOS column still fails loudly
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .forall(_ == "false"),
      "nanosAsLong leaked into the session conf")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(dir + "/events.parquet").collect()
    }
  }

  test("events loader: unrelated read failures are NOT retried or masked") {
    // missing path: the narrowed catch must let the original error
    // propagate instead of burning a second read and leaking the
    // legacy nanos flag into the session
    val e = intercept[Exception] {
      Tables.load(spark, "/tmp/graft_definitely_missing_dir", "events").collect()
    }
    assert(!e.getMessage.contains("PARQUET_TYPE_ILLEGAL"), e.getMessage)
  }

  test("events loader: already-TIMESTAMP ts passes through unchanged") {
    val dir = tmpDir()
    Seq(1L).toDF("event_id")
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:00.123456")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val ts = got.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(ts == "2024-01-01 10:00:00.123456")
  }
}
