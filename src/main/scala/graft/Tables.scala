package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All queries take a scale-factor directory so the same code runs at
  * sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench) — and, with
  * an s3a:// or hdfs:// prefix, on a real cluster unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, s"$sfDir/events.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The testdata generator has shipped `events.ts` under several parquet
    * encodings over time — TIMESTAMP(NANOS) (rejected by Spark's reader
    * unless read as raw long), TIMESTAMP_NTZ micros, and adjusted-to-UTC
    * TIMESTAMP — so branch on the schema actually present rather than
    * assuming one. All branches normalize to session-TZ TimestampType
    * (the session TZ is UTC everywhere in this repo, so NTZ ≡ UTC instant
    * and the oracle's naive micros compare equal).
    */
  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw =
      try spark.read.parquet(path)
      catch {
        // ONLY the TIMESTAMP(NANOS) schema-conversion failure gets the
        // nanosAsLong retry — a broad catch would mask unrelated errors
        // (missing path, corrupt footer) behind a pointless second read.
        // The legacy flag must NOT leak into the session (a later read of
        // a DIFFERENT table's genuine NANOS column would silently surface
        // raw longs), but schema inference reads it from the session
        // SQLConf while task-side footer conversion reads it from the
        // scan's hadoop conf built at ACTION time — so: set the conf just
        // for the eager inference read and restore it, and ALSO pass the
        // flag as a per-relation reader option, which merges on top of
        // the (restored) session confs into this scan's hadoop conf and
        // keeps later actions decoding correctly.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
              e.getMessage.contains("Illegal Parquet type") =>
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = spark.conf.getOption(key)
          spark.conf.set(key, "true")
          try spark.read.option(key, "true").parquet(path)
          finally prev match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
      }
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: truncate to micros like DuckDB does
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
