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
        // (missing path, corrupt footer) behind a pointless second read
        // AND leak the legacy flag into the whole session, silently
        // turning any other table's genuine NANOS column into raw longs.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PARQUET_TYPE_ILLEGAL") ||
              e.getMessage.contains("Illegal Parquet type") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
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
