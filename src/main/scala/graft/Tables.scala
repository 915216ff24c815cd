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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // unless read as raw long; convert to microsecond timestamps (the
      // same truncation DuckDB applies when reading TIMESTAMP_NS).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
