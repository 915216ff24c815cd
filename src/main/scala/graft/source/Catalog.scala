package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog operations (SURVEY §2.1 R1/R2/R7/R8): env-keyed database
  * selection and named-table access, as the reference does against a Hive
  * metastore (`utils/config.py:27-31`, `tasks/user_profile/clevertap.py:8`).
  * Identifiers are validated rather than interpolated raw (B11). */
object CatalogOps {
  private val ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private def checked(name: String): String = name match {
    case ident() => name
    case _ => throw new IllegalArgumentException(s"invalid identifier: $name")
  }

  /** R1: USE <db>, creating it if needed. */
  def useDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${checked(db)}")
    spark.catalog.setCurrentDatabase(checked(db))
  }

  /** Register a parquet path as a named table in the current database. */
  def registerParquet(spark: SparkSession, name: String, path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${checked(name)} USING parquet " +
      s"LOCATION '${path.replace("'", "")}'")

  /** R2: named-table scan. */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(checked(name))

  /** R7+R8: the reference's exact SQL shape — temp view + CTE with window
    * rank + self-join (`tasks/user_profile/clevertap.py:30-53`). Kept as
    * the SQL-entry-point twin of Dedup.latestPerKey for equivalence tests. */
  def latestChangesSql(spark: SparkSession, changes: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    changes.createOrReplaceTempView("changes")
    spark.sql(s"""
      WITH latest_updates_time AS (
        SELECT ${checked(keyCol)}, `$tsCol`,
               row_number() OVER (PARTITION BY ${checked(keyCol)}
                                  ORDER BY `$tsCol` DESC) AS rank
        FROM changes
      )
      SELECT c.* FROM changes c
      JOIN latest_updates_time lut
        ON c.${checked(keyCol)} = lut.${checked(keyCol)}
       AND c.`$tsCol` = lut.`$tsCol`
      WHERE lut.rank = 1
    """)
  }
}
