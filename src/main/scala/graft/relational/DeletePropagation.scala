package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten delete propagation — the data side of the
  * reference's `delete_user_profile` hook (`hooks/clevertap.py:39-52`
  * deletes the key from the activation platform; the warehouse also
  * has to purge every table carrying the key and prove it did).
  */
object DeletePropagation {

  /** Remove every row of `table` whose `tableKey` appears in `keys` —
    * one LEFT ANTI join, exact (duplicates in `keys` are harmless to
    * anti-join semantics; nulls in `tableKey` never match and are
    * KEPT).
    *
    * RTBF key sets are normally request-sized → `broadcastKeys = true`
    * (default) plans a broadcast anti-join: the big table never
    * shuffles. For a key set too large to broadcast, the bloom path
    * splits the table with a broadcast Bloom filter — definite
    * negatives (the overwhelming majority) keep their rows without
    * ever entering the join, and only the `fpp` sliver that might
    * match pays the exact shuffled anti-join; results are identical
    * because the anti-join removes the false-positive residue. */
  def purgeKeys(table: DataFrame, keys: DataFrame, tableKey: String,
                keysKey: String, broadcastKeys: Boolean = true,
                expectedItems: Long = 1000000L): DataFrame = {
    val k = keys.select(col(keysKey).as("__dp_k"))
    if (broadcastKeys)
      table.join(broadcast(k), col(tableKey) === col("__dp_k"), "left_anti")
    else {
      val numBits = org.apache.spark.util.sketch.BloomFilter
        .optimalNumOfBits(expectedItems, 0.01)
      val bloomDf = k.agg(graft.functions.VectorFunctions
        .bloomAgg(xxhash64(col("__dp_k")), expectedItems, numBits)
        .as("__dp_bloom"))
      val tagged = table.crossJoin(broadcast(bloomDf))
        .withColumn("__dp_hit",
          graft.functions.VectorFunctions.bloomMightContain(
            col("__dp_bloom"), xxhash64(col(tableKey))))
        .drop("__dp_bloom")
      val definiteKeep = tagged.filter(!col("__dp_hit")).drop("__dp_hit")
      val verified = tagged.filter(col("__dp_hit")).drop("__dp_hit")
        .join(k, col(tableKey) === col("__dp_k"), "left_anti")
      definiteKeep.unionByName(verified)
    }
  }

  /** Per-table deletion audit: one row per declared table —
    * `(table_name, n_before, n_deleted, n_after)` — from ONE
    * broadcast-marker join + count aggregate per table, unioned into a
    * single metadata-sized relation (the deletion certificate an RTBF
    * request needs). Keys are de-duplicated before the marker join so
    * a repeated request key can never double-count a row. */
  def purgeAudit(tables: Seq[(String, DataFrame, String)], keys: DataFrame,
                 keysKey: String): DataFrame = {
    require(tables.nonEmpty, "purgeAudit needs at least one table")
    val k = keys.select(col(keysKey).as("__dp_k")).distinct()
      .withColumn("__dp_hit", lit(1))
    tables.map { case (name, df, tableKey) =>
      df.join(broadcast(k), col(tableKey) === col("__dp_k"), "left")
        .agg(count(lit(1)).as("n_before"),
          count(col("__dp_hit")).as("n_deleted"))
        .select(lit(name).as("table_name"), col("n_before"),
          col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"))
    }.reduce(_ unionByName _)
  }

  /** SCD2/changelog-aware purge: erase the key's FULL history (RTBF is
    * erasure, not interval-closing) and emit a tombstone per purged
    * key so later change-feed replays cannot resurrect it. Returns
    * (kept history, tombstones) — tombstones carry `(key, deleted_at)`
    * and only keys that actually had rows (a no-op request leaves no
    * tombstone). */
  def purgeHistory(history: DataFrame, keys: DataFrame, keyCol: String,
                   keysKey: String, deletedAt: Column)
      : (DataFrame, DataFrame) = {
    val kept = purgeKeys(history, keys, keyCol, keysKey)
    val tombstones = keys.select(col(keysKey).as(keyCol)).distinct()
      .join(history.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .withColumn("deleted_at", deletedAt)
    (kept, tombstones)
  }

  /** k-anonymity / l-diversity audit — the privacy QA companion of the
    * RTBF cascade: group rows by the quasi-identifier columns and
    * report every equivalence class with its size and its count of
    * distinct sensitive values; a class is a k-anonymity violation
    * when fewer than `k` rows share its quasi-identifiers (re-
    * identifiable) and an l-diversity violation when its sensitive
    * attribute takes fewer than `l` distinct values (attribute
    * disclosure even at k). Exact integer counts and integer
    * threshold compares throughout. ONE partial-aggregating groupBy;
    * output is class-cardinality. Suppressing/generalizing the
    * violating classes is the caller's remediation ([[purgeKeys]]
    * composes for suppression). */
  def anonymityAudit(df: DataFrame, quasiCols: Seq[String],
                     sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "anonymityAudit needs quasi-identifier columns")
    require(k >= 1 && l >= 1, s"k and l must be >= 1; got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_violation", col("n_rows") < k)
      .withColumn("l_violation", col("n_sensitive") < l)
  }

  /** Replay guard for incremental feeds: drop every incoming change at
    * or before its key's tombstone (`tsCol <= deleted_at`) — erased
    * history stays erased — while changes AFTER the tombstone pass
    * (a re-created key is new consent, not resurrection). Broadcast
    * join against the metadata-sized tombstone table. */
  def applyTombstones(changes: DataFrame, tombstones: DataFrame,
                      keyCol: String, tsCol: String): DataFrame =
    changes.join(
        broadcast(tombstones.select(col(keyCol),
          col("deleted_at").as("__dp_del"))),
        Seq(keyCol), "left")
      .filter(col("__dp_del").isNull || col(tsCol) > col("__dp_del"))
      .drop("__dp_del")
}
