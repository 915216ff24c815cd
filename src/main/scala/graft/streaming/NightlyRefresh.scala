package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analyze.{Hdr, KmvDistinct, TextAnalysis => TA}
import graft.dedup.Dedup
import graft.relational.Relational
import graft.source.FsOps

/** The COMPOSED streaming twin of the nightly incremental refresh
  * (q221/q225's chain made continuous): each micro-batch of documents
  * drives the WHOLE family in one foreachBatch — exact dedup against
  * the survivor fingerprints, near-dup pair detection touching the
  * batch, incremental connected-components label refresh, and the
  * agg / HDR / KMV state re-key + merge (merged clusters COLLIDE and
  * their states combine) — then snapshots every state table under an
  * EPOCH-KEYED directory (the egressStreamToPath discipline).
  *
  * Replay idempotency is structural, not dedup-assisted: epoch `e`
  * reads its inputs from the newest `epoch=<k < e>` snapshot and
  * OVERWRITES `epoch=<e>` — a crash-replayed micro-batch re-reads the
  * same untouched predecessor and rewrites exactly its own directory,
  * so the state lineage is identical whether the epoch ran once or
  * five times. Readers consume the newest epoch that the streaming
  * checkpoint has committed.
  *
  * Contract (the changelog convention): doc ids are append-ordered —
  * a batch's ids exceed every id already in the corpus — so
  * keep-lowest-id-per-fingerprint equals keep-first-arrival and the
  * stream's output matches a from-scratch batch recompute over the
  * union (Round18Spec pins the equality across a forced cluster
  * merge).
  *
  * Scale notes: the per-epoch heavyweight piece is candidate pair
  * detection against the survivor corpus — the same cost the nightly
  * batch pays, here amortized per micro-batch; the states stay
  * cluster-sized and the label refresh touches only the delta's
  * components (star edges ∪ delta, never the archive's edge set). The
  * survivor corpus snapshot is the one state that grows with the
  * corpus; at 100 TB it lives bucketed by fingerprint/shingle-block
  * and epochs append rather than rewrite — the rewrite here keeps the
  * local fixture simple, flagged as the production delta. */
object NightlyRefresh {

  /** Newest snapshot epoch strictly below `before` (or the newest of
    * all when `before` is None). */
  def latestEpoch(spark: SparkSession, statePath: String,
                  before: Option[Long] = None): Option[Long] =
    new FsOps(spark).listPrefixes(statePath.stripSuffix("/"))
      .map(_.split('/').last)
      .collect { case s if s.startsWith("epoch=") => s.drop(6).toLong }
      .filter(e => before.forall(e < _))
      .sorted.lastOption

  private def kmvOf(lab: DataFrame, k: Int): DataFrame = lab
    .filter(col("source").isNotNull)
    .select(col("cluster_id"), KmvDistinct.md5Low64(col("source")).as("__h"))
    .groupBy(col("cluster_id"))
    .agg(KmvDistinct.stateUdaf(k)(col("__h")).as("state"))

  /** Label a survivor frame with stored/refreshed components
    * (unlabeled docs are their own singleton cluster). */
  private def labeled(docs: DataFrame, labels: DataFrame): DataFrame =
    docs.join(labels.select(col("id").as("doc_id"),
        col("cluster_id").as("__c")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__c"), col("doc_id")).as("cluster_id"),
        col("n_chars"), col("source"))

  /** Start the composed refresh over a streaming document frame with
    * columns (doc_id, text, n_chars, source). `seedDocs` is the
    * historical corpus the first epoch initializes state from (exact
    * dedup + from-scratch CC + state build — the same derivation the
    * batch chain's "stored" side uses). Snapshots land under
    * `statePath/epoch=<id>/{docs,labels,agg,hdr,kmv,report}`; the
    * report carries q221's output shape per cluster. */
  def start(deltaDocs: DataFrame, seedDocs: DataFrame, statePath: String,
            checkpointDir: String, shingleN: Int = 3,
            threshold: Double = 0.3, k: Int = 64, subBits: Int = 6,
            onEpoch: (Long, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val st = statePath.stripSuffix("/")
    val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))

    deltaDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val prev = latestEpoch(spark, st, before = Some(epochId))

        // ---- load (or seed) the five state tables -------------------
        val (docs0, labels0, agg0, hdr0, kmv0) = prev match {
          case Some(p) =>
            val d = s"$st/epoch=$p"
            (spark.read.parquet(s"$d/docs"),
              spark.read.parquet(s"$d/labels"),
              spark.read.parquet(s"$d/agg"),
              spark.read.parquet(s"$d/hdr"),
              spark.read.parquet(s"$d/kmv"))
          case None =>
            val kept = seedDocs
              .withColumn("fp", TA.fingerprint(col("text")))
              .withColumn("rn", row_number().over(wFp))
              .filter(col("rn") === 1).drop("rn")
              .localCheckpoint(true)
            val labels = Dedup.connectedComponents(
              Dedup.ngramJaccardPairs(kept, "doc_id", "text",
                shingleN, threshold),
              "id_a", "id_b").localCheckpoint(true)
            val lab = labeled(kept, labels)
            (kept, labels,
              Relational.aggState(lab, Seq("cluster_id"), "n_chars"),
              Hdr.hdrState(lab, "cluster_id", "n_chars", subBits),
              kmvOf(lab, k))
        }

        // ---- stage 1: exact dedup against the survivor fingerprints
        val keptB = batch
          .withColumn("fp", TA.fingerprint(col("text")))
          .withColumn("rn", row_number().over(wFp))
          .filter(col("rn") === 1).drop("rn")
          .join(docs0.select("fp").distinct(), Seq("fp"), "left_anti")
          .localCheckpoint(true)

        // ---- stage 2: pairs touching the batch → label refresh ------
        val pairsAll = Dedup.ngramJaccardPairs(
          docs0.unionByName(keptB), "doc_id", "text", shingleN, threshold)
        val mark = keptB.select(col("doc_id")).withColumn("__inb", lit(1))
        val touching = pairsAll
          .join(mark.select(col("doc_id").as("id_a"), col("__inb").as("__a")),
            Seq("id_a"), "left")
          .join(mark.select(col("doc_id").as("id_b"), col("__inb").as("__b")),
            Seq("id_b"), "left")
          .filter(col("__a").isNotNull || col("__b").isNotNull)
          .drop("__a", "__b")
          .localCheckpoint(true)
        val refreshed = Dedup.incrementalComponents(labels0, touching,
          "id_a", "id_b").localCheckpoint(true)
        val rootMap = refreshed
          .select(col("id").as("cid_old"), col("cluster_id").as("cid_new"))
        def rekey(state: DataFrame): DataFrame = state
          .withColumnRenamed("cluster_id", "cid_old")
          .join(rootMap, Seq("cid_old"), "left")
          .withColumn("cluster_id", coalesce(col("cid_new"), col("cid_old")))
          .drop("cid_old", "cid_new")
        val bLab = labeled(keptB, refreshed)

        // ---- stages 3–5: state re-key (collisions = merged clusters)
        //      + merge with the batch's own states --------------------
        val agg1 = Relational.mergeAggStates(
          Relational.reduceAggState(rekey(agg0), Seq("cluster_id")),
          Relational.aggState(bLab, Seq("cluster_id"), "n_chars"),
          Seq("cluster_id"))
        val hdr1 = Hdr.mergeHdrStates("cluster_id",
          rekey(hdr0), Hdr.hdrState(bLab, "cluster_id", "n_chars", subBits))
        val kmv1 = rekey(kmv0).unionByName(kmvOf(bLab, k))
          .select(col("cluster_id"), explode(col("state")).as("__h"))
          .groupBy(col("cluster_id"))
          .agg(KmvDistinct.stateUdaf(k)(col("__h")).as("state"))

        val report = agg1.select(col("cluster_id"),
            col("n").as("n_docs"),
            col("sum_v").cast("long").as("sum_chars"),
            col("min_v").as("min_chars"), col("max_v").as("max_chars"))
          .join(Hdr.hdrQuantiles(hdr1, "cluster_id", Seq(50), subBits)
            .select(col("cluster_id"), col("bin").as("p50_bin"),
              col("q_low").as("p50_low")), Seq("cluster_id"))
          .join(kmv1.select(col("cluster_id"),
            size(col("state")).cast("long").as("n_src_sketch"),
            element_at(col("state"), -1).as("src_kth_min")),
            Seq("cluster_id"))

        // ---- snapshot epoch e (overwrite ⇒ replay-idempotent) -------
        val out = s"$st/epoch=$epochId"
        docs0.unionByName(keptB)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/docs")
        refreshed.write.mode(SaveMode.Overwrite).parquet(s"$out/labels")
        agg1.write.mode(SaveMode.Overwrite).parquet(s"$out/agg")
        hdr1.write.mode(SaveMode.Overwrite).parquet(s"$out/hdr")
        kmv1.write.mode(SaveMode.Overwrite).parquet(s"$out/kmv")
        report.write.mode(SaveMode.Overwrite).parquet(s"$out/report")
        onEpoch(epochId,
          spark.read.parquet(s"$out/report").count())
      }
      .start()
  }
}
