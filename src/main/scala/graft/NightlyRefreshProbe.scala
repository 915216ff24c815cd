package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALE.md probe for the composed streaming refresh
  * ([[graft.streaming.NightlyRefresh]]): per-epoch wall vs survivor-
  * corpus size at a CONSTANT batch, measured — the scaladoc's claim
  * ("the per-epoch heavyweight piece is candidate pair detection
  * against the survivor corpus; the states stay cluster-sized") needs
  * a number. Two corpora (1× / `scale`×, the ScaleProbe derivative
  * discipline with the marker perturbation), each driven through:
  *
  *   epoch 0 — seed init (from-scratch dedup + CC + state build over
  *             the corpus) + a tiny first batch;
  *   epoch 1 — the MEASURED steady epoch: a ~500-doc mutant batch
  *             (near-dups of existing docs, so pair detection and
  *             label refresh do real work).
  *
  * Reported per corpus: seed wall, steady-epoch wall, state rows
  * (docs / labels / agg). The expected shape: steady epoch trends
  * with the CORPUS (the candidate join's gram side), not the batch —
  * the honest cost the 100 TB deployment prefix-blocks (q70's
  * discipline); everything else in the epoch is cluster-sized. */
object NightlyRefreshProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
               else Seq(4, 16)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(s: Int): org.apache.spark.sql.DataFrame =
      Tables.load(spark, sf, "documents")
        .withColumn("rep", explode(lit((0 until s).toArray)))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            (w, i) => when(i % 3 === 2,
              concat(w, lit(" zq"),
                abs(xxhash64(col("doc_id"), col("rep"), i)).cast("string")))
              .otherwise(w)), " ").as("text"),
          col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))

    reps.foreach { s =>
      val root = s"/tmp/graft_nref_s$s"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val src = s"$root/src"
      val seed = corpus(s).localCheckpoint(true)
      val n = seed.count()
      val big = 100000000L
      // tiny epoch-0 batch; ~500-doc steady batch of near-dup mutants
      // (constant across scales: bucketed on the ORIGINAL id space)
      def mutants(m: Int, idOff: Long) = seed
        .filter(pmod(col("doc_id"), lit(n / m)) === 0)
        .select((col("doc_id") + idOff).as("doc_id"),
          concat(col("text"), lit(" mutq mutq mutq")).as("text"),
          lit("mut").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      val b0 = mutants(10, big)
      val b1 = mutants(500, 2 * big)
      b0.coalesce(1).write.parquet(s"$src/f0")
      val q = graft.streaming.NightlyRefresh.start(
        spark.readStream.schema(b0.schema).parquet(s"$src/*"),
        seed, s"$root/state", s"$root/ckpt")
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      try {
        val tSeed = time(q.processAllAvailable())
        b1.coalesce(1).write.parquet(s"$src/f1")
        val tSteady = time(q.processAllAvailable())
        val e = graft.streaming.NightlyRefresh.latestEpoch(spark, s"$root/state")
          .getOrElse(sys.error("no epoch written"))
        import graft.streaming.NightlyRefresh
        val docs = NightlyRefresh.currentDocs(spark, s"$root/state").count()
        val labels = NightlyRefresh.currentLabels(spark, s"$root/state").count()
        val agg = NightlyRefresh
          .currentState(spark, s"$root/state", "agg").count()
        // bytes written per epoch: the append-only contract says the
        // STEADY epoch's directory is delta-sized, not corpus-sized
        def dirBytes(p: String): Long = {
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(hp)) 0L
          else {
            val it = fs.listFiles(hp, true)
            var total = 0L
            while (it.hasNext) total += it.next().getLen
            total
          }
        }
        val seedBytes = dirBytes(s"$root/state/epoch=0")
        val steadyBytes = dirBytes(s"$root/state/epoch=$e")
        println(f"""{"query":"nightly_refresh(probe)","corpus":$n,"batch":${b1.count()},"seed_wall":$tSeed%.2f,"steady_wall":$tSteady%.2f,"seed_bytes":$seedBytes,"steady_bytes":$steadyBytes,"docs_rows":$docs,"labels_rows":$labels,"agg_rows":$agg}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
