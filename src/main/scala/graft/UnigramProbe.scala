package graft

import org.apache.spark.sql.SparkSession

/** Trainer driver for the unigram-LM tokenizer: `fixture` mode prints
  * the frozen-model literals for [[graft.analyze.UnigramFixture]] (the
  * q223 gate model — trained once at sf0.001, shipped as an artifact,
  * the q94 discipline); `scale` mode measures rounds × corpus / vocab
  * growth for SCALE.md. */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("fixture")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "fixture" =>
        val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
        val (vocab, rounds) = graft.analyze.TextAnalysis
          .unigramTrainWithStats(docs, "text", vocabSize = 64,
            maxPieceLen = 4, emRounds = 4)
        println("ROUND_COSTS " + rounds.mkString(","))
        println("VOCAB_BEGIN")
        vocab.foreach { case (p, c, m) =>
          println(s"""    ("$p", ${c}L, ${m}L),""") }
        println("VOCAB_END")
      case "scale" =>
        import org.apache.spark.sql.functions._
        val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val scale = if (args.length > 2) args(2).toInt else 4
        // self-built derivative corpora (ScaleProbe's marker
        // perturbation): a stale shared /tmp base from a different sf
        // dir must never contaminate the comparison
        def writeDerivative(s: Int, dir: String): Unit =
          Tables.load(spark, sf, "documents")
            .withColumn("rep", explode(lit((0 until s).toArray)))
            .select((col("doc_id") * s + col("rep")).as("doc_id"),
              array_join(transform(split(col("text"), " "),
                (w, i) => when(i % 3 === 2,
                  concat(w, lit(" zq"),
                    abs(xxhash64(col("doc_id"), col("rep"), i)).cast("string")))
                  .otherwise(w)), " ").as("text"))
            .write.mode("overwrite").parquet(s"file:$dir/documents.parquet")
        val base = "/tmp/graft_unigram_base1"
        val out = s"/tmp/graft_unigram_s$scale"
        writeDerivative(1, base)
        writeDerivative(scale, out)
        def corpus(dir: String) =
          spark.read.parquet(s"$dir/documents.parquet")
        def run(dir: String, vs: Int): (Double, Seq[Long]) = {
          val t0 = System.nanoTime()
          val (_, rc) = graft.analyze.TextAnalysis
            .unigramTrainWithStats(corpus(dir), "text", vocabSize = vs,
              maxPieceLen = 4, emRounds = 4)
          ((System.nanoTime() - t0) / 1e9, rc)
        }
        run(base, 64) // warm-up: codegen + JIT, discarded
        val (t1, r1) = run(base, 64)
        val (tS, rS) = run(out, 64)
        val (tV, _) = run(base, 256)
        println(f"""{"query":"unigram_train(probe)","t1":$t1%.2f,"t$scale":$tS%.2f,"ratio":${tS / t1}%.2f,"exponent":${math.log(tS / t1) / math.log(scale.toDouble)}%.2f,"t_vocab4x":$tV%.2f,"vocab_ratio":${tV / t1}%.2f,"round_costs_1":"${r1.mkString(",")}","round_costs_S":"${rS.mkString(",")}"}""")
    }
    spark.stop()
  }
}
