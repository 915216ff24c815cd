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
      case "vocab" =>
        // REALISTIC-VOCAB measurement (VERDICT r17 task 5): training at
        // SentencePiece-scale vocabularies (1k / 4k / 8k) over the 1×
        // derivative corpus, maxPieceLen 6 (8k distinct ≤4-char pieces
        // barely exist; realistic vocabs carry longer pieces). Per size:
        // total wall, the SEEDING stage alone (substring explode +
        // top-4×vocab collect — the candidate cap is the knob if this
        // dominates), and the per-round Viterbi costs (monotonicity at
        // scale). The E-step runs over distinct words regardless of
        // vocab; what grows with vocab is the model riding the
        // expression (piece trie + cost map literals).
        import org.apache.spark.sql.functions._
        val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        // the scale-mode marker perturbation: the raw synthetic corpus
        // has a tiny distinct-word pool (training collapses to ~32
        // pieces); the per-position hash markers give the distinct-word
        // mass a real corpus has, which is what vocab growth feeds on
        def writeDerivative(dir: String): Unit =
          Tables.load(spark, sf, "documents")
            .select(col("doc_id"),
              array_join(transform(split(col("text"), " "),
                (w, i) => when(i % 3 === 2,
                  concat(w, lit(" zq"),
                    abs(xxhash64(col("doc_id"), i)).cast("string")))
                  .otherwise(w)), " ").as("text"))
            .write.mode("overwrite").parquet(s"file:$dir/documents.parquet")
        val base = "/tmp/graft_unigram_vocab1"
        writeDerivative(base)
        val docs = spark.read.parquet(s"$base/documents.parquet")
        val maxLen = 6
        def seedWall(vs: Int): Double = {
          // the trainer's seeding stage, replicated stand-alone so its
          // share of the wall is measurable without instrumenting the
          // trainer itself
          val t0 = System.nanoTime()
          val words = docs
            .select(explode(graft.analyze.TextAnalysis
              .tokens(lower(col("text")))).as("w"))
            .filter(length(col("w")) > 0)
            .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          val pc = words.select(col("cnt"), explode(flatten(
              transform(sequence(lit(1), length(col("w"))), i =>
                transform(sequence(lit(1),
                    least(lit(maxLen), length(col("w")) - i + 1)),
                  l => col("w").substr(i, l))))).as("p"))
            .groupBy(col("p")).agg(sum(col("cnt")).as("n"))
          val n = pc.orderBy(col("n").desc, col("p").asc)
            .limit(vs * 4).collect().length
          require(n > 0)
          (System.nanoTime() - t0) / 1e9
        }
        def run(vs: Int): (Double, Seq[Long], Int) = {
          val t0 = System.nanoTime()
          val (vocab, rc) = graft.analyze.TextAnalysis
            .unigramTrainWithStats(docs, "text", vocabSize = vs,
              maxPieceLen = maxLen, emRounds = 4)
          ((System.nanoTime() - t0) / 1e9, rc, vocab.size)
        }
        run(64) // warm-up, discarded
        Seq(1000, 4096, 8192).foreach { vs =>
          val (w, rc, attained) = run(vs)
          val sw = seedWall(vs)
          val mono = rc.sliding(2).forall {
            case Seq(a, b) => b <= a; case _ => true }
          println(f"""{"query":"unigram_vocab(probe)","vocab":$vs,"attained":$attained,"wall":$w%.2f,"seed_wall":$sw%.2f,"seed_share":${sw / w}%.2f,"monotone":$mono,"round_costs":"${rc.mkString(",")}"}""")
        }
    }
    spark.stop()
  }
}
