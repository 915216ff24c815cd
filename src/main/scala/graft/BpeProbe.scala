package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("sf")
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    val strict = if (args.length > 2) args(2).toBoolean else true
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = if (mode == "sf") {
      Tables.load(spark, "/root/testdata/sf0.1", "documents").select("text")
    } else {
      val alpha = (0 until 26).map(i => ('a' + i).toChar.toString)
      val word = (1 to 7).map(k =>
        element_at(lit(alpha.toArray), (pmod(xxhash64(col("id") * lit(k)), lit(26)) + 1).cast("int")))
        .reduce(concat(_, _))
      spark.range(50000)
        .select(word.as("w"), (lit(100000) / (col("id") + 1)).cast("int").as("cnt"))
        .filter(col("cnt") >= 1)
        .select(concat_ws(" ", expr("array_repeat(w, cnt)")).as("text"))
    }
    val t0 = System.nanoTime()
    val (merges, rounds) =
      graft.analyze.TextAnalysis.bpeTrainWithStats(docs, "text", nMerges, 64, strict)
    val sec = (System.nanoTime() - t0) / 1e9
    val fill = merges.length.toDouble / rounds / 64
    println(f"RESULT mode=$mode strict=$strict merges=${merges.length} rounds=$rounds fill=$fill%.3f sec=$sec%.1f sec_per_round=${sec/rounds}%.3f")
    spark.stop()
  }
}
