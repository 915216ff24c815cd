package graft

import org.apache.spark.sql.functions._
import graft.analyze.TextAnalysis

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, s: String): Any =
    Seq(s).toDF("t").select(c.as("v")).head.get(0)

  test("token counts: whitespace and bpe-ish") {
    assert(one(TextAnalysis.tokenCount(col("t")), "a  b\tc") == 3)
    assert(one(TextAnalysis.tokenCount(col("t")), "   ") == 0)
    assert(one(TextAnalysis.bpeishTokenCount(col("t")), "hello world42!") == 4)
  }

  test("stopword / punct ratios") {
    assert(one(TextAnalysis.stopwordRatio(col("t")), "the cat and dog") == 0.5)
    assert(one(TextAnalysis.punctRatio(col("t")), "ab!!") == 0.5)
  }

  test("quality score in [0,1] and sane ordering") {
    val good = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    val bad = "!!! ??? ***"
    val qg = one(TextAnalysis.qualityScore(col("t")), good).asInstanceOf[Double]
    val qb = one(TextAnalysis.qualityScore(col("t")), bad).asInstanceOf[Double]
    assert(qg >= 0 && qg <= 1 && qb >= 0 && qb <= 1 && qg > qb)
  }

  test("language id heuristic on obvious samples") {
    assert(one(TextAnalysis.langIdHeuristic(col("t")),
      "the cat is on the mat and the dog is here") == "en")
    assert(one(TextAnalysis.langIdHeuristic(col("t")),
      "der Hund und die Katze und das Haus ist hier") == "de")
    assert(one(TextAnalysis.langIdHeuristic(col("t")), "zzz qqq xxx") == "und")
  }

  test("fingerprint is whitespace/case invariant; rolling hash is order sensitive") {
    val f1 = one(TextAnalysis.fingerprint(col("t")), "Hello   World")
    val f2 = one(TextAnalysis.fingerprint(col("t")), "hello world")
    assert(f1 == f2)
    val r1 = one(TextAnalysis.rollingHash(col("t")), "a b c")
    val r2 = one(TextAnalysis.rollingHash(col("t")), "c b a")
    assert(r1 != r2)
  }
}
