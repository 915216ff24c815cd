package graft

import org.apache.spark.sql.functions._
import graft.transform.Sanity

/** Per-transform unit tests for T1–T11 (SURVEY §5.1) — including the
  * reference quirks: B6 year-1952, B7 keep-original-on-failure, T5
  * 10-digit edge, T6 " BC" suffix and Feb-29, T8 $D_ encoding. */
class SanitySpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String = {
    val r = Seq(1).toDF("x").select(c.cast("string").as("v")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("T5 mobile_sanity: valid, float artifact, short, long, garbage") {
    assert(one(Sanity.mobileSanity(lit("9876543210"))) == "9876543210")
    assert(one(Sanity.mobileSanity(lit("9876543210.0"))) == "9876543210")
    assert(one(Sanity.mobileSanity(lit("919876543210"))) == "9876543210") // last 10
    assert(one(Sanity.mobileSanity(lit("12345"))) == null)
    assert(one(Sanity.mobileSanity(lit("not-a-phone"))) == null)
    assert(one(Sanity.mobileSanity(lit(null).cast("string"))) == null)
  }

  test("T6 fix_dob: formats, BC suffix, pre-1900 → 1952, Feb-29, garbage") {
    assert(one(Sanity.fixDob(lit("1985-09-03"))) == "1985-09-03")
    assert(one(Sanity.fixDob(lit("1985-09-03 10:00:00"))) == "1985-09-03")
    assert(one(Sanity.fixDob(lit("0200-01-01 BC"))) == "1952-01-01")
    assert(one(Sanity.fixDob(lit("1890-01-05"))) == "1952-01-05")
    // 1896 is a leap year pre-1900; 1952 is too — Feb-29 survives (B6 note)
    assert(one(Sanity.fixDob(lit("1896-02-29"))) == "1952-02-29")
    assert(one(Sanity.fixDob(lit("garbage"))) == null)
  }

  test("T10 birth date: MMM-dd of fixed dob") {
    assert(one(Sanity.birthDate(lit("1985-09-03"))) == "Sep-03")
    assert(one(Sanity.birthDate(lit("1890-01-05"))) == "Jan-05")
  }

  test("T7 modify_reward: truncation toward zero, null on garbage") {
    assert(one(Sanity.modifyReward(lit(106.03))) == "10603")
    assert(one(Sanity.modifyReward(lit(1.005))) == "100") // 100.4999… truncates
    assert(one(Sanity.modifyReward(lit("55.5"))) == "5550")
    assert(one(Sanity.modifyReward(lit("x"))) == null)
  }

  test("T8 unix_epoch: $D_ encoding (UTC), null on failure (B5)") {
    assert(one(Sanity.unixEpoch(lit("1970-01-02"))) == "$D_86400")
    assert(one(Sanity.unixEpoch(lit("nope"))) == null)
  }

  test("T4 keep-original-on-failure (B7): int/float/date tags") {
    assert(one(Sanity.typeTransform(lit("42"), "int")) == "42")
    assert(one(Sanity.typeTransform(lit("abc"), "int")) == "abc") // kept
    assert(one(Sanity.typeTransform(lit("4.5"), "float")) == "4.5")
    assert(one(Sanity.typeTransform(lit("x1"), "float")) == "x1") // kept
    assert(one(Sanity.typeTransform(lit("2021-05-06 07:08:09"), "date")) == "2021-05-06")
    assert(one(Sanity.typeTransform(lit("junk"), "date")) == "junk") // kept
  }

  test("T1 identity: falsy contract (null/empty/'0'), first match wins") {
    val df = Seq(("", "7"), ("0", "8"), ("5", "9"), (null, null))
      .toDF("a", "b")
    val got = df.select(Sanity.identity(Seq(col("a"), col("b"))).as("id"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got == Seq("7", "8", "5", null))
  }

  test("T2/T3: attribute projection drops missing; swap renames with collision overwrite") {
    val df = Seq((1, "a", "b")).toDF("k", "x", "y")
    assert(Sanity.extractAttributes(df, Seq("k", "x", "zz")).columns.toSeq == Seq("k", "x"))
    val sw = Sanity.swapKeys(df, Map("x" -> "y")) // y overwritten by x
    assert(sw.columns.sorted.toSeq == Seq("k", "y"))
    assert(sw.select("y").head.getString(0) == "a")
  }

  test("T9 gender implicit: json signals, missing ⇒ 0") {
    val df = Seq(
      ("""{"last7days":{"men":1,"women":4}}"""),
      ("""{"other":{}}"""),
      (null.asInstanceOf[String])).toDF("v1__json")
    val out = Sanity.genderImplicit(df).collect()
    assert(out(0).getAs[Int]("gender_men_dp") == 1)
    assert(out(0).getAs[Int]("gender_women_dp") == 4)
    assert(out(0).getAs[Int]("gender_kids_dp") == 0)
    assert(out(1).getAs[Int]("gender_men_dp") == 0)
    assert(out(2).getAs[Int]("gender_home_dp") == 0)
  }

  test("T11 envelope shape") {
    val df = Seq(("42", "click")).toDF("id", "et")
    val js = df.select(Sanity.profileEnvelope(col("id"),
      Seq("event_type" -> col("et"))).as("p")).head.getString(0)
    assert(js == """{"type":"profile","identity":"42","profileData":{"event_type":"click"}}""")
  }
}
