package graft

import org.apache.spark.sql.functions._
import graft.analyze.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("fitLinearInt: exact line recovers slope/intercept with r2 = 1") {
    val d = (0L to 100L).map(x => (x, 3L * x + 7L)).toDF("x", "y")
    val r = Stats.fitLinearInt(d, "x", "y").head()
    assert(r.getLong(0) == 101L)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 7.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("fitLinearInt: matches a BigInt reference on noisy data, any center") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 400).map { _ =>
      val x = rnd.nextInt(5000).toLong + 100000L // large offset: centering matters
      (x, 2L * x - 50L + rnd.nextInt(200) - 100L)
    }
    val r = Stats.fitLinearInt(pts.toDF("x", "y"), "x", "y").head()
    // reference: exact rational normal equations via BigInt
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    val slopeRef = num.toDouble / den.toDouble
    // centered integer path must agree to fp noise of the final ops
    assert(math.abs(r.getDouble(1) - slopeRef) < 1e-9)
    val interceptRef = (sy.toDouble - slopeRef * sx.toDouble) / n.toDouble
    assert(math.abs(r.getDouble(2) - interceptRef) < 1e-6)
    assert(r.getDouble(3) > 0.99 && r.getDouble(3) <= 1.0)
  }

  test("fitLinearInt: zero x-variance yields null fit, constant y nulls r2 only") {
    val flat = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val r = Stats.fitLinearInt(flat, "x", "y").head()
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    val constY = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    val rc = Stats.fitLinearInt(constY, "x", "y").head()
    assert(rc.getDouble(1) == 0.0 && rc.getDouble(2) == 7.0 && rc.isNullAt(3))
  }

  test("fitLinearInt: nulls dropped, single-row requires no variance blowup") {
    val d = Seq((Some(1L), Some(5L)), (None, Some(9L)), (Some(3L), None),
      (Some(2L), Some(7L))).toDF("x", "y")
    val r = Stats.fitLinearInt(d, "x", "y").head()
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 2.0) // (1,5),(2,7)
    assert(r.getDouble(2) == 3.0)
  }

  test("corrMatrixInt: exact extremes, BigInt reference, zero-variance null") {
    val lin = (1L to 50L).map(x => (x, 2 * x + 3, -3 * x + 7, 5L))
      .toDF("a", "b", "c", "konst")
    val got = Stats.corrMatrixInt(lin, Seq("a", "b", "c", "konst"))
      .collect().map(r => ((r.getString(1), r.getString(2)),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got(("a", "b")).contains(1.0))
    assert(got(("a", "c")).contains(-1.0))
    assert(got(("b", "c")).contains(-1.0))
    assert(got(("a", "konst")).isEmpty) // zero variance -> null
    assert(got.size == 6)
    // noisy reference
    val rnd = new scala.util.Random(11)
    val pts = (0 until 300).map(_ => {
      val x = rnd.nextInt(1000).toLong
      (x, x + rnd.nextInt(200).toLong)
    })
    val r = Stats.corrMatrixInt(pts.toDF("x", "y"), Seq("x", "y")).head()
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum; val sy = pts.map(p => BigInt(p._2)).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val syy = pts.map(p => BigInt(p._2) * p._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val ref = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(math.abs(r.getDouble(3) - ref) < 1e-12)
  }

  test("weightedMedian: hand cases, heavy-weight pull, reference on random data") {
    def wm(rows: Seq[(String, Double, Long)]): Map[String, (Double, Long)] =
      graft.analyze.Stats.weightedMedian(
          rows.zipWithIndex.map { case ((g, v, w), i) => (g, v, w, i.toLong) }
            .toDF("g", "v", "w", "id"),
          "g", "v", "w", "id")
        .as[(String, Double, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    // uniform weights: the lower midpoint (discrete convention)
    assert(wm((1 to 5).map(i => ("a", i.toDouble, 1L)))("a") == ((3.0, 5L)))
    assert(wm((1 to 4).map(i => ("a", i.toDouble, 1L)))("a") == ((2.0, 4L)))
    // one heavy value dominates the mass midpoint
    val heavy = (1 to 9).map(i => ("h", i.toDouble, 1L)) :+ (("h", 10.0, 100L))
    assert(wm(heavy)("h")._1 == 10.0)
    // zero/negative weights excluded
    assert(wm(Seq(("z", 1.0, 0L), ("z", 2.0, -5L), ("z", 3.0, 1L)))("z") == ((3.0, 1L)))
    // random vs sequential reference
    val rnd = new scala.util.Random(42)
    val data = (0 until 400).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(50).toDouble, rnd.nextInt(9).toLong + 1))
    val got = wm(data)
    data.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
      assert(got(g) == ((med, tot)), s"group $g")
    }
  }

  test("histogram: half-open buckets, boundary values, clamped under/overflow, nulls dropped") {
    val d = Seq(("a", Some(0.0)), ("a", Some(24.999)), ("a", Some(25.0)),
      ("a", Some(499.999)), ("a", Some(500.0)), ("a", Some(-3.0)),
      ("a", None), ("b", Some(250.0))).toDF("g", "v")
    val got = Stats.histogram(d, "g", "v", 0.0, 500.0, 20)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 0L)) == 3L)  // 0.0, 24.999, and -3.0 clamped up
    assert(got(("a", 1L)) == 1L)  // 25.0 lands in the NEXT bucket (half-open)
    assert(got(("a", 19L)) == 2L) // 499.999 + 500.0 clamped down
    assert(got(("b", 10L)) == 1L)
    assert(got.values.sum == 7L)  // the null contributed nowhere
  }

  test("giniDiversity: hand values; modePerGroup: deterministic tie to smallest") {
    val d = Seq(("s1", "en"), ("s1", "en"), ("s1", "fr"), ("s1", "fr"),
      ("s2", "en"), ("s2", "en"), ("s2", "en"),
      ("s3", "en"), ("s3", "de"), ("s3", "fr"), ("s3", null))
      .toDF("src", "lang")
    val g = Stats.giniDiversity(d, "src", "lang")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(g("s1") == (("s1", 4L, 2L, 0.5)))       // 1 - (4+4)/16
    assert(g("s2") == (("s2", 3L, 1L, 0.0)))       // pure
    assert(math.abs(g("s3")._4 - (1.0 - 3.0 / 9.0)) < 1e-15)
    assert(g("s3")._2 == 3L)                       // null category dropped
    val m = Stats.modePerGroup(
        Seq((1L, "b"), (1L, "b"), (1L, "a"), (1L, "a"), (1L, "c"),
          (2L, "z")).toDF("g", "v"), "g", "v")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == (("a", 2L)))  // a/b tied at 2 -> smallest value wins
    assert(m(2L) == (("z", 1L)))
  }

  test("madOutliers: discrete medians, planted outlier flagged, tight cluster kept") {
    val vals = Seq.tabulate(21)(i => ("a", 10.0 + i * 0.1)) :+ (("a", 500.0))
    val out = Stats.madOutliers(vals.toDF("g", "v"), "g", "v")
      .select("v", "med", "mad", "is_outlier")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    // med/mad must be ACTUAL data values (discrete, no interpolation)
    val med = out.head._2
    assert(vals.map(_._2).contains(med))
    val devs = vals.map(v => math.abs(v._2 - med))
    assert(devs.contains(out.head._3))
    assert(out.filter(_._4).map(_._1).toSeq == Seq(500.0))
    assert(out.count(!_._4) == 21)
  }

  test("madOutliers: all-equal group has mad 0 and no outliers") {
    val d = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0)).toDF("g", "v")
    val out = Stats.madOutliers(d, "g", "v").collect()
    assert(out.forall(!_.getAs[Boolean]("is_outlier")))
    assert(out.forall(_.getAs[Double]("mad") == 0.0))
  }
}
