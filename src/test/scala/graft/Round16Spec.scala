package graft

import org.apache.spark.sql.functions._

/** Round-16 specs: the ADVICE r15 fixes (exact KMV below-k estimates,
  * exact-integer cusum guard threshold, mirrored q201 oracle envelope)
  * and the VERDICT r15 task list. */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  test("cusumShift: guard fires AT the exact envelope boundary (no double slack)") {
    // D=2 rows, thr 1/1 → mThr=2 → exact threshold = 2^63-1 div 4 =
    // 2305843009213693951. sum|v| = 2^61 = 2305843009213693952 is ONE
    // above it. The old double-divide threshold rounded to exactly
    // 2^61, so this input slipped past (ADVICE r15); the exact `div`
    // form must raise.
    val v = 1152921504606846976L // 2^60; two rows sum to 2^61
    val series = Seq(("k", 1L, v), ("k", 2L, v)).toDF("key", "d", "v")
    val e = intercept[Exception] {
      graft.analyze.Timeseries.cusumShift(series, "key", "d", "v", 1, 1)
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("cusumShift overflow"),
      s"expected the exact-envelope guard, got: ${e.getMessage}")
    // one below the boundary: sum|v| = 2^61 - 1 ≤ threshold+... must NOT fire
    val ok = Seq(("k", 1L, v), ("k", 2L, v - 1L)).toDF("key", "d", "v")
    val r = graft.analyze.Timeseries
      .cusumShift(ok, "key", "d", "v", 1, 1).collect()
    assert(r.length == 2)
  }
}
