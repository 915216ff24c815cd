package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Media-mix modelling primitives — adstock (advertising carryover)
  * plus per-channel response regression, the classic marketing-science
  * read of the event stream (Broadbent 1979's adstock; same martech
  * domain as the reference's activation job,
  * `conf/deployment.json:5-20`).
  *
  * Exactness discipline: the adstock transform uses DYADIC decay
  * (half-life = one day) over a BOUNDED lag window, so the adstocked
  * spend is an exact integer
  *
  *   A_t = Σ_{s=0..L} spend_paise_{t−s} · 2^(L−s)
  *
  * (a 2^L-scaled fixed point; the q153 credit-decay trick applied to a
  * time series) — (L+1) `lag` terms composed in ONE window pass, no
  * recursion, no libm. The per-channel response fit then runs the
  * [[Stats.fitLinearInt]] closed form GROUPED (min-centered integer
  * moments as DECIMAL(38,0) sums — any deterministic integer center
  * works for the corrected closed form, and `min` is order-free), so
  * slope/intercept/r² are single fixed-shape double expressions over
  * exact integers that any engine replays bit-identically.
  *
  * Overflow envelope (documented, guarded): the 2^L fixed point is
  * scaled BACK DOWN (truncating div, identical in both engines on
  * nonnegative ints) before the fit, so x is paise-scale again; the
  * closed-form integers num/den/deny must then stay inside int64 —
  * both engines' int64→double conversion is the HARDWARE correctly-
  * rounded one, which wide-decimal/HUGEINT→double casts are not (the
  * q186 lesson). Sufficient condition n·(x range) < 2^31·√2 ≈ 3·10⁹
  * (then (nX)² < 2^63); the guard raises loudly per channel past
  * range 2·10⁹/n — ≈ 0.7 M currency units/day/channel over a year,
  * far above the gate data, and the right production fix past it is
  * coarser spend units, not wider floats.
  *
  * Scale shape: one day-grain spend aggregation (map-side combine),
  * one (channels × days) spine (metadata-sized), one window pass per
  * channel partition, two grouped aggregations. The date bounds are a
  * 2-value bookmark collect; nothing else leaves the executors. */
object Mmm {

  /** Exact integer adstock + grouped linear response fit of daily
    * conversions on adstocked spend; one row per channel:
    * `(channel, n_days, slope, intercept, r2)`. */
  def adstockRegression(events: DataFrame, channelTypes: Seq[String],
                        conversionType: String, tsCol: String,
                        typeCol: String, valueCol: String,
                        maxLag: Int = 12): DataFrame = {
    require(channelTypes.nonEmpty, "need at least one media channel")
    require(!channelTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a channel")
    require(maxLag >= 1 && maxLag <= 20,
      s"maxLag must be in [1, 20] (2^L scale must leave integer headroom); " +
        s"got $maxLag")
    val spark = events.sparkSession
    val ev = events.filter(col(tsCol).isNotNull)
    // date bounds: 2-value bookmark collect
    val b = ev.agg(min(to_date(col(tsCol))).as("d0"),
      max(to_date(col(tsCol))).as("d1")).head()
    require(!b.isNullAt(0), "adstockRegression needs at least one event")
    val d0 = b.getDate(0); val d1 = b.getDate(1)
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      d0.toLocalDate, d1.toLocalDate).toInt + 1
    require(nDays <= 36600,
      s"adstockRegression supports <= 100 years of days; got $nDays")
    val spine = spark.range(nDays.toLong)
      .select(date_add(lit(d0), col("id").cast("int")).as("day"))
      .crossJoin(spark.range(1).select(
        explode(lit(channelTypes.toArray)).as("channel")))
    val spend = ev.filter(col(typeCol).isin(channelTypes: _*))
      .groupBy(col(typeCol).as("channel"), to_date(col(tsCol)).as("day"))
      .agg(sum((col(valueCol).cast("decimal(12,2)") * 100).cast("long"))
        .as("__sp"))
    val conv = ev.filter(col(typeCol) === conversionType)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__y"))
    val wCh = Window.partitionBy(col("channel")).orderBy(col("day").asc)
    // A_t = Σ lag_s(spend)·2^(L−s): (L+1) lags in one window pass,
    // then scaled back to paise by truncating division (nonnegative,
    // so Spark div ≡ DuckDB // exactly)
    val adstock = (0 to maxLag).map { s =>
      coalesce(lag(col("__sp"), s).over(wCh), lit(0L)) *
        lit(1L << (maxLag - s))
    }.reduce(_ + _)
    val grid = spine
      .join(spend, Seq("channel", "day"), "left")
      .na.fill(0L, Seq("__sp"))
      .join(conv, Seq("day"), "left")
      .na.fill(0L, Seq("__y"))
      .select(col("channel"), col("day"),
        call_function("div", adstock, lit(1L << maxLag)).as("__x"),
        col("__y"))
    // grouped min-centered exact regression (fitLinearInt's closed
    // form, distributed per channel — no driver collect)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val p1 = grid.groupBy(col("channel"))
      .agg(count(lit(1)).as("__n"), min(col("__x")).as("__cx"),
        min(col("__y")).as("__cy"), max(col("__x")).as("__mx"))
    val rangeBound = 2000000000L / nDays.toLong
    val guarded = grid.join(broadcast(p1), Seq("channel"))
      .withColumn("__cx", when(col("__mx") - col("__cx") > rangeBound,
        raise_error(concat(lit("adstockRegression overflow: adstock range "
          + s"exceeds $rangeBound (int64 moment envelope, n=$nDays) "
          + "for channel="), col("channel")))
          .cast("long")).otherwise(col("__cx")))
    val xc = dec(col("__x") - col("__cx"))
    val yc = dec(col("__y") - col("__cy"))
    val p2 = guarded.groupBy(col("channel"))
      .agg(first(col("__n")).as("n_days"),
        first(col("__cx")).as("__cx0"), first(col("__cy")).as("__cy0"),
        sum(xc).as("s1"), sum(yc).as("s2"),
        sum(xc * xc).as("sxx"), sum(xc * yc).as("sxy"),
        sum(yc * yc).as("syy"))
    val nDec = dec(col("n_days"))
    // cast to LONG before the double conversion: inside the guard's
    // envelope by construction, and int64→double is hardware-exact in
    // every engine (ANSI fails loud if the envelope were ever wrong)
    val num = (nDec * col("sxy") - col("s1") * col("s2")).cast("long")
    val den = (nDec * col("sxx") - col("s1") * col("s1")).cast("long")
    val deny = (nDec * col("syy") - col("s2") * col("s2")).cast("long")
    val slope = num.cast("double") / den.cast("double")
    val intercept = (col("s2").cast("double") - slope * col("s1").cast("double")) /
      col("n_days").cast("double") + col("__cy0").cast("double") -
      slope * col("__cx0").cast("double")
    val r2 = (num.cast("double") * num.cast("double")) /
      (den.cast("double") * deny.cast("double"))
    val zero = lit(0L)
    def g(cond: Column, c: Column) =
      when(cond, c).otherwise(lit(null).cast("double"))
    p2.select(col("channel"), col("n_days"),
      g(den =!= zero, slope).as("slope"),
      g(den =!= zero, intercept).as("intercept"),
      g(den =!= zero && deny =!= zero, r2).as("r2"))
  }
}
