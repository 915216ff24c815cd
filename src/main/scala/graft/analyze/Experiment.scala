package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout — the holdout-lift measurement every
  * activation campaign needs (the reference pushes audiences to a
  * campaign platform, `conf/deployment.json:5-20`; "did the campaign
  * move the metric vs the holdout" is the follow-up question).
  */
object Experiment {

  /** Deterministic hash split: entity → variant by md5 residue (the
    * [[TextAnalysis.hashSampleKey]] key, so assignment is a pure
    * function of the id — stable across runs, engines, and retries;
    * never `rand()`). `treatmentResidues` of `modulus` go to
    * treatment, the rest to control — e.g. (20, 0 until 10) is a
    * 50/50 split. */
  def assignVariant(idCol: Column, modulus: Int,
                    treatmentResidues: Seq[Int]): Column = {
    require(modulus >= 2, s"modulus must be >= 2; got $modulus")
    require(treatmentResidues.nonEmpty &&
      treatmentResidues.forall(r => r >= 0 && r < modulus) &&
      treatmentResidues.size < modulus,
      "treatmentResidues must be a proper non-empty subset of 0 until modulus")
    when(pmod(TextAnalysis.hashSampleKey(idCol), lit(modulus))
        .isin(treatmentResidues.map(r => r: Any): _*), lit("treatment"))
      .otherwise(lit("control"))
  }

  /** Two-proportion experiment readout over an entity-level outcome:
    * one row —
    * `(n_treatment, n_control, conv_treatment, conv_control,
    * rate_treatment, rate_control, abs_lift, rel_lift, z_score)`.
    *
    * `outcomes` must be ONE ROW PER ENTITY with a boolean/0-1
    * `outcomeCol` (aggregate events to entity grain first — counting
    * events instead of entities would break the independence the
    * z-test assumes). Rates are single IEEE divisions of exact
    * counts; the z-score is the pooled two-proportion statistic
    * (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) computed in ONE fixed-shape
    * double expression over the four exact counts — the
    * corrMatrixInt discipline: exact integers through
    * correctly-rounded arithmetic (sqrt is IEEE-exact), so every
    * engine replays it bit-for-bit. Null variant/outcome rows are
    * dropped.
    *
    * Shape: one partial-aggregating pass over the entity relation
    * (conditional sums per variant), metadata-sized result. */
  def abReadout(outcomes: DataFrame, variantCol: String,
                outcomeCol: String): DataFrame = {
    val isT = col(variantCol) === "treatment"
    val isC = col(variantCol) === "control"
    val conv = col(outcomeCol).cast("long")
    val agg = outcomes
      .filter(col(variantCol).isNotNull && col(outcomeCol).isNotNull)
      .agg(
        sum(when(isT, 1L).otherwise(0L)).as("n_treatment"),
        sum(when(isC, 1L).otherwise(0L)).as("n_control"),
        sum(when(isT, conv).otherwise(0L)).as("conv_treatment"),
        sum(when(isC, conv).otherwise(0L)).as("conv_control"))
    def d(c: Column) = c.cast("double")
    val pT = d(col("conv_treatment")) / d(col("n_treatment"))
    val pC = d(col("conv_control")) / d(col("n_control"))
    val pPool = d(col("conv_treatment") + col("conv_control")) /
      d(col("n_treatment") + col("n_control"))
    val se = sqrt(pPool * (lit(1.0d) - pPool) *
      (lit(1.0d) / d(col("n_treatment")) + lit(1.0d) / d(col("n_control"))))
    agg.select(col("n_treatment"), col("n_control"),
      col("conv_treatment"), col("conv_control"),
      pT.as("rate_treatment"), pC.as("rate_control"),
      (pT - pC).as("abs_lift"),
      ((pT - pC) / pC).as("rel_lift"),
      ((pT - pC) / se).as("z_score"))
  }

  /** CUPED variance-reduced readout (Deng et al. 2013 — the standard
    * experimentation-platform upgrade): adjust each entity's outcome y
    * by its PRE-period covariate x, y* = y − θ·(x − x̄), with
    * θ = cov(x,y)/var(x) pooled over all entities. The adjusted lift
    * has the same expectation (randomization makes x independent of
    * assignment) but variance shrunk by ρ²(x,y) — reported as
    * `rho2` = achievable variance-reduction fraction.
    *
    * One row: `(n_treatment, n_control, mean_y_treatment,
    * mean_y_control, raw_lift, theta, adj_lift, rho2)`.
    *
    * Exactness: x and y are cast DECIMAL(12,2) (exact for 2-dp
    * money/score columns) and every moment (Σx, Σy, Σxy, Σx², Σy²,
    * per-variant Σ) is an order-free exact decimal sum in ONE
    * aggregation pass; θ, lifts, and ρ² are fixed-shape double
    * expressions over those exact scalars (the corrMatrixInt
    * discipline), so any engine replays them bit-for-bit. Adjusted
    * lift simplifies to (ȳ_t − ȳ_c) − θ·(x̄_t − x̄_c) — means only,
    * no per-row second pass. */
  def cupedReadout(outcomes: DataFrame, variantCol: String,
                   yCol: String, xCol: String): DataFrame = {
    val dec = "decimal(12,2)"
    val x = col(xCol).cast(dec)
    val y = col(yCol).cast(dec)
    val isT = col(variantCol) === "treatment"
    val isC = col(variantCol) === "control"
    val agg = outcomes
      .filter(col(variantCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(isT, 1L).otherwise(0L)).as("n_treatment"),
        sum(when(isC, 1L).otherwise(0L)).as("n_control"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * y).cast("decimal(30,4)")).as("sxy"),
        sum((x * x).cast("decimal(30,4)")).as("sxx"),
        sum((y * y).cast("decimal(30,4)")).as("syy"),
        sum(when(isT, x).otherwise(lit(0).cast(dec))).as("sx_t"),
        sum(when(isC, x).otherwise(lit(0).cast(dec))).as("sx_c"),
        sum(when(isT, y).otherwise(lit(0).cast(dec))).as("sy_t"),
        sum(when(isC, y).otherwise(lit(0).cast(dec))).as("sy_c"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n")); val nT = d(col("n_treatment")); val nC = d(col("n_control"))
    val covXY = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varX = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varY = n * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val theta = covXY / varX
    val meanYT = d(col("sy_t")) / nT
    val meanYC = d(col("sy_c")) / nC
    val rawLift = meanYT - meanYC
    val adjLift = rawLift - theta * (d(col("sx_t")) / nT - d(col("sx_c")) / nC)
    agg.select(col("n_treatment"), col("n_control"),
      meanYT.as("mean_y_treatment"), meanYC.as("mean_y_control"),
      rawLift.as("raw_lift"), theta.as("theta"), adjLift.as("adj_lift"),
      ((covXY * covXY) / (varX * varY)).as("rho2"))
  }

  /** Gains/lift table — how well a propensity score ranks converters:
    * entities sorted by score DESC into `nTiles` equal-depth tiles
    * (tile 1 = highest-scored), per tile
    * `(tile, n, n_conv, conv_rate, cum_conv, capture_rate, lift)`
    * where capture_rate is the cumulative share of ALL converters
    * reached by tile t, and lift = tile rate / overall rate. The
    * campaign-targeting readout: "mail only the top 3 deciles, reach
    * 70% of converters".
    *
    * Exactness: tiling is the [[Rfm.ntileFromRank]] closed form over a
    * `Skew.saltedRowNumber` global rank (parallel sort, `idCol`
    * tiebreak); counts and cumulative sums are exact integers; every
    * rate is a fixed-shape double expression over them. Shape: one
    * rank pass over entities, one tile agg, one cumulative window over
    * nTiles rows. */
  def gainsTable(scored: DataFrame, idCol: String, scoreCol: String,
                 outcomeCol: String, nTiles: Int = 10,
                 buckets: Int = 32): DataFrame = {
    require(nTiles >= 1, s"nTiles must be >= 1; got $nTiles")
    import org.apache.spark.sql.expressions.Window
    val ranked = graft.core.Skew.saltedRowNumber(
        scored.select(col(idCol), col(scoreCol),
          col(outcomeCol).cast("long").as("__out")),
        Seq.empty, col(scoreCol), descending = true,
        tieBreakers = Seq(col(idCol).asc), buckets = buckets, out = "__rk")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val tiles = ranked.crossJoin(broadcast(n))
      .select(graft.analyze.Rfm.ntileFromRank(col("__rk").cast("long"),
        col("__n"), nTiles).cast("int").as("tile"), col("__out"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"), sum(col("__out")).as("n_conv"))
    val w = Window.orderBy(col("tile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = tiles.agg(sum(col("n")).as("__tn"),
      sum(col("n_conv")).as("__tc"))
    def d(c: Column) = c.cast("double")
    tiles
      .withColumn("cum_conv", sum(col("n_conv")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("tile"), col("n"), col("n_conv"),
        (d(col("n_conv")) / d(col("n"))).as("conv_rate"),
        col("cum_conv"),
        (d(col("cum_conv")) / d(col("__tc"))).as("capture_rate"),
        ((d(col("n_conv")) / d(col("n"))) /
          (d(col("__tc")) / d(col("__tn")))).as("lift"))
  }

  /** Experiment POWER + integrity readout — the "can this test even
    * detect what we care about" guardrails run BEFORE trusting any
    * lift number:
    *
    *  - `srm_chi2` = (nT − nC)² / (nT + nC), the 1-df chi-square for a
    *    50/50 sample-ratio mismatch (a biased splitter invalidates
    *    everything downstream); `srm_suspect` flags chi2 > 3.841
    *    (p < .05). A SINGLE division of exact integers — lint-clean.
    *  - `mde_abs` = zSum · √(p̂(1−p̂)(1/nT + 1/nC)), the classic
    *    two-proportion minimum detectable absolute effect at the
    *    pooled rate p̂; zSum defaults to 2.8 ≈ z_{α/2=.025} + z_{β=.2}
    *    (80% power, two-sided 5%) — kept as ONE literal so the
    *    expression shape is fixed. √ is IEEE-correctly-rounded, so the
    *    chained fixed-shape arithmetic replays bit-exact cross-engine.
    *  - `abs_lift` and `detectable` = |lift| > mde_abs: both arms'
    *    doubles derive from the same exact integers, so even the
    *    boundary compare is deterministic.
    *
    * `outcomes` is ONE ROW PER ENTITY with a 0/1 `convCol` (the
    * [[lift]] readout's grain rule). One partial-aggregating pass,
    * one row out. Doubles are null (never NaN) when an arm is empty. */
  def mdeReadout(outcomes: DataFrame, variantCol: String, convCol: String,
                 zSum: Double = 2.8): DataFrame = {
    require(zSum > 0, s"zSum must be > 0; got $zSum")
    val isT = col(variantCol) === "treatment"
    val isC = col(variantCol) === "control"
    val agg = outcomes
      .filter(col(variantCol).isNotNull && col(convCol).isNotNull)
      .agg(
        sum(when(isT, 1L).otherwise(0L)).as("n_treatment"),
        sum(when(isC, 1L).otherwise(0L)).as("n_control"),
        sum(when(isT, col(convCol).cast("long")).otherwise(0L))
          .as("conv_treatment"),
        sum(when(isC, col(convCol).cast("long")).otherwise(0L))
          .as("conv_control"))
    def d(c: Column) = c.cast("double")
    val nT = d(col("n_treatment")); val nC = d(col("n_control"))
    val p = d(col("conv_treatment") + col("conv_control")) /
      d(col("n_treatment") + col("n_control"))
    val mde = lit(zSum) * sqrt(p * (lit(1.0) - p) *
      (lit(1.0) / nT + lit(1.0) / nC))
    val liftAbs = d(col("conv_treatment")) / nT -
      d(col("conv_control")) / nC
    val ok = col("n_treatment") > 0 && col("n_control") > 0
    def g(c: Column) = when(ok, c).otherwise(lit(null).cast("double"))
    agg.select(col("n_treatment"), col("n_control"),
      col("conv_treatment"), col("conv_control"),
      (d((col("n_treatment") - col("n_control")) *
          (col("n_treatment") - col("n_control"))) /
        d(col("n_treatment") + col("n_control"))).as("srm_chi2"),
      (d((col("n_treatment") - col("n_control")) *
          (col("n_treatment") - col("n_control"))) >
        lit(3.841) * d(col("n_treatment") + col("n_control")))
        .as("srm_suspect"),
      g(p).as("pooled_rate"), g(mde).as("mde_abs"),
      g(liftAbs).as("abs_lift"),
      when(ok, abs(liftAbs) > mde).otherwise(lit(null).cast("boolean"))
        .as("detectable"))
  }

  /** Difference-in-differences readout — the quasi-experimental
    * companion to [[cupedReadout]]: when assignment isn't random but
    * both arms are observed BEFORE and AFTER the intervention, the
    * causal read is the difference of the arms' pre→post changes,
    *
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
    *
    * which cancels both arm-level baselines and the common time trend
    * (the parallel-trends assumption does the identification).
    * `outcomes` is ONE ROW PER ENTITY with decimal pre/post values.
    * All four sums are exact decimal aggregates; every mean and the
    * estimator are fixed-shape double expressions over them. One
    * partial-aggregating pass, one row out. */
  def didReadout(outcomes: DataFrame, variantCol: String,
                 preCol: String, postCol: String): DataFrame = {
    val dec = "decimal(12,2)"
    val pre = col(preCol).cast(dec)
    val post = col(postCol).cast(dec)
    val isT = col(variantCol) === "treatment"
    val isC = col(variantCol) === "control"
    val zero = lit(0).cast(dec)
    val agg = outcomes
      .filter(col(variantCol).isNotNull && col(preCol).isNotNull &&
        col(postCol).isNotNull)
      .agg(
        sum(when(isT, 1L).otherwise(0L)).as("n_treatment"),
        sum(when(isC, 1L).otherwise(0L)).as("n_control"),
        sum(when(isT, pre).otherwise(zero)).as("s_pre_t"),
        sum(when(isT, post).otherwise(zero)).as("s_post_t"),
        sum(when(isC, pre).otherwise(zero)).as("s_pre_c"),
        sum(when(isC, post).otherwise(zero)).as("s_post_c"))
    def d(c: Column) = c.cast("double")
    val nT = d(col("n_treatment")); val nC = d(col("n_control"))
    val mPreT = d(col("s_pre_t")) / nT; val mPostT = d(col("s_post_t")) / nT
    val mPreC = d(col("s_pre_c")) / nC; val mPostC = d(col("s_post_c")) / nC
    val ok = col("n_treatment") > 0 && col("n_control") > 0
    def g(c: Column) = when(ok, c).otherwise(lit(null).cast("double"))
    agg.select(col("n_treatment"), col("n_control"),
      g(mPreT).as("mean_pre_treatment"), g(mPostT).as("mean_post_treatment"),
      g(mPreC).as("mean_pre_control"), g(mPostC).as("mean_post_control"),
      g((mPostT - mPreT) - (mPostC - mPreC)).as("did"))
  }

  /** Qini/uplift table — does the model rank PERSUADABLE entities
    * first, not merely likely converters ([[gainsTable]]'s question
    * for an A/B-split audience; Radcliffe 2007): entities of BOTH
    * arms rank together by score DESC into `nTiles` tiles; per tile
    * and cumulatively, treated/control counts and conversions; the
    * Qini value at depth k is
    *
    *   Q(k) = cumConvT − cumConvC · cumNT / cumNC
    *
    * emitted as the exact integer numerator `qini_num =
    * cumConvT·cumNC − cumConvC·cumNT` (the cross-multiplied form —
    * no division decides anything) plus the one display division by
    * cumNC; `uplift_cum` is the cumulative rate difference. Null
    * doubles when an arm is empty at that depth (no silent NaN).
    *
    * Overflow envelope: the cross products need cumulative counts
    * below ~3·10⁹ per arm (long headroom) — beyond that, Qini on a
    * uniform entity sample answers the same question.
    *
    * Shape: one salted global rank (no single-reducer sort), one tile
    * aggregation, cumulative windows over nTiles rows. */
  def qiniTable(scored: DataFrame, idCol: String, scoreCol: String,
                outcomeCol: String, variantCol: String, nTiles: Int = 10,
                buckets: Int = 32): DataFrame = {
    require(nTiles >= 1, s"nTiles must be >= 1; got $nTiles")
    import org.apache.spark.sql.expressions.Window
    val ranked = graft.core.Skew.saltedRowNumber(
        scored.filter(col(variantCol).isNotNull)
          .select(col(idCol), col(scoreCol),
            col(outcomeCol).cast("long").as("__out"),
            col(variantCol).as("__v")),
        Seq.empty, col(scoreCol), descending = true,
        tieBreakers = Seq(col(idCol).asc), buckets = buckets, out = "__rk")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val isT = col("__v") === "treatment"
    val tiles = ranked.crossJoin(broadcast(n))
      .select(graft.analyze.Rfm.ntileFromRank(col("__rk").cast("long"),
          col("__n"), nTiles).cast("int").as("tile"),
        col("__out"), col("__v"))
      .groupBy(col("tile"))
      .agg(sum(when(isT, 1L).otherwise(0L)).as("n_t"),
        sum(when(!isT, 1L).otherwise(0L)).as("n_c"),
        sum(when(isT, col("__out")).otherwise(0L)).as("conv_t"),
        sum(when(!isT, col("__out")).otherwise(0L)).as("conv_c"))
    val w = Window.orderBy(col("tile").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column) = c.cast("double")
    tiles
      .withColumn("cum_n_t", sum(col("n_t")).over(w))
      .withColumn("cum_n_c", sum(col("n_c")).over(w))
      .withColumn("cum_conv_t", sum(col("conv_t")).over(w))
      .withColumn("cum_conv_c", sum(col("conv_c")).over(w))
      .withColumn("qini_num", col("cum_conv_t") * col("cum_n_c") -
        col("cum_conv_c") * col("cum_n_t"))
      .select(col("tile"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"), col("cum_conv_t"), col("cum_conv_c"),
        col("qini_num"),
        when(col("cum_n_c") > 0, d(col("qini_num")) / d(col("cum_n_c")))
          .otherwise(lit(null).cast("double")).as("qini"),
        when(col("cum_n_t") > 0 && col("cum_n_c") > 0,
          d(col("cum_conv_t")) / d(col("cum_n_t")) -
            d(col("cum_conv_c")) / d(col("cum_n_c")))
          .otherwise(lit(null).cast("double")).as("uplift_cum"))
  }

  /** Matched-market lift readout — the geo-lift design when no
    * user-level randomization exists (market-level media tests): each
    * TREATED market is matched to the donor market whose PRE-period
    * daily activity tracks it most closely (minimum sum of squared
    * daily-count differences — exact integer SSE over the dense
    * market × day grid, absent days count 0), then the readout is the
    * matched difference-in-differences of post-vs-pre totals:
    *
    *   did = (post_t − pre_t) − (post_c − pre_c)   (plain longs)
    *
    * SSE ties break on the control key — deterministic. Each treated
    * market matches independently (two treated markets may pick the
    * same donor; 1:1 assignment is a different, combinatorial design).
    *
    * Scale shape: ONE day-grain partial aggregation collapses the fact
    * table; everything after — the dense grid (markets × days), the
    * treated × donor SSE matrix, the argmin — is metadata-sized
    * (markets², not facts). The daily-count grain also bounds the SSE
    * integers: markets·days·maxDaily² must fit a long — 10⁶ market-days
    * at 10⁶ daily events is 10¹⁸, inside 2⁶³; pre-scale beyond that. */
  def matchedMarketReadout(events: DataFrame, marketCol: String,
                           tsCol: String, treated: Seq[String],
                           cutoff: Column): DataFrame = {
    require(treated.nonEmpty, "need at least one treated market")
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .filter(col(tsCol).isNotNull && col(marketCol).isNotNull)
      .groupBy(col(marketCol).as("__m"), to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).as("__c"))
    val pre = daily.filter(col("__d") < to_date(cutoff))
    // dense pre-period grid: every market gets every observed pre day
    // (a market dark on a day differs from that day not existing)
    val mkts = daily.select(col("__m")).distinct()
    val days = pre.select(col("__d")).distinct()
    val grid = mkts.crossJoin(days)
      .join(pre, Seq("__m", "__d"), "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
    val isT = col("__m").isin(treated: _*)
    val gt = grid.filter(isT)
      .select(col("__m").as("treated_market"), col("__d"),
        col("__c").as("__ct"))
    val gc = grid.filter(!isT)
      .select(col("__m").as("control_market"), col("__d"),
        col("__c").as("__cc"))
    val sse = gt.join(gc, Seq("__d"))
      .groupBy(col("treated_market"), col("control_market"))
      .agg(sum((col("__ct") - col("__cc")) * (col("__ct") - col("__cc")))
        .as("sse_pre"))
    val wBest = Window.partitionBy(col("treated_market"))
      .orderBy(col("sse_pre").asc, col("control_market").asc)
    val matched = sse.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1).drop("__rn")
    val totals = daily.groupBy(col("__m"))
      .agg(sum(when(col("__d") < to_date(cutoff), col("__c"))
          .otherwise(0L)).as("pre_total"),
        sum(when(col("__d") >= to_date(cutoff), col("__c"))
          .otherwise(0L)).as("post_total"))
    matched
      .join(totals.select(col("__m").as("treated_market"),
        col("pre_total").as("pre_t"), col("post_total").as("post_t")),
        Seq("treated_market"))
      .join(totals.select(col("__m").as("control_market"),
        col("pre_total").as("pre_c"), col("post_total").as("post_c")),
        Seq("control_market"))
      .select(col("treated_market"), col("control_market"),
        col("sse_pre"), col("pre_t"), col("post_t"), col("pre_c"),
        col("post_c"),
        ((col("post_t") - col("pre_t")) -
          (col("post_c") - col("pre_c"))).as("did"),
        when(col("pre_t") > 0 && col("pre_c") > 0,
          (col("post_t").cast("double") / col("pre_t").cast("double")) -
            (col("post_c").cast("double") / col("pre_c").cast("double")))
          .otherwise(lit(null).cast("double")).as("rel_lift"))
  }
}
