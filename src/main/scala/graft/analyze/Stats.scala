package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics operators: exact regression fits and robust
  * outlier detection over quality signals. Same determinism policy as
  * `GraphOps`: the moment accumulation is INTEGER-exact (order-free),
  * and doubles appear only in final, fixed-shape expressions — so a
  * replay on any partitioning, or in another engine, reproduces the
  * result bit-for-bit. (Double-moment regression at 100 TB is also
  * numerically rotten: Σx² of raw magnitudes cancels catastrophically;
  * centering first fixes conditioning, integers fix determinism.)
  */
object Stats {

  /** Exact simple linear regression y ~ slope·x + intercept over
    * integral feature columns, via centered normal equations.
    *
    * Two passes: (1) count + exact sums → integer floor-div centers
    * (translation invariance makes ANY integer center exact, so the
    * floor-mean is both deterministic and well-conditioned);
    * (2) centered second moments as DECIMAL(38,0) sums — map-side
    * combined, order-independent, exact. The closed form then runs in
    * fixed-shape double arithmetic on metadata-sized scalars.
    *
    * Exactness bound: |centered value| up to ~3·10⁹ keeps squares in
    * int64 range per row; decimal(38,0) accumulation then holds to
    * ~10³⁸ total. Returns one row: (n, slope, intercept, r2). */
  /** Floor division of an exact decimal sum by the row count WITHOUT
    * collapsing the sum to a long first: at 10^10 rows × 10^9 values
    * the sum exceeds int64 even though the decimal holds it exactly —
    * only the mean must fit a long (it's a mean of longs, so it does). */
  private def floorMean(sum: java.math.BigDecimal, n: Long): Long = {
    val s = sum.toBigInteger
    val nB = java.math.BigInteger.valueOf(n)
    s.subtract(s.mod(nB)).divide(nB).longValueExact() // mod is nonneg → floor
  }

  def fitLinearInt(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val p1 = d.agg(count(lit(1)), sum(dec(col("__x"))), sum(dec(col("__y")))).head()
    val n = p1.getLong(0)
    require(n > 0, "fitLinearInt needs at least one row")
    val cx = floorMean(p1.getDecimal(1), n)
    val cy = floorMean(p1.getDecimal(2), n)
    val xc = dec(col("__x") - lit(cx))
    val yc = dec(col("__y") - lit(cy))
    val p2 = d.agg(sum(xc).as("s1"), sum(yc).as("s2"),
      sum(xc * xc).as("sxx"), sum(xc * yc).as("sxy"), sum(yc * yc).as("syy"))
    val nDec = lit(n).cast("decimal(38,0)")
    val num = nDec * col("sxy") - col("s1") * col("s2")
    val den = nDec * col("sxx") - col("s1") * col("s1")
    val deny = nDec * col("syy") - col("s2") * col("s2")
    val slope = num.cast("double") / den.cast("double")
    // fixed expression shape, mirrored verbatim by any replaying engine
    val intercept = (col("s2").cast("double") - slope * col("s1").cast("double")) /
      lit(n.toDouble) + lit(cy.toDouble) - slope * lit(cx.toDouble)
    val r2 = (num.cast("double") * num.cast("double")) /
      (den.cast("double") * deny.cast("double"))
    // zero variance → null, matching corrMatrixInt's degenerate
    // convention (not a silent NaN row); r2 also needs y-variance
    val zero = lit(0).cast("decimal(38,0)")
    def guarded(cond: Column, c: Column) =
      when(cond, c).otherwise(lit(null).cast("double"))
    p2.select(lit(n).as("n"),
      guarded(den =!= zero, slope).as("slope"),
      guarded(den =!= zero, intercept).as("intercept"),
      guarded(den =!= zero && deny =!= zero, r2).as("r2"))
  }

  /** Pairwise Pearson correlation matrix over integral feature columns
    * — `fitLinearInt`'s exactness generalized to p features: TWO passes
    * total regardless of p (one agg for counts+sums → floor-mean
    * centers; one agg for ALL p + p(p+1)/2 centered moments as
    * DECIMAL(38,0) sums), then each r = (n·Mij − SiSj) /
    * √((n·Mii − Si²)(n·Mjj − Sj²)) in fixed-shape double ops — `sqrt`
    * is IEEE-correctly-rounded, so the doubles replay exactly from the
    * exact integers in any engine. One row per unordered pair (i < j in
    * `cols` order). Degenerate (zero-variance) columns yield null r. */
  def corrMatrixInt(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrixInt needs at least two columns")
    require(cols.distinct.size == cols.size, "corrMatrixInt columns must be distinct")
    val d = df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast("long").as(c)): _*)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val sumAggs = cols.map(c => sum(dec(col(c))))
    val p1 = d.agg(count(lit(1)), sumAggs: _*).head()
    val n = p1.getLong(0)
    require(n > 0, "corrMatrixInt needs at least one row")
    val centers = cols.indices.map(i => floorMean(p1.getDecimal(i + 1), n))
    val cCol = cols.zip(centers).map { case (c, ctr) => dec(col(c) - lit(ctr)) }
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i <= j
    } yield (i, j)
    val momentAggs =
      cols.indices.map(i => sum(cCol(i)).as(s"s$i")) ++
        pairs.map { case (i, j) => sum(cCol(i) * cCol(j)).as(s"m${i}_$j") }
    val p2 = d.agg(momentAggs.head, momentAggs.tail: _*)
    val nDec = lit(n).cast("decimal(38,0)")
    def denom(i: Int) =
      (nDec * col(s"m${i}_$i") - col(s"s$i") * col(s"s$i")).cast("double")
    val pairRows = for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val num = (nDec * col(s"m${i}_$j") - col(s"s$i") * col(s"s$j")).cast("double")
      val den = sqrt(denom(i) * denom(j))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        when(den > 0, num / den).otherwise(lit(null).cast("double")).as("corr"))
    }
    p2.select(explode(array(pairRows: _*)).as("r"))
      .select(lit(n).as("n"), col("r.col_a"), col("r.col_b"), col("r.corr"))
  }

  /** Exact discrete weighted median per group: the smallest value whose
    * cumulative integer weight reaches half the group total (2·cum ≥ W
    * — pure integer compare, no p·W double, no interpolation; the
    * result is an actual data value). The weighted generalization of
    * the discrete-median policy `madOutliers` uses: train-data use
    * cases weight documents by token count, so "the median document"
    * should mean the token-mass midpoint, not the doc-count midpoint.
    * ONE window shuffle (cumulative weight ordered by (value, id)) +
    * a min-struct agg; ties deterministic via the id tiebreak. Null
    * values/weights and non-positive weights are excluded. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String, idCol: String): DataFrame = {
    // filter on the SAME cast-long weight the cumulative sum accumulates:
    // filtering the original type would let fractional weights in (0,1)
    // pass yet contribute zero mass — a group whose weights all truncate
    // to 0 would get tot=0 and silently return its minimum (ADVICE r12)
    val v = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull &&
      col(weightCol).cast("long") > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    v.withColumn("__cum", sum(col(weightCol).cast("long")).over(w))
      .withColumn("__tot", sum(col(weightCol).cast("long")).over(tot))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(struct(col(valueCol).as("v"), col(idCol).as("id"))).as("m"),
        max(col("__tot")).as("total_weight"))
      .select(col(groupCol), col("m.v").as("weighted_median"),
        col("total_weight"))
  }

  /** Fixed-range equi-width histogram per group: bucket i covers
    * [lo + i·(hi−lo)/n, lo + (i+1)·(hi−lo)/n), indices clamped to
    * [0, n−1] (under/overflow lands in the edge buckets — callers that
    * need them separate filter first). The bucket index is ONE
    * fixed-shape double expression — floor((v−lo)/(hi−lo)·n), clamp —
    * so boundary values bucket identically in any replaying engine;
    * one partial-aggregating groupBy, empty buckets absent (sparse).
    * The profiling companion to `columnProfile`: distributions, not
    * just counts. */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    val raw = floor((col(valueCol).cast("double") - lit(lo)) /
      lit(hi - lo) * lit(nBuckets.toDouble))
    val bucket = least(lit(nBuckets - 1).cast("double"),
      greatest(lit(0.0), raw)).cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Equi-DEPTH histogram per group: `nBuckets` buckets of (near-)equal
    * ROW COUNT over the group's value order — the distribution profile
    * [[histogram]]'s fixed-range equi-width form can't give when the
    * value range is unknown or heavy-tailed (one hot bucket, the rest
    * empty). Bucket assignment is SQL-standard `ntile` over the
    * deterministic (value, id) order (sizes differ by ≤1, earlier
    * buckets take the extras — identical in any replaying engine);
    * output per bucket: row count and the actual [lo, hi] value span
    * (data values, no interpolation). ONE window shuffle + one
    * partial-aggregating groupBy; nulls excluded (they carry no
    * position in the value order). */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         idCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be > 0, got $nBuckets")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket", ntile(nBuckets).over(w))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** Per-group categorical diversity as GINI IMPURITY, 1 − Σ(nᵢ/N)²:
    * the rational diversity measure — Shannon entropy needs libm `log`,
    * whose last-ulp behavior differs across engines, while Gini is one
    * double division of exact integers (Σnᵢ² as DECIMAL(38,0), N²) —
    * replayable bit-for-bit. The corpus-balance profiling signal:
    * "how mixed are this source's languages?" Two partial-aggregating
    * groupBys, no window. */
  def giniDiversity(df: DataFrame, groupCol: String,
                    catCol: String): DataFrame = {
    val counts = df.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol)).agg(count(lit(1)).as("__c"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    counts.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n"),
        count(lit(1)).as("n_categories"),
        sum(dec(col("__c")) * dec(col("__c"))).as("__ss"))
      .select(col(groupCol), col("n"), col("n_categories"),
        (lit(1.0) - col("__ss").cast("double") /
          (dec(col("n")) * dec(col("n"))).cast("double")).as("gini"))
  }

  /** Per-group exact MODE: the most frequent value, ties to the
    * smallest value (deterministic) — the same integer argmax shape as
    * label propagation's pick. Two partial-aggregating groupBys. */
  def modePerGroup(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    counts.groupBy(col(groupCol))
      .agg(min(struct((-col("__c")).as("nc"), col(valueCol).as("v"))).as("__m"))
      .select(col(groupCol), col("__m.v").as("mode"),
        (-col("__m.nc")).as("n_mode"))
  }

  /** Robust per-group outlier flags via the median/MAD rule: a value is
    * an outlier when |v − median| > k·MAD (k defaults to 4.4478 ≈
    * 3·1.4826, the "3 robust sigmas" convention — kept as ONE literal so
    * the comparison is a single fixed-shape multiply).
    *
    * Medians are DISCRETE (the value at rank ⌈n/2⌉): full-retention
    * `percentile_approx` — an actual data value, no interpolation, so
    * the result is bit-exact and replayable (interpolated medians mix
    * engine-specific FP expression shapes; q97 established the
    * discrete ≡ quantile_disc equivalence). Two grouped aggs (median,
    * then MAD of deviations) + two broadcast joins of metadata-sized
    * per-group scalars — the value stream itself shuffles only into
    * the two apply-side group aggs; at 100 TB the group cardinality is
    * the broadcast bound, exactly like the stratified-sample rate
    * tables. EXACTNESS BOUND: the discrete guarantee holds while each
    * group's row count stays ≤ `accuracy` (full retention); beyond
    * that percentile_approx compresses and the median is approximate —
    * raise `accuracy` (memory-linear) or switch to the
    * `weightedMedian` machinery (weight 1, exact at any size for one
    * extra shuffle). Returns the input plus (med, mad, is_outlier). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 4.4478, accuracy: Int = 100000000): DataFrame = {
    val v = df.filter(col(valueCol).isNotNull)
    val med = v.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).as("med"))
    val withMed = v.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile_approx(abs(col(valueCol) - col("med")), lit(0.5),
        lit(accuracy)).as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Quantile normalization across groups: replace each value with the
    * GLOBAL value at the row's within-group quantile — the cross-source
    * score calibration pass (source A's 90th-percentile quality score
    * means "top decile of A" whatever A's scale; after normalization
    * one global threshold treats every source fairly — the FineWeb
    * per-domain-gate idea taken to a common scale).
    *
    * ALL-INTEGER rank mapping (no double quantile arithmetic to
    * replay): within-group rank r of n (ordered by (value, id) — id
    * must be a per-row tiebreaker) maps to the global value at rank
    * ⌈(2r−1)·N / (2n)⌉ = ((2r−1)·N + 2n − 1) div (2n) — the midpoint
    * (Hazen) convention, so a 1-row group lands on the global median
    * rather than a degenerate extreme. Exact decimal(38,0) arithmetic
    * (`div`, never doubles — and not bare longs: (2r−1)·N wraps int64
    * beyond ~2.1e9 rows).
    *
    * Scale posture: the within-group rank is one window shuffle; the
    * GLOBAL rank reuses [[graft.core.Skew.saltedRowNumber]] (empty key
    * set) — exact global row numbers from range buckets + offsets, no
    * single-reducer sort; the rank→value mapping is an equi join on
    * the rank index.
    *
    * Null policy (ADVICE r13): rows with a null `valueCol` are DROPPED
    * from the output — a null has no rank on either the group or the
    * global scale, so there is no principled normalized value for it.
    * This intentionally differs from [[winsorize]], which passes nulls
    * through because its output keeps the input row set; callers that
    * need the null rows back should union them in with
    * `normalized = null`. */
  /** Exact DISCRETE per-group percentiles at integer `ps` — the value
    * at rank ⌈p·n/100⌉ of the group's (value, id) order: an actual
    * data value, no interpolation, no sketch (the SLA-report shape:
    * p50/p90/p99 latency per service). Pure integer rank test —
    * (p·n + 99) div 100 — so every engine replays it. ONE window
    * shuffle (rank + count over the group) and a ps-sized explode on
    * the matching rows only. For sketch-tolerant callers at extreme
    * group sizes, `percentile_approx` is the approximate sibling;
    * this form is the exact one the oracle can gate. */
  def discretePercentiles(df: DataFrame, groupCol: String, valueCol: String,
                          idCol: String, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"ps must be integer percents in 1..100; got $ps")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val tot = Window.partitionBy(col(groupCol))
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(tot))
    val pArr = array(ps.map(lit): _*)
    ranked
      .withColumn("p", explode(pArr))
      .filter(col("__r") ===
        call_function("div", col("p").cast("long") * col("__n") + 99L,
          lit(100L)))
      .select(col(groupCol), col("p"), col(valueCol).as("value"))
  }

  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String, buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOTE __tot, not __N: Spark resolves names case-insensitively by
    // default, so __N would collide with the per-group __n
    val clash = Seq("__r", "__n", "__tot", "__tr", "__gr", "normalized")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"quantileNormalize: column(s) ${clash.mkString(", ")} already exist in input")
    val v = df.filter(col(valueCol).isNotNull)
    val wg = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val tot = Window.partitionBy(col(groupCol))
    val ranked = v
      .withColumn("__r", row_number().over(wg).cast("long"))
      .withColumn("__n", count(lit(1)).over(tot))
    val globalRanked = graft.core.Skew.saltedRowNumber(
        v.select(col(valueCol), col(idCol)), Seq.empty, col(valueCol),
        descending = false, tieBreakers = Seq(col(idCol).asc),
        buckets = buckets, out = "__gr")
      .select(col("__gr").cast("long").as("__gr"),
        col(valueCol).as("normalized"))
    // N rides in as a broadcast 1-row relation (no separate eager
    // driver count job); the mapping arithmetic runs in decimal(38,0)
    // because (2r−1)·N overflows int64 beyond ~2.1e9 rows — the exact
    // silent-wrap class the pageRank weight guard exists for. `div` on
    // decimals is still exact integral division; the target rank ≤ N
    // always fits the long it joins on.
    val dec = "decimal(38,0)"
    val totals = v.agg(count(lit(1)).cast(dec).as("__tot"))
    val num = (col("__r").cast(dec) * 2 - 1) * col("__tot") +
      col("__n").cast(dec) * 2 - 1
    val target = call_function("div", num, col("__n").cast(dec) * 2)
    ranked.crossJoin(broadcast(totals))
      .withColumn("__tr", target.cast("long"))
      .join(globalRanked, col("__tr") === col("__gr"))
      .drop("__r", "__n", "__tot", "__tr", "__gr")
  }

  /** Per-group winsorization: clamp values to the group's discrete
    * [loPct, hiPct] percentile bounds — the standard tail-taming pass
    * before averaging noisy quality scores or latencies (outliers are
    * bounded, not dropped, so counts are preserved unlike a filter).
    *
    * The bound is EXACT and discrete: the smallest value whose
    * cumulative row count reaches p% of the group (cum·100 ≥ p·n, a
    * pure integer compare — no interpolation, no sketch, no
    * engine-specific index convention; the replaying engine runs the
    * identical window + integer test). Percentiles are integer percents
    * so the threshold stays rational. Within a value-tie the crossing
    * row is order-arbitrary but the VALUE picked is not — ties share
    * one value by definition.
    *
    * ONE window shuffle (cumulative count over the group's value
    * order) + one metadata-sized bounds agg broadcast back; nulls pass
    * through unclamped (they carry no magnitude to clamp). A hot group
    * sorts in one task — the usual salted-rank territory at 100 TB;
    * this plain form keeps the gate-replayable single-window shape. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loPct: Int, hiPct: Int): DataFrame = {
    require(0 <= loPct && loPct <= hiPct && hiPct <= 100,
      s"need 0 <= loPct <= hiPct <= 100, got [$loPct, $hiPct]")
    val clash = Seq("__wz_g", "__cum", "__n", "__lo", "__hi", "winsorized")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"winsorize: column(s) ${clash.mkString(", ")} already exist in input")
    val v = df.filter(col(valueCol).isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val bounds = v
      .withColumn("__cum", count(lit(1)).over(w))
      .withColumn("__n", count(lit(1)).over(tot))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__cum") * 100 >= lit(loPct) * col("__n"),
          col(valueCol))).as("__lo"),
        min(when(col("__cum") * 100 >= lit(hiPct) * col("__n"),
          col(valueCol))).as("__hi"))
      .withColumnRenamed(groupCol, "__wz_g")
    // NULL-SAFE bound join: the window/groupBy above treat a null group
    // key as its own group, so the join back must too — a plain equi
    // join would never match null keys and their values would pass
    // through unclamped (least/greatest skip null bounds) with no
    // warning.
    df.join(broadcast(bounds), col(groupCol) <=> col("__wz_g"), "left")
      .withColumn("winsorized",
        when(col(valueCol).isNull, col(valueCol))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__wz_g", "__lo", "__hi")
  }

  /** Pareto / ABC inventory classification: rank dimension members by
    * their decimal-exact value total (descending, key tiebreak) and
    * class each by the CUMULATIVE share including itself — `A` while
    * cum ≤ aPercent% of the grand total, `B` while ≤ bPercent%, else
    * `C`. Classification compares exact decimals cross-multiplied by
    * integer percents (`cum·100 ≤ grand·a`) — no division decides a
    * class; the emitted revenue/cum_share doubles are display-only
    * one-shot casts/divisions the oracle replays.
    *
    * At 100 TB the heavy stage is the facts groupBy (partial-agg
    * map-side combine; one shuffle at dim cardinality). The cumulative
    * window is UNPARTITIONED by semantic necessity — a global running
    * sum — and fine while the AGGREGATED dim rows are catalog-sized.
    * When the dim cardinality itself is fact-scale, this method now
    * SWITCHES AUTOMATICALLY (VERDICT r14 task 4) to a range-bucketed
    * form of the same computation — the [[graft.core.Skew]] global-rank
    * idea applied to rank AND running sum at once:
    *
    *   - bucket dims by approx-quantile boundaries of the total
    *     (descending bucket order aligned with the sort order; equal
    *     doubles land in one bucket, so the cast is weakly monotone
    *     and the within-bucket DECIMAL sort keeps results exact),
    *   - row_number + cumsum locally per bucket (parallel windows),
    *   - add per-bucket count/sum offsets (≤ buckets rows — the
    *     documented metadata-sized SinglePartition window class).
    *
    * The totals relation is localCheckpoint-materialized either way —
    * the cardinality probe that picks the path reuses it, and the
    * fixed-point lineage stays O(1). Spec-verified bit-equal to the
    * plain form; PlanSpec asserts the large path runs no
    * SinglePartition window over dim rows. */
  def abcClassify(facts: DataFrame, dimCol: String, valueCol: String,
                  aPercent: Int = 80, bPercent: Int = 95,
                  saltThreshold: Long = 2000000L,
                  saltBuckets: Int = 64): DataFrame = {
    require(0 < aPercent && aPercent < bPercent && bPercent <= 100,
      s"need 0 < aPercent < bPercent <= 100, got $aPercent, $bPercent")
    require(saltThreshold >= 1 && saltBuckets >= 2,
      s"need saltThreshold >= 1, saltBuckets >= 2; " +
        s"got $saltThreshold, $saltBuckets")
    val W = org.apache.spark.sql.expressions.Window
    val totals = facts.filter(col(valueCol).isNotNull)
      .groupBy(col(dimCol))
      .agg(sum(col(valueCol).cast("decimal(12,2)")).as("__t"))
      .localCheckpoint()
    val nDims = totals.count()
    val finish = (df: DataFrame) => df.select(col(dimCol), col("rnk"),
      col("__t").cast("double").as("revenue"),
      (col("__cum").cast("double") / col("__grand").cast("double"))
        .as("cum_share"),
      when(col("__cum") * 100 <= col("__grand") * aPercent, "A")
        .when(col("__cum") * 100 <= col("__grand") * bPercent, "B")
        .otherwise("C").as("abc_class"))
    if (nDims <= saltThreshold) {
      val ord = W.orderBy(col("__t").desc, col(dimCol).asc)
      val cum = sum(col("__t")).over(ord.rowsBetween(W.unboundedPreceding, 0))
      val grand = sum(col("__t")).over(W.partitionBy())
      finish(totals
        .withColumn("rnk", row_number().over(ord).cast("long"))
        .withColumn("__cum", cum)
        .withColumn("__grand", grand))
    } else {
      // ---- salted path: bucket by quantiles of the total ----
      val vAsc = col("__t").cast("double")
      val bounds = totals.select(percentile_approx(vAsc,
          typedLit((1 until saltBuckets).map(_.toDouble / saltBuckets)),
          lit(100)).as("q")).head().getSeq[Any](0) match {
        case null => Array.empty[Double]
        case s => s.collect { case d: java.lang.Double => d.doubleValue }
          .toArray.distinct.sorted
      }
      // descending bucket index: equal doubles share a bucket, the
      // local DECIMAL sort below resolves exact order inside it
      val idx = lit(bounds.length) - graft.core.Skew.searchIdx(vAsc, bounds)
      val bucketed = totals.withColumn("__b", idx)
      val wLoc = W.partitionBy(col("__b"))
        .orderBy(col("__t").desc, col(dimCol).asc)
      // every running sum is pinned to DECIMAL(30,2) — far above any
      // 100 TB revenue mass, far below the precision-38 widening cap
      // the fragility lint polices
      val dec = "decimal(30,2)"
      val loc = bucketed
        .withColumn("__lrn", row_number().over(wLoc).cast("long"))
        .withColumn("__lcum", sum(col("__t"))
          .over(wLoc.rowsBetween(W.unboundedPreceding, 0)).cast(dec))
      val per = bucketed.groupBy(col("__b"))
        .agg(count(lit(1)).as("__bn"), sum(col("__t")).cast(dec).as("__bs"))
      val wOff = W.orderBy(col("__b").asc)
        .rowsBetween(W.unboundedPreceding, -1)
      val offs = per // ≤ saltBuckets rows: metadata-sized windows
        .withColumn("__offn", coalesce(sum(col("__bn")).over(wOff), lit(0L)))
        .withColumn("__offs",
          coalesce(sum(col("__bs")).over(wOff).cast(dec), lit(0).cast(dec)))
        .withColumn("__grand", sum(col("__bs")).over(W.partitionBy()).cast(dec))
        .select(col("__b"), col("__offn"), col("__offs"), col("__grand"))
      finish(loc.join(broadcast(offs), Seq("__b"))
        .withColumn("rnk", col("__lrn") + col("__offn"))
        .withColumn("__cum", (col("__lcum") + col("__offs")).cast(dec)))
    }
  }

  /** Gini concentration coefficient of a value across dimension members
    * (how concentrated is revenue across parts/customers), in EXACT
    * rational form: over the n ascending-sorted totals x_i with rank i,
    *   G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)
    * All arithmetic is 64-bit INTEGER in hundredths ("paise"): the
    * value is snapped to DECIMAL(12,2), scaled ×100 and cast long
    * BEFORE any aggregation, so numerator and denominator are plain
    * long sums with no decimal widening anywhere (the r14 q186
    * postmortem: a DECIMAL(38,2)×BIGINT product at the precision-38
    * cap renders engine-version-dependently). Scaling both num and den
    * by the same 100 leaves the coefficient unchanged. The one IEEE
    * division is display-only (spec-checked, not gated).
    * Ties rank deterministically by the dim key; by symmetry any
    * permutation of equal values leaves Σ i·x_i unchanged, so tie
    * order cannot move the coefficient.
    *
    * Overflow envelope: Σ i·x_i ≤ n·Σx, so the caller needs
    * n_dims · total-paise-per-group < 2^63 (~9.2e18) — e.g. 10^5 dims
    * at 10^12 paise (10 B currency units) of group mass. Beyond that,
    * pre-scale the value column down before calling.
    *
    * One row out per group. The facts aggregate map-side; the rank
    * window runs over aggregated dim rows (catalog-sized). */
  def lorenzGini(facts: DataFrame, groupCol: String, dimCol: String,
                 valueCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val paise = (col(valueCol).cast("decimal(12,2)") * 100).cast("long")
    val totals = facts.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(dimCol))
      .agg(sum(paise).as("__t"))
    val rk = row_number().over(W.partitionBy(col(groupCol))
      .orderBy(col("__t").asc, col(dimCol).asc)).cast("long")
    totals.withColumn("__i", rk)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("__t")).as("__sx"),
        sum(col("__t") * col("__i")).as("__six"))
      .select(col(groupCol), col("n_dims"),
        (col("__six") * 2 - col("__sx") * (col("n_dims") + 1))
          .as("gini_num"),
        (col("__sx") * col("n_dims")).as("gini_den"),
        ((col("__six") * 2 - col("__sx") * (col("n_dims") + 1))
          .cast("double") /
          (col("__sx") * col("n_dims")).cast("double")).as("gini"))
  }
}
