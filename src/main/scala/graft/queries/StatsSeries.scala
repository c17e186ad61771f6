package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import StatsShared._

/** Time-series, survival, and change-detection statistics — trend
  * tests, autocorrelation diagnostics, control-flow change detectors and
  * survival curves over the daily events panel.
  *
  * Split out of the former single-file Stats.scala (round 10) along its
  * family seams; query + oracle pairs stay together. Cross-engine
  * determinism and scale-shape conventions are documented per query and
  * in the original Stats scaladoc (now on StatsShared).
  */
object StatsSeries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Weekend-effect panel — does the index behave differently on
    // weekends? ONE row with three independent verdicts (mean-diff z,
    // sign counts, exact median gap), because a real analysis reports
    // the parametric and nonparametric answers together and flags
    // disagreement. Exact integer day stats; medians exact
    // percentiles; one pinned z chain.
    "q527_weekend_effect" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .withColumn("we", (expr("(day + 4) % 7") >= 5L).cast("long"))
      dm.agg(
          sum(when(col("we") === 1L, 1L).otherwise(0L)).as("n_we"),
          sum(when(col("we") === 1L, col("y")).otherwise(0L)).as("s_we"),
          sum(when(col("we") === 1L, col("y") * col("y")).otherwise(0L))
            .as("ss_we"),
          sum(when(col("we") === 0L, 1L).otherwise(0L)).as("n_wd"),
          sum(when(col("we") === 0L, col("y")).otherwise(0L)).as("s_wd"),
          sum(when(col("we") === 0L, col("y") * col("y")).otherwise(0L))
            .as("ss_wd"),
          expr("cast(percentile(CASE WHEN we = 1 THEN y END, 0.5) * 2"
            + " as bigint)").as("med2_we"),
          expr("cast(percentile(CASE WHEN we = 0 THEN y END, 0.5) * 2"
            + " as bigint)").as("med2_wd"))
        .withColumn("m1", d(col("s_we")) / d(col("n_we")))
        .withColumn("m0", d(col("s_wd")) / d(col("n_wd")))
        .withColumn("v1", (d(col("ss_we")) - d(col("s_we")) *
          d(col("s_we")) / d(col("n_we"))) / (d(col("n_we")) - 1.0d))
        .withColumn("v0", (d(col("ss_wd")) - d(col("s_wd")) *
          d(col("s_wd")) / d(col("n_wd"))) / (d(col("n_wd")) - 1.0d))
        .select(col("n_we"), col("n_wd"),
          floor((col("m1") - col("m0")) * 1e2).cast("long")
            .as("mean_diff_e2"),
          when(col("v1") / d(col("n_we")) + col("v0") / d(col("n_wd"))
              > 0.0d,
            floor((col("m1") - col("m0")) /
              sqrt(col("v1") / d(col("n_we")) + col("v0") / d(col("n_wd")))
              * 1e6).cast("long")).otherwise(lit(0L)).as("welch_z_e6"),
          (col("med2_we") - col("med2_wd")).as("median_diff2"))
    }),


    // Partial autocorrelation (Durbin–Levinson, lags 1–3) — the ARIMA
    // identification companion to q456's ACF: PACF tells the AR order
    // where ACF tells the MA order. φ11 = r1, φ22 = (r2−r1²)/(1−r1²),
    // φ33 by the closed Durbin–Levinson step — all pinned chains from
    // the same exact integer-centered lag sums q456 builds. One scan.
    "q506_pacf" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val tot = daily.agg(count(lit(1)).as("nd"), sum("y").as("sy"))
      val c = daily.crossJoin(broadcast(tot))
        .select(col("day"), (col("y") * col("nd") - col("sy")).as("c"))
        .persist() // denominator + three shift joins read it
      val den = c.agg(sum(col("c") * col("c")).as("scc"),
        count(lit(1)).as("n_days"))
      val lags = c.select(explode(sequence(lit(1), lit(3))).as("k0"),
          col("day"), col("c"))
        .select(col("k0").cast("long").as("k"),
          (col("day") + col("k0")).as("day"), col("c").as("cp"))
        .join(c.select(col("day"), col("c")), "day")
        .groupBy("k").agg(sum(col("c") * col("cp")).as("sck"))
      val r = lags.crossJoin(broadcast(den))
        .withColumn("rho", d(col("sck")) / d(col("scc")))
        .groupBy("n_days")
        .agg(max(when(col("k") === 1L, col("rho"))).as("r1"),
          max(when(col("k") === 2L, col("rho"))).as("r2"),
          max(when(col("k") === 3L, col("rho"))).as("r3"))
      r.withColumn("p22", (col("r2") - col("r1") * col("r1")) /
          (lit(1.0d) - col("r1") * col("r1")))
        .withColumn("p21", col("r1") - col("p22") * col("r1"))
        .withColumn("p33", (col("r3") - col("p21") * col("r2") -
          col("p22") * col("r1")) /
          (lit(1.0d) - col("p21") * col("r1") - col("p22") * col("r2")))
        .select(col("n_days"),
          floor(col("r1") * 1e6).cast("long").as("pacf1_e6"),
          floor(col("p22") * 1e6).cast("long").as("pacf2_e6"),
          floor(col("p33") * 1e6).cast("long").as("pacf3_e6"))
    }),


    // Sen's slope confidence interval (Sen 1968; Gilbert's rank
    // bounds) — the CI that belongs to q409's Theil–Sen point estimate
    // and q487's Mann–Kendall test: order the pairwise slopes and read
    // the bounds at ranks (M ∓ 1.96·√Var(S))/2. Exact: slopes are
    // integerized e6 trunc-divs BEFORE ranking (ordering is then pure
    // integer, ties broken by the day pair), ranks via globalRank,
    // Var(S) from the q487 tie-corrected formula. Day-bounded pair
    // frame throughout.
    "q501_sen_slope_ci" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // pair sides + ties read it
      val sl = dm.select(col("day").as("d1"), col("y").as("y1"))
        .join(dm.select(col("day").as("d2"), col("y").as("y2")),
          col("d1") < col("d2"))
        .select(col("d1"), col("d2"),
          expr("(y2 - y1) * 1000000 div (d2 - d1)").as("s_e6"))
      val rk = graft.operators.Ranking.globalRank(sl, "r",
        col("s_e6").asc, col("d1").asc, col("d2").asc)
        .persist() // three rank lookups read it
      val ties = dm.groupBy("y").agg(count(lit(1)).as("tg"))
        .agg(sum(col("tg") * (col("tg") - 1L) *
          (lit(2L) * col("tg") + 5L)).as("tie_term"),
          sum("tg").as("n_days"))
      val bounds = rk.agg(count(lit(1)).as("m")).crossJoin(ties)
        .withColumn("vs", (d(col("n_days")) * (d(col("n_days")) - 1.0d) *
          (lit(2.0d) * d(col("n_days")) + 5.0d) - d(col("tie_term"))) /
          18.0d)
        .select(col("m"),
          greatest(lit(1L), floor((d(col("m")) -
            lit(1.959964d) * sqrt(col("vs"))) / 2.0d).cast("long"))
            .as("lo_rank"),
          least(col("m"), ceil((d(col("m")) +
            lit(1.959964d) * sqrt(col("vs"))) / 2.0d + 1.0d).cast("long"))
            .as("hi_rank"),
          expr("(m + 1) div 2").as("med_rank"))
      rk.crossJoin(broadcast(bounds))
        .where(col("r") === col("lo_rank") || col("r") === col("hi_rank") ||
          col("r") === col("med_rank"))
        .groupBy("m", "lo_rank", "hi_rank", "med_rank")
        .agg(min(when(col("r") === col("lo_rank"), col("s_e6")))
            .as("slope_lo_e6"),
          min(when(col("r") === col("med_rank"), col("s_e6")))
            .as("slope_med_e6"),
          min(when(col("r") === col("hi_rank"), col("s_e6")))
            .as("slope_hi_e6"))
        .select(col("m").as("m_pairs"), col("lo_rank"), col("hi_rank"),
          col("slope_lo_e6"), col("slope_med_e6"), col("slope_hi_e6"))
    }),


    // Interrupted time-series fit (segmented regression with a known
    // break — the Box–Tiao/ITS shape q444 finds the breakpoint for):
    // split the daily series at the calendar midpoint and fit OLS per
    // segment from integer sums; report both slopes and the level
    // shift AT the break — the "did the intervention move the level
    // or the trend" decomposition. Pinned chains only; one scan + two
    // segment aggregates.
    "q502_interrupted_ts" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val br = dm.agg(expr("(min(day) + max(day)) div 2").as("b"),
        min("day").as("d0"))
      def seg(pre: Boolean): DataFrame = {
        val f = dm.crossJoin(broadcast(br))
          .where(if (pre) col("day") < col("b") else col("day") >= col("b"))
          .select((col("day") - col("d0")).as("tt"), col("y"))
        val tag = if (pre) "pre" else "post"
        f.agg(count(lit(1)).as(s"n_$tag"), sum("tt").as(s"st_$tag"),
          sum("y").as(s"sy_$tag"), sum(col("tt") * col("y")).as(s"sty_$tag"),
          sum(col("tt") * col("tt")).as(s"stt_$tag"))
      }
      def fit(tag: String)(df: DataFrame): DataFrame = df
        .withColumn(s"b_$tag", (d(col(s"n_$tag")) * d(col(s"sty_$tag")) -
          d(col(s"st_$tag")) * d(col(s"sy_$tag"))) /
          (d(col(s"n_$tag")) * d(col(s"stt_$tag")) -
            d(col(s"st_$tag")) * d(col(s"st_$tag"))))
        .withColumn(s"a_$tag", (d(col(s"sy_$tag")) -
          col(s"b_$tag") * d(col(s"st_$tag"))) / d(col(s"n_$tag")))
      val j = fit("post")(fit("pre")(seg(pre = true)
        .crossJoin(seg(pre = false))))
        .crossJoin(broadcast(br))
        .withColumn("tb", d(col("b")) - d(col("d0")))
      j.select(col("b").as("break_day"), col("n_pre"), col("n_post"),
        floor(col("b_pre") * 1e6).cast("long").as("slope_pre_e6"),
        floor(col("b_post") * 1e6).cast("long").as("slope_post_e6"),
        floor(((col("a_post") + col("b_post") * col("tb")) -
          (col("a_pre") + col("b_pre") * col("tb"))) * 1e6).cast("long")
          .as("level_shift_e6"))
    }),


    // Turning-points test (Kendall's randomness check) — count local
    // extrema of the daily series against the exchangeable expectation
    // 2(D−2)/3, variance (16D−29)/90: too few turns = trend/momentum,
    // too many = oscillation. The third member of the q457/q488
    // cheap-randomness family, each sensitive to a different failure.
    // Interior triples via two calendar shift-joins (q458's shape);
    // zero diffs excluded on both engines identically. One pinned z.
    "q492_turning_points" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // three shift-join sides read it
      val tri = dm.select(col("day"), col("y").as("a"))
        .join(dm.select((col("day") - 1L).as("day"), col("y").as("b")),
          "day")
        .join(dm.select((col("day") - 2L).as("day"), col("y").as("cc")),
          "day")
        .where(col("b") =!= col("a") && col("cc") =!= col("b"))
        .agg(count(lit(1)).as("n_interior"),
          sum(when((col("b") > col("a") && col("b") > col("cc")) ||
            (col("b") < col("a") && col("b") < col("cc")), 1L)
            .otherwise(0L)).as("n_turns"))
      dm.agg(count(lit(1)).as("n_days")).crossJoin(tri)
        .withColumn("mu", lit(2.0d) * (d(col("n_days")) - 2.0d) / 3.0d)
        .withColumn("s2", (lit(16.0d) * d(col("n_days")) - 29.0d) / 90.0d)
        .select(col("n_days"), col("n_interior"), col("n_turns"),
          floor(col("mu") * 1e6).cast("long").as("expected_e6"),
          when(col("s2") > 0.0d,
            floor((d(col("n_turns")) - col("mu")) / sqrt(col("s2")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("z_e6"))
    }),


    // Pettitt changepoint test (1979) — the rank-based changepoint
    // whose SSE cousin is q444: K = max_t |U_t| with U_t the
    // Mann–Whitney statistic of {1..t} vs {t+1..D}. The antisymmetry
    // identity U_t = −Σ_{i≤t} r_i (r_i = Σ_j sgn(y_i − y_j), and the
    // i,j ≤ t double sum cancels) turns the naive O(D³) into one
    // bounded pair aggregate + one PrefixScan — the argmax day falls
    // out of an integer min/max struct. Exact integers end to end.
    "q494_pettitt" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // both pair sides read it
      val r = dm.select(col("day"), col("y"))
        .join(dm.select(col("day").as("d2"), col("y").as("y2")),
          col("day") =!= col("d2"))
        .groupBy("day")
        .agg(sum(when(col("y") > col("y2"), 1L)
          .when(col("y") < col("y2"), -1L).otherwise(0L)).as("r_i"))
      val u = graft.operators.PrefixScan.scanLong(
          r, "cr", "r_i", "sum", inclusive = true, col("day"))
        .select(col("day"), (-col("cr")).as("u_t"))
      val k = u.agg(count(lit(1)).as("n_days"),
        max(struct(abs(col("u_t")).as("au"), (-col("day")).as("nd"))).as("m"))
      k.select(col("n_days"), col("m.au").as("k_stat"),
        (-col("m.nd")).as("split_day"))
    }),


    // Mann–Kendall trend test (1945/1975) — the nonparametric "is
    // there a monotone trend" TEST whose slope q409's Theil–Sen
    // estimates: S = Σ_{i<j} sgn(y_j − y_i) over the day-bounded
    // series (the all-pairs frame is bounded by the calendar, the
    // q366 posture), tie-corrected variance, continuity-corrected z.
    // Exact integers until one pinned chain.
    "q487_mann_kendall" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // both pair sides + ties read it
      val pairs = daily.select(col("day").as("d1"), col("y").as("y1"))
        .join(daily.select(col("day").as("d2"), col("y").as("y2")),
          col("d1") < col("d2"))
        .agg(sum(when(col("y2") > col("y1"), 1L)
          .when(col("y2") < col("y1"), -1L).otherwise(0L)).as("s_mk"))
      val ties = daily.groupBy("y").agg(count(lit(1)).as("tg"))
        .agg(sum(col("tg") * (col("tg") - 1L) *
          (lit(2L) * col("tg") + 5L)).as("tie_term"),
          sum("tg").as("n_days"))
      pairs.crossJoin(ties)
        .withColumn("var_s", (d(col("n_days")) * (d(col("n_days")) - 1.0d) *
          (lit(2.0d) * d(col("n_days")) + 5.0d) - d(col("tie_term"))) /
          18.0d)
        .select(col("n_days"), col("s_mk"),
          floor(col("var_s")).cast("long").as("var_s_floor"),
          when(col("var_s") > 0.0d,
            floor((d(col("s_mk")) - when(col("s_mk") > 0L, 1.0d)
              .when(col("s_mk") < 0L, -1.0d).otherwise(0.0d)) /
              sqrt(col("var_s")) * 1e6).cast("long"))
            .otherwise(lit(0L)).as("z_e6"))
    }),


    // Record-counts exchangeability test (Foster & Stuart; Glick
    // 1978): under an exchangeable series the expected number of
    // running-maximum records in D days is the harmonic number H_D
    // with variance Σ(1/i − 1/i²) — materially more records means
    // trend, the cheapest possible trend smoke-test. Records via the
    // PrefixScan running max (min of the negated series, exclusive);
    // H_D and the variance are per-term-floored integer sums over the
    // bounded 1..D frame; ONE pinned z chain.
    "q488_record_counts" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .withColumn("ny", -col("y"))
      val rec = graft.operators.PrefixScan.scanLong(
          daily, "prevmin", "ny", "min", inclusive = false, col("day"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("y") > -col("prevmin"), 1L).otherwise(0L))
            .as("n_records"))
      val harm = rec.select(col("n_days"), col("n_records"),
          explode(sequence(lit(1L), col("n_days"))).as("i"))
        .groupBy("n_days", "n_records")
        .agg(sum(expr("1000000000 div i")).as("h_e9"),
          sum(expr("1000000000 div i - 1000000000 div (i * i)"))
            .as("v_e9"))
      harm.select(col("n_days"), col("n_records"),
          expr("h_e9 div 1000").as("expected_e6"),
          when(col("v_e9") > 0L,
            floor((d(col("n_records")) - col("h_e9").cast("double") / 1e9) /
              sqrt(col("v_e9").cast("double") / 1e9) * 1e6).cast("long"))
            .otherwise(lit(0L)).as("z_e6"))
    }),


    // Durbin–Watson statistic (1950) — are the residuals of the daily
    // trend fit serially correlated? DW ≈ 2 means clean, ≪ 2 means the
    // OLS trend line (q146's machinery on the day index) is missing
    // structure and q267-style models should be used instead. Exact:
    // slope/intercept from integer sums via ONE pinned chain; per-day
    // residuals floored to e2 BEFORE differencing (per-term floor
    // rule), then DW is a pure integer ratio over calendar-consecutive
    // residual pairs. Scale: one scan to the bounded day frame.
    "q463_durbin_watson" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val base = daily.crossJoin(broadcast(daily.agg(min("day").as("d0"))))
        .select((col("day") - col("d0")).as("tt"), col("y"))
      val sums = base.agg(count(lit(1)).as("n"), sum("tt").as("st"),
        sum("y").as("sy"), sum(col("tt") * col("y")).as("sty"),
        sum(col("tt") * col("tt")).as("stt"))
      val resid = base.crossJoin(broadcast(sums))
        .withColumn("b", (d(col("n")) * d(col("sty")) -
          d(col("st")) * d(col("sy"))) /
          (d(col("n")) * d(col("stt")) - d(col("st")) * d(col("st"))))
        .withColumn("a", (d(col("sy")) - col("b") * d(col("st"))) /
          d(col("n")))
        .select(col("tt"),
          floor((d(col("y")) - (col("a") + col("b") * d(col("tt")))) *
            100.0d).cast("long").as("r_e2"))
        .persist() // both sides of the consecutive join read it
      val num = resid.select((col("tt") + 1L).as("tt"), col("r_e2").as("rp"))
        .join(resid, "tt")
        .agg(sum((col("r_e2") - col("rp")) * (col("r_e2") - col("rp")))
          .as("num"))
      resid.agg(count(lit(1)).as("n_days"),
          sum(col("r_e2") * col("r_e2")).as("den"))
        .crossJoin(num)
        .select(col("n_days"), col("num"), col("den"),
          expr("CASE WHEN den > 0 THEN num * 1000000 div den ELSE 0 END")
            .as("dw_e6"))
    }),


    // Ljung–Box portmanteau test (1978) — are the daily index's first
    // five autocorrelations JOINTLY zero? The whiteness check q207's
    // single-lag ACF cannot give: Q = n(n+2)·Σ_k ρ_k²/(n−k) ~ χ²(5).
    // Exact: the series is integer-centered ×n (c_t = y_t·n − Σy, no
    // float mean), lag products by ONE calendar shift-join over the
    // exploded k = 1..5 frame, ρ_k as pinned double ratios of exact
    // longs, the five terms folded in sorted-k order (q399 rule).
    // Scale: one scan to the day-bounded frame.
    "q456_ljung_box" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val tot = daily.agg(count(lit(1)).as("nd"), sum("y").as("sy"))
      val c = daily.crossJoin(broadcast(tot))
        .select(col("day"), (col("y") * col("nd") - col("sy")).as("c"),
          col("nd"))
        .persist() // both shift-join sides + the denominator read it
      val den = c.agg(sum(col("c") * col("c")).as("scc"), max("nd").as("n"))
      val lagged = c.select(explode(sequence(lit(1), lit(5))).as("k0"),
          col("day"), col("c"))
        .select(col("k0").cast("long").as("k"),
          (col("day") + col("k0")).as("day"), col("c").as("cp"))
        .join(c.select(col("day"), col("c")), "day")
        .groupBy("k").agg(sum(col("c") * col("cp")).as("sck"))
      lagged.crossJoin(broadcast(den))
        .withColumn("rho", d(col("sck")) / d(col("scc")))
        .withColumn("term", col("rho") * col("rho") /
          (d(col("n")) - d(col("k"))))
        .agg(max("n").as("n_days"),
          array_sort(collect_list(struct(col("k"), col("term")))).as("ps"))
        .withColumn("sfold", aggregate(transform(col("ps"),
          x => x.getField("term")), lit(0.0d), (acc, x) => acc + x))
        .select(col("n_days"),
          floor(d(col("n_days")) * (d(col("n_days")) + 2.0d) *
            col("sfold") * 1e6).cast("long").as("q_e6"))
    }),


    // Wald–Wolfowitz runs test (1940) — randomness of the daily
    // index's direction: too FEW sign runs means momentum, too many
    // means oscillation. R = 1 + sign changes over the zero-excluded
    // diff sequence (consecutive = next present, via the two-phase
    // globalRank — no window); z against μ = 2n₊n₋/n + 1 and the
    // exact run-count variance. Integer counts, one pinned chain.
    "q457_runs_test" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val dif = daily
        .join(daily.select((col("day") + 1L).as("day"), col("y").as("yp")),
          "day")
        .select(col("day"), (col("y") - col("yp")).as("dv"))
        .where(col("dv") =!= 0L)
        .select(col("day"), when(col("dv") > 0L, 1L).otherwise(0L).as("sg"))
      val rk = graft.operators.Ranking.globalRank(dif, "r", col("day").asc)
        .persist() // both sides of the consecutive join read it
      val changes = rk.select((col("r") + 1L).as("r"), col("sg").as("sgp"))
        .join(rk.select(col("r"), col("sg")), "r")
        .agg(sum(when(col("sg") =!= col("sgp"), 1L).otherwise(0L)).as("ch"))
      rk.agg(count(lit(1)).as("n"), sum("sg").as("n_pos"))
        .crossJoin(changes)
        .withColumn("n_neg", col("n") - col("n_pos"))
        .withColumn("runs", col("ch") + 1L)
        .withColumn("mu", lit(2.0d) * d(col("n_pos")) * d(col("n_neg")) /
          d(col("n")) + 1.0d)
        .withColumn("s2", (lit(2.0d) * d(col("n_pos")) * d(col("n_neg")) *
          (lit(2.0d) * d(col("n_pos")) * d(col("n_neg")) - d(col("n")))) /
          (d(col("n")) * d(col("n")) * (d(col("n")) - 1.0d)))
        .select(col("n"), col("n_pos"), col("n_neg"), col("runs"),
          floor(col("mu") * 1e6).cast("long").as("mu_e6"),
          when(col("s2") > 0.0d,
            floor((d(col("runs")) - col("mu")) / sqrt(col("s2")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("z_e6"))
    }),


    // Permutation entropy (Bandt & Pompe 2002, order 3) — ordinal-
    // pattern complexity of the daily diff series: near 0 = scripted
    // dynamics, near 1 = white. Embedded triples come from two
    // calendar shift-joins (all three days present, no window); the
    // ordinal pattern id is three ≤ comparisons (ties to the earlier
    // index, the standard convention); entropy folds the ≤8 pattern
    // shares in sorted-id order (q116 rule), normalized by ln(6).
    "q458_permutation_entropy" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("y"))
        .groupBy("day").agg(expr("sum(y) div count(1)").as("y"))
        .persist() // three calendar shift-join sides read it
      val tri = daily.select(col("day"), col("y").as("a"))
        .join(daily.select((col("day") - 1L).as("day"), col("y").as("b")),
          "day")
        .join(daily.select((col("day") - 2L).as("day"), col("y").as("cc")),
          "day")
        .select((when(col("a") <= col("b"), 4L).otherwise(0L) +
          when(col("b") <= col("cc"), 2L).otherwise(0L) +
          when(col("a") <= col("cc"), 1L).otherwise(0L)).as("pid"))
      val pc = tri.groupBy("pid").agg(count(lit(1)).as("cnt"))
      pc.agg(sum("cnt").as("n_triples"),
          max(struct(col("cnt"), (-col("pid")).as("np"))).as("m"),
          array_sort(collect_list(struct(col("pid"), col("cnt")))).as("ps"))
        .withColumn("h", aggregate(transform(col("ps"),
          x => -(x.getField("cnt").cast("double") / d(col("n_triples"))) *
            log(x.getField("cnt").cast("double") / d(col("n_triples")))),
          lit(0.0d), (acc, x) => acc + x))
        .select(col("n_triples"), (-col("m.np")).as("top_pattern"),
          floor(col("h") * 1e6).cast("long").as("h_e6"),
          floor(col("h") / log(lit(6.0d)) * 1e6).cast("long")
            .as("pe_norm_e6"))
    }),


    // Lo–MacKinlay variance-ratio test (1988) — is the daily value
    // index a random walk? Under i.i.d. increments the variance of
    // 5-day differences is 5× the 1-day variance; VR(5) far from 1
    // means momentum (>1) or mean-reversion (<1) — the series
    // diagnostic to run BEFORE q267/q241 forecast models assume
    // anything. Exact: integer daily means; k-day differences by
    // calendar self-join (no window, missing days excluded on both
    // engines identically); variances from Σd/Σd² with ONE pinned
    // chain; z with its asymptotic variance 2(2k−1)(k−1)/(3kn).
    // Scale: one scan to the bounded day frame; everything after is
    // day-bounded.
    "q455_variance_ratio" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // three calendar self-joins read it
      def diffs(k: Int): DataFrame = daily
        .join(daily.select((col("day") + lit(k.toLong)).as("day"),
          col("y").as("yp")), "day")
        .select((col("y") - col("yp")).as("dv"))
        .agg(count(lit(1)).as(s"n$k"), sum("dv").as(s"sd$k"),
          sum(col("dv") * col("dv")).as(s"sdd$k"))
      diffs(1).crossJoin(diffs(5))
        .withColumn("v1", (d(col("sdd1")) -
          d(col("sd1")) * d(col("sd1")) / d(col("n1"))) /
          (d(col("n1")) - 1.0d))
        .withColumn("v5", (d(col("sdd5")) -
          d(col("sd5")) * d(col("sd5")) / d(col("n5"))) /
          (d(col("n5")) - 1.0d))
        .withColumn("vr", col("v5") / (lit(5.0d) * col("v1")))
        .select(col("n1"), col("n5"),
          floor(col("vr") * 1e6).cast("long").as("vr_e6"),
          when(col("v1") > 0.0d && col("n1") > 0L,
            floor((col("vr") - 1.0d) /
              sqrt(lit(2.0d) * 9.0d * 4.0d / (lit(15.0d) * d(col("n1")))) *
              1e6).cast("long")).otherwise(lit(0L)).as("z_e6"))
    }),


    // Log-rank test (Mantel 1966) — do the two user cohorts (even/odd
    // id) share a survival curve? The hypothesis-test companion to
    // q414's Kaplan–Meier ESTIMATE: at each lifetime with d deaths the
    // observed cohort-1 deaths are compared to the hypergeometric
    // expectation d·n1/n, variance d·(n1/n)(n2/n)(n−d)/(n−1), and
    // χ² = (ΣO−E)²/ΣV. Exact: per-time terms are staged trunc-div e6
    // integers (each stage ≤ e6-scale — overflow-safe at any corpus),
    // summed as integers; cohort risk sets via the suffix identity on
    // per-cohort PrefixScans. Scale: one per-user groupBy, two
    // lifetime-bounded scans, one bounded join.
    "q451_log_rank" -> ((s, d0) => {
      import graft.operators.PrefixScan
      val ev = t(s, d0, "events").select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      val maxDay = ev.agg(max("day").as("max_day"))
      val users = ev.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .crossJoin(broadcast(maxDay))
        .select((col("user_id") % 2 === 0).cast("long").as("c1"),
          (col("d1") - col("d0") + 1L).as("lt"),
          (col("d1") === col("max_day")).cast("long").as("censored"))
      // per-cohort counts on the UNION of lifetimes (fill 0) so the
      // suffix identity yields the true risk set even at lifetimes the
      // cohort itself never produced
      val la = users.where(col("c1") === 1L).groupBy("lt")
        .agg(count(lit(1)).as("n1_at"), sum(lit(1L) - col("censored")).as("d1"))
      val lb = users.where(col("c1") === 0L).groupBy("lt")
        .agg(count(lit(1)).as("n2_at"), sum(lit(1L) - col("censored")).as("d2"))
      val joint = la.join(lb, Seq("lt"), "full")
        .na.fill(0L, Seq("n1_at", "d1", "n2_at", "d2"))
      val tots = joint.agg(sum("n1_at").as("nt1"), sum("n2_at").as("nt2"))
      PrefixScan.scanLong(
          PrefixScan.scanLong(joint, "cb1", "n1_at", "sum",
            inclusive = false, asc("lt")),
          "cb2", "n2_at", "sum", inclusive = false, asc("lt"))
        .crossJoin(broadcast(tots))
        .withColumn("n1", col("nt1") - col("cb1"))
        .withColumn("n2", col("nt2") - col("cb2"))
        .withColumn("dt", col("d1") + col("d2"))
        .withColumn("nt", col("n1") + col("n2"))
        .where(col("dt") > 0L && col("nt") > 1L)
        .withColumn("e1_e6", expr("(dt * 1000000 div nt) * n1"))
        .withColumn("v_e6", expr(
          """(((dt * 1000000 div nt) * n1 div nt) * n2
             div greatest(nt - 1, 1L)) * (nt - dt)"""))
        .agg(sum("d1").as("deaths1"),
          sum(col("d1") * lit(1000000L) - col("e1_e6")).as("sum_oe_e6"),
          sum("v_e6").as("sum_v_e6"))
        .select(col("deaths1"), col("sum_oe_e6"), col("sum_v_e6"),
          // χ² in the double domain: (Σoe)² overflows int64 in the
          // worst case at sf1 risk-set sizes; e6 units cancel so the
          // pinned oe²/v chain IS chi2_e6
          when(col("sum_v_e6") > 0L,
            floor(d(col("sum_oe_e6")) * d(col("sum_oe_e6")) /
              d(col("sum_v_e6"))).cast("long")).otherwise(lit(0L))
            .as("chi2_e6"))
    }),


    // Kaplan–Meier survival estimator (Kaplan & Meier 1958) on user
    // lifetimes — the churn/retention readout q181's cohort LTV grid
    // lacks: lifetime = span from a user's first to last event day,
    // right-CENSORED when the user is still active on the final
    // observed day (their true lifetime exceeds the window — dropping
    // them or counting them as churned both bias the curve; KM is the
    // correct estimator). S(t) = Π_{u≤t} (1 − d_u/n_u) folds over the
    // CALENDAR-bounded lifetime frame as e6 integers in sorted order
    // (array_sort + aggregate — the q127 pinned-fold rule; DuckDB
    // replays with list_reduce), one trunc-div per step. Scale shape:
    // one per-user groupBy (map-combinable min/max), one
    // lifetime-bucket groupBy, and the bounded fold — the risk set
    // n_t comes from a suffix identity (total − exclusive prefix),
    // not a second pass.
    "q414_kaplan_meier" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      val maxDay = ev.agg(max("day").as("max_day"))
      val users = ev.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .crossJoin(broadcast(maxDay))
        .select((col("d1") - col("d0") + 1L).as("lt"),
          (col("d1") === col("max_day")).cast("long").as("censored"))
      val lt = users.groupBy("lt")
        .agg(count(lit(1)).as("n_at"),
          sum(lit(1L) - col("censored")).as("d_events"))
      val tot = lt.agg(sum("n_at").as("n_total"))
      // risk set at lifetime t = all users with lifetime >= t
      val risk = graft.operators.PrefixScan.scanLong(
        lt, "cum_before", "n_at", "sum", inclusive = false, asc("lt"))
        .crossJoin(broadcast(tot))
        .withColumn("n_risk", col("n_total") - col("cum_before"))
      risk.agg(array_sort(collect_list(struct(col("lt"), col("n_risk"),
          col("d_events")))).as("steps"))
        .select(explode(expr(
          """transform(sequence(1, size(steps)), i -> named_struct(
               'lt', steps[i-1].lt,
               'n_risk', steps[i-1].n_risk,
               'd_events', steps[i-1].d_events,
               's_e6', aggregate(slice(steps, 1, i), 1000000L,
                 (acc, st) -> acc * (st.n_risk - st.d_events)
                   div greatest(st.n_risk, 1L))))""")).as("r"))
        .select(col("r.lt").as("lt"), col("r.n_risk").as("n_risk"),
          col("r.d_events").as("d_events"), col("r.s_e6").as("s_e6"))
    }),


    // One-sided CUSUM drift monitor (Page 1954) on each event type's
    // daily mean value — the sequential change detector next to the
    // two-sample tests (q287 KS, q288 PSI): S_d = max(0, S_{d−1} +
    // (x_d − μ0 − slack)) alarms when a sustained upward mean shift
    // accumulates past h. The recurrence is SEQUENTIAL but has the
    // classic prefix identity S_d = P_d − min_{j≤d} P_j with P the
    // running sum of deviations — two incremental keyed window frames,
    // no ordered fold, no O(n²) tail frame. μ0 = per-type mean of
    // daily means, slack = μ0/20, h = μ0/10, all exact trunc-div
    // integers off cent-scaled values. Scale shape: one daily keyed
    // groupBy (map-combinable); the window partitions are
    // CALENDAR-bounded (days per type), never row-scaled.
    "q413_cusum" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d0, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v_e2"))
        .groupBy("event_type", "day")
        .agg(expr("sum(v_e2) div count(1)").as("x_e2"))
      val mu = daily.groupBy("event_type")
        .agg(expr("sum(x_e2) div count(1)").as("mu_e2"))
      val wCum = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(mu, "event_type")
        .withColumn("dev_e2", expr("x_e2 - mu_e2 - mu_e2 div 20"))
        .withColumn("p_e2", sum("dev_e2").over(wCum))
        .withColumn("minp_e2", min(least(col("p_e2"), lit(0L))).over(wCum))
        .withColumn("s_e2", col("p_e2") - col("minp_e2"))
        .select(col("event_type"), col("day"), col("x_e2"), col("mu_e2"),
          col("s_e2"), (col("s_e2") > expr("mu_e2 div 10")).as("alarm"))
    }),


    // Theil–Sen robust trend (Theil 1950; Sen 1968) of each event
    // type's daily volume — the median of all pairwise slopes, the
    // outlier-resistant companion to q146's OLS (one wild day moves
    // OLS, not the pairwise median). Slopes are exact rationals
    // (Δcount, Δday); the comparable key is the e9 trunc-div
    // (dy·1e9 div dx, dx > 0), so the median pick replays exactly
    // cross-engine, and the lower median ((n+1) div 2-th order stat)
    // is deterministic. Scale shape: the daily aggregate is one keyed
    // groupBy; the pair frame is CALENDAR-bounded — days² per type
    // (~30² here) regardless of row count, so the keyed rank window
    // runs on a bounded frame at any corpus size.
    "q409_theil_sen" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d0, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      val b = daily.select(col("event_type"), col("day").as("d2"),
        col("y").as("y2"))
      val slopes = daily.join(b, Seq("event_type"))
        .where(col("d2") > col("day"))
        .select(col("event_type"),
          expr("(y2 - y) * 1000000000 div (d2 - day)").as("slope_e9"))
      val w = Window.partitionBy("event_type")
        .orderBy(asc("slope_e9"))
      val ranked = slopes
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("np", count(lit(1)).over(
          Window.partitionBy("event_type")))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      ranked.where(col("rnk") === expr("(np + 1) div 2"))
        .join(nd, "event_type")
        .select(col("event_type"), col("n_days"), col("np").as("n_pairs"),
          col("slope_e9").as("ts_slope_e9"))
    }),


    // Theil-Sen robust trend per series — the median of all pairwise
    // slopes, the estimator that shrugs off the outliers OLS (q146)
    // chases. Points are the DAILY value sums (integer cents), so the
    // pair pool per series is bounded by the observation window squared
    // (~150 days → ~11k pairs), NOT by row count — the only unbounded
    // work is the daily pre-aggregation. Each pair slope is integerized
    // once (dy·1e6 div dx, exact trunc in both engines) and the median
    // is the exact lower-median element by rank — no float anywhere.
    "q265_theil_sen" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d0, "events").groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("x"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("y"))
      val a = daily.select(col("event_type"), col("x").as("x1"), col("y").as("y1"))
      val b = daily.select(col("event_type"), col("x").as("x2"), col("y").as("y2"))
      val slopes = a.join(b, Seq("event_type")).where(col("x1") < col("x2"))
        .select(col("event_type"),
          expr("(y2 - y1) * 1000000 div (x2 - x1)").as("slope_e6"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("slope_e6"))
      slopes.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
        .where(expr("rn = (cnt + 1) div 2"))
        .select(col("event_type"), col("cnt").as("n_pairs"),
          col("slope_e6").as("med_slope_e6"))
    }),


    // Kaplan-Meier survival curves per market segment — the churn/
    // retention estimator warehouses run on "time to second order".
    // Subject: each ordering customer; duration = days from first to
    // second order day (event), censored at the corpus's last order day
    // when no second order exists. The risk table ((t, at-risk, events,
    // censored) per segment) is EXACT integer window math; the survival
    // prefix product Π(1 − dᵢ/nᵢ) is the one float tail, folded LEFT in
    // t order inside each segment's collected curve array — the q116
    // order-pinning rule, so both engines multiply the same exactly-
    // rounded factors in the same order and the e9 floor is stable.
    // Scale shape: curves have one row per DISTINCT duration per segment
    // (bounded by the observation window, not by row count), so the
    // per-segment collect is a bounded array; everything before it is
    // keyed aggregation.
    "q260_kaplan_meier" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, d0, "orders").select(col("o_custkey"),
        expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      val firsts = o.groupBy("o_custkey").agg(min("day").as("d1"))
      val second = o.join(firsts, "o_custkey").where(col("day") > col("d1"))
        .groupBy("o_custkey").agg(min("day").as("d2"))
      val maxd = o.agg(max("day").as("dmax"))
      val seg = t(s, d0, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("segment"))
      val subj = firsts.join(second, Seq("o_custkey"), "left")
        .crossJoin(broadcast(maxd)).join(seg, "o_custkey")
        .select(col("segment"),
          when(col("d2").isNotNull, col("d2") - col("d1"))
            .otherwise(col("dmax") - col("d1")).as("t"),
          col("d2").isNotNull.as("event"))
      val cells = subj.groupBy("segment", "t").agg(
        sum(when(col("event"), 1L).otherwise(0L)).as("n_event"),
        sum(when(col("event"), 0L).otherwise(1L)).as("n_censor"))
      val wTot = Window.partitionBy("segment")
      val wPrev = Window.partitionBy("segment").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val risk = cells.withColumn("n_risk",
        sum(col("n_event") + col("n_censor")).over(wTot) -
          coalesce(sum(col("n_event") + col("n_censor")).over(wPrev), lit(0L)))
      risk.groupBy("segment")
        .agg(array_sort(collect_list(struct(col("t"), col("n_event"),
          col("n_censor"), col("n_risk")))).as("arr"))
        .select(col("segment"), explode(expr(
          """transform(arr, (x, i) -> struct(
               x.t as t, x.n_risk as n_risk, x.n_event as n_event,
               x.n_censor as n_censor,
               cast(floor(aggregate(slice(arr, 1, i + 1), cast(1.0 as double),
                 (acc, y) -> acc * ((cast(y.n_risk as double)
                    - cast(y.n_event as double)) / cast(y.n_risk as double)))
                 * 1000000000.0) as bigint) as s_e9))""")).as("r"))
        .select(col("segment"), col("r.t").as("t"), col("r.n_risk").as("n_risk"),
          col("r.n_event").as("n_event"), col("r.n_censor").as("n_censor"),
          col("r.s_e9").as("s_e9"))
    }),

    // Per-group OLS of event value against time: slope/intercept/r2 of
    // y = a + b*day per event_type. x = ABSOLUTE epoch day (~19.7k, so
    // < 2^15), y = floor(value*100) — integer sums only, so the partial
    // aggregation is exact; the closed-form solution is evaluated in one
    // pinned double chain. Sum bounds (int64-safe): with x < 2^15 and
    // |y_e2| < 2^23 the tightest sum is Syy <= n*2^46, so n < 2^17 per
    // group keeps every sum in int64 (Sxy <= n*2^38 and Sxx <= n*2^30 are
    // looser). Bench data is far below both bounds; at larger n, center x
    // to a window-relative day (restoring ~2^25 headroom via Sxy) or sum
    // per-day partials first.
    "q146_ols_group" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(
        col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("x"),
        floor(col("value") * 100).cast("long").as("y"))
      val sums = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      val n = d(col("n"))
      val cov = d(col("sxy")) - d(col("sx")) * d(col("sy")) / n
      val varx = d(col("sxx")) - d(col("sx")) * d(col("sx")) / n
      val vary = d(col("syy")) - d(col("sy")) * d(col("sy")) / n
      // degenerate guards (match the oracle's CASE): a group whose x (or
      // y) never varies has varx = 0 — Spark would emit Infinity/NaN where
      // DuckDB emits NULL for x/0, silently breaking parity. NULL in both.
      val slope = when(varx =!= 0.0, cov / varx)
      sums.select(col("event_type"), col("n"),
        e6(slope).as("slope_e6"),
        e6((d(col("sy")) - slope * d(col("sx"))) / n).as("intercept_e6"),
        e6(when(varx =!= 0.0 && vary =!= 0.0, cov * cov / (varx * vary)))
          .as("r2_e6"))
    }),


    // First principal component by 3 power-method iterations over the
    // 4x4 covariance matrix of the lineitem measures — the Spark-first
    // counterpart of the reference's dynamic-factor extraction
    // (news-analytics runs it in Stata; the factor IS the first PC of the
    // standardized panel). The distributed part is the same one-pass
    // 14-sum aggregation as q147; the iteration is 16 scalar FMA chains
    // on that single row, deterministic across engines because every
    // operation and its order is identical (no normalization division
    // until the end: components are scaled by the vector's max-abs AFTER
    // the fixed iterations, then floored to e6).
    "q172_power_iteration" -> ((s, d0) => {
      val li = liMeasures(s, d0)
      val ms = 0 to 3
      val sumCols =
        Seq(count(lit(1)).as("n")) ++
          ms.map(i => sum(col(s"m$i")).as(s"s$i")) ++
          (for (i <- ms; j <- ms if i <= j)
            yield sum(col(s"m$i") * col(s"m$j")).as(s"p${i}${j}"))
      val agg = li.agg(sumCols.head, sumCols.tail: _*)
      val n = d(col("n"))
      // cov[i][j], j >= i stored once; scaled by 1/n (population form)
      def cv(i: Int, j: Int): Column = {
        val (a, b) = if (i <= j) (i, j) else (j, i)
        (d(col(s"p$a$b")) - d(col(s"s$a")) * d(col(s"s$b")) / n) / n
      }
      // v0 = [1,1,1,1]; three iterations of v <- C v, no renormalization
      // (values stay finite: 3 applications of a 4x4 matrix)
      var v: Seq[Column] = Seq.fill(4)(lit(1.0))
      for (_ <- 1 to 3)
        v = ms.map(i => ms.map(j => cv(i, j) * v(j)).reduce(_ + _))
      val maxAbs = v.map(abs).reduce((a, b) => greatest(a, b))
      val out = ms.map(i =>
        e6(when(maxAbs > 0.0, v(i) / maxAbs)).as(s"pc_$i"))
      agg.select(out: _*)
    }),


    // Lead–lag cross-correlation (CCF at lags −2..+2) between each
    // event_type's daily series and the all-type "market" daily series —
    // does a type lead the aggregate, follow it, or move with it? The
    // per-day values are trunc-div integer daily means (bounded ~1e5, so
    // n·Σx² stays far inside int64 even at sf1000); all five Pearson
    // moments are exact BIGINT sums and only the final r is one pinned
    // double chain floored to e6. Scale shape: two daily groupBys, a
    // 5-way lag explode of the SMALL per-type daily frame, one join on
    // the shifted day key, and a per-(type, lag) 5-sum aggregate —
    // everything keys on day or (type, lag), nothing global.
    "q319_lead_lag_ccf" -> ((s, d0) => {
      val base = t(s, d0, "events").select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100).cast("long").as("v_e2"))
      val daily = base.groupBy("event_type", "day")
        .agg(expr("sum(v_e2) div count(1)").as("y"))
      val market = base.groupBy("day")
        .agg(expr("sum(v_e2) div count(1)").as("x"))
        .select(col("day").as("mday"), col("x"))
      val st = daily
        .withColumn("lg", explode(array((-2 to 2).map(l => lit(l.toLong)): _*)))
        .join(market, col("mday") === col("day") + col("lg"))
        .groupBy("event_type", "lg")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      st.where(col("n") > 2 &&
          col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
          col("n") * col("syy") - col("sy") * col("sy") > 0)
        .select(col("event_type"), col("lg"), col("n"),
          floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))) *
            1e6).cast("long").as("ccf_e6"))
    }),


    // Page–Hinkley drift detector per daily series — the sequential
    // mean-shift test next to q208's CUSUM: at each step the deviation
    // from the RUNNING mean (minus a δ=50 e2-cents slack) accumulates,
    // and an alarm fires when the accumulator exceeds its running
    // minimum by λ=500. The running mean is a trunc integer division of
    // the prefix sum, so every step replays exactly in SQL. Scale
    // shape: four stacked windows sharing one (type, day) key+order —
    // a single shuffle, state linear in days per type.
    "q335_page_hinkley" -> ((s, d0) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      t(s, d0, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v_e2"))
        .groupBy("event_type", "day")
        .agg(expr("sum(v_e2) div count(1)").as("y"))
        .withColumn("t", count(lit(1)).over(w))
        .withColumn("cum", sum("y").over(w))
        .withColumn("dev", col("y") - expr("cum div t") - lit(50L))
        .withColumn("ph", sum("dev").over(w))
        .withColumn("mn", min("ph").over(w))
        .select(col("event_type"), col("day"), col("ph"),
          (col("ph") - col("mn")).as("excursion"),
          (col("ph") - col("mn") > 500L).as("alarm"))
    }),


    // Multiwindow SLO burn-rate alert (the SRE-book pattern): hourly
    // error rates (value > 150 ≈ p95 as the "bad" predicate) against a
    // 5% error budget, burn = rate/budget = rate×20, and the alert
    // fires only when BOTH the 6-hour and 24-hour burns exceed 2× —
    // the two-window AND that suppresses blips without missing slow
    // burns. RANGE-framed windows over the integer hour key handle
    // gapped hours exactly; everything is integer e6 arithmetic.
    // Scale shape: one hourly groupBy + two range windows on the same
    // (type, hour) key — a single shuffle.
    "q336_slo_burn" -> ((s, d0) => {
      def rw(h: Long) = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("hr").rangeBetween(-(h - 1), 0)
      val hourly = t(s, d0, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          when(col("value") > 150.0, 1L).otherwise(0L).as("bad"))
        .groupBy("event_type", "hr")
        .agg(count(lit(1)).as("n"), sum("bad").as("nbad"))
      hourly
        .withColumn("n6", sum("n").over(rw(6)))
        .withColumn("bad6", sum("nbad").over(rw(6)))
        .withColumn("n24", sum("n").over(rw(24)))
        .withColumn("bad24", sum("nbad").over(rw(24)))
        .select(col("event_type"), col("hr"), col("n6"), col("bad6"),
          col("n24"), col("bad24"),
          expr("(bad6 * 1000000 div n6) * 20").as("burn6_e6"),
          expr("(bad24 * 1000000 div n24) * 20").as("burn24_e6"),
          (expr("(bad6 * 1000000 div n6) * 20") > 2000000L &&
            expr("(bad24 * 1000000 div n24) * 20") > 2000000L).as("alarm"))
    }),


    // MASE (mean absolute SCALED error, Hyndman & Koehler 2006) of the
    // seasonal-naive forecast against the naive-1 scale, per daily
    // series — the scale-free accuracy metric q241's backtest should be
    // read through: both MAE numerators are exact integer |y−lag| sums
    // over one keyed window pass, and the ratio is one e6 integer
    // division. < 1e6 means weekly seasonality beats persistence.
    "q339_mase" -> ((s, d0) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      t(s, d0, "events")
        .select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v_e2"))
        .groupBy("event_type", "day")
        .agg(expr("sum(v_e2) div count(1)").as("y"))
        .withColumn("l1", lag("y", 1).over(w))
        .withColumn("l7", lag("y", 7).over(w))
        .where(col("l7").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(abs(col("y") - col("l1"))).as("mae1_num"),
          sum(abs(col("y") - col("l7"))).as("mae7_num"))
        .where(col("mae1_num") > 0)
        .select(col("event_type"), col("n"), col("mae1_num"),
          col("mae7_num"),
          expr("(mae7_num * 1000000) div mae1_num").as("mase_e6"))
    }),

    // Maximum drawdown per series — the peak-to-trough loss statistic a
    // monitoring/finance readout wants from a cumulative value path.
    // Engine mechanism exercised (the round-10 model): ONE keyed
    // PrefixScan computing BOTH the running sum (the path) and its
    // running max (the peak) — "maxsum" is the associative pair monoid
    // (total, maxPrefix), so the peak stitches across partitions like
    // any scalar op and the whole statistic costs a single range-sort.
    // A window form would funnel each event_type's whole history
    // through one task. dd = peak − cum is exact centi-units throughout.
    "q543_max_drawdown" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("event_type"), col("ts"),
        col("event_id"),
        (floor(col("value") * 100).cast("long") - 10000L).as("v"))
      graft.operators.PrefixScan.scanLongKeyed(ev, Seq("event_type"),
          Seq(graft.operators.PrefixScan.KeyedScanCol("cum", "v", "sum"),
            graft.operators.PrefixScan.KeyedScanCol("peak", "v", "maxsum")),
          asc("ts"), asc("event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max(col("peak") - col("cum")).as("max_drawdown_e2"),
          max("peak").as("peak_e2"))
    }),

    // Running-record counts per series on the RAW event stream (strict
    // new maxima; first observation counts) — Glick (1978) record
    // statistics: for an i.i.d. series the expected record count is
    // H(n) ≈ ln n, so a materially higher count flags drift, a lower one
    // flags saturation. The q488 twin runs on the bounded daily frame;
    // this one proves the raw-row shape: the "max so far" is the keyed
    // PrefixScan's EXCLUSIVE max (identity MinValue on each series'
    // first row, so v > premax marks it a record with no special case).
    "q544_record_highs" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("event_type"), col("ts"),
        col("event_id"), floor(col("value") * 100).cast("long").as("v"))
      graft.operators.PrefixScan.scanLongKeyed(ev, Seq("event_type"),
          Seq(graft.operators.PrefixScan.KeyedScanCol(
            "premax", "v", "max", inclusive = false)),
          asc("ts"), asc("event_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") > col("premax"), 1L).otherwise(0L))
            .as("n_records"),
          max("v").as("max_v_e2"))
    }),

    // Burst (gaps-and-islands) segmentation per series on the RAW event
    // stream: a new burst starts where the inter-arrival gap exceeds 1 h;
    // report per-type burst counts, the largest burst, and the longest
    // burst duration. The q66 sessionize twin for LOW-cardinality keys:
    // user-keyed sessionization parallelizes by its key, but event_type
    // has ~10 values, so here the island id comes from the keyed
    // PrefixScan's "islands" SEGMENT monoid ((first, last, count);
    // adjacent segments merge when the boundary gap ≤ 1 h) — ONE
    // range-sorted pass instead of the lag-then-cumsum pair, no
    // #type-task window. The (type, island) aggregate afterwards is
    // high-cardinality and shuffles normally.
    "q545_burst_islands" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("event_type"),
        expr("unix_micros(ts)").as("tm"), col("event_id"))
      graft.operators.PrefixScan.scanLongKeyed(ev, Seq("event_type"),
          Seq(graft.operators.PrefixScan.KeyedScanCol(
            "island", "tm", "islands", param = 3600000000L)),
          asc("tm"), asc("event_id"))
        .groupBy("event_type", "island")
        .agg(count(lit(1)).as("sz"), (max("tm") - min("tm")).as("dur_us"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_bursts"), max("sz").as("max_burst_sz"),
          expr("max(dur_us) div 1000000").as("max_burst_s"),
          sum("sz").as("n"))
    }),

  )

  val oracles: Map[String, String] = Map(

    "q527_weekend_effect" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         we AS (
           SELECT y, CAST(CASE WHEN (day + 4) % 7 >= 5 THEN 1 ELSE 0 END
             AS BIGINT) AS we
           FROM dm),
         ag AS (
           SELECT
             CAST(sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_we,
             CAST(sum(CASE WHEN we = 1 THEN y ELSE 0 END) AS BIGINT)
               AS s_we,
             CAST(sum(CASE WHEN we = 1 THEN y * y ELSE 0 END) AS BIGINT)
               AS ss_we,
             CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wd,
             CAST(sum(CASE WHEN we = 0 THEN y ELSE 0 END) AS BIGINT)
               AS s_wd,
             CAST(sum(CASE WHEN we = 0 THEN y * y ELSE 0 END) AS BIGINT)
               AS ss_wd,
             CAST(quantile_cont(CASE WHEN we = 1 THEN y END, 0.5) * 2
               AS BIGINT) AS med2_we,
             CAST(quantile_cont(CASE WHEN we = 0 THEN y END, 0.5) * 2
               AS BIGINT) AS med2_wd
           FROM we),
         ch AS (
           SELECT *,
             CAST(s_we AS DOUBLE) / CAST(n_we AS DOUBLE) AS m1,
             CAST(s_wd AS DOUBLE) / CAST(n_wd AS DOUBLE) AS m0,
             (CAST(ss_we AS DOUBLE) - CAST(s_we AS DOUBLE)
               * CAST(s_we AS DOUBLE) / CAST(n_we AS DOUBLE))
               / (CAST(n_we AS DOUBLE) - 1.0) AS v1,
             (CAST(ss_wd AS DOUBLE) - CAST(s_wd AS DOUBLE)
               * CAST(s_wd AS DOUBLE) / CAST(n_wd AS DOUBLE))
               / (CAST(n_wd AS DOUBLE) - 1.0) AS v0
           FROM ag)
         SELECT n_we, n_wd,
           CAST(floor((m1 - m0) * 100.0) AS BIGINT) AS mean_diff_e2,
           CASE WHEN v1 / CAST(n_we AS DOUBLE)
               + v0 / CAST(n_wd AS DOUBLE) > 0.0
             THEN CAST(floor((m1 - m0) / sqrt(v1 / CAST(n_we AS DOUBLE)
               + v0 / CAST(n_wd AS DOUBLE)) * 1000000.0) AS BIGINT)
             ELSE 0 END AS welch_z_e6,
           med2_we - med2_wd AS median_diff2
         FROM ch""",


    "q506_pacf" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         tot AS (
           SELECT count(*) AS nd, CAST(sum(y) AS BIGINT) AS sy FROM dm),
         c AS (SELECT day, y * nd - sy AS c FROM dm, tot),
         den AS (
           SELECT CAST(sum(c * c) AS BIGINT) AS scc, count(*) AS n_days
           FROM c),
         lagged AS (
           SELECT k, CAST(sum(c.c * l.cp) AS BIGINT) AS sck
           FROM (SELECT CAST(k0 AS BIGINT) AS k, day + k0 AS day, c AS cp
                 FROM c, (SELECT unnest(range(1, 4)) AS k0)) l
           JOIN c USING (day)
           GROUP BY k),
         r AS (
           SELECT n_days,
             max(CASE WHEN k = 1 THEN rho END) AS r1,
             max(CASE WHEN k = 2 THEN rho END) AS r2,
             max(CASE WHEN k = 3 THEN rho END) AS r3
           FROM (SELECT k, CAST(sck AS DOUBLE) / CAST(scc AS DOUBLE)
                   AS rho, n_days
                 FROM lagged, den)
           GROUP BY 1),
         p AS (
           SELECT *, (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22 FROM r),
         p2 AS (SELECT *, r1 - p22 * r1 AS p21 FROM p),
         p3 AS (
           SELECT *, (r3 - p21 * r2 - p22 * r1)
             / (1.0 - p21 * r1 - p22 * r2) AS p33
           FROM p2)
         SELECT n_days,
           CAST(floor(r1 * 1000000.0) AS BIGINT) AS pacf1_e6,
           CAST(floor(p22 * 1000000.0) AS BIGINT) AS pacf2_e6,
           CAST(floor(p33 * 1000000.0) AS BIGINT) AS pacf3_e6
         FROM p3""",


    "q501_sen_slope_ci" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         sl AS (
           SELECT a.day AS d1, b.day AS d2,
             (b.y - a.y) * 1000000 // (b.day - a.day) AS s_e6
           FROM dm a JOIN dm b ON a.day < b.day),
         rk AS (
           SELECT s_e6,
             CAST(row_number() OVER (ORDER BY s_e6, d1, d2) AS BIGINT)
               AS r
           FROM sl),
         ties AS (
           SELECT CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT)
               AS tie_term,
             CAST(sum(tg) AS BIGINT) AS n_days
           FROM (SELECT y, count(*) AS tg FROM dm GROUP BY 1)),
         vs AS (
           SELECT (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)
             * (2.0 * CAST(n_days AS DOUBLE) + 5.0)
             - CAST(tie_term AS DOUBLE)) / 18.0 AS vs
           FROM ties),
         bounds AS (
           SELECT m,
             greatest(1, CAST(floor((CAST(m AS DOUBLE)
               - 1.959964 * sqrt(vs)) / 2.0) AS BIGINT)) AS lo_rank,
             least(m, CAST(ceil((CAST(m AS DOUBLE)
               + 1.959964 * sqrt(vs)) / 2.0 + 1.0) AS BIGINT)) AS hi_rank,
             (m + 1) // 2 AS med_rank
           FROM (SELECT count(*) AS m FROM sl), vs)
         SELECT m AS m_pairs, lo_rank, hi_rank,
           min(CASE WHEN r = lo_rank THEN s_e6 END) AS slope_lo_e6,
           min(CASE WHEN r = med_rank THEN s_e6 END) AS slope_med_e6,
           min(CASE WHEN r = hi_rank THEN s_e6 END) AS slope_hi_e6
         FROM rk, bounds
         WHERE r = lo_rank OR r = hi_rank OR r = med_rank
         GROUP BY 1, 2, 3, med_rank""",


    "q502_interrupted_ts" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         br AS (
           SELECT (min(day) + max(day)) // 2 AS b, min(day) AS d0
           FROM dm),
         pre AS (
           SELECT count(*) AS n_pre, CAST(sum(tt) AS BIGINT) AS st_pre,
             CAST(sum(y) AS BIGINT) AS sy_pre,
             CAST(sum(tt * y) AS BIGINT) AS sty_pre,
             CAST(sum(tt * tt) AS BIGINT) AS stt_pre
           FROM (SELECT day - d0 AS tt, y FROM dm, br WHERE day < b)),
         post AS (
           SELECT count(*) AS n_post, CAST(sum(tt) AS BIGINT) AS st_post,
             CAST(sum(y) AS BIGINT) AS sy_post,
             CAST(sum(tt * y) AS BIGINT) AS sty_post,
             CAST(sum(tt * tt) AS BIGINT) AS stt_post
           FROM (SELECT day - d0 AS tt, y FROM dm, br WHERE day >= b)),
         ch AS (
           SELECT *,
             (CAST(n_pre AS DOUBLE) * CAST(sty_pre AS DOUBLE)
               - CAST(st_pre AS DOUBLE) * CAST(sy_pre AS DOUBLE))
               / (CAST(n_pre AS DOUBLE) * CAST(stt_pre AS DOUBLE)
                 - CAST(st_pre AS DOUBLE) * CAST(st_pre AS DOUBLE))
               AS b_pre,
             (CAST(n_post AS DOUBLE) * CAST(sty_post AS DOUBLE)
               - CAST(st_post AS DOUBLE) * CAST(sy_post AS DOUBLE))
               / (CAST(n_post AS DOUBLE) * CAST(stt_post AS DOUBLE)
                 - CAST(st_post AS DOUBLE) * CAST(st_post AS DOUBLE))
               AS b_post
           FROM pre, post),
         ch2 AS (
           SELECT *,
             (CAST(sy_pre AS DOUBLE) - b_pre * CAST(st_pre AS DOUBLE))
               / CAST(n_pre AS DOUBLE) AS a_pre,
             (CAST(sy_post AS DOUBLE) - b_post * CAST(st_post AS DOUBLE))
               / CAST(n_post AS DOUBLE) AS a_post
           FROM ch),
         ch3 AS (
           SELECT *, CAST(b AS DOUBLE) - CAST(d0 AS DOUBLE) AS tb, b
           FROM ch2, br)
         SELECT b AS break_day, n_pre, n_post,
           CAST(floor(b_pre * 1000000.0) AS BIGINT) AS slope_pre_e6,
           CAST(floor(b_post * 1000000.0) AS BIGINT) AS slope_post_e6,
           CAST(floor(((a_post + b_post * tb) - (a_pre + b_pre * tb))
             * 1000000.0) AS BIGINT) AS level_shift_e6
         FROM ch3""",


    "q492_turning_points" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         tri AS (
           SELECT count(*) AS n_interior,
             CAST(sum(CASE WHEN (b.yb > a.y AND b.yb > c.yc)
               OR (b.yb < a.y AND b.yb < c.yc) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_turns
           FROM dm a
           JOIN (SELECT day - 1 AS day, y AS yb FROM dm) b USING (day)
           JOIN (SELECT day - 2 AS day, y AS yc FROM dm) c USING (day)
           WHERE b.yb <> a.y AND c.yc <> b.yb),
         nd AS (SELECT count(*) AS n_days FROM dm),
         ch AS (
           SELECT *, 2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0 AS mu,
             (16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0 AS s2
           FROM nd, tri)
         SELECT n_days, n_interior, n_turns,
           CAST(floor(mu * 1000000.0) AS BIGINT) AS expected_e6,
           CASE WHEN s2 > 0.0
             THEN CAST(floor((CAST(n_turns AS DOUBLE) - mu) / sqrt(s2)
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM ch""",


    "q494_pettitt" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         r AS (
           SELECT a.day,
             CAST(sum(CASE WHEN a.y > b.y THEN 1
               WHEN a.y < b.y THEN -1 ELSE 0 END) AS BIGINT) AS r_i
           FROM dm a JOIN dm b ON a.day <> b.day GROUP BY 1),
         u AS (
           SELECT day,
             0 - CAST(sum(r_i) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS u_t
           FROM r),
         best AS (
           SELECT day, abs(u_t) AS au
           FROM u ORDER BY au DESC, day LIMIT 1)
         SELECT (SELECT count(*) FROM dm) AS n_days, au AS k_stat,
           day AS split_day
         FROM best""",


    "q487_mann_kendall" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         pairs AS (
           SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
             WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_mk
           FROM dm a JOIN dm b ON a.day < b.day),
         ties AS (
           SELECT CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT)
               AS tie_term,
             CAST(sum(tg) AS BIGINT) AS n_days
           FROM (SELECT y, count(*) AS tg FROM dm GROUP BY 1)),
         ch AS (
           SELECT *,
             (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)
               * (2.0 * CAST(n_days AS DOUBLE) + 5.0)
               - CAST(tie_term AS DOUBLE)) / 18.0 AS var_s
           FROM pairs, ties)
         SELECT n_days, s_mk,
           CAST(floor(var_s) AS BIGINT) AS var_s_floor,
           CASE WHEN var_s > 0.0
             THEN CAST(floor((CAST(s_mk AS DOUBLE)
               - (CASE WHEN s_mk > 0 THEN 1.0 WHEN s_mk < 0 THEN -1.0
                  ELSE 0.0 END)) / sqrt(var_s) * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM ch""",


    "q488_record_counts" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         sc AS (
           SELECT day, y,
             COALESCE(min(0 - y) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               9223372036854775807) AS prevmin
           FROM dm),
         rec AS (
           SELECT count(*) AS n_days,
             CAST(sum(CASE WHEN y > 0 - prevmin THEN 1 ELSE 0 END)
               AS BIGINT) AS n_records
           FROM sc),
         harm AS (
           SELECT n_days, n_records,
             CAST(sum(1000000000 // i) AS BIGINT) AS h_e9,
             CAST(sum(1000000000 // i - 1000000000 // (i * i)) AS BIGINT)
               AS v_e9
           FROM rec, (SELECT CAST(unnest(range(1, 100000)) AS BIGINT) AS i)
           WHERE i <= n_days GROUP BY 1, 2)
         SELECT n_days, n_records, h_e9 // 1000 AS expected_e6,
           CASE WHEN v_e9 > 0
             THEN CAST(floor((CAST(n_records AS DOUBLE)
               - CAST(h_e9 AS DOUBLE) / 1000000000.0)
               / sqrt(CAST(v_e9 AS DOUBLE) / 1000000000.0)
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM harm""",


    "q463_durbin_watson" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         base AS (
           SELECT day - (SELECT min(day) FROM dm) AS tt, y FROM dm),
         sums AS (
           SELECT count(*) AS n, CAST(sum(tt) AS BIGINT) AS st,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(tt * y) AS BIGINT) AS sty,
             CAST(sum(tt * tt) AS BIGINT) AS stt
           FROM base),
         co AS (
           SELECT *,
             (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
           FROM sums),
         co2 AS (
           SELECT *,
             (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
           FROM co),
         resid AS (
           SELECT tt,
             CAST(floor((CAST(y AS DOUBLE)
               - (a + b * CAST(tt AS DOUBLE))) * 100.0) AS BIGINT) AS r_e2
           FROM base, co2),
         nm AS (
           SELECT CAST(sum((c.r_e2 - p.rp) * (c.r_e2 - p.rp)) AS BIGINT)
             AS num
           FROM resid c JOIN (SELECT tt + 1 AS tt, r_e2 AS rp FROM resid) p
             USING (tt)),
         dn AS (
           SELECT count(*) AS n_days,
             CAST(sum(r_e2 * r_e2) AS BIGINT) AS den
           FROM resid)
         SELECT n_days, num, den,
           CASE WHEN den > 0 THEN num * 1000000 // den ELSE 0 END AS dw_e6
         FROM dn, nm""",


    "q456_ljung_box" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         tot AS (
           SELECT count(*) AS nd, CAST(sum(y) AS BIGINT) AS sy FROM dm),
         c AS (
           SELECT day, y * nd - sy AS c, nd FROM dm, tot),
         den AS (
           SELECT CAST(sum(c * c) AS BIGINT) AS scc, max(nd) AS n FROM c),
         lagged AS (
           SELECT k, CAST(sum(c.c * l.cp) AS BIGINT) AS sck
           FROM (SELECT CAST(k0 AS BIGINT) AS k, day + k0 AS day, c AS cp
                 FROM c, (SELECT unnest(range(1, 6)) AS k0)) l
           JOIN c USING (day)
           GROUP BY k),
         terms AS (
           SELECT k, n,
             (CAST(sck AS DOUBLE) / CAST(scc AS DOUBLE))
               * (CAST(sck AS DOUBLE) / CAST(scc AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS term
           FROM lagged, den),
         ag AS (
           SELECT max(n) AS n_days,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(term ORDER BY k)), (acc, x) -> acc + x) AS sfold
           FROM terms)
         SELECT n_days,
           CAST(floor(CAST(n_days AS DOUBLE)
             * (CAST(n_days AS DOUBLE) + 2.0) * sfold * 1000000.0)
             AS BIGINT) AS q_e6
         FROM ag""",


    "q457_runs_test" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         dif AS (
           SELECT a.day,
             CAST(CASE WHEN a.y - b.yp > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS sg
           FROM dm a JOIN (SELECT day + 1 AS day, y AS yp FROM dm) b
             USING (day)
           WHERE a.y - b.yp <> 0),
         rk AS (
           SELECT sg,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS r
           FROM dif),
         ch AS (
           SELECT CAST(sum(CASE WHEN a.sg <> b.sgp THEN 1 ELSE 0 END)
             AS BIGINT) AS ch
           FROM rk a JOIN (SELECT r + 1 AS r, sg AS sgp FROM rk) b
             USING (r)),
         ag AS (
           SELECT count(*) AS n, CAST(sum(sg) AS BIGINT) AS n_pos FROM rk),
         j AS (
           SELECT n, n_pos, n - n_pos AS n_neg, ch + 1 AS runs FROM ag, ch),
         k AS (
           SELECT *,
             2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
               / CAST(n AS DOUBLE) + 1.0 AS mu,
             (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
               * (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)
                 - CAST(n AS DOUBLE)))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 * (CAST(n AS DOUBLE) - 1.0)) AS s2
           FROM j)
         SELECT n, n_pos, n_neg, runs,
           CAST(floor(mu * 1000000.0) AS BIGINT) AS mu_e6,
           CASE WHEN s2 > 0.0
             THEN CAST(floor((CAST(runs AS DOUBLE) - mu) / sqrt(s2)
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM k""",


    "q458_permutation_entropy" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS y
           FROM events),
         dm AS (
           SELECT day, CAST(sum(y) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         tri AS (
           SELECT
             CAST(CASE WHEN a.y <= b.yb THEN 4 ELSE 0 END
               + CASE WHEN b.yb <= c.yc THEN 2 ELSE 0 END
               + CASE WHEN a.y <= c.yc THEN 1 ELSE 0 END AS BIGINT) AS pid
           FROM dm a
           JOIN (SELECT day - 1 AS day, y AS yb FROM dm) b USING (day)
           JOIN (SELECT day - 2 AS day, y AS yc FROM dm) c USING (day)),
         pc AS (SELECT pid, count(*) AS cnt FROM tri GROUP BY 1),
         nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_triples FROM pc),
         ag AS (
           SELECT
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-(CAST(cnt AS DOUBLE)
                 / CAST(n_triples AS DOUBLE))
                 * ln(CAST(cnt AS DOUBLE) / CAST(n_triples AS DOUBLE))
                 ORDER BY pid)), (acc, x) -> acc + x) AS h
           FROM pc, nt),
         tp AS (
           SELECT pid AS top_pattern FROM pc ORDER BY cnt DESC, pid LIMIT 1)
         SELECT n_triples, top_pattern,
           CAST(floor(h * 1000000.0) AS BIGINT) AS h_e6,
           CAST(floor(h / ln(6.0) * 1000000.0) AS BIGINT) AS pe_norm_e6
         FROM ag, tp, nt""",


    "q455_variance_ratio" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         d1 AS (
           SELECT a.y - b.yp AS dv
           FROM dm a JOIN (SELECT day + 1 AS day, y AS yp FROM dm) b
             USING (day)),
         d5 AS (
           SELECT a.y - b.yp AS dv
           FROM dm a JOIN (SELECT day + 5 AS day, y AS yp FROM dm) b
             USING (day)),
         a1 AS (
           SELECT count(*) AS n1, CAST(sum(dv) AS BIGINT) AS sd1,
             CAST(sum(dv * dv) AS BIGINT) AS sdd1
           FROM d1),
         a5 AS (
           SELECT count(*) AS n5, CAST(sum(dv) AS BIGINT) AS sd5,
             CAST(sum(dv * dv) AS BIGINT) AS sdd5
           FROM d5),
         ch AS (
           SELECT *,
             (CAST(sdd1 AS DOUBLE) - CAST(sd1 AS DOUBLE)
               * CAST(sd1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
             (CAST(sdd5 AS DOUBLE) - CAST(sd5 AS DOUBLE)
               * CAST(sd5 AS DOUBLE) / CAST(n5 AS DOUBLE))
               / (CAST(n5 AS DOUBLE) - 1.0) AS v5
           FROM a1, a5),
         ch2 AS (SELECT *, v5 / (5.0 * v1) AS vr FROM ch)
         SELECT n1, n5,
           CAST(floor(vr * 1000000.0) AS BIGINT) AS vr_e6,
           CASE WHEN v1 > 0.0 AND n1 > 0
             THEN CAST(floor((vr - 1.0)
               / sqrt(2.0 * 9.0 * 4.0 / (15.0 * CAST(n1 AS DOUBLE)))
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM ch2""",


    "q451_log_rank" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         md AS (SELECT max(day) AS max_day FROM ev),
         users AS (
           SELECT
             CAST(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS c1,
             max(day) - min(day) + 1 AS lt,
             CAST(CASE WHEN max(day) = (SELECT max_day FROM md)
               THEN 1 ELSE 0 END AS BIGINT) AS censored
           FROM ev GROUP BY user_id),
         la AS (
           SELECT lt, count(*) AS n1_at,
             CAST(sum(1 - censored) AS BIGINT) AS d1
           FROM users WHERE c1 = 1 GROUP BY 1),
         lb AS (
           SELECT lt, count(*) AS n2_at,
             CAST(sum(1 - censored) AS BIGINT) AS d2
           FROM users WHERE c1 = 0 GROUP BY 1),
         joint AS (
           SELECT COALESCE(la.lt, lb.lt) AS lt,
             COALESCE(n1_at, 0) AS n1_at, COALESCE(d1, 0) AS d1,
             COALESCE(n2_at, 0) AS n2_at, COALESCE(d2, 0) AS d2
           FROM la FULL JOIN lb ON la.lt = lb.lt),
         tots AS (
           SELECT CAST(sum(n1_at) AS BIGINT) AS nt1,
             CAST(sum(n2_at) AS BIGINT) AS nt2
           FROM joint),
         rs AS (
           SELECT lt, d1, d2,
             nt1 - CAST(COALESCE(sum(n1_at) OVER (ORDER BY lt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1,
             nt2 - CAST(COALESCE(sum(n2_at) OVER (ORDER BY lt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n2
           FROM joint, tots),
         k AS (SELECT *, d1 + d2 AS dt, n1 + n2 AS nt FROM rs),
         m AS (
           SELECT *,
             (dt * 1000000 // nt) * n1 AS e1_e6,
             (((dt * 1000000 // nt) * n1 // nt) * n2
               // greatest(nt - 1, 1)) * (nt - dt) AS v_e6
           FROM k WHERE dt > 0 AND nt > 1),
         ag AS (
           SELECT CAST(sum(d1) AS BIGINT) AS deaths1,
             CAST(sum(d1 * 1000000 - e1_e6) AS BIGINT) AS sum_oe_e6,
             CAST(sum(v_e6) AS BIGINT) AS sum_v_e6
           FROM m)
         SELECT deaths1, sum_oe_e6, sum_v_e6,
           CASE WHEN sum_v_e6 > 0
             THEN CAST(floor(CAST(sum_oe_e6 AS DOUBLE)
               * CAST(sum_oe_e6 AS DOUBLE)
               / CAST(sum_v_e6 AS DOUBLE)) AS BIGINT)
             ELSE 0 END AS chi2_e6
         FROM ag""",


    "q414_kaplan_meier" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         md AS (SELECT max(day) AS max_day FROM ev),
         users AS (
           SELECT max(day) - min(day) + 1 AS lt,
             CAST(CASE WHEN max(day) = (SELECT max_day FROM md)
               THEN 1 ELSE 0 END AS BIGINT) AS censored
           FROM ev GROUP BY user_id),
         lts AS (
           SELECT lt, count(*) AS n_at,
             CAST(sum(1 - censored) AS BIGINT) AS d_events
           FROM users GROUP BY 1),
         tot AS (SELECT CAST(sum(n_at) AS BIGINT) AS n_total FROM lts),
         risk AS (
           SELECT lt, n_at, d_events,
             n_total - coalesce(CAST(sum(n_at) OVER (ORDER BY lt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS n_risk
           FROM lts, tot),
         st AS (
           SELECT list(struct_pack(lt := lt, n_risk := n_risk,
             d_events := d_events) ORDER BY lt) AS steps
           FROM risk),
         ix AS (
           SELECT unnest(generate_series(1, len(steps))) AS i, steps
           FROM st)
         SELECT steps[i].lt AS lt, steps[i].n_risk AS n_risk,
           steps[i].d_events AS d_events,
           list_reduce(list_prepend(struct_pack(
               lt := CAST(1000000 AS BIGINT),
               n_risk := CAST(0 AS BIGINT),
               d_events := CAST(0 AS BIGINT)), steps[1:i]),
             (acc, x) -> struct_pack(
               lt := acc.lt * (x.n_risk - x.d_events)
                 // greatest(x.n_risk, 1),
               n_risk := x.n_risk,
               d_events := x.d_events)).lt AS s_e6
         FROM ix""",


    "q413_cusum" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v_e2
           FROM events),
         dm AS (
           SELECT event_type, day,
             CAST(sum(v_e2) AS BIGINT) // count(*) AS x_e2
           FROM daily GROUP BY 1, 2),
         mu AS (
           SELECT event_type,
             CAST(sum(x_e2) AS BIGINT) // count(*) AS mu_e2
           FROM dm GROUP BY 1),
         j AS (
           SELECT d.event_type, d.day, d.x_e2, m.mu_e2,
             d.x_e2 - m.mu_e2 - m.mu_e2 // 20 AS dev_e2
           FROM dm d JOIN mu m USING (event_type)),
         c AS (
           SELECT *, CAST(sum(dev_e2) OVER (PARTITION BY event_type
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS p_e2
           FROM j),
         c2 AS (
           SELECT *, CAST(min(least(p_e2, 0)) OVER (PARTITION BY event_type
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS minp_e2
           FROM c)
         SELECT event_type, day, x_e2, mu_e2,
           p_e2 - minp_e2 AS s_e2,
           p_e2 - minp_e2 > mu_e2 // 10 AS alarm
         FROM c2""",


    "q409_theil_sen" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         slopes AS (
           SELECT a.event_type,
             (b.y - a.y) * 1000000000 // (b.day - a.day) AS slope_e9
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND b.day > a.day),
         ranked AS (
           SELECT event_type, slope_e9,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY slope_e9) AS BIGINT) AS rnk,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
           FROM slopes),
         nd AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1)
         SELECT r.event_type, n.n_days, r.np AS n_pairs,
           r.slope_e9 AS ts_slope_e9
         FROM ranked r JOIN nd n ON r.event_type = n.event_type
         WHERE r.rnk = (r.np + 1) // 2""",

    "q319_lead_lag_ccf" ->
      """WITH base AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v_e2
           FROM events),
         daily AS (
           SELECT event_type, day,
             CAST(sum(v_e2) AS BIGINT) // count(*) AS y
           FROM base GROUP BY 1, 2),
         market AS (
           SELECT day AS mday,
             CAST(sum(v_e2) AS BIGINT) // count(*) AS x
           FROM base GROUP BY 1),
         lagged AS (
           SELECT d.event_type, l.lg, d.y, m.x
           FROM daily d
           CROSS JOIN (SELECT CAST(unnest([-2, -1, 0, 1, 2]) AS BIGINT) AS lg) l
           JOIN market m ON m.mday = d.day + l.lg),
         st AS (
           SELECT event_type, lg, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
           FROM lagged GROUP BY 1, 2)
         SELECT event_type, lg, n,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             * 1000000.0) AS BIGINT) AS ccf_e6
         FROM st
         WHERE n > 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""",


    "q335_page_hinkley" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS y
           FROM events GROUP BY 1, 2),
         acc AS (
           SELECT event_type, day, y,
             count(*) OVER w AS t,
             CAST(sum(y) OVER w AS BIGINT) AS cum
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING)),
         dev AS (
           SELECT event_type, day, y - cum // t - 50 AS dev
           FROM acc),
         ph AS (
           SELECT event_type, day,
             CAST(sum(dev) OVER w AS BIGINT) AS ph
           FROM dev
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING)),
         mn AS (
           SELECT event_type, day, ph,
             min(ph) OVER w AS mn
           FROM ph
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS UNBOUNDED PRECEDING))
         SELECT event_type, day, ph, ph - mn AS excursion,
           ph - mn > 500 AS alarm
         FROM mn""",


    "q336_slo_burn" ->
      """WITH hourly AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             count(*) AS n,
             CAST(sum(CASE WHEN value > 150.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS nbad
           FROM events GROUP BY 1, 2),
         win AS (
           SELECT event_type, hr,
             CAST(sum(n) OVER w6 AS BIGINT) AS n6,
             CAST(sum(nbad) OVER w6 AS BIGINT) AS bad6,
             CAST(sum(n) OVER w24 AS BIGINT) AS n24,
             CAST(sum(nbad) OVER w24 AS BIGINT) AS bad24
           FROM hourly
           WINDOW
             w6 AS (PARTITION BY event_type ORDER BY hr
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
             w24 AS (PARTITION BY event_type ORDER BY hr
               RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
         SELECT event_type, hr, n6, bad6, n24, bad24,
           (bad6 * 1000000 // n6) * 20 AS burn6_e6,
           (bad24 * 1000000 // n24) * 20 AS burn24_e6,
           (bad6 * 1000000 // n6) * 20 > 2000000
             AND (bad24 * 1000000 // n24) * 20 > 2000000 AS alarm
         FROM win""",


    "q339_mase" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS y
           FROM events GROUP BY 1, 2),
         lg AS (
           SELECT event_type, day, y,
             lag(y, 1) OVER w AS l1,
             lag(y, 7) OVER w AS l7
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         st AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(abs(y - l1)) AS BIGINT) AS mae1_num,
             CAST(sum(abs(y - l7)) AS BIGINT) AS mae7_num
           FROM lg WHERE l7 IS NOT NULL GROUP BY 1)
         SELECT event_type, n, mae1_num, mae7_num,
           (mae7_num * 1000000) // mae1_num AS mase_e6
         FROM st WHERE mae1_num > 0""",

    "q265_theil_sen" ->
      """WITH daily AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS x,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         slopes AS (
           SELECT a.event_type,
             (b.y - a.y) * 1000000 // (b.x - a.x) AS slope_e6
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.x < b.x),
         r AS (
           SELECT event_type, slope_e6,
             row_number() OVER (PARTITION BY event_type
               ORDER BY slope_e6) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
           FROM slopes)
         SELECT event_type, cnt AS n_pairs, slope_e6 AS med_slope_e6
         FROM r WHERE rn = (cnt + 1) // 2""",

    "q260_kaplan_meier" ->
      """WITH o AS (
           SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
           FROM orders),
         f AS (SELECT o_custkey, min(day) AS d1 FROM o GROUP BY 1),
         s2 AS (
           SELECT o.o_custkey, min(day) AS d2
           FROM o JOIN f USING (o_custkey) WHERE day > d1 GROUP BY 1),
         mx AS (SELECT max(day) AS dmax FROM o),
         subj AS (
           SELECT c.c_mktsegment AS segment,
             CASE WHEN s2.d2 IS NOT NULL THEN s2.d2 - f.d1
                  ELSE mx.dmax - f.d1 END AS t,
             s2.d2 IS NOT NULL AS event
           FROM f LEFT JOIN s2 USING (o_custkey)
           JOIN customer c ON c.c_custkey = f.o_custkey, mx),
         cells AS (
           SELECT segment, t,
             CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS n_event,
             CAST(sum(CASE WHEN event THEN 0 ELSE 1 END) AS BIGINT) AS n_censor
           FROM subj GROUP BY 1, 2),
         risk AS (
           SELECT segment, t, n_event, n_censor,
             CAST(sum(n_event + n_censor) OVER (PARTITION BY segment)
               - coalesce(sum(n_event + n_censor) OVER (PARTITION BY segment
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS n_risk
           FROM cells),
         seqs AS (
           SELECT segment,
             list({'t': t, 'n_event': n_event, 'n_censor': n_censor,
                   'n_risk': n_risk} ORDER BY t) AS arr
           FROM risk GROUP BY 1),
         ex AS (
           SELECT segment, arr, unnest(arr) AS x,
             generate_subscripts(arr, 1) AS i
           FROM seqs)
         SELECT segment, x.t AS t, x.n_risk AS n_risk, x.n_event AS n_event,
           x.n_censor AS n_censor,
           CAST(floor(list_reduce(
             list_prepend(CAST(1.0 AS DOUBLE),
               list_transform(arr[1:i],
                 y -> (CAST(y.n_risk AS DOUBLE) - CAST(y.n_event AS DOUBLE))
                   / CAST(y.n_risk AS DOUBLE))),
             (a, b) -> a * b) * 1000000000.0) AS BIGINT) AS s_e9
         FROM ex""",

    "q146_ols_group" ->
      """WITH ev AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS x,
             CAST(floor(value * 100) AS BIGINT) AS y
           FROM events),
         sums AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy,
             CAST(sum(y*y) AS BIGINT) AS syy
           FROM ev GROUP BY 1),
         der AS (
           SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS cov,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS varx,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS vary
           FROM sums)
         SELECT event_type, n,
           CAST(floor(CASE WHEN varx <> 0 THEN cov / varx END * 1000000.0) AS BIGINT) AS slope_e6,
           CAST(floor((syd - CASE WHEN varx <> 0 THEN cov / varx END * sxd) / nd * 1000000.0) AS BIGINT) AS intercept_e6,
           CAST(floor(CASE WHEN varx <> 0 AND vary <> 0
             THEN cov * cov / (varx * vary) END * 1000000.0) AS BIGINT) AS r2_e6
         FROM der""",

    "q172_power_iteration" -> {
      // cov entries named once in a CTE; each iteration CTE applies the
      // matrix with the SAME ((t0+t1)+t2)+t3 association the Spark
      // reduce(_ + _) produces, so every intermediate double is identical.
      val ms = 0 to 3
      def cvSql(i: Int, j: Int): String = {
        val (a, b) = if (i <= j) (i, j) else (j, i)
        s"((CAST(p$a$b AS DOUBLE) - CAST(s$a AS DOUBLE)*CAST(s$b AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"
      }
      val covCols = (for (i <- ms; j <- ms if i <= j)
        yield s"${cvSql(i, j)} AS c$i$j").mkString(",\n             ")
      def cRef(i: Int, j: Int): String = {
        val (a, b) = if (i <= j) (i, j) else (j, i); s"c$a$b"
      }
      def iter(prev: String, out: String): String = {
        val comps = ms.map { i =>
          ms.map(j => s"(${cRef(i, j)} * $prev.v$j)")
            .reduce((x, y) => s"($x + $y)") + s" AS v$i"
        }.mkString(",\n             ")
        s"$out AS (\n           SELECT $comps\n           FROM c, $prev)"
      }
      val maxAbs = ms.map(i => s"abs(v$i)").reduce((x, y) => s"greatest($x, $y)")
      val outs = ms.map(i =>
        s"CAST(floor(CASE WHEN $maxAbs > 0 THEN v$i / ($maxAbs) END * 1000000.0) AS BIGINT) AS pc_$i")
        .mkString(",\n           ")
      s"""WITH li AS (
           $liMeasuresSql),
         sums AS (
           SELECT count(*) AS n,
             CAST(sum(m0) AS BIGINT) AS s0, CAST(sum(m1) AS BIGINT) AS s1,
             CAST(sum(m2) AS BIGINT) AS s2, CAST(sum(m3) AS BIGINT) AS s3,
             CAST(sum(m0*m0) AS BIGINT) AS p00, CAST(sum(m0*m1) AS BIGINT) AS p01,
             CAST(sum(m0*m2) AS BIGINT) AS p02, CAST(sum(m0*m3) AS BIGINT) AS p03,
             CAST(sum(m1*m1) AS BIGINT) AS p11, CAST(sum(m1*m2) AS BIGINT) AS p12,
             CAST(sum(m1*m3) AS BIGINT) AS p13, CAST(sum(m2*m2) AS BIGINT) AS p22,
             CAST(sum(m2*m3) AS BIGINT) AS p23, CAST(sum(m3*m3) AS BIGINT) AS p33
           FROM li),
         c AS (
           SELECT $covCols
           FROM sums),
         i0 AS (SELECT 1.0 AS v0, 1.0 AS v1, 1.0 AS v2, 1.0 AS v3),
         ${iter("i0", "i1")},
         ${iter("i1", "i2")},
         ${iter("i2", "i3")}
         SELECT $outs
         FROM i3"""
    },

    "q543_max_drawdown" ->
      """WITH ev AS (
           SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) - 10000 AS v
           FROM events),
         c AS (
           SELECT event_type, ts, event_id,
             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM ev),
         p AS (
           SELECT event_type, cum,
             CAST(max(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS peak
           FROM c)
         SELECT event_type, count(*) AS n,
           CAST(max(peak - cum) AS BIGINT) AS max_drawdown_e2,
           CAST(max(peak) AS BIGINT) AS peak_e2
         FROM p GROUP BY 1""",

    "q544_record_highs" ->
      """WITH ev AS (
           SELECT event_type, ts, event_id,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         m AS (
           SELECT event_type, v,
             max(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS premax
           FROM ev)
         SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN premax IS NULL OR v > premax
             THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
           CAST(max(v) AS BIGINT) AS max_v_e2
         FROM m GROUP BY 1""",

    "q545_burst_islands" ->
      """WITH ev AS (
           SELECT event_type, epoch_us(ts) AS tm, event_id
           FROM events),
         f AS (
           SELECT event_type, tm, event_id,
             CASE WHEN tm - lag(tm, 1) OVER (PARTITION BY event_type
               ORDER BY tm, event_id) > 3600000000
               OR lag(tm, 1) OVER (PARTITION BY event_type
                 ORDER BY tm, event_id) IS NULL
             THEN 1 ELSE 0 END AS nb
           FROM ev),
         isl AS (
           SELECT event_type, tm,
             CAST(sum(nb) OVER (PARTITION BY event_type ORDER BY tm, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
           FROM f),
         seg AS (
           SELECT event_type, island, count(*) AS sz,
             max(tm) - min(tm) AS dur_us
           FROM isl GROUP BY 1, 2)
         SELECT event_type, count(*) AS n_bursts,
           CAST(max(sz) AS BIGINT) AS max_burst_sz,
           CAST(max(dur_us) AS BIGINT) // 1000000 AS max_burst_s,
           CAST(sum(sz) AS BIGINT) AS n
         FROM seg GROUP BY 1""",

  )
}
