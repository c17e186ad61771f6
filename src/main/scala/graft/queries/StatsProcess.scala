package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import StatsShared._

/** Control charts, outlier screens, and robust estimators — the
  * SPC / data-quality layer (x-bar, p, g charts, ESD, MAD, jackknife,
  * bootstrap, robust location estimates).
  *
  * Split out of the former single-file Stats.scala (round 10) along its
  * family seams; query + oracle pairs stay together. Cross-engine
  * determinism and scale-shape conventions are documented per query and
  * in the original Stats scaladoc (now on StatsShared).
  */
object StatsProcess {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Empirical-Bayes shrinkage of per-source keep rates (beta-binomial
    // method of moments — Efron & Morris / Robbins): a 25-doc source's
    // raw quality-keep rate is noise; shrink each source toward the
    // cross-source prior with strength M = μ(1−μ)/Var(p̂) − 1, the
    // James-Stein-flavored estimate a mixture planner should use
    // instead of raw rates when sources are small. Exact: per-source
    // (k_s, n_s) integer; the prior's two moments fold the H=20 source
    // rates in sorted source order (q399 rule); shrunk rate is ONE
    // pinned chain (k+M·μ)/(n+M). Falls back to the raw rate when the
    // between-source variance is degenerate (M ≤ 0). Scale: one scan,
    // one keyed aggregate, H-bounded fold, broadcast prior.
    "q429_eb_shrinkage" -> ((s, d0) => {
      val per = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"), sum(col("q.keep").cast("long")).as("k_s"))
      val prior = per.agg(count(lit(1)).as("h"),
          array_sort(collect_list(struct(col("source"), col("k_s"),
            col("n_s")))).as("ps"))
        .withColumn("sp", aggregate(transform(col("ps"),
          x => x.getField("k_s").cast("double") /
            x.getField("n_s").cast("double")),
          lit(0.0d), (a, x) => a + x))
        .withColumn("spp", aggregate(transform(col("ps"),
          x => (x.getField("k_s").cast("double") /
            x.getField("n_s").cast("double")) *
            (x.getField("k_s").cast("double") /
              x.getField("n_s").cast("double"))),
          lit(0.0d), (a, x) => a + x))
        .select(col("h"), col("sp"), col("spp"))
      per.crossJoin(broadcast(prior))
        .withColumn("mu", col("sp") / d(col("h")))
        .withColumn("v", (col("spp") - col("sp") * col("sp") / d(col("h"))) /
          (d(col("h")) - 1.0d))
        .withColumn("mm", when(col("v") > 0.0d,
          col("mu") * (lit(1.0d) - col("mu")) / col("v") - lit(1.0d))
          .otherwise(lit(0.0d)))
        .select(col("source"), col("n_s"), col("k_s"),
          expr("k_s * 1000000 div n_s").as("raw_e6"),
          floor(col("mu") * 1e6).cast("long").as("mu_e6"),
          when(col("mm") > 0.0d,
            floor((d(col("k_s")) + col("mm") * col("mu")) /
              (d(col("n_s")) + col("mm")) * 1e6).cast("long"))
            .otherwise(expr("k_s * 1000000 div n_s")).as("shrunk_e6"))
    }),


    // Delete-one-stratum jackknife variance of a ratio estimator
    // (Quenouille/Tukey; the survey-statistics workhorse for nonlinear
    // estimators): R̂ = ΣY/ΣX = revenue cents per quantity unit over
    // lineitem, strata = l_returnflag. Each leave-one-out replicate
    // R₍₋ₕ₎ = (Y−y_h)/(X−x_h) comes from per-stratum TOTALS — no data
    // re-pass per replicate, the trick that makes the jackknife free at
    // 100 TB. var_jk = (H−1)/H · Σ(R₍₋ₕ₎ − R̄)². Exact: integer stratum
    // totals; replicates fold in sorted stratum order (q399 rule); var
    // via the Σr² − (Σr)²/H identity in ONE pinned chain. Scale: one
    // map-side-combinable aggregate + an H-bounded fold.
    "q430_jackknife_ratio" -> ((s, d0) => {
      val st = t(s, d0, "lineitem")
        .select(col("l_returnflag").as("stratum"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"),
          col("l_quantity").cast("long").as("x"))
        .groupBy("stratum").agg(sum("y").as("y_h"), sum("x").as("x_h"))
      st.agg(count(lit(1)).as("h"), sum("y_h").as("yy"), sum("x_h").as("xx"),
          array_sort(collect_list(struct(col("stratum"), col("y_h"),
            col("x_h")))).as("ps"))
        .withColumn("s1", aggregate(transform(col("ps"),
          p => (d(col("yy")) - p.getField("y_h").cast("double")) /
            (d(col("xx")) - p.getField("x_h").cast("double"))),
          lit(0.0d), (a, x) => a + x))
        .withColumn("s2", aggregate(transform(col("ps"),
          p => ((d(col("yy")) - p.getField("y_h").cast("double")) /
            (d(col("xx")) - p.getField("x_h").cast("double"))) *
            ((d(col("yy")) - p.getField("y_h").cast("double")) /
              (d(col("xx")) - p.getField("x_h").cast("double")))),
          lit(0.0d), (a, x) => a + x))
        .select(col("h"), col("yy"), col("xx"),
          // quotient/remainder split: yy·1e6 overflows int64 at sf1
          // (found by the sf1 proof run); (yy div xx)·1e6 +
          // (yy mod xx)·1e6 div xx is the same value, remainder-bounded
          expr("(yy div xx) * 1000000 + ((yy % xx) * 1000000) div xx")
            .as("r_hat_e6"),
          floor((col("s1") / d(col("h"))) * 1e6).cast("long")
            .as("r_jk_mean_e6"),
          when(col("h") > 1L,
            floor(((d(col("h")) - 1.0d) / d(col("h")) *
              (col("s2") - col("s1") * col("s1") / d(col("h")))) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("var_jk_e6"))
    }),


    // Hodges–Lehmann pseudo-median (1963) — the median of all Walsh
    // averages (y_i+y_j)/2 over the day-bounded series: the robust
    // location estimator that beats the median's efficiency while
    // keeping its breakdown, reported against mean and median so the
    // three-way gap shows the skew. Exact: Walsh sums kept ×2 integer;
    // the pair frame is calendar-bounded (the q487 posture); order
    // statistic via exact percentile.
    "q528_hodges_lehmann" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // both pair sides + the scalar stats read it
      val walsh = dm.select(col("day").as("d1"), col("y").as("y1"))
        .join(dm.select(col("day").as("d2"), col("y").as("y2")),
          col("d1") <= col("d2"))
        .select((col("y1") + col("y2")).as("w2"))
      val hl = walsh.agg(count(lit(1)).as("n_pairs"),
        expr("cast(percentile(w2, 0.5) * 2 as bigint)").as("hl4"))
      dm.agg(count(lit(1)).as("n_days"),
          expr("sum(y) * 100 div count(1)").as("mean_e2"),
          expr("cast(percentile(y, 0.5) * 2 as bigint)").as("med2"))
        .crossJoin(hl)
        .select(col("n_days"), col("n_pairs"),
          col("mean_e2"), (col("med2") * 50L).as("median_e2"),
          (col("hl4") * 25L).as("hl_e2"))
    }),


    // Bland–Altman agreement (1986) — do the two model scores (the
    // standing emb[0]/emb[1] fixture) MEASURE the same thing? Mean
    // difference (bias), 1.96σ limits of agreement, and the share of
    // items outside them — the method-comparison statistics that
    // correlation famously cannot replace. Exact integer e6 scores and
    // diffs; limit comparisons pinned per item in one pass (totals
    // broadcast back).
    "q530_bland_altman" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        (expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""") -
          expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[1] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""")).as("dv"))
        .persist() // totals + the coverage pass read it
      val st = e.agg(count(lit(1)).as("n"), sum("dv").as("sd"),
        sum(col("dv") * col("dv")).as("sdd"))
      e.crossJoin(broadcast(st))
        .withColumn("bias", d(col("sd")) / d(col("n")))
        .withColumn("sdev", sqrt((d(col("sdd")) -
          d(col("sd")) * d(col("sd")) / d(col("n"))) / (d(col("n")) - 1.0d)))
        .withColumn("loa", lit(1.959964d) * col("sdev"))
        .agg(max("n").as("n"),
          floor(max(col("bias"))).cast("long").as("bias_e6"),
          floor(max(col("loa"))).cast("long").as("loa_halfwidth_e6"),
          sum(when(abs(d(col("dv")) - col("bias")) > col("loa"), 1L)
            .otherwise(0L)).as("outside"))
        .withColumn("outside_e6", expr("outside * 1000000 div n"))
    }),


    // g-chart (rare-event interval chart) — monitor the RAREST event
    // type by its inter-arrival gaps, the SPC chart for events too
    // sparse for the p-chart: UCL = μ + 3·√(μ(μ+1)) on the geometric
    // model (no transcendental). Reports gap stats and breaches — the
    // "did the rare thing start clustering" alarm. The rare type by
    // bounded argmin; gaps via the keyed distributed lag (after the
    // filter the frame is ONE key yet still ~n/k rows, so a
    // lag-over-partitionBy(event_type) window would funnel it all
    // through a single task — PrefixScan.lagLongKeyed range-sorts
    // instead and carries the boundary value between partitions).
    // Exact integers + one pinned chain.
    "q525_g_chart" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("event_type"),
        expr("unix_micros(ts)").as("tm"), col("event_id"))
      val rare = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy(col("n").asc, col("event_type").asc).limit(1)
        .select(col("event_type"))
      val gaps = graft.operators.PrefixScan.lagLongKeyed(
          ev.join(broadcast(rare), "event_type"),
          "tm_prev", "tm", Seq("event_type"), asc("tm"), asc("event_id"))
        .withColumn("gap", col("tm") - col("tm_prev"))
        .where(col("gap").isNotNull)
        .select(expr("gap div 1000000").as("gap_s"))
      val st = gaps.agg(count(lit(1)).as("n_gaps"), sum("gap_s").as("sg"))
      gaps.crossJoin(broadcast(st))
        .withColumn("mu", d(col("sg")) / d(col("n_gaps")))
        .withColumn("ucl", col("mu") + lit(3.0d) *
          sqrt(col("mu") * (col("mu") + 1.0d)))
        .agg(max("n_gaps").as("n_gaps"),
          floor(max(col("mu")) * 1e3).cast("long").as("mean_gap_s_e3"),
          floor(max(col("ucl")) * 1e3).cast("long").as("ucl_s_e3"),
          sum(when(d(col("gap_s")) > col("ucl"), 1L).otherwise(0L))
            .as("breaches"))
    }),


    // p-chart (attribute control chart) — is the daily PURCHASE SHARE
    // of events a stable process? Binomial 3σ limits around the pooled
    // proportion, per-day limits widening with 1/√n_t (unequal daily
    // volumes — the textbook p-chart, not the equal-n shortcut).
    // Reports out-of-control days and the worst excursion. Exact
    // integer counts; limit comparisons pinned per day.
    "q522_p_chart" -> ((s, d0) => {
      val day = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          (col("event_type") === "purchase").cast("long").as("hit"))
        .groupBy("day").agg(count(lit(1)).as("n_t"), sum("hit").as("k_t"))
      val pool = day.agg(sum("n_t").as("n"), sum("k_t").as("k"),
        count(lit(1)).as("n_days"))
      day.crossJoin(broadcast(pool))
        .withColumn("pbar", d(col("k")) / d(col("n")))
        .withColumn("sig", sqrt(col("pbar") * (lit(1.0d) - col("pbar")) /
          d(col("n_t"))))
        .withColumn("p_t", d(col("k_t")) / d(col("n_t")))
        .withColumn("z", (col("p_t") - col("pbar")) / col("sig"))
        .agg(max("n_days").as("n_days"),
          floor(max(col("pbar")) * 1e6).cast("long").as("pbar_e6"),
          sum(when(abs(col("z")) > 3.0d, 1L).otherwise(0L)).as("ooc_days"),
          floor(max(abs(col("z"))) * 1e6).cast("long").as("max_abs_z_e6"))
    }),


    // Process capability (Cp/Cpk) — with spec limits taken from the
    // FIRST half's p1/p99 (the commissioning window), how capable is
    // the SECOND half's process? Cp = (USL−LSL)/6σ, Cpk = min distance
    // to a limit over 3σ — the manufacturing-grade "will the metric
    // stay in its historical band" number. Exact: spec limits are rank
    // lookups on the first half (globalRank); second-half moments
    // integer; chains pinned.
    "q524_process_capability" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(
          floor(col("value") * 100).cast("long").as("v"), col("event_id"),
          expr("unix_micros(ts)").as("tm"))
      val mid = ev.agg(expr("(min(tm) + max(tm)) div 2").as("b"))
      val first = ev.crossJoin(broadcast(mid)).where(col("tm") < col("b"))
      val rk = graft.operators.Ranking.globalRank(
        first.select(col("v"), col("event_id")), "r",
        col("v").asc, col("event_id").asc)
      val nf = rk.agg(count(lit(1)).as("nf"))
      val specs = rk.crossJoin(broadcast(nf))
        .where(col("r") === expr("greatest(nf div 100, 1L)") ||
          col("r") === expr("nf * 99 div 100"))
        .agg(min("v").as("lsl"), max("v").as("usl"))
      val second = ev.crossJoin(broadcast(mid)).where(col("tm") >= col("b"))
        .agg(count(lit(1)).as("n2"), sum("v").as("sv"),
          sum(col("v") * col("v")).as("svv"))
      second.crossJoin(specs)
        .withColumn("m", d(col("sv")) / d(col("n2")))
        .withColumn("sd", sqrt((d(col("svv")) -
          d(col("sv")) * d(col("sv")) / d(col("n2"))) /
          (d(col("n2")) - 1.0d)))
        .select(col("n2").as("n_second"), col("lsl"), col("usl"),
          floor((d(col("usl")) - d(col("lsl"))) /
            (lit(6.0d) * col("sd")) * 1e6).cast("long").as("cp_e6"),
          floor(least((d(col("usl")) - col("m")) / (lit(3.0d) * col("sd")),
            (col("m") - d(col("lsl"))) / (lit(3.0d) * col("sd"))) * 1e6)
            .cast("long").as("cpk_e6"))
    }),


    // DFBETA slope influence — the actual delete-one-day CHANGE to the
    // daily trend slope (q496's leverage says where influence CAN
    // live; DFBETA says where it DOES): b₍₋ₜ₎ from the totals-minus-
    // point identity, no per-candidate re-scan, top 10 by |Δb|. All
    // statistics from one integer-sum aggregate; per-day pinned
    // chains; the argpick is an integerized bounded sort-limit.
    "q520_dfbeta" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val base = daily.crossJoin(broadcast(daily.agg(min("day").as("d0"))))
        .select((col("day") - col("d0")).as("tt"), col("y"))
      val sums = base.agg(count(lit(1)).as("n"), sum("tt").as("st"),
        sum("y").as("sy"), sum(col("tt") * col("y")).as("sty"),
        sum(col("tt") * col("tt")).as("stt"))
      base.crossJoin(broadcast(sums))
        .withColumn("b", (d(col("n")) * d(col("sty")) -
          d(col("st")) * d(col("sy"))) /
          (d(col("n")) * d(col("stt")) - d(col("st")) * d(col("st"))))
        .withColumn("bl", ((d(col("n")) - 1.0d) *
          (d(col("sty")) - d(col("tt")) * d(col("y"))) -
          (d(col("st")) - d(col("tt"))) * (d(col("sy")) - d(col("y")))) /
          ((d(col("n")) - 1.0d) *
            (d(col("stt")) - d(col("tt")) * d(col("tt"))) -
            (d(col("st")) - d(col("tt"))) * (d(col("st")) - d(col("tt")))))
        .select(col("tt"),
          floor(col("b") * 1e9).cast("long").as("b_e9"),
          floor(col("bl") * 1e9).cast("long").as("b_loo_e9"),
          floor((col("bl") - col("b")) * 1e9).cast("long").as("dfbeta_e9"))
        .orderBy(abs(col("dfbeta_e9")).desc, col("tt").asc).limit(10)
    }),


    // Shewhart x̄–R control chart (the SPC classic) over complete
    // 7-day weeks of the daily index: center lines from subgroup
    // means/ranges, limits from the tabulated n=7 constants
    // (A₂=0.419, D₃=0.076, D₄=1.924 — literals, same in both
    // engines), and the count of out-of-control weeks on each chart —
    // the ops-grade "is the metric process stable" verdict. Exact
    // integer subgroup stats; limit comparisons pinned.
    "q521_xbar_chart" -> ((s, d0) => {
      val wk = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .select(expr("day div 7").as("week"), col("y"))
        .groupBy("week")
        .agg(count(lit(1)).as("nd"), expr("sum(y) div count(1)").as("xbar"),
          (max("y") - min("y")).as("rng"))
        .where(col("nd") === 7L)
        .persist() // center lines + the OOC pass read it
      val cl = wk.agg(count(lit(1)).as("n_weeks"),
        expr("sum(xbar) div count(1)").as("xbb"),
        expr("sum(rng) div count(1)").as("rbar"))
      wk.crossJoin(broadcast(cl))
        .withColumn("uclx", d(col("xbb")) + lit(0.419d) * d(col("rbar")))
        .withColumn("lclx", d(col("xbb")) - lit(0.419d) * d(col("rbar")))
        .withColumn("uclr", lit(1.924d) * d(col("rbar")))
        .withColumn("lclr", lit(0.076d) * d(col("rbar")))
        .agg(max("n_weeks").as("n_weeks"), max("xbb").as("xbb"),
          max("rbar").as("rbar"),
          sum(when(d(col("xbar")) > col("uclx") ||
            d(col("xbar")) < col("lclx"), 1L).otherwise(0L)).as("ooc_x"),
          sum(when(d(col("rng")) > col("uclr") ||
            d(col("rng")) < col("lclr"), 1L).otherwise(0L)).as("ooc_r"))
    }),


    // Metric-capping impact — before capping a heavy-tailed metric at
    // p90/p99 (the standard abuse/outlier guard), price what the cap
    // DOES: share of rows touched and share of total mass removed at
    // each cap. Cap values are exact rank lookups (globalRank), the
    // impact is one conditional pass. The operational twin of q31's
    // winsorize and q486's trim curve, priced in MASS not mean.
    "q514_capping_impact" -> ((s, d0) => {
      val rk = graft.operators.Ranking.globalRank(
        t(s, d0, "events").select(
          floor(col("value") * 100).cast("long").as("v"), col("event_id")),
        "r", col("v").asc, col("event_id").asc)
        .persist() // cap lookups + the impact pass read it
      val nn = rk.agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val caps = rk.crossJoin(broadcast(nn))
        .where(col("r") === expr("n * 90 div 100") ||
          col("r") === expr("n * 99 div 100"))
        .select(expr("CASE WHEN r = n * 90 div 100 THEN 90L ELSE 99L END")
          .as("pct"), col("v").as("cap"))
      rk.crossJoin(broadcast(caps))
        .groupBy("pct", "cap")
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") > col("cap"), 1L).otherwise(0L)).as("n_capped"),
          sum("v").as("sv"),
          sum(when(col("v") > col("cap"), col("v") - col("cap"))
            .otherwise(0L)).as("mass_removed"))
        .select(col("pct"), col("cap"),
          expr("n_capped * 1000000 div n").as("touched_e6"),
          col("mass_removed"),
          expr("mass_removed * 1000000 div sv").as("mass_share_e6"))
    }),


    // Box–Cox transform selection on a λ grid (Box & Cox 1964) —
    // which power makes document length most Gaussian? The grid
    // {−1, −½, 0, ½, 1} needs NO pow(): x^½ is sqrt (IEEE-exact),
    // x^{−1} is division, λ=0 is ln — so every transform is an exact
    // or pinned op. Profile log-likelihood LL(λ) = −n/2·ln(var z) +
    // (λ−1)Σln x from per-term-floored transforms; argmax by bounded
    // integer rank. One scan × 5 grid points.
    "q505_boxcox_grid" -> ((s, d0) => {
      val x = t(s, d0, "documents")
        .select(greatest(col("n_chars"), lit(1L)).as("xv"))
        .persist() // five grid passes read it
      def zExpr(lam: Double): Column =
        if (lam == 0.0) log(d(col("xv")))
        else if (lam == 1.0) d(col("xv")) - 1.0d
        else if (lam == 0.5) (sqrt(d(col("xv"))) - 1.0d) / 0.5d
        else if (lam == -0.5)
          (lit(1.0d) / sqrt(d(col("xv"))) - 1.0d) / -0.5d
        else (lit(1.0d) / d(col("xv")) - 1.0d) / -1.0d
      val grids = Seq(-1.0, -0.5, 0.0, 0.5, 1.0).map { lam =>
        x.select(
            floor(zExpr(lam) * 1e6).cast("long").as("z_e6"),
            floor(log(d(col("xv"))) * 1e6).cast("long").as("lx_e6"))
          .agg(count(lit(1)).as("n"), sum("z_e6").as("sz"),
            sum(expr("""cast(floor(cast(z_e6 as double)
              * cast(z_e6 as double) / 1000000.0) as bigint)"""))
              .as("szz_e6"),
            sum("lx_e6").as("slx"))
          .select(lit((lam * 10).toLong).as("lam_e1"), col("n"),
            col("sz"), col("szz_e6"), col("slx"))
      }
      val ll = grids.reduce(_ unionByName _)
        .withColumn("vz", (col("szz_e6").cast("double") / 1e6 -
          (col("sz").cast("double") / 1e6) *
          (col("sz").cast("double") / 1e6) / d(col("n"))) / d(col("n")))
        .withColumn("ll", (-d(col("n")) / 2.0d) * log(col("vz")) +
          (col("lam_e1").cast("double") / 10.0d - 1.0d) *
          (col("slx").cast("double") / 1e6))
        .select(col("lam_e1"), col("n"),
          floor(col("ll") * 1e3).cast("long").as("ll_e3"))
      val o = ll.select(col("lam_e1").as("l2"), col("ll_e3").as("v2"))
      ll.join(broadcast(o), expr(
          "v2 > ll_e3 OR (v2 = ll_e3 AND l2 < lam_e1)"), "left")
        .groupBy("lam_e1", "n", "ll_e3")
        .agg(count(col("l2")).as("nbet"))
        .select(col("lam_e1"), col("n"), col("ll_e3"),
          (col("nbet") === 0L).as("best"))
    }),


    // Sampling-seed sensitivity — how much does the 1-in-7 sample's
    // keep-rate estimate move across 8 different hash salts? The
    // observed spread is compared to the binomial prediction
    // p(1−p)/m: matching ⇒ hash sampling behaves like true random
    // sampling on this corpus; excess ⇒ the hash interacts with the
    // data and every sampled metric carries hidden extra variance.
    // One scan (salt explode ×8), bounded tails. Exact until two
    // pinned chains.
    "q498_seed_sensitivity" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("doc_id"), col("q.keep").cast("long").as("keep"))
        .persist() // full rate + the salt explode read it
      val full = f.agg(count(lit(1)).as("n_pop"), sum("keep").as("k_pop"))
      val salts = f.select(col("doc_id"), col("keep"),
          explode(sequence(lit(0), lit(7))).as("salt"))
        .where(graft.functions.TextFunctions.hash60(concat(lit("salt"),
          col("salt").cast("string"), lit(":"),
          col("doc_id").cast("string"))) % 7L === 0L)
        .groupBy("salt")
        .agg(count(lit(1)).as("m"), sum("keep").as("k"))
        .select(col("salt"), col("m"), expr("k * 1000000 div m").as("r_e6"))
      salts.agg(count(lit(1)).as("n_salts"), sum("m").as("sm"),
          sum("r_e6").as("sr"), sum(col("r_e6") * col("r_e6")).as("srr"))
        .crossJoin(broadcast(full))
        .withColumn("p", d(col("k_pop")) / d(col("n_pop")))
        .withColumn("var_obs", (d(col("srr")) -
          d(col("sr")) * d(col("sr")) / d(col("n_salts"))) /
          (d(col("n_salts")) - 1.0d))
        .withColumn("var_pred", col("p") * (lit(1.0d) - col("p")) /
          (d(col("sm")) / d(col("n_salts"))) * 1e12)
        .select(col("n_salts"), expr("sr div n_salts").as("mean_rate_e6"),
          expr("k_pop * 1000000 div n_pop").as("full_rate_e6"),
          floor(sqrt(col("var_obs"))).cast("long").as("sd_obs_e6"),
          floor(sqrt(col("var_pred"))).cast("long").as("sd_pred_e6"))
    }),


    // Distribution-free median confidence interval — the
    // order-statistic CI (no normality, no bootstrap): ranks
    // n/2 ∓ 1.96·√n/2 bound the median with ~95% coverage by the
    // binomial argument. Ranks via the two-phase globalRank; the
    // bound VALUES come from three rank lookups. One pinned chain
    // for the rank arithmetic; everything else integer.
    "q499_median_ci" -> ((s, d0) => {
      val rk = graft.operators.Ranking.globalRank(
        t(s, d0, "events").select(
          floor(col("value") * 100).cast("long").as("v"), col("event_id")),
        "r", col("v").asc, col("event_id").asc)
        .persist() // three rank lookups read it
      val nn = rk.agg(count(lit(1)).as("n"),
        expr("cast(percentile(v, 0.5) * 2 as bigint)").as("median2"))
      val bounds = nn.select(col("n"), col("median2"),
        greatest(lit(1L), floor(d(col("n")) / 2.0d -
          lit(1.959964d) * sqrt(d(col("n"))) / 2.0d).cast("long"))
          .as("lo_rank"),
        least(col("n"), ceil(d(col("n")) / 2.0d + 1.0d +
          lit(1.959964d) * sqrt(d(col("n"))) / 2.0d).cast("long"))
          .as("hi_rank"))
      rk.crossJoin(broadcast(bounds))
        .where(col("r") === col("lo_rank") || col("r") === col("hi_rank"))
        .groupBy("n", "median2", "lo_rank", "hi_rank")
        .agg(min(when(col("r") === col("lo_rank"), col("v"))).as("v_lo"),
          min(when(col("r") === col("hi_rank"), col("v"))).as("v_hi"))
        .select(col("n"), col("lo_rank"), col("hi_rank"), col("median2"),
          col("v_lo"), col("v_hi"))
    }),


    // Generalized ESD outlier sequence (Rosner 1983) — the FORMAL
    // top-5 outlier table q156's MAD flags approximate: repeatedly
    // remove the most extreme value and recompute the statistic on
    // the remainder. The argmax is integer (|v·n − s| avoids the
    // division), the remainder statistics come from TOTALS
    // SUBTRACTION (no re-aggregation per round), and each round's
    // R_i replays as one pinned double chain. Five bounded rounds;
    // the oracle re-derives the same stats per round from NOT-IN
    // scans — different mechanism, identical values.
    "q495_generalized_esd" -> ((s, d0) => {
      val base = t(s, d0, "events").select(col("event_id"),
          floor(col("value") * 100).cast("long").as("v"))
        .persist() // five argmax scans read it
      val t0 = base.agg(count(lit(1)).as("n"), sum("v").as("sv"),
        sum(col("v") * col("v")).as("ss")).head()
      var (nC, sC, ssC) = (t0.getLong(0), t0.getLong(1), t0.getLong(2))
      var excl = Vector.empty[Long]
      var rows = Vector.empty[(Long, Long, Long, Long)]
      for (i <- 1 to 5) {
        val m = base.where(!col("event_id").isin(excl: _*))
          .agg(max(struct(abs(col("v") * lit(nC) - lit(sC)).as("key"),
            (-col("event_id")).as("ne"), col("v").as("vv")))).head()
          .getStruct(0)
        val (eid, v) = (-m.getLong(1), m.getLong(2))
        val (nd, sd, ssd, vd) =
          (nC.toDouble, sC.toDouble, ssC.toDouble, v.toDouble)
        val r = math.abs(vd - sd / nd) /
          math.sqrt((ssd - sd * sd / nd) / (nd - 1.0))
        rows :+= ((i.toLong, eid, v, math.floor(r * 1e6).toLong))
        excl :+= eid
        nC -= 1; sC -= v; ssC -= v * v
      }
      base.unpersist()
      import s.implicits._
      rows.toDF("round", "event_id", "v", "r_e6")
    }),


    // Regression-leverage audit — which days OWN the q463 trend line?
    // Leverage h_t = 1/n + (t − t̄)²/S_tt plus the per-day residual,
    // for the 10 highest-leverage days: the influence table read
    // before trusting any slope through an unbalanced calendar. All
    // statistics from one integer-sum aggregate; per-day chains
    // pinned; top-10 is a bounded sort-limit.
    "q496_leverage_audit" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val base = daily.crossJoin(broadcast(daily.agg(min("day").as("d0"))))
        .select((col("day") - col("d0")).as("tt"), col("y"))
      val sums = base.agg(count(lit(1)).as("n"), sum("tt").as("st"),
        sum("y").as("sy"), sum(col("tt") * col("y")).as("sty"),
        sum(col("tt") * col("tt")).as("stt"))
      base.crossJoin(broadcast(sums))
        .withColumn("b", (d(col("n")) * d(col("sty")) -
          d(col("st")) * d(col("sy"))) /
          (d(col("n")) * d(col("stt")) - d(col("st")) * d(col("st"))))
        .withColumn("a", (d(col("sy")) - col("b") * d(col("st"))) /
          d(col("n")))
        .withColumn("h", lit(1.0d) / d(col("n")) +
          (d(col("tt")) - d(col("st")) / d(col("n"))) *
          (d(col("tt")) - d(col("st")) / d(col("n"))) /
          (d(col("stt")) - d(col("st")) * d(col("st")) / d(col("n"))))
        .select(col("tt"),
          floor(col("h") * 1e9).cast("long").as("h_e9"),
          floor((d(col("y")) - (col("a") + col("b") * d(col("tt")))) *
            100.0d).cast("long").as("r_e2"))
        .orderBy(col("h_e9").desc, col("tt").asc).limit(10)
    }),


    // Trimmed-mean robustness curve — the mean at 0/1/5/10% symmetric
    // trims: if the estimate moves a lot as trimming grows, the tails
    // own the mean and q31's fixed winsorization level was a guess.
    // Exact: global ranks via the two-phase globalRank, per-trim
    // bounds integer trunc-divs, conditional sums in ONE pass over
    // the rank frame × 4 broadcast trim levels. Scale: one rank pass.
    "q486_trimmed_mean_curve" -> ((s, d0) => {
      val rk = graft.operators.Ranking.globalRank(
        t(s, d0, "events").select(
          floor(col("value") * 100).cast("long").as("v"), col("event_id")),
        "r", col("v").asc, col("event_id").asc)
      val nn = rk.agg(count(lit(1)).as("n"))
      val trims = rk.sparkSession.range(1)
        .select(explode(expr("array(0L, 10L, 50L, 100L)")).as("trim_pm"))
        .crossJoin(broadcast(nn))
        .select(col("trim_pm"), expr("trim_pm * n div 1000").as("lo"),
          expr("n - trim_pm * n div 1000").as("hi"))
      rk.crossJoin(broadcast(trims))
        .where(col("r") > col("lo") && col("r") <= col("hi"))
        .groupBy("trim_pm")
        .agg(count(lit(1)).as("n_kept"), sum("v").as("sv"))
        .select(col("trim_pm"), col("n_kept"),
          expr("sv * 1000000 div n_kept").as("mean_e6"))
    }),


    // Circular block bootstrap (Künsch 1989; Politis–Romano) — the
    // variance of the daily-mean estimator under AUTOCORRELATION,
    // which the iid bootstrap (q187) understates: 32 deterministic
    // hash-seeded replicates each resample ⌊D/10⌋ circular 10-day
    // blocks, and the replicate-mean variance is compared to the
    // naive s²/D. ratio ≫ 1 = the series is dependent and every
    // daily-mean CI must widen. Exact: block starts are hash mods,
    // replicate means e2 integers, variances ONE pinned chain from
    // integer Σm/Σm². Scale: day frame bounded; the resample explode
    // is 32·D rows.
    "q485_block_bootstrap" -> ((s, d0) => {
      val daily = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val rk = graft.operators.Ranking.globalRank(daily, "p", col("day").asc)
        .select(col("p"), col("y"))
        .persist() // 32 replicate joins read it
      val dd = rk.agg(count(lit(1)).as("dn"), sum("y").as("sy"),
        sum(col("y") * col("y")).as("syy"))
      val picks = rk.sparkSession.range(32).select(col("id").as("r"))
        .crossJoin(broadcast(dd.select(col("dn"))))
        .select(col("r"), col("dn"),
          explode(sequence(lit(0), expr("dn div 10 - 1"))).as("j"))
        .withColumn("st", graft.functions.TextFunctions.hash60(
          concat(lit("bb:"), col("r").cast("string"), lit(":"),
            col("j").cast("string"))) % col("dn"))
        .select(col("r"), col("dn"), col("st"),
          explode(sequence(lit(0), lit(9))).as("m"))
        .select(col("r"), ((col("st") + col("m")) % col("dn") + 1L).as("p"))
      val reps = picks.join(rk, "p")
        .groupBy("r")
        .agg(count(lit(1)).as("ns"), sum("y").as("sy_r"))
        .select(col("r"), expr("sy_r * 100 div ns").as("m_e2"))
      reps.agg(count(lit(1)).as("n_reps"), sum("m_e2").as("sm"),
          sum(col("m_e2") * col("m_e2")).as("smm"))
        .crossJoin(broadcast(dd))
        .withColumn("boot_var", (d(col("smm")) -
          d(col("sm")) * d(col("sm")) / d(col("n_reps"))) /
          (d(col("n_reps")) - 1.0d) / 10000.0d)
        .withColumn("naive_var", ((d(col("syy")) -
          d(col("sy")) * d(col("sy")) / d(col("dn"))) /
          (d(col("dn")) - 1.0d)) / d(col("dn")))
        .select(col("dn").as("n_days"), col("n_reps"),
          floor(col("boot_var") * 1e6).cast("long").as("boot_var_e6"),
          floor(col("naive_var") * 1e6).cast("long").as("naive_var_e6"),
          when(col("naive_var") > 0.0d,
            floor(col("boot_var") / col("naive_var") * 1e6).cast("long"))
            .otherwise(lit(0L)).as("ratio_e6"))
    }),


    // Quantile normalization across sources (Bolstad et al. 2003 — the
    // batch-effect removal standard): map each source's n_chars
    // distribution ONTO the pooled global distribution by rank lookup,
    // so every source afterwards has the same marginal — the
    // cross-source score-calibration step a mixed-corpus quality
    // pipeline runs before comparing thresholds (q254 is the
    // within-group CDF; this is the cross-group value MAPPING). Exact:
    // within-source max-rank rs, target global rank ceil(rs·N/n_s) as
    // an integer trunc-div, then an interval lookup into the global
    // cumulative histogram. Scale: the histograms are distinct-value
    // frames (domain-bounded); global cum counts ride PrefixScan, the
    // source ranks a KEYED window over the bounded (source × value)
    // frame; the lookup is a broadcast range join.
    "q437_quantile_normalization" -> ((s, d0) => {
      val docs = t(s, d0, "documents").select(col("source"),
        col("n_chars").as("v"))
      val gc = graft.operators.PrefixScan.scanLong(
          docs.groupBy("v").agg(count(lit(1)).as("gn")),
          "gcum", "gn", "sum", inclusive = true, col("v"))
        .select(col("v").as("gv"), col("gcum"),
          (col("gcum") - col("gn")).as("gprev"))
      val nn = docs.agg(count(lit(1)).as("n"))
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val sc = docs.groupBy("source", "v").agg(count(lit(1)).as("sn"))
        .withColumn("rs", sum("sn").over(wS))
      val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      sc.join(ns, "source").crossJoin(broadcast(nn))
        .withColumn("tgt", expr("(rs * n + n_s - 1) div n_s"))
        .join(broadcast(gc),
          col("gprev") < col("tgt") && col("tgt") <= col("gcum"))
        .select(col("source"), col("v"), col("sn"), col("rs"), col("tgt"),
          col("gv").as("mapped"))
    }),


    // Quantile (rank-CDF) transform per series — the sklearn
    // QuantileTransformer shape feature pipelines run before training on
    // heavy-tailed inputs: within each event_type, value → its empirical
    // CDF position (rank−1)/(n−1), computed as an exact integer
    // (rank−1)·1e6 div (n−1) with event_id tiebreak (percent_rank's
    // float division would be the only engine-sensitive step —
    // integerized it is exact). Scale shape: event_type has ~10 values,
    // so a row_number window over it would rank the whole table in ~10
    // tasks — the per-type ranks run on the keyed PrefixScan
    // (range-sorted, offsets stitched) with the bounded per-type counts
    // broadcast back.
    "q254_quantile_transform" -> ((s, d0) => {
      val ev = t(s, d0, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val cnt = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      graft.operators.PrefixScan.scanLongKeyed(ev, Seq("event_type"),
          Seq(graft.operators.PrefixScan.KeyedScanCol("rnk", "", "count")),
          col("value"), col("event_id"))
        .join(broadcast(cnt), "event_type")
        .where(col("cnt") > 1)
        .select(col("event_id"), col("event_type"), col("rnk"),
          expr("(rnk - 1) * 1000000 div (cnt - 1)").as("cdf_e6"))
    }),


    // Robust outlier detection by median absolute deviation: flag events
    // whose |value - median| exceeds 3x the group's MAD. Values live in
    // integer centi-units, so both medians interpolate to exact half/
    // quarter units (dyadic rationals are exact doubles — no float-parity
    // risk despite two levels of percentile). Two grouped exact-percentile
    // passes joined back on the group key; group cardinality is tiny, so
    // both joins broadcast.
    "q156_mad_outliers" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("v_e2"))
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(v_e2, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("v_e2").cast("double") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .select(col("event_id"), col("event_type"), col("v_e2"),
          (col("dev") > col("mad") * 3.0).as("is_outlier"))
    }),


    // Median-of-means per event_type — the heavy-tail-robust mean
    // estimator (sub-Gaussian deviation bounds without moment
    // assumptions): 10 deterministic hash buckets, truncated-integer
    // bucket means, exact 2×-median of the 10 means via the sorted
    // bounded bucket array (the q182 twice-median trick — no fractional
    // interpolation to match cross-engine).
    "q315_median_of_means" -> ((s, d0) => {
      val bm = t(s, d0, "events")
        .select(col("event_type"), (col("event_id") % 10).as("bkt"),
          floor(col("value") * 100).cast("long").as("v_e2"))
        .groupBy("event_type", "bkt")
        .agg(expr("sum(v_e2) div count(1)").as("m_e2"))
      bm.groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          sort_array(collect_list("m_e2")).as("ms"))
        .select(col("event_type"), col("n_buckets"),
          expr("element_at(ms, cast((size(ms) + 1) div 2 as int)) + " +
            "element_at(ms, cast(size(ms) div 2 + 1 as int))")
            .as("mom_x2_e2"))
    }),

  )

  val oracles: Map[String, String] = Map(

    "q528_hodges_lehmann" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         walsh AS (
           SELECT a.y + b.y AS w2
           FROM dm a JOIN dm b ON a.day <= b.day),
         hl AS (
           SELECT count(*) AS n_pairs,
             CAST(quantile_cont(w2, 0.5) * 2 AS BIGINT) AS hl4
           FROM walsh),
         base AS (
           SELECT count(*) AS n_days,
             CAST(sum(y) AS BIGINT) * 100 // count(*) AS mean_e2,
             CAST(quantile_cont(y, 0.5) * 2 AS BIGINT) AS med2
           FROM dm)
         SELECT n_days, n_pairs, mean_e2, med2 * 50 AS median_e2,
           hl4 * 25 AS hl_e2
         FROM base, hl""",


    "q530_bland_altman" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT)))
             - least(999999, greatest(0, CAST(floor(
               (CAST(embedding[2] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS dv
           FROM embeddings),
         st AS (
           SELECT count(*) AS n, CAST(sum(dv) AS BIGINT) AS sd,
             CAST(sum(dv * dv) AS BIGINT) AS sdd
           FROM e),
         ch AS (
           SELECT e.dv, st.n,
             CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
             sqrt((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)
               * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0)) AS sdev
           FROM e, st),
         ch2 AS (SELECT *, 1.959964 * sdev AS loa FROM ch),
         ag AS (
           SELECT max(n) AS n,
             CAST(floor(max(bias)) AS BIGINT) AS bias_e6,
             CAST(floor(max(loa)) AS BIGINT) AS loa_halfwidth_e6,
             CAST(sum(CASE WHEN abs(CAST(dv AS DOUBLE) - bias) > loa
               THEN 1 ELSE 0 END) AS BIGINT) AS outside
           FROM ch2)
         SELECT n, bias_e6, loa_halfwidth_e6, outside,
           outside * 1000000 // n AS outside_e6
         FROM ag""",


    "q525_g_chart" ->
      """WITH ev AS (
           SELECT event_type, epoch_us(ts) AS tm, event_id FROM events),
         rare AS (
           SELECT event_type FROM (
             SELECT event_type, count(*) AS n FROM ev GROUP BY 1
             ORDER BY n, event_type LIMIT 1)),
         gaps AS (
           SELECT (tm - lag(tm) OVER (PARTITION BY event_type
             ORDER BY tm, event_id)) // 1000000 AS gap_s
           FROM ev JOIN rare USING (event_type)
           QUALIFY gap_s IS NOT NULL),
         st AS (
           SELECT count(*) AS n_gaps, CAST(sum(gap_s) AS BIGINT) AS sg
           FROM gaps),
         ch AS (
           SELECT gap_s, n_gaps,
             CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu
           FROM gaps, st),
         ch2 AS (
           SELECT *, mu + 3.0 * sqrt(mu * (mu + 1.0)) AS ucl FROM ch)
         SELECT max(n_gaps) AS n_gaps,
           CAST(floor(max(mu) * 1000.0) AS BIGINT) AS mean_gap_s_e3,
           CAST(floor(max(ucl) * 1000.0) AS BIGINT) AS ucl_s_e3,
           CAST(sum(CASE WHEN CAST(gap_s AS DOUBLE) > ucl THEN 1 ELSE 0
             END) AS BIGINT) AS breaches
         FROM ch2""",


    "q522_p_chart" ->
      """WITH day0 AS (
           SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n_t,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS k_t
           FROM events GROUP BY 1),
         pool AS (
           SELECT CAST(sum(n_t) AS BIGINT) AS n,
             CAST(sum(k_t) AS BIGINT) AS k, count(*) AS n_days
           FROM day0),
         ch AS (
           SELECT day, n_t, k_t, n_days,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS pbar
           FROM day0, pool),
         ch2 AS (
           SELECT *,
             sqrt(pbar * (1.0 - pbar) / CAST(n_t AS DOUBLE)) AS sig,
             CAST(k_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS p_t
           FROM ch),
         ch3 AS (SELECT *, (p_t - pbar) / sig AS z FROM ch2)
         SELECT max(n_days) AS n_days,
           CAST(floor(max(pbar) * 1000000.0) AS BIGINT) AS pbar_e6,
           CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS ooc_days,
           CAST(floor(max(abs(z)) * 1000000.0) AS BIGINT) AS max_abs_z_e6
         FROM ch3""",


    "q524_process_capability" ->
      """WITH ev AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS v, event_id,
             epoch_us(ts) AS tm
           FROM events),
         mid AS (SELECT (min(tm) + max(tm)) // 2 AS b FROM ev),
         rk AS (
           SELECT v, CAST(row_number() OVER (ORDER BY v, event_id)
             AS BIGINT) AS r
           FROM ev, mid WHERE tm < b),
         nf AS (SELECT count(*) AS nf FROM rk),
         specs AS (
           SELECT min(v) AS lsl, max(v) AS usl
           FROM rk, nf
           WHERE r = greatest(nf // 100, 1) OR r = nf * 99 // 100),
         second AS (
           SELECT count(*) AS n2, CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS svv
           FROM ev, mid WHERE tm >= b),
         ch AS (
           SELECT *,
             CAST(sv AS DOUBLE) / CAST(n2 AS DOUBLE) AS m,
             sqrt((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)
               * CAST(sv AS DOUBLE) / CAST(n2 AS DOUBLE))
               / (CAST(n2 AS DOUBLE) - 1.0)) AS sd
           FROM second, specs)
         SELECT n2 AS n_second, lsl, usl,
           CAST(floor((CAST(usl AS DOUBLE) - CAST(lsl AS DOUBLE))
             / (6.0 * sd) * 1000000.0) AS BIGINT) AS cp_e6,
           CAST(floor(least((CAST(usl AS DOUBLE) - m) / (3.0 * sd),
             (m - CAST(lsl AS DOUBLE)) / (3.0 * sd)) * 1000000.0)
             AS BIGINT) AS cpk_e6
         FROM ch""",


    "q520_dfbeta" ->
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
         ch AS (
           SELECT tt,
             (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b,
             ((CAST(n AS DOUBLE) - 1.0)
               * (CAST(sty AS DOUBLE) - CAST(tt AS DOUBLE)
                 * CAST(y AS DOUBLE))
               - (CAST(st AS DOUBLE) - CAST(tt AS DOUBLE))
                 * (CAST(sy AS DOUBLE) - CAST(y AS DOUBLE)))
               / ((CAST(n AS DOUBLE) - 1.0)
                 * (CAST(stt AS DOUBLE) - CAST(tt AS DOUBLE)
                   * CAST(tt AS DOUBLE))
                 - (CAST(st AS DOUBLE) - CAST(tt AS DOUBLE))
                   * (CAST(st AS DOUBLE) - CAST(tt AS DOUBLE))) AS bl
           FROM base, sums)
         SELECT tt,
           CAST(floor(b * 1000000000.0) AS BIGINT) AS b_e9,
           CAST(floor(bl * 1000000000.0) AS BIGINT) AS b_loo_e9,
           CAST(floor((bl - b) * 1000000000.0) AS BIGINT) AS dfbeta_e9
         FROM ch
         ORDER BY abs(CAST(floor((bl - b) * 1000000000.0) AS BIGINT))
           DESC, tt
         LIMIT 10""",


    "q521_xbar_chart" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         wk AS (
           SELECT day // 7 AS week, count(*) AS nd,
             CAST(sum(y) AS BIGINT) // count(*) AS xbar,
             max(y) - min(y) AS rng
           FROM dm GROUP BY 1),
         wk7 AS (SELECT * FROM wk WHERE nd = 7),
         cl AS (
           SELECT count(*) AS n_weeks,
             CAST(sum(xbar) AS BIGINT) // count(*) AS xbb,
             CAST(sum(rng) AS BIGINT) // count(*) AS rbar
           FROM wk7),
         lim AS (
           SELECT *,
             CAST(xbb AS DOUBLE) + 0.419 * CAST(rbar AS DOUBLE) AS uclx,
             CAST(xbb AS DOUBLE) - 0.419 * CAST(rbar AS DOUBLE) AS lclx,
             1.924 * CAST(rbar AS DOUBLE) AS uclr,
             0.076 * CAST(rbar AS DOUBLE) AS lclr
           FROM cl)
         SELECT max(n_weeks) AS n_weeks, max(xbb) AS xbb,
           max(rbar) AS rbar,
           CAST(sum(CASE WHEN CAST(xbar AS DOUBLE) > uclx
             OR CAST(xbar AS DOUBLE) < lclx THEN 1 ELSE 0 END) AS BIGINT)
             AS ooc_x,
           CAST(sum(CASE WHEN CAST(rng AS DOUBLE) > uclr
             OR CAST(rng AS DOUBLE) < lclr THEN 1 ELSE 0 END) AS BIGINT)
             AS ooc_r
         FROM wk7, lim""",


    "q514_capping_impact" ->
      """WITH rk AS (
           SELECT v, CAST(row_number() OVER (ORDER BY v, event_id)
             AS BIGINT) AS r
           FROM (SELECT CAST(floor(value * 100) AS BIGINT) AS v, event_id
                 FROM events)),
         nn AS (
           SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sv FROM rk),
         caps AS (
           SELECT CASE WHEN r = n * 90 // 100 THEN CAST(90 AS BIGINT)
             ELSE CAST(99 AS BIGINT) END AS pct, v AS cap
           FROM rk, nn
           WHERE r = n * 90 // 100 OR r = n * 99 // 100)
         SELECT pct, cap,
           CAST(sum(CASE WHEN v > cap THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // count(*) AS touched_e6,
           CAST(sum(CASE WHEN v > cap THEN v - cap ELSE 0 END) AS BIGINT)
             AS mass_removed,
           CAST(sum(CASE WHEN v > cap THEN v - cap ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(v) AS BIGINT) AS mass_share_e6
         FROM rk, caps
         GROUP BY 1, 2""",


    "q505_boxcox_grid" -> {
      def zSql(lam: Double): String =
        if (lam == 0.0) "ln(CAST(xv AS DOUBLE))"
        else if (lam == 1.0) "CAST(xv AS DOUBLE) - 1.0"
        else if (lam == 0.5) "(sqrt(CAST(xv AS DOUBLE)) - 1.0) / 0.5"
        else if (lam == -0.5)
          "(1.0 / sqrt(CAST(xv AS DOUBLE)) - 1.0) / -0.5"
        else "(1.0 / CAST(xv AS DOUBLE) - 1.0) / -1.0"
      val arms = Seq(-1.0, -0.5, 0.0, 0.5, 1.0).map { lam =>
        s"""SELECT CAST(${(lam * 10).toLong} AS BIGINT) AS lam_e1,
             count(*) AS n, CAST(sum(z_e6) AS BIGINT) AS sz,
             CAST(sum(CAST(floor(CAST(z_e6 AS DOUBLE)
               * CAST(z_e6 AS DOUBLE) / 1000000.0) AS BIGINT))
               AS BIGINT) AS szz_e6,
             CAST(sum(lx_e6) AS BIGINT) AS slx
           FROM (
             SELECT CAST(floor((${zSql(lam)}) * 1000000.0) AS BIGINT)
               AS z_e6,
               CAST(floor(ln(CAST(xv AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS lx_e6
             FROM xsrc)"""
      }.mkString("\n         UNION ALL ")
      s"""WITH xsrc AS (
           SELECT greatest(n_chars, 1) AS xv FROM documents),
         grids AS ($arms),
         ll AS (
           SELECT lam_e1, n,
             CAST(floor(((0.0 - CAST(n AS DOUBLE)) / 2.0
               * ln((CAST(szz_e6 AS DOUBLE) / 1000000.0
                 - (CAST(sz AS DOUBLE) / 1000000.0)
                   * (CAST(sz AS DOUBLE) / 1000000.0)
                   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
               + (CAST(lam_e1 AS DOUBLE) / 10.0 - 1.0)
                 * (CAST(slx AS DOUBLE) / 1000000.0)) * 1000.0)
               AS BIGINT) AS ll_e3
           FROM grids)
         SELECT a.lam_e1, a.n, a.ll_e3,
           ((SELECT count(*) FROM ll b WHERE b.ll_e3 > a.ll_e3
             OR (b.ll_e3 = a.ll_e3 AND b.lam_e1 < a.lam_e1)) = 0)
             AS best
         FROM ll a"""
    },


    "q498_seed_sensitivity" -> {
      val h60s = TrainingShared.h60(
        "concat('salt', CAST(salt AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")
      s"""WITH f AS (
           SELECT doc_id, ${TrainingShared.keepRuleSql} AS keep
           FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         full0 AS (
           SELECT count(*) AS n_pop, CAST(sum(keep) AS BIGINT) AS k_pop
           FROM f),
         salts AS (
           SELECT salt, count(*) AS m,
             CAST(sum(keep) AS BIGINT) * 1000000 // count(*) AS r_e6
           FROM f, (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS salt)
           WHERE ($h60s) % 7 = 0
           GROUP BY 1),
         ag AS (
           SELECT count(*) AS n_salts, CAST(sum(m) AS BIGINT) AS sm,
             CAST(sum(r_e6) AS BIGINT) AS sr,
             CAST(sum(r_e6 * r_e6) AS BIGINT) AS srr
           FROM salts),
         ch AS (
           SELECT *, CAST(k_pop AS DOUBLE) / CAST(n_pop AS DOUBLE) AS p,
             (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
               * CAST(sr AS DOUBLE) / CAST(n_salts AS DOUBLE))
               / (CAST(n_salts AS DOUBLE) - 1.0) AS var_obs
           FROM ag, full0),
         ch2 AS (
           SELECT *, p * (1.0 - p)
             / (CAST(sm AS DOUBLE) / CAST(n_salts AS DOUBLE))
             * 1000000000000.0 AS var_pred
           FROM ch)
         SELECT n_salts, sr // n_salts AS mean_rate_e6,
           k_pop * 1000000 // n_pop AS full_rate_e6,
           CAST(floor(sqrt(var_obs)) AS BIGINT) AS sd_obs_e6,
           CAST(floor(sqrt(var_pred)) AS BIGINT) AS sd_pred_e6
         FROM ch2"""
    },


    "q499_median_ci" ->
      """WITH rk AS (
           SELECT v, CAST(row_number() OVER (ORDER BY v, event_id)
             AS BIGINT) AS r
           FROM (SELECT CAST(floor(value * 100) AS BIGINT) AS v, event_id
                 FROM events)),
         nn AS (
           SELECT count(*) AS n,
             CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS median2
           FROM rk),
         b AS (
           SELECT n, median2,
             greatest(1, CAST(floor(CAST(n AS DOUBLE) / 2.0
               - 1.959964 * sqrt(CAST(n AS DOUBLE)) / 2.0) AS BIGINT))
               AS lo_rank,
             least(n, CAST(ceil(CAST(n AS DOUBLE) / 2.0 + 1.0
               + 1.959964 * sqrt(CAST(n AS DOUBLE)) / 2.0) AS BIGINT))
               AS hi_rank
           FROM nn)
         SELECT n, lo_rank, hi_rank, median2,
           min(CASE WHEN r = lo_rank THEN v END) AS v_lo,
           min(CASE WHEN r = hi_rank THEN v END) AS v_hi
         FROM rk, b WHERE r = lo_rank OR r = hi_rank
         GROUP BY 1, 2, 3, 4""",


    "q495_generalized_esd" -> {
      val rounds = (1 to 5).map { i =>
        val excl = if (i == 1) "" else
          " WHERE event_id NOT IN (" +
            (1 until i).map(j => s"SELECT event_id FROM p$j")
              .mkString(" UNION ALL ") + ")"
        s"""rem$i AS MATERIALIZED (SELECT * FROM base$excl),
         st$i AS MATERIALIZED (
           SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS ss
           FROM rem$i),
         p$i AS MATERIALIZED (
           SELECT CAST($i AS BIGINT) AS round, event_id, v,
             CAST(floor(abs(CAST(v AS DOUBLE)
               - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt((CAST(ss AS DOUBLE) - CAST(sv AS DOUBLE)
                 * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0)) * 1000000.0) AS BIGINT)
               AS r_e6
           FROM rem$i, st$i
           ORDER BY abs(v * n - sv) DESC, event_id LIMIT 1)"""
      }.mkString(",\n         ")
      s"""WITH base AS (
           SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         $rounds
         SELECT * FROM p1 UNION ALL SELECT * FROM p2
         UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
         UNION ALL SELECT * FROM p5"""
    },


    "q496_leverage_audit" ->
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
         lev AS (
           SELECT tt,
             CAST(floor((1.0 / CAST(n AS DOUBLE)
               + (CAST(tt AS DOUBLE) - CAST(st AS DOUBLE)
                 / CAST(n AS DOUBLE))
                 * (CAST(tt AS DOUBLE) - CAST(st AS DOUBLE)
                   / CAST(n AS DOUBLE))
                 / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
                   * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)))
               * 1000000000.0) AS BIGINT) AS h_e9,
             CAST(floor((CAST(y AS DOUBLE)
               - (a + b * CAST(tt AS DOUBLE))) * 100.0) AS BIGINT) AS r_e2
           FROM base, co2)
         SELECT tt, h_e9, r_e2
         FROM lev ORDER BY h_e9 DESC, tt LIMIT 10""",


    "q486_trimmed_mean_curve" ->
      """WITH rk AS (
           SELECT v, CAST(row_number() OVER (ORDER BY v, event_id)
             AS BIGINT) AS r
           FROM (SELECT CAST(floor(value * 100) AS BIGINT) AS v, event_id
                 FROM events)),
         nn AS (SELECT count(*) AS n FROM rk),
         trims AS (
           SELECT CAST(t0 AS BIGINT) AS trim_pm,
             CAST(t0 AS BIGINT) * n // 1000 AS lo,
             n - CAST(t0 AS BIGINT) * n // 1000 AS hi
           FROM (SELECT unnest([0, 10, 50, 100]) AS t0), nn)
         SELECT trim_pm, count(*) AS n_kept,
           CAST(sum(v) AS BIGINT) * 1000000 // count(*) AS mean_e6
         FROM rk, trims WHERE r > lo AND r <= hi GROUP BY 1""",


    "q485_block_bootstrap" -> {
      val h60bb = TrainingShared.h60(
        "concat('bb:', CAST(r AS VARCHAR), ':', CAST(j AS VARCHAR))")
      s"""WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         rk AS (
           SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS p, y
           FROM dm),
         dd AS (
           SELECT count(*) AS dn, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy
           FROM rk),
         starts AS (
           SELECT r, dn, ($h60bb) % dn AS st
           FROM (SELECT CAST(r0 AS BIGINT) AS r,
                   CAST(j0 AS BIGINT) AS j, dn
                 FROM (SELECT unnest(range(0, 32)) AS r0), dd,
                   (SELECT unnest(range(0, 50000)) AS j0)
                 WHERE j0 < dn // 10)),
         picks AS (
           SELECT r, (st + CAST(m0 AS BIGINT)) % dn + 1 AS p
           FROM starts, (SELECT unnest(range(0, 10)) AS m0)),
         reps AS (
           SELECT r, CAST(sum(y) AS BIGINT) * 100 // count(*) AS m_e2
           FROM picks JOIN rk USING (p) GROUP BY 1),
         ag AS (
           SELECT count(*) AS n_reps, CAST(sum(m_e2) AS BIGINT) AS sm,
             CAST(sum(m_e2 * m_e2) AS BIGINT) AS smm
           FROM reps),
         ch AS (
           SELECT *,
             (CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
               / CAST(n_reps AS DOUBLE)) / (CAST(n_reps AS DOUBLE) - 1.0)
               / 10000.0 AS boot_var,
             ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(dn AS DOUBLE)) / (CAST(dn AS DOUBLE) - 1.0))
               / CAST(dn AS DOUBLE) AS naive_var
           FROM ag, dd)
         SELECT dn AS n_days, n_reps,
           CAST(floor(boot_var * 1000000.0) AS BIGINT) AS boot_var_e6,
           CAST(floor(naive_var * 1000000.0) AS BIGINT) AS naive_var_e6,
           CASE WHEN naive_var > 0.0
             THEN CAST(floor(boot_var / naive_var * 1000000.0) AS BIGINT)
             ELSE 0 END AS ratio_e6
         FROM ch"""
    },


    "q437_quantile_normalization" ->
      """WITH docs AS (SELECT source, n_chars AS v FROM documents),
         g AS (SELECT v, count(*) AS gn FROM docs GROUP BY 1),
         gc AS (
           SELECT v AS gv,
             CAST(sum(gn) OVER (ORDER BY v) AS BIGINT) AS gcum,
             CAST(sum(gn) OVER (ORDER BY v) - gn AS BIGINT) AS gprev
           FROM g),
         nn AS (SELECT count(*) AS n FROM docs),
         sc AS (
           SELECT source, v, count(*) AS sn
           FROM docs GROUP BY 1, 2),
         sc2 AS (
           SELECT source, v, sn,
             CAST(sum(sn) OVER (PARTITION BY source ORDER BY v)
               AS BIGINT) AS rs
           FROM sc),
         ns AS (SELECT source, count(*) AS n_s FROM docs GROUP BY 1),
         tt AS (
           SELECT sc2.source, sc2.v, sc2.sn, sc2.rs,
             (sc2.rs * nn.n + ns.n_s - 1) // ns.n_s AS tgt
           FROM sc2 JOIN ns USING (source) CROSS JOIN nn)
         SELECT source, v, sn, rs, tgt, gv AS mapped
         FROM tt JOIN gc ON gprev < tgt AND tgt <= gcum""",


    "q429_eb_shrinkage" ->
      s"""WITH f AS (
           SELECT source, ${TrainingShared.keepRuleSql} AS keep
           FROM (SELECT source, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         per AS (
           SELECT source, count(*) AS n_s,
             CAST(sum(keep) AS BIGINT) AS k_s
           FROM f GROUP BY 1),
         prior AS (
           SELECT count(*) AS h,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(k_s AS DOUBLE) / CAST(n_s AS DOUBLE)
                 ORDER BY source)), (a, x) -> a + x) AS sp,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(k_s AS DOUBLE) / CAST(n_s AS DOUBLE))
                 * (CAST(k_s AS DOUBLE) / CAST(n_s AS DOUBLE))
                 ORDER BY source)), (a, x) -> a + x) AS spp
           FROM per),
         j AS (
           SELECT per.*, prior.h, prior.sp, prior.spp,
             prior.sp / CAST(prior.h AS DOUBLE) AS mu,
             (prior.spp - prior.sp * prior.sp / CAST(prior.h AS DOUBLE))
               / (CAST(prior.h AS DOUBLE) - 1.0) AS v
           FROM per CROSS JOIN prior),
         k AS (
           SELECT *, CASE WHEN v > 0.0
             THEN mu * (1.0 - mu) / v - 1.0 ELSE 0.0 END AS mm
           FROM j)
         SELECT source, n_s, k_s,
           k_s * 1000000 // n_s AS raw_e6,
           CAST(floor(mu * 1000000.0) AS BIGINT) AS mu_e6,
           CASE WHEN mm > 0.0
             THEN CAST(floor((CAST(k_s AS DOUBLE) + mm * mu)
               / (CAST(n_s AS DOUBLE) + mm) * 1000000.0) AS BIGINT)
             ELSE k_s * 1000000 // n_s END AS shrunk_e6
         FROM k""",


    "q430_jackknife_ratio" ->
      """WITH st AS (
           SELECT l_returnflag AS stratum,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS y_h,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x_h
           FROM lineitem GROUP BY 1),
         tot AS (
           SELECT count(*) AS h, CAST(sum(y_h) AS BIGINT) AS yy,
             CAST(sum(x_h) AS BIGINT) AS xx
           FROM st),
         f AS (
           SELECT t.h, t.yy, t.xx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(t.yy AS DOUBLE) - CAST(s.y_h AS DOUBLE))
                 / (CAST(t.xx AS DOUBLE) - CAST(s.x_h AS DOUBLE))
                 ORDER BY s.stratum)), (a, x) -> a + x) AS s1,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(((CAST(t.yy AS DOUBLE) - CAST(s.y_h AS DOUBLE))
                 / (CAST(t.xx AS DOUBLE) - CAST(s.x_h AS DOUBLE)))
                 * ((CAST(t.yy AS DOUBLE) - CAST(s.y_h AS DOUBLE))
                 / (CAST(t.xx AS DOUBLE) - CAST(s.x_h AS DOUBLE)))
                 ORDER BY s.stratum)), (a, x) -> a + x) AS s2
           FROM st s CROSS JOIN tot t GROUP BY t.h, t.yy, t.xx)
         SELECT h, yy, xx,
           (yy // xx) * 1000000 + ((yy % xx) * 1000000) // xx AS r_hat_e6,
           CAST(floor((s1 / CAST(h AS DOUBLE)) * 1000000.0) AS BIGINT)
             AS r_jk_mean_e6,
           CASE WHEN h > 1
             THEN CAST(floor(((CAST(h AS DOUBLE) - 1.0) / CAST(h AS DOUBLE)
               * (s2 - s1 * s1 / CAST(h AS DOUBLE))) * 1000000.0) AS BIGINT)
             ELSE 0 END AS var_jk_e6
         FROM f""",

    "q254_quantile_transform" ->
      """WITH r AS (
           SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rnk,
             count(*) OVER (PARTITION BY event_type) AS cnt
           FROM events)
         SELECT event_id, event_type, rnk,
           (rnk - 1) * 1000000 // (cnt - 1) AS cdf_e6
         FROM r WHERE cnt > 1""",

    "q156_mad_outliers" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS v_e2
           FROM events),
         med AS (
           SELECT event_type, quantile_cont(v_e2, 0.5) AS med
           FROM ev GROUP BY 1),
         dev AS (
           SELECT e.event_id, e.event_type, e.v_e2,
             abs(CAST(e.v_e2 AS DOUBLE) - m.med) AS dev
           FROM ev e JOIN med m USING (event_type)),
         mad AS (
           SELECT event_type, quantile_cont(dev, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT d.event_id, d.event_type, d.v_e2,
           d.dev > a.mad * 3.0 AS is_outlier
         FROM dev d JOIN mad a USING (event_type)""",


    "q315_median_of_means" ->
      """WITH bm AS (
           SELECT event_type, event_id % 10 AS bkt,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m_e2
           FROM events GROUP BY 1, 2),
         g AS (
           SELECT event_type, count(*) AS n_buckets,
             list_sort(list(m_e2)) AS ms
           FROM bm GROUP BY 1)
         SELECT event_type, n_buckets,
           ms[CAST((len(ms) + 1) // 2 AS INT)]
             + ms[CAST(len(ms) // 2 + 1 AS INT)] AS mom_x2_e2
         FROM g""",

  )
}
