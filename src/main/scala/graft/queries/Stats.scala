package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions

/** Statistical analysis operators: per-group OLS regression, a pairwise
  * correlation matrix, and a chi-square independence test — the "does
  * indicator X track indicator Y" layer the reference runs in Stata/R
  * after Spark has built the panel (news-analytics dynamic factor inputs,
  * `news-analytics/code/2_compute_sentiment_index.do`; wealth-vs-mobility
  * regressions in `gps-analytics/src/wbgps/analysis.py`).
  *
  * Cross-engine determinism: every aggregation is an exact integer sum
  * (BIGINT-safe at bench scale — bounds documented per query); the
  * floating-point tail (slope, corr, chi-square) is a fixed parenthesized
  * chain of IEEE double ops both engines evaluate identically, then
  * floor-scaled to integer micro-units. Where a float fold over many terms
  * is unavoidable (chi-square cell sum), the cells are folded in a pinned
  * sort order, the q116/q127 rule.
  *
  * Scale shape: each statistic is one map-side-combinable aggregation over
  * the fact table (14 sums for the 4x4 correlation matrix), so the only
  * shuffle is the tiny per-group sum exchange; nothing here widens with
  * row count.
  */
object Stats {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private def d(c: Column): Column = c.cast("double")
  private def e6(c: Column): Column = floor(c * 1e6).cast("long")

  /** Shared integer measure projection of lineitem for q147/q172 — one
    * definition so a unit-scale change cannot drift between the
    * correlation matrix and the power iteration. `liMeasuresSql` is its
    * oracle mirror.
    */
  private def liMeasures(s: SparkSession, d0: String): DataFrame =
    t(s, d0, "lineitem").select(
      col("l_quantity").cast("long").as("m0"),
      floor(col("l_extendedprice")).cast("long").as("m1"),
      floor(col("l_discount") * 100).cast("long").as("m2"),
      floor(col("l_tax") * 100).cast("long").as("m3"))

  private val liMeasuresSql: String =
    """SELECT CAST(l_quantity AS BIGINT) AS m0,
             CAST(floor(l_extendedprice) AS BIGINT) AS m1,
             CAST(floor(l_discount * 100) AS BIGINT) AS m2,
             CAST(floor(l_tax * 100) AS BIGINT) AS m3
           FROM lineitem"""

  /** One-way ANOVA F + eta² from per-group integer sums — shared by
    * q431 (raw values) and q432 (Brown–Forsythe deviations) so the F
    * machinery cannot drift between them. Input: (g, x) with x long;
    * output one row (n_total, k_groups, f_e6, eta2_e6). Between/within
    * SS via the Σx/Σx² identities; the per-group s²/n terms fold in
    * sorted group order, then one pinned double chain. `anovaSqlFor`
    * is the oracle twin.
    */
  private def anovaFromSums(xs: DataFrame): DataFrame =
    xs.groupBy("g").agg(count(lit(1)).as("n_t"), sum("x").as("s_t"),
        sum(col("x") * col("x")).as("ss_t"))
      .agg(count(lit(1)).as("k_groups"), sum("n_t").as("n_total"),
        sum("s_t").as("s_all"), sum("ss_t").as("ss_all"),
        array_sort(collect_list(struct(col("g"), col("s_t"), col("n_t"))))
          .as("ps"))
      .withColumn("a", aggregate(transform(col("ps"),
        p => p.getField("s_t").cast("double") *
          p.getField("s_t").cast("double") /
          p.getField("n_t").cast("double")), lit(0.0d), (acc, x) => acc + x))
      .withColumn("ssb", col("a") -
        d(col("s_all")) * d(col("s_all")) / d(col("n_total")))
      .withColumn("ssw", d(col("ss_all")) - col("a"))
      .withColumn("sst", d(col("ss_all")) -
        d(col("s_all")) * d(col("s_all")) / d(col("n_total")))
      .select(col("n_total"), col("k_groups"),
        when(col("ssw") > 0.0d && col("k_groups") > 1L &&
            col("n_total") > col("k_groups"),
          floor((col("ssb") / (d(col("k_groups")) - 1.0d)) /
            (col("ssw") / (d(col("n_total")) - d(col("k_groups")))) * 1e6)
            .cast("long")).otherwise(lit(0L)).as("f_e6"),
        when(col("sst") > 0.0d,
          floor(col("ssb") / col("sst") * 1e6).cast("long"))
          .otherwise(lit(0L)).as("eta2_e6"))

  /** Oracle twin of `anovaFromSums`: expects a CTE named `xs(g, x)` in
    * scope and emits the rest of the query text.
    */
  private def anovaSqlTail: String =
    """per AS (
           SELECT g, count(*) AS n_t, CAST(sum(x) AS BIGINT) AS s_t,
             CAST(sum(x * x) AS BIGINT) AS ss_t
           FROM xs GROUP BY 1),
         agg AS (
           SELECT count(*) AS k_groups, CAST(sum(n_t) AS BIGINT) AS n_total,
             CAST(sum(s_t) AS BIGINT) AS s_all,
             CAST(sum(ss_t) AS BIGINT) AS ss_all,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)
                 / CAST(n_t AS DOUBLE) ORDER BY g)),
               (acc, x) -> acc + x) AS a
           FROM per),
         ch AS (
           SELECT *,
             a - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
               / CAST(n_total AS DOUBLE) AS ssb,
             CAST(ss_all AS DOUBLE) - a AS ssw,
             CAST(ss_all AS DOUBLE)
               - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
               / CAST(n_total AS DOUBLE) AS sst
           FROM agg)
         SELECT n_total, k_groups,
           CASE WHEN ssw > 0.0 AND k_groups > 1 AND n_total > k_groups
             THEN CAST(floor((ssb / (CAST(k_groups AS DOUBLE) - 1.0))
               / (ssw / (CAST(n_total AS DOUBLE)
                 - CAST(k_groups AS DOUBLE))) * 1000000.0) AS BIGINT)
             ELSE 0 END AS f_e6,
           CASE WHEN sst > 0.0
             THEN CAST(floor(ssb / sst * 1000000.0) AS BIGINT)
             ELSE 0 END AS eta2_e6
         FROM ch"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Kruskal–Wallis H (1952) — the k-sample rank test extending q286's
    // two-sample Mann–Whitney: do the event types draw value from the
    // same distribution? Midranks with full tie correction, computed
    // WITHOUT a global window: ranks depend only on the distinct-value
    // histogram (domain-bounded, ≤ ~49k cells for v_e2 ∈ [1, 49002]),
    // whose cumulative counts ride PrefixScan.scanLong (q298's two-phase
    // scan); per-type rank sums are then an exact integer join-aggregate
    // against that tiny frame. H's float tail folds the k per-type terms
    // R_t²/(4·n_t) in sorted type order (the q399 collect-fold rule,
    // k = 5 types), then ONE pinned chain with the tie term
    // 1 − ΣT/(N³−N). Midranks ×2 keep .5 ranks integer (r2 = 2·cum_before
    // + n_v + 1). Scale: one scan to the histogram, broadcast-sized
    // distinct-value frame, one per-type aggregate.
    "q427_kruskal_wallis" -> ((s, d0) => {
      val ev = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v_e2"))
      val hist = ev.groupBy("v_e2").agg(count(lit(1)).as("n_v"))
      val ranked = graft.operators.PrefixScan.scanLong(
          hist, "cum_before", "n_v", "sum", inclusive = false, col("v_e2"))
        .withColumn("r2", lit(2L) * col("cum_before") + col("n_v") + 1L)
        .select(col("v_e2"), col("r2"), col("n_v"))
      val perType = ev.groupBy("event_type", "v_e2")
        .agg(count(lit(1)).as("c_tv"))
        .join(broadcast(ranked.drop("n_v")), "v_e2")
        .groupBy("event_type")
        .agg(sum("c_tv").as("n_t"), sum(col("c_tv") * col("r2")).as("r2_t"))
      val ties = hist.agg(
        sum(col("n_v") * col("n_v") * col("n_v") - col("n_v")).as("tie_sum"),
        sum("n_v").as("n_total"))
      perType.agg(count(lit(1)).as("k_groups"),
          array_sort(collect_list(struct(col("event_type"), col("r2_t"),
            col("n_t")))).as("ps"))
        .crossJoin(broadcast(ties))
        .withColumn("s_terms", aggregate(transform(col("ps"),
          x => (x.getField("r2_t").cast("double") *
            x.getField("r2_t").cast("double")) /
            (lit(4.0d) * x.getField("n_t").cast("double"))),
          lit(0.0d), (acc, x) => acc + x))
        .select(col("n_total"), col("k_groups"), col("tie_sum"),
          // guard in the DOUBLE domain: n³ as BIGINT overflows past
          // n ≈ 2.1e6 (the sf10 events table), the double is exact for
          // the comparison's purpose (all-tied ⇔ equality, exact ≤ 2^53)
          when(d(col("tie_sum")) <
              d(col("n_total")) * d(col("n_total")) * d(col("n_total")) -
                d(col("n_total")),
            floor(((lit(12.0d) * col("s_terms") /
              (d(col("n_total")) * (d(col("n_total")) + 1.0d)) -
              lit(3.0d) * (d(col("n_total")) + 1.0d)) /
              (lit(1.0d) - d(col("tie_sum")) /
                (d(col("n_total")) * d(col("n_total")) * d(col("n_total")) -
                  d(col("n_total"))))) * 1e6).cast("long"))
            .otherwise(lit(0L)).as("h_e6"))
    }),

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

    // TOST equivalence test (Schuirmann 1987) — the inference mode a
    // no-difference claim actually requires: two one-sided Welch tests
    // of the weekend–weekday gap against ±δ (δ = 10 cents of daily
    // mean), equivalent iff BOTH reject. A non-significant q527 z is
    // NOT evidence of equivalence; this is. Exact integer sums, one
    // pinned chain per bound.
    "q529_tost_equivalence" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .withColumn("we", (expr("(day + 4) % 7") >= 5L).cast("long"))
      dm.agg(
          sum(when(col("we") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("we") === 1L, col("y")).otherwise(0L)).as("s1"),
          sum(when(col("we") === 1L, col("y") * col("y")).otherwise(0L))
            .as("ss1"),
          sum(when(col("we") === 0L, 1L).otherwise(0L)).as("n0"),
          sum(when(col("we") === 0L, col("y")).otherwise(0L)).as("s0"),
          sum(when(col("we") === 0L, col("y") * col("y")).otherwise(0L))
            .as("ss0"))
        .withColumn("diff", d(col("s1")) / d(col("n1")) -
          d(col("s0")) / d(col("n0")))
        .withColumn("se", sqrt(
          ((d(col("ss1")) - d(col("s1")) * d(col("s1")) / d(col("n1"))) /
            (d(col("n1")) - 1.0d)) / d(col("n1")) +
          ((d(col("ss0")) - d(col("s0")) * d(col("s0")) / d(col("n0"))) /
            (d(col("n0")) - 1.0d)) / d(col("n0"))))
        .withColumn("z_lo", (col("diff") + lit(10.0d)) / col("se"))
        .withColumn("z_hi", (col("diff") - lit(10.0d)) / col("se"))
        .select(col("n1"), col("n0"),
          floor(col("diff") * 1e2).cast("long").as("diff_e2"),
          floor(col("z_lo") * 1e6).cast("long").as("z_lower_e6"),
          floor(col("z_hi") * 1e6).cast("long").as("z_upper_e6"),
          (col("z_lo") > 1.644854d && col("z_hi") < -1.644854d)
            .as("equivalent"))
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

    // Odds-ratio with Woolf's confidence interval — is English
    // associated with passing the quality filter? The 2×2 effect size
    // q148's chi-square tests but does not SIZE, with the log-scale CI
    // ln OR ± 1.96·√(Σ 1/cell) every epidemiology table reports.
    // Exact integer cells (half-corrected if any cell is zero, the
    // Haldane–Anscombe rule, applied identically in both engines);
    // one pinned ln chain.
    "q526_or_ci" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("k"),
          (col("lang") === "en").cast("long").as("e"))
      f.agg(sum(expr("k * e")).as("a"), sum(expr("k * (1 - e)")).as("b"),
          sum(expr("(1 - k) * e")).as("c"),
          sum(expr("(1 - k) * (1 - e)")).as("dd"))
        .withColumn("h", when(col("a") === 0L || col("b") === 0L ||
          col("c") === 0L || col("dd") === 0L, 0.5d).otherwise(0.0d))
        .withColumn("lor", log((d(col("a")) + col("h")) *
          (d(col("dd")) + col("h")) /
          ((d(col("b")) + col("h")) * (d(col("c")) + col("h")))))
        .withColumn("se", sqrt(lit(1.0d) / (d(col("a")) + col("h")) +
          lit(1.0d) / (d(col("b")) + col("h")) +
          lit(1.0d) / (d(col("c")) + col("h")) +
          lit(1.0d) / (d(col("dd")) + col("h"))))
        .select(col("a"), col("b"), col("c"), col("dd"),
          floor(col("lor") * 1e6).cast("long").as("log_or_e6"),
          floor((col("lor") - lit(1.959964d) * col("se")) * 1e6)
            .cast("long").as("ci_lo_e6"),
          floor((col("lor") + lit(1.959964d) * col("se")) * 1e6)
            .cast("long").as("ci_hi_e6"))
    }),

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

    // Jarque–Bera normality test (1980) — skewness and excess kurtosis
    // of the value distribution, combined into JB = n/6·(S² + (K−3)²/4):
    // the moment-based normality gate before any z-test in this file
    // is taken at face value. Exact: Σv³/Σv⁴ overflow int64, so the
    // raw power sums ride decimal(38,0) ↔ HUGEINT (the q446 rule);
    // the moment chains are pinned doubles.
    "q523_jarque_bera" -> ((s, d0) => {
      t(s, d0, "events")
        .select(floor(col("value") * 100).cast("long").as("v"))
        .agg(count(lit(1)).as("n"), sum("v").as("s1"),
          sum(expr("cast(v as decimal(12,0)) * cast(v as decimal(12,0))"))
            .as("s2"),
          sum(expr("""cast(v as decimal(12,0)) * cast(v as decimal(12,0))
            * cast(v as decimal(12,0))""")).as("s3"),
          sum(expr("""cast(v as decimal(12,0)) * cast(v as decimal(12,0))
            * cast(v as decimal(12,0)) * cast(v as decimal(12,0))"""))
            .as("s4"))
        .withColumn("m", col("s1").cast("double") / d(col("n")))
        .withColumn("m2", col("s2").cast("double") / d(col("n")) -
          col("m") * col("m"))
        .withColumn("m3", col("s3").cast("double") / d(col("n")) -
          lit(3.0d) * col("m") * (col("s2").cast("double") / d(col("n"))) +
          lit(2.0d) * col("m") * col("m") * col("m"))
        .withColumn("m4", col("s4").cast("double") / d(col("n")) -
          lit(4.0d) * col("m") * (col("s3").cast("double") / d(col("n"))) +
          lit(6.0d) * col("m") * col("m") *
            (col("s2").cast("double") / d(col("n"))) -
          lit(3.0d) * col("m") * col("m") * col("m") * col("m"))
        .withColumn("skew", col("m3") / (col("m2") * sqrt(col("m2"))))
        .withColumn("kurt", col("m4") / (col("m2") * col("m2")))
        .select(col("n"),
          floor(col("skew") * 1e6).cast("long").as("skew_e6"),
          floor(col("kurt") * 1e6).cast("long").as("kurt_e6"),
          floor(d(col("n")) / 6.0d * (col("skew") * col("skew") +
            (col("kurt") - 3.0d) * (col("kurt") - 3.0d) / 4.0d) * 1e3)
            .cast("long").as("jb_e3"))
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

    // Quality-filter selection-bias table — standardized mean
    // differences (Cohen's d form) between KEPT and DROPPED documents
    // on each covariate (length, tokens, English share): what the
    // filter selects FOR, the same balance diagnostic q311's matching
    // uses, turned on the filter itself. |SMD| > 0.1 is the usual
    // "covariate shifted" flag. One scan, integer sums, pinned chains
    // per covariate row.
    "q513_filter_smd" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("g"),
          explode(expr(
            """array(named_struct('cov', 'n_chars', 'x', n_chars),
                     named_struct('cov', 'n_tokens',
                       'x', cast(size(split(lower(text), ' ')) as bigint)),
                     named_struct('cov', 'is_en',
                       'x', cast(lang = 'en' as bigint)))""")).as("c"))
        .select(col("g"), col("c.cov").as("cov"), col("c.x").as("x"))
      f.groupBy("cov")
        .agg(sum(when(col("g") === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("g") === 1L, col("x")).otherwise(0L)).as("s1"),
          sum(when(col("g") === 1L, col("x") * col("x")).otherwise(0L))
            .as("ss1"),
          sum(when(col("g") === 0L, 1L).otherwise(0L)).as("n0"),
          sum(when(col("g") === 0L, col("x")).otherwise(0L)).as("s0"),
          sum(when(col("g") === 0L, col("x") * col("x")).otherwise(0L))
            .as("ss0"))
        .withColumn("sp2", ((d(col("ss1")) - d(col("s1")) * d(col("s1")) /
          d(col("n1"))) + (d(col("ss0")) - d(col("s0")) * d(col("s0")) /
          d(col("n0")))) / (d(col("n1")) + d(col("n0")) - 2.0d))
        .select(col("cov"), col("n1"), col("n0"),
          when(col("sp2") > 0.0d,
            floor((d(col("s1")) / d(col("n1")) -
              d(col("s0")) / d(col("n0"))) / sqrt(col("sp2")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("smd_e6"))
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

    // Qini uplift curve (Radcliffe 2007) — the UPLIFT readout q293's
    // response-lift cannot give: by score decile (length decile, the
    // deterministic targeting score), the cumulative incremental keeps
    // of "treated" (even doc_id, the A/B proxy) over controls scaled
    // to treated volume: Qini(k) = K_t(k) − K_c(k)·N_t(k)/N_c(k). A
    // flat curve = the score does not find treatment-responsive
    // documents. Exact: integer decile sums, cumulative via a bounded
    // 10-row ordered fold, ONE trunc-div per point.
    "q515_qini_uplift" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(expr("least(n_chars div 200, 9L)").as("dec"),
          (col("doc_id") % 2 === 0).cast("long").as("tr"),
          col("q.keep").cast("long").as("y"))
      val cells = f.groupBy("dec")
        .agg(sum("tr").as("nt"), sum(lit(1L) - col("tr")).as("nc"),
          sum(col("tr") * col("y")).as("kt"),
          sum((lit(1L) - col("tr")) * col("y")).as("kc"))
      // cumulative from the top decile down via the bounded 10×10
      // self-join (window-free — the q439 rule)
      val o = cells.select(col("dec").as("d2"), col("nt").as("nt2"),
        col("nc").as("nc2"), col("kt").as("kt2"), col("kc").as("kc2"))
      cells.join(broadcast(o), col("d2") >= col("dec"))
        .groupBy("dec")
        .agg(sum("nt2").as("cnt"), sum("nc2").as("cnc"),
          sum("kt2").as("ckt"), sum("kc2").as("ckc"))
        .select(col("dec"), col("cnt"), col("cnc"), col("ckt"), col("ckc"),
          expr("""ckt * 1000000 div greatest(cnt, 1L)
            - ckc * 1000000 div greatest(cnc, 1L)""").as("uplift_e6"),
          (col("ckt") - expr("ckc * cnt div greatest(cnc, 1L)"))
            .as("qini"))
    }),

    // Two-donor synthetic control (Abadie-style, closed form) — build
    // a counterfactual for the heaviest event type from a convex
    // combination of the next two types, fitted on the FIRST half of
    // the calendar: w* = ⟨y−d₂, d₁−d₂⟩/‖d₁−d₂‖² (clamped to [0,1]),
    // then report the post-period gap between actual and synthetic —
    // the causal-panel method q235's diff-in-diff approximates with
    // equal weights. Exact: integer daily means; w* one pinned chain
    // from integer pre-period sums; the post gap re-uses w* in e6
    // integer arithmetic. Day-bounded frames after one scan.
    "q510_synthetic_control" -> ((s, d0) => {
      val cell = t(s, d0, "events").select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day", "event_type")
        .agg(expr("sum(v) div count(1)").as("m"))
        .persist() // ranking + the pivot read it
      val t3 = cell.groupBy("event_type").agg(count(lit(1)).as("nd"))
        .orderBy(col("nd").desc, col("event_type").asc).limit(3)
      val roles = t3.crossJoin(broadcast(t3.select(
          col("event_type").as("e2"), col("nd").as("nd2"))))
        .groupBy("event_type", "nd")
        .agg(sum(when(col("nd2") > col("nd") ||
          (col("nd2") === col("nd") && col("e2") < col("event_type")), 1L)
          .otherwise(0L)).as("nb"))
        .select(col("event_type"), (col("nb") + 1L).as("role"))
      val wide = cell.join(broadcast(roles), "event_type")
        .groupBy("day")
        .agg(max(when(col("role") === 1, col("m"))).as("y"),
          max(when(col("role") === 2, col("m"))).as("d1"),
          max(when(col("role") === 3, col("m"))).as("d2"))
        .where(col("y").isNotNull && col("d1").isNotNull &&
          col("d2").isNotNull)
        .persist() // fit + gap read it
      val br = wide.agg(expr("(min(day) + max(day)) div 2").as("b"))
      val fit = wide.crossJoin(broadcast(br)).where(col("day") < col("b"))
        .agg(count(lit(1)).as("n_pre"),
          sum((col("y") - col("d2")) * (col("d1") - col("d2"))).as("num"),
          sum((col("d1") - col("d2")) * (col("d1") - col("d2"))).as("den"))
        .select(col("n_pre"),
          least(lit(1000000L), greatest(lit(0L),
            expr("num * 1000000 div greatest(den, 1L)"))).as("w_e6"))
      wide.crossJoin(broadcast(br)).where(col("day") >= col("b"))
        .crossJoin(broadcast(fit))
        .select(col("day"), col("n_pre"), col("w_e6"),
          (col("y") * 1000000L - (col("w_e6") * col("d1") +
            (lit(1000000L) - col("w_e6")) * col("d2"))).as("gap_e6"))
        .agg(max("n_pre").as("n_pre"), max("w_e6").as("w_e6"),
          count(lit(1)).as("n_post"),
          expr("sum(gap_e6) div count(1)").as("mean_gap_e6"))
    }),

    // Bartlett's test (1937) — the parametric variance-homogeneity
    // test whose robust cousin is q432's Brown–Forsythe: sharper when
    // the data really are normal, which is exactly what a pipeline
    // should check BOTH ways. T = [(N−k)·ln s_p² − Σ(n_i−1)·ln s_i²]/C
    // with the usual correction C. Exact: per-group integer sums; the
    // k per-group ln terms fold in sorted-type order (q399 rule); one
    // pinned chain.
    "q511_bartlett" -> ((s, d0) => {
      val per = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long")
          .as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_t"), sum("v").as("s_t"),
          sum(col("v") * col("v")).as("ss_t"))
      per.agg(count(lit(1)).as("k"), sum("n_t").as("n"),
          array_sort(collect_list(struct(col("event_type"), col("n_t"),
            col("s_t"), col("ss_t")))).as("ps"))
        .withColumn("ssw", aggregate(transform(col("ps"),
          x => x.getField("ss_t").cast("double") -
            x.getField("s_t").cast("double") *
            x.getField("s_t").cast("double") /
            x.getField("n_t").cast("double")),
          lit(0.0d), (acc, x) => acc + x))
        .withColumn("sumln", aggregate(transform(col("ps"),
          x => (x.getField("n_t").cast("double") - 1.0d) *
            log((x.getField("ss_t").cast("double") -
              x.getField("s_t").cast("double") *
              x.getField("s_t").cast("double") /
              x.getField("n_t").cast("double")) /
              (x.getField("n_t").cast("double") - 1.0d))),
          lit(0.0d), (acc, x) => acc + x))
        .withColumn("sumInv", aggregate(transform(col("ps"),
          x => lit(1.0d) / (x.getField("n_t").cast("double") - 1.0d)),
          lit(0.0d), (acc, x) => acc + x))
        .withColumn("sp2", col("ssw") / (d(col("n")) - d(col("k"))))
        .withColumn("cc", lit(1.0d) +
          (col("sumInv") - lit(1.0d) / (d(col("n")) - d(col("k")))) /
          (lit(3.0d) * (d(col("k")) - 1.0d)))
        .select(col("k"), col("n"),
          floor(((
            (d(col("n")) - d(col("k"))) * log(col("sp2")) - col("sumln")) /
            col("cc")) * 1e6).cast("long").as("t_e6"))
    }),

    // Jonckheere–Terpstra test (1954) — monotone trend ACROSS ordered
    // groups (event types in name order): J = Σ over ordered type
    // pairs of the Mann–Whitney count, computed from the distinct-
    // value histograms via cumulative counts (never row pairs — the
    // q286 midrank machinery generalized to k groups). Exact: J×2
    // integer (ties count once), null mean/variance pinned. One scan
    // + bounded histogram joins.
    "q512_jonckheere" -> ((s, d0) => {
      val h = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long")
          .as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("c"))
        .persist() // both pair sides read it
      // densify each type's cumulative over the GLOBAL value grid —
      // a type's cum-below must be defined at values it never took
      val grid = h.select("v").distinct()
        .crossJoin(broadcast(h.select("event_type").distinct()))
      val full = grid.join(h, Seq("event_type", "v"), "left")
        .na.fill(0L, Seq("c"))
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val cum = full.withColumn("cb", coalesce(sum("c").over(wT), lit(0L)))
      val j2 = cum.select(col("event_type").as("ta"), col("v"),
          col("c").as("ca"), col("cb"))
        .join(h.select(col("event_type").as("tb"), col("v"),
          col("c").as("cbv")), "v")
        .where(col("ta") < col("tb"))
        .agg(sum(lit(2L) * col("cbv") * col("cb") +
          col("cbv") * col("ca")).as("j2"))
      val sizes = h.groupBy("event_type").agg(sum("c").as("n_t"))
      val stats = sizes.agg(count(lit(1)).as("k"), sum("n_t").as("n"),
        sum(col("n_t") * col("n_t")).as("sn2"),
        sum(col("n_t") * col("n_t") * (lit(2L) * col("n_t") + 3L))
          .as("sn23"))
      j2.crossJoin(stats)
        .withColumn("mu2", (d(col("n")) * d(col("n")) -
          d(col("sn2"))) / 2.0d)
        .withColumn("vr", (d(col("n")) * d(col("n")) *
          (lit(2.0d) * d(col("n")) + 3.0d) - d(col("sn23"))) / 72.0d)
        .select(col("n"), col("k"), col("j2"),
          when(col("vr") > 0.0d,
            floor((d(col("j2")) / 2.0d - col("mu2") / 2.0d) /
              sqrt(col("vr")) * 1e6).cast("long")).otherwise(lit(0L))
            .as("z_e6"))
    }),

    // Kish effective sample size (1965) — what the q470
    // post-stratification weights COST: ESS = (Σw)²/Σw² of the
    // per-document calibration weights w = (N_h/N)/(n_h/n); the gap
    // to the raw sample size is the variance price of reweighting
    // (weights near 1 ⇒ free; spiky weights ⇒ the sample acts much
    // smaller). Exact: weights are integer e6 trunc-divs, sums exact,
    // ONE pinned chain. One scan + broadcast cell stats.
    "q504_kish_ess" -> ((s, d0) => {
      val docs = t(s, d0, "documents").select(col("lang"), col("doc_id"))
      val pop = docs.groupBy("lang").agg(count(lit(1)).as("nh_pop"))
      val samp = docs.where(col("doc_id") % 7 === 0)
      val sh = samp.groupBy("lang").agg(count(lit(1)).as("nh"))
      val tots = docs.agg(count(lit(1)).as("n_pop"))
        .crossJoin(samp.agg(count(lit(1)).as("n_s")))
      val w = samp.join(broadcast(sh), "lang")
        .join(broadcast(pop), "lang").crossJoin(broadcast(tots))
        .select(expr("(nh_pop * n_s * 1000000) div (n_pop * nh)")
          .as("w_e6"))
      w.agg(count(lit(1)).as("n_sample"), sum("w_e6").as("sw"),
          sum(col("w_e6") * col("w_e6")).as("sww"))
        .select(col("n_sample"),
          floor(d(col("sw")) * d(col("sw")) / d(col("sww"))).cast("long")
            .as("ess"),
          expr("""cast(floor(cast(sw as double) * cast(sw as double)
            / cast(sww as double) / cast(n_sample as double)
            * 1000000.0) as bigint)""").as("ess_ratio_e6"))
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

    // Sign test (the oldest paired test) — on days where the two
    // heaviest event types both report, does one beat the other more
    // often than a coin? The assumption-free floor under q493's
    // signed-rank (which also uses magnitudes): k wins of n nonzero
    // days, z = (2k − n)/√n. Exact integers + one pinned chain.
    "q503_sign_test" -> ((s, d0) => {
      val cell = t(s, d0, "events").select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day", "event_type")
        .agg(expr("sum(v) div count(1)").as("m"))
      val t2 = cell.groupBy("event_type").agg(count(lit(1)).as("nd"))
        .orderBy(col("nd").desc, col("event_type").asc).limit(2)
      val types = t2.crossJoin(broadcast(t2.select(
          col("event_type").as("e2"), col("nd").as("nd2"))))
        .groupBy("event_type", "nd")
        .agg(sum(when(col("nd2") > col("nd") ||
          (col("nd2") === col("nd") && col("e2") < col("event_type")), 1L)
          .otherwise(0L)).as("nb"))
        .select(col("event_type"), (col("nb") + 1L).as("side"))
      cell.join(broadcast(types), "event_type")
        .groupBy("day")
        .agg(max(when(col("side") === 1, col("m"))).as("m1"),
          max(when(col("side") === 2, col("m"))).as("m2"))
        .where(col("m1").isNotNull && col("m2").isNotNull &&
          col("m1") =!= col("m2"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("m1") > col("m2"), 1L).otherwise(0L)).as("k"))
        .select(col("n"), col("k"),
          when(col("n") > 0L,
            floor((lit(2.0d) * d(col("k")) - d(col("n"))) /
              sqrt(d(col("n"))) * 1e6).cast("long")).otherwise(lit(0L))
            .as("z_e6"))
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

    // Gumbel block-maxima fit + return level (Gumbel 1958; the
    // extreme-value "100-year flood" machinery on the metric): weekly
    // maxima of the daily index fitted by method of moments
    // (β = s·√6/π, μ = m̄ − γ·β), then the 52-block return level
    // x_T = μ − β·ln(−ln(1 − 1/52)) — the capacity-planning number
    // "what weekly peak do we see about once a year". Exact integer
    // block maxima and sums; the fit is ONE pinned chain with literal
    // constants (γ, π; sqrt IEEE-exact, scalar ln per the q399
    // precedent).
    "q500_gumbel_return_level" -> ((s, d0) => {
      val wk = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .select(expr("day div 7").as("week"), col("y"))
        .groupBy("week").agg(max("y").as("m"))
      wk.agg(count(lit(1)).as("n_blocks"), sum("m").as("sm"),
          sum(col("m") * col("m")).as("smm"), max("m").as("m_max"))
        .withColumn("mbar", d(col("sm")) / d(col("n_blocks")))
        .withColumn("sd", sqrt((d(col("smm")) -
          d(col("sm")) * d(col("sm")) / d(col("n_blocks"))) /
          (d(col("n_blocks")) - 1.0d)))
        .withColumn("beta", col("sd") * sqrt(lit(6.0d)) /
          lit(3.141592653589793d))
        .withColumn("mu", col("mbar") -
          lit(0.5772156649015329d) * col("beta"))
        .select(col("n_blocks"), col("m_max"),
          floor(col("mu") * 1e6).cast("long").as("mu_e6"),
          floor(col("beta") * 1e6).cast("long").as("beta_e6"),
          floor((col("mu") - col("beta") *
            log(-log(lit(1.0d) - lit(1.0d) / 52.0d))) * 1e6).cast("long")
            .as("rl52_e6"))
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

    // Ratio-estimator efficiency (Cochran) — does the n_chars
    // auxiliary make token-total estimation cheaper? The design
    // decision between mean-per-unit and ratio estimation priced from
    // population sums alone: V_ratio ∝ Σ(y − Rx)² vs V_mpu ∝ Σ(y−ȳ)²;
    // efficiency > 1e6 means the auxiliary pays. Exact integer sums,
    // pinned chains. One scan.
    "q497_ratio_efficiency" -> ((s, d0) => {
      t(s, d0, "documents").select(col("n_chars").as("x"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("rr", d(col("sy")) / d(col("sx")))
        .withColumn("v_ratio", (d(col("syy")) -
          lit(2.0d) * col("rr") * d(col("sxy")) +
          col("rr") * col("rr") * d(col("sxx"))) / (d(col("n")) - 1.0d))
        .withColumn("v_mpu", (d(col("syy")) -
          d(col("sy")) * d(col("sy")) / d(col("n"))) / (d(col("n")) - 1.0d))
        .select(col("n"),
          floor(col("rr") * 1e6).cast("long").as("r_e6"),
          floor(col("v_ratio") * 1e6).cast("long").as("v_ratio_e6"),
          floor(col("v_mpu") * 1e6).cast("long").as("v_mpu_e6"),
          when(col("v_ratio") > 0.0d,
            floor(col("v_mpu") / col("v_ratio") * 1e6).cast("long"))
            .otherwise(lit(0L)).as("efficiency_e6"))
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

    // Wilcoxon signed-rank test (1945) — the PAIRED complement to
    // q286's Mann–Whitney: on days where both the top two event types
    // report, are their daily means systematically ordered? Midranks
    // ×2 of |d| via the bounded self-join count (window-free, ties
    // integer-exact), zero differences dropped per the standard
    // procedure, normal approximation with tie-corrected variance.
    "q493_wilcoxon_signed_rank" -> ((s, d0) => {
      val cell = t(s, d0, "events").select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day", "event_type")
        .agg(expr("sum(v) div count(1)").as("m"))
      val t2 = cell.groupBy("event_type").agg(count(lit(1)).as("nd"))
        .orderBy(col("nd").desc, col("event_type").asc).limit(2)
      val types = t2.crossJoin(broadcast(t2.select(
          col("event_type").as("e2"), col("nd").as("nd2"))))
        .groupBy("event_type", "nd")
        .agg(sum(when(col("nd2") > col("nd") ||
          (col("nd2") === col("nd") && col("e2") < col("event_type")), 1L)
          .otherwise(0L)).as("nb"))
        .select(col("event_type"), (col("nb") + 1L).as("side"))
      val dd = cell.join(broadcast(types), "event_type")
        .groupBy("day")
        .agg(max(when(col("side") === 1, col("m"))).as("m1"),
          max(when(col("side") === 2, col("m"))).as("m2"))
        .where(col("m1").isNotNull && col("m2").isNotNull)
        .select(col("day"), (col("m1") - col("m2")).as("dv"))
        .where(col("dv") =!= 0L)
        .withColumn("ad", abs(col("dv")))
        .persist() // rank self-join reads both sides
      val o = dd.select(col("ad").as("ad2"), col("day").as("day2"))
      val ranked = dd.join(broadcast(o), expr("true"), "left")
        .groupBy("day", "dv", "ad")
        .agg(sum(when(col("ad2") < col("ad"), 1L).otherwise(0L)).as("nlt"),
          sum(when(col("ad2") === col("ad"), 1L).otherwise(0L)).as("neq"))
        .withColumn("r2", lit(2L) * col("nlt") + col("neq") + 1L)
      val ties = dd.groupBy("ad").agg(count(lit(1)).as("tg"))
        .agg(sum(col("tg") * col("tg") * col("tg") - col("tg"))
          .as("tie_sum"))
      ranked.agg(count(lit(1)).as("n"),
          sum(when(col("dv") > 0L, col("r2")).otherwise(0L)).as("w2_plus"))
        .crossJoin(ties)
        .withColumn("mu", d(col("n")) * (d(col("n")) + 1.0d) / 2.0d)
        .withColumn("s2", d(col("n")) * (d(col("n")) + 1.0d) *
          (lit(2.0d) * d(col("n")) + 1.0d) / 6.0d -
          d(col("tie_sum")) / 12.0d)
        .select(col("n"), col("w2_plus"), col("tie_sum"),
          when(col("s2") > 0.0d,
            floor((d(col("w2_plus")) / 2.0d - col("mu") / 2.0d) /
              sqrt(col("s2") / 4.0d) * 1e6).cast("long"))
            .otherwise(lit(0L)).as("z_e6"))
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

    // Friedman test (1937) — do the event types keep the same daily
    // ORDERING? Repeated-measures ranks: within each day (block) the
    // k=5 types are midranked by mean value; χ²_F = 12/(nk(k+1))·ΣR_j²
    // − 3n(k+1), tie-corrected denominator. The blocked complement to
    // q427's independent-sample Kruskal–Wallis. Exact: within-day
    // midranks ×2 via a KEYED window over the 5-row day blocks, all
    // integer until one pinned chain. Scale: one keyed groupBy + a
    // day-bounded frame.
    "q489_friedman" -> ((s, d0) => {
      val cell = t(s, d0, "events").select(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day", "event_type")
        .agg(expr("sum(v) div count(1)").as("m"))
      // keep only complete blocks (all k types present)
      val k = cell.agg(countDistinct("event_type").as("k"))
      val full = cell
        .withColumn("nb", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("day")))
        .crossJoin(broadcast(k)).where(col("nb") === col("k"))
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy("day").orderBy("m")
      val wDM = org.apache.spark.sql.expressions.Window
        .partitionBy("day", "m")
      val ranked = full
        .withColumn("rmin", rank().over(wD).cast("long"))
        .withColumn("tc", count(lit(1)).over(wDM))
        .withColumn("r2", lit(2L) * col("rmin") + col("tc") - 1L)
      val ties = ranked.groupBy("day", "m").agg(count(lit(1)).as("tg"))
        .agg(sum(col("tg") * col("tg") * col("tg") - col("tg"))
          .as("tie_sum"))
      ranked.groupBy("event_type").agg(sum("r2").as("r2_j"),
          count(lit(1)).as("n_blocks"))
        .agg(count(lit(1)).as("kk"), max("n_blocks").as("n"),
          sum(col("r2_j") * col("r2_j")).as("sr2"))
        .crossJoin(ties)
        .withColumn("chi", (lit(12.0d) * (d(col("sr2")) / 4.0d) /
          (d(col("n")) * d(col("kk")) * (d(col("kk")) + 1.0d)) -
          lit(3.0d) * d(col("n")) * (d(col("kk")) + 1.0d)) /
          (lit(1.0d) - d(col("tie_sum")) /
            (d(col("n")) * d(col("kk")) *
              (d(col("kk")) * d(col("kk")) - 1.0d))))
        .select(col("n").as("n_blocks"), col("kk").as("k_groups"),
          col("tie_sum"),
          floor(col("chi") * 1e6).cast("long").as("chi2_e6"))
    }),

    // Pareto-vs-lognormal tail comparison (the Clauset–Shalizi–Newman
    // question, likelihood-ratio form) on token frequencies ≥ 5:
    // which model explains the vocabulary tail — a true power law
    // (q399's Hill α) or a lognormal (the usual impostor)? Closed-form
    // MLE log-likelihoods from Σln x and Σ(ln x)² only; positive LLR →
    // Pareto wins. Exact: per-term ln x floored to e6 before the sums
    // (per-term floor rule), scalar ln calls in ONE pinned chain
    // (libm-consistent per the q399/q443 precedent). Scale: one token
    // scan + one global aggregate.
    "q490_tail_model_lr" -> ((s, d0) => {
      val xmin = 5.0d
      val f = t(s, d0, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .where(col("c") >= 5L)
        .select(floor(log(d(col("c"))) * 1e6).cast("long").as("lx_e6"))
      f.agg(count(lit(1)).as("n"), sum("lx_e6").as("slx"),
          sum(expr("""cast(floor(cast(lx_e6 as double)
            * cast(lx_e6 as double) / 1000000.0) as bigint)"""))
            .as("slx2_e6"))
        .withColumn("slxd", col("slx").cast("double") / 1e6)
        .withColumn("slx2d", col("slx2_e6").cast("double") / 1e6)
        .withColumn("alpha", d(col("n")) /
          (col("slxd") - d(col("n")) * log(lit(xmin))))
        .withColumn("mu", col("slxd") / d(col("n")))
        .withColumn("s2", (col("slx2d") - col("slxd") * col("slxd") /
          d(col("n"))) / d(col("n")))
        .withColumn("ll_par", d(col("n")) * log(col("alpha")) +
          d(col("n")) * col("alpha") * log(lit(xmin)) -
          (col("alpha") + 1.0d) * col("slxd"))
        .withColumn("ll_ln", -col("slxd") - d(col("n")) / 2.0d *
          log(lit(2.0d) * lit(math.Pi) * col("s2")) -
          (col("slx2d") - lit(2.0d) * col("mu") * col("slxd") +
            d(col("n")) * col("mu") * col("mu")) /
          (lit(2.0d) * col("s2")))
        .select(col("n"),
          floor(col("alpha") * 1e6).cast("long").as("alpha_e6"),
          floor(col("mu") * 1e6).cast("long").as("mu_e6"),
          floor(col("s2") * 1e6).cast("long").as("s2_e6"),
          floor((col("ll_par") - col("ll_ln")) * 1e3).cast("long")
            .as("llr_e3"))
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

    // Leave-one-source-out ablation — the mixture diagnostic q390's
    // KNN-Shapley prices per POINT, here per SOURCE and free: from
    // per-source totals alone, what happens to the corpus keep rate
    // and mean length if source s is dropped? The delta column ranks
    // sources by their pull on the global metric — the first table a
    // mixture owner reads before re-weighting (q249/q386 then decide
    // how). Exact integer totals and trunc-divs; deltas are signed
    // (both engines truncate toward zero). One scan, one k-bounded
    // broadcast.
    "q484_source_ablation" -> ((s, d0) => {
      val per = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"),
          sum(col("q.keep").cast("long")).as("k_s"),
          sum("n_chars").as("sl_s"))
      val tot = per.agg(sum("n_s").as("n"), sum("k_s").as("k"),
        sum("sl_s").as("sl"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_s"),
          expr("k * 1000000 div n").as("global_keep_e6"),
          expr("(k - k_s) * 1000000 div (n - n_s)").as("loo_keep_e6"),
          expr("""(k - k_s) * 1000000 div (n - n_s)
            - k * 1000000 div n""").as("delta_keep_e6"),
          expr("(sl - sl_s) * 1000000 div (n - n_s)").as("loo_len_e6"),
          expr("""(sl - sl_s) * 1000000 div (n - n_s)
            - sl * 1000000 div n""").as("delta_len_e6"))
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

    // Successive halving (Jamieson & Talwalkar 2016 — the Hyperband
    // inner loop) over 8 quality-filter configs: evaluate all configs
    // on a 1/8 hash sample, keep the best 4; re-evaluate on 1/4, keep
    // 2; decide on 1/2 — the budget-efficient hyperparameter search a
    // filter-tuning pipeline runs instead of full grid search. Metric:
    // F1 agreement with the reference q53 keep rule. Exact: nested
    // hash samples (bucket = h%8 < s, so rungs reuse smaller rungs'
    // docs), per-(config, bucket) integer confusion sums aggregated
    // once, rung F1s from bucket-prefix sums, selection by bounded
    // self-join rank (window-free, ties → config id). One scan; the
    // rung logic lives on the 8×8 bounded frame.
    "q483_successive_halving" -> ((s, d0) => {
      val grid = for {
        (lm, i) <- Seq(5L, 10L, 20L, 40L).zipWithIndex
        (se, j) <- Seq(0L, 1L).zipWithIndex
      } yield (i * 2 + j, lm, se)
      val gridExpr = grid.map { case (id, lm, se) =>
        s"named_struct('cfg', ${id}L, 'lm', ${lm}L, 'se', ${se}L)"
      }.mkString("array(", ", ", ")")
      val base = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").as("ref"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("nw"),
          (col("q.stop_ratio") * 1000.0d).as("sr_e3"),
          (graft.functions.TextFunctions.hash60(concat(lit("sh:"),
            col("doc_id").cast("string"))) % 8L).as("bucket"))
      val cells = base.select(col("ref"), col("nw"), col("sr_e3"),
          col("bucket"), explode(expr(gridExpr)).as("g"))
        .select(col("g.cfg").as("cfg"), col("bucket"), col("ref"),
          (col("nw") >= col("g.lm") &&
            col("sr_e3") > col("g.se").cast("double")).as("pred"))
        .groupBy("cfg", "bucket")
        .agg(sum(when(col("pred") && col("ref"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && !col("ref"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("pred") && col("ref"), 1L).otherwise(0L)).as("fn"))
        .persist() // three rung prefixes read it
      def f1At(s2: Long): DataFrame = cells.where(col("bucket") < s2)
        .groupBy("cfg")
        .agg(sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"))
        .select(col("cfg"), expr(
          "2 * tp * 1000000 div greatest(2 * tp + fp + fn, 1L)")
          .as(s"f1_s$s2"))
      def topK(df: DataFrame, fcol: String, k: Int): DataFrame = {
        val o = df.select(col("cfg").as("c2"), col(fcol).as("f2"))
        df.join(broadcast(o), expr(
            s"f2 > $fcol OR (f2 = $fcol AND c2 < cfg)"), "left")
          .groupBy("cfg", fcol)
          .agg(count(col("c2")).as("nbet"))
          .where(col("nbet") < k)
          .select(col("cfg"))
      }
      val r1 = f1At(1L)
      val s2 = topK(r1, "f1_s1", 4)
      val r2 = f1At(2L).join(s2, "cfg")
      val s3 = topK(r2, "f1_s2", 2)
      val r3 = f1At(4L).join(s3, "cfg")
      val win = topK(r3, "f1_s4", 1).withColumn("winner", lit(true))
      r1.join(r2, Seq("cfg"), "left")
        .join(r3, Seq("cfg"), "left")
        .join(win, Seq("cfg"), "left")
        .na.fill(false, Seq("winner"))
        .select(col("cfg"), col("f1_s1"), col("f1_s2"), col("f1_s4"),
          col("winner"))
    }),

    // Mutual-information feature ranking — which metadata feature
    // (lang, source, or length decile) carries the most information
    // about the quality-keep label? The feature-selection readout run
    // before training a filter model: MI = Σ p(x,y)·ln(p(x,y)·N /
    // (n_x·n_y)) per feature, cells bounded by the feature domain.
    // Exact: per-cell terms floored to e9 PER TERM then integer-summed
    // (the q278 rule; cell counts ≤ 40 per feature). Scale: one scan,
    // three bounded cell tables.
    "q472_mi_feature_ranking" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("lang"), col("source"),
          expr("least(n_chars div 200, 9L)").as("len_dec"),
          col("q.keep").cast("long").as("y"))
        .persist() // three feature passes read it
      def mi(name: String, c: Column): DataFrame = {
        val cells = f.select(c.cast("string").as("x"), col("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("nxy"))
        val nx = cells.groupBy("x").agg(sum("nxy").as("nx"))
        val ny = cells.groupBy("y").agg(sum("nxy").as("ny"))
        val nn = cells.agg(sum("nxy").as("n"))
        cells.join(nx, "x").join(broadcast(ny), "y")
          .crossJoin(broadcast(nn))
          .withColumn("t_e9", floor(
            (d(col("nxy")) / d(col("n"))) *
            log(d(col("nxy")) * d(col("n")) /
              (d(col("nx")) * d(col("ny")))) * 1e9).cast("long"))
          .agg(count(lit(1)).as("n_cells"), sum("t_e9").as("mi_sum_e9"))
          .select(lit(name).as("feature"), col("n_cells"),
            expr("mi_sum_e9 div 1000").as("mi_e6"))
      }
      mi("lang", col("lang"))
        .unionByName(mi("source", col("source")))
        .unionByName(mi("len_decile", col("len_dec")))
    }),

    // Cluster-sampling design effect (Kish 1965) — events cluster by
    // USER, so n events carry far fewer than n independent draws: the
    // intraclass correlation ρ from the one-way ANOVA components
    // (MSB/MSW over user clusters, unbalanced-size m₀ = (N − Σn²/N)/
    // (k−1)) gives DEFF = 1 + (m₀−1)ρ — the factor every event-level
    // confidence interval must widen by. Exact: per-cluster integer
    // sums; the per-cluster s²/n terms are floored to e2 PER TERM then
    // integer-summed (no k-sized float fold — k is data-sized);
    // everything after is ONE pinned chain. Scale: one keyed groupBy +
    // one global aggregate.
    "q469_design_effect" -> ((s, d0) => {
      val cl = t(s, d0, "events")
        .select(col("user_id"), floor(col("value") * 100).cast("long").as("v"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_c"), sum("v").as("s_c"),
          sum(col("v") * col("v")).as("ss_c"))
      cl.agg(count(lit(1)).as("k"), sum("n_c").as("n"),
          sum("s_c").as("s_all"), sum("ss_c").as("ss_all"),
          sum(col("n_c") * col("n_c")).as("sn2"),
          sum(floor((d(col("s_c")) * d(col("s_c")) / d(col("n_c"))) *
            100.0d).cast("long")).as("a_e2"))
        .withColumn("ssb", col("a_e2").cast("double") / 100.0d -
          d(col("s_all")) * d(col("s_all")) / d(col("n")))
        .withColumn("ssw", d(col("ss_all")) -
          col("a_e2").cast("double") / 100.0d)
        .withColumn("msb", col("ssb") / (d(col("k")) - 1.0d))
        .withColumn("msw", col("ssw") / (d(col("n")) - d(col("k"))))
        .withColumn("m0", (d(col("n")) - d(col("sn2")) / d(col("n"))) /
          (d(col("k")) - 1.0d))
        .withColumn("icc", (col("msb") - col("msw")) /
          (col("msb") + (col("m0") - 1.0d) * col("msw")))
        .select(col("k"), col("n"),
          floor(col("m0") * 1e6).cast("long").as("m0_e6"),
          floor(col("icc") * 1e6).cast("long").as("icc_e6"),
          floor((lit(1.0d) + (col("m0") - 1.0d) * col("icc")) * 1e6)
            .cast("long").as("deff_e6"))
    }),

    // Post-stratified estimator (the survey fix-up when the design
    // can't stratify but the frame can): estimate mean n_chars from
    // the 1-in-7 sample reweighted to the POPULATION language shares
    // W_h = N_h/N — removes the sample's language imbalance bias that
    // the plain mean keeps. Reports plain vs post-stratified vs true
    // means and the post-stratified variance Σ W_h² s_h²/n_h. Exact:
    // integer sums; the h-bounded terms fold in sorted-lang order
    // (q399 rule). The single-margin sibling of q445's two-margin
    // raking. Scale: two scans, h-bounded frames.
    "q470_poststratified_mean" -> ((s, d0) => {
      val docs = t(s, d0, "documents").select(col("lang"), col("doc_id"),
        col("n_chars").as("y"))
      val pop = docs.groupBy("lang").agg(count(lit(1)).as("nh_pop"))
      val samp = docs.where(col("doc_id") % 7 === 0)
        .groupBy("lang")
        .agg(count(lit(1)).as("nh"), sum("y").as("sh"),
          sum(col("y") * col("y")).as("ssh"))
      val tots = docs.agg(count(lit(1)).as("n_pop"), sum("y").as("sy_pop"))
      val j = samp.join(pop, "lang").crossJoin(broadcast(tots))
      j.agg(sum("nh").as("n_sample"), sum("sh").as("sy_s"),
          max("n_pop").as("n_pop"), max("sy_pop").as("sy_pop"),
          array_sort(collect_list(struct(col("lang"), col("nh"),
            col("sh"), col("ssh"), col("nh_pop"), col("n_pop")))).as("ps"))
        .withColumn("pmean", aggregate(transform(col("ps"),
          x => (x.getField("nh_pop").cast("double") /
            x.getField("n_pop").cast("double")) *
            (x.getField("sh").cast("double") /
              x.getField("nh").cast("double"))),
          lit(0.0d), (acc, x) => acc + x))
        .withColumn("pvar", aggregate(transform(col("ps"),
          x => (x.getField("nh_pop").cast("double") /
            x.getField("n_pop").cast("double")) *
            (x.getField("nh_pop").cast("double") /
              x.getField("n_pop").cast("double")) *
            ((x.getField("ssh").cast("double") -
              x.getField("sh").cast("double") *
              x.getField("sh").cast("double") /
              x.getField("nh").cast("double")) /
              (x.getField("nh").cast("double") - 1.0d)) /
            x.getField("nh").cast("double")),
          lit(0.0d), (acc, x) => acc + x))
        .select(col("n_sample"),
          expr("sy_s * 1000000 div n_sample").as("plain_mean_e6"),
          floor(col("pmean") * 1e6).cast("long").as("poststrat_mean_e6"),
          expr("sy_pop * 1000000 div n_pop").as("true_mean_e6"),
          floor(col("pvar") * 1e6).cast("long").as("pvar_e6"))
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

    // Cascade-filter efficiency audit — the two-stage cost model every
    // large-corpus quality pipeline runs on paper, here measured: a
    // cheap stage-1 rule (length ≥ 100, cost 1/doc) gates the expensive
    // stage-2 quality scorer (cost 10/doc) so stage 2 touches only
    // survivors. Reports what the cascade keeps of the full filter's
    // keeps (recall) and the cost ratio — the two numbers that decide
    // whether the cascade ships. Exact integers; one scan, one global
    // aggregate.
    "q462_cascade_filter" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("keep"),
          (col("n_chars") >= 100L).cast("long").as("s1"))
      f.agg(count(lit(1)).as("n"), sum("keep").as("full_keeps"),
          sum(col("s1") * col("keep")).as("cascade_keeps"),
          sum("s1").as("survivors"))
        .select(col("n"), col("full_keeps"), col("cascade_keeps"),
          col("survivors"),
          expr("""CASE WHEN full_keeps > 0
            THEN cascade_keeps * 1000000 div full_keeps
            ELSE 1000000 END""").as("recall_e6"),
          (lit(10L) * col("n")).as("cost_full"),
          (col("n") + lit(10L) * col("survivors")).as("cost_cascade"),
          expr("(n + 10 * survivors) * 1000000 div (10 * n)")
            .as("cost_ratio_e6"))
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

    // Cochran–Armitage trend test (1954/1955) — is the quality-keep
    // rate MONOTONE in document length? The dose-response test a
    // threshold-picker needs where q148's chi-square only says
    // "different": buckets of n_chars (200-char steps, capped at 10)
    // are ordered scores s, and T = Σ s(r − n·p̄) is tested against
    // Var(T) = p̄(1−p̄)(Σs²n − (Σsn)²/N). Exact: all integer bucket
    // sums, ONE pinned double chain for z. Scale: one scan, one
    // bucket-bounded aggregate.
    "q449_cochran_armitage" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(expr("least(n_chars div 200, 9L)").as("sc"),
          col("q.keep").cast("long").as("keep"))
      f.agg(count(lit(1)).as("n"), sum("keep").as("r"),
          sum(col("sc") * col("keep")).as("ssr"),
          sum("sc").as("ssn"), sum(col("sc") * col("sc")).as("ss2n"))
        .withColumn("pbar", d(col("r")) / d(col("n")))
        .withColumn("tt", d(col("ssr")) - col("pbar") * d(col("ssn")))
        .withColumn("vv", col("pbar") * (lit(1.0d) - col("pbar")) *
          (d(col("ss2n")) - d(col("ssn")) * d(col("ssn")) / d(col("n"))))
        .select(col("n"), col("r"),
          floor(col("tt") * 1e6).cast("long").as("t_e6"),
          when(col("vv") > 0.0d,
            floor(col("tt") / sqrt(col("vv")) * 1e6).cast("long"))
            .otherwise(lit(0L)).as("z_e6"))
    }),

    // Cronbach's alpha (1951) — internal consistency of the three
    // binary quality raters: do they measure ONE underlying construct?
    // α = k/(k−1)·(1 − Σ itemvar / totalvar) — the reliability number
    // an annotation pipeline reports alongside q423's agreement. Exact:
    // binary items make Σx² = Σx; all sums integer; α is ONE pinned
    // chain over the six variance terms. Scale: one scan, one global
    // aggregate.
    "q450_cronbach_alpha" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("x1"),
          (col("n_chars") >= 200L).cast("long").as("x2"),
          (size(graft.functions.TextFunctions.tokens(col("text"))) >= 15)
            .cast("long").as("x3"))
        .withColumn("h", col("x1") + col("x2") + col("x3"))
      f.agg(count(lit(1)).as("n"),
          sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
          sum("h").as("sh"), sum(col("h") * col("h")).as("shh"))
        .withColumn("v1", (d(col("n")) * d(col("s1")) -
          d(col("s1")) * d(col("s1"))) / (d(col("n")) * (d(col("n")) - 1.0d)))
        .withColumn("v2", (d(col("n")) * d(col("s2")) -
          d(col("s2")) * d(col("s2"))) / (d(col("n")) * (d(col("n")) - 1.0d)))
        .withColumn("v3", (d(col("n")) * d(col("s3")) -
          d(col("s3")) * d(col("s3"))) / (d(col("n")) * (d(col("n")) - 1.0d)))
        .withColumn("vt", (d(col("n")) * d(col("shh")) -
          d(col("sh")) * d(col("sh"))) / (d(col("n")) * (d(col("n")) - 1.0d)))
        .select(col("n"),
          floor(col("vt") * 1e6).cast("long").as("var_total_e6"),
          when(col("vt") > 0.0d,
            floor(lit(1.5d) * (lit(1.0d) -
              (col("v1") + col("v2") + col("v3")) / col("vt")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("alpha_e6"))
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

    // L-moments (Hosking 1990) — the order-statistics distribution
    // summary that exists wherever moments don't: L-scale, L-skewness
    // τ₃ and L-kurtosis τ₄ from the probability-weighted moments
    // b_k = Σ (r−1)⋯(r−k)·x₍ᵣ₎ / (n(n−1)⋯(n−k)). The scale showcase:
    // global ranks ride Ranking.globalRank (two-phase, no global
    // window), and the rank-weighted sums are EXACT via decimal(38,0)
    // (Spark) ↔ HUGEINT (DuckDB) — r³·x overflows int64 by sf1, and a
    // float sum would be order-dependent. Tie order inside equal x
    // cannot change any b_k (the weight sum over a tie block is
    // order-invariant), so the event_id tiebreak is safe. One pinned
    // double chain per λ/τ at the end.
    "q446_l_moments" -> ((s, d0) => {
      val rk = graft.operators.Ranking.globalRank(
        t(s, d0, "events").select(
          floor(col("value") * 100).cast("long").as("x"), col("event_id")),
        "r", col("x").asc, col("event_id").asc)
      rk.agg(count(lit(1)).as("n"), sum("x").as("s0"),
          sum(expr("cast(r - 1 as decimal(12,0)) * cast(x as decimal(12,0))"))
            .as("s1"),
          sum(expr("""cast(r - 1 as decimal(12,0))
            * cast(r - 2 as decimal(12,0)) * cast(x as decimal(12,0))"""))
            .as("s2"),
          sum(expr("""cast(r - 1 as decimal(12,0))
            * cast(r - 2 as decimal(12,0)) * cast(r - 3 as decimal(12,0))
            * cast(x as decimal(12,0))""")).as("s3"))
        .withColumn("b0", col("s0").cast("double") / d(col("n")))
        .withColumn("b1", col("s1").cast("double") /
          (d(col("n")) * (d(col("n")) - 1.0d)))
        .withColumn("b2", col("s2").cast("double") /
          (d(col("n")) * (d(col("n")) - 1.0d) * (d(col("n")) - 2.0d)))
        .withColumn("b3", col("s3").cast("double") /
          (d(col("n")) * (d(col("n")) - 1.0d) * (d(col("n")) - 2.0d) *
            (d(col("n")) - 3.0d)))
        .withColumn("l2", lit(2.0d) * col("b1") - col("b0"))
        .withColumn("l3", lit(6.0d) * col("b2") - lit(6.0d) * col("b1") +
          col("b0"))
        .withColumn("l4", lit(20.0d) * col("b3") - lit(30.0d) * col("b2") +
          lit(12.0d) * col("b1") - col("b0"))
        .select(col("n"),
          floor(col("b0") * 1e6).cast("long").as("l1_e6"),
          floor(col("l2") * 1e6).cast("long").as("l2_e6"),
          when(col("l2") > 0.0d,
            floor(col("l3") / col("l2") * 1e6).cast("long"))
            .otherwise(lit(0L)).as("t3_e6"),
          when(col("l2") > 0.0d,
            floor(col("l4") / col("l2") * 1e6).cast("long"))
            .otherwise(lit(0L)).as("t4_e6"))
    }),

    // Dalenius–Hodges stratification (the cum-√f rule, 1959) — the
    // survey-design complement to q388's Neyman ALLOCATION: construct
    // the 5 strata boundaries themselves by cutting the cumulative
    // √frequency of the value histogram into equal slices (≈ minimizes
    // within-stratum variance for a fixed stratum count). Exact: per-
    // bucket √f floored to e6 BEFORE the cumulative sum (per-term floor
    // rule), cum via PrefixScan over the domain-bounded histogram,
    // stratum id an integer trunc-div. Reports each stratum's value
    // range, size and mean. Scale: one scan + a bounded-frame scan.
    "q447_dalenius_hodges" -> ((s, d0) => {
      val hist = t(s, d0, "events")
        .select(floor(col("value") * 100).cast("long").as("v"))
        .groupBy("v").agg(count(lit(1)).as("f"))
        .withColumn("sf_e6", floor(sqrt(d(col("f"))) * 1e6).cast("long"))
      val cum = graft.operators.PrefixScan.scanLong(
        hist, "csf", "sf_e6", "sum", inclusive = true, col("v"))
      val tot = cum.agg(max("csf").as("tcsf"))
      cum.crossJoin(broadcast(tot))
        .withColumn("stratum", expr("least((csf - 1) * 5 div tcsf + 1, 5L)"))
        .groupBy("stratum")
        .agg(min("v").as("v_lo"), max("v").as("v_hi"),
          sum("f").as("n_h"), sum(col("f") * col("v")).as("sv"))
        .select(col("stratum"), col("v_lo"), col("v_hi"), col("n_h"),
          expr("sv div n_h").as("mean_v"))
    }),

    // Negative-binomial overdispersion fit (method of moments) — is
    // per-user event activity Poisson or clumped? For each event type,
    // the per-user count distribution's dispersion index v/m and, when
    // overdispersed (v > m), the NB size r = m²/(v−m) — the count-model
    // readout a traffic/abuse model needs before assuming Poisson.
    // Exact: integer per-user counts and Σk/Σk² sums; one pinned double
    // chain per statistic. Scale: one keyed groupBy + one k-bounded
    // aggregate.
    "q448_nb_overdispersion" -> ((s, d0) => {
      t(s, d0, "events").groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sk"),
          sum(col("k") * col("k")).as("skk"))
        .withColumn("m", d(col("sk")) / d(col("n")))
        .withColumn("v", (d(col("skk")) -
          d(col("sk")) * d(col("sk")) / d(col("n"))) / (d(col("n")) - 1.0d))
        .select(col("event_type"), col("n"),
          floor(col("m") * 1e6).cast("long").as("mean_e6"),
          floor(col("v") * 1e6).cast("long").as("var_e6"),
          when(col("m") > 0.0d,
            floor(col("v") / col("m") * 1e6).cast("long")).otherwise(lit(0L))
            .as("dispersion_e6"),
          when(col("v") > col("m"),
            floor(col("m") * col("m") / (col("v") - col("m")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("nb_r_e6"),
          (col("v") > col("m")).as("overdispersed"))
    }),

    // Survey raking / iterative proportional fitting (Deming & Stephan
    // 1940) — calibrate a deterministic 1-in-7 document sample so its
    // weighted (source × lang) cell sums match BOTH population margins:
    // the post-stratification a survey-grade corpus audit runs when
    // the sample is unbalanced on two dimensions at once (q388's Neyman
    // designs the draw; raking repairs it after the fact). Two full IPF
    // rounds (row-fit then column-fit, twice) in exact e6 integer
    // weights with trunc-div factors — the doremi convention, so the
    // oracle replays every round bit-for-bit (unrolled MATERIALIZED
    // CTEs). Scale: margins are one scan each; the iteration lives on
    // the K×L-bounded cell frame with broadcast targets.
    "q445_ipf_raking" -> ((s, d0) => {
      val docs = t(s, d0, "documents").select(col("source"), col("lang"),
        col("doc_id"))
      val samp = docs.where(col("doc_id") % 7 === 0)
      val np = docs.agg(count(lit(1)).as("np"))
      val ns = samp.agg(count(lit(1)).as("ns"))
      val tr = docs.groupBy("source").agg(count(lit(1)).as("rp"))
        .crossJoin(broadcast(np)).crossJoin(broadcast(ns))
        .select(col("source"), expr("rp * ns div np").as("tr"))
      val tc = docs.groupBy("lang").agg(count(lit(1)).as("cp"))
        .crossJoin(broadcast(np)).crossJoin(broadcast(ns))
        .select(col("lang"), expr("cp * ns div np").as("tc"))
      var w = samp.groupBy("source", "lang").agg(count(lit(1)).as("m"))
        .withColumn("w", lit(1000000L))
      for (_ <- 1 to 2) {
        val rs = w.groupBy("source").agg(sum(col("m") * col("w")).as("sw"))
        w = w.join(rs, "source").join(broadcast(tr), "source")
          .withColumn("f", expr("tr * 1000000 * 1000000 div greatest(sw, 1L)"))
          .select(col("source"), col("lang"), col("m"),
            expr("w * f div 1000000").as("w"))
        val cs = w.groupBy("lang").agg(sum(col("m") * col("w")).as("sw"))
        w = w.join(cs, "lang").join(broadcast(tc), "lang")
          .withColumn("f", expr("tc * 1000000 * 1000000 div greatest(sw, 1L)"))
          .select(col("source"), col("lang"), col("m"),
            expr("w * f div 1000000").as("w"))
      }
      w.join(broadcast(tr), "source").join(broadcast(tc), "lang")
        .select(col("source"), col("lang"), col("m"), col("w").as("w_e6"),
          col("tr"), col("tc"))
    }),

    // Systematic PPS sampling (Madow 1949) — the third member of the
    // sampling-design family (q388 allocates, q442 prioritizes): walk
    // the cumulative weight line with stride W/k from a deterministic
    // hash offset; a document is drawn once per grid point in its
    // weight interval (multiplicity-aware), and the Hansen–Hurwitz
    // estimate of Σ tokens is stride·Σ mult·(y/w). Exactly k grid
    // points land by construction — reported as the invariant. Exact:
    // cumulative weights ride PrefixScan, selection and the estimator
    // are integer trunc-divs (everything shifted +stride so no
    // negative division). Scale: one scan + the two-phase prefix scan.
    "q461_systematic_pps" -> ((s, d0) => {
      val docs = t(s, d0, "documents").select(col("doc_id"),
        col("n_chars").as("w"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("y"))
      val cum = graft.operators.PrefixScan.scanLong(
        docs, "cw", "w", "sum", inclusive = false, col("doc_id"))
      val params = docs.agg(sum("w").as("wt"), sum("y").as("y_exact"))
        .withColumn("stride", expr("wt div 50"))
        .withColumn("off",
          graft.functions.TextFunctions.hash60(lit("pps")) % col("stride"))
      cum.crossJoin(broadcast(params))
        .withColumn("mult", expr(
          """(cw + w + stride - 1 - off) div stride
             - (cw + stride - 1 - off) div stride"""))
        .where(col("mult") > 0L)
        .agg(count(lit(1)).as("n_selected"), sum("mult").as("k_points"),
          sum(expr("mult * (y * 1000000 div w)")).as("syw_e6"),
          max("stride").as("stride"), max("y_exact").as("y_exact"))
        .select(col("n_selected"), col("k_points"), col("y_exact"),
          expr("syw_e6 * stride div 1000000").as("y_est"),
          expr("""(syw_e6 * stride div 1000000 - y_exact) * 1000000
            div y_exact""").as("err_e6"))
    }),

    // Priority sampling (Duffield, Lund & Thorup 2007) — the
    // weight-sensitive fixed-size sample with the provably near-optimal
    // subset-sum estimator: priority q_i = w_i/u_i (u_i a deterministic
    // 60-bit hash uniform), keep the top k=32, threshold τ = q₍ₖ₊₁₎,
    // estimate Σw by Σ max(w_i, τ) over the sample. The audit reports
    // the estimate against the exact total (signed e6 error) — what a
    // 100 TB pipeline would ship per partition instead of full sums.
    // Exact replay: priorities are ONE pinned double chain on integer
    // inputs; the top-(k+1) is a bounded sort-limit (TakeOrdered, no
    // global shuffle); the k sample terms fold in sorted doc order.
    "q442_priority_sampling" -> ((s, d0) => {
      val docs = t(s, d0, "documents")
        .select(col("doc_id"), col("n_chars").as("w"),
          TextFunctions.hash60(concat(lit("prio:"),
            col("doc_id").cast("string"))).as("hv"))
        .withColumn("q", d(col("w")) * lit(1152921504606846976.0d) /
          d(col("hv")))
      val top = docs.orderBy(col("q").desc, col("doc_id").asc).limit(33)
      val tau = top.agg(min("q").as("tau"))
      top.crossJoin(broadcast(tau)).where(col("q") > col("tau"))
        .agg(count(lit(1)).as("k_sample"),
          array_sort(collect_list(struct(col("doc_id"),
            greatest(d(col("w")), col("tau")).as("v")))).as("ps"))
        .withColumn("est_d", aggregate(transform(col("ps"),
          x => x.getField("v")), lit(0.0d), (acc, x) => acc + x))
        .crossJoin(broadcast(docs.agg(sum("w").as("exact_total"))))
        .select(col("k_sample"),
          floor(col("est_d")).cast("long").as("est_total"),
          col("exact_total"),
          expr("""(cast(floor(est_d) as bigint) - exact_total) * 1000000
            div exact_total""").as("err_e6"))
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

    // One-way ANOVA (Fisher): does mean value differ across event
    // types? F and the eta-squared effect size from the Σx/Σx²
    // identities — per-group integer sums only, so the whole test is
    // one map-side-combinable aggregate regardless of row count; the
    // k per-group s²/n terms fold in sorted group order (q399 rule)
    // before ONE pinned double chain. The parametric complement to
    // q427's rank-based Kruskal–Wallis over the same panel.
    "q431_anova_oneway" -> ((s, d0) => anovaFromSums(
      t(s, d0, "events").select(col("event_type").as("g"),
        floor(col("value") * 100).cast("long").as("x")))),

    // Brown–Forsythe test (1974) — variance homogeneity across event
    // types, the robust Levene variant: one-way ANOVA on absolute
    // deviations from each group's MEDIAN (medians make it robust to
    // heavy tails where the mean-centered Levene is not). Exact:
    // 2×median of integer v_e2 is an exact integer (percentile of ints
    // at 0.5 is k or k+.5, exact in double), so the deviations
    // z = |2v − med2| stay integer and the F machinery is shared with
    // q431 verbatim. Scale: one scan for the 5 medians (exact
    // percentile per bounded group set), broadcast, one ANOVA scan.
    "q432_brown_forsythe" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(col("event_type").as("g"),
        floor(col("value") * 100).cast("long").as("v"))
      val med = ev.groupBy("g")
        .agg(expr("cast(percentile(v, 0.5) * 2 as bigint)").as("med2"))
      anovaFromSums(ev.join(broadcast(med), "g")
        .select(col("g"), abs(lit(2L) * col("v") - col("med2")).as("x")))
    }),

    // Pairwise Cohen's d / Hedges' g effect sizes between event types —
    // the magnitude readout q161's t-test (significance) does not give:
    // with 100 TB of rows everything is "significant", and the effect
    // size is the number that decides whether a difference MATTERS.
    // Pooled-SD d from the same per-group integer sums as q431
    // ((n−1)·var = Σx² − (Σx)²/n), Hedges' small-sample correction
    // 1 − 3/(4(n1+n2)−9). sqrt is IEEE-exact so the pinned chain
    // replays cross-engine. Scale: one aggregate + a k²-bounded
    // broadcast self-join (k = 5).
    "q433_cohens_d" -> ((s, d0) => {
      val per = t(s, d0, "events")
        .select(col("event_type").as("g"),
          floor(col("value") * 100).cast("long").as("x"))
        .groupBy("g").agg(count(lit(1)).as("n_t"), sum("x").as("s_t"),
          sum(col("x") * col("x")).as("ss_t"))
      val a = per.select(col("g").as("t1"), col("n_t").as("n1"),
        col("s_t").as("s1"), col("ss_t").as("ss1"))
      val b = per.select(col("g").as("t2"), col("n_t").as("n2"),
        col("s_t").as("s2"), col("ss_t").as("ss2"))
      a.crossJoin(broadcast(b)).where(col("t1") < col("t2"))
        .withColumn("sp2",
          ((d(col("ss1")) - d(col("s1")) * d(col("s1")) / d(col("n1"))) +
            (d(col("ss2")) - d(col("s2")) * d(col("s2")) / d(col("n2")))) /
            (d(col("n1")) + d(col("n2")) - 2.0d))
        .select(col("t1"), col("t2"), col("n1"), col("n2"),
          when(col("sp2") > 0.0d,
            floor((d(col("s1")) / d(col("n1")) - d(col("s2")) / d(col("n2"))) /
              sqrt(col("sp2")) * 1e6).cast("long")).otherwise(lit(0L))
            .as("d_e6"),
          when(col("sp2") > 0.0d,
            floor((d(col("s1")) / d(col("n1")) - d(col("s2")) / d(col("n2"))) /
              sqrt(col("sp2")) *
              (lit(1.0d) - lit(3.0d) /
                (lit(4.0d) * (d(col("n1")) + d(col("n2"))) - 9.0d)) *
              1e6).cast("long")).otherwise(lit(0L)).as("g_e6"))
    }),

    // Neyman-optimal stratified sample allocation (Neyman 1934 — the
    // survey-sampling design the reference's World Bank context lives
    // on): allocate a fixed sample budget (500) across event-type strata
    // ∝ N_h·S_h, then APPLY it with a deterministic md5-ranked draw and
    // prove the exact row selection with a bit_xor digest. S_h comes
    // from exact integer sums (n, Σv, Σv², centi-units) via one pinned
    // double chain + IEEE sqrt; N_h·S_h is floored per stratum BEFORE
    // the cross-strata sum, so the shares are merge-order-free. Scale
    // shape: one map-side-combinable 3-sum aggregate per stratum + a
    // broadcast of the bounded allocation table; the exact draw ranks
    // within each stratum on the keyed PrefixScan (a window over the
    // ~10-value event_type would rank the whole table in ~10 tasks;
    // production approximates with q74 threshold sampling).
    "q388_neyman_allocation" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d0, "events").select(col("event_type"), col("event_id"),
        floor(col("value") * 100).cast("long").as("v"))
      val sums = ev.groupBy("event_type").agg(count(lit(1)).as("n_pop"),
        sum("v").as("sv"), sum(col("v") * col("v")).as("svv"))
      val wAll = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val alloc = sums
        .withColumn("nhsh", floor(d(col("n_pop")) *
          sqrt((d(col("svv")) - d(col("sv")) * d(col("sv")) / d(col("n_pop")))
            / (d(col("n_pop")) - 1.0))).cast("long"))
        .withColumn("tot", sum("nhsh").over(wAll))
        .withColumn("alloc", expr("500 * nhsh div tot"))
        .select("event_type", "n_pop", "nhsh", "alloc")
      val ranked = graft.operators.PrefixScan.scanLongKeyed(
        ev.withColumn("hd", md5(col("event_id").cast("string"))),
        Seq("event_type"),
        Seq(graft.operators.PrefixScan.KeyedScanCol("rk", "", "count")),
        asc("hd"), asc("event_id"))
      ranked.join(broadcast(alloc), "event_type")
        .where(col("rk") <= col("alloc"))
        .groupBy("event_type", "n_pop", "nhsh", "alloc")
        .agg(count(lit(1)).as("n_sampled"),
          expr("bit_xor(event_id)").as("sample_xor"))
    }),
    // Spearman rank correlation per group (quantity vs price within each
    // return flag) — the robust monotone-association companion to q147's
    // Pearson matrix. Tie-aware: each value gets its DOUBLED average rank
    // (2·cnt_less + cnt_eq + 1 = 2·rank + cnt_eq − 1, an exact integer),
    // so the moment sums are integers and cross-engine exact; the
    // centered moments come from the algebraic identity Σ(r−(n+1))(s−
    // (n+1)) = Σrs − n(n+1)² (no per-row mean subtraction, no float in
    // the aggregation). rho's float tail is one pinned IEEE chain
    // (div/sqrt are exactly rounded). Int64 bound: moments ≤ 4n³ per
    // group, safe to n ≈ 1.3e6; beyond that switch the three sums to
    // DECIMAL(38,0) accumulators. Scale shape: `flag` has 3 values, so
    // rank() OVER (PARTITION BY flag) would run 3 tasks each sorting the
    // whole table — instead the doubled average rank comes from the
    // tie-count identity 2·(#less) + cnt_eq + 1 on the DISTINCT-value
    // count frame (bounded by the value domain, far below row count),
    // prefix-summed per flag by the keyed PrefixScan and hash-joined
    // back to the rows.
    "q257_spearman" -> ((s, d0) => {
      val li = t(s, d0, "lineitem").select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      def ranks(vcol: String, out: String) = {
        val cnt = li.groupBy("flag", vcol).agg(count(lit(1)).as("cnt"))
        graft.operators.PrefixScan.scanLongKeyed(cnt, Seq("flag"),
            Seq(graft.operators.PrefixScan.KeyedScanCol(
              "cless", "cnt", "sum", inclusive = false)), asc(vcol))
          .select(col("flag"), col(vcol),
            (lit(2L) * col("cless") + col("cnt") + 1L).as(out))
      }
      val r = li
        .join(ranks("x", "r2x"), Seq("flag", "x"))
        .join(ranks("cents", "r2y"), Seq("flag", "cents"))
        .select("flag", "r2x", "r2y")
      val sums = r.groupBy("flag").agg(count(lit(1)).as("n"),
        sum(col("r2x") * col("r2y")).as("sxy"),
        sum(col("r2x") * col("r2x")).as("sxx"),
        sum(col("r2y") * col("r2y")).as("syy"))
      val m = col("n") * (col("n") + 1L) * (col("n") + 1L)
      sums.select(col("flag"), col("n"),
          (col("sxy") - m).as("cov2"), (col("sxx") - m).as("varx2"),
          (col("syy") - m).as("vary2"))
        .withColumn("rho_e6",
          when(col("varx2") > 0L && col("vary2") > 0L,
            floor(d(col("cov2")) /
              sqrt(d(col("varx2")) * d(col("vary2"))) * 1e6).cast("long")))
    }),

    // UCB1 bandit scores per arm (Auer, Cesa-Bianchi, Fischer 2002) —
    // the batch scoring step of an explore/exploit loop: each arm
    // (event type) gets mean reward + sqrt(2 ln N / n). Counts and the
    // integerized mean are exact; the confidence-bound tail is one
    // pinned IEEE chain (the q127 libm-parity precedent), floored to e6.
    // One keyed aggregate + a 1-row broadcast: nothing scales past the
    // arm count.
    // Inverse-propensity-score offline policy evaluation (Horvitz &
    // Thompson 1952; Li et al. 2011 WSDM — the counterfactual eval that
    // lets you score a NEW action policy on LOGGED data): contexts are
    // user cohorts (user_id % 10), actions are event types, reward is
    // value ≥ 100. The candidate policy is greedy-by-mean-reward fit on
    // the even-event_id half; it is evaluated on the odd half with
    // empirical logging propensities p(a|x) = c_xa/c_x, so each matching
    // event contributes r/p — all integer rationals: w_e6 = c_x·1e6 div
    // c_xa, ips contribution = Σr·w_e6, per-context estimate div c_x.
    // Scale shape: two keyed (x, a) aggregates + a broadcast of the
    // bounded policy table; nothing scales past contexts × actions.
    // Good–Turing frequency re-estimation (Good 1953) over the corpus
    // vocabulary — the smoothing table behind Katz/SGT language models
    // and the "how much probability mass belongs to UNSEEN words"
    // question (P_unseen = N_1/N): from the frequency-of-frequencies
    // N_r, the adjusted count r* = (r+1)·N_{r+1}/N_r for r = 1..10.
    // Exact: token counts and N_r are integers; r* is one e6 trunc-div.
    // Scale shape: token groupBy (map-combinable) → count-of-counts
    // groupBy → the bounded r ≤ 10 frame with a self-join on r+1;
    // nothing beyond two keyed aggregates touches data size.
    "q417_good_turing" -> ((s, d0) => {
      val tok = t(s, d0, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("r"))
      val nr = tok.groupBy("r").agg(count(lit(1)).as("n_r"))
      val tot = tok.agg(sum("r").as("n_tokens"), count(lit(1)).as("v"))
      nr.where(col("r") <= 10L)
        .join(nr.select((col("r") - 1L).as("r"), col("n_r").as("n_r1")),
          Seq("r"), "left")
        .na.fill(0L, Seq("n_r1"))
        .crossJoin(broadcast(tot))
        .select(col("r"), col("n_r"), col("n_r1"),
          expr("(r + 1) * n_r1 * 1000000 div n_r").as("r_star_e6"),
          col("n_tokens"), col("v"),
          expr("n_r * 1000000 div n_tokens").as("mass_share_e6"))
    }),

    // Mantel–Haenszel pooled odds ratio (Mantel & Haenszel 1959) — the
    // stratified-confounding answer to "does exposure move the outcome
    // once event_type is controlled for": per stratum the 2×2 table
    // (exposure = even user_id, outcome = value ≥ 100), pooled as
    // OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) — Simpson's-paradox-proof where
    // the crude pooled OR is not. Exact: each stratum term is one e6
    // trunc-div on integer cell products, the final ratio one more.
    // Scale shape: ONE map-side 4-way conditional-count aggregate per
    // stratum; everything after lives on the bounded strata frame.
    // Int64 bound: a·d·1e6 caps at ~3e6 rows per stratum — past that
    // switch the stratum terms to e3 scaling (same pattern).
    "q418_mantel_haenszel" -> ((s, d0) => {
      val cells = t(s, d0, "events")
        .select(col("event_type"),
          (col("user_id") % 2 === 0).as("exp"),
          (col("value") >= 100.0).as("out"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("exp") && col("out"), 1L).otherwise(0L)).as("a"),
          sum(when(col("exp") && !col("out"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("exp") && col("out"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("exp") && !col("out"), 1L).otherwise(0L)).as("d"))
        .withColumn("num_e6", expr("a * d * 1000000 div n"))
        .withColumn("den_e6", expr("b * c * 1000000 div n"))
      val pooled = cells.agg(sum("num_e6").as("snum"), sum("den_e6").as("sden"))
      cells.crossJoin(broadcast(pooled))
        .select(col("event_type"), col("n"), col("a"), col("b"), col("c"),
          col("d"),
          expr("""CASE WHEN b * c > 0
            THEN (a * d * 1000000) div (b * c) ELSE -1 END""").as("or_e6"),
          expr("snum * 1000000 div greatest(sden, 1L)").as("or_mh_e6"))
    }),

    // McNemar's paired test (McNemar 1947) — the correct way to compare
    // two classifiers scored on the SAME documents (independent-sample
    // tests overstate significance on paired data): classifier A is the
    // q53 keep rule, classifier B a pure length rule (n_chars ≥ 200);
    // only the DISCORDANT cells b (A-only) and c (B-only) carry
    // information, χ² = (b−c)²/(b+c) with the continuity-corrected
    // variant alongside. Exact: integer cells, two pinned trunc-divs.
    // Scale shape: one map-side 4-cell conditional-count aggregate —
    // a single scan, single row out.
    "q419_mcnemar" -> ((s, d0) => {
      val flags = t(s, d0, "documents")
        .withColumn("q", TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").as("ka"),
          (col("n_chars") >= 200L).as("kb"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ka") && col("kb"), 1L).otherwise(0L)).as("n_both"),
          sum(when(col("ka") && !col("kb"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("ka") && col("kb"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("ka") && !col("kb"), 1L).otherwise(0L)).as("neither"))
      flags.select(col("n"), col("n_both"), col("b"), col("c"), col("neither"),
        expr("""CASE WHEN b + c > 0
          THEN ((b - c) * (b - c) * 1000000) div (b + c)
          ELSE 0 END""").as("chi2_e6"),
        expr("""CASE WHEN b + c > 0
          THEN ((abs(b - c) - 1) * (abs(b - c) - 1) * 1000000) div (b + c)
          ELSE 0 END""").as("chi2_cc_e6"),
        (expr("""CASE WHEN b + c > 0
          THEN ((b - c) * (b - c) * 1000000) div (b + c)
          ELSE 0 END""") > 3841459L).as("significant_05"))
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

    // Pearson chi-square test of independence over the full
    // source × lang contingency grid of documents — extends q148 (which
    // folds OBSERVED events cells through one collect_list chain) to
    // the complete R×C grid with dof and Cramér's V, the effect-size
    // readout a drift monitor actually thresholds on; fills the q401
    // id gap. The grid INCLUDES absent (O = 0) cells — their E > 0
    // contributes. Exactness: each
    // cell's (O·n − r·c)²/(r·c·n) is ONE pinned double chain floored to
    // e6 BEFORE the cross-cell sum (merge-order-free, the q278 rule);
    // the deviation O·n − r·c stays an exact int64 to n ≈ 3e9 rows.
    // Cramér's V is one pinned sqrt chain off the integer chi2 (sqrt is
    // IEEE-correctly-rounded in both engines). Scale shape: three
    // keyed/global count aggregates; the R×C grid is bounded
    // (categories, not rows) and everything after it is broadcast.
    "q401_chi2_independence" -> ((s, d0) => {
      val docs = t(s, d0, "documents").select("source", "lang")
      val obs = docs.groupBy("source", "lang").agg(count(lit(1)).as("o"))
      val rt = docs.groupBy("source").agg(count(lit(1)).as("r_tot"))
      val ct = docs.groupBy("lang").agg(count(lit(1)).as("c_tot"))
      val nDf = docs.agg(count(lit(1)).as("n"))
      val grid = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(nDf))
        .join(obs, Seq("source", "lang"), "left")
        .na.fill(0L, Seq("o"))
        .withColumn("dev", col("o") * col("n") - col("r_tot") * col("c_tot"))
        .withColumn("cell_e6", floor(
          d(col("dev")) * d(col("dev"))
            / d(col("r_tot") * col("c_tot")) / d(col("n")) * 1e6)
          .cast("long"))
      grid.groupBy("n").agg(
          countDistinct("source").as("r_cats"),
          countDistinct("lang").as("c_cats"),
          sum("cell_e6").as("chi2_e6"))
        .select(col("n"), col("r_cats"), col("c_cats"),
          ((col("r_cats") - 1) * (col("c_cats") - 1)).as("dof"),
          col("chi2_e6"),
          floor(sqrt(d(col("chi2_e6")) / 1e6
            / d(col("n") * least(col("r_cats") - 1, col("c_cats") - 1)))
            * 1e6).cast("long").as("cramers_v_e6"))
    }),

    "q402_ips_eval" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d0, "events").select(
        (col("user_id") % 10).as("x"), col("event_type").as("a"),
        (col("value") >= 100.0).cast("long").as("r"),
        (col("event_id") % 2 === 0).as("train"))
      val policy = ev.where(col("train"))
        .groupBy("x", "a").agg(count(lit(1)).as("n"), sum("r").as("sr"))
        .withColumn("mean_e6", expr("sr * 1000000 div n"))
        .withColumn("rn", row_number().over(Window.partitionBy("x")
          .orderBy(desc("mean_e6"), asc("a"))))
        .where(col("rn") === 1)
        .select(col("x"), col("a").as("a_star"))
      val log = ev.where(!col("train"))
        .groupBy("x", "a").agg(count(lit(1)).as("c_xa"), sum("r").as("sr"))
        .withColumn("c_x", sum("c_xa").over(Window.partitionBy("x")))
      log.join(broadcast(policy),
          log("x") === policy("x") && log("a") === policy("a_star"))
        .select(log("x"), col("a_star"), col("c_x"), col("c_xa"),
          col("sr").as("sum_r_match"),
          expr("c_x * 1000000 div c_xa").as("w_e6"))
        .withColumn("ips_x_e6", expr("(sum_r_match * w_e6) div c_x"))
    }),

    // Sharp regression-discontinuity estimate (Thistlethwaite & Campbell
    // 1960; Imbens & Lemieux 2008): local-linear fits of discount on
    // quantity within bandwidth 10 on each side of the quantity-25
    // cutoff; the effect is the gap between the two intercepts AT the
    // cutoff. TPC-H discounts are independent of quantity, so the audit
    // should report ≈0 — the null-calibration read. Both side-fits come
    // from ONE map-side pass of 10 conditional integer sums (u = qty−25
    // centered, y in discount cents); slopes/intercepts are pinned
    // double chains floored at e6, the q146 OLS convention. Scale shape:
    // a single aggregate, nothing keyed, nothing windowed.
    "q403_rdd" -> ((s, d0) => {
      val base = t(s, d0, "lineitem").select(
        (col("l_quantity").cast("long") - 25L).as("u"),
        floor(col("l_discount") * 100).cast("long").as("y"))
        .where(col("u") >= -10L && col("u") <= 10L)
      def side(name: String, cond: Column) = Seq(
        sum(when(cond, 1L).otherwise(0L)).as(s"n_$name"),
        sum(when(cond, col("u")).otherwise(0L)).as(s"sx_$name"),
        sum(when(cond, col("y")).otherwise(0L)).as(s"sy_$name"),
        sum(when(cond, col("u") * col("u")).otherwise(0L)).as(s"sxx_$name"),
        sum(when(cond, col("u") * col("y")).otherwise(0L)).as(s"sxy_$name"))
      val aggs = side("l", col("u") < 0L) ++ side("r", col("u") >= 0L)
      def fit(p: String): (Column, Column) = {
        val n = col(s"n_$p").cast("double")
        val sx = col(s"sx_$p").cast("double")
        val sy = col(s"sy_$p").cast("double")
        val sxx = col(s"sxx_$p").cast("double")
        val sxy = col(s"sxy_$p").cast("double")
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        val b0 = (sy - slope * sx) / n
        (slope, b0)
      }
      val a = base.agg(aggs.head, aggs.tail: _*)
      val (sl, b0l) = fit("l"); val (sr, b0r) = fit("r")
      a.select(col("n_l"), col("n_r"),
        floor(sl * 1e6).cast("long").as("slope_l_e6"),
        floor(b0l * 1e6).cast("long").as("b0_l_e6"),
        floor(sr * 1e6).cast("long").as("slope_r_e6"),
        floor(b0r * 1e6).cast("long").as("b0_r_e6"),
        floor((b0r - b0l) * 1e6).cast("long").as("effect_e6"))
    }),

    // Wald's sequential probability ratio test (Wald 1945) — the
    // always-valid alternative to fixed-horizon A/B reads (pairs with
    // q234 SRM / q338 two-prop z / q332 power): per arm (user_id % 2),
    // the Bernoulli log-likelihood-ratio walk for H1: p=0.35 vs H0:
    // p=0.30 accumulates daily (conversion = value ≥ 100), and the
    // first boundary crossing at ln((1−β)/α) / ln(β/(1−α)) (α=β=.05)
    // decides. The two per-event increments are CONSTANTS — ln of
    // identical literal doubles floored at e9 (both engines call ln on
    // the same IEEE input, the q278 rule), so the walk is an integer
    // cumulative sum. Scale shape: one daily groupBy + a per-arm keyed
    // prefix window over the DAY frame (calendar-sized), one row per arm.
    "q404_sprt" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d0, "events").select(
        (col("user_id") % 2).as("arm"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (col("value") >= 100.0).cast("long").as("x"))
        .groupBy("arm", "day")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      val wCum = Window.partitionBy("arm").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      daily
        // Scala-side double division (0.35/0.30 etc.): Spark SQL parses
        // bare decimal literals as DECIMAL, whose division rounds
        // differently from the IEEE double ratio DuckDB computes.
        .withColumn("a_e9", floor(log(lit(0.35 / 0.30)) * 1e9).cast("long"))
        .withColumn("b_e9", floor(log(lit(0.65 / 0.70)) * 1e9).cast("long"))
        .withColumn("up_e9", floor(log(lit(0.95 / 0.05)) * 1e9).cast("long"))
        .withColumn("dn_e9", floor(log(lit(0.05 / 0.95)) * 1e9).cast("long"))
        .withColumn("csx", sum("sx").over(wCum))
        .withColumn("cn", sum("n").over(wCum))
        .withColumn("llr_e9",
          col("csx") * col("a_e9") + (col("cn") - col("csx")) * col("b_e9"))
        .groupBy("arm")
        .agg(count(lit(1)).as("n_days"), max("cn").as("n_events"),
          max("csx").as("n_conv"),
          expr("max_by(llr_e9, day)").as("llr_final_e9"),
          min(when(col("llr_e9") >= col("up_e9"), col("day"))).as("up_day"),
          min(when(col("llr_e9") <= col("dn_e9"), col("day"))).as("dn_day"))
        .select(col("arm"), col("n_days"), col("n_events"), col("n_conv"),
          col("llr_final_e9"),
          coalesce(col("up_day"), lit(-1L)).as("up_day"),
          coalesce(col("dn_day"), lit(-1L)).as("dn_day"),
          expr("""CASE
            WHEN up_day IS NOT NULL AND (dn_day IS NULL OR up_day <= dn_day)
              THEN 'accept_h1'
            WHEN dn_day IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END""").as("decision"))
    }),

    "q270_ucb_bandit" -> ((s, d0) => {
      val arms = t(s, d0, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > 5.0, 1L).otherwise(0L)).as("n_reward"))
      val tot = arms.agg(sum("n").as("n_total"))
      arms.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n"), col("n_reward"),
          expr("(n_reward * 1000000) div n").as("mean_e6"),
          floor((d(col("n_reward")) / d(col("n")) +
            sqrt(lit(2.0) * log(d(col("n_total"))) / d(col("n")))) * 1e6)
            .cast("long").as("ucb_e6"))
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

    // Pairwise Pearson correlation matrix over four lineitem measures
    // (quantity, floor(extendedprice), discount_e2, tax_e2) in ONE pass:
    // 14 integer sums (4 Sx, 4 Sxx, 6 Sxy), then the 6 upper-triangle
    // pairs unfolded from the single aggregate row with explode. Integer
    // bound: Sxx(price) <= (1.05e5)^2 * n — int64-safe to n ~ 8e8 rows,
    // after which price needs a coarser unit.
    "q147_corr_matrix" -> ((s, d0) => {
      val li = liMeasures(s, d0)
      val ms = 0 to 3
      val sumCols =
        Seq(count(lit(1)).as("n")) ++
          ms.map(i => sum(col(s"m$i")).as(s"s$i")) ++
          ms.map(i => sum(col(s"m$i") * col(s"m$i")).as(s"q$i")) ++
          (for (i <- ms; j <- ms if i < j)
            yield sum(col(s"m$i") * col(s"m$j")).as(s"p${i}${j}"))
      val agg = li.agg(sumCols.head, sumCols.tail: _*)
      val names = Seq("qty", "price", "disc", "tax")
      val n = d(col("n"))
      def corr(i: Int, j: Int): Column = {
        val cov = d(col(s"p$i$j")) - d(col(s"s$i")) * d(col(s"s$j")) / n
        val vi = d(col(s"q$i")) - d(col(s"s$i")) * d(col(s"s$i")) / n
        val vj = d(col(s"q$j")) - d(col(s"s$j")) * d(col(s"s$j")) / n
        // zero-variance guard: NULL in both engines (DuckDB sqrt(<0)
        // THROWS and x/0 is NULL; Spark would emit NaN/Infinity).
        when(vi > 0.0 && vj > 0.0, cov / (sqrt(vi) * sqrt(vj)))
      }
      val pairs = for (i <- ms; j <- ms if i < j) yield
        struct(lit(names(i)).as("m_a"), lit(names(j)).as("m_b"),
          e6(corr(i, j)).as("corr_e6"))
      agg.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.m_a").as("m_a"), col("p.m_b").as("m_b"),
          col("p.corr_e6").as("corr_e6"))
    }),

    // Pairwise Welch t-test between event-type value means: per-group
    // integer sums (n, sum, sumsq in centi-units), self-joined into the
    // 10 ordered group pairs, t = (mx-my)/sqrt(vx/nx + vy/ny) evaluated in
    // one pinned double chain. The A/B-test primitive over arbitrarily
    // large groups — state per group is three integers.
    "q161_ttest" -> ((s, d0) => {
      val sums = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"),
          sum(col("v") * col("v")).as("svv"))
      def m(p: String) = d(col(s"${p}_sv")) / d(col(s"${p}_n"))
      def v(p: String) =
        (d(col(s"${p}_svv")) - d(col(s"${p}_sv")) * d(col(s"${p}_sv")) / d(col(s"${p}_n"))) /
          (d(col(s"${p}_n")) - 1.0)
      val a = sums.select(col("event_type").as("type_a"), col("n").as("a_n"),
        col("sv").as("a_sv"), col("svv").as("a_svv"))
      val b = sums.select(col("event_type").as("type_b"), col("n").as("b_n"),
        col("sv").as("b_sv"), col("svv").as("b_svv"))
      // guards: Welch needs n >= 2 on both sides (n-1 division) and a
      // strictly positive pooled variance — float cancellation can land an
      // exact-zero-variance group a hair below 0, where DuckDB's sqrt
      // THROWS. NULL in both engines for the degenerate pairs.
      val denomSq = v("a") / d(col("a_n")) + v("b") / d(col("b_n"))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          e6(when(col("a_n") > 1 && col("b_n") > 1 && denomSq > 0.0,
            (m("a") - m("b")) / sqrt(denomSq))).as("t_e6"))
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

    // Mutual information between the vector label and the sign of the
    // first embedding dimension — the feature-relevance score of a
    // training pipeline's feature-selection pass. I = sum over cells of
    // p_xy * ln(p_xy*n^2 / (rt*ct))/... computed per cell and floored to
    // integer e12 units, then summed associatively (the q152 shape: no
    // array fold, margins joined on, scales to any cardinality).
    "q162_mutual_info" -> ((s, d0) => {
      val ev = t(s, d0, "embeddings").select(col("label"),
        (element_at(col("embedding"), 1) > 0).cast("int").as("sgn"))
      val cells = ev.groupBy("label", "sgn").agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy("label").agg(sum("o").as("rt"))
      val colT = cells.groupBy("sgn").agg(sum("o").as("ct"))
      val joined = cells.join(rowT, "label").join(colT, "sgn")
        .crossJoin(broadcast(cells.agg(sum("o").as("n"))))
      val p = d(col("o")) / d(col("n"))
      val contrib = p * log(d(col("o")) * d(col("n")) /
        (d(col("rt")) * d(col("ct"))))
      joined
        .select(floor(contrib * 1e12).cast("long").as("c_e12"))
        .agg(count(lit(1)).as("n_cells"), sum("c_e12").as("mi_e12"))
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

    // Chi-square independence test of event_type vs day-of-week: observed
    // counts per cell, expected = row_total * col_total / n, statistic
    // folded over cells in pinned (event_type, dow) order — the q116 rule
    // for cross-engine float-sum parity. Margins come from two grouped
    // sums joined back on the cell frame (all integer counts; the only
    // doubles are the 35-cell tail).
    "q148_chi2" -> ((s, d0) => {
      val ev = t(s, d0, "events").select(
        col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"))
      val cells = ev.groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy("event_type").agg(sum("o").as("rt"))
      val colT = cells.groupBy("dow").agg(sum("o").as("ct"))
      val joined = cells.join(rowT, "event_type").join(colT, "dow")
      val folded = joined
        .agg(sum("o").as("n"),
          count(lit(1)).as("n_cells"),
          array_sort(collect_list(struct(
            col("event_type"), col("dow"), col("o"), col("rt"), col("ct"))))
            .as("cs"))
      folded.select(col("n"), col("n_cells"),
        e6(aggregate(col("cs"), lit(0.0d), (acc, c) => {
          val e = d(c.getField("rt")) * d(c.getField("ct")) / d(col("n"))
          acc + (d(c.getField("o")) - e) * (d(c.getField("o")) - e) / e
        })).as("chi2_e6"))
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

    // Mann–Whitney U (Wilcoxon rank-sum) per event_type, comparing the
    // two user-parity cohorts — the nonparametric twin of q161's Welch
    // t-test. Tie handling is exact: per distinct value, the 2×-scaled
    // midrank 2s+c+1 is an INTEGER (s = count of strictly smaller), so
    // the rank sum R₂, U₂ = R₂ − nₐ(nₐ+1), and the tie term Σ(t³−t)
    // are all exact integers; only the final z (tie-corrected normal
    // approximation) is a pinned double chain. Scale shape: one
    // groupBy(type, value) then a cumsum window over the DISTINCT-value
    // frame (bounded by value cardinality, keyed per type).
    "q286_mann_whitney" -> ((s, d0) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("v_e2")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val grp = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v_e2"),
          (col("user_id") % 2 === 0).as("in_a"))
        .groupBy("event_type", "v_e2")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
        .withColumn("c", col("c_a") + col("c_b"))
        .withColumn("cum", sum("c").over(w))
      val st = grp.groupBy("event_type").agg(
        sum("c_a").as("n_a"), sum("c_b").as("n_b"),
        // midrank2 = 2·(cum − c) + c + 1 = 2·cum − c + 1
        sum(col("c_a") * (lit(2L) * col("cum") - col("c") + 1L)).as("r2_a"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      val nn = d(col("n_a")) + d(col("n_b"))
      val u = (d(col("u2_a"))) / 2.0
      val mu = d(col("n_a")) * d(col("n_b")) / 2.0
      val varU = d(col("n_a")) * d(col("n_b")) / (nn * (nn - 1.0)) *
        ((nn * nn * nn - nn - d(col("ties"))) / 12.0)
      st.withColumn("u2_a", col("r2_a") - col("n_a") * (col("n_a") + 1L))
        .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
          col("ties"),
          e6(when(col("n_a") > 0 && col("n_b") > 0 && varU > 0.0,
            (u - mu) / sqrt(varU))).as("z_e6"))
    }),

    // Two-sample Kolmogorov–Smirnov distance per event_type (same
    // parity cohorts): D = max|ECDFₐ − ECDF_b| evaluated at every
    // distinct value — EXACT, because the comparison is done on the
    // common denominator nₐ·n_b: D_num = max|cumₐ·n_b − cum_b·nₐ| is an
    // integer (safe to ~10⁹ rows per side per type in int64). No normal
    // approximation, no float anywhere but the final e6 report division,
    // which is integer too. Same bounded keyed-window shape as q286.
    // Exact pairwise 1-Wasserstein (earth-mover) distance between the
    // value distributions of every event-type pair — the drift metric
    // that, unlike KS (q287, sup norm) or PSI (q165, binned), weighs HOW
    // FAR mass moved: W1 = Σ_segments Δv·|F1−F2|. Over the merged
    // distinct-value grid the CDF gap is the exact integer
    // |cum1·n2 − cum2·n1| and each segment contributes
    // dv·((gap·1e6) div (n1·n2)) — per-term trunc-div, so the sum is
    // merge-order-free and int64-safe while n1·n2 ≤ 9.2e12 (~3M rows per
    // type; beyond that switch the gap to per-side e6 CDFs, error ≤2e-6
    // per segment). Readout is cent·e6 units. Scale shape: one
    // (type, value)-histogram groupBy, a bounded type-pair broadcast, and
    // per-PAIR value windows (pairs parallelize; each frame is the
    // merged distinct-value grid, domain-sized not row-sized — the q287
    // posture; production with unbounded domains bins first, q231).
    "q391_wasserstein" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val hist = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type", "v").agg(count(lit(1)).as("c"))
      val tot = hist.groupBy("event_type").agg(sum("c").as("n"))
      val pairs = tot.select(col("event_type").as("ta"), col("n").as("n1"))
        .crossJoin(tot.select(col("event_type").as("tb"), col("n").as("n2")))
        .where(col("ta") < col("tb"))
      val sideA = hist.join(broadcast(pairs), col("event_type") === col("ta"))
        .select(col("ta"), col("tb"), col("n1"), col("n2"), col("v"),
          col("c").as("ca"), lit(0L).as("cb"))
      val sideB = hist.join(broadcast(pairs), col("event_type") === col("tb"))
        .select(col("ta"), col("tb"), col("n1"), col("n2"), col("v"),
          lit(0L).as("ca"), col("c").as("cb"))
      val wPair = Window.partitionBy("ta", "tb").orderBy("v")
      val wCum = wPair.rowsBetween(Window.unboundedPreceding, 0)
      sideA.union(sideB)
        .groupBy("ta", "tb", "n1", "n2", "v")
        .agg(sum("ca").as("ca"), sum("cb").as("cb"))
        .withColumn("cum1", sum("ca").over(wCum))
        .withColumn("cum2", sum("cb").over(wCum))
        .withColumn("dv", lead("v", 1).over(wPair) - col("v"))
        .withColumn("term", expr(
          """coalesce(dv, 0) *
             ((abs(cum1 * n2 - cum2 * n1) * 1000000) div (n1 * n2))"""))
        .groupBy("ta", "tb", "n1", "n2")
        .agg(count(lit(1)).as("n_vals"), sum("term").as("w1_cent_e6"))
    }),

    // Hill tail-index estimator (Hill 1975) per event type — is the
    // value distribution heavy-tailed, and how heavy? α̂⁻¹ = mean of
    // ln(x_(i)/x_(k+1)) over the top-k order statistics (k=100). Values
    // integerized to cents so the order statistics are exact; the k ln
    // terms fold in pinned rank order (collect_list sorted — the q127
    // rule) and α comes from one pinned double chain. Ties at the k-th
    // boundary don't matter: rank order among equal cent values can
    // differ but the ln multiset is identical. Scale shape: top-(k+1)
    // per type via keyed window on a count-bounded frame (the q24 top-k
    // posture: a per-type partial sort, map-side combinable at 100×).
    "q399_hill_tail" -> ((s, d0) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy(desc("v"), asc("event_id"))
      val top = t(s, d0, "events")
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("v"))
        // Hill's estimator is defined over POSITIVE order statistics:
        // a non-positive 101st value would put a 0/negative into the
        // ln ratio and silently NaN the whole fold (advisor finding)
        .where(col("v") > 0L)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 101L)
      val thresh = top.where(col("rnk") === 101L)
        .select(col("event_type"), col("v").as("v_k1"))
      top.where(col("rnk") <= 100L)
        .join(thresh, "event_type")
        .withColumn("lnr", log(col("v").cast("double") / col("v_k1")))
        .groupBy("event_type", "v_k1")
        .agg(count(lit(1)).as("k"),
          array_sort(collect_list(struct(col("rnk"), col("lnr")))).as("ps"))
        .withColumn("sl", aggregate(transform(col("ps"),
          x => x.getField("lnr")), lit(0.0d), (acc, x) => acc + x))
        .select(col("event_type"), col("k"), col("v_k1"),
          floor(col("sl") / col("k") * 1e6).cast("long").as("alpha_inv_e6"),
          when(col("sl") === 0.0d, 0L).otherwise(
            floor(col("k").cast("double") / col("sl") * 1e6).cast("long"))
            .as("alpha_e6"))
    }),

    "q287_ks_test" -> ((s, d0) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("v_e2")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val grp = t(s, d0, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v_e2"),
          (col("user_id") % 2 === 0).as("in_a"))
        .groupBy("event_type", "v_e2")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
        .withColumn("cum_a", sum("c_a").over(w))
        .withColumn("cum_b", sum("c_b").over(w))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      grp
        .withColumn("n_a", sum("c_a").over(wAll))
        .withColumn("n_b", sum("c_b").over(wAll))
        .groupBy("event_type").agg(
          max("n_a").as("n_a"), max("n_b").as("n_b"),
          max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
            .as("d_num"))
        .select(col("event_type"), col("n_a"), col("n_b"), col("d_num"),
          expr("(d_num * 1000000) div (n_a * n_b)").as("d_e6"))
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

    // Minimum detectable effect (80% power, two-sided α=0.05) for the
    // q161 two-cohort setup: MDE = (z_{α/2}+z_β)·√(s²ₐ/nₐ + s²_b/n_b)
    // with the z-sum pinned as the literal 2.8016 (1.96 + 0.8416 — a
    // constant both engines parse identically, no inverse-CDF at
    // runtime) — the experiment-sizing readout that belongs next to
    // q233 CUPED and q234 SRM. Sample variances come from exact integer
    // moment sums; the √ chain is one pinned double expression floored
    // to e2 cents. One map-side-combinable aggregation per type.
    "q332_power_mde" -> ((s, d0) => {
      val base = t(s, d0, "events")
        .select(col("event_type"),
          floor(col("value") * 100).cast("long").as("v"),
          (col("user_id") % 2 === 0).as("in_a"))
      val st = base.groupBy("event_type").agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("in_a"), col("v")).otherwise(0L)).as("s_a"),
        sum(when(col("in_a"), col("v") * col("v")).otherwise(0L)).as("ss_a"),
        sum(when(!col("in_a"), col("v")).otherwise(0L)).as("s_b"),
        sum(when(!col("in_a"), col("v") * col("v")).otherwise(0L)).as("ss_b"))
      def svar(n: Column, sv: Column, ss: Column): Column =
        (n * ss - sv * sv).cast("double") / (n * (n - 1L)).cast("double")
      val va = svar(col("n_a"), col("s_a"), col("ss_a"))
      val vb = svar(col("n_b"), col("s_b"), col("ss_b"))
      st.where(col("n_a") > 1 && col("n_b") > 1)
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("s_a"), col("ss_a"), col("s_b"), col("ss_b"),
          floor(lit(2.8016) *
            sqrt(va / col("n_a").cast("double") + vb / col("n_b").cast("double")))
            .cast("long").as("mde_e2"))
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

    // Two-proportion z-test per event_type (conversion = value > 150,
    // cohorts by user parity) — the binary-outcome A/B readout next to
    // q161's Welch t (continuous) and q332's MDE: pooled
    // p = (cₐ+c_b)/(nₐ+n_b), z = (p̂ₐ−p̂_b)/√(p(1−p)(1/nₐ+1/n_b)).
    // All counts exact integers; the z is one pinned double chain
    // floored to e6, guarded to non-degenerate pooled rates. One
    // map-side-combinable aggregation.
    "q338_two_prop_z" -> ((s, d0) => {
      val st = t(s, d0, "events")
        .select(col("event_type"),
          when(col("value") > 150.0, 1L).otherwise(0L).as("conv"),
          (col("user_id") % 2 === 0).as("in_a"))
        .groupBy("event_type").agg(
          sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("in_a"), col("conv")).otherwise(0L)).as("c_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(!col("in_a"), col("conv")).otherwise(0L)).as("c_b"))
      val pa = col("c_a").cast("double") / col("n_a").cast("double")
      val pb = col("c_b").cast("double") / col("n_b").cast("double")
      val pp = (col("c_a") + col("c_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      st.where(col("n_a") > 0 && col("n_b") > 0 &&
          col("c_a") + col("c_b") > 0 &&
          col("c_a") + col("c_b") < col("n_a") + col("n_b"))
        .select(col("event_type"), col("n_a"), col("c_a"), col("n_b"),
          col("c_b"),
          floor((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a").cast("double") +
              lit(1.0) / col("n_b").cast("double"))) * 1e6)
            .cast("long").as("z_e6"))
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

    // Kendall's τ-b between each daily series and the market series —
    // the rank-correlation twin of q257's Spearman, EXACT in its
    // combinatorial core: concordant, discordant, and tie-pair counts
    // are integer sums over the per-type day-pair frame (bounded by the
    // calendar², not rows — it does NOT grow with data volume), and
    // only the final τ-b is one pinned double chain. Scale shape: the
    // pair join keys on event_type over the SMALL daily frame; the raw
    // corpus only ever passes through the two daily groupBys.
    "q340_kendall_tau" -> ((s, d0) => {
      val base = t(s, d0, "events").select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100).cast("long").as("v_e2"))
      val daily = base.groupBy("event_type", "day")
        .agg(expr("sum(v_e2) div count(1)").as("y"))
      val market = base.groupBy("day")
        .agg(expr("sum(v_e2) div count(1)").as("x"))
      val dm = daily.join(market, "day")
      val a = dm.select(col("event_type"), col("day").as("d1"),
        col("y").as("y1"), col("x").as("x1"))
      val b = dm.select(col("event_type"), col("day").as("d2"),
        col("y").as("y2"), col("x").as("x2"))
      val st = a.join(b, "event_type").where(col("d1") < col("d2"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n0"),
          sum(when((col("y1") < col("y2") && col("x1") < col("x2")) ||
            (col("y1") > col("y2") && col("x1") > col("x2")), 1L)
            .otherwise(0L)).as("nc"),
          sum(when((col("y1") < col("y2") && col("x1") > col("x2")) ||
            (col("y1") > col("y2") && col("x1") < col("x2")), 1L)
            .otherwise(0L)).as("nd"),
          sum(when(col("y1") === col("y2"), 1L).otherwise(0L)).as("ty"),
          sum(when(col("x1") === col("x2"), 1L).otherwise(0L)).as("tx"))
      st.where(col("n0") > col("ty") && col("n0") > col("tx"))
        .select(col("event_type"), col("n0"), col("nc"), col("nd"),
          col("ty"), col("tx"),
          floor((col("nc") - col("nd")).cast("double") /
            sqrt((col("n0") - col("ty")).cast("double") *
              (col("n0") - col("tx")).cast("double")) * 1e6)
            .cast("long").as("tau_b_e6"))
    }))

  val oracles: Map[String, String] = Map(
    "q427_kruskal_wallis" ->
      """WITH ev AS (
           SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_e2
           FROM events),
         hist AS (SELECT v_e2, count(*) AS n_v FROM ev GROUP BY 1),
         rk AS (
           SELECT v_e2, n_v,
             COALESCE(sum(n_v) OVER (ORDER BY v_e2
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
           FROM hist),
         rk2 AS (
           SELECT v_e2, CAST(2 * cum_before + n_v + 1 AS BIGINT) AS r2
           FROM rk),
         ct AS (
           SELECT event_type, v_e2, count(*) AS c_tv
           FROM ev GROUP BY 1, 2),
         pt AS (
           SELECT event_type,
             CAST(sum(c_tv) AS BIGINT) AS n_t,
             CAST(sum(c_tv * r2) AS BIGINT) AS r2_t
           FROM ct JOIN rk2 USING (v_e2) GROUP BY 1),
         tz AS (
           SELECT CAST(sum(n_v * n_v * n_v - n_v) AS BIGINT) AS tie_sum,
             CAST(sum(n_v) AS BIGINT) AS n_total
           FROM hist),
         ag AS (
           SELECT count(*) AS k_groups,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(r2_t AS DOUBLE) * CAST(r2_t AS DOUBLE))
                 / (4.0 * CAST(n_t AS DOUBLE)) ORDER BY event_type)),
               (acc, x) -> acc + x) AS s_terms
           FROM pt)
         SELECT n_total, k_groups, tie_sum,
           CASE WHEN CAST(tie_sum AS DOUBLE) <
               CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                 * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)
             THEN CAST(floor(((12.0 * s_terms
               / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
               - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))
               / (1.0 - CAST(tie_sum AS DOUBLE)
                 / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
                   * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))))
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS h_e6
         FROM ag, tz""",

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

    "q529_tost_equivalence" ->
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
               AS n1,
             CAST(sum(CASE WHEN we = 1 THEN y ELSE 0 END) AS BIGINT)
               AS s1,
             CAST(sum(CASE WHEN we = 1 THEN y * y ELSE 0 END) AS BIGINT)
               AS ss1,
             CAST(sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(sum(CASE WHEN we = 0 THEN y ELSE 0 END) AS BIGINT)
               AS s0,
             CAST(sum(CASE WHEN we = 0 THEN y * y ELSE 0 END) AS BIGINT)
               AS ss0
           FROM we),
         ch AS (
           SELECT *,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
             sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
               * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
               + ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
               * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE)) AS se
           FROM ag),
         ch2 AS (
           SELECT *, (diff + 10.0) / se AS z_lo, (diff - 10.0) / se AS z_hi
           FROM ch)
         SELECT n1, n0,
           CAST(floor(diff * 100.0) AS BIGINT) AS diff_e2,
           CAST(floor(z_lo * 1000000.0) AS BIGINT) AS z_lower_e6,
           CAST(floor(z_hi * 1000000.0) AS BIGINT) AS z_upper_e6,
           (z_lo > 1.644854 AND z_hi < -1.644854) AS equivalent
         FROM ch2""",

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

    "q526_or_ci" -> {
      val stopAll = TrainingShared.hitsSql(
        graft.functions.TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH f AS (
           SELECT
             CAST(CASE WHEN len(w) >= 10 AND len(w) <= 100000 AND
               (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                 ELSE 0.0 END) > 0.001 THEN 1 ELSE 0 END AS BIGINT) AS k,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS e
           FROM (SELECT lang, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         ag AS (
           SELECT CAST(sum(k * e) AS BIGINT) AS a,
             CAST(sum(k * (1 - e)) AS BIGINT) AS b,
             CAST(sum((1 - k) * e) AS BIGINT) AS c,
             CAST(sum((1 - k) * (1 - e)) AS BIGINT) AS dd
           FROM f),
         ch AS (
           SELECT *, CASE WHEN a = 0 OR b = 0 OR c = 0 OR dd = 0
             THEN 0.5 ELSE 0.0 END AS h
           FROM ag),
         ch2 AS (
           SELECT *,
             ln((CAST(a AS DOUBLE) + h) * (CAST(dd AS DOUBLE) + h)
               / ((CAST(b AS DOUBLE) + h) * (CAST(c AS DOUBLE) + h)))
               AS lor,
             sqrt(1.0 / (CAST(a AS DOUBLE) + h)
               + 1.0 / (CAST(b AS DOUBLE) + h)
               + 1.0 / (CAST(c AS DOUBLE) + h)
               + 1.0 / (CAST(dd AS DOUBLE) + h)) AS se
           FROM ch)
         SELECT a, b, c, dd,
           CAST(floor(lor * 1000000.0) AS BIGINT) AS log_or_e6,
           CAST(floor((lor - 1.959964 * se) * 1000000.0) AS BIGINT)
             AS ci_lo_e6,
           CAST(floor((lor + 1.959964 * se) * 1000000.0) AS BIGINT)
             AS ci_hi_e6
         FROM ch2"""
    },

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

    "q523_jarque_bera" ->
      """WITH ag AS (
           SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s1,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
               * CAST(v AS HUGEINT)) AS s3,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
               * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s4
           FROM (SELECT CAST(floor(value * 100) AS BIGINT) AS v
                 FROM events)),
         ch AS (
           SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
             CAST(s4 AS DOUBLE) AS s4d
           FROM ag),
         ch2 AS (
           SELECT *,
             s2d / CAST(n AS DOUBLE) - m * m AS m2,
             s3d / CAST(n AS DOUBLE) - 3.0 * m * (s2d / CAST(n AS DOUBLE))
               + 2.0 * m * m * m AS m3,
             s4d / CAST(n AS DOUBLE) - 4.0 * m * (s3d / CAST(n AS DOUBLE))
               + 6.0 * m * m * (s2d / CAST(n AS DOUBLE))
               - 3.0 * m * m * m * m AS m4
           FROM ch),
         ch3 AS (
           SELECT *, m3 / (m2 * sqrt(m2)) AS skew,
             m4 / (m2 * m2) AS kurt
           FROM ch2)
         SELECT n,
           CAST(floor(skew * 1000000.0) AS BIGINT) AS skew_e6,
           CAST(floor(kurt * 1000000.0) AS BIGINT) AS kurt_e6,
           CAST(floor(CAST(n AS DOUBLE) / 6.0 * (skew * skew
             + (kurt - 3.0) * (kurt - 3.0) / 4.0) * 1000.0) AS BIGINT)
             AS jb_e3
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

    "q513_filter_smd" -> {
      val stopAll = TrainingShared.hitsSql(
        graft.functions.TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH f0 AS (
           SELECT
             CAST(CASE WHEN len(w) >= 10 AND len(w) <= 100000 AND
               (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                 ELSE 0.0 END) > 0.001 THEN 1 ELSE 0 END AS BIGINT) AS g,
             CAST(n_chars AS BIGINT) AS x_chars,
             CAST(len(w) AS BIGINT) AS x_toks,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)
               AS x_en
           FROM (SELECT n_chars, lang, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         f AS (
           SELECT g, 'n_chars' AS cov, x_chars AS x FROM f0
           UNION ALL SELECT g, 'n_tokens', x_toks FROM f0
           UNION ALL SELECT g, 'is_en', x_en FROM f0),
         ag AS (
           SELECT cov,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN g = 1 THEN x * x ELSE 0 END) AS BIGINT)
               AS ss1,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN g = 0 THEN x * x ELSE 0 END) AS BIGINT)
               AS ss0
           FROM f GROUP BY 1),
         ch AS (
           SELECT *,
             ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                 * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                 * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
               / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0) AS sp2
           FROM ag)
         SELECT cov, n1, n0,
           CASE WHEN sp2 > 0.0
             THEN CAST(floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt(sp2)
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS smd_e6
         FROM ch"""
    },

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

    "q515_qini_uplift" -> {
      val stopAll = TrainingShared.hitsSql(
        graft.functions.TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH f AS (
           SELECT least(n_chars // 200, 9) AS dec,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS tr,
             CAST(CASE WHEN len(w) >= 10 AND len(w) <= 100000 AND
               (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                 ELSE 0.0 END) > 0.001 THEN 1 ELSE 0 END AS BIGINT) AS y
           FROM (SELECT doc_id, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         cells AS (
           SELECT dec, CAST(sum(tr) AS BIGINT) AS nt,
             CAST(sum(1 - tr) AS BIGINT) AS nc,
             CAST(sum(tr * y) AS BIGINT) AS kt,
             CAST(sum((1 - tr) * y) AS BIGINT) AS kc
           FROM f GROUP BY 1),
         cum AS (
           SELECT a.dec, CAST(sum(b.nt) AS BIGINT) AS cnt,
             CAST(sum(b.nc) AS BIGINT) AS cnc,
             CAST(sum(b.kt) AS BIGINT) AS ckt,
             CAST(sum(b.kc) AS BIGINT) AS ckc
           FROM cells a JOIN cells b ON b.dec >= a.dec
           GROUP BY 1)
         SELECT dec, cnt, cnc, ckt, ckc,
           ckt * 1000000 // greatest(cnt, 1) - ckc * 1000000
             // greatest(cnc, 1) AS uplift_e6,
           ckt - ckc * cnt // greatest(cnc, 1) AS qini
         FROM cum"""
    },

    "q510_synthetic_control" ->
      """WITH cell AS (
           SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m
           FROM events GROUP BY 1, 2),
         t3 AS (
           SELECT event_type, count(*) AS nd
           FROM cell GROUP BY 1 ORDER BY nd DESC, event_type LIMIT 3),
         roles AS (
           SELECT a.event_type,
             CAST(1 + (SELECT count(*) FROM t3 b WHERE b.nd > a.nd
               OR (b.nd = a.nd AND b.event_type < a.event_type))
               AS BIGINT) AS role
           FROM t3 a),
         wide AS (
           SELECT day, y, d1, d2 FROM (
             SELECT day,
               max(CASE WHEN role = 1 THEN m END) AS y,
               max(CASE WHEN role = 2 THEN m END) AS d1,
               max(CASE WHEN role = 3 THEN m END) AS d2
             FROM cell JOIN roles USING (event_type) GROUP BY 1)
           WHERE y IS NOT NULL AND d1 IS NOT NULL AND d2 IS NOT NULL),
         br AS (SELECT (min(day) + max(day)) // 2 AS b FROM wide),
         fit AS (
           SELECT count(*) AS n_pre,
             least(1000000, greatest(0,
               CAST(sum((y - d2) * (d1 - d2)) AS BIGINT) * 1000000
               // greatest(CAST(sum((d1 - d2) * (d1 - d2)) AS BIGINT), 1)))
               AS w_e6
           FROM wide, br WHERE day < b)
         SELECT max(n_pre) AS n_pre, max(w_e6) AS w_e6,
           count(*) AS n_post,
           CAST(sum(y * 1000000 - (w_e6 * d1 + (1000000 - w_e6) * d2))
             AS BIGINT) // count(*) AS mean_gap_e6
         FROM wide, br, fit WHERE day >= b""",

    "q511_bartlett" ->
      """WITH per AS (
           SELECT event_type, count(*) AS n_t,
             CAST(sum(v) AS BIGINT) AS s_t,
             CAST(sum(v * v) AS BIGINT) AS ss_t
           FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT)
                   AS v
                 FROM events)
           GROUP BY 1),
         ag AS (
           SELECT count(*) AS k, CAST(sum(n_t) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE)
                 * CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                 ORDER BY event_type)), (acc, x) -> acc + x) AS ssw,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(n_t AS DOUBLE) - 1.0)
                 * ln((CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE)
                   * CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                   / (CAST(n_t AS DOUBLE) - 1.0))
                 ORDER BY event_type)), (acc, x) -> acc + x) AS sumln,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(1.0 / (CAST(n_t AS DOUBLE) - 1.0)
                 ORDER BY event_type)), (acc, x) -> acc + x) AS sumInv
           FROM per),
         ch AS (
           SELECT *,
             ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS sp2,
             1.0 + (sumInv - 1.0 / (CAST(n AS DOUBLE)
               - CAST(k AS DOUBLE))) / (3.0 * (CAST(k AS DOUBLE) - 1.0))
               AS cc
           FROM ag)
         SELECT k, n,
           CAST(floor((((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
             * ln(sp2) - sumln) / cc) * 1000000.0) AS BIGINT) AS t_e6
         FROM ch""",

    "q512_jonckheere" ->
      """WITH h AS (
           SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
             count(*) AS c
           FROM events GROUP BY 1, 2),
         grid AS (
           SELECT event_type, v
           FROM (SELECT DISTINCT v FROM h),
             (SELECT DISTINCT event_type FROM h)),
         full0 AS (
           SELECT grid.event_type, grid.v, COALESCE(h.c, 0) AS c
           FROM grid LEFT JOIN h USING (event_type, v)),
         cum AS (
           SELECT event_type, v, c,
             CAST(COALESCE(sum(c) OVER (PARTITION BY event_type
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS cb
           FROM full0),
         j2t AS (
           SELECT CAST(sum(2 * b.c * a.cb + b.c * a.c) AS BIGINT) AS j2
           FROM cum a JOIN h b
             ON a.v = b.v AND a.event_type < b.event_type),
         sizes AS (
           SELECT event_type, CAST(sum(c) AS BIGINT) AS n_t
           FROM h GROUP BY 1),
         stats AS (
           SELECT count(*) AS k, CAST(sum(n_t) AS BIGINT) AS n,
             CAST(sum(n_t * n_t) AS BIGINT) AS sn2,
             CAST(sum(n_t * n_t * (2 * n_t + 3)) AS BIGINT) AS sn23
           FROM sizes),
         ch AS (
           SELECT *,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               - CAST(sn2 AS DOUBLE)) / 2.0 AS mu2,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * (2.0 * CAST(n AS DOUBLE) + 3.0)
               - CAST(sn23 AS DOUBLE)) / 72.0 AS vr
           FROM j2t, stats)
         SELECT n, k, j2,
           CASE WHEN vr > 0.0
             THEN CAST(floor((CAST(j2 AS DOUBLE) / 2.0 - mu2 / 2.0)
               / sqrt(vr) * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM ch""",

    "q504_kish_ess" ->
      """WITH docs AS (SELECT lang, doc_id FROM documents),
         pop AS (SELECT lang, count(*) AS nh_pop FROM docs GROUP BY 1),
         samp AS (SELECT lang, doc_id FROM docs WHERE doc_id % 7 = 0),
         sh AS (SELECT lang, count(*) AS nh FROM samp GROUP BY 1),
         tots AS (
           SELECT (SELECT count(*) FROM docs) AS n_pop,
             (SELECT count(*) FROM samp) AS n_s),
         w AS (
           SELECT (nh_pop * n_s * 1000000) // (n_pop * nh) AS w_e6
           FROM samp JOIN sh USING (lang) JOIN pop USING (lang), tots),
         ag AS (
           SELECT count(*) AS n_sample, CAST(sum(w_e6) AS BIGINT) AS sw,
             CAST(sum(w_e6 * w_e6) AS BIGINT) AS sww
           FROM w)
         SELECT n_sample,
           CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
             / CAST(sww AS DOUBLE)) AS BIGINT) AS ess,
           CAST(floor(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
             / CAST(sww AS DOUBLE) / CAST(n_sample AS DOUBLE)
             * 1000000.0) AS BIGINT) AS ess_ratio_e6
         FROM ag""",

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

    "q503_sign_test" ->
      """WITH cell AS (
           SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m
           FROM events GROUP BY 1, 2),
         t2 AS (
           SELECT event_type, count(*) AS nd
           FROM cell GROUP BY 1 ORDER BY nd DESC, event_type LIMIT 2),
         types AS (
           SELECT a.event_type,
             CAST(1 + (SELECT count(*) FROM t2 b WHERE b.nd > a.nd
               OR (b.nd = a.nd AND b.event_type < a.event_type))
               AS BIGINT) AS side
           FROM t2 a),
         dd AS (
           SELECT day, m1, m2
           FROM (
             SELECT day,
               max(CASE WHEN side = 1 THEN m END) AS m1,
               max(CASE WHEN side = 2 THEN m END) AS m2
             FROM cell JOIN types USING (event_type) GROUP BY 1)
           WHERE m1 IS NOT NULL AND m2 IS NOT NULL AND m1 <> m2),
         ag AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN m1 > m2 THEN 1 ELSE 0 END) AS BIGINT)
               AS k
           FROM dd)
         SELECT n, k,
           CASE WHEN n > 0
             THEN CAST(floor((2.0 * CAST(k AS DOUBLE)
               - CAST(n AS DOUBLE)) / sqrt(CAST(n AS DOUBLE))
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM ag""",

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

    "q500_gumbel_return_level" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         wk AS (
           SELECT day // 7 AS week, max(y) AS m FROM dm GROUP BY 1),
         ag AS (
           SELECT count(*) AS n_blocks, CAST(sum(m) AS BIGINT) AS sm,
             CAST(sum(m * m) AS BIGINT) AS smm, max(m) AS m_max
           FROM wk),
         ch AS (
           SELECT *,
             CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mbar,
             sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
               * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE))
               / (CAST(n_blocks AS DOUBLE) - 1.0)) AS sd
           FROM ag),
         ch2 AS (
           SELECT *, sd * sqrt(6.0) / 3.141592653589793 AS beta
           FROM ch),
         ch3 AS (
           SELECT *, mbar - 0.5772156649015329 * beta AS mu
           FROM ch2)
         SELECT n_blocks, m_max,
           CAST(floor(mu * 1000000.0) AS BIGINT) AS mu_e6,
           CAST(floor(beta * 1000000.0) AS BIGINT) AS beta_e6,
           CAST(floor((mu - beta * ln(0.0 - ln(1.0 - 1.0 / 52.0)))
             * 1000000.0) AS BIGINT) AS rl52_e6
         FROM ch3""",

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

    "q497_ratio_efficiency" ->
      """WITH f AS (
           SELECT n_chars AS x,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS y
           FROM documents),
         ag AS (
           SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
           FROM f),
         ch AS (
           SELECT *, CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS rr
           FROM ag),
         ch2 AS (
           SELECT *,
             (CAST(syy AS DOUBLE) - 2.0 * rr * CAST(sxy AS DOUBLE)
               + rr * rr * CAST(sxx AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS v_ratio,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS v_mpu
           FROM ch)
         SELECT n,
           CAST(floor(rr * 1000000.0) AS BIGINT) AS r_e6,
           CAST(floor(v_ratio * 1000000.0) AS BIGINT) AS v_ratio_e6,
           CAST(floor(v_mpu * 1000000.0) AS BIGINT) AS v_mpu_e6,
           CASE WHEN v_ratio > 0.0
             THEN CAST(floor(v_mpu / v_ratio * 1000000.0) AS BIGINT)
             ELSE 0 END AS efficiency_e6
         FROM ch2""",

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

    "q493_wilcoxon_signed_rank" ->
      """WITH cell AS (
           SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m
           FROM events GROUP BY 1, 2),
         t2 AS (
           SELECT event_type, count(*) AS nd
           FROM cell GROUP BY 1 ORDER BY nd DESC, event_type LIMIT 2),
         types AS (
           SELECT a.event_type,
             CAST(1 + (SELECT count(*) FROM t2 b WHERE b.nd > a.nd
               OR (b.nd = a.nd AND b.event_type < a.event_type))
               AS BIGINT) AS side
           FROM t2 a),
         dd AS (
           SELECT day, m1 - m2 AS dv, abs(m1 - m2) AS ad
           FROM (
             SELECT day,
               max(CASE WHEN side = 1 THEN m END) AS m1,
               max(CASE WHEN side = 2 THEN m END) AS m2
             FROM cell JOIN types USING (event_type) GROUP BY 1)
           WHERE m1 IS NOT NULL AND m2 IS NOT NULL AND m1 - m2 <> 0),
         rk AS (
           SELECT day, dv, ad,
             2 * (SELECT count(*) FROM dd b WHERE b.ad < a.ad)
               + (SELECT count(*) FROM dd b WHERE b.ad = a.ad) + 1 AS r2
           FROM dd a),
         ties AS (
           SELECT CAST(sum(tg * tg * tg - tg) AS BIGINT) AS tie_sum
           FROM (SELECT ad, count(*) AS tg FROM dd GROUP BY 1)),
         ag AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN dv > 0 THEN r2 ELSE 0 END) AS BIGINT)
               AS w2_plus
           FROM rk),
         ch AS (
           SELECT *,
             CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0 AS mu,
             CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
               * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
               - CAST(tie_sum AS DOUBLE) / 12.0 AS s2
           FROM ag, ties)
         SELECT n, w2_plus, tie_sum,
           CASE WHEN s2 > 0.0
             THEN CAST(floor((CAST(w2_plus AS DOUBLE) / 2.0 - mu / 2.0)
               / sqrt(s2 / 4.0) * 1000000.0) AS BIGINT)
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

    "q489_friedman" ->
      """WITH cell AS (
           SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m
           FROM events GROUP BY 1, 2),
         kk0 AS (SELECT count(DISTINCT event_type) AS k FROM cell),
         full0 AS (
           SELECT c.day, c.event_type, c.m
           FROM cell c
           JOIN (SELECT day, count(*) AS nb FROM cell GROUP BY 1) b
             USING (day), kk0
           WHERE b.nb = kk0.k),
         rk AS (
           SELECT day, event_type, m,
             CAST(rank() OVER (PARTITION BY day ORDER BY m) AS BIGINT)
               AS rmin,
             CAST(count(*) OVER (PARTITION BY day, m) AS BIGINT) AS tc
           FROM full0),
         r2 AS (
           SELECT day, event_type, m, 2 * rmin + tc - 1 AS r2 FROM rk),
         ties AS (
           SELECT CAST(sum(tg * tg * tg - tg) AS BIGINT) AS tie_sum
           FROM (SELECT day, m, count(*) AS tg FROM full0 GROUP BY 1, 2)),
         pj AS (
           SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_j,
             count(*) AS n_blocks
           FROM r2 GROUP BY 1),
         ag AS (
           SELECT count(*) AS kk, max(n_blocks) AS n,
             CAST(sum(r2_j * r2_j) AS BIGINT) AS sr2
           FROM pj),
         ch AS (
           SELECT *,
             (12.0 * (CAST(sr2 AS DOUBLE) / 4.0)
               / (CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                 * (CAST(kk AS DOUBLE) + 1.0))
               - 3.0 * CAST(n AS DOUBLE) * (CAST(kk AS DOUBLE) + 1.0))
               / (1.0 - CAST(tie_sum AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
                   * (CAST(kk AS DOUBLE) * CAST(kk AS DOUBLE) - 1.0)))
               AS chi
           FROM ag, ties)
         SELECT n AS n_blocks, kk AS k_groups, tie_sum,
           CAST(floor(chi * 1000000.0) AS BIGINT) AS chi2_e6
         FROM ch""",

    "q490_tail_model_lr" ->
      """WITH f AS (
           SELECT CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)
             AS lx_e6
           FROM (SELECT tok, count(*) AS c
                 FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
                       FROM documents)
                 GROUP BY 1)
           WHERE c >= 5),
         ag AS (
           SELECT count(*) AS n, CAST(sum(lx_e6) AS BIGINT) AS slx,
             CAST(sum(CAST(floor(CAST(lx_e6 AS DOUBLE)
               * CAST(lx_e6 AS DOUBLE) / 1000000.0) AS BIGINT))
               AS BIGINT) AS slx2_e6
           FROM f),
         ch AS (
           SELECT n, CAST(slx AS DOUBLE) / 1000000.0 AS slxd,
             CAST(slx2_e6 AS DOUBLE) / 1000000.0 AS slx2d
           FROM ag),
         ch2 AS (
           SELECT *,
             CAST(n AS DOUBLE) / (slxd - CAST(n AS DOUBLE) * ln(5.0))
               AS alpha,
             slxd / CAST(n AS DOUBLE) AS mu,
             (slx2d - slxd * slxd / CAST(n AS DOUBLE))
               / CAST(n AS DOUBLE) AS s2
           FROM ch),
         ch3 AS (
           SELECT *,
             CAST(n AS DOUBLE) * ln(alpha)
               + CAST(n AS DOUBLE) * alpha * ln(5.0)
               - (alpha + 1.0) * slxd AS ll_par,
             0.0 - slxd - CAST(n AS DOUBLE) / 2.0
               * ln(2.0 * 3.141592653589793 * s2)
               - (slx2d - 2.0 * mu * slxd
                 + CAST(n AS DOUBLE) * mu * mu) / (2.0 * s2) AS ll_ln
           FROM ch2)
         SELECT n,
           CAST(floor(alpha * 1000000.0) AS BIGINT) AS alpha_e6,
           CAST(floor(mu * 1000000.0) AS BIGINT) AS mu_e6,
           CAST(floor(s2 * 1000000.0) AS BIGINT) AS s2_e6,
           CAST(floor((ll_par - ll_ln) * 1000.0) AS BIGINT) AS llr_e3
         FROM ch3""",

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

    "q484_source_ablation" ->
      s"""WITH per AS (
           SELECT source, count(*) AS n_s,
             CAST(sum(keep) AS BIGINT) AS k_s,
             CAST(sum(n_chars) AS BIGINT) AS sl_s
           FROM (SELECT source, n_chars,
                   ${TrainingShared.keepRuleSql} AS keep
                 FROM (SELECT source, n_chars, text,
                         string_split(lower(text), ' ') AS w
                       FROM documents))
           GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n_s) AS BIGINT) AS n,
             CAST(sum(k_s) AS BIGINT) AS k,
             CAST(sum(sl_s) AS BIGINT) AS sl
           FROM per)
         SELECT source, n_s,
           k * 1000000 // n AS global_keep_e6,
           (k - k_s) * 1000000 // (n - n_s) AS loo_keep_e6,
           (k - k_s) * 1000000 // (n - n_s) - k * 1000000 // n
             AS delta_keep_e6,
           (sl - sl_s) * 1000000 // (n - n_s) AS loo_len_e6,
           (sl - sl_s) * 1000000 // (n - n_s) - sl * 1000000 // n
             AS delta_len_e6
         FROM per, tot""",

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

    "q483_successive_halving" -> {
      val stopAll = TrainingShared.hitsSql(
        graft.functions.TextFunctions.langStopwords.flatMap(_._2))
      val h60sh = TrainingShared.h60("concat('sh:', CAST(doc_id AS VARCHAR))")
      val grid = for {
        (lm, i) <- Seq(5L, 10L, 20L, 40L).zipWithIndex
        (se, j) <- Seq(0L, 1L).zipWithIndex
      } yield (i * 2 + j, lm, se)
      val gridSql = grid.map { case (id, lm, se) =>
        s"($id, $lm, $se)"
      }.mkString("VALUES ", ", ", "")
      def f1At(s2: Long) =
        s"""SELECT cfg,
             2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS f1_s$s2
           FROM (SELECT cfg, CAST(sum(tp) AS BIGINT) AS tp,
                   CAST(sum(fp) AS BIGINT) AS fp,
                   CAST(sum(fn) AS BIGINT) AS fn
                 FROM cells WHERE bucket < $s2 GROUP BY 1)"""
      def topK(src: String, fcol: String, k: Int) =
        s"""SELECT cfg FROM (
             SELECT a.cfg,
               (SELECT count(*) FROM $src b
                WHERE b.$fcol > a.$fcol
                  OR (b.$fcol = a.$fcol AND b.cfg < a.cfg)) AS nbet
             FROM $src a)
           WHERE nbet < $k"""
      s"""WITH b0 AS (
           SELECT doc_id, text, string_split(lower(text), ' ') AS w
           FROM documents),
         base AS (
           SELECT
             (len(w) >= 10 AND len(w) <= 100000 AND
               (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                 ELSE 0.0 END) > 0.001) AS refl,
             CAST(len(w) AS BIGINT) AS nw,
             round(CASE WHEN len(w) > 0
               THEN CAST($stopAll AS DOUBLE) / len(w)
               ELSE 0.0 END, 6) * 1000.0 AS sr_e3,
             ($h60sh) % 8 AS bucket
           FROM b0),
         grid AS (SELECT * FROM ($gridSql) t(cfg, lm, se)),
         cells AS (
           SELECT cfg, bucket,
             CAST(sum(CASE WHEN pred AND refl THEN 1 ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred AND NOT refl THEN 1 ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT pred AND refl THEN 1 ELSE 0 END)
               AS BIGINT) AS fn
           FROM (SELECT CAST(cfg AS BIGINT) AS cfg, bucket, refl,
                   (nw >= lm AND sr_e3 > CAST(se AS DOUBLE)) AS pred
                 FROM base, grid)
           GROUP BY 1, 2),
         r1 AS MATERIALIZED (${f1At(1L)}),
         s2 AS MATERIALIZED (${topK("r1", "f1_s1", 4)}),
         r2 AS MATERIALIZED (
           SELECT f.* FROM (${f1At(2L)}) f JOIN s2 USING (cfg)),
         s3 AS MATERIALIZED (${topK("r2", "f1_s2", 2)}),
         r3 AS MATERIALIZED (
           SELECT f.* FROM (${f1At(4L)}) f JOIN s3 USING (cfg)),
         win AS (
           SELECT cfg, true AS winner FROM (${topK("r3", "f1_s4", 1)}))
         SELECT r1.cfg, f1_s1, f1_s2, f1_s4,
           COALESCE(winner, false) AS winner
         FROM r1
         LEFT JOIN r2 USING (cfg)
         LEFT JOIN r3 USING (cfg)
         LEFT JOIN win USING (cfg)"""
    },

    "q472_mi_feature_ranking" -> {
      def miSql(name: String, xExpr: String) =
        s"""SELECT '$name' AS feature, n_cells, mi_sum_e9 // 1000 AS mi_e6
           FROM (
             SELECT count(*) AS n_cells,
               CAST(sum(t_e9) AS BIGINT) AS mi_sum_e9
             FROM (
               SELECT CAST(floor(
                 (CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                   / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
                 * 1000000000.0) AS BIGINT) AS t_e9
               FROM (
                 SELECT x, y, nxy,
                   CAST(sum(nxy) OVER (PARTITION BY x) AS BIGINT) AS nx,
                   CAST(sum(nxy) OVER (PARTITION BY y) AS BIGINT) AS ny,
                   CAST(sum(nxy) OVER () AS BIGINT) AS n
                 FROM (
                   SELECT CAST($xExpr AS VARCHAR) AS x, y, count(*) AS nxy
                   FROM f GROUP BY 1, 2))))"""
      s"""WITH f AS (
           SELECT lang, source, least(n_chars // 200, 9) AS len_dec,
             ${TrainingShared.keepRuleSql} AS y
           FROM (SELECT lang, source, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents))
         ${miSql("lang", "lang")}
         UNION ALL ${miSql("source", "source")}
         UNION ALL ${miSql("len_decile", "len_dec")}"""
    },

    "q469_design_effect" ->
      """WITH cl AS (
           SELECT user_id, count(*) AS n_c,
             CAST(sum(v) AS BIGINT) AS s_c,
             CAST(sum(v * v) AS BIGINT) AS ss_c
           FROM (SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v
                 FROM events)
           GROUP BY 1),
         ag AS (
           SELECT count(*) AS k, CAST(sum(n_c) AS BIGINT) AS n,
             CAST(sum(s_c) AS BIGINT) AS s_all,
             CAST(sum(ss_c) AS BIGINT) AS ss_all,
             CAST(sum(n_c * n_c) AS BIGINT) AS sn2,
             CAST(sum(CAST(floor((CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)
               / CAST(n_c AS DOUBLE)) * 100.0) AS BIGINT)) AS BIGINT)
               AS a_e2
           FROM cl),
         ch AS (
           SELECT *,
             CAST(a_e2 AS DOUBLE) / 100.0 - CAST(s_all AS DOUBLE)
               * CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
             CAST(ss_all AS DOUBLE) - CAST(a_e2 AS DOUBLE) / 100.0 AS ssw
           FROM ag),
         ch2 AS (
           SELECT *, ssb / (CAST(k AS DOUBLE) - 1.0) AS msb,
             ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
             (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1.0) AS m0
           FROM ch),
         ch3 AS (
           SELECT *, (msb - msw) / (msb + (m0 - 1.0) * msw) AS icc
           FROM ch2)
         SELECT k, n,
           CAST(floor(m0 * 1000000.0) AS BIGINT) AS m0_e6,
           CAST(floor(icc * 1000000.0) AS BIGINT) AS icc_e6,
           CAST(floor((1.0 + (m0 - 1.0) * icc) * 1000000.0) AS BIGINT)
             AS deff_e6
         FROM ch3""",

    "q470_poststratified_mean" ->
      """WITH docs AS (SELECT lang, doc_id, n_chars AS y FROM documents),
         pop AS (SELECT lang, count(*) AS nh_pop FROM docs GROUP BY 1),
         samp AS (
           SELECT lang, count(*) AS nh, CAST(sum(y) AS BIGINT) AS sh,
             CAST(sum(y * y) AS BIGINT) AS ssh
           FROM docs WHERE doc_id % 7 = 0 GROUP BY 1),
         tots AS (
           SELECT count(*) AS n_pop, CAST(sum(y) AS BIGINT) AS sy_pop
           FROM docs),
         j AS (
           SELECT samp.*, pop.nh_pop, tots.n_pop, tots.sy_pop
           FROM samp JOIN pop USING (lang) CROSS JOIN tots),
         ag AS (
           SELECT CAST(sum(nh) AS BIGINT) AS n_sample,
             CAST(sum(sh) AS BIGINT) AS sy_s,
             max(n_pop) AS n_pop, max(sy_pop) AS sy_pop,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(
               (CAST(nh_pop AS DOUBLE) / CAST(n_pop AS DOUBLE))
                 * (CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE))
               ORDER BY lang)), (acc, x) -> acc + x) AS pmean,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(
               (CAST(nh_pop AS DOUBLE) / CAST(n_pop AS DOUBLE))
                 * (CAST(nh_pop AS DOUBLE) / CAST(n_pop AS DOUBLE))
                 * ((CAST(ssh AS DOUBLE) - CAST(sh AS DOUBLE)
                   * CAST(sh AS DOUBLE) / CAST(nh AS DOUBLE))
                   / (CAST(nh AS DOUBLE) - 1.0))
                 / CAST(nh AS DOUBLE)
               ORDER BY lang)), (acc, x) -> acc + x) AS pvar
           FROM j)
         SELECT n_sample,
           sy_s * 1000000 // n_sample AS plain_mean_e6,
           CAST(floor(pmean * 1000000.0) AS BIGINT) AS poststrat_mean_e6,
           sy_pop * 1000000 // n_pop AS true_mean_e6,
           CAST(floor(pvar * 1000000.0) AS BIGINT) AS pvar_e6
         FROM ag""",

    "q462_cascade_filter" ->
      s"""WITH f AS (
           SELECT ${TrainingShared.keepRuleSql} AS keep,
             CAST(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS BIGINT)
               AS s1
           FROM (SELECT n_chars, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         ag AS (
           SELECT count(*) AS n, CAST(sum(keep) AS BIGINT) AS full_keeps,
             CAST(sum(s1 * keep) AS BIGINT) AS cascade_keeps,
             CAST(sum(s1) AS BIGINT) AS survivors
           FROM f)
         SELECT n, full_keeps, cascade_keeps, survivors,
           CASE WHEN full_keeps > 0
             THEN cascade_keeps * 1000000 // full_keeps
             ELSE 1000000 END AS recall_e6,
           10 * n AS cost_full,
           n + 10 * survivors AS cost_cascade,
           (n + 10 * survivors) * 1000000 // (10 * n) AS cost_ratio_e6
         FROM ag""",

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

    "q449_cochran_armitage" ->
      s"""WITH f AS (
           SELECT least(n_chars // 200, 9) AS sc,
             ${TrainingShared.keepRuleSql} AS keep
           FROM (SELECT n_chars, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         ag AS (
           SELECT count(*) AS n, CAST(sum(keep) AS BIGINT) AS r,
             CAST(sum(sc * keep) AS BIGINT) AS ssr,
             CAST(sum(sc) AS BIGINT) AS ssn,
             CAST(sum(sc * sc) AS BIGINT) AS ss2n
           FROM f),
         ch AS (
           SELECT *, CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS pbar
           FROM ag),
         ch2 AS (
           SELECT *,
             CAST(ssr AS DOUBLE) - pbar * CAST(ssn AS DOUBLE) AS tt,
             pbar * (1.0 - pbar) * (CAST(ss2n AS DOUBLE)
               - CAST(ssn AS DOUBLE) * CAST(ssn AS DOUBLE)
               / CAST(n AS DOUBLE)) AS vv
           FROM ch)
         SELECT n, r,
           CAST(floor(tt * 1000000.0) AS BIGINT) AS t_e6,
           CASE WHEN vv > 0.0
             THEN CAST(floor(tt / sqrt(vv) * 1000000.0) AS BIGINT)
             ELSE 0 END AS z_e6
         FROM ch2""",

    "q450_cronbach_alpha" ->
      s"""WITH f AS (
           SELECT ${TrainingShared.keepRuleSql} AS x1,
             CAST(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS BIGINT) AS x2,
             CAST(CASE WHEN len(w) >= 15 THEN 1 ELSE 0 END AS BIGINT) AS x3
           FROM (SELECT n_chars, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         g AS (SELECT *, x1 + x2 + x3 AS h FROM f),
         ag AS (
           SELECT count(*) AS n,
             CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
             CAST(sum(x3) AS BIGINT) AS s3, CAST(sum(h) AS BIGINT) AS sh,
             CAST(sum(h * h) AS BIGINT) AS shh
           FROM g),
         ch AS (
           SELECT *,
             (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v1,
             (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v2,
             (CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE)
               - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS v3,
             (CAST(n AS DOUBLE) * CAST(shh AS DOUBLE)
               - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS vt
           FROM ag)
         SELECT n,
           CAST(floor(vt * 1000000.0) AS BIGINT) AS var_total_e6,
           CASE WHEN vt > 0.0
             THEN CAST(floor(1.5 * (1.0 - (v1 + v2 + v3) / vt)
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS alpha_e6
         FROM ch""",

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

    "q446_l_moments" ->
      """WITH rk AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY CAST(floor(value * 100)
               AS BIGINT), event_id) AS BIGINT) AS r
           FROM events),
         ag AS (
           SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s0,
             sum(CAST(r - 1 AS HUGEINT) * CAST(x AS HUGEINT)) AS s1,
             sum(CAST(r - 1 AS HUGEINT) * CAST(r - 2 AS HUGEINT)
               * CAST(x AS HUGEINT)) AS s2,
             sum(CAST(r - 1 AS HUGEINT) * CAST(r - 2 AS HUGEINT)
               * CAST(r - 3 AS HUGEINT) * CAST(x AS HUGEINT)) AS s3
           FROM rk),
         b AS (
           SELECT n,
             CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
             CAST(s1 AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS b1,
             CAST(s2 AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                 * (CAST(n AS DOUBLE) - 2.0)) AS b2,
             CAST(s3 AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                 * (CAST(n AS DOUBLE) - 2.0)
                 * (CAST(n AS DOUBLE) - 3.0)) AS b3
           FROM ag),
         l AS (
           SELECT n, b0, 2.0 * b1 - b0 AS l2,
             6.0 * b2 - 6.0 * b1 + b0 AS l3,
             20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0 AS l4
           FROM b)
         SELECT n,
           CAST(floor(b0 * 1000000.0) AS BIGINT) AS l1_e6,
           CAST(floor(l2 * 1000000.0) AS BIGINT) AS l2_e6,
           CASE WHEN l2 > 0.0
             THEN CAST(floor(l3 / l2 * 1000000.0) AS BIGINT)
             ELSE 0 END AS t3_e6,
           CASE WHEN l2 > 0.0
             THEN CAST(floor(l4 / l2 * 1000000.0) AS BIGINT)
             ELSE 0 END AS t4_e6
         FROM l""",

    "q447_dalenius_hodges" ->
      """WITH hist AS (
           SELECT CAST(floor(value * 100) AS BIGINT) AS v,
             count(*) AS f
           FROM events GROUP BY 1),
         sf AS (
           SELECT v, f,
             CAST(floor(sqrt(CAST(f AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS sf_e6
           FROM hist),
         cum AS (
           SELECT v, f,
             CAST(sum(sf_e6) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS csf
           FROM sf),
         tot AS (SELECT max(csf) AS tcsf FROM cum),
         st AS (
           SELECT v, f,
             least((csf - 1) * 5 // tcsf + 1, 5) AS stratum
           FROM cum, tot)
         SELECT stratum, min(v) AS v_lo, max(v) AS v_hi,
           CAST(sum(f) AS BIGINT) AS n_h,
           CAST(sum(f * v) AS BIGINT) // CAST(sum(f) AS BIGINT) AS mean_v
         FROM st GROUP BY 1""",

    "q448_nb_overdispersion" ->
      """WITH cnt AS (
           SELECT event_type, user_id, count(*) AS k
           FROM events GROUP BY 1, 2),
         ag AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(k) AS BIGINT) AS sk,
             CAST(sum(k * k) AS BIGINT) AS skk
           FROM cnt GROUP BY 1),
         ch AS (
           SELECT *,
             CAST(sk AS DOUBLE) / CAST(n AS DOUBLE) AS m,
             (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)
               / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS v
           FROM ag)
         SELECT event_type, n,
           CAST(floor(m * 1000000.0) AS BIGINT) AS mean_e6,
           CAST(floor(v * 1000000.0) AS BIGINT) AS var_e6,
           CASE WHEN m > 0.0
             THEN CAST(floor(v / m * 1000000.0) AS BIGINT)
             ELSE 0 END AS dispersion_e6,
           CASE WHEN v > m
             THEN CAST(floor(m * m / (v - m) * 1000000.0) AS BIGINT)
             ELSE 0 END AS nb_r_e6,
           v > m AS overdispersed
         FROM ch""",

    "q445_ipf_raking" -> {
      val steps = (1 to 2).flatMap { r =>
        Seq(
          s"""r$r AS MATERIALIZED (
           SELECT p.source, p.lang, p.m,
             p.w * (tr.tr * 1000000 * 1000000 // greatest(sw.sw, 1))
               // 1000000 AS w
           FROM ${if (r == 1) "w0" else s"c${r - 1}"} p
           JOIN (SELECT source, CAST(sum(m * w) AS BIGINT) AS sw
                 FROM ${if (r == 1) "w0" else s"c${r - 1}"} GROUP BY 1) sw
             USING (source)
           JOIN tr USING (source))""",
          s"""c$r AS MATERIALIZED (
           SELECT p.source, p.lang, p.m,
             p.w * (tc.tc * 1000000 * 1000000 // greatest(sw.sw, 1))
               // 1000000 AS w
           FROM r$r p
           JOIN (SELECT lang, CAST(sum(m * w) AS BIGINT) AS sw
                 FROM r$r GROUP BY 1) sw USING (lang)
           JOIN tc USING (lang))""")
      }.mkString(",\n         ")
      s"""WITH docs AS (SELECT source, lang, doc_id FROM documents),
         samp AS (SELECT * FROM docs WHERE doc_id % 7 = 0),
         np AS (SELECT count(*) AS np FROM docs),
         ns AS (SELECT count(*) AS ns FROM samp),
         tr AS (
           SELECT source, CAST(count(*) AS BIGINT) * (SELECT ns FROM ns)
             // (SELECT np FROM np) AS tr
           FROM docs GROUP BY 1),
         tc AS (
           SELECT lang, CAST(count(*) AS BIGINT) * (SELECT ns FROM ns)
             // (SELECT np FROM np) AS tc
           FROM docs GROUP BY 1),
         w0 AS (
           SELECT source, lang, count(*) AS m, CAST(1000000 AS BIGINT) AS w
           FROM samp GROUP BY 1, 2),
         $steps
         SELECT c2.source, c2.lang, c2.m, c2.w AS w_e6, tr.tr, tc.tc
         FROM c2 JOIN tr USING (source) JOIN tc USING (lang)"""
    },

    "q461_systematic_pps" -> {
      val h60 = TrainingShared.h60("'pps'")
      s"""WITH docs AS (
           SELECT doc_id, n_chars AS w,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS y
           FROM documents),
         cum AS (
           SELECT doc_id, w, y,
             CAST(COALESCE(sum(w) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cw
           FROM docs),
         params AS (
           SELECT CAST(sum(w) AS BIGINT) AS wt,
             CAST(sum(y) AS BIGINT) AS y_exact,
             CAST(sum(w) AS BIGINT) // 50 AS stride,
             ($h60) % (CAST(sum(w) AS BIGINT) // 50) AS off
           FROM docs),
         sel AS (
           SELECT *,
             (cw + w + stride - 1 - off) // stride
               - (cw + stride - 1 - off) // stride AS mult
           FROM cum, params),
         ag AS (
           SELECT count(*) AS n_selected,
             CAST(sum(mult) AS BIGINT) AS k_points,
             CAST(sum(mult * (y * 1000000 // w)) AS BIGINT) AS syw_e6,
             max(stride) AS stride, max(y_exact) AS y_exact
           FROM sel WHERE mult > 0)
         SELECT n_selected, k_points, y_exact,
           syw_e6 * stride // 1000000 AS y_est,
           (syw_e6 * stride // 1000000 - y_exact) * 1000000 // y_exact
             AS err_e6
         FROM ag"""
    },

    "q442_priority_sampling" -> {
      val h60 = TrainingShared.h60("concat('prio:', CAST(doc_id AS VARCHAR))")
      s"""WITH docs AS (
           SELECT doc_id, n_chars AS w, $h60 AS hv
           FROM documents),
         q AS (
           SELECT doc_id, w,
             CAST(w AS DOUBLE) * 1152921504606846976.0 / CAST(hv AS DOUBLE)
               AS q
           FROM docs),
         top AS MATERIALIZED (
           SELECT * FROM q ORDER BY q DESC, doc_id LIMIT 33),
         tau AS (SELECT min(q) AS tau FROM top),
         samp AS (
           SELECT doc_id, w, (SELECT tau FROM tau) AS tau
           FROM top WHERE q > (SELECT tau FROM tau)),
         ag AS (
           SELECT count(*) AS k_sample,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(greatest(CAST(w AS DOUBLE), tau) ORDER BY doc_id)),
               (acc, x) -> acc + x) AS est_d
           FROM samp),
         tot AS (SELECT CAST(sum(w) AS BIGINT) AS exact_total FROM docs)
         SELECT k_sample, CAST(floor(est_d) AS BIGINT) AS est_total,
           exact_total,
           (CAST(floor(est_d) AS BIGINT) - exact_total) * 1000000
             // exact_total AS err_e6
         FROM ag, tot"""
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

    "q431_anova_oneway" ->
      s"""WITH xs AS (
           SELECT event_type AS g,
             CAST(floor(value * 100) AS BIGINT) AS x
           FROM events),
         $anovaSqlTail""",

    "q432_brown_forsythe" ->
      s"""WITH ev AS (
           SELECT event_type AS g,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         med AS (
           SELECT g, CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS med2
           FROM ev GROUP BY 1),
         xs AS (
           SELECT ev.g, abs(2 * ev.v - med.med2) AS x
           FROM ev JOIN med USING (g)),
         $anovaSqlTail""",

    "q433_cohens_d" ->
      """WITH per AS (
           SELECT event_type AS g, count(*) AS n_t,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS s_t,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)
               * CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS ss_t
           FROM events GROUP BY 1),
         pr AS (
           SELECT a.g AS t1, b.g AS t2, a.n_t AS n1, b.n_t AS n2,
             a.s_t AS s1, b.s_t AS s2, a.ss_t AS ss1, b.ss_t AS ss2
           FROM per a JOIN per b ON a.g < b.g),
         ch AS (
           SELECT *,
             ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n1 AS DOUBLE))
               + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 / CAST(n2 AS DOUBLE)))
               / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) AS sp2
           FROM pr)
         SELECT t1, t2, n1, n2,
           CASE WHEN sp2 > 0.0
             THEN CAST(floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt(sp2)
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS d_e6,
           CASE WHEN sp2 > 0.0
             THEN CAST(floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / sqrt(sp2)
               * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE)
                 + CAST(n2 AS DOUBLE)) - 9.0)) * 1000000.0) AS BIGINT)
             ELSE 0 END AS g_e6
         FROM ch""",

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

    "q388_neyman_allocation" ->
      """WITH ev AS (
           SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         sums AS (
           SELECT event_type, count(*) AS n_pop,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(v * v) AS BIGINT) AS svv
           FROM ev GROUP BY event_type),
         alloc AS (
           SELECT event_type, n_pop, nhsh,
             500 * nhsh // CAST(sum(nhsh) OVER () AS BIGINT) AS alloc
           FROM (
             SELECT event_type, n_pop,
               CAST(floor(CAST(n_pop AS DOUBLE) *
                 sqrt((CAST(svv AS DOUBLE)
                   - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                     / CAST(n_pop AS DOUBLE))
                   / (CAST(n_pop AS DOUBLE) - 1.0))) AS BIGINT) AS nhsh
             FROM sums)),
         ranked AS (
           SELECT event_type, event_id,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
               AS BIGINT) AS rk
           FROM ev)
         SELECT r.event_type, a.n_pop, a.nhsh, a.alloc,
           count(*) AS n_sampled,
           CAST(bit_xor(r.event_id) AS BIGINT) AS sample_xor
         FROM ranked r JOIN alloc a ON r.event_type = a.event_type
         WHERE r.rk <= a.alloc
         GROUP BY r.event_type, a.n_pop, a.nhsh, a.alloc""",
    "q391_wasserstein" ->
      """WITH hist AS (
           SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
             count(*) AS c
           FROM events GROUP BY 1, 2),
         tot AS (
           SELECT event_type, CAST(sum(c) AS BIGINT) AS n
           FROM hist GROUP BY 1),
         pairs AS (
           SELECT a.event_type AS ta, a.n AS n1, b.event_type AS tb,
             b.n AS n2
           FROM tot a CROSS JOIN tot b WHERE a.event_type < b.event_type),
         merged AS (
           SELECT ta, tb, n1, n2, v,
             CAST(sum(ca) AS BIGINT) AS ca, CAST(sum(cb) AS BIGINT) AS cb
           FROM (
             SELECT p.ta, p.tb, p.n1, p.n2, h.v, h.c AS ca, 0 AS cb
             FROM hist h JOIN pairs p ON h.event_type = p.ta
             UNION ALL
             SELECT p.ta, p.tb, p.n1, p.n2, h.v, 0 AS ca, h.c AS cb
             FROM hist h JOIN pairs p ON h.event_type = p.tb)
           GROUP BY 1, 2, 3, 4, 5),
         cum AS (
           SELECT ta, tb, n1, n2, v,
             CAST(sum(ca) OVER (PARTITION BY ta, tb ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum1,
             CAST(sum(cb) OVER (PARTITION BY ta, tb ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum2,
             lead(v) OVER (PARTITION BY ta, tb ORDER BY v) - v AS dv
           FROM merged)
         SELECT ta, tb, n1, n2, count(*) AS n_vals,
           CAST(sum(coalesce(dv, 0) *
             ((abs(cum1 * n2 - cum2 * n1) * 1000000) // (n1 * n2)))
             AS BIGINT) AS w1_cent_e6
         FROM cum GROUP BY ta, tb, n1, n2""",
    "q417_good_turing" ->
      """WITH tok AS (
           SELECT t AS tok, count(*) AS r
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
                 FROM documents)
           GROUP BY 1),
         nr AS (SELECT r, count(*) AS n_r FROM tok GROUP BY 1),
         tot AS (
           SELECT CAST(sum(r) AS BIGINT) AS n_tokens, count(*) AS v
           FROM tok)
         SELECT a.r, a.n_r, coalesce(b.n_r, 0) AS n_r1,
           (a.r + 1) * coalesce(b.n_r, 0) * 1000000 // a.n_r AS r_star_e6,
           n_tokens, v,
           a.n_r * 1000000 // n_tokens AS mass_share_e6
         FROM nr a LEFT JOIN nr b ON b.r = a.r + 1, tot
         WHERE a.r <= 10""",

    "q418_mantel_haenszel" ->
      """WITH cells AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND value >= 100.0
               THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND NOT value >= 100.0
               THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN user_id % 2 <> 0 AND value >= 100.0
               THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN user_id % 2 <> 0 AND NOT value >= 100.0
               THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM events GROUP BY 1),
         t2 AS (
           SELECT *, a * d * 1000000 // n AS num_e6,
             b * c * 1000000 // n AS den_e6
           FROM cells),
         pooled AS (
           SELECT CAST(sum(num_e6) AS BIGINT) AS snum,
             CAST(sum(den_e6) AS BIGINT) AS sden
           FROM t2)
         SELECT event_type, n, a, b, c, d,
           CASE WHEN b * c > 0 THEN (a * d * 1000000) // (b * c)
             ELSE -1 END AS or_e6,
           snum * 1000000 // greatest(sden, 1) AS or_mh_e6
         FROM t2, pooled""",

    "q419_mcnemar" -> {
      val stopAll = TrainingShared.hitsSql(TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH flags AS (
           SELECT
             (len(w) >= 10 AND len(w) <= 100000 AND
              (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                ELSE 0.0 END) > 0.001) AS ka,
             n_chars >= 200 AS kb
           FROM (SELECT text, n_chars, string_split(lower(text), ' ') AS w
                 FROM documents)),
         agg AS (
           SELECT count(*) AS n,
             CAST(sum(CASE WHEN ka AND kb THEN 1 ELSE 0 END)
               AS BIGINT) AS n_both,
             CAST(sum(CASE WHEN ka AND NOT kb THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT ka AND kb THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT ka AND NOT kb THEN 1 ELSE 0 END)
               AS BIGINT) AS neither
           FROM flags)
         SELECT n, n_both, b, c, neither,
           CASE WHEN b + c > 0
             THEN ((b - c) * (b - c) * 1000000) // (b + c)
             ELSE 0 END AS chi2_e6,
           CASE WHEN b + c > 0
             THEN ((abs(b - c) - 1) * (abs(b - c) - 1) * 1000000) // (b + c)
             ELSE 0 END AS chi2_cc_e6,
           CASE WHEN b + c > 0
             THEN ((b - c) * (b - c) * 1000000) // (b + c)
             ELSE 0 END > 3841459 AS significant_05
         FROM agg"""
    },

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

    "q401_chi2_independence" ->
      """WITH docs AS (SELECT source, lang FROM documents),
         obs AS (SELECT source, lang, count(*) AS o FROM docs GROUP BY 1, 2),
         rt AS (SELECT source, count(*) AS r_tot FROM docs GROUP BY 1),
         ct AS (SELECT lang, count(*) AS c_tot FROM docs GROUP BY 1),
         nn AS (SELECT count(*) AS n FROM docs),
         grid AS (
           SELECT rt.source, ct.lang, rt.r_tot, ct.c_tot, nn.n,
             coalesce(obs.o, 0) AS o
           FROM rt CROSS JOIN ct CROSS JOIN nn
           LEFT JOIN obs ON obs.source = rt.source AND obs.lang = ct.lang),
         cells AS (
           SELECT n, source, lang,
             CAST(floor(CAST(o * n - r_tot * c_tot AS DOUBLE)
               * CAST(o * n - r_tot * c_tot AS DOUBLE)
               / CAST(r_tot * c_tot AS DOUBLE) / CAST(n AS DOUBLE)
               * 1000000.0) AS BIGINT) AS cell_e6
           FROM grid),
         agg AS (
           SELECT n, count(DISTINCT source) AS r_cats,
             count(DISTINCT lang) AS c_cats,
             CAST(sum(cell_e6) AS BIGINT) AS chi2_e6
           FROM cells GROUP BY n)
         SELECT n, r_cats, c_cats,
           (r_cats - 1) * (c_cats - 1) AS dof, chi2_e6,
           CAST(floor(sqrt(CAST(chi2_e6 AS DOUBLE) / 1000000.0
             / CAST(n * least(r_cats - 1, c_cats - 1) AS DOUBLE))
             * 1000000.0) AS BIGINT) AS cramers_v_e6
         FROM agg""",

    "q402_ips_eval" ->
      """WITH ev AS (
           SELECT user_id % 10 AS x, event_type AS a,
             CAST(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS BIGINT)
               AS r,
             event_id % 2 = 0 AS train
           FROM events),
         pol AS (
           SELECT x, a AS a_star FROM (
             SELECT x, a,
               row_number() OVER (PARTITION BY x ORDER BY
                 CAST(sum(r) AS BIGINT) * 1000000 // count(*) DESC, a)
                 AS rn
             FROM ev WHERE train GROUP BY x, a)
           WHERE rn = 1),
         lg AS (
           SELECT x, a, count(*) AS c_xa, CAST(sum(r) AS BIGINT) AS sr,
             CAST(sum(count(*)) OVER (PARTITION BY x) AS BIGINT) AS c_x
           FROM ev WHERE NOT train GROUP BY x, a)
         SELECT l.x, p.a_star, l.c_x, l.c_xa, l.sr AS sum_r_match,
           l.c_x * 1000000 // l.c_xa AS w_e6,
           (l.sr * (l.c_x * 1000000 // l.c_xa)) // l.c_x AS ips_x_e6
         FROM lg l JOIN pol p ON l.x = p.x AND l.a = p.a_star""",
    "q403_rdd" ->
      """WITH base AS (
           SELECT CAST(l_quantity AS BIGINT) - 25 AS u,
             CAST(floor(l_discount * 100) AS BIGINT) AS y
           FROM lineitem
           WHERE CAST(l_quantity AS BIGINT) - 25 BETWEEN -10 AND 10),
         a AS (
           SELECT
             CAST(sum(CASE WHEN u < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
             CAST(sum(CASE WHEN u < 0 THEN u ELSE 0 END) AS BIGINT) AS sx_l,
             CAST(sum(CASE WHEN u < 0 THEN y ELSE 0 END) AS BIGINT) AS sy_l,
             CAST(sum(CASE WHEN u < 0 THEN u * u ELSE 0 END) AS BIGINT)
               AS sxx_l,
             CAST(sum(CASE WHEN u < 0 THEN u * y ELSE 0 END) AS BIGINT)
               AS sxy_l,
             CAST(sum(CASE WHEN u >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
             CAST(sum(CASE WHEN u >= 0 THEN u ELSE 0 END) AS BIGINT) AS sx_r,
             CAST(sum(CASE WHEN u >= 0 THEN y ELSE 0 END) AS BIGINT) AS sy_r,
             CAST(sum(CASE WHEN u >= 0 THEN u * u ELSE 0 END) AS BIGINT)
               AS sxx_r,
             CAST(sum(CASE WHEN u >= 0 THEN u * y ELSE 0 END) AS BIGINT)
               AS sxy_r
           FROM base),
         f AS (
           SELECT n_l, n_r,
             (CAST(n_l AS DOUBLE) * CAST(sxy_l AS DOUBLE)
               - CAST(sx_l AS DOUBLE) * CAST(sy_l AS DOUBLE))
               / (CAST(n_l AS DOUBLE) * CAST(sxx_l AS DOUBLE)
                  - CAST(sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)) AS sl_l,
             (CAST(n_r AS DOUBLE) * CAST(sxy_r AS DOUBLE)
               - CAST(sx_r AS DOUBLE) * CAST(sy_r AS DOUBLE))
               / (CAST(n_r AS DOUBLE) * CAST(sxx_r AS DOUBLE)
                  - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)) AS sl_r,
             CAST(sy_l AS DOUBLE) AS syd_l, CAST(sx_l AS DOUBLE) AS sxd_l,
             CAST(sy_r AS DOUBLE) AS syd_r, CAST(sx_r AS DOUBLE) AS sxd_r
           FROM a),
         g AS (
           SELECT n_l, n_r, sl_l, sl_r,
             (syd_l - sl_l * sxd_l) / CAST(n_l AS DOUBLE) AS b0_l,
             (syd_r - sl_r * sxd_r) / CAST(n_r AS DOUBLE) AS b0_r
           FROM f)
         SELECT n_l, n_r,
           CAST(floor(sl_l * 1000000.0) AS BIGINT) AS slope_l_e6,
           CAST(floor(b0_l * 1000000.0) AS BIGINT) AS b0_l_e6,
           CAST(floor(sl_r * 1000000.0) AS BIGINT) AS slope_r_e6,
           CAST(floor(b0_r * 1000000.0) AS BIGINT) AS b0_r_e6,
           CAST(floor((b0_r - b0_l) * 1000000.0) AS BIGINT) AS effect_e6
         FROM g""",
    "q404_sprt" ->
      """WITH daily AS (
           SELECT user_id % 2 AS arm,
             epoch_us(ts) // 86400000000 AS day,
             count(*) AS n,
             CAST(sum(CASE WHEN value >= 100.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS sx
           FROM events GROUP BY 1, 2),
         consts AS (
           SELECT CAST(floor(ln(0.35 / 0.30) * 1000000000.0) AS BIGINT)
               AS a_e9,
             CAST(floor(ln(0.65 / 0.70) * 1000000000.0) AS BIGINT) AS b_e9,
             CAST(floor(ln(0.95 / 0.05) * 1000000000.0) AS BIGINT) AS up_e9,
             CAST(floor(ln(0.05 / 0.95) * 1000000000.0) AS BIGINT)
               AS dn_e9),
         walk AS (
           SELECT arm, day, n, sx, a_e9, b_e9, up_e9, dn_e9,
             CAST(sum(sx) OVER w AS BIGINT) AS csx,
             CAST(sum(n) OVER w AS BIGINT) AS cn
           FROM daily CROSS JOIN consts
           WINDOW w AS (PARTITION BY arm ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         llr AS (
           SELECT *, csx * a_e9 + (cn - csx) * b_e9 AS llr_e9
           FROM walk),
         agg AS (
           SELECT arm, count(*) AS n_days, max(cn) AS n_events,
             max(csx) AS n_conv,
             max_by(llr_e9, day) AS llr_final_e9,
             min(CASE WHEN llr_e9 >= up_e9 THEN day END) AS up_day0,
             min(CASE WHEN llr_e9 <= dn_e9 THEN day END) AS dn_day0
           FROM llr GROUP BY arm)
         SELECT arm, n_days, n_events, n_conv, llr_final_e9,
           coalesce(up_day0, -1) AS up_day, coalesce(dn_day0, -1) AS dn_day,
           CASE
             WHEN up_day0 IS NOT NULL
               AND (dn_day0 IS NULL OR up_day0 <= dn_day0)
               THEN 'accept_h1'
             WHEN dn_day0 IS NOT NULL THEN 'accept_h0'
             ELSE 'continue' END AS decision
         FROM agg""",
    "q399_hill_tail" ->
      """WITH ev AS (
           SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events
           WHERE CAST(floor(value * 100) AS BIGINT) > 0),
         top AS (
           SELECT event_type, event_id, v,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY v DESC, event_id) AS BIGINT) AS rnk
           FROM ev),
         thresh AS (
           SELECT event_type, v AS v_k1 FROM top WHERE rnk = 101),
         lns AS (
           SELECT t.event_type, th.v_k1, t.rnk,
             ln(CAST(t.v AS DOUBLE) / th.v_k1) AS lnr
           FROM top t JOIN thresh th USING (event_type)
           WHERE t.rnk <= 100),
         agg AS (
           SELECT event_type, v_k1, count(*) AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(lnr ORDER BY rnk)), (acc, x) -> acc + x) AS sl
           FROM lns GROUP BY 1, 2)
         SELECT event_type, k, v_k1,
           CAST(floor(sl / k * 1000000.0) AS BIGINT) AS alpha_inv_e6,
           CASE WHEN sl = 0.0 THEN 0
             ELSE CAST(floor(CAST(k AS DOUBLE) / sl * 1000000.0) AS BIGINT)
             END AS alpha_e6
         FROM agg""",
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

    "q332_power_mde" ->
      """WITH base AS (
           SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v,
             user_id % 2 = 0 AS in_a
           FROM events),
         st AS (
           SELECT event_type,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN in_a THEN v ELSE 0 END) AS BIGINT) AS s_a,
             CAST(sum(CASE WHEN in_a THEN v * v ELSE 0 END) AS BIGINT)
               AS ss_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE v END) AS BIGINT) AS s_b,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE v * v END) AS BIGINT)
               AS ss_b
           FROM base GROUP BY 1)
         SELECT event_type, n_a, n_b, s_a, ss_a, s_b, ss_b,
           CAST(floor(2.8016 * sqrt(
             CAST(n_a * ss_a - s_a * s_a AS DOUBLE)
               / CAST(n_a * (n_a - 1) AS DOUBLE) / CAST(n_a AS DOUBLE)
             + CAST(n_b * ss_b - s_b * s_b AS DOUBLE)
               / CAST(n_b * (n_b - 1) AS DOUBLE) / CAST(n_b AS DOUBLE)))
             AS BIGINT) AS mde_e2
         FROM st
         WHERE n_a > 1 AND n_b > 1""",

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

    "q338_two_prop_z" ->
      """WITH st AS (
           SELECT event_type,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN user_id % 2 = 0 AND value > 150.0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
               AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN user_id % 2 <> 0 AND value > 150.0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_b
           FROM events GROUP BY 1)
         SELECT event_type, n_a, c_a, n_b, c_b,
           CAST(floor(
             (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
               * (1.0 - CAST(c_a + c_b AS DOUBLE)
                  / CAST(n_a + n_b AS DOUBLE))
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             * 1000000.0) AS BIGINT) AS z_e6
         FROM st
         WHERE n_a > 0 AND n_b > 0 AND c_a + c_b > 0
           AND c_a + c_b < n_a + n_b""",

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

    "q340_kendall_tau" ->
      """WITH base AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v_e2
           FROM events),
         daily AS (
           SELECT event_type, day,
             CAST(sum(v_e2) AS BIGINT) // count(*) AS y
           FROM base GROUP BY 1, 2),
         market AS (
           SELECT day, CAST(sum(v_e2) AS BIGINT) // count(*) AS x
           FROM base GROUP BY 1),
         dm AS (
           SELECT d.event_type, d.day, d.y, m.x
           FROM daily d JOIN market m ON d.day = m.day),
         st AS (
           SELECT a.event_type, count(*) AS n0,
             CAST(sum(CASE WHEN (a.y < b.y AND a.x < b.x)
               OR (a.y > b.y AND a.x > b.x) THEN 1 ELSE 0 END)
               AS BIGINT) AS nc,
             CAST(sum(CASE WHEN (a.y < b.y AND a.x > b.x)
               OR (a.y > b.y AND a.x < b.x) THEN 1 ELSE 0 END)
               AS BIGINT) AS nd,
             CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)
               AS BIGINT) AS ty,
             CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)
               AS BIGINT) AS tx
           FROM dm a JOIN dm b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1)
         SELECT event_type, n0, nc, nd, ty, tx,
           CAST(floor(CAST(nc - nd AS DOUBLE)
             / sqrt(CAST(n0 - ty AS DOUBLE) * CAST(n0 - tx AS DOUBLE))
             * 1000000.0) AS BIGINT) AS tau_b_e6
         FROM st
         WHERE n0 > ty AND n0 > tx""",

    "q270_ucb_bandit" ->
      """WITH arms AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(CASE WHEN value > 5.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_reward
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM arms)
         SELECT event_type, n, n_reward,
           (n_reward * 1000000) // n AS mean_e6,
           CAST(floor((CAST(n_reward AS DOUBLE) / CAST(n AS DOUBLE)
             + sqrt(2.0 * ln(CAST(n_total AS DOUBLE)) / CAST(n AS DOUBLE)))
             * 1000000.0) AS BIGINT) AS ucb_e6
         FROM arms, tot""",
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
    "q257_spearman" ->
      """WITH li AS (
           SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
         r AS (
           SELECT flag,
             2 * rank() OVER (PARTITION BY flag ORDER BY x)
               + count(*) OVER (PARTITION BY flag, x) - 1 AS r2x,
             2 * rank() OVER (PARTITION BY flag ORDER BY cents)
               + count(*) OVER (PARTITION BY flag, cents) - 1 AS r2y
           FROM li),
         sums AS (
           SELECT flag, count(*) AS n,
             CAST(sum(r2x * r2y) AS BIGINT) AS sxy,
             CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
             CAST(sum(r2y * r2y) AS BIGINT) AS syy
           FROM r GROUP BY 1),
         cm AS (
           SELECT flag, n, sxy - n*(n+1)*(n+1) AS cov2,
             sxx - n*(n+1)*(n+1) AS varx2, syy - n*(n+1)*(n+1) AS vary2
           FROM sums)
         SELECT flag, n, cov2, varx2, vary2,
           CASE WHEN varx2 > 0 AND vary2 > 0 THEN
             CAST(floor(CAST(cov2 AS DOUBLE) /
               sqrt(CAST(varx2 AS DOUBLE) * CAST(vary2 AS DOUBLE)) * 1000000.0)
               AS BIGINT) END AS rho_e6
         FROM cm""",
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
    "q147_corr_matrix" ->
      s"""WITH li AS (
           $liMeasuresSql),
         sums AS (
           SELECT count(*) AS n,
             CAST(sum(m0) AS BIGINT) AS s0, CAST(sum(m1) AS BIGINT) AS s1,
             CAST(sum(m2) AS BIGINT) AS s2, CAST(sum(m3) AS BIGINT) AS s3,
             CAST(sum(m0*m0) AS BIGINT) AS q0, CAST(sum(m1*m1) AS BIGINT) AS q1,
             CAST(sum(m2*m2) AS BIGINT) AS q2, CAST(sum(m3*m3) AS BIGINT) AS q3,
             CAST(sum(m0*m1) AS BIGINT) AS p01, CAST(sum(m0*m2) AS BIGINT) AS p02,
             CAST(sum(m0*m3) AS BIGINT) AS p03, CAST(sum(m1*m2) AS BIGINT) AS p12,
             CAST(sum(m1*m3) AS BIGINT) AS p13, CAST(sum(m2*m3) AS BIGINT) AS p23
           FROM li),
         pairs(m_a, m_b, sa, sb, qa, qb, pab) AS (
           SELECT 'qty', 'price', s0, s1, q0, q1, p01 FROM sums UNION ALL
           SELECT 'qty', 'disc', s0, s2, q0, q2, p02 FROM sums UNION ALL
           SELECT 'qty', 'tax', s0, s3, q0, q3, p03 FROM sums UNION ALL
           SELECT 'price', 'disc', s1, s2, q1, q2, p12 FROM sums UNION ALL
           SELECT 'price', 'tax', s1, s3, q1, q3, p13 FROM sums UNION ALL
           SELECT 'disc', 'tax', s2, s3, q2, q3, p23 FROM sums),
         der AS (
           SELECT m_a, m_b,
             CAST(pab AS DOUBLE) - CAST(sa AS DOUBLE)*CAST(sb AS DOUBLE)/CAST(n AS DOUBLE) AS cov,
             CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)*CAST(sa AS DOUBLE)/CAST(n AS DOUBLE) AS va,
             CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)*CAST(sb AS DOUBLE)/CAST(n AS DOUBLE) AS vb
           FROM pairs, sums)
         SELECT m_a, m_b,
           CAST(floor(CASE WHEN va > 0 AND vb > 0
             THEN cov / (sqrt(va) * sqrt(vb)) END * 1000000.0) AS BIGINT) AS corr_e6
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
    "q161_ttest" ->
      """WITH sums AS (
           SELECT event_type, count(*) AS n,
             CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v*v) AS BIGINT) AS svv
           FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
                 FROM events)
           GROUP BY 1),
         der AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n AS an, b.n AS bn,
             (CAST(a.sv AS DOUBLE) / CAST(a.n AS DOUBLE)) - (CAST(b.sv AS DOUBLE) / CAST(b.n AS DOUBLE)) AS md,
             ((CAST(a.svv AS DOUBLE) - CAST(a.sv AS DOUBLE) * CAST(a.sv AS DOUBLE) / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1.0)) / CAST(a.n AS DOUBLE)
               + ((CAST(b.svv AS DOUBLE) - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE) / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1.0)) / CAST(b.n AS DOUBLE) AS den2
           FROM sums a JOIN sums b ON a.event_type < b.event_type)
         SELECT type_a, type_b,
           CAST(floor(CASE WHEN an > 1 AND bn > 1 AND den2 > 0
             THEN md / sqrt(den2) END * 1000000.0) AS BIGINT) AS t_e6
         FROM der""",
    "q162_mutual_info" ->
      """WITH ev AS (
           SELECT label,
             CAST(embedding[1] > 0 AS INT) AS sgn
           FROM embeddings),
         cells AS (SELECT label, sgn, count(*) AS o FROM ev GROUP BY 1, 2),
         rt AS (SELECT label, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
         ct AS (SELECT sgn, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
         c AS (
           SELECT CAST(floor(
             (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                 / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)))
             * 1000000000000.0) AS BIGINT) AS c_e12
           FROM cells JOIN rt USING (label) JOIN ct USING (sgn), tot)
         SELECT count(*) AS n_cells, CAST(sum(c_e12) AS BIGINT) AS mi_e12
         FROM c""",
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
    "q148_chi2" ->
      """WITH ev AS (
           SELECT event_type, (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
           FROM events),
         cells AS (
           SELECT event_type, dow, count(*) AS o FROM ev GROUP BY 1, 2),
         rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
         ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
         j AS (
           SELECT c.event_type, c.dow, c.o, rt.rt, ct.ct
           FROM cells c JOIN rt USING (event_type) JOIN ct USING (dow)),
         folded AS (
           SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS n_cells,
             list(CAST(o AS DOUBLE) ORDER BY event_type, dow) AS os,
             list(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) ORDER BY event_type, dow) AS rcs
           FROM j)
         SELECT n, n_cells,
           CAST(floor(list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, n_cells + 1), i ->
                 (os[i] - rcs[i] / CAST(n AS DOUBLE)) * (os[i] - rcs[i] / CAST(n AS DOUBLE))
                   / (rcs[i] / CAST(n AS DOUBLE)))),
             (acc, x) -> acc + x) * 1000000.0) AS BIGINT) AS chi2_e6
         FROM folded""",

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

    "q286_mann_whitney" ->
      """WITH base AS (
           SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_e2,
             user_id % 2 = 0 AS in_a
           FROM events),
         grp AS (
           SELECT event_type, v_e2,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
           FROM base GROUP BY 1, 2),
         cum AS (
           SELECT event_type, c_a, c_a + c_b AS c,
             CAST(sum(c_a + c_b) OVER (PARTITION BY event_type
               ORDER BY v_e2 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM grp),
         st AS (
           SELECT event_type,
             CAST(sum(c_a) AS BIGINT) AS n_a,
             CAST(sum(c - c_a) AS BIGINT) AS n_b,
             CAST(sum(c_a * (2 * cum - c + 1)) AS BIGINT) AS r2_a,
             CAST(sum(c * c * c - c) AS BIGINT) AS ties
           FROM cum GROUP BY 1),
         uu AS (SELECT event_type, n_a, n_b, ties,
                  r2_a - n_a * (n_a + 1) AS u2_a FROM st)
         SELECT event_type, n_a, n_b, u2_a, ties,
           CASE WHEN n_a > 0 AND n_b > 0 AND
             CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                  * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) - 1.0))
               * (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   - CAST(ties AS DOUBLE)) / 12.0) > 0.0
           THEN CAST(floor(
             (CAST(u2_a AS DOUBLE) / 2.0
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
             / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
               / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                  * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) - 1.0))
               * (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                   - CAST(ties AS DOUBLE)) / 12.0))
             * 1000000.0) AS BIGINT)
           ELSE NULL END AS z_e6
         FROM uu""",

    "q287_ks_test" ->
      """WITH base AS (
           SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v_e2,
             user_id % 2 = 0 AS in_a
           FROM events),
         grp AS (
           SELECT event_type, v_e2,
             CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
             CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
           FROM base GROUP BY 1, 2),
         cum AS (
           SELECT event_type,
             CAST(sum(c_a) OVER (PARTITION BY event_type
               ORDER BY v_e2 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
             CAST(sum(c_b) OVER (PARTITION BY event_type
               ORDER BY v_e2 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b,
             CAST(sum(c_a) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
             CAST(sum(c_b) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
           FROM grp)
         SELECT event_type, max(n_a) AS n_a, max(n_b) AS n_b,
           max(abs(cum_a * n_b - cum_b * n_a)) AS d_num,
           (max(abs(cum_a * n_b - cum_b * n_a)) * 1000000)
             // (max(n_a) * max(n_b)) AS d_e6
         FROM cum GROUP BY 1""")
}
