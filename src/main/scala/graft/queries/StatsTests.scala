package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import StatsShared._

/** Distribution & association tests — the hypothesis-testing layer
  * (rank tests, contingency tests, ANOVA, correlation, tail/extreme-value
  * fits) the reference runs in Stata/R after Spark builds the panel.
  *
  * Split out of the former single-file Stats.scala (round 10) along its
  * family seams; query + oracle pairs stay together. Cross-engine
  * determinism and scale-shape conventions are documented per query and
  * in the original Stats scaladoc (now on StatsShared).
  */
object StatsTests {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // Spearman rank correlation per group (quantity vs price within each
    // return flag) — the robust monotone-association companion to q147's
    // Pearson matrix. Tie-aware: each value gets its DOUBLED average rank
    // (2·cnt_less + cnt_eq + 1 = 2·rank + cnt_eq − 1, an exact integer),
    // so the moment sums are integers and cross-engine exact; the
    // centered moments come from the algebraic identity Σ(r−(n+1))(s−
    // (n+1)) = Σrs − n(n+1)² (no per-row mean subtraction, no float in
    // the aggregation). rho's float tail is one pinned IEEE chain
    // (div/sqrt are exactly rounded). The moments are ≤ 4n³ per group —
    // past int64 by n ≈ 1.3e6 (hit at sf1) — so they ride decimal(38,0)
    // (Spark) ↔ HUGEINT (DuckDB), the q446 rule, and only n + rho_e6
    // are emitted. Scale shape: `flag` has 3 values, so
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
      // x = l_quantity is DOMAIN-bounded (1..50 per flag → ≤150 rank
      // rows), so its join-back broadcasts; the cents frame is
      // value-domain-sized and stays a shuffle join.
      val r = li
        .join(broadcast(ranks("x", "r2x")), Seq("flag", "x"))
        .join(ranks("cents", "r2y"), Seq("flag", "cents"))
        .select("flag", "r2x", "r2y")
      val sums = r.groupBy("flag").agg(count(lit(1)).as("n"),
        sum(expr("cast(r2x as decimal(18,0)) * cast(r2y as decimal(18,0))"))
          .as("sxy"),
        sum(expr("cast(r2x as decimal(18,0)) * cast(r2x as decimal(18,0))"))
          .as("sxx"),
        sum(expr("cast(r2y as decimal(18,0)) * cast(r2y as decimal(18,0))"))
          .as("syy"))
      val m = expr("""cast(n as decimal(12,0)) * cast(n + 1 as decimal(12,0))
        * cast(n + 1 as decimal(12,0))""")
      sums.select(col("flag"), col("n"),
          (col("sxy") - m).as("cov2"), (col("sxx") - m).as("varx2"),
          (col("syy") - m).as("vary2"))
        .select(col("flag"), col("n"),
          when(col("varx2") > 0 && col("vary2") > 0,
            floor(col("cov2").cast("double") /
              sqrt(col("varx2").cast("double") * col("vary2").cast("double"))
              * 1e6).cast("long")).as("rho_e6"))
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
    }),

  )

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
             sum(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sxy,
             sum(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS sxx,
             sum(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS syy
           FROM r GROUP BY 1),
         cm AS (
           SELECT flag, n,
             sxy - CAST(n AS HUGEINT)*(n+1)*(n+1) AS cov2,
             sxx - CAST(n AS HUGEINT)*(n+1)*(n+1) AS varx2,
             syy - CAST(n AS HUGEINT)*(n+1)*(n+1) AS vary2
           FROM sums)
         SELECT flag, n,
           CASE WHEN varx2 > 0 AND vary2 > 0 THEN
             CAST(floor(CAST(cov2 AS DOUBLE) /
               sqrt(CAST(varx2 AS DOUBLE) * CAST(vary2 AS DOUBLE)) * 1000000.0)
               AS BIGINT) END AS rho_e6
         FROM cm""",

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
         FROM cum GROUP BY 1""",

  )
}
