package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import StatsShared._

/** Experiment & survey design, sampling allocation, and causal
  * estimators — power, uplift, propensity, raking, PPS/priority sampling,
  * sequential tests.
  *
  * Split out of the former single-file Stats.scala (round 10) along its
  * family seams; query + oracle pairs stay together. Cross-engine
  * determinism and scale-shape conventions are documented per query and
  * in the original Stats scaladoc (now on StatsShared).
  */
object StatsDesign {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

  )

  val oracles: Map[String, String] = Map(

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

  )
}
