package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Model-evaluation and factor-extraction queries — the reference's two
  * remaining headline methodologies as oracle-checked plans:
  *
  *  - macro-F1 + Cohen's κ, the scoring pair of the labeling grid search
  *    (`compiled-bookdown/08-optimization.Rmd:60-216`);
  *  - precision along the confidence-rank distribution, the Twitter
  *    model's real-world eval (`12-model_training_eval.Rmd:57-76`);
  *  - the dynamic-factor global index, news-analytics' common factor
  *    across country sentiment series (`3_sentiment_global.do:31-40`,
  *    z-scoring per `4_merge.do:35-45`).
  */
object Evals {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)
  private def d(c: Column): Column = c.cast("double")

  /** z-scored daily panel (c, day, z_e3) of the events series — the
    * `4_merge.do:35-45` standardization. Truncated integer daily means,
    * one pinned double z chain. The σ²>0 guard lives in the DOUBLE
    * domain, on the exact expression the sqrt consumes: an integer guard
    * (n·Σx² > (Σx)²) can pass while catastrophic cancellation rounds the
    * double operand to ≤ 0 — where DuckDB's sqrt THROWS and Spark yields
    * NaN, diverging. Filtering on the identical double expression keeps
    * both engines dropping the identical degenerate series.
    * PERSISTED: the factor queries traverse the panel several times
    * (Gram self-join, 3 matvec iterations, final projection) — harness
    * clearCache releases it (the q171-documented contract).
    */
  private def zPanel(s: SparkSession, d0: String): DataFrame = {
    val daily = t(s, d0, "events").select(col("event_type").as("c"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100).cast("long").as("v_e2"))
      .groupBy("c", "day")
      .agg(expr("sum(v_e2) div count(1)").as("m_e2"))
    val st = daily.groupBy("c").agg(count(lit(1)).as("tn"),
        sum("m_e2").as("s1"), sum(col("m_e2") * col("m_e2")).as("s2"))
    val mu = d(col("s1")) / d(col("tn"))
    val varD = d(col("s2")) / d(col("tn")) - mu * mu
    daily.join(st, "c")
      .where(varD > 0.0)
      .select(col("c"), col("day"),
        floor((d(col("m_e2")) - mu) / sqrt(varD) * 1000)
          .cast("long").as("z_e3"))
      .persist()
  }

  /** First-factor loadings (c, v in e3 units) by 3 power iterations on
    * the integer Gram matrix of the z panel — see q185's scaladoc.
    * The Gram frame is PERSISTED and each iteration's K-row v is eagerly
    * localCheckpoint-ed (the Dedup generation-cut pattern; Verify/Bench
    * release RDD storage after each query): without the cut, every
    * level's max-abs broadcast re-executes all prior levels' subtrees
    * (~2^iterations re-execution) and the accumulated lineage makes each
    * iteration's planning slower than its 25-row execution.
    */
  private def factorLoadings(z: DataFrame): DataFrame = {
    val sMat = z.as("x").join(z.as("y"), col("x.day") === col("y.day"))
      .groupBy(col("x.c").as("a"), col("y.c").as("b"))
      .agg(sum(col("x.z_e3") * col("y.z_e3")).as("s"))
      .persist()
    var v = sMat.select(col("a").as("c")).distinct()
      .select(col("c"), lit(1000L).as("v"))
    for (_ <- 1 to 3) {
      val w = sMat.join(v, sMat("b") === v("c"))
        .groupBy("a").agg(sum(col("s") * col("v")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      // Renormalize WITHOUT pre-multiplying w (w div (m div 1000), not
      // (w*1000) div m): |w| can reach K·T·2.5e10, so a 1000× blow-up
      // before the divide would overflow int64 at K·T ≈ 3.7e5 — dividing
      // first keeps the envelope at the matvec's own K·T ≲ 3.7e8.
      v = w.crossJoin(broadcast(m))
        .select(col("a").as("c"),
          expr("w div greatest(m div 1000, 1)").as("v"))
        .localCheckpoint(true)
    }
    v
  }

  /** Global index (day, idx_e6) = loadings · z per day. */
  private def factorIndex(z: DataFrame, v: DataFrame): DataFrame =
    z.join(v, "c").groupBy("day")
      .agg(sum(col("z_e3") * col("v")).as("idx_e6"))

  /** Per-series least-squares fit of z on the factor: λ_c = Σz·g/Σg²,
    * residuals r = z − λ·g, R² = 1 − Σr²/Σz². `z`: (c, day, z_e3);
    * `g`: (day, g_e3). Package-private so the spec can pin the unit
    * bookkeeping on the K=1 identity case (g == z ⇒ λ = 1, R² = 1).
    */
  private[graft] def factorFit(z: DataFrame, g: DataFrame): DataFrame = {
    // g's subtree is the whole factor chain; the fit reads it from three
    // branches (zg twice, sgg once) — persist both reused frames
    // (harness clearCache contract)
    val gp = g.persist()
    val zg = z.join(gp, "day").persist()
    val szg = zg.groupBy("c").agg(
      sum(col("z_e3") * col("g_e3")).as("szg"),
      sum(col("z_e3") * col("z_e3")).as("szz"))
    val sgg = gp.agg(sum(col("g_e3") * col("g_e3")).as("sgg"))
    val lam = szg.crossJoin(broadcast(sgg))
      .select(col("c"), col("szz"),
        expr("CASE WHEN sgg = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE (szg * 1000000) div sgg END").as("lambda_e6"))
    val ssr = zg.join(lam, "c")
      .select(col("c"), col("szz"), col("lambda_e6"),
        (col("z_e3") - expr("(lambda_e6 * g_e3) div 1000000")).as("r_e3"))
      .groupBy("c", "szz", "lambda_e6")
      .agg(sum(col("r_e3") * col("r_e3")).as("ss_res"))
    ssr.select(col("c"), col("lambda_e6"),
      expr("CASE WHEN szz = 0 THEN CAST(NULL AS BIGINT) " +
        "ELSE ((szz - ss_res) * 1000000) div szz END").as("r2_e6"))
  }

  /** Shared oracle CTE chain ending at `z` (the panel) and `v3` (the
    * loadings) — q185/q188 append their own consumers.
    */
  private val factorCtes: String =
    """daily AS (
           SELECT event_type AS c, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) // count(*) AS m_e2
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT c, count(*) AS tn, CAST(sum(m_e2) AS BIGINT) AS s1,
             CAST(sum(m_e2 * m_e2) AS BIGINT) AS s2
           FROM daily GROUP BY 1),
         z AS MATERIALIZED (
           SELECT daily.c, daily.day,
             CAST(floor((daily.m_e2 - CAST(s1 AS DOUBLE) / tn)
               / sqrt(CAST(s2 AS DOUBLE) / tn
                      - (CAST(s1 AS DOUBLE) / tn) * (CAST(s1 AS DOUBLE) / tn))
               * 1000) AS BIGINT) AS z_e3
           FROM daily JOIN st USING (c)
           WHERE CAST(s2 AS DOUBLE) / tn
             - (CAST(s1 AS DOUBLE) / tn) * (CAST(s1 AS DOUBLE) / tn) > 0),
         smat AS MATERIALIZED (
           SELECT x.c AS a, y.c AS b, CAST(sum(x.z_e3 * y.z_e3) AS BIGINT) AS s
           FROM z x JOIN z y USING (day) GROUP BY 1, 2),
         v0 AS (SELECT DISTINCT a AS c, CAST(1000 AS BIGINT) AS v FROM smat),
         w1 AS (SELECT a, CAST(sum(s * v) AS BIGINT) AS w
                FROM smat JOIN v0 ON b = c GROUP BY 1),
         v1 AS (SELECT a AS c,
                  w // greatest((SELECT max(abs(w)) FROM w1) // 1000, 1) AS v
                FROM w1),
         w2 AS (SELECT a, CAST(sum(s * v) AS BIGINT) AS w
                FROM smat JOIN v1 ON b = c GROUP BY 1),
         v2 AS (SELECT a AS c,
                  w // greatest((SELECT max(abs(w)) FROM w2) // 1000, 1) AS v
                FROM w2),
         w3 AS (SELECT a, CAST(sum(s * v) AS BIGINT) AS w
                FROM smat JOIN v2 ON b = c GROUP BY 1),
         v3 AS (SELECT a AS c,
                  w // greatest((SELECT max(abs(w)) FROM w3) // 1000, 1) AS v
                FROM w3)"""

  /** 0.9^(d−1) for d = 1..20 as a CASE of left-associated literal
    * multiply chains — the SAME generated text goes into the Spark
    * expr and the DuckDB oracle (the powProd rule: each step one
    * IEEE-exact multiply, where pow() would not replay bit-exactly).
    */
  private def rboPwCase: String =
    "CASE d " + (1 to 20).map { i =>
      val chain = (1 until i).foldLeft("1.0")((acc, _) => s"($acc * 0.9)")
      s"WHEN $i THEN $chain"
    }.mkString(" ") + " END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for
    // MORE than two raters, the annotation-quality gate q184's Cohen
    // kappa (2 raters) cannot cover: three deterministic keep/drop
    // "raters" (the q53 quality rule, a length rule, a token-count
    // rule) judge every document; per item P_i = (Σ_j n_ij² − n) /
    // (n(n−1)), chance agreement from the pooled category shares.
    // Binary categories make Σn_ij² = k² + (3−k)² with k = keep votes.
    // Exact: per-item P_i floored to e6 BEFORE the mean (the q278
    // rule), pooled shares and the final kappa pinned trunc-div
    // chains. Scale shape: one scan + one global 3-sum aggregate.
    "q423_fleiss_kappa" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("r1"),
          (col("n_chars") >= 200L).cast("long").as("r2"),
          (size(graft.functions.TextFunctions.tokens(col("text"))) >= 15)
            .cast("long").as("r3"))
        .withColumn("k", col("r1") + col("r2") + col("r3"))
        .withColumn("p_i_e6",
          expr("((k * k + (3 - k) * (3 - k) - 3) * 1000000) div 6"))
      f.agg(count(lit(1)).as("n_items"), sum("p_i_e6").as("sp"),
          sum("k").as("tot_keep"))
        .withColumn("p_bar_e6", expr("sp div n_items"))
        .withColumn("p_keep_e6", expr("tot_keep * 1000000 div (3 * n_items)"))
        .withColumn("p_e_e6", expr(
          """(p_keep_e6 * p_keep_e6
             + (1000000 - p_keep_e6) * (1000000 - p_keep_e6))
             div 1000000"""))
        .select(col("n_items"), col("p_bar_e6"), col("p_keep_e6"),
          col("p_e_e6"),
          expr("""CASE WHEN p_e_e6 < 1000000
            THEN (p_bar_e6 - p_e_e6) * 1000000 div (1000000 - p_e_e6)
            ELSE 1000000 END""").as("kappa_e6"))
    }),

    // Confident-joint label-noise estimate (Northcutt, Jiang & Chuang
    // JAIR 2021 — the cleanlab core): cross-count items by (observed
    // label, confidently-predicted label), where "confident" means the
    // item's class probability clears that CLASS's mean self-confidence
    // threshold t_j — robust to miscalibration in a way a fixed 0.5
    // cut is not. Off-diagonal mass estimates the label-noise rate the
    // relabel/prune budget should plan for. Probabilities are the
    // standing scored fixture (p₁ = (emb[0]+1)/2, p₀ = 1−p₁). Exact:
    // thresholds are integer mean trunc-divs, cells integer counts,
    // rates e6 trunc-divs. Scale shape: one scan for the thresholds
    // (2-value broadcast), one scan for the joint — two map-side
    // aggregates total.
    "q424_confident_joint" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("p1_e6"),
        (col("label") % 2 === 1).cast("long").as("y"))
        .withColumn("p0_e6", lit(1000000L) - col("p1_e6"))
      val th = e.agg(
        expr("sum(CASE WHEN y = 1 THEN p1_e6 ELSE 0 END)"
          + " div greatest(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END), 1)")
          .as("t1_e6"),
        expr("sum(CASE WHEN y = 0 THEN p0_e6 ELSE 0 END)"
          + " div greatest(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END), 1)")
          .as("t0_e6"))
      e.crossJoin(broadcast(th))
        .withColumn("pred", when(col("p1_e6") >= col("t1_e6"), 1L)
          .when(col("p0_e6") >= col("t0_e6"), 0L).otherwise(-1L))
        .where(col("pred") >= 0L)
        .agg(count(lit(1)).as("n_confident"),
          sum(when(col("pred") === 1L && col("y") === 1L, 1L)
            .otherwise(0L)).as("c11"),
          sum(when(col("pred") === 0L && col("y") === 0L, 1L)
            .otherwise(0L)).as("c00"),
          sum(when(col("pred") === 1L && col("y") === 0L, 1L)
            .otherwise(0L)).as("c10"),
          sum(when(col("pred") === 0L && col("y") === 1L, 1L)
            .otherwise(0L)).as("c01"),
          max("t1_e6").as("t1_e6"), max("t0_e6").as("t0_e6"))
        .select(col("n_confident"), col("c11"), col("c00"), col("c10"),
          col("c01"), col("t1_e6"), col("t0_e6"),
          expr("(c10 + c01) * 1000000 div n_confident")
            .as("noise_rate_e6"))
    }),

    // Krippendorff's alpha (nominal, binary) — the agreement
    // coefficient that, unlike Fleiss' kappa (q423), tolerates MISSING
    // ratings: here the token-count rater abstains on non-English
    // documents (an English-only annotator), so units carry m ∈ {2,3}
    // available ratings. Coincidence-matrix form: observed disagreement
    // D_o = Σ_u 2·n_u0·n_u1/(m_u−1), expected from the pooled value
    // marginals D_e = 2·n_0·n_1/(n_tot−1), alpha = 1 − D_o/D_e. Exact:
    // everything ×2 so the (m_u−1) divisions stay integer (4·n_u0·n_u1
    // is even when m_u=3), one final e6 trunc-div:
    // alpha = 1 − do2·(n_tot−1) / (4·n_0·n_1). Scale shape: one scan,
    // one global 5-sum aggregate — map-side combinable at any corpus.
    "q425_krippendorff_alpha" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("r1"),
          (col("n_chars") >= 200L).cast("long").as("r2"),
          when(col("lang") === "en",
            (size(graft.functions.TextFunctions.tokens(col("text"))) >= 15)
              .cast("long")).as("r3"))
        .withColumn("m", when(col("r3").isNotNull, 3L).otherwise(2L))
        .withColumn("n1", col("r1") + col("r2") + coalesce(col("r3"), lit(0L)))
        .withColumn("n0", col("m") - col("n1"))
      f.agg(count(lit(1)).as("n_units"), sum("m").as("n_tot"),
          sum("n1").as("n1_tot"), sum("n0").as("n0_tot"),
          sum(expr("(4 * n0 * n1) div (m - 1)")).as("do2"))
        .select(col("n_units"), col("n_tot"), col("n1_tot"), col("n0_tot"),
          col("do2"),
          expr("""CASE WHEN n0_tot > 0 AND n1_tot > 0
            THEN 1000000 - do2 * (n_tot - 1) * 1000000
              div (4 * n0_tot * n1_tot)
            ELSE 1000000 END""").as("alpha_e6"))
    }),

    // Cochran's Q test (Cochran 1950) — does ANY of k correlated binary
    // classifiers differ in keep rate? The k≥3 companion to q419's
    // McNemar (k=2), over the same three deterministic raters as q423.
    // Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣR_i − ΣR_i²) with G_j the
    // per-rater totals and R_i the per-item vote counts; unanimous
    // items (R=0 or k) drop out of the denominator, which is the test's
    // McNemar-discordance generalization. Q ~ χ²(k−1) under H0. Exact:
    // all integer sums, one e6 trunc-div. Scale: one scan, one global
    // aggregate.
    "q426_cochran_q" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("r1"),
          (col("n_chars") >= 200L).cast("long").as("r2"),
          (size(graft.functions.TextFunctions.tokens(col("text"))) >= 15)
            .cast("long").as("r3"))
        .withColumn("r", col("r1") + col("r2") + col("r3"))
      f.agg(count(lit(1)).as("n_items"),
          sum("r1").as("g1"), sum("r2").as("g2"), sum("r3").as("g3"),
          sum("r").as("sum_r"), sum(col("r") * col("r")).as("sum_r2"))
        .select(col("n_items"), col("g1"), col("g2"), col("g3"),
          col("sum_r"), col("sum_r2"),
          expr("""CASE WHEN 3 * sum_r - sum_r2 > 0
            THEN 2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
              - (g1 + g2 + g3) * (g1 + g2 + g3)) * 1000000
              div (3 * sum_r - sum_r2)
            ELSE 0 END""").as("q_e6"))
    }),

    // PPV/NPV at deployment prevalence (Bayes' rule on the 2×2) — the
    // filter's measured sensitivity/specificity re-priced at the base
    // rates production will actually see (1%, 10%, 50%): the table
    // that explains why a 95%-specific rule drowns in false positives
    // at 1% prevalence. Exact: integer cells; PPV/NPV per grid point
    // in integer e6 arithmetic (prevalence in e2).
    "q537_ppv_at_prevalence" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("p"),
          (col("n_chars") >= 250L).cast("long").as("g"))
      val cells = f.agg(sum(expr("p * g")).as("tp"),
        sum(expr("(1 - p) * g")).as("fn"),
        sum(expr("p * (1 - g)")).as("fp"),
        sum(expr("(1 - p) * (1 - g)")).as("tn"))
      cells.select(
          expr("tp * 1000000 div greatest(tp + fn, 1L)").as("sens_e6"),
          expr("tn * 1000000 div greatest(tn + fp, 1L)").as("spec_e6"))
        .select(col("sens_e6"), col("spec_e6"),
          explode(expr("array(1L, 10L, 50L)")).as("prev_e2"))
        .select(col("prev_e2"), col("sens_e6"), col("spec_e6"),
          // PPV = sens·prev / (sens·prev + (1−spec)(1−prev)), e2·e6 units
          expr("""sens_e6 * prev_e2 * 1000000
            div greatest(sens_e6 * prev_e2
              + (1000000 - spec_e6) * (100 - prev_e2), 1L)""")
            .as("ppv_e6"),
          expr("""spec_e6 * (100 - prev_e2) * 1000000
            div greatest(spec_e6 * (100 - prev_e2)
              + (1000000 - sens_e6) * prev_e2, 1L)""").as("npv_e6"))
    }),

    // Bowker symmetry test (1948) — are the language-ID confusions
    // SYMMETRIC (es→fr as often as fr→es)? The k×k McNemar
    // generalization: χ² = Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji) over
    // off-diagonal pairs; asymmetry means the classifier has a
    // directional bias worth fixing, not just noise. Exact: bounded
    // cell pairs, per-pair terms floored to e6 then integer-summed.
    "q538_bowker_symmetry" -> ((s, d0) => {
      val cells = t(s, d0, "documents")
        .select(col("lang"), graft.functions.TextFunctions.langId(col("text"))
          .as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
      val pairs = cells.select(col("lang").as("i"), col("pred").as("j"),
          col("n").as("nij"))
        .join(cells.select(col("pred").as("i"), col("lang").as("j"),
          col("n").as("nji")), Seq("i", "j"), "full")
        .na.fill(0L, Seq("nij", "nji"))
        .where(col("i") < col("j"))
      pairs.agg(count(lit(1)).as("n_pairs"),
          sum(expr("""CASE WHEN nij + nji > 0
            THEN (nij - nji) * (nij - nji) * 1000000 div (nij + nji)
            ELSE 0 END""")).as("chi2_e6"),
          sum(when(col("nij") + col("nji") > 0L, 1L).otherwise(0L))
            .as("df"))
    }),

    // Out-of-sample R² of the daily trend — fit the line on the FIRST
    // half, score it on the SECOND against the second half's own-mean
    // baseline: R²_oos ≤ 0 means the fitted trend forecasts worse
    // than a constant, the go/no-go before q267/q241 models inherit
    // it. Exact: first-half fit from integer sums (pinned chain);
    // second-half squared errors per-term floored to e2 then
    // integer-summed (no data-sized float fold).
    "q539_oos_r2" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
        .persist() // fit + score read it
      val br = dm.agg(expr("(min(day) + max(day)) div 2").as("b"),
        min("day").as("d0"))
      val fit = dm.crossJoin(broadcast(br)).where(col("day") < col("b"))
        .select((col("day") - col("d0")).as("tt"), col("y"))
        .agg(count(lit(1)).as("n1"), sum("tt").as("st"),
          sum("y").as("sy"), sum(col("tt") * col("y")).as("sty"),
          sum(col("tt") * col("tt")).as("stt"))
        .withColumn("slope", (d(col("n1")) * d(col("sty")) -
          d(col("st")) * d(col("sy"))) /
          (d(col("n1")) * d(col("stt")) - d(col("st")) * d(col("st"))))
        .withColumn("icept", (d(col("sy")) -
          col("slope") * d(col("st"))) / d(col("n1")))
        .select(col("n1"), col("slope"), col("icept"))
      val second = dm.crossJoin(broadcast(br)).where(col("day") >= col("b"))
        .select((col("day") - col("d0")).as("tt"), col("y"))
        .crossJoin(broadcast(fit))
        .select(col("n1"), col("y"), col("tt"), col("slope"), col("icept"),
          floor((d(col("y")) - (col("icept") + col("slope") * d(col("tt"))))
            * (d(col("y")) - (col("icept") + col("slope") * d(col("tt"))))
            * 100.0d).cast("long").as("se_e2"))
      second.agg(max("n1").as("n_fit"), count(lit(1)).as("n_test"),
          sum("y").as("sy2"), sum(col("y") * col("y")).as("syy2"),
          sum("se_e2").as("sse_e2"))
        .withColumn("sst", d(col("syy2")) -
          d(col("sy2")) * d(col("sy2")) / d(col("n_test")))
        .select(col("n_fit"), col("n_test"),
          floor(col("sse_e2").cast("double") / 100.0d).cast("long")
            .as("sse_floor"),
          when(col("sst") > 0.0d,
            floor((lit(1.0d) - (col("sse_e2").cast("double") / 100.0d) /
              col("sst")) * 1e6).cast("long")).otherwise(lit(0L))
            .as("r2_oos_e6"))
    }),

    // Somers' D of the score against the binary label — the ordinal
    // association the credit world calls the Gini coefficient of the
    // ROC (D = 2·AUC − 1, and this query computes the identity
    // EXACTLY): concordant-minus-discordant pairs over class pairs,
    // from the distinct-score histogram's cumulative counts (q286's
    // machinery, never row pairs). Pure integer until two e6 divs.
    "q534_somers_d" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("p"),
        (col("label") % 2 === 1).cast("long").as("y"))
      val h = e.groupBy("p")
        .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("c1"),
          sum(when(col("y") === 0L, 1L).otherwise(0L)).as("c0"))
      val cum = graft.operators.PrefixScan.scanLong(
        h, "cb0", "c0", "sum", inclusive = false, col("p"))
      val tot = h.agg(sum("c1").as("n1"), sum("c0").as("n0"))
      cum.crossJoin(broadcast(tot))
        .agg(max("n1").as("n1"), max("n0").as("n0"),
          // midrank2-weighted: U2 = Σ c1·(2·cb0 + c0) (ties count once)
          sum(col("c1") * (lit(2L) * col("cb0") + col("c0"))).as("u2"))
        .select(col("n1"), col("n0"),
          expr("u2 * 1000000 div (2 * n1 * n0)").as("auc_e6"),
          expr("""u2 * 1000000 div (n1 * n0)
            - 1000000""").as("somers_d_e6"))
    }),

    // Score KS statistic — the credit-scoring separation number: the
    // maximum gap between the two classes' score CDFs, with the score
    // where it happens (the natural cut). Distinct-score cumulative
    // shares via PrefixScan (q287's two-sample machinery pointed at
    // the model score); the argmax is an exact-integer min/max struct.
    "q535_score_ks" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("p"),
        (col("label") % 2 === 1).cast("long").as("y"))
      val h = e.groupBy("p")
        .agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("c1"),
          sum(when(col("y") === 0L, 1L).otherwise(0L)).as("c0"))
      val cum = graft.operators.PrefixScan.scanLong(
        graft.operators.PrefixScan.scanLong(
          h, "f1", "c1", "sum", inclusive = true, col("p")),
        "f0", "c0", "sum", inclusive = true, col("p"))
      val tot = h.agg(sum("c1").as("n1"), sum("c0").as("n0"))
      cum.crossJoin(broadcast(tot))
        .withColumn("gap_e6", abs(
          expr("f1 * 1000000 div n1 - f0 * 1000000 div n0")))
        .agg(max("n1").as("n1"), max("n0").as("n0"),
          max(struct(col("gap_e6"), (-col("p")).as("np"))).as("m"))
        .select(col("n1"), col("n0"), col("m.gap_e6").as("ks_e6"),
          (-col("m.np")).as("ks_at_score_e6"))
    }),

    // Lin's concordance correlation (1989) — do the two model scores
    // AGREE, not merely correlate? CCC = 2·cov/(var₁ + var₂ +
    // (μ₁−μ₂)²) penalizes location and scale shifts that Pearson
    // forgives — the numeric-twin of q530's Bland–Altman limits.
    // Exact integer e6 sums (cross products inside int64 at any sf);
    // ONE pinned chain.
    "q536_lin_ccc" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint))) div 1000""").as("x"),
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[1] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint))) div 1000""").as("yv"))
      e.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("yv").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("yv") * col("yv")).as("syy"),
          sum(col("x") * col("yv")).as("sxy"))
        .withColumn("mx", d(col("sx")) / d(col("n")))
        .withColumn("my", d(col("sy")) / d(col("n")))
        .withColumn("vx", d(col("sxx")) / d(col("n")) -
          col("mx") * col("mx"))
        .withColumn("vy", d(col("syy")) / d(col("n")) -
          col("my") * col("my"))
        .withColumn("cxy", d(col("sxy")) / d(col("n")) -
          col("mx") * col("my"))
        .select(col("n"),
          when(col("vx") * col("vy") > 0.0d,
            floor(col("cxy") / sqrt(col("vx") * col("vy")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("pearson_e6"),
          when(col("vx") + col("vy") +
              (col("mx") - col("my")) * (col("mx") - col("my")) > 0.0d,
            floor(lit(2.0d) * col("cxy") / (col("vx") + col("vy") +
              (col("mx") - col("my")) * (col("mx") - col("my"))) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("ccc_e6"))
    }),

    // Matthews correlation coefficient — the balanced single-number
    // verdict on the keep-vs-gold 2×2 (q526 sizes the association as
    // an odds ratio; MCC is the [-1, 1] correlation form that stays
    // honest under class imbalance where accuracy and F1 do not):
    // MCC = (ad − bc)/√((a+b)(a+c)(b+d)(c+d)). Exact integer cells;
    // the denominator's four factors multiply as doubles (one pinned
    // chain — the int64 product overflows). One scan.
    "q531_mcc" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("p"),
          (col("n_chars") >= 250L).cast("long").as("g"))
      f.agg(sum(expr("p * g")).as("a"), sum(expr("p * (1 - g)")).as("b"),
          sum(expr("(1 - p) * g")).as("c"),
          sum(expr("(1 - p) * (1 - g)")).as("dd"))
        .withColumn("den", sqrt(
          (d(col("a")) + d(col("b"))) * (d(col("a")) + d(col("c"))) *
          (d(col("b")) + d(col("dd"))) * (d(col("c")) + d(col("dd")))))
        .select(col("a"), col("b"), col("c"), col("dd"),
          when(col("den") > 0.0d,
            floor((d(col("a")) * d(col("dd")) -
              d(col("b")) * d(col("c"))) / col("den") * 1e6).cast("long"))
            .otherwise(lit(0L)).as("mcc_e6"))
    }),

    // Youden's J optimal cutpoint (1950) — sweep the q424 score's
    // decile thresholds and pick the one maximizing TPR − FPR: the
    // principled threshold selection behind "we cut at 0.5", with the
    // whole sweep table kept so the flatness of the J curve (cut
    // sensitivity) is visible. Exact: integer confusion sums per
    // threshold in ONE conditional pass; J e6 trunc-divs; argmax by
    // bounded integer rank.
    "q532_youden" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("p1_e6"),
        (col("label") % 2 === 1).cast("long").as("y"))
      val sweep = e.select(col("p1_e6"), col("y"),
          explode(sequence(lit(1), lit(9))).as("th0"))
        .select((col("th0").cast("long") * 100000L).as("th_e6"),
          col("p1_e6"), col("y"))
        .groupBy("th_e6")
        .agg(sum(when(col("p1_e6") >= col("th_e6") && col("y") === 1L, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("p1_e6") >= col("th_e6") && col("y") === 0L, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("y") === 1L, 1L).otherwise(0L)).as("npos"),
          sum(when(col("y") === 0L, 1L).otherwise(0L)).as("nneg"))
        .select(col("th_e6"), col("tp"), col("fp"),
          expr("""tp * 1000000 div greatest(npos, 1L)
            - fp * 1000000 div greatest(nneg, 1L)""").as("j_e6"))
      val o = sweep.select(col("th_e6").as("t2"), col("j_e6").as("j2"))
      sweep.join(broadcast(o), expr(
          "j2 > j_e6 OR (j2 = j_e6 AND t2 < th_e6)"), "left")
        .groupBy("th_e6", "tp", "fp", "j_e6")
        .agg(count(col("t2")).as("nbet"))
        .select(col("th_e6"), col("tp"), col("fp"), col("j_e6"),
          (col("nbet") === 0L).as("best"))
    }),

    // Brier skill score vs climatology — is the q424 score a BETTER
    // probability than just forecasting the base rate? BSS = 1 −
    // BS/BS_ref; ≤ 0 means the model's probabilities are worse than
    // knowing nothing, the go/no-go gate before any calibrated use of
    // the score. Exact: per-item squared errors are integer e12 sums
    // (e6 scores), BS_ref from the base rate in ONE pinned chain.
    "q533_brier_skill" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("p1_e6"),
        (col("label") % 2 === 1).cast("long").as("y"))
      e.agg(count(lit(1)).as("n"), sum("y").as("k"),
          sum((col("p1_e6") - col("y") * 1000000L) *
            (col("p1_e6") - col("y") * 1000000L)).as("se_e12"))
        .withColumn("bs", col("se_e12").cast("double") /
          (d(col("n")) * 1e12))
        .withColumn("p", d(col("k")) / d(col("n")))
        .withColumn("bs_ref", col("p") * (lit(1.0d) - col("p")))
        .select(col("n"), col("k"),
          floor(col("bs") * 1e6).cast("long").as("bs_e6"),
          floor(col("bs_ref") * 1e6).cast("long").as("bs_ref_e6"),
          when(col("bs_ref") > 0.0d,
            floor((lit(1.0d) - col("bs") / col("bs_ref")) * 1e6)
              .cast("long")).otherwise(lit(0L)).as("bss_e6"))
    }),

    // TOPSIS multi-criteria source ranking (Hwang & Yoon 1981) — order
    // the 20 sources by closeness to the ideal point across the three
    // quality criteria (mean length, keep rate, mean tokens), equal
    // weights: the standard MCDM when q438's judges must produce ONE
    // ranking. Criteria are vector-normalized (sqrt is IEEE-exact);
    // distances to ideal/anti-ideal and the closeness ratio are pinned
    // chains over per-source e6-floored normalized scores. Bounded
    // k×3 frames after one scan.
    "q507_topsis" -> ((s, d0) => {
      val per = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"), sum("n_chars").as("sl"),
          sum(col("q.keep").cast("long")).as("k_s"),
          sum(size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long")).as("stk"))
        .select(col("source"), expr("sl div n_s").as("c1"),
          expr("k_s * 1000000 div n_s").as("c2"),
          expr("stk div n_s").as("c3"))
      val norms = per.agg(sum(col("c1") * col("c1")).as("q1"),
        sum(col("c2") * col("c2")).as("q2"),
        sum(col("c3") * col("c3")).as("q3"))
      val r = per.crossJoin(broadcast(norms))
        .select(col("source"),
          floor(d(col("c1")) / sqrt(d(col("q1"))) * 1e6).cast("long")
            .as("r1"),
          floor(d(col("c2")) / sqrt(d(col("q2"))) * 1e6).cast("long")
            .as("r2"),
          floor(d(col("c3")) / sqrt(d(col("q3"))) * 1e6).cast("long")
            .as("r3"))
        .persist() // ideal points + distances read it
      val ideal = r.agg(max("r1").as("b1"), max("r2").as("b2"),
        max("r3").as("b3"), min("r1").as("w1"), min("r2").as("w2"),
        min("r3").as("w3"))
      r.crossJoin(broadcast(ideal))
        .withColumn("dp", sqrt(
          (d(col("r1")) - d(col("b1"))) * (d(col("r1")) - d(col("b1"))) +
          (d(col("r2")) - d(col("b2"))) * (d(col("r2")) - d(col("b2"))) +
          (d(col("r3")) - d(col("b3"))) * (d(col("r3")) - d(col("b3")))))
        .withColumn("dm", sqrt(
          (d(col("r1")) - d(col("w1"))) * (d(col("r1")) - d(col("w1"))) +
          (d(col("r2")) - d(col("w2"))) * (d(col("r2")) - d(col("w2"))) +
          (d(col("r3")) - d(col("w3"))) * (d(col("r3")) - d(col("w3")))))
        .select(col("source"), col("r1"), col("r2"), col("r3"),
          when(col("dp") + col("dm") > 0.0d,
            floor(col("dm") / (col("dp") + col("dm")) * 1e6).cast("long"))
            .otherwise(lit(0L)).as("closeness_e6"))
    }),

    // Exact 3-player Shapley values for the labeling-rule ensemble —
    // each rater's MARGINAL contribution to the majority vote's F1
    // against a held-out gold proxy, averaged over all orderings
    // (n=3 ⇒ the 7 coalition values are computed EXACTLY in one pass
    // and the Shapley weights are 2/6, 1/6, 1/6, 2/6 — no sampling,
    // unlike q390's KNN approximation). The "which labeling function
    // earns its keep" number. Exact: coalition F1s are integer e6;
    // Shapley combination is integer arithmetic over the collected
    // 7-row table (bounded driver combine, the BpeTrainer convention).
    "q508_rater_shapley" -> ((s, d0) => {
      val f = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .select(col("q.keep").cast("long").as("v1"),
          (size(graft.functions.TextFunctions.tokens(col("text"))) >= 15)
            .cast("long").as("v2"),
          (col("q.stop_ratio") > 0.002d).cast("long").as("v3"),
          (col("n_chars") >= 250L).cast("long").as("gold"))
      val coalitions = Seq(
        (1L, 1, 0, 0), (2L, 0, 1, 0), (3L, 0, 0, 1),
        (12L, 1, 1, 0), (13L, 1, 0, 1), (23L, 0, 1, 1), (123L, 1, 1, 1))
      val armExpr = coalitions.map { case (id, a, b, c) =>
        s"""named_struct('cid', ${id}L,
           'votes', v1 * $a + v2 * $b + v3 * $c,
           'sz', ${a + b + c}L)"""
      }.mkString("array(", ", ", ")")
      val f1s = f.select(col("gold"), explode(expr(armExpr)).as("x"))
        .select(col("x.cid").as("cid"), col("gold"),
          (col("x.votes") * 2 >= col("x.sz")).cast("long").as("pred"))
        .groupBy("cid")
        .agg(sum(expr("pred * gold")).as("tp"),
          sum(expr("pred * (1 - gold)")).as("fp"),
          sum(expr("(1 - pred) * gold")).as("fn"))
        .select(col("cid"), expr(
          "2 * tp * 1000000 div greatest(2 * tp + fp + fn, 1L)").as("f1"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def v(id: Long) = f1s(id)
      val phi = Seq(
        ("rule_quality", 2 * v(1) + (v(12) - v(2)) + (v(13) - v(3)) +
          2 * (v(123) - v(23))),
        ("rule_tokens", 2 * v(2) + (v(12) - v(1)) + (v(23) - v(3)) +
          2 * (v(123) - v(13))),
        ("rule_stopratio", 2 * v(3) + (v(13) - v(1)) + (v(23) - v(2)) +
          2 * (v(123) - v(12))))
      import s.implicits._
      phi.map { case (n2, num) => (n2, v(123), num / 6) }
        .toDF("rater", "full_f1_e6", "shapley_e6")
    }),

    // Pinball (quantile) loss of the naive one-day-back forecast at
    // q ∈ {0.1, 0.5, 0.9} — the forecast-eval metric that prices
    // ASYMMETRIC misses (M5-style), where q339's MASE prices only
    // magnitude. Fully integer: loss = q₁₀·(y−f)⁺ + (10−q₁₀)·(f−y)⁺
    // in tenths; calendar join, one conditional aggregate per
    // quantile in a single pass.
    "q509_pinball_loss" -> ((s, d0) => {
      val dm = t(s, d0, "events").select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v"))
        .groupBy("day").agg(expr("sum(v) div count(1)").as("y"))
      val pairs = dm
        .join(dm.select((col("day") + 1L).as("day"), col("y").as("f")),
          "day")
        .select(greatest(col("y") - col("f"), lit(0L)).as("under"),
          greatest(col("f") - col("y"), lit(0L)).as("over"))
      pairs.select(explode(expr(
          """array(named_struct('q10', 1L, 'u', under, 'o', over),
                   named_struct('q10', 5L, 'u', under, 'o', over),
                   named_struct('q10', 9L, 'u', under, 'o', over))"""))
          .as("x"))
        .select(col("x.q10").as("q10"),
          (col("x.q10") * col("x.u") +
            (lit(10L) - col("x.q10")) * col("x.o")).as("l_e1"))
        .groupBy("q10")
        .agg(count(lit(1)).as("n"), sum("l_e1").as("sl_e1"))
        .select(col("q10"), col("n"),
          expr("sl_e1 * 100000 div n").as("mean_loss_e6"))
    }),

    // Kendall's W coefficient of concordance (Kendall & Babington
    // Smith 1939), tie-corrected — do the corpus's three quality
    // JUDGES (mean length, keep rate, mean token count) agree on how
    // the 20 sources RANK? The rank-level complement to q423/q425's
    // per-item agreement: raters can agree per-item yet order sources
    // differently. Midranks ×2 stay integer (r2 = 2·min-rank + ties −
    // 1); W = (12ΣR² − 3m²n(n+1)²)/(m²(n³−n) − mΣT) is pure integer
    // with the ×2 scaling absorbed (12ΣR² → 3ΣR2²). Scale: one scan
    // to per-source sums; ranking lives on the bounded m×n frame.
    "q438_kendall_w" -> ((s, d0) => {
      val per = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"), sum("n_chars").as("sl"),
          sum(col("q.keep").cast("long")).as("k_s"),
          sum(size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long")).as("stk"))
      val long = per.select(col("source"), lit("len").as("judge"),
          expr("sl div n_s").as("metric"))
        .unionByName(per.select(col("source"), lit("keep").as("judge"),
          expr("k_s * 1000000 div n_s").as("metric")))
        .unionByName(per.select(col("source"), lit("tok").as("judge"),
          expr("stk div n_s").as("metric")))
      val wJ = org.apache.spark.sql.expressions.Window
        .partitionBy("judge").orderBy("metric")
      val wJM = org.apache.spark.sql.expressions.Window
        .partitionBy("judge", "metric")
      val ranked = long
        .withColumn("rmin", rank().over(wJ).cast("long"))
        .withColumn("tc", count(lit(1)).over(wJM))
        .withColumn("r2", lit(2L) * col("rmin") + col("tc") - 1L)
      val s2n = ranked.groupBy("source").agg(sum("r2").as("rr2"))
        .agg(count(lit(1)).as("n"), sum(col("rr2") * col("rr2")).as("s2"))
      val tsum = long.groupBy("judge", "metric").agg(count(lit(1)).as("tg"))
        .agg(sum(col("tg") * col("tg") * col("tg") - col("tg")).as("tie_sum"))
      s2n.crossJoin(tsum)
        .select(col("n").as("n_sources"), col("s2"), col("tie_sum"),
          expr("""CASE WHEN 9 * (n * n * n - n) - 3 * tie_sum > 0
            THEN (3 * s2 - 27 * n * (n + 1) * (n + 1)) * 1000000
              div (9 * (n * n * n - n) - 3 * tie_sum)
            ELSE 0 END""").as("w_e6"))
    }),

    // Condorcet/Borda rank fusion — aggregate the three quality
    // judges' source rankings by VOTE instead of score: Copeland
    // (pairwise-majority wins, the Condorcet-consistent method) and
    // Borda count, the two classic committee rules RRF (q246/q350)
    // approximates. With 3 judges and tie-broken strict rankings every
    // pairwise contest has a majority, so Copeland is ±1 per opponent.
    // Exact integers throughout; ranks window-free via the bounded
    // self-join count (q439 rule). Scale: one scan to per-source sums;
    // everything after is (3·n)²-bounded, n = 20.
    "q467_condorcet_fusion" -> ((s, d0) => {
      val per = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"), sum("n_chars").as("sl"),
          sum(col("q.keep").cast("long")).as("k_s"),
          sum(size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long")).as("stk"))
      val long = per.select(col("source"), lit("len").as("judge"),
          expr("sl div n_s").as("metric"))
        .unionByName(per.select(col("source"), lit("keep").as("judge"),
          expr("k_s * 1000000 div n_s").as("metric")))
        .unionByName(per.select(col("source"), lit("tok").as("judge"),
          expr("stk div n_s").as("metric")))
      val o = long.select(col("judge"), col("source").as("s2"),
        col("metric").as("m2"))
      val ranks = long.join(o, "judge")
        .groupBy("judge", "source", "metric")
        .agg(sum(when(col("m2") > col("metric") ||
          (col("m2") === col("metric") && col("s2") < col("source")), 1L)
          .otherwise(0L)).as("before"))
        .select(col("judge"), col("source"), (col("before") + 1L).as("rk"))
        .persist() // pairwise contests + Borda + the pivot read it
      val nn = per.agg(count(lit(1)).as("nsrc"))
      val pw = ranks.join(ranks.select(col("judge"), col("source").as("s2"),
          col("rk").as("rk2")), "judge")
        .where(col("source") =!= col("s2"))
        .groupBy("source", "s2")
        .agg(sum(when(col("rk") < col("rk2"), 1L).otherwise(0L)).as("w"))
      val cope = pw.groupBy("source")
        .agg(sum(when(col("w") >= 2L, 1L).otherwise(-1L)).as("copeland"))
      val agg = ranks.crossJoin(broadcast(nn)).groupBy("source")
        .agg(sum(col("nsrc") - col("rk")).as("borda"),
          max(when(col("judge") === "len", col("rk"))).as("r_len"),
          max(when(col("judge") === "keep", col("rk"))).as("r_keep"),
          max(when(col("judge") === "tok", col("rk"))).as("r_tok"))
      agg.join(cope, "source")
        .select(col("source"), col("borda"), col("copeland"),
          col("r_len"), col("r_keep"), col("r_tok"))
    }),

    // Rank-biased overlap (Webber, Moffat & Zobel 2010) between the
    // length ranking and the keep-rate ranking of the 20 sources —
    // the top-weighted ranking similarity retrieval evals use where
    // Kendall/Spearman over-weight the tail: RBO(p=0.9) =
    // (1−p)·Σ_d p^(d−1)·|A:d ∩ B:d|/d. Overlap-at-depth X_d comes from
    // each source's max(rank_A, rank_B) — no per-depth set
    // materialization. p^(d−1) is a generated left-associated literal
    // multiply chain (the powProd rule — identical text both engines,
    // where pow() would not replay); depth terms fold in sorted d
    // order. Ranks by bounded self-join count, window-free. Scale: one
    // scan to per-source sums; everything after is n²-bounded (n=20).
    "q439_rbo" -> ((s, d0) => {
      val per = t(s, d0, "documents")
        .withColumn("q", graft.functions.TextFunctions.qualityScore(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_s"), sum("n_chars").as("sl"),
          sum(col("q.keep").cast("long")).as("k_s"))
        .select(col("source"), expr("sl div n_s").as("m_len"),
          expr("k_s * 1000000 div n_s").as("m_keep"))
      val o = per.select(col("source").as("s2"), col("m_len").as("l2"),
        col("m_keep").as("k2"))
      val ranks = per.crossJoin(broadcast(o))
        .groupBy("source", "m_len", "m_keep")
        .agg(sum(when(col("l2") > col("m_len") ||
            (col("l2") === col("m_len") && col("s2") < col("source")), 1L)
            .otherwise(0L)).as("ab"),
          sum(when(col("k2") > col("m_keep") ||
            (col("k2") === col("m_keep") && col("s2") < col("source")), 1L)
            .otherwise(0L)).as("bb"))
        .select(col("source"), (col("ab") + 1L).as("a"),
          (col("bb") + 1L).as("b"))
        .withColumn("md", greatest(col("a"), col("b")))
      val xd = ranks.select(col("a").as("d"))
        .join(broadcast(ranks.select(col("md"))), col("md") <= col("d"))
        .groupBy("d").agg(count(lit(1)).as("x_d"))
      val terms = xd.withColumn("term",
        expr(s"($rboPwCase) * cast(x_d as double) / cast(d as double)"))
      terms.agg(count(lit(1)).as("n_depths"),
          max(when(col("d") === 1L, col("x_d"))).as("x_1"),
          max(when(col("d") === 10L, col("x_d"))).as("x_10"),
          array_sort(collect_list(struct(col("d"), col("term")))).as("ps"))
        .withColumn("sfold", aggregate(transform(col("ps"),
          x => x.getField("term")), lit(0.0d), (acc, x) => acc + x))
        .select(col("n_depths"), col("x_1"), col("x_10"),
          floor(col("sfold") * 0.1 * 1e6).cast("long").as("rbo_e6"))
    }),

    // Risk–coverage curve for selective prediction (Geifman & El-Yaniv
    // 2017) — the abstention readout a scored filter needs before
    // shipping a confidence threshold: rank predictions by confidence
    // margin |p − ½| (10 margin deciles), then for each coverage level
    // (keeping the most-confident bins down) report coverage and the
    // selective risk (error rate among covered), plus each band's
    // contribution to AURC. If risk does not fall as coverage shrinks,
    // the confidence is not informative (exactly what q411/q415 ECE/RES
    // quantify — this is the operational view). Prediction = p ≥ ½ on
    // the standing scored fixture. Exact: integer bins, trunc-div
    // rates; the cumulative-from-the-top sums ride a bounded
    // triangular self-join (10×10), not a window. Scale shape: one
    // scan + the 10-bin groupBy; everything after is bounded.
    "q422_risk_coverage" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("conf_e6"),
        (col("label") % 2 === 1).cast("long").as("y"))
        .withColumn("pred", (col("conf_e6") >= 500000L).cast("long"))
        .withColumn("err", (col("pred") =!= col("y")).cast("long"))
        .withColumn("margin_bin",
          expr("least(9L, abs(conf_e6 - 500000) * 2 div 100000)"))
      val bins = e.groupBy("margin_bin")
        .agg(count(lit(1)).as("n_b"), sum("err").as("err_b"))
      val tot = bins.agg(sum("n_b").as("n"))
      val cum = bins.join(
        broadcast(bins.select(col("margin_bin").as("mb2"),
          col("n_b").as("n2"), col("err_b").as("e2"))),
        col("mb2") >= col("margin_bin"))
        .groupBy("margin_bin", "n_b", "err_b")
        .agg(sum("n2").as("cum_n"), sum("e2").as("cum_err"))
      cum.crossJoin(broadcast(tot))
        .select(col("margin_bin"), col("n_b"), col("err_b"),
          col("cum_n"), col("cum_err"),
          expr("cum_n * 1000000 div n").as("coverage_e6"),
          expr("cum_err * 1000000 div cum_n").as("sel_risk_e6"),
          expr("(cum_err * 1000000 div cum_n) * n_b div n")
            .as("aurc_term_e6"))
    }),

    // Murphy decomposition of the Brier score (Murphy 1973) — the
    // companion number to q411's ECE: Brier = reliability − resolution
    // + uncertainty, separating "is the confidence honest" (REL, want
    // 0) from "does the score actually discriminate" (RES, want high)
    // from the base-rate entropy floor (UNC) — a filter can have
    // perfect calibration and zero resolution, and only this
    // decomposition tells them apart. Same deterministic
    // confidence/outcome fixture and 10 equal-width bins as q411.
    // Exact: every squared term is floored to e6 per row/bin BEFORE
    // its sum (merge-order-free; also keeps Σ inside int64 at any n).
    // Scale shape: one scan + the 10-bin groupBy + 1-row broadcasts.
    "q415_brier_decomposition" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("conf_e6"),
        (col("label") % 2 === 1).cast("long").as("y"))
        .withColumn("bin", expr("conf_e6 div 100000"))
      val tot = e.agg(count(lit(1)).as("n"), sum("y").as("ny"),
        sum(expr("""((conf_e6 - y * 1000000) * (conf_e6 - y * 1000000))
          div 1000000""")).as("sb"))
      val bins = e.groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("n_pos"),
          sum("conf_e6").as("sum_conf_e6"))
        .withColumn("acc_e6", expr("n_pos * 1000000 div n_b"))
        .withColumn("conf_mean_e6", expr("sum_conf_e6 div n_b"))
        .crossJoin(broadcast(tot))
        .withColumn("ybar_e6", expr("ny * 1000000 div n"))
        .withColumn("rel_term_e6", expr(
          """n_b * (((conf_mean_e6 - acc_e6) * (conf_mean_e6 - acc_e6))
             div 1000000)"""))
        .withColumn("res_term_e6", expr(
          """n_b * (((acc_e6 - ybar_e6) * (acc_e6 - ybar_e6))
             div 1000000)"""))
      bins.groupBy("n", "ny", "sb", "ybar_e6")
        .agg(sum("rel_term_e6").as("srel"), sum("res_term_e6").as("sres"))
        .select(col("n"),
          expr("sb div n").as("brier_e6"),
          expr("srel div n").as("rel_e6"),
          expr("sres div n").as("res_e6"),
          expr("(ybar_e6 * (1000000 - ybar_e6)) div 1000000")
            .as("unc_e6"))
    }),

    // Expected Calibration Error (Naeini et al. 2015; Guo et al. 2017's
    // standard form) — the reliability readout for any scored
    // filter/classifier the pipeline ships (q264 FITS a calibration
    // map; this MEASURES miscalibration): bin predictions by stated
    // confidence (10 equal-width bins), compare each bin's mean
    // confidence to its empirical accuracy, and weight |gap| by bin
    // mass. Confidence is the deterministic (embedding[0]+1)/2
    // pseudo-probability, outcome label%2 (the repo's standing scored
    // fixture). Exact: e6-floored confidences, integer bin means and
    // accuracy ratios, the ECE total a weighted integer sum replayed
    // in SQL. Scale shape: one scan + a 10-bin groupBy + a 1-row
    // totals broadcast; everything after lives on the bounded bin
    // frame.
    "q411_ece" -> ((s, d0) => {
      val e = t(s, d0, "embeddings").select(
        expr("""least(999999L, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * 1000000.0)
            as bigint)))""").as("conf_e6"),
        (col("label") % 2 === 1).cast("long").as("y"))
      val binned = e.withColumn("bin", expr("conf_e6 div 100000"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("n_pos"),
          sum("conf_e6").as("sum_conf_e6"))
        .withColumn("acc_e6", expr("n_pos * 1000000 div n_b"))
        .withColumn("conf_mean_e6", expr("sum_conf_e6 div n_b"))
        .withColumn("gap_e6", abs(col("acc_e6") - col("conf_mean_e6")))
      val tot = binned.agg(sum("n_b").as("n"),
        sum(expr("gap_e6 * n_b")).as("wgap"))
      binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_b"), col("n_pos"), col("acc_e6"),
          col("conf_mean_e6"), col("gap_e6"),
          expr("gap_e6 * n_b * 1000 div n").as("contrib_e9"),
          expr("wgap * 1000 div n").as("ece_e9"))
    }),

    // Macro-F1 + Cohen's κ over a 3-class truth/pred pairing — the
    // reference's grid-search scoring aggregates (08-optimization.Rmd),
    // computed by Eval.macroF1Kappa: one groupBy to K×K confusion cells,
    // then exact-integer identities (see Eval scaladoc). Truth = label mod
    // 3; pred = a deterministic bucket of the first embedding dim, so both
    // engines score the identical pairing.
    "q184_macro_f1_kappa" -> ((s, d0) => {
      val scored = t(s, d0, "embeddings").select(
        (col("label") % 3).cast("long").as("truth"),
        (abs(floor(element_at(col("embedding"), 1).cast("double") * 10))
          .cast("long") % 3).as("pred"))
      graft.operators.Eval.macroF1Kappa(scored, "truth", "pred")
    }),

    // Dynamic-factor global index (3_sentiment_global.do): z-score each
    // country/type daily series, extract the common factor by 3 power
    // iterations on the K×K Gram matrix of the z panel, global index =
    // loadings · z per day. Everything after the z floor is EXACT integer
    // arithmetic — Gram entries are sums of z_e3 products, each iteration
    // renormalizes v to e3 by a truncating max-abs division (the q132
    // rescale trick, making an iterative factor model oracle-checkable) —
    // and the z chain itself is one pinned double expression with an
    // integer-exact σ²>0 guard (n·Σx² > (Σx)²). Scale shape: the panel
    // aggregation is the only corpus-size pass; the Gram self-join is
    // K²·T rows (K = #series, tiny), the iteration touches K rows.
    // Int64 envelope: |z_e3| ≲ 5e3 ⇒ Gram ≤ T·2.5e7; v_e3 ≈ 1e3 ⇒
    // matvec ≤ K·T·2.5e10, and the renorm divides w before any scaling
    // (no w·1000 blow-up) — safe through K·T ≲ 3.7e8 series-days.
    "q185_global_factor_index" -> ((s, d0) => {
      val z = zPanel(s, d0)
      factorIndex(z, factorLoadings(z))
    }),

    // DFM fit readout (the residual step of 4_merge.do): per-series
    // loading on the global index by exact least squares
    // λ_c = Σ z_c·g / Σ g², idiosyncratic residuals r = z − λ·g, and the
    // variance share the factor explains, R² = 1 − Σr²/Σz² — every
    // quantity an integer or a truncating integer ratio, so the whole
    // regression is merge-order-proof. UNIT BOOKKEEPING (a silent 1000×
    // bug hid here once — both engines shared it, so oracle parity
    // couldn't see it; the spec's K=1 identity-fit case now pins it):
    // the fit uses g_e3 = idx_e6 div 1e3, so szg = Σ z_e3·g_e3 carries
    // e6 and sgg = Σ g_e3² carries e6 ⇒ (szg·1e6) div sgg is λ·1e6, and
    // the predicted term (λ_e6 · g_e3) div 1e6 is back in z's e3 units.
    // Degenerate guards: Σg² = 0 (factor identically zero) and Σz² = 0 →
    // NULL in both engines. Int64 envelope: |z_e3| ≲ 5e3 and |g_e3| ≤
    // K·5e3 keep the e6-scaled λ numerator in int64 through T·K ≲ 3.6e5
    // series-days at the all-rows-at-5σ worst case.
    "q188_factor_fit" -> ((s, d0) => {
      val z = zPanel(s, d0)
      factorFit(z, factorIndex(z, factorLoadings(z))
        .select(col("day"), expr("idx_e6 div 1000").as("g_e3")))
    }),

    // Balanced-bootstrap eval distribution — the reference's 100-fold
    // balanced bootstrap around its grid-search scores
    // (08-optimization.Rmd:262-268), deterministic so both engines replay
    // it: each row appears EXACTLY b times across the b folds (twice in
    // one content-hash-chosen fold, zero in another, once elsewhere), and
    // each fold's macro-F1/κ comes from the same weighted confusion-cell
    // identities. The fold spread IS the confidence interval. Scale
    // shape: one n×b explode (b small), then everything reduces to
    // b·K² cells.
    "q187_bootstrap_eval" -> ((s, d0) => {
      val scored = t(s, d0, "embeddings").select(
        col("vec_id").cast("string").as("id"),
        (col("label") % 3).cast("long").as("truth"),
        (abs(floor(element_at(col("embedding"), 1).cast("double") * 10))
          .cast("long") % 3).as("pred"))
      val boot = graft.operators.Eval.balancedBootstrap(scored, "id", 20)
      graft.operators.Eval.macroF1KappaByFold(boot, "fold", "truth", "pred", "m")
    }),

    // Precision along the confidence-rank distribution
    // (12-model_training_eval.Rmd:57-76): rank every example by model
    // score, sample log-spaced windows of ranks overweighting the top
    // (anchors 4^p, 8 ranks each), and report the positive fraction per
    // window — the real-world eval for an extremely imbalanced corpus,
    // where test-set metrics mislead. Ranking goes through the scalable
    // global-rank path (no single-partition window), is PRUNED to the
    // max anchor rank before the tiny broadcast range join (the q39
    // shape), and the fractions are integer micro-divisions.
    // Per-class precision along the rank distribution — the reference
    // evaluates EACH tweet class this way (the job_search plot et al.).
    // Scale shape: the per-class candidate cut goes through the
    // TopKPerKey physical operator (bounded per-class heaps, no
    // per-class single-partition sort), so only klass·71 rows ever see
    // the rank window; the window is partitioned by class over that tiny
    // frame. Anchors are q186's minus the 256 point (4^p up to 64,
    // window 8) because per-class corpora are 1/K the size.
    "q189_precision_at_rank_by_class" -> ((s, d0) => {
      import s.implicits._
      val anchors = (0 to 3).map { p =>
        val lo = 1L << (2 * p)
        (p.toLong, lo, lo + 7L)
      }.toDF("point", "lo", "hi")
      val e = t(s, d0, "embeddings").select(
        (col("label") % 5).cast("long").as("klass"),
        col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6)
          .cast("long").as("score_e6"),
        (col("label") % 2 === 1).as("pos"))
      val top = graft.plans.TopKPerKey(
        e, Seq("klass"), Seq(desc("score_e6"), asc("vec_id")), k = 71)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("klass").orderBy(desc("score_e6"), asc("vec_id"))
      top.withColumn("rnk", row_number().over(w).cast("long"))
        .join(broadcast(anchors), col("rnk").between(col("lo"), col("hi")))
        .groupBy("klass", "point").agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
        .select(col("klass"), col("point"), col("n"), col("n_pos"),
          expr("(n_pos * 1000000) div n").as("precision_e6"))
    }),

    "q186_precision_at_rank" -> ((s, d0) => {
      import s.implicits._
      val anchors = (0 to 4).map { p =>
        val lo = 1L << (2 * p) // 4^p
        (p.toLong, lo, lo + 7L)
      }.toDF("point", "lo", "hi")
      val e = t(s, d0, "embeddings").select(col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6)
          .cast("long").as("score_e6"),
        (col("label") % 2 === 1).as("pos"))
      val ranked = graft.operators.Ranking.globalRank(
          e, "rnk", desc("score_e6"), asc("vec_id"))
        .where(col("rnk") <= 263L)
      ranked.join(broadcast(anchors), col("rnk").between(col("lo"), col("hi")))
        .groupBy("point").agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
        .select(col("point"), col("n"), col("n_pos"),
          expr("(n_pos * 1000000) div n").as("precision_e6"))
    }),

    // Per-series autocorrelation (lags 1-3) of the daily panel — the
    // persistence diagnostic an economist runs on an indicator before
    // trusting a factor model on it. Sample ACF with the full-series
    // mean/variance: r_k = (Σ x_t·x_{t+k} − x̄·(Σ_head + Σ_tail) +
    // n_k·x̄²) / (Σx² − n·x̄²), every Σ an exact integer from one daily
    // aggregation (pairs matched by day+k equi-join, so calendar gaps
    // shrink n_k identically in both engines), and the final ratio ONE
    // pinned double expression floored to e6. Scale shape: the corpus
    // pass is the daily groupBy; the lag join is a (c, day) key shuffle
    // against a 3-row broadcast lag dim; stats are K-row frames.
    "q207_autocorr" -> ((s, d0) => {
      import s.implicits._
      val daily = t(s, d0, "events").select(col("event_type").as("c"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v_e2"))
        .groupBy("c", "day")
        .agg(expr("sum(v_e2) div count(1)").as("m_e2"))
        .persist()
      val stats = daily.groupBy("c").agg(count(lit(1)).as("n"),
        sum("m_e2").as("sx"), sum(col("m_e2") * col("m_e2")).as("sxx"))
      val lags = Seq(1L, 2L, 3L).toDF("k")
      val a = daily.select(col("c"), col("day"), col("m_e2").as("x"))
      val b = daily.select(col("c").as("bc"), col("day").as("bday"),
        col("m_e2").as("y"))
      val pairs = a.crossJoin(broadcast(lags))
        .join(b, col("c") === col("bc") && col("day") + col("k") === col("bday"))
        .groupBy("c", "k")
        .agg(count(lit(1)).as("n_pairs"), sum(col("x") * col("y")).as("cross"),
          sum("x").as("sh"), sum("y").as("st"))
      val xbar = d(col("sx")) / d(col("n"))
      val den = d(col("sxx")) - d(col("n")) * xbar * xbar
      val num = d(col("cross")) - xbar * (d(col("sh")) + d(col("st"))) +
        d(col("n_pairs")) * xbar * xbar
      pairs.join(stats, "c")
        .where(den > 0.0)
        .select(col("c"), col("k"), col("n_pairs"),
          floor(num / den * 1e6).cast("long").as("acf_e6"))
    }),

    // CUSUM mean-drift detection per daily series (Page's cumulative-sum
    // chart, the no-reset form): cs_t = Σ_{τ≤t}(x_τ − x̄), kept EXACTLY
    // integer by scaling deviations by n (x_t·n − Σx), flagged where
    // |cs_t/n| exceeds 4σ — the structural-break screen an economist
    // runs before trusting a z-scored indicator (complements q182's
    // rolling-median spike detector, which catches outliers, not drift).
    // Scale shape: one daily groupBy; the cumsum window partitions by
    // series key; the flag compare is one pinned double expression.
    "q208_cusum" -> ((s, d0) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c").orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val daily = t(s, d0, "events").select(col("event_type").as("c"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("v_e2"))
        .groupBy("c", "day")
        .agg(expr("sum(v_e2) div count(1)").as("m_e2"))
      val st = daily.groupBy("c").agg(count(lit(1)).as("n"),
        sum("m_e2").as("sx"), sum(col("m_e2") * col("m_e2")).as("sxx"))
      val xbar = d(col("sx")) / d(col("n"))
      val varD = (d(col("sxx")) - d(col("n")) * xbar * xbar) / d(col("n"))
      daily.join(st, "c")
        .withColumn("dev", col("m_e2") * col("n") - col("sx"))
        .withColumn("cs", sum("dev").over(w))
        .where(varD > 0.0)
        .select(col("c"), col("day"), col("cs"),
          (abs(d(col("cs")) / d(col("n"))) > lit(4.0) * sqrt(varD))
            .as("drift_flag"))
    }),

    // Topic-level LOCAL sentiment index (2_sentiment_local.do): raw topic
    // tags are normalized by the reference's rename chain
    // (2_sentiment_local.do:27-50: commodity→comm, monetary→money,
    // market→mkt, …, performance dropped), no-signal topics are excluded
    // (the `tradeextrnl | ecnind` filter at :53-55), per-article sentiment
    // = positive − negative hits (:53), collapsed to a per-(country,
    // topic, day) mean (:63) and z-scored within each (country, topic)
    // series (the 4_merge.do standardization the global factor also
    // uses). Mean = truncating integer division to e6; the z chain is the
    // zPanel pattern — one pinned double expression with the σ² > 0 guard
    // in the double domain. Scale shape: tag + sentiment are map-side;
    // the collapse and the per-series moments are key-shuffles on
    // (country, topic[, day]) — no global state.
    "q191_topic_sentiment" -> ((s, d0) => {
      import graft.functions.TextFunctions
      val pos = TextFunctions.stopwordHits(col("text"), Seq("fast", "big", "spark"))
      val neg = TextFunctions.stopwordHits(col("text"), Seq("slow", "small", "filter"))
      val nTok = size(TextFunctions.tokens(col("text")))
      val daily = t(s, d0, "documents")
        .select(col("lang").as("country"),
          expr(normTopicExpr(s"element_at(array($topicTagList), " +
            "CAST(doc_id % 8 AS INT) + 1)")).as("topic"),
          expr("doc_id % 30").as("day"),
          (pos - neg).cast("long").as("sent"),
          when(nTok > 0, 1L).otherwise(0L).as("has_words"))
        .where(not(col("topic").isin("trade_extrnl", "ecn_ind")))
        .groupBy("country", "topic", "day")
        .agg(count(lit(1)).as("n"), sum("sent").as("s_sum"),
          sum("has_words").as("n_articles"))
        .select(col("country"), col("topic"), col("day"), col("n_articles"),
          expr("(s_sum * 1000000) div n").as("m_e6"))
      val st = daily.groupBy("country", "topic").agg(count(lit(1)).as("tn"),
        sum("m_e6").as("s1"), sum(col("m_e6") * col("m_e6")).as("s2"))
      val mu = d(col("s1")) / d(col("tn"))
      val varD = d(col("s2")) / d(col("tn")) - mu * mu
      daily.join(st, Seq("country", "topic"))
        .where(varD > 0.0)
        .select(col("country"), col("topic"), col("day"), col("n_articles"),
          floor((d(col("m_e6")) - mu) / sqrt(varD) * 1000)
            .cast("long").as("z_e3"))
    }),

    // pass@k estimator (Chen et al. 2021, Codex): per task with n samples
    // of which c are correct, pass@k = 1 − C(n−c,k)/C(n,k), computed as
    // the telescoped product Π_{j<k} (n−c−j)/(n−j). Task = user_id,
    // "correct" = value > 50. pass@1 stays in exact integers (c/n);
    // pass@5's product is a pinned chain of IEEE divisions/multiplies of
    // exact integers — correctly-rounded ops, no libm, so both engines
    // produce the bit-identical double and the e6 floor cannot diverge.
    // Scale shape: one groupBy(user) — n is samples-per-task (small by
    // construction in pass@k evals), everything else is map-side.
    "q275_pass_at_k" -> ((s, d0) => {
      val st = t(s, d0, "events").groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("c"))
        .where(col("n") >= 5)
      def f(off: Int): Column =
        d(col("n") - col("c") - lit(off.toLong)) / d(col("n") - lit(off.toLong))
      val r5 = f(0) * f(1) * f(2) * f(3) * f(4)
      st.select(col("user_id"), col("n"), col("c"),
        expr("(c * 1000000) div n").as("pass1_e6"),
        when(col("n") - col("c") < 5, lit(1000000L))
          .otherwise(floor((lit(1.0) - r5) * 1e6).cast("long")).as("pass5_e6"))
    }),

    // Split-conformal prediction intervals (Vovk; Lei et al. 2018): fit on
    // a train split (per-type truncated-integer mean), take the
    // ⌈(n+1)(1−α)⌉-th smallest absolute residual on a disjoint
    // calibration split as the radius q̂ (α = 0.1), and report empirical
    // coverage on a held-out test split. Splits are event_id mod 4 —
    // deterministic cross-engine. Everything is exact integer arithmetic:
    // centi-unit residuals, an integer ceil identity for the rank, and an
    // e6 coverage share. Scale shape: the per-type order statistic runs
    // on the keyed PrefixScan (event_type has ~10 values, so a
    // row_number-over-partitionBy(event_type) window would sort the
    // whole calibration quarter in ~10 tasks; the rank filter is a
    // computed quantile, not a literal, so WindowGroupLimit can't
    // rescue it) — range-sorted ranks, bounded n_cal broadcast.
    "q276_conformal" -> ((s, d0) => {
      val base = t(s, d0, "events").select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("v_e2"),
        (col("event_id") % 4).as("bucket"))
      val pred = base.where(col("bucket") < 2).groupBy("event_type")
        .agg(expr("sum(v_e2) div count(1)").as("pred_e2"))
      val cal = base.where(col("bucket") === 2).join(broadcast(pred), "event_type")
        .select(col("event_type"), abs(col("v_e2") - col("pred_e2")).as("s"),
          col("event_id"))
      val nCal = cal.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
      val qh = graft.operators.PrefixScan.scanLongKeyed(cal,
          Seq("event_type"),
          Seq(graft.operators.PrefixScan.KeyedScanCol("rnk", "", "count")),
          asc("s"), asc("event_id"))
        .join(broadcast(nCal), "event_type")
        .where(col("rnk") ===
          least(col("n_cal"), expr("((n_cal + 1) * 9 + 9) div 10")))
        .select(col("event_type"), col("n_cal"), col("s").as("qhat_e2"))
      base.where(col("bucket") === 3).join(broadcast(pred), "event_type")
        .join(broadcast(qh), "event_type")
        .groupBy("event_type", "n_cal", "qhat_e2")
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("v_e2") - col("pred_e2")) <= col("qhat_e2"), 1L)
            .otherwise(0L)).as("n_cov"))
        .select(col("event_type"), col("n_cal"), col("qhat_e2"), col("n_test"),
          expr("(n_cov * 1000000) div n_test").as("cov_e6"))
    }),

    // Decile lift/gains table — the scoring-model eval a marketing or
    // risk team reads first: rank by model score (first embedding dim),
    // split into 10 equal-depth deciles, and report per-decile and
    // cumulative response rates plus cumulative lift vs the base rate.
    // Ranking runs through Ranking.globalRank (range-sort +
    // zipWithIndex — no single-partition window); every rate and the
    // lift are exact integer divisions (lift = rate_e6·10⁶ div
    // base_e6, two-stage so nothing outgrows int64). The final cumsum
    // runs on the 10-row decile frame (deliberately bounded partition).
    "q293_decile_lift" -> ((s, d0) => {
      val scored = t(s, d0, "embeddings").select(col("vec_id"),
        (col("label") % 2).cast("long").as("resp"),
        element_at(col("embedding"), 1).cast("double").as("score"))
      val ranked = graft.operators.Ranking.globalRank(
        scored, "rnk", desc("score"), asc("vec_id"))
      val tot = scored.agg(count(lit(1)).as("n_total"),
        sum("resp").as("tot_resp"))
      val dec = ranked.crossJoin(broadcast(tot))
        .select(expr("(rnk - 1) * 10 div n_total").as("decile"),
          col("resp"), col("n_total"), col("tot_resp"))
        .groupBy("decile", "n_total", "tot_resp")
        .agg(count(lit(1)).as("n_rows"), sum("resp").as("n_resp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy("decile")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      dec
        .withColumn("cum_rows", sum("n_rows").over(w))
        .withColumn("cum_resp", sum("n_resp").over(w))
        .select(col("decile"), col("n_rows"), col("n_resp"),
          expr("(n_resp * 1000000) div n_rows").as("rate_e6"),
          expr("(cum_resp * 1000000) div cum_rows").as("cum_rate_e6"),
          expr("(((cum_resp * 1000000) div cum_rows) * 1000000) " +
            "div ((tot_resp * 1000000) div n_total)").as("cum_lift_e6"))
    }))

  /** The reference's topic-tag rename chain (`2_sentiment_local.do:27-50`)
    * as ordered string replaces — applied in source order, then the
    * dropped-segment trim (Stata's `ren *perform* **`). Both engines run
    * the IDENTICAL nested-replace expression.
    */
  private val topicRenames: Seq[(String, String)] = Seq(
    "commodity" -> "commdty", "monetary" -> "money", "external" -> "extrnl",
    "political" -> "polit", "general" -> "gen", "policy" -> "pol",
    "performance" -> "perform", "corporate" -> "corp", "market" -> "mkt",
    "economic" -> "ecn", "government" -> "govt", "indicators" -> "ind",
    "financial" -> "fin", "perform" -> "", "commdty" -> "comm")

  private def normTopicExpr(inner: String): String = {
    val nested = topicRenames.foldLeft(inner) {
      case (e, (from, to)) => s"replace($e, '$from', '$to')"
    }
    s"trim(TRAILING '_' FROM $nested)"
  }

  /** Deterministic raw topic tags (doc_id mod 8 → long-form tag) — the
    * synthetic stand-in for the reference's per-article topic feature
    * columns; two of the eight normalize to the excluded no-signal set.
    */
  private val topicTagList: String = Seq(
    "commodity_market", "monetary_policy", "trade_external",
    "political_general", "economic_indicators", "financial_market",
    "government_policy", "corporate_performance")
    .map(t => s"'$t'").mkString(", ")

  /** Shared oracle chain — the SQL mirror of `Eval.macroF1KappaByFold`:
    * expects a prior CTE `scored0(fold, t, p, m)` and carries the
    * weighted confusion-cell identities down to `s` (one row per fold).
    */
  private val confusionCtes: String =
    """cells AS (SELECT fold, t, p, CAST(sum(m) AS BIGINT) AS c
                   FROM scored0 WHERE m > 0 GROUP BY 1, 2, 3),
         rowm AS (SELECT fold, t AS k, CAST(sum(c) AS BIGINT) AS row_n
                  FROM cells GROUP BY 1, 2),
         colm AS (SELECT fold, p AS k, CAST(sum(c) AS BIGINT) AS col_n
                  FROM cells GROUP BY 1, 2),
         tp AS (SELECT fold, t AS k, c AS tp FROM cells WHERE t = p),
         per AS (
           SELECT fold, k, coalesce(row_n, 0) AS row_n,
             coalesce(col_n, 0) AS col_n, coalesce(tp.tp, 0) AS tp,
             CASE WHEN coalesce(row_n, 0) + coalesce(col_n, 0) = 0 THEN 0
               ELSE (2 * coalesce(tp.tp, 0) * 1000000)
                 // (coalesce(row_n, 0) + coalesce(col_n, 0)) END AS f1_e6
           FROM rowm FULL JOIN colm USING (fold, k)
           LEFT JOIN tp USING (fold, k)),
         s AS (
           SELECT fold, CAST(sum(row_n) AS BIGINT) AS n,
             CAST(sum(tp) AS BIGINT) AS agree, count(*) AS k_classes,
             CAST(sum(f1_e6) AS BIGINT) AS f1_sum,
             CAST(sum(row_n * col_n) AS BIGINT) AS s_rc
           FROM per GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    "q537_ppv_at_prevalence" -> {
      val stopAll = TrainingShared.hitsSql(
        graft.functions.TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH f AS (
           SELECT
             CAST(CASE WHEN len(w) >= 10 AND len(w) <= 100000 AND
               (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                 ELSE 0.0 END) > 0.001 THEN 1 ELSE 0 END AS BIGINT) AS p,
             CAST(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS BIGINT)
               AS g
           FROM (SELECT n_chars, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         cells AS (
           SELECT CAST(sum(p * g) AS BIGINT) AS tp,
             CAST(sum((1 - p) * g) AS BIGINT) AS fn,
             CAST(sum(p * (1 - g)) AS BIGINT) AS fp,
             CAST(sum((1 - p) * (1 - g)) AS BIGINT) AS tn
           FROM f),
         ss AS (
           SELECT tp * 1000000 // greatest(tp + fn, 1) AS sens_e6,
             tn * 1000000 // greatest(tn + fp, 1) AS spec_e6
           FROM cells)
         SELECT CAST(prev_e2 AS BIGINT) AS prev_e2, sens_e6, spec_e6,
           sens_e6 * CAST(prev_e2 AS BIGINT) * 1000000
             // greatest(sens_e6 * CAST(prev_e2 AS BIGINT)
               + (1000000 - spec_e6) * (100 - CAST(prev_e2 AS BIGINT)), 1)
             AS ppv_e6,
           spec_e6 * (100 - CAST(prev_e2 AS BIGINT)) * 1000000
             // greatest(spec_e6 * (100 - CAST(prev_e2 AS BIGINT))
               + (1000000 - sens_e6) * CAST(prev_e2 AS BIGINT), 1)
             AS npv_e6
         FROM ss, (SELECT unnest([1, 10, 50]) AS prev_e2)"""
    },

    "q538_bowker_symmetry" -> {
      val hits = graft.functions.TextFunctions.langStopwords.map {
        case (lang, words) =>
          s"${TrainingShared.hitsSql(words)} AS h_$lang"
      }.mkString(", ")
      """WITH p AS (
           SELECT lang,
             CASE WHEN mx = 0 THEN 'und'
                  WHEN h_en = mx THEN 'en' WHEN h_es = mx THEN 'es'
                  WHEN h_fr = mx THEN 'fr' ELSE 'de' END AS pred
           FROM (SELECT lang, h_en, h_es, h_fr, h_de,
                   greatest(h_en, h_es, h_fr, h_de) AS mx
                 FROM (SELECT lang, """ + hits + """ FROM documents))),
         cells AS (
           SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2),
         pr AS (
           SELECT COALESCE(a.i, b.i) AS i, COALESCE(a.j, b.j) AS j,
             COALESCE(a.nij, 0) AS nij, COALESCE(b.nji, 0) AS nji
           FROM (SELECT lang AS i, pred AS j, n AS nij FROM cells) a
           FULL JOIN (SELECT pred AS i, lang AS j, n AS nji FROM cells) b
             ON a.i = b.i AND a.j = b.j),
         pr2 AS (SELECT * FROM pr WHERE i < j)
         SELECT count(*) AS n_pairs,
           CAST(sum(CASE WHEN nij + nji > 0
             THEN (nij - nji) * (nij - nji) * 1000000 // (nij + nji)
             ELSE 0 END) AS BIGINT) AS chi2_e6,
           CAST(sum(CASE WHEN nij + nji > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS df
         FROM pr2"""
    },

    "q539_oos_r2" ->
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
         fit0 AS (
           SELECT count(*) AS n1, CAST(sum(tt) AS BIGINT) AS st,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(tt * y) AS BIGINT) AS sty,
             CAST(sum(tt * tt) AS BIGINT) AS stt
           FROM (SELECT day - d0 AS tt, y FROM dm, br WHERE day < b)),
         fit1 AS (
           SELECT *,
             (CAST(n1 AS DOUBLE) * CAST(sty AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(stt AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope
           FROM fit0),
         fit AS (
           SELECT n1, slope,
             (CAST(sy AS DOUBLE) - slope * CAST(st AS DOUBLE))
               / CAST(n1 AS DOUBLE) AS icept
           FROM fit1),
         second AS (
           SELECT n1, y,
             CAST(floor((CAST(y AS DOUBLE)
               - (icept + slope * CAST(tt AS DOUBLE)))
               * (CAST(y AS DOUBLE)
               - (icept + slope * CAST(tt AS DOUBLE))) * 100.0)
               AS BIGINT) AS se_e2
           FROM (SELECT day - d0 AS tt, y FROM dm, br WHERE day >= b),
             fit),
         ag AS (
           SELECT max(n1) AS n_fit, count(*) AS n_test,
             CAST(sum(y) AS BIGINT) AS sy2,
             CAST(sum(y * y) AS BIGINT) AS syy2,
             CAST(sum(se_e2) AS BIGINT) AS sse_e2
           FROM second),
         ch AS (
           SELECT *, CAST(syy2 AS DOUBLE) - CAST(sy2 AS DOUBLE)
             * CAST(sy2 AS DOUBLE) / CAST(n_test AS DOUBLE) AS sst
           FROM ag)
         SELECT n_fit, n_test,
           CAST(floor(CAST(sse_e2 AS DOUBLE) / 100.0) AS BIGINT)
             AS sse_floor,
           CASE WHEN sst > 0.0
             THEN CAST(floor((1.0 - (CAST(sse_e2 AS DOUBLE) / 100.0)
               / sst) * 1000000.0) AS BIGINT)
             ELSE 0 END AS r2_oos_e6
         FROM ch""",

    "q534_somers_d" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS p,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT)
               AS y
           FROM embeddings),
         h AS (
           SELECT p,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0
           FROM e GROUP BY 1),
         cum AS (
           SELECT p, c1, c0,
             CAST(COALESCE(sum(c0) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb0
           FROM h),
         tot AS (
           SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0
           FROM h),
         ag AS (
           SELECT CAST(sum(c1 * (2 * cb0 + c0)) AS BIGINT) AS u2
           FROM cum)
         SELECT n1, n0,
           u2 * 1000000 // (2 * n1 * n0) AS auc_e6,
           u2 * 1000000 // (n1 * n0) - 1000000 AS somers_d_e6
         FROM ag, tot""",

    "q535_score_ks" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS p,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT)
               AS y
           FROM embeddings),
         h AS (
           SELECT p,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0
           FROM e GROUP BY 1),
         cum AS (
           SELECT p,
             CAST(sum(c1) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS f1,
             CAST(sum(c0) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS f0
           FROM h),
         tot AS (
           SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0
           FROM h),
         g AS (
           SELECT p,
             abs(f1 * 1000000 // n1 - f0 * 1000000 // n0) AS gap_e6
           FROM cum, tot),
         best AS (
           SELECT gap_e6, p FROM g ORDER BY gap_e6 DESC, p LIMIT 1)
         SELECT n1, n0, gap_e6 AS ks_e6, p AS ks_at_score_e6
         FROM best, tot""",

    "q536_lin_ccc" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) // 1000 AS x,
             least(999999, greatest(0, CAST(floor(
               (CAST(embedding[2] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) // 1000 AS yv
           FROM embeddings),
         ag AS (
           SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(yv) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(yv * yv) AS BIGINT) AS syy,
             CAST(sum(x * yv) AS BIGINT) AS sxy
           FROM e),
         ch AS (
           SELECT *,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
           FROM ag),
         ch2 AS (
           SELECT *,
             CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - mx * mx AS vx,
             CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - my * my AS vy,
             CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - mx * my AS cxy
           FROM ch)
         SELECT n,
           CASE WHEN vx * vy > 0.0
             THEN CAST(floor(cxy / sqrt(vx * vy) * 1000000.0) AS BIGINT)
             ELSE 0 END AS pearson_e6,
           CASE WHEN vx + vy + (mx - my) * (mx - my) > 0.0
             THEN CAST(floor(2.0 * cxy / (vx + vy + (mx - my) * (mx - my))
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS ccc_e6
         FROM ch2""",

    "q531_mcc" ->
      s"""WITH f AS (
           SELECT ${TrainingShared.keepRuleSql} AS p,
             CAST(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS BIGINT)
               AS g
           FROM (SELECT n_chars, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         ag AS (
           SELECT CAST(sum(p * g) AS BIGINT) AS a,
             CAST(sum(p * (1 - g)) AS BIGINT) AS b,
             CAST(sum((1 - p) * g) AS BIGINT) AS c,
             CAST(sum((1 - p) * (1 - g)) AS BIGINT) AS dd
           FROM f),
         ch AS (
           SELECT *, sqrt(
             (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
             * (CAST(a AS DOUBLE) + CAST(c AS DOUBLE))
             * (CAST(b AS DOUBLE) + CAST(dd AS DOUBLE))
             * (CAST(c AS DOUBLE) + CAST(dd AS DOUBLE))) AS den
           FROM ag)
         SELECT a, b, c, dd,
           CASE WHEN den > 0.0
             THEN CAST(floor((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
               - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) / den
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS mcc_e6
         FROM ch""",

    "q532_youden" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS p1_e6,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT)
               AS y
           FROM embeddings),
         sweep AS (
           SELECT CAST(th0 AS BIGINT) * 100000 AS th_e6,
             CAST(sum(CASE WHEN p1_e6 >= CAST(th0 AS BIGINT) * 100000
               AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN p1_e6 >= CAST(th0 AS BIGINT) * 100000
               AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS npos,
             CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nneg
           FROM e, (SELECT unnest(range(1, 10)) AS th0)
           GROUP BY 1),
         j AS (
           SELECT th_e6, tp, fp,
             tp * 1000000 // greatest(npos, 1)
               - fp * 1000000 // greatest(nneg, 1) AS j_e6
           FROM sweep)
         SELECT a.th_e6, a.tp, a.fp, a.j_e6,
           ((SELECT count(*) FROM j b WHERE b.j_e6 > a.j_e6
             OR (b.j_e6 = a.j_e6 AND b.th_e6 < a.th_e6)) = 0) AS best
         FROM j a""",

    "q533_brier_skill" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS p1_e6,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT)
               AS y
           FROM embeddings),
         ag AS (
           SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS k,
             CAST(sum((p1_e6 - y * 1000000) * (p1_e6 - y * 1000000))
               AS BIGINT) AS se_e12
           FROM e),
         ch AS (
           SELECT *,
             CAST(se_e12 AS DOUBLE)
               / (CAST(n AS DOUBLE) * 1000000000000.0) AS bs,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p
           FROM ag),
         ch2 AS (SELECT *, p * (1.0 - p) AS bs_ref FROM ch)
         SELECT n, k,
           CAST(floor(bs * 1000000.0) AS BIGINT) AS bs_e6,
           CAST(floor(bs_ref * 1000000.0) AS BIGINT) AS bs_ref_e6,
           CASE WHEN bs_ref > 0.0
             THEN CAST(floor((1.0 - bs / bs_ref) * 1000000.0) AS BIGINT)
             ELSE 0 END AS bss_e6
         FROM ch2""",

    "q507_topsis" ->
      s"""WITH base AS MATERIALIZED (
           SELECT source, n_chars, ${TrainingShared.keepRuleSql} AS keep,
             len(w) AS ntok
           FROM (SELECT source, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         per AS MATERIALIZED (
           SELECT source,
             CAST(sum(n_chars) AS BIGINT) // count(*) AS c1,
             CAST(sum(keep) AS BIGINT) * 1000000 // count(*) AS c2,
             CAST(sum(ntok) AS BIGINT) // count(*) AS c3
           FROM base GROUP BY 1),
         norms AS (
           SELECT CAST(sum(c1 * c1) AS BIGINT) AS q1,
             CAST(sum(c2 * c2) AS BIGINT) AS q2,
             CAST(sum(c3 * c3) AS BIGINT) AS q3
           FROM per),
         r AS (
           SELECT source,
             CAST(floor(CAST(c1 AS DOUBLE) / sqrt(CAST(q1 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS r1,
             CAST(floor(CAST(c2 AS DOUBLE) / sqrt(CAST(q2 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS r2,
             CAST(floor(CAST(c3 AS DOUBLE) / sqrt(CAST(q3 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS r3
           FROM per, norms),
         ideal AS (
           SELECT max(r1) AS b1, max(r2) AS b2, max(r3) AS b3,
             min(r1) AS w1, min(r2) AS w2, min(r3) AS w3
           FROM r),
         dd AS (
           SELECT source, r1, r2, r3,
             sqrt((CAST(r1 AS DOUBLE) - CAST(b1 AS DOUBLE))
                 * (CAST(r1 AS DOUBLE) - CAST(b1 AS DOUBLE))
               + (CAST(r2 AS DOUBLE) - CAST(b2 AS DOUBLE))
                 * (CAST(r2 AS DOUBLE) - CAST(b2 AS DOUBLE))
               + (CAST(r3 AS DOUBLE) - CAST(b3 AS DOUBLE))
                 * (CAST(r3 AS DOUBLE) - CAST(b3 AS DOUBLE))) AS dp,
             sqrt((CAST(r1 AS DOUBLE) - CAST(w1 AS DOUBLE))
                 * (CAST(r1 AS DOUBLE) - CAST(w1 AS DOUBLE))
               + (CAST(r2 AS DOUBLE) - CAST(w2 AS DOUBLE))
                 * (CAST(r2 AS DOUBLE) - CAST(w2 AS DOUBLE))
               + (CAST(r3 AS DOUBLE) - CAST(w3 AS DOUBLE))
                 * (CAST(r3 AS DOUBLE) - CAST(w3 AS DOUBLE))) AS dm
           FROM r, ideal)
         SELECT source, r1, r2, r3,
           CASE WHEN dp + dm > 0.0
             THEN CAST(floor(dm / (dp + dm) * 1000000.0) AS BIGINT)
             ELSE 0 END AS closeness_e6
         FROM dd""",

    "q508_rater_shapley" -> {
      val stopAll = TrainingShared.hitsSql(
        graft.functions.TextFunctions.langStopwords.flatMap(_._2))
      val coalitions = Seq(
        (1L, 1, 0, 0), (2L, 0, 1, 0), (3L, 0, 0, 1),
        (12L, 1, 1, 0), (13L, 1, 0, 1), (23L, 0, 1, 1), (123L, 1, 1, 1))
      val arms = coalitions.map { case (id, a, b, c) =>
        s"""SELECT CAST($id AS BIGINT) AS cid,
             v1 * $a + v2 * $b + v3 * $c AS votes,
             CAST(${a + b + c} AS BIGINT) AS sz, gold FROM f"""
      }.mkString("\n           UNION ALL ")
      s"""WITH f AS MATERIALIZED (
           SELECT ${TrainingShared.keepRuleSql} AS v1,
             CAST(CASE WHEN len(w) >= 15 THEN 1 ELSE 0 END AS BIGINT)
               AS v2,
             CAST(CASE WHEN round(CASE WHEN len(w) > 0
               THEN CAST($stopAll AS DOUBLE) / len(w) ELSE 0.0 END, 6)
               > 0.002 THEN 1 ELSE 0 END AS BIGINT) AS v3,
             CAST(CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS BIGINT)
               AS gold
           FROM (SELECT n_chars, text, string_split(lower(text), ' ') AS w
                 FROM documents)),
         arms AS (
           $arms),
         preds AS (
           SELECT cid, gold,
             CASE WHEN votes * 2 >= sz THEN 1 ELSE 0 END AS pred
           FROM arms),
         f1 AS (
           SELECT cid,
             2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS f1
           FROM (SELECT cid, CAST(sum(pred * gold) AS BIGINT) AS tp,
                   CAST(sum(pred * (1 - gold)) AS BIGINT) AS fp,
                   CAST(sum((1 - pred) * gold) AS BIGINT) AS fn
                 FROM preds GROUP BY 1)),
         pv AS (
           SELECT max(CASE WHEN cid = 1 THEN f1 END) AS v1,
             max(CASE WHEN cid = 2 THEN f1 END) AS v2,
             max(CASE WHEN cid = 3 THEN f1 END) AS v3,
             max(CASE WHEN cid = 12 THEN f1 END) AS v12,
             max(CASE WHEN cid = 13 THEN f1 END) AS v13,
             max(CASE WHEN cid = 23 THEN f1 END) AS v23,
             max(CASE WHEN cid = 123 THEN f1 END) AS v123
           FROM f1)
         SELECT 'rule_quality' AS rater, v123 AS full_f1_e6,
           (2 * v1 + (v12 - v2) + (v13 - v3) + 2 * (v123 - v23)) // 6
             AS shapley_e6
         FROM pv
         UNION ALL
         SELECT 'rule_tokens', v123,
           (2 * v2 + (v12 - v1) + (v23 - v3) + 2 * (v123 - v13)) // 6
         FROM pv
         UNION ALL
         SELECT 'rule_stopratio', v123,
           (2 * v3 + (v13 - v1) + (v23 - v2) + 2 * (v123 - v12)) // 6
         FROM pv"""
    },

    "q509_pinball_loss" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         dm AS (
           SELECT day, CAST(sum(v) AS BIGINT) // count(*) AS y
           FROM daily GROUP BY 1),
         pairs AS (
           SELECT greatest(a.y - b.f, 0) AS under,
             greatest(b.f - a.y, 0) AS over
           FROM dm a JOIN (SELECT day + 1 AS day, y AS f FROM dm) b
             USING (day)),
         arms AS (
           SELECT q10, q10 * under + (10 - q10) * over AS l_e1
           FROM pairs, (SELECT CAST(unnest([1, 5, 9]) AS BIGINT) AS q10))
         SELECT q10, count(*) AS n,
           CAST(sum(l_e1) AS BIGINT) * 100000 // count(*) AS mean_loss_e6
         FROM arms GROUP BY 1""",

    "q467_condorcet_fusion" ->
      s"""WITH base AS (
           SELECT source, n_chars, ${TrainingShared.keepRuleSql} AS keep,
             len(w) AS ntok
           FROM (SELECT source, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         per AS (
           SELECT source, count(*) AS n_s,
             CAST(sum(n_chars) AS BIGINT) AS sl,
             CAST(sum(keep) AS BIGINT) AS k_s,
             CAST(sum(ntok) AS BIGINT) AS stk
           FROM base GROUP BY 1),
         lng AS (
           SELECT source, 'len' AS judge, sl // n_s AS metric FROM per
           UNION ALL
           SELECT source, 'keep', k_s * 1000000 // n_s FROM per
           UNION ALL
           SELECT source, 'tok', stk // n_s FROM per),
         rk AS (
           SELECT x.judge, x.source,
             CAST(1 + (SELECT count(*) FROM lng y
               WHERE y.judge = x.judge AND (y.metric > x.metric
                 OR (y.metric = x.metric AND y.source < x.source)))
               AS BIGINT) AS rk
           FROM lng x),
         nn AS (SELECT count(*) AS nsrc FROM per),
         pw AS (
           SELECT a.source, b.source AS s2,
             CAST(sum(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS BIGINT)
               AS w
           FROM rk a JOIN rk b
             ON a.judge = b.judge AND a.source <> b.source
           GROUP BY 1, 2),
         cope AS (
           SELECT source,
             CAST(sum(CASE WHEN w >= 2 THEN 1 ELSE -1 END) AS BIGINT)
               AS copeland
           FROM pw GROUP BY 1),
         ag AS (
           SELECT source,
             CAST(sum(nsrc - rk) AS BIGINT) AS borda,
             max(CASE WHEN judge = 'len' THEN rk END) AS r_len,
             max(CASE WHEN judge = 'keep' THEN rk END) AS r_keep,
             max(CASE WHEN judge = 'tok' THEN rk END) AS r_tok
           FROM rk, nn GROUP BY 1)
         SELECT ag.source, borda, copeland, r_len, r_keep, r_tok
         FROM ag JOIN cope USING (source)""",

    "q438_kendall_w" ->
      s"""WITH base AS (
           SELECT source, n_chars, ${TrainingShared.keepRuleSql} AS keep,
             len(w) AS ntok
           FROM (SELECT source, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         per AS (
           SELECT source, count(*) AS n_s,
             CAST(sum(n_chars) AS BIGINT) AS sl,
             CAST(sum(keep) AS BIGINT) AS k_s,
             CAST(sum(ntok) AS BIGINT) AS stk
           FROM base GROUP BY 1),
         lng AS (
           SELECT source, 'len' AS judge, sl // n_s AS metric FROM per
           UNION ALL
           SELECT source, 'keep', k_s * 1000000 // n_s FROM per
           UNION ALL
           SELECT source, 'tok', stk // n_s FROM per),
         rk AS (
           SELECT source, judge, metric,
             CAST(rank() OVER (PARTITION BY judge ORDER BY metric)
               AS BIGINT) AS rmin,
             CAST(count(*) OVER (PARTITION BY judge, metric)
               AS BIGINT) AS tc
           FROM lng),
         rr AS (
           SELECT source, CAST(sum(2 * rmin + tc - 1) AS BIGINT) AS rr2
           FROM rk GROUP BY 1),
         ss AS (
           SELECT count(*) AS n, CAST(sum(rr2 * rr2) AS BIGINT) AS s2
           FROM rr),
         tt AS (
           SELECT CAST(sum(tg * tg * tg - tg) AS BIGINT) AS tie_sum
           FROM (SELECT judge, metric, count(*) AS tg
                 FROM lng GROUP BY 1, 2))
         SELECT n AS n_sources, s2, tie_sum,
           CASE WHEN 9 * (n * n * n - n) - 3 * tie_sum > 0
             THEN (3 * s2 - 27 * n * (n + 1) * (n + 1)) * 1000000
               // (9 * (n * n * n - n) - 3 * tie_sum)
             ELSE 0 END AS w_e6
         FROM ss, tt""",

    "q439_rbo" ->
      s"""WITH base AS (
           SELECT source, n_chars, ${TrainingShared.keepRuleSql} AS keep
           FROM (SELECT source, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         per AS (
           SELECT source, count(*) AS n_s,
             CAST(sum(n_chars) AS BIGINT) AS sl,
             CAST(sum(keep) AS BIGINT) AS k_s
           FROM base GROUP BY 1),
         pm AS (
           SELECT source, sl // n_s AS m_len,
             k_s * 1000000 // n_s AS m_keep
           FROM per),
         rk AS (
           SELECT x.source,
             1 + (SELECT count(*) FROM pm y WHERE y.m_len > x.m_len
                  OR (y.m_len = x.m_len AND y.source < x.source)) AS a,
             1 + (SELECT count(*) FROM pm y WHERE y.m_keep > x.m_keep
                  OR (y.m_keep = x.m_keep AND y.source < x.source)) AS b
           FROM pm x),
         r2 AS (
           SELECT source, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
             CAST(greatest(a, b) AS BIGINT) AS md
           FROM rk),
         xd AS (
           SELECT dd.d, count(*) AS x_d
           FROM (SELECT a AS d FROM r2) dd JOIN r2 ON r2.md <= dd.d
           GROUP BY 1),
         tm AS (
           SELECT d, x_d, ($rboPwCase) * CAST(x_d AS DOUBLE)
             / CAST(d AS DOUBLE) AS term
           FROM xd),
         ag AS (
           SELECT count(*) AS n_depths,
             max(CASE WHEN d = 1 THEN x_d END) AS x_1,
             max(CASE WHEN d = 10 THEN x_d END) AS x_10,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(term ORDER BY d)), (acc, x) -> acc + x) AS sfold
           FROM tm)
         SELECT n_depths, x_1, x_10,
           CAST(floor(sfold * 0.1 * 1000000.0) AS BIGINT) AS rbo_e6
         FROM ag""",

    "q423_fleiss_kappa" ->
      s"""WITH f AS (
           SELECT
             ${TrainingShared.keepRuleSql}
               + CAST(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS BIGINT)
               + CAST(CASE WHEN len(w) >= 15 THEN 1 ELSE 0 END AS BIGINT)
               AS k
           FROM (SELECT text, n_chars, string_split(lower(text), ' ') AS w
                 FROM documents)),
         g AS (
           SELECT count(*) AS n_items,
             CAST(sum(((k * k + (3 - k) * (3 - k) - 3) * 1000000) // 6)
               AS BIGINT) AS sp,
             CAST(sum(k) AS BIGINT) AS tot_keep
           FROM f),
         h AS (
           SELECT n_items, sp // n_items AS p_bar_e6,
             tot_keep * 1000000 // (3 * n_items) AS p_keep_e6
           FROM g),
         i AS (
           SELECT *, (p_keep_e6 * p_keep_e6
             + (1000000 - p_keep_e6) * (1000000 - p_keep_e6)) // 1000000
             AS p_e_e6
           FROM h)
         SELECT n_items, p_bar_e6, p_keep_e6, p_e_e6,
           CASE WHEN p_e_e6 < 1000000
             THEN (p_bar_e6 - p_e_e6) * 1000000 // (1000000 - p_e_e6)
             ELSE 1000000 END AS kappa_e6
         FROM i""",

    "q425_krippendorff_alpha" ->
      s"""WITH f AS (
           SELECT
             ${TrainingShared.keepRuleSql} AS r1,
             CAST(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS BIGINT) AS r2,
             CASE WHEN lang = 'en' THEN
               CAST(CASE WHEN len(w) >= 15 THEN 1 ELSE 0 END AS BIGINT)
               ELSE NULL END AS r3
           FROM (SELECT text, n_chars, lang,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         g AS (
           SELECT r1, r2, r3,
             CASE WHEN r3 IS NOT NULL THEN 3 ELSE 2 END AS m,
             r1 + r2 + coalesce(r3, 0) AS n1
           FROM f),
         h AS (SELECT *, m - n1 AS n0 FROM g),
         a AS (
           SELECT count(*) AS n_units,
             CAST(sum(m) AS BIGINT) AS n_tot,
             CAST(sum(n1) AS BIGINT) AS n1_tot,
             CAST(sum(n0) AS BIGINT) AS n0_tot,
             CAST(sum((4 * n0 * n1) // (m - 1)) AS BIGINT) AS do2
           FROM h)
         SELECT n_units, n_tot, n1_tot, n0_tot, do2,
           CASE WHEN n0_tot > 0 AND n1_tot > 0
             THEN 1000000 - do2 * (n_tot - 1) * 1000000
               // (4 * n0_tot * n1_tot)
             ELSE 1000000 END AS alpha_e6
         FROM a""",

    "q426_cochran_q" ->
      s"""WITH f AS (
           SELECT
             ${TrainingShared.keepRuleSql} AS r1,
             CAST(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS BIGINT) AS r2,
             CAST(CASE WHEN len(w) >= 15 THEN 1 ELSE 0 END AS BIGINT) AS r3
           FROM (SELECT text, n_chars, string_split(lower(text), ' ') AS w
                 FROM documents)),
         g AS (SELECT *, r1 + r2 + r3 AS r FROM f),
         a AS (
           SELECT count(*) AS n_items,
             CAST(sum(r1) AS BIGINT) AS g1,
             CAST(sum(r2) AS BIGINT) AS g2,
             CAST(sum(r3) AS BIGINT) AS g3,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(r * r) AS BIGINT) AS sum_r2
           FROM g)
         SELECT n_items, g1, g2, g3, sum_r, sum_r2,
           CASE WHEN 3 * sum_r - sum_r2 > 0
             THEN 2 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
               - (g1 + g2 + g3) * (g1 + g2 + g3)) * 1000000
               // (3 * sum_r - sum_r2)
             ELSE 0 END AS q_e6
         FROM a""",

    "q424_confident_joint" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS p1_e6,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS y
           FROM embeddings),
         e2 AS (SELECT *, 1000000 - p1_e6 AS p0_e6 FROM e),
         th AS (
           SELECT
             CAST(sum(CASE WHEN y = 1 THEN p1_e6 ELSE 0 END) AS BIGINT)
               // greatest(CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)
                 AS BIGINT), 1) AS t1_e6,
             CAST(sum(CASE WHEN y = 0 THEN p0_e6 ELSE 0 END) AS BIGINT)
               // greatest(CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)
                 AS BIGINT), 1) AS t0_e6
           FROM e2),
         p AS (
           SELECT e2.*, th.t1_e6, th.t0_e6,
             CASE WHEN p1_e6 >= t1_e6 THEN 1
                  WHEN p0_e6 >= t0_e6 THEN 0 ELSE -1 END AS pred
           FROM e2, th)
         SELECT count(*) AS n_confident,
           CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS c11,
           CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS c00,
           CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS c10,
           CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS c01,
           max(t1_e6) AS t1_e6, max(t0_e6) AS t0_e6,
           (CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT)
            + CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END)
             AS BIGINT)) * 1000000 // count(*) AS noise_rate_e6
         FROM p WHERE pred >= 0""",

    "q422_risk_coverage" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS conf_e6,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS y
           FROM embeddings),
         e2 AS (
           SELECT *,
             CAST(CASE WHEN conf_e6 >= 500000 THEN 1 ELSE 0 END
               AS BIGINT) AS pred,
             least(9, abs(conf_e6 - 500000) * 2 // 100000) AS margin_bin
           FROM e),
         e3 AS (
           SELECT margin_bin,
             CAST(CASE WHEN pred <> y THEN 1 ELSE 0 END AS BIGINT) AS err
           FROM e2),
         bins AS (
           SELECT margin_bin, count(*) AS n_b,
             CAST(sum(err) AS BIGINT) AS err_b
           FROM e3 GROUP BY 1),
         tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n FROM bins),
         cum AS (
           SELECT a.margin_bin, a.n_b, a.err_b,
             CAST(sum(b.n_b) AS BIGINT) AS cum_n,
             CAST(sum(b.err_b) AS BIGINT) AS cum_err
           FROM bins a JOIN bins b ON b.margin_bin >= a.margin_bin
           GROUP BY 1, 2, 3)
         SELECT margin_bin, n_b, err_b, cum_n, cum_err,
           cum_n * 1000000 // n AS coverage_e6,
           cum_err * 1000000 // cum_n AS sel_risk_e6,
           (cum_err * 1000000 // cum_n) * n_b // n AS aurc_term_e6
         FROM cum, tot""",

    "q415_brier_decomposition" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS conf_e6,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS y
           FROM embeddings),
         e2 AS (SELECT *, conf_e6 // 100000 AS bin FROM e),
         tot AS (
           SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS ny,
             CAST(sum(((conf_e6 - y * 1000000)
               * (conf_e6 - y * 1000000)) // 1000000) AS BIGINT) AS sb
           FROM e2),
         bins AS (
           SELECT bin, count(*) AS n_b, CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(conf_e6) AS BIGINT) AS sum_conf_e6
           FROM e2 GROUP BY 1),
         b2 AS (
           SELECT bin, n_b,
             n_pos * 1000000 // n_b AS acc_e6,
             sum_conf_e6 // n_b AS conf_mean_e6,
             n, ny, sb, ny * 1000000 // n AS ybar_e6
           FROM bins, tot),
         b3 AS (
           SELECT n, ny, sb, ybar_e6,
             CAST(sum(n_b * (((conf_mean_e6 - acc_e6)
               * (conf_mean_e6 - acc_e6)) // 1000000)) AS BIGINT) AS srel,
             CAST(sum(n_b * (((acc_e6 - ybar_e6)
               * (acc_e6 - ybar_e6)) // 1000000)) AS BIGINT) AS sres
           FROM b2 GROUP BY 1, 2, 3, 4)
         SELECT n, sb // n AS brier_e6, srel // n AS rel_e6,
           sres // n AS res_e6,
           (ybar_e6 * (1000000 - ybar_e6)) // 1000000 AS unc_e6
         FROM b3""",

    "q411_ece" ->
      """WITH e AS (
           SELECT least(999999, greatest(0, CAST(floor(
               (CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0 * 1000000.0)
               AS BIGINT))) AS conf_e6,
             CAST(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS y
           FROM embeddings),
         binned AS (
           SELECT conf_e6 // 100000 AS bin, count(*) AS n_b,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(conf_e6) AS BIGINT) AS sum_conf_e6
           FROM e GROUP BY 1),
         b2 AS (
           SELECT *, n_pos * 1000000 // n_b AS acc_e6,
             sum_conf_e6 // n_b AS conf_mean_e6,
             abs(n_pos * 1000000 // n_b - sum_conf_e6 // n_b) AS gap_e6
           FROM binned),
         tot AS (
           SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(sum(gap_e6 * n_b) AS BIGINT) AS wgap
           FROM b2)
         SELECT bin, n_b, n_pos, acc_e6, conf_mean_e6, gap_e6,
           gap_e6 * n_b * 1000 // n AS contrib_e9,
           wgap * 1000 // n AS ece_e9
         FROM b2, tot""",

    "q208_cusum" ->
      """WITH daily AS (
           SELECT event_type AS c, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m_e2
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT c, count(*) AS n, CAST(sum(m_e2) AS BIGINT) AS sx,
             CAST(sum(m_e2 * m_e2) AS BIGINT) AS sxx
           FROM daily GROUP BY 1),
         j AS (
           SELECT d.c, d.day, n, sx, sxx,
             sum(d.m_e2 * n - sx) OVER (PARTITION BY d.c ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
           FROM daily d JOIN st USING (c))
         SELECT c, day, CAST(cs AS BIGINT) AS cs,
           (abs(CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)) >
             4.0 * sqrt((CAST(sxx AS DOUBLE)
               - CAST(n AS DOUBLE)
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
               / CAST(n AS DOUBLE))) AS drift_flag
         FROM j
         WHERE (CAST(sxx AS DOUBLE)
           - CAST(n AS DOUBLE)
             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
           / CAST(n AS DOUBLE) > 0""",
    "q207_autocorr" ->
      """WITH daily AS (
           SELECT event_type AS c, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               // count(*) AS m_e2
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT c, count(*) AS n, CAST(sum(m_e2) AS BIGINT) AS sx,
             CAST(sum(m_e2 * m_e2) AS BIGINT) AS sxx
           FROM daily GROUP BY 1),
         lags AS (SELECT unnest([1, 2, 3]) AS k),
         pairs AS (
           SELECT a.c, l.k, count(*) AS n_pairs,
             CAST(sum(a.m_e2 * b.m_e2) AS BIGINT) AS cross_s,
             CAST(sum(a.m_e2) AS BIGINT) AS sh,
             CAST(sum(b.m_e2) AS BIGINT) AS st
           FROM daily a CROSS JOIN lags l
           JOIN daily b ON a.c = b.c AND a.day + l.k = b.day
           GROUP BY 1, 2)
         SELECT p.c, CAST(p.k AS BIGINT) AS k, p.n_pairs,
           CAST(floor(
             (CAST(cross_s AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
               + CAST(n_pairs AS DOUBLE)
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
             / (CAST(sxx AS DOUBLE)
               - CAST(n AS DOUBLE)
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
             * 1e6) AS BIGINT) AS acf_e6
         FROM pairs p JOIN stats s USING (c)
         WHERE CAST(sxx AS DOUBLE)
           - CAST(n AS DOUBLE)
             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0""",
    "q184_macro_f1_kappa" ->
      s"""WITH scored0 AS (
           SELECT 0 AS fold, CAST(label % 3 AS BIGINT) AS t,
             abs(CAST(floor(CAST(embedding[1] AS DOUBLE) * 10) AS BIGINT)) % 3 AS p,
             1 AS m
           FROM embeddings),
         $confusionCtes
         SELECT n, agree, k_classes, f1_sum // k_classes AS macro_f1_e6,
           CASE WHEN n * n - s_rc = 0 THEN CAST(NULL AS BIGINT)
             ELSE ((n * agree - s_rc) * 1000000) // (n * n - s_rc) END AS kappa_e6
         FROM s""",
    "q185_global_factor_index" ->
      s"""WITH $factorCtes
         SELECT day, CAST(sum(z_e3 * v) AS BIGINT) AS idx_e6
         FROM z JOIN v3 USING (c) GROUP BY 1""",
    "q188_factor_fit" ->
      s"""WITH $factorCtes,
         g AS (SELECT day, CAST(sum(z_e3 * v) AS BIGINT) // 1000 AS g_e3
               FROM z JOIN v3 USING (c) GROUP BY 1),
         zg AS (SELECT z.c, z.z_e3, g.g_e3 FROM z JOIN g USING (day)),
         szg AS (SELECT c, CAST(sum(z_e3 * g_e3) AS BIGINT) AS szg,
                   CAST(sum(z_e3 * z_e3) AS BIGINT) AS szz
                 FROM zg GROUP BY 1),
         sgg AS (SELECT CAST(sum(g_e3 * g_e3) AS BIGINT) AS sgg FROM g),
         lam AS (SELECT c, szz,
                   CASE WHEN sgg = 0 THEN CAST(NULL AS BIGINT)
                     ELSE (szg * 1000000) // sgg END AS lambda_e6
                 FROM szg, sgg),
         ssr AS (SELECT zg.c, lam.szz, lam.lambda_e6,
                   CAST(sum((zg.z_e3 - (lam.lambda_e6 * zg.g_e3) // 1000000)
                     * (zg.z_e3 - (lam.lambda_e6 * zg.g_e3) // 1000000))
                     AS BIGINT) AS ss_res
                 FROM zg JOIN lam ON zg.c = lam.c GROUP BY 1, 2, 3)
         SELECT c, lambda_e6,
           CASE WHEN szz = 0 THEN CAST(NULL AS BIGINT)
             ELSE ((szz - ss_res) * 1000000) // szz END AS r2_e6
         FROM ssr""",
    "q187_bootstrap_eval" ->
      s"""WITH scored AS (
           SELECT CAST(vec_id AS VARCHAR) AS id, CAST(label % 3 AS BIGINT) AS t,
             abs(CAST(floor(CAST(embedding[1] AS DOUBLE) * 10) AS BIGINT)) % 3 AS p
           FROM embeddings),
         hs AS (SELECT *, CAST(concat('0x', substr(md5(id), 1, 15)) AS BIGINT) AS h
                FROM scored),
         scored0 AS (
           SELECT t, p, fold,
             1 + CASE WHEN fold = h % 20 THEN 1 ELSE 0 END
               - CASE WHEN fold = (h // 20) % 20 THEN 1 ELSE 0 END AS m
           FROM hs, (SELECT unnest(range(20)) AS fold)),
         $confusionCtes
         SELECT fold, n, agree, k_classes, f1_sum // k_classes AS macro_f1_e6,
           CASE WHEN n * n - s_rc = 0 THEN CAST(NULL AS BIGINT)
             ELSE ((n * agree - s_rc) * 1000000) // (n * n - s_rc) END AS kappa_e6
         FROM s""",
    "q189_precision_at_rank_by_class" ->
      """WITH ranked AS (
           SELECT label % 5 AS klass, vec_id,
             row_number() OVER (PARTITION BY label % 5
               ORDER BY CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) DESC,
                 vec_id) AS rnk,
             (label % 2 = 1) AS pos
           FROM embeddings),
         anchors AS (SELECT * FROM (VALUES (0, 1, 8), (1, 4, 11), (2, 16, 23),
           (3, 64, 71)) t(point, lo, hi))
         SELECT CAST(klass AS BIGINT) AS klass, CAST(point AS BIGINT) AS point,
           count(*) AS n,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*) AS precision_e6
         FROM ranked JOIN anchors ON rnk BETWEEN lo AND hi
         GROUP BY 1, 2""",
    "q186_precision_at_rank" ->
      """WITH ranked AS (
           SELECT vec_id,
             row_number() OVER (
               ORDER BY CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) DESC,
                 vec_id) AS rnk,
             (label % 2 = 1) AS pos
           FROM embeddings),
         anchors AS (SELECT * FROM (VALUES (0, 1, 8), (1, 4, 11), (2, 16, 23),
           (3, 64, 71), (4, 256, 263)) t(point, lo, hi))
         SELECT CAST(point AS BIGINT) AS point, count(*) AS n,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*) AS precision_e6
         FROM ranked JOIN anchors ON rnk BETWEEN lo AND hi
         GROUP BY 1""",
    "q191_topic_sentiment" -> {
      val rawTag = normTopicExpr(
        s"list_extract([$topicTagList], CAST(doc_id % 8 AS INT) + 1)")
      val pos = "len(list_filter(string_split(lower(text), ' '), t -> list_contains(['fast','big','spark'], t)))"
      val neg = "len(list_filter(string_split(lower(text), ' '), t -> list_contains(['slow','small','filter'], t)))"
      s"""WITH tagged AS (
           SELECT lang AS country, $rawTag AS topic, doc_id % 30 AS day,
             CAST($pos - $neg AS BIGINT) AS sent,
             CASE WHEN len(string_split(lower(text), ' ')) > 0
               THEN 1 ELSE 0 END AS has_words
           FROM documents),
         dailyt AS (
           SELECT country, topic, day, count(*) AS n,
             CAST(sum(sent) AS BIGINT) AS s_sum,
             CAST(sum(has_words) AS BIGINT) AS n_articles
           FROM tagged
           WHERE topic NOT IN ('trade_extrnl', 'ecn_ind')
           GROUP BY 1, 2, 3),
         m AS (
           SELECT country, topic, day, n_articles,
             (s_sum * 1000000) // n AS m_e6
           FROM dailyt),
         st AS (
           SELECT country, topic, count(*) AS tn,
             CAST(sum(m_e6) AS BIGINT) AS s1,
             CAST(sum(m_e6 * m_e6) AS BIGINT) AS s2
           FROM m GROUP BY 1, 2)
         SELECT m.country, m.topic, m.day, m.n_articles,
           CAST(floor((m.m_e6 - CAST(s1 AS DOUBLE) / tn)
             / sqrt(CAST(s2 AS DOUBLE) / tn
                    - (CAST(s1 AS DOUBLE) / tn) * (CAST(s1 AS DOUBLE) / tn))
             * 1000) AS BIGINT) AS z_e3
         FROM m JOIN st USING (country, topic)
         WHERE CAST(s2 AS DOUBLE) / tn
           - (CAST(s1 AS DOUBLE) / tn) * (CAST(s1 AS DOUBLE) / tn) > 0"""
    },

    "q275_pass_at_k" ->
      """WITH st AS (
           SELECT user_id, count(*) AS n,
             CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
           FROM events GROUP BY 1)
         SELECT user_id, n, c,
           (c * 1000000) // n AS pass1_e6,
           CASE WHEN n - c < 5 THEN CAST(1000000 AS BIGINT)
             ELSE CAST(floor((1.0 -
               CAST(n - c AS DOUBLE) / CAST(n AS DOUBLE)
               * (CAST(n - c - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE))
               * (CAST(n - c - 2 AS DOUBLE) / CAST(n - 2 AS DOUBLE))
               * (CAST(n - c - 3 AS DOUBLE) / CAST(n - 3 AS DOUBLE))
               * (CAST(n - c - 4 AS DOUBLE) / CAST(n - 4 AS DOUBLE)))
               * 1000000.0) AS BIGINT) END AS pass5_e6
         FROM st WHERE n >= 5""",

    "q276_conformal" ->
      """WITH base AS (
           SELECT event_id, event_type,
             CAST(floor(value * 100) AS BIGINT) AS v_e2,
             event_id % 4 AS bucket
           FROM events),
         pred AS (
           SELECT event_type,
             CAST(sum(v_e2) AS BIGINT) // count(*) AS pred_e2
           FROM base WHERE bucket < 2 GROUP BY 1),
         ranked AS (
           SELECT b.event_type, abs(v_e2 - pred_e2) AS s,
             row_number() OVER (PARTITION BY b.event_type
               ORDER BY abs(v_e2 - pred_e2), event_id) AS rnk,
             count(*) OVER (PARTITION BY b.event_type) AS n_cal
           FROM base b JOIN pred USING (event_type) WHERE bucket = 2),
         qh AS (
           SELECT event_type, n_cal, s AS qhat_e2
           FROM ranked
           WHERE rnk = least(n_cal, ((n_cal + 1) * 9 + 9) // 10))
         SELECT b.event_type, q.n_cal, q.qhat_e2,
           count(*) AS n_test,
           (CAST(sum(CASE WHEN abs(v_e2 - pred_e2) <= qhat_e2
                     THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*) AS cov_e6
         FROM base b JOIN pred USING (event_type) JOIN qh q USING (event_type)
         WHERE bucket = 3
         GROUP BY 1, 2, 3""",

    "q293_decile_lift" ->
      """WITH scored AS (
           SELECT vec_id, CAST(label % 2 AS BIGINT) AS resp,
             CAST(embedding[1] AS DOUBLE) AS score
           FROM embeddings),
         ranked AS (
           SELECT resp,
             row_number() OVER (ORDER BY score DESC, vec_id) AS rnk
           FROM scored),
         tot AS (
           SELECT count(*) AS n_total, CAST(sum(resp) AS BIGINT) AS tot_resp
           FROM scored),
         dec AS (
           SELECT (rnk - 1) * 10 // n_total AS decile, n_total, tot_resp,
             count(*) AS n_rows, CAST(sum(resp) AS BIGINT) AS n_resp
           FROM ranked, tot GROUP BY 1, 2, 3),
         cum AS (
           SELECT decile, n_rows, n_resp, n_total, tot_resp,
             CAST(sum(n_rows) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rows,
             CAST(sum(n_resp) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_resp
           FROM dec)
         SELECT decile, n_rows, n_resp,
           (n_resp * 1000000) // n_rows AS rate_e6,
           (cum_resp * 1000000) // cum_rows AS cum_rate_e6,
           (((cum_resp * 1000000) // cum_rows) * 1000000)
             // ((tot_resp * 1000000) // n_total) AS cum_lift_e6
         FROM cum""")
}
