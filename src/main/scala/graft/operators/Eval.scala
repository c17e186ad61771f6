package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-class classification eval aggregates — macro-F1 and Cohen's κ in
  * exact integer micro-units. This is the reference's grid-search scoring
  * pair: every labeling-parameter combination is scored by macro-F1 and κ
  * against hand labels (`compiled-bookdown/08-optimization.Rmd:60-216`),
  * and the production parameters are the argmax
  * (`08-optimization.Rmd:262-268`).
  *
  * Everything reduces over the K×K confusion-cell frame (K = number of
  * classes), so after ONE groupBy over the scored pairs all remaining work
  * touches ≤ K² rows:
  *
  *  - per-class F1 = 2·tp / (row + col), because fp = col − tp and
  *    fn = row − tp make 2·tp + fp + fn = row + col;
  *  - macro-F1 = mean of per-class F1 over the UNION of truth and
  *    predicted classes (sklearn/caret convention: a class predicted but
  *    never true contributes F1 = 0 to the mean; its row·col product is
  *    0 so κ below is unaffected);
  *  - κ = (n·agree − Σ row_k·col_k) / (n² − Σ row_k·col_k), the
  *    common-denominator identity for (po − pe)/(1 − pe) — a ratio of two
  *    exact integers, so the value is merge-order-proof and
  *    oracle-checkable.
  *
  * Int64 envelope: the e6-scaled κ numerator needs n²·10⁶ < 2⁶³, i.e.
  * n ≲ 3·10⁶ scored rows. That fits the operator's purpose — eval sets
  * are hand-labeled and small by nature (the reference's is ~3k stays).
  * Scoring a >3M-row eval set would need the po/pe double form instead.
  */
object Eval {

  /** Grouped, weighted form — one confusion-cell reduction per `foldCol`
    * value, each scored row counting `weightCol` times (bootstrap
    * multiplicities; pass a lit(1) column for plain counts). Returns one
    * row per (fold, truth-margin class): tp, row_n, col_n, f1_e6.
    */
  def perClassF1ByFold(scored: DataFrame, foldCol: String,
      truthCol: String, predCol: String, weightCol: String): DataFrame = {
    val cells = scored
      .groupBy(col(foldCol).as("g"), col(truthCol).as("t"), col(predCol).as("p"))
      .agg(sum(col(weightCol).cast("long")).as("c"))
    // The class set is the UNION of truth and predicted labels
    // (sklearn/caret macro convention) — a class that is predicted but
    // never true gets row_n = 0 and contributes F1 = 0 to the macro mean.
    // Each confusion cell (t, p, c) contributes c to class t's truth
    // margin and to class p's predicted margin (and to tp when t = p), so
    // ONE 2-way explode + ONE keyed aggregation over the ≤ K² cells
    // replaces the former 3-groupBy + full/left-join margin assembly —
    // same output, 4 fewer stages per fold batch (this is the per-grid-
    // cell inner loop of `Labeling.sweep`, where stage latency dominates:
    // q184 0.45→0.29 s class of win at sf0.1). Zero-weight rows can make
    // both margins 0, so the division keeps its guard.
    cells
      .select(col("g"), explode(array(
        struct(col("t").as("k"), col("c").as("row_n"),
          lit(0L).as("col_n"),
          when(col("t") === col("p"), col("c")).otherwise(0L).as("tp")),
        struct(col("p").as("k"), lit(0L).as("row_n"),
          col("c").as("col_n"), lit(0L).as("tp")))).as("x"))
      .groupBy(col("g"), col("x.k").as("k"))
      .agg(sum("x.row_n").as("row_n"), sum("x.col_n").as("col_n"),
        sum("x.tp").as("tp"))
      .select(col("g"), col("k"), col("row_n"), col("col_n"), col("tp"),
        expr("CASE WHEN row_n + col_n = 0 THEN 0 " +
          "ELSE (2 * tp * 1000000) div (row_n + col_n) END").as("f1_e6"))
  }

  /** Per-fold summary: (fold, n, agree, k_classes, macro_f1_e6, kappa_e6).
    * kappa_e6 is NULL when the κ denominator n² − Σ row·col is 0 (all
    * mass in one truth×pred cell — chance agreement is total and κ is
    * undefined); both engines agree on the guard.
    */
  def macroF1KappaByFold(scored: DataFrame, foldCol: String,
      truthCol: String, predCol: String, weightCol: String): DataFrame =
    perClassF1ByFold(scored, foldCol, truthCol, predCol, weightCol)
      .groupBy("g")
      .agg(
        sum("row_n").as("n"), // every scored row has a truth class
        sum("tp").as("agree"),
        count(lit(1)).as("k_classes"),
        sum("f1_e6").as("f1_sum"),
        sum(col("row_n") * col("col_n")).as("s_rc"))
      .select(col("g").as(foldCol), col("n"), col("agree"), col("k_classes"),
        expr("f1_sum div k_classes").as("macro_f1_e6"),
        expr("CASE WHEN n * n - s_rc = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE ((n * agree - s_rc) * 1000000) div (n * n - s_rc) END")
          .as("kappa_e6"))

  /** One row per truth-margin class: tp, row_n (truth count), col_n
    * (predicted count), f1_e6. `truthCol`/`predCol` may be any orderable,
    * group-able type (string labels, ints).
    */
  def perClassF1(scored: DataFrame, truthCol: String, predCol: String): DataFrame =
    perClassF1ByFold(scored.withColumn("_g", lit(0)).withColumn("_w", lit(1L)),
      "_g", truthCol, predCol, "_w").drop("g")

  /** Single-row summary of `perClassF1` (see `macroF1KappaByFold`). */
  def macroF1Kappa(scored: DataFrame, truthCol: String, predCol: String): DataFrame =
    macroF1KappaByFold(
      scored.withColumn("_g", lit(0)).withColumn("_w", lit(1L)),
      "_g", truthCol, predCol, "_w").drop("_g")

  /** Deterministic BALANCED bootstrap multiplicities — the resampling
    * design of the reference's 100-fold eval
    * (`08-optimization.Rmd:262-268`), made engine-replayable: across the
    * `b` folds each row contributes EXACTLY b copies in total (balanced),
    * appearing twice in one content-chosen fold, zero times in another,
    * once everywhere else (when the two chosen folds collide the row is
    * simply once-per-fold). Output = input × b rows with an `m` weight in
    * {0,1,2}, m > 0 rows only. `idCol` must be a string column uniquely
    * identifying the row (hash seed).
    */
  def balancedBootstrap(scored: DataFrame, idCol: String, b: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val folds = broadcast((0 until b).map(_.toLong).toDF("fold"))
    scored
      .withColumn("_h", graft.functions.TextFunctions.hash60(col(idCol)))
      .withColumn("fd", col("_h") % b) // the doubled fold
      .withColumn("fz", expr(s"(_h div $b) % $b")) // the zeroed fold
      .crossJoin(folds)
      .withColumn("m",
        lit(1L) + when(col("fold") === col("fd"), 1L).otherwise(0L)
          - when(col("fold") === col("fz"), 1L).otherwise(0L))
      .where(col("m") > 0)
      .drop("_h", "fd", "fz")
  }
}
