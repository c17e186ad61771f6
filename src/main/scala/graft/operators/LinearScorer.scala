package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex-feature linear classifier scoring — the reference's expansion
  * step (`twitter-analytics/code/3-model_evaluation/expansion/preliminary/
  * lr_prediction.py:22-27`): build a 0/1 presence vector over a fixed
  * regex list per document, push it through K trained logistic models,
  * and keep `predict_proba > 0.5`.
  *
  * Model TRAINING stays out of engine scope (the F10 posture — the
  * reference trains scikit-learn models offline); the engine work is:
  *   - feature extraction at scan speed: codegen `RLIKE` / `Contains`
  *     columns, map-side only, no shuffle, one pass per document;
  *   - the model application: the K weight vectors ride a broadcast
  *     dim frame, and the logit is EXACT integer fixed point
  *     (`logit_e6 = Σ w_e6[i]·x[i] + b_e6` via `zip_with` + `aggregate`,
  *     all BIGINT), so the 0.5 probability cut is the exact integer
  *     test `logit_e6 > 0` — no sigmoid, no float, no cross-engine
  *     rounding surface.
  *
  * Scale shape: documents × (tiny broadcast model dim) — a map-only
  * crossJoin fan-out of K rows per doc; nothing shuffles, so this tags
  * 100 TB at scan speed like q210's seedlist baseline.
  */
object LinearScorer {

  /** Score `df` against every model row. `models` must have columns
    * (model_id, w_e6: array<long> — one weight per regex then per
    * ngram, in order — and b_e6: long). Returns one row per
    * (input row, model) with `logit_e6` and the thresholded `pred`.
    */
  def score(df: DataFrame, textCol: Column, regexes: Seq[String],
      ngrams: Seq[String], models: DataFrame, keyCols: Column*): DataFrame = {
    val tl = lower(textCol)
    val present = regexes.map(p => tl.rlike(p)) ++ ngrams.map(p => tl.contains(p))
    val x = array(present.map(_.cast("long")): _*)
    df.select(keyCols :+ x.as("x"): _*)
      .crossJoin(broadcast(models))
      .withColumn("logit_e6",
        aggregate(zip_with(col("w_e6"), col("x"), (w, xi) => w * xi),
          lit(0L), (acc, v) => acc + v) + col("b_e6"))
      .withColumn("pred", (col("logit_e6") > 0).cast("long"))
      .drop("x", "w_e6", "b_e6")
  }
}
