package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** End-to-end training-corpus curation — the composition a user migrating
  * from the reference's per-script pipelines actually runs, chaining the
  * engine's existing stages in the canonical order (each stage is its own
  * oracle-checked operator; this is thin glue plus a per-stage audit
  * trail):
  *
  *  1. quality + language gate (q53/q52 logic);
  *  2. exact dedup keep-one by normalized content fingerprint (q56);
  *  3. near-dup keep-one via MinHash-LSH + distributed connected
  *     components (q59/q76);
  *  4. benchmark decontamination by broadcast eval-set shingles (q107);
  *  5. deterministic content-hash train/val/test split (q108).
  *
  * Every decision is recorded as a flag column rather than dropping rows,
  * so the output doubles as the curation report (`kept` = survives all
  * gates; filter on it for the training corpus). All stages are map-side
  * or key-shuffle shapes — the pipeline inherits each operator's 100-TB
  * story, and nothing here adds a shuffle beyond them.
  */
object CurationPipeline {

  /** `docs`: (idCol, textCol, ...). `evalSet`: benchmark texts to
    * decontaminate against (same textCol), or empty. Returns input rows +
    * (lang, keep_quality, is_canonical, rep_id, is_kept, contaminated,
    * split, kept).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      evalSet: DataFrame, minSharedShingles: Int = 1): DataFrame = {
    val id = col(idCol); val text = col(textCol)

    // 1. quality + language (flags, not filters — the report keeps rows)
    val scored = docs
      .withColumn("lang", TextFunctions.langId(text))
      .withColumn("keep_quality",
        TextFunctions.qualityScore(text).getField("keep"))

    // 2. exact dedup: canonical row per normalized fingerprint
    val canon = scored
      .select(TextFunctions.fingerprint(text).as("fp"), id.as("canon_id"))
      .groupBy("fp").agg(min("canon_id").as("canon_id"))
    val exact = scored
      .withColumn("fp", TextFunctions.fingerprint(text))
      .join(canon, "fp")
      .withColumn("is_canonical", id === col("canon_id"))
      .drop("fp", "canon_id")

    // 3. near-dup keep-one over the exact-canonical survivors only (the
    // standard ordering: exact dedup first shrinks the LSH input)
    val near = Dedup.dedupNearDupes(
      exact.where(col("is_canonical")).select(idCol, textCol),
      idCol, textCol)
      .select(id, col("rep_id"), col("is_kept"))
    val withNear = exact.join(near, Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), id))
      .withColumn("is_kept", coalesce(col("is_kept"), lit(false)))

    // 4. decontamination: benchmark 3-gram shingles broadcast to the
    // corpus scan — the big side never shuffles (q107 shape)
    val bench = evalSet
      .where(size(TextFunctions.tokens(text)) >= 3)
      .select(explode(array_distinct(Dedup.shingles(text, 3))).as("sh"))
      .distinct()
    val hits = withNear
      .where(size(TextFunctions.tokens(text)) >= 3)
      .select(id.as("h_id"),
        explode(array_distinct(Dedup.shingles(text, 3))).as("sh"))
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .groupBy("h_id").agg(count(lit(1)).as("n_shared"))
    val decon = withNear.join(hits, id === col("h_id"), "left")
      .withColumn("contaminated",
        coalesce(col("n_shared"), lit(0L)) >= minSharedShingles)
      .drop("h_id", "n_shared")

    // 5. deterministic content-hash split (reshard-stable, q108 shape)
    decon
      .withColumn("split",
        when(TextFunctions.hash60(text) % 100 < 80, "train")
          .when(TextFunctions.hash60(text) % 100 < 90, "val")
          .otherwise("test"))
      .withColumn("kept",
        col("keep_quality") && col("is_kept") && !col("contaminated"))
  }
}
