package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationPipeline

/** End-to-end curation pipeline: each gate must fire on its designated
  * fixture doc and only that doc.
  */
class CurationPipelineSpec extends SparkSpec {

  val base = "the quick brown fox jumps over the lazy dog while " +
    "a small bird watches from the old oak tree nearby today"

  def fixture() = {
    import spark.implicits._
    Seq(
      (1L, base), // survives everything
      (2L, base), // exact duplicate -> not canonical
      (3L, base + " tomorrow"), // near-dup -> LSH component of 1
      (4L, "too short here"), // quality fail (< 10 tokens)
      (5L, "and then it was agreed that the contamination marker " +
        "phrase would be shared with an eval benchmark document")
    ).toDF("doc_id", "text")
  }

  def evalSet() = {
    import spark.implicits._
    Seq((100L, "the contamination marker phrase appears in this held " +
      "out benchmark question set")).toDF("eid", "text")
  }

  test("each gate fires on its designated doc") {
    val out = CurationPipeline.curate(fixture(), "doc_id", "text", evalSet())
      .select("doc_id", "keep_quality", "is_canonical", "rep_id", "is_kept",
        "contaminated", "split", "kept")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Boolean]("kept"), out(1L).toString)
    // exact dup: same fingerprint, higher id -> not canonical, not kept
    assert(!out(2L).getAs[Boolean]("is_canonical"))
    assert(!out(2L).getAs[Boolean]("kept"))
    // near-dup: canonical (distinct fingerprint) but LSH folds it into 1
    assert(out(3L).getAs[Boolean]("is_canonical"))
    assert(out(3L).getAs[Long]("rep_id") == 1L)
    assert(!out(3L).getAs[Boolean]("kept"))
    // quality gate
    assert(!out(4L).getAs[Boolean]("keep_quality"))
    assert(!out(4L).getAs[Boolean]("kept"))
    // decontamination: shares the marker 3-gram with the eval set
    assert(out(5L).getAs[Boolean]("contaminated"))
    assert(!out(5L).getAs[Boolean]("kept"))
    assert(!out(1L).getAs[Boolean]("contaminated"))
    // split is a deterministic label for every row
    assert(out.values.forall(r =>
      Set("train", "val", "test")(r.getAs[String]("split"))))
  }
}
