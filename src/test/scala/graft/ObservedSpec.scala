package graft

import org.apache.spark.sql.functions._
import graft.operators.Observed

/** The observe-API constraint metrics: collected during a single real
  * action on the frame, agreeing with a direct aggregate pass, and
  * pass-through (the observed frame's rows are unchanged).
  */
class ObservedSpec extends SparkSpec {

  test("metrics ride the consuming action and match a direct aggregate") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (observed, obs) = Observed.corpusMetrics(docs)

    // the ONLY action: a downstream count (stands in for the real write)
    val nRows = observed.count()
    val m = obs.get

    val direct = docs.agg(
      count(lit(1)).as("n"), count(col("text")).as("n_text"),
      sum(when(col("n_chars").between(1L, 100000L), 1L).otherwise(0L))
        .as("n_chars_ok"),
      sum(when(col("lang").isin("en", "es", "fr", "de", "zh"), 1L)
        .otherwise(0L)).as("n_lang_ok"),
      min(col("n_chars")).as("min_chars"),
      approx_count_distinct(col("doc_id"), 0.05).as("approx_ids")).head

    assert(m("n") == direct.getLong(0))
    assert(m("n") == nRows) // pass-through: no rows added or dropped
    assert(m("n_text") == direct.getLong(1))
    assert(m("n_chars_ok") == direct.getLong(2))
    assert(m("n_lang_ok") == direct.getLong(3))
    assert(m("min_chars") == direct.getLong(4))
    assert(m("approx_ids") == direct.getLong(5)) // same sketch, same result
  }
}
