package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Margin-ratio criterion (q352): the Artetxe-Schwenk ratio margin must
  * accept genuinely isolated close pairs and reject hub pairs — a vector
  * moderately close to EVERYTHING has a high neighborhood mean, so its
  * ratio sits at ~1 even though its raw cosine clears any absolute cut.
  */
class MarginRatioSpec extends SparkSpec {

  test("hub pairs score below 1.0; within-cluster pairs score above") {
    import spark.implicits._
    // Two tight clusters + one hub between them, all one IVF cell.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.998f, 0.01f), 0),
      (2L, Array(0.996f, 0.02f), 0),
      (3L, Array(0.994f, 0.03f), 0),
      (4L, Array(0.0f, 1.0f), 0),
      (5L, Array(0.01f, 0.998f), 0),
      (6L, Array(0.02f, 0.996f), 0),
      (7L, Array(0.03f, 0.994f), 0),
      (8L, Array(0.705f, 0.709f), 0) // the hub
    ).toDF("vec_id", "embedding", "label")
    val scored = Similarity.marginRatio(vecs, 200L, 4)
    val accepted = scored.where(col("margin_e6") >= 1000000L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // No accepted pair touches the hub.
    assert(accepted.forall { case (a, b) => a != 8L && b != 8L },
      s"hub pair accepted: $accepted")
    // Within-cluster neighbors are accepted.
    assert(accepted.contains((0L, 1L)) && accepted.contains((4L, 5L)),
      s"true pairs missing: $accepted")
    // And the ordering is strict: a true pair out-margins every hub pair.
    val margins = scored.select("id_a", "id_b", "margin_e6").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val hubMax = margins.collect { case ((a, b), m) if a == 8L || b == 8L => m }
    assert(hubMax.nonEmpty && margins((0L, 1L)) > hubMax.max)
  }
}
