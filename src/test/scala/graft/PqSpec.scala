package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product-quantization hand fixtures.
  *
  * With at most 16 vectors, the vec_id % 16 Lloyd seeding puts every
  * vector in its own singleton cluster, so each block centroid IS the
  * vector's block — codes are lossless and the asymmetric distance
  * equals the exact integer squared L2. That exactness property checks
  * the whole pipeline (micro-unit quantization, block split, centroid
  * build, code assignment, LUT join, ADC sum) with no tolerance.
  *
  * A second fixture forces two vectors into ONE cluster (ids 0 and 16
  * share seed cell 0) and hand-computes the truncated-mean centroid and
  * the resulting ADC distances.
  */
class PqSpec extends SparkSpec {

  /** Per-block-constant embedding: value `v` in every one of the 64 dims. */
  private def const(v: Float) = Array.fill(64)(v)

  private def embs(rows: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
  }

  test("<= 16 vectors: singleton clusters make ADC exact integer L2") {
    val e = embs(Seq(
      0L -> const(0.0f), 1L -> const(1.0f), 2L -> const(3.0f),
      3L -> const(0.25f), 4L -> const(-2.0f)))
    val out = Similarity.pqTopK(e, Seq(0L), 4).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // exact squared L2 from v=0 in micro-units: 64 * (v * 1e6)^2
    def d(v: Double) = (64L * (v * 1e6).toLong * (v * 1e6).toLong)
    assert(out.toSeq == Seq(
      3L -> d(0.25), 1L -> d(1.0), 4L -> d(2.0), 2L -> d(3.0)))
  }

  test("shared cluster: truncated-mean centroid decides the ADC distance") {
    // ids 0 and 16 share seed cell 0; their blocks are 1.0 and 2.0, so
    // the cell-0 centroid is trunc((1e6 + 2e6) / 2) = 1_500_000 per dim.
    // Query id 1 is constant 0, so its LUT distance to cell 0 is
    // 16 * 1_500_000^2 per block — and BOTH members of the cell rank at
    // that identical ADC distance, tie-broken by vec_id.
    val e = embs(Seq(
      0L -> const(1.0f), 16L -> const(2.0f), 1L -> const(0.0f)))
    val out = Similarity.pqTopK(e, Seq(1L), 2).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    val cellDist = 64L * 1500000L * 1500000L
    assert(out.toSeq == Seq(0L -> cellDist, 16L -> cellDist))
  }
}
