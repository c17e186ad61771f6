package graft

import graft.operators.Mmr

/** Hand-computable MMR fixture: relevance alone would rank a near-copy
  * second; the MMR objective must demote it behind a diverse candidate.
  *
  * Pool (one query, ids 1–4):
  *   rel:  1 → 100, 2 → 95, 3 → 60, 4 → 50
  *   sim:  (1,2) = 90 (near-copies), (1,3) = 10, (1,4) = 10,
  *         (2,3) = 10, (2,4) = 10, (3,4) = 80 (near-copies)
  * Greedy walk:
  *   pos 1: argmax rel = 1 (score 100)
  *   pos 2: 2 → 95−90 = 5; 3 → 60−10 = 50; 4 → 50−10 = 40 → pick 3
  *   pos 3: 2 → 95−90 = 5; 4 → 50−80 = −30 → pick 2
  *   pos 4: 4 → 50−80 = −30
  */
class MmrSpec extends SparkSpec {

  private def pairsDf = {
    val s = spark
    import s.implicits._
    val rel = Map(1L -> 100L, 2L -> 95L, 3L -> 60L, 4L -> 50L)
    val sim = Map((1L, 2L) -> 90L, (1L, 3L) -> 10L, (1L, 4L) -> 10L,
      (2L, 3L) -> 10L, (2L, 4L) -> 10L, (3L, 4L) -> 80L)
    val rows = for {
      a <- rel.keys.toSeq; b <- rel.keys.toSeq if a != b
    } yield (7L, a, b, rel(a), sim.getOrElse((a, b), sim((b, a))))
    rows.toDF("query_id", "a", "b", "rel_a_e6", "sim_e6")
  }

  test("greedy MMR demotes the near-duplicate behind a diverse candidate") {
    val out = Mmr.rerank(pairsDf, 4)
      .orderBy("pos")
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 1L, 100L), (2, 3L, 50L), (3, 2L, 5L), (4, 4L, -30L)))
  }

  test("k caps the selection and ties break to the lower id") {
    val s = spark
    import s.implicits._
    // two candidates with equal relevance and symmetric similarity: the
    // tie at pos 1 must go to the lower id
    val rows = Seq((1L, 10L, 20L, 70L, 30L), (1L, 20L, 10L, 70L, 30L))
      .toDF("query_id", "a", "b", "rel_a_e6", "sim_e6")
    val out = Mmr.rerank(rows, 1).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 10L)
  }
}
