package graft

import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Composition-level checks for EntityResolution.resolve: planted
  * near-duplicate chains close transitively into one entity, distinct
  * names stay singletons, and blocking confines candidate pairs.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("a planted A~B~C chain resolves to one entity labeled by min id") {
    // B is close to both A and C; A vs C alone may be under threshold —
    // transitivity must still pull all three together
    val recs = Seq(
      (1L, "jonathan smithers", 0L),
      (2L, "jonathan smither", 0L),
      (3L, "jonathan smithe", 0L),
      (4L, "completely different", 0L),
      (5L, "unrelated person", 1L))
      .toDF("id", "name", "bkt")
    val out = EntityResolution.resolve(recs, "id", "name", "bkt", 950000L)
      .select("id", "entity", "is_canonical", "n_entity")
      .as[(Long, Long, Boolean, Long)].collect().sortBy(_._1)
    assert(out.filter(_._1 <= 3).forall(r => r._2 == 1L && r._4 == 3L), out.toSeq)
    assert(out.find(_._1 == 1L).get._3, "min id is canonical")
    assert(!out.find(_._1 == 2L).get._3)
    assert(out.find(_._1 == 4L).get._2 == 4L, "singleton is its own entity")
    assert(out.find(_._1 == 4L).get._4 == 1L)
  }

  test("identical names in DIFFERENT blocks never match (blocking bounds " +
      "the pair space by design)") {
    val recs = Seq(
      (1L, "same name", 0L), (2L, "same name", 1L))
      .toDF("id", "name", "bkt")
    val out = EntityResolution.resolve(recs, "id", "name", "bkt", 900000L)
      .select("id", "entity").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("every input row survives to the output exactly once") {
    val recs = (1L to 40L).map(i => (i, s"name $i", i % 4)).toDF("id", "name", "bkt")
    val out = EntityResolution.resolve(recs, "id", "name", "bkt", 999999L)
    assert(out.count() == 40L)
    assert(out.select(countDistinct("id")).as[Long].head() == 40L)
  }
}
