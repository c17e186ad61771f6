package graft

/** The driver's t1 smoke gate: `SparkEntry.entry` must return rows on
  * sf0.001, and every inventory query must have either an oracle or be a
  * deliberate rows-only check.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle coverage: every oracle key is a query; rows-only set is the known one") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), (os -- qs).toString)
    val rowsOnly = qs -- os
    assert(rowsOnly == Set("q40_sample_seeded", "q41_stratified_sample",
      "q42_rand_jitter"),
      rowsOnly.toString)
  }

  test("query names are unique across files (no map-key collisions)") {
    import graft.queries._
    val sizes = Seq(Relational.queries, Sources.queries, Geo.queries,
      Mobility.queries, Training.queries, Media.queries, Analysis.queries,
      Warehouse.queries, StatsTests.queries, StatsSeries.queries,
      StatsProcess.queries, StatsDesign.queries, Evals.queries)
      .map(_.size)
    assert(sizes.sum == SparkEntry.queries.size,
      s"collision: ${sizes.sum} vs ${SparkEntry.queries.size}")
  }
}
