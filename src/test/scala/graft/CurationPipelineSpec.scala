package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationPipeline

/** End-to-end curation pipeline: each gate must fire on its designated
  * fixture doc and only that doc, the audit trail must keep every input
  * row, and a plain unique document (LSH singleton) must survive.
  */
class CurationPipelineSpec extends SparkSpec {

  val base = "the quick brown fox jumps over the lazy dog while " +
    "a small bird watches from the old oak tree nearby today"

  def fixture() = {
    import spark.implicits._
    Seq(
      (1L, base), // survives everything (LSH component rep)
      (2L, base), // exact duplicate -> not canonical
      (3L, base + " tomorrow"), // near-dup -> LSH component of 1
      (4L, "too short here"), // quality fail (< 10 tokens)
      (5L, "and then it was agreed that the contamination marker " +
        "phrase would be shared with an eval benchmark document"),
      (6L, "meanwhile the annual report of the harvest describes a rise " +
        "in volumes across several northern valleys and remote farms")
    ).toDF("doc_id", "text")
  }

  def evalSet() = {
    import spark.implicits._
    Seq((100L, "the contamination marker phrase appears in this held " +
      "out benchmark question set")).toDF("eid", "text")
  }

  test("each gate fires on its designated doc; singletons survive") {
    val out = CurationPipeline.curate(fixture(), "doc_id", "text", evalSet())
      .select("doc_id", "keep_quality", "is_canonical", "rep_id", "is_kept",
        "contaminated", "split", "kept")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 6) // audit trail: one row per input row

    assert(out(1L).getAs[Boolean]("kept"), out(1L).toString)
    // exact dup: not canonical, and rep_id traces through its canonical
    // to the surviving representative
    assert(!out(2L).getAs[Boolean]("is_canonical"))
    assert(out(2L).getAs[Long]("rep_id") == 1L)
    assert(!out(2L).getAs[Boolean]("kept"))
    // near-dup: canonical (distinct fingerprint) but LSH folds it into 1
    assert(out(3L).getAs[Boolean]("is_canonical"))
    assert(out(3L).getAs[Long]("rep_id") == 1L)
    assert(!out(3L).getAs[Boolean]("kept"))
    // quality gate
    assert(!out(4L).getAs[Boolean]("keep_quality"))
    assert(!out(4L).getAs[Boolean]("kept"))
    // decontamination: 2 of 15 distinct trigrams shared (>= 10%)
    assert(out(5L).getAs[Boolean]("contaminated"))
    assert(!out(5L).getAs[Boolean]("kept"))
    assert(!out(1L).getAs[Boolean]("contaminated"))
    // unique doc with no duplicate partner anywhere: its own rep, kept
    assert(out(6L).getAs[Boolean]("kept"), out(6L).toString)
    assert(out(6L).getAs[Long]("rep_id") == 6L)
    // split is a deterministic label for every row
    assert(out.values.forall(r =>
      Set("train", "val", "test")(r.getAs[String]("split"))))
  }

  test("exciseKept: spans excised among kept rows only, dropped docs cast no shadow") {
    import spark.implicits._
    // Docs 1 and 2 are unique (kept) and share one 6-token run ending in
    // a common "the" — doc 1 holds the canonical occurrences, so ONLY
    // doc 2 is trimmed (two overlapping duplicated 6-grams union to
    // positions 5..11). Doc 0 fails quality (zero stopwords; enough
    // unique filler that it is NOT an LSH near-dup of doc 1) and doc 3
    // is an exact duplicate: both are DROPPED, and both contain the
    // shared run — if excision mistakenly ran over the full report,
    // doc 0's lower (id, pos) would steal canonicality and doc 1 would
    // be trimmed too.
    val shared = "red orange yellow green blue violet"
    // docs 1/2 carry 16 unique tail tokens each so their shared-run
    // Jaccard (~0.1) stays safely below LSH band-collision range —
    // shorter versions of this fixture deterministically collided and
    // near-dup dedup folded doc 2 into doc 1 before excision ran
    val tail1 = "mercury venus earth mars jupiter saturn uranus " +
      "neptune ceres pluto eris haumea makemake sedna quaoar orcus"
    val tail2 = "maple oak birch cedar willow aspen spruce poplar " +
      "alder hazel rowan yew juniper holly elm ash"
    val docs = Seq(
      (0L, shared + " zirconium hafnium tantalum rhenium osmium " +
        "iridium platinum aurum plumbum bismuth polonium astatine " +
        "radon francium"),
      (1L, "alpha beta gamma delta " + shared + " the omega psi chi " + tail1),
      (2L, "one two three four " + shared + " the nine ten eleven " + tail2),
      (3L, "alpha beta gamma delta " + shared + " the omega psi chi " + tail1)
    ).toDF("doc_id", "text")
    val report = CurationPipeline.curate(
      docs, "doc_id", "text", Seq.empty[(Long, String)].toDF("eid", "text"))
    val out = CurationPipeline.exciseKept(report, "doc_id", "text", 6)
      .select("doc_id", "n_tokens", "n_kept_tokens", "n_excised",
        "text_excised")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out.keySet == Set(1L, 2L)) // exactly the kept rows
    assert(out(1L) == ((30L, 30L, 0L,
      "alpha beta gamma delta red orange yellow green blue violet the " +
        "omega psi chi " + tail1)))
    assert(out(2L) == ((30L, 23L, 7L,
      "one two three four nine ten eleven " + tail2)))
  }

  test("NULL text rows stay in the report as their own empty-text group") {
    import spark.implicits._
    val docs = Seq((1L, Option(base)), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    val out = CurationPipeline.curate(docs, "doc_id", "text", evalSet())
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 3) // no row lost to a NULL-key join
    // the two null-text rows form one exact-dup group, fail quality
    assert(out(2L).getAs[Boolean]("is_canonical"))
    assert(!out(3L).getAs[Boolean]("is_canonical"))
    assert(!out(2L).getAs[Boolean]("keep_quality"))
    assert(!out(2L).getAs[Boolean]("kept"))
  }

  test("exciseKept releases ALL storage under the harness contract " +
      "(clearCache + RDD unpersist — nothing survives the release)") {
    import spark.implicits._
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val docs = (0L until 20L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta token$i the and of"))
      .toDF("doc_id", "text")
    val report = CurationPipeline.curate(
      docs, "doc_id", "text", Seq.empty[(Long, String)].toDF("eid", "text"))
    CurationPipeline.exciseKept(report, "doc_id", "text", 6).collect()
    // the operator MUST hold the kept slice while alive (its lineage is
    // the whole curate pipeline — LSH + CC — read four times downstream)…
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    // …and the documented release is the Verify/Bench two-step, after
    // which nothing lingers
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.keys.mkString(", "))
  }

  test("exciseKept honors a caller-selected storage level (DISK_ONLY, " +
      "the corpus-scale setting) and still releases under the contract") {
    import org.apache.spark.storage.StorageLevel
    import spark.implicits._
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val docs = (0L until 20L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta token$i the and of"))
      .toDF("doc_id", "text")
    def report() = CurationPipeline.curate(
      docs, "doc_id", "text", Seq.empty[(Long, String)].toDF("eid", "text"))
    val dflt = CurationPipeline
      .exciseKept(report(), "doc_id", "text", 6)
      .orderBy("doc_id").collect().map(_.toSeq)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // a fresh report after the release — the contract frees EVERYTHING,
    // including the CC lineage cuts a pre-release DataFrame still
    // references, so released frames are not reusable (by design)
    val disk = CurationPipeline
      .exciseKept(report(), "doc_id", "text", 6, StorageLevel.DISK_ONLY)
    assert(disk.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      dflt.toSeq) // storage level is an execution hint, never a result
    // the held kept-slice block really is the requested level (CC's
    // lineage-cut blocks may coexist at their own default level — the
    // operator only owns the slice's persist)
    val levels = spark.sparkContext.getPersistentRDDs.values
      .map(_.getStorageLevel).toSet
    assert(levels.contains(StorageLevel.DISK_ONLY), levels.toString)
    // …and the documented release path clears it like the default
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.keys.mkString(", "))
  }
}
