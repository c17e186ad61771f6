package graft

import graft.operators.{Eval, Labeling}

/** The reference's grid-search optimization methodology
  * (`compiled-bookdown/08-optimization.Rmd:60-216,262-268`): candidate
  * labeling parameterizations are scored by macro-F1 and Cohen's κ against
  * golden labels, and the production params are the argmax. The sweep here
  * must recover the generating params on the LabelingSpec scenario.
  */
class LabelingSweepSpec extends SparkSpec {

  // day 0 = 2024-01-01 (a Monday), UTC midnight epoch — the LabelingSpec
  // golden scenario: nightly home cluster 0, weekday work cluster 1,
  // sub-threshold errand cluster 2, one night gap to fill.
  val day0 = 1704067200L
  val p = Labeling.Params(homeWindowDays = 7, workWindowDays = 7,
    minPeriodsFrac = 0.2, workActivityAverageSec = 3600.0)

  def mkStays(): org.apache.spark.sql.DataFrame = {
    val rows = (0 until 28).flatMap { i =>
      val d = day0 + i * 86400L
      val isWeekday = ((i % 7) < 5)
      val night =
        if (i == 10) Nil
        else List((7L, 0L, d, d + 22 * 3600, d + 23 * 3600))
      val work =
        if (isWeekday) List((7L, 1L, d, d + 10 * 3600, d + 16 * 3600))
        else Nil
      val errand = List((7L, 2L, d, d + 17 * 3600, d + 17 * 3600 + 1800))
      night ++ work ++ errand
    }
    import spark.implicits._
    rows.toDF("user_id", "cluster", "day_s", "t0", "t1")
  }

  test("macroF1Kappa matches a hand-computed 2x2 example") {
    import spark.implicits._
    // cells: (a,a)=4 (a,b)=1 (b,a)=2 (b,b)=3 -> n=10, agree=7,
    // po=0.7, pe=(5*6+5*4)/100=0.5, kappa=0.4;
    // f1_a = 8/11 -> 727272, f1_b = 6/9 -> 666666, macro -> 696969
    val scored = (Seq.fill(4)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(2)(("b", "a")) ++ Seq.fill(3)(("b", "b"))).toDF("truth", "pred")
    val r = Eval.macroF1Kappa(scored, "truth", "pred").collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("agree") == 7L)
    assert(r.getAs[Long]("macro_f1_e6") == 696969L)
    assert(r.getAs[Long]("kappa_e6") == 400000L)
  }

  test("kappa is NULL when chance agreement is total") {
    import spark.implicits._
    val scored = Seq.fill(5)(("a", "a")).toDF("truth", "pred")
    val r = Eval.macroF1Kappa(scored, "truth", "pred").collect()(0)
    assert(r.getAs[Long]("macro_f1_e6") == 1000000L)
    assert(r.isNullAt(r.fieldIndex("kappa_e6")))
  }

  test("balanced bootstrap: every row contributes exactly b copies") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val scored = (1 to 97).map(i => (i.toString, "x", "y")).toDF("id", "truth", "pred")
    val boot = Eval.balancedBootstrap(scored, "id", 20)
    val perRow = boot.groupBy("id").agg(sum("m").as("total")).collect()
    assert(perRow.length == 97)
    assert(perRow.forall(_.getAs[Long]("total") == 20L))
    // and the doubling actually happens for some rows (fd != fz usually)
    assert(boot.where(col("m") === 2L).count() > 0)
  }

  test("bootstrap sweep separates generating params from a broken threshold") {
    val stays = mkStays()
    val golden = Labeling.labelStays(stays, p)
      .select("user_id", "cluster", "day_s", "t0", "location_type")
    val res = Labeling.sweepWithBootstrap(stays, golden,
      Seq(p, p.copy(workActivityAverageSec = 100.0)), b = 10)
    val (trueFolds, wrongFolds) = (res(0)._2, res(1)._2)
    assert(trueFolds.size == 10 && wrongFolds.size == 10)
    // true params fit the golden set perfectly in EVERY resample; the
    // broken threshold's best fold stays strictly below their worst
    assert(trueFolds.forall(_ == 1000000L), trueFolds.toString)
    assert(wrongFolds.max < trueFolds.min, s"$wrongFolds vs $trueFolds")
  }

  test("sweep recovers the generating params as the strict argmax") {
    val stays = mkStays()
    val golden = Labeling.labelStays(stays, p)
      .select("user_id", "cluster", "day_s", "t0", "location_type")
    val grid = Seq(
      p,
      // errand cluster (30 min/day) crosses the threshold -> spurious W
      p.copy(workActivityAverageSec = 100.0),
      // rolling window never fully warm before the gap -> H starved early
      p.copy(minPeriodsFrac = 1.0),
      // night definition misses the 22:00-23:00 stay -> no homes at all
      p.copy(startHourDay = 3, endHourDay = 23))
    val scored = Labeling.sweep(stays, golden, grid)
    assert(scored.head._1 == p)
    assert(scored.head._2 == 1000000L, s"true params not perfect: ${scored.head}")
    assert(scored.head._3.contains(1000000L))
    scored.tail.foreach { case (pp, f1, _) =>
      assert(f1 < 1000000L, s"$pp should degrade macro-F1 but scored $f1")
    }
  }
}
