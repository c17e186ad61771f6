package graft

import org.apache.spark.sql.functions._
import graft.queries.Evals

/** Unit pins for the q188 factor fit — the oracle can only prove both
  * engines agree, not that the units are right (a shared 1000× scale bug
  * once made R² ≈ 0 on both sides while parity stayed green), so the
  * identity and half-loading cases pin the absolute values.
  */
class FactorSpec extends SparkSpec {

  test("K=1 identity fit: g == z gives lambda = 1 and R^2 = 1 exactly") {
    import spark.implicits._
    val z = Seq(("a", 1L, 2000L), ("a", 2L, -1500L), ("a", 3L, 700L),
      ("a", 4L, -1200L)).toDF("c", "day", "z_e3")
    val g = z.select(col("day"), col("z_e3").as("g_e3"))
    val r = Evals.factorFit(z, g).collect()(0)
    assert(r.getAs[Long]("lambda_e6") == 1000000L)
    assert(r.getAs[Long]("r2_e6") == 1000000L)
  }

  test("half-scale series loads at lambda = 0.5 with perfect fit") {
    import spark.implicits._
    val g0 = Seq((1L, 2000L), (2L, -1600L), (3L, 800L), (4L, -1200L))
    val z = g0.map { case (d, v) => ("half", d, v / 2) }.toDF("c", "day", "z_e3")
    val g = g0.toDF("day", "g_e3")
    val r = Evals.factorFit(z, g).collect()(0)
    assert(r.getAs[Long]("lambda_e6") == 500000L)
    assert(r.getAs[Long]("r2_e6") == 1000000L)
  }

  test("degenerate factor (all-zero g) yields NULL lambda and R^2 intact guard") {
    import spark.implicits._
    val z = Seq(("a", 1L, 100L), ("a", 2L, -100L)).toDF("c", "day", "z_e3")
    val g = Seq((1L, 0L), (2L, 0L)).toDF("day", "g_e3")
    val r = Evals.factorFit(z, g).collect()(0)
    assert(r.isNullAt(r.fieldIndex("lambda_e6")))
  }
}
