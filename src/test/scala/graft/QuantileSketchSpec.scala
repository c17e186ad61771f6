package graft

import org.apache.spark.sql.functions._

/** MRL quantile-sketch properties: exact below capacity, the
  * deterministic rank-error guarantee above it (under Spark's real
  * partial/merge execution), and weight conservation.
  */
class QuantileSketchSpec extends SparkSpec {

  private def deciles(df: org.apache.spark.sql.DataFrame, k: Int): Array[Long] = {
    val row = df.agg(org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.QuantileSketchAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(col("v")), k)
        .toAggregateExpression()).as("e")).head()
    row.getSeq[Long](0).toArray
  }

  test("below capacity the sketch is exact: deciles of 0..99") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).toDF("v").repartition(4)
    val est = deciles(df, 1024)
    // target rank for decile d over n=100 is 10d; value = rank - 1
    assert(est.toSeq == (1 to 9).map(d => 10L * d - 1))
  }

  test("above capacity every decile estimate is within the MRL band " +
      "(adversarial sorted input, multiple partitions)") {
    val s = spark
    import s.implicits._
    val n = 200000L
    val k = 256
    val df = (0L until n).toDF("v").repartition(8)
    val est = deciles(df, k)
    val levels = math.ceil(math.log(2.0 * n / k) / math.log(2.0)).toLong + 2
    val band = 2 * levels * n / (k - 1) + k
    for (d <- 1 to 9) {
      val target = d * n / 10
      val rank = est(d - 1) + 1 // v = 0..n-1, rank of value v is v+1
      assert(math.abs(rank - target) <= band,
        s"decile $d: rank $rank vs target $target exceeds band $band")
    }
  }

  test("duplicates and skew: constant-heavy stream stays in band") {
    val s = spark
    import s.implicits._
    // 90% zeros, 10% spread tail — the degenerate shape that breaks
    // naive samplers
    val vals = Seq.fill(9000)(0L) ++ (1L to 1000L).map(_ * 7L)
    val df = vals.toDF("v").repartition(6)
    val est = deciles(df, 128)
    // deciles 1..9 of 10000 rows: ranks 1000..9000; zeros cover ranks
    // 1..9000, so every decile estimate must be 0
    assert(est.toSeq.forall(_ == 0L), est.toSeq.toString)
  }
}
