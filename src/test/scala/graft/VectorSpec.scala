package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The native loop dot product: value parity with an explicit chain,
  * mixed element types, SQL surface, null propagation.
  */
class VectorSpec extends SparkSpec {

  test("graft_dot equals the explicit left-associative chain bit-for-bit") {
    import spark.implicits._
    val df = Seq((Array(1.5f, -2.25f, 3.125f, 0.1f), Array(0.5f, 4.0f, -1.5f, 0.3f)))
      .toDF("a", "b")
    val chain = (1 to 4).map(i =>
      s"(CAST(element_at(a, $i) AS DOUBLE) * CAST(element_at(b, $i) AS DOUBLE))")
      .mkString(" + ")
    val r = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      expr(chain).as("chain")).collect().head
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("mixed element types: integer micro-unit centroid x float vector") {
    import spark.implicits._
    val df = Seq((Array(1000000L, 2000000L, -500000L), Array(0.5f, 0.25f, 2.0f)))
      .toDF("c", "v")
    val r = df.select(call_function("graft_dot", col("c"), col("v"))).collect().head
    assert(r.getDouble(0) == 1000000L * 0.5 + 2000000L * 0.25 + -500000L * 2.0)
  }

  test("SQL surface and null array propagation") {
    val v = spark.sql("SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .collect().head.getDouble(0)
    assert(v == 11.0)
    val n = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)) AS d").collect().head
    assert(n.isNullAt(0))
  }

  test("length mismatch throws; non-array input fails analysis") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
    intercept[Exception] {
      spark.sql("SELECT graft_dot(1, 2)").collect()
    }
  }

  test("null ELEMENT throws instead of silently reading as 0.0") {
    // array(...) of nullable exprs types as containsNull=true — the guard
    // path; a plausible partial dot (null -> 0.0) must not flow through.
    val e = intercept[Exception] {
      spark.sql(
        """SELECT graft_dot(array(1.0F, CAST(NULL AS FLOAT)),
          |                 array(3.0F, 4.0F)) AS d""".stripMargin).collect()
    }
    assert(e.getMessage.contains("null array element") ||
      (e.getCause != null && e.getCause.getMessage.contains("null array element")))
    // interpreted path must agree with codegen
    val e2 = intercept[Exception] {
      import spark.implicits._
      val df = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f)))
        .toDF("a", "b")
      df.select(Similarity.dot("a", "b")).collect()
    }
    assert(e2.getMessage != null)
  }

  test("dot works without GraftExtensions in the registry (bridge-built)") {
    import spark.implicits._
    // Similarity.dot constructs the expression directly — must not resolve
    // through the function registry
    val df = Seq((Array(2.0f, 3.0f), Array(4.0f, 5.0f))).toDF("x", "y")
    val r = df.select(Similarity.dot("x", "y")).collect().head
    assert(r.getDouble(0) == 23.0)
  }

  test("norm2 is dot with itself; cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq((1L, Array(3.0f, 4.0f))).toDF("vec_id", "e")
    val r = df.select(Similarity.norm2("e").as("n"),
      Similarity.cosineWithNorms(Similarity.dot("e", "e"),
        Similarity.norm2("e"), Similarity.norm2("e")).as("c")).collect().head
    assert(r.getDouble(0) == 25.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
  }

  test("set diversity: mean-max cosine pins the 3-4-5 hand case") {
    import spark.implicits._
    // Unit axes + the 3-4-5 vector: cos(a,c) = 3/5, cos(b,c) = 4/5,
    // cos(a,b) = 0. Per-member max: a -> 3/5, b -> 4/5, c -> 4/5. In
    // micro-units: 3.0/5.0*1e6 rounds to exactly 600000.0 before the
    // floor (the nearest-double product lands on the integer), 4/5 ->
    // 800000. mean = (600000 + 800000 + 800000) div 3 = 733333.
    val df = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(3f, 4f, 0f))).toDF("vec_id", "embedding")
    val r = Similarity.meanMaxCos(df).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 733333L)
  }
}
