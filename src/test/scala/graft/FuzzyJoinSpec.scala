package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Ed-Join prefix filtering must be COMPLETE (the oracle query q136 is the
  * all-pairs form, so any missed candidate is a correctness bug, not a
  * recall trade-off). Property-tested against brute force over random
  * strings, including the short/gram-free lengths the prefix filter
  * cannot cover on its own.
  */
class FuzzyJoinSpec extends SparkSpec {

  private def editDistance(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  test("matches brute force on random strings (incl. short and gram-free)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small alphabet forces collisions; lengths 1..12 exercise the
    // short-pool path (l < q(k+1) = 6) and the zero-gram case (l < 3)
    val strs = (1 to 120).map { i =>
      val l = 1 + rnd.nextInt(12)
      (i.toLong, (1 to l).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val expected = (for {
      (i1, s1) <- strs; (i2, s2) <- strs
      if i1 < i2 && editDistance(s1, s2) <= 1
    } yield (i1, i2)).toSet
    val got = FuzzyJoin.selfJoin(strs.toDF("id", "name"), "id", "name", k = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missed: ${expected -- got}; spurious: ${got -- expected}")
  }

  test("planted typos at k=2 are found with exact distances") {
    import spark.implicits._
    val df = Seq(
      (1L, "distributed dataflow"),
      (2L, "distribuded dataflow"), // 1 substitution from 1
      (3L, "distributed datflow"), // 1 deletion from 1
      (4L, "completely different")).toDF("id", "name")
    val out = FuzzyJoin.selfJoin(df, "id", "name", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) == 1L)
    assert(out((1L, 3L)) == 1L)
    assert(out((2L, 3L)) == 2L)
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
