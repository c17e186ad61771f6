package graft

import org.apache.spark.sql.functions._

/** Algorithmic invariants of the round-9 audit/selection/sketch
  * operators that the exact-hash oracle cannot express (it pins values,
  * not properties): submodular greedy gains must be non-increasing and
  * must reconcile with the coverage ledger, IPF must actually hit the
  * margin it just fitted, the sketch/sampling estimators must land
  * within their design error bands on the fixture, and the L-moment
  * ratios must respect their mathematical bounds.
  */
class AuditInvariantSpec extends SparkSpec {

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  test("q434 facility location: distinct picks, gains positive and " +
      "non-increasing (submodularity), coverage ledger reconciles") {
    val rows = SparkEntry.queries("q434_facility_location")(spark, sf001)
      .orderBy("round").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).distinct.length == 5)
    val gains = rows.map(_.getLong(2))
    assert(gains.forall(_ > 0L), s"non-positive gain: ${gains.toSeq}")
    gains.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"greedy gain grew (submodularity violated): " +
        s"${gains.toSeq}")
    }
    // cov_total[r] − cov_total[r−1] == gain[r] — the exact ledger
    val covs = rows.map(_.getLong(3))
    (1 until 5).foreach { i =>
      assert(covs(i) - covs(i - 1) == gains(i),
        s"coverage ledger broke at round ${i + 1}")
    }
    assert(covs(0) == gains(0))
  }

  test("q445 IPF raking: the just-fitted column margins are met " +
      "exactly up to per-cell trunc rounding") {
    val rows = SparkEntry.queries("q445_ipf_raking")(spark, sf01).collect()
    // after the final column fit, Σ_k m·w/1e6 per lang ≈ tc
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, cells) =>
      val achieved = cells.map(r => r.getLong(2) * r.getLong(3)).sum / 1000000L
      val target = cells.head.getLong(5)
      assert(math.abs(achieved - target) <= cells.length + 1,
        s"lang $lang: achieved $achieved vs target $target")
    }
  }

  test("q441 KMV sketch: estimates land within the k=32 design band " +
      "(±60%) wherever the sketch saturated") {
    val rows = SparkEntry.queries("q441_kmv_sketch")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, kk, est) = (r.getLong(1), r.getLong(2), r.getLong(4))
      if (kk == 32L) {
        assert(est > exact * 2 / 5 && est < exact * 8 / 5,
          s"source ${r.getString(0)}: est $est vs exact $exact")
      } else assert(est == exact, "unsaturated sketch must be exact")
    }
  }

  test("q442 priority sampling: 32-sample subset-sum estimate within " +
      "±60% of the exact corpus total") {
    val r = SparkEntry.queries("q442_priority_sampling")(spark, sf01).head()
    val (k, est, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(k <= 32L && k >= 28L, s"sample collapsed: k=$k")
    assert(est > exact * 2 / 5 && est < exact * 8 / 5,
      s"estimate $est vs exact $exact")
  }

  test("q446 L-moments: L-scale positive, ratio bounds |t3| ≤ 1, " +
      "t4 ≥ (5·t3² − 1)/4 (Hosking feasibility)") {
    val r = SparkEntry.queries("q446_l_moments")(spark, sf001).head()
    val (l2, t3, t4) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(l2 > 0L)
    assert(math.abs(t3) <= 1000000L)
    assert(math.abs(t4) <= 1000000L)
    val lhs = t4.toDouble / 1e6
    val rhs = (5.0 * math.pow(t3.toDouble / 1e6, 2) - 1.0) / 4.0
    assert(lhs >= rhs - 1e-3, s"infeasible (t3, t4) pair: ($t3, $t4)")
  }

  test("q437 quantile normalization: mapped values are global values, " +
      "monotone in v within source, and hit the global max") {
    val rows = SparkEntry.queries("q437_quantile_normalization")(spark, sf001)
      .collect()
    val globalVs = rows.map(_.getLong(1)).toSet
    val globalMax = globalVs.max
    assert(rows.forall(r => globalVs.contains(r.getLong(5))),
      "mapped value outside the global support")
    rows.groupBy(_.getString(0)).foreach { case (src, cells) =>
      val sorted = cells.sortBy(_.getLong(1))
      sorted.map(_.getLong(5)).sliding(2).foreach {
        case Array(a, b) => assert(b >= a, s"$src: mapping not monotone")
        case _ =>
      }
      assert(sorted.last.getLong(5) == globalMax,
        s"$src: top rank must map to the global max")
    }
  }

  test("q440 rendezvous sharding: movement within 3x of the 1/33 " +
      "expectation and every doc accounted for") {
    val r = SparkEntry.queries("q440_rendezvous_sharding")(spark, sf01).head()
    val (nShards, nDocs, nMoved) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nDocs == 500L)
    assert(nShards <= 32L && nShards >= 20L)
    assert(nMoved >= 0L && nMoved * 33L <= nDocs * 3L,
      s"moved $nMoved of $nDocs — far from 1/33")
    assert(r.getLong(5) >= 0L && r.getLong(6) >= r.getLong(5))
  }
}
