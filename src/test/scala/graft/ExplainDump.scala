package graft

import graft.queries.{Mobility, Training}

/** Diagnostic (manual): prints formatted plans for the scale notes.
  * Run with `testOnly graft.ExplainDump -- -z plans` when needed.
  */
class ExplainDump extends SparkSpec {
  ignore("plans") {
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("q47_stop_detection", "q49_daily_home")) {
      println(s"===== $q")
      (Mobility.queries ++ Training.queries)(q)(spark, sf).explain("formatted")
    }
  }
}
