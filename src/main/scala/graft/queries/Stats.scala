package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistical analysis operators — aggregator over the family files the
  * former 7k-line Stats.scala was split into (round 10): StatsTests
  * (distribution/association tests), StatsSeries (time series, survival,
  * change detection), StatsProcess (control charts, outliers, robust
  * estimators), StatsDesign (experiment/survey design, sampling, causal).
  * Shared helpers live on StatsShared.
  */
object Stats {
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    StatsTests.queries ++ StatsSeries.queries ++ StatsProcess.queries ++
      StatsDesign.queries

  val oracles: Map[String, String] =
    StatsTests.oracles ++ StatsSeries.oracles ++ StatsProcess.oracles ++
      StatsDesign.oracles
}
