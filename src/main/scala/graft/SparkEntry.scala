package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY §2 line);
  * `oracleSql` gives the DuckDB-equivalent SQL for every query whose
  * semantics are SQL-expressible (seeded samplers and the flatMapGroups
  * sequence operators are rows-only checks).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_agg_sum")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Sources.queries ++ Geo.queries ++ Mobility.queries ++
      Training.queries ++ Media.queries ++ Analysis.queries ++ Warehouse.queries ++
      Stats.queries ++ Evals.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Sources.oracles ++ Geo.oracles ++ Mobility.oracles ++
      Training.oracles ++ Media.oracles ++ Analysis.oracles ++ Warehouse.oracles ++
      Stats.oracles ++ Evals.oracles
}
