package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard configuration.
  *
  * Mirrors the reference's session conventions (UTC session timezone,
  * `gps-analytics/src/pipeline/geocode_stop_locations.scala:19`; shuffle
  * partition tuning, `compiled-bookdown/06-mobility.Rmd:227`) but sized for
  * this harness: `local[32]`, AQE on, shuffle.partitions=32. On a real
  * cluster the same builder is used with `master` unset and
  * `shufflePartitions` sized to ~2-3x total cores.
  */
object GraftSession {

  def builder(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.parquet uses TIMESTAMP(NANOS); see Tables.apply.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // Parquet scan sizing: at 100 TB this is the knob that keeps input
      // partitions ~128MB; harmless locally.
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      // Runtime skew-join splitting (the AQE complement to the explicit
      // salting in SkewJoin/q93): oversized post-shuffle partitions are
      // split at runtime. On by default in Spark 4; pinned so a cluster's
      // site config can't silently turn the engine's skew story off.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
