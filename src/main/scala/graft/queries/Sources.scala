package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.sources.GraftIO

/** Source/sink and sampling operators (SURVEY §2.1, §2.6).
  *
  * Format round-trips write a derived copy under `target/tmp` and read it
  * back; the oracle reads the original parquet — equality proves the
  * round-trip is lossless. Seeded samplers are implementation-defined
  * (SURVEY §7.3), so they are rows-only checks (no oracle).
  */
object Sources {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)
  private def tmp(name: String): String = s"/root/repo/target/tmp/$name"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2: ORC round-trip (ref build_random_sets.py:31 reads ORC timelines).
    "q36_orc_roundtrip" -> ((s, d) => {
      val p = tmp("region_orc")
      GraftIO.writeOrc(t(s, d, "region"), p)
      GraftIO.orc(s, p).select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"))
    }),

    // S3: JSON round-trip (ref build_2020_sets.py:27 reads decahose JSON).
    "q37_json_roundtrip" -> ((s, d) => {
      val p = tmp("nation_json")
      GraftIO.writeJson(t(s, d, "nation"), p)
      GraftIO.json(s, p)
        .groupBy("n_regionkey").agg(count(lit(1)).as("n_nations"))
        .select(col("n_regionkey").cast("long").as("n_regionkey"), col("n_nations"))
    }),

    // S4: CSV (header) round-trip with explicit casts back
    // (ref geocode_stop_locations.scala:26, wbgps/analysis.py:312).
    "q38_csv_roundtrip" -> ((s, d) => {
      val p = tmp("nation_csv")
      GraftIO.writeSingleCsv(t(s, d, "nation"), p)
      GraftIO.csv(s, p)
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
    }),

    // S9/O7: local collection -> DataFrame joined against a ranked table
    // (ref sample_tweets_to_validate...py:21-33,62-66 log-spaced ranks).
    "q39_local_rank_join" -> ((s, d) => {
      import s.implicits._
      val ranks = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L).toDF("rnk")
      val w = Window.orderBy(desc("value"), asc("event_id"))
      val ranked = t(s, d, "events")
        .select(col("event_id"), col("value"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 512) // prune before the tiny join
      ranked.join(broadcast(ranks), Seq("rnk"))
        .select(col("rnk"), col("event_id"), round(col("value"), 2).as("value"))
    }),

    // O4: seeded Bernoulli sample — rows-only (sampler is engine-specific).
    "q40_sample_seeded" -> ((s, d) => {
      t(s, d, "events").sample(withReplacement = false, 0.1, seed = 42)
        .select("event_id", "user_id", "event_type")
    }),

    // O5: stratified sample by key (ref select_tweets_containing_ngrams.py:145)
    // — rows-only.
    "q41_stratified_sample" -> ((s, d) => {
      val fractions = Map("click" -> 0.05, "view" -> 0.1, "purchase" -> 0.5,
        "signup" -> 1.0, "error" -> 0.2)
      t(s, d, "events").stat.sampleBy("event_type", fractions, 42L)
        .select("event_id", "event_type")
    }),

    // O6: seeded random jitter column (ref wbgps/analysis.py:402) — rows-only;
    // aggregate so the check is a stable distribution summary shape.
    "q42_rand_jitter" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("jitter", rand(7L) * 6)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
    }),

    // S5: metastore-style scan — temp view + SQL text with pushdown-able
    // WHERE (ref stop_locations.py:63-70 pattern).
    "q67_sql_over" -> ((s, d) => {
      GraftIO.sqlOver(s, s"$d/orders.parquet", "orders_v",
        """SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
           FROM orders_v WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""")
    }),

    // S4 multiLine: WKT with embedded newlines through a quoted CSV, the
    // reference's admin-polygon load (geocode_stop_locations.scala:26 uses
    // multiLine=true). The read-back WKT must parse into a WORKING
    // geometry: contains_center ray-casts the square's center.
    "q97_multiline_csv" -> ((s, d) => {
      val p = tmp("nation_wkt_csv")
      val k1 = (col("n_nationkey") + 1).cast("string")
      val wkt = concat(lit("POLYGON ((0 0,\n"), k1, lit(" 0,\n"),
        k1, lit(" "), k1, lit(",\n0 "), k1, lit(",\n0 0))"))
      GraftIO.writeSingleCsv(
        t(s, d, "nation").select(col("n_nationkey"), wkt.as("wkt")), p)
      val c = (col("n_nationkey").cast("double") + 1.0) / 2.0
      GraftIO.csv(s, p, multiLine = true)
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          length(col("wkt")).cast("long").as("wkt_len"),
          graft.functions.GeoFunctions.stContains(col("wkt"), c, c).as("contains_center"))
    }),

    // PERMISSIVE corrupt-record handling: a JSONL file with
    // deterministically broken lines (every n_nationkey ≡ 2 mod 5) read
    // back with an explicit schema + _corrupt_record column — the
    // don't-fail-the-job ingest posture for dirty feeds (FAILFAST's
    // sibling, q38/q97). The oracle derives the same verdict from the
    // injection rule, so good/corrupt counts and the good-key sum are
    // exact.
    "q304_corrupt_json" -> ((s, d) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val p = tmp("nation_corrupt_json")
      val line = when(col("n_nationkey") % 5 === 2,
          concat(lit("{\"n_nationkey\": "),
            col("n_nationkey").cast("string"), lit(", BROKEN")))
        .otherwise(to_json(struct(col("n_nationkey"), col("n_name"))))
      t(s, d, "nation").select(line.as("value"))
        .coalesce(1).write.mode("overwrite").text(p)
      val schema = StructType(Seq(
        StructField("n_nationkey", LongType), StructField("n_name", StringType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(schema).option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record").json(p)
        .agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
            .as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("n_nationkey")))
            .as("sum_good_keys"))
    }),

    // XML round-trip (format built into spark-sql since Spark 4): write
    // nation as one <row> element per record, read it back, compare to
    // the original table — equality proves the trip is lossless.
    "q139_xml_roundtrip" -> ((s, d) => {
      val p = tmp("nation_xml")
      GraftIO.writeXml(t(s, d, "nation"), p)
      GraftIO.xml(s, p)
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
    }),

    // Whole-file binary source (multimodal ingest): deterministic fixture
    // files on local disk, one row per file with (name, size, content
    // fingerprint). The DuckDB oracle reads the same files with
    // read_blob — fixture bytes stay ASCII so its BLOB->VARCHAR cast
    // hashes the same bytes Spark's md5(binary) sees.
    "q140_binary_source" -> ((s, d) => {
      val dir = java.nio.file.Paths.get("/root/repo/target/tmp/binsrc")
      java.nio.file.Files.createDirectories(dir)
      (1 to 5).foreach { i =>
        java.nio.file.Files.write(dir.resolve(s"doc_$i.bin"),
          s"graft-binary-fixture-$i:".repeat(i).getBytes("UTF-8"))
      }
      GraftIO.binaryFiles(s, dir.toString, "*.bin")
        .select(regexp_extract(col("path"), "[^/]+$", 0).as("fname"),
          col("length"), md5(col("content")).as("h"))
    }),

    // S7: column-partitioned parquet sink + partition-pruned read-back
    // (ref tz_offset.scala:28-32 Delta partitionBy("date")).
    "q68_partitioned_sink" -> ((s, d) => {
      val p = tmp("events_by_type")
      GraftIO.writePartitioned(
        t(s, d, "events").select(col("event_id"), col("user_id"), col("value"),
          col("event_type")),
        p, Seq("event_type"))
      GraftIO.parquet(s, p)
        .where(col("event_type") === "click") // prunes to one partition dir
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .select(col("event_type"), col("n"), col("sum_value"))
    }))

  val oracles: Map[String, String] = Map(
    "q97_multiline_csv" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           CAST(length('POLYGON ((0 0,' || chr(10) || k1 || ' 0,' || chr(10)
             || k1 || ' ' || k1 || ',' || chr(10) || '0 ' || k1 || ',' || chr(10)
             || '0 0))') AS BIGINT) AS wkt_len,
           TRUE AS contains_center
         FROM (SELECT n_nationkey,
                 CAST(n_nationkey + 1 AS VARCHAR) AS k1 FROM nation)""",
    "q36_orc_roundtrip" ->
      "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region",
    "q139_xml_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
         CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""",
    "q140_binary_source" ->
      """SELECT regexp_extract(filename, '[^/]+$') AS fname,
           size AS length, md5(content::VARCHAR) AS h
         FROM read_blob('/root/repo/target/tmp/binsrc/*.bin')""",
    "q37_json_roundtrip" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n_nations
         FROM nation GROUP BY 1""",
    "q38_csv_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
         CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""",
    "q39_local_rank_join" ->
      """SELECT rnk, event_id, round(value,2) AS value FROM
         (SELECT event_id, value,
            row_number() OVER (ORDER BY value DESC, event_id ASC) AS rnk FROM events)
         JOIN (VALUES (1),(2),(4),(8),(16),(32),(64),(128),(256),(512)) v(rnk) USING (rnk)""",
    "q67_sql_over" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""",
    "q68_partitioned_sink" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
         FROM events WHERE event_type = 'click' GROUP BY event_type""",
    "q304_corrupt_json" ->
      """SELECT
           CAST(sum(CASE WHEN n_nationkey % 5 = 2 THEN 0 ELSE 1 END)
             AS BIGINT) AS n_good,
           CAST(sum(CASE WHEN n_nationkey % 5 = 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN n_nationkey % 5 = 2 THEN NULL
                         ELSE n_nationkey END) AS BIGINT) AS sum_good_keys
         FROM nation""")
}
