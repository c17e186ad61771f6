package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator inventory (SURVEY §2.2-§2.7) as oracle-checked queries.
  *
  * Every query here is declarative DataFrame code — scans stay prunable,
  * filters push down, joins pick their physical strategy via Catalyst + AQE.
  * Double-valued outputs are rounded *in the query* (both engine and oracle)
  * so cross-engine float summation order can't flip the comparison hash.
  * Integer outputs are cast to BIGINT on both sides (DuckDB promotes integer
  * sums to HUGEINT otherwise).
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: hash aggregate sum/avg/count (ref wbgps/labeling.py:208-209).
    "q01_agg_sum" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
    }),

    // P1-P3, P8: select/derive/range predicates incl. date-string compare
    // (ref stop_locations.py:60,91; wbgps/analysis.py:97-100).
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1998-01-01") && col("l_shipdate") < lit("1999-01-01")
          && col("l_quantity") > 25 && col("l_discount") <= 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          // exact decimal arithmetic: the inputs are 2-dp decimals stored as
          // double; double rounding at the 4th dp is boundary-sensitive and
          // engine-specific, decimal HALF_UP is not.
          round(col("l_extendedprice").cast("decimal(18,2)")
              * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
              * (lit(1).cast("decimal(18,2)") + col("l_tax").cast("decimal(18,2)")), 4)
            .cast("double").as("charge"))
    }),

    // J1: inner equi-join on a single key + aggregate (ref compute_share...py:97).
    "q03_join_inner" -> ((s, d) => {
      t(s, d, "orders").join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
    }),

    // J2: inner equi-join on composite key (ref wbgps/labeling.py:212).
    "q04_join_composite" -> ((s, d) => {
      val o = t(s, d, "orders")
      val grp = o.groupBy("o_custkey", "o_orderstatus").agg(count(lit(1)).as("n_in_grp"))
      o.join(grp, Seq("o_custkey", "o_orderstatus"), "inner")
        .select(col("o_orderkey"), col("n_in_grp"))
    }),

    // J3: left outer join (ref wbgps/analysis.py:187-188).
    "q05_join_left" -> ((s, d) => {
      t(s, d, "customer").join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    // Full outer join with both-side unmatched rows: a customer slice vs
    // an order-aggregate slice whose key ranges only partially overlap, so
    // null-extension fires on BOTH sides (left outer alone cannot show
    // the right-side extension). Coalesced key + nullable payloads.
    "q158_full_outer" -> ((s, d) => {
      val cust = t(s, d, "customer").where(col("c_custkey") <= 1000)
        .select(col("c_custkey"), col("c_mktsegment"))
      val ords = t(s, d, "orders")
        .where(col("o_custkey") >= 500 && col("o_custkey") <= 1500)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("key"),
          col("c_mktsegment"), col("n_orders"))
    }),

    // Null-safe equality join (<=>): NULL keys match each other — the
    // semantics a naive equi-join silently drops. Both sides aggregate to
    // distinct keys first, so the join stays dimension-sized.
    "q159_nullsafe_join" -> ((s, d) => {
      def side(even: Boolean) = t(s, d, "customer")
        .where(pmod(col("c_custkey"), lit(2)) === (if (even) 0 else 1))
        .select(when(col("c_acctbal") < 0, lit(null))
          .otherwise(col("c_mktsegment")).as("k"))
      val a = side(even = true).groupBy("k").agg(count(lit(1)).as("cnt_a"))
      val b = side(even = false).groupBy("k").agg(count(lit(1)).as("cnt_b"))
      a.join(b, a("k") <=> b("k"))
        .select(a("k").as("k"), col("cnt_a"), col("cnt_b"))
    }),

    // J4/J5: anti-join — customers with no orders (ref split_random.py:36,
    // retrieve_top_tweets_peel.py:46 uses broadcast left_anti).
    "q06_join_anti" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // J9: semi-join — customers with >=1 finished order, counted per nation
    // (ref wbgps/analysis.py:354-356).
    "q07_join_semi" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").where(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))
        .select(col("c_nationkey").cast("long").as("c_nationkey"), col("n_customers"))
    }),

    // J6: broadcast dimension joins customer->nation->region
    // (ref geocode_stop_locations.scala:82, tz_offset.scala:27).
    "q08_join_broadcast" -> ((s, d) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
    }),

    // A2: exact countDistinct (ref wbgps/analysis.py:105,169; indicator build).
    "q09_count_distinct" -> ((s, d) => {
      t(s, d, "events").groupBy("event_type")
        .agg(countDistinct("user_id").as("n_users"),
          countDistinct(to_date(col("ts"))).as("n_days"))
    }),

    // A3: global (no-key) aggregate (ref wbgps/analysis.py:108-117).
    "q10_global_agg" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        round(max("l_quantity"), 2).as("max_qty"),
        round(min("l_quantity"), 2).as("min_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("n"))
    }),

    // A4: weighted mean + stddev + sem (ref wbgps/analysis.py:219-224).
    "q11_weighted_mean" -> ((s, d) => {
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          round(sum(col("l_extendedprice") * col("l_quantity")) / sum("l_quantity"), 4)
            .as("wmean_price"),
          round(stddev_samp("l_extendedprice"), 4).as("sd_price"),
          round(stddev_samp("l_extendedprice") / sqrt(count(lit(1))), 6).as("sem_price"))
    }),

    // A5: pivot (ref wbgps/labeling.py:210-211, wbgps/analysis.py:121-123).
    "q12_pivot" -> ((s, d) => {
      t(s, d, "orders").groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(coalesce(sum("o_totalprice"), lit(0.0)), 2))
    }),

    // A7: argmax-per-group via row_number (ref wbgps/analysis.py:165-182).
    "q13_argmax" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, d, "orders").withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("best_order"),
          round(col("o_totalprice"), 2).as("best_price"))
    }),

    // A8: exact interpolated median (ref wbgps/stops.py:33 np.median).
    "q14_median" -> ((s, d) => {
      t(s, d, "customer").groupBy("c_mktsegment")
        .agg(round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
          round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"))
    }),

    // W1/W2: max over partition + equality filter (keeps ties, both engines)
    // (ref wbgps/analysis.py:164-182, 378-387).
    "q15_window_max" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
      t(s, d, "orders")
        .withColumn("max_price", max("o_totalprice").over(w))
        .where(col("o_totalprice") === col("max_price"))
        .select(col("o_orderkey"), round(col("max_price"), 2).as("max_price"))
    }),

    // W3: lag over (user, time) — migration-detection shape
    // (ref wbgps/analysis.py:392-396).
    "q16_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_value", lag("value", 1).over(w))
        .select(col("event_id"), round(col("value") - col("prev_value"), 4).as("delta"))
    }),

    // W4: global ranking by score (ref compute_share...py:99). NOTE: a global
    // row_number funnels through one partition — fine for top-k after a
    // TakeOrdered; the bench uses the scalable orderBy(...).limit(k) form.
    "q17_global_rank" -> ((s, d) => {
      val w = Window.orderBy(desc("value"), asc("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("value"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 100)
    }),

    // W5: time-range rolling window with min_periods emulation
    // (ref wbgps/labeling.py:47-63, pandas rolling('49D', min_periods)).
    "q18_rolling_time" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("epoch_s"))
        .rangeBetween(-7L * 86400, 0)
      t(s, d, "events")
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("cnt7", count(lit(1)).over(w))
        .withColumn("sum7", sum("value").over(w))
        .select(col("event_id"),
          when(col("cnt7") >= 3, round(col("sum7"), 4)).as("sum7d"),
          col("cnt7"))
    }),

    // W7: cumulative sum per group (ref wbgps/analysis.py:73-81,488).
    "q19_cumsum" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("cum_spend", round(sum("o_totalprice").over(w), 2))
        .select(col("o_orderkey"), col("cum_spend"))
    }),

    // A11: z-score within group (ref news 4_merge.do:35-45). The group
    // stats come from a groupBy + broadcast join-back, not
    // avg/stddev OVER (PARTITION BY event_type): the window form would
    // funnel the whole fact table through #event_type tasks, the
    // aggregate is map-side-combinable and the stats frame is bounded.
    "q20_zscore" -> ((s, d) => {
      val ev = t(s, d, "events")
      val st = ev.groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
      ev.join(broadcast(st), "event_type")
        .select(col("event_id"),
          round((col("value") - col("mu")) / col("sd"), 4).as("z"))
    }),

    // U1: union of two homogeneous slices (ref stop_locations_append.py:128-129).
    "q21_union" -> ((s, d) => {
      val o = t(s, d, "orders")
      val hi = o.where(col("o_totalprice") > 400000).select(col("o_orderkey"), lit("hi").as("slice"))
      val ur = o.where(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") <= 400000)
        .select(col("o_orderkey"), lit("urgent").as("slice"))
      hi.union(ur)
    }),

    // U2: distinct (ref wbgps/analysis.py:355).
    "q22_distinct" -> ((s, d) => {
      t(s, d, "events").select("user_id", "event_type").distinct()
    }),

    // U3: dedup by derived key, deterministic representative = min id
    // (ref build_random_sets.py:38-39 — dropDuplicates on text_no_links; we
    // keep min(doc_id) so the result is order-independent).
    "q23_dedup_key" -> ((s, d) => {
      t(s, d, "documents")
        .withColumn("dkey", substring(lower(col("text")), 1, 40))
        .groupBy("dkey")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
    }),

    // O2: top-k — Spark plans TakeOrderedAndProject (no global sort)
    // (ref retrieve_top_tweets_peel.py:56).
    "q24_topk" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // P4-P7: membership/null/contains/rlike predicates
    // (ref wbgps/analysis.py:355; select_tweets_containing_ngrams.py:119-127).
    "q25_predicates" -> ((s, d) => {
      t(s, d, "documents")
        .where(col("lang").isin("en", "fr") && col("text").isNotNull)
        .where(col("text").contains("spark") || col("text").rlike("(hash|merge) join"))
        .select(col("doc_id"), col("lang"))
    }),

    // A6: count-per-group -> per-group sampling fraction via when/otherwise
    // (ref select_tweets_containing_ngrams.py:141-144).
    "q26_group_fractions" -> ((s, d) => {
      t(s, d, "events").groupBy("event_type").agg(count(lit(1)).as("n"))
        .withColumn("frac",
          when(col("n") > lit(1000), round(lit(1000.0) / col("n"), 6)).otherwise(lit(1.0)))
    }),

    // 2.8 string scalars: lower/regexp_replace/translate/concat_ws
    // (ref build_random_sets.py:38-62).
    "q27_string_funcs" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[aeiou]", ""), 1, 60).as("devowel"),
        translate(col("source"), "src", "XYZ").as("src_code"),
        concat_ws("|", col("lang"), col("source")).as("tag"))
    }),

    // 2.8 date/time scalars (ref stop_locations.py:72-75, labeling.py:203,
    // compute_home_and_work_locations.py:53-56, analysis.py:401-403).
    "q28_datetime_funcs" -> ((s, d) => {
      t(s, d, "events").select(
        col("event_id"),
        hour(col("ts")).cast("long").as("h"),
        dayofweek(col("ts")).cast("long").as("dow"),
        // epoch seconds, not raw timestamps: engines disagree on timestamp
        // unit (us vs ns) even when the instant is identical
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        year(col("ts")).cast("long").as("yr"),
        datediff(col("ts"), lit("2024-01-01")).cast("long").as("days_since"),
        unix_timestamp(col("ts")).as("epoch_s"))
    }),

    // 2.8 explode + word count (ref stop_locations.py:91 explode pattern;
    // news tokenization).
    "q29_explode_words" -> ((s, d) => {
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("word"))
        .limit(50)
    }),

    // 2.11 fixed-bin bucketing via when-chain (ref wbgps/analysis.py:194-196).
    "q30_case_bucket" -> ((s, d) => {
      t(s, d, "customer")
        .withColumn("bal_bucket",
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 4000, "low")
            .when(col("c_acctbal") < 8000, "mid")
            .otherwise("high"))
        .groupBy("bal_bucket")
        .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 4).as("avg_bal"))
    }),

    // A9: winsorized mean — clip at exact p01/p99 (ref 1_import.py:123).
    "q31_winsorize" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val pct = li.agg(
        expr("percentile(l_extendedprice, 0.01)").as("p01"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"))
      li.crossJoin(broadcast(pct))
        .select(greatest(least(col("l_extendedprice"), col("p99")), col("p01")).as("clipped"))
        .agg(round(avg("clipped"), 4).as("winsorized_mean"), count(lit(1)).as("n"))
    }),

    // 2.11 baseline change metric: per-(type,dow) baseline over the first
    // 15 days, then (x-b)/|b| per day (ref wbgps/analysis.py:14-38).
    "q32_baseline_change" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("dow", dayofweek(col("ts")))
      val daily = ev.groupBy("event_type", "day", "dow").agg(sum("value").as("x"))
      val base = daily.where(col("day") < lit("2024-01-16"))
        .groupBy("event_type", "dow").agg(avg("x").as("b"))
      daily.join(broadcast(base), Seq("event_type", "dow"))
        .select(col("event_type"), unix_timestamp(col("day")).as("day_s"),
          round((col("x") - col("b")) / abs(col("b")), 6).as("change"))
    }),

    // JSON scalar extraction from a string column (events.props).
    "q33_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
    }),

    // Extension beyond the reference: rollup grouping sets.
    "q34_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"))
    }),

    // Extension: cube grouping sets over two dims.
    "q87_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("sum_price"))
    }),

    // Explicit GROUPING SETS with grouping_id — the irregular-set form
    // rollup/cube can't express ((status, priority), (status), ()) plus
    // the bitmask that disambiguates real NULL-group rows from
    // aggregate rows (SQL-over-table per the q67 precedent; identical
    // SQL runs in the oracle). One expand + hash aggregate in Spark.
    "q314_grouping_sets" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS st,
          coalesce(o_orderpriority, 'ALL') AS pri,
          CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          count(*) AS n,
          CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS cents
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
          (o_orderstatus), ())""")
    }),

    // from_json into a typed struct (vs q33's get_json_object path).
    "q88_from_json" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .groupBy("event_type")
        .agg(sum(col("j.k")).as("sum_k"), max(col("j.k")).as("max_k"))
    }),

    // levenshtein edit distance against a probe string.
    "q89_levenshtein" -> ((s, d) => {
      t(s, d, "customer").where(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          levenshtein(col("c_name"), lit("Customer#000000042")).cast("long").as("dist"))
    }),

    // percent_rank / cume_dist window ranks.
    "q90_percent_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(asc("c_acctbal"), asc("c_custkey"))
      t(s, d, "customer")
        .select(col("c_custkey"),
          floor(percent_rank().over(w) * 1e6).cast("long").as("pr_e6"),
          floor(cume_dist().over(w) * 1e6).cast("long").as("cd_e6"))
    }),

    // Extension: intersect / except (distinct set semantics both engines).
    "q35_set_ops" -> ((s, d) => {
      val o = t(s, d, "orders")
      val f = o.where(col("o_orderstatus") === "F").select("o_custkey")
      val p = o.where(col("o_orderstatus") === "P").select("o_custkey")
      val both = f.intersect(p).withColumn("tag", lit("both"))
      val fOnly = f.except(p).withColumn("tag", lit("f_only"))
      both.union(fOnly)
    }))

  /** DuckDB oracle SQL, aligned column names and rounding. */
  val oracles: Map[String, String] = Map(
    "q158_full_outer" ->
      """WITH cust AS (
           SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 1000),
         ords AS (
           SELECT o_custkey, count(*) AS n_orders FROM orders
           WHERE o_custkey BETWEEN 500 AND 1500 GROUP BY 1)
         SELECT coalesce(c_custkey, o_custkey) AS key, c_mktsegment, n_orders
         FROM cust FULL OUTER JOIN ords ON c_custkey = o_custkey""",
    "q159_nullsafe_join" ->
      """WITH a AS (
           SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS k,
             count(*) AS cnt_a
           FROM customer WHERE c_custkey % 2 = 0 GROUP BY 1),
         b AS (
           SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS k,
             count(*) AS cnt_b
           FROM customer WHERE c_custkey % 2 = 1 GROUP BY 1)
         SELECT a.k, a.cnt_a, b.cnt_b
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""",
    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_price,
         round(avg(l_discount),6) AS avg_disc,
         count(*) AS n
         FROM lineitem GROUP BY 1,2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2))), 4) AS DOUBLE) AS charge
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
           AND l_quantity > 25 AND l_discount <= 0.05""",
    "q03_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice),2) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1""",
    "q04_join_composite" ->
      """SELECT o.o_orderkey, g.n_in_grp
         FROM orders o
         JOIN (SELECT o_custkey, o_orderstatus, count(*) AS n_in_grp
               FROM orders GROUP BY 1,2) g
           ON o.o_custkey = g.o_custkey AND o.o_orderstatus = g.o_orderstatus""",
    "q05_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1""",
    "q06_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q07_join_semi" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_customers
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         GROUP BY 1""",
    "q08_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n, round(avg(c_acctbal),4) AS avg_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1,2""",
    "q09_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
         count(DISTINCT CAST(ts AS DATE)) AS n_days
         FROM events GROUP BY 1""",
    "q10_global_agg" ->
      """SELECT round(max(l_quantity),2) AS max_qty, round(min(l_quantity),2) AS min_qty,
         round(avg(l_extendedprice),4) AS avg_price, count(*) AS n
         FROM lineitem""",
    "q11_weighted_mean" ->
      """SELECT l_returnflag,
         round(sum(l_extendedprice*l_quantity)/sum(l_quantity),4) AS wmean_price,
         round(stddev_samp(l_extendedprice),4) AS sd_price,
         round(stddev_samp(l_extendedprice)/sqrt(count(*)),6) AS sem_price
         FROM lineitem GROUP BY 1""",
    "q12_pivot" ->
      """SELECT o_orderpriority,
         round(coalesce(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END),0),2) AS "F",
         round(coalesce(sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END),0),2) AS "O",
         round(coalesce(sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END),0),2) AS "P"
         FROM orders GROUP BY 1""",
    "q13_argmax" ->
      """SELECT o_custkey, o_orderkey AS best_order, round(o_totalprice,2) AS best_price
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
         WHERE rn = 1""",
    "q14_median" ->
      """SELECT c_mktsegment, round(quantile_cont(c_acctbal, 0.5),4) AS median_bal,
         round(quantile_cont(c_acctbal, 0.9),4) AS p90_bal
         FROM customer GROUP BY 1""",
    "q15_window_max" ->
      """SELECT o_orderkey, round(max_price,2) AS max_price
         FROM (SELECT o_orderkey, o_totalprice,
                 max(o_totalprice) OVER (PARTITION BY o_custkey) AS max_price FROM orders)
         WHERE o_totalprice = max_price""",
    "q16_lag" ->
      """SELECT event_id, round(value - lag(value,1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
         FROM events""",
    "q17_global_rank" ->
      """SELECT event_id, value, rnk FROM
         (SELECT event_id, value, row_number() OVER (ORDER BY value DESC, event_id ASC) AS rnk
          FROM events)
         WHERE rnk <= 100""",
    "q18_rolling_time" ->
      """SELECT event_id,
         CASE WHEN cnt7 >= 3 THEN round(sum7,4) END AS sum7d, cnt7
         FROM (SELECT event_id,
                 count(*) OVER w AS cnt7, sum(value) OVER w AS sum7
               FROM (SELECT *, CAST(floor(date_part('epoch', ts)) AS BIGINT) AS epoch_s FROM events)
               WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                            RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW))""",
    "q19_cumsum" ->
      """SELECT o_orderkey, round(sum(o_totalprice) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
         FROM orders""",
    "q20_zscore" ->
      """SELECT event_id, round((value - avg(value) OVER (PARTITION BY event_type))
           / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS z
         FROM events""",
    "q21_union" ->
      """SELECT o_orderkey, 'hi' AS slice FROM orders WHERE o_totalprice > 400000
         UNION ALL
         SELECT o_orderkey, 'urgent' AS slice FROM orders
         WHERE o_orderpriority = '1-URGENT' AND o_totalprice <= 400000""",
    "q22_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events""",
    "q23_dedup_key" ->
      """SELECT substr(lower(text),1,40) AS dkey, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",
    "q24_topk" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q25_predicates" ->
      """SELECT doc_id, lang FROM documents
         WHERE lang IN ('en','fr') AND text IS NOT NULL
           AND (contains(text, 'spark') OR regexp_matches(text, '(hash|merge) join'))""",
    "q26_group_fractions" ->
      """SELECT event_type, count(*) AS n,
         CASE WHEN count(*) > 1000 THEN round(1000.0/count(*),6) ELSE 1.0 END AS frac
         FROM events GROUP BY 1""",
    "q27_string_funcs" ->
      """SELECT doc_id,
         substr(regexp_replace(lower(text), '[aeiou]', '', 'g'), 1, 60) AS devowel,
         translate(source, 'src', 'XYZ') AS src_code,
         concat_ws('|', lang, source) AS tag
         FROM documents""",
    "q28_datetime_funcs" ->
      """SELECT event_id,
         CAST(hour(ts) AS BIGINT) AS h,
         CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         CAST(floor(date_part('epoch', date_trunc('day', ts))) AS BIGINT) AS day_s,
         CAST(year(ts) AS BIGINT) AS yr,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS days_since,
         CAST(floor(date_part('epoch', ts)) AS BIGINT) AS epoch_s
         FROM events""",
    "q29_explode_words" ->
      """SELECT word, count(*) AS n FROM
         (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY 1 ORDER BY n DESC, word ASC LIMIT 50""",
    "q30_case_bucket" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                     WHEN c_acctbal < 4000 THEN 'low'
                     WHEN c_acctbal < 8000 THEN 'mid'
                     ELSE 'high' END AS bal_bucket,
         count(*) AS n, round(avg(c_acctbal),4) AS avg_bal
         FROM customer GROUP BY 1""",
    "q31_winsorize" ->
      """SELECT round(avg(greatest(least(l_extendedprice, p99), p01)),4) AS winsorized_mean,
         count(*) AS n
         FROM lineitem,
           (SELECT quantile_cont(l_extendedprice, 0.01) AS p01,
                   quantile_cont(l_extendedprice, 0.99) AS p99 FROM lineitem)""",
    "q32_baseline_change" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day, dayofweek(ts)+1 AS dow,
                  sum(value) AS x
           FROM events GROUP BY 1,2,3),
         base AS (
           SELECT event_type, dow, avg(x) AS b FROM daily
           WHERE day < TIMESTAMP '2024-01-16' GROUP BY 1,2)
         SELECT daily.event_type,
           CAST(floor(date_part('epoch', daily.day)) AS BIGINT) AS day_s,
           round((x - b)/abs(b),6) AS change
         FROM daily JOIN base ON daily.event_type = base.event_type AND daily.dow = base.dow""",
    "q33_json_extract" ->
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         count(*) AS n
         FROM events GROUP BY 1""",
    "q87_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
           coalesce(o_orderpriority, 'ALL') AS pri,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q314_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
           coalesce(o_orderpriority, 'ALL') AS pri,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
             AS BIGINT) AS gid,
           count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
           (o_orderstatus), ())""",
    "q88_from_json" ->
      """SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY 1""",
    "q89_levenshtein" ->
      """SELECT c_custkey,
           CAST(levenshtein(c_name, 'Customer#000000042') AS BIGINT) AS dist
         FROM customer WHERE c_custkey <= 100""",
    "q90_percent_rank" ->
      """SELECT c_custkey,
           CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT) AS pr_e6,
           CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT) AS cd_e6
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)""",
    "q34_rollup" ->
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
         round(sum(l_quantity),2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q35_set_ops" ->
      """SELECT o_custkey, 'both' AS tag FROM
         (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
          INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus='P')
         UNION ALL
         SELECT o_custkey, 'f_only' AS tag FROM
         (SELECT o_custkey FROM orders WHERE o_orderstatus='F'
          EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus='P')""")
}
