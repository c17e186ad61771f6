package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions

/** Statistical analysis operators: per-group OLS regression, a pairwise
  * correlation matrix, and a chi-square independence test — the "does
  * indicator X track indicator Y" layer the reference runs in Stata/R
  * after Spark has built the panel (news-analytics dynamic factor inputs,
  * `news-analytics/code/2_compute_sentiment_index.do`; wealth-vs-mobility
  * regressions in `gps-analytics/src/wbgps/analysis.py`).
  *
  * Cross-engine determinism: every aggregation is an exact integer sum
  * (BIGINT-safe at bench scale — bounds documented per query); the
  * floating-point tail (slope, corr, chi-square) is a fixed parenthesized
  * chain of IEEE double ops both engines evaluate identically, then
  * floor-scaled to integer micro-units. Where a float fold over many terms
  * is unavoidable (chi-square cell sum), the cells are folded in a pinned
  * sort order, the q116/q127 rule.
  *
  * Scale shape: each statistic is one map-side-combinable aggregation over
  * the fact table (14 sums for the 4x4 correlation matrix), so the only
  * shuffle is the tiny per-group sum exchange; nothing here widens with
  * row count.
  */
object StatsShared {
  private[queries] def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private[queries] def d(c: Column): Column = c.cast("double")
  private[queries] def e6(c: Column): Column = floor(c * 1e6).cast("long")

  /** Shared integer measure projection of lineitem for q147/q172 — one
    * definition so a unit-scale change cannot drift between the
    * correlation matrix and the power iteration. `liMeasuresSql` is its
    * oracle mirror.
    */
  private[queries] def liMeasures(s: SparkSession, d0: String): DataFrame =
    t(s, d0, "lineitem").select(
      col("l_quantity").cast("long").as("m0"),
      floor(col("l_extendedprice")).cast("long").as("m1"),
      floor(col("l_discount") * 100).cast("long").as("m2"),
      floor(col("l_tax") * 100).cast("long").as("m3"))

  private[queries] val liMeasuresSql: String =
    """SELECT CAST(l_quantity AS BIGINT) AS m0,
             CAST(floor(l_extendedprice) AS BIGINT) AS m1,
             CAST(floor(l_discount * 100) AS BIGINT) AS m2,
             CAST(floor(l_tax * 100) AS BIGINT) AS m3
           FROM lineitem"""

  /** One-way ANOVA F + eta² from per-group integer sums — shared by
    * q431 (raw values) and q432 (Brown–Forsythe deviations) so the F
    * machinery cannot drift between them. Input: (g, x) with x long;
    * output one row (n_total, k_groups, f_e6, eta2_e6). Between/within
    * SS via the Σx/Σx² identities; the per-group s²/n terms fold in
    * sorted group order, then one pinned double chain. `anovaSqlFor`
    * is the oracle twin.
    */
  private[queries] def anovaFromSums(xs: DataFrame): DataFrame =
    xs.groupBy("g").agg(count(lit(1)).as("n_t"), sum("x").as("s_t"),
        sum(col("x") * col("x")).as("ss_t"))
      .agg(count(lit(1)).as("k_groups"), sum("n_t").as("n_total"),
        sum("s_t").as("s_all"), sum("ss_t").as("ss_all"),
        array_sort(collect_list(struct(col("g"), col("s_t"), col("n_t"))))
          .as("ps"))
      .withColumn("a", aggregate(transform(col("ps"),
        p => p.getField("s_t").cast("double") *
          p.getField("s_t").cast("double") /
          p.getField("n_t").cast("double")), lit(0.0d), (acc, x) => acc + x))
      .withColumn("ssb", col("a") -
        d(col("s_all")) * d(col("s_all")) / d(col("n_total")))
      .withColumn("ssw", d(col("ss_all")) - col("a"))
      .withColumn("sst", d(col("ss_all")) -
        d(col("s_all")) * d(col("s_all")) / d(col("n_total")))
      .select(col("n_total"), col("k_groups"),
        when(col("ssw") > 0.0d && col("k_groups") > 1L &&
            col("n_total") > col("k_groups"),
          floor((col("ssb") / (d(col("k_groups")) - 1.0d)) /
            (col("ssw") / (d(col("n_total")) - d(col("k_groups")))) * 1e6)
            .cast("long")).otherwise(lit(0L)).as("f_e6"),
        when(col("sst") > 0.0d,
          floor(col("ssb") / col("sst") * 1e6).cast("long"))
          .otherwise(lit(0L)).as("eta2_e6"))

  /** Oracle twin of `anovaFromSums`: expects a CTE named `xs(g, x)` in
    * scope and emits the rest of the query text.
    */
  private[queries] def anovaSqlTail: String =
    """per AS (
           SELECT g, count(*) AS n_t, CAST(sum(x) AS BIGINT) AS s_t,
             CAST(sum(x * x) AS BIGINT) AS ss_t
           FROM xs GROUP BY 1),
         agg AS (
           SELECT count(*) AS k_groups, CAST(sum(n_t) AS BIGINT) AS n_total,
             CAST(sum(s_t) AS BIGINT) AS s_all,
             CAST(sum(ss_t) AS BIGINT) AS ss_all,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)
                 / CAST(n_t AS DOUBLE) ORDER BY g)),
               (acc, x) -> acc + x) AS a
           FROM per),
         ch AS (
           SELECT *,
             a - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
               / CAST(n_total AS DOUBLE) AS ssb,
             CAST(ss_all AS DOUBLE) - a AS ssw,
             CAST(ss_all AS DOUBLE)
               - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
               / CAST(n_total AS DOUBLE) AS sst
           FROM agg)
         SELECT n_total, k_groups,
           CASE WHEN ssw > 0.0 AND k_groups > 1 AND n_total > k_groups
             THEN CAST(floor((ssb / (CAST(k_groups AS DOUBLE) - 1.0))
               / (ssw / (CAST(n_total AS DOUBLE)
                 - CAST(k_groups AS DOUBLE))) * 1000000.0) AS BIGINT)
             ELSE 0 END AS f_e6,
           CASE WHEN sst > 0.0
             THEN CAST(floor(ssb / sst * 1000000.0) AS BIGINT)
             ELSE 0 END AS eta2_e6
         FROM ch"""
}
