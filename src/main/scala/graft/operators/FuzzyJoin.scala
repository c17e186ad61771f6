package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (ed(s, t) <= k) by positional
  * q-gram prefix filtering — the Ed-Join scheme (Xiao, Wang, Lin:
  * "Ed-Join: an efficient algorithm for similarity joins with edit
  * distance constraints", VLDB 2008), re-expressed as DataFrame ops.
  *
  * Why not all pairs: a quadratic self-join with a `levenshtein` filter
  * is O(n²) string comparisons — dead at 100 TB. Instead:
  *
  *  1. every string emits its positional q-grams (one generator, no
  *     shuffle);
  *  2. grams get their global document frequency (one key shuffle) and
  *     each string keeps only its q·k+1 RAREST grams (its "prefix" in
  *     the global (df, gram, pos) order — one window per string id);
  *  3. candidates are pairs sharing a prefix gram with compatible
  *     positions (|p1-p2| <= k) and lengths (|l1-l2| <= k) — an
  *     EQUI-join on gram text, so it shuffles instead of comparing
  *     everything with everything;
  *  4. survivors are verified with the exact `levenshtein` built-in.
  *
  * Completeness (no missed pair) follows from q-gram count filtering:
  * one edit destroys at most q positional grams, so ed <= k leaves at
  * least T = (L_max - q + 1) - q·k matching grams, and the required
  * prefix length (l - q + 1) - T + 1 = l - L_max + q·k + 1 never
  * exceeds q·k+1 — so two strings with disjoint (q·k+1)-prefixes under
  * a shared total order cannot be within distance k, PROVIDED T >= 1,
  * i.e. the longer string has at least q(k+1) chars. Pairs where BOTH
  * strings are shorter than that (including the zero-gram case l < q)
  * are handled by an explicit all-pairs pool over the short strings —
  * a domain bounded by alphabet^(q(k+1)-1), and tiny after value dedup.
  * Rarity ordering makes prefix-gram buckets as small as the data
  * allows; on adversarial template keys (shared boilerplate, e.g.
  * "Customer#0000…") buckets degrade toward quadratic GRACEFULLY —
  * exactly the LSH celebrity-bucket trade-off, with the same remedy
  * (cap or pre-dedup) if a real corpus needs it.
  */
object FuzzyJoin {

  /** All (id1 < id2) pairs of `df` rows with ed(strCol) <= k, plus the
    * exact distance. `q` is the gram width (default 3).
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      k: Int = 1, q: Int = 3): DataFrame = {
    val prefLen = q * k + 1
    val minSafe = q * (k + 1) // prefix filter sound when max(l1,l2) >= this
    val base = df.select(col(idCol).as("id"), col(strCol).as("name"))
      .withColumn("l", length(col("name")))
    val grams = base
      // strings shorter than one gram are fully handled by the shorts
      // pool (l < minSafe below); without this gate sequence(1, l-2)
      // DESCENDS for them (the q77 lesson) and substring emits duplicate
      // garbage grams that inflate df counts and the prefix join.
      .where(col("l") >= q)
      .select(col("id"), col("name"), col("l"),
        posexplode(expr(
          s"transform(sequence(1, l - ${q - 1}), i -> substring(name, i, $q))"))
          .as(Seq("pos0", "gram")))
      .withColumn("pos", col("pos0") + 1).drop("pos0")
    val gramDf = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val prefix = grams.join(gramDf, "gram")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("gram"), col("pos"))))
      .where(col("rn") <= prefLen)
      .select("id", "name", "l", "gram", "pos")
    val a = prefix.select(col("id").as("id1"), col("name").as("n1"),
      col("l").as("l1"), col("gram"), col("pos").as("p1"))
    val b = prefix.select(col("id").as("id2"), col("name").as("n2"),
      col("l").as("l2"), col("gram"), col("pos").as("p2"))
    val viaPrefix = a.join(b, Seq("gram"))
      .where(col("id1") < col("id2") &&
        abs(col("p1") - col("p2")) <= k && abs(col("l1") - col("l2")) <= k)
      .select("id1", "id2", "n1", "n2")
    // pairs where BOTH strings are short enough to defeat count filtering
    // (possibly gram-free): all-pairs over the short pool only
    val shorts = base.where(col("l") < minSafe)
    val viaShorts = shorts.select(col("id").as("id1"), col("name").as("n1"))
      .join(shorts.select(col("id").as("id2"), col("name").as("n2")),
        col("id1") < col("id2"))
      .select("id1", "id2", "n1", "n2")
    // compute the distance ONCE: filter and project are separate
    // operators, so codegen CSE would not span a levenshtein in the
    // .where and another in the .select — each surviving pair would pay
    // the DP twice. The THRESHOLDED built-in runs the banded O(k·l)
    // recurrence with early exit instead of the full O(l1·l2) table
    // (returns -1 above the threshold — same accept set, and the kept
    // distances are exact, so oracles replaying unthresholded
    // levenshtein(...) <= k agree).
    viaPrefix.union(viaShorts).distinct()
      .withColumn("ed", levenshtein(col("n1"), col("n2"), k).cast("long"))
      .where(col("ed") >= 0L)
      .select("id1", "id2", "ed")
  }
}
