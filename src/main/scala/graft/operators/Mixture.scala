package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-mix assembly — the corpus-composition step that follows
  * curation in a pretraining data pipeline: score domains (per-doc
  * unigram NLL → per-source mean loss), reweight the domain mixture
  * (DoReMi-style damped multiplicative weights, arXiv:2305.10429), and
  * fill a global token budget per source in proportion to the learned
  * shares. `assemble` composes the stages the `CurationPipeline.curate`
  * way; each stage is also an oracle-checked operator on its own
  * (q127 NLL, q249 shares, q250 the full composition).
  *
  * Scale shape: the corpus-scale work is two scans (NLL terms, token
  * counts); the mixture iteration runs on the per-DOMAIN aggregate frame
  * (dozens of rows — window aggregates over one deliberately bounded
  * partition), and the budget fill runs on the keyed PrefixScan
  * (range-sorted, all partitions working — never #sources-way window
  * parallelism over the doc frame).
  */
object Mixture {

  /** Per-doc unigram-LM negative log likelihood (q127's score): NLL terms
    * summed in pinned position order (collect_list sorted by pos) so the
    * IEEE fold matches the oracle's ORDER BY pos list fold exactly.
    * `docs`: (doc_id, text, ...). Returns (doc_id, n_tok, avg_nll_e6).
    */
  def docNll(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
    val uni = tok.groupBy("term").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("n_tokens_total"))
    tok.join(uni, "term")
      .crossJoin(broadcast(tot))
      .withColumn("lnp", log(col("n_tokens_total").cast("double") / col("c")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        transform(array_sort(collect_list(struct(col("pos"), col("lnp")))),
          x => x.getField("lnp")).as("ls"))
      .select(col("doc_id"), col("n_tok"),
        floor(aggregate(col("ls"), lit(0.0d), (acc, x) => acc + x)
          / col("n_tok") * 1e6).cast("long").as("avg_nll_e6"))
  }

  /** DoReMi-style damped multiplicative-weights shares over a per-source
    * loss frame (source, loss_e6): excess = loss − min(loss), then
    * `rounds` of w ← w·(1 + η·excess·(1 − share)) with η = 0.1, all in
    * integer micro-units (trunc divisions on non-negative operands, so
    * a SQL oracle replays every round exactly). The frame is the DOMAIN
    * aggregate — window sums over one deliberately bounded partition
    * keep the whole iteration a single plan (the broadcast-per-round
    * form measured 3× slower on pure job-scheduling overhead).
    * Returns (source, loss_e6, excess_e6, w_final, share_e6).
    */
  def doremiShares(loss: DataFrame, rounds: Int = 3): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    var w = loss
      .withColumn("excess_e6", col("loss_e6") - min("loss_e6").over(wAll))
      .withColumn("w", lit(1000000L))
    for (_ <- 1 to rounds) {
      w = w.withColumn("tw", sum("w").over(wAll))
        .withColumn("share_e6", expr("w * 1000000 div tw"))
        .withColumn("exc_t", expr("excess_e6 * (1000000 - share_e6) div 1000000"))
        .withColumn("w", expr("w * (1000000 + exc_t div 10) div 1000000"))
        .select("source", "loss_e6", "excess_e6", "w")
    }
    w.withColumn("tw", sum("w").over(wAll))
      .withColumn("share_e6", expr("w * 1000000 div tw"))
      .select(col("source"), col("loss_e6"), col("excess_e6"),
        col("w").as("w_final"), col("share_e6"))
  }

  /** Per-source token-budget fill: each source gets
    * share_e6·totalBudget/1e6 tokens and fills it by priority order
    * (prio_e6 desc, doc_id tiebreak). The running token total and
    * in-source rank run on the keyed PrefixScan — a window partitioned
    * by `source` would give #sources-way parallelism over the whole doc
    * frame at 100 TB; the keyed scan range-sorts by (source, prio desc,
    * doc_id) so every partition works, with one pass computing BOTH
    * running aggregates.
    * `docsTok`: (doc_id, source, n_tok, prio_e6); `shares`:
    * (source, share_e6). Adds (src_budget, rnk_in_src, cum_tok), keeps
    * the rows whose cumulative tokens fit.
    */
  def fillByShare(docsTok: DataFrame, shares: DataFrame,
      totalBudgetTokens: Long): DataFrame = {
    val withBudget = docsTok.join(broadcast(shares.select(col("source"),
      expr(s"share_e6 * ${totalBudgetTokens}L div 1000000").as("src_budget"))),
      "source")
    PrefixScan.scanLongKeyed(withBudget, Seq("source"),
        Seq(PrefixScan.KeyedScanCol("rnk_in_src", "", "count"),
          PrefixScan.KeyedScanCol("cum_tok", "n_tok", "sum")),
        desc("prio_e6"), asc("doc_id"))
      .where(col("cum_tok") <= col("src_budget"))
  }

  /** UniMax sampling (Chung et al. 2023, arXiv:2304.09151): budget-capped
    * water filling over sources. Each source's allocation is capped at
    * `epochCap` epochs of its own corpus (cap = epochCap·n_tok); the total
    * budget spreads as uniformly as possible subject to the caps. In
    * ascending-capacity order there is a unique boundary k: sources 1..k
    * take their full cap, the rest split the leftover evenly — and the
    * capped test cap_i·(S−i+1) ≤ B − capPrefix_{i−1} is monotone (once it
    * fails it stays failed, since caps ascend), so the whole scan is two
    * window passes, no sequential loop. All integer (trunc div on
    * non-negative operands; the ≤ remainder of the final div stays
    * unallocated by design), so a SQL oracle replays it exactly.
    *
    * Scale shape: the corpus-scale work is the caller's token-count scan;
    * this runs on the per-SOURCE aggregate (dozens of rows — the one
    * deliberately bounded single-partition window, same posture as
    * doremiShares). `counts`: (source, n_tok). Returns (source, n_tok,
    * cap_tok, alloc_tok, capped, epochs_e6).
    */
  def unimaxAllocation(counts: DataFrame, budget: Column,
      epochCap: Long): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ord = Window.partitionBy(lit(1)).orderBy(asc("cap_tok"), asc("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1L)
    counts
      .withColumn("cap_tok", col("n_tok") * lit(epochCap))
      .withColumn("budget_tok", budget)
      .withColumn("n_src", count(lit(1)).over(wAll))
      .withColumn("rnk", row_number().over(ord).cast("long"))
      .withColumn("cap_pre", coalesce(sum("cap_tok").over(pre), lit(0L)))
      .withColumn("capped",
        col("cap_tok") * (col("n_src") - col("rnk") + 1L) <=
          col("budget_tok") - col("cap_pre"))
      .withColumn("k", coalesce(
        max(when(col("capped"), col("rnk"))).over(wAll), lit(0L)))
      .withColumn("cap_sum_k", coalesce(
        sum(when(col("capped"), col("cap_tok"))).over(wAll), lit(0L)))
      .withColumn("fair", when(col("n_src") === col("k"), lit(0L))
        .otherwise(expr("(budget_tok - cap_sum_k) div (n_src - k)")))
      .select(col("source"), col("n_tok"), col("cap_tok"),
        when(col("capped"), col("cap_tok")).otherwise(col("fair"))
          .as("alloc_tok"),
        col("capped"),
        expr("(CASE WHEN capped THEN cap_tok ELSE fair END) * 1000000 div n_tok")
          .as("epochs_e6"))
  }

  /** The composed mix step: quality gate (q53 keep rule) → per-source
    * DoReMi shares from the kept corpus's NLL → per-source budget fill
    * by type-token-ratio priority. `docs`: (doc_id, source, text).
    */
  def assemble(docs: DataFrame, totalBudgetTokens: Long): DataFrame = {
    // persisted: the kept corpus feeds BOTH the NLL scan and the token
    // scan — unpersisted, the quality gate re-runs per consumer. The
    // caller (or harness clearCache) releases it.
    val kept = docs
      .withColumn("q", TextFunctions.qualityScore(col("text")))
      .where(col("q").getField("keep"))
      .select(col("doc_id"), col("source"), col("text"))
      .persist()
    val loss = docNll(kept)
      .join(kept.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(expr("sum(avg_nll_e6) div count(1)").as("loss_e6"))
    val shares = doremiShares(loss).select("source", "share_e6")
    val toks = kept
      .select(col("doc_id"), col("source"),
        TextFunctions.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("source"),
        size(col("w")).cast("long").as("n_tok"),
        size(array_distinct(col("w"))).cast("long").as("n_uniq"))
      .withColumn("prio_e6", expr("n_uniq * 1000000 div n_tok"))
      .drop("n_uniq")
    fillByShare(toks, shares, totalBudgetTokens)
      .select("doc_id", "source", "n_tok", "prio_e6",
        "src_budget", "rnk_in_src", "cum_tok")
  }
}
