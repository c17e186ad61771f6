package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding trainer loop — the iterative closure over q151's
  * single-round pair counts: each round counts adjacent token pairs
  * weighted by word frequency, picks the most frequent pair
  * (lexicographic tie-break, so training is deterministic), and merges
  * it greedily left-to-right in every word.
  *
  * Scale shape: training runs on the COLLAPSED (word, freq) vocabulary,
  * not the corpus (the q151 map-side collapse), so each round is one
  * explode + one groupBy over vocabulary-sized data; the chosen merge
  * rule is one driver-collected row per round (trainer state, the same
  * 1-row pattern as q83's corpus stats — a BPE merge table IS driver
  * state by nature), and the merged vocabulary is generation-cut per
  * round (the q132/q185 localCheckpoint lesson).
  */
object BpeTrainer {

  /** `words`: (wordCol: String, freqCol: Long). Returns the learned
    * merge rules in order plus the final tokenized vocabulary
    * (wordCol, freqCol, toks: Array[String]).
    */
  def train(words: DataFrame, wordCol: String, freqCol: String,
      rounds: Int): (Seq[(String, String)], DataFrame) = {
    var toks = words.select(col(wordCol), col(freqCol),
      split(col(wordCol), "").as("toks"))
    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to rounds) {
      val best = toks
        // single-token words have no pairs — and sequence(1, 0) DESCENDS
        // in Spark (the q77/q151 lesson), which would fabricate
        // null-padded pairs instead of an empty list
        .where(size(col("toks")) >= 2)
        .select(col(freqCol),
          explode(expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> struct(toks[i - 1] AS l, toks[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(freqCol).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, r) = (best(0).getAs[String]("l"), best(0).getAs[String]("r"))
        merges += ((l, r))
        toks = toks.withColumn("toks", applyMerge(col("toks"), l, r))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq, toks)
  }

  /** One greedy left-to-right merge pass: fold the token list, fusing a
    * token equal to `r` onto a preceding accumulated token equal to `l`.
    * After a fusion the merged token is l+r, so an overlapping occurrence
    * ("aaa" under (a,a)) correctly yields [aa, a]. Columns (not SQL
    * strings) so token text can't inject syntax. Shared by the trainer
    * and the corpus encoder, which is what makes encode(word) reproduce
    * the trained tokenization exactly.
    */
  def applyMerge(toks: org.apache.spark.sql.Column, l: String, r: String)
      : org.apache.spark.sql.Column =
    aggregate(toks,
      array().cast("array<string>"),
      (acc, t) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && t === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(lit(l), lit(r)))))
        .otherwise(concat(acc, array(t))))

  /** Corpus-scale ENCODE with a trained merge table — the tokenizer
    * data-prep step (ref `twitter-analytics/code/2-model_training/
    * train_bert.py` applies a trained tokenizer to every tweet before
    * training): split each word to characters and apply the merge rules
    * in learned rank order. The merge table is baked into the column
    * expression (literal ranks — the broadcast of a merge table is the
    * expression tree itself), so encoding is a pure map-side pass: no
    * shuffle, no state, applicable to any word column regardless of
    * corpus size. Returns `words` + a `toks` column.
    */
  def encode(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val encoded = merges.foldLeft(split(col(wordCol), "").as("toks")) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    words.withColumn("toks", encoded)
  }
}
