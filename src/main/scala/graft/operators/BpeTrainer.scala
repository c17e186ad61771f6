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
  * not the corpus (the q151 map-side collapse). Two trainers share the
  * greedy semantics bit-for-bit (spec-proven): `train` recomputes pair
  * counts distributed each round and collects 1 row per merge — the
  * reference shape, right when rounds are few; `trainLocal` collects the
  * (capped) vocabulary once and closes the merge loop on the driver with
  * delta-maintained counts — the production shape, where a 32k-merge
  * budget costs zero additional cluster jobs. A BPE merge table IS
  * driver state by nature; the corpus-sized work (collapse, encode)
  * stays distributed in both.
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

  /** Single-collect trainer for REAL merge budgets: `train` above runs
    * one Spark job + one collect per merge rule (fine for a handful of
    * rounds, impractical at a 32k-merge vocabulary). Here the collapsed
    * (word, freq) vocabulary is collected ONCE — capped at `maxVocab`
    * rows by (freq desc, word asc), the standard trainer-side frequency
    * cutoff — and the merge loop runs on the driver with delta-maintained
    * pair counts: each merge updates only the counts of pairs inside the
    * words it touched, so 32k merges cost zero additional cluster jobs.
    * This is the shape production tokenizer trainers use: the corpus-
    * sized collapse is distributed, the vocabulary-sized closure is
    * local. The argmax order matches `train` exactly — (cnt desc, l, r)
    * with UTF-8 BYTE comparison, Spark's binary string order, not Java's
    * UTF-16 order. Returns the merges plus the tokenized vocabulary
    * (re-derived distributed via `encode`, which the spec proves agrees
    * with the sequential trainer's tokenization).
    */
  def trainLocal(words: DataFrame, wordCol: String, freqCol: String,
      rounds: Int, maxVocab: Int = 1 << 20): (Seq[(String, String)], DataFrame) = {
    val vocab: Array[(String, Long)] = words
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .orderBy(desc(freqCol), asc(wordCol)).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // byte-lexicographic order == Spark UTF8String binary comparison
    val byteOrd: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
    }
    val pairOrd: Ordering[(String, String)] =
      Ordering.Tuple2(byteOrd, byteOrd)

    val toks: Array[Array[String]] =
      vocab.map(_._1.toCharArray.map(_.toString))
    val counts = collection.mutable.HashMap.empty[(String, String), Long]
    val where = collection.mutable.HashMap
      .empty[(String, String), collection.mutable.Set[Int]]
    def addWord(idx: Int, sign: Long): Unit = {
      val t = toks(idx); val f = vocab(idx)._2 * sign
      var i = 0
      while (i < t.length - 1) {
        val p = (t(i), t(i + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts(p) = c
        // membership only ever grows (stale entries are re-checked against
        // the actual tokens in the merge pass, so over-approximation is
        // harmless and removal bookkeeping is unnecessary)
        if (sign > 0) where.getOrElseUpdate(p,
          collection.mutable.Set.empty[Int]) += idx
        i += 1
      }
    }
    toks.indices.foreach(addWord(_, 1L))

    val merges = collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < rounds && counts.nonEmpty) {
      // argmax by (cnt desc, l asc, r asc) — identical to train's orderBy
      val best = counts.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && pairOrd.lt(b._1, a._1))) b else a
      }
      val (l, r) = best._1
      merges += ((l, r))
      val affected = where.getOrElse((l, r), collection.mutable.Set.empty[Int])
        .toArray.sorted
      affected.foreach { idx =>
        val t = toks(idx)
        // re-check: membership may be stale after earlier merges
        var has = false
        var i = 0
        while (i < t.length - 1 && !has) {
          has = t(i) == l && t(i + 1) == r; i += 1
        }
        if (has) {
          addWord(idx, -1L)
          val out = collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < t.length) {
            if (j < t.length - 1 && t(j) == l && t(j + 1) == r) {
              out += l + r; j += 2
            } else { out += t(j); j += 1 }
          }
          toks(idx) = out.toArray
          addWord(idx, 1L)
        }
      }
      counts.remove((l, r))
      round += 1
    }
    (merges.toSeq, encode(words, wordCol, merges.toSeq))
  }

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
