package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer

/** The canonical BPE walk-through (Sennrich et al. 2016's low/lower/
  * newest/widest vocabulary): merge order and final segmentation are
  * fully determined, so the trainer is pinned end to end.
  */
class BpeTrainerSpec extends SparkSpec {

  def vocab() = {
    import spark.implicits._
    // the 1-char word is pair-free and must not perturb training (a
    // descending sequence(1, 0) would fabricate null pairs — q77 lesson)
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("a", 100L)).toDF("w", "f")
  }

  test("learns the canonical merge sequence") {
    // round 1: es = 9 ties st = 9 -> (e,s) by lexicographic tie-break;
    // round 2: es+t = 9; round 3: lo = 7 ties ow = 7 -> (l,o)
    val (merges, toksDf) = BpeTrainer.train(vocab(), "w", "f", rounds = 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val toks = toksDf.collect()
      .map(r => r.getAs[String]("w") -> r.getAs[collection.Seq[String]]("toks")).toMap
    assert(toks("newest") == Seq("n", "e", "w", "est"))
    assert(toks("widest") == Seq("w", "i", "d", "est"))
    assert(toks("low") == Seq("lo", "w"))
    assert(toks("lower") == Seq("lo", "w", "e", "r"))
  }

  test("overlapping pair merges greedily left-to-right") {
    import spark.implicits._
    val (merges, toksDf) =
      BpeTrainer.train(Seq(("aaa", 1L)).toDF("w", "f"), "w", "f", rounds = 1)
    assert(merges == Seq(("a", "a")))
    val toks = toksDf.collect()(0).getAs[collection.Seq[String]]("toks")
    assert(toks == Seq("aa", "a"))
  }

  test("encode with the trained merge table reproduces the trained tokenization") {
    val (merges, trained) = BpeTrainer.train(vocab(), "w", "f", rounds = 3)
    val enc = BpeTrainer.encode(vocab().select(col("w")), "w", merges)
      .collect()
      .map(r => r.getAs[String]("w") -> r.getAs[collection.Seq[String]]("toks"))
      .toMap
    trained.collect().foreach { r =>
      assert(enc(r.getAs[String]("w")) == r.getAs[collection.Seq[String]]("toks"),
        s"encode disagrees with training on '${r.getAs[String]("w")}'")
    }
    // and on a word the trainer never saw, merges still apply in order
    import spark.implicits._
    val unseen = BpeTrainer.encode(Seq("slowest").toDF("w"), "w", merges)
      .collect()(0).getAs[collection.Seq[String]]("toks")
    assert(unseen == Seq("s", "lo", "w", "est"))
  }
}
