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

  test("trainLocal matches the sequential trainer merge-for-merge") {
    import spark.implicits._
    val (m1, _) = BpeTrainer.train(vocab(), "w", "f", rounds = 3)
    val (m2, _) = BpeTrainer.trainLocal(vocab(), "w", "f", rounds = 3)
    assert(m2 == m1)

    // 100-merge property on a deterministic 60-word vocabulary (base-4
    // digit strings, mixed lengths/frequencies): identical merge
    // sequence AND identical tokenized vocabulary, including identical
    // early-stop when the pair supply runs dry.
    val big = (0 until 60)
      .map(i => (java.lang.Integer.toString(i * 7 + 13, 4), (i % 9 + 1).toLong))
      .toDF("w", "f")
    val (s1, t1) = BpeTrainer.train(big, "w", "f", rounds = 100)
    val (s2, t2) = BpeTrainer.trainLocal(big, "w", "f", rounds = 100)
    assert(s2 == s1,
      s"diverged at ${s1.zip(s2).indexWhere(p => p._1 != p._2)}: " +
        s"${s1.take(5)}... vs ${s2.take(5)}...")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getAs[collection.Seq[String]]("toks")).toMap
    assert(toMap(t1) == toMap(t2))
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
