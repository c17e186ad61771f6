package graft

/** graft_char_sample (q355/q356's native one-pass downsampler): value
  * parity with the ascii(substr(...)) SQL both engines agree on, including
  * non-ASCII and supplementary-plane code points, and the empty-string
  * zeros convention.
  */
class CharSampleSpec extends SparkSpec {

  test("parity with the per-cell ascii(substr(...)) chain, ASCII + unicode") {
    for (s <- Seq("the quick brown fox jumps over the lazy dog 0123456789",
        "héllo wörld — ünïcode é́ mixed text with accents etc",
        "emoji 😀 and 🔥 supplementary plane chars here")) {
      val lit = s.replace("'", "''")
      val cells = 7
      val chain = (0 until cells).map(i =>
        s"cast(ascii(substr('$lit', cast(1 + ($i * length('$lit')) div $cells as int), 1)) as bigint)")
        .mkString("array(", ", ", ")")
      val r = spark.sql(
        s"SELECT graft_char_sample('$lit', $cells) AS a, $chain AS b")
        .collect().head
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch for: $s")
    }
  }

  test("empty string yields all zeros; null propagates") {
    val r = spark.sql("SELECT graft_char_sample('', 4) AS a").collect().head
    assert(r.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L))
    val n = spark.sql(
      "SELECT graft_char_sample(CAST(NULL AS STRING), 4) AS a").collect().head
    assert(n.isNullAt(0))
  }
}
