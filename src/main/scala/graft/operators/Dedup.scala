package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document deduplication suite for training-data pipelines: exact hash,
  * n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * Everything is declarative (higher-order array functions over a md5-based
  * 60-bit hash both engines compute identically), so the whole suite is
  * DuckDB-oracle-checkable and stays inside Catalyst. Scale shape: MinHash
  * LSH is the linear-time path — signatures are one map-side pass; the only
  * shuffle is the band-key self-join, whose fan-in per key is bounded by
  * bucket size, not corpus size. Exact/Jaccard pairwise verification is
  * reserved for in-bucket candidates.
  */
object Dedup {

  case class MinHashParams(
      numPerms: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      baseMod: Long = 1000003L,
      prime: Long = 2147483647L)

  /** Exact duplicate groups by content fingerprint (hash groupBy). */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles of lower-cased text (1-based slice, inclusive
    * sequence — mirrors DuckDB `range`/list indexing exactly).
    */
  def shingles(text: Column, n: Int): Column = {
    val w = TextFunctions.tokens(text)
    transform(sequence(lit(1), size(w) - (n - 1)),
      i => array_join(slice(w, i, lit(n)), " "))
  }

  /** Per-shingle base hash: md5-60bit mod `baseMod` (engine-portable). */
  private def baseHashes(text: Column, p: MinHashParams): Column =
    transform(shingles(text, p.shingleSize),
      s => TextFunctions.hash60(s) % p.baseMod)

  /** MinHash signature: for perm i, min over shingles of
    * ((2i+1)*h + 98765i + 12345) mod prime.
    */
  def minhashSignature(text: Column, p: MinHashParams = MinHashParams()): Column = {
    val hs = baseHashes(text, p)
    array((0 until p.numPerms).map { i =>
      val a = 2L * i + 1; val b = 98765L * i + 12345L
      array_min(transform(hs, h => (h * a + b) % p.prime))
    }: _*)
  }

  /** LSH banding: (band index, joined band values) keys per doc. */
  def bandKeys(sig: Column, p: MinHashParams): Column = {
    val rows = p.numPerms / p.bands
    array((0 until p.bands).map { b =>
      struct(lit(b).as("band"),
        array_join(slice(sig, b * rows + 1, rows), "_").as("key"))
    }: _*)
  }

  /** Candidate near-duplicate pairs: docs sharing any band bucket.
    * The self-join is on (band, key) — shuffle fan-in bounded by bucket
    * size. Returns distinct (id1 < id2) pairs.
    */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams()): DataFrame = {
    val keyed = docs
      .where(size(TextFunctions.tokens(col(textCol))) >= p.shingleSize)
      .select(col(idCol).as("doc"),
        explode(bandKeys(minhashSignature(col(textCol), p), p)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
    keyed.as("a").join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id1"), col("b.doc").as("id2"))
      .distinct()
  }

  /** Exact token-set Jaccard similarity of two text columns. */
  def jaccardTokens(a: Column, b: Column): Column = {
    val ad = array_distinct(TextFunctions.tokens(a))
    val bd = array_distinct(TextFunctions.tokens(b))
    val inter = size(array_intersect(ad, bd))
    inter.cast("double") / (size(ad) + size(bd) - inter)
  }

  /** 60-bit SimHash over word tokens (each occurrence votes +-1 per bit).
    * Written as one SQL expression so shift amounts can be lambda variables
    * (the Scala `shiftright` helper only takes literal counts) and so the
    * DuckDB oracle can mirror it verbatim.
    */
  def simhash60(textCol: String): Column = expr(
    s"""aggregate(
          zip_with(
            transform(sequence(0, 59), j -> IF(
              aggregate(
                transform(split(lower($textCol), ' '),
                  t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)),
                cast(0 as bigint),
                (acc, h) -> acc + (shiftright(h, j) % 2) * 2 - 1) > 0,
              cast(1 as bigint), cast(0 as bigint))),
            sequence(0, 59),
            (bit, j) -> shiftleft(bit, j)),
          cast(0 as bigint), (acc, x) -> acc + x)""")

  /** Hamming distance between two simhashes (near-dup test at radius k). */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
