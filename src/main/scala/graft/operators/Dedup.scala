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

  /** LSH banding keys per doc. Base hashes are materialized through an
    * `explode` generator (one md5 per shingle, total) and the 32 permuted
    * minima become 32 `min` aggregates of one hash-per-row frame — inlining
    * the signature into band expressions instead would replay the md5
    * hashing per perm/band and explode codegen compile time (measured 51s
    * on the sf0.1 bench vs ~1s this way).
    */
  /** Per-doc signature frame `(doc, s0..s{numPerms-1})` via the exploded
    * min-aggregate path (one md5 per shingle total — see `bandKeysRows`'s
    * codegen note). Shared by LSH banding and the estimator-accuracy
    * measurement (q195).
    */
  def signatures(
      docs: DataFrame, idCol: String, textCol: String, p: MinHashParams): DataFrame = {
    val hsRows = docs
      .where(size(TextFunctions.tokens(col(textCol))) >= p.shingleSize)
      .select(col(idCol).as("doc"),
        explode(transform(shingles(col(textCol), p.shingleSize),
          s => TextFunctions.hash60(s) % p.baseMod)).as("h"))
    val sigCols = (0 until p.numPerms).map { i =>
      val a = 2L * i + 1; val b = 98765L * i + 12345L
      min((col("h") * a + b) % p.prime).as(s"s$i")
    }
    hsRows.groupBy("doc").agg(sigCols.head, sigCols.tail: _*)
  }

  def bandKeysRows(
      docs: DataFrame, idCol: String, textCol: String, p: MinHashParams): DataFrame = {
    val rows = p.numPerms / p.bands
    val sig = signatures(docs, idCol, textCol, p)
    val bandStructs = (0 until p.bands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", (0 until rows).map(r => col(s"s${bnd * rows + r}")): _*).as("key"))
    }
    sig.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate near-duplicate pairs: docs sharing any band bucket.
    * The self-join is on (band, key) — shuffle fan-in bounded by bucket
    * size, and ReuseExchange shares the band-key shuffle between the two
    * sides. Returns distinct (id1 < id2) pairs.
    *
    * `maxBucket` caps occupancy per band bucket (smallest ids kept,
    * deterministic): pair count is quadratic in bucket size, and on a
    * duplicate-heavy corpus one "celebrity" bucket would otherwise emit
    * billions of pairs. Uncapped by default — q59's oracle replays the
    * exact uncapped semantics.
    */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(),
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val keyedAll = bandKeysRows(docs, idCol, textCol, p)
    val keyed =
      if (maxBucket == Int.MaxValue) keyedAll
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "key").orderBy("doc")
        keyedAll.withColumn("rn", row_number().over(w))
          .where(col("rn") <= maxBucket).drop("rn")
      }
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

  /** Hamming-LSH banded candidate pairing over any integer sketch
    * column (SimHash, perceptual hash, …): split the sketch into
    * `nBands` contiguous `bandBits`-bit keys — any shared (band, key)
    * pairs the ids — cap bucket occupancy (pair count is quadratic in
    * bucket size), then filter by the EXACT Hamming distance. Returns
    * (id1, id2, hamming) with id1 < id2, distinct. One (band, key)
    * shuffle; never all-pairs. Fixed band width saturates at
    * n ≈ 2^bandBits — grow the sketch with the corpus (q355→q356).
    */
  def hammingBandPairs(hashed: DataFrame, idCol: String, hashCol: String,
      nBands: Int, bandBits: Int, cap: Int, maxHamming: Int): DataFrame = {
    val mask = (1L << bandBits) - 1L
    val banded = hashed
      .select(col(idCol).as("_id"), col(hashCol).as("_h"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("key", expr(s"shiftright(_h, band * $bandBits) & $mask"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "key").orderBy("_id")
    val capped = banded.withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap).drop("rn")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("b._id").as("id2"),
        col("a._h").as("h1"), col("b._h").as("h2"))
      .distinct()
      .withColumn("hamming", expr("cast(bit_count(h1 ^ h2) as bigint)"))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Per-doc 60-bit SimHash via the exploded one-md5-per-token path —
    * the `signatures` lesson applied to SimHash: the inline `simhash60`
    * expression re-hashes every token 60× (once per bit), because each
    * bit's aggregate re-evaluates the token-hash transform; exploding
    * the token hashes once and taking 60 `sum` aggregates of the same
    * row frame computes each md5 exactly once. On the bounded q361
    * population the win is modest (1.69→1.41 s sf0.1 — codegen compile
    * dominates at 300 docs) but the per-token cost is 60× lower, which
    * is what matters on an UNBOUNDED corpus. Same values as `simhash60`
    * bit for bit.
    */
  def simhashRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hs = docs.select(col(idCol).as("doc"),
      explode(transform(TextFunctions.tokens(col(textCol)),
        t => TextFunctions.hash60(t))).as("h"))
    val bitSums = (0 until 60).map { j =>
      sum(expr(s"(shiftright(h, $j) % 2) * 2 - 1")).as(s"b$j")
    }
    val sim = (0 until 60).map(j =>
      expr(s"IF(b$j > 0, shiftleft(cast(1 as bigint), $j), 0L)"))
      .reduce(_ + _)
    hs.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc"), sim.as("sim"))
  }

  /** Distributed connected components over an (id1, id2) pair graph by
    * iterative min-label propagation WITH pointer jumping: each round
    * takes label(v) <- min over neighbors' labels, then shortcuts through
    * the label mapping itself (label(v) <- label(label(v))), which halves
    * remaining path lengths — convergence is O(log diameter) rounds, so
    * the default `maxIter` covers any realistic chain (LSH duplicate
    * clusters are near-cliques and settle in 2-3 rounds). Each round is
    * three key shuffles; lineage is truncated per round with an eager
    * checkpoint (reliable when the session has a checkpoint dir, executor-
    * local otherwise). `Dataset.unpersist` is a no-op on checkpoint-backed
    * frames (their storage is not in the CacheManager), so each
    * generation is reclaimed through the `LogicalRDD`'s RDD handle once
    * the next generation is materialized — `unpersist()` for
    * localCheckpoint blocks, checkpoint-FILE deletion
    * (`GraftCheckpointBridge.cleanCheckpointFiles`) for reliable
    * checkpoints, where unpersist would touch nothing. The FINAL
    * generation's storage is deliberately retained: it IS the returned
    * frame's only materialization and is not recomputable once deleted
    * (localCheckpoint truncates lineage; reliable files are the data), so
    * freeing it would turn any later read into a hard failure. It is two
    * longs per node — released with the session / checkpoint-dir cleanup.
    * Note localCheckpoint blocks die with their executor — set a
    * checkpoint dir on long multi-hour runs.
    * Convergence is detected from a `chg` flag carried INSIDE the
    * materialized frame (did this round change the node's label?), so the
    * check is a filter-count over already-checkpointed blocks, not an
    * extra self-join per round. Nothing is collected to the driver except
    * that count — the scale-safe replacement for driver-side union-find.
    * THROWS on non-convergence rather than returning split components.
    *
    * Returns (id, label) for every node that appears in `pairs`, where
    * label is the minimum id in the node's component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    val edges = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .persist()
    // (frame with truncated lineage, handle that releases its storage).
    // checkpoint()/localCheckpoint() store InternalRows directly — no
    // Row round-trip — and are eager by default.
    def cut(df: DataFrame): (DataFrame, () => Unit) = {
      val out = if (reliable) df.checkpoint() else df.localCheckpoint()
      val handle = org.apache.spark.sql.GraftSqlBridge.materializedRdd(out)
      val free = () => handle.foreach { rdd =>
        if (reliable) org.apache.spark.GraftCheckpointBridge.cleanCheckpointFiles(rdd)
        else rdd.unpersist(false)
      }
      (out, free)
    }
    var (labels, freeLabels) = cut(edges.groupBy("src").agg(min("dst").as("nbr"))
      .select(col("src").as("id"), least(col("src"), col("nbr")).as("label")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy("src").agg(min("label").as("nbr_label"))
      val hop = labels
        .join(nbrMin.select(col("src").as("id"), col("nbr_label")), Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // pointer jumping through the previous generation's mapping. Skipped
      // on round 1: near-clique LSH graphs converge before it can help,
      // and the extra join is pure cost there; long chains still get
      // O(log diameter) from round 2 on.
      val stepped = if (i == 0) hop
      else hop
        .join(labels.select(col("id").as("pid"), col("label").as("plabel")),
          hop("label") === col("pid"), "left")
        .select(hop("id"), hop("old_label"),
          least(hop("label"), coalesce(col("plabel"), hop("label"))).as("label"))
      val (next, freeNext) = cut(stepped
        .select(col("id"), col("label"), (col("label") =!= col("old_label")).as("chg")))
      val changed = next.where(col("chg")).count() // reads checkpointed blocks
      freeLabels() // next is materialized; previous generation can go
      labels = next.select("id", "label")
      freeLabels = freeNext
      converged = changed == 0L
      i += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds; raise maxIter")
    // The final generation is returned as-is, storage retained (see the
    // Scaladoc): an earlier revision persist()ed it and then freed the
    // checkpoint underneath, which made eviction of any cached partition a
    // guaranteed hard failure — recompute needs exactly the storage freed.
    labels
  }

  /** Connected components of a BUCKET-CONFINED pair graph in ONE pass —
    * no iteration, no checkpoints, no edges×rounds joins.
    *
    * Applies when every edge lives inside one bucket and every node is
    * assigned to exactly one bucket (the celled/binned similarity
    * families: `Similarity.withScaledBin` gives each vector ONE
    * (cell, bin), so near-dup components can never span buckets). Under
    * that invariant the global components ARE the per-bucket components,
    * and each bucket's subgraph is occupancy-capped (withScaledBin holds
    * ~2·10³ nodes/bucket, ≤ occ² edges) — small enough for an in-task
    * union-find. One
    * shuffle on the bucket key replaces the iterative machinery; at the
    * sf100 rung this turned q113's CC stage from 304 s (min-label
    * propagation, 177 M directed edges × rounds) into a single pass.
    *
    * NOT for graphs whose nodes sit in several buckets (MinHash LSH
    * bands, multiprobe ANN): a node shared by two buckets merges them,
    * and only the iterative `connectedComponents` sees that. Union by
    * min-root + path compression: the surviving root is the component's
    * min id, matching `connectedComponents` labels exactly.
    *
    * `pairs` must carry `bucketCols` ++ (id1, id2). Ids must be integral
    * (byte/short/int/long) — unlike the type-generic
    * `connectedComponents`, the in-task union-find keys a primitive-Long
    * map, and a silent cast from string/decimal would turn a bad schema
    * into nulls; non-integral id columns are rejected at build time
    * instead. Returns (id, label) over every id that appears in a pair —
    * same label contract as `connectedComponents`.
    *
    * The caller's occupancy invariant is enforced IN the task: a bucket
    * holding more than `spark.graft.bucketedCC.maxBucketNodes` distinct
    * ids (default 2^20) fails with the bucket key named, before the
    * union-find map can pressure executor heap — the same guard
    * discipline as PrefixScan's per-partition key-run cap. A graph that
    * trips it is not bucket-confined at sane occupancy; route it to the
    * iterative `connectedComponents` rather than raising the cap.
    */
  def bucketedComponents(pairs: DataFrame, bucketCols: Seq[String]): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    Seq("id1", "id2").foreach { c =>
      val dt = pairs.schema(c).dataType
      require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
        s"bucketedComponents requires integral ids; '$c' is ${dt.typeName}" +
          " — the in-task union-find keys primitive longs (a cast would" +
          " silently null non-integral values). Map ids to longs first," +
          " or use the type-generic iterative connectedComponents.")
    }
    val maxBucketNodes = spark.conf
      .get("spark.graft.bucketedCC.maxBucketNodes", (1 << 20).toString).toInt
    pairs
      // the separator keeps composite keys distinct (bare concat reads
      // (1,11) and (11,1) as one group) — a collision could not corrupt
      // components (they only merge through shared ids), but it would
      // break the per-group size bound the in-task union-find relies on
      .select(concat_ws("_", bucketCols.map(col(_).cast("string")): _*)
        .as("bk"), col("id1").cast("long"), col("id2").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (bk, it) =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        it.foreach { case (_, a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          // fail before the map grows past the cap, not after the heap does
          if (parent.size > maxBucketNodes) throw new IllegalStateException(
            s"bucketedComponents bucket '$bk' holds more than " +
              s"$maxBucketNodes distinct ids — the one-pass union-find is " +
              "only safe under the caller's bucket-occupancy invariant " +
              "(e.g. Similarity.withScaledBin's cap). This graph is not " +
              "bucket-confined at sane occupancy: use the iterative " +
              "Dedup.connectedComponents, or raise " +
              "spark.graft.bucketedCC.maxBucketNodes only if executor " +
              "heap is provisioned for the per-bucket map.")
          val ra = find(a); val rb = find(b)
          if (ra != rb) parent(ra max rb) = ra min rb // min root survives
        }
        parent.keys.toArray.iterator.map(id => (id, find(id)))
      }
      .toDF("id", "label")
  }

  /** Full near-dup dedup: LSH candidate pairs -> connected components ->
    * keep the min-id representative of each component.
    *
    * Components are resolved with distributed min-label propagation
    * (`connectedComponents`) — no `collect()` anywhere in the path, so a
    * duplicate-heavy corpus can't blow the driver. `maxBucket` bounds the
    * quadratic pair fan-out of any one LSH bucket; the default (10000) is
    * the SCALE configuration — a bucket over the cap silently contributes
    * only its 10000 smallest ids' pairs, which can split a giant
    * component. The oracle-verified q76 passes Int.MaxValue explicitly:
    * capped and uncapped are intentionally different contracts, pick by
    * corpus dirtiness. Returns the input plus (rep_id, is_kept).
    */
  def dedupNearDupes(
      docs: DataFrame, idCol: String, textCol: String,
      p: MinHashParams = MinHashParams(),
      maxBucket: Int = 10000): DataFrame = {
    val pairs = lshCandidatePairs(docs, idCol, textCol, p, maxBucket)
    val reps = connectedComponents(pairs)
      .select(col("id").as(idCol), col("label").as("rep_id"))
    docs.join(reps, Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col(idCol)))
      .withColumn("is_kept", col("rep_id") === col(idCol))
  }

  /** ExactSubstr-style span excision (the REMOVAL pass the measurement
    * queries q190/q482 budget for): every k-token span that occurs more
    * than once in the corpus is excised from every occurrence EXCEPT the
    * canonical one — the lexicographically-minimal (id, position) — and
    * each document is reassembled from its surviving tokens in order.
    * Unlike doc-level dedup (exact/MinHash), this removes verbatim
    * boilerplate EMBEDDED in otherwise-unique documents, the case Lee et
    * al. showed doc-level passes miss.
    *
    * Token positions are 1-based (mirrors DuckDB `generate_subscripts`,
    * so the whole operator is oracle-checkable). Overlapping duplicated
    * spans union their covered positions — excision is per-token, not
    * per-span, so a token is dropped once no matter how many duplicated
    * windows cover it.
    *
    * Span identity is 120 bits — both 60-bit halves of one md5
    * (`hash60`/`hash60lo`): this operator REWRITES kept training text,
    * so unlike the measurement queries (q190/q482) a hash collision
    * would silently excise unique content. At 1e9 spans the expected
    * 120-bit collision count is ~n²/2^121 ≈ 4e-19 — negligible — and
    * the oracle replays both halves, so parity is collision-for-collision
    * exact anyway.
    *
    * Scale shape — built for the operator's MOTIVATING input, a
    * boilerplate-heavy web corpus where one verbatim span occurs in a
    * large fraction of ALL documents (Lee et al.'s own use-case): the
    * occurrence count and canonical occurrence come from a two-phase
    * hash aggregate on the span hash (map-side partials collapse a hot
    * span to one row per map task, so no reducer ever sees its raw
    * occurrence list), joined back to the occurrence stream with a
    * shuffled-HASH join (`shuffle_hash` hint): the probe side STREAMS
    * through the per-partition build table, so a span occurring in f*N
    * documents costs one task a linear scan of f*N rows — never an
    * external sort of them — and AQE's skew-join split can still divide
    * that partition (OptimizeSkewedJoin covers SHJ/SMJ; it cannot split
    * a Window partition, which is why the round-13 single-window shape
    * was retired: `Window.partitionBy(h, h2)` colocated every occurrence
    * of a hot span into ONE unsplittable sort task). The shingle scan
    * feeds both the aggregate branch and the probe branch; then a
    * bounded k× interval explode on duplicated occurrences only and a
    * (id, position) anti-join against the token stream.
    *
    * STORAGE CONTRACT (`occStorage`): by default (None) the operator is
    * fully stateless — the shingle scan runs twice (aggregate + probe
    * branch), both passes whole-stage-codegen'd, and no cached state
    * survives the call (the round-12 leak: a long-lived session
    * composing `exciseKept` accumulated orphaned shingle blocks;
    * DedupSpec pins zero persistent RDDs on this path). Passing
    * `Some(level)` persists the (id, p, h, h2) occurrence stream so the
    * tokenize+shingle+md5 work runs ONCE — the exciseKept convention:
    * the block lives for the lifetime of the returned DataFrame and the
    * session owner releases it (`spark.catalog.clearCache()`, as
    * Verify/Bench do after every query). At corpus scale the stream is
    * ~tokens×32 bytes — pass DISK_ONLY there (or keep None: two codegen
    * scans of the source can beat caching a corpus-sized block);
    * MEMORY_AND_DISK is right for report-sized runs.
    *
    * Returns (idCol, n_tokens, n_kept, n_excised, text_kept); documents
    * whose every token is excised come back with n_kept=0, text_kept="".
    */
  def exciseDupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8,
      occStorage: Option[org.apache.spark.storage.StorageLevel] = None)
      : DataFrame = {
    val toks = docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("i0", "tok")))
      .select(col(idCol), (col("i0") + 1).cast("long").as("i"), col("tok"))
    val occ0 = docs
      // shingles() mirrors DuckDB range semantics: on a doc shorter than k
      // tokens the 1..len-(k-1) sequence would DESCEND — guard first.
      .where(size(TextFunctions.tokens(col(textCol))) >= k)
      .select(col(idCol),
        posexplode(shingles(col(textCol), k)).as(Seq("p0", "sp")))
      .select(col(idCol), (col("p0") + 1).cast("long").as("p"),
        md5(col("sp")).as("m5")) // one digest; both halves derive from it
      .select(col(idCol), col("p"),
        conv(substring(col("m5"), 1, 15), 16, 10).cast("long").as("h"),
        conv(substring(col("m5"), 18, 15), 16, 10).cast("long").as("h2"))
    val occ = occStorage.map(occ0.persist).getOrElse(occ0)
    // two-phase partial aggregate: a hot span crosses the wire as ONE row
    // per map task, whatever its corpus frequency
    val spans = occ
      .groupBy("h", "h2")
      .agg(count(lit(1)).as("c"), min(struct(col(idCol), col("p"))).as("m"))
      .where(col("c") > 1)
    val covered = occ
      // shuffled-hash, not sort-merge: the probe (occurrence) side is the
      // skewed one and SHJ streams it — SMJ would re-introduce the hot
      // span's single-task external sort on the probe side. The build
      // side is one row per DUPLICATED span, uniform by construction
      // (distinct hashes), so the per-partition hash table stays small
      // at any corpus size provided shuffle partitions scale with data.
      .join(spans.hint("shuffle_hash"), Seq("h", "h2"))
      .where(!(col(idCol) === col("m")(idCol) && col("p") === col("m")("p")))
      .select(col(idCol),
        explode(sequence(col("p"), col("p") + (k - 1))).as("i"))
      .distinct()
    // (r15 tried rebuilding text only for TOUCHED docs — untouched docs'
    // text_kept is lower(text) by split/join inversion — but the extra
    // `covered` consumers (touched-id distinct + semi-join) defeat
    // exchange reuse: column pruning specializes each copy's ReadSchema,
    // the canonicalized plans stop matching, and the skew-heavy
    // join-back chain planned THREE times instead of once. Local bench
    // flat-to-worse, strictly worse on the boilerplate-heavy corpus the
    // operator exists for. Single-consumer `covered` stays.)
    val kept = toks.join(covered, Seq(idCol, "i"), "left_anti")
    val perDoc = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          x => x.getField("tok")), " ").as("text_kept"))
    docs
      .select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_excised"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }
}
