package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Training-data pipeline operators over `documents`/`embeddings`:
  * text analysis (language-ID, quality, tokens, fingerprints, tonal
  * scoring), dedup (exact, Jaccard, MinHash+LSH, SimHash) and embedding
  * similarity search. All but none are rows-only: every query here has a
  * DuckDB oracle, including MinHash/SimHash (md5-based 60-bit hashes both
  * engines compute identically) and cosine top-k (explicit 64-term IEEE
  * sums).
  */
object Training {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private val posWords = Seq("fast", "big", "spark")
  private val negWords = Seq("slow", "small", "filter")

  /** Seedlist in the reference's mixed shape
    * (`twitter-analytics/code/3-model_evaluation/preliminary/
    * check_presence_seedlist_keyword.py:44-75`): plain n-gram substrings
    * plus gap regexes (`[\w\s]*` between anchor words), matched over the
    * lowercased text, regexes first. Patterns are drawn from the corpus
    * vocabulary; the reference's are labor-market phrases.
    */
  private val seedNgrams = Seq("slow query", "hash join", "big table")
  private val seedRegexes =
    Seq("fast[\\w\\s]* scan", "(^|\\W)sort[\\w\\s]* merge", "stream[\\w\\s]* batch")

  /** (n_regex_hits, n_ngram_hits, flag) columns of the seedlist match —
    * shared by q210 (tagging) and q211 (recall along the rank cut).
    */
  private def seedlistCols: (Column, Column, Column) = {
    val tl = lower(col("text"))
    val rx = seedRegexes.map(p => tl.rlike(p).cast("long")).reduce(_ + _)
    val ng = seedNgrams.map(p => tl.contains(p).cast("long")).reduce(_ + _)
    (rx, ng, ((rx > 0) || (ng > 0)).cast("long"))
  }

  /** Winnowing fingerprint frame (doc_id, n_grams, fp) shared by q284 /
    * q302 — word 4-grams, window-of-4 minima (Schleimer et al. 2003).
    * Gram hashing is a 64-bit-safe polynomial over per-TOKEN hashes
    * instead of one md5 per gram string: each token is md5'd ONCE
    * (hash60 mod 2^30) and the 4 grams spanning it reuse that value
    * through Horner's rule mod p = 2^31-1 (B = 1000003; intermediates
    * bound by ~2^52 — exact BIGINT in both engines, so the oracle
    * replays it as plain integer arithmetic). Cuts the dominant hash
    * cost ~4x in hashed bytes vs md5-per-gram; selection stays per-row
    * HOF expressions (map-side, no shuffle).
    */
  private def winnowFingerprints(s: SparkSession, d: String): DataFrame = {
    val kG = 4; val wWin = 4
    val toks = TextFunctions.tokens(col("text"))
    t(s, d, "documents")
      // ≥ k + w - 1 tokens ⇔ at least one window of w gram hashes
      .where(size(toks) >= kG + wWin - 1)
      .select(col("doc_id"),
        (size(toks) - (kG - 1)).cast("long").as("n_grams"),
        transform(toks,
          tk => pmod(TextFunctions.hash60(tk), lit(1073741824L))).as("ht"))
      // ht[] is 0-based in Spark SQL exprs; gram i (1-based) = tokens
      // i-1 .. i+2
      .withColumn("hs", expr(s"""transform(sequence(1, size(ht) - 3),
          i -> ((((ht[i-1] * $WinnowB + ht[i]) % $WinnowP) * $WinnowB
                 + ht[i+1]) % $WinnowP * $WinnowB + ht[i+2]) % $WinnowP)"""))
      .select(col("doc_id"), col("n_grams"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("hs")) - (wWin - 1)),
          i => array_min(slice(col("hs"), i, lit(wWin)))))).as("fp"))
  }
  private val WinnowP = 2147483647L // 2^31 - 1
  private val WinnowB = 1000003L
  private val WinnowP2 = 2147483629L // the next 31-bit prime down

  /** 62-bit polynomial k-gram hash expr over a per-token hash array
    * `ht` (hash60 mod 2^30 — ONE md5 per token): two Horner chains mod
    * distinct 31-bit primes packed into one BIGINT (intermediates
    * ≤ ~2^52, the pack ≤ ~2^62 — exact in both engines). `i0` is the
    * first token index of the gram — `"i-1"` for Spark's 0-based SQL
    * arrays, `"i"` for DuckDB's 1-based lists — so the same builder
    * emits both sides. Collision odds over 62 bits at 10^8 distinct
    * grams are ~10^-3 per corpus: the standard hashed-shingle identity
    * for dedup/contamination work at scale, replacing per-gram md5 AND
    * gram-string materialization/shuffle.
    */
  private def gramHash62(i0: String, k: Int, arr: String = "ht"): String = {
    def chain(p: Long) = (1 until k).foldLeft(s"$arr[$i0]")((acc, j) =>
      s"(($acc) * $WinnowB + $arr[$i0 + $j]) % $p")
    s"(${chain(WinnowP)}) * 2147483648 + (${chain(WinnowP2)})"
  }

  /** Spark-side (doc_id, source, ht) stage: tokens → per-token hashes. */
  private def tokenHashes(df: DataFrame, minToks: Int): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    df.where(size(toks) >= minToks)
      .select(col("doc_id"), col("source"),
        transform(toks,
          tk => pmod(TextFunctions.hash60(tk), lit(1073741824L))).as("ht"))
  }

  /** The matching DuckDB token-hash list expr. */
  private val tokenHashesSql: String =
    s"""list_transform(string_split(lower(text), ' '),
        t -> ${h60("t")} % 1073741824)"""

  /** The matching DuckDB CTE chain (base → ht → hs → fps) for the
    * winnowing oracles; DuckDB lists are 1-based.
    */
  private val winnowFpsCtes: String =
    s"""base AS (
         SELECT doc_id, string_split(lower(text), ' ') AS w
         FROM documents
         WHERE len(string_split(lower(text), ' ')) >= 7),
       tokh AS (
         SELECT doc_id, CAST(len(w) - 3 AS BIGINT) AS n_grams,
           list_transform(w, t ->
             CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)
               % 1073741824) AS ht
         FROM base),
       hs AS (
         SELECT doc_id, n_grams,
           list_transform(range(1, len(ht) - 2),
             i -> ((((ht[i] * $WinnowB + ht[i+1]) % $WinnowP) * $WinnowB
                    + ht[i+2]) % $WinnowP * $WinnowB + ht[i+3]) % $WinnowP)
             AS h
         FROM tokh),
       fps AS (
         SELECT doc_id, n_grams, unnest(list_distinct(
           list_transform(range(1, len(h) - 2),
             i -> list_min(h[i:i+3])))) AS fp
         FROM hs)"""

  /** Fixture logistic-model weights for q342 (model_id, per-pattern
    * w_e6 — 3 regex then 3 ngram features, in seedlist order — b_e6).
    * Values are arbitrary but fixed; the spec plants its own.
    */
  private val lrModelRows: Seq[(Long, Seq[Long], Long)] = Seq(
    (0L, Seq(900000L, 750000L, 600000L, 450000L, 300000L, 150000L), -500000L),
    (1L, Seq(-300000L, 800000L, -200000L, 700000L, 100000L, 400000L), -250000L),
    (2L, Seq(120000L, -340000L, 560000L, -780000L, 910000L, -130000L), 50000L))

  private def seedlistSql: (String, String, String) = {
    val rx = seedRegexes
      .map(p => s"CAST(regexp_matches(lower(text), '$p') AS BIGINT)")
      .mkString("(", " + ", ")")
    val ng = seedNgrams
      .map(p => s"CAST(contains(lower(text), '$p') AS BIGINT)")
      .mkString("(", " + ", ")")
    (rx, ng, s"CAST($rx > 0 OR $ng > 0 AS BIGINT)")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // language-ID heuristic (argmax stopword hits, first-listed wins ties).
    "q52_lang_id" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("pred_lang"))
    }),

    // quality scoring for a training-data filter.
    "q53_quality_score" -> ((s, d) => {
      t(s, d, "documents")
        .withColumn("q", TextFunctions.qualityScore(col("text")))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"),
          col("q.n_tokens").as("n_tokens"), col("q.alpha_ratio").as("alpha_ratio"),
          col("q.stop_ratio").as("stop_ratio"),
          col("q.mean_token_len").as("mean_token_len"), col("q.keep").as("keep"))
    }),

    // token counting: whitespace vs alnum-regex tokenizer.
    "q54_token_count" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_ws"),
        TextFunctions.alnumTokenCount(col("text")).cast("long").as("n_alnum"))
    }),

    // content fingerprint (md5 of canonical normalization).
    "q55_fingerprint" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
    }),

    // exact dedup groups by fingerprint.
    "q56_exact_dedup" -> ((s, d) => {
      Dedup.exactDupGroups(t(s, d, "documents"), "doc_id", "text")
    }),

    // F8 tonal scoring (news sentiment).
    "q57_tonal_score" -> ((s, d) => {
      t(s, d, "documents")
        .withColumn("sc", TextFunctions.tonalScore(col("text"), posWords, negWords))
        .select(col("doc_id"), col("sc.n_tokens").as("n_tokens"),
          col("sc.tf_pos").as("tf_pos"), col("sc.tf_neg").as("tf_neg"),
          col("sc.sentiment").as("sentiment"))
    }),

    // pairwise token-set Jaccard over a bounded range.
    "q58_jaccard_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 100)
      val a = docs.select(col("doc_id").as("id1"), col("text").as("ta"))
      val b = docs.select(col("doc_id").as("id2"), col("text").as("tb"))
      a.join(b, col("id1") < col("id2"))
        .withColumn("j", Dedup.jaccardTokens(col("ta"), col("tb")))
        .where(col("j") > 0.8)
        .select(col("id1"), col("id2"), floor(col("j") * 1e6).cast("long").as("j_e6"))
    }),

    // MinHash + LSH banding candidate pairs (32 perms, 8 bands x 4 rows).
    "q59_minhash_lsh" -> ((s, d) => {
      Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
    }),

    // 60-bit SimHash per document.
    "q60_simhash" -> ((s, d) => {
      t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), Dedup.simhash60("text").as("sim"))
    }),

    // brute-force cosine top-10 for three query vectors.
    "q61_cosine_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(10L, 20L, 30L)), 10)
    }),

    // LSH-bucketed ANN (8 data-derived hyperplanes), same output shape.
    "q62_ann_lsh" -> ((s, d) => {
      Similarity.lshTopK(t(s, d, "embeddings"), Seq(100L, 200L), 10, 8)
    }),

    // Embedding set-diversity (compute_diversity.py:34-39,163-167): the
    // mean-max-cosine diversity of the SELECTED set (top-64 by model
    // score, the threshold_calibrated top-rank cut) against a same-size
    // RANDOM baseline (hash-ordered — the reference's random_samples
    // draw, made deterministic). Score proxy = first embedding dim (the
    // q186 convention); both rank cuts use the scalable Ranking.globalRank
    // rather than a single-partition window. One output row per set:
    // lower mean-max similarity = more diverse selection.
    "q192_set_diversity" -> ((s, d) => {
      val scored = t(s, d, "embeddings").select(col("vec_id"), col("embedding"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6)
          .cast("long").as("score_e6"))
      // persisted: meanMaxCos uses each 64-row set as BOTH sides of its
      // self-top-1 — unpersisted, the rank chain (sort + zipWithIndex)
      // would replay per side. Harness clearCache releases them.
      val sel = graft.operators.Ranking
        .globalRank(scored, "rnk", desc("score_e6"), asc("vec_id"))
        .where(col("rnk") <= 64).select("vec_id", "embedding").persist()
      val rnd = graft.operators.Ranking
        .globalRank(scored.withColumn("h",
            TextFunctions.hash60(col("vec_id").cast("string"))),
          "rnk", asc("h"), asc("vec_id"))
        .where(col("rnk") <= 64).select("vec_id", "embedding").persist()
      Similarity.meanMaxCos(sel).select(lit("selected").as("set_name"),
          col("n"), col("mean_max_cos_e6"))
        .unionAll(Similarity.meanMaxCos(rnd).select(lit("random").as("set_name"),
          col("n"), col("mean_max_cos_e6")))
    }),

    // cosine near-duplicate pairs above a threshold, bounded range.
    "q63_cosine_neardup" -> ((s, d) => {
      Similarity.cosineNearDupPairs(t(s, d, "embeddings"), 200L, 0.25)
    }),

    // end-to-end near-dup dedup: LSH pairs -> distributed min-label
    // components -> min-id rep. Oracle-checked: DuckDB replays the
    // components with a recursive transitive-closure CTE. The oracle
    // replays UNCAPPED pair semantics, so the verified path passes
    // maxBucket=Int.MaxValue explicitly — the production default (10000)
    // is a deliberately different configuration that drops pairs inside
    // celebrity buckets and may split components vs this oracle.
    "q76_dedup_keep" -> ((s, d) => {
      Dedup.dedupNearDupes(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text",
        maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("rep_id"), col("is_kept"))
    }),

    // IVF ANN: probe the 2 nearest cells of a per-label centroid codebook
    // — the second bucketed scale path next to q62's hyperplane LSH.
    "q98_ann_ivf" -> ((s, d) => {
      Similarity.ivfTopK(t(s, d, "embeddings"), Seq(100L, 200L), 10, 2)
    }),

    // Boilerplate removal, CCNet-style: sentences occurring > 3 times
    // ACROSS the corpus are dropped from every document; the doc is
    // reassembled in original order. One explode + one count join —
    // linear in corpus size.
    "q102_line_dedup" -> ((s, d) => {
      val sent = t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), "\\.")).as(Seq("i", "s")))
      val cnt = sent.groupBy("s").agg(count(lit(1)).as("n"))
      sent.join(cnt, "s").where(col("n") <= 3)
        .groupBy("doc_id")
        .agg(md5(array_join(transform(
            array_sort(collect_list(struct(col("i"), col("s")))),
            x => x.getField("s")), ".")).as("fp"),
          count(lit(1)).as("n_kept"))
    }),

    // Within-document repetition ratio (RefinedWeb-style quality signal):
    // 1 - distinct/total tokens, in exact micro-units.
    "q103_repetition" -> ((s, d) => {
      val w = TextFunctions.tokens(col("text"))
      t(s, d, "documents").select(col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        floor((lit(1.0) - size(array_distinct(w)).cast("double") / size(w)) * 1e6)
          .cast("long").as("dup_ratio_e6"))
    }),

    // Sequence packing for pretraining: contiguous-fill assignment of
    // documents to fixed token-budget bins (2048), packed independently
    // per language so the cumsum window partitions by a key that scales
    // with data — no global single-partition window.
    "q106_packing" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(w))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          ((col("cum") - col("n_tokens")) / 2048).cast("long").as("bin"),
          ((col("cum") - col("n_tokens")) % 2048).as("offset_in_bin"))
    }),

    // Dataset mixture sampling: per-source keep rates (out of 1000)
    // applied via the deterministic content hash — the oracle-checkable,
    // reshard-stable twin of the seeded sampleBy (q41). This is how a
    // training mix downweights a crawl source without a seed whose
    // output depends on partitioning.
    "q105_source_mix" -> ((s, d) => {
      val rate = when(col("source") === "src0", 100)
        .when(col("source") === "src1", 800)
        .when(col("source") === "src2", 500)
        .otherwise(300)
      t(s, d, "documents")
        .where(TextFunctions.hash60(col("text")) % 1000 < rate)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"))
    }),

    // End-to-end curation verdict per document: language gate, quality
    // gate, exact-dup canonicality — the composed filter a training-data
    // build applies before tokenization.
    "q104_curation" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val scored = docs.select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang"),
        TextFunctions.qualityScore(col("text")).getField("keep").as("keep_quality"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      val canon = scored.groupBy("fp").agg(min("doc_id").as("canon_id"))
      scored.join(canon, "fp")
        .select(col("doc_id"), col("lang"), col("keep_quality"),
          (col("doc_id") === col("canon_id")).as("is_canonical"),
          (col("keep_quality") && col("lang") === "en" &&
            col("doc_id") === col("canon_id")).as("keep"))
    }),

    // k-skip bigrams (reference active-learning count_kskipngrams):
    // pairs (w_i, w_j) with i < j <= i+1+k, k=2; global top-30.
    "q77_kskip_bigrams" -> ((s, d) => {
      val w = TextFunctions.tokens(col("text"))
      t(s, d, "documents")
        // sequence(1, 0) DESCENDS in Spark while DuckDB range(1, 1) is
        // empty — exclude sub-2-token docs on both sides
        .where(size(w) >= 2)
        .select(explode(flatten(transform(sequence(lit(1), size(w) - 1),
          i => transform(sequence(i + 1, least(i + lit(3), size(w))),
            j => concat_ws(" ", element_at(w, i), element_at(w, j)))))).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("bg")).limit(30)
    }),

    // ntile decile stats over customer balances.
    "q78_ntile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(asc("c_acctbal"), asc("c_custkey"))
      t(s, d, "customer")
        .withColumn("decile", ntile(10).over(w))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), round(min("c_acctbal"), 2).as("lo"),
          round(max("c_acctbal"), 2).as("hi"))
        .select(col("decile").cast("long").as("decile"), col("n"), col("lo"), col("hi"))
    }),

    // deterministic hash sampling (scalable, engine-portable — unlike the
    // seeded Bernoulli sampler, this IS oracle-checkable).
    "q79_hash_sample" -> ((s, d) => {
      t(s, d, "documents")
        .where(TextFunctions.hash60(col("text")) % 10 === 0)
        .select("doc_id", "lang")
    }),

    // per-label embedding centroids, elementwise (posexplode -> mean per
    // (label, dim) — the aggregation shape of a k-means step).
    "q82_label_centroids" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(floor(avg(col("v").cast("double")) * 1e6).cast("long").as("mean_e6"),
          count(lit(1)).as("n"))
        .select(col("label").cast("long").as("label"),
          col("dim").cast("long").as("dim"), col("mean_e6"), col("n"))
    }),

    // TF-IDF: top-50 (doc, term) scores over the corpus. ONE scan of
    // documents: the persisted term-count frame feeds all three consumers
    // (df agg, corpus size, final join); n_docs comes from a broadcast
    // 1-row aggregate instead of a second docs.count() scan (every doc_id
    // survives tokenization — split of "" is [""]). The harness clears the
    // cache after each query run (Verify/Bench clearCache), so the persist
    // does not leak across queries.
    "q83_tfidf" -> ((s, d) => {
      // Per-doc term counts are computed MAP-SIDE (a document is one
      // row): sort the token array, find run starts, emit one
      // (term, run-length) struct per distinct term — so the only rows
      // that ever shuffle are distinct (doc, term) pairs, never token
      // occurrences. The former explode → groupBy(doc, term) shape
      // shuffled every occurrence and was 17 of q83's 19 s at sf1
      // (measured); this cut is the whole 5.8x-ratio watch item. Cost
      // moved into the row: one O(n log n) array_sort per doc.
      val ws = array_sort(TextFunctions.tokens(col("text")))
      val terms = t(s, d, "documents")
        .select(col("doc_id"), ws.as("ws"))
        .withColumn("dl", size(col("ws")))
        .withColumn("starts", expr(
          "filter(sequence(1, size(ws)), i -> i = 1 OR " +
            "element_at(ws, i) != element_at(ws, i - 1))"))
        .select(col("doc_id"), col("dl"), explode(expr(
          """transform(starts, (st, j) -> struct(
               element_at(ws, st) as term,
               coalesce(try_element_at(starts, j + 2), size(ws) + 1) - st
                 as tc))""")).as("x"))
        .select(col("doc_id"), col("dl"), col("x.term").as("term"),
          col("x.tc").as("tc"))
        .persist()
      // `terms` is unique on (doc_id, term) by construction, so per-term
      // document frequency is a plain count — no distinct expansion.
      // n_docs comes from a map-only re-scan of `documents` instead of a
      // distinct shuffle over the term frame.
      val df = terms.groupBy("term").agg(count(lit(1)).as("df"))
      val nd = t(s, d, "documents")
        .where(size(TextFunctions.tokens(col("text"))) >= 1)
        .agg(count(lit(1)).cast("double").as("n_docs"))
      terms.join(df, "term")
        .crossJoin(broadcast(nd))
        .withColumn("tfidf",
          (col("tc").cast("double") / col("dl")) * log(col("n_docs") / col("df")))
        .select(col("doc_id"), col("term"),
          floor(col("tfidf") * 1e9).cast("long").as("tfidf_e9"))
        .orderBy(desc("tfidf_e9"), asc("doc_id"), asc("term"))
        .limit(50)
    }),

    // sliding-window chunking (LLM context prep): 32-token windows,
    // stride 16; fingerprint instead of echoing chunk text. The token
    // array is materialized BEFORE the generator (explode the chunk start
    // indices, slice after, as Dedup.bandKeysRows does): inlining
    // tokens(text) inside the per-chunk lambdas would re-run split/lower
    // per chunk — quadratic on book-length docs, since there is no
    // subexpression elimination across lambda boundaries.
    "q84_chunking" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
        .where(size(col("w")) >= 1)
        .select(col("doc_id"), col("w"),
          posexplode(sequence(lit(1), size(col("w")), lit(16)))
            .as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("start").cast("long").as("start"),
          size(slice(col("w"), col("start"), lit(32))).cast("long").as("n_tokens"),
          md5(array_join(slice(col("w"), col("start"), lit(32)), " ")).as("chunk_fp"))
    }),

    // scrubbing pass (PII-shaped): mask digit runs and word@word tokens,
    // report whether anything changed + fingerprint of scrubbed text.
    "q85_scrub" -> ((s, d) => {
      val scrubbed = regexp_replace(
        regexp_replace(col("text"), "[0-9]+", "<NUM>"),
        "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+", "<EMAIL>")
      t(s, d, "documents").select(col("doc_id"),
        (scrubbed =!= col("text")).as("changed"), md5(scrubbed).as("fp"))
    }),

    // Benchmark decontamination: flag training docs sharing word 3-grams
    // with an eval/benchmark set (here: the src0 slice). The benchmark
    // side is DISTINCT shingles broadcast to the candidate scan — eval
    // sets are tiny next to a training corpus, so the big side never
    // shuffles; overlap >= 10% of a doc's shingles marks contamination.
    // Shingle identity is the 62-bit polynomial gram hash (one md5 per
    // token, integer Horner chains — see gramHash62): no gram strings
    // are ever built or broadcast, the hashed-n-gram posture every
    // production decontaminator uses.
    "q107_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def sh(df: DataFrame) = tokenHashes(df, 3)
        // sequence(1, 0) DESCENDS in Spark (q77 lesson) — gate short docs
        .select(col("doc_id"),
          explode(array_distinct(expr(s"""transform(
            sequence(1, size(ht) - 2), i -> ${gramHash62("i-1", 3)})""")))
            .as("sh"))
      val bench = sh(docs.where(col("source") === "src0"))
        .select("sh").distinct().withColumn("hit", lit(1L))
      sh(docs.where(col("source") =!= "src0"))
        .join(broadcast(bench), Seq("sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
        .withColumn("contaminated", col("n_shared") * 10 >= col("n_shingles"))
    }),

    // Substring-duplicate span masking (the Lee et al. "Deduplicating
    // Training Data Makes Language Models Better" shape, approximated
    // with stride-8 48-char window hashes instead of a suffix array —
    // the distributed-friendly form): windows whose content hash repeats
    // anywhere in the corpus mark duplicated character spans, and
    // overlapping spans merge per doc into the masked intervals a
    // training pipeline would drop or loss-mask. Scale shape: one
    // generator explode (len/8 windows per doc), one hash groupBy, one
    // semi join back, and a PER-DOC window for the interval union
    // (gaps-and-islands by running max of span ends) — nothing global.
    "q190_dup_spans" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // persisted (the q197 pattern): the hashed-window stream feeds the
      // duplicate-hash groupBy AND the semi join back — unpersisted, the
      // explode + per-window md5 would run twice. Harness clearCache
      // releases it. (A block-hash variant — md5 per aligned 8-char
      // block + 62-bit polynomial per window — was measured SLOWER at
      // both SFs (sf1 7.0 → 9.5 s): materializing the per-doc block and
      // window arrays costs more than the md5 bytes it saves, the same
      // generator-vs-materialized lesson as the LSH signatures.)
      val wins = t(s, d, "documents")
        .where(length(col("text")) >= 48)
        .select(col("doc_id"),
          explode(expr("sequence(1, length(text) - 47, 8)")).as("pos"),
          col("text"))
        .select(col("doc_id"), col("pos"),
          TextFunctions.hash60(expr("substring(text, pos, 48)")).as("h"))
        .persist()
      val dup = wins.groupBy("h").agg(count(lit(1)).as("n"))
        .where(col("n") > 1).select("h")
      val spans = wins.join(dup, Seq("h"), "left_semi")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          (col("pos") + 47L).as("end"))
      val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      spans
        .withColumn("prev_max_end",
          max("end").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("prev_max_end").isNull ||
            col("pos") > col("prev_max_end") + 1, 1L).otherwise(0L))
        .withColumn("island", sum("new_island").over(
          byDoc.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(min("pos").as("span_start"), max("end").as("span_end"),
          count(lit(1)).as("n_windows"))
        .select("doc_id", "span_start", "span_end", "n_windows")
    }),

    // Deterministic train/val/test split: the content hash, not rand(),
    // decides membership — reshard-stable, reproducible across retries,
    // and exactly replayable by the oracle. 80/10/10 by hash60 % 100.
    "q108_train_split" -> ((s, d) => {
      val h = TextFunctions.hash60(col("text")) % 100
      t(s, d, "documents")
        .withColumn("split",
          when(h < 80, "train").when(h < 90, "val").otherwise("test"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    }),

    // Inverted index (search-engine core): term -> document frequency +
    // fingerprint of the ordered posting list. Posting lists are built in
    // TWO levels — per (term, doc_id-shard) first, then shard summaries
    // combined per term — because a single-level collect_list puts a
    // celebrity term's ENTIRE posting list ("the" = every doc in the
    // corpus) into one aggregation row: unbounded state at 100 TB. Shard
    // state is bounded at ~1/nShards of the worst list (size nShards to
    // the corpus); the combine step sees nShards fixed-size fingerprints
    // per term. Terms in >= 5 docs only — the long tail is noise.
    "q110_inverted_index" -> ((s, d) => {
      val nShards = 16
      val sh = t(s, d, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
        .withColumn("shard", pmod(col("doc_id"), lit(nShards)))
        .groupBy("term", "shard")
        .agg(count(lit(1)).as("cnt"),
          md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",")).as("sfp"))
      sh.groupBy("term")
        .agg(sum("cnt").as("df"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("shard"), col("sfp")))),
            x => x.getField("sfp")), ",")).as("postings_fp"))
        .where(col("df") >= 5)
    }),

    // int8 embedding quantization: per-dimension global [min,max] -> 255
    // buckets, the storage-shrink step before ANN serving. The per-dim
    // stats frame is tiny (Dim rows) and broadcast; quantized vectors are
    // fingerprinted per row. Identical double arithmetic both engines:
    // floor((v - mn) * 255 / (mx - mn)).
    "q111_quantize" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val dims = e.select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
      val q = when(col("mx") === col("mn"), lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor((col("v").cast("double") - col("mn").cast("double")) * 255.0
            / (col("mx").cast("double") - col("mn").cast("double"))).cast("long"))))
      e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .join(broadcast(dims), "dim")
        .select(col("vec_id"), col("dim"), q.as("q"))
        .groupBy("vec_id")
        .agg(md5(array_join(transform(
            array_sort(collect_list(struct(col("dim"), col("q")))),
            x => x.getField("q").cast("string")), ",")).as("qfp"),
          sum("q").as("qsum"))
    }),

    // Deterministic k-per-group sampling: the "take N docs per language
    // for the training mix" op, keyed on the content hash so the sample
    // is reshard-stable and replayable. Runs through the custom
    // TopKPerKey physical operator (bounded per-key heaps, shuffle of
    // <= k rows per key per partition) instead of a full window sort —
    // the oracle replays it as row_number over the same total order.
    "q112_group_sample" -> ((s, d) => {
      graft.plans.TopKPerKey(
          t(s, d, "documents").select(col("doc_id"), col("lang"),
            TextFunctions.hash60(col("text")).as("h")),
          Seq("lang"), Seq(asc("h"), asc("doc_id")), 20)
        .select(col("lang"), col("doc_id"), col("h"))
    }),

    // Bigram conditional probabilities (count-based tiny-LM step):
    // P(w2|w1) in exact integer micro-units — c12 * 1e6 DIV c1, where c1
    // sums over the SAME bigram table so probabilities per w1 sum to ~1.
    // Two shuffles (bigram count, unigram-context count) + one join on
    // w1, all linear in corpus size.
    "q114_bigram_lm" -> ((s, d) => {
      // the q258 string-path lesson: one concat per occurrence, the
      // (w1, w2) split AFTER the aggregate on the vocab²-bounded frame
      val bg = t(s, d, "documents")
        .where(size(TextFunctions.tokens(col("text"))) >= 2)
        .select(explode(Dedup.shingles(col("text"), 2)).as("bgs"))
        .groupBy("bgs").agg(count(lit(1)).as("c12"))
        .select(expr("substring_index(bgs, ' ', 1)").as("w1"),
          expr("substring(bgs, instr(bgs, ' ') + 1)").as("w2"), col("c12"))
      val ctx = bg.groupBy("w1").agg(sum("c12").as("c1"))
      bg.join(ctx, "w1")
        .where(col("c12") >= 3)
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          expr("c12 * 1000000 DIV c1").as("p_e6"))
    }),

    // Flesch reading-ease per document — the readability gate quality
    // pipelines run next to the Gopher rules (q196). Heuristic counts:
    // words = whitespace tokens, sentences = '.' characters (min 1),
    // syllables = vowel groups. The score 206.835 − 1.015·W/S − 84.6·Y/W
    // is ONE exact rational over the common denominator S·W in e3 fixed
    // point: num = 206835·S·W − 1015·W² − 84600·Y·S — integer end to
    // end, no float anywhere. Map-only: scales embarrassingly.
    "q261_readability" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_words"),
          greatest(length(col("text")) -
            length(regexp_replace(col("text"), "\\.", "")), lit(1))
            .cast("long").as("n_sents"),
          regexp_count(lower(col("text")), lit("[aeiou]+")).cast("long")
            .as("n_syll"))
        .withColumn("fre_e3", expr(
          """(206835 * n_sents * n_words - 1015 * n_words * n_words
              - 84600 * n_syll * n_sents) div (n_sents * n_words)"""))
    }),

    // Skip-gram co-occurrence PPMI (the word2vec/GloVe counting step):
    // directed center→context pairs within a +2 token window, and the
    // pointwise-mutual-information RATIO p(x,y)/(p(x)p(y)) =
    // c_xy·N_pairs/(row_x·col_y) as an exact integer in e6 fixed point —
    // the log is monotone, so ranking and thresholding on the ratio is
    // ranking on PMI without the libm tail. One generator pass emits
    // both window offsets; marginals are two key shuffles over the
    // (small) distinct-pair frame; the 1-row total broadcasts. Top-100
    // by ratio bounds the output (support floor c >= 5 first).
    "q262_ppmi" -> ((s, d) => {
      // pair strings, not per-occurrence structs (the q258 lesson — 1.9×
      // at both scales): one concat per occurrence, split into (x, y)
      // AFTER the aggregate on the vocabulary²-bounded frame
      val pairs = t(s, d, "documents")
        .select(TextFunctions.tokens(col("text")).as("w"))
        .where(size(col("w")) >= 2)
        .select(explode(expr(
          """concat(
               transform(sequence(1, size(w) - 1),
                 i -> concat(element_at(w, i), ' ', element_at(w, i + 1))),
               if(size(w) >= 3,
                 transform(sequence(1, size(w) - 2),
                   i -> concat(element_at(w, i), ' ', element_at(w, i + 2))),
                 cast(array() as array<string>)))""")).as("ps"))
        .groupBy("ps").agg(count(lit(1)).as("c"))
        .select(expr("substring_index(ps, ' ', 1)").as("x"),
          expr("substring(ps, instr(ps, ' ') + 1)").as("y"), col("c"))
        .persist() // feeds both marginals, the total, and the ratio join
      val rowm = pairs.groupBy("x").agg(sum("c").as("row_c"))
      val colm = pairs.groupBy("y").agg(sum("c").as("col_c"))
      val tot = pairs.agg(sum("c").as("np"))
      pairs.where(col("c") >= 5)
        .join(rowm, "x").join(colm, "y").crossJoin(broadcast(tot))
        .select(col("x"), col("y"), col("c"), col("row_c"), col("col_c"),
          expr("c * np * 1000000 div (row_c * col_c)").as("ratio_e6"))
        .orderBy(desc("ratio_e6"), asc("x"), asc("y"))
        .limit(100)
    }),

    // Interpolated Kneser-Ney bigram smoothing (Kneser & Ney 1995, the
    // smoothing under every n-gram LM used for perplexity filtering) with
    // discount D = 3/4 — chosen so EVERY probability is an exact rational:
    // P(w2|w1) = max(c12−D,0)/c1 + D·N₊(w1,·)/c1 · N₊(·,w2)/T over common
    // denominator 4·c1·T gives p_num = max(4c12−3,0)·T + 3·nf·nc and
    // p_den = 4·c1·T, both BIGINT (bound: 4·corpus_bigrams·types ≪ 2^63
    // here; at web scale emit num/den and divide downstream). One bigram
    // aggregate persisted feeds all four marginals — context totals,
    // follower fan-out, continuation fan-in, and the 1-row type count
    // broadcast. Linear in corpus size, keyed shuffles only.
    "q258_kneser_ney" -> ((s, d) => {
      // bigrams ride the single-string shingle path (one array_join per
      // occurrence, no per-occurrence struct), and split back into
      // (w1, w2) only AFTER the aggregate — on the vocabulary²-bounded
      // frame, not the occurrence stream. Tokens are space-split, so
      // "w1 w2" ↔ (w1, w2) is a bijection and the grouping is identical.
      val bg = t(s, d, "documents")
        .where(size(TextFunctions.tokens(col("text"))) >= 2)
        .select(explode(Dedup.shingles(col("text"), 2)).as("bgs"))
        .groupBy("bgs").agg(count(lit(1)).as("c12"))
        .select(expr("substring_index(bgs, ' ', 1)").as("w1"),
          expr("substring(bgs, instr(bgs, ' ') + 1)").as("w2"), col("c12"))
        .persist()
      val ctx = bg.groupBy("w1").agg(sum("c12").as("c1"),
        count(lit(1)).as("nf"))
      val cont = bg.groupBy("w2").agg(count(lit(1)).as("nc"))
      val tot = bg.agg(count(lit(1)).as("tt"))
      bg.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(tot))
        .where(col("c12") >= 3)
        .select(col("w1"), col("w2"), col("c12"), col("c1"),
          col("nf"), col("nc"),
          (greatest(lit(4L) * col("c12") - 3L, lit(0L)) * col("tt") +
            lit(3L) * col("nf") * col("nc")).as("p_num"),
          (lit(4L) * col("c1") * col("tt")).as("p_den"))
        .withColumn("p_e6", expr("p_num * 1000000 div p_den"))
    }),

    // Misra-Gries heavy hitters via the custom TypedImperativeAggregate:
    // fixed-k state per partial, k-row exchanges — the mergeable-sketch
    // alternative to a domain-sized exact groupBy at 100 TB. Estimates
    // depend on Spark's (nondeterministic) merge order, so the output
    // asserts the sketch's GUARANTEES, which hold under any merge tree:
    // every true heavy hitter (c*k > n) is present, and its estimate is
    // within [c - n/(k+1), c]. The oracle expects both booleans TRUE
    // (q99's error-band pattern); exact counts anchor the hash.
    "q115_heavy_hitters" -> ((s, d) => {
      val kCap = 50
      val terms = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      val exact = terms.groupBy("term").agg(count(lit(1)).as("c"))
      val tot = exact.agg(sum("c").as("n"))
      val sketch = terms
        .agg(org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.HeavyHittersAgg(
            org.apache.spark.sql.GraftSqlBridge.expression(col("term")), kCap)
            .toAggregateExpression()).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.term").as("term"), col("e.est").as("est"))
      exact.crossJoin(broadcast(tot))
        .where(col("c") * kCap > col("n"))
        .join(broadcast(sketch), Seq("term"), "left")
        .select(col("term"), col("c"),
          col("est").isNotNull.as("in_sketch"),
          (col("est").isNotNull && col("est") <= col("c") &&
            col("est") >= col("c") - floor(col("n") / (kCap + 1)))
            .as("est_in_band"))
    }),

    // Heavy-hitter PHRASES per source — the q115 Misra-Gries guarantee
    // check under GROUPING: one sketch per source via the custom
    // TypedImperativeAggregate's partial-merge path inside a hash
    // aggregate (the shape that matters at 100 TB: sketches combine
    // map-side per group, no exact per-phrase shuffle needed for the
    // report). Verified the q115 way — every phrase above the n/k
    // guarantee threshold must appear in its source's sketch with the
    // estimate inside the MG error band.
    "q209_heavy_phrases_by_source" -> ((s, d) => {
      val kCap = 30
      // phrase identity is gramHash62 (one md5 per token): the exact
      // counts, totals, and MG sketch all run over BIGINTs — phrase
      // STRINGS are never shuffled or persisted. The heavy survivors
      // (≤ kCap per source by the n/k guarantee) recover their text by
      // re-probe: pick the min-(doc_id, pos) occurrence per heavy hash,
      // broadcast those few rows back against the documents scan, and
      // slice the two tokens out — the standard way production
      // heavy-hitter reports materialize display strings at scale.
      val grams = tokenHashes(t(s, d, "documents"), 2)
        .select(col("doc_id"), col("source"),
          posexplode(expr(s"""transform(sequence(1, size(ht) - 1),
            i -> ${gramHash62("i-1", 2)})""")).as(Seq("i0", "g")))
        .select(col("doc_id"), col("source"), (col("i0") + 1).as("i"),
          col("g"))
        .persist() // exact counts + sketch + heavy re-probe read it
      val exact = grams.groupBy("source", "g").agg(count(lit(1)).as("c"))
      val tot = exact.groupBy("source").agg(sum("c").as("n"))
      val sketch = grams.groupBy("source")
        .agg(org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.HeavyHittersAgg(
            org.apache.spark.sql.GraftSqlBridge.expression(
              col("g").cast("string")), kCap)
            .toAggregateExpression()).as("hh"))
        .select(col("source"), explode(col("hh")).as("e"))
        .select(col("source"), col("e.term").cast("long").as("g"),
          col("e.est").as("est"))
      val heavy = exact.join(tot, "source")
        .where(col("c") * kCap > col("n")).persist() // ≤ kCap per source
      val reps = grams
        .join(broadcast(heavy.select("source", "g")), Seq("source", "g"))
        .groupBy("source", "g")
        .agg(min(struct(col("doc_id"), col("i"))).as("r"))
        .select(col("source"), col("g"), col("r.doc_id").as("doc_id"),
          col("r.i").as("i"))
      val withP = t(s, d, "documents").select(col("doc_id"), col("text"))
        .join(broadcast(reps), "doc_id")
        .select(col("source"), col("g"),
          concat_ws(" ", slice(TextFunctions.tokens(col("text")), col("i"),
            lit(2))).as("p"))
      heavy.join(withP, Seq("source", "g"))
        .join(sketch, Seq("source", "g"), "left")
        .select(col("source"), col("p"), col("c"),
          col("est").isNotNull.as("in_sketch"),
          (col("est").isNotNull && col("est") <= col("c") &&
            col("est") >= col("c") - floor(col("n") / (kCap + 1)))
            .as("est_in_band"))
    }),

    // Token-distribution entropy per document (information-theoretic
    // quality signal: near-zero = degenerate repetition, high = diverse
    // text). Float summation order is pinned on BOTH engines by folding
    // the per-term contributions in sorted-term order with an explicit
    // left fold — entropy contributions are not associativity-safe.
    "q116_entropy" -> ((s, d) => {
      val tc = t(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n"),
          transform(array_sort(collect_list(struct(col("term"), col("c")))),
            x => x.getField("c")).as("cs"))
      tc.select(col("doc_id"), col("n"),
        floor(aggregate(col("cs"), lit(0.0d),
          (acc, c) => acc - (c.cast("double") / col("n")) *
            log(c.cast("double") / col("n"))) * 1e6).cast("long").as("entropy_e6"))
    }),

    // Recall@10 of both ANN scale paths against exact brute force, per
    // query and method — the evaluation that decides which bucketing
    // scheme's recall/cost trade-off earns the full-corpus run. Measured
    // honestly on this data: sign-pattern LSH at 8 planes ~0-5% recall
    // (256 buckets over 2k vectors; true neighbors rarely share an exact
    // sign pattern), IVF at 2 probes ~50% — IVF is the preferred path.
    // Exact integer recall (hits * 1e6 DIV k).
    "q117_ann_recall" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val ids = Seq(100L, 200L)
      val bf = Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(ids: _*)), 10)
        .select(col("query_id"), col("neighbor_id"))
      def recallOf(method: String, ann: DataFrame): DataFrame =
        bf.join(ann.select(col("query_id"), col("neighbor_id"))
            .withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("k"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .select(lit(method).as("method"), col("query_id"), col("k"),
            col("n_hit"), expr("n_hit * 1000000 DIV k").as("recall_e6"))
      recallOf("lsh8", Similarity.lshTopK(e, ids, 10, 8))
        .unionAll(recallOf("ivf2", Similarity.ivfTopK(e, ids, 10, 2)))
    }),

    // Triangle count over the LSH candidate-pair graph — the clustering
    // signal that distinguishes a tight duplicate clique from a chain of
    // borderline matches. Edges are kept in canonical (id1 < id2) order,
    // so the two-join wedge-close counts each triangle exactly once and
    // every join key is a node id (shuffle fan-in bounded by node degree,
    // the standard distributed-triangle shape).
    "q121_triangles" -> ((s, d) => {
      val e = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      val e1 = e.select(col("id1").as("a"), col("id2").as("b"))
      val e2 = e.select(col("id1").as("b"), col("id2").as("c"))
      val e3 = e.select(col("id1").as("a"), col("id2").as("c"))
        .withColumn("closed", lit(1L))
      e1.join(e2, "b")
        .join(e3, Seq("a", "c"), "left")
        .agg(count(lit(1)).as("n_wedges"),
          sum(coalesce(col("closed"), lit(0L))).as("n_triangles"))
    }),

    // Link prediction over the same LSH pair graph: for every
    // NON-adjacent pair sharing >= 1 neighbor, the common-neighbor count
    // and the Resource-Allocation index (Zhou, Lü, Zhang 2009) in exact
    // fixed point — ra_e6 = sum over shared z of (1e6 div deg(z)). The
    // per-term integer floor keeps the sum associative and engine-exact
    // (Adamic-Adar's 1/ln(deg) would put a libm knife-edge in every
    // term). Wedge enumeration keys every join on a node id (fan-in
    // bounded by degree, the q121 shape); known edges are removed by one
    // anti-join on the canonical pair; bounded top-50 output.
    "q256_link_prediction" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
        .persist() // feeds wedge sides AND the anti-join
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val zu = edges.select(col("src").as("z"), col("dst").as("u"))
      val zw = edges.select(col("src").as("z"), col("dst").as("w"))
      val cand = zu.join(zw, "z").where(col("u") < col("w"))
        .join(deg.withColumnRenamed("src", "z"), "z")
        .groupBy("u", "w")
        .agg(count(lit(1)).as("cn"), sum(expr("1000000 div deg")).as("ra_e6"))
      cand.join(pairs,
          cand("u") === pairs("id1") && cand("w") === pairs("id2"), "left_anti")
        .orderBy(desc("cn"), desc("ra_e6"), asc("u"), asc("w"))
        .limit(50)
        .select(col("u").as("id1"), col("w").as("id2"), col("cn"), col("ra_e6"))
    }),

    // near-dup pairs *within LSH buckets* — the linear-scale form of q63:
    // candidates come from the sign-pattern bucket, not an all-pairs join.
    "q86_bucketed_neardup" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      // norms once per row, not per pair — k vs k^2 chain evaluations in a
      // bucket of k, and the pair stage stays inside whole-stage codegen
      // (three inlined 64-term chains fell back to interpreted mode).
      val withB = e.join(Similarity.withBucket(e, 8), "vec_id")
        .withColumn("nrm", Similarity.norm2("embedding"))
      val a = withB.select(col("vec_id").as("id1"), col("embedding").as("e1"),
        col("nrm").as("n1"), col("bucket"))
      val b = withB.select(col("vec_id").as("id2"), col("embedding").as("e2"),
        col("nrm").as("n2"), col("bucket"))
      a.join(b, Seq("bucket"))
        .where(col("id1") < col("id2"))
        .withColumn("cos",
          Similarity.cosineWithNorms(Similarity.dot("e1", "e2"), col("n1"), col("n2")))
        .where(col("cos") > 0.18)
        .select(col("id1"), col("id2"), floor(col("cos") * 1e6).cast("long").as("cos_e6"))
    }),

    // Incremental EMBEDDING-space dedup — q259's cadence in vector
    // space: a new batch (vec_id >= 400) probes the standing corpus's
    // (vec_id < 400) sign-pattern LSH buckets and flags semantic
    // near-dups by max cosine against co-bucketed corpus vectors. For
    // NEAR-IDENTICAL vectors (the dedup regime, cos ≫ the q117 ANN
    // regime) sign patterns agree with high probability, so the bucket
    // probe is the right cheap filter here even though q117 measured it
    // useless for top-k recall. Asymmetric: the corpus side contributes
    // only its (vec_id, bucket, embedding) index rows; no corpus
    // self-join.
    "q266_incremental_semdedup" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val withB = e.join(Similarity.withBucket(e, 8), "vec_id")
        .withColumn("nrm", Similarity.norm2("embedding"))
      val corpus = withB.where(col("vec_id") < 400)
        .select(col("vec_id").as("old_id"), col("embedding").as("eo"),
          col("nrm").as("no"), col("bucket"))
      val batch = withB.where(col("vec_id") >= 400)
        .select(col("vec_id").as("new_id"), col("embedding").as("en"),
          col("nrm").as("nn"), col("bucket"))
      val hits = batch.join(corpus, Seq("bucket"))
        .withColumn("cos", Similarity.cosineWithNorms(
          Similarity.dot("en", "eo"), col("nn"), col("no")))
        .groupBy("new_id").agg(count(lit(1)).as("n_candidates"),
          floor(max(col("cos")) * 1e6).cast("long").as("max_cos_e6"))
      e.where(col("vec_id") >= 400).select(col("vec_id").as("new_id"))
        .join(hits, Seq("new_id"), "left")
        .select(col("new_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          col("max_cos_e6"),
          coalesce(col("max_cos_e6") >= 180000L, lit(false)).as("is_dup"))
    }),

    // BM25 retrieval scoring for a fixed two-term query ("spark fast"),
    // k1=1.2, b=0.75 — the lexical-retrieval baseline every RAG corpus
    // pipeline needs next to the ANN path. Per-doc term frequencies come
    // off the token array in ONE scan (no explode/re-group); corpus stats
    // (N, avgdl, per-term df) are a 1-row broadcast. Floats are pinned by
    // writing the formula with IDENTICAL operation order in both engines
    // and flooring to micro-units; the global top-k is a bounded
    // TakeOrderedAndProject, ties broken on doc_id.
    "q126_bm25" -> ((s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val base = t(s, d, "documents").select(col("doc_id"),
        size(toks).cast("long").as("dl"),
        size(filter(toks, x => x === "spark")).cast("long").as("tf1"),
        size(filter(toks, x => x === "fast")).cast("long").as("tf2"))
      val stats = base.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"),
        count(when(col("tf1") > 0, 1)).as("df1"),
        count(when(col("tf2") > 0, 1)).as("df2"))
      def term(tf: String, df: String): Column =
        log((col("n_docs") - col(df) + 0.5) / (col(df) + 0.5) + 1.0) *
          (col(tf) * 2.2) /
          (col(tf) + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
      base.crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sum_dl") / col("n_docs"))
        .where(col("tf1") > 0 || col("tf2") > 0)
        .withColumn("score", term("tf1", "df1") + term("tf2", "df2"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("tf1"), col("tf2"), col("dl"),
          floor(col("score") * 1e6).cast("long").as("score_e6"))
    }),

    // n-gram novelty of the held-out slice (src0) against the training
    // remainder — the memorization/novelty readout LLM evals run on
    // generated text (a high share of seen n-grams = copying). Per n in
    // {2, 3}: the fraction of src0's DISTINCT n-grams that never occur
    // in the rest of the corpus, as exact integer counts and one e6
    // division. Scale shape: the train side contributes only its
    // distinct-shingle set (the q107/q200 broadcast posture); the test
    // side is the small slice.
    "q272_ngram_novelty" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // hashed gram identity (gramHash62): the anti-join probes 62-bit
      // BIGINTs instead of gram strings — same q107 posture
      def grams(df: DataFrame, n: Int) = tokenHashes(df, n)
        .select(explode(array_distinct(expr(s"""transform(
          sequence(1, size(ht) - ${n - 1}), i -> ${gramHash62("i-1", n)})""")))
          .as("g"))
      def novelty(n: Int): DataFrame = {
        // test is distinct'd (its cardinality IS the denominator) and
        // persisted (anti-join probe + count both read it); train stays
        // RAW — LEFT ANTI semantics ignore right-side duplicates, so a
        // distinct there would only add a full extra shuffle of the big
        // side for nothing
        val test = grams(docs.where(col("source") === "src0"), n)
          .distinct().persist()
        val train = grams(docs.where(col("source") =!= "src0"), n)
        test.join(train, Seq("g"), "left_anti").agg(count(lit(1)).as("n_novel"))
          .crossJoin(broadcast(test.agg(count(lit(1)).as("n_test"))))
          .select(lit(n.toLong).as("n"), col("n_test"), col("n_novel"),
            expr("(n_novel * 1000000) div n_test").as("novelty_e6"))
      }
      novelty(2).unionAll(novelty(3))
    }),

    // Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001), μ=2000
    // — the language-modeling retrieval scorer next to q126's BM25: same
    // fixed two-term query, same one-scan per-doc tf extraction and
    // 1-row corpus-stats broadcast; score = Σ_t ln((tf + μ·cf_t/|C|) /
    // (dl + μ)) written with identical op order in both engines (the
    // q127 libm precedent), bounded top-50.
    "q271_dirichlet_ql" -> ((s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val base = t(s, d, "documents").select(col("doc_id"),
        size(toks).cast("long").as("dl"),
        size(filter(toks, x => x === "spark")).cast("long").as("tf1"),
        size(filter(toks, x => x === "fast")).cast("long").as("tf2"))
      val stats = base.agg(sum("dl").as("c"),
        sum("tf1").as("cf1"), sum("tf2").as("cf2"))
      def term(tf: String, cf: String): Column =
        log((col(tf) + lit(2000.0) * col(cf) / col("c")) /
          (col("dl") + lit(2000.0)))
      base.crossJoin(broadcast(stats))
        .where(col("tf1") > 0 || col("tf2") > 0)
        .withColumn("score", term("tf1", "cf1") + term("tf2", "cf2"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("tf1"), col("tf2"), col("dl"),
          floor(col("score") * 1e6).cast("long").as("score_e6"))
    }),

    // Per-document mean negative log-likelihood under the corpus unigram
    // model — the perplexity-style quality score that ranks documents by
    // how "surprising" their tokens are. The NLL fold is order-pinned by
    // token POSITION (q116's entropy lesson: group sums of doubles are
    // merge-order-dependent; folds over a sorted list are not). Join of
    // token positions with unigram counts is linear; per-doc state is the
    // doc's own token list, bounded by document length.
    "q127_perplexity" -> ((s, d) => docNll(s, d)),

    // CCNet-style perplexity partition: rank every document by its
    // unigram-LM avg NLL (q127's per-doc score) and split the corpus into
    // head / middle / tail THIRDS by rank share — the published CCNet
    // quality partition, where "head" (lowest perplexity) feeds
    // pretraining first. Rank-share thresholds instead of score
    // quantiles: integer-exact cross-engine (no interpolated percentile
    // semantics to match) and the ranking runs through the scalable
    // zipWithIndex path, not a single-partition window.
    "q198_ccnet_buckets" -> ((s, d) => {
      // persist the per-doc NLL: it feeds the rank chain AND the corpus
      // count (which deliberately reads nll, not ranked — counting must
      // not replay the sort+zipWithIndex). Harness clearCache releases it.
      val nll = docNll(s, d).select("doc_id", "avg_nll_e6").persist()
      val ranked = graft.operators.Ranking.globalRank(
        nll, "rnk", asc("avg_nll_e6"), asc("doc_id"))
      val tot = nll.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("bucket", when(col("rnk") * 3 <= col("n"), "head")
          .when(col("rnk") * 3 <= col("n") * 2, "middle").otherwise("tail"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(avg_nll_e6) div count(1)").as("mean_nll_e6"),
          min("avg_nll_e6").as("min_nll_e6"),
          max("avg_nll_e6").as("max_nll_e6"))
    }),

    // Incremental append dedup — the production cadence where a NEW batch
    // arrives against an existing fingerprint STORE (here: doc_id < 250 is
    // the store, the rest is the batch): each batch doc is flagged as a
    // duplicate of the store, an intra-batch duplicate (not the batch's
    // first holder of its fingerprint), and gets the composed keep
    // verdict. Scale shape: the store side is a distinct-fingerprint
    // equi-join (the Bloom pre-filter of q109 is the 100-TB variant when
    // the store dwarfs the batch); intra-batch firsts are one key shuffle
    // over the batch only. Nothing rescans the store's documents — only
    // its fingerprint index.
    "q199_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val fp = TextFunctions.fingerprint(col("text"))
      val store = docs.where(col("doc_id") < 250)
        .select(fp.as("fp")).distinct().withColumn("in_store", lit(true))
      val batch = docs.where(col("doc_id") >= 250)
        .select(col("doc_id"), fp.as("fp"))
      val firsts = batch.groupBy("fp").agg(min("doc_id").as("first_id"))
      batch.join(store, Seq("fp"), "left")
        .join(firsts, "fp")
        .select(col("doc_id"),
          coalesce(col("in_store"), lit(false)).as("dup_of_store"),
          (col("doc_id") =!= col("first_id")).as("dup_in_batch"))
        .withColumn("keep", !col("dup_of_store") && !col("dup_in_batch"))
    }),

    // Incremental NEAR-dup — q199's cadence for fuzzy duplicates: a new
    // batch (doc_id >= 400) probes the LSH band-key INDEX of the standing
    // corpus (doc_id < 400). Strictly asymmetric: the corpus never
    // self-joins and its documents are never re-read — only its
    // (band, key) index rows, which a production deployment keeps
    // bucketed by key so the probe is a co-located join. Per batch doc:
    // how many corpus docs share a band bucket, the smallest such id
    // (the canonical "duplicate of"), and the verdict. Intra-batch
    // near-dups are q59/q86's symmetric path, deliberately not rerun
    // here.
    "q259_incremental_neardup" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents")
      val corpus = Dedup.bandKeysRows(
          docs.where(col("doc_id") < 400), "doc_id", "text", p)
        .select(col("doc").as("old_id"), col("band"), col("key"))
      val batch = Dedup.bandKeysRows(
          docs.where(col("doc_id") >= 400), "doc_id", "text", p)
        .select(col("doc").as("new_id"), col("band"), col("key"))
      val hits = batch.join(corpus, Seq("band", "key"))
        .select("new_id", "old_id").distinct()
        .groupBy("new_id").agg(count(lit(1)).as("n_matches"),
          min("old_id").as("first_match"))
      docs.where(col("doc_id") >= 400).select(col("doc_id").as("new_id"))
        .join(hits, Seq("new_id"), "left")
        .select(col("new_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          col("first_match"),
          col("first_match").isNotNull.as("is_dup"))
    }),

    // Multi-benchmark contamination report — q107 generalized to SEVERAL
    // eval sets at once (src0 and src1 stand in for two benchmarks): per
    // (training source, benchmark), how many docs cross the 10% shared-
    // shingle threshold and the contamination rate in micro-units. The
    // report a corpus release publishes per benchmark. Scale shape:
    // benchmark shingles ride ONE tagged broadcast (eval sets are tiny
    // next to the corpus), the corpus explodes once, and everything
    // reduces by (doc, bench) then (source, bench) key shuffles.
    "q200_contamination_report" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // hashed shingle identity (gramHash62) — same posture as q107
      def sh(df: DataFrame) = tokenHashes(df, 3)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(expr(s"""transform(
            sequence(1, size(ht) - 2), i -> ${gramHash62("i-1", 3)})""")))
            .as("sh"))
      val benches = sh(docs.where(col("source").isin("src0", "src1")))
        .select(col("source").as("bench"), col("sh")).distinct()
      // persisted: the exploded training-shingle stream feeds the per-doc
      // totals AND the benchmark-hit join (harness clearCache releases it)
      val train = sh(docs.where(!col("source").isin("src0", "src1"))).persist()
      val docTotals = train.groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_shingles"))
      val perSource = docTotals.groupBy("source").agg(count(lit(1)).as("n_docs"))
      train.join(broadcast(benches), "sh")
        .groupBy("doc_id", "bench").agg(count(lit(1)).as("n_shared"))
        .join(docTotals, "doc_id")
        .where(col("n_shared") * 10 >= col("n_shingles"))
        .groupBy("source", "bench").agg(count(lit(1)).as("n_contaminated"))
        .join(perSource, "source")
        .select(col("source"), col("bench"), col("n_docs"), col("n_contaminated"),
          expr("(n_contaminated * 1000000) div n_docs").as("rate_e6"))
    }),

    // Integer PageRank (3 fixed iterations, damping 0.85) over the LSH
    // candidate-pair graph — relative centrality inside duplicate
    // clusters. Ranks live in exact micro-units with DIV-truncated
    // contributions, so every value is merge-order-independent and
    // bit-identical across engines: the float-free way to oracle-check an
    // iterative graph algorithm. Each iteration is one join + one key
    // shuffle; the symmetric edge list has no dangling nodes.
    "q132_pagerank" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      // persist the symmetric edge list itself, not just the ed join:
      // edges feeds FOUR consumers (both join sides of ed, deg, ranks
      // seed) and each union branch replays the MinHash pipeline —
      // unpersisted, the LSH subtree ran ~4x per execution
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .persist()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      // reused by all three iterations (harness clearCache releases it)
      val ed = edges.join(deg, "src").persist()
      var ranks = deg.select(col("src").as("id"), lit(1000000L).as("r"))
      for (_ <- 1 to 3) {
        ranks = ed.join(ranks, ed("src") === ranks("id"))
          .select(col("dst"), expr("r div d").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("in_r"))
          .select(col("dst").as("id"),
            expr("150000 + (85 * in_r) div 100").as("r"))
          // generation cut (the q185 lesson): without it each iteration
          // re-plans the whole accumulated lineage and the LSH pair
          // subtree dominates planning, not execution
          .localCheckpoint(true)
      }
      ranks.select(col("id").as("doc_id"), col("r").as("rank_e6"))
    }),

    // Two full Lloyd iterations of k-means in EXACT integer arithmetic:
    // vectors and centroids live in micro-units (floor(v*1e6)), centroid
    // update is a TRUNC-divided per-dim mean — Spark `div` and DuckDB `//`
    // both truncate toward zero on integer operands (verified empirically
    // on negative sums; this engine's DuckDB does NOT floor `//` for
    // integers), and assignment is argmin of integer squared distance with
    // a centroid-id tie-break — every intermediate is merge-order-proof,
    // which is what makes an ITERATIVE ML loop oracle-checkable at all
    // (q132's PageRank trick applied to clustering; q82/q98 pioneered the
    // µ-unit centroids). Scale shape per iteration: one explode-aggregate
    // for centroids (k×64 rows, broadcast back) and one argmin over a
    // k-way crossJoin — linear in vectors, no pairwise anything.
    "q145_kmeans" -> ((s, d) => {
      val (cur, cents) = Similarity.lloyd(t(s, d, "embeddings"), 2)
      cur.groupBy("c").agg(count(lit(1)).as("n_assigned"))
        .join(cents.select(col("c"),
          md5(array_join(transform(col("ce"), _.cast("string")), ","))
            .as("cfp")), Seq("c"))
    }),

    // IVF ANN with a k-means-TRAINED codebook + 4-probe — the designated
    // recall path the q117 readout motivates (label-mean ivf2 measured
    // 30–70% recall@10): 2 exact Lloyd rounds (q145 machinery) fit the
    // codebook to the data's clusters, queries probe their 4 nearest
    // cells by integer L2, candidates rank by float cosine. Same recall
    // readout shape as q117 so the artifacts compare directly.
    "q251_ann_ivf_kmeans" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val ids = Seq(100L, 200L)
      val ann = Similarity.ivfKmeansTopK(e, ids, 10, 4)
      val bf = Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(ids: _*)), 10)
        .select(col("query_id"), col("neighbor_id"))
      bf.join(ann.select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(lit("ivfkm4").as("method"), col("query_id"), col("k"),
          col("n_hit"), expr("n_hit * 1000000 DIV k").as("recall_e6"))
    }),

    // Product-quantization ANN (q251's compression-side complement): 4
    // blocks × 16-centroid codebooks trained by one exact integer Lloyd
    // round, corpus ranked by INTEGER asymmetric distance (per-query
    // 64-entry lookup table broadcast, codes joined, 4 adds per vector)
    // — and each ADC hit checked against the exact integer-L2 top-10.
    // Bit-exact end to end: the entire index build and search replay in
    // the oracle, not just the readout.
    "q263_product_quantization" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val ids = Seq(100L, 200L)
      val pq = Similarity.pqTopK(e, ids, 10)
      val ve = e.select(col("vec_id"), expr(
        """transform(embedding,
             v -> cast(floor(cast(v as double) * 1000000.0) as bigint))""")
        .as("ve"))
      val q = ve.where(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("query_id"), col("ve").as("qve"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dist"), col("vec_id"))
      val bf = ve.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("dist", expr(
          """aggregate(zip_with(ve, qve, (a, b2) -> (a - b2) * (a - b2)),
             cast(0 as bigint), (acc, x) -> acc + x)"""))
        .withColumn("rn", row_number().over(wb)).where(col("rn") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          lit(1L).as("hit"))
      pq.join(bf, Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("neighbor_id"), col("rnk"),
          col("adc_dist"), col("hit").isNotNull.as("exact_hit"))
    }),

    // Edit-distance similarity self-join (Ed-Join prefix filtering): all
    // customer-name pairs within edit distance 1 via rarity-ordered
    // positional q-gram candidates + exact levenshtein verify — the
    // string-similarity complement of MinHash (token sets) and cosine
    // (embeddings). The oracle is the ALL-PAIRS form, so a single missed
    // candidate reddens the row: the prefix filter's completeness is
    // what's being checked, not just the verifier.
    "q136_fuzzy_join" -> ((s, d) => {
      // persisted even though consumed once: measured 26.7s unpersisted
      // vs ~3.6s persisted at sf0.1 (same factor as q273 before/after,
      // and q163's persisted path) — the materialization point stops
      // whatever re-execution the un-persisted Ed-Join subtree suffers
      // under AQE. Harness clearCache releases it.
      graft.operators.FuzzyJoin.selfJoin(
        t(s, d, "customer"), "c_custkey", "c_name", k = 1)
        .select(col("id1"), col("id2"), col("ed")).persist()
    }),

    // Count-Min frequency estimation for the corpus term counts: d×w
    // counters built in ONE distributed pass, merged additively (so the
    // estimate is merge-order-independent, unlike Misra-Gries q115 — no
    // nondeterminism to band away). The oracle checks the sketch's hard
    // guarantees against exact counts on the heavy terms: never
    // undercounts; overcounts by at most eps·N. Keys are hash60 longs —
    // a collision only inflates an estimate, never breaks the lower
    // bound.
    "q133_cms_heavy" -> ((s, d) => {
      val eps = 0.001
      val kCap = 50
      val terms = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .withColumn("h", TextFunctions.hash60(col("term")))
      val bytes = graft.operators.CountMin.sketchBytes(terms, "h", eps, 0.99, 42)
      val exact = terms.groupBy("term", "h").agg(count(lit(1)).as("c"))
      val tot = exact.agg(sum("c").as("n"))
      exact.crossJoin(broadcast(tot))
        .where(col("c") * kCap > col("n"))
        .withColumn("est", graft.operators.CountMin.estimate(bytes)(col("h")))
        .select(col("term"), col("c"),
          (col("est") >= col("c")).as("no_underestimate"),
          (col("est") <= col("c") + lit(eps) * col("n")).as("within_eps"))
    }),

    // Deterministic weighted k-per-group sample: priority = hash60(text)
    // DIV n_chars, smallest-k kept — longer documents draw smaller
    // priorities in expectation, approximating weight-proportional
    // sampling while staying exactly replayable (the A-ES u^(1/w) float
    // key replaced by an integer surrogate). Runs through the bounded-
    // heap TopKPerKey operator, not a full window sort (q112's shape,
    // with weights).
    "q134_weighted_sample" -> ((s, d) => {
      graft.plans.TopKPerKey(
          t(s, d, "documents").where(col("n_chars") > 0)
            .select(col("doc_id"), col("lang"),
              expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)" +
                " div n_chars").as("pri")),
          Seq("lang"), Seq(asc("pri"), asc("doc_id")), 10)
        .select(col("lang"), col("doc_id"), col("pri"))
    }),

    // Duplicate-cluster size distribution: the corpus-health histogram a
    // dedup run is judged by (a fat tail of giant clusters means the LSH
    // params or the corpus need attention). Components come from the
    // distributed min-label propagation; two grouped counts after it.
    "q179_dup_cluster_sizes" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      Dedup.connectedComponents(pairs)
        .groupBy("label").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    }),

    // k-core graph peeling (3 rounds, k=3) over the LSH pair graph: each
    // round drops nodes below degree 3 and their edges — the community-
    // core extraction that separates dense duplicate clusters from
    // incidental pair noise. Fixed round count keeps it oracle-replayable
    // (the q132 rule for iterative graph ops); each round is one degree
    // aggregation and two semi-joins, all keyed shuffles.
    "q171_kcore" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      // persisted (the q132/q163 pattern): the LSH pair generation would
      // otherwise replay per peeling round. Caller contract: queries that
      // persist rely on the harness's spark.catalog.clearCache() after
      // materialization (Verify/Bench both do); ad-hoc callers embedding
      // these plans should clearCache or unpersist themselves.
      var edges = pairs.select(col("id1").as("a"), col("id2").as("b")).persist()
      for (_ <- 1 to 3) {
        val deg = edges.select(col("a").as("id"))
          .unionAll(edges.select(col("b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("deg"))
        val keep = deg.where(col("deg") >= 3).select("id")
        edges = edges
          .join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
          // generation cut (q132/q185 lesson): each round's edge list
          // feeds four consumers next round (two union branches for the
          // degree count and two semi-join probes)
          .localCheckpoint(true)
      }
      edges.select(col("a").as("id"))
        .unionAll(edges.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    }),

    // Confusion matrix + precision/recall/F1 at a fixed score threshold —
    // pure integer counts and integer micro-divisions, the classification
    // eval triplet next to AUC (ranking) and calibration (probabilities).
    // F1 from counts: f1 = 2*tp*1e6 div (2*tp + fp + fn).
    "q166_confusion" -> ((s, d) => {
      val scored = t(s, d, "embeddings").select(
        (element_at(col("embedding"), 1) > 0).as("pred"),
        (col("label") % 2 === 1).as("pos"))
      scored.agg(
          sum(when(col("pred") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("pred") && col("pos"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("pred") && !col("pos"), 1L).otherwise(0L)).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("CASE WHEN tp + fp = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE (tp * 1000000) div (tp + fp) END").as("precision_e6"),
          expr("CASE WHEN tp + fn = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE (tp * 1000000) div (tp + fn) END").as("recall_e6"),
          expr("CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE (2 * tp * 1000000) div (2 * tp + fp + fn) END").as("f1_e6"))
    }),

    // Feature hashing (the hashing trick): tokens land in a fixed
    // 1024-dim space by content hash, per-doc counts become the sparse
    // training vector — no vocabulary pass, no driver state, reshard-
    // stable. Output limited to one doc slice for the oracle.
    "q167_feature_hash" -> ((s, d) => {
      t(s, d, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tk"))
        .select(col("doc_id"),
          (TextFunctions.hash60(col("tk")) % 1024).as("dim"))
        .groupBy("doc_id", "dim").agg(count(lit(1)).as("v"))
    }),

    // Temperature softmax over per-type mean scores, exact across
    // engines: each exp term is floored to an integer e9 unit FIRST, the
    // distribution is then ratios of integers (q168 rule: when a float
    // sum's order can't be pinned cheaply, make the terms integers and
    // the sum exact). The max mean is subtracted before exp — the
    // standard softmax stabilization — which here also BOUNDS every term
    // at 1e9 and z at n_types*1e9, so no magnitude of input means can
    // overflow the e9/e6 integer arithmetic (Spark would wrap silently
    // where DuckDB throws). exp-ulp parity between JVM and libm is the
    // same empirical assumption the ln-based oracles make (q116/q127).
    "q168_softmax" -> ((s, d) => {
      val means = t(s, d, "events")
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("v"))
        .groupBy("event_type")
        .agg(expr("sum(v) div count(*)").as("mean_e2"))
      val mx = means.agg(max("mean_e2").as("max_e2"))
      val eterm = floor(exp(
        (col("mean_e2") - col("max_e2")).cast("double") / 10000.0) * 1e9)
        .cast("long")
      val terms = means.crossJoin(broadcast(mx))
        .select(col("event_type"), eterm.as("e_e9"))
      val tot = terms.agg(sum("e_e9").as("z"))
      terms.crossJoin(broadcast(tot))
        .select(col("event_type"),
          expr("(e_e9 * 1000000) div z").as("p_e6"))
    }),

    // L2 vector normalization (embedding prep): v / ||v|| in e6 integer
    // units per dimension, fingerprinted so the oracle compares one hash
    // per vector instead of 64 columns. sqrt is IEEE-exact, so the only
    // pinning needed is the norm's sum order — the established explicit
    // chain on both sides.
    "q169_l2_normalize" -> ((s, d) => {
      val e = t(s, d, "embeddings").where(col("vec_id") < 500)
        // norm2 is the SQUARED norm (dot(v,v)); the unit scale needs sqrt
        .withColumn("nrm", sqrt(Similarity.norm2("embedding")))
      e.select(col("vec_id"),
        when(col("nrm") > 0.0, md5(array_join(
          transform(col("embedding"),
            x => floor(x.cast("double") / col("nrm") * 1e6).cast("long")
              .cast("string")), ",")))
          .as("unit_fp"))
    }),

    // Record-linkage best match: the fuzzy-join candidate pairs resolved
    // to each record's single best counterpart (lowest edit distance,
    // id tiebreak) — blocking + scoring + 1:1 resolution, the full
    // linkage pipeline shape. Symmetric closure of the (id1 < id2) pair
    // stream, then one partitioned window; no re-scoring.
    "q163_best_match" -> ((s, d) => {
      // persisted (the q132 pattern): both union branches read the pair
      // stream, and exchange reuse shares shuffles but NOT the post-
      // shuffle levenshtein verification — unpersisted, that stage would
      // run twice. Harness clearCache releases it.
      val pairs = graft.operators.FuzzyJoin.selfJoin(
        t(s, d, "customer"), "c_custkey", "c_name", k = 1).persist()
      val sym = pairs.select(col("id1").as("src"), col("id2").as("dst"), col("ed"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst"), col("ed")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(asc("ed"), asc("dst"))
      sym.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("src"), col("dst").as("best_match"), col("ed"))
    }),

    // Classifier calibration table (reliability diagram data): positives
    // fraction per fixed-width score bucket — all integer counts and one
    // integer division, so the oracle is exact. The companion to AUC
    // (q155): AUC says the ranking is right, calibration says the
    // probabilities are.
    "q164_calibration" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(
          // true floor division: `floor(x*1e6) div 1e5` would truncate
          // toward zero, making bucket 0 span (-0.1, 0.1) — double-width,
          // mixing negative and positive scores in one reliability cell
          expr("floor(CAST(embedding[0] AS DOUBLE) * 10)")
            .cast("long").as("bucket"),
          (col("label") % 2 === 1).as("pos"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
        .withColumn("frac_e6", expr("(n_pos * 1000000) div n"))
    }),

    // Isotonic (PAV) calibration — the monotone fit sklearn's
    // IsotonicRegression applies on top of q164's raw reliability table.
    // The pool-adjacent-violators solution is computed CLOSED-FORM via
    // the minimax characterization fit_i = max_{j<=i} min_{k>=i}
    // mean(y[j..k]), entirely in integer FRACTION arithmetic: prefix
    // sums make every candidate mean an exact (num, den) pair and every
    // comparison a cross-multiplication — zero floats, so the whole fit
    // replays bit-exactly. O(B³) over B score buckets is trivial because
    // B is bounded by the bucketing (~20), NOT by row count — the
    // distributed work is only the per-bucket aggregation; the collect
    // is the bounded bucket table (the q91 bounded-form rule).
    "q264_isotonic_calibration" -> ((s, d) => {
      val cells = t(s, d, "embeddings")
        .select(expr("floor(CAST(embedding[0] AS DOUBLE) * 10)")
          .cast("long").as("bucket"), (col("label") % 2 === 1).as("pos"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      val wcum = org.apache.spark.sql.expressions.Window
        .orderBy("bucket").rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val withCum = cells
        .withColumn("cp", sum("npos").over(wcum))
        .withColumn("cc", sum("n").over(wcum))
      withCum
        .agg(array_sort(collect_list(struct(col("bucket"), col("n"),
          col("npos"), col("cp"), col("cc")))).as("arr"))
        .select(explode(expr(
          """transform(sequence(1, size(arr)), i -> named_struct(
               'bucket', element_at(arr, i).bucket,
               'n', element_at(arr, i).n,
               'npos', element_at(arr, i).npos,
               'fit', aggregate(
                 transform(sequence(1, i), j -> aggregate(
                   transform(sequence(i, size(arr)), k -> named_struct(
                     'fn', element_at(arr, k).cp - (case when j = 1
                       then cast(0 as bigint)
                       else element_at(arr, j - 1).cp end),
                     'fd', element_at(arr, k).cc - (case when j = 1
                       then cast(0 as bigint)
                       else element_at(arr, j - 1).cc end))),
                   named_struct('fn', cast(2 as bigint), 'fd', cast(1 as bigint)),
                   (mn, f) -> case when f.fn * mn.fd < mn.fn * f.fd
                     then f else mn end)),
                 named_struct('fn', cast(-1 as bigint), 'fd', cast(1 as bigint)),
                 (best, mf) -> case when mf.fn * best.fd > best.fn * mf.fd
                   then mf else best end)))""")).as("r"))
        .select(col("r.bucket").as("bucket"), col("r.n").as("n"),
          col("r.npos").as("npos"), col("r.fit.fn").as("fit_num"),
          col("r.fit.fd").as("fit_den"))
        .withColumn("fit_e6", expr("fit_num * 1000000 div fit_den"))
    }),

    // Population stability index between the hash-split train and test
    // score distributions — the drift gate run before every model
    // refresh. Fixed n_chars bins; per-bin contribution (p-q)*ln(p/q)
    // floored to integer e12 and summed associatively (q152's shape);
    // bins empty on either side are counted, not silently folded in.
    "q165_psi" -> ((s, d) => {
      val h = TextFunctions.hash60(col("text")) % 100
      val binned = t(s, d, "documents")
        .select(when(h < 80, lit("train")).otherwise(lit("test")).as("split"),
          least(expr("n_chars div 100"), lit(9L)).as("bin"))
      val cells = binned.groupBy("bin").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("cp"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("cq"))
      val tot = cells.agg(sum("cp").as("np"), sum("cq").as("nq"))
      val p = col("cp").cast("double") / col("np").cast("double")
      val q = col("cq").cast("double") / col("nq").cast("double")
      cells.crossJoin(broadcast(tot))
        .select(
          when(col("cp") > 0 && col("cq") > 0,
            floor((p - q) * log(p / q) * 1e12).cast("long")).as("c_e12"),
          when(col("cp") === 0 || col("cq") === 0, 1L).otherwise(0L).as("empty"))
        .agg(count(lit(1)).as("n_bins"), sum("empty").as("n_onesided"),
          sum("c_e12").as("psi_e12"))
    }),

    // Retrieval-quality metrics (MRR, NDCG@10) of a quantized ANN system
    // against exact-cosine ground truth: "how much does int6 quantization
    // hurt ranking" — the eval that decides whether the cheap index is
    // good enough to ship. Truth = exact cosine top-10 with graded
    // relevance 10..1; system = ranking by INTEGER dot product of
    // floor(x*64) quantized vectors (exact in both engines, so the system
    // ranking is bit-reproducible). DCG terms are floored to integer e9
    // units per position (associative sum, q152's trick); MRR and the
    // final NDCG ratio are integer divisions.
    "q160_rank_metrics" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val ids = Seq(100L, 200L)
      val qs = e.where(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
      val cand = e.crossJoin(broadcast(qs))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("nrm", Similarity.norm2("embedding"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val wT = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      val truth = cand
        .withColumn("cos", Similarity.cosineWithNorms(
          Similarity.dot("embedding", "qemb"), col("nrm"), col("qn")))
        .withColumn("rnk", row_number().over(wT))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (lit(11L) - col("rnk")).as("rel"), col("rnk"))
      val quant = (c: Column) => transform(c,
        x => floor(x.cast("double") * 64).cast("long"))
      val wS = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("iscore"), asc("vec_id"))
      val sys = cand
        .withColumn("iscore", aggregate(
          zip_with(quant(col("embedding")), quant(col("qemb")), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
        .withColumn("srnk", row_number().over(wS))
        .where(col("srnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("srnk"))
      // identical discount expression on both sides: rel / (ln(r+1)/ln(2))
      def dcgTerm(rel: Column, rnk: Column): Column =
        floor(rel.cast("double") /
          (log(rnk.cast("double") + 1.0) / log(lit(2.0))) * 1e9).cast("long")
      val dcg = sys
        .join(truth.select(col("query_id"), col("neighbor_id"), col("rel")),
          Seq("query_id", "neighbor_id"), "left")
        .withColumn("rel0", coalesce(col("rel"), lit(0L)))
        .groupBy("query_id")
        .agg(sum(dcgTerm(col("rel0"), col("srnk"))).as("dcg_e9"),
          min(when(col("rel0") > 0, col("srnk"))).as("first_rel"),
          sum(when(col("rel0") > 0, 1L).otherwise(0L)).as("n_hit"))
      val idcg = truth.groupBy("query_id")
        .agg(sum(dcgTerm(col("rel"), col("rnk"))).as("idcg_e9"))
      dcg.join(idcg, "query_id")
        .select(col("query_id"), col("n_hit"),
          expr("CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT) " +
            "ELSE 1000000 div first_rel END").as("mrr_e6"),
          expr("(dcg_e9 * 1000000) div idcg_e9").as("ndcg_e6"))
    }),

    // Exact ROC AUC by the rank-sum (Mann-Whitney) identity: rank every
    // example by score through the scalable global-rank path (no single-
    // partition window), then AUC = (sum of positive ranks - np(np+1)/2)
    // / (np*nn) — all integer arithmetic until one truncating division,
    // so the oracle matches exactly. Ties in score are broken by id
    // (deterministic surrogate for the 0.5-credit convention; both
    // engines rank identically so parity is exact). Score = first
    // embedding dim in micro-units; positives = odd labels.
    "q155_auc" -> ((s, d) => {
      val e = t(s, d, "embeddings").select(
        col("vec_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6)
          .cast("long").as("score_e6"),
        (col("label") % 2 === 1).as("pos"))
      val ranked = graft.operators.Ranking.globalRank(
        e, "rnk", asc("score_e6"), asc("vec_id"))
      ranked.agg(
          sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"),
          sum(when(col("pos"), col("rnk")).otherwise(0L)).as("sumr"))
        .select(col("np"), col("nn"),
          // single-class guard: np*nn = 0 -> NULL in both engines (Spark
          // ANSI integral divide by zero would throw; DuckDB // 0 is NULL)
          expr("CASE WHEN np * nn = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE ((sumr - (np * (np + 1)) div 2) * 1000000) div (np * nn) END")
            .as("auc_e6"))
    }),

    // Tokenizer vocabulary build: corpus term frequencies above a min-count
    // cutoff, IDs assigned by global frequency rank (count desc, token asc)
    // through the scalable range-sort ranking operator — no single-partition
    // window, so a 100-TB corpus's multi-million-term vocab ranks
    // distributed (the q91 lesson applied to vocab construction).
    "q150_vocab_build" -> ((s, d) => {
      val tc = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .where(col("freq") >= 2)
      graft.operators.Ranking.globalRank(tc, "id", desc("freq"), asc("token"))
        .select(col("token"), col("freq"), col("id"))
    }),

    // BPE merge-step candidates: adjacent character-pair counts weighted by
    // word frequency — the statistic a byte-pair-encoding trainer computes
    // each round to pick the next merge. Words are collapsed to (word,
    // freq) FIRST, so the per-character explode runs over the distinct
    // vocabulary, not the corpus (the map-side collapse that makes BPE
    // rounds corpus-size-independent). Top 20 by count, pair-lexicographic
    // tiebreak.
    "q151_bpe_pairs" -> ((s, d) => {
      val wf = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("w"))
        .where(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("f"))
      wf.select(col("f"),
          explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), asc("pair"))
        .limit(20)
    }),

    // Corpus-scale BPE ENCODE (train_bert.py's tokenizer data-prep step):
    // train 8 merge rules on the collapsed (word, freq) vocabulary
    // (BpeTrainer.trainLocal — one vocab collect, delta-maintained pair
    // counts, zero per-merge cluster jobs), then apply the merge
    // table to the corpus via BpeTrainer.encode and report per-document
    // token stats. Scale shape: encoding runs once per DISTINCT word (the
    // vocabulary, not the corpus), the tokenized vocab is a broadcast dim
    // joined back to the exploded corpus, and the merge table itself is
    // literal ranks inside the encode expression — the whole corpus pass
    // is map-side. Oracle: the 8 training rounds are replayed as
    // macro-generated SQL (argmax pair + greedy positional merge with the
    // run-parity rule for l=r merges), so the learned rules — not just
    // the stats — are cross-checked.
    "q193_bpe_encode" -> ((s, d) => {
      val words = t(s, d, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("w"))
      val vocab = words.groupBy("w").agg(count(lit(1)).as("f"))
      val (merges, _) = graft.operators.BpeTrainer.trainLocal(vocab, "w", "f", 8)
      val wtoks = graft.operators.BpeTrainer
        .encode(vocab.select(col("w")), "w", merges)
        .select(col("w"), size(col("toks")).as("ntok"))
      words.join(broadcast(wtoks), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("ntok").as("n_tokens"),
          max("ntok").cast("long").as("max_word_toks"))
    }),

    // Multilingual temperature sampling (the XLM-R / mBERT mixture rule:
    // sample language l with q_l ∝ p_l^α, α = 0.3, flattening the size
    // distribution so low-resource languages are up-sampled). N cancels
    // in q_l = n_l^α / Σ n_l^α; each n^α is floored to an integer e9
    // unit BEFORE the cross-language sum, so the normalization is an
    // exact integer division in both engines (a double Σ pow would be
    // association-order-dependent), and boost_e3 = q/p is a division of
    // the two already-truncated integers. Scale shape: one key-shuffle
    // groupBy (#langs rows) + a 1-row broadcast — corpus pass is
    // map-side countable.
    "q194_temperature_mix" -> ((s, d) => {
      val perLang = t(s, d, "documents").groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("pow_e9",
          floor(pow(col("n_docs").cast("double"), 0.3) * 1e9).cast("long"))
      val tot = perLang.agg(sum("n_docs").as("n_total"), sum("pow_e9").as("spow_e9"))
      perLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          expr("(n_docs * 1000000) div n_total").as("p_e6"),
          expr("(pow_e9 * 1000000) div spow_e9").as("q_e6"))
        .withColumn("boost_e3", expr("(q_e6 * 1000) div p_e6"))
    }),

    // MinHash estimator accuracy — the Broder estimate measured against
    // ground truth: for every LSH candidate pair, signature agreement
    // ĵ = |{i : sig_i(A) = sig_i(B)}| / numPerms vs the exact
    // distinct-shingle Jaccard. This is the calibration a pipeline runs
    // before trusting an LSH threshold on a new corpus. Signatures come
    // from the same exploded min-aggregate path as banding (inlining 32
    // re-hashes into one expression is the measured codegen blowup), the
    // candidate set bounds the quadratic term, and exact Jaccard touches
    // only candidate pairs' shingle sets.
    "q195_minhash_accuracy" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", p)
      val sig = Dedup.signatures(docs, "doc_id", "text", p)
      val sa = sig.toDF(sig.columns.map(c => if (c == "doc") "id1" else s"a_$c"): _*)
      val sb = sig.toDF(sig.columns.map(c => if (c == "doc") "id2" else s"b_$c"): _*)
      val sh = docs.where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      val nEq = (0 until p.numPerms)
        .map(i => when(col(s"a_s$i") === col(s"b_s$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      pairs
        .join(sa, "id1").join(sb, "id2")
        .withColumn("n_eq", nEq)
        .select(col("id1"), col("id2"), col("n_eq"))
        .join(sh.select(col("doc_id").as("id1"), col("shs").as("sh1")), "id1")
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("sh2")), "id2")
        .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("long"))
        .withColumn("uni",
          size(col("sh1")).cast("long") + size(col("sh2")).cast("long") - col("inter"))
        .select(col("id1"), col("id2"),
          expr(s"(n_eq * 1000000) div ${p.numPerms}").as("est_e6"),
          expr("(inter * 1000000) div uni").as("true_e6"),
          abs(expr(s"(n_eq * 1000000) div ${p.numPerms}") -
            expr("(inter * 1000000) div uni")).as("err_e6"))
    }),

    // Gopher-style quality rule suite (the published pretraining-corpus
    // format heuristics: word-count bounds, mean-word-length bounds,
    // symbol-to-word ratio, alphabetic-word fraction, stopword
    // presence) — each rule a NAMED boolean so per-rule pass rates are
    // auditable, not just the final verdict. Every comparison is an
    // integer cross-multiplication (no float ratios), so the oracle
    // replays the booleans exactly. Map-side only — scales trivially.
    "q196_gopher_rules" -> ((s, d) => {
      val w = TextFunctions.tokens(col("text"))
      val nW = size(w).cast("long")
      val sumLen = aggregate(transform(w, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x)
      val nHash = (length(col("text")) -
        length(regexp_replace(col("text"), "#", ""))).cast("long")
      val nEllipsis = ((length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
      val nAlphaW = size(filter(w, t => t.rlike("[a-z]"))).cast("long")
      val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val nStops = size(array_intersect(array_distinct(w),
        array(gopherStops.map(lit): _*))).cast("long")
      t(s, d, "documents").select(col("doc_id"), nW.as("n_words"),
        (nW >= 50L && nW <= 100000L).as("rule_word_count"),
        (sumLen >= nW * 3L && sumLen <= nW * 10L).as("rule_mean_word_len"),
        ((nHash + nEllipsis) * 10L <= nW).as("rule_symbol_ratio"),
        (nAlphaW * 10L >= nW * 8L).as("rule_alpha_words"),
        (nStops >= 2L).as("rule_stopwords"))
        .withColumn("keep",
          col("rule_word_count") && col("rule_mean_word_len") &&
            col("rule_symbol_ratio") && col("rule_alpha_words") &&
            col("rule_stopwords"))
    }),

    // DSIR importance weights (data selection via hashed-ngram importance
    // resampling): hashed bigram features (60-bit md5 mod 8192 buckets),
    // target distribution = the src0 slice, raw = everything else;
    // per-bucket log-likelihood ratio delta_e9 = floor(1e9·(ln p̂_t −
    // ln p̂_r)) with add-1 smoothing, and a doc's weight is the INTEGER
    // sum of its bigram occurrences' deltas — associative, map-side
    // combinable. Scale shape: the corpus pass is one explode + one
    // (doc, bucket) key shuffle; the 8192-row ratio table is a broadcast
    // dim; totals are a 1-row broadcast. The single float op (the ln)
    // happens once per BUCKET, not per row.
    "q197_dsir_weights" -> ((s, d) => {
      val nBuckets = 8192L
      val docs = t(s, d, "documents")
      // persisted (the q163 pattern): the exploded bigram stream feeds the
      // bucket counts AND the per-doc counts, and the tiny bucket-count
      // frame feeds totals AND deltas — unpersisted, the corpus explode
      // would run 4x (measured ~2x wall on the sf0.1 bench). A pre-
      // aggregated (doc, source, bucket) variant was measured SLOWER
      // (3.1s → 4.6s at sf0.1): distinct (doc, bucket) is nearly the raw
      // occurrence count here, so the extra wide-key hash aggregate buys
      // no compression. Harness clearCache releases both.
      // bigram buckets via the winnowing trick: one md5 per TOKEN
      // (reused by both bigrams spanning it) + a Horner step mod 2^31-1
      // instead of one md5 per bigram STRING — same map-side shape,
      // ~half the hashed bytes and no bigram string materialization
      val toks = TextFunctions.tokens(col("text"))
      val big = docs.where(size(toks) >= 2)
        .select(col("doc_id"), col("source"),
          transform(toks,
            tk => pmod(TextFunctions.hash60(tk), lit(1073741824L))).as("ht"))
        .select(col("doc_id"), col("source"),
          explode(expr(s"""transform(sequence(1, size(ht) - 1),
            i -> ((ht[i-1] * $WinnowB + ht[i]) % $WinnowP) % $nBuckets)"""))
            .as("bucket"))
        .persist()
      val bc = big.groupBy("bucket").agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("cr"))
        .persist()
      val tot = bc.agg(sum("ct").as("nt"), sum("cr").as("nr"))
      val delta = bc.crossJoin(broadcast(tot)).select(col("bucket"),
        floor((log((col("ct") + 1L).cast("double") /
            (col("nt") + nBuckets).cast("double")) -
          log((col("cr") + 1L).cast("double") /
            (col("nr") + nBuckets).cast("double"))) * 1e9)
          .cast("long").as("delta_e9"))
      big.where(col("source") =!= "src0")
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
        .join(broadcast(delta), "bucket")
        .groupBy("doc_id").agg(sum("c").as("n_bigrams"),
          sum(col("c") * col("delta_e9")).as("logw_e9"))
    }),

    // Gopher-style REPETITION rule suite (the companion to q196's format
    // rules; q103 covers only the distinct-word ratio): per document, the
    // occurrence share of the single most frequent bigram and the share
    // of 5-gram occurrences that are duplicated — with the published-
    // threshold verdicts (top 2-gram ≤ 20%, duplicate 5-grams ≤ 15%) as
    // integer cross-multiplications. Scale shape: two generator explodes
    // and (doc, gram) key shuffles — per-doc state never leaves its key.
    "q201_repetition_rules" -> ((s, d) => {
      // Per-doc gram-repetition stats computed ENTIRELY map-side (the
      // q83 sorted-runs trick, upgraded with gramHash62): sort each
      // doc's 62-bit gram hashes and fold the runs — max run length =
      // top-gram count, occurrences in runs >1 = duplicated-gram mass.
      // No (doc, gram) rows ever exist, no explode shuffle, no per-gram
      // md5; the only exchange left is whatever reads the output.
      // runStats folds (prev, cur, mx, sgl=singleton runs) over the
      // sorted array; empty arrays yield (mx 0, sgl 0).
      def sortedGrams(k: Int): String =
        s"""array_sort(transform(sequence(1, size(ht) - ${k - 1}),
            i -> ${gramHash62("i-1", k)}))"""
      def runStats(arr: String): String = {
        val one = "CAST(1 AS BIGINT)"
        s"""aggregate($arr,
          named_struct('prev', CAST(-1 AS BIGINT), 'cur', CAST(0 AS BIGINT),
            'mx', CAST(0 AS BIGINT), 'sgl', CAST(0 AS BIGINT)),
          (st, x) -> IF(x = st.prev,
            named_struct('prev', x, 'cur', st.cur + $one, 'mx', st.mx,
              'sgl', st.sgl),
            named_struct('prev', x, 'cur', $one,
              'mx', greatest(st.mx, st.cur),
              'sgl', st.sgl + IF(st.cur = 1, $one, CAST(0 AS BIGINT)))),
          st -> named_struct('mx', greatest(st.mx, st.cur),
            'sgl', st.sgl + IF(st.cur = 1, $one, CAST(0 AS BIGINT))))"""
      }
      tokenHashes(t(s, d, "documents"), 2)
        .select(col("doc_id"),
          (size(col("ht")) - 1).cast("long").as("n_bigrams"),
          expr(s"${runStats(sortedGrams(2))}.mx").as("top_bigram_c"),
          greatest(size(col("ht")) - 4, lit(0)).cast("long").as("n_5grams"),
          expr(s"""CASE WHEN size(ht) >= 5 THEN
              CAST(size(ht) - 4 AS BIGINT)
                - ${runStats(sortedGrams(5))}.sgl
            ELSE CAST(0 AS BIGINT) END""").as("dup_5gram_occ"))
        .withColumn("top_bigram_frac_e6",
          expr("(top_bigram_c * 1000000) div n_bigrams"))
        .withColumn("dup_5gram_frac_e6",
          expr("CASE WHEN n_5grams > 0 THEN (dup_5gram_occ * 1000000) div n_5grams ELSE 0 END"))
        .withColumn("rule_top_bigram", col("top_bigram_c") * 5L <= col("n_bigrams"))
        .withColumn("rule_dup_5gram",
          col("dup_5gram_occ") * 20L <= col("n_5grams") * 3L)
        .withColumn("keep", col("rule_top_bigram") && col("rule_dup_5gram"))
    }),

    // Per-source Zipf fit — the corpus-health diagnostic (a natural
    // corpus has slope ≈ −1; template/boilerplate-heavy sources flatten
    // or steepen): OLS of ln(freq) on ln(rank) over each source's top-100
    // terms. The top-k cut runs through the TopKPerKey bounded-heap
    // operator (no per-source global sort); each term's ln products are
    // floored to integer units BEFORE the per-source sums (associative,
    // order-proof), and the closed-form slope/intercept are one pinned
    // double expression over the six integer sums. Sums stay < 2^53, so
    // the int→double conversion is exact in both engines.
    "q202_zipf_fit" -> ((s, d) => {
      val tc = t(s, d, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tk"))
        .groupBy("source", "tk").agg(count(lit(1)).as("c"))
      val top = graft.plans.TopKPerKey(
        tc, Seq("source"), Seq(desc("c"), asc("tk")), k = 100)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("c"), asc("tk"))
      val ranked = top.withColumn("r", row_number().over(w).cast("long"))
        .select(col("source"),
          floor(log(col("r").cast("double")) * 1e9).cast("long").as("x_e9"),
          floor(log(col("c").cast("double")) * 1e9).cast("long").as("y_e9"),
          floor(log(col("r").cast("double")) * log(col("c").cast("double")) * 1e12)
            .cast("long").as("xy_e12"),
          floor(log(col("r").cast("double")) * log(col("r").cast("double")) * 1e12)
            .cast("long").as("xx_e12"))
      val sums = ranked.groupBy("source").agg(
        count(lit(1)).as("n"), sum("x_e9").as("sx"), sum("y_e9").as("sy"),
        sum("xy_e12").as("sxy"), sum("xx_e12").as("sxx"))
      val slope = (col("n").cast("double") * (col("sxy").cast("double") / 1e12) -
        (col("sx").cast("double") / 1e9) * (col("sy").cast("double") / 1e9)) /
        (col("n").cast("double") * (col("sxx").cast("double") / 1e12) -
          (col("sx").cast("double") / 1e9) * (col("sx").cast("double") / 1e9))
      sums.select(col("source"), col("n").as("n_terms"),
        floor(slope * 1e6).cast("long").as("slope_e6"),
        floor(((col("sy").cast("double") / 1e9) / col("n").cast("double") -
          slope * (col("sx").cast("double") / 1e9) / col("n").cast("double")) * 1e6)
          .cast("long").as("intercept_e6"))
    }),

    // Language-ID confidence margin — the production companion of q52:
    // per-language stopword scores sorted, best vs runner-up, and a
    // low-confidence flag (margin < 2 or no signal) marking docs a real
    // pipeline routes to a heavier classifier. Map-side only; the score
    // sort is a 4-element in-row array sort.
    "q203_langid_margin" -> ((s, d) => {
      val hits = TextFunctions.langStopwords.map { case (_, ws) =>
        TextFunctions.stopwordHits(col("text"), ws).cast("long")
      }
      val sorted = sort_array(array(hits: _*), asc = false)
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.langId(col("text")).as("pred_lang"),
          element_at(sorted, 1).as("best"),
          element_at(sorted, 2).as("second"))
        .withColumn("margin", col("best") - col("second"))
        .withColumn("confident", col("best") > 0L && col("margin") >= 2L)
    }),

    // Stratified eval-set draw: per (lang, length-bucket) stratum take
    // the k=5 content-hash-smallest docs — a deterministic, reshard-
    // stable balanced evaluation sample (the q108/q105 hash-sampling
    // principle applied per stratum). The per-stratum cut runs through
    // the TopKPerKey bounded-heap operator — no per-stratum sort, no
    // global sort, scales to any stratum count.
    "q204_eval_sample" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          expr("n_chars div 100").as("len_bucket"),
          TextFunctions.hash60(col("text")).as("h"))
      graft.plans.TopKPerKey(
          docs, Seq("lang", "len_bucket"), Seq(asc("h"), asc("doc_id")), k = 5)
        .select("doc_id", "lang", "len_bucket")
    }),

    // Hard-negative mining (contrastive-training data prep): for each
    // query vector, the top-5 most-similar embeddings with a DIFFERENT
    // label — the negatives that actually move a contrastive loss. Same
    // broadcast + per-query bounded window shape as q61; the label
    // inequality rides the broadcast join condition, and self is excluded
    // by its own label.
    "q205_hard_negatives" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id").isin(10L, 20L, 30L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qemb"),
          col("label").as("qlabel"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      e.withColumn("nrm", Similarity.norm2("embedding"))
        .crossJoin(broadcast(q))
        .where(col("label") =!= col("qlabel"))
        .withColumn("cos", Similarity.cosineWithNorms(
          Similarity.dot("embedding", "qemb"), col("nrm"), col("qn")))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("query_id"), col("vec_id").as("neg_id"), col("rnk"),
          floor(col("cos") * 1e6).cast("long").as("cos_e6"))
    }),

    // Seedlist keyword tagging (the reference's pre-model baseline
    // classifier, `check_presence_seedlist_keyword.py:24-78`): flag docs
    // matching ANY seed pattern — gap regexes first, then plain n-gram
    // containment, exactly the reference's regex_match_string order.
    // Pure codegen column ops (RLIKE + Contains) — map-side only, no
    // shuffle, the shape that tags 100 TB at scan speed. Per-family hit
    // counts keep the flag auditable.
    "q210_seedlist_tag" -> ((s, d) => {
      val (rx, ng, flag) = seedlistCols
      t(s, d, "documents").select(col("doc_id"),
        rx.as("n_regex_hits"), ng.as("n_ngram_hits"),
        flag.as("seedlist_keyword"))
    }),

    // Regex-feature linear scorer (the reference's expansion step,
    // `lr_prediction.py:22-27`: presence features over the seedlist
    // patterns through K trained logistic models, predict_proba > 0.5).
    // Weights are a fixture dim (training is offline, F10 posture); see
    // operators/LinearScorer for the exact-integer threshold design.
    "q342_lr_expansion" -> ((s, d) => {
      import s.implicits._
      val models = lrModelRows.toDF("model_id", "w_e6", "b_e6")
      graft.operators.LinearScorer.score(t(s, d, "documents"), col("text"),
        seedRegexes, seedNgrams, models, col("doc_id"))
    }),

    // Stupid Backoff bigram LM scoring (Brants et al. 2007 — the
    // web-scale LM that drops normalization so every probe is a count
    // ratio): score the src0 slice against the LM trained on everything
    // else. Per distinct doc bigram (h1,h2): if the bigram is in the
    // train table, s_e6 = c12·1e6 div c1; else back off to the unigram,
    // s_e6 = 2·c2·1e6 div (5·N) (the canonical α=0.4 as the exact
    // fraction 2/5); unseen both ways scores 0. Doc score = occurrence-
    // weighted mean in e6 trunc division — every step integer, so the
    // oracle replays bit-for-bit (no ln, unlike q127: Stupid Backoff's
    // whole point is staying in ratio space). Tokens/bigrams are
    // gramHash62/token-hash keyed — no gram strings anywhere. Scale
    // shape: train tables are keyed aggregates of the train scan; the
    // probe joins per DISTINCT doc bigram (pre-aggregated with counts)
    // against the bigram and unigram tables — three keyed equi-joins,
    // nothing broadcast-unbounded, nothing quadratic.
    "q343_stupid_backoff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def toks(df: DataFrame) = tokenHashes(df, 1)
      val train = toks(docs.where(col("source") =!= "src0")).persist()
      val uni = train.select(explode(col("ht")).as("h"))
        .groupBy("h").agg(count(lit(1)).as("c"))
      val nTot = train.select(explode(col("ht")).as("h"))
        .agg(count(lit(1)).as("n_tot"))
      val biTrain = train
        .where(size(col("ht")) >= 2)
        .select(explode(expr(
          s"transform(sequence(1, size(ht) - 1), i -> ${gramHash62("i-1", 2)})"))
          .as("g"))
        .groupBy("g").agg(count(lit(1)).as("c12"))
      val probe = toks(docs.where(col("source") === "src0"))
        .where(size(col("ht")) >= 2)
        .select(col("doc_id"), explode(expr(s"""transform(
            sequence(1, size(ht) - 1),
            i -> named_struct('g', ${gramHash62("i-1", 2)},
                              'h1', ht[i-1], 'h2', ht[i]))"""))
          .as("bg"))
        .select(col("doc_id"), col("bg.g").as("g"), col("bg.h1").as("h1"),
          col("bg.h2").as("h2"))
        .groupBy("doc_id", "g", "h1", "h2").agg(count(lit(1)).as("occ"))
      probe
        .join(biTrain, Seq("g"), "left")
        .join(uni.select(col("h").as("h1"), col("c").as("c1")), Seq("h1"), "left")
        .join(uni.select(col("h").as("h2"), col("c").as("c2")), Seq("h2"), "left")
        .crossJoin(broadcast(nTot))
        .withColumn("s_e6", expr("""CASE
          WHEN c12 IS NOT NULL AND c1 IS NOT NULL THEN (c12 * 1000000) div c1
          WHEN c2 IS NOT NULL THEN (2 * c2 * 1000000) div (5 * n_tot)
          ELSE CAST(0 AS BIGINT) END"""))
        .groupBy("doc_id")
        .agg(sum("occ").as("n_bigrams"),
          expr("sum(occ * s_e6) div sum(occ)").as("score_e6"))
    }),

    // fastText-style hashed bag-of-tokens classifier (Joulin et al.
    // 2016): each token hashes into one of 256 feature buckets, a doc's
    // feature vector is its bucket counts, and 3 linear class scores
    // pick an argmax label. Weights are a DETERMINISTIC FORMULA dim
    // (training offline, F10/q342 posture): w_e6(cls, b) =
    // ((cls·1000003 + b·7919) mod 2001 − 1000)·1000 — replayed
    // symbolically by the oracle, no literal table to drift. All
    // arithmetic integer; argmax ties break to the lowest class id via
    // max_by on the (score, -cls) struct. Scale shape: one map-side
    // explode + (doc, bucket) count agg, a broadcast 768-row weight
    // dim, one keyed re-aggregation per doc — the linear-classifier
    // fan-out pattern that tags a corpus at scan speed.
    "q344_hashed_bag_score" -> ((s, d) => {
      val x = tokenHashes(t(s, d, "documents"), 1)
        .select(col("doc_id"), explode(expr("transform(ht, h -> h % 256)"))
          .as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("x"))
      val wts = s.range(0, 3).select(col("id").as("cls"))
        .crossJoin(s.range(0, 256).select(col("id").as("b")))
        .select(col("cls"), col("b"),
          expr("((cls * 1000003 + b * 7919) % 2001 - 1000) * 1000").as("w_e6"))
      x.join(broadcast(wts), "b")
        .groupBy("doc_id", "cls").agg(sum(expr("x * w_e6")).as("score_e6"))
        .groupBy("doc_id")
        .agg(expr("max_by(cls, named_struct('s', score_e6, 'c', -cls))")
          .as("best_cls"),
          max("score_e6").as("best_score_e6"))
    }),

    // Temperature-scaled multilingual mixture (the mT5 / UniMax
    // sampling-rate shape, Xue et al. 2021 §3.1 with τ=2): language
    // sampling weight ∝ c_l^(1/2). floor(sqrt(c)) is exact in both
    // engines (sqrt IS correctly rounded; the floor lands on an
    // integer), so shares and the token-budget allocation are pure
    // integer trunc divisions; the UniMax-style cap alloc ≤ c_l (never
    // oversample past one epoch) is a single least() — the one-round
    // form, no iterative redistribution (documented divergence: UniMax
    // proper redistributes the capped surplus; at these shares the
    // fixed point is reached in one round). Scale shape: one token-count
    // groupBy by lang, then arithmetic on a #langs-row frame with a
    // 1-row broadcast total.
    "q345_temperature_mix" -> ((s, d) => {
      val counts = t(s, d, "documents")
        .select(col("lang"), size(TextFunctions.tokens(col("text")))
          .cast("long").as("n"))
        .groupBy("lang").agg(sum("n").as("c"))
        .withColumn("s", floor(sqrt(col("c").cast("double"))).cast("long"))
      val tot = counts.agg(sum("s").as("st"), sum("c").as("ct"))
      counts.crossJoin(broadcast(tot))
        .select(col("lang"), col("c"), col("s"),
          expr("(c * 1000000) div ct").as("p_e6"),
          expr("(s * 1000000) div st").as("q_e6"),
          least(expr("(50000 * s) div st"), col("c")).as("alloc_tokens"))
    }),

    // Mergeable quantile sketch (MRL compactors — see QuantileSketchAgg):
    // per-returnflag price deciles as a partial→merge→final aggregate,
    // the way a 100 TB percentile runs without q14's exact
    // percentile_approx state or a full sort. Like the q115/q209 MG
    // pattern, the ESTIMATES are merge-order-dependent, so the output
    // asserts the sketch's deterministic guarantee instead: each decile
    // estimate's EXACT rank (one extra indicator pass against the tiny
    // broadcast estimate frame) must sit within the MRL band
    // 2·L·n/(k−1) + k of its target rank — theorem-true for any merge
    // tree, so the oracle replays the verdicts as literal TRUE, and any
    // sketch regression flips a hash-checked cell.
    "q346_quantile_sketch" -> ((s, d) => {
      val kCap = 1024
      val li = t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100).cast("long").as("v"))
        .persist() // sketch pass + exact-rank pass
      val sk = li.groupBy("flag").agg(
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.QuantileSketchAgg(
            org.apache.spark.sql.GraftSqlBridge.expression(col("v")), kCap)
            .toAggregateExpression()).as("ests"),
        count(lit(1)).as("n"))
      val est = sk.select(col("flag"), col("n"),
          posexplode(col("ests")).as(Seq("d0", "est")))
        .select(col("flag"), col("n"), (col("d0") + 1).cast("long").as("d"),
          col("est"))
      li.join(broadcast(est), "flag")
        .groupBy("flag", "d", "n", "est")
        .agg(sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("rnk"))
        .select(col("flag"), col("d"), col("n"),
          expr(s"""abs(rnk - greatest(1L, (d * n) div 10)) <=
            (2 * (cast(ceil(log2(cast(2 * n as double) / $kCap)) as bigint) + 2)
              * n) div ${kCap - 1} + $kCap""").as("in_band"))
    }),

    // Keyword-based recall along the rank cut (the reference's
    // model-evaluation step, `recall/estimate_recall.py:64-77`: rank by
    // model score, cut at top-k, report the share of seedlist-positive
    // docs captured). The model score is a deterministic stand-in (hits
    // of the positive tonal list — BERT inference itself is out of
    // engine scope, SURVEY §2.10 F10). Rank assignment uses the scalable
    // globalRank (range-partitioned sort + zipWithIndex, q91's pattern);
    // the k grid and the positives total ride 1-row/4-row broadcasts.
    "q211_keyword_recall" -> ((s, d) => {
      import s.implicits._
      val (_, _, flag) = seedlistCols
      val docs = t(s, d, "documents").select(col("doc_id"),
        flag.as("pos"),
        TextFunctions.stopwordHits(col("text"), posWords).cast("long")
          .as("score"))
        .persist()
      val ranked = graft.operators.Ranking.globalRank(
        docs, "rnk", desc("score"), asc("doc_id"))
      val ks = Seq(10L, 50L, 100L, 250L).toDF("topk")
      val tot = docs.agg(sum("pos").as("n_positives"))
      ranked.crossJoin(broadcast(ks)).where(col("rnk") <= col("topk"))
        .groupBy("topk").agg(sum("pos").as("n_captured"))
        .crossJoin(broadcast(tot))
        .select(col("topk"), col("n_captured"), col("n_positives"),
          expr("n_captured * 1000000 div n_positives").as("recall_e6"))
    }),

    // SemDeDup — semantic (embedding-space) near-duplicate pruning in the
    // published shape (Abbas et al. 2023, arXiv:2303.09540): k-means the
    // embeddings, compute pairwise cosine ONLY within each cluster, and
    // among semantic duplicates (cos >= tau) keep the example LEAST
    // similar to its centroid (the paper's keep-low-prototypicality
    // rule; ties by id). One centroid step seeded from labels + integer
    // argmin assignment reuse q145's exact-integer k-means machinery, so
    // every similarity is a deterministic integer micro-unit. Scale
    // shape: the quadratic is confined to clusters (at corpus scale k
    // grows so cluster size stays bounded — the paper's own trick);
    // centroids ride a broadcast; the pair join shuffles on cluster id
    // only. The engine's lexical complement is q59/q76 MinHash dedup.
    "q212_semdedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val TauE6 = 250000L
      def idot(a: String, b: String) = expr(
        s"aggregate(zip_with($a, $b, (a, b) -> a * b), cast(0 as bigint), (acc, x) -> acc + x)")
      val ve = t(s, d, "embeddings").select(col("vec_id"),
        expr("""transform(embedding,
                  v -> cast(floor(cast(v as double) * 1000000.0) as bigint))""")
          .as("ve"),
        col("label").cast("long").as("c"))
      val cents = ve.select(col("c"), posexplode(col("ve")).as(Seq("dim", "v")))
        .groupBy("c", "dim").agg(expr("sum(v) div count(1)").as("cv"))
        .groupBy("c")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("ce"))
      val assigned = ve.drop("c").crossJoin(broadcast(cents))
        .withColumn("dist", expr(
          """aggregate(zip_with(ve, ce, (a, b) -> (a - b) * (a - b)),
             cast(0 as bigint), (acc, x) -> acc + x)"""))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dist"), col("c"))))
        .where(col("rn") === 1)
        .withColumn("n2", idot("ve", "ve"))
        .withColumn("centsim_e6", floor(idot("ve", "ce").cast("double")
          / (sqrt(col("n2").cast("double"))
            * sqrt(idot("ce", "ce").cast("double"))) * 1e6).cast("long"))
        .select(col("vec_id"), col("ve"), col("c"), col("n2"), col("centsim_e6"))
        .persist()
      val x = assigned.select(col("c"), col("vec_id").as("id_x"),
        col("ve").as("ve_x"), col("n2").as("n2_x"), col("centsim_e6").as("cs_x"))
      val y = assigned.select(col("c"), col("vec_id").as("id_y"),
        col("ve").as("ve_y"), col("n2").as("n2_y"), col("centsim_e6").as("cs_y"))
      val dropped = x.join(y, Seq("c")).where(col("id_x") =!= col("id_y"))
        .withColumn("cos_e6", floor(idot("ve_x", "ve_y").cast("double")
          / (sqrt(col("n2_x").cast("double")) * sqrt(col("n2_y").cast("double")))
          * 1e6).cast("long"))
        .where(col("cos_e6") >= TauE6)
        .where(col("cs_y") < col("cs_x") ||
          (col("cs_y") === col("cs_x") && col("id_y") < col("id_x")))
        .select(col("id_x").as("vec_id")).distinct()
        .withColumn("drp", lit(1L))
      assigned.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("c"), col("centsim_e6"),
          (lit(1L) - coalesce(col("drp"), lit(0L))).as("keep"))
    }),

    // Weighted sampling WITHOUT replacement, one distributed pass — the
    // Efraimidis-Spirakis exponential-race (key = ln(u)/w, take the k
    // largest per stratum), with the uniform u derived from the content
    // hash so the draw is deterministic and reshard-stable (the same
    // principle as q79/q204's hash sampling, now with WEIGHTS — the
    // mixture-sampling primitive that consumes q197's DSIR importance
    // weights; here w = n_chars, length-proportional). The per-source
    // cut runs through the TopKPerKey bounded heap: no per-stratum sort,
    // no global sort, fixed memory per key — the shape that draws a
    // weighted sample from 100 TB in one pass. Keys are floored to e9
    // integers BEFORE ordering so both engines rank identical values.
    "q215_weighted_draw" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        floor(
          log((TextFunctions.hash60(col("text")) % 1000000L + 1L)
            .cast("double") / lit(1000001.0d))
            / col("n_chars").cast("double") * 1e9)
          .cast("long").as("key_e9"))
      graft.plans.TopKPerKey(
          docs, Seq("source"), Seq(desc("key_e9"), asc("doc_id")), k = 10)
        .select("source", "doc_id", "key_e9")
    }),

    // Vocabulary coverage / OOV rate per source: the top-V-term
    // vocabulary (q150's build, cut with TakeOrderedAndProject — a
    // bounded limit, not a global sort; V=20 against this corpus's
    // 31-term vocabulary so the OOV tail is non-trivial) broadcast
    // against the token stream; per source, the share of token
    // occurrences outside the vocabulary. The tokenizer-health metric a training pipeline
    // tracks per corpus slice before committing to a vocab size.
    "q216_oov_rate" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tk"))
        .persist()
      val vocab = tok.groupBy("tk").agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc("tk")).limit(20)
        .select(col("tk"), lit(1L).as("in_vocab"))
      tok.join(broadcast(vocab), Seq("tk"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          expr("n_oov * 1000000 div n_tokens").as("oov_e6"))
    }),

    // Jaro-Winkler best-match linkage: per customer, the highest-JW
    // partner within a blocking bucket — the prefix-favoring complement
    // of q163's levenshtein linkage, scored by the engine's native
    // codegen graft_jaro_winkler (byte-level, bit-identical to DuckDB's
    // builtin, so floored e6 scores hash-compare). Blocking bounds the
    // quadratic (fixed bucket width -> pair count linear in customers);
    // the per-id argmax runs through the TopKPerKey bounded heap; ranks
    // compare FLOORED integer scores so both engines order identically.
    "q217_jw_linkage" -> ((s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          expr("c_custkey div 100").as("bkt"))
      val a = c.toDF("id1", "name1", "bkt")
      val b = c.toDF("id2", "name2", "bkt")
      val pairs = a.join(b, Seq("bkt")).where(col("id1") =!= col("id2"))
        .select(col("id1"), col("id2"),
          floor(TextFunctions.jaroWinkler(col("name1"), col("name2")) * 1e6)
            .cast("long").as("jw_e6"))
      graft.plans.TopKPerKey(
          pairs, Seq("id1"), Seq(desc("jw_e6"), asc("id2")), k = 1)
        .select("id1", "id2", "jw_e6")
    }),

    // Composed entity resolution (EntityResolution.resolve): q273's
    // blocking → q217's Jaro-Winkler scoring at a 0.98 threshold →
    // q76's distributed connected components → canonical entity per
    // record with entity sizes. Hash-checked end to end against a
    // recursive-CTE transitive closure — the record-linkage counterpart
    // of the curation/GPS/mixture compositions.
    "q299_entity_resolution" -> ((s, d) => {
      graft.operators.EntityResolution.resolve(
        t(s, d, "customer").select(col("c_custkey"), col("c_name"),
          expr("c_custkey div 100").as("bkt")),
        "c_custkey", "c_name", "bkt", 980000L)
    }),

    // Label-noise screening (the confident-learning intuition, integer
    // form): assign every embedding to its nearest LABEL-MEAN centroid
    // by exact integer L2 on micro-unit vectors; a vector whose nearest
    // centroid is another label's is a noise suspect. Per label: count,
    // disagreements, noise rate in e6 — the triage list an annotation
    // team re-reviews. k-way broadcast argmin, linear in vectors (the
    // q145/q82 machinery), every intermediate merge-order-proof.
    "q274_label_noise" -> ((s, d) => {
      val ve = t(s, d, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"), expr(
          """transform(embedding,
               v -> cast(floor(cast(v as double) * 1000000.0) as bigint))""")
          .as("ve"))
      val cents = ve.select(col("label").as("c"),
          posexplode(col("ve")).as(Seq("dim", "v")))
        .groupBy("c", "dim").agg(expr("sum(v) div count(1)").as("cv"))
        .groupBy("c")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x.getField("cv")).as("ce"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("dist"), col("c"))
      ve.crossJoin(broadcast(cents))
        .withColumn("dist", expr(
          """aggregate(zip_with(ve, ce, (a, b2) -> (a - b2) * (a - b2)),
             cast(0 as bigint), (acc, x) -> acc + x)"""))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .groupBy("label").agg(count(lit(1)).as("n"),
          sum(when(col("c") =!= col("label"), 1L).otherwise(0L))
            .as("n_disagree"))
        .withColumn("noise_e6", expr("(n_disagree * 1000000) div n"))
    }),

    // Blocking-quality report for the q217 linkage blocking — the two
    // numbers every record-linkage design doc must publish (Christen
    // 2012): REDUCTION RATIO (how much of the quadratic pair space the
    // blocking prunes; from bucket sizes, no pair materialization) and
    // PAIR COMPLETENESS (what fraction of true ed<=1 matches the
    // blocking keeps; truth from the Ed-Join prefix filter, q136's
    // machinery). Exact integers and two e6 divisions.
    "q273_blocking_quality" -> ((s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          expr("c_custkey div 100").as("bkt"))
      val nTotal = c.agg(count(lit(1)).as("n"))
        .select(expr("n * (n - 1) div 2").as("n_all_pairs"))
      val nBlocked = c.groupBy("bkt").agg(count(lit(1)).as("sz"))
        .agg(sum(expr("sz * (sz - 1) div 2")).as("n_blocked_pairs"))
      val truth = graft.operators.FuzzyJoin.selfJoin(
          t(s, d, "customer"), "c_custkey", "c_name", k = 1)
        .select(col("id1"), col("id2")).persist()
      val truthStats = truth.agg(count(lit(1)).as("n_true"),
        sum(when(expr("id1 div 100") === expr("id2 div 100"), 1L)
          .otherwise(0L)).as("n_true_blocked"))
      nTotal.crossJoin(broadcast(nBlocked)).crossJoin(broadcast(truthStats))
        .select(col("n_all_pairs"), col("n_blocked_pairs"),
          col("n_true"), col("n_true_blocked"),
          expr("((n_all_pairs - n_blocked_pairs) * 1000000) div n_all_pairs")
            .as("reduction_ratio_e6"),
          expr("(n_true_blocked * 1000000) div n_true")
            .as("pair_completeness_e6"))
    }),

    // Corpus datasheet per source — the "datasheets for datasets"
    // summary a curator publishes with a release: volume (docs, tokens,
    // mean length), language mix, quality-keep rate, and exact-dup rate,
    // every rate in integer micro-units. One persisted doc-level pass
    // feeds two aggregates (per-source core stats; fingerprint dup
    // groups) joined on source — the whole report costs two key-shuffles
    // regardless of corpus size. Composes the q53 keep verdict and the
    // q55/q56 fingerprint.
    "q220_datasheet" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_toks"),
          TextFunctions.qualityScore(col("text")).getField("keep").as("keep"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .persist()
      val core = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        sum("n_chars").as("sum_chars"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      val dups = docs.groupBy("source", "fp").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_docs"))
      core.join(dups, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("sum_chars * 100 div n_docs").as("mean_chars_e2"),
          expr("n_en * 1000000 div n_docs").as("en_e6"),
          expr("n_keep * 1000000 div n_docs").as("keep_e6"),
          expr("n_dup_docs * 1000000 div n_docs").as("dup_e6"))
    }),

    // Class-balanced downsampling: equalize label counts to the MINORITY
    // class size by keeping each label's hash-order-smallest rows — the
    // deterministic, reshard-stable undersampling a classifier-training
    // prep runs (same hash-draw principle as q79/q204, with the cut size
    // DERIVED from the data: min class count rides a 1-row broadcast).
    // Per-label cut through the TopKPerKey bounded heap... except k is
    // dynamic here, so the cut is a filter on the per-label hash rank
    // (window over label — keyed, never global). Output proves balance:
    // every label contributes exactly min-class-count rows.
    "q222_class_balance" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings").select(col("vec_id"),
        col("label").cast("long").as("label"),
        TextFunctions.hash60(col("vec_id").cast("string")).as("h"))
      val mn = e.groupBy("label").agg(count(lit(1)).as("n"))
        .agg(min("n").as("k"))
      val ranked = e.withColumn("rnk", row_number().over(
        Window.partitionBy("label").orderBy(asc("h"), asc("vec_id"))))
      ranked.crossJoin(broadcast(mn))
        .where(col("rnk") <= col("k"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("vec_id")).as("id_sum"))
    }),

    // Contrastive triplet mining: per anchor, the most-similar SAME-label
    // embedding (positive) and the most-similar DIFFERENT-label one (the
    // q205 hard negative), with the triplet margin — the training-pair
    // construction a metric-learning / embedding-finetune pipeline feeds
    // on. One broadcast of the anchors, one scan of the corpus, both
    // argmaxes through per-anchor bounded windows on FLOORED integer
    // scores (both engines rank identical values); margin < 0 flags the
    // triplets that actually carry gradient.
    "q223_triplets" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id").isin(10L, 20L, 30L))
        .select(col("vec_id").as("anchor_id"), col("embedding").as("qemb"),
          col("label").as("qlabel"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val scored = e.withColumn("nrm", Similarity.norm2("embedding"))
        .crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("anchor_id"))
        .withColumn("cos_e6", floor(Similarity.cosineWithNorms(
          Similarity.dot("embedding", "qemb"), col("nrm"), col("qn")) * 1e6)
          .cast("long"))
        .withColumn("same", col("label") === col("qlabel"))
        .persist()
      def top(sameLabel: Boolean, idName: String, cosName: String) = {
        val w = Window.partitionBy("anchor_id")
          .orderBy(desc("cos_e6"), asc("vec_id"))
        scored.where(col("same") === sameLabel)
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("anchor_id"), col("vec_id").as(idName),
            col("cos_e6").as(cosName))
      }
      top(sameLabel = true, "pos_id", "pos_cos_e6")
        .join(top(sameLabel = false, "neg_id", "neg_cos_e6"), Seq("anchor_id"))
        .withColumn("margin_e6", col("pos_cos_e6") - col("neg_cos_e6"))
    }),

    // Asymmetric containment over the LSH candidate pairs: |A∩B| / |A|
    // and / |B| on distinct shingle sets — the quote-expansion /
    // subset-document case symmetric Jaccard (q58/q195) under-scores: a
    // doc fully contained in a longer one has low Jaccard but
    // containment 1.0. Candidates come from the banded LSH buckets (the
    // q59 path), so the pair set is bounded; sets join in by doc id.
    "q224_containment" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
      val p = Dedup.MinHashParams()
      val sh = docs
        .where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      pairs
        .join(sh.select(col("doc_id").as("id1"), col("shs").as("sa")), Seq("id1"))
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("sb")), Seq("id2"))
        .select(col("id1"), col("id2"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
          size(col("sa")).cast("long").as("na"),
          size(col("sb")).cast("long").as("nb"))
        .withColumn("cont_a_e6", expr("inter * 1000000 div na"))
        .withColumn("cont_b_e6", expr("inter * 1000000 div nb"))
        .withColumn("contained",
          greatest(col("cont_a_e6"), col("cont_b_e6")) >= 800000L)
    }),

    // Community detection by synchronous label propagation over the LSH
    // candidate-pair graph, 3 rounds, fully deterministic: each node
    // adopts the most frequent neighbor label, ties broken by the
    // SMALLEST label (the raw LPA coin-flip would never oracle-check).
    // Complements the graph family (q121 triangles, q132 PageRank, q171
    // k-core, q76's connected components): LPA finds majority
    // communities, not mere reachability. Per round: one key-join + one
    // keyed count + a per-node argmax window; generation cut between
    // rounds (the q132/q145 lesson). Output is per-node, so a single
    // flipped label reddens the row.
    "q225_label_prop" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      val edges = pairs.select(col("id1").as("a"), col("id2").as("b"))
        .unionAll(pairs.select(col("id2").as("a"), col("id1").as("b")))
        .persist()
      var lab = edges.select(col("a").as("id")).distinct()
        .withColumn("lb", col("id"))
      for (_ <- 1 to 3) {
        val nb = edges
          .join(lab.select(col("id").as("b"), col("lb").as("nlb")), Seq("b"))
          .groupBy("a", "nlb").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("a").orderBy(desc("c"), asc("nlb"))
        lab = nb.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("a").as("id"), col("nlb").as("lb"))
          .localCheckpoint(true)
      }
      lab.select(col("id").as("doc_id"), col("lb").as("community"))
    }),

    // Join-key skew diagnostics: the measurement that decides whether a
    // key needs q100's salting BEFORE the job falls over — per-key
    // fan-in on the fact side, bucketed into log2 bands (how bad is the
    // tail), plus the top-5 heaviest keys with their share of all rows
    // in e6 micro-units. Two keyed aggregates and a TakeOrdered cut;
    // runs on the orders fact keyed by customer.
    "q226_skew_diagnostics" -> ((s, d) => {
      val counts = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("c")).persist()
      val tot = counts.agg(sum("c").as("n_rows"))
      val bands = counts
        // length(bin(c)) - 1 == floor(log2 c) in EXACT integer arithmetic —
        // float log2 can land a hair under an integer at powers of two and
        // floor differently per engine
        .select(expr("cast(length(bin(c)) - 1 as bigint)").as("log2_band"))
        .groupBy("log2_band").agg(count(lit(1)).as("n_keys"))
        .select(lit("band").as("kind"), col("log2_band").as("k"),
          col("n_keys").as("v"))
      val top = counts.orderBy(desc("c"), asc("o_custkey")).limit(5)
        .crossJoin(broadcast(tot))
        .select(lit("top_key").as("kind"), col("o_custkey").as("k"),
          expr("c * 1000000 div n_rows").as("v"))
      bands.unionByName(top)
    }),

    // Embedding sparsification: keep the top-m absolute-value dims per
    // vector as (idx, value) pairs — the memory-reduction step before an
    // inverted-index / sparse-ANN build (8 of 64 dims ≈ 8× smaller
    // candidates). Map-side only: an in-row struct sort (|v| desc, idx
    // asc on floored integers) and a slice; the retained-energy fraction
    // says what the cut cost. Sparse pairs are fingerprinted (md5 of the
    // ordered idx:val list) for the cross-engine compare — the q145
    // list-fingerprint trick.
    "q228_sparsify" -> ((s, d) => {
      val m = 8
      t(s, d, "embeddings").select(col("vec_id"),
        expr(s"""slice(array_sort(
            zip_with(embedding, sequence(0, ${Similarity.Dim - 1}),
              (v, i) -> struct(
                cast(floor(abs(cast(v as double)) * 1000000.0) as bigint) as a,
                i as idx,
                cast(floor(cast(v as double) * 1000000.0) as bigint) as ve6)),
            (x, y) -> case when x.a > y.a then -1 when x.a < y.a then 1
                           when x.idx < y.idx then -1 else 1 end),
          1, $m)""").as("top"),
        expr(s"""aggregate(
            transform(embedding,
              v -> cast(floor(abs(cast(v as double)) * 1000000.0) as bigint)),
            cast(0 as bigint), (acc, x) -> acc + x * x)""").as("total_en"))
        .select(col("vec_id"),
          md5(concat_ws(",", expr(
            "transform(top, t -> concat(cast(t.idx as string), ':', cast(t.ve6 as string)))")))
            .as("sparse_fp"),
          expr("aggregate(transform(top, t -> t.a * t.a), cast(0 as bigint), (acc, x) -> acc + x)")
            .as("kept_en"),
          col("total_en"))
        .select(col("vec_id"), col("sparse_fp"),
          expr("kept_en * 1000 div (total_en div 1000)").as("kept_energy_e6"))
    }),

    // Cross-source duplication matrix — which sources carry the same
    // content (syndication / mirror forensics, the provenance question
    // q220's within-source dup rate can't answer). The fingerprint is
    // the BAG-OF-WORDS canonicalization (sorted distinct tokens) — the
    // order-insensitive tier between q55's exact normalization and
    // q58's Jaccard, catching reorder-paraphrase syndication. Distinct
    // (source, fp) pairs self-join on the fingerprint (keyed shuffle);
    // with S sources the output is at most S², never corpus-sized.
    "q229_source_overlap" -> ((s, d) => {
      val bow = md5(array_join(
        array_sort(array_distinct(TextFunctions.tokens(col("text")))), " "))
      val fps = t(s, d, "documents")
        .select(col("source"), bow.as("fp"))
        .distinct().persist()
      fps.select(col("source").as("src_a"), col("fp"))
        .join(fps.select(col("source").as("src_b"), col("fp")), Seq("fp"))
        .where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared_fps"))
    }),

    // Inter-event burstiness per user: coefficient of variation of
    // inter-arrival gaps — CV ≈ 1 is Poisson, ≫ 1 is bursty, the
    // behavioral statistic bot-detection and capacity models start
    // from. Gaps via a per-user lag window (keyed); mean and variance
    // from exact integer sums with one pinned double tail (the q146
    // OLS recipe); gaps are truncated to whole SECONDS before squaring —
    // µs² of a month-long gap overflows int64, seconds² never does at
    // this horizon; users need ≥ 3 events for a defined variance.
    "q230_burstiness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("tm"), col("event_id"))
      val gaps = t(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tm"))
        .withColumn("prev", lag("tm", 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("user_id"), expr("(tm - prev) div 1000000").as("g"))
      gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"), sum("g").as("sg"),
          sum(expr("g * g")).as("sgg"))
        .where(col("n_gaps") >= 2 && col("sg") > 0)
        .select(col("user_id"), col("n_gaps"),
          expr("sg div n_gaps").as("mean_gap_s"),
          floor(
            sqrt((col("sgg").cast("double") * col("n_gaps").cast("double")
              - col("sg").cast("double") * col("sg").cast("double"))
              / (col("n_gaps").cast("double") * col("n_gaps").cast("double")))
            / (col("sg").cast("double") / col("n_gaps").cast("double")) * 1e6)
            .cast("long").as("cv_e6"))
    }),

    // Equi-width histogram of a continuous column per group — the
    // profiling readout q170's summary stats don't give (shape, not
    // just moments). Global [min, max] rides a 1-row broadcast; bin
    // assignment is exact integer arithmetic on micro-unit values
    // ((v - mn) * B div (mx - mn + 1), so the max lands in the last
    // bin); counts roll up map-side. One scan + one keyed aggregate at
    // any scale.
    "q231_histogram" -> ((s, d) => {
      val B = 20L
      val ev = t(s, d, "events").select(col("event_type"),
        floor(col("value") * 1e6).cast("long").as("v_e6"))
      val bounds = ev.agg(min("v_e6").as("mn"), max("v_e6").as("mx"))
      ev.crossJoin(broadcast(bounds))
        .select(col("event_type"),
          expr(s"(v_e6 - mn) * $B div (mx - mn + 1)").as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
    }),

    // Exact weighted median per group (the reference's
    // population-weighted wealth percentile generalized — W7's cumsum
    // applied to weights): within each part-brand, the retail price at
    // which the cumulative SIZE-weight first reaches half the group
    // total — lower weighted median, deterministic. One keyed window
    // cumsum + a per-group total join + an argmin by the crossing
    // point; nothing global.
    "q232_weighted_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = t(s, d, "part").select(col("p_brand"),
        floor(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size").cast("long").as("w"), col("p_partkey"))
      val w = Window.partitionBy("p_brand")
        .orderBy(col("price_c"), col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = p.withColumn("cw", sum("w").over(w))
      val tot = p.groupBy("p_brand").agg(sum("w").as("tw"))
      val w2 = Window.partitionBy("p_brand").orderBy(col("cw"), col("p_partkey"))
      cum.join(tot, Seq("p_brand"))
        .where(col("cw") * 2L >= col("tw"))
        .withColumn("rn", row_number().over(w2)).where(col("rn") === 1)
        .select(col("p_brand"), col("price_c").as("wmedian_c"), col("tw"))
    }),

    // A/B lift with CUPED variance reduction — the experimentation-
    // platform adjustment (Deng et al. 2013): per user, pre-period and
    // post-period value sums; theta = cov(pre, post) / var(pre) from
    // exact integer micro-unit sums (the q146 one-pass recipe, one
    // pinned double tail); adjusted post = post - theta * (pre -
    // mean_pre); report per-variant adjusted means and the lift.
    // Variant assignment is the deterministic user-id parity; the
    // moment row is a 1-row broadcast. Two keyed aggregates + map-side
    // arithmetic at any scale.
    "q233_cuped" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 1e6).cast("long").as("v_e6"))
      val span = ev.agg(min("day").as("d0"))
      val per = ev.crossJoin(broadcast(span))
        .select(col("user_id"),
          when(col("day") < col("d0") + 15L, col("v_e6")).otherwise(0L).as("pre"),
          when(col("day") >= col("d0") + 15L, col("v_e6")).otherwise(0L).as("post"))
        .groupBy("user_id")
        .agg(sum("pre").as("pre"), sum("post").as("post"))
        .withColumn("variant", col("user_id") % 2L)
        .persist()
      val m = per.agg(count(lit(1)).as("n"), sum("pre").as("sx"),
        sum("post").as("sy"), sum(expr("pre div 1000 * (pre div 1000)")).as("sxx"),
        sum(expr("pre div 1000 * (post div 1000)")).as("sxy"))
      val theta = (col("sxy").cast("double") * col("n").cast("double")
        - (col("sx").cast("double") / 1e3) * (col("sy").cast("double") / 1e3))
        ./(col("sxx").cast("double") * col("n").cast("double")
          - (col("sx").cast("double") / 1e3) * (col("sx").cast("double") / 1e3))
      per.crossJoin(broadcast(m))
        .withColumn("adj_e6", col("post").cast("double") -
          theta * (col("pre").cast("double") -
            col("sx").cast("double") / col("n").cast("double")))
        .groupBy("variant")
        .agg(count(lit(1)).as("n_users"),
          floor(avg(floor(col("adj_e6")).cast("long").cast("double")))
            .cast("long").as("adj_mean_e6"))
    }),

    // Sample-ratio mismatch check — the FIRST gate of any A/B readout
    // (a biased assignment invalidates everything downstream): chi2 of
    // observed variant user counts against the 50/50 design, in exact
    // micro-units ((o-e)² with e = n/2 cross-multiplied to avoid the
    // fraction), flagged at the conventional chi2 > 3.84 (alpha 0.05,
    // 1 df) via integer cross-multiplication. One distinct + one
    // 2-group aggregate.
    "q234_srm_check" -> ((s, d) => {
      // hash-based assignment (how real platforms bucket): organically
      // NEAR 50/50, so the chi2 is non-zero and the flag has a real
      // decision to make (id-parity would be exactly balanced -> chi2 0)
      val users = t(s, d, "events").select(col("user_id")).distinct()
        .withColumn("variant",
          TextFunctions.hash60(col("user_id").cast("string")) % 2L)
      val counts = users.groupBy("variant").agg(count(lit(1)).as("o"))
      val tot = counts.agg(sum("o").as("n"))
      // chi2 = sum (o - n/2)^2 / (n/2) = sum (2o - n)^2 / (2n)
      counts.crossJoin(broadcast(tot))
        .select(col("variant"), col("o"), col("n"),
          expr("(2 * o - n) * (2 * o - n)").as("dev2"))
        .groupBy()
        .agg(any_value(col("n")).as("n_users"),
          sum("dev2").as("sum_dev2"))
        .select(col("n_users"),
          expr("sum_dev2 * 1000000 div (2 * n_users)").as("chi2_e6"),
          // srm iff chi2 > 3.84  <=>  sum_dev2 * 100 > 384 * 2 * n
          expr("cast(sum_dev2 * 100 > 384 * 2 * n_users as bigint)")
            .as("srm_flag"))
    }),

    // Difference-in-differences — the 2x2 causal readout (treat/control
    // x pre/post): DID = (T_post - T_pre) - (C_post - C_pre) on
    // per-cell mean outcomes in exact micro-units (sums and counts
    // exact; each mean one trunc div; the DID one integer subtraction
    // chain). Same deterministic id-parity assignment and day split as
    // q233; one keyed aggregate over (variant, period).
    "q235_did" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 1e6).cast("long").as("v_e6"))
      val span = ev.agg(min("day").as("d0"))
      val cells = ev.crossJoin(broadcast(span))
        .select((col("user_id") % 2L).as("variant"),
          (col("day") >= col("d0") + 15L).cast("long").as("post"),
          col("v_e6"))
        .groupBy("variant", "post")
        .agg(sum("v_e6").as("sv"), count(lit(1)).as("n"))
        .select(col("variant"), col("post"),
          expr("sv div n").as("mean_e6"))
      val wide = cells.groupBy()
        .agg(sum(when(col("variant") === 1L && col("post") === 1L,
            col("mean_e6"))).as("t_post"),
          sum(when(col("variant") === 1L && col("post") === 0L,
            col("mean_e6"))).as("t_pre"),
          sum(when(col("variant") === 0L && col("post") === 1L,
            col("mean_e6"))).as("c_post"),
          sum(when(col("variant") === 0L && col("post") === 0L,
            col("mean_e6"))).as("c_pre"))
      wide.select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
        ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
          .as("did_e6"))
    }),

    // Benford first-digit forensics on order totals — the synthetic-data
    // / fraud screen auditors run: observed first-digit shares vs the
    // Benford expectation (log10(1 + 1/d), broadcast as a 9-row integer
    // dim), with the per-digit deviation in micro-units. First digit by
    // string head of the integer cents (exact — no float log in the
    // digit extraction). One scan + one 9-group aggregate.
    "q236_benford" -> ((s, d) => {
      import s.implicits._
      val digits = (1 to 9).map(dd =>
        (dd.toLong, math.floor(math.log10(1.0 + 1.0 / dd) * 1e6).toLong))
        .toDF("digit", "exp_e6")
      val obs = t(s, d, "orders")
        .select(substring(floor(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("o"))
      val tot = obs.agg(sum("o").as("n"))
      obs.join(broadcast(digits), Seq("digit"))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("o"),
          expr("o * 1000000 div n").as("obs_e6"), col("exp_e6"),
          abs(expr("o * 1000000 div n") - col("exp_e6")).as("dev_e6"))
    }),

    // Gini coefficient per customer segment — THE inequality statistic
    // of the reference's wealth analyses (`wbgps/analysis.py`'s wealth
    // percentiles feed exactly this): per mktsegment over account
    // balances shifted to non-negative cents, G = (2·Σ i·x_i) /
    // (n·Σx) − (n+1)/n on the within-group rank (keyed window; exact
    // integer rank-weighted sums — i·x_i ≤ 6e3·1e7·6e3 keeps the sum
    // under 2^53-in-double and well under int64; one pinned double
    // tail).
    "q237_gini" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val c = t(s, d, "customer").select(col("c_mktsegment").as("seg"),
        floor((col("c_acctbal") + lit(1000.0)) * 100).cast("long").as("x"),
        col("c_custkey"))
      val w = Window.partitionBy("seg").orderBy(col("x"), col("c_custkey"))
      val ranked = c.withColumn("i", row_number().over(w).cast("long"))
      ranked.groupBy("seg")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(expr("i * x")).as("six"))
        .select(col("seg"), col("n"),
          floor((lit(2.0) * col("six").cast("double")
            / (col("n").cast("double") * col("sx").cast("double"))
            - (col("n") + 1L).cast("double") / col("n").cast("double"))
            * 1e6).cast("long").as("gini_e6"))
    }),

    // Time-weighted average value per (user, event_type) series — each
    // observation holds until the next one (the sensor/price TWAP,
    // where a plain mean over-weights bursts): hold duration via a
    // keyed lead window in whole seconds, value·duration products in
    // exact integer micro-unit-seconds, one trunc div per series. The
    // last observation of a series has no successor and drops out —
    // the standard open-interval convention.
    "q238_twap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("tm"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("unix_micros(ts) div 1000000").as("tm"),
          floor(col("value") * 1e6).cast("long").as("v_e6"))
        .withColumn("nxt", lead("tm", 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("user_id"), col("event_type"),
          (col("nxt") - col("tm")).as("dur_s"), col("v_e6"))
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_holds"), sum("dur_s").as("total_s"),
          sum(expr("v_e6 * dur_s")).as("vd"))
        .where(col("total_s") > 0L)
        .select(col("user_id"), col("event_type"), col("n_holds"),
          col("total_s"), expr("vd div total_s").as("twap_e6"))
    }),

    // Herfindahl-Hirschman concentration index per market segment —
    // the market-concentration statistic (sum of squared revenue
    // shares) antitrust and market-structure analyses report, natural
    // next to q237's Gini: per segment, customer revenue totals in
    // whole dollars (cents² of a big customer overflows int64; the
    // truncation is part of the metric's definition here and identical
    // in both engines), HHI = Σx² / (Σx)² from the exact integer sums
    // with the single squared-total double tail. Two keyed aggregates.
    "q239_hhi" -> ((s, d) => {
      val rev = t(s, d, "orders")
        .join(t(s, d, "customer").select(col("c_custkey"),
          col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy("seg", "o_custkey").agg(sum("cents").as("x"))
      rev.groupBy("seg")
        .agg(count(lit(1)).as("n_firms"),
          sum(expr("x div 100")).as("sx"),
          sum(expr("(x div 100) * (x div 100)")).as("sxx"))
        .select(col("seg"), col("n_firms"),
          floor(col("sxx").cast("double")
            / (col("sx").cast("double") * col("sx").cast("double")) * 1e6)
            .cast("long").as("hhi_e6"))
    }),

    // Corpus-drift metric: Jensen-Shannon divergence between the unigram
    // distributions of two sources. Cross-engine float determinism WITHOUT
    // the q116 single-row array fold: each term's contribution is floored
    // to an INTEGER micro-unit (e12) and the integers are summed — an
    // associative, fully-distributed aggregation (map-side combinable, no
    // collect_list), which is the shape that survives a multi-million-term
    // vocabulary where one giant sorted array per row would not.
    "q152_js_divergence" -> ((s, d) => {
      val tok = t(s, d, "documents")
        .where(col("source").isin("src0", "src1"))
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tk"))
      val counts = tok.groupBy("tk").agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("cp"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("cq"))
      val tot = counts.agg(sum("cp").as("np"), sum("cq").as("nq"))
      val p = col("cp").cast("double") / col("np").cast("double")
      val q = col("cq").cast("double") / col("nq").cast("double")
      val m = (p + q) / 2.0
      val contrib =
        when(col("cp") > 0, p * log(p / m) * 0.5).otherwise(0.0) +
          when(col("cq") > 0, q * log(q / m) * 0.5).otherwise(0.0)
      counts.crossJoin(broadcast(tot))
        .select(floor(contrib * 1e12).cast("long").as("c_e12"))
        .agg(count(lit(1)).as("n_terms"), sum("c_e12").as("jsd_e12"))
    }),

    // Reciprocal Rank Fusion (Cormack et al., SIGIR'09) of two retrieval
    // rankings — the standard hybrid-search merge step (lexical + dense)
    // a retrieval pipeline runs before rerank. Two genuinely different
    // rankers over the same candidate set: cosine (normalized) and raw
    // dot product (unnormalized) against each query vector; each
    // contributes floor(1e9/(60+rank)) for its top-50 — integer
    // micro-units, so the fused ordering is exact cross-engine. Scale
    // shape: the per-query windows are keyed on query_id (millions of
    // queries parallelize); the candidate set per query is the ANN
    // stage's bounded output, not the corpus.
    "q246_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id").isin(10L, 20L, 30L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val scored = e.withColumn("nrm", Similarity.norm2("embedding"))
        .crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("dp", Similarity.dot("embedding", "qemb"))
        .withColumn("cos",
          Similarity.cosineWithNorms(col("dp"), col("nrm"), col("qn")))
      val wCos = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      val wDot = Window.partitionBy("query_id").orderBy(desc("dp"), asc("vec_id"))
      scored
        .withColumn("r_cos", row_number().over(wCos))
        .withColumn("r_dot", row_number().over(wDot))
        .where(col("r_cos") <= 50 || col("r_dot") <= 50)
        .withColumn("rrf_e9",
          expr("CASE WHEN r_cos <= 50 THEN 1000000000 div (60 + r_cos) ELSE 0 END")
            + expr("CASE WHEN r_dot <= 50 THEN 1000000000 div (60 + r_dot) ELSE 0 END"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("rrf_e9"), asc("vec_id"))))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rnk"), col("rrf_e9"))
    }),

    // Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR'98)
    // of the per-query top-20 cosine candidates: greedy diversified
    // selection of 10, score = rel − max-sim-to-selected, every score an
    // integer micro-unit quantized BEFORE the greedy walk (so the
    // sequential argmax is exactly replayable by the oracle's unrolled
    // per-step SQL). The pairwise-sim stage is confined WITHIN each
    // query's bounded pool — O(queries × pool²), never corpus².
    "q247_mmr_rerank" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val pool = Similarity.bruteForceTopK(
          e, e.where(col("vec_id").isin(10L, 20L, 30L)), 20)
        .select(col("query_id"), col("neighbor_id").as("vec_id"),
          col("cos_e6").as("rel_e6"))
      val pe = pool.join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .withColumn("nrm", Similarity.norm2("embedding"))
      val a = pe.select(col("query_id"), col("vec_id").as("a"),
        col("rel_e6").as("rel_a_e6"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = pe.select(col("query_id").as("qb"), col("vec_id").as("b"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(b, col("query_id") === col("qb") && col("a") =!= col("b"))
        .withColumn("sim_e6", floor(Similarity.cosineWithNorms(
          Similarity.dot("ea", "eb"), col("na"), col("nb")) * 1e6).cast("long"))
        .select("query_id", "a", "b", "rel_a_e6", "sim_e6")
      graft.operators.Mmr.rerank(pairs, 10)
    }),

    // Token-budget corpus fill — the "select the best N tokens" step of
    // training-mix assembly: order documents by type-token ratio
    // (integer micro-units, doc_id tiebreak), take the prefix whose
    // cumulative token count fits the budget. The cumulative sum is a
    // two-level distributed prefix sum — scalable global rank, coarse
    // 64-row buckets, per-bucket totals exclusive-scanned by the same
    // two-phase distributed PrefixScan (range-sort + broadcast offsets,
    // never a single-partition window), then a KEYED within-bucket
    // window. Both levels stay distributed at any n.
    "q248_token_budget_fill" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(col("text")).as("w"))
        .select(col("doc_id"), col("source"),
          size(col("w")).cast("long").as("n_tok"),
          size(array_distinct(col("w"))).cast("long").as("n_uniq"))
        .withColumn("prio_e6", expr("n_uniq * 1000000 div n_tok"))
      val ranked = graft.operators.Ranking.globalRank(
        docs, "rnk", desc("prio_e6"), asc("doc_id"))
      val bucketed = ranked.withColumn("bkt", expr("(rnk - 1) div 64"))
      val bktPre = graft.operators.PrefixScan.scanLong(
          bucketed.groupBy("bkt").agg(sum("n_tok").as("bt")),
          "pre_tok", "bt", "sum", inclusive = false, asc("bkt"))
        .select("bkt", "pre_tok")
      val wIn = Window.partitionBy("bkt").orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed.join(broadcast(bktPre), "bkt")
        .withColumn("cum_tok", col("pre_tok") + sum("n_tok").over(wIn))
        .where(col("cum_tok") <= 20000L)
        .select("doc_id", "source", "rnk", "n_tok", "prio_e6", "cum_tok")
    }),

    // DoReMi-style domain mixture reweighting (Xie et al. 2023,
    // arXiv:2305.10429): per-source excess loss (mean q127 unigram NLL
    // above the best source) drives 3 rounds of a damped multiplicative-
    // weights update — w ← w·(1 + η·excess·(1 − share)), η = 0.1 — and
    // the final normalized shares are the training mixture. The
    // reference alg retrains a proxy model between rounds (out of engine
    // scope); the damping term stands in for the diminishing return of a
    // domain already dominating the mix, and makes the rounds genuinely
    // sequential. Every step is integer-exact (micro-unit trunc
    // divisions on non-negative operands), so the oracle replays all 3
    // rounds bit-for-bit. Scale shape: the corpus-scale work is the NLL
    // scan; the iteration runs on the per-source aggregate frame
    // (#domains rows) with broadcast totals.
    "q249_doremi_mixture" -> ((s, d) => {
      val srcOf = t(s, d, "documents").select(col("doc_id"), col("source"))
      val loss = docNll(s, d).join(srcOf, "doc_id")
        .groupBy("source")
        .agg(expr("sum(avg_nll_e6) div count(1)").as("loss_e6"))
      graft.operators.Mixture.doremiShares(loss)
    }),

    // The composed training-mix assembly (`Mixture.assemble`) — the step
    // after curation: quality gate (q53 keep rule) → per-source DoReMi
    // shares from the kept corpus's unigram NLL (q249) → per-source
    // token-budget fill by type-token-ratio priority (q248's priority,
    // but KEYED per source — each source fills share·budget tokens with
    // its own windows, no global prefix sum). Hash-checked end to end:
    // every stage is integer-exact, so the oracle replays gate, NLL,
    // all 3 mixture rounds, and the fill in one SQL chain.
    "q250_training_mix" -> ((s, d) =>
      graft.operators.Mixture.assemble(t(s, d, "documents"), 10000L)),

    // Unicode NFC normalization (native codegen expression): every "e" is
    // mangled into decomposed "e"+U+0301 and normalized back — NFC must
    // recompose the pair to precomposed "é" (U+00E9), so len_nfc is
    // shorter than len_raw by exactly the number of injected marks and
    // the md5 matches the oracle's recomposed bytes. The front-of-
    // pipeline step that makes content fingerprints (q55/q56) stable
    // across mixed-provenance corpora.
    "q149_nfc_normalize" -> ((s, d) => {
      val mangled = expr("replace(text, 'e', 'e\u0301')")
      t(s, d, "documents").select(col("doc_id"),
        length(mangled).as("len_raw"),
        length(TextFunctions.nfc(mangled)).as("len_nfc"),
        md5(TextFunctions.nfc(mangled)).as("nfc_md5"))
    }),

    // Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    // MOSS algorithm): hash every word 4-gram, slide a window of 4
    // hashes, keep each window's minimum — the guaranteed-coverage
    // fingerprint selection plagiarism/near-dup detectors use (any match
    // of 7+ tokens shares a fingerprint). Per doc: gram/fingerprint
    // counts and how many of its fingerprints appear in ≥2 documents.
    // Scale shape: selection is per-row HOF expressions (map-side); the
    // only shuffles are the fingerprint groupBy and one keyed join of
    // (doc, fp) against fingerprint doc-counts — linear, no pairwise
    // comparison anywhere.
    "q284_winnowing" -> ((s, d) => {
      // persisted: the hash + window-min explode dominates and both the
      // sharing count and the join probe read it (q302 twin)
      val ex = winnowFingerprints(s, d).persist()
      val sh = ex.groupBy("fp").agg(count(lit(1)).as("ndocs"))
      ex.join(sh, "fp")
        .groupBy("doc_id")
        .agg(max("n_grams").as("n_grams"), count(lit(1)).as("n_fps"),
          min("fp").as("fp_min"), max("fp").as("fp_max"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_shared"))
    }),

    // Per-node local clustering coefficient over the shared LSH pair
    // graph (the q121/q132/q256 bounded-slice convention): for each node
    // with degree ≥ 2, coeff = 2·T(v)/(d(v)(d(v)−1)) where T(v) counts
    // closed wedges centered at v — the per-node tightness score that
    // complements q121's global triangle count. Exact integers
    // throughout (e6 division at the end). Scale shape: the wedge
    // enumeration keys every join on a node id (fan-in bounded by
    // degree); the closure probe is one join on the canonical pair.
    "q294_clustering_coeff" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
        .persist() // wedge sides + closure probe + degree all read it
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val zu = edges.select(col("src").as("z"), col("dst").as("u"))
      val zw = edges.select(col("src").as("z"), col("dst").as("w"))
      val closed = pairs.select(col("id1").as("u"), col("id2").as("w"))
        .withColumn("hit", lit(1L))
      val tv = zu.join(zw, "z").where(col("u") < col("w"))
        .join(closed, Seq("u", "w"), "left")
        .groupBy(col("z").as("src"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("t_v"))
      deg.where(col("deg") >= 2)
        .join(tv, Seq("src"), "left")
        .na.fill(0L, Seq("t_v"))
        .select(col("src").as("doc_id"), col("deg"), col("t_v"),
          expr("(2 * t_v * 1000000) div (deg * (deg - 1))").as("coeff_e6"))
    }),

    // 3-hop BFS distances from the graph's smallest node id over the
    // shared LSH pair graph — the bounded-frontier traversal shape
    // (k-hop neighborhood expansion) a graph warehouse runs without a
    // graph engine: each hop is one frontier-edges join plus a min-dist
    // aggregate, all keyed on node id. The hop count is a fixed literal,
    // so the oracle replays the exact staged expansion.
    "q295_khop_bfs" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
        .persist() // seed, edges and every hop read it
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      val seed = pairs.agg(least(min("id1"), min("id2")).as("id"))
      // hop frontiers as separate frames off the CACHED edge list, with
      // one union + min at the end — a single job instead of three eager
      // checkpoint generations (the state-carrying loop needed a
      // lineage cut per round and still paid 3 extra job barriers;
      // measured 7.4 s uncut / 2.5 s checkpointed / ~1 s this shape).
      // Each frontier may revisit nodes; the final min-dist aggregate
      // resolves every duplicate to its first hop.
      val f0 = seed.select(col("id"), lit(0L).as("dist"))
      def expand(f: DataFrame, h: Int): DataFrame =
        f.join(edges, col("id") === col("src"))
          .select(col("dst").as("id"), lit(h.toLong).as("dist"))
      val f1 = expand(f0, 1).persist()
      val f2 = expand(f1.select("id").distinct()
        .select(col("id"), lit(1L).as("dist")), 2).persist()
      val f3 = expand(f2.select("id").distinct()
        .select(col("id"), lit(2L).as("dist")), 3)
      f0.unionAll(f1).unionAll(f2).unionAll(f3)
        .groupBy("id").agg(min("dist").as("dist"))
        .select(col("id").as("doc_id"), col("dist"))
    }),

    // Heaps'-law vocabulary growth curve: how many NEW types each corpus
    // prefix contributes. Running-distinct is a scale killer done
    // naively; the distributed form is exact and one-pass — every
    // token's FIRST occurrence position (min doc bucket) is a keyed
    // aggregate, and the curve is the per-bucket count of firsts with a
    // 10-row cumsum. Output per decile bucket of doc_id order: tokens in
    // bucket, new types, cumulative types/tokens.
    "q296_heaps_law" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nDocs = docs.agg(max("doc_id").as("mx"))
      val tok = docs.crossJoin(broadcast(nDocs))
        .select(expr("least(doc_id * 10 div (mx + 1), 9)").as("bucket"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .persist() // per-bucket token counts AND first-occurrence buckets
      val perBucket = tok.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
      val firsts = tok.groupBy("tok").agg(min("bucket").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_new_types"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1)).orderBy("bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      perBucket.join(firsts, Seq("bucket"), "left")
        .na.fill(0L, Seq("n_new_types"))
        .withColumn("cum_types", sum("n_new_types").over(w))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
    }),

    // Population Stability Index per event_type — the industry-standard
    // drift readout between a reference and a current period (here the
    // deterministic even/odd-day split): fixed-width value deciles,
    // +1-smoothed shares over the FULL 10-bin grid (an absent bin still
    // contributes — its smoothed shares differ when n_ref ≠ n_cur), and
    // PSI = Σ(p−q)·ln(p/q) summed as e9-floored integers (the q278
    // merge-order-free rule). Scale shape: one bucket groupBy; the grid
    // is #types × 10 rows with totals broadcast.
    "q288_psi" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"),
        (expr("unix_micros(ts) div 86400000000") % 2 === 0).as("is_ref"),
        least(floor(col("value") / 50.0).cast("long"), lit(9L)).as("bin"))
        .persist() // counts, totals and the type list all read it
      val cnt = ev.groupBy("event_type", "bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_r"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_c"))
      val grid = ev.select("event_type").distinct()
        .select(col("event_type"), explode(sequence(lit(0L), lit(9L))).as("bin"))
      val tot = ev.groupBy("event_type").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_r"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_c"))
      val p = (col("c_r") + 1L).cast("double") / (col("n_r") + 10L).cast("double")
      val q = (col("c_c") + 1L).cast("double") / (col("n_c") + 10L).cast("double")
      grid.join(cnt, Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("c_r", "c_c"))
        .join(broadcast(tot), "event_type")
        .select(col("event_type"), col("n_r"), col("n_c"),
          floor((p - q) * log(p / q) * 1e9).cast("long").as("term_e9"))
        .groupBy("event_type", "n_r", "n_c")
        .agg(sum("term_e9").as("psi_e9"))
    }),

    // Newman–Girvan modularity of a partition over the shared LSH graph
    // (community = doc_id div 50 blocks): per community, within-edges
    // e_c and degree mass d_c, with the contribution scaled to the 4m²
    // common denominator — Q·4m² = Σ(4m·e_c − d_c²) — so the quality
    // score of a graph partition is EXACT integers end to end (the
    // metric Louvain maximizes, here as the evaluation readout). One
    // pair scan + one degree aggregate, keyed joins only.
    "q316_modularity" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
        .persist() // m, within-edges and degrees all read it
      val m = pairs.agg(count(lit(1)).as("m"))
      val within = pairs
        .where(expr("id1 div 50") === expr("id2 div 50"))
        .groupBy(expr("id1 div 50").as("comm"))
        .agg(count(lit(1)).as("e_c"))
      val dC = pairs.select(col("id1").as("id"))
        .unionAll(pairs.select(col("id2").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .groupBy(expr("id div 50").as("comm"))
        .agg(sum("deg").as("d_c"))
      dC.join(within, Seq("comm"), "left")
        .na.fill(0L, Seq("e_c"))
        .crossJoin(broadcast(m))
        .select(col("comm"), col("e_c"), col("d_c"), col("m"),
          (lit(4L) * col("m") * col("e_c") - col("d_c") * col("d_c"))
            .as("q4m2_contrib"))
    }),

    // RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    // are maximal stopword-free token runs (1–3 words); each word
    // scores deg(w)/freq(w) over the candidate corpus (deg = summed
    // length of phrases containing w) and a phrase scores the sum of
    // its words — in e6 fixed point with per-term integer floor, so the
    // phrase sum is associative. Top-20 phrases, bounded
    // TakeOrderedAndProject. Scale shape: phrase segmentation is a
    // posexplode + keyed running count per doc; freq/deg are word-key
    // aggregates; the score join keys on word then phrase.
    "q313_rake" -> ((s, d) => {
      val stops = Seq("the", "a", "and", "of", "to", "in", "is", "it",
        "as", "for", "on", "with")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "word")))
        .withColumn("is_stop", col("word").isin(stops: _*))
        .withColumn("phrase_id", sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
        .where(!col("is_stop") && col("word") =!= "")
      val phrases = toks.groupBy("doc_id", "phrase_id")
        .agg(count(lit(1)).as("plen"),
          array_join(transform(array_sort(collect_list(struct(col("pos"),
            col("word")))), x => x.getField("word")), " ").as("phrase"))
        .where(col("plen") <= 3)
        .persist() // word stats AND the score join read it
      val words = phrases
        .select(col("doc_id"), col("phrase_id"), col("plen"),
          explode(split(col("phrase"), " ")).as("word"))
      val stats = words.groupBy("word")
        .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      words.join(stats, "word")
        .groupBy("doc_id", "phrase_id")
        .agg(sum(expr("(deg * 1000000) div freq")).as("score_e6"))
        .join(phrases, Seq("doc_id", "phrase_id"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occ"), max("score_e6").as("score_e6"))
        .orderBy(desc("score_e6"), asc("phrase"))
        .limit(20)
    }),

    // Winnowing MATCH stage (the second half of MOSS): document pairs
    // sharing ≥ 3 selected fingerprints, with the shared count — the
    // report a plagiarism screen hands a reviewer. Pair generation is
    // confined to fingerprint buckets with an occupancy cap (the LSH
    // band-cap convention: a fingerprint carried by > 16 docs is a
    // boilerplate artifact, not evidence), so fan-in is bounded and no
    // all-pairs product exists. Reuses q284's selection exactly.
    "q302_winnow_matches" -> ((s, d) => {
      // persisted: the hash + window-min explode is the dominant cost
      // and three consumers read it (the occupancy count and both sides
      // of the bucket pair join) — unpersisted it executes 3x
      val fps = winnowFingerprints(s, d).select("doc_id", "fp").persist()
      val occ = fps.groupBy("fp").agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") <= 16)
      val inCap = fps.join(occ, "fp")
      val a = inCap.select(col("fp"), col("doc_id").as("id1"))
      val b = inCap.select(col("fp"), col("doc_id").as("id2"))
      a.join(b, Seq("fp")).where(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 3)
    }),

    // HITS hubs & authorities (Kleinberg) over the shared LSH graph —
    // two fixed iterations in integer fixed point: start uniform e6,
    // authority a = Σ h(in-neighbors), hub h = Σ a(out-neighbors),
    // rescaled each half-step by the max (integer div, so the oracle
    // replays bit-for-bit). On the undirected LSH graph hubs equal
    // authorities at convergence; the two-step scores already separate
    // well-connected nodes. The iteration is per-round keyed joins on
    // node id — the q132 PageRank shape.
    "q303_hits" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
        .persist()
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .persist()
      val nodes = edges.select(col("src").as("id")).distinct()
      // the max-rescale rides a window over ONE deliberately bounded
      // partition (the score frame is |nodes| ≤ 300 rows — the
      // doremiShares convention): a separate max-aggregate + crossJoin
      // per half-step costs 8 extra job barriers and measured 2× wall
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      var auth = nodes.select(col("id"), lit(1000000L).as("a"))
      var hub = nodes.select(col("id"), lit(1000000L).as("h"))
      for (_ <- 1 to 2) {
        auth = edges.join(hub.select(col("id").as("src"), col("h")), "src")
          .groupBy(col("dst").as("id")).agg(sum("h").as("raw"))
          .withColumn("mx", max("raw").over(wAll))
          .select(col("id"), expr("(raw * 1000000) div mx").as("a"))
        hub = edges.join(auth.select(col("id").as("dst"), col("a")), "dst")
          .groupBy(col("src").as("id")).agg(sum("a").as("raw"))
          .withColumn("mx", max("raw").over(wAll))
          .select(col("id"), expr("(raw * 1000000) div mx").as("h"))
      }
      auth.join(hub, "id")
        .select(col("id").as("doc_id"), col("a").as("auth_e6"),
          col("h").as("hub_e6"))
    }),

    // Vocabulary-richness suite per source — the corpus-linguistics
    // readouts a datasheet quotes: V (distinct tokens), hapax/dis
    // legomena F1/F2, the Chao1 richness estimate V + F1²/2F2 (how much
    // vocabulary sampling hasn't seen yet), and Simpson concentration
    // Σc(c−1)/N(N−1). Everything stays exact: counts are integers and
    // both estimates are single integer divisions at e2/e9 scale.
    // Scale shape: one token groupBy then a per-source aggregate —
    // two keyed shuffles, nothing global.
    "q285_vocab_richness" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(count(lit(1)).as("v"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
          sum("c").as("n_tok"),
          sum(col("c") * (col("c") - 1L)).as("sum_cc1"))
        .select(col("source"), col("v"), col("f1"), col("f2"), col("n_tok"),
          expr("CASE WHEN f2 > 0 THEN v * 100 + (f1 * f1 * 100) div (2 * f2) " +
            "ELSE v * 100 END").as("chao1_e2"),
          // two-stage division: sum_cc1·10⁹ would overflow int64 on a
          // large corpus; ÷(N−1) first keeps every intermediate ≲ c̄·10⁹
          expr("((sum_cc1 * 1000) div (n_tok - 1) * 1000000) div n_tok")
            .as("simpson_e9"))
    }),

    // Clipped n-gram precision (the BLEU mechanic, Papineni et al. 2002)
    // between adjacent document pairs within each source — the
    // similarity readout generation evals run between candidate and
    // reference text, here repurposed as an intra-source redundancy
    // probe. For n ∈ {1, 2}: per pair, each candidate n-gram counts at
    // most min(count_cand, count_ref) times ("clipping"), rolled up per
    // source to exact integer clip/total counts and one e6 division.
    // Scale shape: pairing is a keyed lead() window (source, doc_id);
    // n-gram counting is explode → groupBy(pair, gram) — linear, no
    // all-pairs product anywhere.
    "q277_bleu_pairs" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val pairs = t(s, d, "documents")
        .select(col("source"), col("doc_id"), col("text"))
        .withColumn("ref_text", lead("text", 1).over(w))
        .where(col("ref_text").isNotNull)
        .persist() // both n-gram orders re-read the pair frame
      // gram identity is gramHash62 (one md5 per token, integer Horner
      // chains): the (doc, gram) groupBys and the clip join shuffle
      // BIGINTs, never gram strings — the q107/q272 posture
      def hts(c: String) = transform(TextFunctions.tokens(col(c)),
        tk => pmod(TextFunctions.hash60(tk), lit(1073741824L)))
      def gramsExpr(n: Int) =
        s"transform(sequence(1, size(ht) - ${n - 1}), i -> ${gramHash62("i-1", n)})"
      def prec(n: Int): DataFrame = {
        val cand = pairs
          .where(size(TextFunctions.tokens(col("text"))) >= n)
          .select(col("source"), col("doc_id"), hts("text").as("ht"))
          .select(col("source"), col("doc_id"),
            explode(expr(gramsExpr(n))).as("g"))
          .groupBy("source", "doc_id", "g").agg(count(lit(1)).as("c_cand"))
        val ref = pairs
          .where(size(TextFunctions.tokens(col("ref_text"))) >= n)
          .select(col("doc_id"), hts("ref_text").as("ht"))
          .select(col("doc_id"), explode(expr(gramsExpr(n))).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c_ref"))
        cand.join(ref, Seq("doc_id", "g"), "left")
          .groupBy("source")
          .agg(sum("c_cand").as("tot"),
            sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
              .as("clip"))
          .where(col("tot") > 0)
          .select(col("source"), lit(n.toLong).as("n"), col("tot"),
            col("clip"), expr("(clip * 1000000) div tot").as("prec_e6"))
      }
      prec(1).unionAll(prec(2))
    }),

    // Jensen–Shannon divergence of each source's unigram distribution
    // against the corpus distribution — the drift readout a data-mixture
    // pipeline tracks when a new source lands (e.g. Dolma/RedPajama
    // composition audits). Per (source, token over the CORPUS vocab):
    // p = c/tot, q = gc/gtot, m = (p+q)/2; both KL halves are summed as
    // e9-floored integers (per-term floor → the sum is merge-order-free,
    // the q116 entropy lesson), and 2·JSD is reported as their integer
    // sum — no trailing division, no float aggregation. Scale shape:
    // token counts are one explode + two keyed groupBys; the grid is
    // corpus-vocab × #sources (linear in vocab) with the tiny per-source
    // totals broadcast.
    "q278_js_divergence" -> ((s, d) => {
      val sc = t(s, d, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .persist() // vocab totals, source totals and the grid all read it
      val g = sc.groupBy("tok").agg(sum("c").as("gc"))
      val st = sc.groupBy("source").agg(sum("c").as("tot"))
      val gt = sc.agg(sum("c").as("gtot"))
      val p = col("c").cast("double") / col("tot").cast("double")
      val q = col("gc").cast("double") / col("gtot").cast("double")
      val m = (p + q) / lit(2.0)
      g.crossJoin(broadcast(st)).crossJoin(broadcast(gt))
        .join(sc, Seq("source", "tok"), "left")
        .na.fill(0L, Seq("c"))
        .select(col("source"), col("tot"),
          when(col("c") > 0, 1L).otherwise(0L).as("inv"),
          when(col("c") > 0, floor(p * log(p / m) * 1e9).cast("long"))
            .otherwise(0L).as("tp"),
          floor(q * log(q / m) * 1e9).cast("long").as("tq"))
        .groupBy("source", "tot")
        .agg(sum("inv").as("vocab"), sum("tp").as("klp_e9"),
          sum("tq").as("klq_e9"))
        .withColumn("jsd2_e9", col("klp_e9") + col("klq_e9"))
    }),

    // Degree assortativity of the LSH near-dup graph (Newman 2002): the
    // Pearson correlation of endpoint degrees over the directed edge
    // list — do similar-degree documents link to each other (duplicate
    // "cliques") or do hubs attach to leaves (template + variants)? All
    // four moments are exact BIGINT sums over one degree-annotated edge
    // pass; only the final r is a pinned double chain floored to e6.
    // Scale shape: two keyed joins of the edge list against the degree
    // table (fan-in = degree), one global 4-sum aggregate — map-side
    // combinable, no structure wider than the edge list itself.
    "q320_assortativity" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .persist() // degree count + both endpoint probes read it
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val st = edges
        .join(deg.select(col("src").as("u"), col("deg").as("j")),
          col("src") === col("u"))
        .join(deg.select(col("src").as("v"), col("deg").as("k")),
          col("dst") === col("v"))
        .agg(count(lit(1)).as("m2"),
          sum(col("j") * col("k")).as("s_jk"),
          sum(col("j") + col("k")).as("s_jpk"),
          sum(col("j") * col("j") + col("k") * col("k")).as("s_j2k2"))
      val mD = col("m2").cast("double")
      val t1 = col("s_jk").cast("double") / mD
      val t2 = col("s_jpk").cast("double") / (mD * 2.0)
      val t3 = col("s_j2k2").cast("double") / (mD * 2.0)
      st.select(col("m2"), col("s_jk"), col("s_jpk"), col("s_j2k2"),
        when(t3 - t2 * t2 > 0.0,
          floor((t1 - t2 * t2) / (t3 - t2 * t2) * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("r_e6"))
    }),

    // Mutual nearest neighbors within IVF cells — the candidate stage of
    // margin-based bitext/paraphrase mining (Artetxe & Schwenk 2019):
    // reciprocal top-1 pairs only, so one bad hub vector cannot claim
    // the whole cell. Cell-confined pair join + keyed top-1 window +
    // pair-keyed mutual filter; see Similarity.mutualTop1 for the
    // 100-TB shape notes.
    "q321_mutual_nn" -> ((s, d) => {
      Similarity.mutualTop1(t(s, d, "embeddings"))
    }),

    // q321's production posture realized: the codebook granularity GROWS
    // with the corpus (each label cell subdivides into n/(10·target)
    // first-coordinate bins), capping expected cell population at
    // ~target so the in-cell pair workload stays LINEAR in n — the fix
    // BENCH_SCALE's 100.2× attribution prescribes. Same mutual top-1
    // semantics; at small n it degenerates to q321 exactly.
    "q347_mutual_nn_scaled" -> ((s, d) => {
      Similarity.mutualTop1Scaled(t(s, d, "embeddings"), 200L)
    }),

    // Hard-negative triplet mining (the contrastive trainer's per-epoch
    // batch refresh — SimCSE/E5 posture): per anchor, the most-similar
    // same-label neighbor and the most-similar different-label neighbor
    // within its IVF cell, with the margin between them. Cells carry
    // q347's corpus-scaled bin refinement so the in-cell pair frame
    // stays linear in n (the unbinned form OOM'd an 8 GiB heap at sf1).
    "q348_hard_negatives" -> ((s, d) => {
      Similarity.hardNegatives(t(s, d, "embeddings"), 200L)
    }),

    // Curriculum ordering — the data-ORDERING step of a training run
    // (Bengio et al. 2009 posture, length-staged): stage = token-count
    // bucket (short/easy first), and within a stage the sources
    // round-robin (rank within (stage, source) — a KEYED window — is
    // the interleave position) so no stage is a single-source block.
    // The final training order (stage, position, source, doc_id) is
    // fully deterministic — reshard/retry-stable, no rand(). The global
    // position rides the scalable range-sort rank (Ranking.globalRank,
    // q91's shape, never a single-partition window); output bounded to
    // the first 100 positions.
    "q349_curriculum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("stage", "source").orderBy("doc_id")
      val staged = t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("ntok"))
        .withColumn("stage", expr("least(2L, ntok div 150)"))
        .withColumn("rr", row_number().over(w).cast("long"))
      graft.operators.Ranking.globalRank(
          staged.select("doc_id", "source", "stage", "rr"),
          "pos", asc("stage"), asc("rr"), asc("source"), asc("doc_id"))
        .where(col("pos") <= 100)
        .select("doc_id", "source", "stage", "pos")
    }),

    // Cross-source Reciprocal Rank Fusion (Cormack et al. SIGIR 2009):
    // where q246 fuses two DENSE rankings drawn from one candidate
    // frame, this is the production lexical+dense hybrid — the sparse
    // list (distinct-token overlap over `documents`) and the dense list
    // (cosine over `embeddings`) come from DIFFERENT retrieval sources,
    // so the fuse is a (query_id, cand_id) FULL OUTER join of two
    // bounded top-50 lists with a missing rank contributing zero — the
    // real RRF list-merge semantics. Ranks fuse as exact integer
    // micro-units (1000000 div (60+r)). Dense side rides the broadcast
    // query frame (Similarity.bruteForceTopK); sparse side broadcasts
    // the query token sets and ranks with a query-KEYED window; every
    // downstream window stays keyed by query_id, so the whole plan
    // shuffles on query_id only at production query volumes.
    "q350_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val qids = Seq(10L, 20L, 30L)
      val docs = t(s, d, "documents")
      val e = t(s, d, "embeddings")
      val dense = Similarity
        .bruteForceTopK(e, e.where(col("vec_id").isin(qids: _*)), 50)
        .select(col("query_id"), col("neighbor_id").as("cand_id"),
          col("rnk").cast("long").as("r_dense"))
      val qt = docs.where(col("doc_id").isin(qids: _*))
        .select(col("doc_id").as("query_id"),
          array_distinct(TextFunctions.tokens(col("text"))).as("qtok"))
      val wS = Window.partitionBy("query_id").orderBy(desc("ov"), asc("cand_id"))
      val sparse = docs
        .select(col("doc_id").as("cand_id"),
          array_distinct(TextFunctions.tokens(col("text"))).as("ctok"))
        .crossJoin(broadcast(qt))
        .where(col("cand_id") =!= col("query_id"))
        .withColumn("ov", size(array_intersect(col("ctok"), col("qtok"))).cast("long"))
        .where(col("ov") >= 1L)
        .withColumn("r_sparse", row_number().over(wS).cast("long"))
        .where(col("r_sparse") <= 50L)
        .select("query_id", "cand_id", "r_sparse")
      val wF = Window.partitionBy("query_id").orderBy(desc("rrf_e6"), asc("cand_id"))
      dense.join(sparse, Seq("query_id", "cand_id"), "full_outer")
        .withColumn("rrf_e6",
          coalesce(expr("1000000L div (60L + r_dense)"), lit(0L)) +
            coalesce(expr("1000000L div (60L + r_sparse)"), lit(0L)))
        .withColumn("pos", row_number().over(wF).cast("long"))
        .where(col("pos") <= 10L)
        .select(col("query_id"), col("cand_id"), col("r_dense"),
          col("r_sparse"), col("rrf_e6"), col("pos"))
    }),

    // Graded retrieval eval — nDCG@10 + reciprocal rank per query
    // (Järvelin & Kekäläinen TOIS 2002) over the dense cosine top-10,
    // with label-derived graded relevance (3 = same label, 1 = adjacent
    // label, 0 otherwise). The log2 position discount is a 10-entry
    // integer literal table w_e6 = floor(1e6/log2(pos+1)) shared
    // verbatim with the oracle, so DCG/IDCG/nDCG/RR are exact integer
    // arithmetic end-to-end (no cross-engine transcendental). Ideal DCG
    // is the in-list ideal (retrieved set re-sorted by grade) — the
    // standard local-ideal variant. Scale shape: per-query keyed windows
    // and one groupBy(query_id); the discount table is a literal CASE.
    "q351_ndcg_mrr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val qids = Seq(10L, 20L, 30L)
      val e = t(s, d, "embeddings")
      def wE6(c: String) = expr(s"CASE $c WHEN 1 THEN 1000000L" +
        " WHEN 2 THEN 630929L WHEN 3 THEN 500000L WHEN 4 THEN 430676L" +
        " WHEN 5 THEN 386852L WHEN 6 THEN 356207L WHEN 7 THEN 333333L" +
        " WHEN 8 THEN 315464L WHEN 9 THEN 301029L WHEN 10 THEN 289064L END")
      val lab = e.select(col("vec_id"), col("label").cast("long").as("lab"))
      val wI = Window.partitionBy("query_id").orderBy(desc("rel"), asc("rnk"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(qids: _*)), 10)
        .join(lab.select(col("vec_id").as("neighbor_id"), col("lab").as("clab")),
          "neighbor_id")
        .join(broadcast(
          lab.select(col("vec_id").as("query_id"), col("lab").as("qlab"))),
          "query_id")
        .withColumn("rel",
          when(col("clab") === col("qlab"), 3L)
            .when(abs(col("clab") - col("qlab")) === 1L, 1L).otherwise(0L))
        .withColumn("irnk", row_number().over(wI))
        .withColumn("wr_e6", wE6("rnk"))
        .withColumn("wi_e6", wE6("irnk"))
        .groupBy("query_id")
        .agg(sum(col("rel") * col("wr_e6")).as("dcg_e6"),
          sum(col("rel") * col("wi_e6")).as("idcg_e6"),
          min(when(col("rel") > 0L, col("rnk").cast("long"))).as("minr"))
        .select(col("query_id"), col("dcg_e6"), col("idcg_e6"),
          when(col("idcg_e6") > 0L, expr("dcg_e6 * 1000000L div idcg_e6"))
            .otherwise(0L).as("ndcg_e6"),
          coalesce(expr("1000000L div minr"), lit(0L)).as("rr_e6"))
    }),

    // Tokenizer fertility audit per (source, lang) — the tokenizer-eval
    // report a pretraining pipeline runs before committing to a vocab
    // (fertility = subword tokens per word, bytes per token — the
    // standard multilingual tokenizer-quality metrics): corpus bytes,
    // alnum-regex tokens (the BPE-ish tokenizer of the suite) and
    // whitespace words per group, with bytes/token and tokens/word as
    // exact e3 trunc divisions. Scale shape: one map-side pass plus one
    // hash groupBy on (source, lang); output bounded by the group
    // domain.
    "q353_tokenizer_fertility" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text")).cast("long")).as("n_bytes"),
          sum(TextFunctions.alnumTokenCount(col("text")).cast("long"))
            .as("n_tokens"),
          sum(size(TextFunctions.tokens(col("text"))).cast("long"))
            .as("n_words"))
        .where(col("n_tokens") > 0L && col("n_words") > 0L)
        .select(col("source"), col("lang"), col("n_docs"), col("n_bytes"),
          col("n_tokens"), col("n_words"),
          expr("n_bytes * 1000 div n_tokens").as("bytes_per_tok_e3"),
          expr("n_tokens * 1000 div n_words").as("fertility_e3"))
    }),

    // IVF (cell, bin) occupancy audit — the health check behind the
    // whole celled-ANN family (q98/q251/q321/q347/q348/q352): group
    // populations, the skew factor max/avg, and the EXACT in-cell pair
    // workload Σ pop·(pop−1) those queries will pay. This is the number
    // an operator watches to decide when to re-train the codebook or
    // raise nb. One groupBy on (cell, bin) then a bounded aggregate.
    "q354_cell_balance" -> ((s, d) => {
      val cents = Similarity.ivfCentroids(t(s, d, "embeddings"))
      val e = t(s, d, "embeddings")
      val nDf = e.agg(count(lit(1)).as("n_total"))
      val pops = e.join(Similarity.withIvfCell(e, cents), "vec_id")
        .crossJoin(broadcast(nDf))
        .withColumn("nb", expr("greatest(1L, n_total div 2000)"))
        .withColumn("bin", expr(
          """least(nb - 1, greatest(0L, cast(floor(
            (cast(embedding[0] as double) + 1.0) / 2.0 * nb) as bigint)))"""))
        .groupBy("cell", "bin").agg(count(lit(1)).as("pop"))
      pops.agg(sum("pop").as("n_total"),
          count(lit(1)).as("n_groups"),
          max("pop").as("max_pop"),
          sum(expr("pop * (pop - 1)")).as("pair_work"))
        .select(col("n_total"), col("n_groups"), col("max_pop"),
          expr("n_total div n_groups").as("avg_pop"),
          expr("max_pop * 1000 div (n_total div n_groups)").as("skew_e3"),
          col("pair_work"))
    }),

    // Split leakage audit — the eval-integrity check behind every
    // held-out split: assign docs to 5 folds by content-independent
    // hash, then count near-dup pairs (LSH candidates) whose endpoints
    // land in DIFFERENT folds — each one is a train/test leak that
    // inflates eval scores (the GPT-3-era contamination concern, at the
    // near-dup rather than exact level). Reports per fold-pair counts
    // and the overall leak share of all near-dup pairs. Scale shape:
    // the capped candidate join + one map-side fold hash + a 15-group
    // aggregate.
    "q371_split_leakage" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val fold = docs.select(col("doc_id"),
        (TextFunctions.hash60(concat(lit("fold:"), col("doc_id").cast("string")))
          % 5).as("fold"))
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(fold.select(col("doc_id").as("id1"), col("fold").as("f1")), "id1")
        .join(fold.select(col("doc_id").as("id2"), col("fold").as("f2")), "id2")
      val tot = pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("f1") =!= col("f2"), 1L).otherwise(0L)).as("n_leaks"))
      pairs.groupBy(least(col("f1"), col("f2")).as("fa"),
          greatest(col("f1"), col("f2")).as("fb"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("fa"), col("fb"), col("n"), col("n_pairs"), col("n_leaks"),
          expr("n_leaks * 1000000 div n_pairs").as("leak_rate_e6"),
          (col("fa") =!= col("fb")).as("is_leak"))
    }),

    // Cross-source duplication flow matrix — the "who copies whom"
    // provenance readout: near-dup pairs bucketed by their endpoint
    // sources (unordered), with each cell's share of all pairs. A heavy
    // off-diagonal cell means two feeds ingest the same upstream — the
    // dedup-BEFORE-mixing signal a corpus assembler acts on; heavy
    // diagonal means a source self-duplicates. Capped candidate join +
    // two dim joins + one bounded (source, source) aggregate.
    "q385_dup_flow_matrix" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val src = docs.select(col("doc_id"), col("source"))
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(src.select(col("doc_id").as("id1"), col("source").as("s1")), "id1")
        .join(src.select(col("doc_id").as("id2"), col("source").as("s2")), "id2")
      val tot = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs.groupBy(least(col("s1"), col("s2")).as("src_a"),
          greatest(col("s1"), col("s2")).as("src_b"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("src_a"), col("src_b"), col("n"),
          expr("n * 1000000 div n_pairs").as("share_e6"),
          (col("src_a") === col("src_b")).as("self_dup"))
    }),

    // UniMax budget-capped water filling (Chung et al. 2023,
    // arXiv:2304.09151) — the fairer alternative to temperature sampling
    // (q194/q345): no source repeats beyond epochCap epochs, and the
    // budget spreads as uniformly as the caps allow. Budget = half the
    // corpus tokens, cap = 2 epochs, so the readout is scale-free.
    // Scale shape: corpus-scale work is ONE token-count scan; the
    // water-filling scan runs on the per-source aggregate via
    // Mixture.unimaxAllocation (bounded-dim frame, two window passes —
    // the monotone capped test removes the sequential loop).
    "q386_unimax_mix" -> ((s, d) => {
      val counts = t(s, d, "documents")
        .select(col("source"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("nt"))
        .groupBy("source").agg(sum("nt").as("n_tok"))
      graft.operators.Mixture.unimaxAllocation(counts,
        expr("sum(n_tok) OVER () div 2"), 2L)
    }),

    // Fellegi–Sunter comparison-vector weights (Fellegi & Sunter 1969;
    // the Splink/record-linkage core): from a labeled candidate-pair set
    // (LSH candidates labeled match ⟺ token-Jaccard ≥ 1/2 — the
    // all-integer test 2·|∩| ≥ |∪|), estimate each comparison feature's
    // m = P(agree|match) and u = P(agree|non-match) and the log-odds
    // match weight ln(m/u) with Laplace (+1/+2) smoothing. Features:
    // same source, same lang, |Δn_chars| < 100, equal first token.
    // Scale shape: pairs come from the capped LSH band join (never
    // all-pairs); per-pair features are map-side; the estimate is ONE
    // bounded aggregate (4 features) unpivoted to rows. ln is called on
    // the SAME pinned double ratio in both engines (q278 posture).
    "q387_fs_weights" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val side = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"),
        array_distinct(TextFunctions.tokens(col("text"))).as("w"),
        element_at(TextFunctions.tokens(col("text")), 1).as("tok1"))
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(side.toDF("id1", "s1", "l1", "c1", "w1", "t1"), "id1")
        .join(side.toDF("id2", "s2", "l2", "c2", "w2", "t2"), "id2")
        .withColumn("inter", size(array_intersect(col("w1"), col("w2"))).cast("long"))
        .withColumn("uni", size(col("w1")) + size(col("w2")) - col("inter"))
        .select((col("inter") * 2L >= col("uni")).as("is_match"),
          (col("s1") === col("s2")).cast("long").as("f_source"),
          (col("l1") === col("l2")).cast("long").as("f_lang"),
          (abs(col("c1") - col("c2")) < 100L).cast("long").as("f_len"),
          (col("t1") === col("t2")).cast("long").as("f_tok1"))
      val agg = pairs.agg(
        sum(when(col("is_match"), 1L).otherwise(0L)).as("nm"),
        sum(when(!col("is_match"), 1L).otherwise(0L)).as("nu"),
        sum(when(col("is_match"), col("f_source"))).as("m_source"),
        sum(when(!col("is_match"), col("f_source"))).as("u_source"),
        sum(when(col("is_match"), col("f_lang"))).as("m_lang"),
        sum(when(!col("is_match"), col("f_lang"))).as("u_lang"),
        sum(when(col("is_match"), col("f_len"))).as("m_len"),
        sum(when(!col("is_match"), col("f_len"))).as("u_len"),
        sum(when(col("is_match"), col("f_tok1"))).as("m_tok1"),
        sum(when(!col("is_match"), col("f_tok1"))).as("u_tok1"))
      agg.select(expr(
        """stack(4,
             'source', m_source, u_source,
             'lang',   m_lang,   u_lang,
             'len',    m_len,    u_len,
             'tok1',   m_tok1,   u_tok1) AS (feature, ma, ua)"""),
        col("nm"), col("nu"))
        .select(col("feature"), col("ma"), col("ua"), col("nm"), col("nu"),
          expr("ma * 1000000 div nm").as("m_e6"),
          expr("ua * 1000000 div nu").as("u_e6"),
          floor(log(((col("ma") + 1L) * (col("nu") + 2L)).cast("double")
            / ((col("ua") + 1L) * (col("nm") + 2L)).cast("double")) * 1e6)
            .cast("long").as("weight_e6"))
    }),

    // Pseudo-relevance-feedback query expansion (RM3 shape — Lavrenko &
    // Croft 2001; Abdul-Jaleel et al. 2004): run the q126 BM25 query
    // ('spark','fast'), take the top-10 docs, and score candidate
    // expansion terms by the integer relevance-model weight
    // Σ_d tf(w,d)·1e6 div dl_d over those docs (per-doc term share —
    // length-normalized so one long doc can't dominate), excluding the
    // original query terms; keep the top 15. Scale shape: the BM25 scan
    // is corpus-scale map-side + one bounded stats broadcast; the
    // feedback explode touches ONLY the 10 selected docs (broadcast
    // semi-join on the top-k ids), so expansion cost is O(top-k · doc
    // length), independent of corpus size.
    "q389_prf_expansion" -> ((s, d) => {
      val toks = TextFunctions.tokens(col("text"))
      val base = t(s, d, "documents").select(col("doc_id"),
        size(toks).cast("long").as("dl"),
        size(filter(toks, x => x === "spark")).cast("long").as("tf1"),
        size(filter(toks, x => x === "fast")).cast("long").as("tf2"))
      val stats = base.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"),
        count(when(col("tf1") > 0, 1)).as("df1"),
        count(when(col("tf2") > 0, 1)).as("df2"))
      def term(tf: String, df: String): Column =
        log((col("n_docs") - col(df) + 0.5) / (col(df) + 0.5) + 1.0) *
          (col(tf) * 2.2) /
          (col(tf) + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))
      val top = base.crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sum_dl") / col("n_docs"))
        .where(col("tf1") > 0 || col("tf2") > 0)
        .withColumn("score", term("tf1", "df1") + term("tf2", "df2"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(10)
        .select("doc_id", "dl")
      t(s, d, "documents")
        .join(broadcast(top), "doc_id")
        .select(col("doc_id"), col("dl"), explode(toks).as("term"))
        .where(!col("term").isin("spark", "fast"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
        .groupBy("term")
        .agg(sum(expr("tf * 1000000 div dl")).as("w_e6"),
          count(lit(1)).as("n_docs_term"))
        .orderBy(desc("w_e6"), asc("term"))
        .limit(15)
    }),

    // Exact KNN-Shapley data valuation (Jia et al., VLDB 2019): the
    // Shapley value of each TRAINING point for a K-NN classifier has a
    // closed form — rank training points by similarity to a validation
    // point, then s_i = s_{i+1} + (a_i − a_{i+1})·1/max(i,K) with
    // s_N = a_N/N (a_j = 1 iff labels agree) — i.e. a SUFFIX SUM of
    // per-rank deltas, which is one window pass, no sequential loop.
    // Per-term trunc-div at e9 (both engines truncate toward zero) keeps
    // the suffix sum integer-exact and merge-order-free. The valuation
    // readout is the curation signal: points with negative value are
    // mislabeled/harmful candidates for removal. Scale shape: distances
    // are map-side vs a BROADCAST validation set; the per-query total
    // order comes from ONE range-partitioned global sort over
    // (query_id, cos) (`Ranking.globalRank` — a `Window.partitionBy
    // (query_id)` would put each query's ENTIRE corpus ranking into a
    // single task: Q tasks of size n, the q71/q176 scale killer), the
    // per-query suffix sum from ONE `PrefixScan` over the same order
    // (suffix = query total − inclusive prefix + current; Spark's
    // UnboundedFollowing frame re-aggregates the tail per row, O(n²)
    // per partition — measured 19 s vs 0.6 s at sf1), lead(a) from a
    // keyed self-join on (query_id, rank+1), and the top-10 readout
    // from the bounded-heap `TopKPerKey` operator. Zero Window nodes
    // on data-sized frames (PlanSpec-asserted). Production truncates
    // the scan to an ANN candidate set (q251 cells) since the
    // 1/max(j,K) tail decays — the closed form bounds truncation error.
    "q390_knn_shapley" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val qids = Seq(10L, 20L, 30L)
      val q = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qemb"),
          col("label").as("qlabel"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val scored = e.where(!col("vec_id").isin(qids: _*))
        .crossJoin(broadcast(q))
        .withColumn("cos", Similarity.cosineWithNorms(
          Similarity.dot("embedding", "qemb"),
          Similarity.norm2("embedding"), col("qn")))
        .select(col("query_id"), col("vec_id"),
          (col("label") === col("qlabel")).cast("long").as("a"), col("cos"))
      // one parallel range-sort; per-query rank = global rank − the
      // query's first global rank + 1 (Q-row offset frame, broadcast)
      val g = graft.operators.Ranking.globalRank(scored, "grk",
        asc("query_id"), desc("cos"), asc("vec_id")).persist()
      val qstats = g.groupBy("query_id")
        .agg(min("grk").as("g0"), count(lit(1)).as("n"))
      val ranked = g.join(broadcast(qstats), "query_id")
        .withColumn("dist_rnk", col("grk") - col("g0") + lit(1L))
        .persist()
      val nxt = ranked.select(col("query_id"),
        (col("dist_rnk") - 1L).as("dist_rnk"), col("a").as("a_next"))
      val terms = ranked.join(nxt, Seq("query_id", "dist_rnk"), "left")
        .withColumn("term_e9", when(col("dist_rnk") === col("n"),
          expr("a * 1000000000 div n")).otherwise(
          expr("(a - a_next) * 1000000000 div greatest(dist_rnk, 5)")))
      // per-query inclusive prefix from ONE global scan: subtract the
      // query's global offset (sum of all earlier queries' totals —
      // a Q-row triangular join, broadcast)
      val cum = graft.operators.PrefixScan.scanLong(terms, "cum_g", "term_e9", "sum",
        inclusive = true, asc("query_id"), asc("dist_rnk")).persist()
      val tot = cum.groupBy("query_id").agg(sum("term_e9").as("tot_q"))
      val off = tot.join(
        broadcast(tot.select(col("query_id").as("qid2"),
          col("tot_q").as("tot2"))),
        col("qid2") < col("query_id"), "left")
        .groupBy(col("query_id"), col("tot_q"))
        .agg(coalesce(sum("tot2"), lit(0L)).as("off_q"))
      val shap = cum.join(broadcast(off), "query_id")
        .withColumn("shap_e9",
          col("tot_q") - (col("cum_g") - col("off_q")) + col("term_e9"))
      val top = graft.plans.TopKPerKey(shap, Seq("query_id"),
        Seq(desc("shap_e9"), asc("vec_id")), 10)
      // val_rnk on the bounded 10·Q-row result — same globalRank trick
      // keeps the whole plan Window-free
      val v = graft.operators.Ranking.globalRank(top.select("query_id", "vec_id",
          "dist_rnk", "a", "shap_e9"), "vgrk",
        asc("query_id"), desc("shap_e9"), asc("vec_id"))
      val v0 = v.groupBy(col("query_id").as("qid0"))
        .agg(min("vgrk").as("v0"))
      val out = v.join(broadcast(v0), col("query_id") === col("qid0"))
        .select(col("query_id"),
          (col("vgrk") - col("v0") + lit(1L)).as("val_rnk"), col("vec_id"),
          col("dist_rnk"), (col("a") === 1L).as("same_label"),
          col("shap_e9"))
      // g/ranked/cum stay persisted for the caller's action (the final
      // replay reuses them); Verify/Bench clearCache() between queries.
      out
    }),

    // Reference-model data selection (the RHO-loss shape, Mindermann et
    // al. 2022, arXiv:2206.07137): score each candidate doc by
    // train-model NLL − reference-model NLL, where the train model is
    // the full-corpus unigram LM (q127) and the reference model is a
    // unigram LM fit on the clean 'src0' slice with Laplace (+1 over
    // n_ref+V) smoothing for OOV. High excess = the doc looks hard to
    // the corpus model but is well-explained by the clean reference —
    // learnable, not noise; per-source top-5 is the selection. Both NLL
    // folds run in pinned position order (the q127 collect_list-sorted
    // rule) so the IEEE sums replay exactly. Scale shape: one token
    // explode + two vocab joins (vocab-sized broadcast-able aggregates),
    // per-doc fold map-side; the top-k is a per-SOURCE keyed window.
    "q393_rho_selection" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = t(s, d, "documents").select(col("doc_id"), col("source"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
      val uni = tok.groupBy("term").agg(count(lit(1)).as("c"))
      val tot = uni.agg(sum("c").as("n_tot"), count(lit(1)).as("v"))
      val refUni = tok.where(col("source") === "src0")
        .groupBy("term").agg(count(lit(1)).as("c_ref"))
      val refTot = tok.where(col("source") === "src0")
        .agg(count(lit(1)).as("n_ref"))
      val nll = tok.join(uni, "term")
        .join(refUni, Seq("term"), "left")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(refTot))
        .withColumn("lnp_tr", log(col("n_tot").cast("double") / col("c")))
        .withColumn("lnp_ref", log((col("n_ref") + col("v")).cast("double")
          / (coalesce(col("c_ref"), lit(0L)) + lit(1L))))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_tok"),
          array_sort(collect_list(struct(col("pos"), col("lnp_tr"),
            col("lnp_ref")))).as("ps"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          floor(aggregate(transform(col("ps"), x => x.getField("lnp_tr")),
            lit(0.0d), (acc, x) => acc + x) / col("n_tok") * 1e6)
            .cast("long").as("nll_e6"),
          floor(aggregate(transform(col("ps"), x => x.getField("lnp_ref")),
            lit(0.0d), (acc, x) => acc + x) / col("n_tok") * 1e6)
            .cast("long").as("ref_nll_e6"))
      nll.where(col("source") =!= "src0")
        .withColumn("excess_e6", col("nll_e6") - col("ref_nll_e6"))
        .withColumn("sel_rnk", row_number().over(Window.partitionBy("source")
          .orderBy(desc("excess_e6"), asc("doc_id"))).cast("long"))
        .where(col("sel_rnk") <= 5)
        .select("source", "sel_rnk", "doc_id", "n_tok", "nll_e6",
          "ref_nll_e6", "excess_e6")
    }),

    // Clustering external validation — purity and NMI of the q145 Lloyd
    // assignment against the embeddings' true labels (the eval that says
    // whether unsupervised structure recovers the annotation; NMI is the
    // standard symmetric readout, Strehl & Ghosh 2002). The contingency
    // table is exact integer counts; MI and the two entropies are pinned
    // double folds over the SORTED cell list (the q147 cell-fold rule —
    // k·L cells, bounded by construction), so both engines sum in the
    // same order; one final pinned chain turns (mi, hc, hl) into NMI.
    // Scale shape: Lloyd is the q145 machinery (explode-agg + broadcast
    // argmin per round); the validation itself is one (cluster, label)
    // groupBy plus window marginals on the bounded cell frame.
    "q394_cluster_nmi" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wB = Window.partitionBy(lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val (cur, _) = Similarity.lloyd(t(s, d, "embeddings"), 2)
      val cells = cur.select("vec_id", "c")
        .join(t(s, d, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("l")), "vec_id")
        .groupBy("c", "l").agg(count(lit(1)).as("n_cl"))
        .withColumn("n_c", sum("n_cl").over(Window.partitionBy("c")))
        .withColumn("n_l", sum("n_cl").over(Window.partitionBy("l")))
        .withColumn("n", sum("n_cl").over(wB))
        .localCheckpoint(true)
      val mi = cells
        .withColumn("term", (col("n_cl").cast("double") / col("n")) *
          log((col("n") * col("n_cl")).cast("double")
            / (col("n_c") * col("n_l")).cast("double")))
        .agg(max("n").as("n"), countDistinct("c").as("k"),
          countDistinct("l").as("n_labels"),
          array_sort(collect_list(struct(col("c"), col("l"), col("term"))))
            .as("ts"))
        .select(col("n"), col("k"), col("n_labels"),
          aggregate(transform(col("ts"), x => x.getField("term")),
            lit(0.0d), (acc, x) => acc + x).as("mi"))
      val hc = cells.select("c", "n_c", "n").distinct()
        .withColumn("term", (col("n_c").cast("double") / col("n")) *
          log(col("n").cast("double") / col("n_c")))
        .agg(array_sort(collect_list(struct(col("c"), col("term")))).as("ts"))
        .select(aggregate(transform(col("ts"), x => x.getField("term")),
          lit(0.0d), (acc, x) => acc + x).as("hc"))
      val hl = cells.select("l", "n_l", "n").distinct()
        .withColumn("term", (col("n_l").cast("double") / col("n")) *
          log(col("n").cast("double") / col("n_l")))
        .agg(array_sort(collect_list(struct(col("l"), col("term")))).as("ts"))
        .select(aggregate(transform(col("ts"), x => x.getField("term")),
          lit(0.0d), (acc, x) => acc + x).as("hl"))
      val pur = cells.groupBy("c").agg(max("n_cl").as("mx"))
        .agg(sum("mx").as("n_pure"))
      mi.crossJoin(hc).crossJoin(hl).crossJoin(pur)
        .select(col("n"), col("k"), col("n_labels"),
          expr("n_pure * 1000000 div n").as("purity_e6"),
          floor(col("mi") * 1e6).cast("long").as("mi_e6"),
          floor(col("hc") * 1e6).cast("long").as("hc_e6"),
          floor(col("hl") * 1e6).cast("long").as("hl_e6"),
          floor((col("mi") * 2.0) / (col("hc") + col("hl")) * 1e6)
            .cast("long").as("nmi_e6"))
    }),

    // Nucleus (top-p) vocabulary coverage per source — how concentrated
    // each source's unigram mass is: the number of types needed to cover
    // 90% of tokens (the integer test cum·10 ≥ tot·9, no floats) and the
    // mass captured by the top-100 types. The tokenizer-design readout:
    // a source where 100 types carry most of the mass is template/boiler
    // -plate-heavy (pairs with q103 repetition and q285 richness).
    // Scale shape: one (source, term) groupBy, then per-SOURCE windows
    // over the VOCAB frame (Heaps-law sublinear in corpus size), one
    // row out per source.
    "q395_topp_coverage" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy(desc("c"), asc("term"))
      val voc = t(s, d, "documents")
        .select(col("source"), explode(TextFunctions.tokens(col("text")))
          .as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
      voc
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("cum", sum("c").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("tot", sum("c").over(Window.partitionBy("source")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"), max("tot").as("n_tok"),
          min(when(col("cum") * 10L >= col("tot") * 9L, col("rnk")))
            .as("types_p90"),
          max(when(col("rnk") <= 100L, col("cum"))).as("cum100"))
        .select(col("source"), col("n_types"), col("n_tok"),
          col("types_p90"),
          expr("cum100 * 1000000 div n_tok").as("mass_top100_e6"))
    }),

    // Simplified silhouette (Hruschka et al. 2004) — the linear-time
    // internal clustering validation that replaces all-pairs distances
    // with distances to CENTROIDS: a(i) = d²(i, own centroid),
    // b(i) = min d²(i, other centroids), s(i) = (b−a)/max(a,b). On the
    // q145 Lloyd solution with integer-quantized vectors the distances
    // are exact BIGINT squared-L2, so s is one trunc-div per point and
    // the per-cluster means are exact — no float fold at all (squared
    // -distance variant, documented divergence from the sqrt form;
    // distances in kilo-µ² units — d² div 1000 — so (b−a)·1e6 stays
    // inside int64 at Dim=64, worst case 2.6e17).
    // Scale shape: one broadcast of k centroids, map-side distances, one
    // groupBy — the validation costs one scan, vs O(n²) for the full
    // silhouette.
    "q396_silhouette" -> ((s, d) => {
      val (cur, cents) = Similarity.lloyd(t(s, d, "embeddings"), 2)
      val d2 = cur.crossJoin(broadcast(cents
          .select(col("c").as("c2"), col("ce"))))
        .withColumn("d2", expr(
          """aggregate(zip_with(ve, ce, (a, b) -> (a - b) * (a - b)),
             cast(0 as bigint), (acc, x) -> acc + x) div 1000"""))
        .groupBy("vec_id", "c")
        .agg(min(when(col("c2") === col("c"), col("d2"))).as("a"),
          min(when(col("c2") =!= col("c"), col("d2"))).as("b"))
        .withColumn("s_e6", expr(
          "CASE WHEN greatest(a, b) = 0 THEN 0 " +
          "ELSE ((b - a) * 1000000) div greatest(a, b) END"))
      d2.groupBy("c")
        .agg(count(lit(1)).as("n"),
          expr("sum(s_e6) div count(1)").as("mean_s_e6"),
          min("s_e6").as("min_s_e6"), max("s_e6").as("max_s_e6"))
    }),

    // UNSUPERVISED Fellegi–Sunter parameter estimation by EM (Winkler
    // 1988; the Splink training loop) — where q387 estimated m/u from
    // labeled pairs, this recovers them from the UNLABELED candidate set:
    // collapse pairs to their 2⁴ = 16 comparison patterns, then 5 EM
    // rounds on that bounded frame. E-step: per-pattern match posterior
    // w = p·Πm / (p·Πm + (1−p)·Πu); M-step: w-weighted refits of p, m_k,
    // u_k. Every step is e6 integers with a FIXED trunc-div chain
    // (((p·f1)div 1e6·f2)div 1e6…), so the oracle replays all 5 rounds
    // bit-for-bit (int64-safe while candidate pairs ≤ 9e6 per the
    // a_k·1e6 bound; production shards the E-step by pattern — it is 16
    // rows regardless of corpus size). Scale shape: corpus-scale work is
    // the capped LSH candidate join + ONE pattern groupBy; the EM itself
    // is iteration on a 16-row localCheckpoint'd frame.
    "q398_fs_em" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val side = docs.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"),
        element_at(TextFunctions.tokens(col("text")), 1).as("tok1"))
      val pat = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(side.toDF("id1", "s1", "l1", "c1", "t1"), "id1")
        .join(side.toDF("id2", "s2", "l2", "c2", "t2"), "id2")
        .select((col("s1") === col("s2")).cast("long").as("x1"),
          (col("l1") === col("l2")).cast("long").as("x2"),
          (abs(col("c1") - col("c2")) < 100L).cast("long").as("x3"),
          (col("t1") === col("t2")).cast("long").as("x4"))
        .groupBy("x1", "x2", "x3", "x4").agg(count(lit(1)).as("npat"))
        .localCheckpoint(true)
      def pp(pcol: String, cs: Seq[String]): String =
        cs.zipWithIndex.foldLeft(s"$pcol") { case (acc, (c, i)) =>
          s"(($acc * (CASE WHEN x${i + 1} = 1 THEN $c " +
            s"ELSE 1000000 - $c END)) div 1000000)"
        }
      var st = t(s, d, "documents").sparkSession.range(1).select(
        lit(100000L).as("p"),
        lit(900000L).as("m1"), lit(900000L).as("m2"),
        lit(800000L).as("m3"), lit(700000L).as("m4"),
        lit(500000L).as("u1"), lit(300000L).as("u2"),
        lit(400000L).as("u3"), lit(100000L).as("u4"))
      for (_ <- 1 to 5) {
        val e = pat.crossJoin(broadcast(st))
          .withColumn("pm", expr(pp("p", Seq("m1", "m2", "m3", "m4"))))
          .withColumn("pu", expr(pp("(1000000 - p)",
            Seq("u1", "u2", "u3", "u4"))))
          .withColumn("w", expr(
            "CASE WHEN pm + pu = 0 THEN 0 " +
            "ELSE (pm * 1000000) div (pm + pu) END"))
        val fit = (1 to 4).flatMap { k =>
          Seq(
            expr(s"CASE WHEN sum(npat * w) = 0 THEN 0 ELSE " +
              s"(sum(CASE WHEN x$k = 1 THEN npat * w ELSE 0 END) * 1000000)" +
              s" div sum(npat * w) END").as(s"m$k"),
            expr(s"CASE WHEN sum(npat * (1000000 - w)) = 0 THEN 0 ELSE " +
              s"(sum(CASE WHEN x$k = 1 THEN npat * (1000000 - w) ELSE 0 END)" +
              s" * 1000000) div sum(npat * (1000000 - w)) END").as(s"u$k"))
        }
        st = e.agg(expr("sum(npat * w) div sum(npat)").as("p"),
            fit: _*)
          .localCheckpoint(true)
      }
      val np = pat.agg(sum("npat").as("n_pairs"))
      st.crossJoin(np)
        .select(expr("""stack(4,
            'source', m1, u1,
            'lang',   m2, u2,
            'len',    m3, u3,
            'tok1',   m4, u4) AS (feature, m_e6, u_e6)"""),
          col("p").as("p_e6"), col("n_pairs"))
        .withColumn("lambda_e6", expr(
          "CASE WHEN m_e6 = 0 OR u_e6 = 0 THEN 0 ELSE " +
          "CAST(floor(ln(CAST(m_e6 AS DOUBLE) / u_e6) * 1000000.0) " +
          "AS BIGINT) END"))
    }),

    // Leakage-free churn label construction — the supervised-dataset
    // generation pattern done right: features come STRICTLY from
    // [t0−56d, t0−28d) and the label (churned = zero events) from
    // [t0−28d, t0), so no feature can see the label window — the
    // time-split discipline whose absence is the classic silent
    // target-leak. t0 is the broadcast corpus max timestamp. One scan,
    // both windows aggregated per user via CASE sides; population =
    // users active in the feature window.
    "q384_churn_labels" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("event_type"))
      val anchor = ev.agg(max("ts_s").as("t0"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("in_feat",
          col("ts_s") >= col("t0") - 4838400L && col("ts_s") < col("t0") - 2419200L)
        .withColumn("in_label", col("ts_s") >= col("t0") - 2419200L)
        .groupBy("user_id")
        .agg(sum(when(col("in_feat"), 1L).otherwise(0L)).as("n_feat_events"),
          sum(when(col("in_feat") && col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("n_feat_purchases"),
          sum(when(col("in_label"), 1L).otherwise(0L)).as("n_label_events"))
        .where(col("n_feat_events") > 0L)
        .select(col("user_id"), col("n_feat_events"), col("n_feat_purchases"),
          (col("n_label_events") === 0L).as("churned"))
    }),

    // Johnson–Lindenstrauss distortion audit — measure what the
    // workhorse dimensionality reduction actually costs: project 64-d
    // vectors to 16-d with a deterministic ±1 sign matrix (signs from
    // the md5-60 hash of (dim_in, dim_out) — no stored matrix), then
    // for in-cell pairs compare projected vs original squared L2:
    // E[d²_proj] = 16·d²_orig for sign projections, so ratio_e6 =
    // d²_proj·1e6 div (16·d²_orig) concentrates at 1e6 — the histogram
    // IS the JL concentration curve. All integer: dims quantized e6,
    // distances exact BIGINT. Scale shape: projection is one map-side
    // 16×64 fold; pairs stay inside the scaled (cell, bin) groups.
    "q383_jl_distortion" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val ve = e.select(col("vec_id"), col("label"), expr(
        """transform(embedding,
             v -> cast(floor(cast(v as double) * 1000000.0) as bigint))""")
        .as("ve"))
      // signs computed ONCE here via the same md5('jl:i:j') % 2 formula
      // the oracle replays in SQL — embedding them as literal arrays
      // keeps the expression tree 16 zip_with folds instead of 1024
      // CASE(md5(...)) terms, whose per-run constant folding alone
      // measured ~7 s of plan time at sf0.1
      def jlSign(i: Int, j: Int): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"jl:$i:$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L
        else -1L
      }
      val projExpr = (0 until 16).map { j =>
        val arr = (0 until 64).map(i => s"${jlSign(i, j)}L").mkString(", ")
        expr(s"""aggregate(zip_with(ve, array($arr),
               (v, sg) -> v * sg), 0L, (a, z) -> a + z)""").as(s"p$j")
      }
      val proj = ve.select(Seq(col("vec_id"), col("label")) ++ projExpr: _*)
      val cells = Similarity.withIvfCell(e, Similarity.ivfCentroids(e))
      val nDf = e.agg(count(lit(1)).as("n_total"))
      // q347's corpus-scaled bin over the quantized first coordinate so
      // the pair frame stays linear in n
      val a = ve.join(proj.drop("label"), "vec_id").join(cells, "vec_id")
        .crossJoin(broadcast(nDf))
        .withColumn("nb", expr("greatest(1L, n_total div 2000)"))
        .withColumn("bin", expr(
          """least(nb - 1, greatest(0L, cast(floor(
            (cast(element_at(ve, 1) as double) / 1000000.0 + 1.0)
            / 2.0 * nb) as bigint)))"""))
        .drop("n_total", "nb")
      val b = a.toDF(a.columns.map(c => s"b_$c"): _*)
      // zip_with fold, deliberately: the "optimized" flat 64-term
      // unrolled sum measured 4.5× SLOWER (26.5 s vs 5.8 s at sf0.1 —
      // a 128-element_at expression overruns the codegen method-size
      // split and degrades), while the HOF stays one generated loop
      val dOrig = expr(
        """aggregate(zip_with(ve, b_ve, (x, y) -> (x - y) * (x - y)),
             0L, (acc, z) -> acc + z)""")
      val dProj = (0 until 16)
        .map(j => expr(s"(p$j - b_p$j) * (p$j - b_p$j)"))
        .reduce(_ + _)
      a.join(b, col("cell") === col("b_cell") && col("bin") === col("b_bin") &&
          col("vec_id") < col("b_vec_id"))
        // deterministic 1-in-4 pair sample: a concentration histogram
        // needs pair VOLUME, not every pair — 4x off the dominant cost
        .where((col("vec_id") + col("b_vec_id")) % 4 === 0L)
        .select(dOrig.as("do2"), dProj.as("dp2"))
        .where(col("do2") > 0L)
        // (dp2 div 16) first: dp2·10 could pass int64; dp2 div 16 cannot
        .select(expr("(dp2 div 16) * 10 div do2").as("bkt"))
        .groupBy("bkt").agg(count(lit(1)).as("n_pairs"))
    }),

    // Binary-embedding recall audit — the 32×-memory-saving production
    // variant (sign-bit codes + Hamming ranking) measured against the
    // float-cosine truth, the q117 recall posture: 60-of-64 sign bits
    // pack into one BIGINT (staying under the sign bit, the hash60
    // convention), candidates rank by bit_count(xor), and recall@10 is
    // reported per query. Scale shape: the code is one map-side fold;
    // ranking is the broadcast-query scan with a query-keyed window —
    // and at corpus scale the 8-byte codes are what makes the scan
    // cache-resident where float vectors are not.
    "q381_binary_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings")
      val qids = Seq(10L, 20L, 30L)
      val coded = e.select(col("vec_id"), expr(
        """aggregate(sequence(0, 59), 0L,
             (a, i) -> a + if(cast(element_at(embedding, i + 1) as double)
                              > 0.0, shiftleft(1L, i), 0L))""").as("code"))
      val q = coded.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("code").as("qcode"))
      val w = Window.partitionBy("query_id").orderBy(asc("ham"), asc("vec_id"))
      val hamTop = coded.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("ham", expr("cast(bit_count(code ^ qcode) as bigint)"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), lit(1L).as("hit"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(qids: _*)), 10)
        .select(col("query_id"), col("neighbor_id"))
        .join(hamTop, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k"),
          coalesce(sum("hit"), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          expr("n_hit * 1000000 div k").as("recall_e6"))
    }),

    // Binary-candidate + float-rerank recall — the FIX q381's 10–30%
    // recall prescribes, proven (the q373 pattern): Hamming top-50 on
    // the 8-byte codes as the candidate stage, exact float cosine
    // reranks the 50 to a top-10, recall@10 vs direct brute force. The
    // production two-stage retrieval shape: the cheap scan touches
    // every code, the expensive float math touches 50 rows per query.
    "q382_binary_rerank_recall" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = t(s, d, "embeddings")
      val qids = Seq(10L, 20L, 30L)
      val coded = e.select(col("vec_id"), col("embedding"), expr(
        """aggregate(sequence(0, 59), 0L,
             (a, i) -> a + if(cast(element_at(embedding, i + 1) as double)
                              > 0.0, shiftleft(1L, i), 0L))""").as("code"))
      val q = coded.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"), col("code").as("qcode"),
          col("embedding").as("qemb"))
        .withColumn("qn", Similarity.norm2("qemb"))
      val wH = Window.partitionBy("query_id").orderBy(asc("ham"), asc("vec_id"))
      val cand = coded.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("ham", expr("cast(bit_count(code ^ qcode) as bigint)"))
        .withColumn("hrnk", row_number().over(wH))
        .where(col("hrnk") <= 50)
      val wC = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
      val reranked = cand
        .withColumn("nrm", Similarity.norm2("embedding"))
        .withColumn("cos", Similarity.cosineWithNorms(
          Similarity.dot("embedding", "qemb"), col("nrm"), col("qn")))
        .withColumn("rnk", row_number().over(wC))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), lit(1L).as("hit"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id").isin(qids: _*)), 10)
        .select(col("query_id"), col("neighbor_id"))
        .join(reranked, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("k"), coalesce(sum("hit"), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          expr("n_hit * 1000000 div k").as("recall_e6"))
    }),

    // Scrub residual verification — the q373-style prove-the-fix query
    // for q85's PII scrub: run the DETECTORS over the SCRUBBED text and
    // count residual digit runs and residual email shapes. Residual
    // digits are zero by construction (every digit run is replaced);
    // residual email patterns CAN survive (the digit pass rewrites the
    // local part, leaving letter@letter shapes the email pass then
    // catches — the audit confirms order matters and the composed
    // pipeline ends clean). One map pass + one global aggregate.
    "q380_scrub_residual" -> ((s, d) => {
      val scrubbed = regexp_replace(
        regexp_replace(col("text"), "[0-9]+", "<NUM>"),
        "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+", "<EMAIL>")
      t(s, d, "documents")
        .select((scrubbed =!= col("text")).as("changed"),
          scrubbed.rlike("[0-9]").as("res_digit"),
          scrubbed.rlike("[a-zA-Z0-9.]+@[a-zA-Z0-9.]+").as("res_email"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("changed"), 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("res_digit"), 1L).otherwise(0L)).as("n_residual_digits"),
          sum(when(col("res_email"), 1L).otherwise(0L)).as("n_residual_emails"))
    }),

    // Fusion provenance report — the IR diagnostic behind q350's RRF:
    // for each query's fused top-10, how many results came from the
    // dense list only, the sparse list only, or both — the readout
    // that tells you which retriever actually drives the ranking (a
    // fusion where one side never contributes is dead weight). One
    // bounded aggregate over the fused frame.
    "q378_fusion_provenance" -> ((s, d) => {
      Training.queries("q350_rrf_fusion")(s, d)
        .groupBy("query_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("r_dense").isNotNull && col("r_sparse").isNull, 1L)
            .otherwise(0L)).as("dense_only"),
          sum(when(col("r_dense").isNull && col("r_sparse").isNotNull, 1L)
            .otherwise(0L)).as("sparse_only"),
          sum(when(col("r_dense").isNotNull && col("r_sparse").isNotNull, 1L)
            .otherwise(0L)).as("both_lists"))
    }),

    // CDC storage-savings rollup — the number the q374 chunking exists
    // to produce: total token volume, the volume spent on duplicate
    // chunk copies beyond the first (Σ (n_copies−1)·len — what a
    // content-addressed store deduplicates away), and the e6 savings
    // ratio. One extra bounded aggregate over the q374 chunk frame.
    "q377_cdc_savings" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("cut",
          when(TextFunctions.hash60(col("tok")) % 16 === 0L, 1L).otherwise(0L))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunks = toks
        .withColumn("chunk_id", coalesce(sum("cut").over(w), lit(0L)))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("chunk_len"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_fp"))
      chunks.groupBy("chunk_fp")
        .agg(count(lit(1)).as("n_copies"), min("chunk_len").as("len"))
        .agg(sum(expr("n_copies * len")).as("total_tok"),
          sum(expr("(n_copies - 1) * len")).as("dup_tok"),
          count(lit(1)).as("n_unique_chunks"))
        .select(col("total_tok"), col("dup_tok"), col("n_unique_chunks"),
          expr("dup_tok * 1000000 div total_tok").as("savings_e6"))
    }),

    // Embedding centroid-drift monitor — the production check that an
    // embedding space hasn't moved between two snapshots (model
    // retrain, data shift): per label, the centroid of the even-id half
    // vs the odd-id half, and the exact integer squared-L2 between them
    // in e6 micro-units (dims quantized to e6 BEFORE the mean — the
    // q145 Lloyd convention, so trunc-div centroids replay exactly).
    // Large dist2 on a label = that region of the space moved. Scale
    // shape: one posexplode + one (label, half, dim) groupBy + a
    // label-keyed 64-term fold; no pairwise anything.
    "q375_centroid_drift" -> ((s, d) => {
      val q = t(s, d, "embeddings")
        .select(col("label").cast("long").as("lab"),
          (col("vec_id") % 2 === 0).as("even"),
          posexplode(expr(
            """transform(embedding,
                 v -> cast(floor(cast(v as double) * 1000000.0) as bigint))"""))
            .as(Seq("dim", "v")))
      val cent = q.groupBy("lab", "even", "dim")
        .agg(expr("sum(v) div count(1)").as("c"), count(lit(1)).as("n"))
      cent.groupBy("lab", "dim")
        .agg(max(when(col("even"), col("c"))).as("ce"),
          max(when(!col("even"), col("c"))).as("co"),
          max(when(col("even"), col("n"))).as("ne"),
          max(when(!col("even"), col("n"))).as("no"))
        .groupBy("lab")
        .agg(max("ne").as("n_even"), max("no").as("n_odd"),
          sum(expr("(ce - co) * (ce - co)")).as("dist2_e12"))
    }),

    // Diminishing-novelty curve — the "is more data still worth
    // collecting" readout: order the corpus by doc_id decile (the
    // collection-time proxy) and report, per decile, the fraction of
    // its distinct 3-gram hashes NEVER seen in any earlier decile.
    // Novelty decaying toward zero means new data repeats the old —
    // the collection-ROI curve (Heaps-law q296's actionable cousin).
    // First occurrence = min decile per gram (one groupBy over the
    // exploded gram hashes); per-decile distinct counts are a second
    // keyed groupBy. All counts exact.
    "q376_novelty_curve" -> ((s, d) => {
      val nDf = t(s, d, "documents").agg(max("doc_id").as("max_id"))
      val grams = t(s, d, "documents")
        .where(size(TextFunctions.tokens(col("text"))) >= 3)
        .crossJoin(broadcast(nDf))
        .select(expr("least(9L, doc_id * 10 div (max_id + 1))").as("dec"),
          explode(Dedup.shingles(col("text"), 3)).as("g"))
        .select(col("dec"), TextFunctions.hash60(col("g")).as("h"))
      val perDec = grams.select("dec", "h").distinct()
      val firstDec = perDec.groupBy("h").agg(min("dec").as("first_dec"))
      perDec.join(firstDec, "h")
        .groupBy("dec")
        .agg(count(lit(1)).as("n_distinct"),
          sum(when(col("first_dec") === col("dec"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("dec"), col("n_distinct"), col("n_novel"),
          expr("n_novel * 1000000 div n_distinct").as("novelty_e6"))
    }),

    // Leakage-free fold assignment — the FIX for what q371 measures:
    // fold by near-dup COMPONENT (hash of the component representative),
    // not by document, so every near-dup pair lands in the same fold by
    // construction. Output per fold: docs, components — and the
    // recomputed cross-fold leak count, which the query proves is ZERO
    // (the q371 audit run against the fixed assignment). Scale shape:
    // the component machinery + one rep-keyed hash + a 5-group
    // aggregate; the leak recheck is the capped candidate join again.
    "q373_component_folds" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val comp = Dedup.dedupNearDupes(docs, "doc_id", "text",
          maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("rep_id"))
      val fold = comp.select(col("doc_id"),
        (TextFunctions.hash60(concat(lit("fold:"), col("rep_id").cast("string")))
          % 5).as("fold"), col("rep_id"))
      val leaks = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .join(fold.select(col("doc_id").as("id1"), col("fold").as("f1")), "id1")
        .join(fold.select(col("doc_id").as("id2"), col("fold").as("f2")), "id2")
        .agg(coalesce(sum(when(col("f1") =!= col("f2"), 1L).otherwise(0L)),
          lit(0L)).as("n_leaks"))
      fold.groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("rep_id").as("n_components"))
        .crossJoin(broadcast(leaks))
    }),

    // Content-defined chunking dedup (the FastCDC/rsync posture, at
    // token granularity): chunk boundaries are CONTENT-derived — a cut
    // wherever the token's 60-bit hash ≡ 0 (mod 16) — so an insertion
    // shifts only its own chunk while every other chunk keeps its
    // identity, which is why storage dedup uses CDC instead of fixed
    // windows. Chunks fingerprint by md5 over the joined tokens;
    // cross-document duplicate chunks (count > 1) are the shared spans
    // dedup can collapse. Scale shape: one explode + a doc-keyed
    // cumulative-cut window (islands) + one chunk-hash groupBy.
    "q374_cdc_chunks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("cut",
          when(TextFunctions.hash60(col("tok")) % 16 === 0L, 1L).otherwise(0L))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      val chunks = toks
        .withColumn("chunk_id", coalesce(sum("cut").over(w), lit(0L)))
        .groupBy("doc_id", "chunk_id")
        .agg(count(lit(1)).as("chunk_len"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_fp"))
      val wf = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_id")
      chunks.withColumn("rn", row_number().over(wf))
        .groupBy("chunk_fp")
        .agg(count(lit(1)).as("n_copies"), min("chunk_len").as("chunk_len"),
          max(when(col("rn") === 1, col("doc_id"))).as("first_doc"),
          max(when(col("rn") === 1, col("chunk_id"))).as("first_chunk"))
        .where(col("n_copies") > 1L)
    }),

    // Effective dataset size accounting — the topline a curation run
    // reports: per source, raw docs/tokens, tokens surviving EXACT
    // dedup (one representative per content fingerprint), and tokens
    // surviving near-dup dedup on top (q76's component keep rule) —
    // with e6 retention ratios. "How much data do we actually have" is
    // the first question a pretraining plan asks; answering it without
    // this accounting double-counts boilerplate. Scale shape: one
    // fingerprint groupBy + the capped component machinery on the
    // bounded fixture population + keyed joins; output is #sources
    // rows.
    "q372_effective_tokens" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), col("source"),
          TextFunctions.alnumTokenCount(col("text")).cast("long").as("ntok"),
          TextFunctions.fingerprint(col("text")).as("fp"))
      val exactKeep = docs
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")
            .orderBy("doc_id")))
        .withColumn("keep_exact", col("rn") === 1).drop("rn")
      val nearKeep = Dedup.dedupNearDupes(
          t(s, d, "documents").where(col("doc_id") < 300),
          "doc_id", "text", maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("is_kept").as("keep_near"))
      exactKeep.join(nearKeep, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("raw_tok"),
          sum(when(col("keep_exact"), col("ntok")).otherwise(0L))
            .as("exact_tok"),
          sum(when(col("keep_exact") && col("keep_near"), col("ntok"))
            .otherwise(0L)).as("near_tok"))
        .select(col("source"), col("n_docs"), col("raw_tok"),
          col("exact_tok"), col("near_tok"),
          expr("exact_tok * 1000000 div raw_tok").as("exact_retention_e6"),
          expr("near_tok * 1000000 div raw_tok").as("near_retention_e6"))
    }),

    // Shuffle-key skew audit — the other pre-flight planning readout
    // (q369's sibling): the row distribution a keyed shuffle on user_id
    // would produce across 32 buckets, with each bucket's share and the
    // max/avg skew factor — the number that decides salting (q93/q100)
    // before the job runs. The bucket hash is the engine-portable
    // md5-60 (NOT Spark's Murmur3, which an external oracle cannot
    // replay). One map pass + one 32-group aggregate.
    "q370_shuffle_skew_audit" -> ((s, d) => {
      val b = t(s, d, "events")
        .select((TextFunctions.hash60(col("user_id").cast("string")) % 32)
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val tot = b.agg(sum("n").as("total"), count(lit(1)).as("n_buckets"),
        max("n").as("max_n"))
      b.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n"),
          expr("n * 1000000 div total").as("share_e6"),
          expr("max_n * 1000 div (total div n_buckets)").as("skew_e3"))
    }),

    // Join-cardinality estimator audit — the pre-join planning number
    // every cost-based optimizer computes, checked against truth: the
    // EXACT join output size Σ c₁(k)·c₂(k) (two keyed counts + one
    // key join — never materializing the join itself) vs the System-R
    // independence estimate |R|·|S| / max(ndv₁, ndv₂), with the error
    // ratio in e6. On skewed keys the estimate undershoots — this audit
    // is how you know to switch to a histogram. Scale shape: two
    // groupBys + one key-keyed join of count frames; the join output is
    // never built.
    "q369_join_cardinality" -> ((s, d) => {
      val o = t(s, d, "orders").groupBy(col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("c1"))
      val l = t(s, d, "lineitem").groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("c2"))
      val actual = o.join(l, "k")
        .agg(sum(expr("c1 * c2")).as("actual_rows"))
      val stats = o.agg(sum("c1").as("n1"), count(lit(1)).as("ndv1"))
        .crossJoin(l.agg(sum("c2").as("n2"), count(lit(1)).as("ndv2")))
      actual.crossJoin(broadcast(stats))
        .select(col("actual_rows"), col("n1"), col("n2"), col("ndv1"),
          col("ndv2"),
          expr("n1 * n2 div greatest(ndv1, ndv2)").as("estimate_rows"),
          expr("(n1 * n2 div greatest(ndv1, ndv2)) * 1000000 div actual_rows")
            .as("est_over_actual_e6"))
    }),

    // Quality-aware dedup representative — production "keep best, not
    // first": within each near-dup component (q76's distributed CC),
    // the kept copy is the argmax by content length (alnum tokens, tie
    // by id), the rule web-corpus dedup actually ships (keep the
    // longest/cleanest variant, not the smallest id). Scale shape:
    // q76's component machinery + one component-KEYED argmax window +
    // one join back — nothing global.
    "q367_dedup_keep_best" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val comp = Dedup.dedupNearDupes(docs, "doc_id", "text",
          maxBucket = Int.MaxValue)
        .select(col("doc_id"), col("rep_id"))
      val ntok = docs.select(col("doc_id"),
        TextFunctions.alnumTokenCount(col("text")).cast("long").as("ntok"))
      val f = comp.join(ntok, "doc_id")
      val w = Window.partitionBy("rep_id").orderBy(desc("ntok"), asc("doc_id"))
      val best = f.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("rep_id"), col("doc_id").as("best_id"))
      f.join(best, "rep_id")
        .select(col("doc_id"), col("rep_id"), col("ntok"), col("best_id"),
          (col("doc_id") === col("best_id")).as("is_kept"))
    }),

    // Time-decayed popularity — the freshness-weighted ranking a feed /
    // trending surface computes, with the decay EXACT: score halves per
    // week of age, realized as an integer shiftright of the e3 value
    // (floor(value·1e3) >> age_weeks) — no pow(), no float decay, and
    // a guard at 63 bits where Java's >> would wrap (shift masks to
    // n & 63) but DuckDB's saturates. Top-10 per event type by decayed
    // score via a type-KEYED window; the "now" anchor is the corpus
    // max timestamp (broadcast scalar), so the query is deterministic.
    "q368_decayed_popularity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"),
        floor(col("value") * 1000).cast("long").as("v_e3"))
      val anchor = ev.agg(max("ts_s").as("now_s"))
      val w = Window.partitionBy("event_type")
        .orderBy(desc("decayed_e3"), asc("event_id"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age_weeks", expr("(now_s - ts_s) div 604800"))
        .withColumn("decayed_e3", expr(
          "CASE WHEN age_weeks >= 63 THEN 0L ELSE shiftright(v_e3, cast(age_weeks as int)) END"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
        .select(col("event_type"), col("event_id"), col("age_weeks"),
          col("decayed_e3"), col("rnk"))
    }),

    // LSH banding S-curve validation — the calibration every MinHash
    // deployment should run: for all pairs of a bounded population,
    // the EMPIRICAL candidate rate per exact-Jaccard bucket against
    // the THEORETICAL 1−(1−j^r)^b collision curve (r=4 rows, b=8
    // bands). The theory term uses only +,−,×,÷ doubles (three
    // squarings — j⁴ and (1−j⁴)⁸ via repeated multiplication), every
    // one IEEE-correctly-rounded, so the floored e6 value replays
    // bit-exact cross-engine where pow() would not. Scale shape: the
    // all-pairs ground truth is the definitionally quadratic part and
    // rides a bounded population (the q58/q273 posture); the candidate
    // probe is the capped banded join.
    "q366_lsh_s_curve" -> ((s, d) => {
      val p = Dedup.MinHashParams()
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val sh = docs
        .where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"), p.shingleSize)).as("shs"))
      val pairs = sh.select(col("doc_id").as("id1"), col("shs").as("s1"))
        .join(sh.select(col("doc_id").as("id2"), col("shs").as("s2")),
          col("id1") < col("id2"))
        .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
        .withColumn("uni",
          size(col("s1")).cast("long") + size(col("s2")).cast("long") - col("inter"))
        .select(col("id1"), col("id2"), col("inter"), col("uni"))
      val cand = Dedup.lshCandidatePairs(docs, "doc_id", "text", p)
        .withColumn("is_cand", lit(1L))
      val j = col("inter").cast("double") / col("uni").cast("double")
      val j4 = (j * j) * (j * j)
      val tc = lit(1.0) - j4
      val t8 = ((tc * tc) * (tc * tc)) * ((tc * tc) * (tc * tc))
      pairs.join(cand, Seq("id1", "id2"), "left")
        .na.fill(0L, Seq("is_cand"))
        .withColumn("theory_e6", floor((lit(1.0) - t8) * 1e6).cast("long"))
        .withColumn("bkt", expr("(inter * 1000000 div uni) div 100000"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_pairs"), sum("is_cand").as("n_cand"),
          sum("theory_e6").as("sum_theory_e6"))
        .select(col("bkt"), col("n_pairs"), col("n_cand"),
          expr("n_cand * 1000000 div n_pairs").as("cand_rate_e6"),
          expr("sum_theory_e6 div n_pairs").as("mean_theory_e6"))
    }),

    // Dedup method-agreement report — the methodological audit behind
    // choosing a near-dup detector: the three candidate-pair families
    // (MinHash-LSH on shingle sets, SimHash Hamming bands on token
    // sketches, perceptual-hash bands on the sampled raster) computed
    // over ONE population, then pairwise set agreement (|A∩B| and the
    // pair-set Jaccard). Low agreement is the finding — each family
    // sees a different notion of "near". Scale shape: three banded
    // candidate stages (each capped, never all-pairs) + one keyed
    // self-join on the pair id and two 3-row aggregates.
    "q365_dedup_method_agreement" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 300)
      val mh = Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .select(col("id1"), col("id2"), lit("minhash").as("m"))
      val sh = Dedup.hammingBandPairs(
          Dedup.simhashRows(docs, "doc_id", "text"),
          "doc", "sim", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
        .select(col("id1"), col("id2"), lit("simhash").as("m"))
      val ph = Dedup.hammingBandPairs(
          graft.operators.Multimodal.withPerceptualHash(
            docs.where(length(col("text")) >= 60)
              .select(col("doc_id"), col("text")), "text", "ph"),
          "doc_id", "ph", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
        .select(col("id1"), col("id2"), lit("phash").as("m"))
      val tagged = mh.unionAll(sh).unionAll(ph)
        .persist() // sizes + the pair-id self-join both read it
      val sizes = tagged.groupBy("m").agg(count(lit(1)).as("n"))
      val inter = tagged.as("a").join(tagged.as("b"), Seq("id1", "id2"))
        .where(col("a.m") < col("b.m"))
        .groupBy(col("a.m").as("m1"), col("b.m").as("m2"))
        .agg(count(lit(1)).as("n_inter"))
      sizes.select(col("m").as("m1"), col("n").as("n1"))
        .crossJoin(broadcast(sizes.select(col("m").as("m2"), col("n").as("n2"))))
        .where(col("m1") < col("m2"))
        .join(inter, Seq("m1", "m2"), "left")
        .na.fill(0L, Seq("n_inter"))
        .select(col("m1"), col("m2"), col("n1"), col("n2"), col("n_inter"),
          expr("n_inter * 1000000 div (n1 + n2 - n_inter)").as("jaccard_e6"))
    }),

    // Prompt prefix-sharing audit — the KV-cache planning readout an
    // LLM-serving/training stack computes over its prompt corpus
    // (vLLM-style automatic prefix caching): bucket documents by their
    // leading 32 chars, report per-bucket fan-out and the chars a
    // shared-prefix cache saves (32·(n−1) per bucket), plus each
    // bucket's saving share of the corpus total. Buckets with n = 1
    // save nothing and drop. Scale shape: one map pass (fixed-width
    // prefix — an O(32) substr, not the q355 positional trap), one
    // keyed groupBy, broadcast total.
    "q364_prefix_cache" -> ((s, d) => {
      val b = t(s, d, "documents").where(length(col("text")) >= 32L)
        .select(substring(col("text"), 1, 32).as("prefix"))
        .groupBy("prefix").agg(count(lit(1)).as("n"))
        .where(col("n") > 1L)
        .withColumn("saved_chars", expr("32 * (n - 1)"))
      val tot = b.agg(sum("saved_chars").as("tot_saved"))
      b.crossJoin(broadcast(tot))
        .select(col("prefix"), col("n"), col("saved_chars"),
          expr("saved_chars * 1000000 div tot_saved").as("share_e6"))
    }),

    // Margin-criterion calibration — the measured-quality companion to
    // q352 (the "recall is measured, not asserted" posture): bucket the
    // UNFILTERED margin scores into 0.1-ratio bins and report the
    // same-label rate per bin. A well-behaved margin shows same-label
    // rate rising with the bin — the evidence for the 1.0 acceptance
    // cut; a flat curve means the criterion adds nothing over raw cos.
    // (Measured on the synthetic fixture: FLAT at ~20% — its labels are
    // not cosine-clustered, which is exactly what this audit exists to
    // catch before anyone trusts a margin cut on a new corpus.)
    // Scale shape: q352's celled pair machinery + two keyed label joins
    // + one bounded-domain groupBy.
    "q363_margin_calibration" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val lab = e.select(col("vec_id"), col("label").cast("long").as("lab"))
      Similarity.marginRatio(e, 200L, 4)
        .join(lab.select(col("vec_id").as("id_a"), col("lab").as("lab_a")),
          "id_a")
        .join(lab.select(col("vec_id").as("id_b"), col("lab").as("lab_b")),
          "id_b")
        .withColumn("bkt", expr("margin_e6 div 100000"))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("lab_a") === col("lab_b"), 1L).otherwise(0L))
            .as("n_same"))
        .select(col("bkt"), col("n_pairs"), col("n_same"),
          expr("n_same * 1000000 div n_pairs").as("same_rate_e6"))
    }),

    // Cross-snapshot manifest diff — the change-detection readout q359's
    // manifests exist for: snapshot A (docs with doc_id % 10 <> 0, the
    // pre-ingest state) vs snapshot B (all docs), compared source by
    // source on (count, xor digest) without diffing any rows. Sources
    // whose digests agree are PROVEN unchanged (same leaves); the diff
    // lists only the touched partitions — the incremental-refresh
    // planning input. One map pass + one keyed groupBy with both
    // snapshots' aggregates in the same pass (a CASE side, not a second
    // scan).
    "q362_manifest_diff" -> ((s, d) => {
      val leaves = t(s, d, "documents")
        .select(col("source"), (col("doc_id") % 10 =!= 0).as("in_a"),
          graft.streaming.StreamingManifest
            .leafCol(col("doc_id"), col("text")).as("leaf"))
      leaves.groupBy("source")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          count(lit(1)).as("n_b"),
          expr("bit_xor(CASE WHEN in_a THEN leaf ELSE 0L END)").as("digest_a"),
          expr("bit_xor(leaf)").as("digest_b"))
        .select(col("source"), col("n_a"), col("n_b"), col("digest_a"),
          col("digest_b"),
          (col("digest_a") =!= col("digest_b")).as("changed"))
    }),

    // SimHash near-duplicate pairing — completes the SimHash path (q60
    // only emits fingerprints): Charikar-style 60-bit sketches matched
    // by 4×15-bit Hamming-LSH bands (any shared band pairs the docs),
    // bucket occupancy capped at 64, exact bit_count Hamming cut at
    // ≤ 6 — the q355 banded-join shape over the q60 population. Scale
    // shape: map-side sketch, one (band, key) shuffle, capped buckets;
    // a corpus-scale build widens the sketch with n (the q356 posture).
    "q361_simhash_neardup" -> ((s, d) => {
      Dedup.hammingBandPairs(
        Dedup.simhashRows(
          t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text"),
        "doc", "sim", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
    }),

    // MAUVE-shape distributional eval (Pillutla et al. NeurIPS 2021's
    // quantize-then-compare recipe, with JS divergence in place of the
    // frontier integral): quantize both corpora into the shared IVF
    // codebook's cells, then compare the two cell HISTOGRAMS — here the
    // even/odd vec_id halves standing in for model-vs-human text. Uses
    // q278's exact integer convention (per-cell contributions floored
    // to e9 before the sum, so the aggregate is merge-order-free).
    // Scale shape: one broadcast cell assignment + one bounded-domain
    // groupBy; the histogram frame is #cells rows.
    "q360_mauve_cells" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val counts = e
        .join(Similarity.withIvfCell(e, Similarity.ivfCentroids(e)), "vec_id")
        .groupBy("cell")
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("cp"),
          sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("cq"))
      val tot = counts.agg(sum("cp").as("np"), sum("cq").as("nq"))
      val p = col("cp").cast("double") / col("np").cast("double")
      val q = col("cq").cast("double") / col("nq").cast("double")
      val m = (p + q) / lit(2.0)
      counts.crossJoin(broadcast(tot))
        .select(
          when(col("cp") > 0, floor(p * log(p / m) * 1e9).cast("long"))
            .otherwise(0L).as("tp"),
          when(col("cq") > 0, floor(q * log(q / m) * 1e9).cast("long"))
            .otherwise(0L).as("tq"))
        .agg(count(lit(1)).as("n_cells"), sum("tp").as("klp_e9"),
          sum("tq").as("klq_e9"))
        .withColumn("jsd2_e9", col("klp_e9") + col("klq_e9"))
    }),

    // Content-addressed dataset manifest — the Merkle-style snapshot
    // fingerprint a dataset-versioning layer (DVC/lakeFS posture, and
    // the audit twin of q245's TxTable) computes to detect ANY changed
    // row between two snapshots without diffing them: per-doc leaf =
    // 60-bit hash of (doc_id : content-md5); per-source digest =
    // bit_xor of leaves (order-independent, overflow-free — a modular
    // SUM would wrap int64 at a handful of 2^60 leaves); root = hash of
    // the source digests concatenated in sorted order. Scale shape: one
    // map pass + one keyed groupBy; the root combines #sources rows
    // (bounded domain, the q322 convention).
    "q359_merkle_manifest" -> ((s, d) => {
      val leaves = t(s, d, "documents")
        .select(col("source"),
          graft.streaming.StreamingManifest
            .leafCol(col("doc_id"), col("text")).as("leaf"))
      val perSource = leaves.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(leaf)").as("digest"))
      // sort by the SOURCE key, not the combined string: ':' (0x3a)
      // outranks digits, so sorting "src1:..." strings would order
      // src10 before src1 — unlike ORDER BY source.
      val root = perSource
        .agg(sum("n_docs").as("n_docs"),
          TextFunctions.hash60(array_join(transform(
            sort_array(collect_list(struct(col("source"),
              concat(col("source"), lit(":"), col("digest").cast("string"))
                .as("s")))),
            x => x.getField("s")), "|")).as("digest"))
        .select(lit("(ALL)").as("part"), col("n_docs"), col("digest"))
      perSource.select(col("source").as("part"), col("n_docs"), col("digest"))
        .unionAll(root)
    }),

    // Weak-supervision labeling-function diagnostics (the Snorkel/
    // data-programming LF report — Ratner et al. VLDB 2018): three
    // heuristic labelers vote keep(1)/drop(0)/abstain(null) per doc
    // (keyword presence, token-count bounds, integer mean-token-length
    // band), the per-doc label is the majority among non-abstainers,
    // and the report is per-LF coverage / majority-agreement / conflict
    // — the table a practitioner reads to decide which heuristic to
    // fix. Exact integers (rates as e6 trunc divisions). Scale shape:
    // one map pass, a 3-row explode per doc, one groupBy on the LF
    // name (3 groups).
    "q358_weak_supervision" -> ((s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), lower(col("text")).as("tl"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_ws"),
          length(col("text")).cast("long").as("n_ch"))
        .withColumn("lf1",
          when(col("tl").contains("spark") || col("tl").contains("fast"), 1L)
            .when(col("tl").contains("slow"), 0L))
        .withColumn("lf2",
          when(col("n_ws") > 150L, 1L).when(col("n_ws") < 30L, 0L))
        .withColumn("lf3",
          when(expr("(n_ch * 10) div n_ws").between(40L, 80L), 1L)
            .otherwise(0L))
      def isv(c: String, v: Long) =
        when(col(c) === v, 1L).otherwise(0L)
      val maj = base
        .withColumn("v1", isv("lf1", 1L) + isv("lf2", 1L) + isv("lf3", 1L))
        .withColumn("v0", isv("lf1", 0L) + isv("lf2", 0L) + isv("lf3", 0L))
        .withColumn("maj",
          when(col("v1") > col("v0"), 1L).when(col("v0") > col("v1"), 0L))
      maj.select(col("maj"), explode(array(
          struct(lit("lf_keyword").as("lf"), col("lf1").as("v")),
          struct(lit("lf_length").as("lf"), col("lf2").as("v")),
          struct(lit("lf_meanlen").as("lf"), col("lf3").as("v")))).as("x"))
        .select(col("x.lf").as("lf"), col("x.v").as("v"), col("maj"))
        .groupBy("lf")
        .agg(count(lit(1)).as("n_docs"),
          count(col("v")).as("n_votes"),
          sum(when(col("v") === col("maj"), 1L).otherwise(0L)).as("n_agree"),
          sum(when(col("v").isNotNull && col("maj").isNotNull &&
              col("v") =!= col("maj"), 1L).otherwise(0L)).as("n_conflict"),
          sum(when(col("v").isNotNull && col("maj").isNotNull, 1L)
            .otherwise(0L)).as("n_lab"))
        .select(col("lf"), col("n_docs"), col("n_votes"),
          expr("n_votes * 1000000 div n_docs").as("coverage_e6"),
          col("n_agree"), col("n_conflict"),
          when(col("n_lab") > 0L, expr("n_agree * 1000000 div n_lab"))
            .otherwise(0L).as("agree_e6"))
    }),

    // Margin-ratio pair scoring (Artetxe & Schwenk ACL 2019) — the
    // published bitext-mining acceptance criterion on top of the
    // q321/q347 candidate stage: cos(x,y) against the mean of each
    // side's top-4 in-cell neighborhood, accepted when the ratio
    // exceeds 1.0 (hubs score ~1 and drop; isolated true matches score
    // above). Exact e6-integer replay; corpus-scaled (cell, bin)
    // groups; see Similarity.marginRatio for the scale notes.
    "q352_margin_ratio" -> ((s, d) => {
      Similarity.marginRatio(t(s, d, "embeddings"), 200L, 4)
        .where(col("margin_e6") >= 1000000L)
    }),

    // TrustRank (Gyöngyi et al. 2004) over the LSH near-dup graph:
    // personalized PageRank with the restart mass pinned to a trusted
    // seed set (doc_id < 20) — the seeded quality-propagation pass a web
    // corpus curator runs to score unlabeled pages by proximity to
    // vetted ones. Three power-iteration rounds replayed entirely in e6
    // integer micro-units with trunc divisions (the q292/q132
    // convention), so a SQL oracle unrolls every round bit-for-bit.
    // Scale shape: each round is one edge-keyed join + groupBy (fan-in
    // = degree) against the persisted seed frame; nothing global, no
    // driver-side state.
    "q324_trustrank" -> ((s, d) => {
      val pairs = Dedup.lshCandidatePairs(
        t(s, d, "documents").where(col("doc_id") < 300), "doc_id", "text")
      val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
        .persist() // degree count + one probe per iteration round
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val nodes = deg.select(col("src").as("node"), col("deg"),
        (col("src") < 20L).as("is_seed"))
      val nSeeds = nodes.agg(
        sum(when(col("is_seed"), 1L).otherwise(0L)).as("ns"))
      val seedBase = nodes.crossJoin(broadcast(nSeeds))
        .select(col("node"), col("deg"), col("is_seed"),
          when(col("is_seed"), expr("1000000 div ns")).otherwise(0L)
            .as("s_e6"))
        .persist() // restart vector re-read every round + final join
      var v = seedBase.select(col("node"), col("s_e6").as("v_e6"))
      for (_ <- 1 to 3) {
        val inflow = edges
          .join(v, col("src") === col("node"))
          .join(deg, "src")
          .select(col("dst"), expr("v_e6 div deg").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("inflow"))
        v = seedBase.join(inflow, col("node") === col("dst"), "left")
          .na.fill(0L, Seq("inflow"))
          .select(col("node"),
            expr("(15 * s_e6) div 100 + (85 * inflow) div 100").as("v_e6"))
          // generation cut (q132/q185 lesson): without it each round
          // re-plans the accumulated lineage and the LSH pair subtree
          // dominates — measured 18.6 s → expected ~2 s at sf1 where the
          // doc_id<300 graph itself is constant-size
          .localCheckpoint(true)
      }
      seedBase
        .join(v.withColumnRenamed("v_e6", "trust_e6"), Seq("node"))
        .select(col("node").as("doc_id"), col("deg"), col("is_seed"),
          col("trust_e6"))
    }),

    // UMass topic coherence (Mimno et al. 2011) of each source's top-5
    // document-frequency terms: Σ_{l<m} ln((D(w_m,w_l)+1)/D(w_l)) over
    // the rank-ordered pairs — the intrinsic "do these terms co-occur"
    // readout a topic/cluster pipeline runs on its keyword lists (q313
    // RAKE, q83 TF-IDF). Each pair's log term is e9-floored BEFORE the
    // sum (the q278 rule), so the aggregate is merge-order-free. Scale
    // shape: doc-frequency is one groupBy; the top-k window keys per
    // source; the co-document self-join runs only over docs' TOP-TERM
    // postings (left_semi prefilter), with fan-in ≤ k per doc.
    "q326_umass_coherence" -> ((s, d) => {
      val dt = t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(col("text"))))
            .as("term"))
        .persist() // df counts + the co-doc self-join both read it
      val dfr = dt.groupBy("source", "term").agg(count(lit(1)).as("df"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("df"), asc("term"))
      val top = dfr.withColumn("rk", row_number().over(wR).cast("long"))
        .where(col("rk") <= 5)
        .persist() // pair frame (twice) + postings prefilter
      val dtop = dt.join(top.select("source", "term"),
        Seq("source", "term"), "left_semi")
      val co = dtop.select(col("source"), col("doc_id"), col("term").as("t1"))
        .join(dtop.select(col("source"), col("doc_id"), col("term").as("t2")),
          Seq("source", "doc_id"))
        .where(col("t1") < col("t2"))
        .groupBy("source", "t1", "t2").agg(count(lit(1)).as("d12"))
      val lo = top.select(col("source"), col("term").as("wl"),
        col("rk").as("l"), col("df").as("dfl"))
      val hi = top.select(col("source"), col("term").as("wm"),
        col("rk").as("m"))
      lo.join(hi, "source").where(col("l") < col("m"))
        .withColumn("t1", least(col("wl"), col("wm")))
        .withColumn("t2", greatest(col("wl"), col("wm")))
        .join(co, Seq("source", "t1", "t2"), "left")
        .na.fill(0L, Seq("d12"))
        .select(col("source"),
          floor(log((col("d12") + lit(1L)).cast("double") /
            col("dfl").cast("double")) * 1e9).cast("long").as("term_e9"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_pairs"), sum("term_e9").as("coherence_e9"))
    }),

    // Burrows' Delta (2002) stylometric distance between every source
    // pair: per-source relative frequencies of the corpus top-20 terms,
    // z-scored per term across sources, delta = Σ_t |z_a − z_b| — and
    // since the per-term mean cancels in the difference, each term
    // contributes |f_a − f_b|/σ_t directly. Frequencies are exact e6
    // integer shares, σ² is the exact integer moment chain
    // (n·Σf²−(Σf)²)/n², and each term's contribution is floored to e6
    // BEFORE the sum (merge-order-free, the q278 rule). The
    // authorship/provenance-attribution readout over q83's TF machinery.
    // Scale shape: one corpus token scan; everything after runs on the
    // #sources × 20 grid with the top-term and per-source-total frames
    // broadcast — the pair join fan-in is #sources per term, not rows.
    "q328_burrows_delta" -> ((s, d) => {
      val tok = t(s, d, "documents").select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val st = tok.groupBy("source", "term").agg(count(lit(1)).as("c"))
        .persist() // source totals + top-term probe both read it
      val srcTot = st.groupBy("source").agg(sum("c").as("tot"))
      val top = st.groupBy("term").agg(sum("c").as("gc"))
        .orderBy(desc("gc"), asc("term")).limit(20)
      val f = st.join(broadcast(top.select("term")), "term")
        .join(broadcast(srcTot), "source")
        .select(col("source"), col("term"),
          expr("(c * 1000000) div tot").as("f_e6"))
      val grid = srcTot.select("source")
        .crossJoin(broadcast(top.select("term")))
        .join(f, Seq("source", "term"), "left")
        .na.fill(0L, Seq("f_e6"))
        .persist() // per-term moments + both pair sides read it
      val sigma = grid.groupBy("term").agg(count(lit(1)).as("ns"),
          sum("f_e6").as("sf"), sum(col("f_e6") * col("f_e6")).as("sff"))
        .select(col("term"),
          ((col("ns") * col("sff") - col("sf") * col("sf")).cast("double") /
            (col("ns") * col("ns")).cast("double")).as("v"))
        .where(col("v") > 0.0)
      val a = grid.select(col("source").as("src_a"), col("term"),
        col("f_e6").as("fa"))
      val b = grid.select(col("source").as("src_b"), col("term"),
        col("f_e6").as("fb"))
      a.join(b, "term").where(col("src_a") < col("src_b"))
        .join(broadcast(sigma), "term")
        .select(col("src_a"), col("src_b"),
          floor(abs(col("fa") - col("fb")).cast("double") / sqrt(col("v"))
            * 1e6).cast("long").as("t_e6"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_terms"), sum("t_e6").as("delta_sum_e6"))
    }),

    // word2vec-style negative sampling (Mikolov et al. 2013) with an
    // exact integer cumulative table: unigram weights c^(3/4) computed
    // as floor(sqrt(c·sqrt(c))·1000) — sqrt is IEEE-CORRECTLY-ROUNDED
    // in both engines (pow/exp/ln are not), so the 3/4 power carries no
    // libm knife edge — cumulative [lo, hi) ranges built with the
    // distributed PrefixScan (no single-partition window over the
    // vocab), and each (doc, pos, j) draw mapped into the table by a
    // 60-bit md5 hash mod total weight: seeded, reproducible, and
    // SQL-replayable. Output: per-term draw counts vs target weight,
    // the sampler's empirical-vs-target readout. Scale shape: one token
    // scan, the PrefixScan two-phase ranged cumsum, and an EQUI-join
    // probe: the cumulative axis is cut into fixed-stride cells, each
    // [lo, hi) range explodes onto the cells it spans (wtot/stride + V
    // rows, still broadcast-sized), a draw hashes to cell h div stride,
    // and the range check is a post-filter on the hash-joined cell — a
    // BroadcastHashJoin, not the O(draws x vocab) nested-loop probe the
    // raw range predicate would plan. Draws never shuffle.
    "q331_negative_sampling" -> ((s, d) => {
      val stride = 1000000L // ~1k tokens' weight per cell
      val tok = t(s, d, "documents").select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
      val vocab = tok.groupBy("term").agg(count(lit(1)).as("c"))
        .withColumn("w", floor(sqrt(col("c").cast("double") *
          sqrt(col("c").cast("double"))) * 1000).cast("long"))
      val ranges = graft.operators.PrefixScan.scanLong(
          vocab, "hi", "w", "sum", inclusive = true, asc("term"))
        .withColumn("lo", col("hi") - col("w"))
      val tot = ranges.agg(max("hi").as("wtot"))
      val cells = ranges.where(col("w") > 0)
        .select(col("term").as("neg"), col("lo"), col("hi"), col("w"),
          explode(sequence(expr(s"lo div $stride"),
            expr(s"(hi - 1) div $stride"))).as("cell"))
      val draws = tok.where(col("pos") < 5)
        .withColumn("j", explode(array(lit(1L), lit(2L))))
        .crossJoin(broadcast(tot))
        .withColumn("h", pmod(TextFunctions.hash60(
          concat_ws(":", col("doc_id"), col("pos"), col("j"))), col("wtot")))
        .withColumn("cell", expr(s"h div $stride"))
      draws.join(broadcast(cells), "cell")
        .where(col("h") >= col("lo") && col("h") < col("hi"))
        .groupBy("neg", "w").agg(count(lit(1)).as("n_draws"))
    }),

    // Good–Turing count re-estimation (the classical LM smoother next
    // to q258's Kneser–Ney): adjusted count c* = (c+1)·N_{c+1}/N_c from
    // the count-of-counts table, reported for c ≤ 5 where the estimator
    // is meaningful — exact e6 integer division, the N_{c+1} lookup is
    // a self-join on the tiny count-of-counts frame. Scale shape: one
    // token groupBy, one count-of-counts groupBy (domain = distinct
    // counts), one keyed join on that bounded frame.
    "q333_good_turing" -> ((s, d) => {
      val tc = t(s, d, "documents")
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
      val coc = tc.groupBy("c").agg(count(lit(1)).as("n_c"))
      val next = coc.select((col("c") - 1L).as("c"), col("n_c").as("n_c1"))
      coc.join(next, Seq("c"), "left")
        .where(col("c") <= 5)
        .withColumn("n_c1", coalesce(col("n_c1"), lit(0L)))
        .select(col("c"), col("n_c"), col("n_c1"),
          expr("((c + 1) * n_c1 * 1000000) div n_c").as("c_star_e6"))
    }),

    // Brier reliability bins — q164's calibration table upgraded with
    // the forecast mean, the calibration gap, and the per-bin Brier
    // contribution: forecast p = (emb[0]+1)/2 in e3 milli-units (the
    // per-row squared error (p−o)² then fits int64 to ~10¹² rows),
    // outcome = label parity, deciles of p. f̄, ō, and the gap are
    // trunc e3 integer divisions; the Brier sum is an exact integer.
    // One map-side-combinable groupBy — nothing wider than 10 bins.
    "q334_brier_bins" -> ((s, d) => {
      val p = expr("""greatest(0L, least(1000L,
        cast(floor((CAST(embedding[0] AS DOUBLE) + 1.0) / 2.0 * 1000) as bigint)))""")
      t(s, d, "embeddings")
        .select(p.as("p_e3"), (col("label") % 2 === 1).as("pos"))
        .withColumn("o_e3", when(col("pos"), 1000L).otherwise(0L))
        .groupBy(expr("least(p_e3 div 100, 9L)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum("p_e3").as("sp_e3"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum((col("p_e3") - col("o_e3")) * (col("p_e3") - col("o_e3")))
            .as("brier_sum_e6"))
        .select(col("bucket"), col("n"), col("sp_e3"), col("n_pos"),
          expr("sp_e3 div n").as("fbar_e3"),
          expr("(n_pos * 1000) div n").as("obar_e3"),
          expr("sp_e3 div n - (n_pos * 1000) div n").as("gap_e3"),
          col("brier_sum_e6"))
    }),

    // ROC curve points at decile thresholds — the curve behind q155's
    // scalar AUC: score-bucket the corpus once, then TP/FP at each cut
    // are descending cumulative sums over the 11-row bucket frame (a
    // deliberately bounded single-partition window, like every ≤100-row
    // top-k form here), with TPR/FPR as exact e6 divisions against the
    // broadcast class totals. One groupBy shuffles; the sweep itself
    // touches 11 rows.
    "q337_roc_points" -> ((s, d) => {
      val per = t(s, d, "embeddings")
        .select(expr("""cast(floor((CAST(embedding[0] AS DOUBLE) + 1.0)
            / 2.0 * 10) as bigint)""").as("bkt"),
          (col("label") % 2 === 1).as("pos"))
        .groupBy("bkt")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
      val tot = per.agg(sum("np").as("p_tot"), sum("nn").as("n_tot"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(desc("bkt"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      per.withColumn("tp", sum("np").over(w))
        .withColumn("fp", sum("nn").over(w))
        .crossJoin(broadcast(tot))
        .select(col("bkt").as("threshold_bkt"), col("tp"), col("fp"),
          expr("(tp * 1000000) div p_tot").as("tpr_e6"),
          expr("(fp * 1000000) div n_tot").as("fpr_e6"))
    }))

  // ---- oracle SQL ----

  /** NLL CTE chain over a relation `rel` exposing (doc_id, w): tok →
    * uni → tot → j → agg → nll(doc_id, n_tok, avg_nll_e6). Mirror of
    * `Mixture.docNll` (pinned position-order IEEE fold).
    */
  private def nllChain(rel: String): String =
    s"""tok AS (
           SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
             unnest(w) AS term
           FROM $rel),
         uni AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens_total FROM uni),
         j AS (
           SELECT doc_id, pos,
             ln(CAST(n_tokens_total AS DOUBLE) / c) AS lnp
           FROM tok JOIN uni USING (term), tot),
         agg AS (
           SELECT doc_id, count(*) AS n_tok, list(lnp ORDER BY pos) AS ls
           FROM j GROUP BY 1),
         nll AS (
           SELECT doc_id, n_tok,
             CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ls),
               (acc, x) -> acc + x) / n_tok * 1000000.0) AS BIGINT) AS avg_nll_e6
           FROM agg)"""

  /** Shared oracle CTEs for the per-doc unigram NLL over the whole
    * documents table (q127, q198, q249).
    */
  private val nllCtes: String =
    s"""dw0 AS (SELECT doc_id, string_split(lower(text), ' ') AS w
               FROM documents),
         ${nllChain("dw0")}"""

  /** Per-doc unigram-LM negative log likelihood (q127's score; also the
    * input to the q198 CCNet partition): NLL terms are summed in pinned
    * position order (collect_list sorted by pos) so the IEEE fold matches
    * the oracle's ORDER BY pos list fold exactly.
    */
  private def docNll(s: SparkSession, d: String): DataFrame =
    graft.operators.Mixture.docNll(t(s, d, "documents"))

  private def hitsSql(words: Seq[String]) = {
    val list = words.map(w => s"'$w'").mkString("[", ",", "]")
    s"len(list_filter(string_split(lower(text), ' '), t -> list_contains($list, t)))"
  }

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  /** 60-bit md5 hash of a SQL string expression (mirror of hash60). */
  private def h60(e: String) = s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  private def dotSql(a: String, b: String): String =
    (1 to Similarity.Dim).map(i =>
      s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))").mkString(" + ")

  /** Unrolled INTEGER squared-L2 between two BIGINT list columns —
    * exact, so any association order agrees with Spark's zip_with fold.
    */
  private def il2Sql(a: String, b: String, n: Int): String =
    (1 to n).map(i => s"(($a[$i] - $b[$i]) * ($a[$i] - $b[$i]))")
      .mkString(" + ")

  /** Full PQ replay — codebook training (one integer Lloyd round from
    * the vec_id % 16 seeding), code assignment, per-query ADC lookup
    * sums, and the exact integer-L2 brute-force hit check. Mirrors
    * Similarity.pqTopK + q263 bit for bit.
    */
  private def pqOracle: String =
    s"""WITH ve AS MATERIALIZED (
         SELECT vec_id, list_transform(embedding,
           v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS ve
         FROM embeddings),
       flat AS (
         SELECT vec_id, (dim - 1) // 16 AS b, (dim - 1) % 16 AS bd, v,
           vec_id % 16 AS c0
         FROM (SELECT vec_id, unnest(ve) AS v,
                 generate_subscripts(ve, 1) AS dim FROM ve)),
       cm AS (
         SELECT b, c0 AS c, bd, CAST(sum(v) AS BIGINT) // count(*) AS cv
         FROM flat GROUP BY 1, 2, 3),
       centv AS (SELECT b, c, list(cv ORDER BY bd) AS ce FROM cm GROUP BY 1, 2),
       bvs AS MATERIALIZED (
         SELECT vec_id, b, list(v ORDER BY bd) AS bv FROM flat GROUP BY 1, 2),
       asg AS (
         SELECT vec_id, b, c FROM (
           SELECT bvs.vec_id, bvs.b, cv.c,
             row_number() OVER (PARTITION BY bvs.vec_id, bvs.b
               ORDER BY ${il2Sql("bv", "ce", 16)}, cv.c) AS rn
           FROM bvs JOIN centv cv USING (b)) WHERE rn = 1),
       lut AS (
         SELECT q.vec_id AS query_id, q.b, cv.c,
           ${il2Sql("q.bv", "cv.ce", 16)} AS dd
         FROM bvs q JOIN centv cv USING (b) WHERE q.vec_id IN (100, 200)),
       adc AS (
         SELECT l.query_id, a.vec_id, CAST(sum(l.dd) AS BIGINT) AS adc_dist
         FROM asg a JOIN lut l ON a.b = l.b AND a.c = l.c
           AND a.vec_id <> l.query_id
         GROUP BY 1, 2),
       topk AS (
         SELECT query_id, vec_id AS neighbor_id, rnk, adc_dist FROM (
           SELECT query_id, vec_id, adc_dist,
             row_number() OVER (PARTITION BY query_id
               ORDER BY adc_dist, vec_id) AS rnk
           FROM adc) WHERE rnk <= 10),
       q2 AS (SELECT vec_id AS query_id, ve AS qve FROM ve
              WHERE vec_id IN (100, 200)),
       bf AS (
         SELECT query_id, vec_id FROM (
           SELECT q2.query_id, ve.vec_id,
             row_number() OVER (PARTITION BY q2.query_id
               ORDER BY ${il2Sql("ve.ve", "q2.qve", 64)}, ve.vec_id) AS rn
           FROM ve, q2 WHERE ve.vec_id <> q2.query_id) WHERE rn <= 10)
       SELECT t.query_id, t.neighbor_id, t.rnk, t.adc_dist,
         bf.vec_id IS NOT NULL AS exact_hit
       FROM topk t LEFT JOIN bf ON bf.query_id = t.query_id
         AND bf.vec_id = t.neighbor_id"""

  /** Integer dot product of floor(x*64)-quantized vectors (q160): BIGINT
    * products summed — exact, so any association order matches Spark's
    * zip_with/aggregate loop.
    */
  private def iDotSql(a: String, b: String): String =
    (1 to Similarity.Dim).map(i =>
      s"(CAST(floor(CAST($a[$i] AS DOUBLE) * 64) AS BIGINT)" +
        s" * CAST(floor(CAST($b[$i] AS DOUBLE) * 64) AS BIGINT))")
      .mkString(" + ")

  /** Shared CTE prelude (toks -> bands) of the MinHash oracles. */
  private def minhashCtes: String = minhashCtesFor("doc_id < 300")

  /** The MinHash band prelude over a parameterized doc population —
    * `minhashCtes` (doc_id < 300) is the shared graph-query instance;
    * q259 probes the full population split into corpus and batch.
    */
  private def minhashCtesFor(pred: String): String = {
    val p = Dedup.MinHashParams()
    val sigs = (0 until p.numPerms).map { i =>
      val a = 2L * i + 1; val b = 98765L * i + 12345L
      s"list_min(list_transform(hs, x -> (x * $a + $b) % ${p.prime})) AS sig$i"
    }.mkString(",\n             ")
    val rows = p.numPerms / p.bands
    val bandSelects = (0 until p.bands).map { bnd =>
      val key = (0 until rows).map(r => s"sig${bnd * rows + r}").mkString(", '_', ")
      s"SELECT doc_id, $bnd AS band, concat($key) AS key FROM sig"
    }.mkString("\n           UNION ALL ")
    s"""toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS w
           FROM documents WHERE $pred),
         sh AS (
           SELECT doc_id,
             list_transform(range(1, len(w) - 1),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2])) AS shingles
           FROM toks WHERE len(w) >= ${p.shingleSize}),
         base AS (
           SELECT doc_id,
             list_transform(shingles, s -> ${h60("s")} % ${p.baseMod}) AS hs
           FROM sh),
         sig AS (
           SELECT doc_id,
             $sigs
           FROM base),
         bands AS (
           $bandSelects)"""
  }

  private def minhashOracle: String =
    s"""WITH $minhashCtes
         SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""

  /** Components of the LSH pair graph via recursive transitive closure:
    * rep = least reachable id. Mirrors Dedup.connectedComponents exactly
    * (both compute the component minimum).
    */
  /** Shared connected-components closure CTEs (pairs -> edges -> reach ->
    * rep) over the MinHash band prelude — one definition feeding the
    * dedup-keep and cluster-size oracles so closure semantics cannot
    * drift between them (the minhashCtes pattern).
    */
  private def componentCtes: String =
    s"""pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION SELECT id2, id1 FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e
             ON r.dst = e.src WHERE e.dst <> r.src),
         rep AS (
           SELECT src AS doc_id, least(src, min(dst)) AS rep_id
           FROM reach GROUP BY src)"""

  private def dedupKeepOracle: String =
    s"""WITH RECURSIVE $minhashCtes,
         $componentCtes
       SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id,
         coalesce(r.rep_id, d.doc_id) = d.doc_id AS is_kept
       FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
       LEFT JOIN rep r USING (doc_id)"""

  private def simhashOracle: String =
    s"""SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 60), j ->
           (CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) % 2) * 2 - 1)) > 0
                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) << j)) AS BIGINT) AS sim
       FROM (
         SELECT doc_id,
           list_transform(string_split(lower(text), ' '), t -> ${h60("t")}) AS hs
         FROM documents WHERE doc_id < 300)"""

  /** q193's oracle: replay the 8 BPE training rounds in SQL. Each round =
    * argmax pair (freq-weighted, (cnt desc, l, r) tiebreak — the trainer's
    * exact order) + greedy left-to-right merge done POSITIONALLY: for
    * l ≠ r adjacent candidates never overlap, so all merge; for l = r a
    * run of k identical tokens merges at the 1st, 3rd, … candidate — the
    * run-parity rule (row_number within the gaps-and-islands group must
    * be odd), which is exactly what the greedy fold produces.
    */
  private def bpeEncodeOracle: String = {
    val rounds = 8
    def round(i: Int): String = {
      val prev = s"v${i - 1}"
      s"""p$i AS MATERIALIZED (
         SELECT l, r FROM (
           SELECT tl[j] AS l, tl[j + 1] AS r, CAST(sum(f) AS BIGINT) AS cnt
           FROM (SELECT f, tl, unnest(range(1, len(tl))) AS j FROM $prev)
           GROUP BY 1, 2)
         ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
       c$i AS MATERIALIZED (
         SELECT w, f, pos, tok,
           (tok = (SELECT l FROM p$i) AND
            lead(tok) OVER (PARTITION BY w ORDER BY pos)
              = (SELECT r FROM p$i)) AS cand
         FROM (SELECT w, f, j AS pos, tl[j] AS tok
               FROM (SELECT w, f, tl, unnest(range(1, len(tl) + 1)) AS j
                     FROM $prev))),
       s$i AS (
         SELECT w, pos,
           (row_number() OVER (PARTITION BY w, isl ORDER BY pos) % 2 = 1) AS sel
         FROM (
           SELECT w, pos,
             pos - row_number() OVER (PARTITION BY w ORDER BY pos) AS isl
           FROM c$i WHERE cand)),
       m$i AS (
         SELECT c.w, c.f, c.pos, c.tok, coalesce(s.sel, FALSE) AS sel,
           coalesce(lag(coalesce(s.sel, FALSE))
             OVER (PARTITION BY c.w ORDER BY c.pos), FALSE) AS prev_sel
         FROM c$i c LEFT JOIN s$i s ON c.w = s.w AND c.pos = s.pos),
       v$i AS MATERIALIZED (
         SELECT w, f,
           list(CASE WHEN sel THEN tok || (SELECT r FROM p$i) ELSE tok END
                ORDER BY pos) FILTER (WHERE NOT prev_sel) AS tl
         FROM m$i GROUP BY w, f)"""
    }
    s"""WITH words AS MATERIALIZED (
         SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         FROM documents),
       vocab AS MATERIALIZED (SELECT w, count(*) AS f FROM words GROUP BY 1),
       v0 AS MATERIALIZED (
         SELECT w, f, list_transform(range(1, length(w) + 1),
           i -> substr(w, CAST(i AS INT), 1)) AS tl
         FROM vocab),
       ${(1 to rounds).map(round).mkString(",\n       ")},
       wt AS (SELECT w, len(tl) AS ntok FROM v$rounds)
       SELECT doc_id, count(*) AS n_words,
         CAST(sum(ntok) AS BIGINT) AS n_tokens,
         CAST(max(ntok) AS BIGINT) AS max_word_toks
       FROM words JOIN wt USING (w) GROUP BY 1"""
  }

  private def cosineTopkOracle: String =
    s"""WITH q AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         c AS (
           SELECT q.query_id, e.vec_id,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         r AS (
           SELECT query_id, vec_id AS neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rnk
           FROM c)
         SELECT query_id, neighbor_id, rnk,
           CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
         FROM r WHERE rnk <= 10"""

  private def annLshOracle: String =
    s"""WITH b AS (
           SELECT e.vec_id,
             sum(CASE WHEN (${dotSql("e.embedding", "p.embedding")}) > 0
                 THEN (CAST(1 AS BIGINT) << CAST(p.vec_id AS INT)) ELSE 0 END) AS bucket
           FROM embeddings e, embeddings p WHERE p.vec_id < 8
           GROUP BY e.vec_id),
         q AS (
           SELECT e.vec_id AS query_id, e.embedding AS qemb, b.bucket AS qbucket
           FROM embeddings e JOIN b ON e.vec_id = b.vec_id
           WHERE e.vec_id IN (100, 200)),
         c AS (
           SELECT q.query_id, e.vec_id,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e JOIN b ON e.vec_id = b.vec_id
           JOIN q ON b.bucket = q.qbucket AND e.vec_id <> q.query_id),
         r AS (
           SELECT query_id, vec_id AS neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rnk
           FROM c)
         SELECT query_id, neighbor_id, rnk,
           CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
         FROM r WHERE rnk <= 10"""

  /** IVF ANN oracle: centroid codebook, nearest-cell assignment, 2-probe
    * search — all via the explicit 64-term dot chains.
    */
  private def ivfOracle: String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         qc AS (
           SELECT query_id, qemb, cell FROM (
             SELECT e.vec_id AS query_id, e.embedding AS qemb, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c WHERE e.vec_id IN (100, 200)) WHERE rn <= 2),
         cand AS (
           SELECT q.query_id, e.vec_id, ${cos("e.embedding", "q.qemb")} AS cos
           FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
           JOIN qc q ON a.cell = q.cell AND e.vec_id <> q.query_id),
         r AS (
           SELECT query_id, vec_id AS neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rnk
           FROM cand)
         SELECT query_id, neighbor_id, rnk,
           CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
         FROM r WHERE rnk <= 10"""
  }

  /** Mutual-NN oracle: the q98 IVF centroid/assignment replay, then the
    * within-cell pairwise top-1 and the reciprocity filter — mirrors
    * Similarity.mutualTop1 stage for stage.
    */
  private def mutualNnOracle: String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         wc AS MATERIALIZED (
           SELECT e.vec_id, e.embedding, a.cell
           FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         scored AS (
           SELECT x.cell, x.vec_id, y.vec_id AS nid,
             ${cos("x.embedding", "y.embedding")} AS cos
           FROM wc x JOIN wc y
             ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         top1 AS MATERIALIZED (
           SELECT cell, vec_id, nid,
             CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, nid ASC) AS rn
                 FROM scored)
           WHERE rn = 1)
         SELECT t.cell, t.vec_id AS id_a, t.nid AS id_b, t.cos_e6
         FROM top1 t JOIN top1 r ON r.vec_id = t.nid AND r.nid = t.vec_id
         WHERE t.vec_id < t.nid"""
  }

  /** q347: the mutual-NN replay with the corpus-scaled bin refinement —
    * cells are (IVF label, first-coordinate bin), nb = max(1,
    * n/(10·target)); DuckDB lists are 1-based so embedding[1] mirrors
    * Spark's embedding[0].
    */
  private def mutualNnScaledOracle(target: Long): String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    val nb = s"greatest(1, (SELECT count(*) FROM embeddings) // (10 * $target))"
    s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         wc AS MATERIALIZED (
           SELECT e.vec_id, e.embedding, a.cell,
             least($nb - 1, greatest(0, CAST(floor(
               (CAST(e.embedding[1] AS DOUBLE) + 1.0) / 2.0 * $nb)
               AS BIGINT))) AS bin
           FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         scored AS (
           SELECT x.cell, x.bin, x.vec_id, y.vec_id AS nid,
             ${cos("x.embedding", "y.embedding")} AS cos
           FROM wc x JOIN wc y
             ON x.cell = y.cell AND x.bin = y.bin AND x.vec_id <> y.vec_id),
         top1 AS MATERIALIZED (
           SELECT cell, bin, vec_id, nid,
             CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, nid ASC) AS rn
                 FROM scored)
           WHERE rn = 1)
         SELECT t.cell, t.bin, t.vec_id AS id_a, t.nid AS id_b, t.cos_e6
         FROM top1 t JOIN top1 r ON r.vec_id = t.nid AND r.nid = t.vec_id
         WHERE t.vec_id < t.nid"""
  }

  /** q348: the in-cell pair replay with per-anchor same-label and
    * different-label top-1 picks and the margin. Cells carry the
    * corpus-scaled first-coordinate bin (mutualNnScaledOracle's nb
    * scheme) mirroring Similarity.hardNegatives.
    */
  private def hardNegativesOracle(target: Long): String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    val nb = s"greatest(1, (SELECT count(*) FROM embeddings) // (10 * $target))"
    s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         wc AS MATERIALIZED (
           SELECT e.vec_id, e.label, e.embedding, a.cell,
             least($nb - 1, greatest(0, CAST(floor(
               (CAST(e.embedding[1] AS DOUBLE) + 1.0) / 2.0 * $nb)
               AS BIGINT))) AS bin
           FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         scored AS MATERIALIZED (
           SELECT x.vec_id, x.label, y.vec_id AS nid, y.label AS nlabel,
             ${cos("x.embedding", "y.embedding")} AS cos
           FROM wc x JOIN wc y
             ON x.cell = y.cell AND x.bin = y.bin AND x.vec_id <> y.vec_id),
         pos AS (
           SELECT vec_id, nid AS pos_id,
             CAST(floor(cos * 1000000.0) AS BIGINT) AS pos_cos_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, nid ASC) AS rn
                 FROM scored WHERE nlabel = label)
           WHERE rn = 1),
         neg AS (
           SELECT vec_id, nid AS neg_id,
             CAST(floor(cos * 1000000.0) AS BIGINT) AS neg_cos_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos DESC, nid ASC) AS rn
                 FROM scored WHERE nlabel <> label)
           WHERE rn = 1)
         SELECT vec_id, pos_id, pos_cos_e6, neg_id, neg_cos_e6,
           pos_cos_e6 - neg_cos_e6 AS margin_e6
         FROM pos JOIN neg USING (vec_id)"""
  }

  /** q354: the (cell, bin) occupancy replay — populations, skew, and
    * the exact pair workload Σ pop·(pop−1).
    */
  private def cellBalanceOracle: String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    val nb = "greatest(1, (SELECT count(*) FROM embeddings) // 2000)"
    s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         pops AS (
           SELECT a.cell,
             least($nb - 1, greatest(0, CAST(floor(
               (CAST(e.embedding[1] AS DOUBLE) + 1.0) / 2.0 * $nb)
               AS BIGINT))) AS bin,
             count(*) AS pop
           FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
           GROUP BY 1, 2),
         agg AS (
           SELECT CAST(sum(pop) AS BIGINT) AS n_total,
             count(*) AS n_groups,
             CAST(max(pop) AS BIGINT) AS max_pop,
             CAST(sum(pop * (pop - 1)) AS BIGINT) AS pair_work
           FROM pops)
         SELECT n_total, n_groups, max_pop,
           n_total // n_groups AS avg_pop,
           max_pop * 1000 // (n_total // n_groups) AS skew_e3,
           pair_work
         FROM agg"""
  }

  /** q350's oracle, shared verbatim with q378's provenance rollup. */
  private def rrfFusionOracle: String =
    s"""WITH qd AS (
           SELECT doc_id AS query_id,
             list_distinct(string_split(lower(text), ' ')) AS qtok
           FROM documents WHERE doc_id IN (10, 20, 30)),
         cd AS (
           SELECT doc_id AS cand_id,
             list_distinct(string_split(lower(text), ' ')) AS ctok
           FROM documents),
         sp0 AS (
           SELECT query_id, cand_id,
             CAST(len(list_intersect(ctok, qtok)) AS BIGINT) AS ov
           FROM qd, cd WHERE cand_id <> query_id),
         sp AS (
           SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ov DESC, cand_id) AS r_sparse
           FROM sp0 WHERE ov >= 1
           QUALIFY r_sparse <= 50),
         q AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         dn0 AS (
           SELECT q.query_id, e.vec_id AS cand_id,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         dn AS (
           SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS r_dense
           FROM dn0 QUALIFY r_dense <= 50),
         f AS (
           SELECT coalesce(dn.query_id, sp.query_id) AS query_id,
             coalesce(dn.cand_id, sp.cand_id) AS cand_id,
             CAST(dn.r_dense AS BIGINT) AS r_dense,
             CAST(sp.r_sparse AS BIGINT) AS r_sparse
           FROM dn FULL OUTER JOIN sp
             ON dn.query_id = sp.query_id AND dn.cand_id = sp.cand_id),
         g AS (
           SELECT query_id, cand_id, r_dense, r_sparse,
             coalesce(1000000 // (60 + r_dense), 0)
               + coalesce(1000000 // (60 + r_sparse), 0) AS rrf_e6
           FROM f)
         SELECT query_id, cand_id, r_dense, r_sparse,
           CAST(rrf_e6 AS BIGINT) AS rrf_e6,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e6 DESC, cand_id) AS BIGINT)
             AS pos
         FROM g
         QUALIFY pos <= 10"""

  /** q383: the JL projection replay — ±1 signs from md5('jl:i:j')
    * literals (constant-folded both engines), quantized-e6 vectors,
    * corpus-scaled (cell, bin) pairs, exact integer squared distances.
    */
  private def jlDistortionOracle: String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    val nb = "greatest(1, (SELECT count(*) FROM embeddings) // 2000)"
    val projCols = (0 until 16).map { j =>
      val terms = (0 until 64).map { i =>
        val h = s"CAST(concat('0x', substr(md5('jl:$i:$j'), 1, 15)) AS BIGINT)"
        s"(CASE WHEN $h % 2 = 0 THEN ve[${i + 1}] ELSE -ve[${i + 1}] END)"
      }.mkString(" + ")
      s"($terms) AS p$j"
    }.mkString(",\n             ")
    val dp2 = (0 until 16)
      .map(j => s"(a.p$j - b.p$j) * (a.p$j - b.p$j)").mkString(" + ")
    s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         vq AS (
           SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS ve
           FROM embeddings),
         pr AS MATERIALIZED (
           SELECT vq.vec_id, vq.ve, a.cell,
             least($nb - 1, greatest(0, CAST(floor(
               (CAST(vq.ve[1] AS DOUBLE) / 1000000.0 + 1.0) / 2.0 * $nb)
               AS BIGINT))) AS bin,
             $projCols
           FROM vq JOIN assign a ON vq.vec_id = a.vec_id),
         pairs AS (
           SELECT (${il2Sql("a.ve", "b.ve", 64)}) AS do2, ($dp2) AS dp2
           FROM pr a JOIN pr b
             ON a.cell = b.cell AND a.bin = b.bin AND a.vec_id < b.vec_id
             AND (a.vec_id + b.vec_id) % 4 = 0)
         SELECT (dp2 // 16) * 10 // do2 AS bkt, count(*) AS n_pairs
         FROM pairs WHERE do2 > 0
         GROUP BY 1"""
  }

  /** Shared margin-ratio CTE prelude (cent → assign → wc → pairs → hood)
    * — one definition feeding the q352 acceptance oracle and the q363
    * calibration oracle so the pair/neighborhood semantics cannot drift.
    */
  private def marginPairsCtes(target: Long, k: Int): String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    val nb = s"greatest(1, (SELECT count(*) FROM embeddings) // (10 * $target))"
    s"""cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         wc AS MATERIALIZED (
           SELECT e.vec_id, e.embedding, a.cell,
             least($nb - 1, greatest(0, CAST(floor(
               (CAST(e.embedding[1] AS DOUBLE) + 1.0) / 2.0 * $nb)
               AS BIGINT))) AS bin
           FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id),
         pairs AS MATERIALIZED (
           SELECT x.vec_id, y.vec_id AS nid,
             CAST(floor(${cos("x.embedding", "y.embedding")} * 1000000.0)
               AS BIGINT) AS cos_e6
           FROM wc x JOIN wc y
             ON x.cell = y.cell AND x.bin = y.bin AND x.vec_id <> y.vec_id),
         hood AS (
           SELECT vec_id, CAST(sum(cos_e6) // count(*) AS BIGINT) AS avg_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY cos_e6 DESC, nid ASC) AS rn
                 FROM pairs)
           WHERE rn <= $k GROUP BY vec_id),
         scored_pairs AS (
           SELECT p.vec_id AS id_a, p.nid AS id_b, p.cos_e6,
             ha.avg_e6 AS avg_a_e6, hb.avg_e6 AS avg_b_e6,
             CAST(p.cos_e6 * 2000000 // (ha.avg_e6 + hb.avg_e6) AS BIGINT)
               AS margin_e6
           FROM pairs p
           JOIN hood ha ON p.vec_id = ha.vec_id
           JOIN hood hb ON p.nid = hb.vec_id
           WHERE p.vec_id < p.nid AND p.cos_e6 >= 0
             AND ha.avg_e6 + hb.avg_e6 > 0)"""
  }

  private def marginRatioOracle(target: Long, k: Int): String =
    s"""WITH ${marginPairsCtes(target, k)}
         SELECT id_a, id_b, cos_e6, avg_a_e6, avg_b_e6, margin_e6
         FROM scored_pairs WHERE margin_e6 >= 1000000"""

  /** Recall@10 oracle: brute-force, LSH (8 planes) and IVF (2 probes)
    * top-10 chains — the same CTE shapes as q61/q62/q98's oracles, query
    * ids 100/200 — each ANN joined against brute force per neighbor.
    */
  private def annRecallOracle: String = {
    def cos(a: String, b: String) =
      s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    def recallSelect(method: String, annCte: String) =
      s"""SELECT '$method' AS method, bfr.query_id, count(*) AS k,
           CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // count(*) AS recall_e6
         FROM bfr LEFT JOIN $annCte l
           ON bfr.query_id = l.query_id AND bfr.neighbor_id = l.neighbor_id
         GROUP BY bfr.query_id"""
    s"""WITH b AS (
           SELECT e.vec_id,
             sum(CASE WHEN (${dotSql("e.embedding", "p.embedding")}) > 0
                 THEN (CAST(1 AS BIGINT) << CAST(p.vec_id AS INT)) ELSE 0 END) AS bucket
           FROM embeddings e, embeddings p WHERE p.vec_id < 8
           GROUP BY e.vec_id),
         q AS (
           SELECT e.vec_id AS query_id, e.embedding AS qemb, b.bucket AS qbucket
           FROM embeddings e JOIN b ON e.vec_id = b.vec_id
           WHERE e.vec_id IN (100, 200)),
         lshr AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 ${cos("e.embedding", "q.qemb")} DESC, e.vec_id ASC) AS rnk
             FROM embeddings e JOIN b ON e.vec_id = b.vec_id
             JOIN q ON b.bucket = q.qbucket AND e.vec_id <> q.query_id)
           WHERE rnk <= 10),
         cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         qc AS (
           SELECT query_id, qemb, cell FROM (
             SELECT e.vec_id AS query_id, e.embedding AS qemb, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.label ASC) AS rn
             FROM embeddings e, cent c WHERE e.vec_id IN (100, 200)) WHERE rn <= 2),
         ivfr AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT qq.query_id, e.vec_id,
               row_number() OVER (PARTITION BY qq.query_id ORDER BY
                 ${cos("e.embedding", "qq.qemb")} DESC, e.vec_id ASC) AS rnk
             FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
             JOIN qc qq ON a.cell = qq.cell AND e.vec_id <> qq.query_id)
           WHERE rnk <= 10),
         bfr AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 ${cos("e.embedding", "q.qemb")} DESC, e.vec_id ASC) AS rnk
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE rnk <= 10)
         ${recallSelect("lsh8", "lshr")}
         UNION ALL
         ${recallSelect("ivf2", "ivfr")}"""
  }

  private def trianglesOracle: String =
    s"""WITH $minhashCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT count(*) AS n_wedges,
           CAST(sum(CASE WHEN e3.id1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_triangles
         FROM pairs e1
         JOIN pairs e2 ON e1.id2 = e2.id1
         LEFT JOIN pairs e3 ON e3.id1 = e1.id1 AND e3.id2 = e2.id2"""

  /** Common-neighbor / Resource-Allocation link prediction over the LSH
    * pair graph — mirrors q256 (same per-term `//` fixed-point floor).
    */
  private def linkPredictionOracle: String =
    s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS MATERIALIZED (SELECT id1 AS src, id2 AS dst FROM pairs
                   UNION ALL SELECT id2, id1 FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         cand AS (
           SELECT zu.dst AS u, zw.dst AS w, count(*) AS cn,
             CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_e6
           FROM edges zu JOIN edges zw ON zu.src = zw.src AND zu.dst < zw.dst
           JOIN deg d ON d.src = zu.src
           GROUP BY 1, 2)
         SELECT u AS id1, w AS id2, cn, ra_e6
         FROM cand c
         WHERE NOT EXISTS (SELECT 1 FROM pairs p
                           WHERE p.id1 = c.u AND p.id2 = c.w)
         ORDER BY cn DESC, ra_e6 DESC, u, w LIMIT 50"""

  /** 3 unrolled integer-PageRank iterations over the LSH pair graph —
    * mirrors q132 exactly (same `//` truncations, same 85/100 damping).
    */
  private def pagerankOracle: String = {
    def iter(prev: String, cur: String) =
      s"""$cur AS (
           SELECT e.dst AS id,
             150000 + (85 * CAST(sum(r.r // d.d) AS BIGINT)) // 100 AS r
           FROM edges e JOIN deg d ON e.src = d.src
           JOIN $prev r ON r.id = e.src
           GROUP BY e.dst)"""
    s"""WITH $minhashCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS MATERIALIZED (SELECT id1 AS src, id2 AS dst FROM pairs
                   UNION ALL SELECT id2, id1 FROM pairs),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
         r0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS r FROM deg),
         ${iter("r0", "r1")},
         ${iter("r1", "r2")},
         ${iter("r2", "r3")}
       SELECT id AS doc_id, r AS rank_e6 FROM r3"""
  }

  /** Two unrolled Lloyd iterations in exact integer micro-units —
    * mirrors q145 (floor-divided centroid means, argmin with centroid
    * tie-break, assignments always recomputed from the original vectors).
    */
  /** The 2-round exact-integer Lloyd chain (mirror of `Similarity.lloyd`):
    * ve → cent0 → a1 → cent1 → a2 → cent2. Shared by q145 and q251.
    */
  /** q398 oracle: the full 5-round Fellegi–Sunter EM replay on the
    * 16-pattern frame — trunc-div chains mirror the Spark expr exactly.
    */
  private def fsEmOracle: String = {
    def ppSql(p: String, cs: Seq[String]) = cs.zipWithIndex.foldLeft(p) {
      case (acc, (c, i)) =>
        s"(($acc * (CASE WHEN x${i + 1} = 1 THEN $c " +
          s"ELSE 1000000 - $c END)) // 1000000)"
    }
    val rounds = (1 to 5).map { i =>
      val fits = (1 to 4).map { k =>
        s"""CASE WHEN CAST(sum(npat * w) AS BIGINT) = 0 THEN 0
             ELSE (CAST(sum(CASE WHEN x$k = 1 THEN npat * w ELSE 0 END)
               AS BIGINT) * 1000000)
               // CAST(sum(npat * w) AS BIGINT) END AS m$k,
           CASE WHEN CAST(sum(npat * (1000000 - w)) AS BIGINT) = 0 THEN 0
             ELSE (CAST(sum(CASE WHEN x$k = 1
               THEN npat * (1000000 - w) ELSE 0 END) AS BIGINT) * 1000000)
               // CAST(sum(npat * (1000000 - w)) AS BIGINT) END AS u$k"""
      }.mkString(",\n           ")
      s"""e$i AS (
           SELECT x1, x2, x3, x4, npat,
             ${ppSql("p", Seq("m1", "m2", "m3", "m4"))} AS pm,
             ${ppSql("(1000000 - p)", Seq("u1", "u2", "u3", "u4"))} AS pu
           FROM pat CROSS JOIN st${i - 1}),
         w$i AS (
           SELECT *, CASE WHEN pm + pu = 0 THEN 0
             ELSE (pm * 1000000) // (pm + pu) END AS w FROM e$i),
         st$i AS (
           SELECT CAST(sum(npat * w) AS BIGINT)
               // CAST(sum(npat) AS BIGINT) AS p,
             $fits
           FROM w$i)"""
    }.mkString(",\n         ")
    s"""WITH $minhashCtes,
         prs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         side AS (
           SELECT doc_id, source, lang, n_chars,
             string_split(lower(text), ' ')[1] AS tok1
           FROM documents WHERE doc_id < 300),
         pat AS (
           SELECT x1, x2, x3, x4, count(*) AS npat FROM (
             SELECT
               CASE WHEN s1.source = s2.source THEN 1 ELSE 0 END AS x1,
               CASE WHEN s1.lang = s2.lang THEN 1 ELSE 0 END AS x2,
               CASE WHEN abs(s1.n_chars - s2.n_chars) < 100 THEN 1 ELSE 0 END
                 AS x3,
               CASE WHEN s1.tok1 = s2.tok1 THEN 1 ELSE 0 END AS x4
             FROM prs p JOIN side s1 ON p.id1 = s1.doc_id
             JOIN side s2 ON p.id2 = s2.doc_id)
           GROUP BY 1, 2, 3, 4),
         st0 AS (
           SELECT CAST(100000 AS BIGINT) AS p,
             CAST(900000 AS BIGINT) AS m1, CAST(900000 AS BIGINT) AS m2,
             CAST(800000 AS BIGINT) AS m3, CAST(700000 AS BIGINT) AS m4,
             CAST(500000 AS BIGINT) AS u1, CAST(300000 AS BIGINT) AS u2,
             CAST(400000 AS BIGINT) AS u3, CAST(100000 AS BIGINT) AS u4),
         $rounds
         SELECT f.feature, f.m_e6, f.u_e6, s.p AS p_e6, t.n_pairs,
           CASE WHEN f.m_e6 = 0 OR f.u_e6 = 0 THEN 0
             ELSE CAST(floor(ln(CAST(f.m_e6 AS DOUBLE) / f.u_e6)
               * 1000000.0) AS BIGINT) END AS lambda_e6
         FROM (
           SELECT 'source' AS feature, m1 AS m_e6, u1 AS u_e6 FROM st5
           UNION ALL SELECT 'lang', m2, u2 FROM st5
           UNION ALL SELECT 'len', m3, u3 FROM st5
           UNION ALL SELECT 'tok1', m4, u4 FROM st5) f
         CROSS JOIN st5 s
         CROSS JOIN (SELECT CAST(sum(npat) AS BIGINT) AS n_pairs
                     FROM pat) t"""
  }

  private def kmeansCtes: String = {
    val sq = "(v.ve[i] - ct.ce[i]) * (v.ve[i] - ct.ce[i])"
    def cent(src: String, name: String) =
      s"""$name AS (
           SELECT c, list(cv ORDER BY dim) AS ce FROM (
             SELECT c, dim, CAST(sum(v) AS BIGINT) // count(*) AS cv
             FROM (SELECT c, generate_subscripts(ve, 1) AS dim, unnest(ve) AS v
                   FROM $src)
             GROUP BY c, dim)
           GROUP BY c)"""
    def assign(cents: String, name: String) =
      s"""$name AS MATERIALIZED (
           SELECT vec_id, ve, c FROM (
             SELECT v.vec_id, v.ve, ct.c,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, ${Similarity.Dim + 1}),
                   i -> $sq)), ct.c) AS rn
             FROM ve v CROSS JOIN $cents ct)
           WHERE rn = 1)"""
    s"""ve AS (
           SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS ve,
             CAST(label AS BIGINT) AS c
           FROM embeddings),
         ${cent("ve", "cent0")},
         ${assign("cent0", "a1")},
         ${cent("a1", "cent1")},
         ${assign("cent1", "a2")},
         ${cent("a2", "cent2")}"""
  }

  private def kmeansOracle: String =
    s"""WITH $kmeansCtes
       SELECT a.c, a.n_assigned,
         md5(array_to_string(list_transform(ct.ce,
           x -> CAST(x AS VARCHAR)), ',')) AS cfp
       FROM (SELECT c, count(*) AS n_assigned FROM a2 GROUP BY c) a
       JOIN cent2 ct USING (c)"""

  /** q251 oracle: the trained-codebook IVF — Lloyd chain, 4-probe by
    * integer L2, float-cosine rank inside the probed cells, recall@10
    * against the brute-force truth.
    */
  private def annIvfKmeansOracle: String = {
    val sq = "(q.qve[i] - ct.ce[i]) * (q.qve[i] - ct.ce[i])"
    s"""WITH $kmeansCtes,
         qv AS (SELECT vec_id AS query_id, ve AS qve FROM ve
                WHERE vec_id IN (100, 200)),
         probe AS (
           SELECT query_id, c FROM (
             SELECT q.query_id, ct.c,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 list_sum(list_transform(range(1, ${Similarity.Dim + 1}),
                   i -> $sq)), ct.c) AS rn
             FROM qv q CROSS JOIN cent2 ct)
           WHERE rn <= 4),
         qe AS (SELECT vec_id AS query_id, embedding AS qemb
                FROM embeddings WHERE vec_id IN (100, 200)),
         sc AS (
           SELECT cd.query_id, cd.vec_id,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM (SELECT p.query_id, a.vec_id
                 FROM probe p JOIN a2 a ON a.c = p.c
                 WHERE a.vec_id <> p.query_id) cd
           JOIN embeddings e ON e.vec_id = cd.vec_id
           JOIN qe q ON q.query_id = cd.query_id),
         ann AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id ASC) AS rnk
             FROM sc)
           WHERE rnk <= 10),
         bfs AS (
           SELECT q.query_id, e.vec_id,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e, qe q WHERE e.vec_id <> q.query_id),
         bf AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, vec_id ASC) AS rnk
             FROM bfs)
           WHERE rnk <= 10)
         SELECT 'ivfkm4' AS method, b.query_id, count(*) AS k,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1000000 // count(*) AS BIGINT) AS recall_e6
         FROM bf b LEFT JOIN ann a
           ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
         GROUP BY b.query_id"""
  }

  /** Shared CTEs for the q246/q247 retrieval stages: queries (10/20/30),
    * per-candidate dp + cos (explicit 64-term IEEE chains, mirror of
    * `Similarity.dot`/`cosineWithNorms`).
    */
  private def retrievalCtes: String =
    s"""q AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         c AS MATERIALIZED (
           SELECT q.query_id, e.vec_id,
             (${dotSql("e.embedding", "q.qemb")}) AS dp,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id)"""

  private def rrfOracle: String =
    s"""WITH $retrievalCtes,
         r AS (
           SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS r_cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dp DESC, vec_id ASC) AS r_dot
           FROM c),
         f AS (
           SELECT query_id, vec_id,
             CAST(CASE WHEN r_cos <= 50 THEN 1000000000 // (60 + r_cos)
                       ELSE 0 END
                + CASE WHEN r_dot <= 50 THEN 1000000000 // (60 + r_dot)
                       ELSE 0 END AS BIGINT) AS rrf_e9
           FROM r WHERE r_cos <= 50 OR r_dot <= 50),
         o AS (
           SELECT query_id, vec_id AS neighbor_id, rrf_e9,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_e9 DESC, vec_id ASC) AS rnk
           FROM f)
         SELECT query_id, neighbor_id, rnk, rrf_e9 FROM o WHERE rnk <= 10"""

  /** q247 oracle: the greedy MMR walk unrolled as 10 per-step CTE blocks
    * (the q193 macro-generation pattern — aggregates per step, so no
    * recursive-CTE aggregate restriction applies). Each step scores the
    * remaining pool rel − max(sim to selected) and picks max score, ties
    * to the lower vec_id; all quantities integer micro-units.
    */
  private def mmrOracle: String = {
    val steps = (2 to 10).map { st =>
      s"""rem$st AS MATERIALIZED (
           SELECT p.* FROM pool p
           WHERE NOT EXISTS (SELECT 1 FROM sel${st - 1} s
                             WHERE s.query_id = p.query_id
                               AND s.vec_id = p.vec_id)),
         sc$st AS MATERIALIZED (
           SELECT r.query_id, r.vec_id,
             r.rel_e6 - max(pr.sim_e6) AS score
           FROM rem$st r
           JOIN pairs pr ON pr.query_id = r.query_id AND pr.a = r.vec_id
           JOIN sel${st - 1} s ON s.query_id = pr.query_id
             AND s.vec_id = pr.b
           GROUP BY r.query_id, r.vec_id, r.rel_e6),
         pk$st AS (
           SELECT s.query_id, $st AS pos, min(s.vec_id) AS vec_id,
             m.m AS score
           FROM sc$st s
           JOIN (SELECT query_id, max(score) AS m FROM sc$st GROUP BY 1) m
             ON m.query_id = s.query_id AND s.score = m.m
           GROUP BY s.query_id, m.m),
         sel$st AS MATERIALIZED (
           SELECT * FROM sel${st - 1}
           UNION ALL SELECT query_id, pos, vec_id, score FROM pk$st)"""
    }.mkString(",\n         ")
    s"""WITH $retrievalCtes,
         pool AS MATERIALIZED (
           SELECT query_id, vec_id,
             CAST(floor(cos * 1000000.0) AS BIGINT) AS rel_e6
           FROM (SELECT query_id, vec_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, vec_id ASC) AS rnk
                 FROM c)
           WHERE rnk <= 20),
         pe AS MATERIALIZED (
           SELECT p.query_id, p.vec_id, p.rel_e6, e.embedding
           FROM pool p JOIN embeddings e USING (vec_id)),
         pairs AS MATERIALIZED (
           SELECT x.query_id, x.vec_id AS a, y.vec_id AS b,
             CAST(floor((${dotSql("x.embedding", "y.embedding")})
               / (sqrt(${dotSql("x.embedding", "x.embedding")})
                  * sqrt(${dotSql("y.embedding", "y.embedding")}))
               * 1000000.0) AS BIGINT) AS sim_e6
           FROM pe x JOIN pe y ON x.query_id = y.query_id
             AND x.vec_id <> y.vec_id),
         sel1 AS MATERIALIZED (
           SELECT s.query_id, 1 AS pos, min(s.vec_id) AS vec_id, m.m AS score
           FROM pool s
           JOIN (SELECT query_id, max(rel_e6) AS m FROM pool GROUP BY 1) m
             ON m.query_id = s.query_id AND s.rel_e6 = m.m
           GROUP BY s.query_id, m.m),
         $steps
         SELECT query_id, pos, vec_id, CAST(score AS BIGINT) AS score_e6
         FROM sel10"""
  }

  private def budgetFillOracle: String =
    """WITH dv AS (
           SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
         d2 AS (
           SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM dv),
         d3 AS (SELECT *, n_uniq * 1000000 // n_tok AS prio_e6 FROM d2),
         r AS (
           SELECT *, row_number() OVER (ORDER BY prio_e6 DESC, doc_id ASC)
             AS rnk
           FROM d3),
         cm AS (
           SELECT doc_id, source, rnk, n_tok, prio_e6,
             CAST(sum(n_tok) OVER (ORDER BY rnk) AS BIGINT) AS cum_tok
           FROM r)
         SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk, n_tok,
           CAST(prio_e6 AS BIGINT) AS prio_e6, cum_tok
         FROM cm WHERE cum_tok <= 20000"""

  /** The 3 damped multiplicative-weights rounds unrolled (t0 → t3) —
    * every operand non-negative, so DuckDB `//` (floor) and Spark `div`
    * (trunc) agree; every sum CAST to BIGINT before it divides. Expects
    * a CTE `loss` (source, loss_e6); yields t0..t3 with (source,
    * loss_e6, excess_e6, w). Shared by q249 and q250.
    */
  private def doremiRoundCtes: String = {
    val rounds = (1 to 3).map { rd =>
      s"""t$rd AS (
           SELECT source, loss_e6, excess_e6,
             (w * (1000000
                + ((excess_e6 * (1000000 - (w * 1000000 // tw))) // 1000000)
                  // 10)) // 1000000 AS w
           FROM t${rd - 1},
             (SELECT CAST(sum(w) AS BIGINT) AS tw FROM t${rd - 1}))"""
    }.mkString(",\n         ")
    s"""base AS (SELECT min(loss_e6) AS b FROM loss),
         t0 AS (
           SELECT source, loss_e6, loss_e6 - b AS excess_e6,
             CAST(1000000 AS BIGINT) AS w
           FROM loss, base),
         $rounds"""
  }

  private def doremiOracle: String =
    s"""WITH $nllCtes,
         src AS (SELECT doc_id, source FROM documents),
         loss AS (
           SELECT source,
             CAST(sum(avg_nll_e6) // count(*) AS BIGINT) AS loss_e6
           FROM nll JOIN src USING (doc_id) GROUP BY 1),
         $doremiRoundCtes
         SELECT source, loss_e6, excess_e6, w AS w_final,
           CAST(w * 1000000 // tw AS BIGINT) AS share_e6
         FROM t3, (SELECT CAST(sum(w) AS BIGINT) AS tw FROM t3)"""

  /** q250 oracle: the composed mix — q53 keep gate, NLL over the KEPT
    * corpus, the 3 mixture rounds, per-source budget fill by keyed
    * windows. One SQL chain, every stage integer-exact.
    */
  private def trainingMixOracle: String = {
    val stopAll = hitsSql(TextFunctions.langStopwords.flatMap(_._2))
    s"""WITH dv AS (
           SELECT doc_id, source, text,
             string_split(lower(text), ' ') AS w
           FROM documents),
         kept AS MATERIALIZED (
           SELECT doc_id, source, w FROM dv
           WHERE len(w) >= 10 AND len(w) <= 100000
             AND (CASE WHEN len(w) > 0
                  THEN CAST($stopAll AS DOUBLE) / len(w)
                  ELSE 0.0 END) > 0.001),
         ${nllChain("kept")},
         loss AS (
           SELECT source,
             CAST(sum(avg_nll_e6) // count(*) AS BIGINT) AS loss_e6
           FROM nll JOIN (SELECT doc_id, source FROM kept) sk USING (doc_id)
           GROUP BY 1),
         $doremiRoundCtes,
         shares AS (
           SELECT source, CAST(w * 1000000 // tw AS BIGINT) AS share_e6
           FROM t3, (SELECT CAST(sum(w) AS BIGINT) AS tw FROM t3)),
         toks AS (
           SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM kept),
         pr AS (
           SELECT doc_id, source, n_tok,
             n_uniq * 1000000 // n_tok AS prio_e6
           FROM toks),
         budg AS (
           SELECT source, share_e6 * 10000 // 1000000 AS src_budget
           FROM shares),
         r AS (
           SELECT p.doc_id, p.source, p.n_tok, p.prio_e6, b.src_budget,
             row_number() OVER (PARTITION BY p.source
                                ORDER BY p.prio_e6 DESC, p.doc_id ASC)
               AS rnk_in_src,
             CAST(sum(p.n_tok) OVER (PARTITION BY p.source
                                     ORDER BY p.prio_e6 DESC, p.doc_id ASC)
               AS BIGINT) AS cum_tok
           FROM pr p JOIN budg b USING (source))
         SELECT doc_id, source, n_tok, CAST(prio_e6 AS BIGINT) AS prio_e6,
           CAST(src_budget AS BIGINT) AS src_budget,
           CAST(rnk_in_src AS BIGINT) AS rnk_in_src, cum_tok
         FROM r WHERE cum_tok <= src_budget"""
  }

  val oracles: Map[String, String] = Map(
    "q246_rrf_fusion" -> rrfOracle,
    "q247_mmr_rerank" -> mmrOracle,
    "q248_token_budget_fill" -> budgetFillOracle,
    "q249_doremi_mixture" -> doremiOracle,
    "q250_training_mix" -> trainingMixOracle,
    "q251_ann_ivf_kmeans" -> annIvfKmeansOracle,
    "q263_product_quantization" -> pqOracle,
    "q194_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         p AS (SELECT lang, n_docs,
                 CAST(floor(pow(CAST(n_docs AS DOUBLE), 0.3) * 1e9) AS BIGINT)
                   AS pow_e9
               FROM c),
         t AS (SELECT sum(n_docs) AS n_total, sum(pow_e9) AS spow_e9 FROM p)
         SELECT lang, n_docs,
           CAST((n_docs * 1000000) // n_total AS BIGINT) AS p_e6,
           CAST((pow_e9 * 1000000) // spow_e9 AS BIGINT) AS q_e6,
           CAST((((pow_e9 * 1000000) // spow_e9) * 1000)
             // ((n_docs * 1000000) // n_total) AS BIGINT) AS boost_e3
         FROM p, t""",
    "q195_minhash_accuracy" -> {
      val p = Dedup.MinHashParams()
      val eqSum = (0 until p.numPerms)
        .map(i => s"(CASE WHEN sa.sig$i = sb.sig$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         eq AS (
           SELECT p.id1, p.id2, CAST($eqSum AS BIGINT) AS n_eq
           FROM pairs p
           JOIN sig sa ON sa.doc_id = p.id1
           JOIN sig sb ON sb.doc_id = p.id2),
         shd AS (SELECT doc_id, list_distinct(shingles) AS shs FROM sh),
         j AS (
           SELECT e.id1, e.id2, e.n_eq,
             CAST(len(list_intersect(x.shs, y.shs)) AS BIGINT) AS inter,
             CAST(len(x.shs) + len(y.shs)
               - len(list_intersect(x.shs, y.shs)) AS BIGINT) AS uni
           FROM eq e
           JOIN shd x ON x.doc_id = e.id1
           JOIN shd y ON y.doc_id = e.id2)
         SELECT id1, id2,
           (n_eq * 1000000) // ${p.numPerms} AS est_e6,
           (inter * 1000000) // uni AS true_e6,
           abs((n_eq * 1000000) // ${p.numPerms}
             - (inter * 1000000) // uni) AS err_e6
         FROM j"""
    },
    "q196_gopher_rules" ->
      """WITH f AS (
           SELECT doc_id,
             string_split(lower(text), ' ') AS w,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(string_split(lower(text), ' '),
               t -> len(t))) AS BIGINT) AS sum_len,
             CAST(len(text) - len(replace(text, '#', '')) AS BIGINT) AS n_hash,
             CAST((len(text) - len(replace(text, '...', ''))) // 3 AS BIGINT)
               AS n_ellipsis,
             CAST(len(list_filter(string_split(lower(text), ' '),
               t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha_w,
             CAST(len(list_intersect(list_distinct(string_split(lower(text), ' ')),
               ['the','be','to','of','and','that','have','with'])) AS BIGINT)
               AS n_stops
           FROM documents)
         SELECT doc_id, n_words,
           (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
           (sum_len >= n_words * 3 AND sum_len <= n_words * 10)
             AS rule_mean_word_len,
           ((n_hash + n_ellipsis) * 10 <= n_words) AS rule_symbol_ratio,
           (n_alpha_w * 10 >= n_words * 8) AS rule_alpha_words,
           (n_stops >= 2) AS rule_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
             AND (sum_len >= n_words * 3 AND sum_len <= n_words * 10)
             AND ((n_hash + n_ellipsis) * 10 <= n_words)
             AND (n_alpha_w * 10 >= n_words * 8)
             AND (n_stops >= 2)) AS keep
         FROM f""",
    "q197_dsir_weights" ->
      s"""WITH toks AS (
           SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
         tokh AS (
           SELECT doc_id, source,
             list_transform(w, t -> ${h60("t")} % 1073741824) AS ht
           FROM toks WHERE len(w) >= 2),
         bk AS (
           SELECT doc_id, source,
             unnest(list_transform(range(1, len(ht)),
               i -> ((ht[i] * $WinnowB + ht[i+1]) % $WinnowP) % 8192))
               AS bucket
           FROM tokh),
         bc AS (
           SELECT bucket,
             sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
             sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS cr
           FROM bk GROUP BY 1),
         tt AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM bc),
         dl AS (
           SELECT bucket,
             CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 8192 AS DOUBLE))
               - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 8192 AS DOUBLE))) * 1e9)
               AS BIGINT) AS delta_e9
           FROM bc, tt),
         dc AS (
           SELECT doc_id, bucket, count(*) AS c
           FROM bk WHERE source <> 'src0' GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(sum(c * delta_e9) AS BIGINT) AS logw_e9
         FROM dc JOIN dl USING (bucket) GROUP BY 1""",
    "q203_langid_margin" -> {
      val hits = TextFunctions.langStopwords.map { case (lang, words) =>
        s"${hitsSql(words)} AS h_$lang"
      }.mkString(", ")
      s"""WITH h AS (SELECT doc_id, $hits FROM documents),
         s AS (
           SELECT doc_id, h_en, h_es, h_fr, h_de,
             greatest(h_en, h_es, h_fr, h_de) AS mx,
             list_sort([h_en, h_es, h_fr, h_de], 'DESC') AS sc
           FROM h)
         SELECT doc_id,
           CASE WHEN mx = 0 THEN 'und'
                WHEN h_en = mx THEN 'en' WHEN h_es = mx THEN 'es'
                WHEN h_fr = mx THEN 'fr' ELSE 'de' END AS pred_lang,
           CAST(sc[1] AS BIGINT) AS best,
           CAST(sc[2] AS BIGINT) AS second,
           CAST(sc[1] - sc[2] AS BIGINT) AS margin,
           (sc[1] > 0 AND sc[1] - sc[2] >= 2) AS confident
         FROM s"""
    },
    "q204_eval_sample" ->
      s"""WITH f AS (
           SELECT doc_id, lang, n_chars // 100 AS len_bucket,
             ${h60("text")} AS h
           FROM documents),
         r AS (
           SELECT doc_id, lang, len_bucket,
             row_number() OVER (PARTITION BY lang, len_bucket
                                ORDER BY h, doc_id) AS rn
           FROM f)
         SELECT doc_id, lang, len_bucket FROM r WHERE rn <= 5""",
    "q205_hard_negatives" ->
      s"""WITH q AS (
           SELECT vec_id AS query_id, embedding AS qemb, label AS qlabel
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         c AS (
           SELECT q.query_id, e.vec_id,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e, q WHERE e.label <> q.qlabel),
         r AS (
           SELECT query_id, vec_id AS neg_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rnk
           FROM c)
         SELECT query_id, neg_id, rnk,
           CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_e6
         FROM r WHERE rnk <= 5""",
    "q210_seedlist_tag" -> {
      val (rx, ng, flag) = seedlistSql
      s"""SELECT doc_id, $rx AS n_regex_hits, $ng AS n_ngram_hits,
           $flag AS seedlist_keyword
         FROM documents"""
    },
    "q342_lr_expansion" -> {
      val feats =
        seedRegexes.map(p => s"CAST(regexp_matches(lower(text), '$p') AS BIGINT)") ++
        seedNgrams.map(p => s"CAST(contains(lower(text), '$p') AS BIGINT)")
      val vals = lrModelRows.map { case (id, ws, b) =>
        s"($id, ${ws.mkString("[", ", ", "]")}, $b)"
      }.mkString(", ")
      val logit = feats.zipWithIndex // DuckDB lists are 1-based
        .map { case (f, i) => s"w_e6[${i + 1}] * $f" }.mkString(" + ")
      s"""WITH m(model_id, w_e6, b_e6) AS (VALUES $vals)
         SELECT doc_id, CAST(model_id AS BIGINT) AS model_id,
           CAST($logit + b_e6 AS BIGINT) AS logit_e6,
           CAST(($logit + b_e6) > 0 AS BIGINT) AS pred
         FROM documents CROSS JOIN m"""
    },
    "q343_stupid_backoff" ->
      s"""WITH docs AS (
           SELECT doc_id, source, $tokenHashesSql AS ht FROM documents),
         train AS (SELECT ht FROM docs WHERE source <> 'src0'),
         uni AS (
           SELECT h, count(*) AS c
           FROM (SELECT unnest(ht) AS h FROM train) GROUP BY 1),
         nt AS (
           SELECT count(*) AS n_tot
           FROM (SELECT unnest(ht) AS h FROM train)),
         bi AS (
           SELECT g, count(*) AS c12 FROM (
             SELECT unnest(list_transform(range(1, len(ht)),
               i -> ${gramHash62("i", 2)})) AS g
             FROM train WHERE len(ht) >= 2)
           GROUP BY 1),
         probe AS (
           SELECT doc_id, g, h1, h2, count(*) AS occ FROM (
             SELECT doc_id,
               unnest(list_transform(range(1, len(ht)),
                 i -> ${gramHash62("i", 2)})) AS g,
               unnest(list_transform(range(1, len(ht)), i -> ht[i])) AS h1,
               unnest(list_transform(range(1, len(ht)), i -> ht[i+1])) AS h2
             FROM docs WHERE source = 'src0' AND len(ht) >= 2)
           GROUP BY 1, 2, 3, 4),
         scored AS (
           SELECT doc_id, occ, CAST(CASE
             WHEN b.c12 IS NOT NULL AND u1.c IS NOT NULL
               THEN (b.c12 * 1000000) // u1.c
             WHEN u2.c IS NOT NULL
               THEN (2 * u2.c * 1000000) // (5 * nt.n_tot)
             ELSE 0 END AS BIGINT) AS s_e6
           FROM probe p
           LEFT JOIN bi b USING (g)
           LEFT JOIN uni u1 ON p.h1 = u1.h
           LEFT JOIN uni u2 ON p.h2 = u2.h
           CROSS JOIN nt)
         SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
           CAST(sum(occ * s_e6) // sum(occ) AS BIGINT) AS score_e6
         FROM scored GROUP BY 1""",
    "q344_hashed_bag_score" ->
      s"""WITH x AS (
           SELECT doc_id, b, count(*) AS x FROM (
             SELECT doc_id,
               unnest(list_transform($tokenHashesSql, h -> h % 256)) AS b
             FROM documents)
           GROUP BY 1, 2),
         wts AS (
           SELECT cls.range AS cls, bb.range AS b,
             ((cls.range * 1000003 + bb.range * 7919) % 2001 - 1000) * 1000
               AS w_e6
           FROM range(0, 3) cls CROSS JOIN range(0, 256) bb),
         sc AS (
           SELECT doc_id, cls, CAST(sum(x.x * w_e6) AS BIGINT) AS score_e6
           FROM x JOIN wts USING (b) GROUP BY 1, 2),
         r AS (
           SELECT doc_id, cls, score_e6, row_number() OVER (
             PARTITION BY doc_id ORDER BY score_e6 DESC, cls ASC) AS rn
           FROM sc)
         SELECT doc_id, CAST(cls AS BIGINT) AS best_cls,
           score_e6 AS best_score_e6
         FROM r WHERE rn = 1""",
    "q346_quantile_sketch" ->
      """WITH c AS (
           SELECT l_returnflag AS flag, count(*) AS n
           FROM lineitem GROUP BY 1)
         SELECT flag, CAST(d.range AS BIGINT) AS d, n, TRUE AS in_band
         FROM c CROSS JOIN range(1, 10) d""",
    "q345_temperature_mix" ->
      """WITH cnt AS (
           SELECT lang,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS c
           FROM documents GROUP BY 1),
         sq AS (
           SELECT lang, c,
             CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS s
           FROM cnt),
         tt AS (
           SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS ct
           FROM sq)
         SELECT lang, c, s,
           CAST((c * 1000000) // ct AS BIGINT) AS p_e6,
           CAST((s * 1000000) // st AS BIGINT) AS q_e6,
           CAST(least((50000 * s) // st, c) AS BIGINT) AS alloc_tokens
         FROM sq, tt""",
    "q211_keyword_recall" -> {
      val (_, _, flag) = seedlistSql
      s"""WITH f AS (
           SELECT doc_id, $flag AS pos,
             ${hitsSql(posWords)} AS score
           FROM documents),
         r AS (
           SELECT pos, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
           FROM f),
         tot AS (SELECT sum(pos) AS n_positives FROM f),
         ks AS (SELECT * FROM (VALUES (10), (50), (100), (250)) v(topk))
         SELECT CAST(topk AS BIGINT) AS topk,
           CAST(sum(pos) AS BIGINT) AS n_captured,
           CAST(any_value(n_positives) AS BIGINT) AS n_positives,
           CAST((sum(pos) * 1000000) // any_value(n_positives) AS BIGINT)
             AS recall_e6
         FROM r, ks, tot WHERE rnk <= topk GROUP BY topk"""
    },
    "q212_semdedup" -> {
      val rng = s"range(1, ${Similarity.Dim + 1})"
      def idot(a: String, b: String) =
        s"CAST(list_sum(list_transform($rng, i -> $a[i] * $b[i])) AS BIGINT)"
      s"""WITH ve AS (
           SELECT vec_id,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS ve,
             CAST(label AS BIGINT) AS c
           FROM embeddings),
         cent AS (
           SELECT c, list(cv ORDER BY dim) AS ce FROM (
             SELECT c, dim, CAST(sum(v) AS BIGINT) // count(*) AS cv
             FROM (SELECT c, generate_subscripts(ve, 1) AS dim, unnest(ve) AS v
                   FROM ve)
             GROUP BY c, dim)
           GROUP BY c),
         a AS (
           SELECT vec_id, ve, c, n2,
             CAST(floor(CAST(dotc AS DOUBLE)
               / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE)))
               * 1e6) AS BIGINT) AS centsim_e6
           FROM (
             SELECT v.vec_id, v.ve, ct.c,
               ${idot("v.ve", "v.ve")} AS n2,
               ${idot("v.ve", "ct.ce")} AS dotc,
               ${idot("ct.ce", "ct.ce")} AS cn2,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform($rng,
                   i -> (v.ve[i] - ct.ce[i]) * (v.ve[i] - ct.ce[i]))), ct.c)
                 AS rn
             FROM ve v CROSS JOIN cent ct)
           WHERE rn = 1),
         drp AS (
           SELECT DISTINCT x.vec_id
           FROM a x JOIN a y ON x.c = y.c AND x.vec_id <> y.vec_id
           WHERE CAST(floor(CAST(${idot("x.ve", "y.ve")} AS DOUBLE)
               / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
               * 1e6) AS BIGINT) >= 250000
             AND (y.centsim_e6 < x.centsim_e6
               OR (y.centsim_e6 = x.centsim_e6 AND y.vec_id < x.vec_id)))
         SELECT a.vec_id, a.c, a.centsim_e6,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM a LEFT JOIN drp d ON a.vec_id = d.vec_id"""
    },
    "q215_weighted_draw" ->
      s"""WITH k AS (
           SELECT doc_id, source,
             CAST(floor(ln(CAST(${h60("text")} % 1000000 + 1 AS DOUBLE)
                 / 1000001.0)
               / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_e9
           FROM documents),
         r AS (
           SELECT source, doc_id, key_e9,
             row_number() OVER (PARTITION BY source
                                ORDER BY key_e9 DESC, doc_id) AS rn
           FROM k)
         SELECT source, doc_id, key_e9 FROM r WHERE rn <= 10""",
    "q216_oov_rate" ->
      """WITH tok AS (
           SELECT source, unnest(string_split(lower(text), ' ')) AS tk
           FROM documents),
         vc AS (
           SELECT tk, row_number() OVER (ORDER BY count(*) DESC, tk) AS rn
           FROM tok GROUP BY tk),
         v AS (SELECT tk FROM vc WHERE rn <= 20)
         SELECT source, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST((sum(CASE WHEN v.tk IS NULL THEN 1 ELSE 0 END) * 1000000)
             // count(*) AS BIGINT) AS oov_e6
         FROM tok LEFT JOIN v ON tok.tk = v.tk
         GROUP BY source""",
    "q217_jw_linkage" ->
      """WITH c AS (
           SELECT c_custkey AS id, c_name AS name, c_custkey // 100 AS bkt
           FROM customer),
         p AS (
           SELECT a.id AS id1, b.id AS id2,
             CAST(floor(jaro_winkler_similarity(a.name, b.name) * 1e6)
               AS BIGINT) AS jw_e6
           FROM c a JOIN c b ON a.bkt = b.bkt AND a.id <> b.id),
         r AS (
           SELECT id1, id2, jw_e6,
             row_number() OVER (PARTITION BY id1
                                ORDER BY jw_e6 DESC, id2) AS rn
           FROM p)
         SELECT id1, id2, jw_e6 FROM r WHERE rn = 1""",
    "q220_datasheet" -> {
      val stopAll = hitsSql(TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH f AS (
           SELECT doc_id, source, lang, n_chars,
             CAST(len(w) AS BIGINT) AS n_toks,
             (len(w) >= 10 AND len(w) <= 100000 AND
              (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w)
                    ELSE 0.0 END) > 0.001) AS keep,
             md5($normSql) AS fp
           FROM (SELECT doc_id, source, lang, n_chars, text,
                   string_split(lower(text), ' ') AS w
                 FROM documents)),
         core AS (
           SELECT source, count(*) AS n_docs, sum(n_toks) AS n_tokens,
             sum(n_chars) AS sum_chars,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
             sum(CASE WHEN keep THEN 1 ELSE 0 END) AS n_keep
           FROM f GROUP BY 1),
         dups AS (
           SELECT source,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS n_dup_docs
           FROM (SELECT source, fp, count(*) AS c FROM f GROUP BY 1, 2)
           GROUP BY 1)
         SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((sum_chars * 100) // n_docs AS BIGINT) AS mean_chars_e2,
           CAST((n_en * 1000000) // n_docs AS BIGINT) AS en_e6,
           CAST((n_keep * 1000000) // n_docs AS BIGINT) AS keep_e6,
           CAST((n_dup_docs * 1000000) // n_docs AS BIGINT) AS dup_e6
         FROM core JOIN dups USING (source)"""
    },
    "q222_class_balance" ->
      s"""WITH e AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
             ${h60("CAST(vec_id AS VARCHAR)")} AS h
           FROM embeddings),
         mn AS (
           SELECT min(n) AS k
           FROM (SELECT label, count(*) AS n FROM e GROUP BY 1)),
         r AS (
           SELECT vec_id, label,
             row_number() OVER (PARTITION BY label
                                ORDER BY h, vec_id) AS rnk
           FROM e)
         SELECT label, count(*) AS n_kept,
           CAST(sum(vec_id) AS BIGINT) AS id_sum
         FROM r, mn WHERE rnk <= k GROUP BY label""",
    "q223_triplets" ->
      s"""WITH q AS (
           SELECT vec_id AS anchor_id, embedding AS qemb, label AS qlabel
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         c AS (
           SELECT q.anchor_id, e.vec_id, (e.label = q.qlabel) AS same,
             CAST(floor((${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) * 1e6) AS BIGINT)
               AS cos_e6
           FROM embeddings e, q WHERE e.vec_id <> q.anchor_id),
         p AS (
           SELECT anchor_id, vec_id AS pos_id, cos_e6 AS pos_cos_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                   ORDER BY cos_e6 DESC, vec_id) AS rn
                 FROM c WHERE same) WHERE rn = 1),
         n AS (
           SELECT anchor_id, vec_id AS neg_id, cos_e6 AS neg_cos_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                   ORDER BY cos_e6 DESC, vec_id) AS rn
                 FROM c WHERE NOT same) WHERE rn = 1)
         SELECT p.anchor_id, p.pos_id, p.pos_cos_e6, n.neg_id, n.neg_cos_e6,
           p.pos_cos_e6 - n.neg_cos_e6 AS margin_e6
         FROM p JOIN n USING (anchor_id)""",
    "q224_containment" ->
      s"""WITH $minhashCtes,
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         shd AS (SELECT doc_id, list_distinct(shingles) AS shs FROM sh)
         SELECT p.id1, p.id2,
           CAST(len(list_intersect(x.shs, y.shs)) AS BIGINT) AS inter,
           CAST(len(x.shs) AS BIGINT) AS na,
           CAST(len(y.shs) AS BIGINT) AS nb,
           (len(list_intersect(x.shs, y.shs)) * 1000000) // len(x.shs)
             AS cont_a_e6,
           (len(list_intersect(x.shs, y.shs)) * 1000000) // len(y.shs)
             AS cont_b_e6,
           (greatest(
              (len(list_intersect(x.shs, y.shs)) * 1000000) // len(x.shs),
              (len(list_intersect(x.shs, y.shs)) * 1000000) // len(y.shs))
            >= 800000) AS contained
         FROM pairs p
         JOIN shd x ON x.doc_id = p.id1
         JOIN shd y ON y.doc_id = p.id2""",
    "q225_label_prop" -> {
      def iter(prev: String, next: String) =
        s"""$next AS (
           SELECT id, lb FROM (
             SELECT t.a AS id, t.nlb AS lb,
               row_number() OVER (PARTITION BY t.a
                                  ORDER BY t.c DESC, t.nlb) AS rn
             FROM (SELECT e.a, p.lb AS nlb, count(*) AS c
                   FROM edges e JOIN $prev p ON p.id = e.b
                   GROUP BY e.a, p.lb) t)
           WHERE rn = 1)"""
      s"""WITH $minhashCtes,
         cand AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS MATERIALIZED (
           SELECT id1 AS a, id2 AS b FROM cand
           UNION ALL SELECT id2 AS a, id1 AS b FROM cand),
         l0 AS (SELECT DISTINCT a AS id, a AS lb FROM edges),
         ${iter("l0", "l1")},
         ${iter("l1", "l2")},
         ${iter("l2", "l3")}
         SELECT id AS doc_id, lb AS community FROM l3"""
    },
    "q226_skew_diagnostics" ->
      """WITH c AS (
           SELECT o_custkey, count(*) AS c FROM orders GROUP BY 1),
         tot AS (SELECT sum(c) AS n_rows FROM c),
         bands AS (
           SELECT 'band' AS kind,
             CAST(length(bin(c)) - 1 AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS v
           FROM c GROUP BY 2),
         top AS (
           SELECT 'top_key' AS kind, o_custkey AS k,
             CAST((c * 1000000) // n_rows AS BIGINT) AS v
           FROM c, tot ORDER BY c DESC, o_custkey LIMIT 5)
         SELECT * FROM bands UNION ALL SELECT * FROM top""",
    "q228_sparsify" ->
      """WITH d0 AS (
           SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS idx,
             unnest(embedding) AS x
           FROM embeddings),
         d AS (
           SELECT vec_id, idx,
             CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000.0) AS BIGINT) AS a,
             CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS ve6
           FROM d0),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY vec_id
                                        ORDER BY a DESC, idx) AS rn
           FROM d),
         tot AS (
           SELECT vec_id, CAST(sum(a * a) AS BIGINT) AS total_en
           FROM d GROUP BY 1),
         kept AS (
           SELECT vec_id,
             md5(string_agg(idx || ':' || ve6, ',' ORDER BY rn)) AS sparse_fp,
             CAST(sum(a * a) AS BIGINT) AS kept_en
           FROM r WHERE rn <= 8 GROUP BY 1)
         SELECT k.vec_id, k.sparse_fp,
           (k.kept_en * 1000) // (t.total_en // 1000) AS kept_energy_e6
         FROM kept k JOIN tot t USING (vec_id)""",
    "q229_source_overlap" ->
      s"""WITH fps AS (
           SELECT DISTINCT source,
             md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fp
           FROM documents)
         SELECT a.source AS src_a, b.source AS src_b,
           count(*) AS n_shared_fps
         FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
         GROUP BY 1, 2""",
    "q230_burstiness" ->
      """WITH g AS (
           SELECT user_id,
             (epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)) // 1000000 AS g
           FROM events),
         a AS (
           SELECT user_id, count(*) AS n_gaps,
             CAST(sum(g) AS BIGINT) AS sg, CAST(sum(g * g) AS BIGINT) AS sgg
           FROM g WHERE g IS NOT NULL GROUP BY 1)
         SELECT user_id, n_gaps, sg // n_gaps AS mean_gap_s,
           CAST(floor(
             sqrt((CAST(sgg AS DOUBLE) * CAST(n_gaps AS DOUBLE)
               - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
               / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)))
             / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) * 1e6)
             AS BIGINT) AS cv_e6
         FROM a WHERE n_gaps >= 2 AND sg > 0""",
    "q231_histogram" ->
      """WITH ev AS (
           SELECT event_type,
             CAST(floor(value * 1000000.0) AS BIGINT) AS v_e6
           FROM events),
         b AS (SELECT min(v_e6) AS mn, max(v_e6) AS mx FROM ev)
         SELECT event_type,
           (v_e6 - mn) * 20 // (mx - mn + 1) AS bin, count(*) AS n
         FROM ev, b GROUP BY 1, 2""",
    "q232_weighted_median" ->
      """WITH p AS (
           SELECT p_brand, CAST(floor(p_retailprice * 100) AS BIGINT)
               AS price_c,
             CAST(p_size AS BIGINT) AS w, p_partkey
           FROM part),
         c AS (
           SELECT p_brand, price_c, p_partkey, w,
             sum(w) OVER (PARTITION BY p_brand ORDER BY price_c, p_partkey
                          ROWS UNBOUNDED PRECEDING) AS cw
           FROM p),
         t AS (SELECT p_brand, CAST(sum(w) AS BIGINT) AS tw FROM p GROUP BY 1),
         r AS (
           SELECT c.p_brand, c.price_c, t.tw,
             row_number() OVER (PARTITION BY c.p_brand
                                ORDER BY c.cw, c.p_partkey) AS rn
           FROM c JOIN t USING (p_brand) WHERE c.cw * 2 >= t.tw)
         SELECT p_brand, price_c AS wmedian_c, tw FROM r WHERE rn = 1""",
    "q233_cuped" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 1000000.0) AS BIGINT) AS v_e6
           FROM events),
         span AS (SELECT min(day) AS d0 FROM ev),
         per AS (
           SELECT user_id,
             CAST(sum(CASE WHEN day < d0 + 15 THEN v_e6 ELSE 0 END)
               AS BIGINT) AS pre,
             CAST(sum(CASE WHEN day >= d0 + 15 THEN v_e6 ELSE 0 END)
               AS BIGINT) AS post,
             user_id % 2 AS variant
           FROM ev, span GROUP BY user_id),
         m AS (
           SELECT count(*) AS n, CAST(sum(pre) AS BIGINT) AS sx,
             CAST(sum(post) AS BIGINT) AS sy,
             CAST(sum((pre // 1000) * (pre // 1000)) AS BIGINT) AS sxx,
             CAST(sum((pre // 1000) * (post // 1000)) AS BIGINT) AS sxy
           FROM per),
         adj AS (
           SELECT variant,
             CAST(floor(CAST(post AS DOUBLE)
               - ((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE)
                   - (CAST(sx AS DOUBLE) / 1e3) * (CAST(sy AS DOUBLE) / 1e3))
                  / (CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE)
                   - (CAST(sx AS DOUBLE) / 1e3) * (CAST(sx AS DOUBLE) / 1e3)))
                 * (CAST(pre AS DOUBLE)
                    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS a
           FROM per, m)
         SELECT variant, count(*) AS n_users,
           CAST(floor(avg(CAST(a AS DOUBLE))) AS BIGINT) AS adj_mean_e6
         FROM adj GROUP BY variant""",
    "q234_srm_check" ->
      s"""WITH u AS (
           SELECT DISTINCT user_id,
             ${h60("CAST(user_id AS VARCHAR)")} % 2 AS variant
           FROM events),
         c AS (SELECT variant, count(*) AS o FROM u GROUP BY 1),
         t AS (SELECT sum(o) AS n FROM c),
         d AS (
           SELECT CAST((2 * o - n) * (2 * o - n) AS BIGINT) AS dev2,
             CAST(n AS BIGINT) AS n
           FROM c, t)
         SELECT any_value(n) AS n_users,
           CAST((sum(dev2) * 1000000) // (2 * any_value(n)) AS BIGINT)
             AS chi2_e6,
           CAST(sum(dev2) * 100 > 384 * 2 * any_value(n) AS BIGINT)
             AS srm_flag
         FROM d""",
    "q235_did" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 1000000.0) AS BIGINT) AS v_e6
           FROM events),
         span AS (SELECT min(day) AS d0 FROM ev),
         cells AS (
           SELECT user_id % 2 AS variant,
             CAST(day >= d0 + 15 AS BIGINT) AS post,
             CAST(sum(v_e6) AS BIGINT) // count(*) AS mean_e6
           FROM ev, span GROUP BY 1, 2),
         w AS (
           SELECT
             sum(CASE WHEN variant = 1 AND post = 1 THEN mean_e6 END) AS t_post,
             sum(CASE WHEN variant = 1 AND post = 0 THEN mean_e6 END) AS t_pre,
             sum(CASE WHEN variant = 0 AND post = 1 THEN mean_e6 END) AS c_post,
             sum(CASE WHEN variant = 0 AND post = 0 THEN mean_e6 END) AS c_pre
           FROM cells)
         SELECT CAST(t_pre AS BIGINT) AS t_pre, CAST(t_post AS BIGINT) AS t_post,
           CAST(c_pre AS BIGINT) AS c_pre, CAST(c_post AS BIGINT) AS c_post,
           CAST((t_post - t_pre) - (c_post - c_pre) AS BIGINT) AS did_e6
         FROM w""",
    "q236_benford" -> {
      val rows = (1 to 9).map(dd =>
        s"($dd, ${math.floor(math.log10(1.0 + 1.0 / dd) * 1e6).toLong})")
        .mkString(", ")
      s"""WITH digits AS (
           SELECT * FROM (VALUES $rows) v(digit, exp_e6)),
         obs AS (
           SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
               AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS o
           FROM orders GROUP BY 1),
         t AS (SELECT sum(o) AS n FROM obs)
         SELECT obs.digit, obs.o,
           CAST((obs.o * 1000000) // n AS BIGINT) AS obs_e6,
           CAST(exp_e6 AS BIGINT) AS exp_e6,
           CAST(abs((obs.o * 1000000) // n - exp_e6) AS BIGINT) AS dev_e6
         FROM obs JOIN digits ON obs.digit = digits.digit, t"""
    },
    "q237_gini" ->
      """WITH c AS (
           SELECT c_mktsegment AS seg,
             CAST(floor((c_acctbal + 1000.0) * 100) AS BIGINT) AS x,
             c_custkey
           FROM customer),
         r AS (
           SELECT seg, x,
             CAST(row_number() OVER (PARTITION BY seg ORDER BY x, c_custkey)
               AS BIGINT) AS i
           FROM c),
         a AS (
           SELECT seg, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(i * x) AS BIGINT) AS six
           FROM r GROUP BY 1)
         SELECT seg, n,
           CAST(floor((2.0 * CAST(six AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
             AS BIGINT) AS gini_e6
         FROM a""",
    "q238_twap" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id,
             epoch_us(ts) // 1000000 AS tm,
             CAST(floor(value * 1000000.0) AS BIGINT) AS v_e6
           FROM events),
         h AS (
           SELECT user_id, event_type, v_e6,
             lead(tm) OVER (PARTITION BY user_id, event_type
                            ORDER BY tm, event_id) - tm AS dur_s
           FROM e),
         a AS (
           SELECT user_id, event_type, count(*) AS n_holds,
             CAST(sum(dur_s) AS BIGINT) AS total_s,
             CAST(sum(v_e6 * dur_s) AS BIGINT) AS vd
           FROM h WHERE dur_s IS NOT NULL GROUP BY 1, 2)
         SELECT user_id, event_type, n_holds, total_s,
           vd // total_s AS twap_e6
         FROM a WHERE total_s > 0""",
    "q239_hhi" ->
      """WITH rev AS (
           SELECT c.c_mktsegment AS seg, o.o_custkey,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2),
         a AS (
           SELECT seg, count(*) AS n_firms,
             CAST(sum(x // 100) AS BIGINT) AS sx,
             CAST(sum((x // 100) * (x // 100)) AS BIGINT) AS sxx
           FROM rev GROUP BY 1)
         SELECT seg, n_firms,
           CAST(floor(CAST(sxx AS DOUBLE)
             / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6)
             AS BIGINT) AS hhi_e6
         FROM a""",
    "q201_repetition_rules" ->
      s"""WITH toks AS (
           SELECT doc_id, $tokenHashesSql AS ht FROM documents),
         bi AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest(list_transform(range(1, len(ht)),
               i -> ${gramHash62("i", 2)})) AS g
             FROM toks WHERE len(ht) >= 2)
           GROUP BY 1, 2),
         bia AS (
           SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_c
           FROM bi GROUP BY 1),
         fv AS (
           SELECT doc_id, g, count(*) AS c FROM (
             SELECT doc_id, unnest(list_transform(range(1, len(ht) - 3),
               i -> ${gramHash62("i", 5)})) AS g
             FROM toks WHERE len(ht) >= 5)
           GROUP BY 1, 2),
         fva AS (
           SELECT doc_id, sum(c) AS n_5grams,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_5gram_occ
           FROM fv GROUP BY 1),
         j AS (
           SELECT b.doc_id, b.n_bigrams, b.top_bigram_c,
             coalesce(f.n_5grams, 0) AS n_5grams,
             coalesce(f.dup_5gram_occ, 0) AS dup_5gram_occ
           FROM bia b LEFT JOIN fva f USING (doc_id))
         SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, top_bigram_c,
           CAST(n_5grams AS BIGINT) AS n_5grams,
           CAST(dup_5gram_occ AS BIGINT) AS dup_5gram_occ,
           CAST((top_bigram_c * 1000000) // n_bigrams AS BIGINT)
             AS top_bigram_frac_e6,
           CAST(CASE WHEN n_5grams > 0
                THEN (dup_5gram_occ * 1000000) // n_5grams ELSE 0
           END AS BIGINT) AS dup_5gram_frac_e6,
           (top_bigram_c * 5 <= n_bigrams) AS rule_top_bigram,
           (dup_5gram_occ * 20 <= n_5grams * 3) AS rule_dup_5gram,
           ((top_bigram_c * 5 <= n_bigrams)
             AND (dup_5gram_occ * 20 <= n_5grams * 3)) AS keep
         FROM j""",
    "q202_zipf_fit" ->
      """WITH tc AS (
           SELECT source, tk, count(*) AS c FROM (
             SELECT source, unnest(string_split(lower(text), ' ')) AS tk
             FROM documents)
           GROUP BY 1, 2),
         top AS (
           SELECT source, c,
             row_number() OVER (PARTITION BY source ORDER BY c DESC, tk) AS r
           FROM tc QUALIFY r <= 100),
         terms AS (
           SELECT source,
             CAST(floor(ln(CAST(r AS DOUBLE)) * 1e9) AS BIGINT) AS x_e9,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT) AS y_e9,
             CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE)) * 1e12)
               AS BIGINT) AS xy_e12,
             CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE)) * 1e12)
               AS BIGINT) AS xx_e12
           FROM top),
         sums AS (
           SELECT source, count(*) AS n, sum(x_e9) AS sx, sum(y_e9) AS sy,
             sum(xy_e12) AS sxy, sum(xx_e12) AS sxx
           FROM terms GROUP BY 1),
         sl AS (
           SELECT source, n, sx, sy,
             (CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)
               - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sy AS DOUBLE) / 1e9))
             / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)
               - (CAST(sx AS DOUBLE) / 1e9) * (CAST(sx AS DOUBLE) / 1e9))
               AS slope
           FROM sums)
         SELECT source, n AS n_terms,
           CAST(floor(slope * 1e6) AS BIGINT) AS slope_e6,
           CAST(floor(((CAST(sy AS DOUBLE) / 1e9) / CAST(n AS DOUBLE)
             - ((slope * (CAST(sx AS DOUBLE) / 1e9)) / CAST(n AS DOUBLE)))
             * 1e6) AS BIGINT) AS intercept_e6
         FROM sl""",
    "q179_dup_cluster_sizes" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         sizes AS (
           SELECT rep_id, count(*) AS cluster_size FROM rep GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters
         FROM sizes GROUP BY 1""",
    "q171_kcore" -> {
      // MATERIALIZED is load-bearing: each round references the previous
      // edge set 3x (two degree-union branches + the next prune), so an
      // inlining planner recomputes the whole minhash subtree ~3^i times —
      // measured OOM-at-8GB inlined vs 0.8 s / <4GB materialized.
      def round(i: Int): String =
        s"""d$i AS MATERIALIZED (
             SELECT id, count(*) AS deg FROM (
               SELECT a AS id FROM e${i - 1} UNION ALL SELECT b AS id FROM e${i - 1})
             GROUP BY 1),
           k$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= 3),
           e$i AS MATERIALIZED (
             SELECT a, b FROM e${i - 1}
             WHERE a IN (SELECT id FROM k$i) AND b IN (SELECT id FROM k$i))"""
      s"""WITH $minhashCtes,
         e0 AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         ${round(1)},
         ${round(2)},
         ${round(3)}
         SELECT id, count(*) AS deg FROM (
           SELECT a AS id FROM e3 UNION ALL SELECT b AS id FROM e3)
         GROUP BY 1"""
    },
    "q166_confusion" ->
      """WITH s AS (
           SELECT (embedding[1] > 0) AS pred, (label % 2 = 1) AS pos
           FROM embeddings),
         agg AS (
           SELECT
             CAST(sum(CASE WHEN pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS tn
           FROM s)
         SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp = 0 THEN CAST(NULL AS BIGINT)
             ELSE (tp * 1000000) // (tp + fp) END AS precision_e6,
           CASE WHEN tp + fn = 0 THEN CAST(NULL AS BIGINT)
             ELSE (tp * 1000000) // (tp + fn) END AS recall_e6,
           CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(NULL AS BIGINT)
             ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS f1_e6
         FROM agg""",
    "q167_feature_hash" -> {
      s"""SELECT doc_id, ${h60("tk")} % 1024 AS dim, count(*) AS v
         FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tk
               FROM documents WHERE doc_id < 50)
         GROUP BY 1, 2"""
    },
    "q168_softmax" ->
      """WITH means AS (
           SELECT event_type,
             CAST(sum(v) AS BIGINT) // count(*) AS mean_e2
           FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
                 FROM events)
           GROUP BY 1),
         mx AS (SELECT max(mean_e2) AS max_e2 FROM means),
         terms AS (
           SELECT event_type,
             CAST(floor(exp(CAST(mean_e2 - max_e2 AS DOUBLE) / 10000.0) * 1000000000.0) AS BIGINT) AS e_e9
           FROM means, mx),
         tot AS (SELECT CAST(sum(e_e9) AS BIGINT) AS z FROM terms)
         SELECT event_type, (e_e9 * 1000000) // z AS p_e6
         FROM terms, tot""",
    "q169_l2_normalize" -> {
      s"""WITH n AS (
           SELECT vec_id, embedding,
             sqrt(${dotSql("embedding", "embedding")}) AS nrm
           FROM embeddings WHERE vec_id < 500)
         SELECT vec_id,
           CASE WHEN nrm > 0 THEN md5(array_to_string(
             list_transform(embedding, x ->
               CAST(CAST(floor(CAST(x AS DOUBLE) / nrm * 1000000.0) AS BIGINT) AS VARCHAR)),
             ',')) END AS unit_fp
         FROM n"""
    },
    "q163_best_match" ->
      """WITH pairs AS (
           SELECT a.c_custkey AS src, b.c_custkey AS dst,
             CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS ed
           FROM customer a JOIN customer b
             ON a.c_custkey <> b.c_custkey
            AND abs(len(a.c_name) - len(b.c_name)) <= 1
           WHERE levenshtein(a.c_name, b.c_name) <= 1),
         ranked AS (
           SELECT src, dst, ed,
             row_number() OVER (PARTITION BY src ORDER BY ed, dst) AS rn
           FROM pairs)
         SELECT src, dst AS best_match, ed FROM ranked WHERE rn = 1""",
    "q164_calibration" ->
      """WITH s AS (
           SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 10) AS BIGINT) AS bucket,
             (label % 2 = 1) AS pos
           FROM embeddings)
         SELECT bucket, count(*) AS n,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*) AS frac_e6
         FROM s GROUP BY 1""",
    "q264_isotonic_calibration" ->
      """WITH cells AS (
           SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 10) AS BIGINT)
               AS bucket,
             count(*) AS n,
             CAST(sum(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS npos
           FROM embeddings GROUP BY 1),
         cum AS (
           SELECT bucket, n, npos,
             CAST(sum(npos) OVER (ORDER BY bucket) AS BIGINT) AS cp,
             CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cc
           FROM cells),
         arr_t AS (
           SELECT list({'bucket': bucket, 'n': n, 'npos': npos,
                        'cp': cp, 'cc': cc} ORDER BY bucket) AS arr
           FROM cum),
         ex AS (
           SELECT unnest(list_transform(range(1, len(arr) + 1), i -> {
             'bucket': arr[i].bucket, 'n': arr[i].n, 'npos': arr[i].npos,
             'fit': list_reduce(
               list_prepend({'fn': CAST(-1 AS BIGINT), 'fd': CAST(1 AS BIGINT)},
                 list_transform(range(1, i + 1), j -> list_reduce(
                   list_prepend({'fn': CAST(2 AS BIGINT),
                                 'fd': CAST(1 AS BIGINT)},
                     list_transform(range(i, len(arr) + 1), k -> {
                       'fn': arr[k].cp - CASE WHEN j = 1 THEN 0
                         ELSE arr[j-1].cp END,
                       'fd': arr[k].cc - CASE WHEN j = 1 THEN 0
                         ELSE arr[j-1].cc END})),
                   (mn, f) -> CASE WHEN f.fn * mn.fd < mn.fn * f.fd
                     THEN f ELSE mn END))),
               (best, mf) -> CASE WHEN mf.fn * best.fd > best.fn * mf.fd
                 THEN mf ELSE best END)})) AS x
           FROM arr_t)
         SELECT x.bucket AS bucket, x.n AS n, x.npos AS npos,
           x.fit.fn AS fit_num, x.fit.fd AS fit_den,
           x.fit.fn * 1000000 // x.fit.fd AS fit_e6
         FROM ex""",
    "q165_psi" ->
      s"""WITH binned AS (
           SELECT CASE WHEN ${h60("text")} % 100 < 80 THEN 'train' ELSE 'test' END AS split,
             least(n_chars // 100, 9) AS bin
           FROM documents),
         cells AS (
           SELECT bin,
             CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS cq
           FROM binned GROUP BY 1),
         tot AS (
           SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq
           FROM cells),
         c AS (
           SELECT
             CASE WHEN cp > 0 AND cq > 0 THEN
               CAST(floor((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE) - CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
                 * ln((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE)) / (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)))
                 * 1000000000000.0) AS BIGINT) END AS c_e12,
             CASE WHEN cp = 0 OR cq = 0 THEN 1 ELSE 0 END AS empty
           FROM cells, tot)
         SELECT count(*) AS n_bins,
           CAST(sum(empty) AS BIGINT) AS n_onesided,
           CAST(sum(c_e12) AS BIGINT) AS psi_e12
         FROM c""",
    "q160_rank_metrics" -> {
      def cos(a: String, b: String) =
        s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
      val dcgTerm = (rel: String, rnk: String) =>
        s"CAST(floor(CAST($rel AS DOUBLE) / (ln(CAST($rnk AS DOUBLE) + 1.0) / ln(2.0)) * 1000000000.0) AS BIGINT)"
      s"""WITH q AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (100, 200)),
         truth AS (
           SELECT query_id, neighbor_id, 11 - rnk AS rel, rnk FROM (
             SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 ${cos("e.embedding", "q.qemb")} DESC, e.vec_id ASC) AS rnk
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE rnk <= 10),
         sys AS (
           SELECT query_id, neighbor_id, srnk FROM (
             SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id ORDER BY
                 (${iDotSql("e.embedding", "q.qemb")}) DESC, e.vec_id ASC) AS srnk
             FROM embeddings e, q WHERE e.vec_id <> q.query_id)
           WHERE srnk <= 10),
         dcg AS (
           SELECT s.query_id,
             CAST(sum(${dcgTerm("coalesce(t.rel, 0)", "s.srnk")}) AS BIGINT) AS dcg_e9,
             min(CASE WHEN t.rel > 0 THEN s.srnk END) AS first_rel,
             CAST(sum(CASE WHEN t.rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
           FROM sys s LEFT JOIN truth t
             ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
           GROUP BY 1),
         idcg AS (
           SELECT query_id,
             CAST(sum(${dcgTerm("rel", "rnk")}) AS BIGINT) AS idcg_e9
           FROM truth GROUP BY 1)
         SELECT d.query_id, d.n_hit,
           CASE WHEN d.first_rel IS NULL THEN CAST(0 AS BIGINT)
             ELSE 1000000 // d.first_rel END AS mrr_e6,
           (d.dcg_e9 * 1000000) // i.idcg_e9 AS ndcg_e6
         FROM dcg d JOIN idcg i USING (query_id)"""
    },
    "q155_auc" ->
      """WITH scored AS (
           SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT) AS score_e6,
             (label % 2 = 1) AS pos
           FROM embeddings),
         ranked AS (
           SELECT pos, row_number() OVER (ORDER BY score_e6, vec_id) AS rnk
           FROM scored),
         agg AS (
           SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn,
             CAST(sum(CASE WHEN pos THEN rnk ELSE 0 END) AS BIGINT) AS sumr
           FROM ranked)
         SELECT np, nn,
           CASE WHEN np * nn = 0 THEN CAST(NULL AS BIGINT)
             ELSE ((sumr - (np * (np + 1)) // 2) * 1000000) // (np * nn) END AS auc_e6
         FROM agg""",
    "q150_vocab_build" ->
      """WITH tc AS (
           SELECT t AS token, count(*) AS freq FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1)
         SELECT token, freq, row_number() OVER (ORDER BY freq DESC, token) AS id
         FROM tc WHERE freq >= 2""",
    "q151_bpe_pairs" ->
      """WITH wf AS (
           SELECT w, count(*) AS f FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents)
           WHERE length(w) >= 2 GROUP BY 1),
         pairs AS (
           SELECT f, unnest(list_transform(range(1, length(w)),
             i -> substr(w, CAST(i AS INT), 2))) AS pair
           FROM wf)
         SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
         FROM pairs GROUP BY 1
         ORDER BY cnt DESC, pair LIMIT 20""",
    "q193_bpe_encode" -> bpeEncodeOracle,
    "q152_js_divergence" ->
      """WITH tok AS (
           SELECT source, unnest(string_split(lower(text), ' ')) AS tk
           FROM documents WHERE source IN ('src0', 'src1')),
         counts AS (
           SELECT tk,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS cp,
             CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cq
           FROM tok GROUP BY 1),
         tot AS (
           SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq
           FROM counts),
         c AS (
           SELECT CAST(floor((
             CASE WHEN cp > 0 THEN (CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
               * ln((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                 / ((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE) + CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)) / 2.0))
               * 0.5 ELSE 0.0 END
             + CASE WHEN cq > 0 THEN (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
               * ln((CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
                 / ((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE) + CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)) / 2.0))
               * 0.5 ELSE 0.0 END) * 1000000000000.0) AS BIGINT) AS c_e12
           FROM counts, tot)
         SELECT count(*) AS n_terms, CAST(sum(c_e12) AS BIGINT) AS jsd_e12
         FROM c""",
    "q149_nfc_normalize" ->
      """WITH m AS (
           SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS mangled
           FROM documents)
         SELECT doc_id, length(mangled) AS len_raw,
           length(nfc_normalize(mangled)) AS len_nfc,
           md5(nfc_normalize(mangled)) AS nfc_md5
         FROM m""",
    "q76_dedup_keep" -> dedupKeepOracle,
    "q132_pagerank" -> pagerankOracle,
    "q145_kmeans" -> kmeansOracle,
    "q126_bm25" ->
      """WITH base AS (
           SELECT doc_id, len(w) AS dl,
             len(list_filter(w, x -> x = 'spark')) AS tf1,
             len(list_filter(w, x -> x = 'fast')) AS tf2
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents)),
         stats AS (
           SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
             count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
             count(CASE WHEN tf2 > 0 THEN 1 END) AS df2
           FROM base),
         scored AS (
           SELECT doc_id, tf1, tf2, dl,
             ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2)
               / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
             + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2)
               / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
               AS score
           FROM base, stats
           WHERE tf1 > 0 OR tf2 > 0)
         SELECT doc_id, tf1, tf2, dl,
           CAST(floor(score * 1000000.0) AS BIGINT) AS score_e6
         FROM scored ORDER BY score DESC, doc_id LIMIT 50""",
    "q127_perplexity" ->
      s"""WITH $nllCtes
         SELECT doc_id, n_tok, avg_nll_e6 FROM nll""",
    "q272_ngram_novelty" ->
      s"""WITH toks AS (
           SELECT source, $tokenHashesSql AS ht FROM documents),
         g2 AS (
           SELECT DISTINCT source, unnest(list_distinct(
             list_transform(range(1, len(ht)),
               i -> ${gramHash62("i", 2)}))) AS g
           FROM toks WHERE len(ht) >= 2),
         g3 AS (
           SELECT DISTINCT source, unnest(list_distinct(
             list_transform(range(1, len(ht) - 1),
               i -> ${gramHash62("i", 3)}))) AS g
           FROM toks WHERE len(ht) >= 3),
         t2 AS (SELECT DISTINCT g FROM g2 WHERE source = 'src0'),
         r2 AS (SELECT DISTINCT g FROM g2 WHERE source <> 'src0'),
         t3 AS (SELECT DISTINCT g FROM g3 WHERE source = 'src0'),
         r3 AS (SELECT DISTINCT g FROM g3 WHERE source <> 'src0'),
         n2 AS (
           SELECT count(*) AS n_test,
             CAST(sum(CASE WHEN r2.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
           FROM t2 LEFT JOIN r2 ON t2.g = r2.g),
         n3 AS (
           SELECT count(*) AS n_test,
             CAST(sum(CASE WHEN r3.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
           FROM t3 LEFT JOIN r3 ON t3.g = r3.g)
         SELECT CAST(2 AS BIGINT) AS n, n_test, n_novel,
           (n_novel * 1000000) // n_test AS novelty_e6 FROM n2
         UNION ALL
         SELECT CAST(3 AS BIGINT) AS n, n_test, n_novel,
           (n_novel * 1000000) // n_test AS novelty_e6 FROM n3""",
    "q271_dirichlet_ql" ->
      """WITH base AS (
           SELECT doc_id, len(w) AS dl,
             len(list_filter(w, x -> x = 'spark')) AS tf1,
             len(list_filter(w, x -> x = 'fast')) AS tf2
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents)),
         stats AS (
           SELECT CAST(sum(dl) AS BIGINT) AS c,
             CAST(sum(tf1) AS BIGINT) AS cf1,
             CAST(sum(tf2) AS BIGINT) AS cf2
           FROM base),
         scored AS (
           SELECT doc_id, tf1, tf2, dl,
             ln((tf1 + 2000.0 * cf1 / c) / (dl + 2000.0))
             + ln((tf2 + 2000.0 * cf2 / c) / (dl + 2000.0)) AS score
           FROM base, stats
           WHERE tf1 > 0 OR tf2 > 0)
         SELECT doc_id, tf1, tf2, dl,
           CAST(floor(score * 1000000.0) AS BIGINT) AS score_e6
         FROM scored ORDER BY score DESC, doc_id LIMIT 50""",
    "q198_ccnet_buckets" ->
      s"""WITH $nllCtes,
         r AS (
           SELECT doc_id, avg_nll_e6,
             row_number() OVER (ORDER BY avg_nll_e6, doc_id) AS rnk,
             count(*) OVER () AS n
           FROM nll)
         SELECT CASE WHEN rnk * 3 <= n THEN 'head'
                     WHEN rnk * 3 <= n * 2 THEN 'middle'
                     ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(avg_nll_e6) // count(*) AS BIGINT) AS mean_nll_e6,
           min(avg_nll_e6) AS min_nll_e6,
           max(avg_nll_e6) AS max_nll_e6
         FROM r GROUP BY 1""",
    "q199_incremental_dedup" ->
      s"""WITH f AS (SELECT doc_id, md5($normSql) AS fp FROM documents),
         store AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250),
         batch AS (SELECT doc_id, fp FROM f WHERE doc_id >= 250),
         firsts AS (SELECT fp, min(doc_id) AS first_id FROM batch GROUP BY 1)
         SELECT b.doc_id,
           (s.fp IS NOT NULL) AS dup_of_store,
           (b.doc_id <> fi.first_id) AS dup_in_batch,
           (s.fp IS NULL AND b.doc_id = fi.first_id) AS keep
         FROM batch b
         LEFT JOIN store s ON s.fp = b.fp
         JOIN firsts fi ON fi.fp = b.fp""",
    "q200_contamination_report" ->
      s"""WITH sh AS (
           SELECT doc_id, source, unnest(list_distinct(
             list_transform(range(1, len(ht) - 1),
               i -> ${gramHash62("i", 3)}))) AS sh
           FROM (SELECT doc_id, source, $tokenHashesSql AS ht
                 FROM documents)
           WHERE len(ht) >= 3),
         benches AS (
           SELECT DISTINCT source AS bench, sh FROM sh
           WHERE source IN ('src0', 'src1')),
         train AS (SELECT * FROM sh WHERE source NOT IN ('src0', 'src1')),
         dt AS (
           SELECT doc_id, source, count(*) AS n_shingles
           FROM train GROUP BY 1, 2),
         ps AS (SELECT source, count(*) AS n_docs FROM dt GROUP BY 1),
         hits AS (
           SELECT t.doc_id, b.bench, count(*) AS n_shared
           FROM train t JOIN benches b USING (sh) GROUP BY 1, 2),
         cont AS (
           SELECT d.source, h.bench, count(*) AS n_contaminated
           FROM hits h JOIN dt d USING (doc_id)
           WHERE h.n_shared * 10 >= d.n_shingles
           GROUP BY 1, 2)
         SELECT c.source, c.bench, p.n_docs, c.n_contaminated,
           (c.n_contaminated * 1000000) // p.n_docs AS rate_e6
         FROM cont c JOIN ps p USING (source)""",
    "q274_label_noise" ->
      s"""WITH ve AS MATERIALIZED (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
             list_transform(embedding,
               v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS ve
           FROM embeddings),
         flat AS (
           SELECT label, unnest(ve) AS v, generate_subscripts(ve, 1) AS dim
           FROM ve),
         cm AS (
           SELECT label AS c, dim, CAST(sum(v) AS BIGINT) // count(*) AS cv
           FROM flat GROUP BY 1, 2),
         centv AS (SELECT c, list(cv ORDER BY dim) AS ce FROM cm GROUP BY 1),
         asg AS (
           SELECT vec_id, label, c FROM (
             SELECT ve.vec_id, ve.label, centv.c,
               row_number() OVER (PARTITION BY ve.vec_id
                 ORDER BY ${il2Sql("ve.ve", "centv.ce", 64)}, centv.c) AS rn
             FROM ve, centv) WHERE rn = 1)
         SELECT label, count(*) AS n,
           CAST(sum(CASE WHEN c <> label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_disagree,
           (CAST(sum(CASE WHEN c <> label THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000) // count(*) AS noise_e6
         FROM asg GROUP BY 1""",
    "q273_blocking_quality" ->
      """WITH n AS (SELECT count(*) AS n FROM customer),
         tot AS (SELECT n * (n - 1) // 2 AS n_all_pairs FROM n),
         blk AS (
           SELECT CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_blocked_pairs
           FROM (SELECT c_custkey // 100 AS bkt, count(*) AS sz
                 FROM customer GROUP BY 1)),
         truth AS (
           SELECT a.c_custkey AS id1, b.c_custkey AS id2
           FROM customer a JOIN customer b
             ON a.c_custkey < b.c_custkey
            AND abs(len(a.c_name) - len(b.c_name)) <= 1
           WHERE levenshtein(a.c_name, b.c_name) <= 1),
         ts AS (
           SELECT count(*) AS n_true,
             CAST(sum(CASE WHEN id1 // 100 = id2 // 100 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_true_blocked
           FROM truth)
         SELECT n_all_pairs, n_blocked_pairs, n_true, n_true_blocked,
           ((n_all_pairs - n_blocked_pairs) * 1000000) // n_all_pairs
             AS reduction_ratio_e6,
           (n_true_blocked * 1000000) // n_true AS pair_completeness_e6
         FROM tot, blk, ts""",
    "q136_fuzzy_join" ->
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS ed
         FROM customer a JOIN customer b
           ON a.c_custkey < b.c_custkey
          AND abs(len(a.c_name) - len(b.c_name)) <= 1
         WHERE levenshtein(a.c_name, b.c_name) <= 1""",
    "q133_cms_heavy" ->
      """WITH tc AS (
           SELECT t AS term, count(*) AS c FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tc)
         SELECT term, c, TRUE AS no_underestimate, TRUE AS within_eps
         FROM tc, tot WHERE c * 50 > n""",
    "q134_weighted_sample" ->
      """SELECT lang, doc_id, pri FROM (
           SELECT lang, doc_id, pri,
             row_number() OVER (PARTITION BY lang ORDER BY pri, doc_id) AS rn
           FROM (SELECT lang, doc_id,
                   CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)
                     // n_chars AS pri
                 FROM documents WHERE n_chars > 0))
         WHERE rn <= 10""",
    "q98_ann_ivf" -> ivfOracle,
    "q117_ann_recall" -> annRecallOracle,
    "q121_triangles" -> trianglesOracle,
    "q256_link_prediction" -> linkPredictionOracle,
    "q259_incremental_neardup" ->
      s"""WITH ${minhashCtesFor("TRUE")},
         hits AS (
           SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS old_id
           FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
           WHERE a.doc_id < 400 AND b.doc_id >= 400),
         agg AS (
           SELECT new_id, count(*) AS n_matches,
             min(old_id) AS first_match
           FROM hits GROUP BY 1)
         SELECT d.doc_id AS new_id,
           CAST(coalesce(a.n_matches, 0) AS BIGINT) AS n_matches,
           a.first_match,
           a.first_match IS NOT NULL AS is_dup
         FROM documents d LEFT JOIN agg a ON d.doc_id = a.new_id
         WHERE d.doc_id >= 400""",
    "q107_decontaminate" ->
      s"""WITH toks AS (
           SELECT doc_id, source, $tokenHashesSql AS ht
           FROM documents),
         sh AS (
           SELECT doc_id, source,
             list_distinct(list_transform(range(1, len(ht) - 1),
               i -> ${gramHash62("i", 3)})) AS shs
           FROM toks WHERE len(ht) >= 3),
         bench AS (
           SELECT DISTINCT unnest(shs) AS sh FROM sh WHERE source = 'src0'),
         cand AS (
           SELECT doc_id, unnest(shs) AS sh FROM sh WHERE source <> 'src0')
         SELECT c.doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             * 10 >= count(*) AS contaminated
         FROM cand c LEFT JOIN bench b USING (sh)
         GROUP BY c.doc_id""",
    "q116_entropy" ->
      """WITH tc AS (
           SELECT doc_id, term, count(*) AS c FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
           GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
             list(c ORDER BY term) AS cs
           FROM tc GROUP BY 1)
         SELECT doc_id, n,
           CAST(floor(list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, c ->
                 -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))),
             (acc, x) -> acc + x) * 1000000.0) AS BIGINT) AS entropy_e6
         FROM agg""",
    "q209_heavy_phrases_by_source" ->
      s"""WITH base AS (
           SELECT doc_id, source, string_split(lower(text), ' ') AS w,
             $tokenHashesSql AS ht
           FROM documents),
         bg AS (
           SELECT doc_id, source, unnest(range(1, len(ht))) AS i, w, ht
           FROM base WHERE len(ht) >= 2),
         bh AS (
           SELECT doc_id, source, i, ${gramHash62("i", 2)} AS g,
             concat(w[i], ' ', w[i+1]) AS p
           FROM bg),
         tc AS (SELECT source, g, count(*) AS c FROM bh GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                 FROM tc GROUP BY 1),
         heavy AS (
           SELECT tc.source, g, c, n FROM tc JOIN tot USING (source)
           WHERE c * 30 > n),
         rep AS (
           SELECT source, g, p FROM (
             SELECT bh.source, bh.g, bh.p, row_number() OVER (
               PARTITION BY bh.source, bh.g
               ORDER BY bh.doc_id, bh.i) AS rn
             FROM bh JOIN heavy ON bh.source = heavy.source
               AND bh.g = heavy.g)
           WHERE rn = 1)
         SELECT heavy.source, p, c, TRUE AS in_sketch, TRUE AS est_in_band
         FROM heavy JOIN rep ON heavy.source = rep.source
           AND heavy.g = rep.g""",
    "q115_heavy_hitters" ->
      """WITH tc AS (
           SELECT t AS term, count(*) AS c FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tc)
         SELECT term, c, TRUE AS in_sketch, TRUE AS est_in_band
         FROM tc, tot WHERE c * 50 > n""",
    "q112_group_sample" ->
      """SELECT lang, doc_id, h FROM (
           SELECT lang, doc_id, h,
             row_number() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC)
               AS rn
           FROM (SELECT lang, doc_id,
                   CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
                 FROM documents))
         WHERE rn <= 20""",
    "q114_bigram_lm" ->
      """WITH bg AS (
           SELECT w1, w2, count(*) AS c12 FROM (
             SELECT unnest(list_transform(range(1, len(w)),
                 i -> {'w1': w[i], 'w2': w[i+1]}), recursive := true)
             FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
             WHERE len(w) >= 2)
           GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bg GROUP BY 1)
         SELECT b.w1, b.w2, b.c12, c.c1, b.c12 * 1000000 // c.c1 AS p_e6
         FROM bg b JOIN ctx c USING (w1)
         WHERE b.c12 >= 3""",
    "q261_readability" ->
      """SELECT doc_id, n_words, n_sents, n_syll,
           (206835 * n_sents * n_words - 1015 * n_words * n_words
             - 84600 * n_syll * n_sents) // (n_sents * n_words) AS fre_e3
         FROM (
           SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
             CAST(greatest(len(text) - len(replace(text, '.', '')), 1)
               AS BIGINT) AS n_sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
               AS BIGINT) AS n_syll
           FROM documents)""",
    "q262_ppmi" ->
      """WITH toks AS (
           SELECT string_split(lower(text), ' ') AS w FROM documents
           WHERE len(string_split(lower(text), ' ')) >= 2),
         prs AS (
           SELECT unnest(flatten(list_transform(range(1, len(w)), i ->
             CASE WHEN i + 2 <= len(w)
               THEN [{'x': w[i], 'y': w[i+1]}, {'x': w[i], 'y': w[i+2]}]
               ELSE [{'x': w[i], 'y': w[i+1]}] END)), recursive := true)
           FROM toks),
         cc AS (SELECT x, y, count(*) AS c FROM prs GROUP BY 1, 2),
         rowm AS (SELECT x, CAST(sum(c) AS BIGINT) AS row_c FROM cc GROUP BY 1),
         colm AS (SELECT y, CAST(sum(c) AS BIGINT) AS col_c FROM cc GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS np FROM cc)
         SELECT cc.x, cc.y, cc.c, rowm.row_c, colm.col_c,
           cc.c * np * 1000000 // (row_c * col_c) AS ratio_e6
         FROM cc JOIN rowm USING (x) JOIN colm USING (y), tot
         WHERE cc.c >= 5
         ORDER BY ratio_e6 DESC, x, y LIMIT 100""",
    "q258_kneser_ney" ->
      """WITH bg AS MATERIALIZED (
           SELECT w1, w2, count(*) AS c12 FROM (
             SELECT unnest(list_transform(range(1, len(w)),
                 i -> {'w1': w[i], 'w2': w[i+1]}), recursive := true)
             FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
             WHERE len(w) >= 2)
           GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                   count(*) AS nf FROM bg GROUP BY 1),
         cont AS (SELECT w2, count(*) AS nc FROM bg GROUP BY 1),
         tot AS (SELECT count(*) AS tt FROM bg)
         SELECT b.w1, b.w2, b.c12, c.c1, c.nf, co.nc,
           greatest(4 * b.c12 - 3, 0) * tt + 3 * c.nf * co.nc AS p_num,
           4 * c.c1 * tt AS p_den,
           (greatest(4 * b.c12 - 3, 0) * tt + 3 * c.nf * co.nc) * 1000000
             // (4 * c.c1 * tt) AS p_e6
         FROM bg b JOIN ctx c USING (w1) JOIN cont co USING (w2), tot
         WHERE b.c12 >= 3""",
    "q190_dup_spans" ->
      """WITH wins AS (
           SELECT doc_id, pos,
             CAST(concat('0x', substr(md5(substring(text, pos, 48)), 1, 15)) AS BIGINT) AS h
           FROM (SELECT doc_id, text, unnest(range(1, len(text) - 46, 8)) AS pos
                 FROM documents WHERE len(text) >= 48)),
         dup AS (SELECT h FROM wins GROUP BY 1 HAVING count(*) > 1),
         spans AS (SELECT doc_id, pos, pos + 47 AS e FROM wins
                   WHERE h IN (SELECT h FROM dup)),
         isl AS (
           SELECT doc_id, pos, e,
             CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
               THEN 1 ELSE 0 END AS new_island
           FROM spans),
         isl2 AS (
           SELECT doc_id, pos, e,
             CAST(sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
           FROM isl)
         SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end, count(*) AS n_windows
         FROM isl2 GROUP BY doc_id, island""",
    "q108_train_split" ->
      """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM (SELECT lang, n_chars,
                 CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS h
               FROM documents)
         GROUP BY 1, 2""",
    "q110_inverted_index" ->
      """WITH pairs AS (
           SELECT DISTINCT doc_id,
             unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         sh AS (
           SELECT term, doc_id % 16 AS shard, count(*) AS cnt,
             md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS sfp
           FROM pairs GROUP BY 1, 2)
         SELECT term, CAST(sum(cnt) AS BIGINT) AS df,
           md5(string_agg(sfp, ',' ORDER BY shard)) AS postings_fp
         FROM sh GROUP BY 1 HAVING sum(cnt) >= 5""",
    "q111_quantize" ->
      """WITH ex AS (
           SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding) AS v
           FROM embeddings),
         dims AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1),
         qv AS (
           SELECT vec_id, dim,
             CASE WHEN mx = mn THEN CAST(0 AS BIGINT) ELSE
               least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),
                 CAST(floor((CAST(v AS DOUBLE) - CAST(mn AS DOUBLE)) * 255.0
                   / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE))) AS BIGINT)))
             END AS q
           FROM ex JOIN dims USING (dim))
         SELECT vec_id, md5(string_agg(CAST(q AS VARCHAR), ',' ORDER BY dim))
             AS qfp,
           CAST(sum(q) AS BIGINT) AS qsum
         FROM qv GROUP BY 1""",
    "q102_line_dedup" ->
      """WITH sent AS (
           SELECT doc_id, i, s
           FROM (SELECT doc_id, unnest(string_split(text, '.')) AS s,
                   generate_subscripts(string_split(text, '.'), 1) AS i
                 FROM documents)),
         cnt AS (SELECT s, count(*) AS n FROM sent GROUP BY 1)
         SELECT doc_id, md5(string_agg(s, '.' ORDER BY i)) AS fp,
           count(*) AS n_kept
         FROM sent JOIN cnt USING (s) WHERE n <= 3
         GROUP BY doc_id""",
    "q106_packing" ->
      """SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin,
           CAST((cum - n_tokens) % 2048 AS BIGINT) AS offset_in_bin
         FROM (
           SELECT doc_id, lang,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
             sum(CAST(len(string_split(lower(text), ' ')) AS BIGINT))
               OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM documents)""",
    "q105_source_mix" ->
      """SELECT source, count(*) AS n_kept
         FROM documents
         WHERE CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1000
               < (CASE WHEN source = 'src0' THEN 100 WHEN source = 'src1' THEN 800
                       WHEN source = 'src2' THEN 500 ELSE 300 END)
         GROUP BY 1""",
    "q103_repetition" ->
      """SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
           CAST(floor((1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w))
             * 1000000.0) AS BIGINT) AS dup_ratio_e6
         FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)""",
    "q104_curation" -> {
      val hits = TextFunctions.langStopwords.map { case (lang, words) =>
        s"${hitsSql(words)} AS h_$lang"
      }.mkString(", ")
      val stopAll = hitsSql(TextFunctions.langStopwords.flatMap(_._2))
      s"""WITH base AS (
           SELECT doc_id, $hits,
             len(string_split(lower(text), ' ')) AS n_tok,
             $stopAll AS stop_hits,
             md5($normSql) AS fp
           FROM documents),
         scored AS (
           SELECT doc_id,
             CASE WHEN mx = 0 THEN 'und'
                  WHEN h_en = mx THEN 'en' WHEN h_es = mx THEN 'es'
                  WHEN h_fr = mx THEN 'fr' ELSE 'de' END AS lang,
             (n_tok >= 10 AND n_tok <= 100000 AND
              (CASE WHEN n_tok > 0 THEN CAST(stop_hits AS DOUBLE) / n_tok
                    ELSE 0.0 END) > 0.001) AS keep_quality,
             fp
           FROM (SELECT doc_id, h_en, h_es, h_fr, h_de, n_tok, stop_hits, fp,
                   greatest(h_en, h_es, h_fr, h_de) AS mx
                 FROM base)),
         canon AS (SELECT fp, min(doc_id) AS canon_id FROM scored GROUP BY 1)
         SELECT s.doc_id, s.lang, s.keep_quality,
           s.doc_id = c.canon_id AS is_canonical,
           (s.keep_quality AND s.lang = 'en' AND s.doc_id = c.canon_id) AS keep
         FROM scored s JOIN canon c USING (fp)"""
    },
    "q52_lang_id" -> {
      val hits = TextFunctions.langStopwords.map { case (lang, words) =>
        s"${hitsSql(words)} AS h_$lang"
      }.mkString(", ")
      """SELECT doc_id,
           CASE WHEN mx = 0 THEN 'und'
                WHEN h_en = mx THEN 'en' WHEN h_es = mx THEN 'es'
                WHEN h_fr = mx THEN 'fr' ELSE 'de' END AS pred_lang
         FROM (SELECT doc_id, h_en, h_es, h_fr, h_de,
                 greatest(h_en, h_es, h_fr, h_de) AS mx
               FROM (SELECT doc_id, """ + hits + " FROM documents))"
    },
    "q53_quality_score" -> {
      val stopAll = hitsSql(TextFunctions.langStopwords.flatMap(_._2))
      s"""SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(w) AS BIGINT) AS n_tokens,
           round(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS alpha_ratio,
           round(CASE WHEN len(w) > 0
             THEN CAST($stopAll AS DOUBLE) / len(w) ELSE 0.0 END, 6) AS stop_ratio,
           round(CASE WHEN len(w) > 0
             THEN CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w)
             ELSE 0.0 END, 6) AS mean_token_len,
           (len(w) >= 10 AND len(w) <= 100000 AND
            (CASE WHEN len(w) > 0 THEN CAST($stopAll AS DOUBLE) / len(w) ELSE 0.0 END)
              > 0.001) AS keep
         FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents)"""
    },
    "q54_token_count" ->
      """SELECT doc_id,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_alnum
         FROM documents""",
    "q55_fingerprint" ->
      s"SELECT doc_id, md5($normSql) AS fp FROM documents",
    "q56_exact_dedup" ->
      s"""SELECT md5($normSql) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1""",
    "q57_tonal_score" -> {
      val pos = hitsSql(posWords); val neg = hitsSql(negWords)
      s"""SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           round(CASE WHEN len(w) > 0 THEN CAST(p AS DOUBLE)/len(w) ELSE 0.0 END, 6) AS tf_pos,
           round(CASE WHEN len(w) > 0 THEN CAST(n AS DOUBLE)/len(w) ELSE 0.0 END, 6) AS tf_neg,
           round(CASE WHEN len(w) > 0 THEN CAST(p - n AS DOUBLE)/len(w) ELSE 0.0 END, 6) AS sentiment
         FROM (SELECT doc_id, string_split(lower(text), ' ') AS w,
                 $pos AS p, $neg AS n
               FROM documents)"""
    },
    "q58_jaccard_pairs" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(floor(CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) * 1000000.0) AS BIGINT) AS j_e6
         FROM (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS w
               FROM documents WHERE doc_id < 100) a
         JOIN (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS w
               FROM documents WHERE doc_id < 100) b
           ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) > 0.8""",
    "q59_minhash_lsh" -> minhashOracle,
    "q85_scrub" ->
      """SELECT doc_id,
           regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
             '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g') <> text AS changed,
           md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
             '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g')) AS fp
         FROM documents""",
    "q86_bucketed_neardup" -> {
      s"""WITH b AS (
           SELECT e.vec_id,
             sum(CASE WHEN (${dotSql("e.embedding", "p.embedding")}) > 0
                 THEN (CAST(1 AS BIGINT) << CAST(p.vec_id AS INT)) ELSE 0 END) AS bucket
           FROM embeddings e, embeddings p WHERE p.vec_id < 8
           GROUP BY e.vec_id),
         wb AS (
           SELECT e.vec_id, e.embedding, b.bucket
           FROM embeddings e JOIN b ON e.vec_id = b.vec_id)
         SELECT a.vec_id AS id1, w.vec_id AS id2,
           CAST(floor((${dotSql("a.embedding", "w.embedding")})
             / (sqrt(${dotSql("a.embedding", "a.embedding")})
                * sqrt(${dotSql("w.embedding", "w.embedding")})) * 1000000.0) AS BIGINT) AS cos_e6
         FROM wb a JOIN wb w ON a.bucket = w.bucket AND a.vec_id < w.vec_id
         WHERE (${dotSql("a.embedding", "w.embedding")})
             / (sqrt(${dotSql("a.embedding", "a.embedding")})
                * sqrt(${dotSql("w.embedding", "w.embedding")})) > 0.18"""
    },
    "q266_incremental_semdedup" -> {
      s"""WITH b AS (
           SELECT e.vec_id,
             sum(CASE WHEN (${dotSql("e.embedding", "p.embedding")}) > 0
                 THEN (CAST(1 AS BIGINT) << CAST(p.vec_id AS INT)) ELSE 0 END) AS bucket
           FROM embeddings e, embeddings p WHERE p.vec_id < 8
           GROUP BY e.vec_id),
         wb AS (
           SELECT e.vec_id, e.embedding, b.bucket
           FROM embeddings e JOIN b ON e.vec_id = b.vec_id),
         hits AS (
           SELECT n.vec_id AS new_id, count(*) AS n_candidates,
             CAST(floor(max((${dotSql("n.embedding", "o.embedding")})
               / (sqrt(${dotSql("n.embedding", "n.embedding")})
                  * sqrt(${dotSql("o.embedding", "o.embedding")})))
               * 1000000.0) AS BIGINT) AS max_cos_e6
           FROM wb n JOIN wb o ON n.bucket = o.bucket
           WHERE n.vec_id >= 400 AND o.vec_id < 400
           GROUP BY 1)
         SELECT e.vec_id AS new_id,
           CAST(coalesce(h.n_candidates, 0) AS BIGINT) AS n_candidates,
           h.max_cos_e6,
           coalesce(h.max_cos_e6 >= 180000, false) AS is_dup
         FROM embeddings e LEFT JOIN hits h ON e.vec_id = h.new_id
         WHERE e.vec_id >= 400"""
    },
    "q60_simhash" -> simhashOracle,
    "q61_cosine_topk" -> cosineTopkOracle,
    "q62_ann_lsh" -> annLshOracle,
    "q192_set_diversity" -> {
      def mx(set: String) =
        s"""SELECT x.vec_id,
             CAST(floor(max((${dotSql("y.embedding", "x.embedding")})
               / (sqrt(${dotSql("y.embedding", "y.embedding")})
                  * sqrt(${dotSql("x.embedding", "x.embedding")})))
               * 1000000.0) AS BIGINT) AS mx
           FROM $set x JOIN $set y ON y.vec_id <> x.vec_id GROUP BY 1"""
      s"""WITH scored AS (
           SELECT vec_id, embedding,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
               AS score_e6
           FROM embeddings),
         sel AS (
           SELECT vec_id, embedding FROM (
             SELECT vec_id, embedding,
               row_number() OVER (ORDER BY score_e6 DESC, vec_id ASC) AS rnk
             FROM scored) WHERE rnk <= 64),
         rnd AS (
           SELECT vec_id, embedding FROM (
             SELECT vec_id, embedding,
               row_number() OVER (
                 ORDER BY ${h60("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC)
                 AS rnk
             FROM scored) WHERE rnk <= 64),
         selmx AS (${mx("sel")}),
         rndmx AS (${mx("rnd")})
         SELECT 'selected' AS set_name, count(*) AS n,
           CAST(sum(mx) AS BIGINT) // count(*) AS mean_max_cos_e6 FROM selmx
         UNION ALL
         SELECT 'random' AS set_name, count(*) AS n,
           CAST(sum(mx) AS BIGINT) // count(*) AS mean_max_cos_e6 FROM rndmx"""
    },
    "q77_kskip_bigrams" ->
      """SELECT bg, count(*) AS n FROM (
           SELECT unnest(flatten(list_transform(range(1, len(w)),
             i -> list_transform(range(i+1, least(i+3, len(w)) + 1),
               j -> concat(w[i], ' ', w[j]))))) AS bg
           FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
           WHERE len(w) >= 2)
         GROUP BY 1 ORDER BY n DESC, bg ASC LIMIT 30""",
    "q78_ntile" ->
      """SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n,
           round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
         FROM (SELECT c_acctbal,
                 ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
               FROM customer)
         GROUP BY 1""",
    "q79_hash_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 10 = 0""",
    "q82_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(dim - 1 AS BIGINT) AS dim,
           CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS mean_e6,
           count(*) AS n
         FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
               FROM embeddings)
         GROUP BY 1, 2""",
    "q83_tfidf" ->
      """WITH terms AS (
           SELECT doc_id, len(string_split(lower(text), ' ')) AS dl,
             unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         tc AS (
           SELECT doc_id, dl, term, count(*) AS tc
           FROM terms GROUP BY 1, 2, 3),
         df AS (
           SELECT term, count(DISTINCT doc_id) AS df FROM tc GROUP BY 1),
         n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tc)
         SELECT doc_id, term,
           CAST(floor((CAST(tc AS DOUBLE) / dl) * ln(n_docs / df)
             * 1000000000.0) AS BIGINT) AS tfidf_e9
         FROM tc JOIN df USING (term), n
         ORDER BY tfidf_e9 DESC, doc_id ASC, term ASC LIMIT 50""",
    "q84_chunking" ->
      """SELECT doc_id,
           CAST(ci - 1 AS BIGINT) AS chunk_idx,
           CAST(starts[ci] AS BIGINT) AS start,
           CAST(len(list_slice(w, starts[ci], starts[ci] + 31)) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(w, starts[ci], starts[ci] + 31), ' ')) AS chunk_fp
         FROM (
           SELECT doc_id, w, range(1, len(w) + 1, 16) AS starts,
             unnest(range(1, len(range(1, len(w) + 1, 16)) + 1)) AS ci
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
           WHERE len(w) >= 1)""",
    "q63_cosine_neardup" -> {
      s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
           CAST(floor((${dotSql("a.embedding", "b.embedding")})
             / (sqrt(${dotSql("a.embedding", "a.embedding")})
                * sqrt(${dotSql("b.embedding", "b.embedding")})) * 1000000.0) AS BIGINT) AS cos_e6
         FROM (SELECT * FROM embeddings WHERE vec_id < 200) a
         JOIN (SELECT * FROM embeddings WHERE vec_id < 200) b ON a.vec_id < b.vec_id
         WHERE (${dotSql("a.embedding", "b.embedding")})
             / (sqrt(${dotSql("a.embedding", "a.embedding")})
                * sqrt(${dotSql("b.embedding", "b.embedding")})) > 0.25"""
    },

    "q277_bleu_pairs" ->
      s"""WITH docs AS (
           SELECT source, doc_id, $tokenHashesSql AS ht,
             lead($tokenHashesSql) OVER
               (PARTITION BY source ORDER BY doc_id) AS rht
           FROM documents),
         p AS (SELECT source, doc_id, ht, rht FROM docs
               WHERE rht IS NOT NULL),
         cc1 AS (
           SELECT source, doc_id, unnest(list_transform(
             range(1, len(ht) + 1), i -> ${gramHash62("i", 1)})) AS g
           FROM p),
         rr1 AS (
           SELECT doc_id, unnest(list_transform(
             range(1, len(rht) + 1), i -> ${gramHash62("i", 1, "rht")})) AS g
           FROM p),
         cc2 AS (
           SELECT source, doc_id, unnest(list_transform(range(1, len(ht)),
             i -> ${gramHash62("i", 2)})) AS g
           FROM p WHERE len(ht) >= 2),
         rr2 AS (
           SELECT doc_id, unnest(list_transform(range(1, len(rht)),
             i -> ${gramHash62("i", 2, "rht")})) AS g
           FROM p WHERE len(rht) >= 2),
         c1 AS (SELECT source, doc_id, g, count(*) AS c_cand
                FROM cc1 GROUP BY 1, 2, 3),
         r1 AS (SELECT doc_id, g, count(*) AS c_ref FROM rr1 GROUP BY 1, 2),
         c2 AS (SELECT source, doc_id, g, count(*) AS c_cand
                FROM cc2 GROUP BY 1, 2, 3),
         r2 AS (SELECT doc_id, g, count(*) AS c_ref FROM rr2 GROUP BY 1, 2),
         a1 AS (
           SELECT source, CAST(1 AS BIGINT) AS n,
             CAST(sum(c_cand) AS BIGINT) AS tot,
             CAST(sum(least(c_cand, coalesce(c_ref, 0))) AS BIGINT) AS clip
           FROM c1 LEFT JOIN r1 USING (doc_id, g) GROUP BY 1),
         a2 AS (
           SELECT source, CAST(2 AS BIGINT) AS n,
             CAST(sum(c_cand) AS BIGINT) AS tot,
             CAST(sum(least(c_cand, coalesce(c_ref, 0))) AS BIGINT) AS clip
           FROM c2 LEFT JOIN r2 USING (doc_id, g) GROUP BY 1)
         SELECT source, n, tot, clip, (clip * 1000000) // tot AS prec_e6
         FROM a1 WHERE tot > 0
         UNION ALL
         SELECT source, n, tot, clip, (clip * 1000000) // tot AS prec_e6
         FROM a2 WHERE tot > 0""",

    "q278_js_divergence" ->
      """WITH toks AS (
           SELECT source, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         sc AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
         g AS (SELECT tok, CAST(sum(c) AS BIGINT) AS gc FROM sc GROUP BY 1),
         st AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot
                FROM sc GROUP BY 1),
         gt AS (SELECT CAST(sum(c) AS BIGINT) AS gtot FROM sc),
         grid AS (
           SELECT st.source, st.tot, g.tok, g.gc, gt.gtot,
             coalesce(sc.c, 0) AS c
           FROM g CROSS JOIN st CROSS JOIN gt
           LEFT JOIN sc ON sc.source = st.source AND sc.tok = g.tok),
         terms AS (
           SELECT source, tot,
             CASE WHEN c > 0 THEN 1 ELSE 0 END AS inv,
             CASE WHEN c > 0 THEN CAST(floor(
                 (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                 * ln((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                      / (((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                          + (CAST(gc AS DOUBLE) / CAST(gtot AS DOUBLE)))
                         / 2.0))
                 * 1000000000.0) AS BIGINT) ELSE 0 END AS tp,
             CAST(floor(
                 (CAST(gc AS DOUBLE) / CAST(gtot AS DOUBLE))
                 * ln((CAST(gc AS DOUBLE) / CAST(gtot AS DOUBLE))
                      / (((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                          + (CAST(gc AS DOUBLE) / CAST(gtot AS DOUBLE)))
                         / 2.0))
                 * 1000000000.0) AS BIGINT) AS tq
           FROM grid)
         SELECT source, tot, CAST(sum(inv) AS BIGINT) AS vocab,
           CAST(sum(tp) AS BIGINT) AS klp_e9,
           CAST(sum(tq) AS BIGINT) AS klq_e9,
           CAST(sum(tp) + sum(tq) AS BIGINT) AS jsd2_e9
         FROM terms GROUP BY 1, 2""",

    "q284_winnowing" ->
      s"""WITH $winnowFpsCtes,
         sh AS (SELECT fp, count(*) AS ndocs FROM fps GROUP BY 1)
         SELECT doc_id, max(n_grams) AS n_grams, count(*) AS n_fps,
           min(fp) AS fp_min, max(fp) AS fp_max,
           CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared
         FROM fps JOIN sh USING (fp)
         GROUP BY 1""",

    "q294_clustering_coeff" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL
           SELECT id2 AS src, id1 AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         tv AS (
           SELECT zu.z AS src,
             CAST(sum(CASE WHEN c.id1 IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS t_v
           FROM (SELECT src AS z, dst AS u FROM edges) zu
           JOIN (SELECT src AS z, dst AS w FROM edges) zw USING (z)
           LEFT JOIN pairs c ON c.id1 = zu.u AND c.id2 = zw.w
           WHERE zu.u < zw.w
           GROUP BY 1)
         SELECT deg.src AS doc_id, deg, coalesce(t_v, 0) AS t_v,
           (2 * coalesce(t_v, 0) * 1000000) // (deg * (deg - 1)) AS coeff_e6
         FROM deg LEFT JOIN tv ON deg.src = tv.src
         WHERE deg >= 2""",

    "q299_entity_resolution" ->
      """WITH RECURSIVE c AS (
           SELECT c_custkey AS id, c_name AS name, c_custkey // 100 AS bkt
           FROM customer),
         m AS (
           SELECT a.id AS id1, b.id AS id2
           FROM c a JOIN c b ON a.bkt = b.bkt AND a.id < b.id
           WHERE CAST(floor(jaro_winkler_similarity(a.name, b.name) * 1e6)
             AS BIGINT) >= 980000),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM m
           UNION SELECT id2, id1 FROM m),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e
             ON r.dst = e.src WHERE e.dst <> r.src),
         rep AS (
           SELECT src AS id, least(src, min(dst)) AS entity
           FROM reach GROUP BY src),
         ent AS (
           SELECT c.id, c.name, c.bkt, coalesce(rep.entity, c.id) AS entity
           FROM c LEFT JOIN rep USING (id)),
         sz AS (SELECT entity, count(*) AS n_entity FROM ent GROUP BY 1)
         SELECT id, name, bkt, entity, (entity = id) AS is_canonical,
           n_entity
         FROM ent JOIN sz USING (entity)""",

    "q316_modularity" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         m AS (SELECT count(*) AS m FROM pairs),
         w AS (
           SELECT id1 // 50 AS comm, count(*) AS e_c
           FROM pairs WHERE id1 // 50 = id2 // 50 GROUP BY 1),
         deg AS (
           SELECT id, count(*) AS deg FROM (
             SELECT id1 AS id FROM pairs
             UNION ALL SELECT id2 AS id FROM pairs)
           GROUP BY 1),
         dc AS (
           SELECT id // 50 AS comm, CAST(sum(deg) AS BIGINT) AS d_c
           FROM deg GROUP BY 1)
         SELECT dc.comm, coalesce(e_c, 0) AS e_c, d_c, m.m,
           4 * m.m * coalesce(e_c, 0) - d_c * d_c AS q4m2_contrib
         FROM dc LEFT JOIN w ON dc.comm = w.comm, m""",

    "q313_rake" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS word,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos
           FROM documents),
         ph AS (
           SELECT doc_id, pos, word,
             word IN ('the','a','and','of','to','in','is','it','as',
               'for','on','with') AS is_stop,
             CAST(sum(CASE WHEN word IN ('the','a','and','of','to','in',
               'is','it','as','for','on','with') THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS phrase_id
           FROM toks),
         cand AS (
           SELECT doc_id, phrase_id, pos, word
           FROM ph WHERE NOT is_stop AND word <> ''),
         phrases AS (
           SELECT doc_id, phrase_id, count(*) AS plen,
             string_agg(word, ' ' ORDER BY pos) AS phrase
           FROM cand GROUP BY 1, 2 HAVING count(*) <= 3),
         words AS (
           SELECT doc_id, phrase_id, plen,
             unnest(string_split(phrase, ' ')) AS word
           FROM phrases),
         stats AS (
           SELECT word, count(*) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg
           FROM words GROUP BY 1),
         sc AS (
           SELECT doc_id, phrase_id,
             CAST(sum((deg * 1000000) // freq) AS BIGINT) AS score_e6
           FROM words JOIN stats USING (word) GROUP BY 1, 2)
         SELECT phrase, count(*) AS n_occ, max(score_e6) AS score_e6
         FROM sc JOIN phrases USING (doc_id, phrase_id)
         GROUP BY 1 ORDER BY score_e6 DESC, phrase LIMIT 20""",

    "q302_winnow_matches" ->
      s"""WITH $winnowFpsCtes,
         occ AS (
           SELECT fp FROM fps GROUP BY 1 HAVING count(*) <= 16),
         inc AS (SELECT fps.doc_id, fps.fp FROM fps JOIN occ USING (fp))
         SELECT a.doc_id AS id1, b.doc_id AS id2,
           count(*) AS n_shared
         FROM inc a JOIN inc b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 3""",

    "q303_hits" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL
           SELECT id2 AS src, id1 AS dst FROM pairs),
         nodes AS (SELECT DISTINCT src AS id FROM edges),
         h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes),
         a1r AS (
           SELECT e.dst AS id, CAST(sum(h) AS BIGINT) AS raw
           FROM edges e JOIN h0 ON e.src = h0.id GROUP BY 1),
         a1 AS (SELECT id, (raw * 1000000)
                  // (SELECT max(raw) FROM a1r) AS a FROM a1r),
         h1r AS (
           SELECT e.src AS id, CAST(sum(a) AS BIGINT) AS raw
           FROM edges e JOIN a1 ON e.dst = a1.id GROUP BY 1),
         h1 AS (SELECT id, (raw * 1000000)
                  // (SELECT max(raw) FROM h1r) AS h FROM h1r),
         a2r AS (
           SELECT e.dst AS id, CAST(sum(h) AS BIGINT) AS raw
           FROM edges e JOIN h1 ON e.src = h1.id GROUP BY 1),
         a2 AS (SELECT id, (raw * 1000000)
                  // (SELECT max(raw) FROM a2r) AS a FROM a2r),
         h2r AS (
           SELECT e.src AS id, CAST(sum(a) AS BIGINT) AS raw
           FROM edges e JOIN a2 ON e.dst = a2.id GROUP BY 1),
         h2 AS (SELECT id, (raw * 1000000)
                  // (SELECT max(raw) FROM h2r) AS h FROM h2r)
         SELECT a2.id AS doc_id, a2.a AS auth_e6, h2.h AS hub_e6
         FROM a2 JOIN h2 USING (id)""",

    "q295_khop_bfs" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL
           SELECT id2 AS src, id1 AS dst FROM pairs),
         d0 AS (
           SELECT least(min(id1), min(id2)) AS id, CAST(0 AS BIGINT) AS dist
           FROM pairs),
         r1 AS (
           SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
             SELECT id, dist FROM d0
             UNION ALL
             SELECT e.dst AS id, 1 AS dist
             FROM edges e JOIN d0 ON e.src = d0.id AND d0.dist = 0)
           GROUP BY 1),
         r2 AS (
           SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
             SELECT id, dist FROM r1
             UNION ALL
             SELECT e.dst AS id, 2 AS dist
             FROM edges e JOIN r1 ON e.src = r1.id AND r1.dist = 1)
           GROUP BY 1),
         r3 AS (
           SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM (
             SELECT id, dist FROM r2
             UNION ALL
             SELECT e.dst AS id, 3 AS dist
             FROM edges e JOIN r2 ON e.src = r2.id AND r2.dist = 2)
           GROUP BY 1)
         SELECT id AS doc_id, dist FROM r3""",

    "q296_heaps_law" ->
      """WITH nd AS (SELECT max(doc_id) AS mx FROM documents),
         tok AS (
           SELECT least(doc_id * 10 // (mx + 1), 9) AS bucket,
             unnest(string_split(lower(text), ' ')) AS tok
           FROM documents, nd),
         per_bucket AS (
           SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY 1),
         firsts AS (
           SELECT bucket, count(*) AS n_new_types FROM (
             SELECT tok, min(bucket) AS bucket FROM tok GROUP BY 1)
           GROUP BY 1)
         SELECT p.bucket, n_tokens,
           coalesce(n_new_types, 0) AS n_new_types,
           CAST(sum(coalesce(n_new_types, 0)) OVER (ORDER BY p.bucket
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types,
           CAST(sum(n_tokens) OVER (ORDER BY p.bucket
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         FROM per_bucket p LEFT JOIN firsts f ON p.bucket = f.bucket""",

    "q288_psi" ->
      """WITH ev AS (
           SELECT event_type,
             (epoch_us(ts) // 86400000000) % 2 = 0 AS is_ref,
             least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin
           FROM events),
         cnt AS (
           SELECT event_type, bin,
             CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_r,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_c
           FROM ev GROUP BY 1, 2),
         grid AS (
           SELECT event_type, CAST(unnest(range(0, 10)) AS BIGINT) AS bin
           FROM (SELECT DISTINCT event_type FROM ev)),
         tot AS (
           SELECT event_type,
             CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_c
           FROM ev GROUP BY 1),
         terms AS (
           SELECT g.event_type, n_r, n_c,
             CAST(floor(
               ((CAST(coalesce(c_r, 0) + 1 AS DOUBLE) / CAST(n_r + 10 AS DOUBLE))
                - (CAST(coalesce(c_c, 0) + 1 AS DOUBLE) / CAST(n_c + 10 AS DOUBLE)))
               * ln((CAST(coalesce(c_r, 0) + 1 AS DOUBLE) / CAST(n_r + 10 AS DOUBLE))
                    / (CAST(coalesce(c_c, 0) + 1 AS DOUBLE) / CAST(n_c + 10 AS DOUBLE)))
               * 1000000000.0) AS BIGINT) AS term_e9
           FROM grid g
           LEFT JOIN cnt ON g.event_type = cnt.event_type AND g.bin = cnt.bin
           JOIN tot ON g.event_type = tot.event_type)
         SELECT event_type, n_r, n_c,
           CAST(sum(term_e9) AS BIGINT) AS psi_e9
         FROM terms GROUP BY 1, 2, 3""",

    "q285_vocab_richness" ->
      """WITH tc AS (
           SELECT source, tok, count(*) AS c
           FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents)
           GROUP BY 1, 2),
         agg AS (
           SELECT source, count(*) AS v,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(sum(c) AS BIGINT) AS n_tok,
             CAST(sum(c * (c - 1)) AS BIGINT) AS sum_cc1
           FROM tc GROUP BY 1)
         SELECT source, v, f1, f2, n_tok,
           CASE WHEN f2 > 0 THEN v * 100 + (f1 * f1 * 100) // (2 * f2)
                ELSE v * 100 END AS chao1_e2,
           ((sum_cc1 * 1000) // (n_tok - 1) * 1000000) // n_tok
             AS simpson_e9
         FROM agg""",

    "q320_assortativity" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL
           SELECT id2 AS src, id1 AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         st AS (
           SELECT count(*) AS m2,
             CAST(sum(dj.deg * dk.deg) AS BIGINT) AS s_jk,
             CAST(sum(dj.deg + dk.deg) AS BIGINT) AS s_jpk,
             CAST(sum(dj.deg * dj.deg + dk.deg * dk.deg) AS BIGINT) AS s_j2k2
           FROM edges e
           JOIN deg dj ON e.src = dj.src
           JOIN deg dk ON e.dst = dk.src)
         SELECT m2, s_jk, s_jpk, s_j2k2,
           CASE WHEN CAST(s_j2k2 AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0)
                  - (CAST(s_jpk AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0))
                    * (CAST(s_jpk AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0)) > 0.0
             THEN CAST(floor(
               (CAST(s_jk AS DOUBLE) / CAST(m2 AS DOUBLE)
                 - (CAST(s_jpk AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0))
                   * (CAST(s_jpk AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0)))
               / (CAST(s_j2k2 AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0)
                 - (CAST(s_jpk AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0))
                   * (CAST(s_jpk AS DOUBLE) / (CAST(m2 AS DOUBLE) * 2.0)))
               * 1000000.0) AS BIGINT)
             ELSE NULL END AS r_e6
         FROM st""",

    "q321_mutual_nn" -> mutualNnOracle,
    "q347_mutual_nn_scaled" -> mutualNnScaledOracle(200L),
    "q348_hard_negatives" -> hardNegativesOracle(200L),
    "q352_margin_ratio" -> marginRatioOracle(200L, 4),

    "q353_tokenizer_fertility" ->
      """WITH g AS (
           SELECT source, lang, count(*) AS n_docs,
             CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
             CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+')))
               AS BIGINT) AS n_tokens,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
               AS n_words
           FROM documents GROUP BY 1, 2)
         SELECT source, lang, n_docs, n_bytes, n_tokens, n_words,
           n_bytes * 1000 // n_tokens AS bytes_per_tok_e3,
           n_tokens * 1000 // n_words AS fertility_e3
         FROM g WHERE n_tokens > 0 AND n_words > 0""",

    "q354_cell_balance" -> cellBalanceOracle,

    "q377_cdc_savings" ->
      s"""WITH toks374 AS (
           SELECT doc_id, pos - 1 AS pos, tok,
             CASE WHEN ${h60("tok")} % 16 = 0 THEN 1 ELSE 0 END AS cut
           FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
             FROM documents WHERE doc_id < 300)),
         cids AS (
           SELECT doc_id, pos, tok,
             CAST(coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
           FROM toks374),
         chunks AS (
           SELECT doc_id, chunk_id, count(*) AS chunk_len,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
           FROM cids GROUP BY 1, 2),
         per_fp AS (
           SELECT chunk_fp, count(*) AS n_copies,
             CAST(min(chunk_len) AS BIGINT) AS len
           FROM chunks GROUP BY 1)
         SELECT CAST(sum(n_copies * len) AS BIGINT) AS total_tok,
           CAST(sum((n_copies - 1) * len) AS BIGINT) AS dup_tok,
           count(*) AS n_unique_chunks,
           CAST(sum((n_copies - 1) * len) AS BIGINT) * 1000000
             // CAST(sum(n_copies * len) AS BIGINT) AS savings_e6
         FROM per_fp""",

    "q375_centroid_drift" ->
      """WITH q AS (
           SELECT CAST(label AS BIGINT) AS lab, vec_id % 2 = 0 AS even,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
               AS BIGINT) AS v
           FROM embeddings),
         cent AS (
           SELECT lab, even, dim,
             CAST(sum(v) // count(*) AS BIGINT) AS c, count(*) AS n
           FROM q GROUP BY 1, 2, 3),
         p AS (
           SELECT lab, dim,
             max(CASE WHEN even THEN c END) AS ce,
             max(CASE WHEN NOT even THEN c END) AS co,
             max(CASE WHEN even THEN n END) AS ne,
             max(CASE WHEN NOT even THEN n END) AS n_o
           FROM cent GROUP BY 1, 2)
         SELECT lab, CAST(max(ne) AS BIGINT) AS n_even,
           CAST(max(n_o) AS BIGINT) AS n_odd,
           CAST(sum((ce - co) * (ce - co)) AS BIGINT) AS dist2_e12
         FROM p GROUP BY lab""",

    "q376_novelty_curve" ->
      s"""WITH nmax AS (SELECT max(doc_id) AS max_id FROM documents),
         grams AS (
           SELECT least(9, doc_id * 10 // (max_id + 1)) AS dec,
             ${h60("g")} AS h
           FROM (
             SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                 i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS g
             FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                   FROM documents)
             WHERE len(w) >= 3) CROSS JOIN nmax),
         per_dec AS (SELECT DISTINCT dec, h FROM grams),
         first_dec AS (SELECT h, min(dec) AS first_dec FROM per_dec GROUP BY h)
         SELECT dec, count(*) AS n_distinct,
           CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(sum(CASE WHEN first_dec = dec THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // count(*) AS novelty_e6
         FROM per_dec JOIN first_dec USING (h)
         GROUP BY dec""",

    "q373_component_folds" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         comp AS (
           SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id
           FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
           LEFT JOIN rep r USING (doc_id)),
         fold AS (
           SELECT doc_id, rep_id,
             ${h60("concat('fold:', rep_id)")} % 5 AS fold
           FROM comp),
         cpairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         leaks AS (
           SELECT CAST(coalesce(sum(CASE WHEN fa.fold <> fb.fold THEN 1
             ELSE 0 END), 0) AS BIGINT) AS n_leaks
           FROM cpairs p
           JOIN fold fa ON p.id1 = fa.doc_id
           JOIN fold fb ON p.id2 = fb.doc_id)
         SELECT fold, count(*) AS n_docs,
           CAST(count(DISTINCT rep_id) AS BIGINT) AS n_components, n_leaks
         FROM fold CROSS JOIN leaks
         GROUP BY fold, n_leaks""",

    "q374_cdc_chunks" ->
      s"""WITH toks374 AS (
           SELECT doc_id, pos - 1 AS pos, tok,
             CASE WHEN ${h60("tok")} % 16 = 0 THEN 1 ELSE 0 END AS cut
           FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
               generate_subscripts(string_split(lower(text), ' '), 1) AS pos
             FROM documents WHERE doc_id < 300)),
         cids AS (
           SELECT doc_id, pos, tok,
             CAST(coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
           FROM toks374),
         chunks AS (
           SELECT doc_id, chunk_id, count(*) AS chunk_len,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
           FROM cids GROUP BY 1, 2),
         rn AS (
           SELECT *, row_number() OVER (PARTITION BY chunk_fp
             ORDER BY doc_id, chunk_id) AS r
           FROM chunks)
         SELECT chunk_fp, count(*) AS n_copies,
           CAST(min(chunk_len) AS BIGINT) AS chunk_len,
           max(CASE WHEN r = 1 THEN doc_id END) AS first_doc,
           max(CASE WHEN r = 1 THEN chunk_id END) AS first_chunk
         FROM rn GROUP BY chunk_fp
         HAVING count(*) > 1""",

    "q371_split_leakage" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         fold AS (
           SELECT doc_id, ${h60("concat('fold:', doc_id)")} % 5 AS fold
           FROM documents WHERE doc_id < 300),
         j AS (
           SELECT p.id1, p.id2, fa.fold AS f1, fb.fold AS f2
           FROM pairs p
           JOIN fold fa ON p.id1 = fa.doc_id
           JOIN fold fb ON p.id2 = fb.doc_id),
         tot AS (
           SELECT count(*) AS n_pairs,
             CAST(sum(CASE WHEN f1 <> f2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaks
           FROM j)
         SELECT least(f1, f2) AS fa, greatest(f1, f2) AS fb,
           count(*) AS n, n_pairs, n_leaks,
           n_leaks * 1000000 // n_pairs AS leak_rate_e6,
           least(f1, f2) <> greatest(f1, f2) AS is_leak
         FROM j CROSS JOIN tot
         GROUP BY 1, 2, n_pairs, n_leaks""",

    "q372_effective_tokens" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         d AS (
           SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok,
             md5($normSql) AS fp
           FROM documents WHERE doc_id < 300),
         ek AS (
           SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
             AS keep_exact
           FROM d),
         nk AS (
           SELECT d2.doc_id,
             coalesce(r.rep_id, d2.doc_id) = d2.doc_id AS keep_near
           FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d2
           LEFT JOIN rep r USING (doc_id))
         SELECT source, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS raw_tok,
           CAST(sum(CASE WHEN keep_exact THEN ntok ELSE 0 END) AS BIGINT)
             AS exact_tok,
           CAST(sum(CASE WHEN keep_exact AND keep_near THEN ntok ELSE 0 END)
             AS BIGINT) AS near_tok,
           CAST(sum(CASE WHEN keep_exact THEN ntok ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(ntok) AS BIGINT) AS exact_retention_e6,
           CAST(sum(CASE WHEN keep_exact AND keep_near THEN ntok ELSE 0 END)
             AS BIGINT) * 1000000 // CAST(sum(ntok) AS BIGINT)
             AS near_retention_e6
         FROM ek JOIN nk USING (doc_id)
         GROUP BY source""",

    "q370_shuffle_skew_audit" ->
      s"""WITH b AS (
           SELECT ${h60("CAST(user_id AS VARCHAR)")} % 32 AS bucket,
             count(*) AS n
           FROM events GROUP BY 1),
         tot AS (
           SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_buckets,
             CAST(max(n) AS BIGINT) AS max_n
           FROM b)
         SELECT bucket, n, n * 1000000 // total AS share_e6,
           max_n * 1000 // (total // n_buckets) AS skew_e3
         FROM b CROSS JOIN tot""",

    "q369_join_cardinality" ->
      """WITH o AS (
           SELECT o_orderkey AS k, count(*) AS c1 FROM orders GROUP BY 1),
         l AS (
           SELECT l_orderkey AS k, count(*) AS c2 FROM lineitem GROUP BY 1),
         actual AS (
           SELECT CAST(sum(o.c1 * l.c2) AS BIGINT) AS actual_rows
           FROM o JOIN l USING (k)),
         stats AS (
           SELECT (SELECT CAST(sum(c1) AS BIGINT) FROM o) AS n1,
             (SELECT CAST(sum(c2) AS BIGINT) FROM l) AS n2,
             (SELECT count(*) FROM o) AS ndv1,
             (SELECT count(*) FROM l) AS ndv2)
         SELECT actual_rows, n1, n2, ndv1, ndv2,
           n1 * n2 // greatest(ndv1, ndv2) AS estimate_rows,
           (n1 * n2 // greatest(ndv1, ndv2)) * 1000000 // actual_rows
             AS est_over_actual_e6
         FROM actual CROSS JOIN stats""",

    "q367_dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashCtes,
         $componentCtes,
         d AS (
           SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
               AS ntok
           FROM documents WHERE doc_id < 300),
         f AS (
           SELECT d.doc_id, coalesce(r.rep_id, d.doc_id) AS rep_id, d.ntok
           FROM d LEFT JOIN rep r USING (doc_id)),
         b AS (
           SELECT rep_id, doc_id AS best_id FROM (
             SELECT *, row_number() OVER (PARTITION BY rep_id
               ORDER BY ntok DESC, doc_id) AS rn
             FROM f) WHERE rn = 1)
         SELECT f.doc_id, f.rep_id, f.ntok, b.best_id,
           f.doc_id = b.best_id AS is_kept
         FROM f JOIN b USING (rep_id)""",

    "q368_decayed_popularity" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_s,
             CAST(floor(value * 1000) AS BIGINT) AS v_e3
           FROM events),
         anchor AS (SELECT max(ts_s) AS now_s FROM ev),
         scored AS (
           SELECT event_type, event_id,
             (now_s - ts_s) // 604800 AS age_weeks,
             CASE WHEN (now_s - ts_s) // 604800 >= 63 THEN 0
                  ELSE v_e3 >> CAST((now_s - ts_s) // 604800 AS INT)
             END AS decayed_e3
           FROM ev CROSS JOIN anchor)
         SELECT event_type, event_id, age_weeks,
           CAST(decayed_e3 AS BIGINT) AS decayed_e3,
           CAST(rnk AS BIGINT) AS rnk
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                 ORDER BY decayed_e3 DESC, event_id) AS rnk
               FROM scored)
         WHERE rnk <= 10""",

    "q366_lsh_s_curve" ->
      s"""WITH $minhashCtes,
         cpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         sh100 AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shs
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents WHERE doc_id < 300)
           WHERE len(w) >= 3),
         allp AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2,
             CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS inter,
             CAST(len(a.shs) + len(b.shs)
               - len(list_intersect(a.shs, b.shs)) AS BIGINT) AS uni
           FROM sh100 a JOIN sh100 b ON a.doc_id < b.doc_id),
         jt AS (
           SELECT id1, id2, inter, uni,
             CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS j
           FROM allp),
         tt AS (SELECT *, 1.0 - ((j * j) * (j * j)) AS t FROM jt),
         th AS (
           SELECT id1, id2, inter, uni,
             CAST(floor((1.0 - (((t * t) * (t * t)) * ((t * t) * (t * t))))
               * 1000000.0) AS BIGINT) AS theory_e6
           FROM tt),
         joined AS (
           SELECT th.inter, th.uni, th.theory_e6,
             CASE WHEN c.id1 IS NOT NULL THEN 1 ELSE 0 END AS is_cand,
             (th.inter * 1000000 // th.uni) // 100000 AS bkt
           FROM th LEFT JOIN cpairs c
             ON th.id1 = c.id1 AND th.id2 = c.id2)
         SELECT bkt, count(*) AS n_pairs,
           CAST(sum(is_cand) AS BIGINT) AS n_cand,
           CAST(sum(is_cand) AS BIGINT) * 1000000 // count(*) AS cand_rate_e6,
           CAST(sum(theory_e6) AS BIGINT) // count(*) AS mean_theory_e6
         FROM joined GROUP BY bkt""",

    "q365_dedup_method_agreement" ->
      s"""WITH $minhashCtes,
         mpairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         sims AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), j ->
               (CASE WHEN list_sum(list_transform(shs,
                      h -> ((h >> j) % 2) * 2 - 1)) > 0
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
               << j)) AS BIGINT) AS sim
           FROM (
             SELECT doc_id,
               list_transform(string_split(lower(text), ' '),
                 t -> ${h60("t")}) AS shs
             FROM documents WHERE doc_id < 300)),
         sbanded AS (
           SELECT doc_id, sim, band,
             (sim >> CAST(band * 15 AS INT)) & 32767 AS key
           FROM sims, (SELECT unnest(range(0, 4)) AS band)),
         scapped AS (
           SELECT doc_id, sim, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM sbanded QUALIFY rn <= 64),
         spairs AS (
           SELECT id1, id2 FROM (
             SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
               a.sim AS h1, b.sim AS h2
             FROM scapped a JOIN scapped b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
           WHERE bit_count(xor(h1, h2)) <= 6),
         php AS (
           SELECT doc_id, pv, CAST(list_sum(pv) AS BIGINT) // 60 AS pm
           FROM (SELECT doc_id,
                   list_transform(range(0, 60),
                     i -> CAST(ascii(substr(text,
                            CAST(1 + (i * length(text)) // 60 AS INT), 1))
                          AS BIGINT)) AS pv
                 FROM documents
                 WHERE doc_id < 300 AND length(text) >= 60)),
         phh AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN pv[CAST(i + 1 AS INT)] > pm
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS ph
           FROM php),
         pbanded AS (
           SELECT doc_id, ph, band,
             (ph >> CAST(band * 15 AS INT)) & 32767 AS key
           FROM phh, (SELECT unnest(range(0, 4)) AS band)),
         pcapped AS (
           SELECT doc_id, ph, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM pbanded QUALIFY rn <= 64),
         ppairs AS (
           SELECT id1, id2 FROM (
             SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
               a.ph AS h1, b.ph AS h2
             FROM pcapped a JOIN pcapped b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
           WHERE bit_count(xor(h1, h2)) <= 6),
         tagged AS (
           SELECT id1, id2, 'minhash' AS m FROM mpairs
           UNION ALL SELECT id1, id2, 'simhash' FROM spairs
           UNION ALL SELECT id1, id2, 'phash' FROM ppairs),
         sizes AS (SELECT m, count(*) AS n FROM tagged GROUP BY m),
         inter AS (
           SELECT a.m AS m1, b.m AS m2, count(*) AS n_inter
           FROM tagged a JOIN tagged b
             ON a.id1 = b.id1 AND a.id2 = b.id2 AND a.m < b.m
           GROUP BY 1, 2)
         SELECT s1.m AS m1, s2.m AS m2, s1.n AS n1, s2.n AS n2,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) * 1000000
             // (s1.n + s2.n - coalesce(i.n_inter, 0)) AS jaccard_e6
         FROM sizes s1 JOIN sizes s2 ON s1.m < s2.m
         LEFT JOIN inter i ON i.m1 = s1.m AND i.m2 = s2.m""",

    "q364_prefix_cache" ->
      """WITH b AS (
           SELECT substr(text, 1, 32) AS prefix, count(*) AS n
           FROM documents WHERE length(text) >= 32
           GROUP BY 1 HAVING count(*) > 1),
         s AS (
           SELECT prefix, n, 32 * (n - 1) AS saved_chars FROM b),
         tot AS (SELECT CAST(sum(saved_chars) AS BIGINT) AS tot_saved FROM s)
         SELECT prefix, n, CAST(saved_chars AS BIGINT) AS saved_chars,
           CAST(saved_chars AS BIGINT) * 1000000 // tot_saved AS share_e6
         FROM s CROSS JOIN tot""",

    "q363_margin_calibration" ->
      s"""WITH ${marginPairsCtes(200L, 4)},
         lab AS (
           SELECT vec_id, CAST(label AS BIGINT) AS lab FROM embeddings),
         j AS (
           SELECT sp.margin_e6 // 100000 AS bkt,
             CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END AS same
           FROM scored_pairs sp
           JOIN lab la ON sp.id_a = la.vec_id
           JOIN lab lb ON sp.id_b = lb.vec_id)
         SELECT bkt, count(*) AS n_pairs,
           CAST(sum(same) AS BIGINT) AS n_same,
           CAST(sum(same) AS BIGINT) * 1000000 // count(*) AS same_rate_e6
         FROM j GROUP BY bkt""",

    "q362_manifest_diff" ->
      s"""WITH leaves AS (
           SELECT source, doc_id % 10 <> 0 AS in_a,
             ${h60("concat(doc_id, ':', md5(text))")} AS leaf
           FROM documents)
         SELECT source,
           CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           count(*) AS n_b,
           CAST(bit_xor(CASE WHEN in_a THEN leaf ELSE 0 END) AS BIGINT)
             AS digest_a,
           CAST(bit_xor(leaf) AS BIGINT) AS digest_b,
           bit_xor(CASE WHEN in_a THEN leaf ELSE 0 END) <> bit_xor(leaf)
             AS changed
         FROM leaves GROUP BY source""",

    "q361_simhash_neardup" ->
      s"""WITH sims AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60), j ->
               (CASE WHEN list_sum(list_transform(hs,
                      h -> ((h >> j) % 2) * 2 - 1)) > 0
                     THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
               << j)) AS BIGINT) AS sim
           FROM (
             SELECT doc_id,
               list_transform(string_split(lower(text), ' '),
                 t -> ${h60("t")}) AS hs
             FROM documents WHERE doc_id < 300)),
         banded AS (
           SELECT doc_id, sim, band,
             (sim >> CAST(band * 15 AS INT)) & 32767 AS key
           FROM sims, (SELECT unnest(range(0, 4)) AS band)),
         capped AS (
           SELECT doc_id, sim, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM banded QUALIFY rn <= 64),
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
             a.sim AS h1, b.sim AS h2
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         FROM pairs WHERE bit_count(xor(h1, h2)) <= 6""",

    "q360_mauve_cells" ->
      s"""WITH cent AS (
           SELECT label, list(c_e6 ORDER BY dim) AS cvec
           FROM (SELECT label, dim,
                   CAST(floor(avg(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS c_e6
                 FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS dim
                       FROM embeddings)
                 GROUP BY 1, 2)
           GROUP BY label),
         assign AS (
           SELECT vec_id, cell FROM (
             SELECT e.vec_id, c.label AS cell,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY (${dotSql("e.embedding", "c.cvec")})
                   / (sqrt(${dotSql("e.embedding", "e.embedding")})
                      * sqrt(${dotSql("c.cvec", "c.cvec")})) DESC,
                 c.label ASC) AS rn
             FROM embeddings e, cent c) WHERE rn = 1),
         counts AS (
           SELECT cell,
             CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cp,
             CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS cq
           FROM assign GROUP BY cell),
         tot AS (
           SELECT CAST(sum(cp) AS BIGINT) AS np,
             CAST(sum(cq) AS BIGINT) AS nq
           FROM counts),
         terms AS (
           SELECT
             CASE WHEN cp > 0 THEN CAST(floor(
                 (CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                 * ln((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                      / (((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                          + (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)))
                         / 2.0))
                 * 1000000000.0) AS BIGINT) ELSE 0 END AS tp,
             CASE WHEN cq > 0 THEN CAST(floor(
                 (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
                 * ln((CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
                      / (((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
                          + (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)))
                         / 2.0))
                 * 1000000000.0) AS BIGINT) ELSE 0 END AS tq
           FROM counts CROSS JOIN tot)
         SELECT count(*) AS n_cells,
           CAST(sum(tp) AS BIGINT) AS klp_e9,
           CAST(sum(tq) AS BIGINT) AS klq_e9,
           CAST(sum(tp) + sum(tq) AS BIGINT) AS jsd2_e9
         FROM terms""",

    "q359_merkle_manifest" ->
      s"""WITH leaves AS (
           SELECT source,
             ${h60("concat(doc_id, ':', md5(text))")} AS leaf
           FROM documents),
         per_source AS (
           SELECT source, count(*) AS n_docs,
             CAST(bit_xor(leaf) AS BIGINT) AS digest
           FROM leaves GROUP BY source)
         SELECT source AS part, n_docs, digest FROM per_source
         UNION ALL
         SELECT '(ALL)' AS part, CAST(sum(n_docs) AS BIGINT) AS n_docs,
           ${h60("string_agg(source || ':' || digest, '|' ORDER BY source)")}
             AS digest
         FROM per_source""",

    "q358_weak_supervision" ->
      """WITH base AS (
           SELECT doc_id, lower(text) AS tl,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws,
             CAST(length(text) AS BIGINT) AS n_ch
           FROM documents),
         lf AS (
           SELECT doc_id,
             CASE WHEN tl LIKE '%spark%' OR tl LIKE '%fast%' THEN 1
                  WHEN tl LIKE '%slow%' THEN 0 END AS lf1,
             CASE WHEN n_ws > 150 THEN 1 WHEN n_ws < 30 THEN 0 END AS lf2,
             CASE WHEN (n_ch * 10) // n_ws BETWEEN 40 AND 80 THEN 1
                  ELSE 0 END AS lf3
           FROM base),
         m AS (
           SELECT *,
             (CASE WHEN lf1 = 1 THEN 1 ELSE 0 END
              + CASE WHEN lf2 = 1 THEN 1 ELSE 0 END
              + CASE WHEN lf3 = 1 THEN 1 ELSE 0 END) AS v1,
             (CASE WHEN lf1 = 0 THEN 1 ELSE 0 END
              + CASE WHEN lf2 = 0 THEN 1 ELSE 0 END
              + CASE WHEN lf3 = 0 THEN 1 ELSE 0 END) AS v0
           FROM lf),
         mm AS (
           SELECT *, CASE WHEN v1 > v0 THEN 1 WHEN v0 > v1 THEN 0 END AS maj
           FROM m),
         u AS (
           SELECT 'lf_keyword' AS lf, lf1 AS v, maj FROM mm
           UNION ALL SELECT 'lf_length', lf2, maj FROM mm
           UNION ALL SELECT 'lf_meanlen', lf3, maj FROM mm)
         SELECT lf, count(*) AS n_docs,
           count(v) AS n_votes,
           count(v) * 1000000 // count(*) AS coverage_e6,
           CAST(sum(CASE WHEN v = maj THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           CAST(sum(CASE WHEN v IS NOT NULL AND maj IS NOT NULL
                         AND v <> maj THEN 1 ELSE 0 END) AS BIGINT)
             AS n_conflict,
           CASE WHEN count(CASE WHEN v IS NOT NULL AND maj IS NOT NULL
                           THEN 1 END) > 0
             THEN CAST(sum(CASE WHEN v = maj THEN 1 ELSE 0 END) AS BIGINT)
                  * 1000000
                  // count(CASE WHEN v IS NOT NULL AND maj IS NOT NULL
                          THEN 1 END)
             ELSE 0 END AS agree_e6
         FROM u GROUP BY lf""",
    "q349_curriculum" ->
      """WITH s AS (
           SELECT doc_id, source,
             least(2, len(string_split(lower(text), ' ')) // 150) AS stage
           FROM documents),
         r AS (
           SELECT doc_id, source, stage, row_number() OVER (
             PARTITION BY stage, source ORDER BY doc_id) AS rr
           FROM s),
         o AS (
           SELECT doc_id, source, CAST(stage AS BIGINT) AS stage,
             row_number() OVER (ORDER BY stage, rr, source, doc_id) AS pos
           FROM r)
         SELECT doc_id, source, stage, CAST(pos AS BIGINT) AS pos
         FROM o WHERE pos <= 100""",

    "q350_rrf_fusion" -> rrfFusionOracle,

    "q383_jl_distortion" -> jlDistortionOracle,

    "q385_dup_flow_matrix" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         src AS (
           SELECT doc_id, source FROM documents WHERE doc_id < 300),
         j AS (
           SELECT least(sa.source, sb.source) AS src_a,
             greatest(sa.source, sb.source) AS src_b
           FROM pairs p
           JOIN src sa ON p.id1 = sa.doc_id
           JOIN src sb ON p.id2 = sb.doc_id),
         tot AS (SELECT count(*) AS n_pairs FROM j)
         SELECT src_a, src_b, count(*) AS n,
           count(*) * 1000000 // n_pairs AS share_e6,
           src_a = src_b AS self_dup
         FROM j CROSS JOIN tot
         GROUP BY src_a, src_b, n_pairs""",

    "q386_unimax_mix" ->
      """WITH counts AS (
           SELECT source,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tok
           FROM documents GROUP BY source),
         base AS (
           SELECT source, n_tok, n_tok * 2 AS cap_tok,
             CAST(sum(n_tok) OVER () AS BIGINT) // 2 AS budget_tok,
             count(*) OVER () AS n_src,
             CAST(row_number() OVER (ORDER BY n_tok * 2, source)
               AS BIGINT) AS rnk,
             COALESCE(CAST(sum(n_tok * 2) OVER (ORDER BY n_tok * 2, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS cap_pre
           FROM counts),
         flag AS (
           SELECT *,
             cap_tok * (n_src - rnk + 1) <= budget_tok - cap_pre AS capped
           FROM base),
         kk AS (
           SELECT *,
             COALESCE(max(CASE WHEN capped THEN rnk END) OVER (), 0) AS k,
             COALESCE(CAST(sum(CASE WHEN capped THEN cap_tok END) OVER ()
               AS BIGINT), 0) AS cap_sum_k
           FROM flag),
         fin AS (
           SELECT *, CASE WHEN n_src = k THEN 0
             ELSE (budget_tok - cap_sum_k) // (n_src - k) END AS fair
           FROM kk)
         SELECT source, n_tok, cap_tok,
           CASE WHEN capped THEN cap_tok ELSE fair END AS alloc_tok,
           capped,
           (CASE WHEN capped THEN cap_tok ELSE fair END) * 1000000 // n_tok
             AS epochs_e6
         FROM fin""",

    "q387_fs_weights" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         side AS (
           SELECT doc_id, source, lang, n_chars,
             list_distinct(string_split(lower(text), ' ')) AS w,
             string_split(lower(text), ' ')[1] AS tok1
           FROM documents WHERE doc_id < 300),
         feat AS (
           SELECT
             2 * len(list_intersect(s1.w, s2.w)) >=
               len(s1.w) + len(s2.w) - len(list_intersect(s1.w, s2.w))
               AS is_match,
             CASE WHEN s1.source = s2.source THEN 1 ELSE 0 END AS f_source,
             CASE WHEN s1.lang = s2.lang THEN 1 ELSE 0 END AS f_lang,
             CASE WHEN abs(s1.n_chars - s2.n_chars) < 100 THEN 1 ELSE 0 END
               AS f_len,
             CASE WHEN s1.tok1 = s2.tok1 THEN 1 ELSE 0 END AS f_tok1
           FROM pairs p
           JOIN side s1 ON p.id1 = s1.doc_id
           JOIN side s2 ON p.id2 = s2.doc_id),
         agg AS (
           SELECT
             CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
             CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
               AS nu,
             CAST(sum(CASE WHEN is_match THEN f_source END) AS BIGINT)
               AS m_source,
             CAST(sum(CASE WHEN NOT is_match THEN f_source END) AS BIGINT)
               AS u_source,
             CAST(sum(CASE WHEN is_match THEN f_lang END) AS BIGINT) AS m_lang,
             CAST(sum(CASE WHEN NOT is_match THEN f_lang END) AS BIGINT)
               AS u_lang,
             CAST(sum(CASE WHEN is_match THEN f_len END) AS BIGINT) AS m_len,
             CAST(sum(CASE WHEN NOT is_match THEN f_len END) AS BIGINT)
               AS u_len,
             CAST(sum(CASE WHEN is_match THEN f_tok1 END) AS BIGINT) AS m_tok1,
             CAST(sum(CASE WHEN NOT is_match THEN f_tok1 END) AS BIGINT)
               AS u_tok1
           FROM feat),
         un AS (
           SELECT 'source' AS feature, m_source AS ma, u_source AS ua, nm, nu
           FROM agg
           UNION ALL
           SELECT 'lang', m_lang, u_lang, nm, nu FROM agg
           UNION ALL
           SELECT 'len', m_len, u_len, nm, nu FROM agg
           UNION ALL
           SELECT 'tok1', m_tok1, u_tok1, nm, nu FROM agg)
         SELECT feature, ma, ua, nm, nu,
           ma * 1000000 // nm AS m_e6,
           ua * 1000000 // nu AS u_e6,
           CAST(floor(ln(CAST((ma + 1) * (nu + 2) AS DOUBLE)
             / CAST((ua + 1) * (nm + 2) AS DOUBLE)) * 1000000.0) AS BIGINT)
             AS weight_e6
         FROM un""",

    "q389_prf_expansion" ->
      """WITH base AS (
           SELECT doc_id, len(w) AS dl,
             len(list_filter(w, x -> x = 'spark')) AS tf1,
             len(list_filter(w, x -> x = 'fast')) AS tf2
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
                 FROM documents)),
         stats AS (
           SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
             count(CASE WHEN tf1 > 0 THEN 1 END) AS df1,
             count(CASE WHEN tf2 > 0 THEN 1 END) AS df2
           FROM base),
         top AS (
           SELECT doc_id, dl FROM (
             SELECT doc_id, dl,
               ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2)
                 / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
               + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2)
                 / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sum_dl / n_docs)))
                 AS score
             FROM base, stats
             WHERE tf1 > 0 OR tf2 > 0)
           ORDER BY score DESC, doc_id LIMIT 10),
         ex AS (
           SELECT d.doc_id, t.dl,
             unnest(string_split(lower(d.text), ' ')) AS term
           FROM documents d JOIN top t ON d.doc_id = t.doc_id),
         tf AS (
           SELECT doc_id, dl, term, count(*) AS tf
           FROM ex WHERE term NOT IN ('spark', 'fast')
           GROUP BY doc_id, dl, term)
         SELECT term, CAST(sum(tf * 1000000 // dl) AS BIGINT) AS w_e6,
           count(*) AS n_docs_term
         FROM tf GROUP BY term
         ORDER BY w_e6 DESC, term LIMIT 15""",

    "q390_knn_shapley" ->
      s"""WITH tr AS (
           SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id NOT IN (10, 20, 30)),
         q AS (
           SELECT vec_id AS query_id, embedding AS qemb, label AS qlabel
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         scored AS (
           SELECT q.query_id, t.vec_id,
             CAST(CASE WHEN t.label = q.qlabel THEN 1 ELSE 0 END
               AS BIGINT) AS a,
             (${dotSql("t.embedding", "qemb")})
               / (sqrt(${dotSql("t.embedding", "t.embedding")})
                  * sqrt(${dotSql("qemb", "qemb")})) AS cos
           FROM tr t CROSS JOIN q),
         rk AS (
           SELECT query_id, vec_id, a,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS BIGINT) AS dist_rnk,
             count(*) OVER (PARTITION BY query_id) AS n,
             lead(a) OVER (PARTITION BY query_id
               ORDER BY cos DESC, vec_id) AS a_next
           FROM scored),
         terms AS (
           SELECT *, CASE WHEN dist_rnk = n THEN (a * 1000000000) // n
             ELSE ((a - a_next) * 1000000000) // greatest(dist_rnk, 5)
             END AS term_e9
           FROM rk),
         suf AS (
           SELECT query_id, vec_id, dist_rnk, a,
             CAST(sum(term_e9) OVER (PARTITION BY query_id ORDER BY dist_rnk
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS shap_e9
           FROM terms)
         SELECT query_id, val_rnk, vec_id, dist_rnk, a = 1 AS same_label,
           shap_e9
         FROM (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY shap_e9 DESC, vec_id) AS BIGINT) AS val_rnk FROM suf)
         WHERE val_rnk <= 10""",

    "q393_rho_selection" ->
      """WITH dw0 AS (
           SELECT doc_id, source, string_split(lower(text), ' ') AS w
           FROM documents),
         tok AS (
           SELECT doc_id, source, generate_subscripts(w, 1) - 1 AS pos,
             unnest(w) AS term
           FROM dw0),
         uni AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot, count(*) AS v
                 FROM uni),
         runi AS (SELECT term, count(*) AS c_ref FROM tok
                  WHERE source = 'src0' GROUP BY 1),
         rtot AS (SELECT count(*) AS n_ref FROM tok WHERE source = 'src0'),
         j AS (
           SELECT doc_id, source, pos,
             ln(CAST(n_tot AS DOUBLE) / c) AS lnp_tr,
             ln(CAST(n_ref + v AS DOUBLE) / (coalesce(c_ref, 0) + 1))
               AS lnp_ref
           FROM tok JOIN uni USING (term) LEFT JOIN runi USING (term),
             tot, rtot),
         agg AS (
           SELECT doc_id, source, count(*) AS n_tok,
             list(lnp_tr ORDER BY pos) AS lt,
             list(lnp_ref ORDER BY pos) AS lr
           FROM j GROUP BY 1, 2),
         nll AS (
           SELECT doc_id, source, n_tok,
             CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lt),
               (acc, x) -> acc + x) / n_tok * 1000000.0) AS BIGINT) AS nll_e6,
             CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lr),
               (acc, x) -> acc + x) / n_tok * 1000000.0) AS BIGINT)
               AS ref_nll_e6
           FROM agg)
         SELECT source, sel_rnk, doc_id, n_tok, nll_e6, ref_nll_e6, excess_e6
         FROM (SELECT *, nll_e6 - ref_nll_e6 AS excess_e6,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY nll_e6 - ref_nll_e6 DESC, doc_id) AS BIGINT)
               AS sel_rnk
           FROM nll WHERE source <> 'src0')
         WHERE sel_rnk <= 5""",

    "q394_cluster_nmi" ->
      s"""WITH $kmeansCtes,
         cells AS (
           SELECT a.c, CAST(e.label AS BIGINT) AS l, count(*) AS n_cl
           FROM a2 a JOIN embeddings e USING (vec_id)
           GROUP BY 1, 2),
         m AS (
           SELECT c, l, n_cl,
             CAST(sum(n_cl) OVER (PARTITION BY c) AS BIGINT) AS n_c,
             CAST(sum(n_cl) OVER (PARTITION BY l) AS BIGINT) AS n_l,
             CAST(sum(n_cl) OVER () AS BIGINT) AS n
           FROM cells),
         mi AS (
           SELECT max(n) AS n, count(DISTINCT c) AS k,
             count(DISTINCT l) AS n_labels,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(n_cl AS DOUBLE) / n) *
                 ln(CAST(n * n_cl AS DOUBLE) / CAST(n_c * n_l AS DOUBLE))
                 ORDER BY c, l)), (acc, x) -> acc + x) AS mi
           FROM m),
         hcv AS (
           SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(n_c AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / n_c)
               ORDER BY c)), (acc, x) -> acc + x) AS hc
           FROM (SELECT DISTINCT c, n_c, n FROM m)),
         hlv AS (
           SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list((CAST(n_l AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / n_l)
               ORDER BY l)), (acc, x) -> acc + x) AS hl
           FROM (SELECT DISTINCT l, n_l, n FROM m)),
         pur AS (
           SELECT CAST(sum(mx) AS BIGINT) AS n_pure FROM (
             SELECT c, max(n_cl) AS mx FROM m GROUP BY c))
         SELECT n, k, n_labels,
           n_pure * 1000000 // n AS purity_e6,
           CAST(floor(mi * 1000000.0) AS BIGINT) AS mi_e6,
           CAST(floor(hc * 1000000.0) AS BIGINT) AS hc_e6,
           CAST(floor(hl * 1000000.0) AS BIGINT) AS hl_e6,
           CAST(floor((mi * 2.0) / (hc + hl) * 1000000.0) AS BIGINT)
             AS nmi_e6
         FROM mi CROSS JOIN hcv CROSS JOIN hlv CROSS JOIN pur""",

    "q395_topp_coverage" ->
      """WITH voc AS (
           SELECT source, term, count(*) AS c FROM (
             SELECT source, unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
           GROUP BY 1, 2),
         r AS (
           SELECT source, term, c,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY c DESC, term) AS BIGINT) AS rnk,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY c DESC, term
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS tot
           FROM voc)
         SELECT source, count(*) AS n_types, max(tot) AS n_tok,
           min(CASE WHEN cum * 10 >= tot * 9 THEN rnk END) AS types_p90,
           max(CASE WHEN rnk <= 100 THEN cum END) * 1000000 // max(tot)
             AS mass_top100_e6
         FROM r GROUP BY source""",

    "q396_silhouette" ->
      s"""WITH $kmeansCtes,
         dists AS (
           SELECT a.vec_id, a.c, ct.c AS c2,
             CAST((${il2Sql("a.ve", "ct.ce", Similarity.Dim)}) AS BIGINT)
               // 1000 AS d2
           FROM a2 a CROSS JOIN cent2 ct),
         ab AS (
           SELECT vec_id, c,
             min(CASE WHEN c2 = c THEN d2 END) AS a,
             min(CASE WHEN c2 <> c THEN d2 END) AS b
           FROM dists GROUP BY 1, 2),
         sil AS (
           SELECT c, CASE WHEN greatest(a, b) = 0 THEN 0
             ELSE ((b - a) * 1000000) // greatest(a, b) END AS s_e6
           FROM ab)
         SELECT c, count(*) AS n,
           CAST(sum(s_e6) AS BIGINT) // count(*) AS mean_s_e6,
           min(s_e6) AS min_s_e6, max(s_e6) AS max_s_e6
         FROM sil GROUP BY c""",

    "q398_fs_em" -> fsEmOracle,

    "q384_churn_labels" ->
      """WITH ev AS (
           SELECT user_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_s,
             event_type
           FROM events),
         anchor AS (SELECT max(ts_s) AS t0 FROM ev),
         g AS (
           SELECT user_id,
             CAST(sum(CASE WHEN ts_s >= t0 - 4838400 AND ts_s < t0 - 2419200
               THEN 1 ELSE 0 END) AS BIGINT) AS n_feat_events,
             CAST(sum(CASE WHEN ts_s >= t0 - 4838400 AND ts_s < t0 - 2419200
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_feat_purchases,
             CAST(sum(CASE WHEN ts_s >= t0 - 2419200 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_label_events
           FROM ev CROSS JOIN anchor GROUP BY user_id)
         SELECT user_id, n_feat_events, n_feat_purchases,
           n_label_events = 0 AS churned
         FROM g WHERE n_feat_events > 0""",

    "q382_binary_rerank_recall" ->
      s"""WITH codes AS (
           SELECT vec_id, embedding,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                         > 0.0
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS code
           FROM embeddings),
         q AS (
           SELECT vec_id AS query_id, code AS qcode, embedding AS qemb
           FROM codes WHERE vec_id IN (10, 20, 30)),
         cand AS (
           SELECT query_id, vec_id, embedding, qemb FROM (
             SELECT q.query_id, c.vec_id, c.embedding, q.qemb,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY bit_count(xor(c.code, q.qcode)), c.vec_id) AS hrnk
             FROM codes c, q WHERE c.vec_id <> q.query_id)
           WHERE hrnk <= 50),
         rr AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY (${dotSql("embedding", "qemb")})
                   / (sqrt(${dotSql("embedding", "embedding")})
                      * sqrt(${dotSql("qemb", "qemb")})) DESC,
                 vec_id ASC) AS rnk
             FROM cand)
           WHERE rnk <= 10),
         qe AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         bf AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT qe.query_id, e.vec_id,
               row_number() OVER (PARTITION BY qe.query_id
                 ORDER BY (${dotSql("e.embedding", "qe.qemb")})
                   / (sqrt(${dotSql("e.embedding", "e.embedding")})
                      * sqrt(${dotSql("qe.qemb", "qe.qemb")})) DESC,
                 e.vec_id ASC) AS rnk
             FROM embeddings e, qe WHERE e.vec_id <> qe.query_id)
           WHERE rnk <= 10)
         SELECT bf.query_id, count(*) AS k,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // count(*) AS recall_e6
         FROM bf LEFT JOIN rr h
           ON bf.query_id = h.query_id AND bf.neighbor_id = h.neighbor_id
         GROUP BY bf.query_id""",

    "q381_binary_recall" ->
      s"""WITH codes AS (
           SELECT vec_id,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE)
                         > 0.0
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS code
           FROM embeddings),
         q AS (
           SELECT vec_id AS query_id, code AS qcode
           FROM codes WHERE vec_id IN (10, 20, 30)),
         ham AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT q.query_id, c.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY bit_count(xor(c.code, q.qcode)), c.vec_id) AS rnk
             FROM codes c, q WHERE c.vec_id <> q.query_id)
           WHERE rnk <= 10),
         qe AS (
           SELECT vec_id AS query_id, embedding AS qemb
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         bf AS (
           SELECT query_id, vec_id AS neighbor_id FROM (
             SELECT qe.query_id, e.vec_id,
               row_number() OVER (PARTITION BY qe.query_id
                 ORDER BY (${dotSql("e.embedding", "qe.qemb")})
                   / (sqrt(${dotSql("e.embedding", "e.embedding")})
                      * sqrt(${dotSql("qe.qemb", "qe.qemb")})) DESC,
                 e.vec_id ASC) AS rnk
             FROM embeddings e, qe WHERE e.vec_id <> qe.query_id)
           WHERE rnk <= 10)
         SELECT bf.query_id, count(*) AS k,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN h.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) * 1000000 // count(*) AS recall_e6
         FROM bf LEFT JOIN ham h
           ON bf.query_id = h.query_id AND bf.neighbor_id = h.neighbor_id
         GROUP BY bf.query_id""",

    "q380_scrub_residual" ->
      """WITH s AS (
           SELECT text,
             regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
               '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g') AS scrubbed
           FROM documents)
         SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN scrubbed <> text THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(sum(CASE WHEN regexp_matches(scrubbed, '[0-9]')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_residual_digits,
           CAST(sum(CASE WHEN regexp_matches(scrubbed,
             '[a-zA-Z0-9.]+@[a-zA-Z0-9.]+') THEN 1 ELSE 0 END) AS BIGINT)
             AS n_residual_emails
         FROM s""",

    "q378_fusion_provenance" ->
      s"""SELECT query_id, count(*) AS n,
           CAST(sum(CASE WHEN r_dense IS NOT NULL AND r_sparse IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS dense_only,
           CAST(sum(CASE WHEN r_dense IS NULL AND r_sparse IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS sparse_only,
           CAST(sum(CASE WHEN r_dense IS NOT NULL AND r_sparse IS NOT NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS both_lists
         FROM ($rrfFusionOracle) GROUP BY query_id""",

    "q351_ndcg_mrr" ->
      s"""WITH q AS (
           SELECT vec_id AS query_id, embedding AS qemb,
             CAST(label AS BIGINT) AS qlab
           FROM embeddings WHERE vec_id IN (10, 20, 30)),
         c AS (
           SELECT q.query_id, q.qlab, e.vec_id AS cand_id,
             CAST(e.label AS BIGINT) AS clab,
             (${dotSql("e.embedding", "q.qemb")})
               / (sqrt(${dotSql("e.embedding", "e.embedding")})
                  * sqrt(${dotSql("q.qemb", "q.qemb")})) AS cos
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         r AS (
           SELECT query_id, cand_id, qlab, clab,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rnk
           FROM c QUALIFY rnk <= 10),
         g AS (
           SELECT query_id, rnk,
             CASE WHEN clab = qlab THEN 3
                  WHEN abs(clab - qlab) = 1 THEN 1 ELSE 0 END AS rel
           FROM r),
         w(pos, w_e6) AS (VALUES
           (1, 1000000), (2, 630929), (3, 500000), (4, 430676),
           (5, 386852), (6, 356207), (7, 333333), (8, 315464),
           (9, 301029), (10, 289064)),
         i AS (
           SELECT query_id, rnk, rel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rel DESC, rnk) AS irnk
           FROM g),
         j AS (
           SELECT i.query_id, i.rel, i.rnk,
             wr.w_e6 AS wr_e6, wi.w_e6 AS wi_e6
           FROM i JOIN w wr ON i.rnk = wr.pos JOIN w wi ON i.irnk = wi.pos)
         SELECT query_id,
           CAST(sum(rel * wr_e6) AS BIGINT) AS dcg_e6,
           CAST(sum(rel * wi_e6) AS BIGINT) AS idcg_e6,
           CAST(CASE WHEN sum(rel * wi_e6) > 0
                THEN sum(rel * wr_e6) * 1000000 // sum(rel * wi_e6)
                ELSE 0 END AS BIGINT) AS ndcg_e6,
           CAST(coalesce(
             1000000 // min(CASE WHEN rel > 0 THEN rnk END), 0) AS BIGINT)
             AS rr_e6
         FROM j GROUP BY query_id""",

    "q324_trustrank" ->
      s"""WITH $minhashCtes,
         pairs AS MATERIALIZED (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         edges AS (
           SELECT id1 AS src, id2 AS dst FROM pairs
           UNION ALL
           SELECT id2 AS src, id1 AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         nodes AS (SELECT src AS node, deg, src < 20 AS is_seed FROM deg),
         ns AS (SELECT CAST(sum(CASE WHEN is_seed THEN 1 ELSE 0 END)
                  AS BIGINT) AS ns FROM nodes),
         sb AS MATERIALIZED (
           SELECT node, deg, is_seed,
             CASE WHEN is_seed THEN 1000000 // ns ELSE CAST(0 AS BIGINT) END
               AS s_e6
           FROM nodes, ns),
         v0 AS (SELECT node, s_e6 AS v_e6 FROM sb),
         i1 AS (SELECT e.dst, CAST(sum(v.v_e6 // d.deg) AS BIGINT) AS inflow
                FROM edges e JOIN v0 v ON e.src = v.node
                JOIN deg d ON e.src = d.src GROUP BY 1),
         v1 AS (SELECT sb.node,
                  (15 * sb.s_e6) // 100
                    + (85 * coalesce(i1.inflow, 0)) // 100 AS v_e6
                FROM sb LEFT JOIN i1 ON sb.node = i1.dst),
         i2 AS (SELECT e.dst, CAST(sum(v.v_e6 // d.deg) AS BIGINT) AS inflow
                FROM edges e JOIN v1 v ON e.src = v.node
                JOIN deg d ON e.src = d.src GROUP BY 1),
         v2 AS (SELECT sb.node,
                  (15 * sb.s_e6) // 100
                    + (85 * coalesce(i2.inflow, 0)) // 100 AS v_e6
                FROM sb LEFT JOIN i2 ON sb.node = i2.dst),
         i3 AS (SELECT e.dst, CAST(sum(v.v_e6 // d.deg) AS BIGINT) AS inflow
                FROM edges e JOIN v2 v ON e.src = v.node
                JOIN deg d ON e.src = d.src GROUP BY 1),
         v3 AS (SELECT sb.node,
                  (15 * sb.s_e6) // 100
                    + (85 * coalesce(i3.inflow, 0)) // 100 AS v_e6
                FROM sb LEFT JOIN i3 ON sb.node = i3.dst)
         SELECT sb.node AS doc_id, sb.deg, sb.is_seed, v3.v_e6 AS trust_e6
         FROM sb JOIN v3 ON sb.node = v3.node""",

    "q326_umass_coherence" ->
      """WITH dt AS MATERIALIZED (
           SELECT DISTINCT source, doc_id, term FROM (
             SELECT source, doc_id,
               unnest(string_split(lower(text), ' ')) AS term
             FROM documents)),
         dfr AS (SELECT source, term, count(*) AS df FROM dt GROUP BY 1, 2),
         top AS MATERIALIZED (
           SELECT source, term, df, rk FROM (
             SELECT *, row_number() OVER (PARTITION BY source
               ORDER BY df DESC, term ASC) AS rk
             FROM dfr) WHERE rk <= 5),
         dtop AS (
           SELECT dt.source, dt.doc_id, dt.term
           FROM dt JOIN top ON dt.source = top.source AND dt.term = top.term),
         co AS (
           SELECT a.source, a.term AS t1, b.term AS t2, count(*) AS d12
           FROM dtop a JOIN dtop b
             ON a.source = b.source AND a.doc_id = b.doc_id
               AND a.term < b.term
           GROUP BY 1, 2, 3),
         prs AS (
           SELECT l.source, least(l.term, m.term) AS t1,
             greatest(l.term, m.term) AS t2, l.df AS dfl
           FROM top l JOIN top m
             ON l.source = m.source AND l.rk < m.rk),
         scored AS (
           SELECT prs.source,
             CAST(floor(ln(CAST(coalesce(d12, 0) + 1 AS DOUBLE)
               / CAST(dfl AS DOUBLE)) * 1000000000.0) AS BIGINT) AS term_e9
           FROM prs LEFT JOIN co ON prs.source = co.source
             AND prs.t1 = co.t1 AND prs.t2 = co.t2)
         SELECT source, count(*) AS n_pairs,
           CAST(sum(term_e9) AS BIGINT) AS coherence_e9
         FROM scored GROUP BY 1""",

    "q328_burrows_delta" ->
      """WITH st AS MATERIALIZED (
           SELECT source, term, count(*) AS c FROM (
             SELECT source, unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
           GROUP BY 1, 2),
         src_tot AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS tot
           FROM st GROUP BY 1),
         top AS (
           SELECT term FROM (
             SELECT term, CAST(sum(c) AS BIGINT) AS gc,
               row_number() OVER (ORDER BY sum(c) DESC, term ASC) AS rk
             FROM st GROUP BY term) WHERE rk <= 20),
         f AS (
           SELECT st.source, st.term, (st.c * 1000000) // tot AS f_e6
           FROM st JOIN top ON st.term = top.term
           JOIN src_tot ON st.source = src_tot.source),
         grid AS MATERIALIZED (
           SELECT s.source, t.term, coalesce(f.f_e6, 0) AS f_e6
           FROM (SELECT source FROM src_tot) s
           CROSS JOIN top t
           LEFT JOIN f ON f.source = s.source AND f.term = t.term),
         sigma AS (
           SELECT term,
             CAST(count(*) * sum(f_e6 * f_e6) - sum(f_e6) * sum(f_e6)
               AS DOUBLE)
               / CAST(count(*) * count(*) AS DOUBLE) AS v
           FROM grid GROUP BY 1),
         prs AS (
           SELECT a.source AS src_a, b.source AS src_b, a.term,
             CAST(floor(CAST(abs(a.f_e6 - b.f_e6) AS DOUBLE) / sqrt(v)
               * 1000000.0) AS BIGINT) AS t_e6
           FROM grid a
           JOIN grid b ON a.term = b.term AND a.source < b.source
           JOIN sigma ON sigma.term = a.term
           WHERE v > 0.0)
         SELECT src_a, src_b, count(*) AS n_terms,
           CAST(sum(t_e6) AS BIGINT) AS delta_sum_e6
         FROM prs GROUP BY 1, 2""",

    "q331_negative_sampling" ->
      """WITH tok AS MATERIALIZED (
           SELECT doc_id,
             generate_subscripts(string_split(lower(text), ' '), 1) - 1
               AS pos,
             unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         vocab AS (
           SELECT term, count(*) AS c,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)
               * sqrt(CAST(count(*) AS DOUBLE))) * 1000) AS BIGINT) AS w
           FROM tok GROUP BY 1),
         ranges AS (
           SELECT term, w,
             CAST(sum(w) OVER (ORDER BY term ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS hi
           FROM vocab),
         r2 AS (SELECT term, w, hi, hi - w AS lo FROM ranges),
         tot AS (SELECT max(hi) AS wtot FROM r2),
         draws AS (
           SELECT t.doc_id, t.pos, j.j,
             CAST(concat('0x', substr(md5(
               concat_ws(':', t.doc_id, t.pos, j.j)), 1, 15)) AS BIGINT)
               % wtot AS h
           FROM tok t
           CROSS JOIN (SELECT unnest([1, 2]) AS j) j
           CROSS JOIN tot
           WHERE t.pos < 5)
         SELECT r2.term AS neg, r2.w, count(*) AS n_draws
         FROM draws JOIN r2 ON h >= lo AND h < hi
         GROUP BY 1, 2""",

    "q333_good_turing" ->
      """WITH tc AS (
           SELECT term, count(*) AS c FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS term
             FROM documents)
           GROUP BY 1),
         coc AS (SELECT c, count(*) AS n_c FROM tc GROUP BY 1),
         nxt AS (SELECT c - 1 AS c, n_c AS n_c1 FROM coc)
         SELECT coc.c, coc.n_c, coalesce(nxt.n_c1, 0) AS n_c1,
           ((coc.c + 1) * coalesce(nxt.n_c1, 0) * 1000000) // coc.n_c
             AS c_star_e6
         FROM coc LEFT JOIN nxt ON coc.c = nxt.c
         WHERE coc.c <= 5""",

    "q334_brier_bins" ->
      """WITH base AS (
           SELECT greatest(0, least(1000,
               CAST(floor((CAST(embedding[1] AS DOUBLE) + 1.0) / 2.0
                 * 1000) AS BIGINT))) AS p_e3,
             label % 2 = 1 AS pos
           FROM embeddings),
         b2 AS (
           SELECT p_e3, pos,
             CASE WHEN pos THEN 1000 ELSE 0 END AS o_e3,
             least(p_e3 // 100, 9) AS bucket
           FROM base)
         SELECT bucket, count(*) AS n,
           CAST(sum(p_e3) AS BIGINT) AS sp_e3,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(p_e3) AS BIGINT) // count(*) AS fbar_e3,
           (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             // count(*) AS obar_e3,
           CAST(sum(p_e3) AS BIGINT) // count(*)
             - (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                * 1000) // count(*) AS gap_e3,
           CAST(sum((p_e3 - o_e3) * (p_e3 - o_e3)) AS BIGINT)
             AS brier_sum_e6
         FROM b2 GROUP BY 1""",

    "q337_roc_points" ->
      """WITH per AS (
           SELECT CAST(floor((CAST(embedding[1] AS DOUBLE) + 1.0)
               / 2.0 * 10) AS BIGINT) AS bkt,
             CAST(sum(CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS np,
             CAST(sum(CASE WHEN label % 2 = 1 THEN 0 ELSE 1 END)
               AS BIGINT) AS nn
           FROM embeddings GROUP BY 1),
         tot AS (
           SELECT CAST(sum(np) AS BIGINT) AS p_tot,
             CAST(sum(nn) AS BIGINT) AS n_tot
           FROM per),
         cum AS (
           SELECT bkt,
             CAST(sum(np) OVER (ORDER BY bkt DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
             CAST(sum(nn) OVER (ORDER BY bkt DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
           FROM per)
         SELECT bkt AS threshold_bkt, tp, fp,
           (tp * 1000000) // p_tot AS tpr_e6,
           (fp * 1000000) // n_tot AS fpr_e6
         FROM cum, tot""")
}
