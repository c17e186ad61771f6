package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal
import graft.streaming.Sessionize

/** Multimodal-column plumbing + sessionization queries. Binary payloads are
  * derived from document text (UTF-8 bytes) so the stub decoder's
  * deterministic outputs are SQL-replayable by the oracle.
  */
object Media {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private def mediaDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"), col("text").cast("binary").as("payload"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column -> typed metadata struct via partition-batched decode
    // (real javax.imageio decode for image payloads; the text payloads
    // here take the deterministic fallback so the oracle can replay it —
    // MultimodalSpec drives the same path over real PNG bytes).
    "q64_multimodal_meta" -> ((s, d) => {
      Multimodal.withDecodedMeta(mediaDocs(s, d), "payload")
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").cast("long").as("width"),
          col("meta.height").cast("long").as("height"),
          col("meta.channels").cast("long").as("channels"),
          col("meta.n_bytes").as("n_bytes"))
    }),

    // frame sampling: media row -> (frame_idx, frame) rows.
    "q65_frame_sample" -> ((s, d) => {
      Multimodal.withFrames(mediaDocs(s, d), "payload", 4)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame")).cast("long").as("frame_len"))
    }),

    // batched feature extraction over binary payloads (F10 batch-inference
    // shape): one fake model call per 64-item batch, 16 features per item.
    "q101_media_features" -> ((s, d) => {
      Multimodal.withFeatureRows(mediaDocs(s, d), "payload", 16, 64)
        .select(col("doc_id"), col("j"), col("feat"))
    }),

    // Perceptual-hash near-duplicate candidates — the image-dedup pass a
    // multimodal corpus runs (aHash fingerprint → Hamming-ball match),
    // with the decode stubbed to the deterministic byte sampler
    // (Multimodal.withPerceptualHash) so the oracle replays it. The
    // 60-bit hash splits into 4×15-bit bands (any shared band pairs the
    // docs — Hamming-LSH, same posture as the MinHash bands), bucket
    // occupancy capped at 64 (Dedup.lshCandidatePairs' cap: pair count
    // is quadratic in bucket size), then the exact Hamming distance
    // filters candidates at ≤ 6 bits. Scale shape: map-side hash, one
    // (band, key) shuffle, capped buckets — never all-pairs.
    "q355_phash_neardup" -> ((s, d) => {
      graft.operators.Dedup.hammingBandPairs(
        Multimodal.withPerceptualHash(
          t(s, d, "documents").where(length(col("text")) >= 60)
            .select(col("doc_id"), col("text")), "text", "ph"),
        "doc_id", "ph", nBands = 4, bandBits = 15, cap = 64, maxHamming = 6)
    }),

    // q355's corpus-scaled twin (the q321→q347 pattern): a 120-bit
    // perceptual hash banded as 4×30 bits. The fixed 60-bit form's
    // 15-bit band keyspace saturates at n ≈ 2^15 docs (measured: pairs
    // ×27.7 for docs ×8.1 sf0.1→sf1); 30-bit bands defer the n²/B
    // collision regime by 2^15 — at sf1 the candidate set drops from
    // 2.1 M pairs to the genuinely-close handful. Hamming cut scales
    // with the hash width (≤ 12 of 120). Same capped-bucket join.
    "q356_phash_scaled" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hashed = Multimodal.withPerceptualHash120(
          t(s, d, "documents").where(length(col("text")) >= 120)
            .select(col("doc_id"), col("text")), "text", "ph0", "ph1")
        .select(col("doc_id"), col("ph0"), col("ph1"))
      val banded = hashed
        .select(col("doc_id"), col("ph0"), col("ph1"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("key", expr(
          """CASE WHEN band < 2 THEN shiftright(ph0, band * 30)
             ELSE shiftright(ph1, (band - 2) * 30) END & 1073741823L"""))
      val w = Window.partitionBy("band", "key").orderBy("doc_id")
      val capped = banded.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 64).drop("rn")
      capped.as("a").join(capped.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          col("a.ph0").as("h0a"), col("a.ph1").as("h1a"),
          col("b.ph0").as("h0b"), col("b.ph1").as("h1b"))
        .distinct()
        .withColumn("hamming", expr(
          "cast(bit_count(h0a ^ h0b) + bit_count(h1a ^ h1b) as bigint)"))
        .where(col("hamming") <= 12L)
        .select("id1", "id2", "hamming")
    }),

    // Frame-energy segmentation — the voice-activity-detection shape of
    // an audio pipeline (frame the signal, energy per frame, adaptive
    // threshold, then gaps-and-islands for voiced segments): 8 frames ×
    // 8 samples ride ONE graft_char_sample(text, 64) pass (the stub
    // "PCM decode", q64/q65 convention), a frame is voiced when its
    // energy exceeds the doc mean (energy·8 > total — exact integers),
    // and the longest voiced run is the islands trick (f − row_number,
    // doc-KEYED window). Scale shape: map-side decode, one doc_id-keyed
    // window + two keyed groupBys; 8 rows per doc.
    "q357_frame_energy" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = t(s, d, "documents").where(length(col("text")) >= 64)
        .select(col("doc_id"), expr("graft_char_sample(text, 64)").as("pv"))
        .withColumn("tot", expr("aggregate(pv, 0L, (a, x) -> a + x)"))
      val frames = base.select(col("doc_id"), col("pv"), col("tot"),
          explode(expr("sequence(0, 7)")).as("f"))
        .withColumn("energy", expr(
          """aggregate(transform(sequence(f * 8, f * 8 + 7),
               i -> element_at(pv, i + 1)), 0L, (a, x) -> a + x)"""))
        .where(col("energy") * 8 > col("tot"))
        .select(col("doc_id"), col("f").cast("long").as("f"))
      val w = Window.partitionBy("doc_id").orderBy("f")
      frames.withColumn("grp", col("f") - row_number().over(w))
        .groupBy("doc_id", "grp").agg(count(lit(1)).as("run_len"))
        .groupBy("doc_id")
        .agg(sum("run_len").as("n_voiced"), max("run_len").as("longest_run"))
    }),

    // gap-based sessionization (batch form; streaming twin in Sessionize).
    "q66_sessionize" -> ((s, d) => {
      Sessionize.batch(t(s, d, "events"), 1800)
        .select(col("event_id"), col("session_id"))
    }),

    // session-level rollup over the q66 sessions: duration, event count
    // and conversion flag per (user, session) — the analytics layer a
    // product team reads (bounce/conversion rates are one more GROUP BY
    // away). Same single user_id shuffle as q66; the rollup rides the
    // existing partitioning.
    "q178_session_stats" -> ((s, d) => {
      Sessionize.batch(t(s, d, "events"), 1800)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(unix_timestamp(col("ts"))).as("start_s"),
          max(unix_timestamp(col("ts"))).as("end_s"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("has_purchase"))
        .withColumn("dur_s", col("end_s") - col("start_s"))
    }))

  /** Shared sessionization CTEs (lag -> gap mark -> cumsum session id),
    * mirroring `Sessionize.batch(gap = 1800)` — one definition feeding
    * both the q66 and q178 oracles so the gap rule and (ts, event_id)
    * tie-break cannot drift between them.
    */
  private def sessionCtes: String =
    """lagd AS (
           SELECT event_id, user_id, ts, event_type,
             lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         marks AS (
           SELECT event_id, user_id, ts, event_type,
             CASE WHEN prev_ts IS NULL
                    OR CAST(floor(date_part('epoch', ts)) AS BIGINT)
                       - CAST(floor(date_part('epoch', prev_ts)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
           FROM lagd),
         sess AS (
           SELECT event_id, user_id, ts, event_type,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM marks)"""

  val oracles: Map[String, String] = Map(
    "q355_phash_neardup" ->
      """WITH hp AS (
           SELECT doc_id, pv, CAST(list_sum(pv) AS BIGINT) // 60 AS pm
           FROM (SELECT doc_id,
                   list_transform(range(0, 60),
                     i -> CAST(ascii(substr(text,
                            CAST(1 + (i * length(text)) // 60 AS INT), 1))
                          AS BIGINT)) AS pv
                 FROM documents WHERE length(text) >= 60)),
         h AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN pv[CAST(i + 1 AS INT)] > pm
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS ph
           FROM hp),
         banded AS (
           SELECT doc_id, ph, band,
             (ph >> CAST(band * 15 AS INT)) & 32767 AS key
           FROM h, (SELECT unnest(range(0, 4)) AS band)),
         capped AS (
           SELECT doc_id, ph, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM banded QUALIFY rn <= 64),
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
             a.ph AS h1, b.ph AS h2
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
         FROM pairs WHERE bit_count(xor(h1, h2)) <= 6""",

    "q356_phash_scaled" ->
      """WITH hp AS (
           SELECT doc_id, pv, CAST(list_sum(pv) AS BIGINT) // 120 AS pm
           FROM (SELECT doc_id,
                   list_transform(range(0, 120),
                     i -> CAST(ascii(substr(text,
                            CAST(1 + (i * length(text)) // 120 AS INT), 1))
                          AS BIGINT)) AS pv
                 FROM documents WHERE length(text) >= 120)),
         h AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(0, 60),
               i -> CASE WHEN pv[CAST(i + 1 AS INT)] > pm
                    THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                    ELSE 0 END)) AS BIGINT) AS ph0,
             CAST(list_sum(list_transform(range(60, 120),
               i -> CASE WHEN pv[CAST(i + 1 AS INT)] > pm
                    THEN (CAST(1 AS BIGINT) << CAST(i - 60 AS INT))
                    ELSE 0 END)) AS BIGINT) AS ph1
           FROM hp),
         banded AS (
           SELECT doc_id, ph0, ph1, band,
             (CASE WHEN band < 2 THEN ph0 >> CAST(band * 30 AS INT)
              ELSE ph1 >> CAST((band - 2) * 30 AS INT) END)
               & 1073741823 AS key
           FROM h, (SELECT unnest(range(0, 4)) AS band)),
         capped AS (
           SELECT doc_id, ph0, ph1, band, key,
             row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
           FROM banded QUALIFY rn <= 64),
         pairs AS (
           SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
             a.ph0 AS h0a, a.ph1 AS h1a, b.ph0 AS h0b, b.ph1 AS h1b
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         SELECT id1, id2,
           CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b))
             AS BIGINT) AS hamming
         FROM pairs
         WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 12""",

    "q357_frame_energy" ->
      """WITH pvc AS (
           SELECT doc_id,
             list_transform(range(0, 64),
               i -> CAST(ascii(substr(text,
                      CAST(1 + (i * length(text)) // 64 AS INT), 1))
                    AS BIGINT)) AS pv
           FROM documents WHERE length(text) >= 64),
         fr AS (
           SELECT doc_id, f,
             CAST(list_sum(list_transform(range(f * 8, f * 8 + 8),
               i -> pv[CAST(i + 1 AS INT)])) AS BIGINT) AS energy,
             CAST(list_sum(pv) AS BIGINT) AS tot
           FROM pvc, (SELECT unnest(range(0, 8)) AS f)),
         v AS (SELECT doc_id, f FROM fr WHERE energy * 8 > tot),
         runs AS (
           SELECT doc_id, f,
             f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
           FROM v),
         rl AS (
           SELECT doc_id, grp, count(*) AS run_len
           FROM runs GROUP BY 1, 2)
         SELECT doc_id, CAST(sum(run_len) AS BIGINT) AS n_voiced,
           CAST(max(run_len) AS BIGINT) AS longest_run
         FROM rl GROUP BY doc_id""",

    "q101_media_features" ->
      """SELECT doc_id, j, (h + j * 2654435761) % 1000003 AS feat
         FROM (SELECT doc_id,
                 CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
               FROM documents),
              (SELECT unnest(range(0, 16)) AS j)""",
    "q64_multimodal_meta" ->
      """SELECT doc_id,
           CASE WHEN b % 3 = 0 THEN 'jpeg' WHEN b % 3 = 1 THEN 'png' ELSE 'wav' END AS format,
           CAST(64 + n % 577 AS BIGINT) AS width,
           CAST(64 + (n * 31 + b) % 577 AS BIGINT) AS height,
           CAST(CASE WHEN b % 3 = 0 THEN 3 WHEN b % 3 = 1 THEN 4 ELSE 1 END AS BIGINT) AS channels,
           n AS n_bytes
         FROM (SELECT doc_id, ascii(substr(text, 1, 1)) AS b,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n
               FROM documents)""",
    "q65_frame_sample" ->
      """SELECT doc_id, i AS frame_idx,
           n // 4 + CASE WHEN i < n % 4 THEN 1 ELSE 0 END AS frame_len
         FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
               FROM documents),
              (SELECT unnest(range(0, 4)) AS i)""",
    "q178_session_stats" ->
      s"""WITH $sessionCtes
         SELECT user_id, session_id, count(*) AS n_events,
           min(CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS start_s,
           max(CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS end_s,
           CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS has_purchase,
           max(CAST(floor(date_part('epoch', ts)) AS BIGINT))
             - min(CAST(floor(date_part('epoch', ts)) AS BIGINT)) AS dur_s
         FROM sess GROUP BY 1, 2""",
    "q66_sessionize" ->
      s"""WITH $sessionCtes
         SELECT event_id, session_id FROM sess""")
}
