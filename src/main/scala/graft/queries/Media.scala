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
