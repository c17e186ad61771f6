package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Dot products are generated as explicit left-associative 64-term double
  * sums so Spark and the DuckDB oracle produce bit-identical IEEE results
  * (`aggregate`/`list_sum` fold order is engine-internal; an explicit chain
  * is not).
  *
  * Scale shape: brute force is one broadcast of the (few) query vectors and
  * a map-side TopK per partition (TakeOrderedAndProject after a per-query
  * window) — no all-pairs shuffle. The LSH path buckets vectors by
  * sign-pattern against `nPlanes` pivot vectors (data-derived, so the oracle
  * can replay it) and searches only the query's bucket.
  */
object Similarity {

  val Dim = 64

  /** Explicit dot product of two float arrays as double (64 terms). */
  def dot(a: String, b: String): Column = {
    val terms = (1 to Dim).map(i =>
      s"(CAST(element_at($a, $i) AS DOUBLE) * CAST(element_at($b, $i) AS DOUBLE))")
    expr(terms.mkString(" + "))
  }

  def norm2(a: String): Column = {
    val terms = (1 to Dim).map(i =>
      s"(CAST(element_at($a, $i) AS DOUBLE) * CAST(element_at($a, $i) AS DOUBLE))")
    expr(terms.mkString(" + "))
  }

  /** cosine = dot / (sqrt(na) * sqrt(nb)) — formula mirrored in the oracle. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Brute-force top-k neighbors for each query vector (excluding self).
    * `queries` must be small (broadcast).
    */
  def bruteForceTopK(embs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    embs.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine("embedding", "qemb"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Sign-pattern bucket id against the first `nPlanes` vectors of the table
    * itself (deterministic and SQL-replayable; a production variant would
    * sample or train pivots). Broadcast the (tiny) plane table and sum sign
    * bits per vector — a map-side broadcast join; an alternative that
    * embeds the planes as an 8x64-term literal expression was measured
    * slower (codegen compile dominates).
    */
  def withBucket(embs: DataFrame, nPlanes: Int): DataFrame = {
    val planes = embs.where(col("vec_id") < nPlanes)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
    embs.crossJoin(broadcast(planes))
      .withColumn("bit",
        when(dot("embedding", "pemb") > 0,
          expr("shiftleft(cast(1 as bigint), cast(pid as int))")).otherwise(0L))
      .groupBy("vec_id")
      .agg(sum("bit").as("bucket"))
  }

  /** Bucketed ANN: search only the query's bucket. Returns the same schema
    * as bruteForceTopK (recall < 1 by construction — the candidate set is
    * the bucket).
    */
  def lshTopK(embs: DataFrame, queryIds: Seq[Long], k: Int, nPlanes: Int): DataFrame = {
    val buckets = withBucket(embs, nPlanes)
    val withB = embs.join(buckets, "vec_id")
    val q = withB.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"),
        col("bucket").as("qbucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    withB.join(broadcast(q), col("bucket") === col("qbucket") &&
        col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine("embedding", "qemb"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** IVF-style coarse quantizer: per-label mean vectors in integer
    * micro-units (floor(avg*1e6) — engine-portable, and exact integers so
    * both engines' downstream dot products are bit-identical; cosine is
    * scale-invariant so the 1e6 factor cancels). A production IVF would
    * k-means-train the codebook; the per-label means ARE one k-means
    * update step (q82's shape) over data-derived assignments.
    */
  def ivfCentroids(embs: DataFrame): DataFrame =
    embs.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg(floor(avg(col("v").cast("double")) * 1e6).cast("long").as("c_e6"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c_e6")))),
        s => s.getField("c_e6")).as("cvec"))

  /** Assign each vector to its nearest centroid cell by cosine
    * (ties -> smallest label). Broadcast of the tiny codebook; one window
    * per vec_id — no shuffle of the embedding table beyond the window's
    * hash partitioning.
    */
  def withIvfCell(embs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("cos"), asc("label"))
    embs.select("vec_id", "embedding") // embs' own label would collide
      .crossJoin(broadcast(centroids))
      .withColumn("cos", cosine("embedding", "cvec"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("label").as("cell"))
  }

  /** IVF ANN: search only the `nProbe` nearest cells of each query — the
    * second scale path next to the LSH buckets (recall rises with nProbe;
    * cost is the probed cells' population, not the corpus).
    */
  def ivfTopK(embs: DataFrame, queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame = {
    val cents = ivfCentroids(embs)
    val withC = embs.join(withIvfCell(embs, cents), "vec_id")
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("label"))
    val qcells = embs.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", cosine("qemb", "cvec"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qemb"), col("label").as("cell"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    withC.join(broadcast(qcells), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine("embedding", "qemb"))
      .withColumn("rnk", row_number().over(wr))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"),
        floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }

  /** Near-duplicate pairs by cosine threshold over a bounded id range
    * (all-pairs; use the LSH bucket variant beyond toy scale).
    */
  def cosineNearDupPairs(embs: DataFrame, maxId: Long, minCos: Double): DataFrame = {
    val a = embs.where(col("vec_id") < maxId)
      .select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = embs.where(col("vec_id") < maxId)
      .select(col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", cosine("e1", "e2"))
      .where(col("cos") > minCos)
      .select(col("id1"), col("id2"), floor(col("cos") * 1e6).cast("long").as("cos_e6"))
  }
}
