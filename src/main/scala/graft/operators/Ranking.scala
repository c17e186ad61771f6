package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-safe global ranking (SURVEY §7.3, W4).
  *
  * `row_number() OVER (ORDER BY ...)` funnels the whole table through one
  * partition — the reference does exactly that on 100M rows
  * (`compute_share_top_tweets_containing_ngram.py:99`). The scalable form
  * is a range-partitioned global sort (parallel) followed by
  * `zipWithIndex`, which assigns contiguous indices from per-partition
  * counts (one extra lightweight count job, no data movement).
  *
  * This is one of the engine's few deliberate RDD touches: per-partition
  * index assignment is genuinely imperative and has no Catalyst
  * counterpart. Results are identical to the window form for a total
  * ordering (callers must include a tie-break column).
  */
object Ranking {

  /** Append `rankCol` (1-based) in the total order given by `sortCols`. */
  def globalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val sorted = df.sort(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val withIdx = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1))
    }
    df.sparkSession.createDataFrame(withIdx, schema)
  }
}
