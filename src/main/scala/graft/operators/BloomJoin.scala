package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.BloomMightContain

/** Bloom-filter semi-join reduction: filter the BIG side of an equi-join
  * by a Bloom filter of the small side's keys before any shuffle.
  *
  * Scale shape: the filter is built with one distributed aggregation over
  * `small` (`DataFrameStatFunctions.bloomFilter` merges per-partition
  * sketches), costs O(n·bits/n) memory independent of key skew, and rides
  * to the big side's scan as a few MB of task state — at 100 TB this turns
  * "shuffle everything, then drop 99%" into "drop 99% at the scan". The
  * false-positive rate only affects how much REDUCTION is achieved, never
  * correctness: compose with the exact join and the result equals the
  * plain join row-for-row.
  */
object BloomJoin {

  /** A probe column for `key` against a Bloom of `keys.col(keyCol)`.
    * `expectedItems`/`fpp` size the filter (bits ≈ -n·ln(fpp)/ln²2).
    */
  def bloomProbe(
      keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double)(key: Column): Column = {
    val bloom = keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    org.apache.spark.sql.GraftSqlBridge.column(BloomMightContain(
      org.apache.spark.sql.GraftSqlBridge.expression(key), bos.toByteArray))
  }

  /** `big` semi-joined to `small` on bigKey == smallKey, with the Bloom
    * pre-filter applied to `big` first. Result == plain left_semi join.
    */
  def semiJoinReduced(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val probe = bloomProbe(small, smallKey, expectedItems, fpp) _
    big.where(probe(big(bigKey)))
      .join(small.select(small(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
