package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Timezone localization for epoch-stamped facts.
  *
  * The reference's first GPS step localizes ping epochs before stop
  * detection: a per-H3-res-6-cell UTC-offset table is precomputed from a
  * timezone shapefile (`gps-analytics/src/pipeline/tz_offset.scala:26-37`)
  * and joined onto pings, then `from_utc_timestamp` applies the shift
  * (`stop_locations.py:73`). Same shape here: a small (zone -> offset_sec)
  * dim broadcast-joined onto the fact side, then pure integer epoch
  * arithmetic. Offsets are DATA, not engine tz rules — exactly the
  * reference's contract, and what keeps the operator portable across
  * engines (and DuckDB-oracle-checkable).
  *
  * Scale shape: the offset dim is tiny (zones), the fact side arbitrarily
  * large — an explicit `broadcast()` keeps the join map-side with no
  * shuffle of the facts.
  */
object TimeZones {

  /** Broadcast-join `offsets` (zoneCol, offset_sec) onto `facts` and shift
    * `epochCol`: adds offset_sec, local_epoch, local_hour (0-23) and
    * local_day_s (local midnight as a shifted epoch). Floor-mod (the
    * double-% form, spelled identically in the oracle) keeps both columns
    * correct for NEGATIVE local epochs too — west-of-UTC offsets shortly
    * after 1970, or pre-epoch data; plain % would yield hour -1 and round
    * day to the NEXT midnight. Facts whose zone has no offset row are
    * dropped (inner join), matching the reference's behavior of discarding
    * pings outside the tz shapefile.
    */
  def localize(
      facts: DataFrame, zoneCol: String, epochCol: String,
      offsets: DataFrame): DataFrame =
    facts.join(broadcast(offsets), Seq(zoneCol))
      .withColumn("local_epoch", col(epochCol) + col("offset_sec"))
      .withColumn("local_hour",
        expr("(((local_epoch % 86400) + 86400) % 86400) div 3600"))
      .withColumn("local_day_s",
        col("local_epoch") - expr("((local_epoch % 86400) + 86400) % 86400"))
}
