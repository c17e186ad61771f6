package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeZones

/** Floor-mod localization semantics, including negative local epochs the
  * oracle's testdata never reaches.
  */
class TimeZoneSpec extends SparkSpec {

  test("localize handles negative local epochs (west of UTC near 1970)") {
    import spark.implicits._
    val facts = Seq((1L, 0L, 3600L), (2L, 0L, 90000L)).toDF("event_id", "zone", "epoch")
    val offsets = Seq((0L, -7200L)).toDF("zone", "offset_sec")
    val out = TimeZones.localize(facts, "zone", "epoch", offsets)
      .select("event_id", "local_epoch", "local_hour", "local_day_s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // epoch 3600 shifted -2h -> local -3600 = 23:00 of the PREVIOUS day
    assert(out(1L) == (-3600L, 23L, -86400L), out.toString)
    // epoch 90000 (25h) shifted -2h -> 82800 = 23:00 of day 0
    assert(out(2L) == (82800L, 23L, 0L), out.toString)
  }

  test("localize drops facts with no offset row (inner join)") {
    import spark.implicits._
    val facts = Seq((1L, 0L, 1000L), (2L, 9L, 1000L)).toDF("event_id", "zone", "epoch")
    val offsets = Seq((0L, 0L)).toDF("zone", "offset_sec")
    val ids = TimeZones.localize(facts, "zone", "epoch", offsets)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }
}
