package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe big-big equi-join by key salting.
  *
  * A hot join key (one celebrity user, one giant order) lands an entire
  * key's rows in ONE shuffle partition; at 100 TB that straggler is the
  * job. Salting splits each key into `salt` sub-keys: the probe side gets
  * a deterministic-per-row salt, the build side is replicated once per
  * salt value, and the join runs on (key, salt) — the hot key now spreads
  * across `salt` reducers at the cost of replicating the (smaller, but
  * not broadcastable) side `salt` times. AQE's skew-join splitting is the
  * runtime alternative (`spark.sql.adaptive.skewJoin.enabled`); explicit
  * salting is the plan-level tool when skew is known ahead of time, and
  * is the join twin of the salted two-phase aggregation (q93).
  */
object SkewJoin {

  /** Equi-join `big` with `rep` on `key`, spreading each key across
    * `salt` shuffle partitions. `rep` is replicated `salt` times.
    * Result equals the plain inner join (salt columns never escape).
    */
  def saltedJoin(big: DataFrame, rep: DataFrame, key: String, salt: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = rep.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
