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
    *
    * The salt is derived from row CONTENT (xxhash64 over every column),
    * never from a nondeterministic expression like
    * `monotonically_increasing_id()` or `rand()`: a shuffle key must be
    * reproducible under partial stage recomputation (fetch-failure retry
    * re-runs only some map tasks — a row that re-salts differently is
    * duplicated in one reduce partition and missing from another, the
    * SPARK-23207 hazard class). Content hashing makes retried tasks emit
    * identical salts. Identical full rows share a salt, which is safe:
    * they are interchangeable, so their placement doesn't skew results —
    * and a key whose rows are ALL identical carries no information to
    * spread anyway.
    */
  def saltedJoin(big: DataFrame, rep: DataFrame, key: String, salt: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val replicated = rep.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
