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
    * identical salts. The trade-off: byte-identical rows hash to the SAME
    * salt, so a hot key whose rows are mostly full duplicates still lands
    * in one reduce partition — correctness is unaffected, but the load
    * balancing this salt exists for is not provided in that case. No
    * per-row disambiguator can fix it safely: anything positional
    * (spark_partition_id, a row_number over tied rows) is not stable
    * under partial stage retry — the SPARK-23207 hazard again. For
    * duplicate-dominated hot keys use `saltedJoinCollapseDupes` below.
    */
  def saltedJoin(big: DataFrame, rep: DataFrame, key: String, salt: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val replicated = rep.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe join that splits on the HOT KEYS instead of salting
    * everything: full-side salting (saltedJoin) replicates the ENTIRE
    * build side `salt`× — measured on the round-10 skew fixture, that
    * LOSES 4× to the plain join when build ≈ probe in size, because the
    * replication shuffle swamps the straggler it saves. The production
    * shape: detect the hot keys (a bounded count aggregate — the q226
    * skew diagnostic), then
    *  - COLD slice: plain shuffle join with the hot keys removed — no
    *    straggler left by construction;
    *  - HOT slice: the hot keys' build rows are by definition FEW (a key
    *    is hot because the PROBE side piles onto it), so broadcast them
    *    and map-side join the hot probe rows — zero shuffle of the hot
    *    slice, no replication of the cold build side.
    * Result equals the plain inner join. `hotKeys` is the driver-side
    * hot list (bounded by construction: keys above a count threshold).
    */
  def hotKeySplitJoin(big: DataFrame, rep: DataFrame, key: String,
      hotKeys: Seq[Long]): DataFrame = {
    // no hot keys detected → the plain join IS the right plan; an empty
    // isin() would only add a vacuous filter + an empty broadcast union
    if (hotKeys.isEmpty) return big.join(rep, Seq(key))
    val cold = big.where(!col(key).isin(hotKeys: _*))
      .join(rep.where(!col(key).isin(hotKeys: _*)), Seq(key))
    val hot = big.where(col(key).isin(hotKeys: _*))
      .join(broadcast(rep.where(col(key).isin(hotKeys: _*))), Seq(key))
    cold.unionByName(hot)
  }

  /** Driver-side hot-key detection for [[hotKeySplitJoin]]: keys whose
    * probe-side row count exceeds `threshold`. The aggregate is
    * map-side-combinable and the collect is bounded by the number of
    * genuinely hot keys (at a sane threshold, a handful).
    */
  def hotKeys(big: DataFrame, key: String, threshold: Long): Seq[Long] = {
    // null keys are dropped: an inner equi-join never matches them (Catalyst
    // plants IsNotNull on the join keys), so they can't skew the join's
    // shuffle — and a null in the hot list would poison hotKeySplitJoin's
    // isin predicates (three-valued logic silently empties the cold slice).
    val rows = big.where(col(key).isNotNull)
      .groupBy(key).agg(count(lit(1)).as("__n"))
      .where(col("__n") > threshold)
      .select(col(key).try_cast("long").as("__k"),
        col(key).cast("string").as("__raw"))
      .collect()
    rows.map { r =>
      // a hot key the Long cast nulls out (non-numeric) must fail fast —
      // returning it as anything else would leave the skew unmitigated
      // without the caller ever knowing
      require(!r.isNullAt(0),
        s"hot key '${r.getString(1)}' in column '$key' does not cast to Long; " +
          "hotKeySplitJoin keys must be integral")
      r.getLong(0)
    }.toSeq
  }

  /** Skew-safe join for hot keys dominated by IDENTICAL rows, which the
    * content-hash salt cannot spread (equal bytes, equal salt). Instead of
    * spreading the duplicates, collapse them: aggregate `big` to distinct
    * rows plus a multiplicity count — map-side partial aggregation folds
    * the duplicates BEFORE the shuffle, so the hot duplicates never travel
    * — salt-join the now-unique rows, and re-inflate with an
    * `explode(sequence(...))` AFTER the join. The re-inflation is a
    * map-side generator (no shuffle follows), so no reducer ever receives
    * more than one copy of a duplicated row. Result multiset equals the
    * plain inner join; costs one extra aggregation over `big`.
    */
  def saltedJoinCollapseDupes(big: DataFrame, rep: DataFrame, key: String, salt: Int): DataFrame = {
    val collapsed = big.groupBy(big.columns.map(col): _*).agg(count(lit(1)).as("__cnt"))
    saltedJoin(collapsed, rep, key, salt)
      .withColumn("__dup", explode(sequence(lit(1L), col("__cnt"))))
      .drop("__cnt", "__dup")
  }
}
