package org.apache.spark

import org.apache.spark.rdd.{RDD, ReliableRDDCheckpointData}

/** Narrow bridge to one `private[spark]` seam: deleting the FILES behind a
  * reliable checkpoint. `RDD.unpersist` only touches BlockManager blocks —
  * reliable checkpoints live on the filesystem, so an iterative algorithm
  * that cuts lineage with `checkpoint()` every round leaks one directory of
  * files per generation unless it deletes them explicitly (same seam
  * Spark's own ContextCleaner uses for auto-cleanup of GC'd RDDs).
  */
object GraftCheckpointBridge {

  /** Delete the checkpoint files written for `rdd` (`rdd-<id>` under the
    * context's checkpoint dir). Safe to call whether or not the RDD was
    * actually checkpointed — a missing path is a no-op. After this, any
    * frame whose only materialization was this checkpoint is gone for
    * good: only call it once no live plan reads the generation.
    */
  def cleanCheckpointFiles(rdd: RDD[_]): Unit =
    ReliableRDDCheckpointData.cleanCheckpoint(rdd.sparkContext, rdd.id)

  /** Unset the context's checkpoint dir (there is no public inverse of
    * `setCheckpointDir`; tests that flip a shared session to the reliable
    * path need to flip it back).
    */
  def clearCheckpointDir(sc: SparkContext): Unit =
    sc.checkpointDir = None
}
