package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Composed entity resolution — the record-linkage pipeline assembled
  * from the engine's oracle-checked stages, the `CurationPipeline.curate`
  * way: blocking (q273's key), within-block Jaro-Winkler pair scoring
  * (q217's native codegen expression), a match threshold, distributed
  * min-label connected components (q76's operator) to close transitive
  * matches into entities, and a canonical representative per entity.
  *
  * Scale shape: pair generation is confined to blocks (never all-pairs
  * — blocking quality itself is measured by q273), the score is a
  * codegen expression, and the transitive closure is bucket-confined by
  * construction (every record has exactly ONE block, so matches cannot
  * span blocks) — since round 12 it rides `Dedup.bucketedComponents`,
  * one shuffle + in-task per-block union-find, instead of the iterative
  * checkpointed CC the multi-bucket graphs need. One keyed join
  * attaches entity sizes.
  */
object EntityResolution {

  /** `records`: (idCol, nameCol, blockCol). Returns one row per record:
    * (id, name, bkt, entity, is_canonical, n_entity) where `entity` is
    * the minimum id of the record's transitive match component and
    * singletons are their own entity.
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      blockCol: String, jwThresholdE6: Long): DataFrame = {
    val base = records.select(col(idCol).as("id"), col(nameCol).as("name"),
      col(blockCol).as("bkt"))
    val a = base.toDF("id1", "name1", "bkt")
    val b = base.toDF("id2", "name2", "bkt")
    val matches = a.join(b, Seq("bkt")).where(col("id1") < col("id2"))
      .where(floor(TextFunctions.jaroWinkler(col("name1"), col("name2")) * 1e6)
        .cast("long") >= jwThresholdE6)
      .select(col("bkt"), col("id1"), col("id2"))
    val cc = Dedup.bucketedComponents(matches, Seq("bkt")) // (id, label)
    val ent = base.join(cc, Seq("id"), "left")
      .withColumn("entity", coalesce(col("label"), col("id")))
      .drop("label")
    val sizes = ent.groupBy("entity").agg(count(lit(1)).as("n_entity"))
    ent.join(sizes, "entity")
      .select(col("id"), col("name"), col("bkt"), col("entity"),
        (col("entity") === col("id")).as("is_canonical"), col("n_entity"))
  }
}
