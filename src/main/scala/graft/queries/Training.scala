package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity}

/** Training-data pipeline operators over `documents`/`embeddings`:
  * text analysis (language-ID, quality, tokens, fingerprints, tonal
  * scoring), dedup (exact, Jaccard, MinHash+LSH, SimHash), embedding
  * similarity search, retrieval/eval and data-valuation families.
  * Every query here has a DuckDB oracle. The inventory lives in four
  * sibling files (TrainingA-D, query/oracle pairs kept together) with
  * shared Scala helpers and oracle CTE builders in TrainingShared;
  * this object is the stable aggregation point SparkEntry reads.
  */
object Training {
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    TrainingA.queries ++ TrainingB.queries ++ TrainingC.queries ++
      TrainingD.queries

  val oracles: Map[String, String] =
    TrainingA.oracles ++ TrainingB.oracles ++ TrainingC.oracles ++
      TrainingD.oracles
}
