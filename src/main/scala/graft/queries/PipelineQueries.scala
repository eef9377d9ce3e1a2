package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data-pipeline operator surface (dedup / text analysis /
  * similarity search / multimodal) over the `documents` and
  * `embeddings` tables, registered with DuckDB oracles wherever the
  * semantics are ANSI-SQL-expressible. Hash-unexpressible operators
  * (xxhash64-based MinHash/SimHash/LSH) are registered without an
  * oracle — the driver records a rows-only check — and additionally
  * covered by ScalaTest invariants in `src/test`.
  *
  * Entries live in the Pipeline*Queries family objects (split by
  * operator family, each with its queries and oracle SQL side by
  * side); this object is only the aggregation the driver contract
  * consumes.
  */
object PipelineQueries {
  type Q = PipelineShared.Q

  val queries: Map[String, Q] = PipelineMultimodalQueries.queries ++
    PipelineDedupQueries.queries ++
    PipelineSimilarityQueries.queries ++
    PipelineTextQueries.queries ++
    PipelineEventsQueries.queries ++
    PipelineProfileQueries.queries ++
    PipelineMiscQueries.queries

  val oracles: Map[String, String] = PipelineMultimodalQueries.oracles ++
    PipelineDedupQueries.oracles ++
    PipelineSimilarityQueries.oracles ++
    PipelineTextQueries.oracles ++
    PipelineEventsQueries.oracles ++
    PipelineProfileQueries.oracles ++
    PipelineMiscQueries.oracles
}
