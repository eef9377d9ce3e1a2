package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corpus ingest: JSONL (one JSON document per line, optionally
  * gzip-compressed — Spark decompresses by extension) with explicit
  * schema enforcement and corrupt-record quarantine.
  *
  * Design rules for a 100 TB crawl drop:
  *  - ALWAYS pass an explicit schema — schema inference is a full
  *    extra pass over the data and non-deterministic under evolution;
  *  - never drop malformed lines silently: PERMISSIVE parsing routes
  *    them to a quarantine frame the pipeline can count/inspect/replay
  *    (a crawler bug that produces 1% garbage should be SEEN, not
  *    swallowed);
  *  - the split is computed from one parse: the parsed frame is
  *    persisted before filtering on the corrupt column (Spark
  *    disallows filtering raw file rows on the corrupt column alone),
  *    and callers unpersist via the returned handle when done.
  */
object IngestOps {

  val CorruptCol = "_graft_corrupt"

  /** One ingested batch: `good` has exactly the requested schema,
    * `quarantine` carries each offending raw line. Both derive from
    * one cached parse — call `release()` when done with BOTH frames
    * (unpersisting either derived frame alone would be a no-op).
    */
  final case class JsonlBatch(good: DataFrame, quarantine: DataFrame,
      private val parsed: DataFrame) {
    def release(): Unit = { parsed.unpersist(); () }
  }

  /** Conform a heterogeneous batch to a target schema: missing columns
    * materialize as typed nulls, extra columns are dropped, present
    * columns are cast. Crawl drops evolve (fields appear/disappear
    * between crawler versions); conforming each batch before
    * `unionByName` keeps a decade of drops unionable. Pure projection
    * — composes with any scan, nothing moves.
    */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Parse `path` as JSONL against `schema` into a [[JsonlBatch]]. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): JsonlBatch = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
    val parsed = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = parsed.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val quarantine = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    JsonlBatch(good, quarantine, parsed)
  }
}
