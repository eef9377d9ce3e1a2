package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: pre-shuffle once at write time so that
  * repeated joins/aggregations on the bucket key run with NO exchange
  * at read time — the standard co-location strategy for fact-to-fact
  * joins that would otherwise sort-merge-shuffle terabytes per query.
  *
  * Bucketing rides Spark's catalog (`saveAsTable`): the bucket spec is
  * table metadata, and Catalyst removes the shuffle when both sides
  * hash-partition on the same key into compatible bucket counts.
  */
object BucketOps {

  /** Write df as a bucketed (and optionally sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
      sortTableBy: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, key)
    sortTableBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket specs this plans with zero Exchange operators — verify via
    * `.explain` / PlanSpec.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
