package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Data-layout sinks: how a 100 TB table should LAND so that later
  * scans prune instead of read.
  *
  *  - Hive-style partition directories (`writePartitioned`) make
  *    equality/IN predicates on the partition column prune whole
  *    directories at PLANNING time (`PartitionFilters` in the scan
  *    node — asserted in LayoutSpec).
  *  - Range-sorted files (`writeRangeSorted`) give every file a tight
  *    min/max envelope on the sort key, so range predicates skip
  *    whole files (and row groups within them) at RUNTIME via parquet
  *    statistics — LayoutSpec asserts the scan's `numFiles` metric
  *    drops accordingly.
  *
  * These complement `BucketOps` (join co-location): partitioning
  * prunes by low-cardinality dimensions, range-sorting prunes by
  * continuous keys (time, depth), bucketing kills join shuffles. A
  * fact table at scale typically combines two of them
  * (`partitionBy(date)` + sort-within by the range key).
  */
object LayoutOps {

  /** Hive-style partitioned parquet. Keep partition columns
    * LOW-cardinality (date, region, flag): each value is a directory,
    * and millions of tiny directories are their own scale problem.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Range-partitioned, within-partition-sorted parquet: file k holds
    * a contiguous slice of the sort-key domain, so a range predicate
    * touches only the overlapping files. `numFiles` bounds the
    * parallelism of later scans — size it to the cluster.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int): Unit = {
    val cs: Seq[Column] = sortCols.map(col)
    df.repartitionByRange(numFiles, cs: _*)
      .sortWithinPartitions(cs: _*)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
