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

  /** Z-value (Morton code) of two numeric columns: each is normalized
    * into `bits`-bit integer grid cells over its [min, max] domain,
    * then the bits interleave. Sorting by the z-value keeps rows that
    * are close in BOTH dimensions close in file order — so per-file
    * min/max envelopes stay tight on every participating column, and a
    * predicate on ANY of them prunes. A 1-D sort gives tight envelopes
    * only on its own key; the second column smears across the full
    * domain in every file (asserted in LayoutSpec).
    *
    * Pure codegen bit arithmetic — no UDF, no shuffle of its own.
    * Domains are caller-supplied (at scale: from table stats or a
    * sampling pass), matching how table formats implement OPTIMIZE
    * ZORDER.
    */
  def zValue(x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double, bits: Int = 16): Column = {
    // bits > 31 would push shift amounts past 63, where Java/Spark
    // shifts wrap mod 64 and silently corrupt the interleave.
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    import org.apache.spark.sql.functions.{least, lit, greatest, shiftleft, shiftright}
    val cells = (1L << bits) - 1
    def cell(c: Column, lo: Double, hi: Double): Column =
      least(greatest(((c.cast("double") - lo) / (hi - lo) * cells).cast("long"),
        lit(0L)), lit(cells.toLong))
    val cx = cell(x, xMin, xMax)
    val cy = cell(y, yMin, yMax)
    (0 until bits).map { i =>
      shiftleft(shiftright(cx, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(cy, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered parquet layout over two pruning columns. */
  def writeZOrdered(df: DataFrame, path: String,
      x: String, xMin: Double, xMax: Double,
      y: String, yMin: Double, yMax: Double,
      numFiles: Int): Unit =
    df.withColumn("_z", zValue(col(x), xMin, xMax, col(y), yMin, yMax))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
