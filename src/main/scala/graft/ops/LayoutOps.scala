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

  /** Morton interleave of two INTEGER cell columns already on the
    * [0, 2^bits) grid — the exact-arithmetic core of [[zValue]],
    * shared with the DuckDB oracle spelling (no float normalization
    * anywhere, so engines agree bit-for-bit).
    */
  def zInterleave(cx: Column, cy: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    import org.apache.spark.sql.functions.{shiftleft, shiftright}
    (0 until bits).map { i =>
      shiftleft(shiftright(cx, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(cy, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Data-skipping effectiveness report: lay the rows out twice —
    * z-ordered files (top z-bits = file id) vs round-robin — and for
    * each layout compute the per-file min/max envelope on x and the
    * EXPECTED number of files a uniform point query `x = v` must
    * read: Σ_files (x_max − x_min + 1) / 2^bits. Round-robin files
    * cover ~the whole domain (expected ≈ all files); z-ordered files
    * cover a 2^(bits/...) slice (expected « files). This is the
    * planning-time number an OPTIMIZE ZORDER decision is made on.
    *
    * Everything is exact integer arithmetic except the final
    * division by 2^bits, which is binary-exact — bit-identical
    * across engines, no rounding gate needed.
    *
    * Scale: two hash aggregations over (layout, file) — at most
    * 2·nFiles groups, map-side combined; no sort, no window. (A
    * production write would range-partition by z; the file-id-from-
    * top-bits spelling here is the shuffle-free equivalent for
    * already-gridded cells.)
    */
  def zSkippingReport(df: DataFrame, cx: Column, cy: Column, id: Column,
      bits: Int = 10, nFiles: Int = 64): DataFrame = {
    require(nFiles >= 2 && (nFiles & (nFiles - 1)) == 0 &&
      nFiles <= (1 << (2 * bits)), s"nFiles must be a power of two, got $nFiles")
    import org.apache.spark.sql.functions._
    val shift = 2 * bits - java.lang.Integer.numberOfTrailingZeros(nFiles)
    val base = df.select(cx.cast("long").as("x"), cy.cast("long").as("y"),
        id.cast("long").as("id"))
      .withColumn("z", zInterleave(col("x"), col("y"), bits))
    def report(name: String, fileCol: Column) =
      base.withColumn("f", fileCol)
        .groupBy("f")
        .agg(count(lit(1)).as("rows_f"),
          min("x").as("x_min"), max("x").as("x_max"))
        .agg(lit(name).as("layout"),
          count(lit(1)).as("n_files"),
          sum("rows_f").as("n_rows"),
          (sum(col("x_max") - col("x_min") + 1) /
            lit((1L << bits).toDouble)).as("expected_files_scanned"))
    report("zorder", shiftright(col("z"), shift))
      .unionByName(report("roundrobin", pmod(col("id"), lit(nFiles.toLong))))
  }

  /** DuckDB twin of [[zSkippingReport]] over integer cell expressions
    * `xExpr`/`yExpr` and row-id `idExpr` (all SQL snippets).
    */
  def zSkippingOracleSql(table: String, xExpr: String, yExpr: String,
      idExpr: String, bits: Int = 10, nFiles: Int = 64): String = {
    val shift = 2 * bits - java.lang.Integer.numberOfTrailingZeros(nFiles)
    val zTerms = (0 until bits).map { i =>
      s"((x // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"((y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT CAST($xExpr AS BIGINT) AS x, CAST($yExpr AS BIGINT) AS y,
       |    CAST($idExpr AS BIGINT) AS id
       |  FROM $table),
       |z AS (SELECT *, ($zTerms) AS z FROM base),
       |lay AS (
       |  SELECT 'zorder' AS layout, z // ${1L << shift} AS f, x FROM z
       |  UNION ALL
       |  SELECT 'roundrobin', id % $nFiles, x FROM z),
       |files AS (
       |  SELECT layout, f, count(*) AS rows_f,
       |    min(x) AS x_min, max(x) AS x_max
       |  FROM lay GROUP BY layout, f)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(rows_f) AS BIGINT) AS n_rows,
       |  sum(x_max - x_min + 1) / ${(1L << bits).toDouble} AS expected_files_scanned
       |FROM files GROUP BY layout""".stripMargin
  }

  /** Small-file compaction plan: sequential-fill binning of a file
    * listing into `targetBytes` output files (cumulative size before
    * each file, integer-divided by the target — deterministic in the
    * given id order; an oversized input naturally claims its own
    * bin). Output: one summary row — input/output file counts, total
    * bytes, exact ppm fill factor, largest output. The planner side
    * of the small-files problem; the window runs over the METADATA
    * listing (file-count-sized), never data.
    */
  def compactionPlan(files: DataFrame, idCol: String, sizeCol: String,
      targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val binned = files.select(col(idCol).as("id"),
        col(sizeCol).cast("long").as("bytes"))
      .withColumn("cum0", coalesce(sum("bytes").over(w), lit(0L)))
      .withColumn("bin", ((col("cum0") - pmod(col("cum0"), lit(targetBytes)))
        / targetBytes).cast("long"))
    val bins = binned.groupBy("bin").agg(sum("bytes").as("bin_bytes"))
    val num = col("total_bytes") * 2000000L + col("n_output") * targetBytes
    val den = col("n_output") * targetBytes * 2
    binned.agg(count(lit(1)).as("n_input"),
        sum("bytes").as("total_bytes"))
      .crossJoin(broadcast(bins.agg(count(lit(1)).as("n_output"),
        max("bin_bytes").as("max_output_bytes"))))
      .select(col("n_input"), col("total_bytes"), col("n_output"),
        ((num - pmod(num, den)) / den).cast("long").as("fill_ppm"),
        col("max_output_bytes"))
  }

  /** DuckDB twin of [[compactionPlan]]; `filesSql` yields (id, bytes)
    * rows.
    */
  def compactionOracleSql(filesSql: String, targetBytes: Long): String =
    s"""WITH f AS (__F__),
       |c AS (SELECT id, CAST(bytes AS BIGINT) AS bytes,
       |    coalesce(sum(CAST(bytes AS BIGINT)) OVER (ORDER BY id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
       |  FROM f),
       |b AS (SELECT cum0 // $targetBytes AS bin,
       |    CAST(sum(bytes) AS BIGINT) AS bin_bytes FROM c GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_input,
       |    CAST(sum(bytes) AS BIGINT) AS total_bytes FROM c),
       |o AS (SELECT CAST(count(*) AS BIGINT) AS n_output,
       |    CAST(max(bin_bytes) AS BIGINT) AS max_output_bytes FROM b)
       |SELECT n_input, total_bytes, n_output,
       |  CAST((total_bytes * 2000000 + n_output * $targetBytes)
       |    // (n_output * $targetBytes * 2) AS BIGINT) AS fill_ppm,
       |  max_output_bytes
       |FROM t CROSS JOIN o""".stripMargin.replace("__F__", filesSql)

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

  /** Hash-shard skew preflight: simulate partitioning the corpus
    * into `nShards` by a CONTENT hash of the key (md5 prefix — the
    * same engine-portable coordinate the samplers use, so DuckDB
    * replays the assignment bit-for-bit) and report each shard's row
    * and weight load plus its skew vs the perfectly-even share
    * (load·P/total, micro-units). The "will my writes hotspot"
    * check a layout planner runs BEFORE a 100 TB shuffle — a key
    * whose distribution puts 3× the even share on one shard needs
    * salting (SkewOps) before, not after, the job runs.
    *
    * One hash aggregation to ≤ nShards rows; totals broadcast back.
    *
    * @return per shard: (shard, n_rows, load, load_frac, skew)
    */
  def shardSkewPlan(df: DataFrame, keyCol: String, weightCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 2, s"need >= 2 shards, got $nShards")
    import org.apache.spark.sql.functions._
    // native digest split: word 1 of graft_md5_longs is bit-identical
    // to conv(substring(md5_hex, 1, 8), 16, 10)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val shard = pmod(
      element_at(call_function("graft_md5_longs",
        col(keyCol).cast("string").cast("binary")), 1),
      lit(nShards.toLong))
    val per = df.select(shard.as("shard"),
        col(weightCol).cast("long").as("w"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum("w").as("load"))
    val tot = per.agg(sum("n_rows").as("tr"), sum("load").as("tw"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_rows"), col("load"),
        (expr("(2000000 * load + tw) div (2 * tw)").cast("double")
          / 1e6).as("load_frac"),
        (expr(s"(2000000 * load * $nShards + tw) div (2 * tw)")
          .cast("double") / 1e6).as("skew"))
  }

  /** DuckDB replay of [[shardSkewPlan]] ('0x' hex cast = conv 16). */
  def shardSkewOracleSql(table: String, keyCol: String,
      weightExpr: String, nShards: Int): String =
    s"""WITH per AS (SELECT
       |    CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 8)
       |      AS BIGINT) % $nShards AS shard,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CAST($weightExpr AS BIGINT)) AS BIGINT) AS load
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tr,
       |    CAST(sum(load) AS BIGINT) AS tw FROM per)
       |SELECT shard, n_rows, load,
       |  CAST((2000000 * load + tw) // (2 * tw) AS DOUBLE) / 1e6
       |    AS load_frac,
       |  CAST((2000000 * load * $nShards + tw) // (2 * tw) AS DOUBLE)
       |    / 1e6 AS skew
       |FROM per CROSS JOIN tot""".stripMargin
}
