package graft.core.splice

import graft.core.format.{CsvIO, FormatError}
import graft.core.model.CoringFormats._
import graft.core.ops.DepthOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry point 3.1: Sparse Splice → Affine table + Splice Interval
  * Table. (reference: /root/reference/feldman.py:96-142)
  *
  * The reference's mid-pipeline file round-trip (it reloads the SIT it
  * just wrote, feldman.py:117) is kept deliberately: reloading applies
  * the 3-decimal output rounding to the depths the off-splice chain
  * consumes, and that rounding is part of the observable semantics.
  */
object Convert {

  /** Run `body` with codegen disabled (whole-stage AND generated
    * projections), restoring the session conf after.
    *
    * Scale rationale, not a hack: the splice conversion is a chain of
    * ~15 distinct tiny plans over control tables (58 splice rows, ~600
    * section rows — still small when the measurement data is 100 TB,
    * because a splice is a human-authored table). Compiling bespoke
    * Java for each of those plans costs seconds of Janino time per
    * fresh pipeline and saves microseconds of execution; interpreted
    * mode is strictly faster at this cardinality. Bulk paths
    * (measurement export, relational/LLM queries) never pass through
    * here and keep full codegen.
    */
  /** One monitor per session: concurrent scopes would race the
    * save/restore of shared session confs (a second caller can save an
    * already-modified value and "restore" it permanently). The scope
    * guards seconds-long control-table work, so serializing it per
    * session costs nothing; the monitor is reentrant, so the
    * file-sink convert nesting the in-memory convert stays safe.
    */
  private val scopeLocks = new java.util.WeakHashMap[SparkSession, Object]()

  private def interpretedControlPlans[A](spark: SparkSession)(body: => A): A = {
    val lock = scopeLocks.synchronized {
      var l = scopeLocks.get(spark)
      if (l == null) { l = new Object; scopeLocks.put(spark, l) }
      l
    }
    lock.synchronized { interpretedControlPlansLocked(spark)(body) }
  }

  private def interpretedControlPlansLocked[A](spark: SparkSession)(body: => A): A = {
    val conf = spark.conf
    val keys = Seq("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode",
      "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
      "spark.sql.constraintPropagation.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    conf.set("spark.sql.codegen.wholeStage", "false")
    conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    // AQE re-plans per shuffle stage; for single-digit-partition
    // control plans that is pure driver latency with nothing to adapt
    conf.set("spark.sql.adaptive.enabled", "false")
    // one shuffle partition: a 32-task stage over a 58-row table is
    // 32 task launches for one task's work (windows, orderBy)
    conf.set("spark.sql.shuffle.partitions", "1")
    // constraint propagation is quadratic-ish in projection width and
    // buys nothing on already-broadcast-joined control plans
    conf.set("spark.sql.constraintPropagation.enabled", "false")
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** P16 pre-flight: every value integer or 'CC'. (feldman.py:107-112) */
  def validateSectionColumn(df: DataFrame, colName: String, what: String): Unit =
    validateSectionColumns(df, Seq(colName), what)

  /** Validate several section columns of one table in a single job;
    * failures are reported in column order (the reference checks them
    * sequentially, so first bad column wins).
    *
    * Scaling note: this is one full-table aggregate per call — the
    * right trade for the tiny control tables that reach it (one scan
    * validates every column at once). A bulk-table caller that wants
    * fail-fast should probe with filter().limit(1) per column instead.
    */
  def validateSectionColumns(df: DataFrame, colNames: Seq[String], what: String): Unit =
    validateSectionColumnsBatch(Seq((df, colNames, what)))

  /** Validate section columns across SEVERAL tables in one Spark job
    * (a union of one aggregate row per table). Failures surface in
    * argument order, preserving the reference's first-bad-column-wins
    * sequencing across tables.
    */
  def validateSectionColumnsBatch(tables: Seq[(DataFrame, Seq[String], String)]): Unit = {
    if (tables.isEmpty) return
    val unioned = tables.map { case (df, cols, what) =>
      df.select(lit(what).as("what"),
        array(cols.map(c =>
          count(when(!DepthOps.isValidSection(col(c)), lit(1)))): _*).as("bad"))
    }.reduce(_ unionByName _)
    val byWhat = unioned.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    tables.foreach { case (_, cols, what) =>
      val bad = byWhat(what)
      cols.zipWithIndex.foreach { case (c, i) =>
        if (bad(i) > 0)
          throw new FormatError(
            s"$c column in $what contains one or more non-integer values.")
      }
    }
  }

  /** P16 over a LocalRelation-backed control table: `collect()` on a
    * local plan short-circuits to the driver (no job), so the check is
    * a plain Scala scan. Bad-value predicate matches the aggregate
    * form exactly: a value is bad iff it is non-null and neither 'CC'
    * nor an integer (nulls never survive the format layer's scrub).
    */
  private[core] def validateSectionColumnsLocal(df: DataFrame, colNames: Seq[String],
      what: String): Unit = {
    // Regex parity with the distributed path: DepthOps.isValidSection
    // uses `rlike`, whose FIND semantics let `$` match before a final
    // newline (reachable via quoted CSV fields) — `String.matches`
    // would reject such a value that the distributed validator
    // accepts. Use the same find semantics here.
    val pat = java.util.regex.Pattern.compile("^-?[0-9]+$")
    val rows = df.select(colNames.map(col): _*).collect()
    colNames.zipWithIndex.foreach { case (c, i) =>
      val bad = rows.exists { r =>
        // Non-string cells coerce via toString, matching rlike's
        // implicit string cast (and never throwing ClassCastException).
        val v = r.get(i) match { case null => null; case o => o.toString }
        v != null && !(v == "CC" || pat.matcher(v).find())
      }
      if (bad)
        throw new FormatError(
          s"$c column in $what contains one or more non-integer values.")
    }
  }

  /** In-memory variant: returns (SIT, affine) DataFrames without the
    * file sinks. The reference's SIT file round-trip is replaced by an
    * explicit 3-decimal rounding — numerically identical to writing
    * and re-parsing the CSV.
    *
    * Conversion is a pure function of its input files and options, so
    * repeated calls within a session (e.g. one caller wanting the SIT,
    * another the affine table) reuse one plan + cache instead of
    * re-running the whole pipeline.
    *
    * The memo lives in a WeakHashMap keyed by the live session object:
    * entries (and the cached DataFrames they pin) become collectable
    * as soon as the session is, and a new session can never collide
    * with a stopped one's key. Input files are additionally keyed by
    * (size, mtime) so rewriting a CSV at the same path within a
    * session is seen as a new input, not served stale.
    */
  private val memos = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[
      (String, String, String, String, SpliceOptions, Option[String]),
      (DataFrame, DataFrame)]]()

  /** Local-file change detector; non-local/absent paths degrade to a
    * constant (path identity only, the pre-fingerprint behavior). */
  private def fingerprint(path: String): String = {
    val f = new java.io.File(path)
    if (f.exists) s"${f.length}:${f.lastModified}" else "-"
  }

  def convertInMemory(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      opts: SpliceOptions = SpliceOptions(),
      manualCorrelationPath: Option[String] = None): (DataFrame, DataFrame) = {
    val memo = memos.synchronized {
      var m = memos.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        memos.put(spark, m)
      }
      m
    }
    memo.getOrElseUpdate(
      (secSummPath, fingerprint(secSummPath), sparsePath, fingerprint(sparsePath),
        opts, manualCorrelationPath),
      convertInMemoryUncached(spark, secSummPath, sparsePath, opts, manualCorrelationPath))
  }

  private def convertInMemoryUncached(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      opts: SpliceOptions,
      manualCorrelationPath: Option[String]): (DataFrame, DataFrame) =
    interpretedControlPlans(spark) {
      convertInMemoryImpl(spark, secSummPath, sparsePath, opts, manualCorrelationPath)
    }

  /** Materialize a CONTROL table as a LocalRelation-backed DataFrame.
    *
    * Why not .cache(): block-caching keeps the full physical plan
    * inside the InMemoryRelation, and the convert nests caches inside
    * caches (secsumm → folded → SIT → affine) — every downstream task
    * closure then serializes the whole chain (measured 24-33 MiB task
    * binaries). Collecting the handful of rows and re-planting them as
    * a LocalRelation truncates ALL lineage: downstream plans carry the
    * literal rows (kilobytes) and re-execute nothing. Only ever
    * applied to control tables, which are small by construction (a
    * splice is a human-authored table) at any measurement-data scale.
    */
  private def localize(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(df.collectAsList(), df.schema)

  private def convertInMemoryImpl(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      opts: SpliceOptions,
      manualCorrelationPath: Option[String]): (DataFrame, DataFrame) = {
    import graft.core.Progress
    Progress.report(0, "Loading section summary and sparse splice...")
    // control tables feed several broadcast joins each — localize so
    // the CSV is scanned once and every consumer plans over literal
    // rows instead of re-deriving the scan
    val secsumm = localize(spark, CsvIO.load(spark, secSummPath, SectionSummaryFormat, withSeq = true))
    val sparse = localize(spark, CsvIO.load(spark, sparsePath, SparseSpliceFormat, withSeq = true))
    // the tables were just collected into LocalRelations, so the P16
    // pre-flight validates the local rows directly — zero Spark jobs
    // (the aggregate form below stays the API for distributed tables)
    validateSectionColumnsLocal(sparse, Seq("TopSection", "BottomSection"), "Sparse Splice")
    validateSectionColumnsLocal(secsumm, Seq("Section"), "Section Summary")
    Progress.report(25, "Processing sparse splice intervals...")
    val (sitDf, onAffines) = SpliceBuilder.sparseSpliceToSIT(spark, sparse, secsumm, opts)
    val sitRounded = localize(spark, CsvIO.roundNumeric(sitDf, SITFormat))
    val mancorr = manualCorrelationPath.map { p =>
      ManualCorrelation.load(spark, p).getOrElse(
        throw new FormatError(s"The manual correlation file $p could not be loaded."))
    }
    Progress.report(50, "Determining affine shifts for off-splice cores...")
    val offAffines = OffSplice.gather(spark, secsumm, sitRounded, mancorr)
    val affDf = CsvIO.roundNumeric(
      AffineFinish.finish(onAffines.unionByName(offAffines)), AffineFormat)
    // Both outputs leave as localized (eagerly materialized, lineage-
    // free) tables: the memo hands every later consumer literal rows,
    // and a caller that only touches the SIT never defers the
    // off-splice compute onto the next caller.
    (sitRounded, localize(spark, affDf))
  }

  /** File-sink form: the in-memory conversion (memoized — a session
    * converting then exporting pays for one pipeline, not two) plus
    * the two pretty-named CSV sinks. The reference's mid-pipeline SIT
    * file round-trip is represented by convertInMemory's explicit
    * 3-decimal rounding; SpliceGoldenSpec diffs this path's outputs
    * byte-for-byte against reference runs.
    */
  def convertSparseSplice(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      affineOutPath: String, sitOutPath: String,
      opts: SpliceOptions = SpliceOptions(),
      manualCorrelationPath: Option[String] = None,
      org: String = "IODP"): Unit = interpretedControlPlans(spark) {
    val (sit, aff) = convertInMemory(spark, secSummPath, sparsePath, opts, manualCorrelationPath)
    // feldman.py:134
    graft.core.Progress.report(100, "Writing affine and SIT to file...")
    CsvIO.save(CsvIO.prettyColumns(sit, SITFormat, org), sitOutPath)
    CsvIO.save(CsvIO.prettyColumns(aff, AffineFormat, org), affineOutPath)
  }
}
