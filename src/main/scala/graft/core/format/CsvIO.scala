package graft.core.format

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-validated CSV scan/sink (reference: tabular/csvio.py:19-83,
  * tabular/pandasutils.py:19-52).
  *
  * Scan pipeline: header read (all columns string-typed) → `?`/`??`/
  * `???` → null scrub → compound SiteHole split → synonym resolution →
  * required-column validation (fail fast with FormatError) → optional
  * columns appended with defaults → rename to internal names → NUMERIC
  * cast to double → STRING null→"" scrub. Extra input columns pass
  * through untouched (open-world schema).
  *
  * Scale notes: resolution/validation is pure driver-side header work;
  * the data path is a single projection over the scan, fully inside
  * whole-stage codegen. The `_seq` ordering column is the explicit
  * file-order contract the splice fold (O1) depends on — derived from
  * a single-partition read of these small control tables. Bulk fact
  * tables (measurement data) never need `_seq` ordering semantics
  * beyond presentation, so at 100 TB they load without the coalesce.
  */
object CsvIO {

  val NaValues: Seq[String] = Seq("?", "??", "???")
  val SeqCol = "_seq"

  /** Raw CSV scan, BOM-tolerant, blank lines skipped, all columns
    * string (types are applied by the format layer, exactly like the
    * reference's post-load coercion). (pandasutils.py:19-36)
    */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .option("mode", "PERMISSIVE")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
    // Supplying the header-derived schema up front skips Spark's
    // name-inference pass (one job + a second file open per load) —
    // measurable when a pipeline loads several control tables. Any
    // oddity (directory input, unbalanced quotes, duplicate names)
    // falls back to Spark's own inference.
    headerSchema(spark, path) match {
      case Some(sch) => base.schema(sch).csv(path)
      case None => base.csv(path)
    }
  }

  /** Driver-side header probe via the Hadoop FS API (works for any
    * supported filesystem, not just file://): first non-blank line,
    * BOM stripped, parsed with CSV quote rules. None ⇒ caller should
    * let Spark infer.
    */
  private def headerSchema(spark: SparkSession, path: String): Option[org.apache.spark.sql.types.StructType] =
    try {
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(hPath)
      if (!st.isFile) return None
      val in = fs.open(hPath)
      val line =
        try {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
          var l = br.readLine()
          while (l != null && l.trim.isEmpty) l = br.readLine()
          l
        } finally in.close()
      if (line == null) return None
      parseCsvLine(line.stripPrefix("﻿")).flatMap { raw =>
        val names = raw.zipWithIndex.map { case (n, i) => if (n.isEmpty) s"_c$i" else n }
        if (names.distinct.length != names.length) None // let Spark handle dup headers
        else Some(org.apache.spark.sql.types.StructType(names.map(n =>
          org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** One CSV record: comma-separated, double-quote delimited, ""
    * escapes a quote inside a quoted field; unquoted fields trimmed
    * (matching the ignore*WhiteSpace scan options). None on
    * unbalanced quotes (e.g. a header spanning lines).
    */
  private[core] def parseCsvLine(line: String): Option[Seq[String]] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quoted = false
    var wasQuoted = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (quoted) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else quoted = false
        } else cur.append(c)
      } else c match {
        case '"' => quoted = true; wasQuoted = true
        case ',' =>
          out += (if (wasQuoted) cur.toString else cur.toString.trim)
          cur.clear(); wasQuoted = false
        case other => cur.append(other)
      }
      i += 1
    }
    if (quoted) None
    else {
      out += (if (wasQuoted) cur.toString else cur.toString.trim)
      Some(out.result())
    }
  }

  def headers(spark: SparkSession, path: String): Seq[String] =
    readRaw(spark, path).schema.fieldNames.toSeq

  /** S4: can this file be parsed as fmt? Headers-only probe, like the
    * reference does not account for SiteHole splitting here.
    * (csvio.py:78-83)
    */
  def canLoad(spark: SparkSession, path: String, fmt: FormatSpec): Boolean =
    fmt.missingRequired(headers(spark, path)).isEmpty

  /** S3: format-validated scan. With `withSeq`, appends a `_seq` long
    * preserving file row order (single small file ⇒ single partition ⇒
    * monotonically_increasing_id is file order).
    */
  def load(spark: SparkSession, path: String, fmt: FormatSpec,
      withSeq: Boolean = false): DataFrame = {
    var df = readRaw(spark, path).coalesce(1)
    if (withSeq) df = df.withColumn(SeqCol, monotonically_increasing_id())

    // multi-valued NA scrub (csvio.py:21): '?','??','???' → null.
    // Single select, not a per-column withColumn fold — a fold builds
    // one nested Project per column and Catalyst analysis time on the
    // resulting plan dwarfs the actual scan for these control tables.
    val scrubbed = df.select(df.columns.map { c =>
      if (c == SeqCol) col(c)
      else when(col(c).isin(NaValues: _*), lit(null)).otherwise(col(c)).as(c)
    }.toSeq: _*)
    val split = splitSiteHole(scrubbed)

    val inputCols = split.columns.filterNot(_ == SeqCol).toSeq
    val colmap = fmt.mapColumns(inputCols)
    val missingReq = fmt.missingRequired(inputCols)
    if (missingReq.nonEmpty)
      throw new FormatError(
        s"The ${fmt.name} format requires the following column(s): ${missingReq.mkString(",")}")

    // One flat projection: rename inputs to internal names, apply the
    // format types (NUMERIC → double, STRING → ""-for-null), append
    // missing optional columns with defaults. (csvio.py:36-43,
    // pandasutils.py:102-108)
    val renameMap = colmap.map(_.swap) // input name → internal name
    val byName = fmt.cols.map(c => c.name -> c).toMap
    val missingOpt = fmt.cols.filter(c => c.optional && !colmap.contains(c.name))
    val outCols = split.columns.map { c =>
      val name = renameMap.getOrElse(c, c)
      byName.get(name) match {
        case Some(fc) if fc.isNumeric => col(c).cast("double").as(name)
        case Some(fc) if fc.isString =>
          coalesce(col(c).cast("string"), lit("")).as(name)
        case _ => col(c).as(name)
      }
    }.toSeq ++ missingOpt.map(c =>
      (if (c.isString) lit("") else lit(null).cast("double")).as(c.name))
    split.select(outCols: _*)
  }

  /** Split a compound SiteHole column ("1A") into Site and Hole when
    * neither exists yet; original column is kept, split columns append
    * at the end. (csvio.py:55-67)
    */
  def splitSiteHole(df: DataFrame): DataFrame =
    Las.findMatch("SiteHole", df.columns.toSeq) match {
      case Some(sh) if !df.columns.contains("Site") && !df.columns.contains("Hole") =>
        val parts = Las.splitCaps(sh) // e.g. Seq("Site", "Hole")
        df.withColumn(parts.head, regexp_extract(col(sh), "([0-9]+)([A-Z]+)", 1))
          .withColumn(parts(1), regexp_extract(col(sh), "([0-9]+)([A-Z]+)", 2))
      case _ => df
    }

  /** Drop split Site/Hole on write when the compound column is present.
    * (csvio.py:70-74)
    */
  def dropSiteHole(df: DataFrame): DataFrame =
    Las.findMatch("SiteHole", df.columns.toSeq) match {
      case Some(_) if df.columns.contains("Site") && df.columns.contains("Hole") =>
        df.drop("Site", "Hole")
      case _ => df
    }

  /** P10: round the format's NUMERIC columns to `digits` decimals.
    * (feldman.py:538-544)
    */
  def roundNumeric(df: DataFrame, fmt: FormatSpec, digits: Int = 3): DataFrame = {
    val numeric = fmt.cols.filter(_.isNumeric).map(_.name).toSet
    df.select(df.columns.map(c =>
      if (numeric(c)) round(col(c), digits).as(c) else col(c)).toSeq: _*)
  }

  /** P8: rename internal names to org-vocabulary pretty names.
    * (feldman.py:533-535)
    */
  def prettyColumns(df: DataFrame, fmt: FormatSpec, org: String = "IODP"): DataFrame = {
    val m = fmt.cols.filter(c => df.columns.contains(c.name))
      .map(c => c.name -> c.prettyName(org)).toMap
    df.withColumnsRenamed(m)
  }

  /** Filename date suffix, `stem` → `stem_YYYY-MM-DD` (reference:
    * feldman.py:546-547, `date.today().isoformat()`); `today`
    * injectable for tests.
    */
  def appendDate(text: String,
      today: java.time.LocalDate = java.time.LocalDate.now()): String =
    s"${text}_$today"

  /** S5: single-file CSV sink with the exact target filename (the
    * reference writes one CSV per output). Internal `_`-prefixed
    * columns are dropped; SiteHole compounds collapse back.
    */
  def save(df: DataFrame, path: String): Unit = {
    val cleaned = dropSiteHole(df.drop(df.columns.filter(_.startsWith("_")).toIndexedSeq: _*))
    val tmp = Files.createTempDirectory("graft_csv").toString + "/out"
    cleaned.coalesce(1).write.option("header", "true").mode("overwrite").csv(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
      .find(p => p.endsWith(".csv") && p.contains("part-"))
      .getOrElse(throw new IllegalStateException(s"no csv part written under $tmp"))
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.move(Paths.get(part), Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Multi-file sibling of `save`: identical cleaning (helper columns
    * and split SiteHole dropped), one CSV part file per partition —
    * the cluster-scale sink where a single-file coalesce would
    * bottleneck on one task.
    */
  def saveDir(df: DataFrame, dir: String): Unit = {
    val cleaned = dropSiteHole(df.drop(df.columns.filter(_.startsWith("_")).toIndexedSeq: _*))
    cleaned.write.option("header", "true").mode("overwrite").csv(dir)
  }

  /** S6: Correlator's legacy " \t"-delimited .dat reader with its fixed
    * 11-column header. (feldman.py:42-49 — vestigial in the reference,
    * kept for surface completeness.)
    */
  def loadCorrelatorDat(spark: SparkSession, path: String): DataFrame = {
    val names = Seq("Exp", "Site", "Hole", "Core", "CoreType", "Section",
      "TopOffset", "BottomOffset", "Depth", "Data", "RunNo")
    val df = spark.read
      .option("header", "false").option("sep", " \t")
      .option("comment", "#").option("ignoreLeadingWhiteSpace", "true")
      .csv(path)
    df.toDF(names.take(df.columns.length): _*)
  }

  /** S7: names of columns that parse fully as numeric in a quick
    * inference pass — depth-column candidates. (qtmain.py:27-30)
    */
  def numericColumns(spark: SparkSession, path: String): Seq[String] = {
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }.toSeq
  }
}
