package graft

import graft.core.export.MeasurementExport
import graft.core.splice.{Convert, SpliceOptions}
import org.apache.spark.sql.SparkSession

/** CLI mirroring the reference's two entry points (feldman.py:96,298)
  * so a feldman user can run the same jobs with spark-submit:
  *
  *   graft.Main convert <sectionSummary.csv> <sparseSplice.csv>
  *       <affineOut.csv> <sitOut.csv>
  *       [--scaled] [--lazy-append] [--splice-start-depth D]
  *       [--manual-correlation FILE]
  *
  *   graft.Main export <affine.csv> <sit.csv> <measurement.csv>
  *       <out.csv> --depth-column NAME
  *       [--no-off-splice] [--whole-section] [--no-sort] [--vocab ORG]
  *
  * `--vocab` switches the output column vocabulary globally (IODP or
  * LacCore, reference qtmain.py:56-58); `--no-sort` skips the
  * total-order presentation sort for cluster-scale exports.
  */
object Main {

  private def usage(): Nothing = {
    System.err.println(
      """usage:
        |  convert <secSumm> <sparse> <affineOut> <sitOut>
        |      [--scaled] [--lazy-append] [--splice-start-depth D]
        |      [--manual-correlation FILE] [--vocab ORG]
        |  export <affine> <sit> <measurement> <out> --depth-column NAME
        |      [--no-off-splice] [--whole-section] [--no-sort] [--vocab ORG]
        |  curate <docs.parquet> <benchmark.parquet> <outDir>
        |      [--id-col C] [--text-col C]""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 1) usage()
    // spark-submit injects the master; default to local[*] when run
    // directly (sbt runMain, plain java -cp). When a host application
    // (or test harness) already owns a session, reuse it and do NOT
    // stop it on exit — stopping a borrowed session would tear down
    // the caller's executors.
    val borrowed = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val builder = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    try args(0) match {
      case "convert" =>
        val pos = args.drop(1).takeWhile(!_.startsWith("--"))
        if (pos.length != 4) usage()
        var opts = SpliceOptions()
        var mancorr: Option[String] = None
        var vocab = "IODP"
        var rest = args.drop(5).toList
        while (rest.nonEmpty) rest = rest match {
          case Nil => Nil
          case "--scaled" :: t => opts = opts.copy(useScaledDepths = true); t
          case "--lazy-append" :: t => opts = opts.copy(lazyAppend = true); t
          case "--splice-start-depth" :: d :: t =>
            opts = opts.copy(spliceStartDepth = Some(d.toDouble)); t
          case "--manual-correlation" :: f :: t => mancorr = Some(f); t
          case "--vocab" :: v :: t => vocab = v; t
          case unknown :: _ =>
            System.err.println(s"unknown option: $unknown"); usage()
        }
        Convert.convertSparseSplice(spark, pos(0), pos(1), pos(2), pos(3), opts, mancorr, vocab)
        println(s"wrote ${pos(2)} and ${pos(3)}")

      case "export" =>
        val pos = args.drop(1).takeWhile(!_.startsWith("--"))
        if (pos.length != 4) usage()
        var depthColumn: Option[String] = None
        var includeOffSplice = true
        var wholeSection = false
        var sortOut = true
        var vocab = "IODP"
        var rest = args.drop(5).toList
        while (rest.nonEmpty) rest = rest match {
          case Nil => Nil
          case "--depth-column" :: n :: t => depthColumn = Some(n); t
          case "--no-off-splice" :: t => includeOffSplice = false; t
          case "--whole-section" :: t => wholeSection = true; t
          case "--no-sort" :: t => sortOut = false; t
          case "--vocab" :: v :: t => vocab = v; t
          case unknown :: _ =>
            System.err.println(s"unknown option: $unknown"); usage()
        }
        val dc = depthColumn.getOrElse {
          System.err.println("--depth-column is required"); usage()
        }
        MeasurementExport.exportMeasurementData(spark, pos(0), pos(1), pos(2), pos(3),
          dc, includeOffSplice, wholeSection, sortOut, vocab)
        println(s"wrote ${pos(3)}")

      case "curate" =>
        // corpus curation over parquet: survivors + one-row funnel.
        //   curate <docs.parquet> <benchmark.parquet> <outDir>
        //       [--id-col C] [--text-col C]
        val pos = args.drop(1).takeWhile(!_.startsWith("--"))
        if (pos.length != 3) usage()
        var idCol = "doc_id"
        var textCol = "text"
        var rest = args.drop(4).toList
        while (rest.nonEmpty) rest = rest match {
          case Nil => Nil
          case "--id-col" :: c :: t => idCol = c; t
          case "--text-col" :: c :: t => textCol = c; t
          case unknown :: _ =>
            System.err.println(s"unknown option: $unknown"); usage()
        }
        val docs = spark.read.parquet(pos(0))
        val benchmark = spark.read.parquet(pos(1))
        val survivors = graft.ops.CurationPipeline
          .curate(docs, benchmark, idCol, textCol)
        survivors.write.mode("overwrite").parquet(s"${pos(2)}/survivors")
        graft.ops.CurationPipeline.funnel(docs, benchmark, idCol, textCol)
          .write.mode("overwrite").parquet(s"${pos(2)}/funnel")
        println(s"wrote ${pos(2)}/survivors and ${pos(2)}/funnel")

      case other =>
        System.err.println(s"unknown command: $other"); usage()
    } finally if (!borrowed) spark.stop()
  }
}
