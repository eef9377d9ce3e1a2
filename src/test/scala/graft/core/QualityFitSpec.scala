package graft.core

import org.apache.spark.sql.functions._
import graft.ops.{QualityFit, TextOps}

class QualityFitSpec extends SparkSpec {

  private def docs001 = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("distributed IRLS matches the in-memory reference fit") {
    val d = docs001
    val spark_w = QualityFit.fit(d, "text", col("lang") === "en")
    val local_w = QualityFit.fitLocal(
      QualityFit.collectSignals(d, "text", col("lang") === "en"))
    val a = spark_w.toArray; val b = local_w.toArray
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) < 1e-4, s"coef $i: spark=$x local=$y")
    }
  }

  test("fit is invariant under repartitioning (decimal-exact sums)") {
    val d = docs001
    val w1 = QualityFit.fit(d, "text", col("lang") === "en", iters = 4)
    val w2 = QualityFit.fit(d.repartition(17), "text",
      col("lang") === "en", iters = 4)
    assert(w1 == w2)
  }

  test("fit recovers a planted signal: labels from known weights") {
    // label = thresholded true-model score; the fit must re-separate
    // the classes it was generated from (weights themselves diverge
    // on separable data — agreement is the invariant, not equality)
    val trueW = TextOps.QualityWeights(-2.0, 0.05, 0.0, 3.0, -0.1, -4.0)
    val d = docs001
    val scored = d.join(
      TextOps.qualityScore(d, "doc_id", "text", trueW)
        .select(col("id").as("doc_id"), col("quality")), Seq("doc_id"))
    val posFrac = scored.filter(col("quality") > 0.5).count().toDouble /
      scored.count()
    assert(posFrac > 0.05 && posFrac < 0.95, s"degenerate split $posFrac")
    val fitted = QualityFit.fit(scored, "text", col("quality") > 0.5)
    val refit = scored.join(
      TextOps.qualityScore(scored, "doc_id", "text", fitted)
        .select(col("id").as("doc_id"), col("quality").as("q2")), Seq("doc_id"))
    val agree = refit.filter((col("quality") > 0.5) === (col("q2") > 0.5))
      .count().toDouble / refit.count()
    assert(agree >= 0.95, s"classification agreement $agree")
  }

  test("frozen TrainedQualityWeights reproduce the sf0.01 fit exactly") {
    val path = "/root/testdata/sf0.01/documents.parquet"
    assume(new java.io.File(path).exists)
    val w = QualityFit.fit(spark.read.parquet(path), "text",
      col("lang") === "en")
    assert(w == TextOps.TrainedQualityWeights,
      s"retrain drift: $w vs ${TextOps.TrainedQualityWeights} — " +
        "re-run QualityFitProbe and update the frozen constant")
  }

  test("fitColumns: arbitrary signal columns match the in-memory reference") {
    // fit on the documents table's OWN columns (not the 5 built-in
    // text signals): the generalized Gram aggregation must agree with
    // the plain-double local twin on a 3-feature surface
    val d = docs001
    val feats = Seq(col("n_chars").cast("double"),
      length(col("text")).cast("double") / 100.0,
      (col("doc_id") % 7).cast("double"))
    val w = QualityFit.fitColumns(d, col("lang") === "en", feats, iters = 6)
    assert(w.length == 4)
    val rows = d.select(col("lang").cast("string").as("lang"),
        feats(0).as("f1"), feats(1).as("f2"), feats(2).as("f3"))
      .collect().map(r => (Array(r.getDouble(1), r.getDouble(2),
        r.getDouble(3)), if (r.getString(0) == "en") 1.0 else 0.0)).toSeq
    val lw = QualityFit.fitLocalVector(rows, iters = 6)
    w.zip(lw).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) < 1e-4, s"coef $i: spark=$x local=$y")
    }
  }

  test("fitColumns: the 5 built-in signals reproduce fit exactly") {
    val d = docs001
    val w = QualityFit.fit(d, "text", col("lang") === "en", iters = 4)
    // materialize the same 5 signal expressions as plain columns, then
    // fit over THOSE — the decimal sums must match fit's bit-for-bit
    val sig = d.select(col("lang"), col("text"),
        TextOps.tokens(col("text")).as("_w"))
      .select(col("lang"), explode(array(col("_w"))).as("_w"), col("text"))
      .select(col("lang") +:
        TextOps.qualitySignalCols(col("text")).zipWithIndex.map {
          case (c, i) => c.as(s"f${i + 1}")
        }: _*)
    val viaColumns = QualityFit.fitColumns(sig, col("lang") === "en",
      (1 to 5).map(i => col(s"f$i")), iters = 4)
    val a = w.toArray
    viaColumns.zip(a).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) < 1e-9, s"coef $i: columns=$x fit=$y")
    }
  }

  test("solve: gaussian elimination inverts a known system") {
    val a = Array(
      Array(4.0, 1.0, 0.0, 0.0, 0.0, 0.0),
      Array(1.0, 3.0, 1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 2.0, 0.5, 0.0, 0.0),
      Array(0.0, 0.0, 0.5, 2.0, 0.5, 0.0),
      Array(0.0, 0.0, 0.0, 0.5, 1.5, 0.2),
      Array(0.0, 0.0, 0.0, 0.0, 0.2, 1.0))
    val xTrue = Array(1.0, -2.0, 3.0, -1.0, 0.5, 2.0)
    val b = a.map(row => row.zip(xTrue).map { case (p, q) => p * q }.sum)
    val x = QualityFit.solve(a, b)
    x.zip(xTrue).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-10) }
  }
}
