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
