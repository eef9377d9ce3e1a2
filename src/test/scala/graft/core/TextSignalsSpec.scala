package graft.core

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Gram novelty (q116), script profile (q117), invisible scrub (q118). */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("gramNovelty: unique, duplicated, and runt documents") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),     // unique grams
      (2L, "shared phrase here we go again now"), // duplicated below
      (3L, "shared phrase here we go again now"),
      (4L, "too short")                           // < 3 tokens: no grams
    ).toDF("doc_id", "text")
    val out = TextOps.gramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))).toMap
    assert(out(1) == ((3L, 3L, 1L, 1.0)), out(1).toString)
    // doc 2/3: every gram also in the twin -> df=2, zero novel
    assert(out(2)._2 == 0 && out(2)._3 == 2 && out(2)._4 == 0.0)
    assert(out(3) == out(2))
    assert(out(4)._1 == 0 && out(4)._4.isNaN, "runt doc: 0 grams, NULL novelty")
  }

  test("scriptProfile: known mixtures, zero-shuffle plan") {
    val docs = Seq(
      (1L, "pure ascii words"),
      (2L, "Привет мир"),
      (3L, "日本語とカタカナ"),
      (4L, "half latin половина")
    ).toDF("doc_id", "text")
    val prof = TextOps.scriptProfile(docs, "doc_id", "text")
    val shuffles = prof.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "script profile must stay a pure projection")
    val m = prof.collect().map(r => r.getLong(0) -> r).toMap
    def g(id: Long, c: String) = { val r = m(id); r.getDouble(r.fieldIndex(c)) }
    assert(g(1, "latin_frac") == 1.0 && g(1, "cyrillic_frac") == 0.0)
    assert(g(2, "cyrillic_frac") == 1.0)
    assert(g(3, "cjk_frac") > 0 && g(3, "kana_frac") > 0 &&
      math.abs(g(3, "cjk_frac") + g(3, "kana_frac") - 1.0) < 1e-9)
    assert(g(4, "latin_frac") > 0.3 && g(4, "cyrillic_frac") > 0.3)
  }

  test("corrMatrix: hand case, repartition bit-identity, zero-variance NULL") {
    val df = Seq(
      (1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0), (4.0, 8.0, 5.0))
      .toDF("x", "y", "z")
    val out = graft.ops.ProfileOps.corrMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out(("x", "y")) == 1.0, "perfect linear relation")
    assert(out(("x", "z")) == null, "zero-variance column yields NULL")
    assert(out(("y", "z")) == null)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val a = graft.ops.ProfileOps.corrMatrix(li, cols).collect().toSeq
    val b = graft.ops.ProfileOps.corrMatrix(li.repartition(17), cols)
      .collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted,
      "corr must be bit-identical under repartitioning")
  }

  test("gramNoveltyVsRef: copied doc scores 0, new-vocab doc scores 1") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "pack my box with five dozen liquor jugs now")).toDF("id", "text")
    val target = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // exact copy
      (11L, "zz yy xx ww vv uu tt ss"),                           // all new
      (12L, "the quick brown fox went home early"),               // partial
      (13L, "ab cd")).toDF("id", "text")                          // <3 tokens
    val got = graft.ops.TextOps.gramNoveltyVsRef(target, ref, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(10L)._3 === Some(0.0), s"copy: ${got(10L)}")
    assert(got(11L)._3 === Some(1.0), s"new vocab: ${got(11L)}")
    val (n12, nov12, frac12) = got(12L)
    assert(nov12 > 0L && nov12 < n12 && frac12.get > 0.0 && frac12.get < 1.0)
    assert(got(13L) === ((0L, 0L, None)), "short doc: no grams, NULL novelty")
  }

  test("corrMatrixFixedPoint is bit-identical to the decimal path") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val a = graft.ops.ProfileOps.corrMatrix(li, cols)
      .collect().map(_.toString).sorted.toSeq
    val b = graft.ops.ProfileOps.corrMatrixFixedPoint(li, cols, scale = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    // negatives stay exact (floor(x+0.5) at negative values)
    val neg = Seq((-1.25, 2.5), (-3.75, -0.5), (2.25, 1.0), (0.0, -4.5))
      .toDF("x", "y")
    val an = graft.ops.ProfileOps.corrMatrix(neg, Seq("x", "y"))
      .collect().map(_.toString).toSeq
    val bn = graft.ops.ProfileOps.corrMatrixFixedPoint(neg, Seq("x", "y"), 2)
      .collect().map(_.toString).toSeq
    assert(an === bn)
  }

  test("corrMatrixApprox agrees with the exact path to 1e-9") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val exact = toMap(graft.ops.ProfileOps.corrMatrix(li, cols))
    val approx = toMap(graft.ops.ProfileOps.corrMatrixApprox(li, cols))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - approx(k)) < 1e-9, s"$k: $v vs ${approx(k)}")
    }
  }

  test("qualityRules is streaming-safe and matches the batch filter") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, "the quick brown fox jumps over a lazy dog and then runs off " +
        "to the woods of the far north to rest for a little while"),
      (2L, "tiny doc"),
      (3L, "the start of something { lorem ipsum in the middle of it all " +
        "and the rest of the words go on and on for a while longer"))
    val input = MemoryStream[(Long, String)]
    val q = graft.ops.TextOps.qualityRules(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .filter(col("passes"))
      .writeStream.format("memory").queryName("rules_stream")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rules_stream")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.ops.TextOps.qualityRules(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .filter(col("passes")).select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && streamed == Set(1L), streamed.toString)
  }

  test("scrubInvisible: strips artifacts, preserves NBSP as boundary, idempotent") {
    val dirty = "a\u200Bb\u00ADc \u00A0d \uFEFFe\u200E\u202Af"
    val df = Seq((1L, dirty)).toDF("id", "t")
      .select(TextOps.invisibleCount(col("t")).as("n"),
        TextOps.scrubInvisible(col("t")).as("clean"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 6, s"expected 6 invisibles, got ${r.getInt(0)}")
    assert(r.getString(1) == "abc  d ef", s"got '${r.getString(1)}'")
    val again = Seq((1L, r.getString(1))).toDF("id", "t")
      .select(TextOps.invisibleCount(col("t")).as("n"),
        TextOps.scrubInvisible(col("t")).as("clean")).collect()(0)
    assert(again.getInt(0) == 0 && again.getString(1) == r.getString(1))
  }
}
