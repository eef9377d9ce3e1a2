package graft.core

import graft.ops.BloomOps
import org.apache.spark.sql.functions._

/** Bloom-prefiltered ANTI join (the semi-join flavor is covered by
  * its q-oracle): result must be bit-identical to the plain
  * left_anti join on ANY bloom contents — including a deliberately
  * high-fpp bloom whose false positives exercise the verify path.
  */
class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  test("equals plain left_anti; planted overlap removed; " +
      "partition-invariant") {
    val corpus = (0 until 500).map(i => (i.toLong, s"text_$i")).toDF("id", "t")
    val ref = (0 until 500 by 7).map(i => s"text_$i").toDF("rt")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    val got = ids(BloomOps.bloomAntiJoin(corpus, ref, "t", "rt"))
    val plain = ids(corpus.join(ref, col("t") === col("rt"), "left_anti"))
    assert(got === plain)
    assert(got === (0 until 500).filter(_ % 7 != 0).map(_.toLong))
    assert(got === ids(BloomOps.bloomAntiJoin(corpus.repartition(13),
      ref.repartition(5), "t", "rt")))
  }

  test("false positives from a high-fpp bloom are verified away " +
      "(exactness does not depend on fpp)") {
    val corpus = (0 until 2000).map(i => (i.toLong, s"v$i")).toDF("id", "t")
    val ref = Seq("v0", "v1", "v2").toDF("rt")
    val got = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt", fpp = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (3 until 2000).map(_.toLong))
  }

  test("empty reference returns the corpus unchanged; guards fire") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val empty = Seq.empty[String].toDF("rt")
    val got = BloomOps.bloomAntiJoin(corpus, empty, "t", "rt").count()
    assert(got === 2L)
    intercept[IllegalArgumentException] {
      BloomOps.bloomAntiJoin(corpus, empty, "t", "rt", fpp = 1.5)
    }
    intercept[IllegalArgumentException] { // driver-payload size guard
      BloomOps.buildBloom(corpus, "t", expectedItems = 1000000000000L,
        fpp = 1e-9)
    }
    intercept[IllegalArgumentException] { // cross-family keys fail loudly
      BloomOps.bloomAntiJoin(corpus,
        Seq(1L).toDF("rk"), "t", "rk")
    }
  }

  test("null keys survive (anti-join null semantics preserved)") {
    val corpus = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("id", "t")
    val ref = Seq(Option("a"), Option.empty[String]).toDF("rt")
    val got = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt")
      .select("id").as[Long].collect().sorted.toSeq
    val plain = corpus.join(ref, col("t") === col("rt"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === plain && got === Seq(2L))
  }
}
