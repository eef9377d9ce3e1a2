package graft.core

import graft.functions.AcAutomaton
import graft.ops.{BlocklistOps, PlanProbe}
import org.apache.spark.sql.functions._

/** Volume stress for the Aho–Corasick path: a 5000-phrase blocklist
  * over 20k docs stays ONE zero-shuffle pass (the per-phrase-regex
  * alternative would be 5000 scans), with counts spot-checked against
  * brute force.
  */
class BlocklistScaleSpec extends SparkSpec {
  import spark.implicits._

  test("5000-phrase blocklist over 20k docs: one pass, zero shuffle, correct counts") {
    val phrases = (0 until 5000).map(i => s"phrase${i}x marker")
    // every doc hits 3 planted phrases (+ noise), ids derived from doc id
    val docs = spark.range(20000).select(col("id"),
      concat_ws(" ",
        lit("some filler text before"),
        concat(lit("phrase"), (col("id") % 5000), lit("x marker")),
        lit("mid noise"),
        concat(lit("phrase"), ((col("id") + 7) % 5000), lit("x marker")),
        concat(lit("phrase"), ((col("id") + 7) % 5000), lit("x marker")),
        lit("tail")).as("text"))
    val t0 = System.nanoTime()
    val tagged = BlocklistOps.tag(docs, "id", "text", phrases, minHits = 3)
    val bytes = PlanProbe.shuffleBytesWritten(tagged)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(bytes === 0L, s"blocklist tagging shuffled $bytes bytes")
    val rows = tagged.collect()
    assert(rows.length === 20000)
    // planted: 3 total hits (one phrase twice), 2 distinct, blocked
    assert(rows.forall(_.getLong(1) === 3L), "every doc has 3 planted hits")
    assert(rows.forall(_.getInt(2) === 2))
    assert(rows.forall(_.getInt(3) === 1))
    assert(dt < 90.0, s"5000-phrase pass took ${dt}s")
    info(f"20k docs x 5000 phrases: $dt%.1f s, $bytes bytes shuffled")
    // brute-force spot check on one doc
    val ac = new AcAutomaton(phrases.toArray)
    val t = "some filler text before phrase42x marker mid noise " +
      "phrase49x marker phrase49x marker tail"
    val c = ac.countAll(t)
    assert(c(42) === 1L && c(49) === 2L && c.sum === 3L)
  }
}
