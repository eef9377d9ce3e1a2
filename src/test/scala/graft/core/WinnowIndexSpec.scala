package graft.core

import graft.ops.WinnowOps
import org.apache.spark.sql.functions._

/** Invariant pins for the incremental passage-fingerprint index
  * (q247): idempotent updates, order-free accumulation, and the keep
  * semantics on boundary docs.
  */
class WinnowIndexSpec extends SparkSpec {
  import spark.implicits._

  private val page = "the quick brown fox jumps over the lazy dog near the riverbank every single morning"

  test("indexUpdate is idempotent and order-free") {
    val b1 = Seq((1L, page)).toDF("id", "text")
    val b2 = Seq((2L, page + " with an extra clause appended at the end")).toDF("id", "text")
    val f1 = WinnowOps.fingerprintIndex(b1, "id", "text")
    val f2 = WinnowOps.fingerprintIndex(b2, "id", "text")
    val once = WinnowOps.indexUpdate(f1, f2).collect().map(_.getString(0)).toSet
    val twice = WinnowOps.indexUpdate(WinnowOps.indexUpdate(f1, f2), f2)
      .collect().map(_.getString(0)).toSet
    val reversed = WinnowOps.indexUpdate(f2, f1).collect().map(_.getString(0)).toSet
    assert(twice == once, "replaying a batch must be a no-op")
    assert(reversed == once, "batch order must not matter")
  }

  test("overlapAgainstIndex: full dup dropped, fresh doc kept, short doc kept with null overlap") {
    val store = WinnowOps.fingerprintIndex(Seq((1L, page)).toDF("id", "text"),
      "id", "text")
    val batch = Seq(
      (10L, page),                    // verbatim dup -> overlap 1.0, drop
      (11L, "completely different content about winter weather patterns in the northern mountain ranges"),
      (12L, "tiny")                   // < k chars -> no fps, keep
    ).toDF("id", "text")
    val got = WinnowOps.overlapAgainstIndex(batch, store, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), r.getInt(4)))).toMap
    assert(got(10L)._3.contains(1.0) && got(10L)._4 == 0)
    assert(got(11L)._2 == 0L && got(11L)._4 == 1, s"fresh doc: ${got(11L)}")
    assert(got(12L) == ((0L, 0L, None, 1)))
  }

  test("IndexStore winnow pair store: explicit-path persist, then a FRESH " +
      "session serves pairs identical to the live funnel") {
    import graft.ops.{IndexStore, WinnowStage}
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files
      .createTempDirectory("graft_winnow_spec").toString + "/pairs"
    IndexStore.persistWinnowPairs(spark, dir, path)
    val s2 = spark.newSession() // no lineage, no memoized frames
    val served = IndexStore.serveWinnowPairsFrom(s2, path, 0.3)
      .select("id_a", "id_b", "n_shared", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val live = WinnowStage.pairsAt(spark, dir, 0.3)
      .select("id_a", "id_b", "n_shared", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(served == live, "stored serve must equal the live funnel")
    assert(served.nonEmpty, "fixture must produce verified pairs")
  }
}
