package graft.core

import graft.ops.PackOps

/** packEfficiency + passageWindows hand-computed contracts. */
class PackEffSpec extends SparkSpec {
  import spark.implicits._

  test("passageWindows: cumulative-floor grouping, oversized sentences, skipped ids") {
    val df = Seq(
      // sentences of 3/3/3 tokens at L=5: cum 0,3,6 -> pids 0,0,1
      (1L, "a b c. d e f. g h i"),
      // 12-token monster then a short one: pids 0, 2 (id 1 skipped)
      (2L, "w w w w w w w w w w w w. x y"),
      (3L, "")).toDF("id", "text")
    val got = graft.ops.PackOps.passageWindows(df, "id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    assert(got((1L, 0L)) === ((2, 6)))   // "a b c. d e f"
    assert(got((1L, 1L)) === ((1, 3)))   // "g h i"
    assert(got((2L, 0L)) === ((1, 12)))  // oversized sentence kept whole
    assert(got((2L, 2L)) === ((1, 2)))   // skipped id 1 never emitted
    assert(!got.contains((2L, 1L)))
    assert(!got.keySet.exists(_._1 == 3L), "empty doc emits nothing")
    assert(got.size === 4)
  }

  test("report matches hand math at two lengths") {
    // token counts: 3, 10, 10, 7
    val counts = Seq(3L, 10L, 10L, 7L).toDF("n")
    val got = PackOps.packEfficiency(counts, "n", Seq(8, 16))
      .collect().map(r => r.getLong(0) -> r).toMap
    // L=8: kept = 3+8+8+7 = 26; truncated = 2 docs, loss (2+2)=4;
    // pad = 5+0+0+1 = 6; packed = ceil(26/8) = 4
    val r8 = got(8L)
    assert(r8.getLong(1) === 4 && r8.getLong(2) === 2 && r8.getLong(3) === 4)
    assert(r8.getLong(4) === 6 && r8.getLong(5) === 4)
    assert(r8.getDouble(6) === 26.0 / 32.0 && r8.getDouble(7) === 26.0 / 32.0)
    // L=16: nothing truncated; kept = 30; pad = 13+6+6+9 = 34;
    // packed = ceil(30/16) = 2 -> util 30/32
    val r16 = got(16L)
    assert(r16.getLong(2) === 0 && r16.getLong(3) === 0)
    assert(r16.getLong(4) === 34 && r16.getLong(5) === 2)
    assert(r16.getDouble(6) === java.math.BigDecimal.valueOf(30.0 / 64.0)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)
    assert(r16.getDouble(7) === 30.0 / 32.0)
  }
}
