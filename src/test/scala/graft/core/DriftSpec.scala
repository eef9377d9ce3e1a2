package graft.core

import graft.ops.EventOps
import java.sql.Timestamp

/** typeDrift invariants: identical mixes score 0, disjoint mixes score
  * ln 2, vanished categories stay defined, only consecutive-bucket
  * pairs emit.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ev(sec: Long, t: String) = (new Timestamp(sec * 1000L), t)

  test("JSD endpoints: 0 for identical mixes, ln 2 for disjoint, defined on vanish") {
    val W = 100
    val rows =
      // buckets 0 and 1: identical mixes -> jsd 0
      Seq.fill(10)(ev(10, "a")) ++ Seq.fill(30)(ev(20, "b")) ++
      Seq.fill(10)(ev(110, "a")) ++ Seq.fill(30)(ev(120, "b")) ++
      // bucket 2: disjoint from bucket 1 -> jsd ln 2
      Seq.fill(25)(ev(210, "c")) ++ Seq.fill(15)(ev(220, "d")) ++
      // bucket 3: category c vanishes, d doubles share
      Seq.fill(40)(ev(310, "d"))
    val df = rows.toDF("ts", "event_type")
    val got = EventOps.typeDrift(df, "ts", "event_type", W)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === Set(0L, 100L, 200L))
    assert(got(0L) === ((40L, 40L, 2L, 0.0)), "identical mixes drift 0")
    val lnTwo = java.math.BigDecimal.valueOf(math.log(2.0))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(got(100L)._4 === lnTwo, s"disjoint mixes: ${got(100L)}")
    assert(got(100L)._3 === 4L)
    // vanish case: jsd in (0, ln 2), still defined
    assert(got(200L)._4 > 0.0 && got(200L)._4 < lnTwo, got(200L).toString)
  }
}
