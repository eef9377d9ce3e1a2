package graft.core

import java.sql.Timestamp

import graft.ops.TimeSeriesOps
import org.apache.spark.sql.functions._

/** Closed-form hand cases for exact lag autocorrelation (q253): a
  * period-2 alternating series has ACF(1) = −1 and ACF(2) = +1
  * exactly; a constant series has NULL acf.
  */
class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hour: Int) = new Timestamp(hour * 3600L * 1000L)

  test("alternating series: ACF(1) = -1, ACF(2) = +1 exactly") {
    val events = (0 until 20).map(h =>
      ("s", ts(h), if (h % 2 == 0) 1.0 else 2.0))
      .toDF("k", "t", "v")
    val got = TimeSeriesOps.autocorr(events, "k", "t", "v", Seq(1, 2))
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1) == ((19L, -1.0)), s"lag1: ${got(1)}")
    assert(got(2) == ((18L, 1.0)), s"lag2: ${got(2)}")
  }

  test("crossCorr: B = A shifted one hour -> XCF(+1) = 1, XCF(0) = -1 on alternation") {
    val a = (0 until 20).map(h =>
      ("A", ts(h), if (h % 2 == 0) 1.0 else 2.0))
    val b = (1 until 21).map(h =>   // B_t = A_{t-1}
      ("B", ts(h), if ((h - 1) % 2 == 0) 1.0 else 2.0))
    val events = (a ++ b).toDF("k", "t", "v")
    val got = TimeSeriesOps.crossCorr(events, "t", "k", "v", "A", "B",
        Seq(0, 1))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(1) == 1.0, s"A leads B by 1h exactly: $got")
    assert(got(0) == -1.0, s"contemporaneous alternation anti-corr: $got")
  }

  test("constant series: zero variance -> NULL acf") {
    val events = (0 until 10).map(h => ("c", ts(h), 5.0)).toDF("k", "t", "v")
    val rows = TimeSeriesOps.autocorr(events, "k", "t", "v", Seq(1))
      .collect()
    assert(rows.length == 1 && rows(0).isNullAt(3))
  }

  test("in-hour averaging feeds the grid: two readings per hour mean exactly") {
    // hour h carries readings (h, h+2) -> mean h+1; alternating +/-
    // pattern preserved, so ACF(1) still -1
    val events = (0 until 12).flatMap { h =>
      val base = if (h % 2 == 0) 1.0 else 3.0
      Seq(("m", ts(h), base - 1.0), ("m", ts(h), base + 1.0))
    }.toDF("k", "t", "v")
    val got = TimeSeriesOps.autocorr(events, "k", "t", "v", Seq(1))
      .collect()(0)
    assert(got.getLong(2) == 11L && got.getDouble(3) == -1.0)
  }
}
