package graft.core

import graft.ops.EventOps
import org.apache.spark.sql.functions._

/** Retention-cohort and funnel invariants on hand-crafted event
  * streams (the oracle covers the synthetic table; these pin the
  * SEMANTICS: first-touch anchoring, window expiry, ordering).
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("s")).as("ts"))

  test("retentionCohorts: cohort sizes, offsets, and fractions") {
    // u1, u2 first seen week of 2024-01-01 (Mon); u1 returns 2 weeks
    // later; u3 first seen the next week.
    val e = ev(
      (1L, "view", "2024-01-02 10:00:00"),
      (2L, "view", "2024-01-03 10:00:00"),
      (1L, "view", "2024-01-16 10:00:00"),
      (3L, "view", "2024-01-10 10:00:00"))
    val got = EventOps.retentionCohorts(e, "ts", "user_id")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("2024-01-01", 0)) === ((2L, 2L, 1.0)))
    assert(got(("2024-01-01", 2)) === ((1L, 2L, 0.5)))
    assert(got(("2024-01-08", 0)) === ((1L, 1L, 1.0)))
    assert(got.size === 3)
  }

  test("eventFunnel: full conversion, ordering enforced, window expiry") {
    val steps = Seq("signup", "view", "purchase")
    val e = ev(
      // u1: full ordered funnel inside the window -> depth 3
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-02 00:00:00"),
      (1L, "purchase", "2024-01-03 00:00:00"),
      // u2: view BEFORE signup, none after -> depth 1
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "signup", "2024-01-02 00:00:00"),
      // u3: purchase outside the 7-day window -> depth 2
      (3L, "signup", "2024-01-01 00:00:00"),
      (3L, "view", "2024-01-02 00:00:00"),
      (3L, "purchase", "2024-01-20 00:00:00"),
      // u4: never signs up -> depth 0 (not counted anywhere)
      (4L, "view", "2024-01-01 00:00:00"))
    val got = EventOps.eventFunnel(e, "ts", "user_id", "event_type",
        steps, windowDays = 7)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1) === (("signup", 3L, 1.0)))
    assert(got(2) === (("view", 2L, 0.666667)))
    assert(got(3) === (("purchase", 1L, 0.333333)))
  }

  test("eventFunnel: first-touch anchoring — a later signup never re-opens the window") {
    val steps = Seq("signup", "purchase")
    val e = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "signup", "2024-01-10 00:00:00"),
      (1L, "purchase", "2024-01-12 00:00:00")) // in window of 2nd signup only
    val got = EventOps.eventFunnel(e, "ts", "user_id", "event_type",
        steps, windowDays = 7)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got(1) === 1L)
    assert(got(2) === 0L) // first-touch contract: anchored at Jan 1
  }

  test("eventFunnel: step event between two previous-step events still matches (earliest-valid walk)") {
    val steps = Seq("signup", "view", "purchase")
    val e = ev(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 06:00:00"),
      (1L, "view", "2024-01-03 00:00:00"),
      (1L, "purchase", "2024-01-02 00:00:00")) // after FIRST view only
    val got = EventOps.eventFunnel(e, "ts", "user_id", "event_type",
        steps, windowDays = 7)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // earliest-valid view (Jan 1 06:00) leaves the purchase matchable
    assert(got(3) === 1L)
  }

  test("frequentJourneys: paths never cross session gaps or users; " +
      "counts and deterministic top-n tie-break by hand") {
    // u1 session A: a b c d  (3-paths: a>b>c, b>c>d)
    // u1 session B (2h later): a b c  (a>b>c)
    // u2 one session: a b c  (a>b>c)  — a>b>c total 3
    val rows = Seq(
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (1L, 2L, "b", "2024-01-01 10:01:00"),
      (1L, 3L, "c", "2024-01-01 10:02:00"),
      (1L, 4L, "d", "2024-01-01 10:03:00"),
      (1L, 5L, "a", "2024-01-01 12:30:00"),
      (1L, 6L, "b", "2024-01-01 12:31:00"),
      (1L, 7L, "c", "2024-01-01 12:32:00"),
      (2L, 8L, "a", "2024-01-01 09:00:00"),
      (2L, 9L, "b", "2024-01-01 09:01:00"),
      (2L, 10L, "c", "2024-01-01 09:02:00"))
      .toDF("user_id", "event_id", "event_type", "s")
      .select(col("user_id"), col("event_id"), col("event_type"),
        to_timestamp(col("s")).as("ts"))
    val got = EventOps.frequentJourneys(rows, "ts", "user_id",
        "event_type", "event_id", gapSeconds = 1800.0, k = 3, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet === Set(("a > b > c", 3L, 1), ("b > c > d", 1L, 2)),
      got.mkString(", "))
    // no c>d>a (session gap), no c>a>b across the 2.5h break, no
    // cross-user stitching — all implied by the exact set above
    // tie-break: equal counts rank by path asc
    val tied = Seq(
      (1L, 1L, "x", "2024-01-01 10:00:00"),
      (1L, 2L, "y", "2024-01-01 10:01:00"),
      (2L, 3L, "p", "2024-01-01 10:00:00"),
      (2L, 4L, "q", "2024-01-01 10:01:00"))
      .toDF("user_id", "event_id", "event_type", "s")
      .select(col("user_id"), col("event_id"), col("event_type"),
        to_timestamp(col("s")).as("ts"))
    val t = EventOps.frequentJourneys(tied, "ts", "user_id",
        "event_type", "event_id", 1800.0, k = 2, topN = 1)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(t.toSeq === Seq(("p > q", 1)))
    intercept[IllegalArgumentException] {
      EventOps.frequentJourneys(tied, "ts", "user_id", "event_type",
        "event_id", 1800.0, k = 1, topN = 1)
    }
  }

  test("stationaryDistribution: exact 2-iteration hand trajectory, " +
      "convergence to 1/4-3/4, absorbing state swallows all mass") {
    import spark.implicits._
    val tr = Seq(("A", "B", 3L), ("B", "A", 1L), ("B", "B", 2L))
      .toDF("f", "t", "n")
    // pi0 = (500000, 500000); iter1 -> (166667, 833333);
    // iter2 -> (277778, 722222) — every term the half-up spelling
    val two = EventOps.stationaryDistribution(tr, "f", "t", "n",
        iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two == Map("A" -> 277778L, "B" -> 722222L), s"got $two")
    // the chain's stationary distribution is (1/4, 3/4)
    val conv = EventOps.stationaryDistribution(tr, "f", "t", "n",
        iters = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(conv("A") - 250000L) <= 2 &&
      math.abs(conv("B") - 750000L) <= 2, s"got $conv")
    // absorbing B: one step drains A entirely into B, forever
    val abs = EventOps.stationaryDistribution(
        Seq(("A", "B", 5L)).toDF("f", "t", "n"), "f", "t", "n",
        iters = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(abs == Map("A" -> 0L, "B" -> 1000000L), s"got $abs")
  }
}
