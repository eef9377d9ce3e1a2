package graft.core

import graft.ops.{EventOps, ProfileOps}
import org.apache.spark.sql.functions._

/** Hand cases: Nelson-Aalen hazard ledger, SPRT crossing walk,
  * MCC confusion identities.
  */
class SurvivalSprtSpec extends SparkSpec {
  import spark.implicits._

  test("nelson-aalen: textbook increments and censoring") {
    // durations: events at t=1 (1 of 4 at risk), t=3 (1 of 2);
    // censored at t=2 and t=4
    val subj = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 0)).toDF("t", "ev")
    val r = EventOps.nelsonAalen(subj, "t", "ev").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 0.25)))
    assert(r(3L)._1 == 2L)
    assert(r(3L)._2 == 0.75) // 1/4 + 1/2
    assert(!r.contains(2L) && !r.contains(4L)) // censor-only times
  }

  test("sprt: all-success walk crosses up at the exact index") {
    // wPos=200671 -> boundary 2944439 crossed at ceil(2944439/200671)=15
    val rows = (1 to 30).map(i =>
      (2L, s"2024-01-01 00:00:${i + 10}", i.toLong, "purchase", 1.0))
    val df = rows.toDF("user_id", "tss", "event_id", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_id"), col("event_type"), col("value"))
    val r = EventOps.sprtMonitor(df, "user_id", "ts", "event_id",
      "event_type", "purchase").collect().head
    assert(r.getAs[String]("decision") == "accept_h1")
    assert(r.getAs[Int]("cross_idx") == 15)
    // all-failure walk: 2944439 / 50010 -> crosses down at 59
    val rows0 = (1 to 80).map(i =>
      (2L, s"2024-01-01 00:0${i / 60}:${i % 60}", i.toLong, "view", 1.0))
    val df0 = rows0.toDF("user_id", "tss", "event_id", "event_type",
      "value").select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_id"), col("event_type"), col("value"))
    val r0 = EventOps.sprtMonitor(df0, "user_id", "ts", "event_id",
      "event_type", "purchase").collect().head
    assert(r0.getAs[String]("decision") == "accept_h0")
    assert(r0.getAs[Int]("cross_idx") == 59)
  }

  test("mcc: perfect prediction is 1, inverted is -1") {
    val truth = (0L until 20L).map(i => (i, i % 3 == 0)).toDF("id", "flag")
    val perfect = ProfileOps.mccReport(truth, truth).collect().head
    assert(perfect.getAs[Double]("mcc") == 1.0)
    assert(perfect.getAs[Double]("macro_f1") == 1.0)
    val inv = (0L until 20L).map(i => (i, i % 3 != 0)).toDF("id", "flag")
    val worst = ProfileOps.mccReport(inv, truth).collect().head
    assert(worst.getAs[Double]("mcc") == -1.0)
    assert(worst.getAs[Double]("accuracy") == 0.0)
  }
}
