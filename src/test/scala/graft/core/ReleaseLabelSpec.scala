package graft.core

import graft.ops.{EventOps, ProfileOps}
import org.apache.spark.sql.functions._

/** Hand cases for the DP release, QTE order statistics, Simpson
  * detector, and the temporal label builder's leakage safety.
  */
class ReleaseLabelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toSeq.toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))

  test("dp release: deterministic, non-negative, epsilon scales noise") {
    val df = (0 until 300).map(i => s"g${i % 3}").toDF("g")
    val a = ProfileOps.dpLaplaceCounts(df, "g", 1.0, "s").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    val b = ProfileOps.dpLaplaceCounts(df.repartition(7), "g", 1.0, "s")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2), r.getLong(3))).toMap
    assert(a == b) // partition-independent
    a.values.foreach { case (n, noise, rel) =>
      assert(n == 100L && rel >= 0L)
      assert(math.abs(rel - (n + noise)) <= 0.5 + 1e-9)
    }
    // smaller epsilon -> strictly larger |noise| (same uniforms)
    val loose = ProfileOps.dpLaplaceCounts(df, "g", 0.1, "s").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    a.foreach { case (g, (_, noise, _)) =>
      assert(math.abs(loose(g)) > math.abs(noise)) }
  }

  test("qte: exact order statistics per arm") {
    // control users 0,2,4,6 revenues 1,2,3,4; treated 1,3,5,7 -> 11..14
    val df = ev((0L until 8L).map(u =>
      (u, "2024-01-02 00:00:00", "purchase",
        (u / 2 + 1 + (if (u % 2 == 1) 10 else 0)).toDouble)): _*)
    val r = EventOps.quantileTreatmentEffects(df, "user_id",
      "event_type", "value", "purchase").collect()
      .map(x => x.getInt(0) -> (x.getAs[Double]("v_c"),
        x.getAs[Double]("v_t"), x.getAs[Double]("qte"))).toMap
    // n=4: q25 -> rank 1, q50 -> rank 2, q75 -> rank 3
    assert(r(25) == ((1.0, 11.0, 10.0)))
    assert(r(50) == ((2.0, 12.0, 10.0)))
    assert(r(75) == ((3.0, 13.0, 10.0)))
  }

  test("simpson detector: engineered flip is flagged") {
    // two strata, conversion helps within each stratum but treated
    // users concentrate in the low-converting stratum
    def users(stratumBase: Long, treatedConv: Int, treatedAll: Int,
        controlConv: Int, controlAll: Int): Seq[(Long, String)] = {
      val t = (0 until treatedAll).map(i =>
        (stratumBase + 10 * i + 5, // odd offsets -> treated
          if (i < treatedConv) "purchase" else "view"))
      val c = (0 until controlAll).map(i =>
        (stratumBase + 10 * i + 10, // even -> control
          if (i < controlConv) "purchase" else "view"))
      t ++ c
    }
    // stratum 0 (users %5==0): treated 18/20 conv, control 7/10
    // stratum 2 (users %5==2): treated 2/10, control 3/20
    // (even stratum bases keep user parity = arm)
    val rows = users(0L, 18, 20, 7, 10) ++ users(2L, 2, 10, 3, 20)
    val df = ev(rows.map { case (u, t) =>
      (u, "2024-01-02 00:00:00", t, 1.0) }: _*)
    val r = EventOps.simpsonDetector(df, "user_id", "event_type",
      "purchase").collect().head
    // within both strata treatment helps (dir +1 each)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 0L)
  }

  test("temporal labels: features never see the label window") {
    val df = ev(
      // feature-window activity for u=1 (before cutoff)
      (1L, "2024-01-15 00:00:00", "view", 1.0),
      (1L, "2024-01-18 00:00:00", "purchase", 5.0),
      // label-window purchase for u=1
      (1L, "2024-01-22 00:00:00", "purchase", 100.0),
      // u=2: feature activity, no label purchase
      (2L, "2024-01-19 00:00:00", "view", 1.0),
      // u=3: ONLY label-window activity -> dropped (no features)
      (3L, "2024-01-23 00:00:00", "purchase", 9.0),
      // u=4: activity before the lookback -> dropped
      (4L, "2024-01-01 00:00:00", "view", 1.0))
    val r = EventOps.temporalLabels(df, "user_id", "ts", "event_type",
      "value", "purchase", "2024-01-20 00:00:00", 14, 7).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L))
    val u1 = r(1L)
    assert(u1.getAs[Long]("n_events") == 2L)
    assert(u1.getAs[Long]("n_purchases") == 1L)
    assert(u1.getAs[Double]("revenue") == 5.0) // label 100 NOT counted
    assert(u1.getAs[Int]("label") == 1)
    assert(r(2L).getAs[Int]("label") == 0)
  }
}
