package graft.core

import graft.ops.{GraphOps, PhoneticOps, ProfileOps}
import org.apache.spark.sql.functions._

/** Hand cases: classic Soundex vectors, HITS on a known bipartite
  * graph, textbook Gini values.
  */
class PhoneticGiniSpec extends SparkSpec {
  import spark.implicits._

  test("soundex: classic reference codes incl. h/w transparency") {
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // H transparent
      "Tymczak" -> "T522", "Pfister" -> "P236",   // PF same class
      "Honeyman" -> "H555", "Jackson" -> "J250",
      "small ring" -> "S546", "123" -> "")
    val df = cases.map(_._1).toDF("name")
      .select(col("name"), PhoneticOps.soundex(col("name")).as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (n, exp) => assert(df(n) == exp, n) }
  }

  test("hits: star graph — the hub touching everything dominates") {
    // hub u0 buys all of b0..b3; u1 buys only b0
    val edges = (Seq(("u0", "b0"), ("u0", "b1"), ("u0", "b2"),
      ("u0", "b3"), ("u1", "b0"))).toDF("h", "a")
    val r = GraphOps.hits(edges, "h", "a").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    assert(r(("hub", "u0")) == 1000000L)      // max-normalized top hub
    assert(r(("hub", "u1")) < 500000L)
    assert(r(("auth", "b0")) == 1000000L)     // backed by both hubs
    assert(r(("auth", "b1")) == r(("auth", "b2")))
  }

  test("gini: uniform is 0; full concentration approaches 1") {
    val df = (Seq.fill(10)(("u", 5L)) ++
      (Seq.fill(9)(("c", 0L)) :+ ("c", 100L))).toDF("g", "x")
    val r = ProfileOps.giniIndex(df, "g", "x").collect()
      .map(x => x.getString(0) ->
        Option(x.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(r("u").contains(0.0))
    assert(r("c").contains(0.9)) // (2*10*100 - 11*100)/(10*100)
  }

  test("gini: zero-total group is null; ties are order-invariant") {
    val df = (Seq(("z", 0L), ("z", 0L)) ++
      Seq(("t", 3L), ("t", 3L), ("t", 6L))).toDF("g", "x")
    val m = ProfileOps.giniIndex(df.repartition(5), "g", "x").collect()
      .map(x => x.getString(0) ->
        Option(x.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(m("z").isEmpty)
    // ranks (1,2,3) over (3,3,6): (2*(3+6+18) - 4*12)/(3*12) = 1/6
    assert(m("t").contains(0.166667))
  }
}
