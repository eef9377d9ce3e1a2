package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: is the q120 cost the decimal(38,18) sum's BigDecimal
  * path? Same 14-aggregate corrMatrix shape at scale 18 vs scale 4.
  */
object DecimalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, "/root/testdata/sf0.1", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    def run(d: String): Double = {
      val aggs = (cols.zipWithIndex.map { case (c, i) =>
          sum(col(c).cast(d)).as(s"s_$i")
        } ++ pairs.map { case (i, j) =>
          sum((col(cols(i)) * col(cols(j))).cast(d)).as(s"p_${i}_$j")
        }).toSeq
      val t0 = System.nanoTime()
      li.agg(count(lit(1)).as("n"), aggs: _*).collect()
      (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to 4)
      println(f"rep $rep: scale18=${run("decimal(38,18)")}%.3f  scale4=${run("decimal(38,4)")}%.3f  long_double=${run("double")}%.3f")
    // Limb-sum variant: each moment as an exactly-scaled long, summed
    // as two long limbs (hi = floor-div 1e6, lo = pmod 1e6) — plain
    // codegen'd sums, exact reassembly hi*1e6+lo on the driver.
    val M = 1000000L
    def limb(runName: String): (Double, Map[String, java.math.BigDecimal]) = {
      def scaled(c: org.apache.spark.sql.Column, s: Int) =
        floor(c * math.pow(10.0, s) + 0.5).cast("long")
      val aggs = (cols.zipWithIndex.map { case (c, i) =>
          scaled(col(c), 2).as(s"x_$i")
        } ++ pairs.map { case (i, j) =>
          scaled(col(cols(i)) * col(cols(j)), 4).as(s"x_${i}_$j")
        }).toSeq
      val names = cols.indices.map(i => s"x_$i") ++
        pairs.map { case (i, j) => s"x_${i}_$j" }
      val limbAggs = names.flatMap { n =>
        Seq(sum(expr(s"($n - pmod($n, ${M}L)) div ${M}L")).as(s"hi_$n"),
          sum(pmod(col(n), lit(M))).as(s"lo_$n"))
      }
      val t0 = System.nanoTime()
      val r = li.select(col("*") +: aggs.map(a => a): _*)
        .agg(count(lit(1)).as("n"), limbAggs: _*).collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      val out = names.map { n =>
        val hi = r.getLong(r.fieldIndex(s"hi_$n"))
        val lo = r.getLong(r.fieldIndex(s"lo_$n"))
        n -> java.math.BigDecimal.valueOf(hi).multiply(
          java.math.BigDecimal.valueOf(M)).add(java.math.BigDecimal.valueOf(lo))
      }.toMap
      (dt, out)
    }
    for (rep <- 1 to 4) println(f"limb rep $rep: ${limb("x")._1}%.3f")
    // value check: limb sums == decimal sums (descale by 1e2/1e4)
    val decAggs = (cols.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast("decimal(38,4)")).as(s"x_$i")
      } ++ pairs.map { case (i, j) =>
        sum((col(cols(i)) * col(cols(j))).cast("decimal(38,4)")).as(s"x_${i}_$j")
      }).toSeq
    val dec = li.agg(count(lit(1)).as("n"), decAggs: _*).collect()(0)
    val (_, limbs) = limb("check")
    cols.indices.foreach { i =>
      val want = dec.getDecimal(dec.fieldIndex(s"x_$i"))
      val got = limbs(s"x_$i").movePointLeft(2).setScale(4)
      println(s"x_$i: dec=$want limb=$got equal=${want.compareTo(got) == 0}")
    }
    pairs.take(3).foreach { case (i, j) =>
      val want = dec.getDecimal(dec.fieldIndex(s"x_${i}_$j"))
      val got = limbs(s"x_${i}_$j").movePointLeft(4).setScale(4)
      println(s"x_${i}_$j: equal=${want.compareTo(got) == 0}")
    }
    spark.stop()
  }
}
