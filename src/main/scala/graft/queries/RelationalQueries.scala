package graft.queries

import graft.Tables
import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational operator surface over the TPC-H-ish tables, each
  * with a DuckDB oracle. Naming/rounding contract (driver hash-compare):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are rounded (sums 2dp, avgs/ratios 4-5dp) so
  *    engine-specific summation order can't flip a hash;
  *  - DuckDB integer sums are CAST to BIGINT (its SUM(int) is HUGEINT);
  *  - no raw timestamp outputs (ns vs us precision) — epoch secs/dates.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Discounted line revenue on the exact 1e-4-dollar grid (the q342
    * spelling): price cents × discounted percent as a long — sums are
    * order-free-exact, and both engines divide once at the end.
    */
  private def rev4: org.apache.spark.sql.Column =
    (round(col("l_extendedprice") * 100, 0).cast("long")
      * (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
      .as("rev4")
  private val Rev4Sql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) " +
      "* (100 - CAST(round(l_discount * 100) AS BIGINT))"

  // q364: lineitem converted to ORC once per (application, dir) —
  // the q56/WinnowStage memoization discipline, so bench warm runs
  // re-read the same files instead of re-writing them.
  private val orcCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def orcLineitem(s: SparkSession, d: String): String =
    orcCache.computeIfAbsent(
      s.sparkContext.applicationId + "|" + d,
      new java.util.function.Function[String, String] {
        override def apply(k: String): String = {
          val p = java.nio.file.Files
            .createTempDirectory("graft_orc").toString + "/lineitem"
          Tables(s, d, "lineitem").write.mode("overwrite").orc(p)
          p
        }
      })

  val queries: Map[String, Q] = Map(
    // Full-scan aggregation (TPC-H Q1 shape): map-side partial agg, one
    // narrow shuffle on the 2 group keys.
    "q01_pricing_summary" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Filter + projection — predicate and column pruning reach the scan.
    "q02_filter_project" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .filter(col("l_quantity") >= 45 && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          // 4dp: price(2dp) × discount-complement(2dp) has exactly 4
          // decimal digits, so rounding AT the grid has no half-way
          // cases — 2dp would diverge between engines on exact .xx5s.
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"),
          col("l_shipdate").cast("date").as("ship_date"))
    }),

    // Broadcast equi-join (dim customer) + aggregation.
    "q03_join_agg" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
    }),

    // 4-way broadcast join chain: fact lineitem never re-shuffles — all
    // dims broadcast, the agg is the only exchange.
    "q04_nation_revenue" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val sup = Tables(s, d, "supplier")
      val nat = Tables(s, d, "nation")
      val reg = Tables(s, d, "region")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Left-semi join (EXISTS).
    "q05_semijoin" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val li = Tables(s, d, "lineitem").filter(col("l_quantity") >= 48)
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),

    // Left-anti join (NOT EXISTS).
    "q06_antijoin" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // Ranking window: top-3 orders per market segment.
    "q07_topk_per_group" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    }),

    // Running (prefix) aggregate window.
    "q08_running_sum" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"))
    }),

    // lag/lead window on the event stream.
    "q09_lag_delta" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      e.select(col("event_id"), col("user_id"), col("value"),
        round(col("value") - lag("value", 1).over(w), 4).as("delta"))
    }),

    // DISTINCT projection.
    "q10_distinct" -> ((s, d) =>
      Tables(s, d, "customer").select("c_mktsegment", "c_nationkey").distinct()),

    // Global top-k with deterministic tie-break (TakeOrderedAndProject).
    "q11_topk_global" -> ((s, d) =>
      Tables(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)),

    // UNION ALL.
    "q12_union" -> ((s, d) => {
      val c = Tables(s, d, "customer").select(col("c_custkey").as("id"), lit("customer").as("src"))
      val sup = Tables(s, d, "supplier").select(col("s_suppkey").as("id"), lit("supplier").as("src"))
      c.unionByName(sup)
    }),

    // INTERSECT (distinct semantics).
    "q13_intersect" -> ((s, d) =>
      Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables(s, d, "supplier").select(col("s_nationkey").as("nationkey")))),

    // EXCEPT (distinct semantics).
    "q14_except" -> ((s, d) =>
      Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(Tables(s, d, "supplier").select(col("s_nationkey").as("nationkey")))),

    // ROLLUP hierarchy totals.
    "q15_rollup" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))),

    // CUBE over two dimensions.
    "q16_cube" -> ((s, d) =>
      Tables(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))),

    // GROUPING SETS (via SQL — the one grouping shape without a typed
    // API). Direct parquet-path SQL: no temp-view session mutation, so
    // queries stay safe to run concurrently.
    "q17_grouping_sets" -> ((s, d) =>
      s.sql(
        s"""SELECT l_returnflag, l_linestatus,
           |       round(sum(l_quantity), 2) AS sum_qty, count(1) AS n
           |FROM parquet.`$d/lineitem.parquet`
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)),

    // Conditional aggregation (pivot-style).
    "q18_conditional_agg" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          round(sum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0)), 2).as("returned_rev"),
          round(sum(when(col("l_returnflag") =!= "R", col("l_extendedprice")).otherwise(0.0)), 2).as("kept_rev"),
          count(lit(1)).as("n"))),

    // String scalar functions.
    "q19_string_funcs" -> ((s, d) =>
      Tables(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_u"))),

    // Date part extraction + aggregation.
    "q20_date_funcs" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))),

    // HAVING (post-aggregation filter).
    "q21_having" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
        .filter(col("n_orders") >= 3)),

    // Correlated-subquery shape via a window (per-group average).
    "q22_above_avg" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val w = Window.partitionBy("o_custkey")
      // Compare against the ROUNDED average (both engines) so summation
      // order can't flip membership by an ulp.
      o.withColumn("ap", round(avg("o_totalprice").over(w), 4))
        .filter(col("o_totalprice") > col("ap"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // Range (band) join against a tiny in-line dimension -> broadcast
    // nested-loop; at scale the bands become an equi-key via width_bucket.
    "q23_range_join" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val bands = s.createDataFrame(Seq(
        ("band1_lo", 0.0, 50000.0),
        ("band2_mid", 50000.0, 150000.0),
        ("band3_hi", 150000.0, 300000.0),
        ("band4_top", 300000.0, 1e12))).toDF("band", "lo", "hi")
      o.join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
    }),

    // TPC-H Q21 shape: the SOLE late supplier on multi-supplier
    // orders — exists + not-exists decorrelated into ONE per-order
    // aggregation over distinct (order, supplier) pairs (no double
    // self-join of the fact table); supplier dim broadcasts.
    "q291_sole_late_supplier" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val o = Tables(s, d, "orders")
      val g = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max((col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("int"))
          .as("late"))
      val ord = g.groupBy("ok")
        .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      val sole = g.where(col("late") === 1).join(ord, "ok")
        .where(col("n_supp") >= 2 && col("n_late") === 1)
      sole.groupBy("sk").agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables(s, d, "supplier")),
          col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    }),

    // Entity-resolution best-match: for each part, the closest OTHER
    // part name by Levenshtein distance within its first-token block,
    // deterministic tie-break on (distance, partkey). The quadratic
    // runs on the DISTINCT-NAME level (names repeat heavily — the
    // dedup-first discipline): levenshtein over name×name block pairs
    // (|names|² bounded), then each part picks its best candidate
    // name's minimum available partkey — for the part's OWN name
    // that's the name's min key (second-min when the part IS the
    // min), for other names the min key. Equivalent to the row-level
    // quadratic by construction (the best representative of a
    // candidate name is always its smallest available key); the
    // oracle stays the FULL row-level brute force, so the hash match
    // proves the rewrite lossless on every run.
    "q296_name_match" -> ((s, d) => {
      val p = Tables(s, d, "part")
        .select(col("p_partkey").as("pk"), col("p_name").as("nm"),
          substring_index(col("p_name"), " ", 1).as("blk"))
      val m1 = p.groupBy("blk", "nm")
        .agg(count(lit(1)).as("cnt"), min("pk").as("m1"))
      val m2 = p.join(m1.select(col("nm").as("nm_"), col("m1")),
          col("nm") === col("nm_") && col("pk") > col("m1"))
        .groupBy("nm").agg(min("pk").as("m2"))
      val names = m1.join(m2, Seq("nm"), "left")
      val nmPairs = names.select(col("blk"), col("nm"))
        .join(names.select(col("blk"), col("nm").as("nm2"),
          col("cnt").as("cnt2"), col("m1").as("m1_2"),
          col("m2").as("m2_2")), Seq("blk"))
        .select(col("nm"), col("nm2"), col("cnt2"), col("m1_2"),
          col("m2_2"), levenshtein(col("nm"), col("nm2")).as("dist"))
      val cand = p.join(broadcast(nmPairs), Seq("nm"))
        .select(col("pk"), col("dist"),
          when(col("nm2") === col("nm"),
            when(col("m1_2") === col("pk"), col("m2_2"))
              .otherwise(col("m1_2")))
            .otherwise(col("m1_2")).as("pk2"))
        .where(col("pk2").isNotNull)
      val w = Window.partitionBy("pk")
        .orderBy(col("dist").asc, col("pk2").asc)
      cand.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("pk").as("p_partkey"), col("pk2").as("best_key"),
          col("dist").cast("int").as("dist"))
    }),

    // As-of join: most recent prior click before each purchase.
    "q24_asof_join" -> ((s, d) =>
      EventOps.asOfPriorEventId(Tables(s, d, "events"), "click", "purchase")
        .withColumnRenamed("prev_left_id", "prev_click_id")),

    // Sessionization (30-minute inactivity gap).
    "q25_sessionize" -> ((s, d) =>
      EventOps.sessionCounts(Tables(s, d, "events"), 1800.0)),

    // Fixed 5-minute tumbling window aggregate (batch twin of the
    // streaming windowed count).
    "q26_time_bucket" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(EventOps.timeBucketS(col("ts"), 300), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))),

    // Day-over-day categorical drift: Jensen-Shannon divergence of
    // the event-type mix between consecutive daily buckets — the
    // source-shape health monitor.
    "q139_type_drift" -> ((s, d) =>
      EventOps.typeDrift(Tables(s, d, "events"), "ts", "event_type",
        widthSeconds = 86400)),

    // Exact interpolated percentiles per group. At 100 TB the scale
    // path is approx_percentile (bounded-memory sketch, same call
    // shape); the exact form here is the oracle-checkable twin —
    // Spark's percentile agg gathers per-group value counts, it does
    // NOT globally sort the table.
    // TPC-H Q3 shape (shipping priority): top-10 unshipped revenue —
    // segment-filtered customers broadcast onto orders, open
    // lineitems aggregate on orderkey, exact 4dp-cents revenue grid,
    // deterministic (revenue desc, orderkey) top-k.
    "q342_ship_priority" -> ((s, d) => {
      val cut = lit("1998-06-01").cast("timestamp")
      val c = Tables(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100, 0).cast("long")
            * (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("rev4"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum("rev4").as("rev4"))
        .select(col("l_orderkey"), col("o_orderdate").cast("date")
          .as("o_orderdate"),
          (col("rev4").cast("double") / 1e4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q13 shape (customer distribution): orders-per-customer
    // histogram INCLUDING zero-order customers — the left join +
    // double aggregation idiom.
    "q343_cust_distribution" -> ((s, d) => {
      val c = Tables(s, d, "customer").select(col("c_custkey"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q10 shape (returned-item reporting): top-20 customers by
    // returned revenue — exact 4dp grid, deterministic tie-break.
    "q344_returned_revenue" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100, 0).cast("long")
            * (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("rev4"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("rev4").as("rev4"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          (col("rev4").cast("double") / 1e4).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // TPC-H Q12 shape (shipmode / order-priority matrix). The base
    // lineitem lacks l_shipmode/l_commitdate/l_receiptdate, so they
    // are DERIVED deterministically from the row identity via the
    // native md5 digest split (words 1-3 of graft_md5_longs ==
    // conv(substring(md5_hex, 1|9|17, 8), 16, 10) — the portable
    // '0x'-cast idiom every md5-twin oracle already replays):
    // shipmode = mode[word1 % 7], commitdate = shipdate + word2%61-30
    // days, receiptdate = shipdate + word3%30+1 days. One fact scan,
    // filters cut ~2/7 of modes and a 1-year receipt window BEFORE
    // the orders join; the CASE sums are one partial-agg'd exchange
    // on the 2-row group key.
    "q379_shipmode_priority" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val h = call_function("graft_md5_longs",
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")).cast("binary"))
      val modes = typedlit(Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK",
        "MAIL", "FOB"))
      // Generate barrier (the nearDupFilterStream discipline): the
      // filter below references every derived column, and predicate
      // pushdown through a plain Project would SUBSTITUTE the md5
      // tree into each of the 6 conjuncts — one digest per row
      // becomes six. explode(array(struct)) is a Generate that
      // predicates cannot cross, so the digest runs once per row.
      val l = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").cast("date").as("_sd"))
        .withColumn("_hw", explode(array(h)))
        .select(col("l_orderkey"), col("_sd"),
          element_at(modes,
            (pmod(element_at(col("_hw"), 1), lit(7L)) + 1L).cast("int"))
            .as("l_shipmode"),
          date_add(col("_sd"),
            (pmod(element_at(col("_hw"), 2), lit(61L)) - 30L).cast("int"))
            .as("_commit"),
          date_add(col("_sd"),
            (pmod(element_at(col("_hw"), 3), lit(30L)) + 1L).cast("int"))
            .as("_receipt"))
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("_commit") < col("_receipt") && col("_sd") < col("_commit") &&
          col("_receipt") >= lit("1997-01-01").cast("date") &&
          col("_receipt") < lit("1998-01-01").cast("date"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_shipmode")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_shipmode")
    }),

    // TPC-H Q16 shape (supplier count by part attributes): the
    // partsupp relation is stood in by the DISTINCT (l_partkey,
    // l_suppkey) pairs countDistinct already dedups, and the
    // "complaints" NOT-IN exclusion by suppliers with negative
    // balance. Part is a dim (broadcast), the exclusion set is tiny
    // (broadcast anti join == NOT IN here: s_suppkey is never null),
    // so the only exchange is the partial-agg'd distinct-count on the
    // (brand, type, size) grain.
    "q380_parts_supplier_cnt" -> ((s, d) => {
      val p = Tables(s, d, "part")
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").startsWith("MEDIUM") &&
          col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      val bad = Tables(s, d, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q2 shape (min-per-group lookup join): for each part, the
    // EUROPE supplier(s) whose best offer equals the part's regional
    // minimum — the classic correlated scalar subquery
    // `WHERE cost = (SELECT min(cost) ... WHERE pk = outer.pk)`
    // decorrelated. Spelled as a window-min over the (part, supplier)
    // offer frame rather than a min-frame self-join: the offer frame
    // is built ONCE (one scan of lineitem, dims broadcast), and the
    // window reuses the aggregation's own shuffle — a broadcast
    // min-frame join would evaluate the offer pipeline twice. Offers
    // are exact cents longs so the min-equality is grid-exact.
    "q348_min_cost_supplier" -> ((s, d) => {
      val eu = Tables(s, d, "supplier")
        .join(Tables(s, d, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables(s, d, "region"),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val offers = Tables(s, d, "lineitem")
        .join(broadcast(eu.select(col("s_suppkey").as("sk"))),
          col("l_suppkey") === col("sk"))
        .groupBy(col("l_partkey").as("pk"), col("sk"))
        .agg(min(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("cost_c"))
      val w = Window.partitionBy("pk")
      offers.withColumn("min_c", min("cost_c").over(w))
        .where(col("cost_c") === col("min_c"))
        .join(broadcast(eu), col("sk") === col("s_suppkey"))
        .join(broadcast(Tables(s, d, "part")
            .select(col("p_partkey"), col("p_type"))),
          col("pk") === col("p_partkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("n_name"), col("p_type"),
          round(col("s_acctbal"), 2).as("acctbal"),
          (col("cost_c").cast("double") / 100).as("best_cost"))
        .orderBy(col("acctbal").desc, col("s_suppkey").asc,
          col("p_partkey").asc)
        .limit(100)
    }),

    // TPC-H Q4 shape (EXISTS): orders in a quarter with at least one
    // line shipped > 60 days after the order date, counted per
    // priority — the correlated EXISTS (predicate references BOTH
    // sides) decorrelated into one LEFT SEMI join on orderkey with
    // the correlation as a join residual: one pass over each input,
    // no per-order rescan, semi-join short-circuits on first match.
    "q349_waiting_orders" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      val l = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // TPC-H Q20 shape (nested IN with correlated aggregate):
    // suppliers who shipped a STRICT MAJORITY of some large part's
    // 1997 volume — `s_suppkey IN (SELECT ... GROUP BY part, supp
    // HAVING 2·sum(qty) > (SELECT sum(qty) ... WHERE partkey =
    // outer.partkey))` decorrelated: ONE aggregation to the
    // (part, supplier) grain, the correlated per-part total as a
    // window sum over that already-aggregated (small) frame, then a
    // LEFT SEMI join into supplier. Quantities are integral —
    // compared on the long grid (2·sq > tq), no 0.5·double.
    "q350_majority_suppliers" -> ((s, d) => {
      val pt = Tables(s, d, "part").filter(col("p_size") >= 45)
        .select(col("p_partkey"))
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      val ps = li.groupBy(col("l_partkey").as("pk"),
          col("l_suppkey").as("sk"))
        .agg(sum(round(col("l_quantity"), 0).cast("long")).as("sq"))
      val dom = ps
        .withColumn("tq", sum("sq").over(Window.partitionBy("pk")))
        .where(col("sq") * 2 > col("tq"))
        .select(col("sk")).distinct()
      Tables(s, d, "supplier")
        .join(dom, col("s_suppkey") === col("sk"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // ORC source round-trip: lineitem written to ORC once (memoized
    // per application), read back through Spark's ORC datasource and
    // aggregated — the oracle computes the identical aggregate from
    // the parquet original, so a hash match proves the columnar
    // round-trip is value-exact (incl. timestamps under the UTC
    // session). Completes the built-in source matrix beside
    // CSV/parquet/JSONL (no spark-avro datasource ships in this
    // environment).
    "q364_orc_roundtrip" -> ((s, d) => {
      s.read.orc(orcLineitem(s, d))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          max(col("l_shipdate").cast("date")).as("max_ship"))
    }),

    // TPC-H Q15 shape (agg view + scalar max): supplier(s) whose
    // quarterly revenue equals the maximum over the revenue view —
    // `WHERE total_rev = (SELECT max(total_rev) FROM revenue)`
    // decorrelated as ONE aggregation + a broadcast 1-row max frame;
    // revenue is on the exact 4dp-cents grid so the max-equality is
    // integer-exact (a double grid could tie-break differently across
    // engines). The supplier-scale revenue view is localCheckpointed:
    // it feeds BOTH the max frame and the equality filter, and
    // without the plan cut each branch re-scans the fact table
    // (PlanSpec pins lineitem scans == 1).
    "q353_top_supplier" -> ((s, d) => {
      val rev = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("sk"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")
          * (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .as("rev4"))
        .localCheckpoint()
      val mx = rev.agg(max("rev4").as("mx4"))
      rev.crossJoin(broadcast(mx))
        .where(col("rev4") === col("mx4"))
        .join(broadcast(Tables(s, d, "supplier")),
          col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("rev4").cast("double") / 1e4).as("total_revenue"))
    }),

    // TPC-H Q11 shape (group HAVING vs global scalar): part values
    // held by suppliers of one nation, keeping parts whose value
    // exceeds 0.01% of the nation's total —
    // `HAVING sum(v) > 0.0001 * (SELECT sum(v) ...)` decorrelated as
    // one aggregation reused for both sides — the part-scale value
    // frame is localCheckpointed so the global-total branch re-reads
    // the materialized frame, NOT the fact table (PlanSpec pins
    // lineitem scans == 1); the fraction test is exact integer cents
    // (v·10000 > total).
    "q354_important_parts" -> ((s, d) => {
      val sup = Tables(s, d, "supplier")
        .join(Tables(s, d, "nation"),
          col("s_nationkey") === col("n_nationkey") &&
            col("n_name") === "NATION_7")
        .select(col("s_suppkey").as("sk"))
      val pv = Tables(s, d, "lineitem")
        .join(broadcast(sup), col("l_suppkey") === col("sk"))
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")
          * round(col("l_quantity"), 0).cast("long")).as("v2"))
        .localCheckpoint()
      val tot = pv.agg(sum("v2").as("t2"))
      pv.crossJoin(broadcast(tot))
        .where(col("v2") * 10000L > col("t2"))
        .select(col("l_partkey"),
          (col("v2").cast("double") / 100).as("part_value"))
    }),

    // TPC-H Q22 shape (scalar avg subquery + NOT EXISTS): per nation,
    // the count/balance of above-average-balance customers with no
    // URGENT order — avg compare decorrelated to a broadcast
    // (sum, count) frame with the strict test as exact integer cents
    // (cents·n > sum_cents — no engine-ordered double avg), NOT
    // EXISTS (with its own predicate) as a LEFT ANTI join on custkey
    // over the pre-filtered order side.
    "q355_lost_customers" -> ((s, d) => {
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100, 0).cast("long").as("bal_c"))
      val tot = c.where(col("bal_c") > 0)
        .agg(sum("bal_c").as("s_c"), count(lit(1)).as("n_c"))
      c.crossJoin(broadcast(tot))
        .where(col("bal_c") * col("n_c") > col("s_c"))
        .join(Tables(s, d, "orders")
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          (sum("bal_c").cast("double") / 100).as("total_bal"))
    }),

    // TPC-H Q5 shape (local supplier volume): 1996 revenue in region
    // ASIA where the supplying nation IS the customer's nation — the
    // same-nation equi-condition is Q5's signature. Dims broadcast
    // (nation/region/supplier are model-scale), the date filter pushes
    // to the orders scan, and the fact table shuffles once on its own
    // key.
    "q367_local_supplier_volume" -> ((s, d) => {
      val asia = Tables(s, d, "nation")
        .join(broadcast(Tables(s, d, "region")
          .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val o = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables(s, d, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), rev4)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg((sum("rev4").cast("double") / 1e4).as("revenue"))
    }),

    // TPC-H Q6 shape (forecast revenue change): pure scan-filter-agg,
    // every predicate pushed to the parquet scan; the discount band is
    // compared on the integer-percent grid the data lives on.
    "q368_forecast_revenue" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          round(col("l_discount") * 100, 0).cast("long").between(5, 7) &&
          col("l_quantity") < 24)
        .agg((sum(round(col("l_extendedprice") * 100, 0).cast("long")
            * round(col("l_discount") * 100, 0).cast("long"))
          .cast("double") / 1e4).as("revenue"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q7 shape (volume shipping): bilateral 1996-1997 trade
    // between two nations by supplier-nation × customer-nation × ship
    // year — nation names resolve through broadcast dims, the pair
    // filter keeps both directions.
    "q369_volume_shipping" -> ((s, d) => {
      val nat = Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables(s, d, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables(s, d, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"), rev4)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .where((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg((sum("rev4").cast("double") / 1e4).as("revenue"))
    }),

    // TPC-H Q8 shape (market share): NATION_1 suppliers' share of
    // ECONOMY-part revenue sold to region-AMERICA customers per order
    // year — numerator and denominator accumulate on the same exact
    // cents grid in ONE aggregation, the ratio divides once (guarded,
    // the ANSI rule).
    "q370_market_share" -> ((s, d) => {
      val nat = Tables(s, d, "nation")
      val amer = nat.join(broadcast(Tables(s, d, "region")
          .where(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = Tables(s, d, "customer")
        .join(broadcast(amer), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val eco = Tables(s, d, "part").where(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val sup = Tables(s, d, "supplier")
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), rev4)
        .join(broadcast(eco), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_1", col("rev4"))
          .otherwise(0L)).as("n4"), sum(col("rev4")).as("d4"))
        .select(col("o_year"),
          when(col("d4") === 0, lit(null).cast("double"))
            .otherwise(round(col("n4").cast("double")
              / col("d4").cast("double"), 6)).as("mkt_share"))
    }),

    // TPC-H Q14 shape (promo revenue share): conditional-sum ratio
    // over one month of shipments, part flags broadcast.
    "q371_promo_revenue" -> ((s, d) => {
      val p = Tables(s, d, "part")
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
      Tables(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .select(col("l_partkey"), rev4)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("is_promo"), col("rev4")).otherwise(0L)).as("p4"),
          sum(col("rev4")).as("t4"))
        .select(when(col("t4") === 0, lit(null).cast("double"))
          .otherwise(round(col("p4").cast("double") * 100
            / col("t4").cast("double"), 6)).as("promo_share"))
    }),

    // TPC-H Q18 shape (large-volume customers): group-HAVING on the
    // fact table FIRST (the aggregate filter is the selective step),
    // then two key joins — quantities are integral doubles, so the
    // sum and the > 300 cut are exact.
    "q372_large_volume_customers" -> ((s, d) => {
      val big = Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 300)
      Tables(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
    }),

    // TPC-H Q9 shape ADAPTED (product-line profit): the schema carries
    // no partsupp table, so supply cost is proxied by p_retailprice ×
    // quantity — the SHAPE (part-name filter, one fact scan, profit by
    // supplier nation × order year) is Q9's; the cost column is not.
    // All arithmetic on the 1e-4-dollar long grid.
    "q373_product_profit" -> ((s, d) => {
      val parts = Tables(s, d, "part").where(col("p_name").like("%red%"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100, 0).cast("long").as("cost2"))
      val sup = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          rev4, round(col("l_quantity"), 0).cast("long").as("qty_l"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("supp_nation"), col("o_year"))
        .agg((sum(col("rev4") - col("qty_l") * col("cost2") * 100)
          .cast("double") / 1e4).as("profit"))
    }),

    // TPC-H Q19 shape ADAPTED (disjunctive brand/quantity predicate;
    // the schema has no p_container): the point is the
    // OR-of-conjunctions predicate evaluated in ONE broadcast-join
    // scan instead of three unioned passes.
    "q374_brand_quantity_revenue" -> ((s, d) => {
      val p = Tables(s, d, "part").select(col("p_partkey"), col("p_brand"))
      Tables(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), rev4)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .where((col("p_brand") === "Brand#1" &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#20" &&
            col("l_quantity").between(20, 30)))
        .agg((sum("rev4").cast("double") / 1e4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Fulfillment-latency SLA percentiles: exact p50/p90/p99 of
    // ship-minus-order days per order priority — type-1 order
    // statistics via per-priority rank windows, integer day grid.
    "q347_fill_latency" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val lat = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("prio"),
          datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))).cast("long").as("days"))
      val w = Window.partitionBy("prio").orderBy(col("days").asc)
      val ranked = lat.select(col("prio"), col("days"),
        row_number().over(w).as("rk"),
        count(lit(1)).over(Window.partitionBy("prio")).as("n"))
      def pick(p: Int) =
        max(when(col("rk") ===
          ceil(col("n") * p / 100.0).cast("long"), col("days")))
      ranked.groupBy("prio")
        .agg(max("n").as("n"), pick(50).as("p50_days"),
          pick(90).as("p90_days"), pick(99).as("p99_days"))
    }),

    // Column profiling: null + exact distinct counts for four columns
    // in ONE scan (multi-count-distinct Expand, map-side combine).
    "q70_profile" -> ((s, d) =>
      graft.ops.ProfileOps.profile(Tables(s, d, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
        .withColumnRenamed("column", "col_name")),

    // Functional-dependency discovery (g3 measure) for four A->B
    // candidates over lineitem — all candidates share ONE scan via
    // an Expand; the data-contract inference signal.
    "q292_fd_discovery" -> ((s, d) =>
      graft.ops.ProfileOps.fdAudit(Tables(s, d, "lineitem"), Seq(
        "l_orderkey" -> "l_suppkey",
        "l_orderkey" -> "l_returnflag",
        "l_partkey" -> "l_suppkey",
        "l_suppkey" -> "l_linestatus"))),

    // Runtime bloom pre-filter: lineitem probes a bloom of the urgent
    // orders' keys BEFORE the semi-join shuffle (native codegen
    // graft_bloom_contains); the exact semi join then removes the
    // bloom's false positives, so the result is exact.
    "q76_bloom_semijoin" -> ((s, d) =>
      graft.ops.BloomOps.bloomPrunedSemiJoin(
        Tables(s, d, "lineitem"),
        Tables(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))),

    "q62_percentiles" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          // one counts-buffer per COLUMN (array form), not one per
          // requested percentile — halves the aggregate state
          expr("percentile(l_quantity, array(0.5D, 0.9D))").as("_q"),
          expr("percentile(l_extendedprice, array(0.99D, 0.5D))").as("_p"))
        .select(col("l_returnflag"),
          round(element_at(col("_q"), 1), 4).as("p50_qty"),
          round(element_at(col("_q"), 2), 4).as("p90_qty"),
          round(element_at(col("_p"), 1), 4).as("p99_price"),
          round(element_at(col("_p"), 2), 4).as("med_price"))),

    // Exact count-distinct per group.
    "q27_count_distinct" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("n_parts"),
          count_distinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))),

    // Regex field extraction from a JSON-ish payload column.
    "q28_regex_extract" -> ((s, d) =>
      Tables(s, d, "events").select(
        col("event_id"),
        // try_cast: regexp_extract yields '' on non-match and ANSI
        // cast('') would throw; the oracle uses TRY_CAST.
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS int)").as("k"))),

    // Approximate count-distinct: the scale-path twin of q27 —
    // constant memory per group vs exact expand. The estimator is the
    // engine's own KMV sketch (q375 family): md5-coordinate k-min set
    // per group, so the estimate is bit-deterministic under any
    // partitioning AND fully SQL-oracled — unlike HLL, whose sketch
    // internals are engine-specific (the HLL path stays covered by
    // OpsSpec's exactness-bound assert).
    "q51_approx_distinct" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val est = graft.ops.ProfileOps.kmvEstimate(
        graft.ops.ProfileOps.kmvSketch(li, "l_returnflag", "l_partkey",
          k = 256, salt = "q51"), k = 256)
      val n = li.groupBy(col("l_returnflag").as("grp"))
        .agg(count(lit(1)).as("n"))
      est.join(broadcast(n), "grp")
        .select(col("grp").as("l_returnflag"),
          col("est_distinct").as("n_parts_approx"), col("n"))
    }),

    // Uniform 10% sample: the content-hash sampler (SampleOps) rather
    // than seeded .sample() — the same rows survive on ANY engine,
    // rerun, or partition layout (seeded Bernoulli is layout-dependent,
    // which is exactly what a 1000-executor reshuffle breaks), and the
    // membership rule is plain SQL, so the sample is oracle-checkable.
    "q52_sample" -> ((s, d) =>
      graft.ops.SampleOps.deterministicSample(
          Tables(s, d, "orders"), "o_orderkey", 0.1, "q52:")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),

    // Join + dim filter + group, classic star-schema probe.
    "q29_star_probe" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      val o = Tables(s, d, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderstatus") === "F")
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), round(avg("o_totalprice"), 4).as("avg_price"))
    }),

    // Ranking-window trio: ntile quartiles, percent_rank, cume_dist
    // over per-customer revenue (the window functions q07/q08/q09
    // don't touch). Ties broken by key so the ranks are deterministic.
    "q186_window_ranks" -> ((s, d) => {
      val rev = Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("revenue"))
      val w = Window.orderBy(col("revenue").desc, col("o_custkey"))
      rev.select(col("o_custkey"), col("revenue"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
    }),

    // PIVOT: yearly revenue per nation fanned into year columns —
    // the reshape operator (Spark .pivot with pinned values so the
    // output schema is static).
    "q187_pivot" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val n = Tables(s, d, "nation")
      val o = Tables(s, d, "orders")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), year(col("o_orderdate")).as("yr"),
          col("o_totalprice"))
        .groupBy("n_name")
        .pivot("yr", Seq(1995, 1996, 1997, 1998))
        .agg(coalesce(round(sum("o_totalprice"), 2), lit(0.0)))
        .select(col("n_name"), col("1995").as("rev_1995"),
          col("1996").as("rev_1996"), col("1997").as("rev_1997"),
          col("1998").as("rev_1998"))
    }),

    // UNPIVOT (melt): part size metrics long-formed — the inverse
    // reshape, via Spark's native unpivot operator.
    "q188_unpivot" -> ((s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast("long").as("size"),
          // round-then-cast: a plain double->long cast TRUNCATES in
          // Spark but ROUNDS in DuckDB — the grid must be integral
          // before the cast on both sides
          round(col("p_retailprice") * 100).cast("long").as("retail_cents"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retail_cents")), "metric", "value")),

    // JSON extraction over the events props column: parse, extract,
    // aggregate — the semi-structured path (§2.8 JSON ops).
    "q189_json_extract" -> ((s, d) =>
      Tables(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          count_distinct(col("k")).as("n_distinct_k"))))

  val oracles: Map[String, String] = Map(
    // Q12 twin: the derived columns replay word-for-word — word w of
    // graft_md5_longs == CAST('0x' || substr(md5_hex, 8(w-1)+1, 8) AS
    // BIGINT) (LayoutOps shard idiom); dates are DATE + int days.
    "q379_shipmode_priority" ->
      """WITH l AS (SELECT l_orderkey,
        |  md5(CAST(l_orderkey AS VARCHAR) || '-' ||
        |      CAST(l_linenumber AS VARCHAR)) AS hx,
        |  CAST(l_shipdate AS DATE) AS sd FROM lineitem),
        |d AS (SELECT l_orderkey,
        |  (['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'])[
        |    CAST(CAST('0x' || substr(hx, 1, 8) AS BIGINT) % 7 AS INTEGER) + 1]
        |    AS l_shipmode,
        |  sd,
        |  sd + CAST(CAST('0x' || substr(hx, 9, 8) AS BIGINT) % 61 - 30
        |    AS INTEGER) AS cdt,
        |  sd + CAST(CAST('0x' || substr(hx, 17, 8) AS BIGINT) % 30 + 1
        |    AS INTEGER) AS rdt
        | FROM l)
        |SELECT l_shipmode,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM d JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipmode IN ('MAIL','SHIP') AND cdt < rdt AND sd < cdt
        | AND rdt >= DATE '1997-01-01' AND rdt < DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q16 twin: spelled with the classic NOT IN subquery (equivalent
    // to the broadcast anti join — s_suppkey is never null)
    "q380_parts_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
        | AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        | AND l_suppkey NOT IN
        |   (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // KMV estimator replay (the q375 discipline) + exact group counts
    "q51_approx_distinct" -> {
      val est = graft.ops.ProfileOps.kmvColumnOracleSql(
        "lineitem", "l_returnflag", "l_partkey", k = 256, salt = "q51")
      s"""WITH est AS ($est),
         |n AS (SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n
         |      FROM lineitem GROUP BY 1)
         |SELECT grp AS l_returnflag, est_distinct AS n_parts_approx, n
         |FROM est JOIN n USING (grp)""".stripMargin
    },
    // content-hash sample membership is plain SQL: md5 coordinate
    // below the fraction threshold (SampleOps.thresholdHex)
    "q52_sample" ->
      s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n FROM orders
         |WHERE substring(md5('q52:' || CAST(o_orderkey AS VARCHAR)), 1, 13)
         |      < '${graft.ops.SampleOps.thresholdHex(0.1)}'
         |GROUP BY o_orderstatus""".stripMargin,
    "q186_window_ranks" ->
      """WITH rev AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
        | FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, revenue,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume
        |FROM rev
        |WINDOW w AS (ORDER BY revenue DESC, o_custkey)""".stripMargin,
    "q187_pivot" ->
      """SELECT n_name,
        | coalesce(round(sum(CASE WHEN yr = 1995 THEN o_totalprice END), 2), 0.0) AS rev_1995,
        | coalesce(round(sum(CASE WHEN yr = 1996 THEN o_totalprice END), 2), 0.0) AS rev_1996,
        | coalesce(round(sum(CASE WHEN yr = 1997 THEN o_totalprice END), 2), 0.0) AS rev_1997,
        | coalesce(round(sum(CASE WHEN yr = 1998 THEN o_totalprice END), 2), 0.0) AS rev_1998
        |FROM (SELECT n_name, year(o_orderdate) AS yr, o_totalprice
        |      FROM orders
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation ON c_nationkey = n_nationkey)
        |GROUP BY n_name""".stripMargin,
    "q188_unpivot" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'retail_cents', CAST(round(p_retailprice * 100) AS BIGINT)
        |FROM part""".stripMargin,
    "q189_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity,
        | round(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_quantity >= 45 AND l_discount > 0.05""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_nation_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority""".stripMargin,
    "q06_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q07_topk_per_group" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 3""".stripMargin,
    "q08_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders""".stripMargin,
    "q09_lag_delta" ->
      """SELECT event_id, user_id, value,
        | round(value - lag(value, 1) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id), 4) AS delta
        |FROM events""".stripMargin,
    "q10_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q11_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q12_union" ->
      """SELECT c_custkey AS id, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, 'supplier' AS src FROM supplier""".stripMargin,
    "q13_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q14_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q15_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q16_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q17_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "q18_conditional_agg" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS returned_rev,
        | round(sum(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS kept_rev,
        | count(*) AS n
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q19_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
        | substr(p_name, 1, 8) AS name8,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | p_brand || '#' || p_type AS brand_type,
        | replace(p_type, ' ', '_') AS type_u
        |FROM part""".stripMargin,
    "q20_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo,
        | count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q21_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 3""".stripMargin,
    "q22_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        | SELECT o_orderkey, o_custkey, o_totalprice,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey), 4) AS ap
        | FROM orders) t
        |WHERE o_totalprice > ap""".stripMargin,
    "q23_range_join" ->
      """SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders
        |JOIN (VALUES ('band1_lo', 0.0, 50000.0),
        |             ('band2_mid', 50000.0, 150000.0),
        |             ('band3_hi', 150000.0, 300000.0),
        |             ('band4_top', 300000.0, 1e12)) AS v(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band""".stripMargin,
    "q291_sole_late_supplier" ->
      """WITH g AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |      THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |od AS (SELECT ok, CAST(count(*) AS BIGINT) AS n_supp,
        |    CAST(sum(late) AS BIGINT) AS n_late FROM g GROUP BY ok),
        |sole AS (SELECT sk FROM g JOIN od USING (ok)
        |  WHERE late = 1 AND n_supp >= 2 AND n_late = 1)
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM sole JOIN supplier ON sk = s_suppkey
        |GROUP BY 1, 2""".stripMargin,
    "q296_name_match" ->
      """WITH p AS (SELECT p_partkey AS pk, p_name AS nm,
        |    split_part(p_name, ' ', 1) AS blk FROM part),
        |cand AS (SELECT a.pk, a.nm, b.pk AS pk2,
        |    levenshtein(a.nm, b.nm) AS dist
        |  FROM p a JOIN p b ON a.blk = b.blk AND a.pk <> b.pk),
        |rk AS (SELECT pk, pk2, dist, row_number() OVER (
        |    PARTITION BY pk ORDER BY dist ASC, pk2 ASC) AS rn
        |  FROM cand)
        |SELECT pk AS p_partkey, pk2 AS best_key,
        |  CAST(dist AS INTEGER) AS dist
        |FROM rk WHERE rn = 1""".stripMargin,
    "q24_asof_join" ->
      """SELECT event_id, user_id, prev_click_id FROM (
        | SELECT event_id, user_id, event_type,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_id
        | FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'""".stripMargin,
    "q25_sessionize" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN prev_ts IS NULL
        |                OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_sessions
        |FROM (SELECT user_id, ts,
        |       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM events) t
        |GROUP BY user_id""".stripMargin,
    "q26_time_bucket" ->
      """SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS bucket_s,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q139_type_drift" ->
      """WITH c AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400
        |    AS bucket_s, event_type AS t, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT bucket_s, sum(c) AS n FROM c GROUP BY 1),
        |a AS (SELECT bucket_s AS b, t, c AS ca FROM c),
        |bn AS (SELECT bucket_s - 86400 AS b, t, c AS cb FROM c),
        |na AS (SELECT bucket_s AS b, n AS n_a FROM tot),
        |nb AS (SELECT bucket_s - 86400 AS b, n AS n_b FROM tot),
        |j AS (SELECT coalesce(a.b, bn.b) AS b, coalesce(a.t, bn.t) AS t,
        |        coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |      FROM a FULL OUTER JOIN bn ON a.b = bn.b AND a.t = bn.t),
        |x AS (SELECT j.b, t,
        |  CAST(ca AS DOUBLE) / n_a AS p, CAST(cb AS DOUBLE) / n_b AS q
        | FROM j JOIN na ON j.b = na.b JOIN nb ON j.b = nb.b),
        |g AS (SELECT b, count(*) AS n_types,
        |  round(sum(
        |    (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) * 0.5 ELSE 0 END)
        |    + (CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) * 0.5 ELSE 0 END)),
        |   6) AS jsd
        | FROM x GROUP BY b)
        |SELECT g.b AS bucket_s, g.b + 86400 AS next_bucket_s,
        | CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        | n_types, jsd
        |FROM g JOIN na ON g.b = na.b JOIN nb ON g.b = nb.b""".stripMargin,
    "q70_profile" ->
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate").map { c =>
        s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),
    "q347_fill_latency" ->
      """WITH lat AS (SELECT o_orderpriority AS prio,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |r AS (SELECT prio, days,
        |    row_number() OVER (PARTITION BY prio ORDER BY days ASC)
        |      AS rk,
        |    count(*) OVER (PARTITION BY prio) AS n FROM lat)
        |SELECT prio, CAST(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN rk = CAST(ceil(n * 50 / 100.0) AS BIGINT)
        |    THEN days END) AS p50_days,
        |  max(CASE WHEN rk = CAST(ceil(n * 90 / 100.0) AS BIGINT)
        |    THEN days END) AS p90_days,
        |  max(CASE WHEN rk = CAST(ceil(n * 99 / 100.0) AS BIGINT)
        |    THEN days END) AS p99_days
        |FROM r GROUP BY prio""".stripMargin,
    "q342_ship_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q343_cust_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT)
        |    AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin,
    "q344_returned_revenue" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CAST(rev4 AS DOUBLE) / 1e4 AS revenue
        |FROM (SELECT o_custkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS rev4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R' GROUP BY o_custkey) r
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    // q348/q349/q350 oracles are deliberately spelled in the
    // CORRELATED form (scalar subquery / EXISTS / nested IN with a
    // correlated aggregate): the hash match proves the engine's
    // decorrelated plans compute exactly the correlated semantics.
    "q348_min_cost_supplier" ->
      """WITH eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |off AS (SELECT l_partkey AS pk, l_suppkey AS sk,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
        |  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2)
        |SELECT p_partkey, s_suppkey, s_name, n_name, p_type,
        |  round(s_acctbal, 2) AS acctbal,
        |  CAST(cost_c AS DOUBLE) / 100 AS best_cost
        |FROM off o JOIN eu ON o.sk = s_suppkey
        |JOIN part ON o.pk = p_partkey
        |WHERE o.cost_c = (SELECT min(i.cost_c) FROM off i
        |  WHERE i.pk = o.pk)
        |ORDER BY acctbal DESC, s_suppkey ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,
    "q349_waiting_orders" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "q350_majority_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT f.l_suppkey
        |  FROM lineitem f JOIN part ON f.l_partkey = p_partkey
        |  WHERE p_size >= 45
        |    AND f.l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND f.l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY f.l_partkey, f.l_suppkey
        |  HAVING 2 * sum(CAST(round(f.l_quantity) AS BIGINT)) >
        |    (SELECT sum(CAST(round(l2.l_quantity) AS BIGINT))
        |     FROM lineitem l2
        |     WHERE l2.l_partkey = f.l_partkey
        |       AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
        |       AND l2.l_shipdate < TIMESTAMP '1998-01-01'))"""
        .stripMargin,
    "q364_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  CAST(max(l_shipdate) AS DATE) AS max_ship
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,
    "q353_top_supplier" ->
      """WITH revenue AS (SELECT l_suppkey AS sk,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS rev4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(rev4 AS DOUBLE) / 1e4 AS total_revenue
        |FROM revenue JOIN supplier ON sk = s_suppkey
        |WHERE rev4 = (SELECT max(rev4) FROM revenue)""".stripMargin,
    "q354_important_parts" ->
      """WITH pv AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS v2
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY 1)
        |SELECT l_partkey, CAST(v2 AS DOUBLE) / 100 AS part_value
        |FROM pv
        |WHERE v2 * 10000 > (SELECT sum(v2) FROM pv)""".stripMargin,
    "q355_lost_customers" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer),
        |t AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s_c,
        |    CAST(count(*) AS BIGINT) AS n_c FROM c WHERE bal_c > 0)
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(bal_c) AS DOUBLE) / 100 AS total_bal
        |FROM c CROSS JOIN t
        |WHERE bal_c * n_c > s_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""".stripMargin,
    "q367_local_supplier_volume" ->
      s"""SELECT n_name,
        |  CAST(sum($Rev4Sql) AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q368_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 1e4
        |    AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin,
    "q369_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum($Rev4Sql) AS DOUBLE) / 1e4 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "q370_market_share" ->
      s"""WITH base AS (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |   sn.n_name AS supp_nation,
        |   $Rev4Sql AS rev4
        | FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        | WHERE p_type = 'ECONOMY'
        |   AND EXISTS (SELECT 1 FROM customer
        |     JOIN nation cn ON c_nationkey = cn.n_nationkey
        |     JOIN region ON cn.n_regionkey = r_regionkey
        |     WHERE c_custkey = o_custkey AND r_name = 'AMERICA'))
        |SELECT o_year,
        |  CASE WHEN sum(rev4) = 0 THEN NULL
        |    ELSE round(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
        |      THEN rev4 ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(rev4) AS DOUBLE), 6) END AS mkt_share
        |FROM base GROUP BY o_year""".stripMargin,
    "q371_promo_revenue" ->
      s"""SELECT CASE WHEN sum($Rev4Sql) = 0 THEN NULL
        |  ELSE round(CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN $Rev4Sql ELSE 0 END) AS DOUBLE) * 100
        |    / CAST(sum($Rev4Sql) AS DOUBLE), 6) END AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q372_large_volume_customers" ->
      """WITH big AS (
        | SELECT l_orderkey, sum(l_quantity) AS total_qty
        | FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |  total_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q373_product_profit" ->
      s"""SELECT n_name AS supp_nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum($Rev4Sql
        |    - CAST(round(l_quantity) AS BIGINT)
        |      * CAST(round(p_retailprice * 100) AS BIGINT) * 100)
        |    AS DOUBLE) / 1e4 AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,
    "q374_brand_quantity_revenue" ->
      s"""SELECT CAST(sum($Rev4Sql) AS DOUBLE) / 1e4 AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q292_fd_discovery" -> graft.ops.ProfileOps.fdAuditOracleSql(
      "lineitem", Seq(
        "l_orderkey" -> "l_suppkey",
        "l_orderkey" -> "l_returnflag",
        "l_partkey" -> "l_suppkey",
        "l_suppkey" -> "l_linestatus")),
    "q76_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_orderkey = l.l_orderkey
        |    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag""".stripMargin,
    "q62_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q27_count_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q28_regex_extract" ->
      """SELECT event_id,
        | TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
        |FROM events""".stripMargin,
    "q29_star_probe" ->
      """SELECT n_name, count(*) AS n_orders,
        | round(avg(o_totalprice), 4) AS avg_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY n_name""".stripMargin)
}
