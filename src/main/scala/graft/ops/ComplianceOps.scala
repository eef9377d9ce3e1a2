package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-compliance tooling: given a subject cohort (GDPR/CCPA
  * right-to-be-forgotten requests), measure the CASCADE — every row
  * in every downstream table that references the cohort directly or
  * transitively — before anything is actually deleted. The manifest
  * is what a data-protection officer signs off on, and what the
  * delete job later checkpoints against.
  *
  * Complements the privacy family (PII scrub q64, k-anonymity q172,
  * l-diversity q176): those measure exposure, this measures reach.
  *
  * Scale shape: each table is scanned ONCE with a membership join —
  * the cohort key set is typically «1% of the subject table, so
  * Catalyst picks a broadcast join at realistic sizes; when a cohort
  * outgrows the broadcast threshold the same plan degrades to a
  * shuffle hash join, never a cartesian. Fractions are exact
  * integer ppm (half-up), so the manifest is bit-identical on any
  * engine and partitioning.
  */
object ComplianceOps {

  /** Exact half-up integer division num/den in parts-per-million,
    * spelled with pmod so the numerator is an exact multiple of den,
    * then divided in decimal(38,*) — exact for the FULL long range
    * (the previous double division lost exactness past num·2e6 ≥
    * 2^53, i.e. ~4.5e9 flagged rows; at 100 TB that is reachable).
    * A numerator past 2^63 errors loudly under ANSI.
    */
  private def ppm(num: Column, den: Column): Column =
    ExactArith.halfUpDiv(num * 1000000L, den)

  /** One manifest row: (table, rows_total, rows_delete, delete_ppm)
    * from a frame with a boolean `del` flag.
    */
  private def manifestRow(name: String, flagged: DataFrame): DataFrame =
    flagged.agg(count(lit(1)).as("rows_total"),
        coalesce(sum(when(col("del"), 1L)), lit(0L)).as("rows_delete"))
      .select(lit(name).as("table_name"), col("rows_total"),
        col("rows_delete"), ppm(col("rows_delete"), col("rows_total"))
          .as("delete_ppm"))

  /** Cascade audit over the customer → orders → lineitem chain:
    * `cohortPred` selects the customers to forget; orders cascade by
    * custkey, lineitems by membership in the deleted orders.
    */
  def cascadeDeleteAudit(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, cohortPred: Column): DataFrame = {
    val cust = customer.withColumn("del", cohortPred)
    val cohortKeys = cust.filter(col("del"))
      .select(col("c_custkey").as("k"))
    val ord = orders.join(cohortKeys,
        orders("o_custkey") === cohortKeys("k"), "left")
      .withColumn("del", col("k").isNotNull)
    val deletedOrders = ord.filter(col("del"))
      .select(col("o_orderkey").as("ok"))
    val li = lineitem.join(deletedOrders,
        lineitem("l_orderkey") === deletedOrders("ok"), "left")
      .withColumn("del", col("ok").isNotNull)
    manifestRow("customer", cust)
      .unionByName(manifestRow("orders", ord))
      .unionByName(manifestRow("lineitem", li))
  }

  /** DuckDB twin of [[cascadeDeleteAudit]]. */
  def cascadeOracleSql(cohortPred: String): String =
    s"""WITH cohort AS (SELECT c_custkey AS k FROM customer
       |  WHERE $cohortPred),
       |dord AS (SELECT o_orderkey FROM orders
       |  WHERE o_custkey IN (SELECT k FROM cohort)),
       |rows0 AS (
       |  SELECT 'customer' AS table_name, count(*) AS rows_total,
       |    sum(CASE WHEN $cohortPred THEN 1 ELSE 0 END) AS rows_delete
       |  FROM customer
       |  UNION ALL
       |  SELECT 'orders', count(*),
       |    sum(CASE WHEN o_custkey IN (SELECT k FROM cohort)
       |        THEN 1 ELSE 0 END)
       |  FROM orders
       |  UNION ALL
       |  SELECT 'lineitem', count(*),
       |    sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM dord)
       |        THEN 1 ELSE 0 END)
       |  FROM lineitem)
       |SELECT table_name, CAST(rows_total AS BIGINT) AS rows_total,
       |  CAST(rows_delete AS BIGINT) AS rows_delete,
       |  CAST((rows_delete * 2000000 + rows_total) // (rows_total * 2)
       |    AS BIGINT) AS delete_ppm
       |FROM rows0""".stripMargin
}
