package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot comparison — the change-detection primitive of an
  * incremental pipeline: given the current and previous versions of a
  * document table, classify every id as added / removed / changed /
  * unchanged, so downstream stages (dedup stores, embeddings, packed
  * shards) can be refreshed for the delta instead of the world.
  *
  * Physical shape: each side reduces to (id, digest) — 16-byte md5,
  * never the text — then ONE full outer join keyed by id. Two narrow
  * shuffles at any corpus size; text moves nowhere.
  */
object SnapshotOps {

  /** Per-id diff of two snapshots. `statusFilter` (e.g. keep only
    * non-"unchanged") pushes into the join output before anything
    * downstream materializes.
    */
  def snapshotDiff(cur: DataFrame, prev: DataFrame, idCol: String,
      textCol: String, statusFilter: Column = lit(true)): DataFrame = {
    // presence flags are separate from digests: a NULL digest means
    // null TEXT, not an absent row — conflating them would misreport
    // a null-text row as added/removed
    def keyed(df: DataFrame, side: String) =
      df.select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as(s"${side}_digest"),
        lit(true).as(s"${side}_present"))
    val j = keyed(cur, "cur").join(keyed(prev, "prev"), Seq("id"), "full_outer")
    j.select(col("id"),
        when(col("prev_present").isNull, lit("added"))
          .when(col("cur_present").isNull, lit("removed"))
          .when(col("cur_digest") <=> col("prev_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .filter(statusFilter)
  }
}
