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

  /** Slowly-changing-dimension TYPE-2 merge: fold a new dimension
    * snapshot into a versioned history table. History rows carry
    * (`keyCol`, attrs..., `valid_from`, `valid_to`) with
    * `valid_to IS NULL` marking the open (current) version. At merge
    * time `ts`:
    *
    *  - attrs unchanged → open row passes through untouched;
    *  - attrs changed   → open row closes (valid_to = ts) AND a new
    *    open row inserts (valid_from = ts);
    *  - key absent from the snapshot (deleted) → open row closes;
    *  - key new in the snapshot → new open row inserts;
    *  - already-closed history rows pass through verbatim.
    *
    * Physical shape: closed history is a pass-through scan; the open
    * slice joins the snapshot with ONE full-outer equi-join on the
    * key (AQE-sized shuffle, broadcastable when the snapshot is a
    * small dim), and every output class is a projection of that one
    * join — the history is never joined to itself and never
    * windowed. Attr comparison is null-safe (`<=>`) per column.
    */
  /** CDC op-log compaction (last-write-wins apply): given a change
    * log of (key, op ∈ {I,U,D}, value, t, tiebreak id), produce the
    * final table state — the latest op per key wins (deterministic
    * (t, id) order), a terminal D deletes the key. The "apply the
    * Debezium/binlog stream to a snapshot" op; one key-partitioned
    * row_number window, no self-joins, scales per key.
    */
  def cdcApply(log: DataFrame, keyCol: String, opCol: String,
      valueCol: String, tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col(idCol).desc)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "D")
      .select(col(keyCol).as("k"), col(valueCol).as("value"),
        col(tsCol).as("last_t"), col(opCol).as("last_op"))
  }

  /** DuckDB twin of [[cdcApply]]. */
  def cdcApplyOracleSql(logSql: String, keyCol: String, opCol: String,
      valueCol: String, tsCol: String, idCol: String): String =
    s"""WITH log AS (__LOG__),
       |r AS (SELECT *, row_number() OVER (PARTITION BY $keyCol
       |    ORDER BY $tsCol DESC, $idCol DESC) AS rn FROM log)
       |SELECT $keyCol AS k, $valueCol AS value, $tsCol AS last_t,
       |  $opCol AS last_op
       |FROM r WHERE rn = 1 AND $opCol <> 'D'"""
      .stripMargin.replace("__LOG__", logSql)

  def scd2Merge(history: DataFrame, snapshot: DataFrame, keyCol: String,
      attrCols: Seq[String], ts: Long): DataFrame = {
    require(attrCols.nonEmpty, "scd2Merge needs at least one attribute column")
    val outCols = (keyCol +: attrCols).map(col) :+
      col("valid_from") :+ col("valid_to")
    val closed = history.filter(col("valid_to").isNotNull)
      .select(outCols: _*)
    val open = history.filter(col("valid_to").isNull)
      .select((keyCol +: attrCols).map(c => col(c).as(s"h_$c")) :+
        col("valid_from").as("h_valid_from"): _*)
    val snap = snapshot
      .select((keyCol +: attrCols).map(c => col(c).as(s"s_$c")): _*)
    val j = open.join(snap,
      col(s"h_$keyCol") <=> col(s"s_$keyCol"), "full_outer")
    val same = attrCols.map(c => col(s"h_$c") <=> col(s"s_$c")).reduce(_ && _)
    val hPresent = col(s"h_$keyCol").isNotNull
    val sPresent = col(s"s_$keyCol").isNotNull
    // ONE pass over the join: each key emits 1–2 classified rows via
    // an exploded struct array (three filtered consumers of the same
    // join would re-execute it three times)
    def row(keyC: Column, attrs: Seq[Column], from: Column, to: Column) =
      struct((keyC.as(keyCol) +: attrCols.zip(attrs).map {
        case (c, v) => v.as(c)
      }) :+ from.as("valid_from") :+ to.as("valid_to"): _*)
    val hRow = (from: Column, to: Column) => row(col(s"h_$keyCol"),
      attrCols.map(c => col(s"h_$c")), from, to)
    val sRow = row(col(s"s_$keyCol"), attrCols.map(c => col(s"s_$c")),
      lit(ts), lit(null).cast("long"))
    val keep = hRow(col("h_valid_from"), lit(null).cast("long"))
    val close = hRow(col("h_valid_from"), lit(ts))
    val emitted = j.select(explode(
      when(hPresent && sPresent && same, array(keep))
        .when(hPresent && sPresent, array(close, sRow))
        .when(hPresent, array(close))
        .otherwise(array(sRow))).as("r"))
      .select(col("r.*"))
    closed.unionByName(emitted)
  }

  /** Fixed-depth corpus Merkle manifest — the O(1)-compare dataset
    * version fingerprint beside [[snapshotDiff]]'s per-id delta: two
    * corpus versions are identical iff their roots match, and when
    * they differ the first divergent level-k node names the id range
    * to rescan — no full-corpus diff join.
    *
    * Construction (deterministic, content-only — partition layout
    * and row order never matter): leaf node = `leafSpan` consecutive
    * ids (id div leafSpan), digest = md5 of the id-sorted
    * concatenation of per-row digests md5(id ':' md5(content));
    * each upper level hashes `fanout` children in child order. Depth
    * is FIXED (3 ups) so the output schema and every digest are
    * scale-stable: single-root capacity is leafSpan·fanout³ ids
    * (16·64³ ≈ 4.2M at the defaults — add a level for more); a
    * corpus past capacity shows MULTIPLE level-3 nodes in the
    * output (a visible forest, never a silent truncation).
    *
    * Scale shape: one corpus scan to (id, digest); every aggregation
    * groups at most `leafSpan` rows (leaves) or `fanout` children
    * (upper levels) per node — collect_list state is BOUNDED by
    * construction, the whole point of hashing a tree instead of one
    * giant sorted string_agg.
    *
    * Ids must be NON-NEGATIVE: the bucket division is spelled for
    * the non-negative grid (Spark's truncate and DuckDB's floor
    * agree there and diverge below zero).
    *
    * @return (level, bucket, n_docs, digest) — every tree node,
    *         level 0 = leaves, level 3 = root (bucket 0)
    */
  def merkleManifest(df: DataFrame, idCol: String, contentCol: String,
      leafSpan: Int = 16, fanout: Int = 64): DataFrame = {
    require(leafSpan >= 1 && fanout >= 2,
      s"bad leafSpan=$leafSpan/fanout=$fanout")
    val rows = df.select(col(idCol).cast("long").as("id"),
      md5(concat(col(idCol).cast("string"), lit(":"),
        md5(col(contentCol).cast("binary"))).cast("binary")).as("d"))
    def up(nodes: DataFrame, div: Column): DataFrame =
      nodes.groupBy((col("bucket") / div).cast("long").as("b2"))
        .agg(sum("n_docs").as("n_docs"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("bucket"), col("d")))),
            s => s("d")), "").cast("binary")).as("d"))
        .select(col("b2").as("bucket"), col("n_docs"), col("d"))
    val leaves = rows
      .groupBy((col("id") / leafSpan).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("id"), col("d")))),
          s => s("d")), "").cast("binary")).as("d"))
    val l1 = up(leaves, lit(fanout))
    val l2 = up(l1, lit(fanout))
    val l3 = up(l2, lit(fanout))
    Seq(leaves, l1, l2, l3).zipWithIndex.map { case (lvl, i) =>
      lvl.select(lit(i).as("level"), col("bucket"), col("n_docs"),
        col("d").as("digest"))
    }.reduce(_ unionByName _).orderBy("level", "bucket")
  }

  /** DuckDB replay of [[merkleManifest]]. Uses ordered string_agg
    * per bounded node — identical digests level by level. */
  def merkleManifestOracleSql(table: String, idExpr: String,
      contentExpr: String, leafSpan: Int = 16,
      fanout: Int = 64): String =
    s"""WITH rows0 AS (SELECT CAST($idExpr AS BIGINT) AS id,
       |    md5(CAST($idExpr AS VARCHAR) || ':' || md5($contentExpr))
       |      AS d FROM $table),
       |l0 AS (SELECT id // $leafSpan AS bucket,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    md5(string_agg(d, '' ORDER BY id)) AS d
       |  FROM rows0 GROUP BY 1),
       |l1 AS (SELECT bucket // $fanout AS bucket,
       |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |    md5(string_agg(d, '' ORDER BY bucket)) AS d
       |  FROM l0 GROUP BY 1),
       |l2 AS (SELECT bucket // $fanout AS bucket,
       |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |    md5(string_agg(d, '' ORDER BY bucket)) AS d
       |  FROM l1 GROUP BY 1),
       |l3 AS (SELECT bucket // $fanout AS bucket,
       |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |    md5(string_agg(d, '' ORDER BY bucket)) AS d
       |  FROM l2 GROUP BY 1)
       |SELECT 0 AS level, bucket, n_docs, d AS digest FROM l0
       |UNION ALL SELECT 1, bucket, n_docs, d FROM l1
       |UNION ALL SELECT 2, bucket, n_docs, d FROM l2
       |UNION ALL SELECT 3, bucket, n_docs, d FROM l3
       |ORDER BY level, bucket""".stripMargin
}
