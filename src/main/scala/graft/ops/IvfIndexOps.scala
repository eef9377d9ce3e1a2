package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental IVF index maintenance — the missing update/merge story
  * for the embedding index as the corpus grows.
  *
  * [[DedupOps.dedupAgainstStore]] gives text digests an incremental
  * path; this gives the coarse quantizer one. The index's mutable
  * state is held as SUFFICIENT STATISTICS, not centers: per (cell,
  * pos) a fixed-point DECIMAL(38,0) coordinate sum (of round(x·10⁷),
  * the [[SimilarityOps.labelCentroids]] / PcaOps moment discipline —
  * exact, order-independent, overflow-safe to ~10³⁰ rows) plus a
  * member count. Sums and counts are ADDITIVE, so indexing batch 1
  * then batch 2 incrementally ([[cellStats]] per batch +
  * [[mergeStats]]) produces bit-identical statistics — and therefore
  * bit-identical refreshed centers and probe assignments — to a
  * from-scratch pass over the union. That exactness is what makes the
  * refresh protocol auditable: q239's DuckDB oracle replays BOTH the
  * batched and the from-scratch path and the driver hash-compares.
  *
  * Refresh protocol (one mini-batch Lloyd half-step, the standard
  * production cadence for a billion-row index where full refits are a
  * scheduled event, not a per-ingest one):
  *   1. new vectors are assigned under the CURRENT frozen centers
  *      (narrow scan — distances rounded 5dp, cell-asc tie-break, the
  *      [[SimilarityOps.centroidConfusion]] determinism contract);
  *   2. their (cell, pos) stats merge into the store (k·d-row frame —
  *      model-scale, broadcastable, cheap to persist per batch);
  *   3. [[refresh]] re-derives centers as merged mean (7dp), empty
  *      cells keeping their previous center (the lloydFit contract).
  *
  * Scale shape: the corpus never shuffles wide — assignment is one
  * broadcast-join scan, the stats aggregate map-side combines to at
  * most k·d rows per partition, and only k·d numbers move at merge/
  * refresh time. A full refit ([[SimilarityOps.kmeansAssign]]) remains
  * the periodic re-seed; this is the between-refits path.
  */
object IvfIndexOps {

  /** Deterministic content-keyed seed centers: the `k` vectors with
    * lexicographically-smallest md5("ivf:" ++ id) (id-asc tie-break) —
    * partition-invariant, RNG-free, and replayable in SQL (ORDER BY
    * md5 LIMIT k), unlike a seeded sample.
    */
  def initCenters(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, k: Int): Seq[Seq[Double]] = {
    require(k >= 2, s"k must be >= 2, got $k")
    import spark.implicits._
    val rows = emb.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("_c", md5(concat(lit("ivf:"), col("id").cast("string"))))
      .orderBy(col("_c"), col("id")).limit(k)
      .select("v").as[Seq[Double]].collect()
    require(rows.length == k, s"corpus has ${rows.length} rows, need k=$k seeds")
    rows.toIndexedSeq.map(_.toIndexedSeq)
  }

  private def centerTable(spark: SparkSession,
      centers: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    centers.zipWithIndex.map { case (c, i) => (i, c) }.toDF("cell", "cv")
  }

  /** Argmin cell as a PURE EXPRESSION over the center literal:
    * array_min over (dist, cell) structs — struct ordering is
    * lexicographic, so ties break cell-asc exactly like a
    * (dist asc, cell asc) window, with ZERO shuffle (the window form
    * repartitioned the corpus by id just to rank k candidate rows).
    * Distances round to 5dp before the argmin, so the assignment is
    * deterministic and engine-portable. Stateless and narrow — which
    * also makes it legal under Structured Streaming
    * ([[graft.streaming.StreamOps]]'s ivfStatsStream twin; windows
    * are not). For nCells in the tens of thousands, switch to the
    * native `graft_nearest_cells` ranking — same protocol, one plan
    * node; the composed form here is the oracle-replayable one.
    */
  private[graft] def nearestCellCol(vecCol: Column,
      centers: Seq[Seq[Double]]): Column = {
    require(centers.size <= 1024, "nearestCellCol packs cell into 10 bits")
    val cArr = typedlit(centers.map(_.toSeq))
    // (dist, cell) packed into one comparable long — struct field
    // names don't survive HOF lambdas, and the packed key gives the
    // identical (dist asc, cell asc) order: dist is the 5dp grid as
    // exact integer 1e-5 units (round(d·1e5, 0) ≡ round(d, 5)·1e5),
    // scaled by 1024 with the cell index in the low bits.
    val key = array_min(transform(sequence(lit(0), lit(centers.size - 1)),
      i => round(sqrt(aggregate(zip_with(vecCol, element_at(cArr, i + 1),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _)) * 1e5, 0)
        .cast("long") * 1024L + i))
    pmod(key, lit(1024L)).cast("int")
  }

  /** Nearest-cell assignment under FROZEN centers: (id, v, cell) via
    * [[nearestCellCol]] — one narrow corpus scan, no joins, no
    * windows, no shuffle.
    */
  def assign(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, centers: Seq[Seq[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    emb.select(col(idCol).as("id"), v.as("v"),
      nearestCellCol(v, centers).as("cell"))
  }

  /** One batch's sufficient statistics under frozen `centers`:
    * (cell, pos, s: decimal(38,0) fixed-point coordinate sum, n).
    * k·d rows — the persistable per-batch index delta.
    */
  def cellStats(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, centers: Seq[Seq[Double]]): DataFrame =
    cellStatsFromAssigned(assign(spark, emb, idCol, vecCol, centers))

  /** Stats from an ALREADY-ASSIGNED (id, v, cell) frame — callers
    * that split one assignment scan into several batch deltas
    * (q239's shape) checkpoint the assignment once and derive every
    * delta from it, instead of re-running the corpus scan per batch.
    */
  def cellStatsFromAssigned(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(col("cell"), col("pos"),
        round(col("x") * 1e7, 0).cast("decimal(38,0)").as("xi"))
      .groupBy("cell", "pos")
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))

  /** Additive merge of two stats frames — the incremental index
    * update. Decimal sums are associative, so any merge order yields
    * the identical store.
    */
  def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("cell", "pos")
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))

  /** Refreshed centers from a stats store: mean per (cell, pos)
    * rounded to 7dp; a cell absent from the store (no members yet)
    * keeps its previous center. Collects k·d rows — model-scale.
    */
  def refresh(prev: Seq[Seq[Double]], stats: DataFrame): Seq[Seq[Double]] = {
    val next = prev.map(_.toArray).toArray
    stats.select(col("cell"), col("pos"),
        round(col("s").cast("double") / 1e7 / col("n"), 7).as("c"))
      .collect().foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
    next.toIndexedSeq.map(_.toIndexedSeq)
  }

  // ---------------------------------------------------------------
  // PQ-codebook incremental maintenance — the second half of the
  // index update story ([[cellStats]]/[[refresh]] handle the coarse
  // quantizer; these handle the per-subspace codebooks that
  // knnIvfPq's ADC scan reads). Same sufficient-statistics design,
  // one level deeper: state is per (subspace, code, pos) decimal
  // residual sums + counts; batch merge is additive and therefore
  // bit-identical to a from-scratch refresh (q242's oracle replays
  // both paths).
  // ---------------------------------------------------------------

  /** Per-vector residuals vs frozen coarse `centers`: (id, r) with
    * r[p] = v[p] − center[p] (IEEE subtraction of identical doubles —
    * deterministic and SQL-replayable, unlike the seeded pqFit
    * sample).
    */
  def residuals(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, centers: Seq[Seq[Double]]): DataFrame = {
    val cent = centerTable(spark, centers)
    // parallelism floor (batch-only op): the per-row nearest-cell +
    // subtraction pass is compute over narrow rows, and a small
    // single-file corpus scans as ONE split — no-op at real scale
    assign(spark, SkewOps.parallelismFloor(
        emb.select(col(idCol), col(vecCol))), idCol, vecCol, centers)
      .join(broadcast(cent), Seq("cell"))
      .select(col("id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"))
  }

  /** Deterministic content-keyed codebook seeds: the residual
    * subvectors of the `nCodes` vectors with smallest
    * md5("pq:" ++ id) — one doc set seeds all `m` subspaces.
    * Returns [m][nCodes][dim/m].
    */
  def initCodebooks(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String, centers: Seq[Seq[Double]], m: Int,
      nCodes: Int): Seq[Seq[Seq[Double]]] = {
    import spark.implicits._
    // rank by md5 BEFORE computing residuals: the seed pick needs the
    // residual of only nCodes rows, so the nearest-cell scan over the
    // whole corpus that the naive residuals-then-limit form paid is
    // dropped to a narrow (id, v) TakeOrdered + nCodes-row residual
    // evaluation — residuals are row-local, so values are identical
    val seeds = emb.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("_c", md5(concat(lit("pq:"), col("id").cast("string"))))
      .orderBy(col("_c"), col("id")).limit(nCodes)
      .select(col("_c"), col("id"), col("v"),
        nearestCellCol(col("v"), centers).as("cell"))
    // the broadcast join does not preserve the seed order — re-sort on
    // the same (md5, id) key before collecting (seed order IS the
    // code index assignment)
    val rows = seeds.join(broadcast(centerTable(spark, centers)), Seq("cell"))
      .orderBy(col("_c"), col("id"))
      .select(zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"))
      .as[Seq[Double]].collect()
    require(rows.length == nCodes,
      s"corpus has ${rows.length} rows, need nCodes=$nCodes seeds")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    (0 until m).map(j => rows.toIndexedSeq.map(r =>
      r.slice(j * ds, (j + 1) * ds).toIndexedSeq))
  }

  private def codebookTable(spark: SparkSession,
      books: Seq[Seq[Seq[Double]]]): DataFrame = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (b, j) =>
      b.zipWithIndex.map { case (cw, c) => (j, c, cw) }
    }.toDF("j", "code", "bv")
  }

  /** Per-(vector, subspace) code assignment under frozen `books`:
    * (id, j, code, rv). Same determinism contract as [[assign]]
    * (5dp distances, code-asc ties). The codebook table (m·nCodes
    * rows) broadcasts; the residual frame meets it in one equi-join
    * on the subspace index.
    */
  def codeAssign(spark: SparkSession, resids: DataFrame,
      books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.size
    val nCodes = books.head.size
    require(nCodes <= 1024, "codeAssign packs code into 10 bits")
    val ds = books.head.head.size
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val sub = resids.select(col("id"),
        explode(sequence(lit(0), lit(m - 1))).as("j"), col("r"))
      .select(col("id"), col("j"),
        slice(col("r"), col("j") * ds + 1, lit(ds)).as("rv"))
    // same packed-key argmin as [[nearestCellCol]] (and the same
    // documented 5dp identity: round(d, 5) ordering ≡ round(d·1e5, 0)
    // integer ordering): (dist, code) packs into one comparable long,
    // ties break code-asc exactly like the old (dist asc, code asc)
    // window — ZERO shuffle, where the window form repartitioned the
    // n·m·nCodes candidate frame by (id, j) just to rank nCodes rows
    val key = array_min(transform(sequence(lit(0), lit(nCodes - 1)),
      c => round(sqrt(aggregate(zip_with(col("rv"),
          element_at(element_at(booksLit, col("j") + 1), c + 1),
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _)) * 1e5, 0)
        .cast("long") * 1024L + c))
    sub.select(col("id"), col("j"),
      pmod(key, lit(1024L)).cast("int").as("code"), col("rv"))
  }

  /** One batch's codebook sufficient statistics: (j, code, p,
    * s: decimal(38,0) fixed-point residual sum, n). m·nCodes·(dim/m)
    * rows — the persistable per-batch codebook delta.
    */
  def codeStats(spark: SparkSession, resids: DataFrame,
      books: Seq[Seq[Seq[Double]]]): DataFrame =
    codeAssign(spark, resids, books)
      .select(col("j"), col("code"), posexplode(col("rv")).as(Seq("p", "x")))
      .select(col("j"), col("code"), col("p"),
        round(col("x") * 1e7, 0).cast("decimal(38,0)").as("xi"))
      .groupBy("j", "code", "p")
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))

  /** Additive merge of codebook stats — the incremental update. */
  def mergeCodeStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "code", "p")
      .agg(sum(col("s")).as("s"), sum(col("n")).as("n"))

  /** Refreshed codebooks from a stats store: 7dp means; a code with
    * no members keeps its previous codeword.
    */
  def refreshCodebooks(prev: Seq[Seq[Seq[Double]]],
      stats: DataFrame): Seq[Seq[Seq[Double]]] = {
    val next = prev.map(_.map(_.toArray).toArray).toArray
    stats.select(col("j"), col("code"), col("p"),
        round(col("s").cast("double") / 1e7 / col("n"), 7).as("c"))
      .collect().foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
    next.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))
  }

  /** DuckDB replay of the full q239 protocol: seed → assign → per-
    * batch stats (batch = id % 2) → incremental merge AND from-scratch
    * stats → both refreshed center sets → probe assignments under
    * each → agreement. Every stage uses the same fixed-point/rounding
    * contract as the engine, so the driver hash-compare is exact.
    */
  def incrementalRefreshOracleSql(table: String, idCol: String,
      vecCol: String, k: Int, probeMod: Int): String =
    s"""WITH e AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v
       |  FROM $table),
       |init AS (SELECT row_number() OVER (
       |    ORDER BY md5('ivf:' || CAST(id AS VARCHAR)), id) - 1 AS cell, v AS cv
       |  FROM e ORDER BY md5('ivf:' || CAST(id AS VARCHAR)), id LIMIT $k),
       |d0 AS (SELECT e.id, e.v, i.cell,
       |    round(sqrt(list_sum(list_transform(generate_series(1, len(e.v)),
       |      j -> (e.v[j] - i.cv[j]) * (e.v[j] - i.cv[j])))), 5) AS dist
       |  FROM e CROSS JOIN init i),
       |asg0 AS (SELECT id, v, cell FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id ORDER BY dist ASC, cell ASC) AS rn FROM d0)
       |  WHERE rn = 1),
       |x AS (SELECT id % 2 AS batch, cell,
       |    unnest(generate_series(1, len(v))) - 1 AS pos,
       |    unnest(list_transform(v,
       |      a -> CAST(round(a * 1e7, 0) AS DECIMAL(38,0)))) AS xi
       |  FROM asg0),
       |stb AS (SELECT batch, cell, pos, sum(xi) AS s, count(*) AS n
       |  FROM x GROUP BY batch, cell, pos),
       |sti AS (SELECT cell, pos, sum(s) AS s, sum(n) AS n
       |  FROM stb GROUP BY cell, pos),
       |sts AS (SELECT cell, pos, sum(xi) AS s, count(*) AS n
       |  FROM x GROUP BY cell, pos),
       |ci AS (SELECT i.cell, list(coalesce(
       |      round(CAST(t.s AS DOUBLE) / 1e7 / t.n, 7), i.cv[pp.pos + 1])
       |    ORDER BY pp.pos) AS cv
       |  FROM init i CROSS JOIN (SELECT unnest(generate_series(1,
       |      (SELECT len(cv) FROM init LIMIT 1))) - 1 AS pos) pp
       |  LEFT JOIN sti t ON t.cell = i.cell AND t.pos = pp.pos
       |  GROUP BY i.cell),
       |cs AS (SELECT i.cell, list(coalesce(
       |      round(CAST(t.s AS DOUBLE) / 1e7 / t.n, 7), i.cv[pp.pos + 1])
       |    ORDER BY pp.pos) AS cv
       |  FROM init i CROSS JOIN (SELECT unnest(generate_series(1,
       |      (SELECT len(cv) FROM init LIMIT 1))) - 1 AS pos) pp
       |  LEFT JOIN sts t ON t.cell = i.cell AND t.pos = pp.pos
       |  GROUP BY i.cell),
       |probes AS (SELECT id, v FROM e WHERE id % $probeMod = 0),
       |di AS (SELECT p.id, c.cell,
       |    round(sqrt(list_sum(list_transform(generate_series(1, len(p.v)),
       |      j -> (p.v[j] - c.cv[j]) * (p.v[j] - c.cv[j])))), 5) AS dist
       |  FROM probes p CROSS JOIN ci c),
       |ai AS (SELECT id, cell FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id ORDER BY dist ASC, cell ASC) AS rn FROM di)
       |  WHERE rn = 1),
       |ds AS (SELECT p.id, c.cell,
       |    round(sqrt(list_sum(list_transform(generate_series(1, len(p.v)),
       |      j -> (p.v[j] - c.cv[j]) * (p.v[j] - c.cv[j])))), 5) AS dist
       |  FROM probes p CROSS JOIN cs c),
       |asx AS (SELECT id, cell FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id ORDER BY dist ASC, cell ASC) AS rn FROM ds)
       |  WHERE rn = 1)
       |SELECT ai.id AS vec_id, CAST(ai.cell AS INTEGER) AS cell_incr,
       |  CAST(asx.cell AS INTEGER) AS cell_scratch,
       |  CAST(ai.cell = asx.cell AS INTEGER) AS agree
       |FROM ai JOIN asx ON ai.id = asx.id""".stripMargin

  /** DuckDB replay of the full q242 PQ protocol: coarse seed/assign
    * (the q239 prefix) → residuals → md5-keyed codebook seeds →
    * per-batch codebook stats → incremental merge AND from-scratch →
    * both refreshed codebooks → probe encodes under each →
    * per-subspace agreement.
    */
  def incrementalPqOracleSql(table: String, idCol: String,
      vecCol: String, k: Int, m: Int, nCodes: Int, dim: Int,
      probeMod: Int): String = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    s"""WITH e AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v
       |  FROM $table),
       |init AS (SELECT row_number() OVER (
       |    ORDER BY md5('ivf:' || CAST(id AS VARCHAR)), id) - 1 AS cell, v AS cv
       |  FROM e ORDER BY md5('ivf:' || CAST(id AS VARCHAR)), id LIMIT $k),
       |d0 AS (SELECT e.id, e.v, i.cell,
       |    round(sqrt(list_sum(list_transform(generate_series(1, len(e.v)),
       |      j -> (e.v[j] - i.cv[j]) * (e.v[j] - i.cv[j])))), 5) AS dist
       |  FROM e CROSS JOIN init i),
       |asg0 AS (SELECT id, v, cell FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id ORDER BY dist ASC, cell ASC) AS rn FROM d0)
       |  WHERE rn = 1),
       |r AS (SELECT a.id, list_transform(generate_series(1, len(a.v)),
       |    p -> a.v[p] - i.cv[p]) AS r
       |  FROM asg0 a JOIN init i USING (cell)),
       |binit AS (SELECT row_number() OVER (
       |    ORDER BY md5('pq:' || CAST(id AS VARCHAR)), id) - 1 AS code, r
       |  FROM r ORDER BY md5('pq:' || CAST(id AS VARCHAR)), id LIMIT $nCodes),
       |jj AS (SELECT unnest(range(0, $m)) AS j),
       |b0 AS (SELECT jj.j, binit.code, list_transform(
       |    generate_series(1, $ds), p -> r[jj.j * $ds + p]) AS bv
       |  FROM binit CROSS JOIN jj),
       |rsub AS (SELECT id, jj.j, list_transform(
       |    generate_series(1, $ds), p -> r[jj.j * $ds + p]) AS rv
       |  FROM r CROSS JOIN jj),
       |cd0 AS (SELECT s.id, s.j, b.code, s.rv,
       |    round(sqrt(list_sum(list_transform(generate_series(1, $ds),
       |      p -> (s.rv[p] - b.bv[p]) * (s.rv[p] - b.bv[p])))), 5) AS dist
       |  FROM rsub s JOIN b0 b USING (j)),
       |ca0 AS (SELECT id, j, code, rv FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id, j ORDER BY dist ASC, code ASC) AS rn FROM cd0)
       |  WHERE rn = 1),
       |x AS (SELECT id % 2 AS batch, j, code,
       |    unnest(generate_series(1, $ds)) - 1 AS p,
       |    unnest(list_transform(rv,
       |      a -> CAST(round(a * 1e7, 0) AS DECIMAL(38,0)))) AS xi
       |  FROM ca0),
       |stb AS (SELECT batch, j, code, p, sum(xi) AS s, count(*) AS n
       |  FROM x GROUP BY batch, j, code, p),
       |sti AS (SELECT j, code, p, sum(s) AS s, sum(n) AS n
       |  FROM stb GROUP BY j, code, p),
       |sts AS (SELECT j, code, p, sum(xi) AS s, count(*) AS n
       |  FROM x GROUP BY j, code, p),
       |pp AS (SELECT unnest(generate_series(1, $ds)) - 1 AS p),
       |b1i AS (SELECT b.j, b.code, list(coalesce(
       |      round(CAST(t.s AS DOUBLE) / 1e7 / t.n, 7), b.bv[pp.p + 1])
       |    ORDER BY pp.p) AS bv
       |  FROM b0 b CROSS JOIN pp
       |  LEFT JOIN sti t ON t.j = b.j AND t.code = b.code AND t.p = pp.p
       |  GROUP BY b.j, b.code),
       |b1s AS (SELECT b.j, b.code, list(coalesce(
       |      round(CAST(t.s AS DOUBLE) / 1e7 / t.n, 7), b.bv[pp.p + 1])
       |    ORDER BY pp.p) AS bv
       |  FROM b0 b CROSS JOIN pp
       |  LEFT JOIN sts t ON t.j = b.j AND t.code = b.code AND t.p = pp.p
       |  GROUP BY b.j, b.code),
       |probes AS (SELECT id, j, rv FROM rsub WHERE id % $probeMod = 0),
       |di AS (SELECT s.id, s.j, b.code,
       |    round(sqrt(list_sum(list_transform(generate_series(1, $ds),
       |      p -> (s.rv[p] - b.bv[p]) * (s.rv[p] - b.bv[p])))), 5) AS dist
       |  FROM probes s JOIN b1i b USING (j)),
       |ai AS (SELECT id, j, code FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id, j ORDER BY dist ASC, code ASC) AS rn FROM di)
       |  WHERE rn = 1),
       |dx AS (SELECT s.id, s.j, b.code,
       |    round(sqrt(list_sum(list_transform(generate_series(1, $ds),
       |      p -> (s.rv[p] - b.bv[p]) * (s.rv[p] - b.bv[p])))), 5) AS dist
       |  FROM probes s JOIN b1s b USING (j)),
       |a2 AS (SELECT id, j, code FROM (SELECT *, row_number() OVER (
       |    PARTITION BY id, j ORDER BY dist ASC, code ASC) AS rn FROM dx)
       |  WHERE rn = 1)
       |SELECT ai.id AS vec_id, CAST(ai.j AS INTEGER) AS subspace,
       |  CAST(ai.code AS INTEGER) AS code_incr,
       |  CAST(a2.code AS INTEGER) AS code_scratch,
       |  CAST(ai.code = a2.code AS INTEGER) AS agree
       |FROM ai JOIN a2 ON ai.id = a2.id AND ai.j = a2.j""".stripMargin
  }
}
