package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string joining — the entity-resolution /
  * dirty-key repair step a curation pipeline runs when joining
  * crawled metadata against a canonical table (titles, product
  * names, author strings) where keys carry typos.
  *
  * Reference has no counterpart (its joins are exact identity
  * tuples); this is LLM-pipeline surface alongside the dedup family.
  *
  * The ed<=1 join is EXACT via the deletion-neighborhood (SymSpell)
  * construction: two strings are within edit distance 1 iff they
  * share a member of their {self} ∪ {single-character deletions}
  * sets — a deletion of s equals t (deletion edit), s equals a
  * deletion of t (insertion), or deleting position i from both yields
  * the same string (substitution). The join is therefore a plain
  * EQUI-join on the variant signature (shuffle on signature strings,
  * map-side distinct), never a cartesian or a theta-join: at 100 TB
  * each side expands O(L) rows per key, skew concentrates only where
  * true near-duplicate mass exists, and the final `levenshtein`
  * verify restores exact precision (shared-variant false positives
  * are ed=2 pairs like "ab"/"ba").
  */
object FuzzyOps {

  /** {s} ∪ all single-character deletions of s, distinct. */
  private[graft] def delete1Variants(c: Column): Column =
    array_distinct(concat(array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1),
          c.substr(i + 1, length(c))))))

  /** Exact ed<=1 join: all (left, right) pairs whose name columns are
    * within Levenshtein distance 1. Output: (l_key, r_key, dist).
    */
  def editJoin1(left: DataFrame, lKey: String, lName: String,
      right: DataFrame, rKey: String, rName: String): DataFrame = {
    val lv = left.select(col(lKey).as("l_key"), col(lName).as("l_name"),
      explode(delete1Variants(col(lName))).as("sig"))
    val rv = right.select(col(rKey).as("r_key"), col(rName).as("r_name"),
      explode(delete1Variants(col(rName))).as("sig"))
    lv.join(rv, "sig")
      .select("l_key", "l_name", "r_key", "r_name").distinct()
      .filter(levenshtein(col("l_name"), col("r_name")) <= 1)
      .select(col("l_key"), col("r_key"),
        levenshtein(col("l_name"), col("r_name")).cast("int").as("dist"))
  }

  /** Deterministic dirty twin of a name column: delete the character
    * at position (key mod length) + 1. Shared between the q194 query
    * and its oracle so both engines corrupt identically.
    */
  def corruptName(key: Column, name: Column): Column = {
    val pos = pmod(key, length(name)) + 1
    concat(name.substr(lit(1), pos - 1), name.substr(pos + 1, length(name)))
  }

  /** DuckDB twin of the q194 pipeline: brute-force ground truth —
    * every (dirty, clean) pair at levenshtein <= 1 (with the same
    * length-difference prefilter to keep the quadratic tractable at
    * oracle scale). Exactness of the SymSpell construction is what
    * makes engine == brute force.
    */
  def editJoin1OracleSql(table: String, keyCol: String, nameCol: String,
      dirtyPred: String): String =
    s"""WITH dirty AS (
       |  SELECT $keyCol AS l_key,
       |    substr($nameCol, 1, CAST($keyCol % length($nameCol) AS INT))
       |      || substr($nameCol, CAST($keyCol % length($nameCol) AS INT) + 2)
       |      AS l_name
       |  FROM $table WHERE $dirtyPred),
       |clean AS (SELECT $keyCol AS r_key, $nameCol AS r_name FROM $table)
       |SELECT l_key, r_key,
       |  CAST(levenshtein(l_name, r_name) AS INT) AS dist
       |FROM dirty, clean
       |WHERE abs(length(l_name) - length(r_name)) <= 1
       |  AND levenshtein(l_name, r_name) <= 1""".stripMargin

  /** Best-match fuzzy linkage by Jaro–Winkler (the graded-similarity
    * companion of [[editJoin1]]'s boolean ed<=1 join): each dirty
    * record (the [[corruptName]] twin of rows matching `dirtyPred`)
    * is scored against every DISTINCT clean name within a length
    * band of ±2 — classic length blocking: |JW length gap| bounds
    * similarity, so far bands can't win — and the argmax is taken on
    * the 6dp-ROUNDED score with min-name tiebreak, so the winner is
    * engine-exact even where two candidates sit an ulp apart.
    *
    * Uses the native `graft_jaro_winkler` expression (codegen,
    * byte-exact vs DuckDB's builtin). Scale shape: dirty × distinct
    * clean names is an equi-join on the length-band key (each dirty
    * row joins ~|names within ±2 of its length|, never the corpus),
    * then one per-key argmax aggregation.
    *
    * @return (l_key, l_name, best_name, best_jw, n_cands)
    */
  def jwBestMatch(df: DataFrame, keyCol: String, nameCol: String,
      dirtyPred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(df.sparkSession)
    val dirty = df.filter(dirtyPred)
      .select(col(keyCol).as("l_key"),
        corruptName(col(keyCol), col(nameCol)).as("l_name"))
    val clean = df.select(col(nameCol).as("r_name")).distinct()
    val pairs = dirty.join(clean,
        abs(length(col("l_name")) - length(col("r_name"))) <= 2)
      .select(col("l_key"), col("l_name"), col("r_name"),
        round(call_function("graft_jaro_winkler", col("l_name"),
          col("r_name")), 6).as("jw"))
    val w = Window.partitionBy("l_key")
      .orderBy(col("jw").desc, col("r_name").asc)
    pairs
      .select(col("l_key"), col("l_name"), col("r_name"), col("jw"),
        row_number().over(w).as("rk"),
        count(lit(1)).over(Window.partitionBy("l_key")).as("n_cands"))
      .where(col("rk") === 1)
      .select(col("l_key"), col("l_name"),
        col("r_name").as("best_name"), col("jw").as("best_jw"),
        col("n_cands"))
  }

  /** DuckDB replay of [[jwBestMatch]] (its builtin
    * jaro_winkler_similarity is the byte-exact reference the native
    * expression was pinned against).
    */
  def jwBestMatchOracleSql(table: String, keyCol: String,
      nameCol: String, dirtyPred: String): String =
    s"""WITH dirty AS (SELECT $keyCol AS l_key,
       |    substr($nameCol, 1, CAST($keyCol % length($nameCol) AS INT))
       |      || substr($nameCol, CAST($keyCol % length($nameCol) AS INT) + 2)
       |      AS l_name
       |  FROM $table WHERE $dirtyPred),
       |clean AS (SELECT DISTINCT $nameCol AS r_name FROM $table),
       |pairs AS (SELECT l_key, l_name, r_name,
       |    round(jaro_winkler_similarity(l_name, r_name), 6) AS jw
       |  FROM dirty JOIN clean
       |    ON abs(length(l_name) - length(r_name)) <= 2),
       |rk AS (SELECT *,
       |    row_number() OVER (PARTITION BY l_key
       |      ORDER BY jw DESC, r_name ASC) AS rk,
       |    count(*) OVER (PARTITION BY l_key) AS n_cands
       |  FROM pairs)
       |SELECT l_key, l_name, r_name AS best_name, jw AS best_jw,
       |  CAST(n_cands AS BIGINT) AS n_cands
       |FROM rk WHERE rk = 1""".stripMargin

  /** Fellegi–Sunter (1969) record-linkage weight estimation with
    * KNOWN labels: a deterministic dirty twin of every record
    * (brand mutated on key%5=0, type on key%7=0, name corrupted on
    * key%3=0) is compared against every clean record in its
    * `blockCol` block; the (brand, type, name) agreement PATTERN of
    * each pair is tallied separately over true matches (same key)
    * and non-matches, giving the m- and u-probabilities and the
    * pattern's log2 match weight — the table a production linker
    * thresholds against.
    *
    * Exact: counts are longs; each probability and the weight's
    * argument are single IEEE operations on exact longs
    * (n·U, n·M ≪ 2^53). Scale shape: one equi-join on the block key
    * (fan-out = block size, the linkage literature's standard
    * control), one 8-row aggregation.
    *
    * @return per observed pattern: (ab, at, an, n_match, n_unmatch,
    *         m_prob, u_prob, log2_w) — weight NULL if either side
    *         has zero mass
    */
  def fellegiSunter(df: DataFrame, keyCol: String, blockCol: String,
      brandCol: String, typeCol: String, nameCol: String): DataFrame = {
    val key = col(keyCol)
    // floor the probe side: the block join fans each dirty row out
    // against its whole block, and a single-split scan runs that
    // entire pair evaluation in one task (measured 1.3 s of q312's
    // 1.8 s warm in one task); no-op at real scale
    val dirty = SkewOps.parallelismFloor(df.select(key.as("d_key"), col(blockCol).as("blk"),
      when(pmod(key, lit(5L)) === 0, lit("Brand#MUTATED"))
        .otherwise(col(brandCol)).as("d_brand"),
      when(pmod(key, lit(7L)) === 0, lit("MUTATED"))
        .otherwise(col(typeCol)).as("d_type"),
      when(pmod(key, lit(3L)) === 0,
        corruptName(key, col(nameCol))).otherwise(col(nameCol))
        .as("d_name")))
    val clean = df.select(col(keyCol).as("c_key"),
      col(blockCol).as("blk"), col(brandCol).as("c_brand"),
      col(typeCol).as("c_type"), col(nameCol).as("c_name"))
    val pat = dirty.join(clean, Seq("blk"))
      .select((col("d_brand") === col("c_brand")).cast("int").as("ab"),
        (col("d_type") === col("c_type")).cast("int").as("at"),
        (col("d_name") === col("c_name")).cast("int").as("an"),
        (col("d_key") === col("c_key")).as("is_match"))
      .groupBy("ab", "at", "an")
      .agg(sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"),
        sum(when(!col("is_match"), 1L).otherwise(0L)).as("n_unmatch"))
    val tot = pat.agg(sum("n_match").as("tm"), sum("n_unmatch").as("tu"))
    pat.crossJoin(broadcast(tot)).select(col("ab"), col("at"), col("an"),
      col("n_match"), col("n_unmatch"),
      round(col("n_match").cast("double") / col("tm").cast("double"), 6)
        .as("m_prob"),
      round(col("n_unmatch").cast("double") / col("tu").cast("double"), 6)
        .as("u_prob"),
      round(when(col("n_match") === 0 || col("n_unmatch") === 0,
          lit(null).cast("double"))
        .otherwise(log2((col("n_match").cast("double") * col("tu"))
          / (col("n_unmatch").cast("double") * col("tm")))), 6)
        .as("log2_w"))
  }

  /** DuckDB replay of [[fellegiSunter]]. */
  def fellegiSunterOracleSql(table: String, keyCol: String,
      blockCol: String, brandCol: String, typeCol: String,
      nameCol: String): String =
    s"""WITH dirty AS (SELECT $keyCol AS d_key, $blockCol AS blk,
       |    CASE WHEN $keyCol % 5 = 0 THEN 'Brand#MUTATED'
       |      ELSE $brandCol END AS d_brand,
       |    CASE WHEN $keyCol % 7 = 0 THEN 'MUTATED'
       |      ELSE $typeCol END AS d_type,
       |    CASE WHEN $keyCol % 3 = 0 THEN
       |      substr($nameCol, 1, CAST($keyCol % length($nameCol) AS INT))
       |        || substr($nameCol,
       |          CAST($keyCol % length($nameCol) AS INT) + 2)
       |      ELSE $nameCol END AS d_name
       |  FROM $table),
       |clean AS (SELECT $keyCol AS c_key, $blockCol AS blk,
       |    $brandCol AS c_brand, $typeCol AS c_type, $nameCol AS c_name
       |  FROM $table),
       |pat AS (SELECT
       |    CAST(d_brand = c_brand AS INT) AS ab,
       |    CAST(d_type = c_type AS INT) AS at,
       |    CAST(d_name = c_name AS INT) AS an,
       |    CAST(sum(CASE WHEN d_key = c_key THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_match,
       |    CAST(sum(CASE WHEN d_key = c_key THEN 0 ELSE 1 END)
       |      AS BIGINT) AS n_unmatch
       |  FROM dirty JOIN clean USING (blk) GROUP BY 1, 2, 3),
       |tot AS (SELECT CAST(sum(n_match) AS BIGINT) AS tm,
       |    CAST(sum(n_unmatch) AS BIGINT) AS tu FROM pat)
       |SELECT ab, at, an, n_match, n_unmatch,
       |  round(CAST(n_match AS DOUBLE) / CAST(tm AS DOUBLE), 6) AS m_prob,
       |  round(CAST(n_unmatch AS DOUBLE) / CAST(tu AS DOUBLE), 6) AS u_prob,
       |  CASE WHEN n_match = 0 OR n_unmatch = 0 THEN NULL ELSE
       |    round(log2((CAST(n_match AS DOUBLE) * tu)
       |      / (CAST(n_unmatch AS DOUBLE) * tm)), 6) END AS log2_w
       |FROM pat CROSS JOIN tot""".stripMargin
}
