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
}
