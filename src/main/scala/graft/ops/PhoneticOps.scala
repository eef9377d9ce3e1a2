package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** American Soundex as a pure expression chain — the classic phonetic
  * BLOCKING key for record linkage (names that sound alike land in
  * one block; the expensive pair scorer then runs inside blocks
  * only). Spelled as the identical regexp/substr pipeline in Spark
  * and in the DuckDB oracle — RE2-safe: run collapsing uses one
  * replace per digit class instead of backreferences, which RE2
  * doesn't support.
  *
  * Steps (h/w transparent, vowels separate, standard Soundex):
  *   1. uppercase, strip non-letters
  *   2. drop H/W everywhere but position 1 (they never break a run)
  *   3. map classes to digits, vowels to the separator 0
  *   4. collapse same-digit runs (vowel 0s still present = runs
  *      broken across vowels count twice, the Soundex rule)
  *   5. drop the leading run (the first letter's own code), drop 0s,
  *      keep 3 digits zero-padded, prefix the saved first letter
  */
object PhoneticOps {

  /** Soundex code of `name` (empty string for letterless input). */
  def soundex(name: Column): Column = {
    val letters = regexp_replace(upper(name), "[^A-Z]", "")
    val hw = concat(substring(letters, 1, 1),
      regexp_replace(substring(letters, 2, 1000000), "[HW]", ""))
    val coded = Seq("[BFPV]" -> "1", "[CGJKQSXZ]" -> "2", "[DT]" -> "3",
      "L" -> "4", "[MN]" -> "5", "R" -> "6", "[AEIOUY]" -> "0")
      .foldLeft(hw) { case (c, (p, r)) => regexp_replace(c, p, r) }
    val collapsed = (0 to 6).map(_.toString)
      .foldLeft(coded)((c, d) => regexp_replace(c, s"$d$d+", d))
    val digits = regexp_replace(
      regexp_replace(collapsed, "^.", ""), "0", "")
    when(length(letters) === 0, lit(""))
      .otherwise(concat(substring(letters, 1, 1),
        rpad(substring(digits, 1, 3), 3, "0")))
  }

  /** The same chain as DuckDB SQL over `nameExpr`. */
  def soundexSql(nameExpr: String): String = {
    val letters = s"regexp_replace(upper($nameExpr), '[^A-Z]', '', 'g')"
    val hw = s"substr($letters, 1, 1) || " +
      s"regexp_replace(substr($letters, 2), '[HW]', '', 'g')"
    val coded = Seq("[BFPV]" -> "1", "[CGJKQSXZ]" -> "2", "[DT]" -> "3",
      "L" -> "4", "[MN]" -> "5", "R" -> "6", "[AEIOUY]" -> "0")
      .foldLeft(hw) { case (c, (p, r)) =>
        s"regexp_replace($c, '$p', '$r', 'g')" }
    val collapsed = (0 to 6).map(_.toString)
      .foldLeft(coded)((c, d) => s"regexp_replace($c, '$d$d+', '$d', 'g')")
    val digits =
      s"regexp_replace(regexp_replace($collapsed, '^.', ''), '0', '', 'g')"
    s"CASE WHEN length($letters) = 0 THEN '' ELSE " +
      s"substr($letters, 1, 1) || rpad(substr($digits, 1, 3), 3, '0') END"
  }

  /** Blocking-recall audit of Soundex under single-character
    * deletion: for every record the [[FuzzyOps.corruptName]] twin is
    * re-coded, and per first letter we report how often the corrupted
    * name still lands in the clean name's phonetic block — the
    * measured recall a linker trades against block size.
    *
    * @return (first_letter, n, n_same_block, recall)
    */
  def soundexBlockRecall(df: DataFrame, keyCol: String,
      nameCol: String): DataFrame = {
    val dirty = FuzzyOps.corruptName(col(keyCol), col(nameCol))
    df.select(upper(substring(col(nameCol), 1, 1)).as("first_letter"),
        (soundex(col(nameCol)) === soundex(dirty)).cast("long").as("same"))
      .groupBy("first_letter")
      .agg(count(lit(1)).as("n"), sum("same").as("n_same_block"))
      .select(col("first_letter"), col("n"), col("n_same_block"),
        round(col("n_same_block").cast("double") / col("n").cast("double"),
          6).as("recall"))
  }

  /** DuckDB replay of [[soundexBlockRecall]]. */
  def soundexBlockRecallOracleSql(table: String, keyCol: String,
      nameCol: String): String = {
    val dirty = s"substr($nameCol, 1, CAST($keyCol % length($nameCol)" +
      s" AS INT)) || substr($nameCol, CAST($keyCol % length($nameCol)" +
      s" AS INT) + 2)"
    s"""WITH b AS (SELECT upper(substr($nameCol, 1, 1)) AS first_letter,
       |    CASE WHEN ${soundexSql(nameCol)} = ${soundexSql(dirty)}
       |      THEN 1 ELSE 0 END AS same
       |  FROM $table)
       |SELECT first_letter, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(same) AS BIGINT) AS n_same_block,
       |  round(CAST(sum(same) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM b GROUP BY first_letter""".stripMargin
  }
}
