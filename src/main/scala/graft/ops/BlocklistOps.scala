package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phrase-blocklist tagging (spam/boilerplate/NSFW screens): count
  * every blocklist phrase in every document in ONE text pass via the
  * native Aho–Corasick expression — at 10k phrases the per-phrase
  * regex/LIKE alternative is 10k corpus scans, this stays one. Pure
  * zero-shuffle projection; filters compose downstream.
  *
  * Matching is case-insensitive (the text lowercases before the walk;
  * phrases must already be lowercase) and counts ALL occurrences. For
  * phrases with no self-overlap (no proper prefix = suffix — true of
  * normal word phrases) that equals the non-overlapping count, which
  * is what the DuckDB oracle's regexp_extract_all can replay — the
  * default phrase set below keeps that property. A self-overlapping
  * phrase ("aaa") would count overlapping starts and drift from the
  * oracle, not from the documented semantics.
  */
object BlocklistOps {

  /** Boilerplate/spam screen phrases (lowercase, regex-safe, no
    * self-overlap): the C4/Gopher-adjacent "junk page" tells.
    */
  val DefaultPhrases: Seq[String] = Seq(
    "click here", "buy now", "subscribe", "free shipping",
    "limited time offer", "terms of service", "all rights reserved",
    "lorem ipsum", "cookies", "sign up")

  /** Per-doc: total hits, distinct phrases present, and the block
    * flag (`n_hits >= minHits`).
    */
  def tag(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String] = DefaultPhrases, minHits: Int = 3): DataFrame = {
    require(phrases.forall(p => p == p.toLowerCase),
      "blocklist phrases must be lowercase (text lowercases before the walk)")
    require(phrases.forall(!_.contains('\u0000')), "NUL in blocklist phrase")
    graft.functions.GraftFunctions.register(df.sparkSession)
    // null text scores as empty (zero counts), not null columns
    val counts = call_function("graft_blocklist_counts",
      lit(phrases.mkString("\u0000")),
      lower(coalesce(col(textCol), lit("")))).as("c")
    df.select(col(idCol).as("id"), counts)
      .select(col("id"),
        aggregate(col("c"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("c"), _ > 0L)).as("n_phrases"),
        (aggregate(col("c"), lit(0L), (a, x) => a + x) >= minHits)
          .cast("int").as("blocked"))
  }

  /** SQL expression for the total blocklist hit count of `textExpr` —
    * the composable fragment [[oracleSql]] and the q137 manifest
    * oracle share.
    */
  def hitsExprSql(textExpr: String,
      phrases: Seq[String] = DefaultPhrases): String =
    phrases.map { p =>
      require(!p.exists("\\.[](){}*+?^$|'".contains(_)),
        s"phrase not regex/SQL-safe: $p")
      s"len(regexp_extract_all(lower($textExpr), '$p'))"
    }.mkString(" + ")

  /** DuckDB oracle: per-phrase non-overlapping counts summed —
    * matches [[tag]] exactly for non-self-overlapping phrases.
    */
  def oracleSql(table: String, idCol: String, textCol: String,
      phrases: Seq[String] = DefaultPhrases, minHits: Int = 3): String = {
    val quoted = phrases.map { p =>
      require(!p.exists("\\.[](){}*+?^$|'".contains(_)),
        s"phrase not regex/SQL-safe: $p")
      p
    }
    val hits = quoted.map(p =>
      s"len(regexp_extract_all(lower($textCol), '$p'))").mkString(" + ")
    val nPat = quoted.map(p =>
      s"CASE WHEN len(regexp_extract_all(lower($textCol), '$p')) > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""SELECT $idCol AS id, CAST($hits AS BIGINT) AS n_hits,
       | CAST($nPat AS INTEGER) AS n_phrases,
       | CAST($hits >= $minHits AS INTEGER) AS blocked
       |FROM $table""".stripMargin
  }
}
