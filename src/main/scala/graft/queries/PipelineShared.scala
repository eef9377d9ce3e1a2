package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared fixtures, memoized stages and oracle-SQL builders for
  * the Pipeline* family objects (formerly PipelineQueries' private
  * header — package-private so every family file keeps referencing
  * them unqualified via `import PipelineShared._`).
  */
private[queries] object PipelineShared {
  type Q = (SparkSession, String) => DataFrame

  /** q159's injected-corpus containment pair frame, computed ONCE per
    * application+corpus and localCheckpointed (pair-cardinality, never
    * corpus text): the %211/%223 injection is deterministic per dir,
    * so warm runs serve a threshold filter instead of rebuilding the
    * winnow funnel + gram-set verify (~3s at sf0.1 per invocation).
    * Computed at minContainment = 0.0 so any consumer threshold is a
    * filter on the already-5dp-rounded cont columns.
    */
  val containmentCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
  def containmentStage(s: SparkSession, d: String): DataFrame =
    containmentCache.computeIfAbsent((s.sparkContext.applicationId, d),
      new java.util.function.Function[(String, String), DataFrame] {
        override def apply(ignored: (String, String)): DataFrame = {
          val p = "the quarterly compliance digest reproduces member submissions verbatim in the appendix section for archival reference purposes"
          val t = when(col("doc_id") % 211 === 0, lit(p))
            .when(col("doc_id") % 223 === 0, concat(lit(p), lit(" "), col("text")))
            .otherwise(col("text"))
          WinnowOps.containmentPairs(
            Tables(s, d, "documents").withColumn("text", t),
            "doc_id", "text", minContainment = 0.0).localCheckpoint()
        }
      })

  /** q68/q69 parameters, shared between the Spark queries and their
    * DuckDB oracles (thresholds are embedded as hex strings so both
    * engines compare the identical md5 coordinate).
    */
  val MixtureFractions =
    Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.1)
  val SplitSpec =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** q81/q82 input: the documents table has no URL column, so both
    * engines synthesize the SAME deterministic messy URLs from doc_id
    * (templates shared between the Spark expression and the oracle
    * CASE — one spec, no drift) and the normalization/quota rules are
    * what gets value-checked.
    */
  val UrlTemplates = Seq(
    "HTTPS://WWW.Example{K}.CO.UK:443/Path/To/{ID}/?utm_source=feed&id={ID}&fbclid=abc#frag",
    "http://example{K}.com:80/a//b/",
    "https://Sub.Domain.Example{K}.COM/path?ref=tw&q=x&utm_campaign=c",
    "ftp://Files.example{K}.org:21/pub/",
    "https://example{K}.com",
    "not a url {ID}")

  def fillTemplate(t: String, id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(t.split("(?=\\{)|(?<=\\})").map {
      case "{K}" => (id % 20).cast("string")
      case "{ID}" => id.cast("string")
      case s => lit(s)
    }.toIndexedSeq: _*)

  def messyUrl(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val m = (id % 6).cast("int")
    UrlTemplates.zipWithIndex.dropRight(1)
      .foldRight(fillTemplate(UrlTemplates.last, id)) { case ((t, i), acc) =>
        when(m === i, fillTemplate(t, id)).otherwise(acc)
      }
  }

  /** Shared q80/q85 oracle prelude: BPE-encode every document through
    * a recursive CTE replaying the frozen merge table (interpolated
    * from the SAME constants the Spark expression ships — the engines
    * cannot drift). Ends with `agg(doc_id, n_bpe_tokens, toks)`.
    */
  def bpeCteSql: String = {
    // pair → rank map literal, first-occurrence-wins on duplicate
    // pairs (mirrors BpeModel.ranks); symbols never contain spaces,
    // so 'a b' keys are unambiguous. Quotes escaped for SQL.
    val dd = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      graft.ops.BpeOps.DefaultMerges.zipWithIndex.flatMap {
        case ((a, b), r) =>
          val k = s"$a $b"
          if (seen.add(k)) Some((r, k)) else None
      }
    }
    val keys = dd.map { case (_, k) => "'" + k.replace("'", "''") + "'" }
      .mkString(", ")
    val rks = dd.map(_._1).mkString(", ")
    // The recursion steps by MERGE, not by rank: each step finds the
    // lowest applicable rank >= the last applied rank (the sweep
    // never revisits a passed rank) and merges its leftmost
    // occurrence; a word with no applicable rank left is emitted once
    // under a sentinel rank and stops recursing. Depth is therefore
    // O(merges actually applied per word) + 1, independent of the
    // model size — the previous rank-by-rank form paid one iteration
    // per RANK per word (measured 22s vs 0.26s on sf0.01 at 89
    // ranks; at a production-sized table it would never finish).
    val SENT = Int.MaxValue
    s"""WITH RECURSIVE
       |mm AS (SELECT MAP([$keys], [$rks]) AS m),
       |w AS (SELECT doc_id,
       |  list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ws
       | FROM documents),
       |wn AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS wi, ws FROM w),
       |wd AS (SELECT doc_id, CAST(wi AS INTEGER) AS wi,
       |  list_transform(generate_series(1, len(ws[wi])), i -> ws[wi][i]) AS s
       | FROM wn),
       |enc (doc_id, wi, s, r) AS (
       |  SELECT doc_id, wi, s, 0 AS r FROM wd
       |  UNION ALL
       |  SELECT doc_id, wi,
       |    CASE WHEN rmin IS NULL THEN s
       |         ELSE s[1:p-1] || [s[p] || s[p+1]] || s[p+2:] END AS s,
       |    CASE WHEN rmin IS NULL THEN $SENT ELSE rmin END AS r
       |  FROM (
       |    SELECT t.doc_id, t.wi, t.s, t.rmin,
       |      list_filter(generate_series(1, len(t.s) - 1),
       |        i -> t.m2[t.s[i] || ' ' || t.s[i+1]][1] = t.rmin)[1] AS p
       |    FROM (
       |      SELECT e.doc_id, e.wi, e.s, mm.m AS m2,
       |        list_aggregate(list_transform(generate_series(1, len(e.s) - 1),
       |          i -> CASE WHEN mm.m[e.s[i] || ' ' || e.s[i+1]][1] >= e.r
       |               THEN mm.m[e.s[i] || ' ' || e.s[i+1]][1] END), 'min') AS rmin
       |      FROM enc e, mm
       |      WHERE e.r <> $SENT) t) u),
       |fin AS (SELECT doc_id, wi, s FROM enc WHERE r = $SENT),
       |agg AS (SELECT doc_id, CAST(sum(len(s)) AS INTEGER) AS n_bpe_tokens,
       |  string_agg(array_to_string(s, ' '), ' ' ORDER BY wi) AS toks
       | FROM fin GROUP BY doc_id)""".stripMargin
  }

  /** The quality-scorer oracle parameterized by its weight vector —
    * one SQL template for the hand-tuned (q79) and IRLS-trained (q95)
    * scorers; a drift between the two oracles would hide a drift
    * between the two scorers. Weight literals are ::DOUBLE-cast: bare
    * decimal literals are DECIMAL in DuckDB and would change the
    * arithmetic vs Spark.
    */
  /** C4/Gopher rules replay (sig → r → pr-with-`passes` CTE chain)
    * over a prior CTE `docsCte` providing (doc_id, t). Shared by the
    * q112 oracle (injected text) and the q157 kappa oracle (plain
    * text). Plain (non-interpolated) string: the regex `\t`/`\.`
    * escapes must reach DuckDB verbatim. */
  def rulesOracleBody(docsCte: String): String =
    """sig AS (SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[^ \t\n\f\r]+')) AS BIGINT) AS n_words,
      |  round(length(regexp_replace(t, '[ \t\n\f\r]', '', 'g')) * 1.0
      |    / greatest(len(regexp_extract_all(t, '[^ \t\n\f\r]+')), 1), 4)
      |    AS mean_word_len,
      |  round((len(regexp_extract_all(t, '#'))
      |    + len(regexp_extract_all(t, '\.\.\.'))
      |    + len(regexp_extract_all(t, '…'))) * 1.0
      |    / greatest(len(regexp_extract_all(t, '[^ \t\n\f\r]+')), 1), 5)
      |    AS symbol_ratio,
      |  round(len(list_filter(string_split(t, chr(10)),
      |      x -> regexp_matches(x, '^[-*•] '))) * 1.0
      |    / greatest(len(string_split(t, chr(10))), 1), 5)
      |    AS bullet_line_frac,
      |  round(len(list_filter(string_split(t, chr(10)),
      |      x -> regexp_matches(x, '(\.\.\.|…)$'))) * 1.0
      |    / greatest(len(string_split(t, chr(10))), 1), 5)
      |    AS ellipsis_line_frac,
      |  round(len(list_filter(regexp_extract_all(lower(t), '[^ \t\n\f\r]+'),
      |      x -> regexp_matches(x, '[a-z]'))) * 1.0
      |    / greatest(len(regexp_extract_all(t, '[^ \t\n\f\r]+')), 1), 5)
      |    AS alpha_word_frac,
      |  CAST(len(regexp_extract_all(lower(t), '\b(the|a|of|to|and)\b'))
      |    AS BIGINT) AS n_stop_hits,
      |  contains(lower(t), 'lorem ipsum') AS has_lorem,
      |  contains(t, '{') AS has_brace
      | FROM __DOCS__),
      |r AS (SELECT doc_id, n_words, mean_word_len, symbol_ratio,
      |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits,
      |  CAST(n_words >= 10 AND n_words <= 100000 AS INT) AS r_len,
      |  CAST(mean_word_len >= 2.0 AND mean_word_len <= 12.0 AS INT)
      |    AS r_word_len,
      |  CAST(symbol_ratio <= 0.1 AS INT) AS r_symbol,
      |  CAST(bullet_line_frac <= 0.9 AS INT) AS r_bullet,
      |  CAST(ellipsis_line_frac <= 0.3 AS INT) AS r_ellipsis,
      |  CAST(alpha_word_frac >= 0.8 AS INT) AS r_alpha,
      |  CAST(n_stop_hits >= 2 AS INT) AS r_stop,
      |  CAST(NOT has_lorem AND NOT has_brace AS INT) AS r_clean
      | FROM sig),
      |pr AS (SELECT *, CAST(r_len + r_word_len + r_symbol + r_bullet + r_ellipsis
      |  + r_alpha + r_stop + r_clean = 8 AS INT) AS passes FROM r)
      |""".stripMargin.replace("__DOCS__", docsCte)

  def qualityOracleSql(qw: graft.ops.TextOps.QualityWeights): String = {
    // valueOf uses Double.toString's shortest form — round-trips to
    // the identical double when DuckDB parses it back
    def d(v: Double) = java.math.BigDecimal.valueOf(v).toPlainString + "::DOUBLE"
    s"""WITH f AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS w,
       |  len(regexp_extract_all(text, '\\S+')) AS toks FROM documents),
       |s AS (SELECT doc_id,
       |  ${d(qw.bias)} + toks * ${d(qw.perToken)}
       |  + (len(regexp_extract_all(text, '[.,;:!?]')) * 1.0::DOUBLE
       |     / greatest(length(text), 1)) * ${d(qw.punctRatio)}
       |  + (len(regexp_extract_all(lower(text), '\\b(the|a|of|to|and)\\b')) * 1.0::DOUBLE
       |     / greatest(toks, 1)) * ${d(qw.stopRatio)}
       |  + (length(regexp_replace(text, '[ \\t\\n\\f\\r]', '', 'g')) * 1.0::DOUBLE
       |     / greatest(toks, 1)) * ${d(qw.avgTokenLen)}
       |  + (CASE WHEN len(w) >= 2
       |      THEN 1.0::DOUBLE - len(list_distinct(list_transform(
       |        generate_series(1, len(w) - 1), i -> w[i] || ' ' || w[i+1])))
       |        * 1.0::DOUBLE / (len(w) - 1)
       |      ELSE 0.0::DOUBLE END) * ${d(qw.dup2gramFrac)} AS z
       | FROM f)
       |SELECT doc_id, round(1.0::DOUBLE / (1.0::DOUBLE + exp(-z)), 5) AS quality
       |FROM s""".stripMargin
  }

  /** q96's oracle, generated FROM the frozen profile constants
    * (LangNgram.merged/floors) — the weights appear as a VALUES
    * literal, so profile and oracle cannot drift apart. Integer
    * scores make the grouped sum order-independent; every engine
    * computes the identical BIGINT.
    */
  /** The q243 span-perplexity CTE chain: sentence-span split over the
    * (doc_id, text) relation `spanSrc`, per-span KN scoring against
    * the shared model prefix (`LmOps.knOracleWith` must precede), and
    * the per-doc retention aggregate `g` (n_spans/n_scored/n_kept at
    * the 6.0 threshold + kept-sum `s`). Reused by q243 and the q251
    * composition.
    */
  def spanPplCtes(spanSrc: String): String =
    s""",
       |sp AS (SELECT doc_id, doc_id * 100000 + i - 1 AS id, span FROM (
       |  SELECT doc_id, unnest(sf) AS span,
       |    unnest(generate_series(1, len(sf))) AS i FROM (
       |   SELECT doc_id, list_filter(string_split(regexp_replace(
       |     coalesce(text, ''), '([.!?])[ \\t\\n\\f\\r]+', '\\1' || chr(1), 'g'),
       |     chr(1)), x -> length(x) > 0) AS sf
       |   FROM $spanSrc))),
       |stk AS (SELECT id, list_filter(string_split_regex(lower(span),
       |    '[ \\t\\n\\f\\r]+'), x -> x <> '') AS t FROM sp),
       |spos AS (SELECT id, unnest(generate_series(1, len(t) - 1)) AS i, t
       |         FROM stk WHERE len(t) >= 2),
       |sbg AS (SELECT id, t[i] AS a, t[i+1] AS b FROM spos),
       |sc AS (SELECT id,
       |  round(avg(-ln(CASE WHEN heads.c_a IS NULL
       |    THEN CAST(coalesce(conts.n1p_back, 0) + 1 AS DOUBLE) / (bt + vc + 1)
       |    ELSE greatest(CAST(coalesce(cab.c_ab, 0) AS DOUBLE) - 0.75, 0.0) / c_a
       |      + 0.75 * n1p_fwd / c_a
       |        * (CAST(coalesce(conts.n1p_back, 0) + 1 AS DOUBLE) / (bt + vc + 1))
       |    END)), 5) AS kn_logppl
       | FROM sbg LEFT JOIN cab USING (a, b) LEFT JOIN heads USING (a)
       |      LEFT JOIN conts USING (b), scalars
       | GROUP BY id),
       |jppl AS (SELECT sp.doc_id, sc.kn_logppl
       |  FROM sp LEFT JOIN sc ON sp.id = sc.id),
       |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN kn_logppl IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_scored,
       |  CAST(sum(CASE WHEN kn_logppl <= 6.0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  sum(CASE WHEN kn_logppl <= 6.0
       |    THEN CAST(kn_logppl AS DECIMAL(18,5)) END) AS s
       | FROM jppl GROUP BY doc_id)""".stripMargin

  def langNgramOracleSql: String = {
    val L = graft.ops.LangNgram
    langProfileOracleSql(L.langs, L.merged, L.floors, L.mergedUni,
      L.sharedUniFloor)
  }

  /** The q96/q102 oracle shape for ANY (langs, weights, floors) model —
    * q96 instantiates it with the compile-time LangNgram constants,
    * q102 with the loaded wide profile table's model.
    */
  def langProfileOracleSql(langsIn: Seq[String],
      merged: java.util.HashMap[String, Array[Long]],
      floors: Array[Long],
      mergedUni: java.util.HashMap[Character, Array[Long]],
      uniFloor: Long,
      // (doc_id, text) source relation — q96 scores whole documents,
      // q240 feeds sentence SPANS keyed doc_id*100000+idx through the
      // same profile replay
      srcSql: String = "SELECT doc_id, text FROM documents"): String = {
    val langs = langsIn
    import scala.jdk.CollectionConverters._
    def esc(s: String) = s.replace("'", "''")
    val cols = langs.map(l => s"w_$l").mkString(", ")
    val values = merged.asScala.toSeq.sortBy(_._1).map { case (t, ws) =>
      s"('${esc(t)}', ${ws.mkString(", ")})"
    }.mkString(",\n ")
    val uniValues = mergedUni.asScala.toSeq.sortBy(_._1).map { case (c, ws) =>
      s"('${esc(c.toString)}', ${ws.mkString(", ")})"
    }.mkString(",\n ")
    val sums = langs.zip(floors).map { case (l, f) =>
      s"CAST(sum(coalesce(w_$l, $f)) AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
    val uniSums = langs.map { l =>
      s"CAST(sum(coalesce(w_$l, $uniFloor)) AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
    val fills = langs.map(l =>
      s"coalesce(t3.s_$l, CAST(0 AS BIGINT)) + coalesce(u1.s_$l, CAST(0 AS BIGINT)) AS s_$l")
      .mkString(",\n  ")
    val pred = langs.zipWithIndex.map { case (l, i) =>
      val laters = langs.drop(i + 1)
      if (laters.isEmpty) s"ELSE '$l' END"
      else s"WHEN ${laters.map(o => s"s_$l >= s_$o").mkString(" AND ")} THEN '$l'"
    }.mkString("CASE ", " ", "")
    s"""WITH src AS ($srcSql),
       |docs AS (SELECT doc_id,
       |  trim(regexp_replace(lower(coalesce(text, '')), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS t
       | FROM src),
       |pos AS (SELECT doc_id, t,
       |  unnest(range(1, greatest(length(t) - 1, 1))) AS i FROM docs),
       |tri AS (SELECT doc_id, substring(t, CAST(i AS INTEGER), 3) AS tri FROM pos),
       |prof (tri, $cols) AS (VALUES
       | $values),
       |sc AS (SELECT doc_id,
       |    $sums
       |  FROM tri LEFT JOIN prof USING (tri) GROUP BY doc_id),
       |upos AS (SELECT doc_id,
       |  substring(t, CAST(unnest(range(1, length(t) + 1)) AS INTEGER), 1) AS ch
       | FROM docs),
       |uch AS (SELECT doc_id, ch FROM upos WHERE unicode(ch) > 127),
       |uprof (ch, $cols) AS (VALUES
       | $uniValues),
       |usc AS (SELECT doc_id,
       |    $uniSums
       |  FROM uch LEFT JOIN uprof USING (ch) GROUP BY doc_id),
       |f AS (SELECT d.doc_id,
       |  $fills
       |  FROM docs d LEFT JOIN sc t3 ON d.doc_id = t3.doc_id
       |  LEFT JOIN usc u1 ON d.doc_id = u1.doc_id)
       |SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
       |  $pred AS lang_pred
       |FROM f""".stripMargin
  }

  /** q240 oracle: sentence-span extraction (composite span key
    * doc_id·100000 + idx — safe: a span per ~4 chars would need a
    * 400k-char doc to collide), the q96 profile replay over spans,
    * then the per-doc majority/mixture aggregation with the engine's
    * (count desc, profile order asc) tie-break.
    */
  def spanLangOracleSql: String = {
    val L = graft.ops.LangNgram
    val spanSrc =
      """SELECT doc_id * 100000 + i - 1 AS doc_id, span AS text FROM (
        | SELECT doc_id, unnest(sf) AS span,
        |   unnest(generate_series(1, len(sf))) AS i FROM (
        |  SELECT doc_id, list_filter(string_split(regexp_replace(
        |    coalesce(text, ''), '([.!?])[ \t\n\f\r]+', '\1' || chr(1), 'g'),
        |    chr(1)), x -> length(x) > 0) AS sf
        |  FROM documents))""".stripMargin
    val spanPred = langProfileOracleSql(L.langs, L.merged, L.floors,
      L.mergedUni, L.sharedUniFloor, srcSql = spanSrc)
    val ord = L.langs.zipWithIndex.map { case (l, i) =>
      s"WHEN '$l' THEN $i"
    }.mkString("CASE lang_pred ", " ", s" ELSE ${L.langs.size} END")
    s"""WITH sp AS ($spanPred),
       |m AS (SELECT doc_id // 100000 AS doc_id, lang_pred FROM sp),
       |g AS (SELECT doc_id, lang_pred, count(*) AS n FROM m GROUP BY 1, 2),
       |r AS (SELECT doc_id, lang_pred, n,
       |   row_number() OVER (PARTITION BY doc_id
       |     ORDER BY n DESC, $ord ASC) AS rn,
       |   sum(n) OVER (PARTITION BY doc_id) AS ns,
       |   count(*) OVER (PARTITION BY doc_id) AS nl
       | FROM g)
       |SELECT doc_id, CAST(ns AS BIGINT) AS n_spans,
       |  CAST(nl AS BIGINT) AS n_langs, lang_pred AS lang_major,
       |  round(n * 1.0::DOUBLE / ns, 6) AS major_frac,
       |  CAST(nl > 1 AS INT) AS mixed
       |FROM r WHERE rn = 1""".stripMargin
  }

  def langWideOracleSql: String = {
    val m = graft.ops.LangProfiles.wideModel
    langProfileOracleSql(m.langs, m.tri, m.triFloors, m.uni, m.uniFloor)
  }

  /** Ground truth for the image round-trip oracles: the same dims and
    * per-channel affine pixel formulas as MultimodalOps.syntheticImage
    * / pxR/pxG/pxB — PNG is lossless, so decoded pixels must equal
    * the formula exactly. Two STAGED unnests build the (x, y) grid
    * (unnests in one SELECT zip instead of crossing).
    */
  def imagePxCte: String =
    """WITH d AS (SELECT doc_id,
      |  (doc_id % 3 + 1) * 8 AS w, ((doc_id // 3) % 3 + 1) * 8 AS h
      | FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |ys AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |px AS (SELECT doc_id, w, h, x, y,
      |  (x * 7 + y * 13 + doc_id * 31) % 256 AS r,
      |  (x * 3 + y * 5 + doc_id * 17) % 256 AS g,
      |  (x * 11 + y * 2 + doc_id * 23) % 256 AS b
      | FROM ys)""".stripMargin

  /** q94's oracle, also a CTE body of q100's composed funnel. */
  def substrSpansOracleSql: String =
    """WITH t AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
      |    x -> x <> '') AS ws
      | FROM documents),
      |g AS (SELECT doc_id, CAST(i AS INTEGER) - 1 AS pos,
      |    md5(array_to_string(ws[i:i+3], ' ')) AS gd
      |  FROM t, unnest(generate_series(1, len(ws) - 3)) AS u(i)
      |  WHERE len(ws) >= 4),
      |rep AS (SELECT gd FROM g GROUP BY gd HAVING count(*) >= 2),
      |f AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gd)),
      |i AS (SELECT doc_id, pos,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      |  FROM f),
      |s AS (SELECT doc_id, min(pos) AS span_start,
      |    max(pos) - min(pos) + 4 AS span_tokens
      |  FROM i GROUP BY doc_id, isl)
      |SELECT d.doc_id, CAST(count(s.span_start) AS BIGINT) AS n_spans,
      |  CAST(coalesce(sum(s.span_tokens), 0) AS BIGINT) AS sum_span_tokens,
      |  CAST(coalesce(max(s.span_tokens), 0) AS BIGINT) AS max_span_tokens
      |FROM documents d LEFT JOIN s USING (doc_id)
      |GROUP BY d.doc_id""".stripMargin

  /** q101's oracle: replay the ExactSubstr cut — same span CTEs as
    * q94, then delete covered token positions from the ORIGINAL-case
    * token list (case-folding never moves a whitespace boundary, so
    * the indices line up) and string_agg the survivors in order.
    */
  def removeSpansOracleSql: String =
    """WITH t AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
      |    x -> x <> '') AS ws
      | FROM documents),
      |o AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
      |    x -> x <> '') AS ws
      | FROM documents),
      |g AS (SELECT doc_id, CAST(i AS INTEGER) - 1 AS pos,
      |    md5(array_to_string(ws[i:i+3], ' ')) AS gd
      |  FROM t, unnest(generate_series(1, len(ws) - 3)) AS u(i)
      |  WHERE len(ws) >= 4),
      |rep AS (SELECT gd FROM g GROUP BY gd HAVING count(*) >= 2),
      |f AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gd)),
      |i AS (SELECT doc_id, pos,
      |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      |  FROM f),
      |s AS (SELECT doc_id, min(pos) AS span_start,
      |    max(pos) - min(pos) + 4 AS span_tokens
      |  FROM i GROUP BY doc_id, isl),
      |cov AS (SELECT DISTINCT s.doc_id,
      |    s.span_start + CAST(u.i AS BIGINT) AS p
      |  FROM s, unnest(generate_series(0, span_tokens - 1)) AS u(i)),
      |tok AS (SELECT doc_id, CAST(u.j AS BIGINT) - 1 AS p,
      |    ws[CAST(u.j AS INTEGER)] AS tok
      |  FROM o, unnest(generate_series(1, len(ws))) AS u(j)),
      |kept AS (SELECT tok.doc_id, tok.p, tok.tok FROM tok
      |  LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
      |  WHERE cov.p IS NULL),
      |agg AS (SELECT doc_id, count(*) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY p) AS text_clean
      |  FROM kept GROUP BY doc_id),
      |nt AS (SELECT doc_id, len(ws) AS n_toks FROM o)
      |SELECT d.doc_id,
      |  CAST(nt.n_toks - coalesce(agg.n_kept, 0) AS BIGINT)
      |    AS n_tokens_removed,
      |  coalesce(agg.text_clean, '') AS text_clean
      |FROM documents d JOIN nt USING (doc_id)
      |LEFT JOIN agg USING (doc_id)""".stripMargin

  def sqlUrlCase: String =
    "CASE CAST(doc_id % 6 AS INTEGER) " + UrlTemplates.zipWithIndex.map {
      case (t, i) =>
        val l = "'" + t
          .replace("{K}", "' || CAST(doc_id % 20 AS VARCHAR) || '")
          .replace("{ID}", "' || CAST(doc_id AS VARCHAR) || '") + "'"
        if (i < UrlTemplates.size - 1) s"WHEN $i THEN $l" else s"ELSE $l"
    }.mkString(" ") + " END"


  /** Shared oracle prefix for q66/q67: the q39 Jaccard pair graph,
    * symmetrized, closed under reachability with a recursive CTE
    * (UNION set semantics terminate the recursion), reduced to
    * min-reachable-id components — the SQL mirror of
    * GraphOps.connectedComponents.
    */
  val componentsCte: String =
    """WITH RECURSIVE sh AS (
      | SELECT DISTINCT doc_id AS id, shingle FROM (
      |  SELECT doc_id,
      |   unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      |  FROM (SELECT doc_id, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
      |        FROM documents) t0) t1),
      |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
      |inter AS (
      | SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
      | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      | GROUP BY 1, 2),
      |edges AS (
      | SELECT a_id, b_id FROM inter
      | JOIN sizes sa ON inter.a_id = sa.id
      | JOIN sizes sb ON inter.b_id = sb.id
      | WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 5) >= 0.2),
      |bi AS (SELECT a_id AS u, b_id AS v FROM edges
      |       UNION SELECT b_id, a_id FROM edges),
      |reach(u, v) AS (
      | SELECT u, u FROM (SELECT DISTINCT u FROM bi) nodes
      | UNION
      | SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
      |comps AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u)
      |""".stripMargin

  /** DuckDB equivalents. Regex-count trick: len(regexp_extract_all(..)). */
}
