package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are pure column expressions (whole-stage-codegen
  * friendly, no UDFs) so they stay inside one codegen span per scan and
  * scale linearly with partition count — no shuffles except the final
  * aggregations callers add.
  */
object TextOps {

  /** Engine-neutral whitespace classes. Java's \s is [ \t\n\x0B\f\r];
    * RE2's (DuckDB, and most other engines' regex) is [ \t\n\f\r] —
    * no \x0B. Every oracle runs on RE2, so ALL Spark-side token
    * splitting/counting spells the class out explicitly; a \x0B in a
    * document then tokenizes identically on both engines (it stays
    * inside a token run). This is the drift class that caused the r6
    * q75 hash mismatch.
    */
  private[graft] val Ws = "[ \\t\\n\\f\\r]+"
  private[graft] val NonWs = "[^ \\t\\n\\f\\r]+"

  /** THE corpus tokenizer: lowercase, split on whitespace runs, drop
    * empties. Every token-level operator (tokenStats, vocabulary,
    * heavy hitters, bm25, chunking, simHash) and every DuckDB oracle
    * replays exactly this expression — change it HERE or nowhere, or
    * the operators silently diverge from each other and their oracles.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), Ws), _ =!= "")

  /** Number of non-whitespace token runs. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit(NonWs)).as("n_tokens")

  /** Count of punctuation characters (fixed ASCII class). */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]"))

  /** Count of common-English stopword tokens. */
  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit("\\b(the|a|of|to|and)\\b"))

  /** Character count excluding all whitespace. */
  def charNoWs(text: Column): Column =
    length(regexp_replace(text, "[ \\t\\n\\f\\r]", ""))

  /** Whitespace-normalized md5 fingerprint (document identity modulo
    * formatting). Deterministic — usable as an exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), Ws, "").cast("binary"))

  /** Compression-ratio quality signal (deflate bytes / raw bytes):
    * natural prose lands in a narrow band, boilerplate/template text
    * compresses far below it, random or encoded noise barely
    * compresses — the one-number entropy probe the classic corpus-
    * quality rule sets threshold on. Zero shuffle; the deflate is a
    * native codegen'd expression with a per-thread reused compressor.
    * JVM-static (zlib build), so rows-only for the oracle — see
    * [[graft.functions.DeflateLen]] for the determinism contract.
    * Empty text yields a NULL ratio (nothing to measure).
    */
  def compressionSignal(docs: DataFrame, idCol: String, textCol: String,
      level: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        length(col(textCol).cast("binary")).as("n_bytes"),
        call_function("graft_deflate_len", col(textCol), lit(level))
          .as("n_deflate"))
      .withColumn("ratio", when(col("n_bytes") > 0,
        round(col("n_deflate").cast("double") / col("n_bytes"), 5)))
  }

  /** DuckDB SQL replaying [[compressionSignal]] under dir-fitted
    * frozen deflate sizes — the q124/q173 dynamic-oracle discipline
    * applied to the one SQL-inexpressible kernel left (zlib): the
    * generator (Verify, driver-side) deflates every row's text in the
    * JVM with a FRESH `java.util.zip.Deflater` PER ROW (no reuse at
    * all — so any bug in [[graft.functions.DeflateLenUtil]]'s
    * per-thread `reset()` reuse cache, per-level keying included,
    * hash-fails against these never-reused instances; a zlib-level
    * defect common to both paths is out of scope, pinned by the
    * kernel spec's known-answer cases)
    * and embeds `(doc_id, n_deflate)` as a VALUES table; DuckDB then
    * independently recomputes the raw byte lengths FROM THE DATA
    * (`strlen` = UTF-8 bytes, the exact twin of Spark's
    * `length(cast binary)`) and replays the ratio arithmetic and the
    * empty-text NULL branch. Embedded sizes are gated on id match:
    * the inner join drops any drifted id, failing the row-count
    * compare loudly.
    *
    * Trust split (same as the PCA/unigram dynamic oracles): the zlib
    * kernel itself is pinned by its ScalaTest spec (known-answer +
    * reuse-equals-fresh cases); the oracle proves the distributed
    * plumbing — byte counting, null handling, division, 5dp rounding
    * — matches an independent engine on every row.
    */
  def compressionOracleSql(table: String, idCol: String, textCol: String,
      docs: DataFrame, level: Int = 6): String = {
    val rows = docs.select(col(idCol).cast("long"), col(textCol)).collect()
    require(rows.nonEmpty, s"compression oracle: $table is empty")
    val buf = new Array[Byte](8192)
    val tuples = rows.flatMap { r =>
      // NULL (or non-long-castable) ids can't be id-gated: skip them
      // here so the generator never NPEs — the engine still emits the
      // null-id row, the oracle's inner join doesn't, and the
      // row-count compare fails LOUDLY (the gate deciding, not a
      // generator crash silently downgrading q109 to rows-only)
      if (r.isNullAt(0)) None
      else if (r.isNullAt(1)) Some(s"(${r.getLong(0)}, NULL)")
      else {
        val bytes = r.getString(1)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(level, true)
        try {
          d.setInput(bytes); d.finish()
          var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          Some(s"(${r.getLong(0)}, $total)")
        } finally d.end()
      }
    }
    require(tuples.nonEmpty, s"compression oracle: no gateable ids in $table")
    s"""WITH dz (doc_id, n_deflate) AS (VALUES ${tuples.mkString(", ")})
       |SELECT t.$idCol AS doc_id,
       | CAST(strlen(t.$textCol) AS INTEGER) AS n_bytes,
       | CAST(z.n_deflate AS INTEGER) AS n_deflate,
       | CASE WHEN strlen(t.$textCol) > 0
       |      THEN round(CAST(z.n_deflate AS DOUBLE) / strlen(t.$textCol), 5)
       | END AS ratio
       |FROM $table t JOIN dz z ON t.$idCol = z.doc_id""".stripMargin
  }

  /** HTML → text extraction (the crawl pipeline's boilerplate-strip
    * stage, ahead of every dedup/quality operator): drop script and
    * style blocks and comments wholesale, replace remaining tags with
    * spaces, decode the minimal entity set (&lt; &gt; &quot; &#39;
    * &nbsp; and — last, so freshly produced '&'s are never re-decoded
    * — &amp;), collapse whitespace.
    *
    * Deliberately regex-chain built-ins, not a parser: every pattern
    * is RE2-compatible (no backreferences, lazy quantifiers and (?is)
    * flags only), so an external engine replays the extraction
    * verbatim — and the whole chain is codegen'd row-local work, zero
    * shuffle at any scale. Malformed nesting degrades to extra
    * whitespace, never to lost non-markup text.
    */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        call_function("replace", c, lit(from), lit(to))
      }
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r]+", " "))
  }

  /** Per-group line-frequency boilerplate removal (the CCNet /
    * RefinedWeb line-wise filter, the stage AFTER [[htmlExtract]]):
    * a line whose trimmed form appears in more than `maxShare` of a
    * group's documents (and in at least `minDocs` of them — small
    * groups can't vote) is template furniture (nav bars, cookie
    * banners, copyright footers) and is cut from every document;
    * surviving lines rejoin in original order. Line identity is the
    * space-trimmed text within ONE group (`groupCol`, typically the
    * domain/source): the same footer on two domains is dropped per
    * domain, never globally — a common quote shared across the web
    * is not boilerplate.
    *
    * Scale shape: posexplode is narrow; the line census and the
    * drop-key join are both keyed by (group, line) — the join reuses
    * the census's partitioning — and the rebuild is one aggregation
    * keyed by doc id with map-side combine. Per-group doc counts are
    * a broadcast (|groups| rows). Nothing is quadratic; the widest
    * shuffle carries one row per (doc, line). NULL-text documents
    * have no lines and drop out of the output (posexplode semantics,
    * replayed by the oracle's unnest).
    *
    * Output: (id, n_lines_removed, text_clean). Empty lines are
    * never counted or dropped (they carry no template signal) and
    * survive in place.
    */
  def lineBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, maxShare: Double = 0.5, minDocs: Int = 3)
      : DataFrame = {
    require(maxShare > 0 && maxShare <= 1,
      s"maxShare must be in (0, 1], got $maxShare")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val lines = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lk", trim(col("line")))
    val groupSizes = docs.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    val dropKeys = lines.filter(col("lk") =!= "")
      .groupBy("grp", "lk").agg(countDistinct(col("id")).as("nd"))
      .join(broadcast(groupSizes), Seq("grp"))
      .filter(col("nd") >= minDocs && col("nd") > col("n_docs") * maxShare)
      .select(col("grp"), col("lk"), lit(true).as("_drop"))
    lines.join(dropKeys, Seq("grp", "lk"), "left")
      .groupBy("id")
      .agg(
        sum(when(col("_drop"), 1L).otherwise(0L)).as("n_lines_removed"),
        // collect_list skips the nulls the `when` produces for
        // dropped lines; array_sort orders by the struct's first
        // field (pos) — original line order, partition-invariant
        array_join(transform(array_sort(collect_list(
          when(col("_drop").isNull, struct(col("pos"), col("line"))))),
          x => x("line")), "\n").as("text_clean"))
  }

  /** Heuristic marker-word scores per language. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of)\\b",
    "de" -> "\\b(der|die|und)\\b",
    "fr" -> "\\b(le|la|et)\\b",
    "es" -> "\\b(el|los|y)\\b")

  def langScore(text: Column, lang: String): Column = {
    val re = langMarkers.toMap.apply(lang)
    regexp_count(lower(text), lit(re))
  }

  /** Argmax over the marker scores, ties resolved in langMarkers order. */
  def langPredict(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    // s_en >= all later => en; else s_de >= all later => de; ...
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, score), i), rest) =>
        val laters = scores.drop(i + 1).map(_._2)
        if (laters.isEmpty) rest
        else when(laters.map(score >= _).reduce(_ && _), lit(lang)).otherwise(rest)
    }
  }

  /** Token-frequency repetition stats per document: total/distinct
    * token counts, the most-frequent token's share, and the duplicate-
    * token fraction (Gopher-style repetition signals for corpus
    * filtering).
    *
    * Physical form is explode → two-level aggregate; BOTH aggregations
    * combine map-side (partial agg on (id, token), then on id), so the
    * shuffles carry near-distinct rows only — nothing here is
    * O(tokens²) per document, and a 100 TB corpus pays two narrow
    * hash shuffles keyed by doc id.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = explode(tokens(col(textCol))).as("tok")
    df.select(col(idCol).as("id"), tok)
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_count"))
      .select(col("id"), col("n_tokens"), col("n_distinct"), col("top_count"),
        round(col("top_count").cast("double") / col("n_tokens"), 5).as("top_frac"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 5)
          .as("dup_frac"))
  }

  /** Duplicate word-n-gram fractions per document (gram-count share and
    * character share), the Gopher "repetitive content" filters. Pure
    * per-row array expressions — zero shuffles; the arrays live only
    * inside one projection, so the operator composes with any scan at
    * any scale.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    val w = col("_w")
    def grams(n: Int) = when(size(w) >= n,
      transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))
    ).otherwise(array())
    def charLen(a: Column) = aggregate(transform(a, x => length(x)), lit(0), _ + _)
    val metricCols = ns.flatMap { n =>
      val g = col(s"_g$n")
      val total = size(g)
      val dist = size(array_distinct(g))
      val chars = charLen(g)
      val distChars = charLen(array_distinct(g))
      Seq(
        when(total > 0,
          round(lit(1.0) - dist.cast("double") / total, 5)).otherwise(0.0)
          .as(s"dup_${n}gram_frac"),
        when(chars > 0,
          round(lit(1.0) - distChars.cast("double") / chars, 5)).otherwise(0.0)
          .as(s"dup_${n}gram_char_frac"))
    }
    // explode(array(..)) barriers as in DedupOps.wordShingles: a plain
    // Project would collapse into the split Project and inline the
    // tokenizer into the per-element gram lambdas (O(len²)/doc).
    df.select(col(idCol).as("id"), split(lower(col(textCol)), Ws).as("_w"))
      .select(col("id"),
        explode(array(struct(ns.map(n => grams(n).as(s"_a$n")): _*))).as("_s"))
      .select(col("id") +: ns.map(n => col(s"_s._a$n").as(s"_g$n")): _*)
      .select(col("id") +: metricCols: _*)
  }

  /** Corpus vocabulary: per token, total occurrences (tf) and document
    * frequency (df) — the input a tokenizer-training or stopword-
    * mining stage consumes. One explode + one aggregation; tf comes
    * from a count and df from counting each document's DISTINCT
    * tokens, both map-side-combined on the token key. `topK` bounds
    * the result via one final ordered take (ties broken by token).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val tok = explode(tokens(col(textCol))).as("tok")
    df.select(col(idCol).as("id"), tok)
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), count_distinct(col("id")).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(topK)
  }

  /** Approximate heavy-hitter tokens in ONE pass with BOUNDED memory:
    * the Misra–Gries aggregate (`graft_topk_freq`) keeps at most
    * `capacity` candidates per partial buffer, so each partition ships
    * a small summary instead of its whole distinct-token set — the
    * 100 TB twin of [[vocabulary]] (whose token-keyed shuffle is
    * proportional to the vocabulary itself). Every token with true
    * count > n/(capacity+1) is guaranteed present; with `capacity` ≥
    * the distinct-token count the result is exact.
    */
  def approxTopTokens(df: DataFrame, textCol: String, capacity: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(explode(tokens(col(textCol))).as("tok"))
      .agg(call_function("graft_topk_freq", col("tok"), lit(capacity)).as("tops"))
      .select(explode(col("tops")).as("t"))
      .select(col("t.tok").as("tok"), col("t.est").as("est"))
  }

  /** Linear quality scorer (the shape of CCNet/RedPajama-style model
    * quality filters): a fixed, auditable weight vector over the
    * per-document quality signals, squashed to (0,1) with a logistic.
    * Pure codegen projection — scoring 100 TB is a scan. Weights are
    * caller-supplied (trained offline); the default is a sane
    * hand-tuned prior favoring mid-length, punctuated, stopword-
    * bearing prose.
    */
  final case class QualityWeights(
      bias: Double = -1.0,
      perToken: Double = 0.02,
      punctRatio: Double = 8.0,
      stopRatio: Double = 4.0,
      avgTokenLen: Double = -0.15,
      dup2gramFrac: Double = -6.0) {
    def toArray: Array[Double] =
      Array(bias, perToken, punctRatio, stopRatio, avgTokenLen, dup2gramFrac)
  }

  /** Weights FITTED by [[QualityFit.fit]] (deterministic IRLS, 8
    * Newton steps, ridge 1e-3) on the sf0.01 documents corpus with
    * label `lang = 'en'` — the CCNet shape: the positive class is the
    * target-domain sample, the model scores how target-like a document
    * reads. Frozen like [[BpeOps.DefaultMerges]] so the scorer stays a
    * pure literal projection and the oracle can replay it; re-derive
    * with QualityFitProbe after a corpus change.
    */
  val TrainedQualityWeights: QualityWeights = QualityWeights(
    bias = 1.031039, perToken = -2.06e-4, punctRatio = 0.0,
    stopRatio = 1.770983, avgTokenLen = -0.292766, dup2gramFrac = -2.253583)

  /** The five quality signals x1..x5 over (`t`, tokenized `_w`):
    * token count, punctuation ratio, stopword ratio, average token
    * length, duplicate-bigram fraction. ONE definition shared by the
    * fixed scorer, the IRLS fit, and their oracles — divergence here
    * would silently train on different features than it scores.
    */
  private[graft] def qualitySignalCols(t: Column): Seq[Column] = {
    val toks = regexp_count(t, lit(NonWs))
    val words = col("_w")
    Seq(
      toks.cast("double"),
      punctCount(t).cast("double") / greatest(length(t), lit(1)),
      stopwordCount(t).cast("double") / greatest(toks, lit(1)),
      charNoWs(t).cast("double") / greatest(toks, lit(1)),
      when(size(words) >= 2,
        lit(1.0) - size(array_distinct(transform(sequence(lit(1), size(words) - 1),
          i => concat_ws(" ", element_at(words, i), element_at(words, i + 1)))))
          .cast("double") / (size(words) - 1)).otherwise(0.0))
  }

  def qualityScore(df: DataFrame, idCol: String, textCol: String,
      w: QualityWeights = QualityWeights()): DataFrame = {
    val t = col(textCol)
    val Seq(toks, punct, stop, atl, dup2) = qualitySignalCols(t)
    val z = lit(w.bias) + toks * w.perToken + punct * w.punctRatio +
      stop * w.stopRatio + atl * w.avgTokenLen + dup2 * w.dup2gramFrac
    // parallelism floor before the signal pass: the whole regex/token
    // computation otherwise runs on a 1-split scan's single core
    SkewOps.parallelismFloor(df.select(col(idCol).as("id"), t.as(textCol)))
      .select(col("id"), t.as(textCol), tokens(t).as("_w"))
      .select(col("id"), explode(array(col("_w"))).as("_w"), t) // barrier
      .select(col("id"), round(lit(1.0) / (lit(1.0) + exp(-z)), 5).as("quality"))
  }

  /** Adaptive length trim: keep documents whose length lies between
    * the `lo` and `hi` quantiles OF THEIR OWN STRATUM — curation
    * thresholds derived from the data (a fixed global cut is wrong
    * when one source is tweets and another is books).
    *
    * Two passes: one per-stratum percentile aggregation (a counts
    * buffer per group, map-side combined — no global sort), broadcast
    * back onto the corpus, then a pure filter. The corpus scan is
    * never shuffled.
    */
  def adaptiveLengthTrim(df: DataFrame, stratumCol: String, lenCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val cuts = df.groupBy(stratumCol).agg(
      percentile(col(lenCol), lit(lo)).as("_lo"),
      percentile(col(lenCol), lit(hi)).as("_hi"))
    df.join(broadcast(cuts), stratumCol)
      .filter(col(lenCol) >= col("_lo") && col(lenCol) <= col("_hi"))
      .drop("_lo", "_hi")
  }

  /** PII patterns (fixed, deterministic): emails, IPv4 addresses,
    * simple dashed phone numbers. Pure codegen regex — a scrub over
    * 100 TB is a projection, no shuffle. The pattern set is
    * deliberately conservative/auditable, not a best-effort NER.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Candidate payment-card numbers: contiguous 13–16 digit runs at
    * word boundaries. Regex alone over-flags (timestamps, order ids);
    * pair with [[luhnValidCount]].
    */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit("\\b[0-9]{13,16}\\b"), lit(0))

  /** Luhn checksum over a digit string (right-to-left, double every
    * second digit, subtract 9 above 9, total divisible by 10) — pure
    * HOF integer math, SQL-replayable.
    */
  private[graft] def luhnOk(s: Column): Column = {
    val rev = reverse(s)
    val total = aggregate(sequence(lit(1), length(s)), lit(0),
      (acc, i) => {
        val d = ascii(rev.substr(i, lit(1))) - 48
        val dd = when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + dd
      })
    pmod(total, lit(10)) === 0
  }

  /** Count of Luhn-VALID card candidates — the high-precision PII
    * signal (the checksum cuts the digit-run false-positive rate an
    * order of magnitude; a flagged doc goes to redaction/quarantine).
    * Zero shuffle, whole-stage codegen.
    */
  def luhnValidCount(text: Column): Column =
    size(filter(cardCandidates(text), (c: Column) => luhnOk(c)))

  /** Redact all PII matches with a fixed token (order: email, ip,
    * phone — emails are scrubbed before the ip pattern can nibble at
    * dotted hostnames).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<PII>"),
        Ipv4Re, "<PII>"),
      PhoneRe, "<PII>")

  /** Canonical text normal form (corpus-cleaning stage 0, and the
    * right key for exact dedup of cosmetically-different copies):
    * Unicode NFC (native `graft_nfc` — register GraftFunctions
    * first), lowercase, whitespace runs collapsed to single spaces,
    * trimmed. The whitespace class is the engine-neutral
    * [ \t\n\f\r] (Java's \s includes \x0B, RE2's does not). Pure
    * per-row expressions, zero shuffle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(call_function("graft_nfc", text)), "[ \\t\\n\\f\\r]+", " "))

  /** Line-level deduplication (the RefinedWeb/CCNet corpus-cleaning
    * stage): a line that appears verbatim at least `minDupCount` times
    * ACROSS the corpus (boilerplate, navigation chrome, license
    * banners) is removed from every document; surviving lines are
    * reassembled in their original order.
    *
    * Physical form, scan to output:
    *  1. `posexplode` lines — narrow, order captured as `pos`;
    *  2. banned-line set: one aggregation keyed by `md5(line)` (the
    *     16-byte key keeps the shuffle narrow — full line text never
    *     shuffles in the counting pass);
    *  3. `left_anti` equi-join on the hash (AQE broadcasts the banned
    *     side when small — boilerplate sets usually are);
    *  4. reassembly: one aggregation keyed by doc id (`collect_list`
    *     of (pos, line) + in-row sort — per-doc line counts are
    *     bounded, so the struct list is too).
    * Two key-hashed shuffles + one join at any corpus size. Documents
    * whose every line was banned survive with empty cleaned text.
    *
    * `sep` is the LITERAL block separator — "\n" gives RefinedWeb line
    * dedup, "\n\n" paragraph dedup (the same pipeline's second pass);
    * split and reassembly use the identical string, so
    * clean(clean(x)) = clean(x).
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      minDupCount: Int = 2, sep: String = "\n"): DataFrame = {
    require(minDupCount >= 2, "minDupCount < 2 would ban every line")
    require(sep.nonEmpty, "sep must be non-empty")
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
      .withColumn("line_key", md5(col("line").cast("binary")))
    val banned = lines.groupBy("line_key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minDupCount)
      .select("line_key")
    val rebuilt = lines.join(banned, Seq("line_key"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            _.getField("line")),
          sep).as("cleaned"))
    df.select(col(idCol).as("id"),
        size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as("n_lines"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Corpus-LM log-perplexity per document (the CCNet quality filter's
    * shape): a bigram language model with add-one smoothing is
    * "trained" as two count aggregations over the corpus itself, and
    * each document is scored by the mean negative log-likelihood of
    * its bigrams — low = looks like the corpus, high = outlier/noise.
    * `logppl = avg over bigrams of −ln((c(ab)+1) / (c(a)+V))`.
    *
    * Fully relational, so unlike a real KenLM this has an exact SQL
    * oracle: unigram agg, bigram agg, one (a,b)-keyed join of the
    * document bigrams against the model, per-doc mean. The model
    * tables are vocabulary-bounded (≤V and ≤V² rows, far below corpus
    * size); V and the unigram table broadcast. Documents with fewer
    * than 2 tokens have no bigrams and score NULL.
    */
  /** Most recent call's persisted bigram-count table per session; see
    * the release note inside [[perplexityScore]].
    */
  private val perplexityCabSlot =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.SparkSession, DataFrame]()

  def perplexityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol).as("id"), toks.as("t"))
    // explode_OUTER(when(...)) with no otherwise: docs with <2 tokens
    // get a NULL bigram array, which explode_outer keeps as one
    // (id, null, null) row — it rides the null-key-safe left joins
    // below into a NULL nll, so avg() scores the doc NULL without a
    // corpus×corpus re-join at the end (the earlier
    // `df.join(scored, "left")` sort-merged two corpus-sized sides
    // just to re-attach token-poor ids)
    val bigrams = base.select(col("id"),
      explode_outer(when(size(col("t")) >= 2,
        transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("a"),
            element_at(col("t"), i + 2).as("b"))))).as("bg"))
      .select(col("id"), col("bg.a").as("a"), col("bg.b").as("b"))
    // The count table is vocab²-bounded — cache it so the corpus is
    // scanned a single time for the model; without the pin, AQE plans
    // the broadcast and the uni re-aggregation as independent subtrees
    // and the exploded-corpus scan runs twice (measured: no
    // ReusedExchange fires across the two). Lazy persist, not
    // localCheckpoint: the eager checkpoint job cost more than the
    // saved scan at small scale, while a cache hit serves both
    // consumers from the first computation at any scale. The returned
    // frame is lazy, so this call cannot unpersist its own cab —
    // instead the session keeps ONE outstanding model cache: scoring
    // the same corpus again reuses it (warm re-runs skip the model
    // pass entirely), scoring a different corpus releases it. Bounded
    // at one table per session, never an accumulating leak.
    val cabPlan = bigrams.filter(col("a").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    // synchronized check-and-swap: two concurrent same-corpus calls
    // racing through an unlocked check would both persist the same
    // canonical plan and the loser's eviction would uncache the
    // winner's entry too (CacheManager keys by canonicalized plan) —
    // leaving the slot "reusing" a frame that silently recomputes.
    // Also prune entries of stopped sessions so per-session caches
    // don't outlive their session (their blocks die with the context,
    // but the map reference would pin session + plan objects forever).
    val cab = perplexityCabSlot.synchronized {
      perplexityCabSlot.keySet.removeIf(s => s.sparkContext.isStopped)
      val prev = perplexityCabSlot.get(df.sparkSession)
      if (prev != null && prev.queryExecution.analyzed.canonicalized ==
          cabPlan.queryExecution.analyzed.canonicalized) prev
      else {
        val c = cabPlan
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Option(perplexityCabSlot.put(df.sparkSession, c))
          .foreach(_.unpersist(blocking = false))
        c
      }
    }
    // c(a) = Σ_b c(ab): re-aggregate the pinned count table instead of
    // scanning the exploded corpus again
    val uni = cab.groupBy("a").agg(sum("c_ab").as("c_a"))
    // V = corpus vocabulary size (all tokens, not just bigram heads)
    val v = base.select(explode(col("t")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    // BOTH model tables broadcast: the probe side is the exploded
    // corpus (its bigram count ≈ corpus token count) — shuffling it on
    // (a,b) to meet a vocab²-bounded table would be the whole job's
    // cost at scale. Computing the model aggregations still shuffles,
    // but only once and map-side combined down to vocab-bounded rows.
    // LEFT joins so the null-bigram sentinel rows survive (a real
    // bigram always matches: cab is built from the same rows).
    bigrams
      .join(broadcast(cab), Seq("a", "b"), "left")
      .join(broadcast(uni), Seq("a"), "left")
      .crossJoin(broadcast(v))
      .select(col("id"),
        (-log((col("c_ab") + 1).cast("double") / (col("c_a") + col("v"))))
          .as("nll"))
      .groupBy("id").agg(round(avg("nll"), 5).as("logppl"))
  }

  /** BM25 relevance scores (Okapi, Lucene's +1 idf smoothing) of every
    * document against a fixed bag of query terms — the retrieval/
    * quality-ranking primitive (e.g. scoring a crawl against a topic
    * seed list).
    *
    * The document-length norm (`dl`) is computed BEFORE the explode
    * and carried alongside each token, so no per-doc join is needed;
    * the explode is filtered to the query terms immediately, so the
    * (id, term) aggregation shuffles only matching tokens. Corpus
    * stats (N, avgdl) are one scalar aggregate broadcast via a
    * 1-row cross join; per-term document frequencies are a second
    * tiny broadcast. At 100 TB: three corpus scans (stats, the tf
    * probe, and the tf subtree re-planned inside the df broadcast
    * build — exchange reuse does not cross a broadcast boundary),
    * all narrow, one near-empty shuffle; tf itself can be corpus-
    * order rows for stopword-frequency terms, so it is deliberately
    * NOT pinned here.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms would double-count: $terms")
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val stats = df.select(count(lit(1)).as("n_docs"),
      avg(size(toks)).as("avgdl"))
    val tf = base.groupBy("id", "tok")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "tok").crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy("id").agg(round(sum("w"), 5).as("bm25"))
  }

  /** TF-IDF term weights per (document, token) — the vector-space
    * retrieval primitive between [[vocabulary]] (corpus tf/df) and
    * [[bm25]] (scores against a fixed query): weight = tf · idf with
    * the smoothed idf `ln((N+1)/(df+1)) + 1` (sklearn's convention —
    * strictly positive, defined even for df = N). `minDf` drops
    * hapax/noise terms before weighting.
    *
    * Scale shape (the canonical posting-list plan, same as bm25): an
    * explode into a map-side-combined (id, tok) aggregation, document
    * frequencies re-aggregated from it and broadcast back with the
    * 1-row corpus count. The (id, tok) subtree is planned twice —
    * probe side and inside the broadcast df build (exchange reuse
    * does not cross a broadcast boundary; measured on the same shape
    * in [[perplexityScore]]) — so the corpus is aggregated twice per
    * run. Callers looping over one corpus should persist the tf
    * frame themselves; this op does not pin corpus-sized state.
    */
  def tfidfWeights(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 1): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val tf = base.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    tf.join(broadcast(dfreq), "tok").crossJoin(broadcast(nDocs))
      .select(col("id"), col("tok"), col("tf"), col("df"),
        (col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)))
          + lit(1.0))).as("w"))
  }

  /** Per-document n-gram novelty against the whole corpus: how much
    * of a document's distinct gram set appears NOWHERE else. High
    * novelty marks fresh content; a low-novelty, high-`max_df` row is
    * boilerplate assembled from corpus-common phrases — the
    * complement of the dedup/contamination family (those find WHO
    * shares text, this scores HOW MUCH of a doc is shared at all).
    *
    * Scale shape (the TF-IDF discipline): distinct (id, gram) rows
    * from the narrow per-row shingle set, one gram-keyed aggregation
    * for document frequency (map-side combined), one join back on the
    * gram (64-bit hashed — the q39 narrowing), one id-keyed
    * aggregation. The gram DF table is vocabulary-sized and never
    * broadcast. Docs with < n tokens surface with n_grams = 0 and
    * NULL novelty (nothing to measure).
    */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = DedupOps.wordShingles(df, idCol, textCol, n)
    val hashed = sh.select(col("id"), col("n_sh"),
      xxhash64(col("shingle")).as("g"))
    val freq = hashed.groupBy("g").agg(count(lit(1)).as("df"))
    val per = hashed.join(freq, "g")
      .groupBy("id")
      .agg(first(col("n_sh")).as("_n"),
        count(when(col("df") === 1, 1)).as("_novel"),
        max(col("df")).as("_maxdf"))
    df.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_grams"),
        coalesce(col("_novel"), lit(0L)).as("n_novel"),
        coalesce(col("_maxdf"), lit(0L)).as("max_df"),
        when(col("_n").isNull, lit(null).cast("double"))
          .otherwise(round(col("_novel").cast("double") / col("_n"), 5))
          .as("novelty"))
  }

  /** N-gram novelty versus a fixed REFERENCE corpus — the crawl-
    * refresh signal: how much of each candidate document's distinct
    * n-gram set appears nowhere in the reference (0 = already have
    * it, 1 = entirely new material). The vs-ref twin of
    * [[gramNovelty]] (which measures novelty WITHIN one corpus).
    * Shape: both sides reduce to (digest) / (id, digest) before the
    * gram-keyed join — shingle text never shuffles; at 100 TB put a
    * bloom of the reference digests in front (BloomOps) so only
    * candidate grams that might match pay the shuffle.
    */
  def gramNoveltyVsRef(target: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val refSet = DedupOps.wordShingles(ref, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("g")).distinct()
      .withColumn("known", lit(1))
    val tg = DedupOps.wordShingles(target, idCol, textCol, n)
      .select(col("id"), col("n_sh"), xxhash64(col("shingle")).as("g"))
    val per = tg.join(refSet, Seq("g"), "left")
      .groupBy("id").agg(
        first(col("n_sh")).as("_n"),
        sum(col("known").isNull.cast("long")).as("_novel"))
    target.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_grams"),
        coalesce(col("_novel"), lit(0L)).as("n_novel"),
        when(col("_n").isNull, lit(null).cast("double"))
          .otherwise(round(col("_novel").cast("double") / col("_n"), 5))
          .as("novelty"))
  }

  /** Unicode script profile: per-document character fractions by
    * script block (Latin, Cyrillic, Greek, Arabic, Devanagari, CJK
    * ideographs, kana, Hangul) over the non-whitespace length — the
    * cheap routing signal that runs BEFORE language-ID at scale
    * (don't score 100 TB of Chinese against Latin trigram models).
    * Pure codegen regex projection, zero shuffle; the block ranges
    * are BMP and the fractions round at 5 decimals (the oracle
    * contract).
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val total = length(regexp_replace(t, "[ \\t\\n\\f\\r]", ""))
    def f(pattern: String) =
      round(regexp_count(t, lit(pattern)).cast("double") /
        greatest(total, lit(1)), 5)
    df.select(col(idCol),
      total.cast("long").as("n_chars"),
      f("[A-Za-z]").as("latin_frac"),
      f("[\u0400-\u04FF]").as("cyrillic_frac"),
      f("[\u0370-\u03FF]").as("greek_frac"),
      f("[\u0600-\u06FF]").as("arabic_frac"),
      f("[\u0900-\u097F]").as("devanagari_frac"),
      f("[\u4E00-\u9FFF]").as("cjk_frac"),
      f("[\u3040-\u30FF]").as("kana_frac"),
      f("[\uAC00-\uD7AF]").as("hangul_frac"))
  }

  /** Zero-width / invisible character scrub: the crawl-artifact
    * codepoints that break tokenizers and dedup keys while rendering
    * as nothing — zero-width space/joiner/non-joiner, BOM, soft
    * hyphen, directional marks and embeddings, word joiner — are
    * DELETED; NBSP (which renders as a space and must stay a word
    * boundary) is replaced WITH a space. Two codegen regex passes,
    * zero shuffle.
    */
  val InvisibleRe = "[\u200B\u200C\u200D\uFEFF\u00AD\u200E\u200F\u202A-\u202E\u2060]"
  def invisibleCount(text: Column): Column =
    regexp_count(text, lit(InvisibleRe)) + regexp_count(text, lit(" "))
  def scrubInvisible(text: Column): Column =
    regexp_replace(regexp_replace(text, InvisibleRe, ""), " ", " ")

  /** Mojibake (UTF-8-read-as-cp1252) detection count: a loose
    * heuristic regex over the two dominant signatures (Ã + any char
    * covers Latin-1 accents; â€ + any char covers general
    * punctuation). Deliberately looser than the repair — detection
    * flags candidates for audit, repair only acts on strict
    * round-trips ([[graft.functions.FixMojibake]]). Portable: the
    * same pattern runs in DuckDB.
    */
  val MojibakeRe = "(Ã.|â€.)"
  def mojibakeCount(text: Column): Column =
    regexp_count(text, lit(MojibakeRe))

  /** Whole-string strict mojibake repair (native expression; see
    * [[graft.functions.FixMojibake]] for the
    * round-trip-or-untouched contract). Zero shuffle — an encoding
    * scrub over 100 TB is a projection.
    */
  def fixMojibake(text: Column): Column =
    call_function("graft_fix_mojibake", text)

  /** Per-span mojibake repair for script-mixed documents (one bad
    * paragraph in a CJK doc): each maximal cp1252-encodable run gets
    * the strict round-trip-or-untouched attempt independently. See
    * [[graft.functions.FixMojibake.repairSpans]].
    */
  def fixMojibakeSpans(text: Column): Column =
    call_function("graft_fix_mojibake_spans", text)

  /** C4/Gopher-style rule-based quality filter: the classic
    * hand-crafted heuristic battery (word-count band, mean word
    * length, symbol-to-word ratio, bullet-line and ellipsis-line
    * fractions, alphabetic-word fraction, stopword presence,
    * lorem-ipsum / curly-brace rejects) as ONE zero-shuffle
    * projection — every signal is a codegen regex/array expression
    * over the row, so a 100 TB sweep is a scan, nothing more. Rules
    * evaluate on the ROUNDED ratios (the oracle contract: both
    * engines threshold the same 5-decimal value, so boundary
    * documents cannot split on ieee754 noise).
    *
    * Emits the signal columns, one boolean per rule, and the
    * composite `passes` — curation pipelines filter on `passes` but
    * audit on the bits (which rule fired is the actionable part).
    * Thresholds are parameters with the published defaults.
    */
  def qualityRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 10, maxWords: Int = 100000,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val words = tokens(t)
    val nWords = size(words)
    val lines = split(t, "\n", -1)
    val nLines = size(lines)
    def frac(n: Column, d: Column) =
      round(n.cast("double") / greatest(d, lit(1)), 5)
    val meanWordLen =
      round(charNoWs(t).cast("double") / greatest(nWords, lit(1)), 4)
    val symbolRatio = frac(
      regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")) +
        regexp_count(t, lit("…")), nWords)
    val bulletFrac = frac(
      size(filter(lines, l => l.rlike("^[-*•] "))), nLines)
    val ellipsisFrac = frac(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))), nLines)
    val alphaFrac = frac(
      size(filter(words, w => w.rlike("[a-z]"))), nWords)
    val stopHits = stopwordCount(t)
    val hasLorem = contains(lower(t), lit("lorem ipsum"))
    val hasBrace = contains(t, lit("{"))
    df.select(col(idCol),
        nWords.cast("long").as("n_words"), meanWordLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_line_frac"),
        ellipsisFrac.as("ellipsis_line_frac"), alphaFrac.as("alpha_word_frac"),
        stopHits.cast("long").as("n_stop_hits"),
        hasLorem.as("_lorem"), hasBrace.as("_brace"))
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("bullet_line_frac"),
        col("ellipsis_line_frac"), col("alpha_word_frac"), col("n_stop_hits"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_len"),
        (col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen).as("r_word_len"),
        (col("symbol_ratio") <= maxSymbolRatio).as("r_symbol"),
        (col("bullet_line_frac") <= maxBulletFrac).as("r_bullet"),
        (col("ellipsis_line_frac") <= maxEllipsisFrac).as("r_ellipsis"),
        (col("alpha_word_frac") >= minAlphaFrac).as("r_alpha"),
        (col("n_stop_hits") >= minStopHits).as("r_stop"),
        (!col("_lorem") && !col("_brace")).as("r_clean"))
      .withColumn("passes",
        col("r_len") && col("r_word_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop") && col("r_clean"))
  }

  /** Per-document quality metrics (ratios rounded for cross-engine
    * determinism — integer counts divide exactly in ieee754 but the
    * rounding keeps the oracle contract explicit).
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = regexp_count(t, lit(NonWs))
    df.select(
      col(idCol),
      toks.as("n_tokens"),
      punctCount(t).as("n_punct"),
      stopwordCount(t).as("n_stop"),
      round(punctCount(t).cast("double") / greatest(length(t), lit(1)), 5).as("punct_ratio"),
      round(stopwordCount(t).cast("double") / greatest(toks, lit(1)), 5).as("stop_ratio"),
      round(charNoWs(t).cast("double") / greatest(toks, lit(1)), 4).as("avg_token_len"))
  }

  /** All-pairs TF-IDF cosine similarity above a threshold — the
    * TEXT-side semantic near-duplicate join (no embeddings needed):
    * document pairs whose L2-normalized TF-IDF vectors, restricted to
    * the [minDf, maxDf] document-frequency band, have cosine ≥
    * `minCosine`. The embedding family ([[graft.ops.SimilarityOps]])
    * finds vectors a model put close together; this finds documents
    * whose *word usage* overlaps — templated/boilerplate rewrites
    * that n-gram Jaccard misses (word order changed) and embeddings
    * blur (topic kept, wording half-shared).
    *
    * Physical form is the classic inverted-index similarity join:
    * partial products meet on the TERM key, so the corpus is never
    * self-joined row-against-row — a pair is generated only where the
    * two documents actually share a banded term. Shuffles: the tf
    * aggregation, the term-keyed pair join, the (a,b) product sum.
    * The df band is the skew/volume contract, and it is exact, not a
    * recall trade: a term seen in more than `maxDf` documents
    * contributes ≤ cosine-epsilon per pair (idf ≈ 0 relative to rare
    * terms) but O(df²) join rows — at web scale the df cap is the
    * difference between an index over content words and a cross
    * product over "the". Both sides of the oracle replay the same
    * band, so results are engine-exact (Rahm/Do-style prefix
    * filtering would additionally drop low-weight postings — that is
    * a recall trade, deliberately NOT taken here).
    *
    * Doc-frequency table and norm table both flow through broadcast
    * joins (vocabulary-sized after the band; one row per doc for
    * norms — the norm join stays key-partitioned, not broadcast, as
    * it is corpus-sized).
    */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      minCosine: Double, minDf: Int = 2, maxDf: Int = 1000): DataFrame = {
    require(minCosine > 0.0, s"minCosine must be > 0, got $minCosine")
    require(maxDf >= minDf, s"maxDf ($maxDf) must be >= minDf ($minDf)")
    val w = tfidfWeights(df, idCol, textCol, minDf)
      .filter(col("df") <= maxDf)
    val norms = w.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nn"))
    val wn = w.join(norms, "id")
      .select(col("tok"), col("id"), (col("w") / col("nn")).as("wn"))
    val a = wn.select(col("tok"), col("id").as("a_id"), col("wn").as("wa"))
    val b = wn.select(col("tok"), col("id").as("b_id"), col("wn").as("wb"))
    a.join(b, Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(round(sum(col("wa") * col("wb")), 5).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** The DuckDB oracle for [[tfidfCosinePairs]] on a parquet `table`:
    * replays the tokenizer, the tf/df/idf formulas, the df band, the
    * L2 normalization, and the rounded threshold — term for term.
    */
  def tfidfCosinePairsOracleSql(table: String, idCol: String,
      textCol: String, minCosine: Double, minDf: Int, maxDf: Int): String =
    s"""WITH tk AS (SELECT $idCol AS id,
       |  list_filter(string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS t
       | FROM $table),
       |tok AS (SELECT id, unnest(t) AS tok FROM tk),
       |tf AS (SELECT id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n_docs FROM $table),
       |dfq AS (SELECT tok, count(*) AS df FROM tf
       |        GROUP BY tok HAVING count(*) >= $minDf AND count(*) <= $maxDf),
       |w AS (SELECT id, tok, tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w
       |      FROM tf JOIN dfq USING (tok), nd),
       |nrm AS (SELECT id, sqrt(sum(w * w)) AS nn FROM w GROUP BY id),
       |wn AS (SELECT w.id, tok, w / nn AS wn FROM w JOIN nrm USING (id))
       |SELECT a.id AS a_id, b.id AS b_id, round(sum(a.wn * b.wn), 5) AS cos
       |FROM wn a JOIN wn b USING (tok) WHERE a.id < b.id
       |GROUP BY 1, 2 HAVING round(sum(a.wn * b.wn), 5) >= $minCosine""".stripMargin
  /** Vocabulary coverage curve: what fraction of all token
    * occurrences the top-k most frequent types cover, at each k —
    * the "how big must my tokenizer vocab be" sizing number (e.g.
    * cov_1000 = 0.95 means a 1k vocab leaves 5% of the corpus OOV).
    *
    * Scale shape: one tokenize scan + one groupBy(token); the ranking
    * window sorts the VOCABULARY (≪ corpus, Heaps-law sublinear), not
    * the corpus, and the final agg is a single row. Counts are exact
    * longs; each coverage ratio is one double division.
    *
    * @return one row (vocab_size, total_tokens, cov_<k>...)
    */
  def vocabCoverage(df: DataFrame, textCol: String,
      ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    val tc = df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok").asc)
    val ranked = tc.select(col("c"), row_number().over(w).as("rank"))
    val covs = ks.map(k =>
      round(sum(when(col("rank") <= k, col("c")).otherwise(0L)).cast("double") /
        sum(col("c")).cast("double"), 6).as(s"cov_$k"))
    ranked.agg(count(lit(1)).as("vocab_size"),
      sum(col("c")).as("total_tokens") +: covs: _*)
  }

  /** Distinct-n diversity per group (distinct-1 / distinct-2 of
    * Li et al. 2016): unique n-gram fraction over all token
    * occurrences in the group — the repetitiveness / mode-collapse
    * audit for a source (synthetic-data batches crater distinct-2
    * long before humans notice). Exact distinct counts here for the
    * oracle; `approx_count_distinct` is the drop-in at 100 TB.
    *
    * @return (group, n_uni, distinct_1, n_big, distinct_2)
    */
  def distinctN(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val uni = df.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("grp").agg(count(lit(1)).as("n_uni"),
        count_distinct(col("tok")).as("d_uni"))
    val w = col("_w")
    val g2 = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val big = df.select(col(groupCol).as("grp"), tokens(col(textCol)).as("_w"))
      .select(col("grp"), explode(array(g2)).as("_g")) // Generate barrier
      .select(col("grp"), explode(col("_g")).as("g"))
      .groupBy("grp").agg(count(lit(1)).as("n_big"),
        count_distinct(col("g")).as("d_big"))
    uni.join(big, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n_uni"),
        round(col("d_uni").cast("double") / col("n_uni"), 6).as("distinct_1"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        when(col("n_big") > 0,
          round(col("d_big").cast("double") / col("n_big"), 6)).as("distinct_2"))
  }

  /** DuckDB replay of [[distinctN]]. */
  def distinctNOracleSql(table: String, groupCol: String,
      textCol: String): String =
    s"""WITH u AS (SELECT $groupCol AS grp, unnest(list_filter(
       |    string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'),
       |    x -> x <> '')) AS tok FROM $table),
       |ua AS (SELECT grp, count(*) AS n_uni, count(DISTINCT tok) AS d_uni
       |  FROM u GROUP BY grp),
       |w AS (SELECT $groupCol AS grp, list_filter(string_split_regex(
       |    lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS wds
       |  FROM $table),
       |b AS (SELECT grp, unnest(CASE WHEN len(wds) >= 2
       |    THEN list_transform(generate_series(1, len(wds) - 1),
       |      i -> wds[i] || ' ' || wds[i+1])
       |    ELSE [] END) AS g FROM w),
       |ba AS (SELECT grp, count(*) AS n_big, count(DISTINCT g) AS d_big
       |  FROM b GROUP BY grp)
       |SELECT ua.grp AS $groupCol, ua.n_uni,
       |  round(ua.d_uni * 1.0::DOUBLE / ua.n_uni, 6) AS distinct_1,
       |  coalesce(ba.n_big, 0) AS n_big,
       |  CASE WHEN ba.n_big > 0
       |    THEN round(ba.d_big * 1.0::DOUBLE / ba.n_big, 6) END AS distinct_2
       |FROM ua LEFT JOIN ba USING (grp)""".stripMargin

  /** DuckDB replay of [[vocabCoverage]]. */
  def vocabCoverageOracleSql(table: String, textCol: String,
      ks: Seq[Int] = Seq(100, 1000, 10000)): String = {
    val covs = ks.map(k =>
      s"round(sum(CASE WHEN rank <= $k THEN c ELSE 0 END) * 1.0::DOUBLE" +
        s" / sum(c), 6) AS cov_$k").mkString(",\n  ")
    s"""WITH tc AS (SELECT tok, count(*) AS c FROM (
       |   SELECT unnest(list_filter(string_split_regex(lower($textCol),
       |     '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS tok FROM $table) t
       |  GROUP BY tok),
       |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rank
       |  FROM tc)
       |SELECT count(*) AS vocab_size, CAST(sum(c) AS BIGINT) AS total_tokens,
       |  $covs
       |FROM r""".stripMargin
  }

  /** Per-document keyword extraction: top-`k` tf-idf terms
    * (weights rounded to 6dp BEFORE the rank so sub-ulp ln
    * differences can't flip the cut; tok-asc tie-break). The
    * retrieval-facing consumer of [[tfidfWeights]]; the rank window
    * partitions by document — corpus-parallel, nothing global.
    */
  def topKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = tfidfWeights(df, idCol, textCol)
      .select(col("id"), col("tok"), round(col("w"), 6).as("w"))
    w.withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(col("w").desc, col("tok").asc)))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("tok"), col("w"))
  }

  /** DuckDB twin of [[topKeywords]]. */
  def topKeywordsOracleSql(table: String, idCol: String, textCol: String,
      k: Int = 3): String =
    s"""WITH base AS (SELECT $idCol AS id,
       |    unnest(list_filter(string_split_regex(lower($textCol),
       |      '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS tok FROM $table),
       |tf AS (SELECT id, tok, CAST(count(*) AS BIGINT) AS tf FROM base
       |  GROUP BY 1, 2),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM $table),
       |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
       |  GROUP BY tok),
       |wt AS (SELECT id, tf.tok,
       |    round(tf * (ln((n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS w
       |  FROM tf JOIN df USING (tok) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY id
       |    ORDER BY w DESC, tok ASC) AS rank FROM wt)
       |SELECT id, CAST(rank AS INT) AS rank, tok, w
       |FROM r WHERE rank <= $k""".stripMargin

  /** Fixed RAKE delimiter stopword set — literal in both engines'
    * regexes, so the phrase split replays exactly. */
  private[graft] val RakeStops: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "for", "on",
      "with", "as", "by", "at", "or", "be", "are", "was", "that",
      "it", "this", "from")

  /** RAKE keyword extraction (Rose et al. 2010) — PHRASE-level
    * keywords, the co-occurrence complement of [[topKeywords]]'
    * single-term tf-idf: candidate phrases are maximal runs between
    * stopword/punctuation delimiters; word score = degree/frequency
    * over the document's phrase instances; phrase score = the sum of
    * its member word scores.
    *
    * Exactness: word scores are half-up integer micro-units
    * ((2·deg·10⁶ + freq) div (2·freq)) and phrase scores exact long
    * sums of them, so the per-document rank (score desc, phrase asc)
    * is engine-portable with no float gate.
    *
    * Scale shape: the corpus is scanned ONCE (lower + two regex
    * replaces + split — all codegen'd row expressions); everything
    * downstream operates on the per-document DISTINCT-phrase table
    * (bounded by text length), shuffling only on (id, phrase) /
    * (id, word) — word stats are derived from phrase counts
    * (freq = Σ n_inst·multiplicity), not from a second corpus pass.
    * The rank window partitions by document — corpus-parallel,
    * nothing global.
    *
    * @return (id, rank, phrase, n_inst, score_micro, score)
    */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, maxWords: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && maxWords >= 1, s"bad k=$k / maxWords=$maxWords")
    val stopsRe = "\\b(" + RakeStops.mkString("|") + ")\\b"
    val cleaned = regexp_replace(
      regexp_replace(lower(col(textCol)), "[.,;:!?]", "|"), stopsRe, "|")
    val inst = df.select(col(idCol).as("id"),
        explode(transform(split(cleaned, "\\|"),
          p => filter(split(p, Ws), x => x =!= ""))).as("toks"))
      .where(size(col("toks")).between(1, maxWords))
      .select(col("id"), array_join(col("toks"), " ").as("phrase"))
    val phr = inst.groupBy("id", "phrase")
      .agg(count(lit(1)).as("n_inst"))
    // word stats FROM the phrase counts (phrase_str -> words is exact:
    // words are non-empty and space-free by construction)
    val pw = phr.select(col("id"), col("phrase"), col("n_inst"),
      size(split(col("phrase"), " ")).cast("long").as("plen"),
      explode(split(col("phrase"), " ")).as("w"))
    val ws = pw.groupBy("id", "w")
      .agg(sum(col("n_inst")).as("freq"),
        sum(col("n_inst") * col("plen")).as("deg"))
      .select(col("id").as("_wid"), col("w").as("_ww"),
        expr("(2 * deg * 1000000 + freq) div (2 * freq)").as("sm"))
    val psc = pw.join(ws,
        pw("id") === col("_wid") && pw("w") === col("_ww"))
      .groupBy(pw("id"), col("phrase"))
      .agg(max(col("n_inst")).as("n_inst"),
        sum(col("sm")).as("score_micro"))
    psc.withColumn("rank", row_number().over(Window.partitionBy("id")
        .orderBy(col("score_micro").desc, col("phrase").asc)))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("phrase"), col("n_inst"),
        col("score_micro"),
        (col("score_micro") / lit(1000000.0)).as("score"))
  }

  /** DuckDB twin of [[rakeKeywords]] — identical delimiter regexes
    * (note DuckDB regexp_replace needs the explicit 'g' flag Spark
    * applies implicitly), identical half-up micro scores.
    */
  def rakeKeywordsOracleSql(table: String, idCol: String,
      textCol: String, k: Int = 5, maxWords: Int = 3): String = {
    // DuckDB string literals do NOT process backslash escapes, so a
    // single backslash reaches the regex engine: '\b' is the word
    // boundary (the Scala "\\b" here renders one backslash).
    val stopsRe = "\\b(" + RakeStops.mkString("|") + ")\\b"
    s"""WITH cleaned AS (SELECT $idCol AS id,
       |    regexp_replace(regexp_replace(lower($textCol),
       |      '[.,;:!?]', '|', 'g'), '$stopsRe', '|', 'g') AS c
       |  FROM $table),
       |inst0 AS (SELECT id, list_filter(string_split_regex(p,
       |      '[ \\t\\n\\f\\r]+'), x -> x <> '') AS toks
       |  FROM (SELECT id, unnest(string_split(c, '|')) AS p
       |    FROM cleaned) s0),
       |inst AS (SELECT id, array_to_string(toks, ' ') AS phrase
       |  FROM inst0 WHERE len(toks) BETWEEN 1 AND $maxWords),
       |phr AS (SELECT id, phrase, CAST(count(*) AS BIGINT) AS n_inst
       |  FROM inst GROUP BY 1, 2),
       |pw AS (SELECT id, phrase, n_inst,
       |    CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen,
       |    unnest(string_split(phrase, ' ')) AS w
       |  FROM phr),
       |ws AS (SELECT id, w,
       |    (2 * sum(n_inst * plen) * 1000000 + sum(n_inst))
       |      // (2 * sum(n_inst)) AS sm
       |  FROM pw GROUP BY 1, 2),
       |psc AS (SELECT pw.id, pw.phrase, max(pw.n_inst) AS n_inst,
       |    sum(ws.sm) AS score_micro
       |  FROM pw JOIN ws ON pw.id = ws.id AND pw.w = ws.w
       |  GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY id
       |    ORDER BY score_micro DESC, phrase ASC) AS rank FROM psc)
       |SELECT id, CAST(rank AS INT) AS rank, phrase, n_inst,
       |  CAST(score_micro AS BIGINT) AS score_micro,
       |  CAST(score_micro AS DOUBLE) / 1e6 AS score
       |FROM r WHERE rank <= $k""".stripMargin
  }

  /** Distinctive terms per domain — the "fightin' words" log-odds
    * z-scores of Monroe, Colaresi & Quinn 2008 (the informed-
    * Dirichlet variant): for each (domain, token), the log-odds
    * delta of the token in the domain vs the REST of the corpus,
    * regularized by a corpus-proportional prior (a0·c_w/T) and
    * standardized by the Monroe variance — the statistically sound
    * "what words characterize this source" table (raw tf-idf or
    * PMI over-ranks rare words; the prior shrinks them).
    *
    * Determinism: counts are exact longs; the ln/sqrt cascade runs
    * in a fixed double order and z rounds to 6dp BEFORE the rank
    * (token-asc ties) — the knnBrute float-gate discipline.
    *
    * Scale shape: one tokenize pass to the (domain, word) count
    * table (map-combined; the only corpus-wide exchange — Catalyst
    * reuses it for the marginals), everything downstream
    * vocab·|domains|-bounded; the rank window partitions by domain.
    *
    * @return (domain, rank, tok, n_domain, n_rest, z) — top `k`
    *         per domain
    */
  def distinctiveTerms(df: DataFrame, domainCol: String,
      textCol: String, k: Int = 5, a0: Double = 500.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && a0 > 0.0, s"bad k=$k / a0=$a0")
    val cdw = df.select(col(domainCol).as("domain"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy("domain", "w").agg(count(lit(1)).as("c"))
    val cw = cdw.groupBy("w").agg(sum("c").as("cw"))
    val td = cdw.groupBy("domain").agg(sum("c").as("tdom"))
    val gl = cw.agg(sum("cw").as("t"))
    val z = cdw.join(cw, "w").join(td, "domain").crossJoin(broadcast(gl))
      .withColumn("aw", lit(a0) * col("cw").cast("double") / col("t"))
      .withColumn("crest", (col("cw") - col("c")).cast("double"))
      .withColumn("trest", (col("t") - col("tdom")).cast("double"))
      .withColumn("delta",
        log((col("c") + col("aw")) /
          (col("tdom").cast("double") + lit(a0) - col("c") - col("aw"))) -
        log((col("crest") + col("aw")) /
          (col("trest") + lit(a0) - col("crest") - col("aw"))))
      .withColumn("variance",
        lit(1.0) / (col("c") + col("aw")) +
        lit(1.0) / (col("crest") + col("aw")))
      .select(col("domain"), col("w").as("tok"),
        col("c").as("n_domain"), col("crest").cast("long").as("n_rest"),
        round(col("delta") / sqrt(col("variance")), 6).as("z"))
    z.withColumn("rank", row_number().over(Window.partitionBy("domain")
        .orderBy(col("z").desc, col("tok").asc)))
      .filter(col("rank") <= k)
      .select(col("domain"), col("rank"), col("tok"), col("n_domain"),
        col("n_rest"), col("z"))
  }

  /** DuckDB replay of [[distinctiveTerms]] — identical tokenizer,
    * prior, double evaluation order, 6dp z gate. */
  def distinctiveTermsOracleSql(table: String, domainCol: String,
      textCol: String, k: Int = 5, a0: Double = 500.0): String =
    s"""WITH cdw AS (SELECT $domainCol AS domain, w,
       |    CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT $domainCol, unnest(list_filter(string_split_regex(
       |      lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w
       |    FROM $table) tk GROUP BY 1, 2),
       |cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM cdw GROUP BY w),
       |td AS (SELECT domain, CAST(sum(c) AS BIGINT) AS tdom
       |  FROM cdw GROUP BY domain),
       |gl AS (SELECT CAST(sum(cw) AS BIGINT) AS t FROM cw),
       |zt AS (SELECT domain, w AS tok, c AS n_domain,
       |    CAST(cw - c AS BIGINT) AS n_rest,
       |    round((ln((c + $a0 * CAST(cw AS DOUBLE) / t) /
       |        (CAST(tdom AS DOUBLE) + $a0 - c
       |          - $a0 * CAST(cw AS DOUBLE) / t))
       |      - ln((CAST(cw - c AS DOUBLE) + $a0 * CAST(cw AS DOUBLE) / t)
       |        / (CAST(t - tdom AS DOUBLE) + $a0 - CAST(cw - c AS DOUBLE)
       |          - $a0 * CAST(cw AS DOUBLE) / t)))
       |      / sqrt(1.0 / (c + $a0 * CAST(cw AS DOUBLE) / t)
       |        + 1.0 / (CAST(cw - c AS DOUBLE)
       |          + $a0 * CAST(cw AS DOUBLE) / t)), 6) AS z
       |  FROM cdw JOIN cw USING (w) JOIN td USING (domain)
       |  CROSS JOIN gl),
       |r AS (SELECT *, row_number() OVER (PARTITION BY domain
       |    ORDER BY z DESC, tok ASC) AS rank FROM zt)
       |SELECT domain, CAST(rank AS INT) AS rank, tok, n_domain,
       |  n_rest, z
       |FROM r WHERE rank <= $k""".stripMargin

  /** TextTiling topic segmentation (Hearst 1997, deterministic
    * variant) — lexical-cohesion boundaries for TOPIC-COHERENT
    * chunking, the semantic upgrade over fixed windows
    * ([[graft.ops.PackOps.chunkTokens]]) for RAG/packing: documents
    * split into `blockTokens`-token pseudo-sentences; at each
    * internal gap the cosine between the two adjacent
    * `windowBlocks`-block bags is scored; a gap is a boundary when
    * its DEPTH (how far cohesion dips below the local peaks on both
    * sides, peaks taken over ±`horizon` gaps — the fixed-horizon
    * determinization of Hearst's hill-climb) exceeds
    * `depthThresholdMicro`.
    *
    * Exactness: bag dot products and norms are exact integer sums;
    * cosine enters the micro grid as round(dot·1e6/sqrt(na·nb))
    * (IEEE sqrt is correctly rounded, the IVF distance discipline),
    * and depth/threshold arithmetic is pure integers after that —
    * engine-portable with no float gate.
    *
    * Scale shape: one tokenize pass; each (block, word, count) row
    * fans out to at most 2·windowBlocks (gap, side) contributions —
    * a constant-factor explode, shuffled on (doc, gap, word), all
    * aggregations map-side combinable; sims/depths live on the
    * per-doc gap table (rows = blocks − 1) and the peak windows
    * partition by document. Nothing global, nothing quadratic.
    *
    * @return (id, gap, sim_micro, depth_micro, is_boundary) — one
    *         row per internal gap
    */
  def topicSegments(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 10, windowBlocks: Int = 2, horizon: Int = 3,
      depthThresholdMicro: Long = 200000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(blockTokens >= 2 && windowBlocks >= 1 && horizon >= 1,
      s"bad blockTokens=$blockTokens/windowBlocks=$windowBlocks/horizon=$horizon")
    val toks = df.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
      .select(col("id"), (col("pos") / blockTokens).cast("long").as("b"),
        col("w"))
    val nb = toks.groupBy("id").agg((max(col("b")) + 1).as("nblocks"))
    val bc = toks.groupBy("id", "b", "w").agg(count(lit(1)).as("c"))
    // block b sits in the LEFT bag of gaps b+1..b+windowBlocks and
    // the RIGHT bag of gaps b-windowBlocks+1..b — one bounded explode
    val contrib = bc.select(col("id"), col("b"), col("w"), col("c"),
        explode(array(
          (1 to windowBlocks).map(o =>
            struct((col("b") + o).as("gap"), lit("L").as("side"))) ++
          (0 until windowBlocks).map(o =>
            struct((col("b") - o).as("gap"), lit("R").as("side"))): _*))
          .as("gs"))
      .select(col("id"), col("gs.gap").as("gap"), col("gs.side").as("side"),
        col("w"), col("c"))
      .join(nb, "id")
      .where(col("gap") >= 1 && col("gap") <= col("nblocks") - 1)
    val bags = contrib.groupBy("id", "gap", "w")
      .agg(sum(when(col("side") === "L", col("c")).otherwise(0L)).as("cl"),
        sum(when(col("side") === "R", col("c")).otherwise(0L)).as("cr"))
    val sims = bags.groupBy("id", "gap")
      .agg(sum(col("cl") * col("cr")).as("dot"),
        sum(col("cl") * col("cl")).as("na"),
        sum(col("cr") * col("cr")).as("nb2"))
      .select(col("id"), col("gap"),
        when(col("na") === 0L || col("nb2") === 0L, lit(0L))
          .otherwise(round(col("dot").cast("double") * 1e6 /
            sqrt((col("na") * col("nb2")).cast("double")), 0)
            .cast("long")).as("sim_micro"))
    val wl = Window.partitionBy("id").orderBy("gap")
      .rowsBetween(-horizon, 0)
    val wr = Window.partitionBy("id").orderBy("gap")
      .rowsBetween(0, horizon)
    sims
      .withColumn("_pl", max("sim_micro").over(wl))
      .withColumn("_pr", max("sim_micro").over(wr))
      .select(col("id"), col("gap"), col("sim_micro"),
        (col("_pl") - col("sim_micro") + col("_pr") - col("sim_micro"))
          .as("depth_micro"))
      .withColumn("is_boundary",
        (col("depth_micro") > depthThresholdMicro).cast("int"))
      .orderBy("id", "gap")
  }

  /** DuckDB replay of [[topicSegments]] — identical tokenizer, bag
    * fan-out, integer moments, micro cosine, peak windows.
    */
  def topicSegmentsOracleSql(table: String, idCol: String,
      textCol: String, blockTokens: Int = 10, windowBlocks: Int = 2,
      horizon: Int = 3, depthThresholdMicro: Long = 200000L): String = {
    val lefts = (1 to windowBlocks).map(o =>
      s"SELECT id, b + $o AS gap, 'L' AS side, w, c FROM bc")
    val rights = (0 until windowBlocks).map(o =>
      s"SELECT id, b - $o AS gap, 'R' AS side, w, c FROM bc")
    val fan = (lefts ++ rights).mkString("\n  UNION ALL ")
    s"""WITH toks AS (SELECT $idCol AS id, (pos - 1) // $blockTokens AS b, w
       |  FROM (SELECT $idCol,
       |      unnest(list_filter(string_split_regex(lower($textCol),
       |        '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w,
       |      generate_subscripts(list_filter(string_split_regex(
       |        lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> ''), 1)
       |        AS pos
       |    FROM $table) t),
       |nb AS (SELECT id, max(b) + 1 AS nblocks FROM toks GROUP BY id),
       |bc AS (SELECT id, b, w, CAST(count(*) AS BIGINT) AS c
       |  FROM toks GROUP BY 1, 2, 3),
       |contrib AS (SELECT f.id, f.gap, f.side, f.w, f.c
       |  FROM ($fan) f JOIN nb ON f.id = nb.id
       |  WHERE f.gap >= 1 AND f.gap <= nb.nblocks - 1),
       |bags AS (SELECT id, gap, w,
       |    CAST(sum(CASE WHEN side = 'L' THEN c ELSE 0 END) AS BIGINT)
       |      AS cl,
       |    CAST(sum(CASE WHEN side = 'R' THEN c ELSE 0 END) AS BIGINT)
       |      AS cr
       |  FROM contrib GROUP BY 1, 2, 3),
       |sims AS (SELECT id, gap,
       |    CASE WHEN sum(cl * cl) = 0 OR sum(cr * cr) = 0 THEN 0
       |      ELSE CAST(round(CAST(sum(cl * cr) AS DOUBLE) * 1e6 /
       |        sqrt(CAST(sum(cl * cl) * sum(cr * cr) AS DOUBLE)), 0)
       |        AS BIGINT) END AS sim_micro
       |  FROM bags GROUP BY 1, 2),
       |d AS (SELECT id, gap, sim_micro,
       |    max(sim_micro) OVER (PARTITION BY id ORDER BY gap
       |      ROWS BETWEEN $horizon PRECEDING AND CURRENT ROW)
       |      - sim_micro
       |    + max(sim_micro) OVER (PARTITION BY id ORDER BY gap
       |      ROWS BETWEEN CURRENT ROW AND $horizon FOLLOWING)
       |      - sim_micro AS depth_micro
       |  FROM sims)
       |SELECT id, CAST(gap AS BIGINT) AS gap, sim_micro, depth_micro,
       |  CAST(depth_micro > $depthThresholdMicro AS INT) AS is_boundary
       |FROM d ORDER BY id, gap""".stripMargin
  }

  /** Declared-language vs dominant-script mismatch audit: the
    * dominant script by exact integer character counts (count desc,
    * fixed script-order tie-break), cross-tabulated per language with
    * the expected script — the mislabel detector for a multilingual
    * crawl. Zero-shuffle scan + one bounded aggregation.
    */
  def scriptMismatch(df: DataFrame, langCol: String, textCol: String,
      expected: Map[String, String]): DataFrame = {
    val t = col(textCol)
    val scripts = Seq(
      "latin" -> "[A-Za-z]", "cyrillic" -> "[Ѐ-ӿ]",
      "greek" -> "[Ͱ-Ͽ]", "arabic" -> "[؀-ۿ]",
      "devanagari" -> "[ऀ-ॿ]", "cjk" -> "[一-鿿]",
      "kana" -> "[぀-ヿ]", "hangul" -> "[가-힯]")
    val counts = scripts.map { case (nm, re) =>
      nm -> regexp_count(t, lit(re))
    }
    val dominant = counts.zipWithIndex.foldRight(lit(counts.last._1)) {
      case (((nm, c), i), rest) =>
        val laters = counts.drop(i + 1).map(_._2)
        if (laters.isEmpty) rest
        else when(laters.map(c >= _).reduce(_ && _), lit(nm)).otherwise(rest)
    }
    val exp = expected.foldRight(lit("unknown"): Column) {
      case ((l, s), rest) => when(col(langCol) === l, lit(s)).otherwise(rest)
    }
    df.select(col(langCol).as("lang"), dominant.as("dominant_script"),
        exp.as("expected_script"))
      .groupBy("lang", "dominant_script", "expected_script")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_mismatch",
        (col("dominant_script") =!= col("expected_script")).cast("int"))
  }

  /** Next-token top-1 accuracy of the corpus bigram model on its own
    * training data: the majority-follower per token (count desc,
    * token asc tie-break — a vocab-scale window) scored against every
    * bigram occurrence, count-weighted. Exact integers end to end
    * (accuracy as half-up ppm) — the sanity-eval a tiny LM gets
    * before perplexity tuning means anything. Corpus work: one
    * bigram aggregation; everything after is model-scale.
    */
  def nextTokenAccuracy(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = col("_w")
    // explode(array(..)) Generate barrier between the tokenizer and
    // the per-bigram lambda — without it Catalyst collapses the
    // projections and re-runs the full regex split per element
    // (O(len²)/doc; the wordShingles trap — measured 14s → ~1s here).
    val bg = when(size(w) >= 2, transform(sequence(lit(1), size(w) - 1),
      i => struct(element_at(w, i).as("w1"),
        element_at(w, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val bi = docs.select(tokens(col(textCol)).as("_w0"))
      .select(explode(array(col("_w0"))).as("_w"))
      .select(explode(bg).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val best = bi.withColumn("rn", row_number().over(
        Window.partitionBy("w1").orderBy(col("n").desc, col("w2").asc)))
      .filter(col("rn") === 1)
      .select(col("w1"), col("w2").as("best"))
    val sc = bi.join(best, "w1")
      .agg(sum("n").as("n_bigrams"),
        sum(when(col("w2") === col("best"), col("n")).otherwise(0L))
          .as("n_correct"))
    val num = col("n_correct") * 2000000L + col("n_bigrams")
    val den = col("n_bigrams") * 2
    sc.select(col("n_bigrams"), col("n_correct"),
      ((num - pmod(num, den)) / den).cast("long").as("acc_ppm"))
  }

  /** DuckDB twin of [[nextTokenAccuracy]]. */
  def nextTokenAccuracyOracleSql(table: String, textCol: String): String =
    s"""WITH t AS (SELECT list_filter(string_split_regex(lower($textCol),
       |    '[ \\t\\n\\f\\r]+'), x -> x <> '') AS w FROM $table),
       |bg AS (SELECT w[i] AS w1, w[i + 1] AS w2
       |  FROM t, unnest(generate_series(1, len(w) - 1)) AS u(i)
       |  WHERE len(w) >= 2),
       |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg
       |  GROUP BY 1, 2),
       |best AS (SELECT w1, w2 AS best FROM (
       |  SELECT *, row_number() OVER (PARTITION BY w1
       |    ORDER BY n DESC, w2 ASC) AS rn FROM bi) WHERE rn = 1),
       |sc AS (SELECT CAST(sum(n) AS BIGINT) AS n_bigrams,
       |    CAST(sum(CASE WHEN w2 = best THEN n ELSE 0 END) AS BIGINT)
       |      AS n_correct
       |  FROM bi JOIN best USING (w1))
       |SELECT n_bigrams, n_correct,
       |  CAST((n_correct * 2000000 + n_bigrams) // (n_bigrams * 2)
       |    AS BIGINT) AS acc_ppm
       |FROM sc""".stripMargin

  /** Gini coefficient of the token-frequency distribution — the
    * vocabulary-inequality number behind "is this corpus a few
    * boilerplate phrases or a real language sample" (0 = uniform,
    * →1 = a handful of tokens dominate). Exact integer sufficient
    * statistics end to end: with counts c_i sorted (count asc, token
    * asc) and 1-based rank i, Gini = (2·Σi·c_i − (n+1)·T) / (n·T) —
    * every sum is a long, the single division is the only float op.
    * The rank window runs over the VOCABULARY (model-scale frame,
    * same contract as q182's distinct-score window), never the
    * corpus.
    */
  def tokenGini(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").asc, col("tok").asc)
    tc.withColumn("i", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("vocab_size"), sum("c").as("total_tokens"),
        sum(col("i") * col("c")).as("s"))
      .select(col("vocab_size"), col("total_tokens"),
        round((lit(2L) * col("s")
            - (col("vocab_size") + 1) * col("total_tokens")).cast("double")
          / (col("vocab_size") * col("total_tokens")).cast("double"), 6)
          .as("gini"))
  }

  /** DuckDB twin of [[tokenGini]]. */
  def tokenGiniOracleSql(table: String, textCol: String): String =
    s"""WITH tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
       |   SELECT unnest(list_filter(string_split_regex(lower($textCol),
       |     '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS tok FROM $table) t
       |  GROUP BY tok),
       |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c ASC, tok ASC)
       |    AS BIGINT) AS i FROM tc)
       |SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       |  CAST(sum(c) AS BIGINT) AS total_tokens,
       |  round(CAST(2 * sum(i * c) - (count(*) + 1) * sum(c) AS DOUBLE)
       |    / CAST(count(*) * sum(c) AS DOUBLE), 6) AS gini
       |FROM r""".stripMargin

  /** Sentence array via an engine-portable split: terminator+space
    * becomes terminator+ (RE2 has no lookbehind, so the
    * lookbehind spelling would have no DuckDB twin), then split on
    * the marker; empties dropped.
    */
  private def sentences(textCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    filter(split(regexp_replace(textCol, "([.!?])[ \\t\\n\\f\\r]+", "$1\u0001"),
      "\u0001"), s => length(s) > 0)

  /** Sentence-aware chunking for RAG/context assembly: windows of
    * `size` sentences advancing by `size - overlap`, per-chunk
    * sentence count and character length (joined by single spaces —
    * the reassembly contract). The token-window chunker's (q74)
    * boundary-respecting twin: chunks never cut mid-sentence. Pure
    * per-row transform + one explode — zero shuffles, corpus-linear.
    */
  def sentenceChunks(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 3, overlap: Int = 1): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    val sent = sentences(col(textCol))
    val chunks = transform(
      sequence(lit(1), greatest(size_(sent), lit(1)), lit(step)),
      i => struct(i.as("start"),
        slice(sent, i, lit(size)).as("ss")))
    docs.select(col(idCol).as("doc_id"), explode(chunks).as("c"))
      .filter(size_(col("c.ss")) > 0)
      .select(col("doc_id"), col("c.start").cast("int").as("start_sent"),
        size_(col("c.ss")).as("n_sent"),
        length(array_join(col("c.ss"), " ")).as("n_chars"))
  }

  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  /** DuckDB replay of [[sentenceChunks]]. */
  def sentenceChunksOracleSql(table: String, idCol: String,
      textExpr: String, size: Int = 3, overlap: Int = 1): String = {
    val step = size - overlap
    s"""WITH s AS (SELECT $idCol AS doc_id,
       |  list_filter(string_split(regexp_replace($textExpr,
       |    '([.!?])[ \\t\\n\\f\\r]+', '\\1' || chr(1), 'g'), chr(1)),
       |    x -> length(x) > 0) AS sent
       |  FROM $table),
       |c AS (SELECT doc_id,
       |  unnest(list_transform(generate_series(1, greatest(len(sent), 1),
       |    $step), i -> {start: i, ss: sent[i:i+${size - 1}]}),
       |    recursive := true)
       |  FROM s)
       |SELECT doc_id, CAST(start AS INT) AS start_sent,
       |  CAST(len(ss) AS INT) AS n_sent,
       |  CAST(length(array_to_string(ss, ' ')) AS INT) AS n_chars
       |FROM c WHERE len(ss) > 0""".stripMargin
  }

  /** Corpus readability per language: exact integer totals (docs,
    * sentences, words, word chars) and a Flesch–Kincaid-shaped grade
    * computed on the AGGREGATE ratios — per-doc float means would be
    * partition-order-dependent; integer sums are not. chars/word
    * stands in for syllables/word (no dictionary): grade =
    * 0.39·(words/sentence) + 11.8·(chars/word/3) − 15.59, 4dp.
    */
  def readabilityByGroup(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val sent = sentences(col(textCol))
    val words = filter(split(col(textCol), "[ \\t\\n\\f\\r]+"), s => length(s) > 0)
    val g = docs.select(col(groupCol).as("grp"),
        size_(sent).cast("long").as("ns"),
        size_(words).cast("long").as("nw"),
        aggregate(transform(words, w => length(w).cast("long")),
          lit(0L), _ + _).as("wc"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum("ns").as("n_sent"),
        sum("nw").as("n_words"), sum("wc").as("n_word_chars"))
    g.select(col("grp"), col("n_docs"), col("n_sent"), col("n_words"),
      round(lit(0.39) * (col("n_words").cast("double")
          / greatest(col("n_sent"), lit(1L)).cast("double"))
        + lit(11.8) * (col("n_word_chars").cast("double")
          / greatest(col("n_words"), lit(1L)).cast("double") / 3.0)
        - 15.59, 4).as("grade"))
  }

  /** DuckDB replay of [[readabilityByGroup]]. */
  def readabilityOracleSql(table: String, textExpr: String,
      groupCol: String): String =
    s"""WITH d AS (SELECT $groupCol AS grp,
       |  len(list_filter(string_split(regexp_replace($textExpr,
       |    '([.!?])[ \\t\\n\\f\\r]+', '\\1' || chr(1), 'g'), chr(1)),
       |    x -> length(x) > 0)) AS ns,
       |  list_filter(string_split_regex($textExpr, '[ \\t\\n\\f\\r]+'),
       |    x -> length(x) > 0) AS w
       |  FROM $table),
       |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(ns) AS BIGINT) AS n_sent,
       |  CAST(sum(len(w)) AS BIGINT) AS n_words,
       |  CAST(sum(list_sum(list_transform(w, x -> length(x)))) AS BIGINT)
       |    AS n_word_chars
       | FROM d GROUP BY grp)
       |SELECT grp, n_docs, n_sent, n_words,
       |  round(0.39 * (CAST(n_words AS DOUBLE)
       |      / CAST(greatest(n_sent, 1) AS DOUBLE))
       |    + 11.8 * (CAST(n_word_chars AS DOUBLE)
       |      / CAST(greatest(n_words, 1) AS DOUBLE) / 3.0)
       |    - 15.59, 4) AS grade
       |FROM g""".stripMargin

  /** Chao1 vocabulary-richness estimate: how many distinct terms the
    * corpus REALLY has, including the ones sampling hasn't surfaced —
    * from the singleton/doubleton counts of the term-frequency
    * histogram (the abundance-based sibling of q269's Good–Turing
    * unseen MASS; Chao1 estimates unseen TYPES):
    *
    *   Ŝ = S_obs + f₁(f₁−1) / (2(f₂+1))   (bias-corrected)
    *
    * The "is our vocab table complete" check before freezing a
    * tokenizer. One term-count aggregation + one 3-number fold;
    * exact longs into one IEEE division.
    *
    * @return (s_obs, f1, f2, chao1 round 2dp)
    */
  def chao1Vocab(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("s_obs"),
        sum((col("c") === 1).cast("long")).as("f1"),
        sum((col("c") === 2).cast("long")).as("f2"))
      .select(col("s_obs"), col("f1"), col("f2"),
        round(col("s_obs").cast("double")
          + (col("f1") * (col("f1") - 1)).cast("double")
            / (lit(2.0) * (col("f2") + 1).cast("double")), 2)
          .as("chao1"))

  /** DuckDB replay of [[chao1Vocab]]. */
  def chao1OracleSql(table: String, textCol: String): String =
    s"""WITH tf AS (SELECT term, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(list_filter(string_split_regex(
       |      lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS term
       |    FROM $table) t
       |  GROUP BY term),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS s_obs,
       |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
       |  FROM tf)
       |SELECT s_obs, f1, f2,
       |  round(CAST(s_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE)
       |    / (2.0 * CAST(f2 + 1 AS DOUBLE)), 2) AS chao1
       |FROM agg""".stripMargin
}
