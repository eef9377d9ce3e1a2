package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018 — the SentencePiece
  * algorithm family): the OTHER production tokenizer, next to BPE
  * (ops/BpeOps.scala). Three operators:
  *
  *  - [[fitUnigram]]: distributed EM over the corpus word table —
  *    seed vocabulary from substring frequencies, then fixed-round
  *    expectation-maximization where the E-step (per-word
  *    forward–backward) runs as a native expression over the
  *    word-count table and expected counts aggregate EXACTLY
  *    (micro-unit longs → decimal sums — associative, so the fit is
  *    bit-identical under any partitioning; same discipline as
  *    QualityFit's decimal Gram sums).
  *  - [[unigramEncode]]: Viterbi (max-likelihood) segmentation of
  *    each document under a fitted model — per-row native
  *    expression, zero shuffle.
  *  - [[greedyEncode]]: greedy longest-match segmentation (the
  *    WordPiece-style inference rule) under the frozen
  *    [[DefaultVocab]] — deterministic and SQL-replayable, so it
  *    carries the family's DuckDB oracle ([[greedyOracleSql]])
  *    exactly as BPE's frozen-merges encode carries q80's.
  *
  * Model-vs-data split (the repo's BPE/QualityFit discipline): the
  * corpus collapses once into a word-frequency table (map-side
  * combined, word-vocab-bounded); everything iterative happens
  * against that table with the piece model riding as a foldable
  * literal; only piece-vocab-bounded aggregates are ever collected.
  *
  * Scale shape of fit at 100 TB: one corpus scan (word counts);
  * per-EM-round one scan of the WORD table (vocab-scale, not
  * corpus-scale) + one piece-keyed aggregation of bounded width.
  * Encode is a zero-shuffle per-row scan with an LRU word cache
  * (Zipfian head stays resident).
  */
object UnigramOps {

  /** Maximum piece length considered anywhere (seeding, EM, Viterbi,
    * greedy) — part of the model contract.
    */
  val MaxPieceLen = 6

  /** Log-prob floor for a single character absent from the model:
    * forces coverage (any word segments) without letting unknown
    * chars outscore real pieces.
    */
  val UnkLogProb: Double = -1e9

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  private def sparkLower(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).toLowerCase.toString

  private[graft] def words(text: String): Iterator[String] =
    sparkLower(text).split("[ \t\n\f\r]+").iterator.filter(_.nonEmpty)

  // ------------------------------------------------------------ model

  /** Piece → probability (linear space, normalized over the vocab).
    * `logProb` adds the single-char UNK floor for coverage.
    */
  final class UnigramModel(val probs: Map[String, Double], val maxLen: Int)
      extends Serializable {
    val logs: Map[String, Double] = probs.map { case (k, v) => k -> math.log(v) }
    def prob(s: String): Double = probs.getOrElse(s, 0.0)
    def logProb(s: String): Double = logs.get(s) match {
      case Some(l) => l
      case None => if (s.length == 1) UnkLogProb else Double.NegativeInfinity
    }
  }

  /** Literal codec: one "piece prob" string per piece (pieces come
    * from whitespace-split words, so the space separator is
    * unambiguous; Double.toString round-trips exactly).
    */
  def modelToEntries(m: UnigramModel): Seq[String] =
    m.probs.toSeq.sortBy(_._1).map { case (p, pr) => s"$p $pr" }

  def modelFromEntries(entries: Seq[String], maxLen: Int = MaxPieceLen)
      : UnigramModel = {
    val probs = entries.map { s =>
      val cut = s.lastIndexOf(' ')
      require(cut > 0, s"unigram model entry '$s' is not 'piece prob'")
      s.substring(0, cut) -> java.lang.Double.parseDouble(s.substring(cut + 1))
    }.toMap
    new UnigramModel(probs, maxLen)
  }

  // ----------------------------------------- scalar reference kernels

  /** E-step for one word: expected count of every piece under the
    * current model, via forward–backward over all segmentations.
    * Deterministic: fixed (position, length) accumulation order.
    * Linear-space doubles are safe — words are whitespace tokens
    * (≤ ~50 chars), far above the double underflow threshold.
    */
  private[graft] def expectedCounts(word: String, model: UnigramModel)
      : Seq[(String, Double)] = {
    val n = word.length
    val L = model.maxLen
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(L, j)) {
        val p = pieceProb(word.substring(j - l, j), model)
        if (p > 0.0) alpha(j) += alpha(j - l) * p
        l += 1
      }
      j += 1
    }
    val z = alpha(n)
    if (z <= 0.0) return Seq.empty
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= math.min(L, n - i)) {
        val p = pieceProb(word.substring(i, i + l), model)
        if (p > 0.0) beta(i) += p * beta(i + l)
        l += 1
      }
      i -= 1
    }
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    i = 0
    while (i < n) {
      var l = 1
      while (l <= math.min(L, n - i)) {
        val piece = word.substring(i, i + l)
        val p = pieceProb(piece, model)
        if (p > 0.0) {
          val e = alpha(i) * p * beta(i + l) / z
          acc.update(piece, acc.getOrElse(piece, 0.0) + e)
        }
        l += 1
      }
      i += 1
    }
    acc.toSeq
  }

  /** Model prob with the UNK-char floor in LINEAR space (e^-1e9
    * underflows to 0, which would break coverage in forward–backward,
    * so unknown single chars get a tiny-but-positive stand-in).
    */
  private def pieceProb(s: String, model: UnigramModel): Double = {
    val p = model.prob(s)
    if (p > 0.0) p
    else if (s.length == 1) 1e-100
    else 0.0
  }

  /** Viterbi (max log-prob) segmentation of one word. Ties break to
    * the LONGER piece ending at each position (fixed ascending-length
    * sweep with >=), so the result is deterministic.
    */
  private[graft] def viterbiWord(word: String, model: UnigramModel)
      : List[String] = {
    val n = word.length
    if (n == 0) return Nil
    val L = model.maxLen
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bl = new Array[Int](n + 1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(L, j)) {
        val lp = model.logProb(word.substring(j - l, j))
        if (!lp.isNegInfinity && best(j - l) + lp >= best(j)) {
          best(j) = best(j - l) + lp
          bl(j) = l
        }
        l += 1
      }
      j += 1
    }
    var out = List.empty[String]
    var pos = n
    while (pos > 0) {
      val l = bl(pos)
      out = word.substring(pos - l, pos) :: out
      pos -= l
    }
    out
  }

  private[graft] def viterbiEncode(text: String, model: UnigramModel,
      cache: java.util.Map[String, List[String]]): Seq[String] =
    words(text).flatMap { w =>
      if (cache == null) viterbiWord(w, model)
      else {
        var r = cache.get(w)
        if (r == null) { r = viterbiWord(w, model); cache.put(w, r) }
        r
      }
    }.toSeq

  /** Greedy longest-match segmentation (WordPiece inference): at each
    * position take the longest vocab piece (≤ maxLen); no match →
    * emit the single character. Deterministic by construction and
    * SQL-replayable ([[greedyOracleSql]]).
    */
  private[graft] def greedyWord(word: String, vocab: Set[String],
      maxLen: Int): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    val n = word.length
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var hit = 1
      var found = false
      while (l >= 1 && !found) {
        if (vocab.contains(word.substring(i, i + l))) { hit = l; found = true }
        l -= 1
      }
      out += word.substring(i, i + hit)
      i += hit
    }
    out.toList
  }

  private[graft] def greedyEncode(text: String, vocab: Set[String],
      maxLen: Int, cache: java.util.Map[String, List[String]]): Seq[String] =
    words(text).flatMap { w =>
      if (cache == null) greedyWord(w, vocab, maxLen)
      else {
        var r = cache.get(w)
        if (r == null) { r = greedyWord(w, vocab, maxLen); cache.put(w, r) }
        r
      }
    }.toSeq

  // -------------------------------------------------------------- fit

  /** In-memory reference fit over a word-frequency dictionary — the
    * differential-spec twin of [[fitUnigram]] (same seeding, same EM
    * micro-unit rounding, same prune; no Spark).
    */
  private[graft] def fitOnDict(wordFreq: Seq[(String, Long)], vocabSize: Int,
      seedCap: Int, maxLen: Int, iters: Int, minCount: Long)
      : Seq[(String, Double)] = {
    // Seed: substring frequencies (all occurrences, weighted).
    val freq = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- wordFreq; i <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - i)) {
      val p = w.substring(i, i + l)
      freq.update(p, freq.getOrElse(p, 0L) + c)
    }
    val singles = freq.keys.filter(_.length == 1).toSeq.sorted
    val multis = freq.toSeq
      .filter { case (p, c) => p.length > 1 && c >= minCount }
      .sortBy { case (p, c) => (-c, p) }.take(seedCap).map(_._1)
    var probs: Map[String, Double] = {
      val seed = (singles ++ multis).map(p => p -> freq(p))
      val tot = seed.map(_._2).sum.toDouble
      seed.map { case (p, c) => p -> c / tot }.toMap
    }
    for (_ <- 1 to iters) {
      val micro = scala.collection.mutable.HashMap.empty[String, BigInt]
      val model = new UnigramModel(probs, maxLen)
      for ((w, c) <- wordFreq; (piece, e) <- expectedCounts(w, model)) {
        val m = BigInt(math.round(e * 1e6)) * c
        micro.update(piece, micro.getOrElse(piece, BigInt(0)) + m)
      }
      val total = micro.values.sum
      probs = micro.toMap.collect {
        case (p, m) if m > 0 =>
          p -> (BigDecimal(m) / BigDecimal(total)).toDouble
      }
      // Singles must survive EM with SOME mass for coverage.
      for (s <- singles if !probs.contains(s)) probs += s -> 1e-12
    }
    // Prune: all singles + best multis; renormalize in piece order.
    val keptSingles = probs.keys.filter(_.length == 1).toSeq.sorted
    val keptMultis = probs.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, pr) => (-pr, p) }
      .take(math.max(0, vocabSize - keptSingles.size)).map(_._1)
    val kept = (keptSingles ++ keptMultis).sorted
    val tot = kept.map(probs).sum
    kept.map(p => p -> r6(math.log(probs(p) / tot)))
  }

  /** Distributed unigram-LM fit. Output: one row per kept piece —
    * (piece, piece_len, logprob 6dp, rank by logprob desc / piece
    * asc). Deterministic under any partitioning: expected counts
    * round to micro-unit longs per (word, piece) BEFORE the
    * piece-keyed decimal aggregation (exact, associative), and every
    * driver-side reduction runs in sorted piece order.
    *
    * `df`'s text column is tokenized with the repo-wide whitespace
    * rule (TextOps.tokens). The word table persists across the seed
    * pass + `iters` E-steps, then unpersists.
    */
  def fitUnigram(df: DataFrame, textCol: String, vocabSize: Int = 400,
      seedCap: Int = 2000, maxLen: Int = MaxPieceLen, iters: Int = 4,
      minCount: Long = 2L, maxSeedCollect: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    fitUnigramTrace(df, textCol, vocabSize, seedCap, maxLen, iters,
      minCount, maxSeedCollect).rows
      .toDF("piece", "piece_len", "logprob", "rank")
  }

  /** Full fit PLUS the two artifacts the q173 dynamic oracle needs:
    * the model entries fed to the LAST E-step and that step's exact
    * per-piece micro-unit sums. The oracle generator
    * ([[fitOracleSql]]) embeds both, so DuckDB can replay the last
    * E-step from the DATA and gate the embedded final rows on its
    * independently-aggregated integers matching (the q174/q124
    * frozen-literal trust split).
    */
  private[graft] case class UnigramFitTrace(
      preEntries: Seq[String],
      lastMicroSums: Seq[(String, BigInt)],
      rows: Seq[(String, Int, Double, Int)])

  private[graft] def fitUnigramTrace(df: DataFrame, textCol: String,
      vocabSize: Int, seedCap: Int, maxLen: Int, iters: Int,
      minCount: Long, maxSeedCollect: Int): UnigramFitTrace = {
    val spark = df.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val wordTable = df
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ---- seed: weighted substring frequencies, top-capped
      val wCol = col("w")
      val subs = flatten(transform(sequence(lit(0), length(wCol) - 1), i =>
        transform(sequence(lit(1), least(lit(maxLen), length(wCol) - i)),
          l => wCol.substr(i + 1, l))))
      val pieceFreq = wordTable
        .select(explode(subs).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum("cnt").as("freq"))
      val singles = pieceFreq.filter(length(col("piece")) === 1)
        .orderBy("piece").limit(maxSeedCollect)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val multis = pieceFreq
        .filter(length(col("piece")) > 1 && col("freq") >= minCount)
        .orderBy(col("freq").desc, col("piece")).limit(seedCap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      require(singles.length < maxSeedCollect,
        s"fitUnigram: single-char alphabet exceeded $maxSeedCollect")
      var probs: Map[String, Double] = {
        val seed = singles ++ multis
        val tot = seed.map(_._2).sum.toDouble
        seed.map { case (p, c) => p -> c / tot }.toMap
      }
      val singleSet = singles.map(_._1)
      // ---- EM rounds: native per-word E-step, exact aggregation
      var lastEntries: Seq[String] = Seq.empty
      var lastSums: Seq[(String, BigInt)] = Seq.empty
      for (_ <- 1 to iters) {
        val entries = modelToEntries(new UnigramModel(probs, maxLen))
        val expect = call_function("graft_unigram_expect", col("w"),
          array(entries.map(lit): _*))
        val sums = wordTable
          .select(explode(expect).as(Seq("piece", "micro")), col("cnt"))
          .groupBy("piece")
          .agg(sum(col("micro").cast("decimal(28,0)") * col("cnt"))
            .as("m"))
          .collect().map(r => (r.getString(0), BigInt(r.getDecimal(1).toBigInteger)))
          .sortBy(_._1)
        lastEntries = entries
        lastSums = sums
        val total = sums.map(_._2).sum
        probs = sums.collect {
          case (p, m) if m > 0 => p -> (BigDecimal(m) / BigDecimal(total)).toDouble
        }.toMap
        for (s <- singleSet if !probs.contains(s)) probs += s -> 1e-12
      }
      // ---- prune + renormalize + rank
      val keptSingles = probs.keys.filter(_.length == 1).toSeq.sorted
      val keptMultis = probs.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, pr) => (-pr, p) }
        .take(math.max(0, vocabSize - keptSingles.size)).map(_._1)
      val kept = (keptSingles ++ keptMultis).sorted
      val tot = kept.map(probs).sum
      val rows = kept.map(p => (p, p.length, r6(math.log(probs(p) / tot))))
        .sortBy { case (p, _, lp) => (-lp, p) }
        .zipWithIndex
        .map { case ((p, len, lp), i) => (p, len, lp, i + 1) }
      UnigramFitTrace(lastEntries, lastSums, rows)
    } finally {
      wordTable.unpersist()
    }
  }

  /** q173's registered parameterization — ONE definition shared by
    * the query (PipelineTextQueries) and the dynamic oracle generator
    * (Verify), so they can never drift apart. */
  def q173Fit(df: DataFrame): DataFrame =
    fitUnigram(df, "text", vocabSize = 120, seedCap = 600, iters = 3,
      minCount = 2)

  private[graft] def q173Trace(df: DataFrame): UnigramFitTrace =
    fitUnigramTrace(df, "text", vocabSize = 120, seedCap = 600,
      maxLen = MaxPieceLen, iters = 3, minCount = 2L,
      maxSeedCollect = 1 << 20)

  /** Fitted-model Column encode: Viterbi pieces for a text column via
    * the native `graft_unigram_encode` expression (model rides as a
    * foldable "piece logprob" literal array). Zero shuffle.
    */
  def unigramEncode(text: Column, entries: Seq[String]): Column =
    call_function("graft_unigram_encode", text, array(entries.map(lit): _*))

  /** Entries ("piece prob") for [[unigramEncode]] from a fitted frame
    * ([[fitUnigram]] output): logprob column converts back to linear
    * probability. Driver-side; the frame is vocab-bounded.
    */
  def entriesFromFit(fit: DataFrame): Seq[String] =
    fit.select("piece", "logprob").collect()
      .map(r => (r.getString(0), math.exp(r.getDouble(1))))
      .sortBy(_._1)
      .map { case (p, pr) => s"$p $pr" }.toSeq

  /** Greedy longest-match Column encode under a piece vocabulary
    * (space-joined literal — pieces come from whitespace-split words, so space is unambiguous).
    */
  def greedyEncodeCol(text: Column, vocab: Seq[String]): Column =
    call_function("graft_greedy_pieces", text,
      lit(vocab.mkString(" ")))

  // ------------------------------------------- frozen vocab + oracle

  /** Frozen greedy-encode vocabulary (the BPE DefaultMerges
    * discipline: a compile-time model makes the encode
    * cross-engine-replayable). Derived once from a unigram fit on the
    * sf0.001 documents table; hand-pinned here so the oracle and the
    * expression share one constant. Single ASCII chars are implicit
    * fallbacks (greedy emits the char when nothing matches).
    */
  val DefaultVocab: Seq[String] = Seq(
    "stream", "window", "vector", "column", "table", "batch", "query",
    "merge", "spark", "group", "order", "value", "join", "data", "hash",
    "scan", "sort", "fast", "slow", "filt", "part", "agg", "row", "key",
    "the", "er", "in", "on", "at", "or", "an", "al", "ed", "es", "ing")

  /** Frozen unigram model ("piece prob" entries) for the Viterbi
    * encode query — generated once by [[fitUnigram]] (vocabSize 80,
    * seedCap 400, iters 3, minCount 2) on the sf0.001 documents
    * table and pinned here, the BPE DefaultMerges discipline: encode
    * benchmarks measure INFERENCE, not a refit, and stay
    * deterministic across scale factors.
    */
  val DefaultUnigramEntries: Seq[String] = Seq(
    "a 0.03229732078586252", "agg 0.03305679950356889", "b 1.0000001159285544E-12",
    "batch 0.03156643204696954", "big 0.030872668532582234", "c 1.0000001159285544E-12",
    "column 0.03392523996123501", "cu 3.836246693224587E-5", "cus 3.6573851967467356E-5",
    "cust 3.839328436473564E-5", "custo 6.722064818362224E-4", "custom 0.030052452721019387",
    "d 1.0000001159285544E-12", "dat 1.1810708866319398E-6", "data 0.031079619380572653",
    "dup 0.0010059639931928113", "e 3.083797351625214E-8", "er 0.030052813352615823",
    "f 1.0000001159285544E-12", "fast 0.03167051997599699", "filt 1.5904637668365945E-7",
    "filter 0.03180909575701511", "g 1.0000001159285544E-12", "gg 1.256205360124041E-6",
    "group 0.03239895855709492", "h 1.0000001159285544E-12", "hash 0.03201739276281571",
    "i 1.0000001159285544E-12", "j 1.0000001159285544E-12", "join 0.03246833410014054",
    "k 1.0000001159285544E-12", "key 0.032780547616320474", "l 1.0000001159285544E-12",
    "line 0.03281521497362158", "m 6.167599757226645E-8", "mer 6.721755610492413E-4",
    "merge 0.032433643996151625", "n 1.0000001159285544E-12", "o 1.0000001159285544E-12",
    "omer 3.839328436473564E-5", "ord 1.6910601686122394E-7", "order 0.03382101243415958",
    "p 1.0000001159285544E-12", "part 0.03340492282133403", "q 1.0000001159285544E-12",
    "query 0.03239895855709492", "r 3.083797351625214E-8", "row 0.030040163781116014",
    "s 1.0000001159285544E-12", "scan 0.034133396652255905", "slow 0.0319480222973794",
    "small 0.031150187951838246", "sort 0.03378649880267137", "spark 0.03156643204696954",
    "stomer 3.836246693224587E-5", "stream 0.031878642739809546", "t 1.0000001159285544E-12",
    "table 0.031323614782743786", "the 0.03156643204696954", "tomer 3.6573851967467356E-5",
    "u 1.0000001159285544E-12", "v 1.0000001159285544E-12", "value 0.03295398778549992",
    "vector 0.03229489857763751", "w 1.0000001159285544E-12", "window 0.03385586602348392",
    "y 1.0000001159285544E-12")

  /** DuckDB oracle replaying [[greedyEncodeCol]] under `vocab` via a
    * recursive CTE (one step per emitted piece; MATERIALIZED to stop
    * CTE-inlining blowup). Output: (id, n_pieces, pieces_md5) per
    * document — md5 of the space-joined piece sequence.
    */
  def greedyOracleSql(table: String, idCol: String, textCol: String,
      vocab: Seq[String], maxLen: Int = MaxPieceLen): String = {
    val vlist = vocab.map(v => "'" + v.replace("'", "''") + "'").mkString(", ")
    // piece choice at the current position: longest match first
    val cand = (maxLen to 2 by -1).map { l =>
      s"CASE WHEN len(rest) >= $l AND list_contains(v.vs, rest[1:$l]) THEN rest[1:$l] END"
    }.mkString(",\n       |   ") + ",\n       |   rest[1:1]"
    s"""WITH RECURSIVE
       |v AS (SELECT [$vlist] AS vs),
       |w0 AS MATERIALIZED (
       | SELECT $idCol AS id, wi, ws[wi] AS rest FROM (
       |  SELECT $idCol,
       |   string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+') AS ws
       |  FROM $table) t,
       |  LATERAL (SELECT unnest(generate_series(1, len(ws))) AS wi)
       | WHERE ws[wi] <> ''),
       |enc (id, wi, rest, toks) AS (
       | SELECT id, wi, rest, CAST([] AS VARCHAR[]) FROM w0
       | UNION ALL
       | SELECT id, wi, rest[len(piece)+1:], toks || [piece] FROM (
       |  SELECT id, wi, rest, toks,
       |   coalesce(
       |   $cand) AS piece
       |  FROM enc, v WHERE rest <> '') s),
       |fin AS MATERIALIZED (
       | SELECT id, wi, toks FROM enc WHERE rest = ''),
       |agg AS (
       | SELECT id, CAST(sum(len(toks)) AS BIGINT) AS n_pieces,
       |  md5(string_agg(array_to_string(toks, ' '), ' ' ORDER BY wi)) AS pieces_md5
       | FROM fin GROUP BY id)
       |SELECT t.$idCol AS id,
       | coalesce(a.n_pieces, 0) AS n_pieces,
       | coalesce(a.pieces_md5, md5('')) AS pieces_md5
       |FROM $table t LEFT JOIN agg a ON t.$idCol = a.id""".stripMargin
  }

  /** DuckDB oracle replaying [[unigramEncode]] (Viterbi max-log-prob
    * segmentation under a FROZEN model) — the q174 conversion that
    * moves the query off rows-only. Two recursive CTEs:
    *
    *  1. `dp` — the forward DP over DISTINCT words (the oracle's
    *     analogue of the expression's LRU word cache), one iteration
    *     per character position, carrying the whole `best`/`bl`
    *     frontier as lists. Candidates l = 1..maxLen are unrolled
    *     (the greedy-oracle discipline); the winner is
    *     `list_reverse_sort` over (val, l) structs — max val, then
    *     max l, exactly [[viterbiWord]]'s ascending-length `>=`
    *     sweep (later equal candidates replace earlier ones).
    *  2. `bt` — the backtrack walk over the finished `bl` lists.
    *
    * Bit-exactness: every log-prob is computed by THIS generator with
    * Java `math.log` and embedded as a `Double.toString` literal
    * (round-trips to the identical double), so the SQL never calls
    * `ln` — DuckDB's libm may differ from Java's in the last ulp,
    * and a sub-ulp log difference could flip a path comparison. The
    * DP sums are then identical IEEE additions in identical order on
    * both engines, so the tie comparisons are exact replays. The
    * UNK single-char floor ([[UnkLogProb]]) rides the same way via
    * `coalesce` on the l=1 candidate; unknown multi-char pieces are
    * NULL candidates dropped by `list_filter` (the kernel's
    * `-inf` skip).
    */
  def viterbiOracleSql(table: String, idCol: String, textCol: String,
      entries: Seq[String], maxLen: Int = MaxPieceLen): String = {
    def esc(s: String) = s.replace("'", "''")
    val model = entries.map { s =>
      val cut = s.lastIndexOf(' ')
      require(cut > 0, s"unigram model entry '$s' is not 'piece prob'")
      s.substring(0, cut) ->
        math.log(java.lang.Double.parseDouble(s.substring(cut + 1)))
    }
    val keys = model.map(e => "'" + esc(e._1) + "'").mkString(", ")
    val lps = model.map(_._2.toString).mkString(", ")
    val unk = UnkLogProb.toString
    // candidate for piece length l ending at position j+1 (1-based
    // substring): val = best(j+1-l) + logProb(word[j+1-l .. j+1]);
    // best list is 1-indexed (best[i+1] = best(i))
    val cands = (1 to maxLen).map { l =>
      val lp = s"vm.m[substr(word, j+2-$l, $l)][1]"
      val lpGuard = if (l == 1) s"coalesce($lp, $unk)" else lp
      s"struct_pack(val := CASE WHEN j+1 >= $l THEN best[j+2-$l] + $lpGuard END, l := $l)"
    }.mkString(",\n       |     ")
    s"""WITH RECURSIVE
       |vm AS (SELECT map([$keys], [$lps]) AS m),
       |w0 AS MATERIALIZED (
       | SELECT $idCol AS id, wi, ws[wi] AS word FROM (
       |  SELECT $idCol,
       |   string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+') AS ws
       |  FROM $table) t,
       |  LATERAL (SELECT unnest(generate_series(1, len(ws))) AS wi)
       | WHERE ws[wi] <> ''),
       |wd AS MATERIALIZED (SELECT DISTINCT word FROM w0),
       |dp (word, n, j, best, bl) AS (
       | SELECT word, len(word), 0, [CAST(0.0 AS DOUBLE)], [0] FROM wd
       | UNION ALL
       | SELECT word, n, j+1, best || [pick.val], bl || [pick.l] FROM (
       |  SELECT word, n, j, best, bl,
       |   list_reverse_sort(list_filter([
       |     $cands
       |   ], x -> x.val IS NOT NULL))[1] AS pick
       |  FROM dp, vm WHERE j < n) s),
       |dpfin AS MATERIALIZED (SELECT word, n, bl FROM dp WHERE j = n),
       |bt (word, pos, pieces) AS (
       | SELECT word, n, CAST([] AS VARCHAR[]) FROM dpfin
       | UNION ALL
       | SELECT b.word, b.pos - d.bl[b.pos+1],
       |   list_prepend(substr(b.word, b.pos - d.bl[b.pos+1] + 1,
       |     d.bl[b.pos+1]), b.pieces)
       | FROM bt b JOIN dpfin d ON b.word = d.word WHERE b.pos > 0),
       |wp AS MATERIALIZED (SELECT word, pieces FROM bt WHERE pos = 0),
       |fin AS MATERIALIZED (
       | SELECT w0.id, w0.wi, wp.pieces FROM w0 JOIN wp ON w0.word = wp.word),
       |agg AS (
       | SELECT id, CAST(sum(len(pieces)) AS INT) AS n_pieces,
       |  md5(string_agg(array_to_string(pieces, ' '), ' ' ORDER BY wi)) AS pieces_md5
       | FROM fin GROUP BY id)
       |SELECT t.$idCol AS doc_id,
       | coalesce(a.n_pieces, 0) AS n_pieces,
       | coalesce(a.pieces_md5, md5('')) AS pieces_md5
       |FROM $table t LEFT JOIN agg a ON t.$idCol = a.id""".stripMargin
  }

  /** DuckDB oracle for [[fitUnigram]] (q173) — the LAST-E-STEP replay
    * that moves the EM fit off rows-only. The full EM loop is
    * genuinely SQL-inexpressible (each round's model feeds the next),
    * but the trace splits it: the generator (Verify, driver-side)
    * runs the fit, freezes the model ENTERING the final E-step as
    * exact `Double.toString` literals, and DuckDB independently
    * replays that E-step FROM THE DATA — tokenize, count words,
    * forward–backward expected counts per distinct word (two
    * recursive linear-space DPs; the backward pass is the forward
    * recursion on the REVERSED word with a reversed-piece map, which
    * is term-for-term beta: IEEE multiplication is commutative and
    * the l-ascending addition order is preserved), per-(word, piece)
    * micro-unit rounding via `floor(x·1e6 + 0.5)` (exactly Java's
    * `math.round`), then the exact integer aggregation Σ micro·cnt.
    * Words unsegmentable under the frozen model (forward total 0)
    * are dropped by the same `z > 0` guard as the native kernel
    * ([[expectedCounts]]' early return) — without it the cells CTE
    * would form 0/0 = NaN, which passes `IS NOT NULL` and errors the
    * BIGINT cast, failing the whole oracle instead of skipping the
    * word.
    *
    * The embedded final rows (prune/renormalize/log/rank — a driver-
    * side O(vocab) transform pinned by UnigramSpec) are gated on the
    * data-derived integers MATCHING the trace's: each output row
    * joins on `coalesce(m, 0) = <expected m literal>`, so any drift
    * in the distributed aggregation drops rows and fails the compare.
    * Micro rounding is what makes the cross-engine compare exact —
    * sub-micro float drift cannot move the integers (the VERDICT r15
    * "micro-unit longs already exact" argument).
    */
  def fitOracleSql(table: String, textCol: String,
      trace: UnigramFitTrace, maxLen: Int = MaxPieceLen): String = {
    require(trace.preEntries.nonEmpty,
      "fitOracleSql needs a trace from iters >= 1")
    // a fit that pruned every piece would render `expd (...) AS
    // (VALUES )` — a DuckDB syntax error instead of a loud generator
    // failure; failing HERE lets Verify's dynamicOracle catch
    // downgrade the query to rows-only instead of emitting bad SQL
    require(trace.rows.nonEmpty,
      "fitOracleSql needs at least one surviving model row")
    def esc(s: String) = s.replace("'", "''")
    val model = trace.preEntries.map { s =>
      val cut = s.lastIndexOf(' ')
      require(cut > 0, s"unigram model entry '$s' is not 'piece prob'")
      (s.substring(0, cut), s.substring(cut + 1)) // keep prob as text
    }
    val keys = model.map(e => "'" + esc(e._1) + "'").mkString(", ")
    val vals = model.map(_._2).mkString(", ")
    val rkeys = model.map(e => "'" + esc(e._1.reverse) + "'").mkString(", ")
    val mMap = trace.lastMicroSums.toMap
    val expRows = trace.rows.map { case (p, len, lp, rank) =>
      s"('${esc(p)}', ${mMap.getOrElse(p, BigInt(0))}, $len, $lp, $rank)"
    }.mkString(",\n       |  ")
    // alpha step candidates, l = 1..maxLen: alpha(j+1) gains
    // alpha(j+1-l) * p(word[j+1-l .. j+1]) when j+1 >= l and known
    def steps(strCol: String, mapRef: String) = (1 to maxLen).map { l =>
      s"CASE WHEN j+1 >= $l THEN al[j+2-$l] * $mapRef[substr($strCol, j+2-$l, $l)][1] END"
    }.mkString(",\n       |     ")
    s"""WITH RECURSIVE
       |vm AS MATERIALIZED (SELECT map([$keys], [$vals]) AS m),
       |rm AS MATERIALIZED (SELECT map([$rkeys], [$vals]) AS m),
       |w0 AS MATERIALIZED (
       | SELECT ws[wi] AS word FROM (
       |  SELECT string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+') AS ws
       |  FROM $table) t,
       |  LATERAL (SELECT unnest(generate_series(1, len(ws))) AS wi)
       | WHERE ws[wi] <> ''),
       |wc AS MATERIALIZED (
       | SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w0 GROUP BY word),
       |wd AS MATERIALIZED (
       | SELECT word, len(word) AS n, reverse(word) AS rword FROM wc),
       |fw (word, n, j, al) AS (
       | SELECT word, n, 0, [CAST(1.0 AS DOUBLE)] FROM wd
       | UNION ALL
       | SELECT word, n, j+1, al || [coalesce(list_sum(list_filter([
       |     ${steps("word", "vm.m")}
       |   ], x -> x IS NOT NULL)), 0.0)]
       | FROM fw, vm WHERE j < n),
       |bw (word, rword, n, j, al) AS (
       | SELECT word, rword, n, 0, [CAST(1.0 AS DOUBLE)] FROM wd
       | UNION ALL
       | SELECT word, rword, n, j+1, al || [coalesce(list_sum(list_filter([
       |     ${steps("rword", "rm.m")}
       |   ], x -> x IS NOT NULL)), 0.0)]
       | FROM bw, rm WHERE j < n),
       |fwf AS MATERIALIZED (SELECT word, n, al FROM fw WHERE j = n),
       |bwf AS MATERIALIZED (SELECT word, al AS bl FROM bw WHERE j = n),
       |cells AS MATERIALIZED (
       | SELECT word, i, l, piece, e FROM (
       |  SELECT f.word, ii.i, ll.l, substr(f.word, ii.i + 1, ll.l) AS piece,
       |   f.al[ii.i + 1] * vm.m[substr(f.word, ii.i + 1, ll.l)][1]
       |     * b.bl[f.n - (ii.i + ll.l) + 1] / f.al[f.n + 1] AS e
       |  FROM fwf f JOIN bwf b USING (word) CROSS JOIN vm,
       |   LATERAL (SELECT unnest(generate_series(0, f.n - 1)) AS i) ii,
       |   LATERAL (SELECT unnest(generate_series(1,
       |     least($maxLen, f.n - ii.i))) AS l) ll
       |  WHERE f.al[f.n + 1] > 0) s
       | WHERE e IS NOT NULL),
       |micro AS MATERIALIZED (
       | SELECT word, piece,
       |  CAST(floor(list_sum(list(e ORDER BY i, l)) * 1e6 + 0.5) AS BIGINT)
       |    AS micro
       | FROM cells GROUP BY word, piece),
       |msum AS MATERIALIZED (
       | SELECT piece, sum(CAST(micro AS DECIMAL(28,0)) * cnt) AS m
       | FROM micro JOIN wc USING (word) GROUP BY piece),
       |expd (piece, m, piece_len, logprob, rnk) AS (VALUES
       |  $expRows)
       |SELECT e.piece, CAST(e.piece_len AS INTEGER) AS piece_len,
       | CAST(e.logprob AS DOUBLE) AS logprob,
       | CAST(e.rnk AS INTEGER) AS "rank"
       |FROM expd e LEFT JOIN msum ms ON e.piece = ms.piece
       |WHERE coalesce(ms.m, 0) = e.m""".stripMargin
  }
}
