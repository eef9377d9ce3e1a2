package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization: the merges-based token unit a
  * training-data pipeline actually budgets in, as opposed to the
  * whitespace/regex token counts of TextOps (reference: Sennrich et
  * al. 2016 subword-nmt; no counterpart in the feldman reference —
  * LLM-pipeline mandate).
  *
  * Semantics (identical in training and application, and replicated
  * verbatim by the q80 DuckDB oracle and the BpeSpec pure-Scala
  * reference):
  *  - pre-tokenize: lowercase, split on whitespace runs (no
  *    end-of-word marker; merges never cross word boundaries);
  *  - a model is an ORDERED list of symbol pairs; applying rank r
  *    means repeatedly merging the LEFTMOST adjacent (a, b)
  *    occurrence until none remains, then moving to rank r+1.
  *
  * Scale shape: training runs one distributed word-frequency
  * aggregation and collects only the top `maxWords` distinct words
  * (vocabulary-bounded — Zipf means 50k words cover any corpus size;
  * NEVER the corpus itself), then iterates merges on the driver in
  * milliseconds. Application ships the model to executors inside the
  * native `graft_bpe_encode` expression — no join, no shuffle, one
  * narrow projection with a per-task word cache.
  */
object BpeOps {

  type Merges = Seq[(String, String)]

  /** Apply one merge rule exhaustively: merge the leftmost adjacent
    * (a, b) occurrence, repeat until none remains.
    */
  private[graft] def applyMerge(symbols: List[String], a: String,
      b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var rest = symbols
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tail if x == a && y == b =>
          // one left-to-right pass IS exhaustive leftmost-repeat:
          // the merged symbol a+b can never re-match as either side
          // of the same rule (a+b = a or a+b = b needs an empty
          // symbol), so no cascade exists within a rank
          rest = (a + b) :: tail
        case x :: tail =>
          buf += x
          rest = tail
        case Nil => ()
      }
    }
    buf.toList
  }

  /** Encode one word by sweeping every rank in order — the REFERENCE
    * implementation (O(merges × len) per word): it is the literal
    * transcription of the semantics contract and of the DuckDB oracle
    * CTE, kept for the differential spec. Production encoding goes
    * through [[encodeWordPq]], which is provably identical.
    */
  private[graft] def encodeWord(word: String, merges: Merges): List[String] = {
    var symbols = word.map(_.toString).toList
    merges.foreach { case (a, b) =>
      if (symbols.lengthCompare(1) > 0) symbols = applyMerge(symbols, a, b)
    }
    symbols
  }

  /** A frozen merge table prepared for encoding: pair → rank lookup
    * (first occurrence wins on duplicate pairs, matching the sweep —
    * a later duplicate rank can never re-match because the first
    * occurrence already exhausted the pair). Build ONCE per task /
    * test, never per row.
    */
  final class BpeModel(val merges: Merges) extends Serializable {
    private[graft] val ranks: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
      merges.iterator.zipWithIndex.foreach { case (p, r) =>
        m.putIfAbsent((p._1, p._2), Integer.valueOf(r))
      }
      m
    }
  }

  /** Encode one word with a rank-ordered priority queue over a linked
    * symbol list — O(len log len) per word, INDEPENDENT of the merge
    * table size (the sweep pays O(merges) per word even when nothing
    * applies; at a production 32k-rule vocabulary that is ~1000× waste).
    *
    * This is the GPT-2/tiktoken lowest-rank-first algorithm plus one
    * guard that makes it exactly equivalent to the rank-sequential
    * sweep on ARBITRARY tables, not just well-formed trained ones:
    * a newly created adjacency whose rank is BELOW the last merged
    * rank is skipped (`r >= rCur`), because the sweep has already
    * passed that rank and never revisits it. Without the guard the
    * two orders can diverge when a later rule's product string equals
    * an earlier rule's operand (e.g. rules [("ab","c"), ("a","b")] on
    * "abc": the sweep yields [ab, c], naive min-rank-first "abc").
    * For tables out of [[trainBpe]] the guard never fires — training
    * only learns a rule over symbols derivable from strictly earlier
    * ranks — but correctness must not depend on that.
    *
    * Equivalence argument (either direction): adjacencies are created
    * only at a merge of the current rank `rCur`; the sweep, standing
    * at `rCur`, will later merge exactly those new pairs with rank
    * ≥ rCur — which is exactly what the guard admits. Within a rank,
    * heap order (rank, leftIndex) replays leftmost-first, and a rank-r
    * merge can never create another rank-r adjacency (a+b = a or b
    * needs an empty symbol), so exhausting-then-advancing and popping
    * in heap order visit identical states. Stale heap entries are
    * harmless: a popped (r, p) is re-validated against the CURRENT
    * pair at p, and rank values are unique per pair, so a valid hit
    * is always a genuine occurrence.
    */
  private[graft] def encodeWordPq(word: String, model: BpeModel): List[String] = {
    val n = word.length
    if (n == 0) return Nil
    if (n == 1) return List(word)
    val ranks = model.ranks
    val sym = new Array[String](n)
    val next = new Array[Int](n)
    val prev = new Array[Int](n)
    var i = 0
    while (i < n) {
      sym(i) = String.valueOf(word.charAt(i))
      next(i) = if (i == n - 1) -1 else i + 1
      prev(i) = i - 1
      i += 1
    }
    var rCur = 0
    // min-heap on (rank, leftIndex): lowest rank first, leftmost first
    val heap = scala.collection.mutable.PriorityQueue.empty[(Int, Int)](
      Ordering.by { case (r, p) => (-r, -p) })
    def offer(p: Int): Unit = if (p >= 0) {
      val q = next(p)
      if (q >= 0) {
        val r = ranks.get((sym(p), sym(q)))
        if (r != null && r.intValue() >= rCur) heap.enqueue((r.intValue(), p))
      }
    }
    i = 0
    while (i < n - 1) { offer(i); i += 1 }
    while (heap.nonEmpty) {
      val (r, p) = heap.dequeue()
      if (sym(p) != null) {
        val q = next(p)
        if (q >= 0) {
          val rr = ranks.get((sym(p), sym(q)))
          if (rr != null && rr.intValue() == r) {
            rCur = r
            sym(p) = sym(p) + sym(q)
            sym(q) = null
            next(p) = next(q)
            if (next(p) >= 0) prev(next(p)) = p
            offer(prev(p))
            offer(p)
          }
        }
      }
    }
    val out = List.newBuilder[String]
    var p = 0 // node 0 is never a merge's right operand, so always alive
    while (p >= 0) { out += sym(p); p = next(p) }
    out.result()
  }

  /** Encode a text: lowercase, whitespace-split, per-word encode.
    * `cache` (optional) memoizes per-word encodings — word frequency
    * is Zipfian, so a small cache removes almost all re-encoding.
    *
    * Pre-tokenization matches [[TextOps.tokens]] exactly: lowercasing
    * DELEGATES to Spark's own `UTF8String.toLowerCase` (`lower()`'s
    * implementation: ASCII fast path, JVM-default-locale slow path
    * for any string with a non-ASCII char) so the BPE unit and the
    * trained merges can never desync from the Spark-side tokenizer —
    * neither plain `toLowerCase` (tr-TR dot-swaps pure-ASCII "I") nor
    * `Locale.ROOT` (diverges from Spark's slow path on mixed strings
    * like "Iş" under tr-TR) reproduces it. Whitespace is the
    * engine-neutral class (Java's \s includes \x0B, the oracles' RE2
    * does not).
    */
  private def sparkLower(s: String): String =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .toLowerCase.toString

  /** Bounded LRU word-encoding cache (access-order LinkedHashMap):
    * overflow evicts the least-recently-used entry, so the Zipfian
    * head stays resident forever. The previous clear-on-overflow
    * "eviction" threw the entire head away each time the tail of
    * hapaxes pushed the map over capacity.
    */
  private[graft] def newWordCache(capacity: Int = 65536)
      : java.util.Map[String, List[String]] =
    new java.util.LinkedHashMap[String, List[String]](
        capacity * 4 / 3 + 1, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, List[String]]): Boolean =
        size() > capacity
    }

  private[graft] def encode(text: String, model: BpeModel,
      cache: java.util.Map[String, List[String]]): Seq[String] =
    sparkLower(text).split("[ \t\n\f\r]+")
      .iterator.filter(_.nonEmpty).flatMap { w =>
        if (cache == null) encodeWordPq(w, model)
        else {
          var r = cache.get(w)
          if (r == null) { r = encodeWordPq(w, model); cache.put(w, r) }
          r
        }
      }.toSeq

  /** Convenience overload (tests, one-off encodes): builds the model
    * inline. Production callers build the [[BpeModel]] once per task.
    */
  private[graft] def encode(text: String, merges: Merges): Seq[String] =
    encode(text, new BpeModel(merges), null)

  /** Sweep-encoder twin of [[encode]] — differential-spec reference
    * only (O(merges × len) per word, no cache).
    */
  private[graft] def encodeSweep(text: String, merges: Merges): Seq[String] =
    sparkLower(text).split("[ \t\n\f\r]+")
      .iterator.filter(_.nonEmpty).flatMap(encodeWord(_, merges)).toSeq

  /** Wait-free leftmost-repeat application is what [[applyMerge]]
    * does; training counts each ADJACENT pair once per occurrence in
    * the current segmentation, weighted by word frequency.
    */
  private def pairCounts(words: Seq[(List[String], Long)])
      : Map[(String, String), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    words.foreach { case (syms, n) =>
      syms.lazyZip(syms.tail).foreach { (a, b) =>
        val k = (a, b)
        m.update(k, m.getOrElse(k, 0L) + n)
      }
    }
    m.toMap
  }

  /** Train `numMerges` BPE merges on a corpus column.
    *
    * Distributed part: ONE word-frequency aggregation, truncated to
    * the `maxWords` most frequent distinct words (ties broken by word
    * — deterministic across engines/partitionings). Driver part: the
    * classic Sennrich loop over that dictionary — pick the most
    * frequent adjacent pair (ties: lexicographically smallest), merge
    * it everywhere, repeat. Stops early when no pair occurs twice.
    */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): Merges = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val wf = df
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnDict(wf, numMerges)
  }

  /** The driver-side training loop, exposed for differential tests. */
  private[graft] def trainOnDict(wordFreq: Seq[(String, Long)],
      numMerges: Int): Merges = {
    var words = wordFreq.map { case (w, n) => (w.map(_.toString).toList, n) }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val counts = pairCounts(words)
      if (counts.isEmpty) continue = false
      else {
        val (best, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        // a pair seen once buys nothing: stop (matches subword-nmt's
        // min-frequency floor)
        if (n < 2) continue = false
        else {
          merges += best
          words = words.map { case (syms, w) =>
            (applyMerge(syms, best._1, best._2), w)
          }
        }
      }
    }
    merges.toList
  }

  /** Default model: [[trainBpe]] run TO SATURATION (numMerges=1000
    * requested; training goes dry at 89 — no pair occurs twice) on
    * the sf0.01 synthetic `documents` corpus and FROZEN here, so the
    * q80 oracle can carry the identical table as a SQL literal and
    * any engine reproduces the same segmentation. (A fixed public
    * model's merge table is the normal deployment artifact — training
    * once and shipping constants is the point of BPE.) The synthetic
    * corpus has a 31-word closed vocabulary, so saturation means
    * every corpus word is a single symbol — the most realistic token
    * unit this corpus can define; a natural corpus would saturate far
    * beyond any practical table, which is why [[encodeWordPq]] is
    * merge-table-size-independent.
    */
  val DefaultMerges: Merges = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"), ("custo", "mer"),
    ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er"), ("a", "l"),
    ("al", "l"), ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"), ("l", "ine"),
    ("a", "b"), ("ab", "l"), ("abl", "e"), ("at", "a"), ("d", "ata"),
    ("t", "able"), ("u", "p"), ("a", "g"), ("ag", "g"), ("a", "lu"),
    ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"), ("a", "m"),
    ("e", "am"), ("r", "eam"), ("st", "ream"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("par", "k"), ("s", "park"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("par", "t"), ("b", "i"), ("bi", "g"), ("or", "t"),
    ("s", "ort"), ("er", "y"), ("q", "u"), ("qu", "ery"), ("a", "st"),
    ("f", "ast"), ("h", "e"), ("t", "he"), ("d", "up"))

  /** Column form: array of BPE tokens for a text column, via the
    * native `graft_bpe_encode(text, merges)` expression (merges ride
    * as one foldable array literal of "a b" pairs — symbols never
    * contain whitespace, so the join is unambiguous).
    */
  def bpeEncode(text: Column, merges: Merges = DefaultMerges): Column =
    call_function("graft_bpe_encode", text,
      array(merges.map { case (a, b) => lit(s"$a $b") }: _*))

  /** Token-ID mapping (the tokens→ids step of training-data assembly):
    * the corpus vocabulary gets dense ids in lexicographic token order
    * (engine-portable — any engine derives the identical assignment,
    * unlike hash ids), and each document becomes its id sequence,
    * digested for compactness.
    *
    * Scale shape: the BPE symbol space is bounded (initial characters
    * + one symbol per merge rule), so the vocabulary is a driver-small
    * table regardless of corpus size. Pass 1 aggregates the DISTINCT
    * tokens (map-side combine collapses each partition to ≤|vocab|
    * rows before the one vocab-bounded shuffle) and collects the
    * ranked vocabulary; pass 2 maps each document's token array
    * through that map as ONE broadcast-sized literal inside
    * `transform` — the corpus itself never shuffles and never
    * explodes. The earlier shape (posexplode → id-keyed
    * groupBy/collect_list re-assembly) shuffled every TOKEN of the
    * corpus; at 100 TB that shuffle is the entire job.
    * `maxVocab` guards the collect (a blown cap means the input is
    * not BPE output — e.g. raw words — and the join plan would be
    * needed instead). The guard limits BEFORE collecting: on a
    * pathological vocabulary the driver receives maxVocab+1 rows and
    * fails cleanly, never the unbounded set.
    *
    * `df` must be deterministic across the two evaluations (vocab
    * pass, mapping pass) — standard Spark re-evaluation contract. If
    * a token still escapes the vocabulary, its null id is KEPT in the
    * digest as the literal "null" (`array_join` null-replacement), so
    * the (count, digest) pair stays consistent and the divergence is
    * visible, never silently dropped.
    */
  def tokenIds(df: DataFrame, idCol: String, textCol: String,
      merges: Merges = DefaultMerges, maxVocab: Int = 1 << 20): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    def toks = coalesce(bpeEncode(col(textCol), merges),
      array().cast("array<string>"))
    val vocab = df.select(explode(toks).as("tok")).distinct()
      .withColumn("token_id", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("tok")))
      .limit(if (maxVocab == Int.MaxValue) maxVocab else maxVocab + 1)
      .collect().map(r => r.getString(0) -> r.getInt(1))
    require(vocab.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab — input does " +
        "not look like a bounded BPE symbol space")
    // one Literal node holding the whole map (the IVF-centers lesson:
    // a per-entry CreateMap of 2×|vocab| expression nodes bloats the
    // plan; a single typedlit is one constant in the task binary)
    val idMap = typedlit(vocab.toMap)
    df.select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"),
        transform(col("toks"), t => element_at(idMap, t)).as("ids"))
      .select(col("id"),
        size(col("ids")).cast("long").as("n_bpe_tokens"),
        md5(array_join(transform(col("ids"), _.cast("string")), ",", "null")
          .cast("binary")).as("ids_md5"))
  }

  /** Per-document BPE token count + compact digest query surface.
    * Null text encodes as zero tokens (coalesced before size/join so
    * the count is 0, never NULL — mirrors the oracle's left join).
    */
  def bpeTokens(df: DataFrame, idCol: String, textCol: String,
      merges: Merges = DefaultMerges): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
        coalesce(bpeEncode(col(textCol), merges),
          array().cast("array<string>")).as("toks"))
      .select(col("id"), size(col("toks")).as("n_bpe_tokens"),
        md5(array_join(col("toks"), " ").cast("binary")).as("bpe_md5"))
  }

  /** Tokenizer fertility by language — the multilingual-fairness
    * report (how many characters one BPE token buys per language, and
    * how many subword tokens a whitespace word fragments into): a
    * language the tokenizer underserves pays more sequence length for
    * the same text, which skews both training mixture math and
    * serving cost. One zero-shuffle scan (the native encoder is a
    * projection) into a |languages|-row aggregate; all sums are exact
    * longs, the two ratios divide once at the end.
    */
  def fertilityByLang(df: DataFrame, textCol: String, langCol: String,
      merges: Merges = DefaultMerges): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val toks = coalesce(bpeEncode(col(textCol), merges),
      array().cast("array<string>"))
    df.select(col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("nc"),
        size(TextOps.tokens(col(textCol))).cast("long").as("nw"),
        size(toks).cast("long").as("nb"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("sum_chars"),
        sum("nw").as("sum_words"), sum("nb").as("sum_bpe"))
      .select(col("lang"), col("n_docs"), col("sum_chars"),
        col("sum_words"), col("sum_bpe"),
        round(col("sum_chars").cast("double") / col("sum_bpe"), 4)
          .as("chars_per_token"),
        round(col("sum_bpe").cast("double") / col("sum_words"), 4)
          .as("tokens_per_word"))
  }
}
