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

  /** Encode one word (no whitespace inside) under the ordered merges. */
  private[graft] def encodeWord(word: String, merges: Merges): List[String] = {
    var symbols = word.map(_.toString).toList
    merges.foreach { case (a, b) =>
      if (symbols.lengthCompare(1) > 0) symbols = applyMerge(symbols, a, b)
    }
    symbols
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

  private[graft] def encode(text: String, merges: Merges,
      cache: scala.collection.mutable.Map[String, List[String]] = null)
      : Seq[String] =
    sparkLower(text).split("[ \t\n\f\r]+")
      .iterator.filter(_.nonEmpty).flatMap { w =>
        if (cache == null) encodeWord(w, merges)
        else cache.getOrElseUpdate(w, {
          if (cache.size > 65536) cache.clear() // bound task memory
          encodeWord(w, merges)
        })
      }.toSeq

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

  /** Default model: 32 merges trained with [[trainBpe]] on the
    * sf0.01 synthetic `documents` corpus and FROZEN here, so the q80
    * oracle can carry the identical table as a SQL literal and any
    * engine reproduces the same segmentation. (A fixed public model's
    * merge table is the normal deployment artifact — training it once
    * and shipping constants is the point of BPE.)
    */
  val DefaultMerges: Merges = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"))

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
}
