package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale notes (100 TB design):
  *  - exact dedup is a single hash-shuffle on the digest key; map-side
  *    partial aggregation keeps the shuffle narrow (digest + counts).
  *  - n-gram Jaccard self-join shuffles on the shingle key; the shingle
  *    space partitions the pair generation, so skewed (very common)
  *    shingles are the only hotspot — callers can pre-filter top-frequency
  *    shingles (stopword shingles) exactly like common LSH practice.
  *  - MinHash/LSH replaces the quadratic candidate space with
  *    band-bucket joins: k hashes, b bands — candidates only share a
  *    full band, so work is proportional to true near-duplicates.
  *  - everything is column expressions (codegen) — no UDFs.
  */
object DedupOps {

  /** Cross-source duplicate leakage — the release audit that catches
    * the SAME text appearing under multiple provenance labels (mirror
    * sites, syndication, a crawler double-listing a feed): if train
    * and eval are later split BY SOURCE, each leaked pair is a
    * contamination channel. Per unordered source pair: how many
    * distinct texts they share and how many doc pairs that is.
    * Physical shape: one scan to (source, md5) — text itself never
    * shuffles — then an md5-keyed self-join; only duplicate groups
    * (rare by construction) produce join matches.
    */
  def crossSourceDupLeakage(df: org.apache.spark.sql.DataFrame,
      textCol: String, srcCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val fp = df.select(col(srcCol).as("src"),
      md5(coalesce(col(textCol), lit("")).cast("binary")).as("fp"))
    val a = fp.select(col("src").as("source_a"), col("fp"))
    val b = fp.select(col("src").as("source_b"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(countDistinct(col("fp")).as("n_shared_texts"),
        count(lit(1)).as("n_doc_pairs"))
  }

  /** Exact duplicate groups keyed by md5 of the raw text. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per document: (id, shingle, n_sh).
    * `n_sh` is the document's distinct-shingle-set size, computed
    * NARROWLY (array length before the explode) so Jaccard consumers
    * get their denominator for free instead of re-aggregating the
    * exploded rows and joining it back (two shuffles + two joins at
    * 100 TB; here it halved q39's steady-state cost).
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // Materialize the token array ONCE per row before the gram lambda:
    // referencing `split(...)` directly inside the transform() lambda
    // would re-run the full regex split per array element (O(len²) per
    // document — measured 10× slower at 5k docs).
    val w = col("_w")
    // Docs with < n tokens yield NO shingles: sequence(1, size-(n-1))
    // would count DOWN to a [1, 0] array there and element_at would
    // throw under ANSI mode, so guard with an empty array instead.
    val grams = when(size(w) >= n,
      transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))
    ).otherwise(array())
    // per-document set semantics via array_distinct BEFORE the
    // explode: narrow per-row dedup, where a post-explode .distinct()
    // is a full shuffle of every (id, shingle) row for the same result
    // The single-element explode(array(..)) materializes the gram
    // array behind a Generate barrier: a plain Project here would
    // collapse into the token Project and inline `split` into the
    // per-element lambda — O(len²) per document again (measured 37×).
    // parallelism floor BEFORE the tokenize/shingle pass: a 1-split
    // doc table ran the whole pass on one core (measured 1.1 s
    // single-task at sf0.1); the guard adds nothing at real scale
    SkewOps.parallelismFloor(
        docs.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"), split(lower(col("_t")), TextOps.Ws).as("_w"))
      .select(col("id"), explode(array(array_distinct(grams))).as("_g"))
      .select(col("id"), size(col("_g")).cast("long").as("n_sh"),
        explode(col("_g")).as("shingle"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs (a < b, jaccard >= minJaccard).
    * Pair generation via inverted index on the shingle (shuffle key), so
    * only documents sharing at least one shingle ever meet.
    *
    * Skew guard: a shingle shared by f documents contributes O(f²)
    * candidate pairs — one stopword 3-gram in a million docs is 10¹²
    * pairs. `maxDocFrequency` drops shingles above that document
    * frequency BEFORE the self-join (one extra narrow aggregation).
    * Dropped shingles still count toward each document's shingle-set
    * size, so the Jaccard denominator stays exact; only intersections
    * through ultra-common shingles are forfeited — standard inverted-
    * index prefix-filter practice.
    *
    * `sizesProvided = true` promises the input is `wordShingles`-shaped:
    * distinct (id, shingle) rows carrying the per-document set size in
    * `n_sh`. That skips a size aggregation + join (the fast path is TWO
    * total shuffles). The promise is an explicit opt-in, not inferred
    * from the column name — a caller-supplied frame that merely happens
    * to contain an unrelated `n_sh` column gets the safe path.
    */
  def ngramJaccardPairs(shingles: DataFrame, minJaccard: Double,
      maxDocFrequency: Long = Long.MaxValue,
      sizesProvided: Boolean = false): DataFrame = {
    // The Jaccard denominator (per-doc set size) rides along each
    // exploded row when the caller vouches for wordShingles shape
    // (narrow, free); otherwise derive it with one aggregation + join
    // over distinct (id, shingle) rows.
    val sized =
      if (sizesProvided) {
        require(shingles.columns.contains("n_sh"),
          "sizesProvided = true requires an n_sh column (wordShingles output)")
        shingles
      } else {
        val distinctSh = shingles.select("id", "shingle").distinct()
        val sizes = distinctSh.groupBy("id").agg(count(lit(1)).as("n_sh"))
        distinctSh.join(sizes, "id")
      }
    // Join on the 64-bit shingle hash, not the string: ~3× narrower
    // shuffle and cheaper equality. A cross-document hash collision
    // would overcount one intersection pair — at 2⁻⁶⁴ per shingle pair
    // that is negligible against any corpus size this exact-Jaccard
    // path is appropriate for (the at-scale path is MinHash/LSH).
    val hashed = sized.select(
      col("id"), col("n_sh"), xxhash64(col("shingle")).as("shingle"))
    // Pair generation: ONE shuffle groups the inverted index by
    // shingle, then each posting list expands its ordered pairs
    // in-row (sorted (id, n_sh) structs ⇒ a < b) — measured equal
    // output to the hash self-join with half the cold cost (no join
    // machinery, one exchange fewer). Posting-list size IS the
    // shingle's document frequency, so the skew cap rides INSIDE the
    // collect (graft_bounded_collect): a shingle shared by f documents
    // contributes O(f²) pairs (one stopword 3-gram in a million docs
    // is 10¹² pairs), and an over-frequency list is released the
    // moment it exceeds the cap — never materialized whole, unlike a
    // post-collect filter. Denominators stay exact; only
    // intersections through ultra-common shingles are forfeited,
    // standard inverted-index prefix-filter practice, and the loss is
    // observable (DropGuard metrics + stderr when material).
    graft.functions.GraftFunctions.register(shingles.sparkSession)
    val capped = math.min(maxDocFrequency, Int.MaxValue.toLong).toInt
    val grouped = DropGuard.observed(
      hashed.groupBy("shingle")
        .agg(call_function("graft_bounded_collect",
          struct(col("id"), col("n_sh")), lit(capped)).as("c")),
      "ngramJaccardPairs")
      .filter(col("c.ms").isNotNull && size(col("c.ms")) > 1)
      .select(col("c.ms").as("ids"))
    // pair expansion via the native generator (graft_ordered_pairs):
    // lazy (a, b) emission straight from the posting list — no nested
    // array materialization, no per-element slice copies
    grouped.select(call_function("graft_ordered_pairs", col("ids")).as(Seq("x", "y")))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"),
        col("x.n_sh").as("n_a"), col("y.n_sh").as("n_b"))
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 5))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "n_common", "n_a", "n_b", "jaccard")
  }

  /** Exact Jaccard similarity join by PREFIX FILTERING (SSJoin/PPJoin,
    * Chaudhuri 2006 / Xiao 2008) — LOSSLESS at threshold τ, unlike
    * [[ngramJaccardPairs]]'s df-cap which forfeits intersections:
    * under one GLOBAL token order (df asc, rarest first, token asc
    * tie-break) a set of size L keeps only its first
    * L − ⌈τ·L⌉ + 1 tokens as its prefix; J(A,B) ≥ τ forces the two
    * prefixes to share a token, so the candidate join touches only
    * prefix rows — the rare-token fraction — instead of every posting
    * list. Candidates then verify with an exact intersection count
    * and the integer test I·(1000+τ‰) ≥ τ‰·(|A|+|B|).
    *
    * The DuckDB oracle computes the FULL exact pair set with no
    * prefix step — a hash match on every run is a standing proof of
    * losslessness on real data.
    *
    * Scale shape: df table (token-grid), one doc-keyed rank window
    * over per-doc tokens, prefix self-join keyed by token (posting
    * lists of RARE tokens — inherently short), candidate-bounded
    * verify joins. No all-pairs stage anywhere.
    *
    * @param shingles wordShingles-shaped (id, n_sh, shingle)
    * @param tauPermille threshold in 1/1000 units (500 = 0.5)
    * @return (a_id, b_id, n_common, n_a, n_b, jaccard)
    */
  def prefixJaccardPairs(shingles: DataFrame,
      tauPermille: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tauPermille > 0 && tauPermille <= 1000,
      s"tau must be in (0, 1000] permille, got $tauPermille")
    val sh = shingles.select("id", "n_sh", "shingle")
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df").asc,
      col("shingle").asc)
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(w))
    val prefix = ranked.where(col("rk") <=
      col("n_sh") - expr(s"($tauPermille * n_sh + 999) div 1000") + 1)
    // PPJoin position filter: a shared prefix token at ranks (i, j)
    // caps the achievable overlap at 1 + min(La−i, Lb−j); J ≥ τ needs
    // I ≥ ⌈τ(La+Lb)/(1000+τ)⌉, so pairs that cannot reach it are cut
    // BEFORE the distinct/verify stages — still lossless (the
    // full-join oracle keeps proving it), but candidate volume drops
    // sharply on dense corpora where bare prefix matching floods.
    val minOverlap = expr(s"($tauPermille * (a.n_sh + b.n_sh)" +
      s" + ${1000 + tauPermille} - 1) div ${1000 + tauPermille}")
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.id") < col("b.id") &&
          lit(1) + least(col("a.n_sh") - col("a.rk"),
            col("b.n_sh") - col("b.rk")) >= minOverlap)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .distinct()
    // verify via per-doc shingle SETS and array_intersect instead of
    // re-exploding every candidate pair against both docs' shingle
    // rows and counting matches through a second shuffle join + a
    // |cands|·|shingles| group-by: wordShingles emits DISTINCT
    // shingles per doc, so |A ∩ B| = size(array_intersect(A, B)) is
    // the same n_common, computed per candidate row with no fan-out
    val sets = sh.groupBy("id").agg(collect_set("shingle").as("_ss"))
    cands
      .join(sets.select(col("id").as("a_id"), col("_ss").as("_sa")), "a_id")
      .join(sets.select(col("id").as("b_id"), col("_ss").as("_sb")), "b_id")
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"),
        size(array_intersect(col("_sa"), col("_sb"))).cast("long")
          .as("n_common"))
      .where(col("n_common") * (1000 + tauPermille) >=
        lit(tauPermille) * (col("n_a") + col("n_b")))
      .select(col("a_id"), col("b_id"), col("n_common"), col("n_a"),
        col("n_b"),
        (expr("(2000000 * n_common + (n_a + n_b - n_common))" +
          " div (2 * (n_a + n_b - n_common))").cast("double") / 1e6)
          .as("jaccard"))
  }

  /** DuckDB replay of [[prefixJaccardPairs]] — deliberately the FULL
    * exact join (no prefix step): equality proves the filter lossless.
    */
  def prefixJaccardOracleSql(table: String, idCol: String,
      textCol: String, n: Int, tauPermille: Int): String = {
    val gram = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""WITH sh AS (
       | SELECT DISTINCT $idCol AS id, shingle FROM (
       |  SELECT $idCol,
       |   unnest(list_transform(generate_series(1,
       |       greatest(len(w) - ${n - 1}, 0)),
       |     i -> $gram)) AS shingle
       |  FROM (SELECT $idCol, string_split_regex(lower($textCol),
       |          '[ \\t\\n\\f\\r]+') AS w
       |        FROM $table) t0) t1),
       |sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh
       |  FROM sh GROUP BY id),
       |inter AS (SELECT a.id AS a_id, b.id AS b_id,
       |    CAST(count(*) AS BIGINT) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |  CAST((2000000 * n_common + (sa.n_sh + sb.n_sh - n_common))
       |    // (2 * (sa.n_sh + sb.n_sh - n_common)) AS DOUBLE) / 1e6
       |    AS jaccard
       |FROM inter
       |JOIN sizes sa ON inter.a_id = sa.id
       |JOIN sizes sb ON inter.b_id = sb.id
       |WHERE n_common * (1000 + $tauPermille)
       |  >= $tauPermille * (sa.n_sh + sb.n_sh)""".stripMargin
  }

  /** MinHash signature matrix: (id, mh_0..mh_{k-1}). Deterministic
    * family: h_i(s) = xxhash64(i || s) — i salts the 64-bit hash,
    * giving k independent permutations without any RNG state.
    *
    * Computed by the native graft_minhash_sig aggregate (ONE
    * array-buffer aggregate; bit-identical to k separate
    * min(xxhash64(lit(i), shingle)) columns, which put k aggregate
    * expressions in the plan) then unpacked to columns for the band /
    * agreement consumers.
    */
  def minHash(shingles: DataFrame, numHashes: Int): DataFrame = {
    graft.functions.GraftFunctions.register(shingles.sparkSession)
    val sig = shingles.groupBy("id")
      .agg(call_function("graft_minhash_sig", col("shingle"), lit(numHashes)).as("sig"))
    sig.select(col("id") +: (0 until numHashes).map(i =>
      element_at(col("sig"), i + 1).as(s"mh_$i")): _*)
  }

  /** LSH banding over a minhash signature: (id, band, band_hash).
    * Documents agreeing on all rows of any band become candidates.
    */
  def lshBands(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64((bnd * rows until (bnd + 1) * rows).map(i => col(s"mh_$i")): _*)
          .as("band_hash"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
  }

  /** Per-band 64-bit join keys from a minhash signature array: band
    * b's key hashes the band INDEX together with its signature rows,
    * so equal row-patterns in different bands cannot alias. Shared by
    * the batch [[minHashBandIndex]] and the streaming probe
    * (StreamOps.nearDupFilterStream) — the two sides must derive keys
    * identically or every probe is a silent miss.
    */
  def minHashBandKeys(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { bnd =>
      xxhash64((lit(bnd) +: (bnd * rows until (bnd + 1) * rows)
        .map(i => element_at(sig, i + 1))): _*)
    }: _*)
  }

  /** Batch band-key index over a corpus: (id, band_key) — the static
    * side a streaming near-dup filter probes. Built once per corpus
    * snapshot (bands × one row per document); the probe consumes
    * `band_key` distinct, so the index is also the audit trail of
    * WHICH document a colliding band belongs to.
    */
  def minHashBandIndex(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0,
      s"bands must divide numHashes, got $numHashes/$bands")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sig = wordShingles(docs, idCol, textCol, shingleN)
      .groupBy("id")
      .agg(call_function("graft_minhash_sig", col("shingle"), lit(numHashes)).as("sig"))
    sig.select(col("id"),
      explode(minHashBandKeys(col("sig"), numHashes, bands)).as("band_key"))
  }

  /** Oracle-replayable MinHash band rows — the DURABLE-store twin of
    * [[minHashLshPairs]]'s banding: the hash family is affine over
    * ONE md5 digest per shingle — h_i(s) = A(s) + i·(B(s)|1) mod 2⁶⁴
    * with A/B the digest's two 64-bit halves (the Carter–Wegman
    * trick) — so every stage — signature, band key, pair agreement —
    * replays verbatim in ANSI SQL, which is what lets a persisted
    * band store be PROVEN equal to a from-scratch pass by oracle hash
    * (q365), where the xxhash64 production family can only be
    * floor-gated. One digest instead of numHashes digests per shingle
    * (the r14 seal caught the per-seed-md5 version 5× slower at 32
    * hashes), and long minima instead of 32-char string minima.
    *
    * Exactness plumbing: the affine runs in 32-bit halves so no
    * intermediate exceeds 2³⁸ (ANSI-overflow-safe on the Spark side,
    * plain BIGINT on the oracle side), and the assembled value is
    * stored SIGN-FLIPPED (xor 2⁶³) so SIGNED min == UNSIGNED min —
    * the oracle re-derives the same signed value via HUGEINT
    * subtraction.
    *
    * Row shape (id, band, band_key, sig): the band key is md5 over
    * the band INDEX plus its signature rows (band-index salting —
    * equal row patterns in different bands cannot alias, the
    * [[minHashBandKeys]] discipline), and the full signature rides in
    * the row so a store serve computes pair agreement from the STORE
    * alone — corpus text is never read again (numHashes × 8 B per
    * doc per band row, the price of text-free serving).
    */
  def minHashMd5Bands(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0,
      s"bands must divide numHashes, got $numHashes/$bands")
    val rows = numHashes / bands
    // one native digest split per shingle (graft_md5_longs) — the
    // composed md5-hex + 4× conv/substring round-trip was most of the
    // md5-family premium over the xxhash twins (r14 seal #5);
    // element w is bit-identical to conv(substring(hex, 8w+1, 8),16,10)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val h = call_function("graft_md5_longs", col("shingle").cast("binary"))
    val keyed = wordShingles(docs, idCol, textCol, shingleN)
      .withColumn("_hw", h)
      .withColumn("_ahi", element_at(col("_hw"), 1))
      .withColumn("_alo", element_at(col("_hw"), 2))
      .withColumn("_bhi", element_at(col("_hw"), 3))
      .withColumn("_blo", element_at(col("_hw"), 4).bitwiseOR(lit(1L)))
    val mins = (0 until numHashes).map { i =>
      val lo = col("_alo") + lit(i.toLong) * col("_blo")
      val hi = col("_ahi") + lit(i.toLong) * col("_bhi") +
        shiftright(lo, 32)
      val v = shiftleft(hi.bitwiseAND(lit(0xffffffffL)), 32)
        .bitwiseOR(lo.bitwiseAND(lit(0xffffffffL)))
      min(v.bitwiseXOR(lit(Long.MinValue))).as(s"m_$i")
    }
    val sig = keyed
      .groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m_$i")): _*).as("sig"))
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        md5(concat_ws("|",
          (lit(bnd.toString) +: (bnd * rows until (bnd + 1) * rows)
            .map(i => element_at(col("sig"), i + 1).cast("string"))): _*)
          .cast("binary"))
          .as("band_key"))
    }
    sig.select(col("id"), col("sig"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"),
        col("b.band_key").as("band_key"), col("sig"))
  }

  /** Near-dup candidate pairs from a band-row frame (live
    * [[minHashMd5Bands]] output or a persisted store read back):
    * bucket-grouped on (band, band_key), lazy in-row pair expansion,
    * agreement from the carried signatures, final distinct — the
    * [[minHashLshPairs]] physical shape, with the same
    * `maxBucketSize` degenerate-bucket bound (enforced inside the
    * aggregation, observable through DropGuard).
    */
  def lshBandPairs(bandRows: DataFrame, numHashes: Int,
      minEstJaccard: Double, maxBucketSize: Int = 4096): DataFrame = {
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    graft.functions.GraftFunctions.register(bandRows.sparkSession)
    val grouped = DropGuard.observed(
      bandRows.groupBy(col("band"), col("band_key"))
        .agg(call_function("graft_bounded_collect",
          struct(col("id"), col("sig")), lit(maxBucketSize)).as("c")),
      "lshBandPairs")
      .filter(col("c.ms").isNotNull && size(col("c.ms")) > 1)
      .select(col("c.ms").as("ms"))
    grouped.select(call_function("graft_ordered_pairs", col("ms")).as(Seq("x", "y")))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(size(filter(zip_with(col("x.sig"), col("y.sig"),
          (p, q) => p === q), e => e)).cast("double") / numHashes, 4)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .distinct()
  }

  /** DuckDB replay of the md5-MinHash band pipeline from scratch —
    * shingles → one digest each → affine-family minima (BIGINT
    * halves, HUGEINT sign-flip) → salted band keys → bucket pairs
    * → signature agreement. Run against [[IndexStore.serveLshPairs]]
    * over a batch-appended store, the hash match proves
    * merged-store serve == from-scratch (band rows carry no
    * cross-doc state, so any batch split unions to the same frame).
    *
    * Threshold translation: the Spark side filters on the 4dp-ROUNDED
    * est_jaccard, so the integer agreement threshold here is the
    * smallest m with round(m/numHashes, 4) >= minEstJaccard — NOT
    * ceil(minEstJaccard·numHashes), which disagrees at rounding
    * boundaries (numHashes=3, minEstJaccard=0.6667: Spark keeps
    * matches=2 because round(2/3,4)=0.6667, ceil would demand 3).
    *
    * Known divergence: this replay has no bucket cap — it is exact
    * where [[lshBandPairs]]'s `maxBucketSize` drops a degenerate
    * bucket (>4096 members sharing a band key). DropGuard makes any
    * such drop loud on the Spark side; at the oracle SFs the corpora
    * are far below the cap.
    */
  def minHashMd5OracleSql(table: String, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      minEstJaccard: Double = 0.5): String = {
    val rows = numHashes / bands
    val gram = (0 until shingleN).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    val bandSql = (0 until bands).map { b =>
      val elems = (b * rows until (b + 1) * rows)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5('$b|' || $elems) AS bk FROM sig"
    }.mkString("\n UNION ALL\n ")
    val matches = (0 until numHashes).map(i =>
      s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    // smallest m whose 4dp-rounded fraction clears the threshold —
    // mirrors Spark's round(matches/numHashes, 4) >= minEstJaccard
    val minMatches = (0 to numHashes).find(m =>
      BigDecimal(m.toDouble / numHashes)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        >= minEstJaccard).getOrElse(numHashes + 1)
    // 8-hex-digit → BIGINT ladder (exact, < 2^32)
    def hex32(start: Int) = (1 to 8).map(k =>
      s"(strpos('0123456789abcdef', substr(h, ${start + k - 1}, 1)) - 1)" +
        s" * ${BigInt(16).pow(8 - k)}").mkString(" + ")
    // the affine family member i, replaying minHashMd5Bands's 32-bit-
    // half arithmetic: BIGINT throughout (every intermediate < 2^38),
    // HUGEINT only for the final 2^63 sign-flip subtraction
    def famMin(i: Int) =
      s"""min(CAST((CAST((ahi + $i*bhi + (alo + $i*blo) // 4294967296)
         |    % 4294967296 AS HUGEINT) * 4294967296
         |  + (alo + $i*blo) % 4294967296)
         |  - 9223372036854775808 AS BIGINT)) AS m$i""".stripMargin
    s"""WITH w AS (
       | SELECT $idCol AS id,
       |   string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+') AS w
       | FROM $table),
       |sh AS (
       | SELECT DISTINCT id, shingle FROM (
       |  SELECT id, unnest(list_transform(
       |      generate_series(1, greatest(len(w) - ${shingleN - 1}, 0)),
       |    i -> $gram)) AS shingle
       |  FROM w) t),
       |ab AS (
       | SELECT id, ${hex32(1)} AS ahi, ${hex32(9)} AS alo,
       |  ${hex32(17)} AS bhi,
       |  (${hex32(25)}) - ((${hex32(25)}) % 2) + 1 AS blo
       | FROM (SELECT id, md5(shingle) AS h FROM sh) t),
       |sig AS (
       | SELECT id,
       |  ${(0 until numHashes).map(famMin).mkString(",\n  ")}
       | FROM ab GROUP BY id),
       |bands AS (
       | $bandSql),
       |cand AS (
       | SELECT DISTINCT a.id AS a_id, b.id AS b_id
       | FROM bands a JOIN bands b
       |   ON a.band = b.band AND a.bk = b.bk AND a.id < b.id)
       |SELECT c.a_id, c.b_id,
       | round(CAST(($matches) AS DOUBLE) / $numHashes, 4) AS est_jaccard
       |FROM cand c
       |JOIN sig sa ON c.a_id = sa.id
       |JOIN sig sb ON c.b_id = sb.id
       |WHERE ($matches) >= $minMatches""".stripMargin
  }

  /** Candidate pairs from LSH buckets + estimated jaccard = fraction of
    * agreeing minhashes.
    *
    * Physical form: the signature ARRAY rides into the band buckets, a
    * bucket's member list expands its ordered pairs in-row, and each
    * pair's agreement is computed inline from the two carried arrays —
    * THREE shuffles total (signature agg, bucket group, final pair
    * distinct), no join machinery at all. The earlier formulation
    * (band self-join → candidate distinct → two signature re-joins)
    * paid five shuffles and re-materialized the signature matrix
    * twice; measured ~2× slower cold at sf0.1. Bucket member lists are
    * bounded by band collision counts in benign corpora, but a
    * degenerate corpus (mass-duplicated boilerplate) collapses into
    * one band bucket whose member list costs O(f²) pairs — so, exactly
    * like `ngramJaccardPairs.maxDocFrequency`, buckets above
    * `maxBucketSize` are dropped (documents duplicated at that volume
    * are exact-dedup's catch, not minhash's). The cap is enforced
    * INSIDE the aggregation (graft_bounded_collect releases a bucket's
    * members the moment it exceeds the cap), so no task ever holds an
    * over-capacity member list, and the drop is observable through
    * DropGuard (stderr warning + metrics when material).
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minEstJaccard: Double = 0.5, maxBucketSize: Int = 4096): DataFrame = {
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val rows = numHashes / bands
    val sig = wordShingles(docs, idCol, textCol, shingleN)
      .groupBy("id")
      .agg(call_function("graft_minhash_sig", col("shingle"), lit(numHashes)).as("sig"))
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64((bnd * rows until (bnd + 1) * rows)
          .map(i => element_at(col("sig"), i + 1)): _*).as("band_hash"))
    }
    val banded = sig.select(col("id"), col("sig"),
      explode(array(bandCols: _*)).as("b"))
    val grouped = DropGuard.observed(
      banded.groupBy(col("b"))
        .agg(call_function("graft_bounded_collect",
          struct(col("id"), col("sig")), lit(maxBucketSize)).as("c")),
      "minHashLshPairs")
      .filter(col("c.ms").isNotNull && size(col("c.ms")) > 1)
      .select(col("c.ms").as("ms"))
    // native lazy pair expansion (see ngramJaccardPairs); agreement is
    // computed on the emitted pair's carried signature arrays
    grouped.select(call_function("graft_ordered_pairs", col("ms")).as(Seq("x", "y")))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(size(filter(zip_with(col("x.sig"), col("y.sig"),
          (p, q) => p === q), e => e)).cast("double") / numHashes, 4)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens (unit weights): (id, simhash).
    * bit b of the result = sign of sum over tokens of (2*bit_b(h)-1).
    * One explode + ONE native map-side-combined aggregate
    * (graft.functions.SimHashAgg: a long[64] counter buffer that also
    * folds the final code) — a single narrow shuffle keyed by the id,
    * one plan expression where the composed form carried 64 sum
    * columns plus a 64-term fold projection.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simHashWith(docs, idCol, textCol, xxhash64(_))

  /** [[simHash]] with the token-hash family INJECTED — the whole
    * pipeline (tokenize, explode, one native `graft_simhash`
    * aggregate) is shared verbatim between the xxhash64 production
    * family and the md5 oracle family, so the two differ in exactly
    * one scalar expression; that shared-code construction is the
    * twin ≡ production pin the md5-oracled registrations (q41/q86/
    * q366) rest on.
    */
  def simHashWith(docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = explode(TextOps.tokens(col("_t"))).as("tok")
    // parallelism floor before tokenize+hash (the wordShingles guard)
    SkewOps.parallelismFloor(
        docs.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"), tok)
      .select(col("id"), tokenHash(col("tok")).as("h"))
      .groupBy("id").agg(call_function("graft_simhash", col("h")).as("simhash"))
  }

  /** 64-bit long from the FIRST 16 hex chars of md5(value): char 1 is
    * the most-significant nibble, so bit b (0 = LSB) of the result is
    * bit (b mod 4) of hex digit 16 − b/4 — exactly the layout the
    * DuckDB oracles decode digitwise (no `conv` there). The two
    * 32-bit halves convert exactly (< 2³²) and the hi shift
    * reassembles the full two's-complement pattern bit-for-bit, so
    * this is the oracle-replayable member of the 64-bit token-hash
    * family ([[simHash]]'s xxhash64 being the production member).
    */
  def md5Long64(c: Column): Column = {
    // native digest split (graft_md5_longs, words 1–2) — callers
    // register GraftFunctions via simHashWith/graft entry points; the
    // hex form this replaces was conv(substring(md5_hex,1|9,8),16,10)
    val h = call_function("graft_md5_longs", c.cast("binary"))
    val hi = element_at(h, 1)
    val lo = element_at(h, 2)
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Oracle-replayable SimHash: [[simHashWith]] under the
    * [[md5Long64]] hash family — same plan shape as production, every
    * stage replayable in ANSI SQL ([[simHashMd5OracleSql]]).
    */
  def simHashMd5(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simHashWith(docs, idCol, textCol, md5Long64)

  /** Shared DuckDB CTE body computing (id, simhash) for the
    * [[md5Long64]] family over [[TextOps.tokens]] — per-token md5 hex
    * decoded digitwise into 64 sign counters, code assembled in
    * HUGEINT and folded to the signed BIGINT two's-complement value
    * [[simHashMd5]] emits. `p` prefixes the CTE names so the body
    * composes into larger oracles (q111) without collisions.
    */
  private def simHashMd5Ctes(p: String, table: String, idCol: String,
      textCol: String): String =
    s"""${p}tok AS (
       | SELECT id, md5(t) AS h FROM (
       |  SELECT $idCol AS id, unnest(list_filter(
       |    string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'),
       |    x -> x <> '')) AS t
       |  FROM $table) t0),
       |${p}bits AS (
       | SELECT id, b,
       |  sum(CASE WHEN ((strpos('0123456789abcdef',
       |      substr(h, CAST(16 - (b // 4) AS INT), 1)) - 1)
       |     // (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
       |        ELSE 8 END)) % 2 = 1
       |   THEN 1 ELSE -1 END) AS s
       | FROM ${p}tok CROSS JOIN
       |   (SELECT unnest(generate_series(0, 63)) AS b) bs
       | GROUP BY id, b),
       |${p}code AS (
       | SELECT id, CAST(CASE WHEN hs >= CAST('9223372036854775808' AS HUGEINT)
       |    THEN hs - CAST('18446744073709551616' AS HUGEINT) ELSE hs END
       |   AS BIGINT) AS simhash
       | FROM (SELECT id, sum(CASE WHEN s > 0 THEN (CAST(1 AS HUGEINT) << b)
       |         ELSE CAST(0 AS HUGEINT) END) AS hs
       |       FROM ${p}bits GROUP BY id) t)""".stripMargin

  /** DuckDB replay of [[simHashMd5]]: (id, simhash). */
  def simHashMd5OracleSql(table: String, idCol: String,
      textCol: String): String =
    s"""WITH ${simHashMd5Ctes("", table, idCol, textCol)}
       |SELECT id, simhash FROM code""".stripMargin

  /** DuckDB replay of the md5-family [[simHashPairs]]: brute-force
    * Hamming over the replayed codes — equal to the banded path by
    * the pigeonhole argument (maxHamming < bands), up to the
    * `maxBucketSize` cap the oracle (like [[minHashMd5OracleSql]])
    * does not model; DropGuard makes any cap drop loud on the Spark
    * side, and oracle-SF corpora sit far below it.
    */
  def simHashMd5PairsOracleSql(table: String, idCol: String,
      textCol: String, maxHamming: Int): String =
    s"""WITH ${simHashMd5Ctes("", table, idCol, textCol)}
       |SELECT a.id AS a_id, b.id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM code a JOIN code b ON a.id < b.id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs (a < b, hamming <= maxHamming): the
    * 64-bit code is banded into `bands` equal bit-chunks and pairs are
    * generated only inside chunk buckets. By pigeonhole the banding
    * loses nothing when `maxHamming < bands` — two codes differing in
    * at most maxHamming bits cannot differ in every one of the bands —
    * so the default (3, 4) finds the hamming<=3 pairs, the standard
    * simhash dedup operating point, at bucket-join cost instead of
    * all-pairs. Exactness holds UP TO the `maxBucketSize` cap: a chunk
    * value shared by more documents than the cap (mass-duplicated
    * boilerplate) has its bucket dropped, and pairs whose every
    * agreeing band is that hot are lost — the drop is enforced inside
    * the aggregation (graft_bounded_collect, a real memory bound) and
    * reported through DropGuard (stderr + metrics when material), not
    * silent. Same physical shape as [[minHashLshPairs]]: one signature
    * aggregate, one bucket group, lazy in-row pair expansion, final
    * distinct. A chunk bucket's members are (id, long) structs.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4,
      maxBucketSize: Int = 4096,
      tokenHash: Column => Column = xxhash64(_)): DataFrame =
    simHashBandPairs(simHashBands(docs, idCol, textCol, bands, tokenHash),
      maxHamming, bands, maxBucketSize)

  /** SimHash band rows (id, band, chunk, simhash) — the banded view
    * [[simHashPairs]] buckets on, exposed as a frame so it can also
    * PERSIST as a durable store (q366, the [[minHashMd5Bands]]
    * discipline for the SimHash family): the full 64-bit code rides
    * in the row, so a store serve computes Hamming distance from the
    * store alone — corpus text is never read at serve time.
    */
  def simHashBands(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit(mask)).as("chunk"))
    }
    simHashWith(docs, idCol, textCol, tokenHash)
      .select(col("id"), col("simhash"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"),
        col("b.chunk").as("chunk"), col("simhash"))
  }

  /** Near-dup pairs (a < b, hamming <= maxHamming) from a SimHash
    * band-row frame (live [[simHashBands]] output or a persisted
    * store read back) — bucket group, lazy in-row pair expansion,
    * Hamming from the carried codes, final distinct. Pigeonhole
    * exactness (up to the bucket cap) needs maxHamming < bands,
    * exactly as in [[simHashPairs]].
    */
  def simHashBandPairs(bandRows: DataFrame, maxHamming: Int,
      bands: Int, maxBucketSize: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming < bands,
      s"exactness needs maxHamming < bands, got $maxHamming vs $bands")
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    graft.functions.GraftFunctions.register(bandRows.sparkSession)
    val grouped = DropGuard.observed(
      bandRows.groupBy(col("band"), col("chunk"))
        .agg(call_function("graft_bounded_collect",
          struct(col("id"), col("simhash")), lit(maxBucketSize)).as("c")),
      "simHashPairs")
      .filter(col("c.ms").isNotNull && size(col("c.ms")) > 1)
      .select(col("c.ms").as("ms"))
    grouped.select(call_function("graft_ordered_pairs", col("ms")).as(Seq("x", "y")))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        hamming(col("x.simhash"), col("y.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Benchmark-contamination check: for each corpus document, how many
    * of its distinct word n-grams appear anywhere in the benchmark
    * set, and the contaminated fraction. Standard eval-decontamination
    * sweep for training corpora.
    *
    * Scale shape: the benchmark is small by construction (eval sets
    * are thousands of documents, the corpus is the 100 TB side), so
    * its distinct-gram set BROADCASTS and the corpus pays one narrow
    * left-semi probe plus one aggregation keyed by doc id — the
    * corpus is never shuffled on the gram.
    */
  def contaminationOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val cg = wordShingles(corpus, idCol, textCol, n)
    val bg = wordShingles(benchmark, idCol, textCol, n)
      .select(col("shingle")).distinct()
    cg.join(broadcast(bg), Seq("shingle"), "left_semi")
      .groupBy("id", "n_sh").agg(count(lit(1)).as("n_contaminated"))
      .select(col("id"), col("n_sh").as("n_grams"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_sh"), 5)
          .as("contamination"))
  }

  /** Cluster-dedup retention policy: among documents sharing a dedup
    * key (exact text hash, whitespace-insensitive fingerprint, or an
    * LSH cluster id), keep the best-scoring one (ties → lowest id).
    *
    * ONE aggregation with map-side combine: each partition reduces to
    * one candidate per key BEFORE the shuffle, so a dup-heavy corpus
    * (the whole point of dedup) moves ~distinct-keys rows, not every
    * duplicate — where the obvious `row_number over (partition by
    * key)` window ships and sorts all members of every cluster, and a
    * viral million-copy document becomes one task's sort.
    *
    * `min_by` over (−score, id): min of the negated score is the max
    * score, ties resolve to the lowest id. The score is cast to
    * double for negation (exact for |score| < 2⁵³); the emitted
    * keep_score keeps the original type. A NULL score negates to
    * +Infinity so unscored documents lose to any scored one (bare
    * struct ordering would sort nulls FIRST and pick them); NaN
    * negates to NaN, which Spark orders above +Infinity — last either
    * way.
    */
  def keepBest(docs: DataFrame, idCol: String, dedupKey: Column,
      score: Column): DataFrame =
    docs.select(col(idCol).as("id"), dedupKey.as("dedup_key"), score.as("_score"))
      .groupBy("dedup_key")
      .agg(
        min_by(struct(col("id"), col("_score")),
          struct(coalesce(-col("_score").cast("double"),
            lit(Double.PositiveInfinity)).as("negScore"), col("id")))
          .as("best"),
        count(lit(1)).as("n_candidates"))
      .select(col("dedup_key"), col("best.id").as("keep_id"),
        col("best._score").as("keep_score"), col("n_candidates"))

  /** Cross-batch exact dedup against a persisted signature store — the
    * operational loop of a continuous ingest: each incoming batch is
    * deduped (a) within itself (first id per content hash wins) and
    * (b) against every previously-admitted batch, then the store
    * learns the admitted hashes.
    *
    * The store is a plain parquet directory of 16-byte hex digests —
    * no service, engine-agnostic, append-only (admission order gives
    * idempotency: re-running a batch admits nothing new). At 100 TB
    * the anti join is a shuffle on the digest only; the corpus text
    * never moves, and the store stays ~32 bytes × corpus size.
    *
    * Returns the admitted rows (original columns); rows with NULL text
    * carry no signature and pass through un-deduped. `idCol` must be
    * unique per row (the winner's full row is recovered by a semi join
    * on it). Batch admission is ONE atomic parquet append of the
    * admitted digests; concurrent writers need an external commit
    * protocol, as with any file sink. The returned frame is backed by
    * a narrow (sig, id) localCheckpoint — free it with
    * [[Checkpoints.release]] once consumed.
    */
  def dedupAgainstStore(batch: DataFrame, idCol: String, textCol: String,
      storePath: String): DataFrame = {
    val staged = dedupAgainstStoreStaged(batch, idCol, textCol, storePath)
    staged.commit()
    staged.admitted
  }

  /** The admitted batch plus its not-yet-run store admission.
    * `admitted` is safe to write/inspect before `commit()`; calling
    * `commit()` appends the batch's digests to the store (idempotent
    * to skip, NOT idempotent to run twice — commit exactly once, after
    * the survivors are durably persisted).
    */
  final case class StagedAdmission(admitted: DataFrame, commit: () => Unit)

  /** [[dedupAgainstStore]] with admission split from computation, for
    * exactly-once recovery: the eager variant appends the admitted
    * digests to the store BEFORE the caller has persisted the admitted
    * rows, so a downstream write failure makes a re-run return empty
    * (sigs already admitted) — silently and permanently dropping the
    * batch. Staged order is: (1) read `admitted`, write the survivors
    * wherever they live; (2) `commit()`. A crash between (1) and (2)
    * re-admits the batch on retry — duplicate *writes* are then the
    * caller's overwrite/idempotent-sink problem, never data loss.
    * (If the eager variant's recovery is ever needed: delete the
    * store's parquet files whose modification time matches the failed
    * run before re-running.)
    */
  def dedupAgainstStoreStaged(batch: DataFrame, idCol: String,
      textCol: String, storePath: String): StagedAdmission = {
    val spark = batch.sparkSession
    val cols = batch.columns.toIndexedSeq
    val sigged = batch.withColumn("_sig", md5(col(textCol).cast("binary")))
    // null text has no signature: such rows pass through un-deduped
    // (admitting doc B because doc A was ALSO missing its text would
    // be silent data loss) and contribute nothing to the store
    val nullSig = sigged.filter(col("_sig").isNull).select(cols.map(col): _*)
    // keep-first-per-sig as a map-side-combinable min aggregation, NOT
    // a row_number window: a viral million-copy document combines to
    // one candidate per partition instead of one task's sort. Keys
    // only — the winners' full rows are recovered by a semi join at
    // the end, so the checkpoint below stays two narrow columns.
    val winners = sigged.filter(col("_sig").isNotNull)
      .groupBy("_sig")
      .agg(min(col(idCol)).as(idCol))
    val seen = try {
      spark.read.parquet(storePath)
    } catch {
      // ONLY path-not-found means "first batch" — a corrupt or
      // schema-broken store must fail loudly, not silently disable
      // cross-batch dedup
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
            e.getMessage.toLowerCase.contains("path does not exist") =>
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("_sig",
              org.apache.spark.sql.types.StringType))))
    }
    // The admitted KEY set MUST be materialized with its lineage cut
    // BEFORE the append: writing to storePath triggers Spark's
    // path-cache refresh, so a lazy (or merely persisted) plan that
    // still references the store would re-list it on the caller's
    // action and anti-join the batch against its own just-written
    // sigs — admitting nothing. localCheckpoint is eager and leaves
    // no reference to the path; it holds (sig, id) only — never the
    // documents — and callers free it with Checkpoints.release on the
    // returned frame once consumed.
    val admittedKeys = winners.join(seen, Seq("_sig"), "left_anti")
      .localCheckpoint()
    val admitted = batch
      .join(admittedKeys.select(idCol), Seq(idCol), "left_semi")
      .unionByName(nullSig)
    StagedAdmission(admitted,
      () => admittedKeys.select("_sig").write.mode("append").parquet(storePath))
  }

  /** EXACT substring-level duplicate spans (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr family): maximal token spans of length >= `k` that
    * occur verbatim more than once in the corpus — templated
    * boilerplate shared inside otherwise-distinct documents, which
    * document-level and probabilistic (MinHash/SimHash) dedup only
    * catch by luck.
    *
    * Exactness argument: a verbatim repeat of >= k tokens contains an
    * aligned repeat of SOME k-token gram, and conversely any k-gram
    * with corpus frequency >= 2 IS a verbatim >= k-token repeat — so
    * "positions whose k-gram repeats" identifies exactly the tokens
    * covered by duplicated spans, and merging consecutive flagged
    * positions per document reconstructs the maximal spans (start,
    * token length). Within-document repeats count (Lee et al.
    * semantics): the corpus-frequency criterion is over occurrences,
    * not distinct documents.
    *
    * Scale shape, in suffix-array terms: the paper's suffix array is
    * replaced by a gram-digest shuffle — same O(total tokens) working
    * set, but expressed as groupBy/semi-join/window, so Spark
    * partitions it instead of a single-machine sort. Three exchanges:
    * (1) digest groupBy for frequencies (map-side combine collapses
    * each partition to its distinct digests — heavy-hitter grams are
    * NOT a hotspot, no member list is ever materialized), (2)
    * broadcast-or-shuffle LEFT SEMI join of positions against
    * repeated digests — count>=2 filtering happens BEFORE the join,
    * so the build side is only the duplicated grams, typically
    * corpus-tiny, (3) the per-document window for span merge,
    * partitioned by doc (no global sort). Positions shuffle as
    * (id, pos, 16-byte digest), never the gram text.
    *
    * Both branches consume the position frame; how it is produced is
    * `persistPositions`'s trade, measured both ways at sf0.1:
    *  - true (default): ONE tokenize+digest scan, lazily
    *    localCheckpointed (memory-and-disk) and read twice. Right
    *    while the ~28 B/token position cache is cheaper than a second
    *    scan — always at bench scale, and at cluster scale whenever
    *    tokenize+digest dominates I/O. Storage is released with
    *    [[Checkpoints.release]] on the returned frame once consumed.
    *  - false: recompute the projection from the source on each
    *    branch (the r8 shape — two scans, zero cache). Right when the
    *    position cache (~larger than the corpus) would out-cost the
    *    rescan — e.g. cold object-store input with cheap tokens.
    * A count-window one-pass variant was measured and rejected: per-
    * group window machinery over millions of ~unique digests ran 25×
    * slower cold than the groupBy+semi-join it replaced (BENCHNOTES).
    */
  def substrDupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, persistPositions: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = col("_w")
    // gram starts at token i (1-based): k tokens i..i+k-1; digest via
    // md5 (engine-portable, collision-negligible and documented)
    val grams = when(size(w) >= k,
      transform(
        sequence(lit(1), size(w) - (k - 1)),
        i => md5(concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*)
          .cast("binary")))
    ).otherwise(array())
    val posPlan = docs
      .select(col(idCol).as("id"), split(lower(col(textCol)), TextOps.Ws).as("_w"))
      // Generate barrier so `split` runs once per row, not once per
      // lambda element (the wordShingles lesson, measured 37×)
      .select(col("id"), explode(array(grams)).as("_g"))
      .select(col("id"), posexplode(col("_g")).as(Seq("pos", "gd")))
    val pos =
      if (persistPositions) posPlan.localCheckpoint(eager = false)
      else posPlan
    val repeated = pos.groupBy("gd").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
    val flagged = pos.join(repeated.select("gd"), Seq("gd"), "left_semi")
    // gaps-and-islands: consecutive flagged gram starts share one span
    val isl = flagged.withColumn("_isl",
      col("pos") - row_number().over(
        Window.partitionBy("id").orderBy("pos")))
    isl.groupBy(col("id"), col("_isl"))
      .agg(min("pos").as("span_start"),
        (max("pos") - min("pos") + k).cast("long").as("span_tokens"))
      .select(col("id"), col("span_start").cast("long").as("span_start"),
        col("span_tokens"))
  }

  /** Rewrite documents with flagged duplicate spans CUT OUT — the
    * consumer of [[substrDupSpans]] that completes the Lee et al.
    * ExactSubstr pipeline (detect → remove): `spans` is a frame of
    * (id, span_start, span_tokens) token ranges (0-based start, the
    * substrDupSpans output shape), and the result is each document
    * with those token ranges deleted and the survivors rejoined by
    * single spaces.
    *
    * Policy stays in the span frame, mechanism here: passing
    * substrDupSpans verbatim cuts EVERY occurrence of duplicated
    * text; a keep-one-copy policy is a filter on the span frame
    * (e.g. anti-join the first doc per duplicate group) before
    * calling — the rewrite itself does not decide.
    *
    * Token positions index the SAME boundaries substrDupSpans flagged:
    * the split regex is identical and case-folding never moves a
    * whitespace boundary, so cutting from the original-case token
    * array is exact. Output text is token-normalized (whitespace runs
    * collapse to one space) — the only honest contract once tokens,
    * not characters, are the unit of removal.
    *
    * Scale shape: spans aggregate per doc (map-side combined; span
    * lists are maximal merged islands, so their count is bounded by
    * tokens/k), ONE shuffle on the doc id for the join, and the cut
    * itself is a per-row codegen'd lambda — O(tokens × spans_per_doc)
    * comparisons in-row, no explode of per-token rows, the corpus
    * never shuffles by anything but its own id.
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val sp = spans.groupBy(col("id"))
      .agg(collect_list(struct(col("span_start"), col("span_tokens"))).as("_spans"))
    val joined = docs.select(col(idCol).as("id"),
        coalesce(col(textCol), lit("")).as("_text"))
      .join(sp, Seq("id"), "left")
    val toks = split(col("_text"), TextOps.Ws)
    val spansArr = coalesce(col("_spans"),
      array().cast("array<struct<span_start:bigint,span_tokens:bigint>>"))
    // keep token i unless some span covers it; spans are few per doc
    // (merged maximal islands), so exists() is a short in-row scan
    val kept = filter(toks, (_, i) =>
      !exists(spansArr, s => i.cast("long") >= s.getField("span_start") &&
        i.cast("long") < s.getField("span_start") + s.getField("span_tokens")))
    joined.select(col("id"),
      (size(toks) - size(kept)).cast("long").as("n_tokens_removed"),
      concat_ws(" ", kept).as("text_clean"))
  }

  /** Token spans of corpus documents that VERBATIM-overlap a
    * benchmark k-gram set — the span-level view of
    * [[contaminationOverlap]], and the detector half of surgical
    * decontamination: feed the result to [[removeSpans]] to cut the
    * leaked eval text while keeping the document (dropping whole docs
    * for one leaked sentence wastes corpus; leaving the sentence in
    * corrupts the eval).
    *
    * Same mechanics as [[substrDupSpans]] (one tokenize+posexplode
    * pass, md5 gram digests, gaps-and-islands merge into maximal
    * spans), but the flag is membership in the benchmark's digest set
    * instead of corpus-wide repetition — so the probe side BROADCASTS
    * (eval sets are small by construction) and the only shuffle is
    * the per-doc island window, keyed by id. Output shape matches
    * substrDupSpans: (id, span_start, span_tokens), 0-based token
    * positions.
    */
  def benchmarkSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.broadcast
    val w = col("_w")
    val grams = when(size(w) >= k,
      transform(
        sequence(lit(1), size(w) - (k - 1)),
        i => md5(concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*)
          .cast("binary")))
    ).otherwise(array())
    def gramPos(df: DataFrame) = df
      .select(col(idCol).as("id"), split(lower(col(textCol)), TextOps.Ws).as("_w"))
      // Generate barrier (see wordShingles): split runs once per row
      .select(col("id"), explode(array(grams)).as("_g"))
      .select(col("id"), posexplode(col("_g")).as(Seq("pos", "gd")))
    val bg = gramPos(benchmark).select("gd").distinct()
    val flagged = gramPos(corpus).join(broadcast(bg), Seq("gd"), "left_semi")
    val isl = flagged.withColumn("_isl",
      col("pos") - row_number().over(
        Window.partitionBy("id").orderBy("pos")))
    isl.groupBy(col("id"), col("_isl"))
      .agg(min("pos").as("span_start"),
        (max("pos") - min("pos") + k).cast("long").as("span_tokens"))
      .select(col("id"), col("span_start").cast("long").as("span_start"),
        col("span_tokens"))
  }

  /** Shift-tolerant chunk-level dedup via content-defined chunking
    * (the Rabin-style rolling-hash fingerprint family): each document
    * is split at content-defined boundaries (`graft_cdc_chunks` — an
    * exact-integer polynomial window hash, cut where
    * h % divisor == 0), chunks are md5-fingerprinted, and a chunk is
    * "shared" when its fingerprint appears in more than one document.
    * Because boundaries derive from CONTENT, identical passages align
    * to identical chunks regardless of their byte offset — the
    * property fixed-size blocking lacks, and the reason CDC is the
    * standard dedup unit for storage systems and crawl snapshots.
    *
    * Returns one row per document: n_chunks, n_distinct (within-doc),
    * n_shared (chunk instances whose fingerprint occurs in >1 doc),
    * shared_ratio. Expected chunk length ≈ `divisor` chars.
    *
    * Scale shape: chunking and md5 are per-row codegen'd work — the
    * chunk TEXT never shuffles; only (fp, doc_id) pairs move. One
    * shuffle groups fingerprints for the shared set, one joins the
    * flags back (shuffle join on fp — the shared set is corpus-sized
    * in the worst case, so no broadcast), one aggregates per doc.
    * The narrow fingerprint frame is lazily localCheckpointed and fed
    * to both consumers (the substrDupSpans lesson: never re-tokenize
    * the corpus for a second branch); callers release it via the
    * returned frame with [[Checkpoints.release]] once consumed.
    */
  def cdcChunkStats(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Int = 61,
      persistFps: Boolean = true): DataFrame = {
    require(window >= 2 && window <= 8,
      s"window must be in [2, 8] (exact-arithmetic bound), got $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fpsPlan = docs.select(col(idCol).as("doc_id"),
        explode(call_function("graft_cdc_chunks",
          col(textCol), lit(window), lit(divisor))).as("chunk"))
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("fp"))
    val fps = if (persistFps) fpsPlan.localCheckpoint(eager = false) else fpsPlan
    val shared = fps.groupBy("fp")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("fp"), lit(1).as("is_shared"))
    fps.join(shared, Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count_distinct(col("fp")).as("n_distinct"),
        count(col("is_shared")).as("n_shared"))
      .withColumn("shared_ratio",
        round(col("n_shared").cast("double") / col("n_chunks"), 5))
  }

  /** One precision/recall row for a detected pair set against an exact
    * truth pair set. Pairs are normalized to unordered (lo, hi) keys
    * before the comparison — the three pair generators all emit
    * ordered pairs, but their internal orderings differ (by (id, n_sh)
    * struct vs posting order), so identity must not depend on emission
    * order. ONE full-outer join + one aggregate; both inputs are
    * already-materialized small pair sets. Empty denominators yield
    * NULL (nothing to measure), mirroring [[SimilarityOps]]'s recall
    * contract.
    */
  private def pairPrRow(truth: DataFrame, detected: DataFrame,
      method: String, theta: Double): DataFrame = {
    def keyed(df: DataFrame, marker: String) = df.select(
        least(col("a_id"), col("b_id")).as("lo"),
        greatest(col("a_id"), col("b_id")).as("hi"))
      .distinct().withColumn(marker, lit(1))
    keyed(truth, "_t").join(keyed(detected, "_d"), Seq("lo", "hi"), "full_outer")
      .agg(count(col("_t")).as("n_true"), count(col("_d")).as("n_detected"),
        count(when(col("_t").isNotNull && col("_d").isNotNull, 1)).as("n_hit"))
      .select(lit(method).as("method"), lit(theta).as("theta"),
        col("n_true"), col("n_detected"), col("n_hit"),
        when(col("n_detected") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_detected"), 4))
          .as("precision"),
        when(col("n_true") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_true"), 4))
          .as("recall"))
  }

  /** Near-dup detection quality as harness-visible NUMBERS: precision
    * and recall of the MinHash-LSH and SimHash candidate paths against
    * the exact n-gram-Jaccard ground truth, one row per method — the
    * dedup twin of [[SimilarityOps.annRecallReport]]. The approximate
    * paths are xxhash64-seeded and can never have a SQL oracle; this
    * converts them from "rows>0" checks into quantified quality
    * signals with Verify-enforced floors.
    *
    * Truth semantics per row: MinHash estimates Jaccard directly, so
    * its truth is exact pairs at the SAME `minJaccard` threshold (its
    * precision prices the estimation error of `numHashes` agreements;
    * its recall prices banding misses plus bucket-cap drops). SimHash
    * detects near-identical documents, not moderate overlap — scoring
    * it against `minJaccard` truth would conflate design intent with
    * failure — so its truth is exact pairs at `simHashTruthJaccard`.
    *
    * `sampleFraction` is the at-scale path (the exact baseline is the
    * quadratic part): a deterministic corpus sample, identical across
    * the three subtrees, gives an unbiased estimate of full-corpus
    * precision/recall — same argument as the ANN scoreboard.
    */
  def dedupRecallReport(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8,
      simHashTruthJaccard: Double = 0.9, maxHamming: Int = 3,
      sampleFraction: Double = 1.0,
      md5Family: Boolean = false): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(minJaccard <= simHashTruthJaccard,
      s"simhash truth ($simHashTruthJaccard) must be at least as strict " +
        s"as the jaccard threshold ($minJaccard)")
    val docs0 = if (sampleFraction >= 1.0) docs
      else SampleOps.deterministicSample(docs, idCol, sampleFraction,
        salt = "dedup_recall")
    // three independent expensive subtrees → concurrent localCheckpoint,
    // released before returning (the annRecallReport discipline)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // md5Family scores the oracle-replayable md5 detector twins (the
    // q111 registration — the whole scoreboard then has a SQL oracle,
    // [[dedupRecallMd5OracleSql]]); default scores the xxhash64
    // production paths (spec coverage, at-scale default).
    val frames = Seq(
      ngramJaccardPairs(
        wordShingles(docs0, idCol, textCol, shingleN), minJaccard,
        sizesProvided = true),
      if (md5Family)
        lshBandPairs(minHashMd5Bands(docs0, idCol, textCol, shingleN,
          numHashes, bands), numHashes, minEstJaccard = minJaccard)
      else minHashLshPairs(docs0, idCol, textCol, shingleN, numHashes,
        bands, minEstJaccard = minJaccard),
      if (md5Family)
        simHashPairs(docs0, idCol, textCol, maxHamming,
          tokenHash = md5Long64)
      else simHashPairs(docs0, idCol, textCol, maxHamming))
    // each pair set is small (thresholded near-dup pairs) — COLLECT
    // the normalized (lo, hi) keys concurrently instead of
    // checkpointing three frames and running two full-outer-join
    // report subtrees on them: pairPrRow's arithmetic (distinct
    // normalized keys, intersection, HALF_UP rounding) is set algebra
    // the driver replays exactly (the annRecallReport discipline).
    // least/greatest stay IN the select so id-ordering semantics are
    // Spark's own; exact keeps jaccard for the simhash-truth refilter.
    val futs = Seq(
      Future(frames(0).select(least(col("a_id"), col("b_id")).as("lo"),
          greatest(col("a_id"), col("b_id")).as("hi"), col("jaccard"))
        .collect().map(r => ((r.get(0), r.get(1)), r.getDouble(2)))),
      Future(frames(1).select(least(col("a_id"), col("b_id")).as("lo"),
          greatest(col("a_id"), col("b_id")).as("hi"))
        .collect().map(r => ((r.get(0), r.get(1)), 0.0d))),
      Future(frames(2).select(least(col("a_id"), col("b_id")).as("lo"),
          greatest(col("a_id"), col("b_id")).as("hi"))
        .collect().map(r => ((r.get(0), r.get(1)), 0.0d))))
    val Seq(exactKJ, mhK, simK) = Await.result(Future.sequence(futs),
      Duration.Inf)
    // distinct-normalized-key semantics: a (lo, hi) key's truth
    // membership is "any collected row has it" — for the simhash
    // truth row, "any row at or above the stricter threshold"
    val exactAll = exactKJ.map(_._1).toSet
    val exactStrict = exactKJ.collect {
      case (k, j) if j >= simHashTruthJaccard => k
    }.toSet
    def prVals(truth: Set[(Any, Any)], det: Set[(Any, Any)],
        method: String, theta: Double): org.apache.spark.sql.Row = {
      val nTrue = truth.size.toLong
      val nDet = det.size.toLong
      val nHit = truth.count(det.contains).toLong
      def ratio(num: Long, den: Long) = if (den == 0L) null
        else java.lang.Double.valueOf(BigDecimal(num.toDouble / den)
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      org.apache.spark.sql.Row(method, theta, nTrue, nDet, nHit,
        ratio(nHit, nDet), ratio(nHit, nTrue))
    }
    // schema from the UNEXECUTED SQL report (analysis only, no jobs)
    val schema = pairPrRow(frames(0), frames(1), "minhash_lsh",
      minJaccard).schema
    val rows = Seq(
      prVals(exactAll, mhK.map(_._1).toSet, "minhash_lsh", minJaccard),
      prVals(exactStrict, simK.map(_._1).toSet, "simhash",
        simHashTruthJaccard))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** DuckDB replay of [[dedupRecallReport]] with `md5Family = true`:
    * the exact n-gram-Jaccard truth, the md5-MinHash banded
    * candidates ([[minHashMd5OracleSql]] nested verbatim) and the md5
    * SimHash Hamming pairs ([[simHashMd5PairsOracleSql]] nested
    * verbatim) all replay from scratch; the PR rows keep
    * pairPrRow's zero-denominator NULL contract and 4dp rounding.
    */
  def dedupRecallMd5OracleSql(table: String, idCol: String,
      textCol: String, shingleN: Int = 3, minJaccard: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8,
      simHashTruthJaccard: Double = 0.9, maxHamming: Int = 3): String = {
    val gram = (0 until shingleN).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    val mh = minHashMd5OracleSql(table, idCol, textCol, shingleN,
      numHashes, bands, minJaccard)
    val sm = simHashMd5PairsOracleSql(table, idCol, textCol, maxHamming)
    val jac = "round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 5)"
    s"""WITH exw AS (
       | SELECT $idCol AS id,
       |   string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+') AS w
       | FROM $table),
       |exsh AS (
       | SELECT DISTINCT id, shingle FROM (
       |  SELECT id, unnest(list_transform(
       |      generate_series(1, greatest(len(w) - ${shingleN - 1}, 0)),
       |    i -> $gram)) AS shingle
       |  FROM exw) t),
       |exsizes AS (SELECT id, count(*) AS n_sh FROM exsh GROUP BY id),
       |exinter AS (
       | SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
       | FROM exsh a JOIN exsh b ON a.shingle = b.shingle AND a.id < b.id
       | GROUP BY 1, 2),
       |ex AS (
       | SELECT a_id, b_id, $jac AS jaccard
       | FROM exinter
       | JOIN exsizes sa ON exinter.a_id = sa.id
       | JOIN exsizes sb ON exinter.b_id = sb.id
       | WHERE $jac >= $minJaccard),
       |mh AS ($mh),
       |sm AS ($sm)
       |SELECT method, theta, n_true, n_detected, n_hit,
       | CASE WHEN n_detected = 0 THEN NULL
       |   ELSE round(CAST(n_hit AS DOUBLE) / n_detected, 4)
       |   END AS "precision",
       | CASE WHEN n_true = 0 THEN NULL
       |   ELSE round(CAST(n_hit AS DOUBLE) / n_true, 4) END AS recall
       |FROM (
       | SELECT 'minhash_lsh' AS method, CAST($minJaccard AS DOUBLE) AS theta,
       |  (SELECT count(*) FROM ex) AS n_true,
       |  (SELECT count(*) FROM mh) AS n_detected,
       |  (SELECT count(*) FROM ex JOIN mh USING (a_id, b_id)) AS n_hit
       | UNION ALL
       | SELECT 'simhash', CAST($simHashTruthJaccard AS DOUBLE),
       |  (SELECT count(*) FROM ex WHERE jaccard >= $simHashTruthJaccard),
       |  (SELECT count(*) FROM sm),
       |  (SELECT count(*) FROM
       |    (SELECT a_id, b_id FROM ex WHERE jaccard >= $simHashTruthJaccard) e
       |    JOIN sm USING (a_id, b_id))) t""".stripMargin
  }
}
