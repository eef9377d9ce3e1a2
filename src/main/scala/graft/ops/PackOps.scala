package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence assembly: turning a cleaned corpus into the
  * fixed-length sequences a pretraining run actually consumes.
  *
  * Two stages, both deterministic and engine-portable:
  *  - [[chunkTokens]] splits each document into overlapping
  *    fixed-token chunks (context-window sharding of long docs);
  *  - [[packSequences]] lays documents end-to-end inside hash buckets
  *    and reports which fixed-size training sequences each document
  *    lands in (the "concat then cut every L tokens" packing used by
  *    GPT-style pipelines).
  */
object PackOps {

  /** Overlapping fixed-token chunks per document. Chunk `i` covers
    * tokens `[i*stride, i*stride + chunkSize)` (stride = chunkSize −
    * overlap); the last chunk truncates at the document end. Documents
    * shorter than `chunkSize` yield exactly one chunk.
    *
    * Pure per-row array expressions + one `posexplode` — zero
    * shuffles, composes with any scan. The token array is materialized
    * through a generate barrier first (see DedupOps.wordShingles):
    * without it Catalyst collapses the Projects and re-runs the
    * tokenizer split once per chunk.
    *
    * Chunk count uses integer arithmetic — `(n − overlap + stride − 1)
    * div stride`, floored via exact double division (n < 2⁵³) — so any
    * engine computes the same chunking.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val w = col("_w")
    val n = size(w)
    val nChunks = greatest(
      floor((n - lit(overlap) + lit(stride - 1)).cast("double") / lit(stride)),
      lit(1L))
    def chunk(i: Column) = slice(w, (i * stride + 1).cast("int"), lit(chunkSize))
    df.select(col(idCol).as("id"),
        TextOps.tokens(col(textCol)).as("_toks"))
      .select(col("id"), explode(array(col("_toks"))).as("_w")) // barrier
      .select(col("id"),
        posexplode(transform(sequence(lit(0L), nChunks - 1), i =>
          struct(size(chunk(i)).as("n_chunk_tokens"),
            concat_ws(" ", chunk(i)).as("chunk")))).as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx").cast("int").as("chunk_idx"),
        col("c.n_chunk_tokens").as("n_chunk_tokens"), col("c.chunk").as("chunk"))
  }

  /** Sequence packing: documents are laid end-to-end in `bucketCol`
    * order-independent buckets, ordered by id within each bucket, and
    * the concatenated token stream is cut every `contextLen` tokens.
    * Reports, per document, its start offset in the bucket stream and
    * the first/last training sequence it lands in (`n_seqs` > 1 means
    * the document straddles a cut).
    *
    * One shuffle: the per-bucket window. Buckets are the scale
    * contract — packing is inherently sequential inside a stream, so
    * the caller picks enough buckets that each stream fits an executor
    * (1000 buckets over 100 TB ≈ 100 GB of token COUNTS per stream —
    * the window carries (id, n_tokens) only, never text).
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: Column,
      bucketCol: Column, contextLen: Int): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val base = df.select(col(idCol).as("id"), nTokCol.cast("long").as("n_tokens"),
      bucketCol.cast("long").as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("id")
    val start = sum("n_tokens").over(w) - col("n_tokens")
    base
      .withColumn("start_tok", start)
      .withColumn("seq_first", floor(col("start_tok").cast("double") / contextLen))
      .withColumn("seq_last",
        floor((col("start_tok") + greatest(col("n_tokens"), lit(1L)) - 1)
          .cast("double") / contextLen))
      .select(col("bucket"), col("id"), col("n_tokens"), col("start_tok"),
        col("seq_first"), col("seq_last"),
        (col("seq_last") - col("seq_first") + 1).as("n_seqs"))
  }

  /** Sentence-preserving passage windows — the RAG/retrieval chunker:
    * split each document at sentence boundaries (literal ". ", chosen
    * because the oracle's RE2 engine has no lookbehind; non-final
    * sentences therefore shed their terminal period and passages
    * reassemble with ". "), then open a new passage every time the
    * running token count crosses a multiple of `tokensPerPassage`
    * (cumulative-floor assignment: sentences never split, a passage
    * may overshoot the budget by at most one sentence). Entirely
    * per-row array expressions — ZERO shuffle; the explode emits
    * (doc, passage) rows straight off the scan. Docs with no
    * sentences emit nothing.
    */
  def passageWindows(df: DataFrame, idCol: String, textCol: String,
      tokensPerPassage: Int): DataFrame = {
    require(tokensPerPassage > 0, s"bad passage budget $tokensPerPassage")
    val L = tokensPerPassage
    val sents0 = filter(
      transform(split(col(textCol), "\\. "), s => trim(s)), s => s =!= "")
    val base = df.select(col(idCol).as("id"), sents0.as("sents"))
      .where(size(col("sents")) > 0)
    // passage id per sentence: floor(tokens-before / L)
    val tc = transform(col("sents"),
      s => size(TextOps.tokens(s)).cast("long"))
    val withPid = base.select(col("id"), col("sents"),
      transform(sequence(lit(1), size(col("sents"))), i =>
        floor(aggregate(slice(tc, lit(1), i - 1), lit(0L), _ + _) / lit(L))
          .cast("long")).as("pid"))
    val pmax = element_at(col("pid"), -1)
    val perPassage = withPid.select(col("id"),
      explode(transform(sequence(lit(0L), pmax), p => {
        val sel = transform(
          filter(sequence(lit(1), size(col("sents"))),
            i => element_at(col("pid"), i) === p),
          i => element_at(col("sents"), i))
        struct(p.as("passage_id"), sel.as("sel"))
      })).as("x"))
    perPassage
      // an over-budget single sentence makes the running count skip a
      // multiple of L; drop the resulting empty ids
      .where(size(col("x.sel")) > 0)
      .select(col("id"),
        col("x.passage_id").as("passage_id"),
        size(col("x.sel")).as("n_sentences"),
        size(TextOps.tokens(array_join(col("x.sel"), ". "))).as("n_tokens"),
        md5(array_join(col("x.sel"), ". ").cast("binary")).as("passage_md5"))
  }

  /** Context-length budgeting report: for each candidate sequence
    * length L, what a naive pad-each-doc-to-L batcher wastes versus
    * the contiguous packing [[packSequences]] implements — the table
    * a pipeline owner reads to pick L before launching a training
    * run. Per L: docs truncated, tokens lost to truncation, padding
    * waste under per-doc padding, ideal packed-sequence count
    * (⌈Σ min(n,L) / L⌉, exact integer math), and both utilizations.
    * One pass over per-doc token counts (an |L-values|-way explode of
    * a 3-long array — row growth ×3, all map-side combined to |L|
    * rows); token counts come from the caller so the same report runs
    * on BPE counts (q132) or whitespace counts unchanged.
    */
  def packEfficiency(counts: DataFrame, nTokCol: String,
      lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ > 0), s"bad lengths $lengths")
    val n = col(nTokCol).cast("long")
    counts
      .select(explode(typedlit(lengths.map(_.toLong))).as("seq_len"), n.as("n"))
      .select(col("seq_len"), col("n"),
        least(col("n"), col("seq_len")).as("kept"))
      .groupBy("seq_len").agg(
        count(lit(1)).as("n_docs"),
        sum((col("n") > col("seq_len")).cast("long")).as("n_truncated"),
        sum(greatest(col("n") - col("seq_len"), lit(0L))).as("trunc_loss_tokens"),
        sum(col("seq_len") - col("kept")).as("pad_waste_tokens"),
        sum(col("kept")).as("kept_tokens"))
      .select(col("seq_len"), col("n_docs"), col("n_truncated"),
        col("trunc_loss_tokens"), col("pad_waste_tokens"),
        ((col("kept_tokens") + col("seq_len") - 1) / col("seq_len"))
          .cast("long").as("n_packed_seqs"),
        round(col("kept_tokens").cast("double") /
          (col("n_docs") * col("seq_len")), 4).as("util_padded"),
        round(col("kept_tokens").cast("double") /
          (((col("kept_tokens") + col("seq_len") - 1) / col("seq_len"))
            .cast("long") * col("seq_len")), 4).as("util_packed"))
      .orderBy("seq_len")
  }

  /** SFT example assembly with LOSS MASKS: the first `promptTokens`
    * tokens of each document are the prompt (mask 0 — no gradient),
    * the remainder the completion (mask 1), truncated to `maxLen`
    * total. Emitted as one row per (doc, position) — the exploded
    * twin of the padded-tensor layout, chosen so the DuckDB oracle
    * can replay it value-for-value (array columns defeat the
    * harness's column-sorted hash compare).
    *
    * Pure narrow map + generate: no shuffle; downstream packing
    * composes via [[packSequences]] on the per-doc lengths.
    *
    * @return (id, pos, token, loss_mask) — pos 0-based; docs shorter
    *         than one token emit nothing
    */
  def sftTokenRows(docs: DataFrame, idCol: String, textCol: String,
      promptTokens: Int = 8, maxLen: Int = 64): DataFrame =
    docs.select(col(idCol).as("id"),
        TextOps.tokens(col(textCol)).as("_w"))
      .select(col("id"), explode(array(slice(col("_w"), 1, maxLen))).as("_t"))
      .select(col("id"), posexplode(col("_t")).as(Seq("pos", "token")))
      .select(col("id"), col("pos"), col("token"),
        (col("pos") >= promptTokens).cast("int").as("loss_mask"))

  /** DuckDB replay of [[sftTokenRows]]. */
  def sftTokenRowsOracleSql(table: String, idCol: String, textCol: String,
      promptTokens: Int = 8, maxLen: Int = 64): String =
    s"""WITH w AS (SELECT $idCol AS id, list_filter(string_split_regex(
       |    lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')[1:$maxLen] AS t
       |  FROM $table),
       |e AS (SELECT id, unnest(generate_series(0, len(t) - 1)) AS pos,
       |  unnest(t) AS token FROM w WHERE len(t) > 0)
       |SELECT id, CAST(pos AS INT) AS pos, token,
       |  CAST(pos >= $promptTokens AS INT) AS loss_mask FROM e""".stripMargin

  /** Global token offsets via a TWO-LEVEL prefix sum — the memmap
    * index builder ("document i's tokens start at byte/token offset
    * X") without any global sort: an exclusive cumsum per source
    * (shuffle keyed by source, the partitioning the semantics need)
    * plus a broadcast table of per-source base offsets (sources
    * ordered by name). Long-exact everywhere.
    *
    * @return (id, group, n_tokens, global_offset)
    */
  def tokenOffsets(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    val base = docs.select(col(groupCol).as("grp"),
        coalesce(TextOps.tokenCount(col(textCol)).cast("long"), lit(0L)).as("toks"))
      .groupBy("grp").agg(sum("toks").as("total"))
      .withColumn("base",
        coalesce(sum(col("total")).over(
          Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("grp", "base")
    val local = Window.partitionBy("grp").orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        coalesce(TextOps.tokenCount(col(textCol)).cast("long"), lit(0L)).as("n_tokens"))
      .withColumn("local_off", coalesce(sum(col("n_tokens")).over(local), lit(0L)))
      .join(broadcast(base), Seq("grp"))
      .select(col("id"), col("grp").as(groupCol), col("n_tokens"),
        (col("base") + col("local_off")).as("global_offset"))
  }

  /** DuckDB replay of [[tokenOffsets]]. */
  def tokenOffsetsOracleSql(table: String, idCol: String, textCol: String,
      groupCol: String): String =
    s"""WITH d AS (SELECT $idCol AS id, $groupCol AS grp,
       |  CAST(coalesce(len(regexp_extract_all($textCol, '\\S+')), 0) AS BIGINT)
       |    AS n_tokens
       | FROM $table),
       |b AS (SELECT grp, sum(n_tokens) AS total FROM d GROUP BY grp),
       |bo AS (SELECT grp, CAST(coalesce(sum(total) OVER (ORDER BY grp
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS base FROM b),
       |l AS (SELECT id, grp, n_tokens, CAST(coalesce(sum(n_tokens) OVER (
       |    PARTITION BY grp ORDER BY id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS local_off FROM d)
       |SELECT l.id, l.grp AS $groupCol, l.n_tokens,
       |  bo.base + l.local_off AS global_offset
       |FROM l JOIN bo USING (grp)""".stripMargin
}
