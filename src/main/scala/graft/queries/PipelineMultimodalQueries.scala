package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** image/audio/video modality queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineMultimodalQueries {
  val queries: Map[String, Q] = Map(

    // Keyframe selection: first frame of every scene (q258's cut
    // criterion) as (idx, offset, len) coordinates — the video
    // retention artifact; byte ranges, never re-shuffled frame bytes.
    "q282_keyframes" -> ((s, d) =>
      MultimodalOps.keyframes(s,
        MultimodalOps.withBinaryPayload(
          Tables(s, d, "documents"), "doc_id", "text"), 8)),

    // Scene-change segmentation over sampled frames: per-payload cut
    // count + distinct-frame bound — the video shot-detection shape
    // on top of the q49 frame plumbing.
    "q258_scene_segments" -> ((s, d) =>
      MultimodalOps.sceneSegments(s,
        MultimodalOps.withBinaryPayload(
          Tables(s, d, "documents"), "doc_id", "text"), 8)),

    // Cross-MODALITY dedup report: exact-dup bucket keys from all
    // three verified paths (normalized-text md5, image dHash, audio
    // energy fingerprint) in one summary — groups with >1 member and
    // docs involved, per modality. Each path is its own bucket-keyed
    // aggregation; nothing joins across modalities.
    "q218_multimodal_dedup" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      def report(name: String, keyed: DataFrame) =
        keyed.groupBy("k").agg(count(lit(1)).as("n"))
          .agg(lit(name).as("modality"),
            count(when(col("n") > 1, 1)).as("n_dup_groups"),
            coalesce(sum(when(col("n") > 1, col("n"))), lit(0L))
              .as("n_docs_in_dups"))
      val text = docs.select(TextOps.fingerprint(col("text")).as("k"))
      val img = MultimodalOps.imageDHash(s,
        MultimodalOps.withImagePayloadKeyed(s, docs, "doc_id",
          col("doc_id") % 97))
        .select(col("dhash").cast("string").as("k"))
      val aud = MultimodalOps.audioFingerprint(s,
        MultimodalOps.withAudioPayloadKeyed(s, docs, "doc_id",
          col("doc_id") % 61))
        .select(col("afp").cast("string").as("k"))
      report("text", text)
        .unionByName(report("image", img))
        .unionByName(report("audio", aud))
    }),

    // Perceptual audio fingerprint dedup over REAL WAV decode:
    // energy-derivative sign hash (dHash on audio), payloads keyed
    // doc_id % 61 so exact dup groups exist.
    "q214_audio_fingerprint" -> ((s, d) => {
      val pay = MultimodalOps.withAudioPayloadKeyed(s,
        Tables(s, d, "documents"), "doc_id", col("doc_id") % 61)
      MultimodalOps.audioFingerprint(s, pay)
        .groupBy("afp")
        .agg(count(lit(1)).as("n_audio"), min("doc_id").as("min_doc_id"))
    }),

    // Fixed-bin spectral power over the REAL WAV decode: frozen
    // integer cos/sin basis (round(·128)) so the DFT is long-exact
    // and the oracle replays it bit-for-bit — audio dedup's timbre
    // signal beyond q214's energy-derivative hash.
    "q241_audio_spectral" -> ((s, d) => {
      val pay = MultimodalOps.withAudioPayloadKeyed(s,
        Tables(s, d, "documents"), "doc_id", col("doc_id") % 61)
      MultimodalOps.audioSpectral(s, pay)
    }),

    // Luminance histogram + entropy over REAL PNG decode (verified
    // decoder: the oracle replays the formula pixels exactly).
    "q213_image_histogram" -> ((s, d) =>
      MultimodalOps.imageHistogram(s,
        MultimodalOps.withImagePayload(s, Tables(s, d, "documents"),
          "doc_id"))),

    // Boilerplate passage miner: top repeated fingerprints per source
    // with an example doc — feeds the strip-before-fingerprint
    // blocklist (%29 injection plants a known boilerplate line).
    // Perceptual image dedup: dHash (horizontal-gradient bits on the
    // exact 8x8 milli-luminance grid) over REAL PNG decode; payloads
    // keyed doc_id % 97 so distinct docs share identical images —
    // exact dup groups by hash equality, the 100 TB bucket-join path.
    "q177_image_dhash" -> ((s, d) => {
      val pay = MultimodalOps.withImagePayloadKeyed(s,
        Tables(s, d, "documents"), "doc_id", col("doc_id") % 97)
      MultimodalOps.imageDHash(s, pay)
        .groupBy("dhash")
        .agg(count(lit(1)).as("n_images"),
          min("doc_id").as("min_doc_id"))
    }),

    // Image NEAR-dup pairs: banded dHash candidates + exact Hamming
    // verify (pigeonhole-exact <= 3). Histogram output (hamming ->
    // pair count + min pair) stays bounded at any corpus size.
    "q178_image_neardup" -> ((s, d) => {
      val pay = MultimodalOps.withImagePayloadKeyed(s,
        Tables(s, d, "documents"), "doc_id", col("doc_id") % 97)
      // group-collapsed stats: the quadratic step runs over DISTINCT
      // hashes, never corpus pairs (spec-pinned equal to aggregating
      // imageNearDupPairs)
      MultimodalOps.imageNearDupStats(s, pay)
    }),

    // Multimodal plumbing: binary payload + per-partition decode (stub
    // codec, real schema/batch shape — deterministic so oracle-checkable).
    "q35_multimodal_meta" -> ((s, d) =>
      MultimodalOps.decodeMeta(s,
        MultimodalOps.withBinaryPayload(Tables(s, d, "documents"), "doc_id", "text"))),

    // REAL image decode: per-doc PNG payloads (ImageIO-encoded
    // formula pixels) read back through the real codec; exact channel
    // sums + mean luminance. PNG is lossless, so the oracle replays
    // the pixel formula — a codec/stride/channel bug breaks the hash.
    "q97_image_decode" -> ((s, d) =>
      MultimodalOps.imageStats(s,
        MultimodalOps.withImagePayload(s, Tables(s, d, "documents"), "doc_id"))),

    // REAL image resize: decode + box-average onto an 8x8 luminance
    // grid, cells as scaled-integer millis (order-free exact math).
    "q98_image_resize" -> ((s, d) =>
      MultimodalOps.resizeGrid(s,
        MultimodalOps.withImagePayload(s, Tables(s, d, "documents"), "doc_id"))),

    // REAL JPEG decode under a tolerance band: smooth-formula pixels
    // through the real lossy codec; the oracle pins the portable
    // CONTRACT (decoded dims + every channel within 12 of the
    // formula) — decode failures, stride bugs, and channel swaps all
    // flip within_tol, codec-version jitter cannot (measured max
    // error 5 at quality 0.85; a channel swap errs >= 27 everywhere).
    "q103_jpeg_decode" -> ((s, d) =>
      MultimodalOps.jpegDecodeCheck(s,
        MultimodalOps.withJpegPayload(s, Tables(s, d, "documents"), "doc_id"))),

    // REAL audio decode: per-doc WAV payloads (AudioSystem-encoded
    // formula samples) parsed back through the real codec; exact
    // amplitude stats. PCM is lossless — the oracle replays the
    // sample formula, so the decoder is verified, not trusted.
    "q99_audio_decode" -> ((s, d) =>
      MultimodalOps.audioStats(s,
        MultimodalOps.withAudioPayload(s, Tables(s, d, "documents"), "doc_id"))),

    // Audio FEATURES: integer-exact nearest-neighbor resample to 3 kHz
    // + 100 ms duration buckets over the real-decoded WAV samples —
    // the oracle replays the index map over the sample formula.
    "q104_audio_features" -> ((s, d) =>
      MultimodalOps.audioFeatures(s,
        MultimodalOps.withAudioPayload(s, Tables(s, d, "documents"), "doc_id"))),

    // Video container metadata via the real GVI1 header walk (codec
    // stubbed by design — the container libs aren't present; the
    // byte-walk, validation and stride math are real and the luma
    // formula is SQL-replayable, the WAV discipline applied to
    // video).
    "q360_video_meta" -> ((s, d) =>
      MultimodalOps.videoMeta(s,
        MultimodalOps.withVideoPayload(s, Tables(s, d, "documents"),
          "doc_id"))),

    // Every-4th-frame sampling with mean-luma features and scene-cut
    // flags — the brief's video frame-sample operator.
    "q361_video_frames" -> ((s, d) =>
      MultimodalOps.videoFrameSample(s,
        MultimodalOps.withVideoPayload(s, Tables(s, d, "documents"),
          "doc_id"), every = 4, cutMilli = 2000L)),

    // Temporal near-dup signature (luma-derivative sign bits) over
    // KEYED payloads — real duplicate groups, bucket-key dedup.
    "q362_video_neardup" -> ((s, d) =>
      MultimodalOps.videoTemporalHash(s,
        MultimodalOps.withVideoPayloadKeyed(s, Tables(s, d, "documents"),
          "doc_id", col("doc_id") % 17))
        .groupBy("vfp", "n_frames")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))),

    // Frame sampling plumbing: evenly-spaced byte windows per payload.
    "q49_frame_sample" -> ((s, d) =>
      MultimodalOps.sampleFrames(s,
          MultimodalOps.withBinaryPayload(Tables(s, d, "documents"), "doc_id", "text"), 4)
        .select(col("doc_id"), col("frame_idx"), col("offset"),
          length(col("frame")).cast("int").as("frame_len"))),

    // Resize-feature plumbing (fixed-width byte-bucket vector) — no
    // oracle (blob byte indexing is not portable SQL); rows-only +
    // determinism spec in ScalaTest.
    "q50_resize_feature" -> ((s, d) =>
      MultimodalOps.resizeFeature(s,
          MultimodalOps.withBinaryPayload(Tables(s, d, "documents"), "doc_id", "text"), 8)
        .select(col("doc_id"), round(aggregate(col("feature"), lit(0.0d), _ + _), 4).as("feat_sum"))),
  )

  val oracles: Map[String, String] = Map(

    "q360_video_meta" ->
      """SELECT doc_id,
        |  CAST(8 + (doc_id % 3) * 4 AS INT) AS width,
        |  CAST(8 AS INT) AS height, CAST(10 AS INT) AS fps,
        |  CAST(24 + (doc_id % 4) * 8 AS INT) AS n_frames,
        |  CAST(16 + (8 + (doc_id % 3) * 4) * 8
        |    * (24 + (doc_id % 4) * 8) AS BIGINT) AS n_bytes,
        |  CAST((24 + (doc_id % 4) * 8) * 100 AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,
    "q361_video_frames" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id % 3) * 4 AS w, 8 AS h,
        |    10 AS fps, 24 + (doc_id % 4) * 8 AS nf FROM documents),
        |fr AS (SELECT doc_id, w, h, fps, nf,
        |    unnest(range(0, nf, 4)) AS f FROM d),
        |lum AS (SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |    CAST(f * 1000 // fps AS BIGINT) AS t_ms,
        |    CAST(list_sum(list_transform(range(0, w * h),
        |      p -> (p * 31 + f * 57 + doc_id * 13) % 251)) * 1000
        |      // (w * h) AS BIGINT) AS luma_milli
        |  FROM fr),
        |c AS (SELECT doc_id, frame_idx, t_ms, luma_milli,
        |    lag(luma_milli) OVER (PARTITION BY doc_id
        |      ORDER BY frame_idx) AS pl
        |  FROM lum)
        |SELECT doc_id, frame_idx, t_ms, luma_milli,
        |  CASE WHEN pl IS NOT NULL AND abs(luma_milli - pl) > 2000
        |    THEN 1 ELSE 0 END AS is_cut
        |FROM c""".stripMargin,
    "q362_video_neardup" ->
      """WITH ks AS (SELECT doc_id, doc_id % 17 AS k FROM documents),
        |dm AS (SELECT DISTINCT k FROM ks),
        |ef AS (SELECT k, 8 + (k % 3) * 4 AS w,
        |    24 + (k % 4) * 8 AS nf, unnest(range(0,
        |    24 + (k % 4) * 8)) AS f FROM dm),
        |lum AS (SELECT k, nf, f,
        |    CAST(list_sum(list_transform(range(0, w * 8),
        |      p -> (p * 31 + f * 57 + k * 13) % 251)) AS BIGINT) AS e
        |  FROM ef),
        |nx AS (SELECT k, nf, f, e, lead(e) OVER (PARTITION BY k
        |    ORDER BY f) AS nxt FROM lum),
        |fp AS (SELECT k, CAST(max(nf) AS INT) AS n_frames,
        |    CAST(coalesce(sum(CASE WHEN nxt > e
        |      THEN (CAST(1 AS BIGINT) << CAST(f AS INT))
        |      ELSE 0 END), 0) AS BIGINT) AS vfp
        |  FROM nx WHERE nxt IS NOT NULL GROUP BY k)
        |SELECT vfp, n_frames, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM ks JOIN fp USING (k)
        |GROUP BY vfp, n_frames""".stripMargin,

    "q282_keyframes" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, i,
        |    CAST((i * greatest(n - 32, 0)) // 7 AS INTEGER) AS off,
        |    substring(h,
        |      CAST(((i * greatest(n - 32, 0)) // 7) * 2 + 1 AS BIGINT),
        |      64) AS frame
        |  FROM b, (SELECT unnest(generate_series(0, 7)) AS i)),
        |l AS (SELECT doc_id, i, off, frame,
        |    lag(frame) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM f)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, off AS "offset",
        |  CAST(length(frame) // 2 AS INTEGER) AS frame_len
        |FROM l WHERE prev IS NULL OR frame IS DISTINCT FROM prev""".stripMargin,

    "q258_scene_segments" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n FROM documents),
        |f AS (SELECT doc_id, i, substring(h,
        |    CAST(((i * greatest(n - 32, 0)) // 7) * 2 + 1 AS BIGINT),
        |    64) AS frame
        |  FROM b, (SELECT unnest(generate_series(0, 7)) AS i)),
        |l AS (SELECT doc_id, frame,
        |    lag(frame) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        |  FROM f),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
        |    CAST(sum(CASE WHEN prev IS NOT NULL
        |      AND frame IS DISTINCT FROM prev THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_cuts,
        |    count(DISTINCT frame) AS n_distinct_frames
        |  FROM l GROUP BY doc_id)
        |SELECT doc_id, n_frames, n_cuts,
        |  CAST(n_cuts + 1 AS BIGINT) AS n_scenes, n_distinct_frames
        |FROM a""".stripMargin,
    "q218_multimodal_dedup" ->
      """WITH tf AS (SELECT
        |    md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g'))
        |    AS k FROM documents),
        |tg AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM tf GROUP BY k),
        |d AS (SELECT doc_id, doc_id % 97 AS k FROM documents),
        |ik AS (SELECT DISTINCT k, (k % 3 + 1) * 8 AS w,
        |    ((k // 3) % 3 + 1) * 8 AS h FROM d),
        |ixs AS (SELECT k, w, h, unnest(range(0, w)) AS x FROM ik),
        |iys AS (SELECT k, w, h, x, unnest(range(0, h)) AS y FROM ixs),
        |ipx AS (SELECT k, w, h, x, y,
        |    (x * 7 + y * 13 + k * 31) % 256 AS r,
        |    (x * 3 + y * 5 + k * 17) % 256 AS g,
        |    (x * 11 + y * 2 + k * 23) % 256 AS b FROM iys),
        |icl AS (SELECT k, x // (w // 8) AS ci, y // (h // 8) AS cj,
        |    CAST(sum(r + g + b) AS BIGINT) * 1000
        |      // (3 * (w // 8) * (h // 8)) AS cell
        |  FROM ipx GROUP BY k, x // (w // 8), y // (h // 8), w, h),
        |ib AS (SELECT k, cj, ci, cell,
        |    lead(cell) OVER (PARTITION BY k, cj ORDER BY ci) AS nxt
        |  FROM icl),
        |ih AS (SELECT k, CAST(sum(CASE WHEN nxt > cell
        |    THEN CAST(1 AS BIGINT) << (cj * 7 + ci) ELSE 0 END) AS BIGINT)
        |    AS dhash FROM ib WHERE ci < 7 GROUP BY k),
        |ig AS (SELECT dhash, CAST(count(*) AS BIGINT) AS n
        |  FROM d JOIN ih USING (k) GROUP BY dhash),
        |ad AS (SELECT doc_id, doc_id % 61 AS k FROM documents),
        |ak AS (SELECT DISTINCT k, (k % 5 + 1) * 400 AS n FROM ad),
        |ai AS (SELECT k, n, unnest(range(0, n)) AS i FROM ak),
        |asg AS (SELECT k, (i * 32) // n AS f,
        |    abs((i * 37 + k * 101) % 65536 - 32768) AS a FROM ai),
        |afe AS (SELECT k, f, CAST(sum(a) AS BIGINT) AS e FROM asg
        |  GROUP BY k, f),
        |ale AS (SELECT k, f, e, lead(e) OVER (PARTITION BY k ORDER BY f)
        |    AS ne FROM afe),
        |afq AS (SELECT k, CAST(coalesce(sum(CASE WHEN ne > e
        |    THEN (CAST(1 AS BIGINT) << CAST(f AS INT)) ELSE 0 END), 0)
        |    AS BIGINT) AS fp FROM ale WHERE f < 31 GROUP BY k),
        |ag AS (SELECT fp, CAST(count(*) AS BIGINT) AS n
        |  FROM ad JOIN afq USING (k) GROUP BY fp)
        |SELECT 'text' AS modality,
        |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS n_dup_groups,
        |  CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
        |    AS n_docs_in_dups FROM tg
        |UNION ALL SELECT 'image',
        |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) FROM ig
        |UNION ALL SELECT 'audio',
        |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) FROM ag"""
        .stripMargin,
    "q214_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id, doc_id % 61 AS k FROM documents),
        |keys AS (SELECT DISTINCT k, (k % 5 + 1) * 400 AS n FROM d),
        |i0 AS (SELECT k, n, unnest(range(0, n)) AS i FROM keys),
        |sa AS (SELECT k, (i * 32) // n AS f,
        |    abs((i * 37 + k * 101) % 65536 - 32768) AS a FROM i0),
        |fe AS (SELECT k, f, CAST(sum(a) AS BIGINT) AS e FROM sa
        |  GROUP BY k, f),
        |le AS (SELECT k, f, e, lead(e) OVER (PARTITION BY k ORDER BY f)
        |    AS ne FROM fe),
        |fp AS (SELECT k, CAST(coalesce(sum(CASE WHEN ne > e
        |    THEN (CAST(1 AS BIGINT) << CAST(f AS INT)) ELSE 0 END), 0)
        |    AS BIGINT) AS afp
        |  FROM le WHERE f < 31 GROUP BY k)
        |SELECT afp, CAST(count(*) AS BIGINT) AS n_audio,
        |  min(doc_id) AS min_doc_id
        |FROM d JOIN fp USING (k) GROUP BY afp""".stripMargin,
    "q241_audio_spectral" -> MultimodalOps.audioSpectralOracleSql(61),
    "q213_image_histogram" ->
      s"""$imagePxCte,
         |hist AS (SELECT doc_id, ((r + g + b) // 3) // 32 AS bin,
         |    CAST(count(*) AS BIGINT) AS c, min(w * h) AS tot
         |  FROM px GROUP BY doc_id, ((r + g + b) // 3) // 32),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY c DESC, bin ASC) AS rn FROM hist),
         |e AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bins_used,
         |    round(-list_sum(list((c / CAST(tot AS DOUBLE))
         |      * ln(c / CAST(tot AS DOUBLE)) ORDER BY bin)), 6) AS entropy
         |  FROM hist GROUP BY doc_id)
         |SELECT e.doc_id, e.n_bins_used, CAST(rk.bin AS INTEGER) AS top_bin,
         |  rk.c AS top_n, e.entropy
         |FROM e JOIN rk ON e.doc_id = rk.doc_id AND rk.rn = 1""".stripMargin,
    "q178_image_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id % 97 AS k,
        |  ((doc_id % 97) % 3 + 1) * 8 AS w,
        |  (((doc_id % 97) // 3) % 3 + 1) * 8 AS h
        | FROM documents),
        |xs AS (SELECT doc_id, k, w, h, unnest(range(0, w)) AS x FROM d),
        |ys AS (SELECT doc_id, k, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |px AS (SELECT doc_id, w, h, x, y,
        |  (x * 7 + y * 13 + k * 31) % 256 AS r,
        |  (x * 3 + y * 5 + k * 17) % 256 AS g,
        |  (x * 11 + y * 2 + k * 23) % 256 AS b
        | FROM ys),
        |cells AS (SELECT doc_id, x // (w // 8) AS ci, y // (h // 8) AS cj,
        |    CAST(sum(r + g + b) AS BIGINT) * 1000
        |      // (3 * (w // 8) * (h // 8)) AS cell
        |  FROM px GROUP BY doc_id, x // (w // 8), y // (h // 8), w, h),
        |bits AS (SELECT doc_id, cj, ci, cell,
        |    lead(cell) OVER (PARTITION BY doc_id, cj ORDER BY ci) AS nxt
        |  FROM cells),
        |hsh AS MATERIALIZED (SELECT doc_id,
        |    CAST(sum(CASE WHEN nxt > cell
        |      THEN CAST(1 AS BIGINT) << (cj * 7 + ci) ELSE 0 END) AS BIGINT) AS dhash
        |  FROM bits WHERE ci < 7 GROUP BY doc_id),
        |banded AS MATERIALIZED (
        | SELECT doc_id, dhash, band, (dhash >> (band * 14)) & 16383 AS bits
        | FROM hsh, unnest([0, 1, 2, 3]) AS u(band)),
        |pairs AS (
        | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.dhash, b.dhash)) AS hamming
        | FROM banded a JOIN banded b
        |   ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
        |SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
        | CAST((min({'id_a': id_a, 'id_b': id_b})).id_a AS BIGINT) AS first_a,
        | CAST((min({'id_a': id_a, 'id_b': id_b})).id_b AS BIGINT) AS first_b
        |FROM pairs WHERE hamming <= 3 GROUP BY hamming""".stripMargin,
    "q177_image_dhash" ->
      """WITH d AS (SELECT doc_id, doc_id % 97 AS k,
        |  ((doc_id % 97) % 3 + 1) * 8 AS w,
        |  (((doc_id % 97) // 3) % 3 + 1) * 8 AS h
        | FROM documents),
        |xs AS (SELECT doc_id, k, w, h, unnest(range(0, w)) AS x FROM d),
        |ys AS (SELECT doc_id, k, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |px AS (SELECT doc_id, w, h, x, y,
        |  (x * 7 + y * 13 + k * 31) % 256 AS r,
        |  (x * 3 + y * 5 + k * 17) % 256 AS g,
        |  (x * 11 + y * 2 + k * 23) % 256 AS b
        | FROM ys),
        |cells AS (SELECT doc_id, x // (w // 8) AS ci, y // (h // 8) AS cj,
        |    CAST(sum(r + g + b) AS BIGINT) * 1000
        |      // (3 * (w // 8) * (h // 8)) AS cell
        |  FROM px GROUP BY doc_id, x // (w // 8), y // (h // 8), w, h),
        |bits AS (SELECT doc_id, cj, ci, cell,
        |    lead(cell) OVER (PARTITION BY doc_id, cj ORDER BY ci) AS nxt
        |  FROM cells),
        |hsh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN nxt > cell
        |      THEN CAST(1 AS BIGINT) << (cj * 7 + ci) ELSE 0 END) AS BIGINT) AS dhash
        |  FROM bits WHERE ci < 7 GROUP BY doc_id)
        |SELECT dhash, CAST(count(*) AS BIGINT) AS n_images,
        | CAST(min(doc_id) AS BIGINT) AS min_doc_id
        |FROM hsh GROUP BY dhash""".stripMargin,
    "q103_jpeg_decode" ->
      """SELECT doc_id,
        | CAST((doc_id % 3 + 1) * 8 AS INTEGER) AS width,
        | CAST(((doc_id // 3) % 3 + 1) * 8 AS INTEGER) AS height,
        | CAST(((doc_id % 3 + 1) * 8) * (((doc_id // 3) % 3 + 1) * 8)
        |   AS BIGINT) AS n_px,
        | true AS within_tol
        |FROM documents""".stripMargin,
    // audio ground truth = the sample formula (WAV/PCM is lossless)
    "q99_audio_decode" ->
      """WITH d AS (SELECT doc_id, (doc_id % 5 + 1) * 400 AS n FROM documents),
        |ss AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
        |sm AS (SELECT doc_id, n,
        |  (i * 37 + doc_id * 101) % 65536 - 32768 AS s FROM ss)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_samples,
        |  CAST(8000 AS INTEGER) AS sample_rate,
        |  CAST(min(s) AS INTEGER) AS min_s, CAST(max(s) AS INTEGER) AS max_s,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |  round(CAST(sum(abs(s)) AS DOUBLE) / n, 5) AS mean_abs
        |FROM sm GROUP BY doc_id, n""".stripMargin,
    "q104_audio_features" ->
      """WITH d AS (SELECT doc_id, (doc_id % 5 + 1) * 400 AS n FROM documents),
        |o AS (SELECT doc_id, n, n * 3000 // 8000 AS n_out FROM d),
        |ss AS (SELECT doc_id, n, n_out, unnest(range(0, n_out)) AS i FROM o),
        |sm AS (SELECT doc_id, n, n_out,
        |  ((i * 8000 // 3000) * 37 + doc_id * 101) % 65536 - 32768 AS s
        | FROM ss)
        |SELECT doc_id, CAST(8000 AS INTEGER) AS src_rate,
        |  CAST(n AS INTEGER) AS n_samples,
        |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  CAST((n * 1000 // 8000) // 100 AS BIGINT) AS duration_bucket,
        |  CAST(3000 AS INTEGER) AS target_rate,
        |  CAST(n_out AS INTEGER) AS n_out,
        |  CAST(min(s) AS INTEGER) AS min_out,
        |  CAST(max(s) AS INTEGER) AS max_out,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs_out
        |FROM sm GROUP BY doc_id, n, n_out""".stripMargin,

    // the pixel-formula CTE both image oracles share: dims + a full
    // (x, y) pixel grid per doc via two SEQUENTIAL unnests (same-
    // select unnests zip in DuckDB; staged ones cross)
    "q97_image_decode" ->
      s"""$imagePxCte
         |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |  CAST(sum(r) AS BIGINT) AS sum_r,
         |  CAST(sum(g) AS BIGINT) AS sum_g,
         |  CAST(sum(b) AS BIGINT) AS sum_b,
         |  round(CAST(sum(r) + sum(g) + sum(b) AS DOUBLE) / (3 * w * h), 5)
         |    AS mean_luma
         |FROM px GROUP BY doc_id, w, h""".stripMargin,
    "q98_image_resize" ->
      s"""$imagePxCte,
         |cells AS (SELECT doc_id, x // (w // 8) AS ci, y // (h // 8) AS cj,
         |    CAST(sum(r + g + b) AS BIGINT) * 1000
         |      // (3 * (w // 8) * (h // 8)) AS cell
         |  FROM px GROUP BY doc_id, x // (w // 8), y // (h // 8), w, h),
         |agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_cells,
         |    CAST(sum(cell) AS BIGINT) AS sum_cells,
         |    CAST(min(cell) AS BIGINT) AS min_cell,
         |    CAST(max(cell) AS BIGINT) AS max_cell
         |  FROM cells GROUP BY doc_id)
         |SELECT a.doc_id, a.n_cells,
         |  CAST(c.cell AS BIGINT) AS cell_00, a.sum_cells, a.min_cell, a.max_cell
         |FROM agg a JOIN cells c ON a.doc_id = c.doc_id
         |  AND c.ci = 0 AND c.cj = 0""".stripMargin,
    "q35_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        | CAST(octet_length(CAST(text AS BLOB)) % 64 + 1 AS INTEGER) AS width,
        | CAST((octet_length(CAST(text AS BLOB)) // 64) % 64 + 1 AS INTEGER) AS height
        |FROM documents""".stripMargin,
    // The oracle reads payload bytes as code points, valid because the
    // synthetic corpus is pure ASCII (byte == code point, verified);
    // the engine side works on arbitrary binary.
    "q50_resize_feature" ->
      """WITH b AS (SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n
        | FROM documents),
        |f AS (SELECT doc_id, text, n, greatest(n // 8, 1) AS bk FROM b)
        |SELECT doc_id, round(list_sum(list_transform(generate_series(0, 7), i ->
        |  list_avg(list_transform(
        |    generate_series(least(i * bk, n - 1) + 1,
        |                    least(least(i * bk, n - 1) + bk, n)),
        |    j -> unicode(text[j]))))), 4) AS feat_sum
        |FROM f""".stripMargin,
    "q49_frame_sample" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        | CAST((i * greatest(n - 32, 0)) // 3 AS INTEGER) AS "offset",
        | CAST(least((i * greatest(n - 32, 0)) // 3 + 32, n)
        |      - (i * greatest(n - 32, 0)) // 3 AS INTEGER) AS frame_len
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n FROM documents),
        |     (SELECT unnest(generate_series(0, 3)) AS i)""".stripMargin,
  )
}
