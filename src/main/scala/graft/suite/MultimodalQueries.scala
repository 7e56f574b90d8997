package graft.suite

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}
import graft.multimodal.Multimodal

/** Multimodal-column operators as ORACLE-verifiable queries.
  *
  * The driver testdata carries no binary media, so the fixture DERIVES a
  * media table from `documents` with pure integer arithmetic — media_id =
  * doc_id, kind cycles image/audio/video, and `content` byte j is
  * `(doc_id·31 + j·7) mod 256` over `len = 16 + doc_id mod 240` bytes,
  * materialized as a genuine `BinaryType` column (hex-string → `unhex`).
  * Both engines can construct the SAME bytes from the same formula, so the
  * oracle never touches blob functions: it reasons about byte VALUES.
  *
  * The decode that runs here is the deterministic STUB path for every row
  * (arithmetic bytes are not valid PNG/WAV containers — magic-byte sniffing
  * rejects them and [[Multimodal.decodeAny]] degrades exactly as it would on
  * corrupt crawl rows; the REAL JDK decode paths are pinned by
  * MultimodalSpec's golden PNG/WAV fixtures). The stub is mirrorable because
  * its LCG offset generators are content-independent constants
  * ([[Multimodal.stubOffsetGens]]): pixel i reads byte `gens(i) mod len`,
  * so the whole decode→feature chain is integer arithmetic + one float32
  * division, replayed in the oracle with the generator constants embedded
  * as literals and every float fold left-to-right (the DSIR trick).
  *
  * Scale shape (all three queries): narrow map over the binary column, zero
  * shuffle — bytes never leave their partition; features/offsets are the
  * only output. This is the 100 TB contract of the multimodal layer:
  * decode cost is per-row CPU, metadata-only queries prune the bytes.
  */
object MultimodalQueries {

  /** Derived media table — see object doc. Content is a real BinaryType
    * column so the decode operators exercise the same byte plumbing a
    * parquet-backed media lake would.
    */
  def media(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(col("doc_id")).select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      unhex(array_join(
        transform(sequence(lit(0L), lit(15L) + pmod(col("doc_id"), lit(240L))),
          j => lpad(hex(pmod(col("doc_id") * 31 + j * 7, lit(256))), 2, "0")),
        "")).as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, 16000).cast("int")
          .as("sample_rate"),
        when(pmod(col("doc_id"), lit(3)) === 2,
          (lit(16L) + pmod(col("doc_id"), lit(240L))) * 40L).cast("long")
          .as("duration_ms")).as("meta"))

  /** Shared oracle CTE: media_id, kind, len (the byte-count of content). */
  private val mediaCte =
    """m AS (SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS kind,
        16 + doc_id % 240 AS len
      FROM documents)"""

  /** The 64 stub offset generators as a SQL list literal (31-bit values). */
  private val gens64 =
    Multimodal.stubOffsetGens(64).mkString("[", ", ", "]")

  /** Stub-decoded pixel list in float32, as a DuckDB expression over (m):
    * px_i = CAST((media_id·31 + (gen_i mod len)·7) mod 256 AS FLOAT) / 255f
    * — identical to content[gen_i mod len] & 0xff over the derived bytes.
    */
  private val pxList =
    s"""list_transform($gens64, k ->
        CAST((media_id * 31 + (k % len) * 7) % 256 AS FLOAT)
          / CAST(255 AS FLOAT))"""

  /** q79 — image/video feature extraction (partition-batched decode →
    * mean/variance intensity). 8×8 stub grid: no resize (the bilinear
    * kernel is golden-pinned in MultimodalSpec); mean is a left fold of
    * float32 pixels widened to double, variance a second fold against the
    * mean — both replayed verbatim by the oracle.
    */
  private val q79 = GQuery(
    (s, d) => Multimodal.extractFeatures(media(s, d), 8, 8).toDF()
      .select(col("media_id"), col("kind"),
        col("n_pixels").cast("long").as("n_pixels"),
        col("mean_intensity"), col("intensity_var"))
      .orderBy("media_id"),
    Some(s"""WITH $mediaCte,
      px AS (SELECT media_id, kind, $pxList AS px FROM m),
      mn AS (SELECT media_id, kind, px,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(px, v -> CAST(v AS DOUBLE))),
          (a, v) -> a + v) / 64.0 AS mean
        FROM px)
      SELECT media_id, kind, CAST(64 AS BIGINT) AS n_pixels,
        mean AS mean_intensity,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(px, v ->
            (CAST(v AS DOUBLE) - mean) * (CAST(v AS DOUBLE) - mean))),
          (a, v) -> a + v) / 64.0 AS intensity_var
      FROM mn ORDER BY media_id"""))

  /** q80 — audio curation features (RMS / peak / zero-crossing rate /
    * duration) over the stub samples `s_i = px_i·2f − 1f` (float32,
    * single-rounded — the oracle's double-computed `px·2−1` cast back to
    * float is exact before the cast, so both round once to the same f32).
    */
  private val q80 = GQuery(
    (s, d) => Multimodal.extractAudioFeatures(media(s, d),
        stubRate = 16000, stubSamples = 64).toDF()
      .select(col("media_id"), col("kind"), col("decoded"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples").cast("long").as("n_samples"),
        col("duration_ms"), col("rms"), col("peak"),
        col("zero_cross_rate"))
      .orderBy("media_id"),
    Some(s"""WITH $mediaCte,
      sl AS (SELECT media_id, kind,
        list_transform($pxList, v ->
          CAST(CAST(v AS DOUBLE) * 2 - 1 AS FLOAT)) AS sl
        FROM m),
      ag AS (SELECT media_id, kind,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(sl, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
          (a, v) -> a + v) AS ss,
        list_max(list_transform(sl, v -> abs(CAST(v AS DOUBLE)))) AS peak,
        CAST(list_sum(list_transform(range(2, 65), i ->
          CASE WHEN (sl[i - 1] >= 0) != (sl[i] >= 0) THEN 1 ELSE 0 END))
          AS BIGINT) AS crossings
        FROM sl)
      SELECT media_id, kind, FALSE AS decoded,
        CAST(16000 AS BIGINT) AS sample_rate, CAST(64 AS BIGINT) AS n_samples,
        CAST(4 AS BIGINT) AS duration_ms,
        sqrt(ss / 64.0) AS rms, peak,
        crossings / 63.0 AS zero_cross_rate
      FROM ag ORDER BY media_id"""))

  /** q81 — deterministic video frame sampling: n evenly-spaced frame
    * timestamps from metadata alone (NO decode, bytes unread — the
    * metadata-only pruning contract), exploded to one row per frame;
    * non-video rows survive with null frames (posexplode_outer).
    */
  private val q81 = GQuery(
    (s, d) => Multimodal.sampleFrameOffsets(media(s, d), 5)
      .select(col("media_id"), col("kind"),
        posexplode_outer(col("frame_offsets_ms")).as(Seq("frame_idx", "offset_ms")))
      .select(col("media_id"), col("kind"),
        col("frame_idx").cast("long").as("frame_idx"), col("offset_ms"))
      .orderBy("media_id", "frame_idx"),
    Some(s"""WITH $mediaCte,
      v AS (SELECT media_id, kind, CAST(t.i AS BIGINT) AS frame_idx,
          CAST(FLOOR((len * 40 * t.i)::DOUBLE / 5) AS BIGINT) AS offset_ms
        FROM m CROSS JOIN range(0, 5) t(i) WHERE kind = 'video'),
      nv AS (SELECT media_id, kind, CAST(NULL AS BIGINT) AS frame_idx,
          CAST(NULL AS BIGINT) AS offset_ms
        FROM m WHERE kind <> 'video')
      SELECT * FROM v UNION ALL SELECT * FROM nv
      ORDER BY media_id, frame_idx"""))

  def all: Map[String, GQuery] = Map(
    "q79_media_features" -> q79,
    "q80_audio_features" -> q80,
    "q81_frame_sampling" -> q81,
  )
}
