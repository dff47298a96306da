package graft.llm

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, plus batched decode / feature-extraction plumbing.
  *
  * The decode itself is a STUB (this container ships no image/audio codecs):
  * [[StubCodec.decode]] is a deterministic fake keyed on the byte payload.
  * Everything around it is real and tested — the (binary, metadata) schema,
  * the partition-wise batching (`mapPartitions`, the JVM analog of a
  * `mapInPandas` batch UDF: one codec instance per partition, rows streamed
  * through it), and the downstream feature columns.
  *
  * Scale notes (100 TB): media blobs dominate row size, so the decode stage
  * repartitions by byte budget, never by row count; the metadata query
  * projects (doc_id, n_bytes, format) only — column pruning keeps the scan
  * from reading blob bytes when only metadata is needed (verify via
  * ReadSchema in explain).
  */
object Multimodal {

  /** Build a media table from documents: payload = utf-8 bytes of the text
    * (a stand-in for real image/audio bytes), format cycled per doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      element_at(
        array(lit("png"), lit("jpeg"), lit("wav")),
        (col("doc_id") % 3).cast("int") + 1).as("format"))

  /** Deterministic fake codec — the seam where a real libjpeg/ffmpeg call
    * would go. One instance per partition (mirrors per-batch model state in
    * a Pandas UDF). */
  final class StubCodec {
    /** @return (width, height, channels) pseudo-decoded from the payload. */
    def decode(payload: Array[Byte], format: String): (Int, Int, Int) = {
      val n = payload.length
      val channels = format match {
        case "png" => 4
        case "jpeg" => 3
        case _ => 1
      }
      (n % 640 + 16, (n * 7) % 480 + 16, channels)
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** Partition-wise batched decode: one codec per partition, rows streamed.
    * This is the real plumbing a GPU/codec stage needs — swap StubCodec for
    * the real thing and nothing else changes. */
  def decodeBatch(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    val out: Dataset[Row] = media
      .select(col("doc_id"), col("payload"), col("format"))
      .mapPartitions { rows =>
        val codec = new StubCodec // per-partition init, like per-batch model load
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val fmt = r.getAs[String]("format")
          val (w, h, c) = codec.decode(payload, fmt)
          Row(r.getAs[Long]("doc_id"), fmt, payload.length, w, h, c)
        }
      }(enc)
    out
  }

  // ------------------------------------------------------------- registry

  // The oracle-able query computes the same metadata *declaratively* (so
  // DuckDB can reproduce it); decodeBatch is the imperative twin, asserted
  // equal in MultimodalSpec.
  /** Decoded-metadata projection shared by the feature queries. */
  private def decodedMeta(m: DataFrame): DataFrame =
    m.select(
      col("doc_id"), col("format"),
      octet_length(col("payload")).as("n_bytes"),
      (octet_length(col("payload")) % 640 + 16).as("width"),
      ((octet_length(col("payload")) * 7) % 480 + 16).as("height"),
      expr("CASE format WHEN 'png' THEN 4 WHEN 'jpeg' THEN 3 ELSE 1 END").as("channels"))

  /** Audio framing: the signal (here payload bytes == utf-8 codes of the
    * ASCII fixture text, the same stand-in [[mediaTable]] uses; s = code −
    * 96 centers the lowercase band) framed into non-overlapping
    * `frameSize`-sample windows with per-frame integer energy Σs². The
    * real pipeline swaps the sample source for PCM decode at the StubCodec
    * seam; the framing, the ragged last frame, and the per-frame
    * aggregation — the part a feature extractor actually consumes — are
    * real and oracle-checked. One narrow shuffle on (doc, frame),
    * partial-aggregated map-side. */
  def audioFrames(docs: DataFrame, frameSize: Int): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .filter(col("ch") =!= "") // Java split keeps a trailing empty token
      .select(col("doc_id"), expr(s"pos div $frameSize").as("frame"),
        (ascii(col("ch")) - 96).as("s"))
      .groupBy("doc_id", "frame")
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("CAST(s AS BIGINT) * s")).as("energy"))

  /** Average-hash (aHash) perceptual fingerprint bands: the image near-dup
    * primitive. The canonical recipe — downscale to an 8×8 grid, threshold
    * each cell against the global mean, read the 64 bits — computed here
    * over the payload's sample stream (ascii codes, the same stand-in the
    * audio framing uses; real pixel luma slots in at the StubCodec seam
    * without touching the plan): cell c of a length-n payload aggregates
    * positions with `(pos·64) div n == c` (every cell non-empty for
    * n ≥ 64; shorter payloads are excluded — an 8×8 grid of a sub-64-px
    * source is undefined), bit c = cell sum · 64 > total (exact integer
    * compare, no FP mean). The 64 bits ship as FOUR 16-bit band values —
    * the [[graft.llm.Dedup.simhashPairsOf]] banding shape — so candidate
    * mining is an equi-join on (band, bval), never all-pairs, and no
    * signed-overflow bit ever exists (a single packed i64 would put cell
    * 63 in the sign bit and break `div`-based band extraction).
    *
    * Scale shape: per-doc work is linear in payload size and collapses
    * map-side (cells, then bands, both partial-aggregated); the pair join
    * touches band collisions only; the Hamming verify is codegen'd
    * xor+bit_count over 4 small ints per pair. Pigeonhole: 4 equal-band
    * blocking has full recall for Hamming ≤ 3 — same bound, same refusal,
    * as the simhash family. */
  def phashBands(docs: DataFrame): DataFrame = {
    val px = docs.filter(length(col("text")) >= 64)
      .select(col("doc_id"), length(col("text")).as("n"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .filter(col("ch") =!= "") // Java split keeps a trailing empty token
      // pos is Int: the multiply must go long FIRST or a >= 2^25-char
      // payload overflows (ANSI error / wrapped negative cells) while the
      // oracle's BIGINT arithmetic sails on (review-caught)
      .select(col("doc_id"), expr("(CAST(pos AS BIGINT) * 64) div n").as("cell"),
        ascii(col("ch")).cast("long").as("v"))
    val cells = px.groupBy("doc_id", "cell").agg(sum(col("v")).as("cv"))
    val tot = cells.groupBy("doc_id").agg(sum(col("cv")).as("t"))
    cells.join(tot, "doc_id")
      .select(col("doc_id"), col("cell"),
        when(col("cv") * 64 > col("t"), 1L).otherwise(0L).as("bit"))
      .groupBy(col("doc_id"), expr("cell div 16").as("band"))
      .agg(sum(expr("shiftleft(bit, CAST(cell % 16 AS INT))")).as("bval"))
  }

  /** Image near-dup pairs by aHash Hamming distance ≤ `maxHamming`:
    * banded candidates ([[phashBands]]) verified by the exact 64-bit
    * Hamming distance (Σ over bands of bit_count(xor)). */
  def phashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"phashPairs: 4-band blocking guarantees recall only for maxHamming <= 3, got $maxHamming")
    val bands = phashBands(docs).localCheckpoint(eager = true)
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("bval").as("ba"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band"), col("bval").as("bb"))
    val cand = a.join(b, Seq("band"))
      .filter(col("ba") === col("bb") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b", "band"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(expr("bit_count(ba ^ bb)")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> ((s, dir) =>
      Util.orderAll(decodedMeta(mediaTable(Tables.documents(s, dir))))),

    // the 'wav' cycle slot of mediaTable; see [[audioFrames]]
    "mm_audio_frames" -> ((s, dir) =>
      Util.orderAll(audioFrames(
        Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(3)) === 2), 32))),

    // frame sampling: pseudo-duration from the payload, ≤5 evenly spaced
    // byte offsets per clip — integer arithmetic only, so the real
    // frame-grab (ffmpeg seek at each offset) can slot into the same plan
    "mm_frame_sample" -> ((s, dir) => {
      val m = decodedMeta(mediaTable(Tables.documents(s, dir)))
      // frame_offsets is emitted as a canonical comma-joined string — the
      // driver's hash compare can't sort/hash an array<bigint> column
      Util.orderAll(m
        .withColumn("duration_s", col("n_bytes") % 30 + 1)
        .withColumn("n_frames", least(col("duration_s"), lit(5)))
        .withColumn("frame_offsets", expr(
          "array_join(transform(sequence(0, n_frames - 1), i -> CAST(i * (n_bytes div n_frames) AS STRING)), ',')"))
        .select(col("doc_id"), col("n_bytes"), col("duration_s"),
          col("n_frames"), col("frame_offsets")))
    }),

    // end-to-end multimodal → feature-embedding → ANN: a deterministic
    // arithmetic stub stands in for the image/audio encoder (same seam as
    // StubCodec — swap in the real model, the plan is unchanged), then
    // exact cosine top-5 of 3 query docs against the corpus through the
    // codegen'd DotProduct kernel. The capability story: media columns
    // flow into the same vector operators as the embeddings table.
    "mm_embed_topk" -> ((s, dir) => {
      val m = decodedMeta(mediaTable(Tables.documents(s, dir)))
      val emb = m.withColumn("v", expr(
        "transform(sequence(0, 7), j -> CAST((n_bytes * (j+1) * 2654435761 + width * 7919 * j + height * 40503 + channels * 97 + j) % 1000 AS DOUBLE) / 500.0 - 1.0)"))
        .withColumn("nrm", graft.functions.VectorFunctions.vecNorm(col("v")))
      val q = emb.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
      val c = emb.filter(col("doc_id") >= 3)
        .select(col("doc_id").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nb"))
      // the one ranking contract, shared with ann_* (Similarity.cosineTopK)
      Util.orderAll(Similarity.cosineTopK(q, c, 5))
    }),

    // ViT-style patch grid: resize geometry → 16×16 patch coordinates,
    // long-form (doc_id, patch_id, x0, y0) — the exact fan-out shape a
    // vision-encoder stage consumes (pixel crops slot in at the seam).
    // In-row sequence+explode: no shuffle, patches never leave their doc's
    // partition. Sampled to every 10th doc to keep the oracle dump lean.
    "mm_patch_grid" -> ((s, dir) => {
      val m = decodedMeta(mediaTable(Tables.documents(s, dir)))
        .filter(col("doc_id") % 10 === 0)
        .withColumn("out_w", lit(224))
        .withColumn("out_h", expr("(height * 224) div width"))
        .withColumn("npx", expr("out_w div 16"))
        .withColumn("npy", expr("out_h div 16"))
        .filter(col("npx") >= 1 && col("npy") >= 1)
      Util.orderAll(m
        .select(col("doc_id"), col("npx"), col("npy"),
          explode(expr("sequence(0, npx * npy - 1)")).as("patch_id"))
        .select(col("doc_id"), col("patch_id"),
          expr("(patch_id % npx) * 16").as("x0"),
          expr("(patch_id div npx) * 16").as("y0")))
    }),

    // image near-dup: aHash bands + Hamming verify (see phashPairs)
    "mm_phash_pairs" -> ((s, dir) =>
      Util.orderAll(phashPairs(Tables.documents(s, dir), 3))),

    // resize planning: scale to width 224 preserving aspect (integer
    // division both engines) — the geometry half of a real resize UDF
    "mm_resize" -> ((s, dir) => {
      val m = decodedMeta(mediaTable(Tables.documents(s, dir)))
      Util.orderAll(m
        .withColumn("out_w", lit(224))
        .withColumn("out_h", expr("(height * 224) div width"))
        .select(col("doc_id"), col("width"), col("height"),
          col("out_w"), col("out_h"), col("channels")))
    }),
  )

  private val metaCte =
    """WITH meta AS (
      |  SELECT doc_id,
      |    (['png', 'jpeg', 'wav'])[CAST(doc_id % 3 AS INT) + 1] AS format,
      |    octet_length(encode(text)) AS n_bytes,
      |    octet_length(encode(text)) % 640 + 16 AS width,
      |    (octet_length(encode(text)) * 7) % 480 + 16 AS height,
      |    CASE (['png', 'jpeg', 'wav'])[CAST(doc_id % 3 AS INT) + 1]
      |      WHEN 'png' THEN 4 WHEN 'jpeg' THEN 3 ELSE 1 END AS channels
      |  FROM documents
      |)
      |""".stripMargin

  def oracle: Map[String, String] = Map(
    // 1-based string indexing; DuckDB's char split has no trailing empty,
    // so the two engines see identical sample sequences on ASCII text
    "mm_audio_frames" -> Util.wrap(
      """SELECT doc_id, (i - 1) // 32 AS frame, count(*) AS n_samples,
        |  CAST(sum(CAST((ascii(text[i]) - 96) AS BIGINT) * (ascii(text[i]) - 96)) AS BIGINT) AS energy
        |FROM documents, LATERAL (SELECT unnest(range(1, len(text) + 1)) AS i) ii
        |WHERE doc_id % 3 = 2
        |GROUP BY doc_id, (i - 1) // 32""".stripMargin,
      Seq("doc_id", "frame", "n_samples", "energy")),

    // aHash: 1-based positions ((i-1) matches Spark's 0-based pos), exact
    // integer threshold (cv*64 > t), identical band packing via <<
    "mm_phash_pairs" -> Util.wrap(
      """WITH px AS (
        |  SELECT doc_id, ((i - 1) * 64) // len(text) AS cell, ascii(text[i]) AS v
        |  FROM documents, LATERAL (SELECT unnest(range(1, len(text) + 1)) AS i) ii
        |  WHERE len(text) >= 64
        |), cells AS (
        |  SELECT doc_id, cell, CAST(sum(v) AS BIGINT) AS cv FROM px GROUP BY 1, 2
        |), tot AS (
        |  SELECT doc_id, CAST(sum(cv) AS BIGINT) AS t FROM cells GROUP BY 1
        |), bands AS (
        |  SELECT cells.doc_id, cell // 16 AS band,
        |    CAST(sum((CASE WHEN cv * 64 > t THEN 1 ELSE 0 END) << (cell % 16)) AS BIGINT) AS bval
        |  FROM cells JOIN tot USING (doc_id) GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
        |)
        |SELECT doc_a, doc_b, hamming FROM (
        |  SELECT doc_a, doc_b,
        |    CAST(sum(bit_count(xor(fa.bval, fb.bval))) AS BIGINT) AS hamming
        |  FROM cand
        |  JOIN bands fa ON fa.doc_id = doc_a
        |  JOIN bands fb ON fb.doc_id = doc_b AND fb.band = fa.band
        |  GROUP BY doc_a, doc_b
        |) h WHERE hamming <= 3""".stripMargin,
      Seq("doc_a", "doc_b", "hamming")),

    "mm_decode_meta" -> (metaCte + Util.wrap(
      "SELECT doc_id, format, n_bytes, width, height, channels FROM meta",
      Seq("doc_id", "format", "n_bytes", "width", "height", "channels"))),

    "mm_frame_sample" -> (metaCte + Util.wrap(
      """SELECT doc_id, n_bytes,
        |  n_bytes % 30 + 1 AS duration_s,
        |  least(n_bytes % 30 + 1, 5) AS n_frames,
        |  array_to_string(list_transform(range(0, least(n_bytes % 30 + 1, 5)),
        |    i -> i * (n_bytes // least(n_bytes % 30 + 1, 5))), ',') AS frame_offsets
        |FROM meta""".stripMargin,
      Seq("doc_id", "n_bytes", "duration_s", "n_frames", "frame_offsets"))),

    "mm_embed_topk" -> (metaCte +
      """, emb AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 8), j ->
        |      CAST((n_bytes * (j+1) * 2654435761 + width * 7919 * j + height * 40503 + channels * 97 + j) % 1000 AS DOUBLE) / 500.0 - 1.0) AS v
        |  FROM meta
        |), n AS (
        |  SELECT doc_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM emb
        |)
        |""".stripMargin + Util.wrap(
        """SELECT query_id, neighbor_id, cosine, rk FROM (
          |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
          |    round(list_sum(list_transform(range(1, 9), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cosine,
          |    row_number() OVER (PARTITION BY q.doc_id
          |      ORDER BY round(list_sum(list_transform(range(1, 9), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) DESC,
          |               c.doc_id ASC) AS rk
          |  FROM n q JOIN n c ON q.doc_id < 3 AND c.doc_id >= 3
          |) t WHERE rk <= 5""".stripMargin,
        Seq("query_id", "neighbor_id", "cosine", "rk"))),

    "mm_patch_grid" -> (metaCte + Util.wrap(
      """SELECT doc_id, patch_id, (patch_id % npx) * 16 AS x0,
        |  (patch_id // npx) * 16 AS y0
        |FROM (
        |  SELECT doc_id, 224 // 16 AS npx, ((height * 224) // width) // 16 AS npy
        |  FROM meta WHERE doc_id % 10 = 0
        |) g, LATERAL (SELECT unnest(range(0, npx * npy)) AS patch_id) p
        |WHERE npx >= 1 AND npy >= 1""".stripMargin,
      Seq("doc_id", "patch_id", "x0", "y0"))),

    "mm_resize" -> (metaCte + Util.wrap(
      """SELECT doc_id, width, height, 224 AS out_w,
        |  (height * 224) // width AS out_h, channels
        |FROM meta""".stripMargin,
      Seq("doc_id", "width", "height", "out_w", "out_h", "channels"))),
  )
}
