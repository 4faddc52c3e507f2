package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, T}
import graft.Dsl._

/** Multimodal-column plumbing (north star mandate): media payloads live as
  * opaque `binary` columns with typed metadata beside them. No image/audio
  * codecs exist in this environment, so the DECODE STEP IS A DETERMINISTIC
  * STUB (clearly marked below) — the Spark-side plumbing (schema, typed
  * Dataset batch shape, partition-parallel extraction, binary slicing) is
  * real and tested.
  *
  * The synthetic payload is the document text's UTF-8 bytes (all-ASCII,
  * verified: octet_length == n_chars at every sf), standing in for an
  * image/audio blob.
  */
object MultimodalOps {

  /** One media row: id + opaque payload (the mapInPandas-style batch shape
    * is Dataset[MediaRow] → mapPartitions over iterator batches). */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features per media row. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double,
      head: Seq[Int])

  /** STUB DECODER — deterministic fake. A real build links an image/audio
    * codec here; everything downstream (schema, partitioning, batch shape)
    * is production-shaped. */
  def stubDecode(payload: Array[Byte]): MediaFeatures = {
    var s = 0L
    payload.foreach(b => s += (b & 0xFF))
    MediaFeatures(-1L, payload.length,
      if (payload.isEmpty) 0.0 else s.toDouble / payload.length,
      payload.take(8).map(_ & 0xFF).toSeq)
  }

  /** Partition-parallel feature extraction over the typed batch shape. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      stubDecode(row.payload).copy(doc_id = row.doc_id)
    })
  }

  def mediaOf(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    T(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  val defs: Seq[(String, Q)] = Seq(

    // Decode metadata: payload size, content hash, and stub-decoded
    // dimensions/format derived from the byte length (deterministic fake).
    "mm_decode_meta" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          big(length(col("payload"))).as("n_bytes"),
          sha2(col("payload"), 256).as("content_sha"),
          big(length(col("payload")) % 640 + 1).as("width"),
          big((length(col("payload")) * 7) % 480 + 1).as("height"),
          when(length(col("payload")) % 3 === 0, "jpeg")
            .when(length(col("payload")) % 3 === 1, "png")
            .otherwise("webp").as("format"))
        .orderBy(col("doc_id")),
      // ASCII corpus: octet_length(encode(text)) == n bytes of the blob, and DuckDB
      // sha256(VARCHAR) hashes the same UTF-8 bytes Spark's sha2(binary) does.
      "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, sha256(text) AS content_sha, " +
        "(octet_length(encode(text)) % 640 + 1)::BIGINT AS width, " +
        "(octet_length(encode(text)) * 7 % 480 + 1)::BIGINT AS height, " +
        "CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' " +
        "ELSE 'webp' END AS format " +
        "FROM documents ORDER BY doc_id"),

    // 2D tile grid (round-10) — the patching step every vision pipeline
    // runs before embedding (ViT patches, tiled OCR): given the stubbed
    // (width, height) from mm_decode_meta's deterministic dims, lay a
    // 224×224 tile grid over the image with edge-clamped partial tiles.
    // The decode is the documented stub; the TILING math — ceil-div grid
    // shape, per-tile offsets and clamped extents, row-major tile ids —
    // is the real Spark-side work, all integer, one explode per image
    // (bounded by the grid size, never corpus-quadratic).
    "mm_tile_grid" -> Q(
      (s, d) => {
        val dims = T(s, d, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(col("doc_id"),
            big(length(col("payload")) % 640 + 1).as("width"),
            big((length(col("payload")) * 7) % 480 + 1).as("height"))
        val t = lit(224L)
        dims
          .withColumn("tiles_x", expr("(width + 223) div 224"))
          .withColumn("tiles_y", expr("(height + 223) div 224"))
          .withColumn("tile_id",
            explode(sequence(lit(0L), col("tiles_x") * col("tiles_y") - 1)))
          .select(col("doc_id"), col("tile_id"),
            (pmod(col("tile_id"), col("tiles_x")) * t).as("off_x"),
            (expr("tile_id div tiles_x") * t).as("off_y"),
            least(t, col("width") - pmod(col("tile_id"), col("tiles_x")) * t)
              .as("tile_w"),
            least(t, col("height") - expr("tile_id div tiles_x") * t)
              .as("tile_h"))
          .orderBy(col("doc_id"), col("tile_id"))
      },
      "SELECT doc_id, tile_id, (tile_id % tiles_x) * 224 AS off_x, " +
        "(tile_id // tiles_x) * 224 AS off_y, " +
        "LEAST(224, width - (tile_id % tiles_x) * 224) AS tile_w, " +
        "LEAST(224, height - (tile_id // tiles_x) * 224) AS tile_h FROM (" +
        "SELECT doc_id, width, height, tiles_x, " +
        "unnest(generate_series(0, tiles_x * tiles_y - 1)) AS tile_id FROM (" +
        "SELECT doc_id, width, height, (width + 223) // 224 AS tiles_x, " +
        "(height + 223) // 224 AS tiles_y FROM (" +
        "SELECT doc_id, (octet_length(encode(text)) % 640 + 1)::BIGINT AS width, " +
        "(octet_length(encode(text)) * 7 % 480 + 1)::BIGINT AS height " +
        "FROM documents) d0) d1) g ORDER BY doc_id, tile_id"),

    // Frame sampling: slice 4 fixed-stride 16-byte "frames" out of each
    // payload (video keyframe shape) and hash each frame.
    "mm_frame_sample" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("stride", expr("length(payload) div 4"))
        .select(col("doc_id"), col("stride"),
          posexplode(expr(
            "transform(sequence(0, 3), i -> substring(payload, i * stride + 1, 16))"))
            .as(Seq("frame_idx", "frame")))
        .select(col("doc_id"), big(col("frame_idx")).as("frame_idx"),
          sha2(col("frame"), 256).as("frame_sha"))
        .orderBy(col("doc_id"), col("frame_idx")),
      "SELECT doc_id, k.k::BIGINT AS frame_idx, " +
        "sha256(substring(text, (k.k * (octet_length(encode(text)) // 4) + 1)::INT, 16)) AS frame_sha " +
        "FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k " +
        "ORDER BY doc_id, frame_idx"),

    // Feature extraction through the typed mapPartitions batch path. The
    // head bytes + mean are exact integer math (single division), so the
    // stub IS oracle-able — the plumbing gets a correctness gate too.
    "mm_feature_extract" -> Q(
      (s, d) => {
        import s.implicits._
        extractFeatures(mediaOf(s, d))
          .select(col("doc_id"), big(col("n_bytes")).as("n_bytes"),
            col("mean_byte"),
            concat_ws(",", transform(col("head"), c => c.cast("string"))).as("head_csv"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, " +
        "CAST(list_sum(list_transform(string_to_array(text, ''), c -> ord(c))) AS DOUBLE) " +
        "/ octet_length(encode(text)) AS mean_byte, " +
        "array_to_string(list_transform(string_to_array(text, '')[:8], c -> ord(c)), ',') AS head_csv " +
        "FROM documents ORDER BY doc_id"),

    // Resize STUB: nearest-neighbor downsample of the payload stream to 64
    // samples (stride = ceil-ish len/64) + the resize scale factor — the
    // 1-D analogue of an image thumbnail pass; a real build swaps the
    // sampler for a codec-backed scaler with the same schema.
    //
    // CHARACTER semantics on BOTH sides (Spark length/substring on string ≡
    // DuckDB length/substring on VARCHAR), so the key stays correct on
    // multibyte text — DuckDB 1.0 has no BLOB substring/md5, so byte
    // semantics cannot be oracled; both md5s hash the UTF-8 of the SAME
    // sampled character string, which is engine-independent.
    "mm_resize_stub" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("k", expr("greatest(1L, length(text) div 64)"))
        .select(col("doc_id"),
          big(length(col("text"))).as("n_chars"),
          big(col("k")).as("stride"),
          (length(col("text")).cast("double") / 64.0).as("scale"),
          md5(expr(
            "array_join(transform(sequence(0, 63), i -> substring(text, cast(i * k + 1 as int), 1)), '')"))
            .as("resized_md5"),
          big(expr(
            "length(array_join(transform(sequence(0, 63), i -> substring(text, cast(i * k + 1 as int), 1)), ''))"))
            .as("n_sampled"))
        .orderBy(col("doc_id")),
      "SELECT doc_id, length(text)::BIGINT AS n_chars, " +
        "greatest(1, length(text) // 64)::BIGINT AS stride, " +
        "CAST(length(text) AS DOUBLE) / 64.0 AS scale, " +
        "md5(array_to_string(list_transform(generate_series(0, 63), " +
        "i -> substring(text, (i * greatest(1, length(text) // 64) + 1)::INT, 1)), '')) " +
        "AS resized_md5, " +
        "length(array_to_string(list_transform(generate_series(0, 63), " +
        "i -> substring(text, (i * greatest(1, length(text) // 64) + 1)::INT, 1)), ''))::BIGINT " +
        "AS n_sampled " +
        "FROM documents ORDER BY doc_id"),

    // Perceptual-hash near-dup over the opaque payload (round-8 addendum):
    // a 32-bit DIFFERENCE hash (dHash) — bit i = (sample_i > sample_{i+1})
    // over 33 evenly-strided samples of the payload — then the SAME
    // banded-LSH candidate join + hamming filter discipline as
    // llm_simhash_hamming_join, but keyed on the MEDIA signature: 4 × 8-bit
    // bands, earlier-band-differs dedup across the 4 joins, bit_count(xor)
    // <= 3. A real build swaps the sampled-byte gradient for a decoded
    // 8×8-thumbnail gradient (true image dHash) with the same signature
    // width, bands, and joins. Scale shape: signatures are ONE projection
    // pass (no shuffle); only (doc_id, sig, bands) — ~24 bytes/row — enters
    // the self-join shuffles; each 8-bit band buckets the corpus ~256-ways
    // so candidate pairs stay ~n²/256 per band, and the hamming filter runs
    // post-join on two longs. Docs shorter than 33 samples are excluded on
    // BOTH sides (stride 0 would alias every sample to position 1 and
    // cluster all short docs into one all-zero-sig bucket).
    // CHARACTER semantics on both sides (the mm_resize_stub pin): ord-of-
    // sampled-char is engine-independent on this all-ASCII corpus.
    "mm_phash_near_dup" -> Q(
      (s, d) => {
        val sigExpr = (0 until 32).map(i =>
          when(expr(s"ascii(substring(text, $i * stride + 1, 1))") >
            expr(s"ascii(substring(text, ${i + 1} * stride + 1, 1))"),
            lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
        val sigs = T(s, d, "documents")
          .filter(length(col("text")) >= 33)
          .withColumn("stride", expr("length(text) div 33"))
          .select(col("doc_id"), sigExpr.as("phash"))
          .select(Seq(col("doc_id"), col("phash")) ++
            (0 until 4).map(j =>
              shiftrightunsigned(col("phash"), 8 * j)
                .bitwiseAND(lit(0xFFL)).as(s"band$j")): _*)
        val a = sigs.select(Seq(col("doc_id").as("doc_a"),
          col("phash").as("ph_a")) ++
          (0 until 4).map(j => col(s"band$j").as(s"a$j")): _*)
        val b = sigs.select(Seq(col("doc_id").as("doc_b"),
          col("phash").as("ph_b")) ++
          (0 until 4).map(j => col(s"band$j").as(s"b$j")): _*)
        (0 until 4).map { i =>
          val earlierDiffer = (0 until i)
            .map(j => col(s"a$j") =!= col(s"b$j"))
            .foldLeft(lit(true))(_ && _)
          a.join(b, col("doc_a") < col("doc_b") &&
            col(s"a$i") === col(s"b$i") && earlierDiffer)
            .select(col("doc_a"), col("doc_b"), col("ph_a"), col("ph_b"))
        }.reduce(_ unionByName _)
          .withColumn("hamming",
            big(bit_count(col("ph_a").bitwiseXOR(col("ph_b")))))
          .filter(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      "WITH sig AS (SELECT doc_id, " +
        (0 until 32).map(i =>
          s"(CASE WHEN ord(substr(text, $i * (length(text) // 33) + 1, 1)) > " +
            s"ord(substr(text, ${i + 1} * (length(text) // 33) + 1, 1)) " +
            s"THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ") +
        " AS phash FROM documents WHERE length(text) >= 33), " +
        "sigb AS (SELECT doc_id, phash, " +
        (0 until 4).map(j => s"(phash >> ${8 * j}) & 255 AS band$j")
          .mkString(", ") +
        " FROM sig) " +
        (0 until 4).map { i =>
          val earlier = (0 until i)
            .map(j => s"a.band$j <> b.band$j").mkString(" AND ")
          val cond = (s"a.band$i = b.band$i" +:
            (if (earlier.isEmpty) Nil else Seq(earlier))).mkString(" AND ")
          "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
            "bit_count(xor(a.phash, b.phash))::BIGINT AS hamming " +
            s"FROM sigb a JOIN sigb b ON a.doc_id < b.doc_id AND $cond"
        }.mkString("SELECT doc_a, doc_b, hamming FROM (",
          " UNION ALL ", ") t WHERE hamming <= 3 ORDER BY doc_a, doc_b")),

    // Container-format dispatch (round-9 addendum): sniff the magic bytes
    // at the head of the OPAQUE BINARY payload and route to a MIME tag —
    // the first thing a mixed media lake does before any decoder runs
    // (and the dispatch `mm_decode_meta`'s stub decoder would sit behind).
    // The payload here is synthesized with deterministic ASCII-safe
    // magics (PNG1/JPG1/RIFF per doc_id mod 3) so the DuckDB twin can
    // compute the identical values in the string domain while the Spark
    // side runs the REAL binary path: cast→concat binary, binary
    // substring, decode back — the plumbing a genuine magic-byte sniffer
    // (0x89PNG, 0xFFD8) uses unchanged. One codegen projection + a
    // |formats|-bounded rollup; payload bytes never shuffle.
    "mm_magic_sniff" -> Q(
      (s, d) => {
        val magic = when(col("doc_id") % 3 === 0, lit("PNG1"))
          .when(col("doc_id") % 3 === 1, lit("JPG1"))
          .otherwise(lit("RIFF"))
        T(s, d, "documents")
          .select(col("doc_id"), concat(magic.cast("binary"),
            col("text").cast("binary")).as("payload"))
          .withColumn("head", expr("decode(substring(payload, 1, 4), 'UTF-8')"))
          .withColumn("format",
            when(col("head") === "PNG1", "image/png")
              .when(col("head") === "JPG1", "image/jpeg")
              .when(col("head") === "RIFF", "audio/wav")
              .otherwise("application/octet-stream"))
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_files"),
            sum(expr("octet_length(payload)")).as("total_bytes"))
          .orderBy(col("format"))
      },
      // all-ASCII corpus (octet_length == n_chars, verified above), so the
      // string-domain twin is byte-exact
      "SELECT format, COUNT(*)::BIGINT AS n_files, " +
        "SUM(4 + strlen(text))::BIGINT AS total_bytes FROM (" +
        "SELECT CASE doc_id % 3 WHEN 0 THEN 'image/png' " +
        "WHEN 1 THEN 'image/jpeg' ELSE 'audio/wav' END AS format, text " +
        "FROM documents) t GROUP BY 1 ORDER BY format"),
  )
}
