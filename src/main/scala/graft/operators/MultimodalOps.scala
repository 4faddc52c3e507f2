package graft.operators

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, T}
import graft.Dsl._
import graft.functions.{BmpExpressions, BmpImpl, JpegExpressions, PngExpressions, WavExpressions}

/** Multimodal-column plumbing (north star mandate): media payloads live as
  * opaque `binary` columns with typed metadata beside them. As of round 12
  * every decode in the family is REAL: uncompressed 24-bit BMP
  * (graft.functions.BmpExpressions — header parse, bottom-up rows, row
  * padding) and zlib-compressed 8-bit-grayscale PNG
  * (graft.functions.PngExpressions — chunk walk with CRC32 verification,
  * multi-IDAT, real Inflater, all five scanline defilters), both as native
  * codegen'd Catalyst expressions over genuine containers synthesized from
  * the corpus. Metadata keys parse actual header bytes (big-endian PNG
  * IHDR vs little-endian BMP fields) with builtin binary slicing; the
  * frame sampler walks a real multi-frame container by its parsed size
  * field; resize runs on decoded pixels. No fake decodes remain — as of
  * round 13 that includes the tile grid, whose dims come from the real
  * BMP parse (the last formula-dims remnant). Round 13 also makes the
  * family TOTAL on empty payloads: every key reads the [[docs]] frame
  * (empty text carries no media; oracles share the rule via [[mmGuard]])
  * and every synth substitutes a 1-byte sentinel rather than throwing,
  * so a regenerated corpus with empty docs cannot crash a scan.
  *
  * The synthetic payload is the document text's UTF-8 bytes (all-ASCII,
  * verified: octet_length == n_chars at every sf), standing in for an
  * image/audio blob.
  */
object MultimodalOps {

  /** Documents that CARRY media (r13 empty-payload guard): an empty text
    * has no image/audio blob, so every mm key starts from this frame —
    * and its oracle from the matching `docs_ne` CTE ([[mmGuard]]) — which
    * makes the whole family total under a regenerated corpus containing
    * empty docs (the synths are additionally total via a 1-byte sentinel,
    * so even raw expression use cannot throw mid-scan). The predicate is
    * a pushed-down scan filter; current fixtures have no empty text, so
    * every oracle value is unchanged. */
  private def docs(s: SparkSession, d: String) =
    T(s, d, "documents").filter(length(col("text")) > 0)

  /** Oracle twin of [[docs]] — the usEvents textual-rewrite discipline:
    * every `FROM documents` scan becomes the guarded `docs_ne` CTE, and a
    * query that dodges the rewrite fails loudly at registry build. */
  private def mmGuard(sql: String): String = {
    val rewritten = sql.replace("FROM documents", "FROM docs_ne")
    require(rewritten != sql, s"mmGuard: no documents scan rewritten in: $sql")
    graft.Dsl.prependCte(
      "docs_ne AS (SELECT * FROM documents WHERE strlen(text) > 0)",
      rewritten)
  }

  /** One media row: id + opaque payload (the mapInPandas-style batch shape
    * is Dataset[MediaRow] → mapPartitions over iterator batches). */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Extracted features per media row: container size, decoded pixel
    * count, exact gray sum, and the first 8 decoded pixels. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, n_pixels: Int,
      sum_gray: Long, head: Seq[Int])

  /** REAL decoder on the typed path (rebased round 12, was a declared
    * fake): the payload is a genuine BMP container and the features come
    * from BmpImpl.decode — the same parser the codegen'd expression keys
    * run, here exercised through the imperative mapPartitions batch shape
    * (the mapInPandas stand-in). */
  def realDecode(payload: Array[Byte]): MediaFeatures = {
    val row = BmpImpl.decode(payload)
    val px = row.getArray(2)
    var s = 0L
    var i = 0
    val n = px.numElements()
    while (i < n) { s += px.getInt(i); i += 1 }
    MediaFeatures(-1L, payload.length, n, s,
      (0 until math.min(8, n)).map(px.getInt))
  }

  /** Partition-parallel feature extraction over the typed batch shape. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      realDecode(row.payload).copy(doc_id = row.doc_id)
    })
  }

  def mediaOf(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    docs(s, d)
      .select(col("doc_id"), BmpExpressions.bmpSynth(s)(
        col("text").cast("binary")).as("payload"))
      .as[MediaRow]
  }

  /** 1-based little-endian uint32 read off a binary column with builtin
    * slicing — the BMP header fields. Four single-byte reads recomposed;
    * stays inside whole-stage codegen. */
  private def leInt(payload: Column, off1: Int): Column =
    (0 until 4).map(i =>
      conv(hex(substring(payload, off1 + i, 1)), 16, 10).cast("long") *
        lit(1L << (8 * i))).reduce(_ + _)

  /** 1-based big-endian uint32 read — the PNG header fields (network
    * order, so the 4-byte hex slice converts directly). */
  private def beInt(payload: Column, off1: Int): Column =
    conv(hex(substring(payload, off1, 4)), 16, 10).cast("long")

  private val rawDefs: Seq[(String, Q)] = Seq(

    // Decode METADATA off real containers (rebased round 12, was a
    // deterministic fake): a mixed media lake — each doc carries either a
    // genuine BMP (even doc_id) or a genuine PNG (odd) container — is
    // dispatched on its ACTUAL magic bytes ('BM' vs 0x89'PN'), then the
    // dimensions are parsed from the REAL header fields with builtin
    // binary slicing: PNG IHDR width/height are big-endian at offsets
    // 17/21 (1-based, after the 8-byte signature + chunk len/type), BMP
    // width/height little-endian at 19/23 — the leInt/beInt helpers above,
    // all inside one codegen projection (this is the metadata-only fast
    // path a lake scanner runs: NO pixel decode, NO inflate — it touches
    // ~30 header bytes per blob regardless of image size, which is the
    // point at 100 TB). The oracle recomputes dims from the two synth
    // formulas, so a parser reading the wrong offset/endianness fails the
    // hash (the formulas intentionally differ between the two formats).
    "mm_decode_meta" -> Q(
      (s, d) => {
        val text = col("text").cast("binary")
        val payload = when(col("doc_id") % 2 === 0,
          BmpExpressions.bmpSynth(s)(text))
          .otherwise(PngExpressions.pngSynth(s)(text))
        docs(s, d)
          .select(col("doc_id"), payload.as("payload"))
          .withColumn("magic", hex(substring(col("payload"), 1, 2)))
          .select(col("doc_id"),
            when(col("magic") === "424D", "image/bmp")
              .when(col("magic") === "8950", "image/png")
              .otherwise("application/octet-stream").as("format"),
            when(col("magic") === "424D", leInt(col("payload"), 19))
              .otherwise(beInt(col("payload"), 17)).as("width"),
            when(col("magic") === "424D", leInt(col("payload"), 23))
              .otherwise(beInt(col("payload"), 21)).as("height"))
          .withColumn("n_pixels", col("width") * col("height"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, " +
        "CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'image/png' END AS format, " +
        "CASE WHEN doc_id % 2 = 0 THEN strlen(text) % 24 + 8 " +
        "ELSE strlen(text) % 20 + 9 END::BIGINT AS width, " +
        "CASE WHEN doc_id % 2 = 0 THEN strlen(text) * 7 % 16 + 5 " +
        "ELSE strlen(text) * 5 % 12 + 6 END::BIGINT AS height, " +
        "(CASE WHEN doc_id % 2 = 0 THEN strlen(text) % 24 + 8 " +
        "ELSE strlen(text) % 20 + 9 END * " +
        "CASE WHEN doc_id % 2 = 0 THEN strlen(text) * 7 % 16 + 5 " +
        "ELSE strlen(text) * 5 % 12 + 6 END)::BIGINT AS n_pixels " +
        "FROM documents ORDER BY doc_id"),

    // REAL compressed decode (round 12) — the verdict's "real corpora are
    // PNG/JPEG" item: each document's bytes become a GENUINE 8-bit
    // grayscale PNG (PngSynth: real IHDR/IDAT/IEND chunks with CRC32s,
    // scanline filters cycling through all five types, a real Deflater
    // zlib stream split across multiple IDAT chunks) and are decoded back
    // by a REAL parser (PngDecode: signature + per-chunk CRC verification,
    // multi-IDAT concat, real Inflater, Paeth & friends defiltered). The
    // oracle recomputes the expected pixels from the generator formula
    // (gray k = text byte k·mod·len; PNG dims formulas), never seeing the
    // container — the hash certifies filter→deflate→chunk→parse exactly.
    // Same scale shape as mm_decode_real: one codegen projection, only
    // digests leave it.
    // r18 OPTIMIZATION: interpreted sum fold + per-pixel string array →
    // native IntSumLong / IntCsvMd5 single passes (same bytes hashed).
    "mm_png_decode_real" -> Q(
      (s, d) => {
        val img = PngExpressions.pngDecode(s)(
          PngExpressions.pngSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), img.as("img"))
          .select(col("doc_id"),
            big(col("img.width")).as("width"),
            big(col("img.height")).as("height"),
            big(size(col("img.pixels"))).as("n_pixels"),
            graft.functions.PixelFeatureExpressions.intSumLong(s)(
              col("img.pixels")).as("sum_gray"),
            graft.functions.PixelFeatureExpressions.intCsvMd5(s)(
              col("img.pixels")).as("pixels_md5"))
          .orderBy(col("doc_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 20 + 9)::BIGINT AS width, " +
        "(strlen(text) * 5 % 12 + 6)::BIGINT AS height FROM documents), " +
        "px AS (SELECT doc_id, width, height, " +
        "list_transform(generate_series(0, (width*height - 1)::INT), " +
        "k -> ord(substr(text, ((k % len) + 1)::INT, 1))) AS pixels FROM dims) " +
        "SELECT doc_id, width, height, len(pixels)::BIGINT AS n_pixels, " +
        "list_sum(pixels)::BIGINT AS sum_gray, " +
        "md5(array_to_string(pixels, ',')) AS pixels_md5 " +
        "FROM px ORDER BY doc_id"),

    // REAL image decode (round-11) — the verdict's last-stub closure: each
    // document's bytes are wrapped into a GENUINE uncompressed 24-bit BMP
    // container (BmpSynth: real file+info headers, bottom-up row storage,
    // 4-byte row padding) and decoded back by a REAL parser (BmpDecode:
    // reads the little-endian header fields and pixel offset, un-pads,
    // re-flips rows — it never sees the synthesis rule). The oracle
    // recomputes the expected pixels independently from the generator
    // formula (gray(k) = byte k·mod·len of the text; dims from the length),
    // so the hash match certifies the full encode→container→parse round
    // trip byte-for-byte. Both expressions are native codegen'd Catalyst
    // Expressions (no UDF — PlanAuditSpec enforced); per-row O(pixels)
    // work, and only doc-sized digests (sum, md5) leave the projection.
    // r18 OPTIMIZATION: same native-fold rewiring as mm_png_decode_real.
    "mm_decode_real" -> Q(
      (s, d) => {
        val img = BmpExpressions.bmpDecode(s)(
          BmpExpressions.bmpSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), img.as("img"))
          .select(col("doc_id"),
            big(col("img.width")).as("width"),
            big(col("img.height")).as("height"),
            big(size(col("img.pixels"))).as("n_pixels"),
            graft.functions.PixelFeatureExpressions.intSumLong(s)(
              col("img.pixels")).as("sum_gray"),
            graft.functions.PixelFeatureExpressions.intCsvMd5(s)(
              col("img.pixels")).as("pixels_md5"))
          .orderBy(col("doc_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 24 + 8)::BIGINT AS width, " +
        "(strlen(text) * 7 % 16 + 5)::BIGINT AS height FROM documents), " +
        "px AS (SELECT doc_id, width, height, " +
        "list_transform(generate_series(0, (width*height - 1)::INT), " +
        "k -> ord(substr(text, ((k % len) + 1)::INT, 1))) AS pixels FROM dims) " +
        "SELECT doc_id, width, height, len(pixels)::BIGINT AS n_pixels, " +
        "list_sum(pixels)::BIGINT AS sum_gray, " +
        "md5(array_to_string(pixels, ',')) AS pixels_md5 " +
        "FROM px ORDER BY doc_id"),

    // JPEG METADATA off a real marker walk (round-12): the header side of
    // the format real corpora actually use. Scan data is STUBBED (the
    // container carries no entropy segment — full Huffman/DCT decode is
    // declared out of scope; JpegExpressions documents it loudly), but the
    // MARKER-SEGMENT WALK is the real thing a lake scanner runs per blob:
    // SOI, then variable-length segments (0xFF marker + big-endian length
    // that INCLUDES its own two bytes — the classic off-by-two) skipped
    // until SOF0 yields the dims. The synthesized COM segment's length
    // varies per document, so SOF0's offset MOVES row to row and a
    // fixed-offset cheat cannot match the oracle, which recomputes dims
    // and the aspect bucket from the synthesis formulas. Constant bytes
    // touched per blob regardless of image size — the 100-TB point of a
    // metadata-only pass.
    "mm_jpeg_meta" -> Q(
      (s, d) => {
        val m = JpegExpressions.jpegMeta(s)(
          JpegExpressions.jpegSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), m.as("m"))
          .select(col("doc_id"),
            big(col("m.width")).as("width"),
            big(col("m.height")).as("height"),
            big(col("m.n_segments")).as("n_segments"),
            when(col("m.width") > col("m.height"), "landscape")
              .when(col("m.width") < col("m.height"), "portrait")
              .otherwise("square").as("orientation"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, (strlen(text) % 18 + 11)::BIGINT AS width, " +
        "(strlen(text) * 3 % 14 + 7)::BIGINT AS height, " +
        "4::BIGINT AS n_segments, " +
        "CASE WHEN strlen(text) % 18 + 11 > strlen(text) * 3 % 14 + 7 " +
        "THEN 'landscape' WHEN strlen(text) % 18 + 11 < strlen(text) * 3 % 14 + 7 " +
        "THEN 'portrait' ELSE 'square' END AS orientation " +
        "FROM documents ORDER BY doc_id"),

    // REAL audio decode (round-12) — the third modality: each document's
    // bytes become a GENUINE RIFF/WAVE container (WavSynth: real fmt
    // chunk — PCM/mono/16-bit with a length-derived sample rate — an
    // ancillary LIST chunk, and a word-aligned data chunk of 16-bit LE
    // samples spanning negative and positive territory) and are decoded
    // back by a REAL parser (WavDecode: RIFF magic, chunk walk honoring
    // the spec's odd-size pad byte, fmt validation, unknown chunks
    // skipped, signed int16 reassembly). Features are the first pass any
    // audio-quality gate runs: total |amplitude|, peak, exact energy
    // (sum of squares, 64-bit), plus the full-sample md5. The oracle
    // recomputes every sample from the generator formula — a sign error
    // in the int16 reassembly or a mis-skipped chunk breaks the hash.
    // One codegen projection; samples never shuffle.
    // r18 OPTIMIZATION (guide §1.2 step 2): the three amplitude folds were
    // interpreted `aggregate` HOFs (three boxed passes over every sample)
    // and the md5 materialized a per-sample string array + one giant
    // concat; now ONE native pass (PixelFeatureExpressions.wavFeats)
    // computes (sum_abs, peak, energy) and IntCsvMd5 streams the digest —
    // identical integer arithmetic, oracle unchanged.
    "mm_wav_decode_real" -> Q(
      (s, d) => {
        val au = WavExpressions.wavDecode(s)(
          WavExpressions.wavSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), au.as("au"))
          .select(col("doc_id"),
            big(col("au.sample_rate")).as("sample_rate"),
            big(col("au.n_samples")).as("n_samples"),
            graft.functions.PixelFeatureExpressions.wavFeats(s)(
              col("au.samples")).as("wf"),
            graft.functions.PixelFeatureExpressions.intCsvMd5(s)(
              col("au.samples")).as("samples_md5"))
          .select(col("doc_id"), col("sample_rate"), col("n_samples"),
            col("wf.sum_abs").as("sum_abs"), col("wf.peak").as("peak"),
            col("wf.energy").as("energy"), col("samples_md5"))
          .orderBy(col("doc_id"))
      },
      "WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents), " +
        "s AS (SELECT doc_id, (8000 + (len % 3) * 4000)::BIGINT AS sample_rate, " +
        "2 * len AS n, list_transform(generate_series(0, (2*len - 1)::INT), " +
        "k -> (ord(substr(text, ((k % len) + 1)::INT, 1)) - 96) * 256 + k % 13) " +
        "AS smp FROM d) " +
        "SELECT doc_id, sample_rate, n::BIGINT AS n_samples, " +
        "list_sum(list_transform(smp, x -> abs(x)))::BIGINT AS sum_abs, " +
        "list_max(list_transform(smp, x -> abs(x)))::BIGINT AS peak, " +
        "list_sum(list_transform(smp, x -> x::BIGINT * x))::BIGINT AS energy, " +
        "md5(array_to_string(smp, ',')) AS samples_md5 " +
        "FROM s ORDER BY doc_id"),

    // Audio FRAME energy over the real decode (round-12) — the windowed
    // loudness pass (VAD, silence trimming, loudness normalization all
    // start here): 64-sample frames with an edge-clamped tail, each
    // reduced to its exact energy and peak. The frame explode is bounded
    // by n/64 per doc; slices happen in-row (slice HOF over the decoded
    // array), only frame digests reach the sort. The audio sibling of
    // mm_tile_stats.
    // r18 OPTIMIZATION (guide §2.3 — project before the row multiply): the
    // old shape exploded a frame-index sequence and carried the WHOLE
    // sample array through the Generate (every frame row re-materialized
    // its document's n samples, O(n²/64) bytes per doc), then sliced and
    // folded interpreted HOFs per frame. Now ONE native pre-explode pass
    // (FrameFeats) reduces the samples to a frames-sized digest array and
    // the Generate explodes only (frame_n, energy, peak) triples —
    // identical integer arithmetic per frame, oracle unchanged.
    "mm_wav_frame_energy" -> Q(
      (s, d) => {
        val au = WavExpressions.wavDecode(s)(
          WavExpressions.wavSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"),
            graft.functions.PixelFeatureExpressions.frameFeats(s)(
              au.getField("samples")).as("ff"))
          .select(col("doc_id"), posexplode(col("ff")).as(Seq("frame_idx", "f")))
          .select(col("doc_id"), big(col("frame_idx")).as("frame_idx"),
            col("f.frame_n").as("frame_n"), col("f.energy").as("energy"),
            col("f.peak").as("peak"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      "WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents), " +
        "s AS (SELECT doc_id, 2 * len AS n, " +
        "list_transform(generate_series(0, (2*len - 1)::INT), " +
        "k -> (ord(substr(text, ((k % len) + 1)::INT, 1)) - 96) * 256 + k % 13) " +
        "AS smp FROM d), " +
        "fr AS (SELECT doc_id, n, smp, " +
        "unnest(generate_series(0, (n + 63) // 64 - 1)) AS f FROM s), " +
        "fx AS (SELECT doc_id, f, LEAST(64, n - f * 64) AS fn, " +
        "list_slice(smp, (f * 64 + 1)::INT, (f * 64 + LEAST(64, n - f * 64))::INT) AS w " +
        "FROM fr) " +
        "SELECT doc_id, f::BIGINT AS frame_idx, fn::BIGINT AS frame_n, " +
        "list_sum(list_transform(w, x -> x::BIGINT * x))::BIGINT AS energy, " +
        "list_max(list_transform(w, x -> abs(x)))::BIGINT AS peak " +
        "FROM fx ORDER BY doc_id, frame_idx"),

    // Per-tile pixel statistics over the REAL decode (round-11) —
    // mm_tile_grid's pixel-backed sibling: 8×8 tiles over the decoded
    // grayscale image (edge-clamped partials), each tile reduced to its
    // exact pixel sum + floor-mean — the standard thumbnail/pooling pass a
    // vision pipeline runs before embedding. All math is integer (sum and
    // ONE floor division per tile), the tile explode is bounded by the
    // grid size, and only tile digests — never pixels — reach the sort.
    // r18 OPTIMIZATION (guide §2.3 — same pre-explode discipline as
    // mm_wav_frame_energy): the tile explode used to carry the whole pixel
    // array per tile row and fold an interpreted aggregate over a
    // generated index sequence per tile; now ONE native pass (TileSums)
    // reduces the image to a grid-sized array<long> BEFORE the Generate,
    // and the geometry columns derive from the exploded position exactly
    // as before — identical integer arithmetic, oracle unchanged.
    "mm_tile_stats" -> Q(
      (s, d) => {
        val img = BmpExpressions.bmpDecode(s)(
          BmpExpressions.bmpSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), img.as("img"))
          .select(col("doc_id"), col("img.width").as("width"),
            col("img.height").as("height"),
            graft.functions.PixelFeatureExpressions.tileSums(s)(
              col("img.pixels"), col("img.width"), col("img.height"))
              .as("tsums"))
          .withColumn("tiles_x", expr("(width + 7) div 8"))
          .select(col("doc_id"), col("width"), col("height"), col("tiles_x"),
            posexplode(col("tsums")).as(Seq("tile_id", "tile_sum_gray")))
          .withColumn("off_x", pmod(col("tile_id"), col("tiles_x")) * 8)
          .withColumn("off_y", expr("(tile_id div tiles_x) * 8"))
          .withColumn("tile_w", least(lit(8), col("width") - col("off_x")))
          .withColumn("tile_h", least(lit(8), col("height") - col("off_y")))
          .select(col("doc_id"), big(col("tile_id")).as("tile_id"),
            big(col("off_x")).as("off_x"), big(col("off_y")).as("off_y"),
            big(col("tile_w")).as("tile_w"), big(col("tile_h")).as("tile_h"),
            big(col("tile_sum_gray")).as("tile_sum_gray"),
            big(expr("tile_sum_gray div (tile_w * tile_h)")).as("mean_gray"))
          .orderBy(col("doc_id"), col("tile_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "strlen(text) % 24 + 8 AS width, strlen(text) * 7 % 16 + 5 AS height " +
        "FROM documents), " +
        "g AS (SELECT *, (width + 7) // 8 AS tiles_x, (height + 7) // 8 AS tiles_y " +
        "FROM dims), " +
        "tt AS (SELECT doc_id, text, len, width, height, tiles_x, " +
        "unnest(generate_series(0, tiles_x * tiles_y - 1)) AS tile_id FROM g), " +
        "tx AS (SELECT *, (tile_id % tiles_x) * 8 AS off_x, " +
        "(tile_id // tiles_x) * 8 AS off_y FROM tt), " +
        "te AS (SELECT *, LEAST(8, width - off_x) AS tile_w, " +
        "LEAST(8, height - off_y) AS tile_h FROM tx), " +
        "ts AS (SELECT doc_id, tile_id, off_x, off_y, tile_w, tile_h, " +
        "list_sum(list_transform(generate_series(0, (tile_w*tile_h - 1)::INT), " +
        "j -> ord(substr(text, ((((off_y + j // tile_w) * width + off_x + " +
        "(j % tile_w)) % len) + 1)::INT, 1)))) AS tile_sum_gray FROM te) " +
        "SELECT doc_id, tile_id::BIGINT AS tile_id, off_x::BIGINT AS off_x, " +
        "off_y::BIGINT AS off_y, tile_w::BIGINT AS tile_w, " +
        "tile_h::BIGINT AS tile_h, tile_sum_gray::BIGINT AS tile_sum_gray, " +
        "(tile_sum_gray // (tile_w * tile_h))::BIGINT AS mean_gray " +
        "FROM ts ORDER BY doc_id, tile_id"),

    // Per-image pixel HISTOGRAM over the real decode (round-11) — the
    // first statistic any vision-quality gate computes (exposure check,
    // dedup pre-filter): 16 gray bins of 16 levels each, counted straight
    // off the decoded pixel array, plus the dominant bin (first-max —
    // deterministic under ties on both engines: array_position and
    // list_position both return the FIRST occurrence). All integer; the
    // 16 bin counts are ONE native single-pass expression (GrayHist16 —
    // the per-bin filter() formulation scanned the array 16×, measured
    // 5 s → sub-second at sf0.1) inside one projection over the decode,
    // and only the 16-value digest string + mode leave it.
    "mm_histogram" -> Q(
      (s, d) => {
        val img = BmpExpressions.bmpDecode(s)(
          BmpExpressions.bmpSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), img.getField("pixels").as("pixels"))
          .withColumn("bins", BmpExpressions.grayHist16(s)(col("pixels")))
          .select(col("doc_id"),
            concat_ws(",", transform(col("bins"), c => c.cast("string")))
              .as("hist_csv"),
            big(expr("array_position(bins, array_max(bins))")).as("mode_bin_1b"),
            big(expr("array_max(bins)")).as("mode_count"))
          .orderBy(col("doc_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 24 + 8)::BIGINT AS width, " +
        "(strlen(text) * 7 % 16 + 5)::BIGINT AS height FROM documents), " +
        "px AS (SELECT doc_id, " +
        "list_transform(generate_series(0, (width*height - 1)::INT), " +
        "k -> ord(substr(text, ((k % len) + 1)::INT, 1))) AS pixels FROM dims), " +
        "h AS (SELECT doc_id, list_transform(generate_series(0, 15), " +
        "k -> len(list_filter(pixels, p -> p // 16 = k))::BIGINT) AS bins " +
        "FROM px) " +
        "SELECT doc_id, array_to_string(bins, ',') AS hist_csv, " +
        "list_position(bins, list_aggregate(bins, 'max'))::BIGINT AS mode_bin_1b, " +
        "list_aggregate(bins, 'max')::BIGINT AS mode_count " +
        "FROM h ORDER BY doc_id"),

    // Gradient ENERGY over the real decode (round-11) — the blur/detail
    // screen (and the scalar the full dHash generalizes): total absolute
    // horizontal gradient (within rows — the (k+1)%width boundary guard
    // stops row-wrap artifacts) and vertical gradient (across rows),
    // exact integers off the decoded array. The same shape a Sobel/
    // Laplacian sharpness score takes; one projection, digest-only output.
    // r18 OPTIMIZATION: the two gradient folds each materialized a
    // pixel-count index sequence (the h-pass additionally a filtered copy)
    // and folded it interpreted; now ONE native pass (EdgeEnergy) computes
    // both totals straight off the decoded array — identical 0-based
    // neighbor arithmetic, oracle unchanged.
    "mm_edge_energy" -> Q(
      (s, d) => {
        val img = BmpExpressions.bmpDecode(s)(
          BmpExpressions.bmpSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), img.getField("width").as("width"),
            img.getField("pixels").as("pixels"))
          .select(col("doc_id"),
            graft.functions.PixelFeatureExpressions.edgeEnergy(s)(
              col("pixels"), col("width")).as("ee"))
          .select(col("doc_id"), col("ee.h_energy").as("h_energy"),
            col("ee.v_energy").as("v_energy"))
          .orderBy(col("doc_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 24 + 8)::INT AS width, " +
        "(strlen(text) * 7 % 16 + 5)::INT AS height FROM documents), " +
        "px AS (SELECT doc_id, width, " +
        "list_transform(generate_series(0, (width*height - 1)::INT), " +
        "k -> ord(substr(text, ((k % len) + 1)::INT, 1))) AS pixels FROM dims) " +
        "SELECT doc_id, " +
        "list_sum(list_transform(list_filter(generate_series(0, len(pixels) - 2), " +
        "k -> (k + 1) % width != 0), " +
        "k -> abs(pixels[(k + 2)::INT] - pixels[(k + 1)::INT])))::BIGINT AS h_energy, " +
        "list_sum(list_transform(generate_series(0, len(pixels) - width - 1), " +
        "k -> abs(pixels[(k + width + 1)::INT] - pixels[(k + 1)::INT])))::BIGINT AS v_energy " +
        "FROM px ORDER BY doc_id"),

    // 2D tile grid (round-10; rebased on the REAL decoder in r13 — the
    // dims were the last formula-stub remnant after the decode family
    // went real in r11/r12) — the patching step every vision pipeline
    // runs before embedding (ViT patches, tiled OCR): (width, height)
    // come from BmpDecode over the genuine container exactly as
    // mm_tile_stats takes them, then a 16×16 tile grid is laid over the
    // image with edge-clamped partial tiles. 16 px (not ViT's 224)
    // because the fixture decodes to ≤31×20 px — 16 is the largest power
    // of two at which real dims still exercise multi-tile grids AND
    // clamped partials in both axes; the TILING math — ceil-div grid
    // shape, per-tile offsets and clamped extents, row-major tile ids —
    // is unchanged and side-agnostic. The oracle recomputes dims from
    // the synthesis formulas, never seeing the container, so a header
    // mis-parse breaks the hash. All integer, one explode per image
    // (bounded by the grid size, never corpus-quadratic); this is a
    // geometry-only pass — pixels stay inside the decode projection.
    "mm_tile_grid" -> Q(
      (s, d) => {
        val img = BmpExpressions.bmpDecode(s)(
          BmpExpressions.bmpSynth(s)(col("text").cast("binary")))
        val dims = docs(s, d)
          .select(col("doc_id"), img.as("img"))
          .select(col("doc_id"), big(col("img.width")).as("width"),
            big(col("img.height")).as("height"))
        val t = lit(16L)
        dims
          .withColumn("tiles_x", expr("(width + 15) div 16"))
          .withColumn("tiles_y", expr("(height + 15) div 16"))
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
      "SELECT doc_id, tile_id, (tile_id % tiles_x) * 16 AS off_x, " +
        "(tile_id // tiles_x) * 16 AS off_y, " +
        "LEAST(16, width - (tile_id % tiles_x) * 16) AS tile_w, " +
        "LEAST(16, height - (tile_id // tiles_x) * 16) AS tile_h FROM (" +
        "SELECT doc_id, width, height, tiles_x, " +
        "unnest(generate_series(0, tiles_x * tiles_y - 1)) AS tile_id FROM (" +
        "SELECT doc_id, width, height, (width + 15) // 16 AS tiles_x, " +
        "(height + 15) // 16 AS tiles_y FROM (" +
        "SELECT doc_id, (strlen(text) % 24 + 8)::BIGINT AS width, " +
        "(strlen(text) * 7 % 16 + 5)::BIGINT AS height " +
        "FROM documents) d0) d1) g ORDER BY doc_id, tile_id"),

    // Frame sampling off a REAL multi-frame container (rebased round 12,
    // was fixed-stride byte slices): the "video" is 4 genuine BMP frames
    // CONCATENATED (frame i encodes the text rotated left by i — real
    // animation-style per-frame deltas), and the sampler WALKS the
    // container the way a demuxer does: it parses the fileSize field
    // (little-endian at offset 3, 1-based) out of the FIRST frame's
    // header to learn the frame stride, slices each frame out with binary
    // substring, and runs the real BmpDecode on every slice. Each frame
    // reduces to its exact gray sum — the per-frame digest a keyframe
    // selector ranks on. The oracle recomputes each frame's pixels from
    // the rotation formula (pixel k of frame i = text[((k mod len) + i)
    // mod len]) plus the BMP size arithmetic (54 + paddedRow·h) — it
    // never sees the container, so the match certifies the walk + parse.
    // One codegen projection; the explode is 4 rows/doc; pixels never
    // shuffle (sums only).
    "mm_frame_sample" -> Q(
      (s, d) => {
        val len = length(col("text"))
        val rot = (i: Int) => concat(
          substring(col("text"), i + 1, 1000000), substring(col("text"), 1, i))
          .cast("binary")
        val container = concat((0 until 4).map(i =>
          BmpExpressions.bmpSynth(s)(rot(i))): _*)
        docs(s, d)
          .filter(len >= 4) // rotations need ≥ 4 chars; sf corpora all pass
          .select(col("doc_id"), container.as("container"))
          // the demuxer step: frame stride = parsed fileSize of frame 0
          .withColumn("fsize", leInt(col("container"), 3))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, 3), i -> substring(container, " +
              "cast(i * fsize + 1 as int), cast(fsize as int)))"))
            .as(Seq("frame_idx", "frame")))
          .withColumn("img", BmpExpressions.bmpDecode(s)(col("frame")))
          // r18 OPTIMIZATION: interpreted sum fold → native IntSumLong.
          .select(col("doc_id"), big(col("frame_idx")).as("frame_idx"),
            graft.functions.PixelFeatureExpressions.intSumLong(s)(
              col("img.pixels")).as("frame_sum_gray"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 24 + 8)::INT AS width, " +
        "(strlen(text) * 7 % 16 + 5)::INT AS height FROM documents " +
        "WHERE strlen(text) >= 4), " +
        "fr AS (SELECT doc_id, text, len, width, height, " +
        "unnest([0, 1, 2, 3]) AS frame_idx FROM dims) " +
        "SELECT doc_id, frame_idx::BIGINT AS frame_idx, " +
        "list_sum(list_transform(generate_series(0, width*height - 1), " +
        "k -> ord(substr(text, (((k % len) + frame_idx) % len + 1)::INT, 1))))" +
        "::BIGINT AS frame_sum_gray " +
        "FROM fr ORDER BY doc_id, frame_idx"),

    // Feature extraction through the typed mapPartitions batch path
    // (rebased round 12: the decoder behind the typed shape is now the
    // REAL BmpImpl.decode — mediaOf carries genuine BMP containers, and
    // the features are container size, decoded pixel count, exact gray
    // sum, first 8 decoded pixels). The imperative Dataset[MediaRow] →
    // Dataset[MediaFeatures] path is the mapInPandas stand-in: per-row
    // codec work that genuinely doesn't fit an expression rides
    // partition-parallel iterators, and only doc-sized feature rows come
    // back. The oracle recomputes every feature from the synth formulas
    // (container size = 54 + paddedRow·h — it knows the BMP layout, not
    // the parser).
    "mm_feature_extract" -> Q(
      (s, d) => {
        import s.implicits._
        extractFeatures(mediaOf(s, d))
          .select(col("doc_id"), big(col("n_bytes")).as("n_bytes"),
            big(col("n_pixels")).as("n_pixels"),
            big(col("sum_gray")).as("sum_gray"),
            concat_ws(",", transform(col("head"), c => c.cast("string"))).as("head_csv"))
          .orderBy(col("doc_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 24 + 8)::INT AS width, " +
        "(strlen(text) * 7 % 16 + 5)::INT AS height FROM documents) " +
        "SELECT doc_id, " +
        "(54 + ((width * 3 + 3) // 4 * 4) * height)::BIGINT AS n_bytes, " +
        "(width * height)::BIGINT AS n_pixels, " +
        "list_sum(list_transform(generate_series(0, width*height - 1), " +
        "k -> ord(substr(text, ((k % len) + 1)::INT, 1))))::BIGINT AS sum_gray, " +
        "array_to_string(list_transform(generate_series(0, 7), " +
        "k -> ord(substr(text, ((k % len) + 1)::INT, 1))), ',') AS head_csv " +
        "FROM dims ORDER BY doc_id"),

    // REAL resize (rebased round 12, was a 1-D byte sampler): 2×
    // nearest-neighbor downsample over DECODED pixels — decode the PNG
    // container (real inflate + defilter), then out(x, y) = in(2x, 2y)
    // with ceil-half output dims, the exact thumbnail pass a vision
    // pipeline runs before embedding. The sampling is one transform HOF
    // over the decoded array inside the same codegen projection as the
    // decode; only the resized digest (md5 + sum) leaves it. The oracle
    // recomputes the resized grid straight from the generator formula
    // (in-pixel (2x, 2y) = text byte ((2y·w + 2x) mod len)), so a
    // stride/rounding slip on either side breaks the hash.
    "mm_resize_real" -> Q(
      (s, d) => {
        val img = PngExpressions.pngDecode(s)(
          PngExpressions.pngSynth(s)(col("text").cast("binary")))
        docs(s, d)
          .select(col("doc_id"), img.as("img"))
          .select(col("doc_id"), col("img.width").as("width"),
            col("img.height").as("height"), col("img.pixels").as("pixels"))
          .withColumn("w2", expr("(width + 1) div 2"))
          .withColumn("h2", expr("(height + 1) div 2"))
          // r18 OPTIMIZATION: the sampling transform, sum fold and
          // per-pixel string array were interpreted HOF passes — now
          // native Downsample2x + IntSumLong/IntCsvMd5 (same strides,
          // same bytes hashed).
          .withColumn("resized",
            graft.functions.PixelFeatureExpressions.downsample2x(s)(
              col("pixels"), col("width"), col("w2"), col("h2")))
          .select(col("doc_id"),
            big(col("w2")).as("out_w"), big(col("h2")).as("out_h"),
            graft.functions.PixelFeatureExpressions.intSumLong(s)(
              col("resized")).as("sum_gray"),
            graft.functions.PixelFeatureExpressions.intCsvMd5(s)(
              col("resized")).as("resized_md5"))
          .orderBy(col("doc_id"))
      },
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 20 + 9)::INT AS width, " +
        "(strlen(text) * 5 % 12 + 6)::INT AS height FROM documents), " +
        "rz AS (SELECT doc_id, (width + 1) // 2 AS w2, (height + 1) // 2 AS h2, " +
        "list_transform(generate_series(0, ((width+1)//2) * ((height+1)//2) - 1), " +
        "k -> ord(substr(text, ((((k // ((width+1)//2)) * 2 * width) + " +
        "((k % ((width+1)//2)) * 2)) % len + 1)::INT, 1))) AS resized FROM dims) " +
        "SELECT doc_id, w2::BIGINT AS out_w, h2::BIGINT AS out_h, " +
        "list_sum(resized)::BIGINT AS sum_gray, " +
        "md5(array_to_string(resized, ',')) AS resized_md5 " +
        "FROM rz ORDER BY doc_id"),

    // Perceptual-hash near-dup over DECODED PIXELS (rebased round-11, was
    // sampled raw bytes since round 8): a TRUE image dHash — bit i =
    // (gray_i > gray_{i+1}) over 33 evenly-strided samples of the decoded
    // grayscale pixel array (BmpSynth→BmpDecode, the mm_decode_real real
    // parse) — then the SAME banded-LSH candidate join + hamming filter
    // discipline as llm_simhash_hamming_join, keyed on the MEDIA
    // signature: 4 × 8-bit bands, earlier-band-differs dedup across the 4
    // joins, bit_count(xor) <= 3. Scale shape: decode + signature are ONE
    // projection pass (no shuffle — pixels never leave it); only
    // (doc_id, sig, bands) — ~24 bytes/row — enters the self-join
    // shuffles; each 8-bit band buckets the corpus ~256-ways so candidate
    // pairs stay ~n²/256 per band, and the hamming filter runs post-join
    // on two longs. Images smaller than 33 px are excluded on BOTH sides
    // (stride 0 would alias every sample to position 1 and cluster them
    // into one all-zero-sig bucket); the fixture dims floor at 40 px. The
    // oracle recomputes each sampled gray from the generator formula
    // (pixel k = ord of text byte k·mod·len), independent of the parser.
    "mm_phash_near_dup" -> Q(
      (s, d) => {
        val img = BmpExpressions.bmpDecode(s)(
          BmpExpressions.bmpSynth(s)(col("text").cast("binary")))
        val sigExpr = (0 until 32).map(i =>
          when(expr(s"element_at(pixels, $i * stride + 1)") >
            expr(s"element_at(pixels, ${i + 1} * stride + 1)"),
            lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
        val sigs = docs(s, d)
          .select(col("doc_id"), img.getField("pixels").as("pixels"))
          .filter(size(col("pixels")) >= 33)
          .withColumn("stride", expr("cast(size(pixels) div 33 as int)"))
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
      "WITH dims AS (SELECT doc_id, text, strlen(text) AS len, " +
        "(strlen(text) % 24 + 8) * ((strlen(text) * 7) % 16 + 5) AS np " +
        "FROM documents), " +
        "st AS (SELECT doc_id, text, len, np // 33 AS stride FROM dims " +
        "WHERE np >= 33), " +
        "sig AS (SELECT doc_id, " +
        (0 until 32).map(i =>
          s"(CASE WHEN ord(substr(text, (($i * stride) % len + 1)::INT, 1)) > " +
            s"ord(substr(text, ((${i + 1} * stride) % len + 1)::INT, 1)) " +
            s"THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ") +
        " AS phash FROM st), " +
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

    // Container-format dispatch (rebased round 12, was ASCII-safe fake
    // magics): sniff the REAL magic bytes at the head of genuine
    // containers — 'BM' (0x424D) for BMP, 0x8950 for PNG — and route to a
    // MIME tag, the first thing a mixed media lake does before any
    // decoder runs (exactly the dispatch mm_decode_meta performs before
    // its header parse). The hex(substring(payload, 1, 2)) probe is the
    // production shape: 2 bytes per blob regardless of size. The rollup
    // counts files and decoded pixels per format; the oracle recomputes
    // both from the synthesis parity and dims formulas. One codegen
    // projection + a |formats|-bounded agg; payload bytes never shuffle.
    "mm_magic_sniff" -> Q(
      (s, d) => {
        val text = col("text").cast("binary")
        val payload = when(col("doc_id") % 2 === 0,
          BmpExpressions.bmpSynth(s)(text))
          .otherwise(PngExpressions.pngSynth(s)(text))
        docs(s, d)
          .select(col("doc_id"), payload.as("payload"))
          .withColumn("magic", hex(substring(col("payload"), 1, 2)))
          .withColumn("format",
            when(col("magic") === "424D", "image/bmp")
              .when(col("magic") === "8950", "image/png")
              .otherwise("application/octet-stream"))
          .withColumn("n_pixels",
            when(col("magic") === "424D",
              leInt(col("payload"), 19) * leInt(col("payload"), 23))
              .otherwise(beInt(col("payload"), 17) * beInt(col("payload"), 21)))
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_files"),
            sum(col("n_pixels")).as("total_pixels"))
          .orderBy(col("format"))
      },
      "SELECT format, COUNT(*)::BIGINT AS n_files, " +
        "SUM(np)::BIGINT AS total_pixels FROM (" +
        "SELECT CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' " +
        "ELSE 'image/png' END AS format, " +
        "CASE WHEN doc_id % 2 = 0 THEN " +
        "(strlen(text) % 24 + 8) * (strlen(text) * 7 % 16 + 5) " +
        "ELSE (strlen(text) % 20 + 9) * (strlen(text) * 5 % 12 + 6) END AS np " +
        "FROM documents) t GROUP BY 1 ORDER BY format"),
  )

  /** Every mm oracle passes through [[mmGuard]] (one definition of the
    * empty-doc rule, applied at registry build like usEvents). Declared
    * AFTER rawDefs — the §7.4 object-init-order rule. */
  val defs: Seq[(String, Q)] =
    rawDefs.map { case (k, q) => k -> Q(q.fn, q.oracle.map(mmGuard)) }
}
