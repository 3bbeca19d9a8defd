package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath
import graft.multimodal.Multimodal

/** Multimodal decode plumbing, oracle-checked: the engine runs the real
  * binary-payload → mapPartitions-batched-decode path (Multimodal), and
  * the DuckDB oracle recomputes the stub features arithmetically from the
  * same source text (payloads are ASCII here, so byte values == char
  * codes).
  */
object MultimodalQueries extends QueryModule {

  /** 16×16 grayscale media built from each document's CODE POINTS (low
    * byte), tiled to 256 pixels — the shared fixture of every real-
    * decode image row, wrapped in the caller's choice of container
    * (code points, not UTF-16 units: the oracle's text[i]/length(text)
    * index code points, so charAt/String.length would shift every index
    * the moment a non-BMP char appears). */
  private def tiledImageMedia(
      s: org.apache.spark.sql.SparkSession, dir: String,
      encode: (Int, Int, Array[Int]) => Array[Byte]) = {
    import s.implicits._
    s.read.parquet(tablePath(dir, "documents"))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val cps = text.codePoints().toArray
        val px = Array.tabulate(256) { k =>
          if (cps.isEmpty) 0 else cps(k % cps.length) % 256
        }
        Multimodal.MediaRecord(id, "image", encode(16, 16, px),
          Multimodal.MediaMeta("documents", "image"))
      }(Multimodal.recEnc)
  }

  /** One arithmetic replay of the decoded-pixel average-hash near-dup —
    * shared VERBATIM by the BMP and PPM rows: the oracle cannot parse
    * either container (the point), and a container-dependent result
    * would fail one of the two gates. */
  private val rasterAhashOracle: String =
    """WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
      |px AS (SELECT doc_id,
      |    [CASE WHEN n = 0 THEN 0 ELSE unicode(text[(k % n) + 1]) % 256 END
      |     for k in range(0, 256)] AS p
      |  FROM b),
      |st AS (SELECT doc_id, p, list_sum(p) AS total FROM px),
      |ph AS (SELECT doc_id,
      |    list_sum([CASE WHEN coalesce(list_sum(p[(i*256//32)+1:((i+1)*256//32)]), 0) * 256 > total * 8
      |              THEN (1::BIGINT << i) ELSE 0 END for i in range(0, 32)]) AS ph
      |  FROM st)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
      |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.ph, b.ph)) <= 2""".stripMargin

  override def queries: Seq[EngineQuery] = Seq(

    EngineQuery(
      "mm_features",
      (s, dir) =>
        Multimodal.decode(
          Multimodal.mediaFromDocuments(s, tablePath(dir, "documents"))).toDF(),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |    CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS checksum
             |  FROM documents)
             |SELECT media_id, kind, byte_len, checksum,
             |  CAST(64 + checksum % 577 AS INT) AS width,
             |  CAST(64 + checksum % 433 AS INT) AS height,
             |  CAST(CASE WHEN kind = 'video' THEN 1 + checksum % 97 ELSE 1 END AS INT) AS n_frames,
             |  CAST(CASE WHEN kind = 'audio' THEN 1000 + (checksum * 7) % 59999 ELSE 0 END AS BIGINT) AS duration_ms
             |FROM m""".stripMargin)),

    // Resize stage: batched partition-local resampling kernel (stride
    // arithmetic stands in for the scaler; the Spark shape is the point).
    EngineQuery(
      "mm_resize",
      (s, dir) =>
        Multimodal.resize(
          Multimodal.mediaFromDocuments(s, tablePath(dir, "documents")), 256).toDF(),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             |    text, CAST(octet_length(encode(text)) AS BIGINT) AS len
             |  FROM documents)
             |SELECT media_id, kind,
             |  CAST(len(range(1, CAST(len AS INT) + 1, CAST(greatest(1, len // 256) AS INT))) AS BIGINT) AS rs_len,
             |  CAST(list_sum([unicode(text[i]) for i in range(1, CAST(len AS INT) + 1, CAST(greatest(1, len // 256) AS INT))]) AS BIGINT) AS rs_checksum
             |FROM m""".stripMargin)),

    // Frame sampling: every 7th frame of each video with a per-frame
    // fingerprint (codegen'd sequence + explode — one narrow stage).
    EngineQuery(
      "mm_frame_sample",
      (s, dir) =>
        Multimodal.sampleFrames(
          Multimodal.decode(
            Multimodal.mediaFromDocuments(s, tablePath(dir, "documents"))), 7),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             |    CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS checksum
             |  FROM documents),
             |v AS (SELECT media_id, CAST(1 + checksum % 97 AS INT) AS n_frames, checksum
             |  FROM m WHERE kind = 'video')
             |SELECT media_id, n_frames,
             |  CAST(unnest(range(0, n_frames, 7)) AS INT) AS frame_idx,
             |  CAST((checksum * 31 + unnest(range(0, n_frames, 7))) % 1000003 AS BIGINT) AS frame_hash
             |FROM v""".stripMargin)),

    EngineQuery(
      "mm_kind_rollup",
      (s, dir) =>
        Multimodal.decode(
          Multimodal.mediaFromDocuments(s, tablePath(dir, "documents"))).toDF()
          .groupBy("kind")
          .agg(
            count(lit(1)).as("n"),
            sum("byte_len").as("total_bytes"),
            max("width").as("max_width"),
            min("height").as("min_height")),
      Some("""WITH m AS (SELECT doc_id AS media_id,
             |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |    CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS checksum
             |  FROM documents)
             |SELECT kind, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
             |  CAST(max(64 + checksum % 577) AS INT) AS max_width,
             |  CAST(min(64 + checksum % 433) AS INT) AS min_height
             |FROM m GROUP BY kind""".stripMargin)),

    // Perceptual-hash near-dup over media payloads: a 32-segment
    // average-hash (bit i = segment i's byte mass above the payload
    // mean — the aHash structure; a real image pipeline computes the
    // same bits from DCT coefficients of the decoded thumbnail, and
    // ONLY the bit-derivation inside the decoder seam would change),
    // then candidate pairs via the SAME banded Hamming machinery the
    // text path uses (Dedup.simhashPairs: maxH+1 disjoint bit bands,
    // exact by pigeonhole — band-bucket shuffle, never all-pairs).
    // Byte-identical payloads hash identically (hamming 0); near-dup
    // payloads land within the ≤2 threshold.
    EngineQuery(
      "mm_phash_neardup",
      (s, dir) => {
        val ph = s.read.parquet(tablePath(dir, "documents"))
          .selectExpr("doc_id",
            "transform(filter(split(text, ''), c -> c != ''), c -> CAST(ascii(c) AS BIGINT)) AS bytes")
          .selectExpr("doc_id", "bytes",
            "CAST(size(bytes) AS INT) AS n",
            "aggregate(bytes, 0L, (a, x) -> a + x) AS total")
          .selectExpr("doc_id",
            """aggregate(
              |  transform(sequence(0, 31), i ->
              |    IF(aggregate(slice(bytes, i * n div 32 + 1,
              |           (i + 1) * n div 32 - i * n div 32), 0L, (a, x) -> a + x) * 32 > total,
              |       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
              |  CAST(0 AS BIGINT), (a, x) -> a + x) AS simhash""".stripMargin)
        graft.dedup.Dedup.simhashPairs(s, ph, 2)
      },
      Some("""WITH b AS (SELECT doc_id,
             |    list_transform(string_split(text, ''), c -> unicode(c)) AS bytes
             |  FROM documents),
             |st AS (SELECT doc_id, bytes, len(bytes) AS n, list_sum(bytes) AS total FROM b),
             |ph AS (SELECT doc_id,
             |    list_sum([CASE WHEN coalesce(list_sum(bytes[(i*n//32)+1:((i+1)*n//32)]), 0) * 32 > total
             |              THEN (1::BIGINT << i) ELSE 0 END for i in range(0, 32)]) AS ph
             |  FROM st)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
             |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.ph, b.ph)) <= 2""".stripMargin)),

    // REAL-decode pHash near-dup (r12 directive 5, the WAV pattern
    // promoted to an image format): payloads are actual 16x16 24bpp BMP
    // containers built from each document's bytes, the engine runs the
    // full parse (header walk, bottom-up rows, 4-byte row padding, luma)
    // and average-hashes the DECODED pixels — then the same banded
    // Hamming pair machinery as mm_phash_neardup. The oracle replays
    // the pixel tiling + hash arithmetically from the text (it cannot
    // parse BMP — which is the point: the engine's container decode
    // must be invisible in the result).
    EngineQuery(
      "mm_phash_bmp_neardup",
      (s, dir) => {
        val media = tiledImageMedia(s, dir, Multimodal.Bmp.encodeGray(_, _, _))
        val ph = Multimodal.phashBmp(media).toDF()
          .withColumnRenamed("media_id", "doc_id")
        graft.dedup.Dedup.simhashPairs(s, ph, 2)
      },
      Some(rasterAhashOracle)),

    // The SAME pixels through the SECOND real container (r13 next-round
    // 8): binary PPM (P6) payloads — ASCII header, raw top-down RGB
    // triplets, no row padding, no bottom-up flip — parsed end-to-end by
    // the engine's own Ppm kernel through the magic-sniffing decode
    // dispatch (Multimodal.decodeRaster), then the identical average-
    // hash + banded pair machinery. Gated against the VERBATIM same
    // oracle as the BMP row: container choice must be invisible in the
    // result, which is the whole claim of a decode seam.
    EngineQuery(
      "mm_phash_ppm_neardup",
      (s, dir) => {
        val media = tiledImageMedia(s, dir, Multimodal.Ppm.encodeGray(_, _, _))
        val ph = Multimodal.phashRaster(media).toDF()
          .withColumnRenamed("media_id", "doc_id")
        graft.dedup.Dedup.simhashPairs(s, ph, 2)
      },
      Some(rasterAhashOracle)),

    // pHash PROPER over the decoded pixels (r13 next-round 8): 2D DCT-II
    // of the 16×16 luma, hash = the 63 low-frequency AC coefficients
    // (8×8 block minus DC) thresholded at their median. The whole
    // transform is integer-exact on both sides — fixed-point cosine
    // basis round(cos((2x+1)uπ/32)·2^14) derived from the same closed
    // form in both engines (every entry except u=0 is irrational before
    // rounding, so no half-way boundary exists for libm-vs-JVM cos to
    // straddle), Long multiply-adds, median = 32nd-smallest of 63 exact
    // integers — so the gate pins every BIT of the hash, not a
    // tolerance. The oracle replays the DCT relationally (pixel rows ×
    // basis table join-aggregate); the engine decodes the real BMP
    // container first.
    EngineQuery(
      "mm_dct_phash",
      (s, dir) => {
        val media = tiledImageMedia(s, dir, Multimodal.Bmp.encodeGray(_, _, _))
        Multimodal.dctPhash(media).toDF()
          .withColumnRenamed("media_id", "doc_id")
          .withColumnRenamed("simhash", "dct_hash")
      },
      Some("""WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
             |px AS (SELECT doc_id,
             |    [CASE WHEN n = 0 THEN 0 ELSE unicode(text[(k % n) + 1]) % 256 END
             |     for k in range(0, 256)] AS p
             |  FROM b),
             |ctab AS (SELECT u.u AS u, x.x AS x,
             |    CAST(round(cos((2*x.x+1)*u.u*pi()/32) * 16384) AS BIGINT) AS c
             |  FROM range(0,8) u(u), range(0,16) x(x)),
             |pr AS (SELECT doc_id, x.x AS x, y.y AS y,
             |    CAST(p[y.y*16 + x.x + 1] AS BIGINT) AS v
             |  FROM px, range(0,16) x(x), range(0,16) y(y)),
             |co AS (SELECT pr.doc_id, cu.u AS u, cv.u AS v,
             |    CAST(sum(pr.v * cu.c * cv.c) AS BIGINT) AS coeff
             |  FROM pr JOIN ctab cu ON cu.x = pr.x JOIN ctab cv ON cv.x = pr.y
             |  GROUP BY 1, 2, 3),
             |lf AS (SELECT doc_id, v*8 + u AS k, coeff FROM co
             |  WHERE NOT (u = 0 AND v = 0)),
             |med AS (SELECT doc_id, coeff AS m FROM (
             |    SELECT doc_id, coeff,
             |      row_number() OVER (PARTITION BY doc_id ORDER BY coeff) AS rn
             |    FROM lf) WHERE rn = 32)
             |SELECT lf.doc_id,
             |  CAST(sum(CASE WHEN lf.coeff > med.m
             |    THEN (1::BIGINT << CAST(lf.k - 1 AS INT)) ELSE 0 END) AS BIGINT) AS dct_hash
             |FROM lf JOIN med ON med.doc_id = lf.doc_id
             |GROUP BY 1""".stripMargin)),

    // Voice-activity detection over the audio payloads: 32-byte frames
    // score Σ unsigned bytes, voiced = frame mean > clip mean by integer
    // cross-multiplication, plus the longest voiced RUN (the segment-
    // extraction signal). Batched partition-local kernel, no shuffle;
    // the oracle replays frames, verdicts and the run structure via the
    // gaps-and-islands window over per-frame rows.
    EngineQuery(
      "mm_vad_runs",
      (s, dir) =>
        graft.multimodal.Multimodal.voiceActivity(
          graft.multimodal.Multimodal.mediaFromDocuments(
            s, graft.SparkSessions.tablePath(dir, "documents"))).toDF(),
      Some("""WITH m AS (SELECT doc_id AS media_id, text,
             |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
             |    CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS tot
             |  FROM documents
             |  WHERE doc_id % 3 = 1 AND octet_length(encode(text)) > 0),
             |fr AS (SELECT media_id, len, tot, CAST(u.i AS BIGINT) AS i,
             |    CAST(least((u.i + 1) * 32, len) - u.i * 32 AS BIGINT) AS flen,
             |    CAST(list_sum([unicode(text[j]) for j in
             |      range(CAST(u.i * 32 + 1 AS INT), CAST(least((u.i + 1) * 32, len) + 1 AS INT))]) AS BIGINT) AS energy
             |  FROM m, unnest(range(0, CAST((len + 31) // 32 AS INT))) AS u(i)),
             |v AS (SELECT media_id, i,
             |    CASE WHEN energy * len > tot * flen THEN 1 ELSE 0 END AS voiced
             |  FROM fr),
             |isl AS (SELECT media_id, voiced,
             |    i - row_number() OVER (PARTITION BY media_id, voiced ORDER BY i) AS grp
             |  FROM v),
             |runs AS (SELECT media_id, count(*) AS run
             |  FROM isl WHERE voiced = 1 GROUP BY media_id, grp)
             |SELECT v.media_id, CAST(count(*) AS BIGINT) AS n_frames,
             |  CAST(sum(voiced) AS BIGINT) AS n_voiced,
             |  CAST(coalesce((SELECT max(run) FROM runs r
             |    WHERE r.media_id = v.media_id), 0) AS BIGINT) AS max_run
             |FROM v GROUP BY v.media_id""".stripMargin))
  )
}
