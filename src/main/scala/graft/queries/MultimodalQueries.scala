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
             |FROM m GROUP BY kind""".stripMargin))
  )
}
