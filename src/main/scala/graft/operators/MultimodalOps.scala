package graft.operators

import org.apache.spark.sql.functions._

/** Multimodal column plumbing (oracle-checkable part): media payloads as
  * opaque binary with typed metadata — byte length, content digest, media
  * type, and deterministic stub-decoded dimensions. The decode itself is
  * stubbed (no image/audio libs in this container — see
  * graft.multimodal.MediaPipeline for the typed binary plumbing + stub
  * decoder, exercised in MultimodalSpec); everything Spark-side (schema,
  * partitioning, batch shape) is real.
  */
object MultimodalOps {

  val ops: Seq[Op] = Seq(
    Op("q_media_inventory",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  sha256(text) AS digest,
        |  CAST(16 * (1 + (doc_id % 16)) AS BIGINT) AS stub_width,
        |  CAST(16 * (1 + ((doc_id // 16) % 16)) AS BIGINT) AS stub_height
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          octet_length(col("text")).cast("bigint").as("byte_len"),
          sha2(col("text"), 256).as("digest"),
          (lit(16) * (lit(1) + col("doc_id") % 16)).cast("bigint").as("stub_width"),
          (lit(16) * (lit(1) + (col("doc_id") / 16).cast("bigint") % 16)).cast("bigint").as("stub_height"))
        .orderBy("doc_id")
    }
  )
}
