package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata alongside (SURVEY.md §1.4 chunk-as-row schema). The
  * real pipeline decodes with per-partition batch UDFs
  * (graft.imaging.* handles true image bytes); these queries validate
  * the DataFrame-level plumbing — binary casting, digests, byte-level
  * feature extraction — against the oracle.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Binary column metadata: byte length + content digest. The digest
    * is computed on the raw bytes, exactly what a media dedup pass
    * would key on. */
  val qMmMeta: Q = (s, d) => {
    Tables.documents(s, d).where(col("doc_id") % 20 === 0)
      .withColumn("bin", col("text").cast("binary"))
      .select(col("doc_id"),
        length(col("bin")).as("n_bytes"),
        md5(col("bin")).as("digest"),
        substring(md5(col("bin")), 1, 8).as("digest8"))
      .orderBy("doc_id")
  }

  /** Deterministic fake "decode": treat the first 32 bytes as pixels,
    * extract mean/max/min intensity — the schema and batch shape a real
    * image decode UDF produces (width, height, stats), with the codec
    * stubbed by byte-value semantics. */
  val qMmPixels: Q = (s, d) => {
    val px = col("px")
    Tables.documents(s, d).where(col("doc_id") % 20 === 0)
      .withColumn("px", transform(sequence(lit(1), lit(32)),
        i => ascii(col("text").substr(i, lit(1)))))
      .select(col("doc_id"),
        col("n_chars").as("width"),
        lit(1).as("height"),
        round(aggregate(px, lit(0L), (acc, v) => acc + v).cast("double") / 32.0, 6)
          .as("mean_px"),
        array_max(px).as("max_px"),
        array_min(px).as("min_px"))
      .orderBy("doc_id")
  }

  def queries: Map[String, Q] = Map(
    "q_mm_meta" -> qMmMeta,
    "q_mm_pixels" -> qMmPixels
  )

  def oracleSql: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest, substr(md5(text), 1, 8) AS digest8
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,
    "q_mm_pixels" ->
      """WITH px AS (SELECT doc_id, n_chars,
        |    list_transform(range(1, 33), i -> ascii(substr(text, CAST(i AS INT), 1))) AS p
        |  FROM documents WHERE doc_id % 20 = 0)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS width, 1 AS height,
        |  round(CAST(list_sum(p) AS DOUBLE) / 32.0, 6) AS mean_px,
        |  CAST(list_max(p) AS INT) AS max_px, CAST(list_min(p) AS INT) AS min_px
        |FROM px ORDER BY doc_id""".stripMargin
  )
}
