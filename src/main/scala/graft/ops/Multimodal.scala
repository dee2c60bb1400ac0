package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / frame-sample stages.
  * The reference decodes JPEGs with OpenCV inside RDD closures
  * (/root/reference/kmeans_clustering/image_classification.py:77-97);
  * this container ships no image codec, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (byte-level features standing in for pixel
  * decode) — but every Spark-side seam is real: binary column schema,
  * typed Dataset batches via mapPartitions, metadata struct, frame
  * slicing, and partition-parallel execution. Swapping the stub for
  * javax.imageio / ffmpeg changes one function.
  *
  * The media table derives from documents (text bytes as payload — pure
  * ASCII, verified, so byte i == ascii(char i) and the stub is
  * oracle-checkable in DuckDB).
  *
  * Scale notes: payloads stay in one binary cell per row — parquet
  * stores them as byte arrays with column pruning, so metadata-only
  * queries never read payload bytes (ReadSchema shows the pruned
  * struct). Decode runs mapPartitions — one JVM-side iterator per
  * parquet row-group, the same batch shape a Pandas-UDF/Arrow pipeline
  * has — embarrassingly parallel, no shuffle.
  */
object Multimodal {

  import Tables._

  final case class MediaRow(media_id: Long, content: Array[Byte], fmt: String)
  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 features: Array[Double])

  /** documents → media table: payload bytes + metadata struct. */
  def media(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("declared_len"),
        lit("text/plain").as("mime")
      ).as("meta"))

  /** STUB decode kernel: real decoders (imageio/ffmpeg) plug in here.
    * Deterministic byte-level "features": first 8 payload bytes. */
  def decodeStub(content: Array[Byte]): Array[Double] =
    content.take(8).map(b => (b & 0xff).toDouble)

  /** Typed batch decode: one iterator per partition (row-group), the
    * batch seam where a vectorized decoder would run. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    media(s, d)
      .select(col("media_id"), col("content"), col("meta.mime").as("fmt"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFeatures(r.media_id, r.content.length.toLong, decodeStub(r.content))
        }
      }
      .toDF()
  }

  val queries: Seq[Q] = Seq(
    // ── metadata-only scan: payload column must be pruned away ─────────
    Q(
      "mm_meta_only",
      (s, d) =>
        media(s, d)
          .select(col("media_id"), col("meta.origin").as("origin"),
            col("meta.declared_len").as("declared_len"))
          .groupBy("origin")
          .agg(count(lit(1)).as("n"), sum(col("declared_len")).as("total_len"))
          .orderBy("origin"),
      Some("""SELECT source AS origin, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS total_len
             |FROM documents GROUP BY 1 ORDER BY origin""".stripMargin)
    ),

    // ── payload integrity: byte length + content hash ──────────────────
    Q(
      "mm_payload_hash",
      (s, d) =>
        media(s, d)
          .select(col("media_id"),
            length(col("content")).as("n_bytes"),
            md5(col("content")).as("payload_md5"))
          .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS payload_md5
             |FROM documents ORDER BY media_id""".stripMargin)
    ),

    // ── batch decode via typed mapPartitions (stub kernel) ─────────────
    // Oracle works because payloads are ASCII: byte i == ascii(char i).
    Q(
      "mm_decode_features",
      (s, d) => decodeFeatures(s, d).orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
             |  list_transform(range(1, least(length(text), 8) + 1),
             |                 i -> CAST(ascii(text[i:i]) AS DOUBLE)) AS features
             |FROM documents ORDER BY media_id""".stripMargin)
    ),

    // ── frame sampling: slice payload into 4 equal frames ──────────────
    // (the video-frame-sample shape: substr on binary is an O(1) slice,
    // no copy of the rest of the payload)
    Q(
      "mm_frame_sample",
      (s, d) => {
        media(s, d)
          .select(col("media_id"),
            explode(array((0 until 4).map(f =>
              struct(lit(f).as("frame"),
                md5(substring(col("content"), f * 100 + 1, 100)).as("frame_md5"))): _*)).as("fr"))
          .select(col("media_id"), col("fr.frame"), col("fr.frame_md5"))
          .orderBy("media_id", "frame")
      },
      Some("""SELECT doc_id AS media_id, f AS frame,
             |  md5(substr(text, f * 100 + 1, 100)) AS frame_md5
             |FROM documents, (SELECT unnest([0, 1, 2, 3]) AS f)
             |ORDER BY media_id, frame""".stripMargin)
    )
  )
}
