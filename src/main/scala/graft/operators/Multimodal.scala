package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns as opaque binaries with typed
  * metadata (BASELINE.json north star; SURVEY.md §2.1 S8 / §2.4 C13).
  *
  * The Spark-side plumbing — schema, partition-local batched decode,
  * output batch shape — is real and tested. The actual media decode is
  * a STUB (`fakeDecode`): the container ships no image/audio libraries,
  * so the decoder produces a deterministic feature vector from the
  * bytes. Swapping in a real decoder (e.g. via JNI/javacv on a cluster)
  * changes ONE function, not the dataflow.
  */
object Multimodal {

  /** Canonical media-table schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType))), nullable = true)))

  /** Build a media frame from a documents-like table: payload = UTF-8
    * bytes of the text (a deterministic stand-in for real media bytes),
    * metadata derived from content length. Test/bench scaffolding.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (length(col("text")) % 1920).cast(IntegerType).as("width"),
        (length(col("text")) % 1080).cast(IntegerType).as("height"),
        lit("fake/raw").as("format")).as("meta"))

  /** Cheap native byte-level stats (no decode): size + content hash.
    * At 100 TB this is the first pass — dedup/triage on hashes before
    * any expensive decode.
    */
  def withByteStats(df: DataFrame, binCol: String = "content"): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("content_hash", xxhash64(col(binCol)))

  // ---------------------------------------------------------------
  // STUB decoder — deterministic fake features from bytes.
  // A real deployment replaces this one function with an actual
  // image/audio decode (the dataflow around it is unchanged).
  // ---------------------------------------------------------------
  private[operators] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic rolling hash over bytes
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(math.floorMod(i, dim)) += (math.floorMod(h, 255L) / 255.0f - 0.5f)
      i += 1
    }
    out
  }

  /** Partition-local batched feature extraction over the binary column
    * (the Scala analogue of a `mapInPandas` decode): rows are processed
    * in batches of `batchSize` per partition — the shape a real
    * GPU/native decoder wants — and the output carries a fixed-size
    * `features: array<float>` column.
    *
    * Scale: decode parallelism = partitions; batching amortizes decoder
    * setup; the binary payload never crosses a shuffle.
    */
  def extractFeatures(df: DataFrame, binCol: String = "content",
      dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would run vectorized
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          Row.fromSeq(r.toSeq :+ fakeDecode(bytes, dim).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** "Frame sampling": take `n` evenly-spaced fixed-width byte windows
    * from the payload (stand-in for video frame extraction) — native
    * `substring` on binary, no decode, fully codegen'd.
    */
  def sampleFrames(df: DataFrame, binCol: String = "content",
      n: Int = 4, frameBytes: Int = 32): DataFrame = {
    val total = length(col(binCol))
    val step = greatest((total - lit(frameBytes)) / lit(math.max(n - 1, 1)), lit(1))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(col(binCol), (i * step + 1).cast(IntegerType), lit(frameBytes))))
  }

  /** "Resize": truncate/pad the payload to a target byte budget
    * (stand-in for image resize; real impl swaps the expression for a
    * decode→resize→encode in [[extractFeatures]]'s batch loop).
    */
  def resizeStub(df: DataFrame, binCol: String = "content", targetBytes: Int = 256): DataFrame =
    df.withColumn("content_resized", substring(col(binCol), 1, targetBytes))

  /** C13: binary → binary transform (the reference draws a text overlay
    * on a PNG tile, `openweatherbasicmap.py:36-83`). STUB: prepends a
    * deterministic tag to the payload — the dataflow shape (binary in,
    * binary out, per-row, codegen-able concat) is the real thing; a real
    * decoder+drawer slots into [[extractFeatures]]'s batch loop instead.
    */
  def overlayStub(df: DataFrame, binCol: String = "content", tag: String = "OVERLAY:"): DataFrame =
    df.withColumn("content_overlaid",
      concat(encode(lit(tag), "UTF-8"), col(binCol)))
}
