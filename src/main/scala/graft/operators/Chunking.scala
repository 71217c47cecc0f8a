package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping fixed-window document chunking — the context-window prep
  * step for retrieval corpora and long-document training: split each
  * document into `chunkSize`-character windows that overlap by
  * `overlap` characters, with stable (doc, chunk index) identity.
  *
  * Windows are CHARACTER-addressed (`substring` semantics, so code
  * points as Spark/ANSI engines count them); token- or
  * sentence-boundary chunking composes on top by mapping boundaries to
  * character offsets first.
  */
object Chunking {

  /** One row per chunk: all input columns + `chunk_id` (0-based index
    * within the document) + `chunk` (the window's text). A non-null
    * document always yields at least one chunk (the empty string
    * chunks to one empty chunk — a document must not vanish just
    * because it is short); null text yields none.
    *
    * Chunk starts step by `chunkSize - overlap`; the last chunk is
    * whatever remains past its start (shorter than `chunkSize`, never
    * empty unless the document is). The chunk count is
    * `max(1, ceil((len - overlap) / step))` computed in exact integer
    * arithmetic (`floor((len - overlap + step - 1) / step)` — doubles
    * are exact here, lengths are far below 2^53).
    *
    * Scale shape: a pure narrow transformation — `explode(sequence(...))`
    * inside whole-stage codegen, zero exchanges, no state. Chunk
    * amplification is len/step per document; the planner sees it and
    * AQE re-sizes downstream partitions.
    */
  def chunkText(df: DataFrame, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"bad chunkSize $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap $overlap must be in [0, chunkSize)")
    val step = chunkSize - overlap
    val len = length(col(textCol))
    val nChunks = greatest(lit(1L),
      floor((len.cast("double") - overlap + step - 1) / step).cast("long"))
    df.filter(col(textCol).isNotNull)
      .withColumn("chunk_id",
        explode(sequence(lit(0L), nChunks - 1)))
      .withColumn("chunk",
        col(textCol).substr(
          (col("chunk_id") * step + 1).cast("int"), lit(chunkSize)))
  }
}
