package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.functions.TextFunctions.md5Hash60

/** C4-style duplicated sentence-span removal (Raffel et al. 2020
  * §2.2: "we discarded all but one of any three-sentence span
  * occurring more than once in the data set"): the SENTENCE-granular
  * sibling of the token-window ExactSubstr scrub
  * ([[SubstringDedup.exactSubstringDedup]]) — boilerplate legal
  * notices, cookie banners and syndicated paragraphs repeat as whole
  * sentences, and sentence boundaries are where a scrub can cut
  * without leaving half-words.
  *
  * Keep-first semantics: for every `spanLen`-sentence window whose
  * joined text occurs ≥ 2 times corpus-wide, the lexicographically
  * first (id, position) occurrence survives; every sentence covered by
  * a NON-first occurrence is removed from its document. Detection,
  * first-occurrence choice, coverage and reassembly all mirror the
  * ExactSubstr machinery one level up: spans hash to 60-bit md5 keys
  * (only hashes cross the detection exchange), coverage is the same
  * RANGE-frame window trick, and the reassembly is one id-keyed
  * rebuild.
  *
  * Scale: the exchanges carry (60-bit hash, id, pos) triples and one
  * id-keyed sentence reassembly — sentence text crosses once, exactly
  * like the q208 token scrub.
  */
object SentenceDedup {

  /** Per-document scrub report: (idCol, n_sentences, n_dropped, text)
    * where `text` is the surviving sentences re-joined in order.
    */
  def dropDuplicateSpans(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1: $spanLen")
    val base = graft.sources.Tables.widen(df)
      .select(col(idCol).as("_id"),
        Sentences.segment(col(textCol)).as("_sents"))
    // sentence-span windows, unit-separator-joined (sentences contain
    // spaces; U+001F keeps the window string boundary-unambiguous)
    val windows = when(size(col("_sents")) < spanLen,
      array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(col("_sents")) - lit(spanLen - 1)),
        i => array_join(slice(col("_sents"), i, lit(spanLen)), "\u001F")))
    val occ = base
      .select(col("_id"), posexplode(windows).as(Seq("_pos", "_sp")))
      .select(col("_id"), col("_pos"), md5Hash60(col("_sp")).as("_h"))
    val dup = occ
      .groupBy(col("_h"))
      .agg(count(lit(1)).as("_cnt"),
        min(struct(col("_id").as("d"), col("_pos").as("p"))).as("_first"))
      .filter(col("_cnt") >= 2)
      .select(col("_h"), col("_first.d").as("_fd"), col("_first.p").as("_fp"))
    val marked = occ.join(dup, Seq("_h"))
      .filter(!(col("_id") === col("_fd") && col("_pos") === col("_fp")))
      .select(col("_id"), col("_pos"))
    // coverage: sentence at 0-based index j drops iff a marked span
    // start sits within [j - spanLen + 1, j] — the ExactSubstr
    // RANGE-frame union trick at sentence granularity
    val starts = marked
      .select(col("_id"), col("_pos"),
        lit(null).cast(StringType).as("_s"), lit(1).as("_hit"))
    val sented = base
      .select(col("_id"), posexplode(col("_sents")).as(Seq("_pos", "_s")))
      .withColumn("_hit", lit(0))
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
      .rangeBetween(-(spanLen - 1), 0)
    val covered = sented.unionByName(starts)
      .withColumn("_cov", max(col("_hit")).over(w))
      .filter(col("_s").isNotNull)
    covered
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).cast(IntegerType).as("n_sentences"),
        sum(col("_cov")).cast(IntegerType).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_cov") === 0, struct(col("_pos"), col("_s"))))),
            x => x.getField("_s")), " ").as("text"))
      .withColumnRenamed("_id", idCol)
  }
}
