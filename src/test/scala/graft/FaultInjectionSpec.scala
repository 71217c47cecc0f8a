package graft

import org.apache.spark.sql.functions._

import graft.sinks.{FaultInjection, Pruning, Writers}
import graft.sources.Tables

/** Crash-consistency proofs for every multi-step writer: a simulated
  * crash at EACH step boundary (lock → staging write → retire rename →
  * publish rename; index data append → freshness bump) must leave a
  * reader seeing the old artifact, the new artifact, or — in the one
  * documented between-renames instant — a clean absence with full
  * copies preserved at the `.tmp`/`.bak` paths. Never a torn artifact.
  */
class FaultInjectionSpec extends SparkSpec {

  private final case class InjectedCrash(label: String)
    extends RuntimeException(s"injected crash at $label")

  /** Run `body` with a crash injected at `label`; assert it fired and
    * propagated (a swallowed crash would fake durability). */
  private def crashAt(label: String)(body: => Unit): Unit = {
    var fired = false
    FaultInjection.hook =
      l => if (l == label) { fired = true; throw InjectedCrash(label) }
    try {
      val e = intercept[Exception](body)
      def injected(t: Throwable): Boolean =
        t != null && (t.isInstanceOf[InjectedCrash] || injected(t.getCause))
      assert(injected(e), s"expected the injected crash, got $e")
      assert(fired, s"fault point $label never reached")
    } finally FaultInjection.hook = _ => ()
  }

  /** The dot-prefixed staging/backup siblings of `dir` (the copies a
    * crashed swap leaves behind — hidden from Spark's file listing by
    * the leading dot, see Writers.swapPaths). */
  private def siblings(dir: String, infix: String): Seq[java.io.File] = {
    val f = new java.io.File(dir)
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith("." + f.getName + infix)).toSeq
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-fi-$tag").toString

  // ---------------- upsertInventory ----------------

  test("upsertInventory: crash at every step leaves old, new, or recoverable-absent") {
    import java.sql.{Date, Timestamp}
    val d1 = Date.valueOf("2024-01-01"); val d2 = Date.valueOf("2024-01-02")
    val ts = new Timestamp(0L)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("available_date").cast("string"), col("record_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def fresh(): String = {
      val p = tmpDir("inv") + "/inv"
      Writers.upsertInventory(spark, p, d1, "t", 10L, ts)
      p
    }
    // before any rename: live catalog is the complete OLD artifact and
    // (the lock having been released by the crashed run's finally) a
    // plain retry lands the upsert
    for (label <- Seq("upsertInventory:locked", "upsertInventory:staged")) {
      val p = fresh()
      crashAt(label) { Writers.upsertInventory(spark, p, d2, "t", 20L, ts) }
      assert(rows(p) == Map("2024-01-01" -> 10L), label)
      Writers.upsertInventory(spark, p, d2, "t", 20L, ts)
      assert(rows(p) == Map("2024-01-01" -> 10L, "2024-01-02" -> 20L), label)
    }
    // between the renames: live path ABSENT (the documented recovery
    // state) with the old catalog complete at .bak and the new one
    // complete at .tmp; restoring the .bak recovers, and a retry lands
    locally {
      val p = fresh()
      crashAt("upsertInventory:retired") {
        Writers.upsertInventory(spark, p, d2, "t", 20L, ts)
      }
      assert(!new java.io.File(p).exists())
      val bak = siblings(p, ".bak-"); val tmp = siblings(p, ".tmp-")
      assert(bak.size == 1 && tmp.size == 1)
      assert(rows(bak.head.toString) == Map("2024-01-01" -> 10L))
      assert(rows(tmp.head.toString) ==
        Map("2024-01-01" -> 10L, "2024-01-02" -> 20L))
      assert(bak.head.renameTo(new java.io.File(p)))
      Writers.upsertInventory(spark, p, d2, "t", 20L, ts)
      assert(rows(p) == Map("2024-01-01" -> 10L, "2024-01-02" -> 20L))
    }
    // after the publish rename: live catalog is the complete NEW
    // artifact (only the redundant .bak delete was lost)
    locally {
      val p = fresh()
      crashAt("upsertInventory:published") {
        Writers.upsertInventory(spark, p, d2, "t", 20L, ts)
      }
      assert(rows(p) == Map("2024-01-01" -> 10L, "2024-01-02" -> 20L))
    }
  }

  // ---------------- compactParquet ----------------

  test("compactParquet: crash at every step preserves the full row set") {
    import spark.implicits._
    val all = (1L to 300L).toSet
    def fresh(): String = {
      val p = tmpDir("cmp") + "/t"
      (1L to 300L).toDF("k").repartition(6).write.parquet(p)
      p
    }
    def rows(p: String) =
      spark.read.parquet(p).collect().map(_.getLong(0)).toSet
    for (label <- Seq("compactParquet:locked", "compactParquet:staged")) {
      val p = fresh()
      crashAt(label) { Writers.compactParquet(spark, p) }
      assert(rows(p) == all, label) // old layout, complete
      assert(Writers.compactParquet(spark, p) == 1) // retry compacts
      assert(rows(p) == all, label)
    }
    locally {
      val p = fresh()
      crashAt("compactParquet:retired") { Writers.compactParquet(spark, p) }
      assert(!new java.io.File(p).exists())
      val bak = siblings(p, ".bak-"); val tmp = siblings(p, ".tmp-")
      assert(bak.size == 1 && tmp.size == 1)
      assert(rows(bak.head.toString) == all) // old complete
      assert(rows(tmp.head.toString) == all) // new complete
      assert(bak.head.renameTo(new java.io.File(p)))
      assert(rows(p) == all)
    }
    locally {
      val p = fresh()
      crashAt("compactParquet:published") { Writers.compactParquet(spark, p) }
      assert(rows(p) == all) // new layout live, complete
    }
  }

  // ---------------- deleteKeysPruned (per-leaf rewrite) ----------------

  test("deleteKeysPruned: crash at every leaf-rewrite step never tears the leaf") {
    import spark.implicits._
    def fresh(): String = {
      val p = tmpDir("del") + "/t"
      (1L to 400L).map(i => (i, (i % 4).toInt)).toDF("k", "p")
        .write.partitionBy("p").parquet(p)
      Pruning.writeManifest(spark, p, "p",
        zoneCols = Seq("k"), bloomCols = Seq("k"),
        numBits = 2048, numHashes = 4)
      p
    }
    val all = (1L to 400L).toSet
    def rows(p: String) = spark.read.parquet(p)
      .select("k").collect().map(_.getLong(0)).toSet
    // keys 8 and 16 both live in partition p=0 only
    for (label <- Seq("deleteKeysPruned:locked", "deleteKeysPruned:staged")) {
      val p = fresh()
      crashAt(label) { Writers.deleteKeysPruned(spark, p, "p", "k", Seq(8L, 16L)) }
      assert(rows(p) == all, label) // nothing deleted yet, nothing torn
      Writers.deleteKeysPruned(spark, p, "p", "k", Seq(8L, 16L)) // retry
      assert(rows(p) == all -- Set(8L, 16L), label)
    }
    locally {
      val p = fresh()
      crashAt("deleteKeysPruned:retired") {
        Writers.deleteKeysPruned(spark, p, "p", "k", Seq(8L, 16L))
      }
      val leaf = s"$p/p=0"
      assert(!new java.io.File(leaf).exists()) // documented recovery state
      val bak = siblings(leaf, ".bak-"); val tmp = siblings(leaf, ".tmp-")
      assert(bak.size == 1 && tmp.size == 1)
      // the staging/backup dirs sit INSIDE the table root, so the
      // crashed state is ALSO what a concurrent reader sees mid-swap:
      // partition discovery must skip the dot-prefixed copies — no
      // duplicated leaf, no resurrected erased keys (un-hidden names
      // showed the reader all 400 rows here, deleted keys included)
      assert(rows(p) == all.filter(_ % 4 != 0))
      // old leaf complete at .bak, survivors complete at .tmp
      def leafRows(f: java.io.File) = spark.read.parquet(f.toString)
        .select("k").collect().map(_.getLong(0)).toSet
      assert(leafRows(bak.head) == all.filter(_ % 4 == 0))
      assert(leafRows(tmp.head) == all.filter(_ % 4 == 0) -- Set(8L, 16L))
      assert(bak.head.renameTo(new java.io.File(leaf)))
      assert(rows(p) == all)
      Writers.deleteKeysPruned(spark, p, "p", "k", Seq(8L, 16L))
      assert(rows(p) == all -- Set(8L, 16L))
    }
    locally {
      val p = fresh()
      crashAt("deleteKeysPruned:published") {
        Writers.deleteKeysPruned(spark, p, "p", "k", Seq(8L, 16L))
      }
      assert(rows(p) == all -- Set(8L, 16L)) // delete landed, complete
    }
  }

  // ---------------- index_meta replace (all three index kinds) ----------------

  test("writeIndexMeta: a crashed bump leaves old, new, or lenient-absent — never torn") {
    def fresh(): String = {
      val p = tmpDir("meta") + "/idx"
      Pruning.writeIndexMeta(spark, p,
        Pruning.IndexMeta("ivf", "centroid_id",
          Map("nlist" -> 4L, "n_vectors" -> 10L)))
      p
    }
    def nVectors(p: String): Option[Long] =
      Pruning.readIndexMeta(spark, p).map(_.params("n_vectors"))
    locally { // before the swap: old record intact, retry lands the bump
      val p = fresh()
      crashAt("writeIndexMeta:staged") {
        Pruning.bumpIndexMeta(spark, p, Map("n_vectors" -> 5L))
      }
      assert(nVectors(p).contains(10L))
      Pruning.bumpIndexMeta(spark, p, Map("n_vectors" -> 5L))
      assert(nVectors(p).contains(15L))
    }
    locally { // between renames: readers turn LENIENT (None), both
      // copies complete on disk — the old overwrite would have shown
      // readers a half-deleted directory here
      val p = fresh()
      crashAt("writeIndexMeta:retired") {
        Pruning.bumpIndexMeta(spark, p, Map("n_vectors" -> 5L))
      }
      assert(nVectors(p).isEmpty) // absent reads as lenient, not torn
      val meta = s"$p/_graft_manifest/index_meta"
      val bak = siblings(meta, ".bak-"); val tmp = siblings(meta, ".tmp-")
      assert(bak.size == 1 && tmp.size == 1)
      assert(bak.head.renameTo(new java.io.File(meta)))
      assert(nVectors(p).contains(10L)) // recovered old record
    }
    locally { // after the publish: new record live
      val p = fresh()
      crashAt("writeIndexMeta:published") {
        Pruning.bumpIndexMeta(spark, p, Map("n_vectors" -> 5L))
      }
      assert(nVectors(p).contains(15L))
    }
  }

  // ---------------- IVF append / bump pair ----------------

  test("appendToIvfIndex: crash between data append and bump keeps probes exact") {
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val oneShot = tmpDir("ivf1") + "/idx"
    val crashed = tmpDir("ivf2") + "/idx"
    // batch 0 holds every id < 20 => identical centroid sample, so the
    // crashed-append index must be INDISTINGUISHABLE from a one-shot
    // build on the full corpus (the SimilaritySpec equivalence)
    val b0 = corpus.where(col("vec_id") < 20 || col("vec_id") % 3 === 0)
    val b1 = corpus.where(col("vec_id") >= 20 && col("vec_id") % 3 === 1)
    val b2 = corpus.where(col("vec_id") >= 20 && col("vec_id") % 3 === 2)
    Similarity.writeIvfIndex(
      b0.unionByName(b1).unionByName(b2), oneShot,
      "vec_id", "embedding", nlist = 16)
    Similarity.writeIvfIndex(b0, crashed, "vec_id", "embedding", nlist = 16)
    val before = Pruning.readIndexMeta(spark, crashed).get.params("n_vectors")
    crashAt("appendToIvfIndex:appended") {
      Similarity.appendToIvfIndex(spark, crashed, b1, "vec_id", "embedding")
    }
    // counter UNDERSTATES (the benign documented mode): b1's bump died
    assert(Pruning.readIndexMeta(spark, crashed).get.params("n_vectors")
      == before)
    // index writes stay open after the crash: b2 appends normally
    Similarity.appendToIvfIndex(spark, crashed, b2, "vec_id", "embedding")
    // probes never gate on the counter — search answers are identical
    // to the one-shot build, b1's vectors included
    val q = corpus.filter(col("vec_id") < 8)
    def search(p: String) = Similarity.ivfTopKFromIndex(spark, p, q,
        "vec_id", "embedding", k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(search(crashed) == search(oneShot))
    // the counter only ever understates, never overstates
    assert(Pruning.readIndexMeta(spark, crashed).get.params("n_vectors")
      == before + b2.count())
  }

  // ---------------- positional-index append / bump pair ----------------

  test("appendToPositionalIndex: crash between data append and bump keeps probes exact") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val oneShot = tmpDir("pos1") + "/idx"
    val crashed = tmpDir("pos2") + "/idx"
    val phrase = Seq("a", "key", "column")
    Phrase.writePositionalIndex(docs, "doc_id", "text", oneShot)
    Phrase.writePositionalIndex(even, "doc_id", "text", crashed)
    val before = Pruning.readIndexMeta(spark, crashed).get.params("n_docs")
    assert(before == even.count())
    crashAt("appendToPositionalIndex:appended") {
      Phrase.appendToPositionalIndex(odd, "doc_id", "text", crashed)
    }
    // counter UNDERSTATES (the benign documented mode): odd's bump died
    assert(Pruning.readIndexMeta(spark, crashed).get.params("n_docs")
      == before)
    // probes never gate on the counter — the appended postings are
    // live, so the phrase report equals a one-shot full-corpus build
    def report(p: String) = Phrase.phraseMatchesFromIndex(
        spark, p, "doc_id", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(report(crashed) == report(oneShot))
    assert(report(crashed).nonEmpty, "fixture phrase must match")
    // a retried bump lands (bumpIndexMeta rides the rename swap), and
    // the parameter handshake survived the crash window
    Pruning.bumpIndexMeta(spark, crashed, Map("n_docs" -> odd.count()))
    assert(Pruning.readIndexMeta(spark, crashed).get.params("n_docs")
      == before + odd.count())
    intercept[IllegalArgumentException] {
      Phrase.appendToPositionalIndex(odd, "doc_id", "text", crashed,
        nBuckets = 16)
    }
  }

  test("appendToPositionalIndex: crash mid meta swap leaves probes on the lenient fallback") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 120)
    val p = tmpDir("pos3") + "/idx"
    Phrase.writePositionalIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", p)
    val expect = Phrase.phraseMatches(docs, "doc_id", "text",
        Seq("a", "key", "column"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // crash BETWEEN the meta renames (retire done, publish pending):
    // live meta path absent — the documented recovery state
    crashAt("writeIndexMeta:retired") {
      Phrase.appendToPositionalIndex(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", p)
    }
    // the postings themselves landed before the meta swap, and probes
    // tolerate the absent-meta window (the pre-manifest legacy
    // fallback), answering from the full appended data
    val got = Phrase.phraseMatchesFromIndex(spark, p, "doc_id",
        Seq("a", "key", "column"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  // ---------------- span-hash-index append / bump pair ----------------

  test("appendToSpanIndex: crash between data append and bump keeps probes exact") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def mk(rows: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, t) =>
            org.apache.spark.sql.Row(i, t) }).asJava), schema)
    val p = tmpDir("spanix") + "/idx"
    SentenceDedup.writeSpanIndex(
      mk(1L -> "A one. A two. A three."), "doc_id", "text", p)
    val before = Pruning.readIndexMeta(spark, p).get.params("n_docs")
    crashAt("appendToSpanIndex:appended") {
      SentenceDedup.appendToSpanIndex(
        mk(2L -> "B one. B two. B three."), "doc_id", "text", p)
    }
    // counter UNDERSTATES (the benign documented mode): the bump died
    assert(Pruning.readIndexMeta(spark, p).get.params("n_docs") == before)
    // the appended span hashes are LIVE: a probe of the crashed batch's
    // content drops it — probes never gate on the counter
    val got = SentenceDedup.dropDuplicateSpansIncremental(spark, p,
        mk(10L -> "A one. A two. A three.",
           11L -> "B one. B two. B three.",
           12L -> "C one. C two. C three."), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("n_dropped")).toMap
    assert(got == Map(10L -> 3, 11L -> 3, 12L -> 0))
    // a retried bump lands; the handshake survived the crash window
    Pruning.bumpIndexMeta(spark, p, Map("n_docs" -> 1L))
    assert(Pruning.readIndexMeta(spark, p).get.params("n_docs")
      == before + 1L)
    intercept[IllegalArgumentException] {
      SentenceDedup.appendToSpanIndex(
        mk(3L -> "x. y. z."), "doc_id", "text", p, spanLen = 4)
    }
  }

  // ---------------- MinHash append / bump pair ----------------

  test("appendToMinHashIndex: crash between data append and bump keeps dedup exact") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    val p = tmpDir("mh") + "/idx"
    Dedup.writeMinHashIndex(docs, p, "doc_id", "text")
    val before = Pruning.readIndexMeta(spark, p).get.params("n_docs")
    val inc = docs.filter(col("doc_id") < 10).select(
      (col("doc_id") + 1000L).as("doc_id"), col("text"))
    crashAt("appendToMinHashIndex:appended") {
      Dedup.appendToMinHashIndex(inc, p, "doc_id", "text")
    }
    assert(Pruning.readIndexMeta(spark, p).get.params("n_docs") == before)
    // the appended signatures are live: a re-submitted duplicate of the
    // increment matches the increment's own entries
    val probe = inc.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val pairs = Dedup.incrementalNearDupPairs(probe, p, "doc_id", "text",
        minJaccard = 0.9)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { i =>
      assert(pairs.contains((i + 2000L, i + 1000L)),
        s"appended doc ${i + 1000} not matched by its duplicate")
    }
    // parameter handshake survived the crash window
    intercept[IllegalArgumentException] {
      Dedup.appendToMinHashIndex(inc, p, "doc_id", "text", bands = 12)
    }
  }

  // ---------------- frontier-index append / bump pair ----------------

  test("appendToFrontierIndex: crash between data append and bump keeps probes exact") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("url", StringType)))
    def mk(rows: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, u) =>
            org.apache.spark.sql.Row(i, u) }).asJava), schema)
    val p = tmpDir("frontier") + "/idx"
    Urls.writeFrontierIndex(
      mk(1L -> "https://a.example.com/x?utm_s=1"), "url", p)
    val before = Pruning.readIndexMeta(spark, p).get.params("n_urls")
    assert(before == 1L)
    crashAt("appendToFrontierIndex:appended") {
      Urls.appendToFrontierIndex(
        mk(2L -> "https://b.example.com/y"), "url", p)
    }
    // counter UNDERSTATES (the benign documented mode): the bump died
    assert(Pruning.readIndexMeta(spark, p).get.params("n_urls") == before)
    // the appended hashes are LIVE: probes never gate on the counter —
    // respellings of BOTH batches' urls read as seen
    val got = Urls.probeFrontier(spark, p,
        mk(10L -> "HTTPS://A.example.COM:443/x",
           11L -> "https://b.example.com/y?fbclid=z",
           12L -> "https://c.example.com/new"), "id", "url")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("in_index"), r.getAs[Boolean]("fetch"))).toMap
    assert(got == Map(10L -> (true, false), 11L -> (true, false),
      12L -> (false, true)))
    // a retried bump lands; the kind handshake still holds
    Pruning.bumpIndexMeta(spark, p, Map("n_urls" -> 1L))
    assert(Pruning.readIndexMeta(spark, p).get.params("n_urls")
      == before + 1L)
  }

  private def Similarity = graft.operators.Similarity
  private def Dedup = graft.operators.Dedup
  private def Phrase = graft.operators.Phrase
  private def SentenceDedup = graft.operators.SentenceDedup
  private def Urls = graft.operators.Urls
}
