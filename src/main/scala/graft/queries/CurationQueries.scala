package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Curation
import graft.sources.Tables

/** Corpus-curation query surface (round-8 continuation block): hybrid
  * retrieval fusion, model-based quality scoring, hard-rule filtering.
  * Every query carries a DuckDB oracle that replays the full decision
  * chain — ranks, hashes, integer weights, rule verdicts — so a
  * hash-match proves the curation decisions are engine-independent.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Hybrid retrieval with Reciprocal Rank Fusion: a BM25 sparse arm
    * (terms merge/join/filter, top-50) and a dense exact-dot arm
    * (query = vec 0, top-50) fuse via score = Σ 1/(60+rank) —
    * [[graft.operators.Curation.rrfFuse]]. The oracle replays both
    * arms AND the fusion: BM25 scoring (the q85 recipe), the
    * decimal-exact dot ranking (the q23 recipe), and the rank-reciprocal
    * sum, so the fused top-20 is proven end-to-end.
    *
    * Scale: each arm bounds itself to k rows before fusion — the fuse
    * works on ≤ 100 rows no matter the corpus size; the arms keep
    * their own 100 TB contracts (q85: only hits shuffle; q23:
    * broadcast queries, no corpus shuffle).
    */
  def q164HybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val emb = Tables.embeddings(s, dir)
    val sparse = graft.operators.Ranking
      .bm25TopK(docs, "doc_id", "text", Seq("merge", "join", "filter"), k = 50)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("score"), asc("doc_id")))
          .cast(IntegerType))
      .select(col("doc_id"), col("rank"))
    val dense = graft.operators.Similarity
      .dotTopKExact(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 50)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
    Curation.rrfFuse(Seq(sparse, dense), "doc_id", "rank", c = 60, k = 20)
      .orderBy("fused_rank")
  }

  private val dotDecimalSql =
    """list_reduce(
      |      list_transform(list_zip(q.embedding, e.embedding),
      |        x -> CAST(CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(20,12)) AS DECIMAL(32,12))),
      |      (a, b) -> CAST(a + b AS DECIMAL(32,12)))""".stripMargin

  val q164Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                x -> length(x) > 0) AS toks
       |  FROM documents),
       |const AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(len(toks)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
       |  FROM t),
       |hit AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, unnest(toks) AS term
       |  FROM t),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
       |  FROM hit WHERE term IN ('merge', 'join', 'filter')
       |  GROUP BY doc_id, term),
       |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    (((SELECT n FROM const) - df + 0.5) / (df + 0.5))
       |      * (tf * (CAST(1.2 AS DOUBLE) + 1.0))
       |      / (tf + CAST(1.2 AS DOUBLE)
       |         * ((1.0 - CAST(0.75 AS DOUBLE))
       |            + CAST(0.75 AS DOUBLE) * dl / (SELECT avgdl FROM const))) AS s
       |  FROM tf JOIN dfq USING (term)),
       |piv AS (
       |  SELECT doc_id,
       |    COALESCE(max(CASE WHEN term = 'merge'  THEN s END), 0.0)
       |      + COALESCE(max(CASE WHEN term = 'join' THEN s END), 0.0)
       |      + COALESCE(max(CASE WHEN term = 'filter' THEN s END), 0.0) AS score
       |  FROM scored GROUP BY doc_id),
       |bm AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS r
       |  FROM piv
       |  ORDER BY score DESC, doc_id ASC LIMIT 50),
       |dn AS (
       |  SELECT e.vec_id AS doc_id,
       |    CAST(row_number() OVER (ORDER BY $dotDecimalSql DESC, e.vec_id ASC) AS INT) AS r
       |  FROM embeddings e
       |  JOIN embeddings q ON q.vec_id = 0 AND e.vec_id <> 0
       |  QUALIFY r <= 50),
       |fused AS (
       |  SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(b.r AS DOUBLE)), CAST(0.0 AS DOUBLE))
       |      + COALESCE(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + CAST(d.r AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS rrf_score,
       |    CAST((CASE WHEN b.r IS NOT NULL THEN 1 ELSE 0 END)
       |       + (CASE WHEN d.r IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_arms
       |  FROM bm b FULL OUTER JOIN dn d ON b.doc_id = d.doc_id)
       |SELECT doc_id, rrf_score, n_arms,
       |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS fused_rank
       |FROM fused
       |QUALIFY fused_rank <= 20
       |ORDER BY fused_rank""".stripMargin

  /** Hashed linear quality classifier
    * ([[graft.operators.Curation.hashedLinearScore]]): fastText-style
    * inference as one codegen'd projection — md5₆₀ token buckets,
    * integer cent weights from a pure formula, exact integer sum, two
    * IEEE divisions. The oracle replays every token's hash, bucket,
    * weight and the final logit; keep = logit > 0.
    */
  def q165QualityClassifier(s: SparkSession, dir: String): DataFrame =
    Curation.hashedLinearScore(
        Tables.documents(s, dir), "doc_id", "text", buckets = 64, bias = -0.05)
      .orderBy("doc_id")

  val q165Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                x -> length(x) > 0) AS ts
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, CAST(len(ts) AS INT) AS n_tokens,
      |    CAST(COALESCE(list_sum(list_transform(ts, tok ->
      |      ((('0x'||substr(md5(tok),1,15))::BIGINT % 64) * 37 + 11) % 201 - 100)), 0)
      |      AS BIGINT) AS w_sum_cents
      |  FROM t)
      |SELECT doc_id, n_tokens, w_sum_cents,
      |  -0.05 + CAST(w_sum_cents AS DOUBLE) / 100.0
      |        / CAST(greatest(n_tokens, 1) AS DOUBLE) AS logit,
      |  CAST(CASE WHEN -0.05 + CAST(w_sum_cents AS DOUBLE) / 100.0
      |        / CAST(greatest(n_tokens, 1) AS DOUBLE) > 0.0
      |    THEN 1 ELSE 0 END AS INT) AS keep
      |FROM w
      |ORDER BY doc_id""".stripMargin

  /** Gopher-style hard-rule battery
    * ([[graft.operators.Curation.gopherRules]]): five per-row rules
    * (word count, mean word length, stopword evidence, digit density,
    * single-token domination), each an auditable 1/0 verdict column.
    * The oracle replays every rule from the same token list.
    */
  def q166GopherRules(s: SparkSession, dir: String): DataFrame =
    Curation.gopherRules(Tables.documents(s, dir), "doc_id", "text",
        minTokens = 20, maxTokens = 100000, maxTopTokenFrac = 0.1)
      .orderBy("doc_id")

  val q166Sql: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                x -> length(x) > 0) AS ts,
      |    string_split_regex(trim(text), '\s+') AS raw
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(ts) AS INT) AS n_tokens,
      |    CAST(list_sum(list_transform(raw, x -> length(x))) AS DOUBLE)
      |      / greatest(len(raw), 1) AS mwl,
      |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |      x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was',
      |                          'it','that','this','for','on','with','as','at','by','be'], x))) AS n_stop,
      |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
      |    CAST(greatest(length(text), 1) AS DOUBLE) AS n_chars,
      |    list_max(list_transform(list_distinct(ts),
      |      d -> len(list_filter(ts, x -> x = d)))) AS top_tok
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |  CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 100000 THEN 1 ELSE 0 END AS INT) AS r_wordcount,
      |  CAST(CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END AS INT) AS r_wordlen,
      |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS r_stopwords,
      |  CAST(CASE WHEN CAST(n_digit AS DOUBLE) / n_chars <= 0.2 THEN 1 ELSE 0 END AS INT) AS r_symbols,
      |  CAST(CASE WHEN COALESCE(CAST(top_tok AS DOUBLE)
      |        / CAST(greatest(n_tokens, 1) AS DOUBLE) <= 0.1, TRUE) THEN 1 ELSE 0 END AS INT) AS r_repetition,
      |  CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 100000
      |         AND mwl >= 3.0 AND mwl <= 10.0
      |         AND n_stop >= 2
      |         AND CAST(n_digit AS DOUBLE) / n_chars <= 0.2
      |         AND COALESCE(CAST(top_tok AS DOUBLE)
      |               / CAST(greatest(n_tokens, 1) AS DOUBLE) <= 0.1, TRUE)
      |    THEN 1 ELSE 0 END AS INT) AS keep
      |FROM m
      |ORDER BY doc_id""".stripMargin

  /** The q20 quality recipe as a reusable DuckDB fragment (per-doc
    * score over a `text` column in scope) — must stay term-for-term
    * identical to [[graft.functions.TextFunctions.qualityScore]].
    */
  private val qualitySqlOver: String =
    """least(n_tok / 100.0, 1.0) * 0.3
      |      + least((n_stop / greatest(n_tok, 1)) * 3.0, 1.0) * 0.3
      |      + greatest(1.0 - (n_punct / greatest(n_chars, 1)) * 10.0, 0.0) * 0.2
      |      + (CASE WHEN tok_chars / greatest(n_tok, 1) BETWEEN 3.0 AND 10.0
      |              THEN 1.0 ELSE 0.5 END) * 0.2""".stripMargin

  private val qualityTermsSql: String =
    """len(string_split_regex(trim(text), '\s+')) AS n_tok,
      |    CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |      t -> list_contains(['the','a','an','and','or','of','to','in','is','are','was',
      |                          'it','that','this','for','on','with','as','at','by','be'], t))) AS DOUBLE) AS n_stop,
      |    CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
      |    CAST(length(text) AS DOUBLE) AS n_chars,
      |    CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t))) AS DOUBLE) AS tok_chars""".stripMargin

  /** Canonical-document selection
    * ([[graft.operators.Curation.canonicalPerComponent]]): the q50
    * near-dup components (MinHash candidates, exact-Jaccard verified,
    * pointer-jump label propagation) pick ONE representative each by
    * quality score (ties to lowest id); singletons represent
    * themselves. The oracle recomputes components from first
    * principles (recursive-CTE reachability over the exact pair set)
    * and replays the quality argmax — proving cluster → best-copy
    * end-to-end.
    */
  def q167CanonicalDocs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.TextFunctions.qualityScore
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val planted = docs.unionAll(
      docs.filter(col("doc_id") < 60).select(
        (col("doc_id") + 100000).as("doc_id"),
        expr("substring(text, 1, greatest(length(text) - 15, 40))").as("text")))
    val pairs = Dedup.verifiedNearDupPairs(planted, "doc_id", "text",
      minJaccard = 0.5, shingleSize = 7, numHashes = 96, bands = 24)
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id"), col("component_id"))
    Curation.canonicalPerComponent(planted, comps, "doc_id",
        qualityScore(col("text")))
      .orderBy("doc_id")
  }

  val q167Sql: String =
    s"""WITH RECURSIVE planted AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 100000 AS doc_id,
       |    substr(text, 1, greatest(length(text) - 15, 40)) AS text
       |  FROM documents WHERE doc_id < 60),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, length(text)-7+2), i -> substr(text, i, 7))) AS s
       |  FROM planted WHERE length(text) >= 7),
       |ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    count(*) AS i, any_value(a.n) AS na, any_value(b.n) AS nb
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |prs AS (
       |  SELECT id_a, id_b FROM inter
       |  WHERE CAST(i AS DOUBLE) / CAST(na + nb - i AS DOUBLE) >= 0.5),
       |edges AS (
       |  SELECT id_a AS s, id_b AS d FROM prs
       |  UNION
       |  SELECT id_b AS s, id_a AS d FROM prs),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |comp AS (
       |  SELECT s AS doc_id, least(min(d), s) AS component_id
       |  FROM reach GROUP BY s),
       |scored AS (
       |  SELECT doc_id,
       |    $qualityTermsSql
       |  FROM planted),
       |q AS (
       |  SELECT doc_id,
       |    $qualitySqlOver AS score
       |  FROM scored),
       |lab AS (
       |  SELECT q.doc_id, COALESCE(c.component_id, q.doc_id) AS component_id, q.score
       |  FROM q LEFT JOIN comp c USING (doc_id)),
       |sel AS (
       |  SELECT doc_id, component_id,
       |    CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT) AS n_members,
       |    score,
       |    row_number() OVER (PARTITION BY component_id
       |      ORDER BY score DESC, doc_id ASC) AS rk
       |  FROM lab)
       |SELECT doc_id, component_id, n_members, score
       |FROM sel WHERE rk = 1
       |ORDER BY doc_id""".stripMargin

  /** Greedy token-budget selection
    * ([[graft.operators.Sampling.budgetSelect]]): best documents by
    * quality until 30% of the corpus character mass is spent — the
    * two-phase sharded prefix sum (no global sort). The oracle is the
    * INDEPENDENT formulation: one global cumulative window over
    * (score desc, doc_id) — bucket-count invariance proven by the
    * hash match.
    */
  def q168TokenBudget(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityScore
    val docs = Tables.documents(s, dir)
    val total = docs.agg(sum(col("n_chars"))).head.getLong(0)
    graft.operators.Sampling.budgetSelect(
        docs, "doc_id", "n_chars", qualityScore(col("text")),
        budget = 3L * total / 10L, nBuckets = 64)
      .orderBy("doc_id")
  }

  val q168Sql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, n_chars,
       |    $qualityTermsSql
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, n_chars,
       |    $qualitySqlOver AS score
       |  FROM scored),
       |b AS (SELECT CAST(3 * sum(n_chars) // 10 AS BIGINT) AS budget FROM documents),
       |c AS (
       |  SELECT doc_id, score, n_chars,
       |    CAST(sum(n_chars) OVER (ORDER BY score DESC, doc_id ASC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM q)
       |SELECT doc_id, score, CAST(n_chars AS BIGINT) AS n_units,
       |  cum AS cum_units
       |FROM c CROSS JOIN b
       |WHERE cum <= budget
       |ORDER BY doc_id""".stripMargin

  /** Temperature-scaled source mixing
    * ([[graft.operators.Sampling.temperatureSample]], α = 0.5): each
    * source keeps documents at a rate ∝ √n_s/n_s toward a 100-doc
    * expected total — IEEE-exact sqrt, decimal-exact weight sum, md5
    * per-million gate. Audit aggregate per source is the oracle
    * contract (the q86 pattern with temperature weights).
    */
  def q169TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val kept = graft.operators.Sampling.temperatureSample(
      Tables.documents(s, dir), "doc_id", "source", targetTotal = 100L)
    kept.groupBy(col("source"))
      .agg(
        max(col("_src_total")).as("n_orig"),
        max(col("_keep_threshold")).as("keep_threshold"),
        count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast(LongType).as("total_chars"))
      .orderBy("source")
  }

  val q169Sql: String =
    """WITH c AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source),
      |sw AS (
      |  SELECT CAST(sum(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(18,6))) AS DOUBLE) AS s
      |  FROM c),
      |thr AS (
      |  SELECT source, n,
      |    least(1000000, CAST(floor(100000000.0 * sqrt(CAST(n AS DOUBLE))
      |      / (sw.s * CAST(n AS DOUBLE))) AS BIGINT)) AS keep_threshold
      |  FROM c CROSS JOIN sw),
      |kept AS (
      |  SELECT d.source, d.n_chars, t.n, t.keep_threshold
      |  FROM documents d JOIN thr t USING (source)
      |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'tmpr'), 1, 15))::BIGINT
      |          % 1000000 < t.keep_threshold)
      |SELECT source, max(n) AS n_orig,
      |  max(keep_threshold) AS keep_threshold,
      |  CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM kept
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Unicode text canonicalization
    * ([[graft.functions.TextFunctions.canonicalizeText]] over the
    * native no-UDF NFC expression): every document gets a planted
    * suffix of decomposed accents (e + U+0301), an NBSP, and a
    * zero-width space; canonicalization must NFC-compose, space-fold
    * and strip them so the md5 fingerprints match DuckDB running
    * nfc_normalize + the same regex chain on the same planted text.
    * Character counts before/after prove the plant actually exercised
    * every rule.
    */
  def q179UnicodeCanonicalize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.canonicalizeText
    val planted = concat(col("text"),
      lit(" Cafe\u0301\u00A0x\u200Bend"))  // e+combining acute, NBSP, ZWSP
    Tables.widen(Tables.documents(s, dir)).select(
        col("doc_id"),
        length(planted).cast(IntegerType).as("n_chars_planted"),
        length(canonicalizeText(planted)).cast(IntegerType).as("n_chars_canon"),
        md5(canonicalizeText(planted)).as("canon_fp"))
      .orderBy("doc_id")
  }

  val q179Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    text || ' Cafe' || chr(769) || chr(160) || 'x' || chr(8203) || 'end' AS t
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, t,
      |    trim(regexp_replace(
      |      regexp_replace(
      |        replace(nfc_normalize(t), chr(160), ' '),
      |        '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || chr(173) || ']',
      |        '', 'g'),
      |      '\s+', ' ', 'g')) AS canon
      |  FROM p)
      |SELECT doc_id,
      |  CAST(length(t) AS INT) AS n_chars_planted,
      |  CAST(length(canon) AS INT) AS n_chars_canon,
      |  md5(canon) AS canon_fp
      |FROM c
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q179_unicode_canonicalize" -> q179UnicodeCanonicalize _,
    "q164_hybrid_rrf"        -> q164HybridRrf _,
    "q165_quality_classifier" -> q165QualityClassifier _,
    "q166_gopher_rules"      -> q166GopherRules _,
    "q167_canonical_docs"    -> q167CanonicalDocs _,
    "q168_token_budget"      -> q168TokenBudget _,
    "q169_temperature_mix"   -> q169TemperatureMix _)

  val oracle: Map[String, String] = Map(
    "q179_unicode_canonicalize" -> q179Sql,
    "q164_hybrid_rrf"        -> q164Sql,
    "q165_quality_classifier" -> q165Sql,
    "q166_gopher_rules"      -> q166Sql,
    "q167_canonical_docs"    -> q167Sql,
    "q168_token_budget"      -> q168Sql,
    "q169_temperature_mix"   -> q169Sql)
}
