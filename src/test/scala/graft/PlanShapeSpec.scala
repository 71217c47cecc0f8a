package graft

/** CI-enforced plan-shape audit: the scale properties the engine
  * promises (pushdown, broadcast dims, no cartesian products, no
  * single-partition funnels, no UDFs in plans) asserted as tests, so a
  * future change that silently regresses a plan fails here — not in a
  * 100 TB deployment.
  *
  * Note: the near-dup operators (q21/q22/q42…) materialize eagerly and
  * return a localCheckpoint scan, so their interesting plan shape is
  * asserted in their own specs (DedupSpec flood/cache tests); here they
  * still participate in the "no cartesian / no UDF" sweeps via the
  * plans built BEFORE checkpointing is reached.
  */
class PlanShapeSpec extends SparkSpec {

  /** Physical-plan string per query, built once. Building a plan is
    * cheap; the handful of eager (checkpointing) operators execute at
    * sf0.001, which keeps this suite fast.
    */
  lazy val plans: Map[String, String] =
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
    }.toMap

  test("no query plans a cartesian product") {
    // the exact-ANN baseline is intentionally a broadcast-nested-loop
    // (documented); CartesianProduct — both sides materialized per
    // partition pair — must never appear
    val bad = plans.collect { case (n, p) if p.contains("CartesianProduct") => n }
    assert(bad.isEmpty, s"cartesian products in: ${bad.mkString(", ")}")
  }

  test("no query funnels rows through a single-partition exchange") {
    // Exchange SinglePartition = the whole dataset through one task —
    // the classic global-window/global-sort scale killer. Final
    // presentation orderBy plans as rangepartitioning, never this.
    //
    // Whitelisted: scalar global aggregates, where the ONLY rows
    // crossing the single-partition exchange are per-task partial
    // aggregation buffers (#partitions rows, not data) — the correct
    // plan for a one-row answer at any scale.
    val scalarAggregates = Set(
      "q06_revenue_filter",   // one global sum row
      "q11_set_ops",          // counts of set-op branches
      "q30_small_quantity",   // TPC-H Q17 scalar: one avg row
      "q88_profile_table",    // ANALYZE: one wide profile row (per-task
                              // partial agg buffers cross, then stack)
      "q106_category_drift",  // snapshot totals: a scalar agg whose
                              // INPUT is already category-sized (the
                              // per-category count frame), partial
                              // buffers cross, broadcast back
      "q141_sales_opportunity", // scalar positive-balance average (the
                              // q06/q30 shape): partial avg buffers
                              // cross, broadcast back to the filter
      "q147_user_growth",     // cumulative window over the DAILY frame
                              // (|days| rows by construction — both
                              // corpus aggregates below it are
                              // ordinary parallel partial aggs)
      "q126_dq_audit",        // predicate-rule block: ONE scalar agg
                              // with 2 conditional buffers per rule
                              // (the q88 shape), stacked to k rows;
                              // the unique/FK legs are ordinary keyed
                              // aggregates
      "q160_ab_experiment",   // the experiment-totals scalar: ONE
                              // global sum over the 2-row per-arm
                              // frame (partial sum buffers cross),
                              // broadcast back into the chi-squared
                              // expectation
      "q152_basket_lift",     // the basket-total scalar: ONE global
                              // count(distinct basket) row (partial
                              // distinct-count buffers cross), joined
                              // back into the lift division
      "q149_skyline",         // the grid-width scalar: ONE global
                              // max(_x) row (the q06 shape — partial
                              // max buffers cross, broadcast back as
                              // the bucket width); the suffix-max
                              // threshold step is a B×B broadcast
                              // self-join, not a global window
      "q169_temperature_mix", // the Σ√n weight scalar: ONE global
                              // decimal sum whose INPUT is the
                              // source-count frame (|sources| rows by
                              // construction — the corpus aggregate
                              // below it is an ordinary keyed count);
                              // partial sum buffers cross, broadcast
                              // back as the rate denominator
      "q178_salt_plan",       // the (total, nkeys) scalar: ONE global
                              // agg whose INPUT is the per-key count
                              // frame (keys rows by construction — the
                              // corpus count below it is an ordinary
                              // keyed aggregate); partial buffers
                              // cross, broadcast back as the skew
                              // threshold
      "q186_t_closeness",     // the global-N scalar: ONE sum over the
                              // |domain|-sized value-count frame
                              // (partial buffers cross), broadcast
                              // back as the TVD denominator; the cell
                              // and group aggregates are ordinary
                              // keyed aggregates
      "q187_gini_profile",    // per-column impurity summary: ONE
                              // scalar agg per column whose INPUT is
                              // the keyed value-count frame (partial
                              // buffers cross, one row out), stacked
                              // by union — the q88/q183 shape
      "q191_join_cardinality", // two scalar legs by construction: the
                              // est min over the 4-row inner-product
                              // frame and the exact-size sum over the
                              // keyed count-join frame — partial
                              // buffers cross in both, one row out
      "q211_unigram_tokenize", // the vocabulary-total scalar: ONE sum
                              // over the final VOCAB frame (≤ chars +
                              // keepMulti rows by construction — the
                              // corpus word count below it is an
                              // ordinary keyed aggregate); partial
                              // buffers cross, one row broadcasts
                              // back as the micro-log2 denominator
      "q206_benford_audit",   // the total-N scalar: ONE sum over the
                              // ≤9-row digit-count frame (partial
                              // buffers cross), broadcast back as the
                              // ppm denominator; the digit count
                              // itself is an ordinary keyed aggregate
      "q183_fd_discovery",    // per-candidate-pair FD summary: ONE
                              // scalar agg per pair whose INPUT is the
                              // keyed count-distinct frame (partial
                              // buffers cross, one summary row out),
                              // stacked by union — the q88 shape per
                              // candidate
      "q164_hybrid_rrf",      // RRF fuse: the global rank window runs
                              // over the JOINED TOP-K ARMS (≤ arms·k
                              // = 100 rows by construction — each arm
                              // bounded itself with its own top-k
                              // before the fuse); the BM25/dot arms
                              // below are ordinary parallel plans
      "q213_target_encoding", // the m·prior scalar: ONE sum over the
                              // |categories|-sized stats frame (partial
                              // buffers cross, one row out), broadcast
                              // back into the encode projection; the
                              // category stats themselves are an
                              // ordinary keyed aggregate
      "q231_leakage_safe_split", // the leaked_pairs audit scalar: ONE
                              // global count over the (bounded)
                              // near-dup pair frame (partial count
                              // buffers cross), broadcast back onto
                              // the 3-row split summary; components
                              // and the split assignment below are
                              // ordinary id-keyed plans
      "q234_dsir_select",     // the (R, T) totals scalar: ONE sum per
                              // model over the ≤nBuckets-row bucket
                              // frame (partial buffers cross, one row
                              // broadcasts back into the bucket
                              // weights); the corpus token count is an
                              // ordinary keyed aggregate and the top-k
                              // is a TakeOrdered, not a global sort
      "q253_ccnet_buckets",   // the q211 shape plus the q109 bucketer:
                              // the vocabulary-total scalar is ONE sum
                              // over the ≤ chars+keepMulti vocab frame
                              // (partial buffers cross, one row
                              // broadcasts back as the micro-log2
                              // denominator), and the histogram
                              // quantile walk runs over the ≤256-row
                              // merged sketch; the corpus scans below
                              // both are ordinary keyed aggregates
      "q256_bleu_score",      // the q243 chain plus ONE more scalar
                              // reduction: the score assembles from
                              // the maxN-row counts frame (partial
                              // buffers cross, one row out) — every
                              // corpus-sized aggregate below it is the
                              // q243 keyed shape
      "q243_bleu_counts",     // two scalar legs by construction: the
                              // per-order matched/total sums over the
                              // already-(id, n, hash)-keyed gram-count
                              // join (partial buffers cross, maxN rows
                              // out), and the corpus length totals —
                              // ONE sum pair over the pair table
                              // (partial buffers cross, one row
                              // broadcasts back onto the 4-row output)
      "q219_apportion_select", // Hamilton seats: the leftover-seat rank
                              // window and the N / leftover scalars run
                              // over the COUNT frame (one row per
                              // source by construction — the corpus
                              // count below is an ordinary keyed
                              // aggregate with partial buffers); the
                              // selection rank itself is keyed
                              // (source, bucket) windows
      "q248_domain_budget",   // the q219 shape over registrable
                              // domains: seat window + two scalars on
                              // the per-domain count frame; selection
                              // windows keyed (domain, bucket)
      "q108_histogram_quantiles") // the rank-walk window runs over the
                              // MERGED HISTOGRAM (≤ bins = 256 rows by
                              // construction) — the corpus scan behind
                              // it is an ordinary parallel aggregate.
                              // (q109 needs no entry: its rank walk
                              // runs eagerly at plan-build time, so
                              // the gate-visible plan is scan →
                              // comparison chain → presentation sort)
    val bad = plans.collect {
      case (n, p) if p.contains("SinglePartition") && !scalarAggregates(n) => n
    }
    assert(bad.isEmpty, s"single-partition exchanges in: ${bad.mkString(", ")}")
    // the whitelist itself must hold: partial aggregation below the
    // exchange (only agg buffers cross), never a raw-data exchange
    scalarAggregates.foreach { n =>
      assert(plans(n).contains("partial"),
        s"$n exchanges to one partition without partial aggregation")
    }
  }

  test("no query plan contains a UDF") {
    val bad = plans.collect {
      case (n, p) if p.contains("ScalaUDF") || p.contains("BatchEval") => n
    }
    assert(bad.isEmpty, s"UDFs in plans of: ${bad.mkString(", ")}")
  }

  test("LATERAL top-k decorrelates to a keyed rank window") {
    // the declarative correlated form must reach the scalable plan —
    // a per-customer re-execution (or worse, a cartesian) would be a
    // decorrelation regression
    val p = plans("q203_lateral_topk")
    assert(p.contains("Window"), s"no window in q203 plan:\n$p")
  }

  test("partition-keyed dim join injects dynamic partition pruning") {
    // the date-partitioned fact scan must carry the runtime
    // dynamicpruning subquery — without it the join reads all ~30
    // partitions for a 5-day dim at every scale
    val p = plans("q204_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in q204 plan:\n$p")
  }

  test("selective scans push their filters into the parquet reader") {
    // regressing one of these to a post-scan filter re-reads full
    // row-groups at 100 TB
    val expectPushdown = Seq(
      "q02_filter_project", "q03_shipping_priority", "q06_revenue_filter",
      "q17_read_path")
    val re = "PushedFilters: \\[[^\\]]".r
    val bad = expectPushdown.filterNot(n => re.findFirstIn(plans(n)).nonEmpty)
    assert(bad.isEmpty, s"no parquet pushdown in: ${bad.mkString(", ")}")
  }

  test("dimension-sided joins broadcast the dimension") {
    val expectBroadcast = Seq(
      "q03_shipping_priority", "q05_local_supplier", "q07_top_customers",
      "q37_volume_shipping", "q43_decontaminate", "q45_min_cost_supplier")
    val bad = expectBroadcast.filterNot { n =>
      val p = plans(n)
      p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange") ||
        p.contains("BroadcastNestedLoopJoin")
    }
    assert(bad.isEmpty, s"dim side not broadcast in: ${bad.mkString(", ")}")
  }

  test("bucketed join: sort-merge with no exchange keyed on the join key") {
    // the whole point of the bucketed layout: the join consumes bucket
    // files directly — a shuffle on the join key means the layout was
    // ignored (mismatched bucket counts, disabled bucketing, a lost
    // output partitioning). The aggregate AFTER the join still
    // exchanges on c_mktsegment; only a c_custkey exchange is a bug.
    val p = plans("q57_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"bucketed join not sort-merge:\n$p")
    assert(!p.contains("hashpartitioning(c_custkey"),
      s"bucketed join re-shuffles on the bucket key:\n$p")
    assert(p.contains("SelectedBucketsCount"),
      s"join sides are not bucketed scans:\n$p")
  }

  test("exact dedup never ships document content through an exchange") {
    // the r5 scale nit: the old window-by-fingerprint formulation sent
    // every text payload through its shuffle. The id-join formulation
    // exchanges (hash, id) pairs only — asserted on the FINAL adaptive
    // plan's shuffle outputs, not the plan string.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = SparkEntry.queries("q18_exact_dedup")(spark, sfDir)
    df.collect() // finalize the AQE plan
    val bad = flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike if e.output.exists(_.name == "text") => e
    }
    assert(bad.isEmpty,
      s"content column crosses an exchange in q18:\n${bad.mkString("\n")}")
  }

  test("snapshot diff ships only keys and fingerprints through exchanges") {
    // Diff.snapshotDiff's contract: value columns reduce to a 16-byte
    // md5 map-side; every shuffle carries (key, hash, count) triples
    // only. Asserted on the FINAL adaptive plan of q100 — a
    // formulation change that let o_custkey/o_orderstatus cross an
    // exchange would ship the table's full width at 100 TB.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = SparkEntry.queries("q100_snapshot_diff")(spark, sfDir)
    df.collect() // finalize the AQE plan
    val valueCols = Set("o_custkey", "o_orderstatus")
    val bad = flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike if e.output.exists(a => valueCols(a.name)) => e
    }
    assert(bad.isEmpty,
      s"value column crosses an exchange in q100:\n${bad.mkString("\n")}")
  }

  test("IVF index build: centroid assignment plans NO exchange at all") {
    // the r5 scale nit: the old broadcast-expand + window formulation
    // sent every corpus vector through an exchange nlist times during
    // index build. The assignment must now be scan → projection →
    // explode — a 10⁹-vector build is then embarrassingly parallel.
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val centroids = emb
      .select(col("vec_id").as("centroid_id"), col("embedding").as("_centroid"))
      .orderBy(col("centroid_id")).limit(8)
    val assigned = graft.operators.Similarity
      .assignToCentroid(emb, centroids, "vec_id", "embedding", "neighbor_id")
    val p = assigned.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"IVF build assignment shuffles the corpus:\n$p")
  }

  test("IVF aggregate-regime assignment: corpus crosses ONE exchange, partially aggregated") {
    // the 10⁹-vector path (nlist × dim past the literal budget): the
    // plan must be broadcast-join → map-side partial min_by → ONE
    // corpus-keyed exchange → final aggregate. Partial aggregation
    // before the shuffle is what keeps the exchange un-amplified (≤ one
    // row per corpus id per task, never nlist× the corpus).
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val centroids = emb
      .select(col("vec_id").as("centroid_id"), col("embedding").as("_centroid"))
      .orderBy(col("centroid_id")).limit(8)
    val assigned = graft.operators.Similarity.assignToCentroid(
      emb, centroids, "vec_id", "embedding", "neighbor_id",
      literalCellBudget = 1)
    assigned.collect() // finalize the AQE plan
    val nodes = flatten(assigned.queryExecution.executedPlan)
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size == 1,
      s"aggregate-regime assignment should shuffle exactly once, got ${shuffles.size}")
    val partialBelow = flatten(shuffles.head.child).exists {
      case h: BaseAggregateExec =>
        h.aggregateExpressions.exists(_.mode == Partial)
      case _ => false
    }
    assert(partialBelow,
      "no partial aggregate below the exchange — the shuffle would carry nlist-amplified rows")
    val finalAbove = nodes.exists {
      case h: BaseAggregateExec =>
        h.aggregateExpressions.exists(_.mode == Final)
      case _ => false
    }
    assert(finalAbove, "no final aggregate above the exchange")
  }

  test("passage scrub: shingle strings never cross an exchange; content crosses once") {
    // q82's scale contract: the common-shingle detection and the
    // occurrence match-back shuffle ONLY (md5, id, position) — the
    // n-gram strings die before the exchange — and the document tokens
    // cross exactly one id-keyed exchange (window + reassembly reuse
    // the same partitioning).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = SparkEntry.queries("q82_passage_scrub")(spark, sfDir)
    df.collect() // finalize the AQE plan
    val shuffles = flatten(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    val shingleBearing = shuffles.filter(_.output.exists(_.name == "_sh"))
    assert(shingleBearing.isEmpty,
      s"shingle strings cross an exchange in q82:\n${shingleBearing.mkString("\n")}")
    // `Tables.widen`'s round-robin fixture-spreading repartition fires
    // at sf0.001 (stats-driven; a production-sized input skips it) —
    // the scale claim is about KEYED exchanges, where content bytes
    // pay shuffle-hash + sort cost: exactly one, the union→window one.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val tokenBearing = shuffles.filter(e =>
      e.outputPartitioning.isInstanceOf[HashPartitioning] &&
        e.output.exists(a => a.name == "_tok" || a.name == "text"))
    assert(tokenBearing.size == 1,
      s"document content crosses ${tokenBearing.size} keyed exchanges in q82 (expected exactly 1)")

    // q84's twin contract: per-row pairwise products partially
    // aggregate map-side; no exchange ever carries the embedding
    // column — only (i, j, count, sum) cell buffers.
    val cov = SparkEntry.queries("q84_embedding_covariance")(spark, sfDir)
    cov.collect()
    val covShuffles = flatten(cov.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike => e }
    val embBearing = covShuffles.filter(e =>
      e.outputPartitioning.isInstanceOf[HashPartitioning] &&
        e.output.exists(_.name == "embedding"))
    assert(embBearing.isEmpty,
      s"embedding column crosses a keyed exchange in q84:\n${embBearing.mkString("\n")}")
    assert(plans("q84_embedding_covariance").contains("partial"),
      s"no map-side partial aggregation in q84")
  }

  test("zone-map scan: the zone predicate reaches PartitionFilters and prunes files") {
    // q175's scale contract: filtering on the zone partition column
    // must prune at planning time — a post-scan filter would read
    // every zone's files at 100 TB
    import org.apache.spark.sql.functions._
    val path = graft.queries.Det.scratchPath("zonespec", sfDir) + "/t"
    graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("l_shipdate"))
      .withColumn("zone", expr(
        "CAST(datediff(to_date(l_shipdate), DATE '1995-01-01') div 90 AS INT)"))
      .write.partitionBy("zone").mode("overwrite").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("zone").isin(8, 9))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && !p.contains("PartitionFilters: []"),
      s"zone predicate not in PartitionFilters:\n$p")
    val allZones = spark.read.parquet(path).select("zone").distinct().count()
    assert(allZones > 2, "fixture should span more than two zones")
    // the pruned read touches only the two zones' rows
    val full = spark.read.parquet(path)
      .filter(col("zone").isin(8, 9)).count()
    assert(pruned.count() == full)
  }

  test("unified pruning API: both predicate shapes reach PartitionFilters") {
    // q212's scale contract: pruneFiles consults zone maps + Bloom
    // manifests and prunedRead must plan the survivors as PARTITION
    // filters — for an equality AND a range predicate through the
    // same API (a post-scan filter would open every file at 100 TB)
    import org.apache.spark.sql.functions._
    import graft.sinks.Pruning
    val path = graft.queries.Det.scratchPath("prunespec", sfDir) + "/t"
    graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        expr("CAST(datediff(to_date(l_shipdate), DATE '1995-01-01') AS INT)")
          .as("ship_day"))
      .withColumn("zone", expr("CAST(ship_day div 90 AS INT)"))
      .write.partitionBy("zone").mode("overwrite").parquet(path)
    Pruning.writeManifest(spark, path, "zone",
      zoneCols = Seq("ship_day", "l_orderkey"),
      bloomCols = Seq("l_orderkey"), numBits = 8192, numHashes = 4)
    val nZones = spark.read.parquet(path).select("zone").distinct().count()
    for ((tag, preds) <- Seq(
        "range" -> Seq(Pruning.Pred.range("ship_day", 731L, 911L)),
        "equality" -> Seq(Pruning.Pred.eq("l_orderkey", 42L)))) {
      val keep = Pruning.pruneFiles(spark, path, preds)
      assert(keep.size < nZones,
        s"$tag predicate pruned nothing (${keep.size} of $nZones zones)")
      val pruned = Pruning.prunedRead(spark, path, "zone", preds)
      val p = pruned.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: [") &&
        !p.contains("PartitionFilters: []"),
        s"$tag predicate not in PartitionFilters:\n$p")
      // soundness: the restricted scan finds exactly the full-scan rows
      val full = spark.read.parquet(path).filter(preds.map(pr =>
        Seq(pr.lo.map(col(pr.column) >= _), pr.hi.map(col(pr.column) <= _))
          .flatten.reduce(_ && _)).reduce(_ && _)).count()
      assert(pruned.count() == full, s"$tag pruned scan lost rows")
    }
  }

  test("hot aggregation queries stay inside whole-stage codegen") {
    // "*(n)" marks operators fused into a generated stage; a plan with
    // none at all has fallen out of codegen entirely. Codegen insertion
    // happens at execution under AQE, so these run first.
    val hot = Seq("q01_pricing_summary", "q02_filter_project",
      "q06_revenue_filter", "q08_window_rank", "q19_text_stats")
    val bad = hot.filterNot { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // finalize THIS df's AQE plan (count() spawns its own)
      df.queryExecution.executedPlan.toString.contains("*(")
    }
    assert(bad.isEmpty, s"no whole-stage codegen span in: ${bad.mkString(", ")}")
  }
}
