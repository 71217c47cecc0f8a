package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pageRank matches an exact integer reference implementation") {
    import spark.implicits._
    // small cyclic graph with a duplicate edge (must not double-vote)
    // and an out-only node (4)
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L),
      (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val e = Set((1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 1L), (2L, 1L))
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val unit = 1000000000000L / nodes.size
    val base = 15L * unit / 100
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> unit).toMap
    for (_ <- 0 until 3) {
      val insum = e.toSeq.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v => v -> (base + 85L * insum.getOrElse(v, 0L) / 100)).toMap
    }
    assert(got == r)
    // sinks (1 and 3) accumulate; the in-edge-free node 2 holds only
    // the teleport share
    assert(got(3L) > got(2L) && got(1L) > got(2L))
    assert(got(2L) == base && got(4L) == base)
  }

  test("pageRank is deterministic across runs and layouts") {
    import spark.implicits._
    val edges = (1L to 200L).map(i => (i, i % 37)).toDF("src", "dst")
    def run(parts: Int) =
      Graph.pageRank(edges.repartition(parts), "src", "dst", iters = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    // partitioning must not change a single rank unit
    assert(run(1).toSeq == run(13).toSeq)
  }

  test("triangle counts: K4, a tail, and a triangle-free pair") {
    import spark.implicits._
    // K4 on {1,2,3,4}: 4 triangles, every node in 3 of them; node 10
    // hangs off node 1 (tail, zero triangles); 20-21 is an isolated
    // edge. Noise: duplicate, reversed, and self-loop edges must all
    // normalize away.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val noise = Seq((2L, 1L), (1L, 2L), (3L, 3L))
    val extra = Seq((1L, 10L), (20L, 21L))
    val got = Graph.triangleCounts(
        (k4 ++ noise ++ extra).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(got.toSeq == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 0L, 20L -> 0L, 21L -> 0L))
  }

  test("triangle counts: orientation-independent (hub-heavy star + rim)") {
    import spark.implicits._
    // wheel graph: hub 0 connected to rim 1..12, rim cycle 1-2-...-12-1
    // -> 12 triangles; hub in all 12, each rim node in 2. The hub's
    // degree (12) forces the degree-orientation path where the hub
    // LOSES most orientation comparisons — the shape the O(sqrt m)
    // out-degree bound depends on.
    val rim = (1L to 12L).map(i => (i, if (i == 12L) 1L else i + 1))
    val spokes = (1L to 12L).map(i => (0L, i))
    val got = Graph.triangleCounts((rim ++ spokes).toDF("src", "dst"),
        "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(got(0L) == 12L)
    assert((1L to 12L).forall(i => got(i) == 2L))
  }

  implicit class MapOps(m: Map[Long, Long]) {
    def toSortedMap: scala.collection.immutable.SortedMap[Long, Long] =
      scala.collection.immutable.SortedMap.from(m)
  }
  implicit class ArrOps(a: Array[(Long, Long)]) {
    def toSortedMap: scala.collection.immutable.SortedMap[Long, Long] =
      scala.collection.immutable.SortedMap.from(a)
  }

  test("treeRollup: closed-form ancestors equal a direct subtree walk") {
    import spark.implicits._
    // sparse heap tree: nodes 1..7 plus a deep leaf at 45 (ancestors
    // 45 -> 22 -> 11 -> 5 -> 2 -> 1; 22/11 absent from the node set —
    // absent ancestors still accumulate, present-node filtering is the
    // caller's join)
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 45L))
      .map(n => (n, n * 10)).toDF("node", "v")
    val got = graft.operators.Graph.treeRollup(nodes, "node", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    def subtree(root: Long): Seq[Long] =
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 45L).filter { n =>
        var a = n
        while (a > root) a /= 2
        a == root
      }
    for (root <- Seq(1L, 2L, 3L, 5L, 7L, 45L)) {
      val members = subtree(root)
      assert(got(root) == ((members.size.toLong, members.map(_ * 10).sum)),
        s"root $root")
    }
    // implicit ancestors of 45 appear with just the leaf's contribution
    assert(got(22L) == ((1L, 450L)) && got(11L) == ((1L, 450L)))
    intercept[Exception] {
      graft.operators.Graph.treeRollup(
        Seq((0L, 1L)).toDF("node", "v"), "node", "v").collect()
    }
  }

  test("BFS hops: line graph distances, hop cap, unreachable nodes absent") {
    import spark.implicits._
    // path 1-2-3-4-5 (undirected), island 9-10
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = graft.operators.Graph
      .bfsHops(edges, "src", "dst", seeds, "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // node 5 is 4 hops away → absent; island never reached
  }

  test("BFS hops: min-hop wins when multiple paths reach a node") {
    import spark.implicits._
    // diamond: 1→2→4 and 1→3→4 plus direct 1→4: dist(4) = 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val got = graft.operators.Graph
      .bfsHops(edges, "src", "dst", Seq(1L).toDF("n"), "n", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("BFS hops: multiple seeds merge at hop 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (5L, 2L)).toDF("src", "dst")
    val got = graft.operators.Graph
      .bfsHops(edges, "src", "dst", Seq(1L, 5L, 1L).toDF("n"), "n", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 5L -> 0L, 2L -> 1L))
  }

  test("personalizedPageRank: rank concentrates on the seed neighborhood") {
    import spark.implicits._
    // two disjoint triangles; seed in the first only
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(edges, "src", "dst",
        seeds = Seq(1L), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the unseeded triangle holds zero rank (no teleport, no inflow)
    assert(got(10L) == 0L && got(11L) == 0L && got(12L) == 0L)
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
    // seed 1 keeps the teleport share on top of its cycle inflow
    assert(got(1L) > got(2L))
  }

  test("personalizedPageRank: seed set of all nodes equals uniform pageRank") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L)).toDF("src", "dst")
    val uniform = Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ppr = Graph.personalizedPageRank(edges, "src", "dst",
        seeds = Seq(1L, 2L, 3L), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == uniform)
  }

  test("labelPropagation: weight structure splits a connected graph") {
    import spark.implicits._
    // two 3-cliques with heavy internal weights, one light bridge
    val edges = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L),
      (3L, 4L, 1L)).toDF("a", "b", "w")
    val got = Graph.labelPropagation(edges, "a", "b", "w", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to its own min label; the bridge does not
    // merge them
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(4L), got(5L), got(6L)).size == 1)
    assert(got(1L) != got(4L))
  }

  test("labelPropagation: isolated self-community and parallel-edge weight merge") {
    import spark.implicits._
    // 7 is isolated (self-loop-free node only reachable via symmetry
    // of its own absence): present as a node through a zero-weight?
    // No — isolated means absent from edges; nodes come FROM edges, so
    // instead check tie-break and parallel-edge merging: the (1,2)
    // edge appears twice with weight 3 each (merged 6) vs a single
    // (1,3) edge of weight 5 — node 1 must vote with label 2's side
    // after merging, not pick 3 by the unmerged single edge
    val edges = Seq((1L, 2L, 3L), (2L, 1L, 3L), (1L, 3L, 5L))
      .toDF("a", "b", "w")
    val got = Graph.labelPropagation(edges, "a", "b", "w", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2L, s"parallel edges must merge weights: $got")
  }

  test("kCore: path peels inward round by round, clique core survives") {
    import spark.implicits._
    // K5 on 1–5 (every node degree 4) plus a 7-node path 10–16 whose
    // ends peel first and expose new ends each round — a genuine
    // 3-round cascade. Noise: reversed duplicate and self-loop must
    // normalize away.
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val path = (10L until 16L).map(i => (i, i + 1))
    val noise = Seq((2L, 1L), (3L, 3L))
    val edges = (k5 ++ path ++ noise).toDF("src", "dst")
    val got = Graph.kCore(edges, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    // r1 drops 10,16 → r2 drops 11,15 → r3 drops 12,14; node 13 keeps
    // no surviving edge, so only the clique remains, each at degree 4
    assert(got.toSeq == (1L to 5L).map(_ -> 4L))
    // the clique is a true 2-core: more rounds change nothing
    val fixed = Graph.kCore(edges, "src", "dst", k = 2, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(fixed.toSeq == got.toSeq)
  }

  test("kCore: k above max degree empties the graph; partitioning-invariant") {
    import spark.implicits._
    val edges = (1L to 100L).map(i => (i, (i % 10) + 200L)).toDF("src", "dst")
    assert(Graph.kCore(edges, "src", "dst", k = 50, rounds = 2).count() == 0L)
    def run(parts: Int) =
      Graph.kCore(edges.repartition(parts), "src", "dst", k = 5, rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSortedMap
    assert(run(1).toSeq == run(7).toSeq)
  }

  test("clusteringCoefficient: clique 10⁶, tail 0, triangle-with-tail hand value") {
    import spark.implicits._
    // K4 {1,2,3,4}: every node cc = 1.0 (all neighbor pairs closed);
    // node 10 hangs off 1 (degree 1 → 0); node 1 then has degree 4,
    // triangles 3 → 2·3·10⁶ div (4·3) = 500000
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = Graph.clusteringCoefficient(
        (k4 :+ (1L, 10L)).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    assert(got(1L) == ((4L, 500000L)))
    assert(got(2L) == ((3L, 1000000L)))
    assert(got(3L) == ((3L, 1000000L)))
    assert(got(4L) == ((3L, 1000000L)))
    assert(got(10L) == ((1L, 0L)))
  }

  test("ssspBounded: cheap long route beats expensive direct edge") {
    import spark.implicits._
    // 1→4 direct costs 100; 1→2→3→4 costs 3; the cheap route needs 3
    // rounds to propagate, so round counts below the diameter see the
    // expensive edge first — exactly Bellman-Ford's convergence story.
    // Parallel edge 1→4 @ 50 must collapse to the min with the 100.
    val edges = Seq((1L, 4L, 100L), (1L, 4L, 50L), (1L, 2L, 1L),
      (2L, 3L, 1L), (3L, 4L, 1L), (9L, 1L, 1L)).toDF("s", "d", "w")
    def run(r: Int) = Graph.ssspBounded(edges, "s", "d", "w", Seq(1L), r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toSortedMap
    assert(run(1).toSeq == Seq(1L -> 0L, 2L -> 1L, 4L -> 50L))
    assert(run(3).toSeq ==
      Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // converged: extra rounds change nothing; node 9 (upstream of the
    // seed) is never reached and stays absent
    assert(run(6).toSeq == run(3).toSeq)
  }

  test("neighborhoodSketch: exact on small graphs (sparse HLL regime)") {
    import spark.implicits._
    // path 1→2→3→4→5 plus a diamond 10→{11,12}→13 (13 reachable via
    // two routes must count ONCE)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 13L), (12L, 13L)).toDF("src", "dst")
    val got = Graph.neighborhoodSketch(edges, "src", "dst", hops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ≤2-hop out-reach incl. self; HLL is exact at these cardinalities
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 2L, 5L -> 1L,
      10L -> 4L, 11L -> 2L, 12L -> 2L, 13L -> 1L))
  }

  test("neighborhoodSketch: monotone in hops and layout-invariant") {
    import spark.implicits._
    val edges = (1L to 120L).map(i => (i, (i * 7) % 40)).toDF("src", "dst")
    val h1 = Graph.neighborhoodSketch(edges, "src", "dst", hops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Graph.neighborhoodSketch(edges, "src", "dst", hops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1.keySet == h2.keySet)
    h1.keys.foreach(k => assert(h2(k) >= h1(k)))
    val rep = Graph.neighborhoodSketch(edges.repartition(7), "src", "dst",
      hops = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == h2) // register merges are order-invariant
  }

  test("neighborhoodSketch regime: budget comes from executor memory, not driver heap") {
    import org.apache.spark.SparkConf
    // A cluster conf with small executors: the regime must flip to
    // exchange-first even though THIS JVM's (driver) heap is large
    // enough that the old Runtime.maxMemory-based heuristic would have
    // kept map-side combine (the round-10 portability bug).
    val smallExec = new SparkConf()
      .set("spark.executor.memory", "1g")
    val smallBudget = Graph.executorAggBudgetBytes(smallExec, isLocal = false)
    // (1g - 300m reserve) * 0.6 default fraction
    assert(smallBudget == ((1024L - 300L) * 1024 * 1024 * 0.6).toLong)
    // 5M nodes × 1280-byte sketches × 4 slots ≫ a 1 GB executor slice
    val nNodes = 5000000L; val stateBytes = 1280L; val slots = 4L
    assert(Graph.exchangeFirstRegime(nNodes, stateBytes, slots, smallBudget))
    // ... while the driver-heap proxy would (wrongly, for that cluster)
    // stay map-side whenever the test JVM has ≳ 256 GB × 0.12 — assert
    // instead the direct contrast: a big-executor conf keeps map-side
    // for the same workload.
    val bigExec = new SparkConf().set("spark.executor.memory", "256g")
    val bigBudget = Graph.executorAggBudgetBytes(bigExec, isLocal = false)
    assert(!Graph.exchangeFirstRegime(nNodes, stateBytes, slots, bigBudget))
    // local[*]: executor memory conf is IGNORED (driver heap is the
    // executor heap), so the budget measures this JVM
    val localBudget = Graph.executorAggBudgetBytes(smallExec, isLocal = true)
    val fraction = 0.6
    assert(localBudget == (Runtime.getRuntime.maxMemory * fraction).toLong)
    // custom memory fraction honored
    val fracConf = new SparkConf()
      .set("spark.executor.memory", "1g").set("spark.memory.fraction", "0.3")
    assert(Graph.executorAggBudgetBytes(fracConf, isLocal = false) ==
      ((1024L - 300L) * 1024 * 1024 * 0.3).toLong)
  }

  test("saltPlan: flags exactly the planted heavy key with ceil(count/mean) buckets") {
    import spark.implicits._
    // 9 keys × 10 rows + key 99 × 200 rows → mean = 290/10 = 29
    val rows = (1 to 9).flatMap(k => Seq.fill(10)(k.toLong)) ++
      Seq.fill(200)(99L)
    val df = rows.toDF("k")
    val plan = graft.operators.JoinOps.saltPlan(df, "k", skewFactor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(plan.toSeq == Seq((99L, 200L, 29L, 7L))) // ceil(200/29) = 7
  }
}
