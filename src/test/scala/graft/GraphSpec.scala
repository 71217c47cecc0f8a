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

  implicit class MapOps(m: Map[Long, Long]) {
    def toSortedMap: scala.collection.immutable.SortedMap[Long, Long] =
      scala.collection.immutable.SortedMap.from(m)
  }
  implicit class ArrOps(a: Array[(Long, Long)]) {
    def toSortedMap: scala.collection.immutable.SortedMap[Long, Long] =
      scala.collection.immutable.SortedMap.from(a)
  }
}
