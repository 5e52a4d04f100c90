package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degree-oriented triangle counting vs the naive reference. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def nodeCounts(edges: (Long, Long)*): Map[Long, Long] =
    Triangles.perNode(edges.toDF("s", "d"), col("s"), col("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one triangle: every corner counts once") {
    assert(nodeCounts((1L, 2L), (2L, 3L), (3L, 1L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4: four triangles, each node in three") {
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(nodeCounts(k4: _*) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicates, reverse edges and loops do not inflate counts") {
    assert(nodeCounts((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("path and star graphs have no triangles") {
    assert(nodeCounts((1L, 2L), (2L, 3L), (3L, 4L)) == Map.empty)
    assert(nodeCounts((9L, 1L), (9L, 2L), (9L, 3L)) == Map.empty)
  }

  test("matches the naive reference on a deterministic sparse graph") {
    val edges = (1L to 200L).map(i => (i % 29, (i * i + 3) % 29)).distinct
    val undirected = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val ref = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val nodes = undirected.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if undirected((i, j)) && undirected((j, k)) && undirected((i, k))
    } { ref(i) += 1; ref(j) += 1; ref(k) += 1 }
    assert(nodeCounts(edges: _*) == ref.toMap)
  }
}
