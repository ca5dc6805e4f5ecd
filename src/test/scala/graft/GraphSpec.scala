package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // a→b, a→c, b→c with r0=1000, damping 85/100, hand-computed:
  //   base = 150
  //   round 1: a=150, b=150+85*500 DIV 100=575, c=150+85*1500 DIV 100=1425
  //   round 2: a=150, b=150+85*75 DIV 100=213, c=150+85*650 DIV 100=702
  private val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")

  test("pageRank: one integer-exact round") {
    val r = Graph.pageRank(edges, 1, r0 = 1000L).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 150L, "b" -> 575L, "c" -> 1425L))
  }

  test("pageRank: two rounds (source decays, sink accumulates)") {
    val r = Graph.pageRank(edges, 2, r0 = 1000L).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 150L, "b" -> 213L, "c" -> 702L))
  }

  test("pageRank: duplicate edges collapse before degree counting") {
    val dup = edges.union(Seq(("a", "b")).toDF("src", "dst"))
    val r = Graph.pageRank(dup, 1, r0 = 1000L).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("b") == 575L) // deg(a) stays 2, not 3
  }

  // 1→3, 2→3, 3→4 with h0=10, hand-computed:
  //   iter1: a=(3:20, 4:10), h=(1:20, 2:20, 3:10, 4:0)
  //   iter2: a=(3:40, 4:10), h=(1:40, 2:40, 3:10, 4:0)
  test("hits: two integer-exact rounds (hubs feed authorities feed hubs)") {
    val e = Seq(("1", "3"), ("2", "3"), ("3", "4")).toDF("src", "dst")
    val r = Graph.hits(e, iterations = 2, h0 = 10L).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map("1" -> (40L, 0L), "2" -> (40L, 0L),
      "3" -> (10L, 40L), "4" -> (0L, 10L)))
  }

  test("hits: duplicate edges collapse (no double-counted contributions)") {
    val e = Seq(("1", "3"), ("1", "3"), ("2", "3"), ("3", "4")).toDF("src", "dst")
    val r = Graph.hits(e, iterations = 1, h0 = 10L).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("3") == (10L, 20L)) // auth(3) = h0(1) + h0(2), dup edge ignored
  }

  test("degreeConcentration: top cohort share per side, exact ppm") {
    // src degrees: a=3, b=1; dst degrees: x=2, y=1, z=1.
    // topPct=50 → src top ceil(2·50/100)=1 node (a): 3 of 4 edges = 750000;
    // dst top ceil(3·50/100)=2 nodes (x + y-by-tiebreak): 3 of 4 = 750000
    val e = Seq(("a", "x"), ("a", "y"), ("a", "z"), ("b", "x")).toDF("src", "dst")
    val out = Graph.degreeConcentration(e, topPct = 50)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("src") == ((2L, 4L, 750000L, 3L)))
    assert(out("dst") == ((3L, 4L, 750000L, 2L)))
  }

  test("triangleCount: K4 closes every wedge (clustering = 1e6 ppm exactly)") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val r = Graph.triangleCount(k4).collect().head
    // 4 nodes, 6 edges, wedges = 4 * C(3,2) = 12, triangles = C(4,3) = 4
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((4L, 6L, 12L, 4L, 1000000L)))
  }

  test("triangleCount: open path has wedges but no triangles") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.triangleCount(path).collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 0L, 0L)))
  }

  test("triangleCount: direction, duplicates, and self-loops are ignored") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = Graph.triangleCount(messy).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3)) == ((3L, 3L, 1L)))
  }

  test("khopFrontier: BFS levels are shortest-path distances (path graph, one per hop)") {
    val path = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")).toDF("src", "dst")
    val seed = Seq("1").toDF("v")
    val r = Graph.khopFrontier(path, seed, hops = 3).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("khopFrontier: a cycle never revisits (frontier drains to zero)") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val seed = Seq("a").toDF("v")
    val r = Graph.khopFrontier(cycle, seed, hops = 2).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    // hop 1 reaches b AND c (undirected closure); hop 2 finds nothing new
    assert(r == Map(0 -> 1L, 1 -> 2L, 2 -> 0L))
  }

  test("degreeAssortativity: a star is exactly -1 (hub wires only to leaves)") {
    // deg a=3, leaves=1; edge-end pairs (3,1)x3 + (1,3)x3:
    // n=6 sx=sy=12 qx=qy=30 pxy=18 → cov=-36, vx=vy=36 → r = -1
    val star = Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("src", "dst")
    val r = Graph.degreeAssortativity(star).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -1.0)
  }

  test("degreeAssortativity: a regular graph has zero degree variance (NULL)") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val r = Graph.degreeAssortativity(k4).collect().head
    assert(r.getLong(0) == 6L)
    assert(r.isNullAt(1))
  }

  test("localClusteringCensus: K4 puts every node in the perfect-closure band") {
    // every node: d=3, t=3 → ppm = 2e6*3/(3*2) = 1e6 → band 10
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val r = Graph.localClusteringCensus(k4).collect()
    assert(r.length == 1)
    assert((r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
      == ((10L, 4L, 1000000L)))
  }

  test("localClusteringCensus: open path center has wedges but zero closure; leaves excluded") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.localClusteringCensus(path).collect()
    assert(r.length == 1) // only node 2 has d >= 2
    assert((r.head.getLong(0), r.head.getLong(1), r.head.getLong(2))
      == ((0L, 1L, 0L)))
  }

  test("richClubProfile: clique-plus-leaves — the club is the clique, the p90 club is the hub alone") {
    // clique {a,b,c,d} + leaves e,f on a: degrees a=5, b=c=d=3, e=f=1
    // p50/p75 threshold = 3 → club {a,b,c,d}: 6 internal edges, density 1e6
    // p90 threshold = 5 → club {a}: no edges
    val clique = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("a", "e"), ("a", "f")).toDF("src", "dst")
    val r = Graph.richClubProfile(clique).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(50L) == ((3L, 4L, 6L, 1000000L)))
    assert(r(75L) == ((3L, 4L, 6L, 1000000L)))
    assert(r(90L) == ((5L, 1L, 0L, 0L)))
  }
}
