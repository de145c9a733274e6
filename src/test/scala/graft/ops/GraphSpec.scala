package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pageRankBp matches the hand-computed recurrence on a path graph") {
    // a—b—c undirected: deg(a)=deg(c)=1, deg(b)=2, r0=10000 everywhere.
    // iter1: a,c = 1500 + (85*10000) div 200 = 5750
    //        b   = 1500 + 8500 + 8500       = 18500
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val und = Graph.undirect(edges)
    assert(und.count() == 4)
    val r1 = Graph.pageRankBp(und, 1)
      .as[(String, Long)].collect().toMap
    assert(r1 == Map("a" -> 5750L, "b" -> 18500L, "c" -> 5750L))
    // iter2 from r1: a,c = 1500 + (85*18500) div 200 = 1500 + 7862 = 9362
    //               b    = 1500 + 2*((85*5750) div 100) = 1500+2*4887 = 11274
    val r2 = Graph.pageRankBp(und, 2)
      .as[(String, Long)].collect().toMap
    assert(r2 == Map("a" -> 9362L, "b" -> 11274L, "c" -> 9362L))
  }

  test("pageRankBp zero iterations returns the uniform base and keeps nodes") {
    val und = Graph.undirect(Seq((1L, 2L), (2L, 3L), (4L, 4L)).toDF("src", "dst"))
    val r0 = Graph.pageRankBp(und, 0).as[(Long, Long)].collect().toMap
    assert(r0 == Map(1L -> 10000L, 2L -> 10000L, 3L -> 10000L, 4L -> 10000L))
  }

  test("undirect dedupes reciprocal and repeated edges") {
    val e = Seq(("x", "y"), ("y", "x"), ("x", "y")).toDF("src", "dst")
    assert(Graph.undirect(e).count() == 2)
  }
}
