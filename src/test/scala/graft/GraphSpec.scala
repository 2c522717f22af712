package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank: hand-computed ranks, dangling redistribution (the path the
  * q153 fixture graph never exercises — every fixture node has
  * outlinks), duplicate-edge dedup, self-loops, and the zero-iteration
  * uniform base case.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-12

  test("pageRank matches the hand-iterated damped formula with dangling mass") {
    // A -> B (duplicated: must count once in outdeg), B -> C, C dangling
    val edges = Seq(("A", "B"), ("A", "B"), ("B", "C")).toDF("src", "dst")
    // hand iteration, N=3, d=0.85: each round
    //   pr'(v) = 0.15/3 + 0.85 * (sum_in + dangling/3)
    var pr = Map("A" -> 1.0 / 3, "B" -> 1.0 / 3, "C" -> 1.0 / 3)
    for (_ <- 1 to 3) {
      val dm = pr("C") // C has no outlinks
      pr = Map(
        "A" -> ((1.0 - 0.85) / 3 + 0.85 * (0.0 + dm / 3)),
        "B" -> ((1.0 - 0.85) / 3 + 0.85 * (pr("A") + dm / 3)),
        "C" -> ((1.0 - 0.85) / 3 + 0.85 * (pr("B") + dm / 3)))
    }
    val got = Graph.pageRank(edges, iterations = 3)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("A", "B", "C"))
    pr.foreach { case (n, v) =>
      assert(math.abs(got(n) - v) < eps, s"$n: got ${got(n)}, want $v") }
    // dangling redistribution conserves total mass
    assert(math.abs(got.values.sum - 1.0) < eps, got)
  }

  test("pageRank base cases: zero iterations, self-loop fixed point") {
    val edges = Seq(("A", "B"), ("B", "A")).toDF("src", "dst")
    val uniform = Graph.pageRank(edges, iterations = 0)
      .as[(String, Double)].collect().toMap
    assert(uniform == Map("A" -> 0.5, "B" -> 0.5))
    // a single self-looped node keeps pr = 1 through any iterations:
    // (1-d)/1 + d * 1/1 = 1
    val loop = Graph.pageRank(Seq(("A", "A")).toDF("src", "dst"),
      iterations = 5).as[(String, Double)].collect().toMap
    assert(math.abs(loop("A") - 1.0) < eps, loop)
    // sink-only nodes still appear (targets are nodes too)
    val sink = Graph.pageRank(Seq(("A", "B")).toDF("src", "dst"),
      iterations = 1).as[(String, Double)].collect().toMap
    assert(sink.keySet == Set("A", "B"))
    assert(math.abs(sink.values.sum - 1.0) < eps, sink)
  }

  test("pageRank rejects bad parameters and null edges are dropped") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq(("A", "B")).toDF("src", "dst"), iterations = -1) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq(("A", "B")).toDF("src", "dst"), damping = 1.0) }
    val withNulls = Seq(
      (Option("A"), Option("B")),
      (Option.empty[String], Option("C")),
      (Option("C"), Option.empty[String])
    ).toDF("src", "dst")
    val got = Graph.pageRank(withNulls, iterations = 1)
      .as[(String, Double)].collect().toMap
    // only A -> B survives; C never enters the node set
    assert(got.keySet == Set("A", "B"), got)
  }
}
