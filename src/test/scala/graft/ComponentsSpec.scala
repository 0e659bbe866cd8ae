package graft

import graft.dedup.Components

/** Min-label-propagation connected components: correctness on known
  * graphs (including a path graph that needs several propagation
  * rounds), partition invariance, and the empty case. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 3): Map[Long, Long] =
    Components.connectedComponents(
        edges.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles and an isolated edge label to their min ids") {
    val got = run(Seq((2L, 1L), (2L, 3L), (1L, 3L), (10L, 11L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L))
  }

  test("path graph converges across multiple propagation rounds") {
    // min label must travel the full diameter: 9 -> 8 -> ... -> 1
    val path = (1L until 9L).map(i => (i + 1, i))
    val got = run(path)
    assert(got.keySet == (1L to 9L).toSet)
    assert(got.values.forall(_ == 1L), s"labels: $got")
  }

  test("result independent of input partitioning") {
    val edges = Seq((7L, 3L), (3L, 9L), (20L, 21L), (21L, 22L), (1L, 2L))
    assert(run(edges, parts = 1) == run(edges, parts = 8))
  }

  test("empty edge list yields an empty labeling") {
    assert(run(Seq.empty) == Map.empty)
  }

  // ---- large-star/small-star contraction ----

  private def runStar(edges: Seq[(Long, Long)],
                      parts: Int = 3): (Map[Long, Long], Int) = {
    val (df, rounds) = Components.starContraction(
      edges.toDF("a", "b").repartition(parts), "a", "b")
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("star contraction matches min-label on known graphs") {
    val cases = Seq(
      Seq((2L, 1L), (2L, 3L), (1L, 3L), (10L, 11L), (5L, 6L)),
      Seq((7L, 3L), (3L, 9L), (20L, 21L), (21L, 22L), (1L, 2L)),
      (1L until 9L).map(i => (i + 1, i)))
    cases.foreach { edges =>
      assert(runStar(edges)._1 == run(edges), s"edges: $edges")
    }
  }

  test("star contraction matches min-label on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(runStar(edges)._1 == run(edges))
  }

  test("star contraction needs O(log d) rounds on a deep path graph") {
    // a 128-link chain: min-label propagation would need ~127 rounds;
    // the contraction must finish in far fewer (log2(128)=7, with the
    // alternation overhead still well under 20)
    val chain = (1L until 128L).map(i => (i + 1, i))
    val (labels, rounds) = runStar(chain)
    assert(labels.keySet == (1L to 128L).toSet)
    assert(labels.values.forall(_ == 1L))
    assert(rounds <= 20, s"took $rounds rounds")
  }

  test("star contraction empty edge list yields an empty labeling") {
    assert(runStar(Seq.empty)._1 == Map.empty)
  }
}
