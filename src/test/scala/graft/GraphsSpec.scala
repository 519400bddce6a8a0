package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the adaptive connected-components split (r16): the local
  * union-find fast path and the distributed min-label propagation loop
  * must be indistinguishable in results — same vertices, same
  * component = min-reachable-id labels — on adversarial shapes
  * (chains whose diameter forces many propagation rounds, stars,
  * merged clusters, isolated pairs) and on seeded random graphs. */
class GraphsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def both(edges: Seq[(Long, Long)]): (Map[Long, Long], Map[Long, Long]) = {
    val p = edges.toDF("src", "dst")
    val sym = graft.Materialize.stable(
      p.union(p.select(col("dst"), col("src"))).toDF("src", "dst"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (toMap(graft.llm.Graphs.localComponents(sym)),
      toMap(graft.llm.Graphs.propagatedComponents(sym)))
  }

  test("local union-find equals distributed propagation on adversarial shapes") {
    // a 30-long chain (diameter forces ~30 propagation rounds), with
    // the MIN vertex at the far end so labels must travel the whole way
    val chain = (0 until 30).map(i => (100L - i, 99L - i))
    // a star, two clusters merged by one bridge, an isolated pair
    val star = (1 to 10).map(i => (500L, 500L + i))
    val merge = Seq((200L, 201L), (210L, 211L), (201L, 210L))
    val pair = Seq((900L, 901L))
    val (loc, dist) = both(chain ++ star ++ merge ++ pair)
    assert(loc == dist, "gate must be invisible in results")
    assert(loc(100L) == 70L && loc(71L) == 70L, "chain label = min id")
    assert(loc(510L) == 500L && loc(211L) == 200L && loc(901L) == 900L)
  }

  test("spark.graft.localCcEdges flips the local-vs-distributed gate " +
      "on the same fixture, results unchanged (r16 verdict item 4)") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val p = edges.toDF("src", "dst")
    // default: 3 edges <= 200k gate -> local
    assert(graft.llm.Graphs.localCcGate(spark) ==
      graft.llm.Graphs.SmallGraphEdges)
    val viaDefault = graft.llm.Graphs.connectedComponents(p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDistributed = try {
      // gate 0 -> even a 3-edge graph takes the distributed loop
      spark.conf.set("spark.graft.localCcEdges", "0")
      assert(graft.llm.Graphs.localCcGate(spark) == 0L)
      graft.llm.Graphs.connectedComponents(p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally spark.conf.unset("spark.graft.localCcEdges")
    assert(graft.llm.Graphs.localCcGate(spark) ==
      graft.llm.Graphs.SmallGraphEdges, "unset must restore the default")
    assert(viaDefault == viaDistributed, "gate must be invisible in results")
    assert(viaDefault == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("local union-find equals distributed propagation on seeded random graphs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val n = 400
      val edges = Seq.fill(300)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val (loc, dist) = both(edges)
      assert(loc == dist, s"trial $trial diverged")
      // labels are genuine minima: no vertex maps above itself
      assert(loc.forall { case (id, c) => c <= id }, s"trial $trial non-min label")
    }
  }
}
