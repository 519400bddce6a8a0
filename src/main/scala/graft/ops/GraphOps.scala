package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Graph analytics over relationship tables derived from the warehouse
  * — here the part co-purchase graph: an undirected edge between two
  * parts whenever some order contains both.
  *
  * Triangle counting is the classic "joins done naively explode" graph
  * kernel: enumerating wedges from arbitrary endpoints is Σ deg², which
  * a power-law hub turns quadratic. The scalable form (Suri &
  * Vassilvitskii WWW'11; Cohen's MapReduce graph patterns) orients
  * every edge from its lower-(degree, id) endpoint to its higher one —
  * each node's OUT-degree is then O(√m) — and counts a triangle exactly
  * once from its lowest-rank corner. Both the wedge join and the
  * closing-edge join shuffle on plain node ids; no text or payload
  * rides any exchange.
  */
object GraphOps {

  /** q128 — per-part triangle participation counts (top-20 by count).
    *
    * Pipeline: distinct (order, part) incidence → within-order part
    * pairs (bounded per order by its line count, so edge instances grow
    * linearly with the fact table) → distinct undirected edges →
    * degree-ordered orientation → wedge join on the common lower corner
    * → closing-edge join on the two upper corners → explode the three
    * corners → count per node.
    *
    * The oracle enumerates the same triangles by id-ordered 3-way
    * self-join (a < b < c) — orientation changes WHICH corner finds a
    * triangle, never whether it is found, so the two enumerations agree
    * row-for-row. */
  def triangleCounts(s: SparkSession, dir: String): DataFrame = {
    val it = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val e = graft.Materialize.stable(
      it.as("a").join(it.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct())
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // Orient each edge from its lower (deg, id) endpoint; carry the
    // destination's rank key so wedge endpoints can be ordered the same
    // way without another degree join.
    val uLower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val directed = graft.Materialize.stable(
      e.join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
        .select(
          when(uLower, col("u")).otherwise(col("v")).as("src"),
          when(uLower, col("v")).otherwise(col("u")).as("dst"),
          when(uLower, col("dv")).otherwise(col("du")).as("ddeg")))
    val d1 = directed.select(col("src"), col("dst").as("y"), col("ddeg").as("dy"))
    val d2 = directed.select(col("src"), col("dst").as("z"), col("ddeg").as("dz"))
    val wedges = d1.join(d2, Seq("src"))
      .filter(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
    val tri = wedges
      .join(directed.select(col("src").as("y"), col("dst").as("z")), Seq("y", "z"))
      .select(col("src").as("a"), col("y").as("b"), col("z").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_triangles"))
      .join(deg.select(col("n").as("part"), col("deg").as("degree")), Seq("part"))
      .orderBy(col("n_triangles").desc, col("part"))
      .limit(20)
      .select("part", "degree", "n_triangles")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_triangle_counts" -> triangleCounts)

  val oracleSql: Map[String, String] = Map(
    "q128_triangle_counts" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v
        |      FROM it a JOIN it b ON a.o = b.o AND a.p < b.p),
        |deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS degree FROM
        |        (SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1
        |        JOIN e e2 ON e2.u = e1.v
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (SELECT n AS part, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM
        |       (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |        UNION ALL SELECT c FROM tri) GROUP BY 1)
        |SELECT part, degree, n_triangles
        |FROM pn JOIN deg ON deg.n = pn.part
        |ORDER BY n_triangles DESC, part LIMIT 20""".stripMargin)
}
