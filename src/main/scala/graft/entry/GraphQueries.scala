package graft.entry

import graft.graph.Graph
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics driver queries: entity-importance ranking over the
  * customer→supplier purchase graph (who supplies the most-connected
  * customers). Numeric discipline documented on [[Graph.pageRank]]: the
  * per-iteration contribution sums are fixed-point LONG sums (order-
  * independent), and the damping constants are interpolated from the
  * SAME Scala doubles the plan uses so the oracle parses identical
  * literals.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  private val PrIters = 3
  private val Damping = 0.85
  private val Scale = "1000000000000.0" // 10^12 fixed-point, both engines

  val queries: Map[String, Q] = Map(
    // nodes: customers (2k) and suppliers (2k+1) — disjoint id spaces;
    // one distinct edge per (customer, supplier) purchase relationship
    "q_pagerank" -> ((s, d) => {
      val e = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
      Graph.pageRank(e, col("src"), col("dst"), PrIters, Damping)
    }))

  val oracle: Map[String, String] = Map(
    "q_pagerank" -> {
      val steps = (1 to PrIters).map { i =>
        s"""c$i AS (
           |  SELECT e.dst AS node,
           |         sum(CAST(floor((p.pr / CAST(o.od AS DOUBLE)) * $Scale) AS BIGINT)) AS sq
           |  FROM e JOIN p${i - 1} p ON e.src = p.node
           |         JOIN outdeg o ON e.src = o.src
           |  GROUP BY 1),
           |p$i AS (
           |  SELECT nodes.node,
           |         ${1.0 - Damping} / n.nn
           |           + $Damping * (CAST(COALESCE(c$i.sq, 0) AS DOUBLE) / $Scale) AS pr
           |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node CROSS JOIN n)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS src,
         |         CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  -- NULL endpoints carry no rankable identity: pageRank drops
         |  -- them before edge-dedup, so the oracle must too
         |  WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
         |outdeg AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
         |p0 AS (SELECT node, 1.0 / n.nn AS pr FROM nodes CROSS JOIN n),
         |$steps
         |SELECT node, pr FROM p$PrIters""".stripMargin
    })
}
