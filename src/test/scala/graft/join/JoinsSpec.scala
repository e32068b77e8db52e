package graft.join

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-family semantics, including the as-of join against a
  * hand-computed example (SURVEY.md §2.3).
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("semi/anti partition the left side") {
    val l = Seq(1, 2, 3, 4).toDF("id")
    val r = Seq(2, 4, 6).toDF("rid")
    val semi = Joins.semi(l, r, col("id") === col("rid")).as[Int].collect().sorted.toSeq
    val anti = Joins.anti(l, r, col("id") === col("rid")).as[Int].collect().sorted.toSeq
    assert(semi == Seq(2, 4) && anti == Seq(1, 3))
  }

  test("enrich broadcasts the dim and keeps fact rows") {
    val fact = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val dim = Seq((1, "one"), (2, "two")).toDF("dk", "name")
    val out = Joins.enrich(fact, dim, col("k") === col("dk"))
    assert(out.count() == 2)
    // the physical plan must contain a broadcast exchange (no fact shuffle)
    val phys = out.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") || phys.contains("BroadcastExchange"))
  }

  test("asOf picks the latest right row at-or-before each left ts") {
    val left = Seq(
      ("u1", 10, "e1"), ("u1", 25, "e2"), ("u2", 5, "e3")).toDF("k", "lts", "ev")
    val right = Seq(
      ("u1", 5, 100), ("u1", 20, 200), ("u1", 30, 300), ("u2", 7, 400)).toDF("k", "rts", "price")
    val out = Joins.asOf(left, col("lts"), right, col("rts"),
        keys = Seq("k"), payload = Seq("price"), rightTieBreak = col("price"))
      .select("ev", "price").as[(String, Option[Int])].collect().toMap
    assert(out == Map("e1" -> Some(100), "e2" -> Some(200), "e3" -> None))
  }

  test("saltedJoin equals the plain join (skew-spread is semantics-free)") {
    val left = Seq.tabulate(100)(i => (if (i < 90) "hot" else s"k$i", i)).toDF("k", "v")
    val right = Seq(("hot", 1), ("k95", 2)).toDF("k", "r")
    val plain = left.join(right, Seq("k")).select("k", "v", "r")
      .as[(String, Int, Int)].collect().toSet
    val salted = Joins.saltedJoin(left, right, Seq("k"), salt = 8)
      .select("k", "v", "r").as[(String, Int, Int)].collect().toSet
    assert(salted == plain && plain.size == 91)
  }

  test("asOf tie-break: equal timestamps pick the largest tieBreak") {
    val left = Seq(("k", 10, "e")).toDF("k", "lts", "ev")
    val right = Seq(("k", 10, 1), ("k", 10, 9), ("k", 10, 5)).toDF("k", "rts", "p")
    val out = Joins.asOf(left, col("lts"), right, col("rts"),
        keys = Seq("k"), payload = Seq("p"), rightTieBreak = col("p"))
      .select("p").as[Int].collect().toSeq
    assert(out == Seq(9))
  }

  test("blockedFuzzyJoin: only same-block pairs matched, dist threshold inclusive") {
    val names = Seq((1L, "cold ring"), (2L, "old ring"), (3L, "red ring"),
      (4L, "red bolt"), (5L, "colossal ring")).toDF("id", "name")
    val blk = element_at(split(col("name"), " ", -1), -1)
    val out = Joins.blockedFuzzyJoin(names, col("id"), col("name"), blk, 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // cold~old dist 1; old~red dist 2 (boundary kept); cold~red dist 3 cut;
    // red bolt blocks apart from every ring; colossal~cold dist 5 cut
    assert(out == Set((1L, 2L, 1L), (2L, 3L, 2L)))
  }
}
