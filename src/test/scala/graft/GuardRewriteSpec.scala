package graft

import org.scalatest.funsuite.AnyFunSuite

/** Negative + shape coverage for the oracle guard-CTE rewrite
  * (`SparkEntry.guardTable`) — the mechanical seam that makes every
  * DuckDB oracle read through the same quarantine the engine applies
  * at `Tables.documents`/`events`/`embeddings` (r15 VERDICT item 8,
  * r15 ADVICE item 1). The rewrite is lexical, so the spec pins both
  * the valid splices AND the loud failures for every oracle shape the
  * rename cannot handle (string-literal mentions, alias collisions,
  * shadowing CTEs). */
class GuardRewriteSpec extends AnyFunSuite {
  private val Cte = "__doc AS (SELECT * FROM documents WHERE doc_id IS NOT NULL)"
  private def guard(sql: String): String =
    SparkEntry.guardTable(sql, "documents", "__doc", Cte)

  test("SELECT oracle gets the guard CTE prepended, token renamed") {
    val out = guard("SELECT count(*) AS n FROM documents")
    assert(out == s"WITH $Cte\nSELECT count(*) AS n FROM __doc")
  }

  test("oracle without the table is returned verbatim") {
    val sql = "SELECT 1 AS one FROM lineitem"
    assert(guard(sql) eq sql)
  }

  test("WITH oracle splices the guard CTE first, keeps the others") {
    val out = guard("WITH t AS (SELECT doc_id FROM documents) SELECT * FROM t")
    assert(out == s"WITH $Cte,t AS (SELECT doc_id FROM __doc) SELECT * FROM t")
  }

  test("WITH RECURSIVE oracle keeps the RECURSIVE head") {
    val out = guard(
      "WITH RECURSIVE r AS (SELECT 1 AS i UNION ALL SELECT i+1 FROM r WHERE i < 3) " +
        "SELECT * FROM r CROSS JOIN documents")
    assert(out.startsWith(s"WITH RECURSIVE $Cte,r AS ("))
    assert(out.endsWith("CROSS JOIN __doc"))
  }

  test("leading whitespace and lowercase 'with' still splice (r15 ADVICE)") {
    val out = guard("  \n with t AS (SELECT * FROM documents) SELECT * FROM t")
    assert(out == s"with $Cte,t AS (SELECT * FROM __doc) SELECT * FROM t")
  }

  test("every occurrence renames — joins, subqueries, qualified columns") {
    val out = guard(
      "SELECT d.doc_id FROM documents d JOIN documents e ON d.doc_id = e.doc_id " +
        "WHERE d.doc_id IN (SELECT doc_id FROM documents)")
    val body = out.stripPrefix(s"WITH $Cte\n") // only the CTE reads raw
    assert(!body.contains("documents"))
    assert(body.sliding(5).count(_ == "__doc") >= 3)
  }

  test("partial-word matches are NOT renamed (documents_v2 stays intact)") {
    val out = guard("SELECT * FROM documents_v2 CROSS JOIN documents")
    assert(out.contains("documents_v2"))
    assert(out.endsWith("CROSS JOIN __doc"))
  }

  test("table name inside a string literal fails loudly, not corrupts") {
    val ex = intercept[IllegalArgumentException](guard(
      "SELECT * FROM documents WHERE source = 'documents'"))
    assert(ex.getMessage.contains("string literal"))
  }

  test("oracle already naming the guard alias fails (double rewrite)") {
    val ex = intercept[IllegalArgumentException](guard(
      "WITH __doc AS (SELECT 1 AS x) SELECT * FROM __doc JOIN documents USING (x)"))
    assert(ex.getMessage.contains("__doc"))
  }

  test("oracle defining a CTE that shadows the table name fails") {
    val ex = intercept[IllegalArgumentException](guard(
      "WITH documents AS (SELECT 1 AS doc_id) SELECT * FROM documents"))
    assert(ex.getMessage.contains("CTE named documents"))
  }

  test("non-SELECT/WITH statements are rejected, not mangled") {
    val ex = intercept[IllegalArgumentException](guard(
      "INSERT INTO t SELECT * FROM documents"))
    assert(ex.getMessage.contains("must start with SELECT or WITH"))
  }

  test("all shipped oracles survive the rewrite invariants end-to-end") {
    // oracleSql applies guardEmbeddings to every entry at build time — a
    // single violating oracle would throw here. Also pin that every
    // guarded oracle gained its CTE and every raw-exempt one did not.
    val oracles = SparkEntry.oracleSql
    assert(oracles.size >= 290)
    val raw = Set("q_embed_quarantine", "q_doc_quarantine", "q_event_quarantine")
    raw.foreach { n =>
      val sql = oracles(n)
      assert(!sql.contains("__emb") && !sql.contains("__doc") &&
        !sql.contains("__evt"), s"$n must read the raw table")
    }
    val guarded = oracles.filter { case (n, sql) =>
      !raw(n) && (sql.contains("__doc") || sql.contains("__evt") || sql.contains("__emb"))
    }
    assert(guarded.nonEmpty)
    guarded.values.foreach { sql =>
      assert(sql.regionMatches(true, 0, "WITH", 0, 4))
    }
  }
}
