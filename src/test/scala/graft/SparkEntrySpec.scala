package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-contract guards: the driver's correctness gate treats a
  * `queries` entry without an `oracleSql` twin as an error (observed in
  * round 3: six `no_oracle` entries), and compares COLUMN NAMES sorted —
  * so the surfaces must stay key-aligned. Pure map checks, no Spark. */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracles: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
  }

  test("oracle SQL is non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // statement separator check must ignore ';' inside string literals
      // (e.g. regex character classes like '[.,;:!?]')
      val outsideLiterals = sql.replaceAll("'[^']*'", "''")
      assert(!outsideLiterals.contains(";"),
        s"$name: oracle must be one statement")
    }
  }
}
