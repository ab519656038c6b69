package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Documentation counts derive from the code, not hand-maintenance: the
  * README's query tally and COVERAGE.md's per-query oracle markers must
  * agree with `SparkEntry.queries`/`oracleSql` or this spec fails — count
  * drift (adding a query without documenting it, or documenting an oracle
  * that doesn't exist) is impossible to merge silently.
  */
class HarnessCountsSpec extends AnyFunSuite {
  private val queryNames = SparkEntry.queries.keySet
  private val oracleNames = SparkEntry.oracleSql.keySet

  test("every oracle belongs to a registered query") {
    assert(oracleNames.subsetOf(queryNames),
      s"orphan oracles: ${(oracleNames -- queryNames).toSeq.sorted}")
  }

  test("README carries the generated query/oracle counts") {
    val readme = Files.readString(Path.of("README.md"))
    val expected =
      s"${queryNames.size} named queries (${oracleNames.size} with DuckDB oracle SQL)"
    assert(readme.contains(expected),
      s"README.md must contain the generated counts line: '$expected'")
    assert(readme.contains(s"all ${queryNames.size} queries"),
      s"README.md bench section must reference all ${queryNames.size} queries")
  }

  test("COVERAGE.md markers agree with the harness maps") {
    val cov = Files.readString(Path.of("COVERAGE.md"))
    val qMarks = "q:`([a-z0-9_]+)`".r.findAllMatchIn(cov).map(_.group(1)).toSet
    val rMarks = "r:`([a-z0-9_]+)`".r.findAllMatchIn(cov).map(_.group(1)).toSet
    // q: = DuckDB-oracled, r: = rows-only — each marker must be truthful
    val falselyOracled = qMarks.filterNot(oracleNames.contains)
    assert(falselyOracled.isEmpty,
      s"marked q: but no oracle exists: ${falselyOracled.toSeq.sorted}")
    val wrongRowsOnly =
      rMarks.filter(n => !queryNames.contains(n) || oracleNames.contains(n))
    assert(wrongRowsOnly.isEmpty,
      s"marked r: but oracled or unregistered: ${wrongRowsOnly.toSeq.sorted}")
    // and every harness query must be documented under exactly one marker
    val undocumented = queryNames -- qMarks -- rMarks
    assert(undocumented.isEmpty,
      s"queries missing from COVERAGE.md: ${undocumented.toSeq.sorted}")
  }
}
