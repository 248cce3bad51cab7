package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards on the driver registry itself — the invariants the
  * correctness gate assumes but nothing previously enforced at test
  * time. (The SURVEY §2 ↔ registry key sync is checked by a comm(1)
  * one-liner; these are the query↔oracle invariants.)
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries whose result is not SQL-expressible; the driver records a
    * weaker rows-only check for these, and SURVEY §2 declares each.
    * Empty since round 12: q_media_features gained a formula-derived
    * VALUES oracle. */
  private val declaredRowsOnly = Set.empty[String]

  test("every registered query has an oracle or a declared rows-only " +
      "exemption") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == declaredRowsOnly,
      s"queries without oracle beyond the declared set: " +
        s"${(missing -- declaredRowsOnly).toSeq.sorted}")
  }

  test("no orphan oracles (an oracle without a query would silently " +
      "never run)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"orphan oracles: ${orphans.toSeq.sorted}")
  }

  /** Single-row global aggregates — ordering is vacuous. */
  private val singleRowOutputs =
    Set("q_ndv_profile", "q_snapshot_diff", "q_small_qty_revenue",
      "q_disjunctive_revenue", "q_zipf_fit", "q_forecast_revenue",
      "q_partition_skew", "q_psi_drift")

  test("each registry key is declared exactly once in the source (a " +
      "duplicate in a Map literal silently DROPS the earlier query — " +
      "the built Map cannot reveal it, so the guard reads the source)") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")))
    val Array(qPart, oPart) = src.split("def oracleSql", 2)
    val key = """"(q[a-z0-9_]+)" *->""".r
    for ((name, part) <- Seq("queries" -> qPart, "oracleSql" -> oPart)) {
      val keys = key.findAllMatchIn(part).map(_.group(1)).toSeq
      val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
      assert(dups.isEmpty, s"duplicate $name keys: ${dups.sorted}")
    }
  }

  test("oracle SQL ends in an explicit ORDER BY (the compare sorts " +
      "rows, but deterministic output is the §6 contract)") {
    val unordered = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      sql.toUpperCase.contains("ORDER BY")
    }.keySet -- singleRowOutputs
    assert(unordered.isEmpty, s"oracles without ORDER BY: " +
      s"${unordered.toSeq.sorted}")
  }
}
