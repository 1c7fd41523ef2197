package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden-file checks for deterministic queries whose semantics are not
  * SQL-expressible in the DuckDB oracle (hash selection). The golden CSVs
  * were produced by the same implementation at a pinned fixture scale and
  * committed — any change to the kernel's hash/selection contract fails
  * here instead of silently drifting.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Every declared query therefore carries either a DuckDB oracle entry or
  // one of these committed goldens (regenerate ONLY on intentional contract
  // change: sbt "runMain graft.tools.MakeGolden", then review the diff).
  graft.tools.Golden.pinned.foreach { name =>
    test(s"$name matches the committed sf0.01 golden file") {
      val got = graft.tools.Golden.canonical(
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.01"))
      val expected = scala.io.Source
        .fromInputStream(getClass.getResourceAsStream(s"/golden/${name}_sf001.csv"))
        .getLines().drop(1).toVector
      assert(got.length == expected.length,
        s"row count drift: got ${got.length}, golden ${expected.length}")
      got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"row $i drifted")
      }
    }
  }

  test("q48 winnowing fingerprints match the committed sf0.01 golden file") {
    val got = SparkEntry.queries("q48_winnow_fingerprints")(spark, "/root/testdata/sf0.01")
      .orderBy("doc_id")
      .collect()
      .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)},${r.getLong(3)}")
    val expected = scala.io.Source
      .fromInputStream(getClass.getResourceAsStream("/q48_golden_sf001.csv"))
      .getLines().drop(1).toArray
    assert(got.length == expected.length,
      s"row count drift: got ${got.length}, golden ${expected.length}")
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"row $i drifted")
    }
  }
}
