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
  // The DECLARED queries are contract-oracled (round 12); the pins run
  // the underlying KERNEL surfaces those contracts certify.
  graft.tools.Golden.pinned.foreach { name =>
    test(s"$name kernel surface matches the committed sf0.01 golden file") {
      val got = graft.tools.Golden.canonical(
        graft.tools.Golden.kernelSurface(name)(spark, "/root/testdata/sf0.01"))
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

  // q48 moved off its golden CSV in round 12: it is now oracled on the
  // Schleimer GUARANTEE contract (shared substring ≥ w+k−1 ⇒ shared
  // fingerprint) — an exact cross-engine check, stronger than a pin.
}
