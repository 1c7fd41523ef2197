package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-lock the DDL column-list splitter: generated well-formed
  * column definitions — nested generic types, computed expressions with
  * comparison operators and nested parens — must reassemble exactly
  * under split(join(", ")). The generator leans into the shapes that
  * broke earlier revisions: commas inside MAP<K, V>, identifiers ending
  * in a constructor name before `<`, `>` in expressions at depth 0.
  */
class SplitColDefsSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val ident: Gen[String] = Gen.oneOf(
    "id", "escrow", "bitmap", "heat_map", "seat_row", "substruct", "v", "ts")
  private val scalarType: Gen[String] = Gen.oneOf(
    "BIGINT", "STRING", "DOUBLE", "DECIMAL(10,2)", "TIMESTAMP(3)", "INT")
  private def genericType(depth: Int): Gen[String] =
    if (depth <= 0) scalarType
    else Gen.frequency(
      3 -> scalarType,
      1 -> genericType(depth - 1).map(t => s"ARRAY<$t>"),
      1 -> Gen.zip(scalarType, genericType(depth - 1)).map { case (k, v) => s"MAP<$k, $v>" },
      1 -> Gen.zip(ident, genericType(depth - 1), ident, scalarType).map {
        case (a, t1, b, t2) => s"ROW<$a $t1, $b $t2>"
      },
      1 -> genericType(depth - 1).map(t => s"MULTISET<$t>"))
  private val expr: Gen[String] = Gen.oneOf(
    Gen.zip(ident, Gen.choose(1, 99)).map { case (c, n) => s"$c < $n" },
    Gen.zip(ident, ident).map { case (a, b) => s"greatest($a, $b) > 0" },
    Gen.zip(ident, Gen.choose(1, 9)).map { case (c, n) =>
      s"CASE WHEN $c < $n THEN 1 ELSE 0 END" },
    Gen.zip(ident, genericType(1)).map { case (c, t) => s"CAST($c AS $t)" })
  private val colDef: Gen[String] = Gen.frequency(
    4 -> Gen.zip(ident, genericType(2)).map { case (n, t) => s"$n $t" },
    2 -> Gen.zip(ident, expr).map { case (n, e) => s"$n AS $e" },
    1 -> Gen.zip(ident, scalarType).map { case (n, t) =>
      s"$n $t METADATA FROM 'file.path' VIRTUAL" },
    1 -> ident.map(c => s"WATERMARK FOR $c AS $c - INTERVAL '5' SECOND"))

  test("split(join) reassembles generated column-definition lists exactly") {
    val lists = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, colDef))
    forAllSeeded(lists, 800) { parts =>
      val got = FlinkDdl.splitColDefs(parts.mkString(", "))
      assert(got == parts, s"split mangled: ${parts.mkString(" | ")} -> ${got.mkString(" | ")}")
    }
  }

  test("the historical breakers split correctly") {
    assert(FlinkDdl.splitColDefs("k BIGINT, m MAP<STRING, BYTES>, v DOUBLE") ==
      Seq("k BIGINT", "m MAP<STRING, BYTES>", "v DOUBLE"))
    assert(FlinkDdl.splitColDefs(
      "id BIGINT, flag AS escrow < 10, v DOUBLE") ==
      Seq("id BIGINT", "flag AS escrow < 10", "v DOUBLE"))
    assert(FlinkDdl.splitColDefs(
      "n MULTISET<ROW<a INT, b INT>>, d DECIMAL(10,2)") ==
      Seq("n MULTISET<ROW<a INT, b INT>>", "d DECIMAL(10,2)"))
    assert(FlinkDdl.splitColDefs(
      "y AS greatest(a, b) > c, z AS CASE WHEN a < b THEN 1 ELSE 2 END") ==
      Seq("y AS greatest(a, b) > c", "z AS CASE WHEN a < b THEN 1 ELSE 2 END"))
  }
}
