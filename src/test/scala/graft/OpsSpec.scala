package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{FieldSelection, Joins, KeyFieldSort, SecondarySort, TextOps}

class KeyFieldSortSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def sorted(lines: Seq[String], opts: String, sep: String = "|") =
    lines.toDF("line")
      .orderBy(KeyFieldSort.sortKeys(col("line"), opts, sep) :+ col("line").asc: _*)
      .as[String].collect().toSeq

  test("numeric sort parses leading numeric prefix like GNU sort -n") {
    val lines = Seq("a|123abc", "b|45", "c|xyz", "d|-2tail", "e|12.5x")
    assert(sorted(lines, "-k2,2n") ==
      Seq("d|-2tail", "c|xyz", "e|12.5x", "b|45", "a|123abc"))
  }

  test("reverse numeric on field 2") {
    val lines = Seq("x|1|9", "y|3|1", "z|2|5")
    assert(sorted(lines, "-k2,2nr") == Seq("y|3|1", "z|2|5", "x|1|9"))
  }

  test("multiple keys compose: field 2 asc then field 3 numeric desc") {
    val lines = Seq("a|k|2", "b|k|10", "c|j|1")
    assert(sorted(lines, "-k2,2 -k3,3nr") == Seq("c|j|1", "b|k|10", "a|k|2"))
  }

  test("char offsets within a field") {
    // -k1.2,1.3: chars 2-3 of field 1
    val lines = Seq("zaa", "abz", "bba")
    assert(sorted(lines, "-k1.2,1.3") == Seq("zaa", "bba", "abz"))
  }

  test("missing field sorts as empty string, not error (ANSI-safe)") {
    val lines = Seq("only", "two|b")
    assert(sorted(lines, "-k2,2") == Seq("only", "two|b"))
  }
}

class JoinsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("overrideJoin: rightmost source wins per key") {
    val a = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "v")
    val b = Seq((2, "b2"), (3, "b3")).toDF("k", "v")
    val c = Seq((3, "c3")).toDF("k", "v")
    val out = Joins.overrideJoin("k", a, b, c)
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "a1", 2 -> "b2", 3 -> "c3"))
  }

  test("overrideJoin: within the preferred source the first row wins") {
    val a = Seq((1, "first"), (1, "second")).toDF("k", "v").coalesce(1)
    val out = Joins.overrideJoin("k", a).as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "first")))
  }

  test("inner requires the key in every source; outer keeps all keys") {
    val a = Seq((1, "a"), (2, "a")).toDF("k", "va")
    val b = Seq((2, "b"), (3, "b")).toDF("k", "vb")
    assert(Joins.inner("k", a, b).select("k").as[Int].collect().toSeq == Seq(2))
    assert(Joins.outer("k", a, b).select("k").as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3))
  }
}

class TextOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("tokenCount splits on whitespace and drops empties") {
    val df = Seq("a b  a", "b").toDF("t")
    val out = TextOps.tokenCount(df, col("t"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 2L))
  }

  test("fieldselection 2- keeps trailing fields") {
    val df = Seq("1|x|y").toDF("line")
    val out = df.select(FieldSelection.select(col("line"), "2-", "|"))
      .as[String].collect()
    assert(out.toSeq == Seq("x|y"))
  }

  test("secondary sort ranks within group") {
    val df = Seq((1, "b"), (1, "a"), (2, "z")).toDF("g", "v")
    val out = SecondarySort.ranked(df, col("g"), col("v").asc)
      .select("g", "v", "rn").as[(Int, String, Int)].collect().toSet
    assert(out == Set((1, "a", 1), (1, "b", 2), (2, "z", 1)))
  }
}
