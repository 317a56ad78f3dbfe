package graft.mpp

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference-dialect column grammar (`name TYPE [DEFAULT e]
  * [NOT NULL]`, both constraint orders) against regex regressions —
  * especially that NOT NULL is recognized ONLY as a trailing
  * constraint, never inside a DEFAULT expression or literal. */
class ParseColumnsSpec extends AnyFunSuite {

  private def parse(s: String): (StructType, Map[String, String]) = {
    val (ddl, defaults) = MppEngine.parseColumns(s)
    (StructType.fromDDL(ddl), defaults)
  }

  test("plain column") {
    val (sch, d) = parse("a INT")
    assert(sch.head.nullable && d.isEmpty)
  }

  test("trailing NOT NULL") {
    val (sch, _) = parse("a INT NOT NULL")
    assert(!sch.head.nullable)
  }

  test("DEFAULT then NOT NULL") {
    val (sch, d) = parse("a INT DEFAULT 5 NOT NULL")
    assert(!sch.head.nullable && d("a") == "5")
  }

  test("NOT NULL then DEFAULT") {
    val (sch, d) = parse("a INT NOT NULL DEFAULT 5")
    assert(!sch.head.nullable && d("a") == "5")
  }

  test("NOT NULL inside a DEFAULT expression is not a constraint") {
    val (sch, d) = parse("b BOOLEAN DEFAULT (a IS NOT NULL)")
    assert(sch.head.nullable, "column wrongly marked NOT NULL")
    assert(d("b") == "(a IS NOT NULL)", d)
  }

  test("unparenthesized DEFAULT ending in IS NOT NULL is the default, not a constraint") {
    val (sch, d) = parse("b BOOLEAN DEFAULT a IS NOT NULL")
    assert(sch.head.nullable, "column wrongly marked NOT NULL")
    assert(d("b") == "a IS NOT NULL", d)
  }

  test("an unparseable DEFAULT fails at parse time with a clear error") {
    val e = intercept[IllegalArgumentException](parse("x INT DEFAULT 5 +"))
    assert(e.getMessage.contains("DEFAULT expression"), e.getMessage)
  }

  test("NOT NULL inside a string literal default survives intact") {
    val (sch, d) = parse("c TEXT DEFAULT 'not null'")
    assert(sch.head.nullable)
    assert(d("c") == "'not null'", d)
  }

  test("reference types map and constraints combine across a list") {
    val (sch, d) = parse(
      "a INTEGER NOT NULL, d DECIMAL(10,2) DEFAULT f(x, y), " +
        "s VARCHAR DEFAULT 'a,b', u UBIGINT")
    assert(sch.fieldNames.toSeq == Seq("a", "d", "s", "u"))
    assert(!sch("a").nullable && sch("d").nullable)
    assert(sch("a").dataType.typeName == "integer")
    assert(sch("s").dataType.typeName == "string")
    assert(sch("u").dataType.typeName == "long")
    assert(d == Map("d" -> "f(x, y)", "s" -> "'a,b'"))
  }
}
