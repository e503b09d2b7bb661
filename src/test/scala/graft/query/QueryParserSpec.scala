package graft.query

import org.scalatest.funsuite.AnyFunSuite

class QueryParserSpec extends AnyFunSuite {

  test("simple equality") {
    assert(QueryParser.parse("TITLE == 'abacus'") == Term("TITLE", Op.EQ, "abacus"))
  }

  test("and / or precedence: a or b and c == a or (b and c)") {
    val e = QueryParser.parse("A == '1' or B == '2' and C == '3'")
    assert(e == Or(Seq(
      Term("A", Op.EQ, "1"),
      And(Seq(Term("B", Op.EQ, "2"), Term("C", Op.EQ, "3"))))))
  }

  test("keywords case-insensitive, && || forms") {
    val a = QueryParser.parse("A == '1' AND B == '2'")
    val b = QueryParser.parse("A == '1' && B == '2'")
    assert(a == b)
  }

  test("parentheses group") {
    val e = QueryParser.parse("(A == '1' or B == '2') and C == '3'")
    assert(e == And(Seq(
      Or(Seq(Term("A", Op.EQ, "1"), Term("B", Op.EQ, "2"))),
      Term("C", Op.EQ, "3"))))
  }

  test("not pushes to leaves (De Morgan)") {
    val e = QueryParser.parse("not (A == '1' or B =~ 'x.*')")
    assert(e == And(Seq(Term("A", Op.NE, "1"), Term("B", Op.NRE, "x.*"))))
  }

  test("double negation cancels") {
    assert(QueryParser.parse("not not A == '1'") == Term("A", Op.EQ, "1"))
  }

  test("reversed comparison normalizes with reflected op") {
    assert(QueryParser.parse("'5' < F") == Term("F", Op.GT, "5"))
    assert(QueryParser.parse("'x' == F") == Term("F", Op.EQ, "x"))
  }

  test("numeric literals and range ops") {
    assert(QueryParser.parse("N >= 100 and N < 300") ==
      And(Seq(Term("N", Op.GE, "100"), Term("N", Op.LT, "300"))))
  }

  test("function call f:between") {
    assert(QueryParser.parse("f:between(NCHARS, 200, 400)") ==
      FnTerm("between", Seq("NCHARS", "200", "400")))
  }

  test("proximity/fuzzy function calls parse positionally (engine validates shapes)") {
    assert(QueryParser.parse("f:near(TEXT, 'a', 'b', 3)") ==
      FnTerm("near", Seq("TEXT", "a", "b", "3")))
    assert(QueryParser.parse("f:near(TEXT, 3, 'a', 'b', 'c')") ==
      FnTerm("near", Seq("TEXT", "3", "a", "b", "c")))
    assert(QueryParser.parse("f:onear(TEXT, 3, 'a', 'b')") ==
      FnTerm("onear", Seq("TEXT", "3", "a", "b")))
    assert(QueryParser.parse("f:fuzzy(TEXT, 'sparc', 2)") ==
      FnTerm("fuzzy", Seq("TEXT", "sparc", "2")))
  }

  test("function comparison f:abs(X) >= 2") {
    assert(QueryParser.parse("f:abs(VAL) >= 2") ==
      FnCmp(FnTerm("abs", Seq("VAL")), Op.GE, "2"))
    // range-op negation keeps its Not wrapper: under multi-value
    // any-match semantics, ¬any(abs ≥ 2) is all(abs < 2) — flipping the
    // operator would wrongly turn it into any(abs < 2)
    assert(QueryParser.parse("not f:abs(VAL) >= 2") ==
      Not(FnCmp(FnTerm("abs", Seq("VAL")), Op.GE, "2")))
  }

  test("range-op negation keeps Not; EQ/regex negation flips") {
    assert(QueryParser.parse("not A < '5'") == Not(Term("A", Op.LT, "5")))
    assert(QueryParser.parse("not A == 'x'") == Term("A", Op.NE, "x"))
    assert(QueryParser.parse("not A =~ 'x.*'") == Term("A", Op.NRE, "x.*"))
  }

  test("bare unfielded term") {
    assert(QueryParser.parse("'spark'") == BareTerm("spark"))
  }

  test("field names uppercased") {
    assert(QueryParser.parse("title == 'x'") == Term("TITLE", Op.EQ, "x"))
  }

  test("nested and flattens") {
    val e = QueryParser.parse("A == '1' and B == '2' and C == '3'")
    assert(e == And(Seq(Term("A", Op.EQ, "1"), Term("B", Op.EQ, "2"), Term("C", Op.EQ, "3"))))
  }

  test("all-negation detection") {
    assert(QExpr.allNegated(QueryParser.parse("A != '1' and B != '2'")))
    assert(!QExpr.allNegated(QueryParser.parse("A == '1' and B != '2'")))
    // a Not-wrapped range is a bounded assertion, not an absence negation
    assert(!QExpr.allNegated(QueryParser.parse("not A < '5'")))
    assert(!QExpr.allNegated(QueryParser.parse("not f:abs(VAL) >= 2")))
  }

  test("escaped quote inside string literal") {
    assert(QueryParser.parse("A == 'it\\'s'") == Term("A", Op.EQ, "it's"))
  }

  test("trailing garbage throws") {
    intercept[QueryParser.ParseException](QueryParser.parse("A == '1' garbage =="))
  }

  test("unterminated string throws") {
    intercept[QueryParser.ParseException](QueryParser.parse("A == 'oops"))
  }

  test("regex classification for the planner") {
    import WikiSearchEngine._
    assert(classifyRegex("abc.*") == Prefix("abc"))
    assert(classifyRegex(".*xyz") == Suffix("xyz"))
    assert(classifyRegex("a.c")   == Opaque)
    assert(classifyRegex(".*")    == Opaque)
  }

  test("fuzz: arbitrary input parses or raises ParseException — never hangs or escapes") {
    val rnd   = new scala.util.Random(11)
    val chars = "abcdef ()'=!<>~&|:,.0123456789\"_-"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(30))(chars(rnd.nextInt(chars.length))).mkString
      try { QueryParser.parse(s); () }
      catch { case _: QueryParser.ParseException => () }
      // anything else (MatchError, NPE, StackOverflow) fails the test
    }
  }
}
