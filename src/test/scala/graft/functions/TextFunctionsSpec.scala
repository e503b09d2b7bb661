package graft.functions

import graft.SparkSuite

import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("lcNoDiacritics strips combining marks and lowercases") {
    assert(TextFunctions.lcNoDiacritics("Ábacus") == "abacus")
    assert(TextFunctions.lcNoDiacritics("CAFÉ") == "cafe")
    assert(TextFunctions.lcNoDiacritics("Ñandú") == "nandu")
    assert(TextFunctions.lcNoDiacritics("plain") == "plain")
    assert(TextFunctions.lcNoDiacritics(null) == null)
  }

  test("tokenize: lowercase word split on non-alphanumerics, empties dropped") {
    val out = Seq("Hello, World! 42 foo_bar")
      .toDF("t").select(TextFunctions.tokenize($"t")).as[Seq[String]].collect().head
    assert(out == Seq("hello", "world", "42", "foo", "bar"))
  }

  test("jexlMatches is full-string and DOTALL") {
    val df = Seq("abc", "abcd", "a\nc").toDF("t")
    val m = df.filter(TextFunctions.jexlMatches($"t", "a.c")).as[String].collect().toSet
    // full-string: 'abcd' must NOT match (rlike alone would find-match it)
    assert(m == Set("abc", "a\nc")) // DOTALL: '.' crosses the newline
  }
}
