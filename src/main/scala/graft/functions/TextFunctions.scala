package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization + tokenization, the Spark-native equivalent of the
  * reference's normalizer/tokenizer surface.
  *
  * - Lowercase/de-diacritic normalizer mirrors
  *   `ingest/.../normalizer/LcNoDiacriticsNormalizer.java:91-106` (NFD →
  *   strip combining marks → NFC → lowercase).
  * - Tokenization implements the *intent* of
  *   `ingest/.../ingest/WikipediaMapper.java:226-234` (iterate all tokens,
  *   lowercased; the reference has a known bug where `tok.toString()` is
  *   added once instead of iterating the stream — we deliberately deviate
  *   and document it, per SURVEY.md §2.8).
  *
  * Everything that can be a built-in Column expression is one (codegen'd,
  * pushdown-friendly); only the diacritic strip needs a UDF because Spark
  * has no Unicode-normalization built-in.
  */
object TextFunctions {

  /** Strip diacritics + lowercase — the reference's LcNoDiacriticsNormalizer. */
  def lcNoDiacritics(s: String): String =
    if (s == null) null
    else {
      val nfd      = Normalizer.normalize(s, Normalizer.Form.NFD)
      val stripped = nfd.replaceAll("\\p{InCombiningDiacriticalMarks}+", "")
      Normalizer.normalize(stripped, Normalizer.Form.NFC).toLowerCase(java.util.Locale.ENGLISH)
    }

  val lcNoDiacriticsUdf = udf(lcNoDiacritics _)

  /** Column form: lowercase + de-diacritic. Uses the UDF only when the
    * input may contain non-ASCII; for known-ASCII columns prefer `lower`.
    */
  def normalize(c: Column): Column = lcNoDiacriticsUdf(c)

  /** Tokenize a text column into an array of normalized word tokens:
    * lc-no-diacritics the whole text first, then split on runs of
    * non-letter/non-digit (Unicode classes — an ASCII-only split would
    * shred accented words like 'cálculo' into 'c'+'lculo' and make them
    * unfindable under the normalizer the metadata declares for TEXT).
    */
  def tokenize(text: Column): Column =
    filter(split(lcNoDiacriticsUdf(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Tokenize on single spaces only — exact-parity tokenizer for the
    * driver's synthetic `documents` table (space-separated words), with a
    * trivially matching DuckDB oracle (`string_split(text, ' ')`).
    */
  def tokenizeWs(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Distinct tokens per document (reference collects tokens into a
    * HashSet before indexing — `WikipediaMapper.getTokens:226-234`). */
  def distinctTokens(text: Column): Column = array_distinct(tokenize(text))

  /** Full-string DOTALL regex match — JEXL `=~` semantics
    * (`query/.../jexl/Arithmetic.java:108-128`): Pattern.matches with
    * DOTALL. Spark's `rlike` is find-based, so anchor and set (?s).
    */
  def jexlMatches(c: Column, regex: String): Column =
    c.rlike("^(?s:" + regex + ")$")
}
