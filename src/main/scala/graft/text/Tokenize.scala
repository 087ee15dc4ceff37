package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenization — the reference's entire scalar "UDF surface"
  * (mapper1.py:18, mapper2.py:19, query.py:21) re-expressed as codegen'd
  * built-in expressions; no UDFs, no custom Expressions needed.
  *
  * Char class is pinned to `[a-z0-9_']` (NOT `\w`) so Java-regex (Spark) and
  * RE2 (DuckDB oracle) tokenize identically — SURVEY.md §2.3 T2.
  *
  * Case folding is pinned to an ASCII-ONLY translate (A-Z -> a-z), NOT
  * `lower()`: the engines' Unicode lowercasing genuinely diverges — Java
  * lower('İ' U+0130) = "i̇" (an extra ASCII 'i' token) where
  * DuckDB/utf8proc gives "i" — so full-Unicode lower() makes token output
  * input-dependent across engines (caught by the edge-fixture `unicode`
  * gate). Non-ASCII uppercase never matches the token class anyway, so
  * ASCII folding loses nothing and is identical in both engines BY
  * CONSTRUCTION. Oracle spelling: translate(text, 'A..Z', 'a..z').
  */
object Tokenize {
  val TokenPattern = "[a-z0-9_']+"
  val AsciiUpper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  val AsciiLowerChars = "abcdefghijklmnopqrstuvwxyz"

  /** ASCII-only case fold — the cross-engine-deterministic `lower`. */
  def asciiFold(text: Column): Column =
    translate(text, AsciiUpper, AsciiLowerChars)

  /** fold + regex tokenize: STRING -> ARRAY<STRING> (T1+T2). */
  def tokens(text: Column): Column =
    regexp_extract_all(asciiFold(text), lit(TokenPattern), lit(0))

  /** Per-document token rows: (doc_id, term), one row per occurrence.
    * Docs with no tokens drop out (explode of empty array), matching the
    * reference's skip-empty-line guard (mapper1.py:7-13, P6). */
  def termOccurrences(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))

  /** Per-document *distinct* term rows (T3): mapper1.py:20's
    * `list(set(words))` — each term counted once per doc for the df stat. */
  def distinctTerms(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
}
