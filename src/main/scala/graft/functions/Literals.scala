package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Literal datatype classification — the reference's ordered regex cascade
  * (`lamapi/recognizers/literal_recognizer.py:22-95`), transliterated
  * VERBATIM (every alternative preserved), and the xsd mapping of
  * `lamapi/recognizers/literal_classifier.py`.
  *
  * Reference semantics reproduced exactly:
  *  - check order is the `literal_types` dict order
  *    (`literal_recognizer.py:77-86`): DATETIME → TIME → URL → EMAIL →
  *    FLOAT → INTEGER → DATE, else STRING; first match wins;
  *  - matching is `finditer` (search, not full-match) — the patterns carry
  *    their own anchors, and two FLOAT alternatives are deliberately
  *    unanchored at the end (`literal_recognizer.py:59-63`), which both
  *    Spark `rlike` and DuckDB `regexp_matches` reproduce (search
  *    semantics);
  *  - `re.IGNORECASE` is realized with the `(?i)` inline flag, supported
  *    identically by java.util.regex (Spark) and RE2 (DuckDB).
  *
  * The pattern strings are RE2∩java.util.regex-compatible (no lookaround;
  * `(?i)` is the only inline flag, prepended by classify/classifySql), so
  * the exact same strings drive both the Spark Column expression and the
  * generated DuckDB oracle SQL — structurally impossible for the two
  * sides to drift.
  *
  * Known engine divergence from CPython (documented, not patched): Python
  * `re` is Unicode-aware, so `\d` matches non-ASCII decimal digits (e.g.
  * Arabic-Indic '١٩٩٧' classifies INTEGER/DATE in the reference), while
  * java.util.regex and RE2 `\d` are ASCII-only — such inputs classify
  * STRING here, on BOTH sides of the oracle. Adding `(?U)` on the Spark
  * side alone would break the Spark↔DuckDB string-identity invariant
  * (RE2 has no `(?U)`), so ASCII semantics are kept.
  */
object Literals {

  /** `DATE_PATTERN`, `literal_recognizer.py:22-41` — verbatim. */
  val DatePattern: String =
    """^\d{1,4}[\,\.\s\t\n]+bc$|""" +
    """^\d{4}[-.\/]\d{1,2}[-.\/]\d{1,2}$|""" +
    """^\d{1,2}[-.\/]\d{1,2}[-.\/]\d{4}$|""" +
    """^\d{1,2}[-.\/]\d{1,2}[-.\/]\d{2}$|""" +
    """^(january|february|march|april|may|june|july|august|september|october|november|dicember)[\.\,\s\t\n\/]+\d{1,2}[\.\,\s\t\n\/]+\d{4}$|""" +
    """^\d{1,2}[\.\,\s\t\n\/]+(january|february|march|april|may|june|july|august|september|october|november|dicember)[\.\,\s\t\n\/]+\d{4}$|""" +
    """^\d{4}[\.\,\s\t\n\/]+(january|february|march|april|may|june|july|august|september|october|november|dicember)[\.\,\s\t\n\/]+\d{1,2}$|""" +
    """^\d{4}[\.\,\s\t\n\/]+\d{1,2}[\.\,\s\t\n\/]+(january|february|march|april|may|june|july|august|september|october|november|dicember)$|""" +
    """^(january|february|march|april|may|june|july|august|september|october|november|dicember)[\.\,\s\n\t\/]+\d{4}$|""" +
    """^\d{4}[\.\,\s\n\t\/]+(january|february|march|april|may|june|july|august|september|october|november|dicember)$|""" +
    """^\d+[\.\,]\d+[\.\,]\d+[\.\,]\d+$|""" +
    """^\d+[\.\,]\d+[\.\,]\d+$|""" +
    """^\d+[\.\,]\d+$|""" +
    """^\d{4}[–-]\d{4}$|""" +
    """^\d{4}[–-](present|now)$|""" +
    """^\d{4}$|""" +
    """^\d+$"""

  /** `URL_PATTERN`, `literal_recognizer.py:44` — verbatim (including the
    * quirk that the final `([a-zA-Z]){2,6}(…)` tail only admits short
    * suffixes after the last matched dot — "http://example.com" matches,
    * "http://example.com/long-path" is STRING in the reference too). */
  val UrlPattern: String =
    """^((http|https)\:\/\/)?[a-zA-Z0-9\.\/\?\:@\-_=#]+\.([a-zA-Z]){2,6}([a-zA-Z0-9\.\&\/\?\:@\-_=#])$"""

  /** `EMAIL_PATTERN`, `literal_recognizer.py:46`. */
  val EmailPattern: String =
    """^\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b$"""

  /** `DATETIME_PATTERN`, `literal_recognizer.py:49-51` — requires the `T`
    * separator and HH:MM (no seconds). */
  val DatetimePattern: String =
    """^\d{4}[-.\/]\d{1,2}[-.\/]\d{1,2}T(24:00|2[0-3]:[0-5][0-9]|[0-1][0-9]:[0-5][0-9])$"""

  /** `TIME_PATTERN`, `literal_recognizer.py:54` — strict hour ranges,
    * HH:MM only (no seconds, no am/pm). */
  val TimePattern: String =
    """^(24:00|2[0-3]:[0-5][0-9]|[0-1][0-9]:[0-5][0-9])$"""

  /** `FLOAT_NUMBER`, `literal_recognizer.py:57-62` — comma decimals,
    * scientific notation, unit suffixes; last two alternatives unanchored
    * at the end, exactly as the reference wrote them. */
  val FloatPattern: String =
    """^[-+]?\d+[\,\.]\d+$|""" +
    """^[-+]?\d+[\,\.]\d+[eE][-+]\d+$|""" +
    """^[-+]?\d+[\,\.]\d+[ ]+(km|km2|m|sq|mi|cm|cm2|mm|dm|ft)|""" +
    """^\d+[ ]+(km|km2|m|sq|mi|cm|cm2|mm|dm|ft)"""

  /** `INTEGER_NUMBER`, `literal_recognizer.py:64-68`. */
  val IntegerPattern: String =
    """^[-+]?\d+$|""" +
    """^\d+[ –-](thousand|million|billion|trillion)$|""" +
    """^\d+[\,\.]\d+[ –-](thousand|million|billion|trillion)$"""

  /** (label, pattern) in the reference's check order
    * (`literal_types` dict order, `literal_recognizer.py:77-86`). */
  val Cascade: Seq[(String, String)] = Seq(
    "DATETIME" -> DatetimePattern,
    "TIME" -> TimePattern,
    "URL" -> UrlPattern,
    "EMAIL" -> EmailPattern,
    "FLOAT" -> FloatPattern,
    "INTEGER" -> IntegerPattern,
    "DATE" -> DatePattern
  )

  /** xsd datatypes per `literal_classifier.py:7-63`. */
  val XsdMapping: Map[String, String] = Map(
    "DATETIME" -> "xsd:dateTime",
    "TIME" -> "xsd:time",
    "URL" -> "xsd:anyURI",
    "EMAIL" -> "xsd:string",
    "FLOAT" -> "xsd:double",
    "INTEGER" -> "xsd:integer",
    "DATE" -> "xsd:date",
    "STRING" -> "xsd:string"
  )

  /** First-match-wins classification of a raw string column. The reference
    * matches the raw token (no trim, no lower) under IGNORECASE. */
  def classify(c: Column): Column =
    Cascade.foldRight(lit("STRING")) { case ((label, pat), els) =>
      when(c.rlike("(?i)" + pat), lit(label)).otherwise(els)
    }

  /** xsd datatype for a classified label column. */
  def xsd(label: Column): Column =
    XsdMapping.foldRight(lit("xsd:string")) { case ((k, v), els) =>
      when(label === k, lit(v)).otherwise(els)
    }

  /** DuckDB SQL CASE expression equivalent to classify(), over the SQL
    * expression `inExpr`. regexp_matches is search-semantics like rlike —
    * anchors live in the patterns. */
  def classifySql(inExpr: String): String = {
    val arms = Cascade.map { case (label, pat) =>
      val p = ("(?i)" + pat).replace("'", "''")
      s"WHEN regexp_matches($inExpr, '$p') THEN '$label'"
    }.mkString(" ")
    s"(CASE $arms ELSE 'STRING' END)"
  }

  /** DuckDB SQL CASE for the xsd mapping over a label SQL expression. */
  def xsdSql(labelExpr: String): String = {
    val arms = XsdMapping.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN $labelExpr = '$k' THEN '$v'"
    }.mkString(" ")
    s"(CASE $arms ELSE 'xsd:string' END)"
  }
}
