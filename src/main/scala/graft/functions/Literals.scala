package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Literal datatype classification (reference F10:
  * `lamapi/recognizers/literal_recognizer.py:22-95` — an ORDERED regex
  * cascade, first match wins: DATETIME→TIME→URL→EMAIL→FLOAT→INTEGER→DATE→
  * STRING) and the xsd mapping of `lamapi/recognizers/literal_classifier.py`.
  *
  * Patterns are written once in RE2∩java.util.regex-compatible syntax
  * (no lookaround, no inline flags) so the exact same strings drive both
  * the Spark Column expression and the generated DuckDB oracle SQL —
  * structurally impossible for the two sides to drift.
  */
object Literals {

  /** (label, anchored case-sensitive-on-lowered-input pattern). Input is
    * lowercased+trimmed before matching (the reference lowercases too). */
  val Cascade: Seq[(String, String)] = Seq(
    "DATETIME" -> "^[0-9]{4}-[0-9]{2}-[0-9]{2}[ t][0-9]{2}:[0-9]{2}(:[0-9]{2})?$",
    "TIME" -> "^[0-9]{1,2}:[0-9]{2}(:[0-9]{2})?( ?(am|pm))?$",
    "URL" -> "^(https?|ftp)://[^ ]+$",
    "EMAIL" -> "^[^@ ]+@[^@ ]+\\.[^@ ]+$",
    "FLOAT" -> "^[+-]?[0-9]+\\.[0-9]+( ?[a-z%]{1,6})?$",
    "INTEGER" -> "^[+-]?[0-9]+( ?(million|billion|thousand))?$",
    "DATE" -> ("^([0-9]{4}-[0-9]{2}-[0-9]{2}" +
      "|[0-9]{1,2}/[0-9]{1,2}/[0-9]{2,4}" +
      "|[0-9]{1,4}( ?(bc|ad|bce|ce))" +
      "|(january|february|march|april|may|june|july|august|september|october|november|december) [0-9]{1,2},? [0-9]{4}" +
      "|[0-9]{4}–present)$")
  )

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

  /** First-match-wins classification of a raw string column. */
  def classify(c: Column): Column = {
    val s = lower(trim(c))
    Cascade.foldRight(lit("STRING")) { case ((label, pat), els) =>
      when(s.rlike(pat), lit(label)).otherwise(els)
    }
  }

  /** xsd datatype for a classified label column. */
  def xsd(label: Column): Column =
    XsdMapping.foldRight(lit("xsd:string")) { case ((k, v), els) =>
      when(label === k, lit(v)).otherwise(els)
    }

  /** DuckDB SQL CASE expression equivalent to classify(), over the SQL
    * expression `inExpr`. regexp_matches is unanchored — patterns carry
    * their own ^$ anchors. */
  def classifySql(inExpr: String): String = {
    val arms = Cascade.map { case (label, pat) =>
      val p = pat.replace("\\", "\\").replace("'", "''")
      s"WHEN regexp_matches(lower(trim($inExpr)), '$p') THEN '$label'"
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
