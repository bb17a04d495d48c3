package graft.core

import graft.SparkSpec
import graft.functions.Literals
import org.apache.spark.sql.functions._

/** Branch-coverage spec for the verbatim reference literal cascade
  * (`literal_recognizer.py:22-86`): at least one input per regex
  * alternative, with expected labels derived by executing the reference
  * patterns' semantics by hand (first match wins in dict order
  * DATETIME→TIME→URL→EMAIL→FLOAT→INTEGER→DATE→STRING). */
class LiteralsSpec extends SparkSpec {
  import spark.implicits._

  // (input, expected-label). Comments mark the pattern alternative hit.
  private val cases: Seq[(String, String)] = Seq(
    // DATETIME (T separator, HH:MM, strict hour ranges)
    "1997-08-26T14:30" -> "DATETIME",
    "1997/8/26T24:00" -> "DATETIME",
    "1997-08-26T14:30:00" -> "STRING",   // seconds ⇒ not DATETIME
    "1997-08-26 14:30" -> "STRING",      // space separator ⇒ not DATETIME
    // TIME (HH:MM only, strict ranges)
    "09:45" -> "TIME",
    "23:59" -> "TIME",
    "24:00" -> "TIME",
    "24:01" -> "STRING",                 // out of range
    "9:45" -> "STRING",                  // single-digit hour not in ranges
    "10:30:45" -> "STRING",              // seconds ⇒ not TIME
    "10:30 pm" -> "STRING",              // am/pm ⇒ not TIME (ref has none)
    // URL (scheme optional; short tail after last dot)
    "http://example.com" -> "URL",
    "https://example.com" -> "URL",
    "example.com" -> "URL",              // scheme-less domain
    "sub.domain-x.org" -> "URL",
    "http://example.com/very-long-path" -> "STRING", // tail quirk (verbatim)
    // EMAIL
    "john.doe+x@sub.example.co" -> "EMAIL",
    "a@b" -> "STRING",
    // FLOAT (dot/comma decimal, scientific, unit suffixes)
    "3.14" -> "FLOAT",
    "3,14" -> "FLOAT",                   // comma decimal
    "-2.5" -> "FLOAT",
    "1,5e+10" -> "FLOAT",                // scientific with comma mantissa
    "12.5 km" -> "FLOAT",                // decimal + unit
    "12 km" -> "FLOAT",                  // integer + unit ⇒ FLOAT
    "7 ft" -> "FLOAT",
    "120 cm2" -> "FLOAT",
    "42 million" -> "FLOAT",             // ref quirk: unanchored unit alt
                                         // matches the 'm' of 'million'
    // INTEGER
    "1345" -> "INTEGER",
    "+7" -> "INTEGER",
    "-26" -> "INTEGER",
    "42 thousand" -> "INTEGER",          // magnitude suffix
    "5-billion" -> "INTEGER",
    "1997" -> "INTEGER",                 // INTEGER checked before DATE
    // DATE
    "145 bc" -> "DATE",
    "145,bc" -> "DATE",
    "145.bc" -> "DATE",
    "1997-08-26" -> "DATE",
    "1997.08.26" -> "DATE",
    "26/08/1997" -> "DATE",
    "26-08-97" -> "DATE",
    "august 26 1997" -> "DATE",
    "august.26.1997" -> "DATE",
    "26 august 1997" -> "DATE",
    "1997 august 26" -> "DATE",
    "1997,26,august" -> "DATE",
    "august 1997" -> "DATE",
    "1997 august" -> "DATE",
    "2,797,800,564" -> "DATE",           // 4-group number ⇒ DATE (verbatim)
    "200.797.800" -> "DATE",             // 3-group number ⇒ DATE
    "1997–2001" -> "DATE",               // en-dash year range
    "1997-2001" -> "DATE",
    "1997–present" -> "DATE",
    "1997-now" -> "DATE",
    "AUGUST 1997" -> "DATE",             // IGNORECASE
    // STRING fallthrough
    "batman begins" -> "STRING",
    "" -> "STRING"
  )

  test("literal cascade: every reference pattern alternative classifies as derived") {
    val df = cases.toDF("input", "expected")
      .withColumn("got", Literals.classify(col("input")))
    val bad = df.filter(col("got") =!= col("expected"))
      .select("input", "expected", "got").collect()
    assert(bad.isEmpty, s"misclassified: ${bad.mkString(", ")}")
  }

  test("xsd mapping covers every cascade label") {
    val labels = Literals.Cascade.map(_._1) :+ "STRING"
    val df = labels.toDF("label").withColumn("xsd", Literals.xsd(col("label")))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    labels.foreach { l => assert(got(l) == Literals.XsdMapping(l)) }
  }
}
