package graft.kg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Stage 1 — boilerpipe-style HTML→text extraction with a FROZEN rule set.
  *
  * North-rule invariant: extracted text must be **byte-identical per url**
  * run-to-run and engine-to-engine, so the rules are defined once here
  * (no external HTML library whose version drift could change output —
  * SURVEY.md §7.5.1) and golden-hashed in ExtractTextSpec.
  *
  * Rule set v1 (applied in order):
  *  1. UTF-8 decode of the html binary column.
  *  2. Drop  <!-- comments -->,  <script>…</script>,  <style>…</style>,
  *     <noscript>…</noscript>,  <head>…</head>  (case-insensitive,
  *     dot-matches-newline, non-greedy).
  *  3. Block separators → newline: closing  </p> </div> </h1..6> </li>
  *     </tr> </table> </blockquote> </section> </article>  and  <br>.
  *  4. Strip every remaining tag  <…>.
  *  5. Decode the HTML entities  &lt; &gt; &quot; &#39; &apos;
  *     &nbsp;(→space)  and — last —  &amp;.
  *  6. Whitespace policy: per line collapse runs of spaces/tabs to one
  *     space and trim; drop empty lines; join with a single \n.
  *
  * Implemented entirely as Column expressions (regexp_replace chains are
  * codegen'd; no UDF), so extraction fuses into the page-scan stage — at
  * 100 TB the scan is the only pass over the raw bytes.
  */
object ExtractText {

  private def dropBlocks(c: Column): Column = {
    val pats = Seq(
      "(?is)<!--.*?-->",
      "(?is)<script\\b[^>]*>.*?</script>",
      "(?is)<style\\b[^>]*>.*?</style>",
      "(?is)<noscript\\b[^>]*>.*?</noscript>",
      "(?is)<head\\b[^>]*>.*?</head>")
    pats.foldLeft(c)((acc, p) => regexp_replace(acc, p, ""))
  }

  private def blockBreaks(c: Column): Column =
    regexp_replace(c,
      "(?i)</(?:p|div|h[1-6]|li|tr|table|blockquote|section|article)>|<br\\s*/?>",
      "\n")

  private def stripTags(c: Column): Column =
    regexp_replace(c, "(?s)<[^>]*>", "")

  private def decodeEntities(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (k, v)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(k), java.util.regex.Matcher.quoteReplacement(v))
    }
  }

  // pure-regex form of: per line collapse horizontal whitespace + trim,
  // drop empty lines, join with \n. Higher-order transform/filter lambdas
  // would fall out of whole-stage codegen — this chain stays fused into
  // the page scan.
  private def normalizeWhitespace(c: Column): Column = {
    val horiz = regexp_replace(c, "[ \\t\\x0B\\f\\r]+", " ")
    val trimmedLines = regexp_replace(horiz, " ?\\n ?", "\n")
    val collapsed = regexp_replace(trimmedLines, "\\n+", "\n")
    regexp_replace(collapsed, "^[\\n ]+|[\\n ]+$", "")
  }

  /** html binary column → extracted text column (the frozen rule chain). */
  def extract(html: Column): Column =
    normalizeWhitespace(decodeEntities(stripTags(blockBreaks(dropBlocks(
      decode(html, "UTF-8"))))))
}
