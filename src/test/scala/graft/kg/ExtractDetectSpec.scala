package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stages 1-2: the byte-identity invariant (north rule: extracted text
  * must equal the reference text per url, byte-for-byte) and mention
  * detection properties. */
class ExtractDetectSpec extends SparkSpec {
  import spark.implicits._

  private val NPages = 300
  private val NEntities = 400
  private lazy val pages = Fixtures.pages(spark, NPages, NEntities).cache()

  test("extract(html) == text byte-identically for EVERY url") {
    val mismatches = pages
      .withColumn("extracted", ExtractText.extract(col("html")))
      .filter(col("extracted") =!= col("text"))
    val bad = mismatches.select("url").as[String].take(3)
    assert(bad.isEmpty, s"byte mismatch on ${bad.mkString(", ")}")
  }

  test("extraction rule-set golden hash (catches accidental rule drift)") {
    val h = pages
      .select(ExtractText.extract(col("html")).as("t"), col("url"))
      .agg(sum(crc32(concat(col("url"), lit("|"), col("t")))).as("h"))
      .first().getLong(0)
    // frozen 2026-08-17; any change to the rule chain or the page
    // generator must be deliberate and re-frozen here
    assert(h == 631330616265L)
  }

  test("extraction handles entities, comments, script/style, nbsp") {
    val html = ("<html><head><title>t</title><style>a{b}</style></head><body>" +
      "<!-- c --><p>A &amp; B &lt;tag&gt;&nbsp;end</p>" +
      "<script>var x = '<p>not text</p>';</script>" +
      "<div>line2</div><br>line3</body></html>").getBytes("UTF-8")
    val out = Seq(html).toDF("html").select(ExtractText.extract(col("html"))).first().getString(0)
    assert(out == "A & B <tag> end\nline2\nline3")
  }

  test("mention offsets are always valid slices (property)") {
    val ms = pages.select(col("text"), explode(DetectMentions.detect(col("text"))).as("m"))
      .select(col("text"), col("m.surface"), col("m.start"), col("m.end"))
      .as[(String, String, Int, Int)].collect()
    assert(ms.nonEmpty)
    ms.foreach { case (text, surface, s, e) =>
      assert(s >= 0 && e <= text.length && s < e)
      assert(text.substring(s, e) == surface)
    }
  }

  test("detector finds every planted gold surface on its page") {
    val gold = Fixtures.gold(spark, NPages, NEntities)
    val detected = DetectMentions.mentions(pages)
      .select(col("url"), col("surface")).distinct()
    val missing = gold.select("url", "surface").distinct()
      .join(detected, Seq("url", "surface"), "left_anti")
    val miss = missing.collect()
    assert(miss.isEmpty, s"undetected: ${miss.take(5).mkString("; ")}")
  }

  test("connector words allowed inside but not at run edges") {
    val text = "visited the University of Alderton yesterday and Springfield today"
    val found = DetectMentions.scan(text).map(_.surface)
    assert(found.contains("University of Alderton"))
    assert(found.contains("Springfield"))
    assert(!found.exists(_.startsWith("of ")))
  }
}
