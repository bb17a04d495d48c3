package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S11 — Crunchbase CSV → KG collections (`parsing_cb.py:42-99`). */
class ParseCrunchbaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orgs = Seq(
    ("acme", "Acme Corp", "AcmeCo", "2007-05-25", "12.5", "software"),
    ("beta", "Beta Inc", null, "2009-03-01T10:15", "nan", "N/A $$")
  ).toDF("permalink", "name", "alias1", "founded_on", "funding", "category")

  test("items: kind=entity, NERtype=ORG, P31=[Organization], .get defaults") {
    val it = ParseCrunchbase.items(orgs).orderBy("entity").collect()
    assert(it.length == 2)
    val acme = it.head
    assert(acme.getAs[String]("entity") == "acme")
    assert(acme.getAs[String]("kind") == "entity")
    assert(acme.getAs[String]("NERtype") == "ORG")
    assert(acme.getAs[Map[String, Seq[String]]]("types") ==
      Map("P31" -> Seq("Organization")))
    assert(acme.getAs[Map[String, String]]("labels") == Map("en" -> "Acme Corp"))
    // aliases parsed-then-dropped (parsing_cb.py:75-76)
    assert(acme.getAs[Map[String, Seq[String]]]("aliases") == Map("en" -> Nil))
    // no additional_data → description "" and popularity 0 (.get defaults)
    assert(acme.getAs[String]("description") == "")
    assert(acme.getAs[Double]("popularity") == 0.0)
    val withAdd = ParseCrunchbase.items(orgs,
      Some(Seq(("acme", "rockets", 7.0)).toDF("permalink", "description", "popularity")))
      .filter(col("entity") === "acme").first()
    assert(withAdd.getAs[String]("description") == "rockets")
    assert(withAdd.getAs[Double]("popularity") == 7.0)
  }

  test("literals: classify_value order (isoparse → float → STRING), identity cols excluded") {
    val lit = ParseCrunchbase.literals(orgs)
      .as[(String, String, String, String)].collect()
      .map { case (e, p, v, d) => ((e, p), (d, v)) }.toMap
    assert(lit(("acme", "founded_on")) == ("DATETIME", "2007-05-25"))
    assert(lit(("beta", "founded_on")) == ("DATETIME", "2009-03-01T10:15"))
    assert(lit(("acme", "funding")) == ("NUMBER", "12.5"))
    assert(lit(("beta", "funding")) == ("NUMBER", "nan")) // float('nan') parses in Python
    assert(lit(("acme", "category")) == ("STRING", "software"))
    assert(lit(("beta", "category")) == ("STRING", "N/A $$"))
    // permalink/name/alias1-3 never become literals
    assert(!lit.keySet.exists { case (_, p) =>
      Set("permalink", "name", "alias1").contains(p) })
    assert(lit.size == 6)
  }

  test("literals: missing cell becomes a 'nan' NUMBER row (pandas NaN via float())") {
    val withNull = Seq(("gamma", "Gamma LLC", null: String, "oops"))
      .toDF("permalink", "name", "funding", "category")
    val lit = ParseCrunchbase.literals(withNull)
      .as[(String, String, String, String)].collect()
      .map { case (e, p, v, d) => ((e, p), (d, v)) }.toMap
    assert(lit(("gamma", "funding")) == ("NUMBER", "nan"),
      "reference appends str(float('nan'))='nan' for missing cells")
    assert(lit.size == 2)
  }

  test("IsoPattern: tz suffixes accepted, digit-range bounds enforced") {
    val cases = Seq(
      "2020-01-01T10:15:30Z" -> "DATETIME",      // Z suffix
      "2020-01-01T10:15:30+05:30" -> "DATETIME", // ±HH:MM offset
      "2020-01-01T10:15-0800" -> "DATETIME",     // ±HHMM offset
      "1997-13-99" -> "STRING",                  // month/day out of range
      "2020-00-10" -> "STRING",                  // month 00
      "2020-01-01T25:00" -> "STRING",            // hour out of range
      "2020-12-31" -> "DATETIME")
    val got = cases.map(_._1).toDF("v")
      .select(col("v"), ParseCrunchbase.classifyValue(col("v")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (v, want) =>
      assert(got(v) == want, s"classify($v) = ${got(v)}, want $want") }
  }
}
