package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew-guard semantics of Triples.extract: endpoint semi-join + per-page
  * qid cap keep hub pages sub-quadratic without losing normal triples. */
class TriplesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val kg = Seq(
    ("Q1", "P17", "Q2"),
    ("Q3", "P17", "Q4")
  ).toDF("subj", "pred", "obj")

  test("endpoint semi-join: non-KG qids never enter the pair product") {
    // hub page links 2 KG edges' endpoints + 300 qids absent from the KG
    val noise = (0 until 300).map(i => ("hub", s"Q9$i"))
    val links = (Seq(("hub", "Q1"), ("hub", "Q2"), ("hub", "Q3"), ("hub", "Q4"))
      ++ noise).toDF("url", "qid")
    val out = Triples.extract(links, kg)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(out == Set(("Q1", "P17", "Q2"), ("Q3", "P17", "Q4")))
    // the 300 noise qids were cut BEFORE pairing: with the default cap the
    // pair product is 2×2, not 304² — asserted structurally by the cap test
  }

  test("per-page cap truncates deterministically (qid asc) and bounds pairs") {
    val links = Seq(("hub", "Q1"), ("hub", "Q2"), ("hub", "Q3"), ("hub", "Q4"))
      .toDF("url", "qid")
    val capped = Triples.extract(links, kg, maxQidsPerPage = 1)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    // subj side keeps min subject (Q1), obj side min object (Q2) ⇒ only Q1→Q2
    assert(capped == Set(("Q1", "P17", "Q2")))
    val full = Triples.extract(links, kg, maxQidsPerPage = 256)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(full == Set(("Q1", "P17", "Q2"), ("Q3", "P17", "Q4")))
  }

  test("provenance: one row per (triple, url), distinct") {
    val links = Seq(("p1", "Q1"), ("p1", "Q2"), ("p2", "Q1"), ("p2", "Q2"))
      .toDF("url", "qid")
    val out = Triples.extract(links, kg)
    assert(out.count() == 2)
    assert(out.select("source_url").distinct().count() == 2)
  }
}
