package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Entity-endpoint parity (J1 family + J2 + J10 + A13) — fixtures per
  * FIXTURES.md §6, incl. unknown ids ⇒ absent keys. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val N = 200
  private lazy val world = {
    val dump = Fixtures.dumpLines(spark, N)
    val parsed = ParseEntities.parse(dump)
    val claims = ParseEntities.claims(parsed)
    val objects = ParseEntities.objects(claims).cache()
    val literals = ParseEntities.literals(claims).cache()
    val closure = graft.graph.TypeClosure.closure(
      objects.filter(col("pred") === "P279")
        .select(col("subj").as("child"), col("obj").as("parent")))
    val items = ParseEntities.items(parsed, closure,
      NerSeeds.geoSeeds(spark, closure), NerSeeds.orgSeeds(spark, closure)).cache()
    (items, objects, literals)
  }
  private lazy val (items, objects, literals) = world

  private def ids(xs: String*) = xs.toSeq.toDF("entity")

  test("getTypes: requested entities only; unknown ids absent") {
    val out = Retrieval.getTypes(items, ids("Q100008", "Q999999")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("entity") == "Q100008")
    assert(out.head.getAs[scala.collection.Seq[String]]("p31").toSeq == Seq("Q515"))
  }

  test("getObjects re-nests {obj -> [preds]} like the Mongo doc") {
    val out = Retrieval.getObjects(objects, ids("Q100008")).collect()
    assert(out.length == 1)
    val m = out.head.getAs[Map[String, scala.collection.Seq[String]]]("objects")
    assert(m.exists { case (obj, preds) => obj.startsWith("Q200") && preds.toSeq == Seq("P17") })
  }

  test("getLiterals two-level nesting {DATATYPE -> {pred -> [values]}}") {
    val out = Retrieval.getLiterals(literals, ids("Q100008")).collect()
    assert(out.length == 1)
    val m = out.head.getAs[Map[String, Map[String, scala.collection.Seq[String]]]]("literals")
    assert(m.contains("STRING") && m("STRING").contains("P625"))
    assert(m.contains("NUMBER") && m("NUMBER")("P1082").head.startsWith("+"))
  }

  test("getPredicates: per-pair predicate list (J2)") {
    val pairs = Seq(("Q100008", objects.filter(col("subj") === "Q100008" &&
      col("pred") === "P17").select("obj").as[String].head())).toDF("subj", "obj")
    val out = Retrieval.getPredicates(objects, pairs).collect()
    assert(out.length == 1 && out.head.getAs[scala.collection.Seq[String]]("predicates").toSeq == Seq("P17"))
    // non-adjacent pair → no row
    val none = Retrieval.getPredicates(objects,
      Seq(("Q100008", "Q100009")).toDF("subj", "obj"))
    assert(none.count() == 0)
  }

  test("getSameas + getLabels shapes") {
    val s = Retrieval.getSameas(items, ids("Q100000")).first()
    assert(s.getAs[String]("wikidata").endsWith("Q100000"))
    val l = Retrieval.getLabels(items, ids("Q100000")).first()
    assert(l.getAs[Map[String, String]]("labels").contains("en"))
  }

  test("bow: overlap score |text∩bow| / |text| (bow_retriever.py:134-141)") {
    val bow = Retrieval.entityBow(items)
    val label = items.filter(col("entity") === "Q100008")
      .select(col("labels")("en")).as[String].head()
    val texts = Seq(("Q100008", s"once $label appeared nowhere")).toDF("entity", "text")
    val out = Retrieval.getBowScores(bow, texts).first()
    // text bow tokens: {alderton, appeared, nowhere} ("once" is an NLTK
    // stopword); overlap = the label token → 1/3
    assert(math.abs(out.getAs[Double]("bow_score") - 1.0 / 3.0) < 1e-9)
  }

  test("summary: top-k predicates by count, asc and desc (A13)") {
    val desc5 = Retrieval.summary(objects, 5).as[(String, Long)].collect()
    assert(desc5.length == 5)
    assert(desc5.map(_._2).toSeq == desc5.map(_._2).sortBy(-_).toSeq)
    val asc1 = Retrieval.summary(objects, 1, asc = true).first()
    assert(asc1.getLong(1) <= desc5.last._2)
  }

  test("columnAnalysis: majority literal type per column (N2)") {
    val cells = Seq(
      ("c1", "2021-01-02"), ("c1", "1999-12-31"), ("c1", "not a date"),
      ("c2", "12"), ("c2", "34"), ("c2", "56")).toDF("col_id", "value")
    val out = Retrieval.columnAnalysis(cells).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("c1") == "DATE" && out("c2") == "INTEGER")
  }
}
