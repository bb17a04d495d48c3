package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-3 parsing vs the `parse_data` semantics
  * (`scripts/parse_wikidata_dump_parallel.py:942-1106`), driven by the
  * synthetic dump fixtures. */
class ParseEntitiesSpec extends SparkSpec {
  import spark.implicits._

  private val N = 200
  private lazy val dump = Fixtures.dumpLines(spark, N)
  private lazy val parsed = ParseEntities.parse(dump).cache()
  private lazy val claims = ParseEntities.claims(parsed).cache()
  private lazy val objects = ParseEntities.objects(claims).cache()
  private lazy val literals = ParseEntities.literals(claims).cache()
  private lazy val closure = graft.graph.TypeClosure.closure(
    objects.filter(col("pred") === "P279")
      .select(col("subj").as("child"), col("obj").as("parent"))).cache()
  private lazy val items = ParseEntities.items(parsed, closure,
    NerSeeds.geoSeeds(spark, closure), NerSeeds.orgSeeds(spark, closure)).cache()

  test("every dump line parses (no nulls from the variant schema)") {
    assert(parsed.count() ==
      Fixtures.Classes.size + Fixtures.Predicates.size + Fixtures.Countries.size + N)
  }

  test("objects: wikibase-item claims → (subj, pred, obj)") {
    // country claim of the first city entity (slot 8): P17 → its country
    val cityRows = objects.filter(col("subj") === "Q100008" && col("pred") === "P17")
      .select("obj").as[String].collect()
    assert(cityRows.length == 1 && cityRows.head.startsWith("Q200"))
    // P279 edges from the taxonomy are present
    assert(objects.filter(col("pred") === "P279" && col("subj") === "Q515" &&
      col("obj") === "Q486972").count() == 1)
  }

  test("literals: datatype taxonomy + get_value extraction (F13)") {
    val cityLits = literals.filter(col("subj") === "Q100008").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    // globe-coordinate → "lat,lon" string, NUMBER for quantity amount
    assert(cityLits.exists { case (p, v, d) =>
      p == "P625" && d == "STRING" && v.matches("[0-9.]+,[0-9.]+") })
    assert(cityLits.exists { case (p, v, d) =>
      p == "P1082" && d == "NUMBER" && v.startsWith("+") })
    // person: time datatype → DATETIME, raw "+19xx-…" kept as string
    val person = literals.filter(col("subj") === "Q100000" && col("pred") === "P569")
      .select("value", "datatype").as[(String, String)].collect()
    assert(person.length == 1 && person.head._2 == "DATETIME" &&
      person.head._1.startsWith("+19") && person.head._1.endsWith("Z"))
    // external-id → STRING via bare-string variant extraction
    val xid = literals.filter(col("subj") === "Q100000" && col("pred") === "P214")
      .select("value").as[String].collect()
    assert(xid.sameElements(Array("xid-0")))
  }

  test("skip rules: no-datavalue snaks and skip datatypes are dropped") {
    // Specimen entities carry P997/P998/P999 odd claims — none may survive
    assert(claims.filter(col("pid").isin("P997", "P998", "P999")).count() == 0)
    // but their geo-shape / math / musical-notation / tabular-data literals do
    val spec = literals.join(items.filter(col("kind") === "entity")
      .filter(col("description") === "chain instance with odd claims")
      .select(col("entity").as("subj")), Seq("subj"))
    assert(spec.select("datatype").distinct().as[String].collect().toSet ==
      Set("GEOSHAPE", "MATH", "MUSICAL_NOTATION", "TABULAR_DATA"))
  }

  test("kind precedence: type > predicate > disambiguation > entity") {
    val kinds = items.select("entity", "kind").as[(String, String)].collect().toMap
    assert(kinds("Q515") == "type")        // has P279
    assert(kinds("P31") == "predicate")
    assert(kinds("Q100000") == "entity")   // person
    val disambig = items.filter(col("kind") === "disambiguation")
      .select("entity").as[String].collect()
    assert(disambig.nonEmpty) // the planted Q4167410 instances
  }

  test("popularity = max(#sitelinks, 1)") {
    val pops = items.select("entity", "popularity").as[(String, Int)].collect().toMap
    assert(pops("Q2001") == 8)   // countries: 8 sitelinks
    assert(pops.values.forall(_ >= 1)) // 0-sitelink entities floor to 1
  }

  test("ner_types via seed trees: PERS / LOC / ORG / OTHERS") {
    val ner = items.select("entity", "ner_types").as[(String, Seq[String])]
      .collect().toMap
    assert(ner("Q100000") == Seq("PERS"))        // P31 Q5
    assert(ner("Q100008") == Seq("LOC"))         // city under geo tree
    assert(ner("Q100012") == Seq("ORG"))         // business under org tree
    assert(ner("Q2001") == Seq("LOC"))           // country: subtracted from ORG, still geo
    // university: edInst subtracted from geo tree → ORG only
    assert(ner("Q100015") == Seq("ORG"))
    // dish: food subtracted from geo → OTHERS
    assert(ner("Q100018") == Seq("OTHERS"))
  }

  test("extended_types = explicit ∪ ancestors via closure") {
    val ext = items.filter(col("entity") === "Q100008")
      .select("extended_types").as[Seq[String]].head()
    assert(ext.contains("Q515") && ext.contains("Q486972") &&
      ext.contains("Q2221906") && ext.contains("Q35120"))
  }

  test("urls: enwiki title with underscores; wikidata url always present") {
    val u = items.filter(col("entity") === "Q100000")
      .select("urls.wikidata", "urls.wikipedia").as[(String, String)].head()
    assert(u._1 == "https://www.wikidata.org/wiki/Q100000")
    assert(u._2.startsWith("https://en.wikipedia.org/wiki/") && !u._2.contains(" "))
  }

  test("closure: chain depth 5, diamond, cycle all terminate correctly") {
    val cl = closure.as[(String, String)].collect().toSet
    assert(cl.contains(("Q9001", "Q9005")))       // chain transitively closed
    assert(cl.contains(("Q9001", "Q35120")))
    assert(cl.contains(("Q9101", "Q9104")))       // diamond both paths
    assert(cl.contains(("Q9201", "Q9201")))       // cycle closes on itself
    assert(cl.contains(("Q9201", "Q9202")) && cl.contains(("Q9202", "Q9201")))
  }
}
