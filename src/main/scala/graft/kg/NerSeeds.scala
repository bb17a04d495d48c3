package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 5 — ORG / LOC seed sets for NER-type classification.
  *
  * The reference fetches these trees over SPARQL (`wdt:P279*` from root
  * QIDs) and subtracts overlap trees
  * (`scripts/parse_wikidata_dump_parallel.py:1135-1183`). We derive the
  * identical sets from our own materialized P279 closure — no network, and
  * the set-difference (T1) becomes `left_anti` joins.
  */
object NerSeeds {

  val OrgRoot = "Q43229" // organization
  val OrgSubtract: Seq[String] = Seq(
    "Q6256",     // country
    "Q515",      // city
    "Q5119",     // capital
    "Q15916867", // administrative territory
    "Q17350442", // family
    "Q623109",   // sports league
    "Q8436"      // venue
  )

  val GeoRoot = "Q2221906" // geographic location
  val GeoSubtract: Seq[String] = Seq(
    "Q2095",    // food
    "Q2385804", // educational institution
    "Q327333",  // government agency
    "Q484652",  // international organization
    "Q12143"    // time zone
  )

  /** All QIDs in the P279* tree under `root` (descendants ∪ root) — the
    * closure-table realization of the SPARQL `backward_properties=[279]`
    * tree query. Output: single column `qid`. */
  def tree(spark: SparkSession,
           closure: DataFrame, root: String): DataFrame = {
    closure.filter(col("ancestor") === root).select(col("child").as("qid"))
      .union(spark.createDataset(Seq(root))(spark.implicits.newStringEncoder).toDF("qid"))
      .distinct()
  }

  private def subtracted(spark: SparkSession,
                         closure: DataFrame, root: String,
                         minus: Seq[String]): DataFrame = {
    val base = tree(spark, closure, root)
    val minusAll = minus.map(tree(spark, closure, _))
      .reduceOption(_ union _)
      .getOrElse(spark.emptyDataFrame.withColumn("qid", lit(null).cast("string")))
      .distinct()
    base.join(minusAll, Seq("qid"), "left_anti")
  }

  /** organization_subclass minus its seven overlap trees (:1155-1164). */
  def orgSeeds(spark: SparkSession, closure: DataFrame): DataFrame =
    subtracted(spark, closure, OrgRoot, OrgSubtract)

  /** geolocation_subclass minus its five overlap trees (:1167-1182). */
  def geoSeeds(spark: SparkSession, closure: DataFrame): DataFrame =
    subtracted(spark, closure, GeoRoot, GeoSubtract)
}
