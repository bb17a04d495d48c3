package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S11 — Crunchbase-style CSV → KG collections
  * (`scripts/parsing_cb.py:42-99`), the reference's second ingest source:
  * organization rows become `items` docs (kind=entity, NERtype=ORG,
  * P31=[Organization]) and every non-identity column becomes a literal
  * classified STRING / DATETIME / NUMBER by `classify_value`
  * (`parsing_cb.py:42-52`: dateutil.isoparse first, then float(), else
  * STRING).
  *
  * Reference semantics reproduced:
  *  - aliases are parsed but deliberately DROPPED (`parsing_cb.py:75-76`:
  *    "too noisy … might lead to false positives" — the emitted doc
  *    carries `aliases: {en: []}`), so the output has no alias rows;
  *  - identity columns (permalink, name, alias1-3) never become literals;
  *  - classification order is DATETIME → NUMBER → STRING, first match
  *    wins, values stringified.
  *
  * Engine notes: `dateutil.isoparse` accepts the ISO-8601 prefix family —
  * realized as the anchored regex below (YYYY[-MM[-DD[THH[:MM[:SS]]]]]);
  * `float()` is realized as a float-literal regex (inf/nan accepted, as
  * Python does). Both are plain Column expressions, reproducible in the
  * DuckDB oracle from the same pattern strings.
  */
object ParseCrunchbase {

  /** `dateutil.parser.isoparse` acceptance, anchored. */
  val IsoPattern: String =
    "^\\d{4}(-\\d{2}(-\\d{2}([T ]\\d{2}(:\\d{2}(:\\d{2}(\\.\\d+)?)?)?)?)?)?$"

  /** Python `float()` acceptance (incl. inf/nan, underscores excluded). */
  val FloatPattern: String =
    "^[+-]?((\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$"

  /** STRING / DATETIME / NUMBER per `classify_value` (first match wins:
    * isoparse, then float, else STRING). */
  def classifyValue(v: Column): Column =
    when(v.rlike(IsoPattern), "DATETIME")
      .when(v.rlike(FloatPattern), "NUMBER")
      .otherwise("STRING")

  /** items docs: one row per organization.
    * @param orgs       CSV rows; must have `permalink` and `name`
    * @param additional optional (permalink, description, popularity) side
    *                   table (`read_additional_data`); missing rows get
    *                   ("" , 0) exactly like the .get() defaults. */
  def items(orgs: DataFrame, additional: Option[DataFrame] = None): DataFrame = {
    val add = additional.getOrElse(
      orgs.sparkSession.createDataFrame(
        orgs.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "permalink string, description string, popularity double")))
    orgs.select(col("permalink"), col("name"))
      .join(add, Seq("permalink"), "left")
      .select(
        col("permalink").as("entity"),
        (xxhash64(col("permalink")).bitwiseAND(lit(Long.MaxValue))).as("id_entity"),
        coalesce(col("description"), lit("")).as("description"),
        map(lit("en"), col("name").cast("string")).as("labels"),
        // aliases parsed-then-dropped by the reference (`:75-76`)
        typedLit(Map("en" -> Seq.empty[String])).as("aliases"),
        typedLit(Map("P31" -> Seq("Organization"))).as("types"),
        coalesce(col("popularity"), lit(0.0)).as("popularity"),
        lit("entity").as("kind"),
        lit("ORG").as("NERtype"))
  }

  /** literal rows: (entity, pred, datatype, value) — the exploded batch
    * form of the nested `literals[datatype][column] -> [values]` doc
    * (downstream re-nesting is Retrieval.literals' job, A10/A11). Every
    * column except the identity/alias ones contributes one stringified,
    * classified value. */
  def literals(orgs: DataFrame): DataFrame = {
    val identity = Set("permalink", "name", "alias1", "alias2", "alias3")
    val valueCols = orgs.columns.filterNot(identity.contains)
    val entries = array(valueCols.map(c =>
      struct(lit(c).as("pred"), col(c).cast("string").as("value"))): _*)
    orgs.select(col("permalink").as("entity"), explode(entries).as("e"))
      .select(col("entity"), col("e.pred").as("pred"), col("e.value").as("value"))
      .filter(col("value").isNotNull)
      .withColumn("datatype", classifyValue(col("value")))
  }
}
