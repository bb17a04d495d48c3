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
  * Engine notes: `dateutil.isoparse` acceptance is realized as the
  * anchored regex below — the extended-format ISO-8601 prefix family
  * YYYY[-MM[-DD[THH[:MM[:SS[.f]]]][tz]]] with month/day/hour/minute/second
  * range bounds and an optional Z / ±HH[:MM] timezone suffix after a time.
  * KNOWN acceptance divergences from isoparse (kept: the regex must be
  * reproducible bit-for-bit in the DuckDB oracle, and full calendar
  * validation is not regular): compact basic forms (YYYYMMDD), ISO week
  * (YYYY-Www-D) and ordinal (YYYY-DDD) dates are REJECTED here but parse
  * in isoparse; calendar-impossible day-of-month combinations that pass
  * the digit bounds (e.g. 2020-02-30) are ACCEPTED here but raise there.
  * `float()` is realized as a float-literal regex (inf/nan accepted, as
  * Python does). Both are plain Column expressions, reproducible in the
  * DuckDB oracle from the same pattern strings.
  */
object ParseCrunchbase {

  /** `dateutil.parser.isoparse` acceptance, anchored (divergences: object
    * scaladoc above). */
  val IsoPattern: String =
    "^\\d{4}(-(0[1-9]|1[0-2])(-(0[1-9]|[12]\\d|3[01])" +
      "([T ]([01]\\d|2[0-3])(:[0-5]\\d(:[0-5]\\d(\\.\\d+)?)?)?" +
      "(Z|[+-]\\d{2}(:?\\d{2})?)?)?)?)?$"

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
    * classified value. Missing cells are NOT dropped: pandas reads an
    * empty CSV cell as NaN, `float(nan)` succeeds, and the reference
    * appends `str(value)` = "nan" as a NUMBER literal (`parsing_cb.py`
    * classify-then-stringify order) — reproduced here as a 'nan' fill. */
  def literals(orgs: DataFrame): DataFrame = {
    val identity = Set("permalink", "name", "alias1", "alias2", "alias3")
    val valueCols = orgs.columns.filterNot(identity.contains)
    val entries = array(valueCols.map(c =>
      struct(lit(c).as("pred"), col(c).cast("string").as("value"))): _*)
    orgs.select(col("permalink").as("entity"), explode(entries).as("e"))
      .select(col("entity"), col("e.pred").as("pred"),
        coalesce(col("e.value"), lit("nan")).as("value"))
      .withColumn("datatype", classifyValue(col("value")))
  }
}
