package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Similarity, Text}

/** Retrieval parity layer — the batch Dataset equivalents of the
  * reference's entity endpoints (`app/api/routes/entity.py` →
  * `lamapi/retrievers` (`*_retriever.py`)). Each takes the request id list as
  * a DataFrame (`entity` column) and broadcast-joins it against the core
  * tables (J1: `find({"entity":{"$in":[…]}})` → broadcast inner join;
  * unknown ids ⇒ absent rows, exactly like the Mongo cursor).
  */
object Retrieval {

  private def req(ids: DataFrame): DataFrame =
    broadcast(ids.select(col("entity")).distinct())

  /** /entity/types — (entity, p31, p279) (`types_retriever.py:11-28`). */
  def getTypes(items: DataFrame, ids: DataFrame): DataFrame =
    items.join(req(ids), Seq("entity")).select(col("entity"), col("p31"), col("p279"))

  /** /entity/objects — re-nested `{obj → [pred]}` per entity
    * (`objects_retriever.py:11-34`; nesting `parse…py:1070-1075`). */
  def getObjects(objects: DataFrame, ids: DataFrame): DataFrame =
    objects.withColumnRenamed("subj", "entity")
      .join(req(ids), Seq("entity"))
      .groupBy(col("entity"), col("obj"))
      .agg(array_sort(collect_set(col("pred"))).as("preds"))
      .groupBy(col("entity"))
      .agg(map_from_entries(collect_list(struct(col("obj"), col("preds"))))
        .as("objects"))

  /** /entity/literals — `{DATATYPE → {pred → [values]}}`
    * (`literals_retriever.py`; nesting `parse…py:1076-1082`). */
  def getLiterals(literals: DataFrame, ids: DataFrame): DataFrame =
    literals.withColumnRenamed("subj", "entity")
      .join(req(ids), Seq("entity"))
      .groupBy(col("entity"), col("datatype"), col("pred"))
      .agg(array_sort(collect_set(col("value"))).as("values"))
      .groupBy(col("entity"), col("datatype"))
      .agg(map_from_entries(collect_list(struct(col("pred"), col("values"))))
        .as("by_pred"))
      .groupBy(col("entity"))
      .agg(map_from_entries(collect_list(struct(col("datatype"), col("by_pred"))))
        .as("literals"))

  /** /entity/labels — `{lang → label}` (`labels_retriever.py:11-45`). */
  def getLabels(items: DataFrame, ids: DataFrame): DataFrame =
    items.join(req(ids), Seq("entity")).select(col("entity"), col("labels"), col("aliases"))

  /** /entity/sameas — wikidata/wikipedia urls (`sameas_retriever.py`). */
  def getSameas(items: DataFrame, ids: DataFrame): DataFrame =
    items.join(req(ids), Seq("entity"))
      .select(col("entity"), col("urls.wikidata").as("wikidata"),
        col("urls.wikipedia").as("wikipedia"))

  /** /entity/predicates — for (subj, obj) pairs, the predicates connecting
    * them (J2, `predicates_retriever.py:53-76`): normalized-triple inner
    * join instead of the reference's map-membership probe. */
  def getPredicates(objects: DataFrame, pairs: DataFrame): DataFrame =
    objects.join(broadcast(pairs.select(col("subj"), col("obj")).distinct()),
        Seq("subj", "obj"))
      .groupBy(col("subj"), col("obj"))
      .agg(array_sort(collect_set(col("pred"))).as("predicates"))

  /** Entity bag-of-words table: cleaned, alnum-only, stopword-free token
    * set of label+aliases+description (engine-defined composition — the
    * reference's `items_vectors2` blobs are precomputed elsewhere; the
    * tokenizer semantics are `bow_retriever.py:30-38`). */
  def entityBow(items: DataFrame): DataFrame =
    items.select(col("entity"),
      Text.bowTokens(concat_ws(" ",
        col("labels")("en"),
        array_join(coalesce(col("aliases")("en"), array().cast("array<string>")), " "),
        col("description"))).as("bow"))

  /** /bow — per (text, entity) overlap score
    * `|text_tokens ∩ bow| / |text_tokens|` (`bow_retriever.py:93-142`). */
  def getBowScores(bow: DataFrame, texts: DataFrame): DataFrame = {
    val t = texts.select(col("entity"), Text.bowTokens(col("text")).as("text_tokens"))
    bow.join(broadcast(t), Seq("entity"))
      .select(col("entity"),
        (size(array_intersect(col("text_tokens"), col("bow"))).cast("double") /
          greatest(size(col("text_tokens")), lit(1))).as("bow_score"))
  }

  /** /summary — predicate frequency summaries, top-k by count
    * (A13, `summary_retriever.py:11-21`; the summary table itself is
    * `groupBy(pred).count` — the reference assumes it pre-built). */
  def summary(edges: DataFrame, k: Int, asc: Boolean = false): DataFrame = {
    val counts = edges.groupBy(col("pred")).agg(count(lit(1)).as("count"))
    val sorted = if (asc) counts.orderBy(col("count").asc, col("pred"))
                 else counts.orderBy(col("count").desc, col("pred"))
    sorted.limit(k)
  }

  /** /literal-recognizer + /column-analysis tag rollup (N2 taxonomy):
    * per column, the winning LIT datatype by majority
    * (`column_analysis.py:36-87` output adapter semantics). */
  def columnAnalysis(cells: DataFrame): DataFrame = {
    val labeled = cells.withColumn("label",
      graft.functions.Literals.classify(col("value")))
    labeled.groupBy(col("col_id"), col("label")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("col_id"))
          .orderBy(col("n").desc, col("label"))))
      .filter(col("rk") === 1)
      .select(col("col_id"), col("label").as("column_type"), col("n"))
  }
}
