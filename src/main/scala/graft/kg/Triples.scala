package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stages 10-11 — canonicalization + triple materialization.
  *
  * Canonicalization (north rule; no reference counterpart — the reference
  * dedups per entity id only, A7): equivalence edges (P460 "said to be the
  * same as" / sameas links) → connected components → every linked QID
  * replaced by its component's min QID (deterministic lexicographic-on-
  * (length,value) QID order = numeric order for equal-width ids; we order
  * by (length(qid), qid) so Q99 < Q100).
  *
  * Triple emission (distant-supervision form): for every page, the pairs
  * of canonicalized entities linked on that page are joined against the
  * KG edge table `objects(subj, pred, obj)`; a KG edge between two
  * co-mentioned entities is emitted as an extracted triple with
  * provenance (source_url). This reproduces the reference's emitted-edge
  * semantics (`objects` collection → normalized (subj,pred,obj),
  * `parse_wikidata_dump_parallel.py:1070-1075,1101`) grounded in text.
  */
object Triples {

  /** QID total order key: numeric order via (length, value). */
  private val qidOrd = struct(length(col("qid")).as("l"), col("qid").as("q"))

  /** (node, canon) mapping from equivalence edges; nodes not in any edge
    * are implicitly their own canon (handle with left join + coalesce). */
  def canonMap(equivEdges: DataFrame): DataFrame = {
    // connectedComponents min-label is lexicographic on the label type; to
    // get numeric-QID min ("Q99" < "Q100") remap qid → zero-padded sort key
    val pad = (c: org.apache.spark.sql.Column) =>
      concat(lpad(length(c).cast("string"), 4, "0"), c)
    val padded = equivEdges.select(pad(col("src")).as("src"), pad(col("dst")).as("dst"))
    graft.graph.Canonicalize.connectedComponents(padded)
      .select(substring(col("node"), 5, 1000000).as("qid"),
        substring(col("component"), 5, 1000000).as("canon"))
  }

  /** Replace ids by their canonical representative. */
  def canonicalize(links: DataFrame, canon: DataFrame, idCol: String): DataFrame =
    links
      .join(canon.withColumnRenamed("qid", idCol), Seq(idCol), "left")
      .withColumn(idCol, coalesce(col("canon"), col(idCol)))
      .drop("canon")

  /** Per-page entity pairs × KG edges → extracted triples.
    * @param pageLinks (url, qid) distinct linked entities per page
    * @param kgObjects (subj, pred, obj) KG edge table */
  def extract(pageLinks: DataFrame, kgObjects: DataFrame): DataFrame = {
    val a = pageLinks.select(col("url"), col("qid").as("subj"))
    val b = pageLinks.select(col("url"), col("qid").as("obj"))
    val pairs = a.join(b, Seq("url")).filter(col("subj") =!= col("obj"))
    pairs
      .join(kgObjects, Seq("subj", "obj"))
      .select(col("subj"), col("pred"), col("obj"), col("url").as("source_url"))
      .distinct()
  }
}
