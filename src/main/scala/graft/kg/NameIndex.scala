package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Text

/** Stage 6 — the label/alias inverted index, replacing the reference's
  * Elasticsearch `wikidata` index (`scripts/indexing.py:255-349`, mapping
  * `scripts/index_confs/kg_schema.json`) with Spark tables:
  *
  *  - `names`  — one row per unique lowercased surface form per entity
  *    (label wins over alias), with the precomputed ranking features the
  *    reference stores per ES doc (popularity_norm, ntoken, length);
  *  - `postings`   — token → name-row posting list (the whitespace+
  *    lowercase analyzer, `kg_schema.json:8-17`, made explicit);
  *  - `postings3g` — char-3-gram → name-row posting list (the fuzzy path).
  *
  * PERS dot-abbreviations (`generate_dot_notation_options`,
  * `indexing.py:50-66`) are added as extra alias rows from the en label.
  * The reference also re-appends the unabbreviated name (i = 0 option) as
  * an alias doc; we drop that duplicate because `names` is keyed by
  * (id, name_clean) — candidate sets are unchanged.
  *
  * Determinism deviations: languages are emitted sorted; when two
  * differently-cased variants of the same lowercased form exist, the kept
  * original case is that of (labels before aliases, then lexicographically
  * smallest language) rather than dict-insertion order.
  *
  * Scale notes: in this sandbox the stage tables are plain Parquet (no
  * persistent metastore, so `bucketBy`/`saveAsTable` bucket metadata would
  * not survive a session) and every linking run re-shuffles the index side
  * once; the cluster-scale design is Iceberg tables bucketed by
  * `token`/`id` so repeated runs shuffle only the mention side — the
  * shape is PROVEN session-locally in PlanQualitySpec ("bucketed postings
  * table joins with NO exchange on the index side"): a
  * `bucketBy(8, "token")` saveAsTable of this postings table plans
  * exactly one mention-side Exchange per linking join. Popularity
  * max (A1/A2) is a partial+final agg producing one scalar, broadcast into
  * the projection. Derived stats (tokenStats, idfMaps, hot tokens) are
  * precomputable at build time so linking runs carry no index-side work.
  */
object NameIndex {

  /** "John Fitzgerald Kennedy" → ["John Fitzgerald Kennedy",
    * "J. Fitzgerald Kennedy", "J. F. Kennedy"] — `indexing.py:50-66`
    * (option i abbreviates words j < i, always keeps the last word). */
  def dotAbbreviations(name: Column): Column = {
    val words = split(name, " ")
    val n = size(words)
    // option(i), i ∈ [1, n-1]: words[0..i-1] → "X.", words[i..n-2] kept,
    // last word always kept (reference option i=0, the unabbreviated name
    // itself, is intentionally omitted — see scaladoc).
    val options = transform(sequence(lit(1), n - 1), i =>
      array_join(
        concat(
          transform(slice(words, lit(1), i), w => concat(w.substr(1, 1), lit("."))),
          slice(words, i + 1, greatest(n - 1 - i, lit(0))),
          array(element_at(words, -1))),
        " "))
    when(n >= 2, options).otherwise(array().cast("array<string>"))
  }

  /** items → names table.
    * Columns: id, name, name_clean, languages, is_alias, kind, ner_type,
    * explicit_types, extended_types, types_text, description,
    * popularity_norm, ntoken, length. */
  /** A1 global max popularity — defensive: empty input → 0, any numeric
    * popularity type accepted (cast to double before the read). */
  def maxPopularity(items: DataFrame): Double = {
    val row = items.agg(max(col("popularity").cast("double"))).first()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  def names(items: DataFrame): DataFrame = {
    val maxPop = maxPopularity(items)

    // surface forms: labels (is_alias=false) ∪ aliases (true) ∪ PERS abbrevs
    val labelRows = items.select(col("entity"), explode(col("labels")).as(Seq("lang", "name")))
      .withColumn("is_alias", lit(false))
    val aliasRows = items
      .select(col("entity"), explode(col("aliases")).as(Seq("lang", "alist")))
      .select(col("entity"), col("lang"), explode(col("alist")).as("name"))
      .withColumn("is_alias", lit(true))
    val persAbbrevs = items
      .filter(array_contains(col("ner_types"), "PERS") && col("labels")("en").isNotNull)
      .select(col("entity"), explode(dotAbbreviations(col("labels")("en"))).as("name"))
      // drop the i=0 unabbreviated duplicate of the label itself
      .filter(col("name") =!= col("labels")("en"))
      .withColumn("lang", lit("en")).withColumn("is_alias", lit(true))
      .select(col("entity"), col("lang"), col("name"), col("is_alias"))

    val surfaces = labelRows.unionByName(aliasRows).unionByName(persAbbrevs)
      .withColumn("name_clean", Text.cleanStr(col("name")))
      .filter(col("name_clean") =!= "")

    // A3 dedup-merge: group by (entity, lowercased form); label beats alias;
    // deterministic case pick = (is_alias asc, lang asc, name asc)
    val merged = surfaces
      .groupBy(col("entity"), col("name_clean"))
      .agg(
        min(struct(col("is_alias"), col("lang"), col("name"))).as("pick"),
        array_sort(collect_set(col("lang"))).as("languages"),
        min(col("is_alias")).as("is_alias"))
      .select(col("entity"), col("name_clean"), col("pick.name").as("name"),
        col("languages"), col("is_alias"))

    val meta = items.select(
      col("entity"), col("description"), col("kind"),
      // NERtype = first observed ner type (indexing.py:255-259)
      when(size(col("ner_types")) > 0, col("ner_types").getItem(0)).as("ner_type"),
      col("explicit_types"), col("extended_types"),
      // `types` text field = P31 ++ P279 space-joined (indexing.py:263-264)
      concat_ws(" ", concat(col("p31"), col("p279"))).as("types_text"),
      // bround = HALF_EVEN, matching Python round() (indexing.py:266-270)
      bround(col("popularity") / lit(if (maxPop > 0) maxPop else 1.0), 2)
        .as("popularity_norm"))

    merged.join(meta, Seq("entity"), "left")
      .select(
        col("entity").as("id"), col("name"), col("name_clean"),
        col("languages"), col("is_alias"), col("kind"), col("ner_type"),
        col("explicit_types"), col("extended_types"), col("types_text"),
        col("description"), col("popularity_norm"),
        Text.ntoken(col("name")).as("ntoken"),
        length(col("name")).as("length"),
        // token/3-gram sets precomputed ONCE here so candidate scoring is
        // an array_intersect per pair, not a per-pair set build
        Text.tokenSet(col("name_clean")).as("name_tokens"),
        Text.ngramSet(col("name_clean"), 3).as("name_grams"),
        // stable row key for posting lists
        (xxhash64(col("entity"), col("name_clean")) .bitwiseAND(lit(Long.MaxValue)))
          .as("name_row_id"))
  }

  /** Token posting list (token, name_row_id) — ES whitespace+lowercase
    * analyzer realized as an exploded bucketable table. */
  def postings(namesDf: DataFrame): DataFrame =
    namesDf
      .select(col("name_row_id"), explode(Text.tokenSet(col("name_clean"))).as("token"))
      .distinct()

  /** VOCABULARY-level char-3-gram table (gram, token) for the fuzzy path —
    * the realization of ES's term dictionary: fuzzy expansion resolves a
    * mention token to matching index TOKENS first (vocabulary scale), and
    * only the accepted tokens touch the posting lists. Carrying
    * name_row_id through the gram join instead would multiply the join by
    * posting-list length — quadratic at corpus scale. */
  def postings3g(namesDf: DataFrame, n: Int = 3): DataFrame =
    namesDf
      .select(explode(Text.tokenSet(col("name_clean"))).as("token"))
      .distinct()
      .select(col("token"), explode(Text.tokenNgrams(col("token"), n)).as("gram"))
      .distinct()

  /** All sorted 2-subsets of a (sorted, distinct) token array, encoded
    * "a|b". Empty for <2 tokens. */
  def tokenPairs(tokens: Column): Column =
    when(size(tokens) < 2, array().cast("array<string>"))
      .otherwise(flatten(transform(sequence(lit(0), size(tokens) - 2), i =>
        transform(slice(tokens, i + 2, size(tokens) - i - 1),
          t => concat(element_at(tokens, i + 1), lit("|"), t)))))

  /** Token document frequencies (token, df) — the blocking/idf statistic
    * of the index, precomputable at index-build time so linking runs skip
    * the postings aggregation (it is pure index-side work). */
  def tokenStats(postingsDf: DataFrame): DataFrame =
    postingsDf.groupBy("token").agg(count(lit(1)).as("df"))

  /** Per-name-row token→idf maps (name_row_id, idf_map) — built once at
    * vocabulary scale so per-candidate scoring in the linking DAG is a
    * pure array fold over the map, with no explode/join/groupBy over
    * candidates and no index-side work per run.
    * idf(t) = ln(1 + N/df(t)), N = name-row count. */
  def idfMaps(namesDf: DataFrame, tokenStatsDf: DataFrame,
              nameRows: Long): DataFrame = {
    val idf = tokenStatsDf.select(col("token"),
      log(lit(1.0) + lit(nameRows.toDouble) / col("df")).as("idf"))
    namesDf
      .select(col("name_row_id"), explode(col("name_tokens")).as("token"))
      .join(idf, Seq("token"), "left")
      .groupBy("name_row_id")
      .agg(map_from_entries(collect_list(
        struct(col("token"), coalesce(col("idf"), lit(0.0))))).as("idf_map"))
  }

  /** Token-PAIR posting list (pair, name_row_id) — the candidate-blocking
    * index for multi-token mentions: a candidate that shares ≥2 tokens
    * with a mention shares ≥1 token pair, and pair posting lists are
    * shorter than single-token lists by orders of magnitude ("garen
    * ashford" vs every "ashford"). This is what keeps full-name lookups
    * linear when single-name-token df grows with the corpus. */
  def postingsPair(namesDf: DataFrame): DataFrame =
    namesDf
      .select(col("name_row_id"), explode(tokenPairs(col("name_tokens"))).as("pair"))
      .distinct()

  /** Pair document frequencies (pair, df) — the blocking statistic of the
    * pair-posting table. Precomputed at index-build time (alongside
    * tokenStats) so linking runs don't re-aggregate the LARGEST index
    * table on their critical path — it is pure index-side work that only
    * changes when the index does. */
  def pairStats(postingsPairDf: DataFrame): DataFrame =
    postingsPairDf.groupBy("pair").agg(count(lit(1)).as("df"))
}
