package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stages 7-9 — lookup candidate generation + the 18-feature scoring
  * contract (`lookup_retriever.py:278-302`), field-by-field goldens. */
class LinkerSpec extends SparkSpec {
  import spark.implicits._

  private val N = 200
  private lazy val world = {
    val dump = Fixtures.dumpLines(spark, N)
    val parsed = ParseEntities.parse(dump)
    val claims = ParseEntities.claims(parsed)
    val objects = ParseEntities.objects(claims)
    val closure = graft.graph.TypeClosure.closure(
      objects.filter(col("pred") === "P279")
        .select(col("subj").as("child"), col("obj").as("parent")))
    val items = ParseEntities.items(parsed, closure,
      NerSeeds.geoSeeds(spark, closure), NerSeeds.orgSeeds(spark, closure)).cache()
    val names = NameIndex.names(items).cache()
    val typeNames = items.filter(col("kind") === "type")
      .select(col("entity"), col("labels")("en").as("name"))
      .filter(col("name").isNotNull)
    (items, NameIndexTables(names,
      NameIndex.postings(names).cache(), NameIndex.postings3g(names).cache(),
      typeNames = Some(typeNames),
      maxPopularity = Some(NameIndex.maxPopularity(items))))
  }
  private lazy val items = world._1
  private lazy val index = world._2

  private def mentionsOf(ms: String*) =
    ms.toSeq.toDF("surface")
      .select(graft.core.Text.cleanStr(col("surface")).as("mention_norm"))

  test("exact label lookup: entity ranks first with perfect scores") {
    val label = items.filter(col("entity") === "Q100000")
      .select(col("labels")("en")).first().getString(0)
    val out = Linker.lookup(spark, mentionsOf(label), index,
      LinkerConfig(limit = 1000)).cache()
    val best = out.orderBy((col("ed_score") + col("jaccard_score")).desc).first()
    assert(best.getAs[String]("id") == "Q100000")
    assert(best.getAs[Double]("ed_score") == 1.0)
    assert(best.getAs[Double]("jaccard_score") == 1.0)
    assert(best.getAs[Double]("jaccardNgram_score") == 1.0)
    // candidate object shape: all 18 reference fields + mention_norm/rank
    val cols = out.columns.toSet
    val expected = Set("id", "name", "description", "types", "kind", "NERtype",
      "explicit_types", "extended_types", "ambiguity_mention", "corrects_tokens",
      "ntoken_mention", "ntoken_entity", "length_mention", "length_entity",
      "popularity", "pos_score", "es_score", "ed_score", "jaccard_score",
      "jaccardNgram_score")
    assert(expected.subsetOf(cols))
  }

  test("feature golden: scores match hand-computed reference formulae") {
    // mention "alderton" vs city label "Alderton" (exact single token)
    val out = Linker.lookup(spark, mentionsOf("Alderton"), index,
      LinkerConfig(limit = 50)).cache()
    val city = out.filter(col("name") === "Alderton").first()
    assert(city.getAs[Double]("ed_score") == 1.0)
    assert(city.getAs[Int]("ntoken_mention") == 1)
    assert(city.getAs[Int]("length_mention") == 8)
    assert(city.getAs[Int]("ntoken_entity") == 1)
    assert(city.getAs[Int]("length_entity") == 8)
    // "City of Alderton" alias row is a separate entity-variant; A7 dedup
    // keeps only ONE row for the city entity (the best ed+jac variant)
    val cityId = city.getAs[String]("id")
    assert(out.filter(col("id") === cityId).count() == 1)
  }

  test("pos_score = rank/N over popularity-desc order (elastic.py:98)") {
    val out = Linker.lookup(spark, mentionsOf("Alderton"), index,
      LinkerConfig(limit = 1000)).cache()
    val rows = out.select("rank", "pos_score", "popularity").collect()
    val n = rows.length // A7 dedup keeps all ranks distinct per entity here
    // ranks are 1..n and pos_score = rank / #hits before dedup
    rows.foreach { r =>
      assert(r.getAs[Double]("pos_score") > 0.0 && r.getAs[Double]("pos_score") <= 1.0)
    }
    // popularity non-increasing in rank
    val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("popularity"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("es_score normalized to [0,1] with max 1 per mention (elastic.py:99)") {
    val out = Linker.lookup(spark, mentionsOf("Alderton", "Springfield"), index,
      LinkerConfig(limit = 100)).cache()
    val perMention = out.groupBy("mention_norm").agg(max("es_score").as("m"))
      .select("m").as[Double].collect()
    perMention.foreach(m => assert(math.abs(m - 1.0) < 1e-9))
  }

  test("fuzzy: one-edit misspelling finds the entity via 3-gram postings") {
    val out = Linker.lookup(spark, mentionsOf("Aldertn"), index,
      LinkerConfig(limit = 1000, fuzzy = true)).cache()
    val names = out.select("name").as[String].collect()
    assert(names.contains("Alderton"), s"got: ${names.take(10).mkString(",")}")
    // non-fuzzy must NOT find it (token mismatch)
    val strict = Linker.lookup(spark, mentionsOf("Aldertn"), index,
      LinkerConfig(limit = 1000, fuzzy = false))
    assert(!strict.select("name").as[String].collect().contains("Alderton"))
  }

  test("hard filters: kind / NERtype / extended_types restrict candidates") {
    val byKind = Linker.lookup(spark, mentionsOf("City"), index,
      LinkerConfig(limit = 50, kind = Some("type")))
    assert(byKind.select("kind").distinct().as[String].collect().toSeq == Seq("type"))

    val byNer = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, nerTypes = Seq("LOC")))
    assert(byNer.select("NERtype").distinct().as[String].collect().toSeq == Seq("LOC"))

    val byExt = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, extendedTypes = Seq("Q2221906")))
    byExt.select("extended_types").as[Seq[String]].collect()
      .foreach(ts => assert(ts.contains("Q2221906")))
  }

  test("soft filtering penalizes instead of excluding") {
    val hard = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, types = Seq("Q515")))
    val soft = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, types = Seq("Q515"), softFiltering = true))
    assert(soft.count() >= hard.count())
  }

  test("ambiguity_mention: exact-label share of distinct candidate ids (A5)") {
    val out = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 1000)).cache()
    val amb = out.select("ambiguity_mention").distinct().as[Double].head()
    val nIds = out.select("id").distinct().count().toDouble
    val nExact = out.filter(lower(col("name")) === "springfield")
      .select("id").distinct().count().toDouble
    assert(math.abs(amb - nExact / nIds) < 1e-9)
    val ct = out.select("corrects_tokens").distinct().as[Double].head()
    assert(ct == 1.0) // the token "springfield" appears in candidate labels
  }

  test("types enrichment: [{id, name}] structs with kind='type' labels (J5)") {
    val out = Linker.lookup(spark, mentionsOf("Alderton"), index,
      LinkerConfig(limit = 50)).cache()
    val typed = out.select(explode(col("types")).as("t"))
      .select(col("t.id").as("tid"), col("t.name").as("tname"))
      .as[(String, String)].collect()
    assert(typed.nonEmpty, "city candidates carry P31 types")
    // city entities are P31 Q515 whose label is "city" in the fixture KG
    val labels = items.filter(col("kind") === "type")
      .select(col("entity"), col("labels")("en")).as[(String, String)]
      .collect().toMap
    typed.foreach { case (tid, tname) =>
      assert(tname == labels.getOrElse(tid, tid),
        s"type $tid should be named ${labels.getOrElse(tid, tid)}, got $tname")
    }
    assert(typed.exists { case (tid, tname) => tname != tid },
      "at least one type id must resolve to a label")
  }

  test("forced ids (_check_ids): missing id appended with pos=es=1, rank after main") {
    val forced = items
      .filter(!lower(col("labels")("en")).contains("springfield") &&
        col("kind") === "entity")
      .select("entity").as[String].head()
    val base = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50)).cache()
    assert(!base.filter(col("id") === forced).isEmpty == false) // not in base
    val out = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, ids = Seq(forced))).cache()
    val row = out.filter(col("id") === forced).first()
    assert(row.getAs[Double]("pos_score") == 1.0)
    assert(row.getAs[Double]("es_score") == 1.0)
    val maxMain = base.agg(max("rank")).first().getInt(0)
    assert(row.getAs[Int]("rank") == maxMain + 1)
    // same 18-feature shape, real similarity features
    assert(row.getAs[Double]("ed_score") >= 0.0 && row.getAs[Double]("ed_score") <= 1.0)
    // an id already in the match set is NOT duplicated
    val present = base.orderBy(col("rank")).select("id").as[String].head()
    val out2 = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, ids = Seq(present)))
    assert(out2.filter(col("id") === present).count() == 1)
  }

  test("normalize_score=false denormalizes popularity and keeps raw es (F7)") {
    val norm = Linker.lookup(spark, mentionsOf("Alderton"), index,
      LinkerConfig(limit = 20)).cache()
    val denorm = Linker.lookup(spark, mentionsOf("Alderton"), index,
      LinkerConfig(limit = 20, normalizeScore = false)).cache()
    val maxPop = index.maxPopularity.get
    val n = norm.select("id", "popularity").as[(String, Double)].collect().toMap
    val d = denorm.select("id", "popularity").as[(String, Double)].collect().toMap
    n.foreach { case (id, p) => assert(math.abs(d(id) - p * maxPop) < 1e-9) }
    // raw es: per-mention max no longer forced to 1 (idf sums exceed 1 here)
    val maxEs = denorm.agg(max("es_score")).first().getDouble(0)
    assert(maxEs > 1.0)
  }

  test("fuzzy short-token fallback: zero-shared-gram edits are found (SymSpell deletes)") {
    // 'oak' → 'oxk' (lev 1, len 3: AUTO allows 1 edit) shares NO 3-gram;
    // 'throne' → 'thxonx' (lev 2, len 6) shares none either — both only
    // reachable through the delete-neighborhood join
    val mini = Seq(
      ("Q1", Map("en" -> "Oak"), "a tree"),
      ("Q2", Map("en" -> "Throne"), "a chair"),
      ("Q3", Map("en" -> "Maple"), "another tree")
    ).toDF("entity", "labels", "description")
      .withColumn("aliases", typedLit(Map.empty[String, Seq[String]]))
      .withColumn("ner_types", typedLit(Seq.empty[String]))
      .withColumn("p31", typedLit(Seq.empty[String]))
      .withColumn("p279", typedLit(Seq.empty[String]))
      .withColumn("explicit_types", typedLit(Seq.empty[String]))
      .withColumn("extended_types", typedLit(Seq.empty[String]))
      .withColumn("kind", lit("entity"))
      .withColumn("popularity", lit(1))
    val nm = NameIndex.names(mini)
    val idx2 = NameIndexTables(nm, NameIndex.postings(nm), NameIndex.postings3g(nm))
    val out = Linker.lookup(spark, mentionsOf("Oxk", "Thxonx"), idx2,
      LinkerConfig(limit = 10, fuzzy = true)).cache()
    val found = out.select("mention_norm", "id").as[(String, String)].collect().toSet
    assert(found.contains(("oxk", "Q1")), s"got $found")
    assert(found.contains(("thxonx", "Q2")), s"got $found")
  }

  test("forced ids append in REQUESTED order, not id order") {
    val absent = items
      .filter(!lower(col("labels")("en")).contains("springfield") &&
        col("kind") === "entity")
      .select("entity").as[String].take(2).toSeq
    // request in descending-id order — ranks must follow the request
    val req = absent.sorted.reverse
    val out = Linker.lookup(spark, mentionsOf("Springfield"), index,
      LinkerConfig(limit = 50, ids = req)).cache()
    val forcedRows = out.filter(col("id").isin(req: _*))
      .select("id", "rank").as[(String, Int)].collect().sortBy(_._2)
    assert(forcedRows.map(_._1).toSeq == req,
      s"ranks should follow requested order $req, got ${forcedRows.toSeq}")
  }

  test("fuzzy gram prune keeps repeat-gram pairs (driver ≡ distributed)") {
    // 'aaaaaaaaaa' vs 'aaaaaaaaab': lev=1, d=2, but only ONE distinct
    // shared 3-gram — a distinct-gram count would wrongly prune it; the
    // positional (multiset) bound keeps it. Verified on BOTH phase-1
    // paths: the in-driver SymSpell and the distributed gram+delete join.
    val mini = Seq(
      ("Q1", Map("en" -> "aaaaaaaaaa"), "repeats"),
      ("Q2", Map("en" -> "bbbbbbcccc"), "control")
    ).toDF("entity", "labels", "description")
      .withColumn("aliases", typedLit(Map.empty[String, Seq[String]]))
      .withColumn("ner_types", typedLit(Seq.empty[String]))
      .withColumn("p31", typedLit(Seq.empty[String]))
      .withColumn("p279", typedLit(Seq.empty[String]))
      .withColumn("explicit_types", typedLit(Seq.empty[String]))
      .withColumn("extended_types", typedLit(Seq.empty[String]))
      .withColumn("kind", lit("entity"))
      .withColumn("popularity", lit(1))
    val nm = NameIndex.names(mini)
    val p3 = NameIndex.postings3g(nm)
    val tokenDf = NameIndex.tokenStats(NameIndex.postings(nm))
    val md = Linker.distinctMentions(mentionsOf("aaaaaaaaab", "bbbbbbccxc"))
    val cfg = LinkerConfig(fuzzy = true)
    def exps(driverMax: Long) =
      Linker.fuzzyExpansions(md, p3, tokenDf, cfg, vocabDriverMax = driverMax)
        .select("mtok", "token").as[(String, String)].collect().toSet
    val driver = exps(20000L)
    val dist = exps(0L) // vocab count > 0 forces the distributed path
    assert(driver.contains(("aaaaaaaaab", "aaaaaaaaaa")), s"driver: $driver")
    assert(dist.contains(("aaaaaaaaab", "aaaaaaaaaa")), s"distributed: $dist")
    assert(driver == dist, s"paths diverge: $driver vs $dist")
  }

  test("persisted lookup memo: second run skips generation for memoized mentions") {
    val memoDir = java.nio.file.Files.createTempDirectory("linkmemo").toString + "/memo"
    val cfg = LinkerConfig(limit = 20, cutByRelevance = true, computeAmbiguity = false)
    val m1 = mentionsOf("Alderton", "Xqzj Vvkp")
    val first = Linker.linkTop1Memoized(spark, m1, index, cfg, 0.5, memoDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(first.nonEmpty, "Alderton must link")
    // run 2 over overlapping + new mentions, against an EMPTY index (but
    // carrying the REAL index's fingerprint, as a caller reusing a built
    // index does): the memoized mention can only resolve through the memo —
    // proof that candidate generation was skipped for it. The no-link
    // mention is memoized too (cached empty response) and must NOT reappear.
    val emptyNames = index.names.filter(lit(false)).localCheckpoint(eager = false)
    val emptyIdx = NameIndexTables(emptyNames,
      index.postings.filter(lit(false)), index.postings3g.filter(lit(false)),
      index.postingsPair.map(_.filter(lit(false))),
      fingerprint = Some(Linker.indexFingerprint(index)))
    val m2 = mentionsOf("Alderton", "Xqzj Vvkp", "Springfield")
    val second = Linker.linkTop1Memoized(spark, m2, emptyIdx, cfg, 0.5, memoDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(second.get("alderton") == first.get("alderton"),
      s"memoized link must survive an index-free run: $second vs $first")
    assert(!second.contains("xqzj vvkp"))
    // determinism: re-running with the REAL index changes nothing
    val third = Linker.linkTop1Memoized(spark, m2, index, cfg, 0.5, memoDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(third.get("alderton") == first.get("alderton"))
  }

  test("memo auto-invalidates when the index content changes") {
    val memoDir = java.nio.file.Files.createTempDirectory("linkmemo-inv")
      .toString + "/memo"
    val cfg = LinkerConfig(limit = 20, cutByRelevance = true, computeAmbiguity = false)
    val m = mentionsOf("Alderton")
    val first = Linker.linkTop1Memoized(spark, m, index, cfg, 0.5, memoDir)
      .collect()
    assert(first.nonEmpty, "Alderton must link on the original index")
    // a REBUILT (here: emptied) index has a different content fingerprint,
    // so the memoized row must be IGNORED — regeneration against the new
    // index finds nothing. (Pre-r4 the memo key covered only the config,
    // and this returned the stale link.)
    val emptyNames = index.names.filter(lit(false)).localCheckpoint(eager = false)
    val rebuilt = NameIndexTables(emptyNames,
      index.postings.filter(lit(false)), index.postings3g.filter(lit(false)),
      index.postingsPair.map(_.filter(lit(false))))
    val second = Linker.linkTop1Memoized(spark, m, rebuilt, cfg, 0.5, memoDir)
      .collect()
    assert(second.isEmpty,
      s"stale memo rows served after an index rebuild: ${second.mkString}")
  }

  test("memo compaction: duplicates collapse, maxRows bounds the table") {
    val memoDir = java.nio.file.Files.createTempDirectory("linkmemo-cmp")
      .toString + "/memo"
    val cfg = LinkerConfig(limit = 20, cutByRelevance = true, computeAmbiguity = false)
    val m = mentionsOf("Alderton", "Springfield")
    // two runs under two DIFFERENT configs → two batch dirs, two cfg_keys
    Linker.linkTop1Memoized(spark, m, index, cfg, 0.5, memoDir).collect()
    Linker.linkTop1Memoized(spark, m, index, cfg.copy(limit = 10), 0.5, memoDir)
      .collect()
    val raw = spark.read.option("recursiveFileLookup", "true").parquet(memoDir)
    assert(raw.select("cfg_key").distinct().count() == 2)
    // materialize the expected count BEFORE the rewrite deletes raw's files
    val expected = raw.dropDuplicates("cfg_key", "mention_norm").count()
    val deduped = Linker.compactMemo(spark, memoDir)
    assert(deduped == expected)
    val bounded = Linker.compactMemo(spark, memoDir, maxRows = 1)
    assert(bounded == 1, s"compaction must bound the memo (got $bounded)")
    // a bounded memo only costs recomputation: the run still links
    val after = Linker.linkTop1Memoized(spark, m, index, cfg, 0.5, memoDir)
      .collect().map(_.getString(0)).toSet
    assert(after.contains("alderton"))
  }

  test("salting path yields identical candidates to the unsalted join") {
    val base = Linker.lookup(spark, mentionsOf("Alderton", "Springfield"), index,
      LinkerConfig(limit = 100, hotTokenDf = Long.MaxValue))
      .select("mention_norm", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val salted = Linker.lookup(spark, mentionsOf("Alderton", "Springfield"), index,
      LinkerConfig(limit = 100, hotTokenDf = 1L, saltShards = 4))
      .select("mention_norm", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(base == salted)
  }
}
