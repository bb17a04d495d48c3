package graft.kg

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import scala.util.Random

/** Deterministic synthetic corpus (FIXTURES.md §1-3) — seeded, no
  * wall-clock, no network. Two halves:
  *
  *  1. a Wikidata-style KG dump (JSONL) covering every `parse_data` branch
  *     (`scripts/parse_wikidata_dump_parallel.py:942-1106`): all datatypes
  *     of DATATYPES_MAPPINGS, P279-bearing type entities, P-ids,
  *     a Q4167410 instance, snaks without datavalue, skip datatypes,
  *     globe coordinates, 0-sitelink entities, plus a type taxonomy with a
  *     depth-5 chain, a diamond, a cycle and hub fan-in;
  *
  *  2. Common-Crawl-style pages (url, warc_ts, html, text, lang) with 0-8
  *     embedded entity mentions per page (exact label / alias / PERS
  *     dot-abbreviation / ≤1-edit misspelling / decoy), generated together
  *     with the golden (url, qid) link set so linking P/R is computable by
  *     construction.
  *
  * Pages are generated DISTRIBUTED (spark.range → map with a per-row
  * seeded RNG), so the corpus is identical for any partitioning and scales
  * to bench sizes without a driver bottleneck. Entity definitions are a
  * driver-side array captured in the closure (small, broadcast with the
  * task) — at real 10^12-doc scale the KG side would be a table, but its
  * generator shape stays the same.
  */
object Fixtures {

  case class EntityDef(
      qid: String, label: String, aliases: Seq[String], description: String,
      p31: Seq[String], p279: Seq[String], sitelinks: Int,
      objClaims: Seq[(String, String)] = Nil,
      litClaims: Seq[(String, String, String)] = Nil, // (pid, datatype, json value)
      oddClaims: Seq[String] = Nil)                    // raw claim JSON (coverage)

  case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                  text: String, lang: String)
  case class GoldLink(url: String, surface: String, qid: String, form: String)
  case class PageWithGold(page: Page, gold: Seq[GoldLink])

  // ---------------------------------------------------------------- pools
  private val FirstNames = Vector("Alden", "Bram", "Cora", "Dara", "Edric",
    "Fiona", "Garen", "Hale", "Iris", "Joren", "Kiva", "Lorin", "Mira",
    "Nolan", "Orin", "Petra", "Quinn", "Rhea", "Soren", "Tamsin", "Ulric",
    "Vera", "Wren", "Xander", "Yara", "Zeno", "Anya", "Boris", "Cleo",
    "Dmitri", "Elsa", "Finn")
  private val LastNames = Vector("Ashford", "Blackwood", "Carden", "Draven",
    "Ellery", "Fairburn", "Granger", "Holloway", "Ingram", "Jasper",
    "Kincaid", "Lockhart", "Marlowe", "Norwood", "Oakes", "Pemberton",
    "Quill", "Ravenswood", "Sutton", "Thorne", "Underwood", "Vance",
    "Whitlock", "Xenos", "Yardley", "Zephyr", "Abbot", "Barrow", "Crane",
    "Dunmore", "Easton", "Farrow")
  private val CityStems = Vector("Alder", "Birch", "Cedar", "Dorn", "Elm",
    "Fern", "Grove", "Hazel", "Iron", "Juniper", "Kestrel", "Linden",
    "Maple", "Nettle", "Oak", "Pine", "Quince", "Rowan", "Sage", "Thorn",
    "Umber", "Vine", "Willow", "Yew")
  private val CitySuffixes = Vector("ton", "ville", "burg", "ford", "haven", "port")
  private val BizStems = Vector("Apex", "Borealis", "Cygnus", "Deltoid",
    "Ember", "Flux", "Gyre", "Helix", "Ionix", "Juno", "Krypton", "Lumen",
    "Mistral", "Nimbus", "Onyx", "Pulsar", "Quartz", "Rubicon", "Sable",
    "Tundra", "Umbra", "Vortex", "Wavecrest", "Zenith")
  private val BizSuffixes = Vector("Corp", "Industries", "Labs", "Group", "Holdings")
  private val FilmAdjs = Vector("Silent", "Crimson", "Golden", "Hollow",
    "Iron", "Jade", "Lunar", "Molten", "Northern", "Opal", "Pale", "Quiet",
    "Rusted", "Scarlet", "Twilight", "Velvet")
  private val FilmNouns = Vector("Horizon", "Labyrinth", "Monsoon", "Nebula",
    "Obelisk", "Phantom", "Quarry", "Reckoning", "Sentinel", "Threshold",
    "Undertow", "Voyage", "Watchtower", "Zealot")
  private val DishStems = Vector("Barley", "Chestnut", "Fennel", "Leek",
    "Morel", "Parsnip", "Rye", "Saffron")
  private val DishKinds = Vector("Stew", "Pie", "Broth", "Tart")
  private val VenueKinds = Vector("Arena", "Stadium", "Amphitheatre", "Pavilion")
  private val Sites = Vector("enwiki", "dewiki", "frwiki", "eswiki", "itwiki",
    "nlwiki", "ptwiki", "svwiki")
  // filler pool deliberately excludes mention-connector words {of,de,la,the,and}
  private val Filler = Vector("during", "quiet", "morning", "several",
    "people", "walked", "along", "river", "while", "watching", "distant",
    "hills", "under", "grey", "sky", "later", "they", "stopped", "near",
    "old", "bridge", "talking", "about", "harvest", "season", "before",
    "returning", "home", "with", "baskets", "full", "from", "market",
    "village", "slowly", "evening", "light", "faded", "over", "fields")

  // ------------------------------------------------------------- taxonomy
  /** (qid, label, p279 parents, description) — the class/type entities. */
  val Classes: Vector[(String, String, Seq[String], String)] = Vector(
    ("Q35120", "Entity", Nil, "root class"),
    ("Q5", "Human", Seq("Q35120"), "person class"),
    ("Q2221906", "Geographic Location", Seq("Q35120"), "geo root"),
    ("Q486972", "Human Settlement", Seq("Q2221906"), "settlement"),
    ("Q515", "City", Seq("Q486972"), "city class"),
    ("Q6256", "Country", Seq("Q2221906"), "country class"),
    ("Q43229", "Organization", Seq("Q35120"), "org root"),
    ("Q4830453", "Business", Seq("Q43229"), "business class"),
    ("Q2385804", "Educational Institution", Seq("Q43229", "Q2221906"), "ed inst"),
    ("Q3918", "University", Seq("Q2385804"), "university class"),
    ("Q8436", "Venue", Seq("Q43229", "Q2221906"), "venue class"),
    ("Q11424", "Film", Seq("Q35120"), "film class"),
    ("Q4167410", "Disambiguation Page", Seq("Q35120"), "wikimedia disambiguation"),
    ("Q2095", "Food", Seq("Q35120"), "food root"),
    ("Q746549", "Dish", Seq("Q2095"), "dish class"),
    // depth-5 chain (closure depth) + diamond + cycle (termination)
    ("Q9001", "Chainclass One", Seq("Q9002"), "chain 1"),
    ("Q9002", "Chainclass Two", Seq("Q9003"), "chain 2"),
    ("Q9003", "Chainclass Three", Seq("Q9004"), "chain 3"),
    ("Q9004", "Chainclass Four", Seq("Q9005"), "chain 4"),
    ("Q9005", "Chainclass Five", Seq("Q35120"), "chain 5"),
    ("Q9101", "Diamond Bottom", Seq("Q9102", "Q9103"), "diamond b"),
    ("Q9102", "Diamond Left", Seq("Q9104"), "diamond l"),
    ("Q9103", "Diamond Right", Seq("Q9104"), "diamond r"),
    ("Q9104", "Diamond Top", Seq("Q35120"), "diamond t"),
    ("Q9201", "Cycle Alpha", Seq("Q9202"), "cycle a"),
    ("Q9202", "Cycle Beta", Seq("Q9201"), "cycle b"))

  val Predicates: Vector[(String, String)] = Vector(
    "P31" -> "instance of", "P279" -> "subclass of", "P17" -> "country",
    "P19" -> "place of birth", "P57" -> "director", "P108" -> "employer",
    "P159" -> "headquarters location", "P214" -> "external identifier",
    "P569" -> "date of birth", "P571" -> "inception", "P577" -> "publication date",
    "P625" -> "coordinate location", "P856" -> "official website",
    "P1082" -> "population", "P1476" -> "title", "P2142" -> "box office",
    "P460" -> "said to be the same as")

  val Countries: Vector[(String, String)] = Vector(
    "Q2001" -> "Aurelia", "Q2002" -> "Borveth", "Q2003" -> "Caldora",
    "Q2004" -> "Drenholm", "Q2005" -> "Elaria", "Q2006" -> "Fenwick",
    "Q2007" -> "Galdova", "Q2008" -> "Hestria")

  // ------------------------------------------------- entity construction
  private def rng(seed: Long, id: Long): Random = new Random(seed * 1000003L + id * 7919L)

  /** The full deterministic entity world for a given size. Index layout:
    * classes ++ predicates ++ countries ++ n generated entities
    * (archetype by i % 20: 8×person, 4×city, 3×business, 1×university,
    * 2×film, 1×dish, 1×venue, 1 in {disambiguation, chain-instance}). */
  def entityDefs(n: Int, seed: Long = 42L): Vector[EntityDef] = {
    val classDefs = Classes.map { case (qid, label, parents, desc) =>
      EntityDef(qid, label, Nil, desc, Nil, parents,
        sitelinks = 2, litClaims = Nil)
    }
    val predDefs = Predicates.map { case (pid, label) =>
      EntityDef(pid, label, Nil, s"property $label", Nil, Nil, sitelinks = 1)
    }
    val countryDefs = Countries.zipWithIndex.map { case ((qid, label), i) =>
      EntityDef(qid, label, Seq(s"Republic $label"), s"country of $label",
        Seq("Q6256"), Nil, sitelinks = 8,
        litClaims = Seq(
          ("P625", "globe-coordinate",
            s"""{"latitude":${10 + i}.5,"longitude":${-20 - i}.25}"""),
          ("P1082", "quantity", s"""{"amount":"+${1000000 * (i + 1)}"}""")))
    }

    // Names are indexed by `u` (position within archetype), cycling through
    // the pools with a capitalized ordinal token ("… K2") appended once a
    // pool is exhausted — labels stay unique at bench scale except the two
    // PLANTED "Springfield" cities (u = 28 and 228), which test ambiguity.
    def uniq(base: String, u: Int, poolSize: Int): String =
      if (u < poolSize) base else s"$base K${u / poolSize}"
    def cityLabel(u: Int): String =
      if (u == 28 || u == 228) "Springfield"
      else uniq(s"${CityStems(u % 24)}${CitySuffixes((u / 24) % 6)}", u, 144)

    val generated = (0 until n).map { i =>
      val r = rng(seed, i.toLong)
      val qid = s"Q${100000 + i}"
      val block = i / 20
      val cty = Countries(r.nextInt(Countries.size))._1
      i % 20 match {
        case k if k < 8 => // person (3-token names → abbreviation coverage)
          // every 40th block, person slot 1 is a DUPLICATE of slot 0 (same
          // label + P460 same-as edge) — exercises canonicalization.
          val isDup = k == 1 && block % 40 == 3
          val u = if (isDup) block * 8 else block * 8 + k
          // bijective digit mixing (each digit offset by the lower ones) so
          // first/middle/last names ALL cycle quickly — a plain mixed-radix
          // split leaves one hot digit (every person sharing one surname),
          // which skews the token join unrealistically
          val label = uniq(
            s"${FirstNames(u % 32)} ${FirstNames((u / 32 + u) % 32)} ${LastNames((u / 1024 + u) % 32)}",
            u, 32768)
          val dupEdge = if (isDup) Seq("P460" -> s"Q${100000 + block * 20}") else Nil
          EntityDef(qid, label, Nil, s"person from synthetic corpus $i",
            Seq("Q5"), Nil, r.nextInt(5),
            objClaims = dupEdge ++ (if (n > 2) Seq("P19" -> s"Q${100000 + (i + 2) % n}") else Nil),
            litClaims = Seq(
              ("P569", "time", s"""{"time":"+19${50 + i % 50}-01-0${1 + i % 9}T00:00:00Z"}"""),
              ("P214", "external-id", s""""xid-$i"""")))
        case k if k < 12 => // city
          val u = block * 4 + (k - 8)
          val label = cityLabel(u)
          EntityDef(qid, label, Seq(s"City of $label"), s"city in $cty",
            Seq("Q515"), Nil, 2 + r.nextInt(5),
            objClaims = Seq("P17" -> cty),
            litClaims = Seq(
              ("P625", "globe-coordinate",
                s"""{"latitude":${i % 80}.5,"longitude":${i % 170}.5}"""),
              ("P1082", "quantity", s"""{"amount":"+${10000 + i * 13}"}""")))
        case k if k < 15 => // business
          val u = block * 3 + (k - 12)
          val label = uniq(s"${BizStems(u % 24)} ${BizSuffixes((u / 24) % 5)}", u, 120)
          // the "XCo" acronym alias is only unique in the first stem cycle;
          // later cycles would alias-collide across suffix variants
          val bizAlias = if (u < 24) Seq(label.split(" ").head + "Co") else Nil
          EntityDef(qid, label, bizAlias,
            s"company registered in $cty", Seq("Q4830453"), Nil, 1 + r.nextInt(4),
            objClaims = if (block * 20 + 8 < n) Seq("P159" -> s"Q${100000 + block * 20 + 8}") else Nil,
            litClaims = Seq(
              ("P571", "time", s"""{"time":"+19${20 + i % 80}-01-01T00:00:00Z"}"""),
              ("P856", "url", s""""https://${label.split(" ").head.toLowerCase}.example.com"""")))
        case 15 => // university (named after this block's first city)
          val label = s"University of ${cityLabel(block * 4)}"
          EntityDef(qid, label, Seq(s"${cityLabel(block * 4)} University"), "university",
            Seq("Q3918"), Nil, 2 + r.nextInt(3),
            objClaims = if (block * 20 + 8 < n) Seq("P159" -> s"Q${100000 + block * 20 + 8}") else Nil)
        case k if k < 18 => // film
          val u = block * 2 + (k - 16)
          val label = uniq(s"The ${FilmAdjs(u % 16)} ${FilmNouns((u / 16) % 14)}", u, 224)
          EntityDef(qid, label, Seq(label.stripPrefix("The ")),
            s"film released in 20${i % 25}", Seq("Q11424"), Nil, r.nextInt(6),
            objClaims = if (block * 20 < n) Seq("P57" -> s"Q${100000 + block * 20}") else Nil,
            litClaims = Seq(
              ("P577", "time", s"""{"time":"+20${i % 25}-06-15T00:00:00Z"}"""),
              ("P2142", "quantity", s"""{"amount":"+${1000000 + i * 997}"}"""),
              ("P1476", "monolingualtext",
                s"""{"text":${jstr(label)},"language":"en"}""")))
        case 18 => // dish
          val u = block
          val label = uniq(s"${DishStems(u % 8)} ${DishKinds((u / 8) % 4)}", u, 32)
          EntityDef(qid, label, Nil, "regional dish", Seq("Q746549"), Nil, r.nextInt(2))
        case _ => // venue / disambiguation / chain instance / odd coverage
          block % 3 match {
            case 0 =>
              val u = block / 3
              val label = uniq(s"${CityStems(u % 24)} ${VenueKinds((u / 24) % 4)}", u, 96)
              EntityDef(qid, label, Nil, "multi-purpose venue",
                Seq("Q8436"), Nil, r.nextInt(3))
            case 1 =>
              val label = LastNames(block % 32)
              EntityDef(qid, label, Nil, "disambiguation page",
                Seq("Q4167410"), Nil, 0)
            case _ =>
              val label = s"Specimen K$i"
              EntityDef(qid, label, Nil, "chain instance with odd claims",
                Seq("Q9001"), Nil, 0,
                litClaims = Seq(
                  ("P856", "geo-shape", s""""Data:Shape$i.map""""),
                  ("P856", "math", s""""x^$i""""),
                  ("P856", "musical-notation", s""""\\\\relative c' { c d e }""""),
                  ("P856", "tabular-data", s""""Data:Tab$i.tab"""")),
                oddClaims = Seq(
                  // snak without datavalue + skip datatypes (check_skip)
                  """{"mainsnak":{"property":"P999","datatype":"string"},"rank":"normal"}""",
                  """{"mainsnak":{"property":"P998","datatype":"wikibase-lexeme","datavalue":{"value":"L1"}},"rank":"normal"}""",
                  """{"mainsnak":{"property":"P997","datatype":"entity-schema","datavalue":{"value":"E1"}},"rank":"normal"}"""))
          }
      }
    }
    classDefs ++ predDefs ++ countryDefs ++ generated
  }

  // ------------------------------------------------------- JSON rendering
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** One Wikidata-style dump JSON line per entity. */
  def toDumpJson(e: EntityDef): String = {
    val labels = s"""{"en":{"language":"en","value":${jstr(e.label)}}}"""
    val aliases =
      if (e.aliases.isEmpty) "{}"
      else s"""{"en":[${e.aliases.map(a => s"""{"language":"en","value":${jstr(a)}}""").mkString(",")}]}"""
    val descriptions = s"""{"en":{"language":"en","value":${jstr(e.description)}}}"""
    val sitelinks =
      if (e.sitelinks <= 0) "{}"
      else Sites.take(e.sitelinks.min(Sites.size)).map { s =>
        s"""${jstr(s)}:{"site":${jstr(s)},"title":${jstr(e.label)}}"""
      }.mkString("{", ",", "}")

    def itemClaim(pid: String, target: String): String =
      s"""{"mainsnak":{"property":${jstr(pid)},"datatype":"wikibase-item","datavalue":{"value":{"id":${jstr(target)},"numeric-id":${target.drop(1)}},"type":"wikibase-entityid"}},"rank":"normal"}"""
    def litClaim(pid: String, dt: String, v: String): String =
      s"""{"mainsnak":{"property":${jstr(pid)},"datatype":${jstr(dt)},"datavalue":{"value":$v,"type":"x"}},"rank":"normal"}"""

    val byPid = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    e.p31.foreach(t => byPid("P31") = byPid.getOrElse("P31", Vector.empty) :+ itemClaim("P31", t))
    e.p279.foreach(t => byPid("P279") = byPid.getOrElse("P279", Vector.empty) :+ itemClaim("P279", t))
    e.objClaims.foreach { case (pid, t) =>
      byPid(pid) = byPid.getOrElse(pid, Vector.empty) :+ itemClaim(pid, t) }
    e.litClaims.foreach { case (pid, dt, v) =>
      byPid(pid) = byPid.getOrElse(pid, Vector.empty) :+ litClaim(pid, dt, v) }
    e.oddClaims.zipWithIndex.foreach { case (c, i) =>
      val pid = s"P99$i"
      byPid(pid) = byPid.getOrElse(pid, Vector.empty) :+ c }
    val claims = byPid.map { case (pid, cs) =>
      s"${jstr(pid)}:[${cs.mkString(",")}]" }.mkString("{", ",", "}")

    val typ = if (e.qid.startsWith("P")) "property" else "item"
    s"""{"id":${jstr(e.qid)},"type":${jstr(typ)},"labels":$labels,"aliases":$aliases,"descriptions":$descriptions,"sitelinks":$sitelinks,"claims":$claims}"""
  }

  /** KG dump as a one-column (`line`) DataFrame, distributed. */
  def dumpLines(spark: SparkSession, n: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val defs = entityDefs(n, seed)
    spark.sparkContext.parallelize(defs, math.max(1, defs.size / 2000))
      .map(toDumpJson).toDF("line")
  }

  // --------------------------------------------------------------- pages
  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic misspelling: drop one interior char of the first token
    * of length ≥ 4 (stays within levenshtein 1, keeps capitalization). */
  def misspell(label: String, r: Random): String = {
    val toks = label.split(" ")
    val i = toks.indexWhere(_.length >= 4)
    if (i < 0) label
    else {
      val t = toks(i)
      val drop = 1 + r.nextInt(t.length - 2) // never the first char
      toks(i) = t.substring(0, drop) + t.substring(drop + 1)
      toks.mkString(" ")
    }
  }

  /** Reference dot-abbreviation (scala oracle of NameIndex.dotAbbreviations,
    * i ≥ 1 options only). */
  def dotAbbrevs(name: String): Seq[String] = {
    val words = name.split(" ")
    if (words.length < 2) Nil
    else (1 until words.length).map { i =>
      ((0 until words.length - 1).map { j =>
        if (j < i) words(j).head + "." else words(j)
      } :+ words.last).mkString(" ")
    }
  }

  private val LinkableRanges: Vector[Int] = // i%20 values that are linkable
    Vector(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17)

  /** Pages + golden links, generated distributed. `nEntities` must match
    * the `dumpLines` call so QIDs agree. */
  def pagesWithGold(spark: SparkSession, nPages: Int, nEntities: Int,
                    seed: Long = 42L): Dataset[PageWithGold] = {
    import spark.implicits._
    val defs = entityDefs(nEntities, seed)
    val offset = Classes.size + Predicates.size + Countries.size
    val linkable: Vector[EntityDef] =
      Countries.indices.map(i => defs(Classes.size + Predicates.size + i)).toVector ++
      (0 until nEntities).filter(i => LinkableRanges.contains(i % 20))
        .map(i => defs(offset + i))
    val baseTs = 1704067200000L // 2024-01-01T00:00:00Z

    val byQid: Map[String, EntityDef] = defs.map(d => d.qid -> d).toMap
    val linkableQids: Set[String] = linkable.map(_.qid).toSet
    // entities with a KG edge to another linkable entity — pair-embedding
    // pool so extracted-triple P/R has a dense gold set
    val pairPool: Vector[(EntityDef, String, EntityDef)] = linkable.flatMap { e =>
      e.objClaims.collect { case (pid, t) if linkableQids.contains(t) =>
        (e, pid, byQid(t)) }
    }

    spark.range(nPages).map { p =>
      val r = rng(seed ^ 0x5ca1ab1eL, p)
      val url = s"https://crawl.example.org/page/$p"
      val lang = if (r.nextInt(20) == 0) Vector("de", "fr", "es")(r.nextInt(3)) else "en"
      val gold = scala.collection.mutable.ArrayBuffer.empty[GoldLink]
      val surfaces = scala.collection.mutable.ArrayBuffer.empty[String]

      // related pairs first: both endpoints of a KG edge on the same page
      val nPairs = if (lang == "en" && pairPool.nonEmpty) r.nextInt(3) else 0
      (0 until nPairs).foreach { _ =>
        val (a, _, b) = pairPool(r.nextInt(pairPool.size))
        surfaces += a.label; gold += GoldLink(url, a.label, a.qid, "pair")
        surfaces += b.label; gold += GoldLink(url, b.label, b.qid, "pair")
      }

      val nMentions = if (lang == "en") r.nextInt(9 - 2 * nPairs.min(4)) else 0
      (0 until nMentions).foreach { _ =>
        val e = linkable(r.nextInt(linkable.size))
        val roll = r.nextInt(10)
        if (roll < 5) { surfaces += e.label; gold += GoldLink(url, e.label, e.qid, "label") }
        else if (roll < 7 && e.aliases.nonEmpty) {
          surfaces += e.aliases.head; gold += GoldLink(url, e.aliases.head, e.qid, "alias")
        } else if (roll == 7 && e.p31 == Seq("Q5")) {
          val abbrevs = dotAbbrevs(e.label)
          if (abbrevs.nonEmpty) {
            val a = abbrevs(r.nextInt(abbrevs.size))
            surfaces += a; gold += GoldLink(url, a, e.qid, "abbrev")
          } else { surfaces += e.label; gold += GoldLink(url, e.label, e.qid, "label") }
        } else if (roll == 8) {
          val m = misspell(e.label, r)
          surfaces += m
          if (m != e.label) gold += GoldLink(url, m, e.qid, "misspell")
          else gold += GoldLink(url, m, e.qid, "label")
        } else {
          // decoy — capitalized gibberish, not in gold
          val g = "Zq" + ("aeiou" (r.nextInt(5)).toString) + "x" + r.nextInt(1000)
          surfaces += g.capitalize
        }
      }

      // assemble text lines: filler words + interspersed mention surfaces
      def fillerRun(k: Int): String =
        (0 until k).map(_ => Filler(r.nextInt(Filler.size))).mkString(" ")
      val nLines = 3 + r.nextInt(5)
      val perLine = Array.fill(nLines)(scala.collection.mutable.ArrayBuffer.empty[String])
      surfaces.zipWithIndex.foreach { case (s, i) => perLine(i % nLines) += s }
      val lines = perLine.map { ms =>
        val sb = new StringBuilder(fillerRun(2 + r.nextInt(4)))
        ms.foreach { s => sb.append(' ').append(s).append(' ').append(fillerRun(2 + r.nextInt(4))) }
        sb.toString
      }
      // "menu" is the surviving text of the boilerplate nav div below — the
      // `text` column must equal extract(html) byte-for-byte.
      val text = ("menu" +: lines).mkString("\n")

      // html wrapping with extraction noise
      val html = new StringBuilder
      html.append("<html><head><title>synthetic page ").append(p)
        .append("</title><style>p { color: #333; }</style>")
        .append("<script>var tracker = ").append(p).append(";</script></head>\n<body>")
      html.append("<!-- boilerplate header -->")
      html.append("<div class=\"nav\"><span>menu</span></div>")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i % 3 == 2) html.append("<div><p>").append(htmlEscape(l)).append("</p></div>")
        else html.append("<p>").append(htmlEscape(l)).append("</p>")
      }
      html.append("<script>console.log('f');</script></body></html>")

      PageWithGold(
        Page(url, new Timestamp(baseTs + p * 37000L),
          html.toString.getBytes("UTF-8"), text, lang),
        gold.toSeq)
    }
  }

  /** The pages input table (input_hint shape). */
  def pages(spark: SparkSession, nPages: Int, nEntities: Int,
            seed: Long = 42L): DataFrame = {
    import spark.implicits._
    pagesWithGold(spark, nPages, nEntities, seed)
      .map(_.page).toDF()
  }

  /** Golden (url, surface, qid, form) links for P/R. */
  def gold(spark: SparkSession, nPages: Int, nEntities: Int,
           seed: Long = 42L): DataFrame = {
    import spark.implicits._
    pagesWithGold(spark, nPages, nEntities, seed)
      .flatMap(_.gold).toDF()
  }
}
