package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** Dev profiling harness for the linking stage (not part of the driver
  * contract): times each sub-stage of Linker.lookup on a generated or
  * pre-existing corpus. Usage: runMain graft.tools.ProfileLinks <benchRoot> */
object ProfileLinks {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-profile")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val pages = spark.read.parquet(s"$root/pages")
    val dump = spark.read.parquet(s"$root/dump")
    val parsed = ParseEntities.parse(dump)
    val claims = ParseEntities.claims(parsed)
    val objects = ParseEntities.objects(claims)
    val closure = graft.graph.TypeClosure.closure(
      objects.filter(col("pred") === "P279")
        .select(col("subj").as("child"), col("obj").as("parent")))
    val items = ParseEntities.items(parsed, closure,
      NerSeeds.geoSeeds(spark, closure), NerSeeds.orgSeeds(spark, closure))
    val names = NameIndex.names(items).cache()
    val postings = NameIndex.postings(names).cache()
    val postings3g = NameIndex.postings3g(names).cache()
    val postingsPair = NameIndex.postingsPair(names).cache()
    timed("names")(names.count())
    timed("postings")(postings.count())
    timed("postings3g")(postings3g.count())

    val mentions = DetectMentions.mentions(
      pages.withColumn("t", ExtractText.extract(col("html"))), "t").cache()
    timed("mentions")(mentions.count())

    val cfg = LinkerConfig(limit = 32, fuzzy = true,
      cutByRelevance = true, computeAmbiguity = false, minShouldMatch = true)
    val mentionsD = Linker.distinctMentions(mentions).cache()
    timed("mentionsD")(mentionsD.count())

    val full = Linker.lookup(spark, mentions,
      NameIndexTables(names, postings, postings3g, Some(postingsPair)), cfg).cache()
    timed("full lookup")(full.count())
    timed("linkBest")(Linker.linkBest(full, 1.2).count())
    spark.stop()
  }
}
