package graft.tools

import graft.ops.{Ann, Dedup, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timing of the dedup operators. */
object ProfileDedup {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val sh = docs.select(col("doc_id").as("id"),
      TextStats.shingles(col("text"), 3).as("sh")).filter(size(col("sh")) > 0)
    t("shingles+count")(sh.count())
    val sig = sh.withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    t("minhash signatures")(sig.select(max(element_at(col("sig"), 1))).first())
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => slice(col("sig"), b * 2 + 1, lit(2)))).as(Seq("band", "bandsig")))
      .withColumn("bucket", xxhash64(col("band"), col("bandsig").cast("string")))
      .select(col("id"), col("bucket"))
    t("banded count")(banded.count())
    val cands = banded.as("x").join(banded.as("y"), "bucket")
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    t("minhash cand pairs")(println("cands=" + cands.count()))
    t("minhash full")(println("pairs=" + Dedup.minhashLshPairs(docs, "doc_id", "text",
      3, 32, 16, 0.5).count()))

    t("simhash full")(println("pairs=" + Dedup.simhashPairs(docs, "doc_id", "text", 3).count()))
    val sigs2 = docs.select(col("doc_id").as("id"),
      Dedup.simhash(graft.core.Text.tokenSet(col("text"))).as("sig"))
    t("simhash sigs only")(sigs2.select(max(col("sig"))).first())

    t("jaccard full")(println("pairs=" + Dedup.jaccardPairs(docs, "doc_id", "text",
      3, 0.5).count()))
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("embed brute")(println("pairs=" + Dedup.embeddingPairs(embs, "vec_id", "embedding", 0.4).count()))
    t("embed lsh")(println("pairs=" + Ann.lshCosinePairs(embs, "vec_id", "embedding",
      0.5, 1, 10).count()))
    spark.stop()
  }
}
