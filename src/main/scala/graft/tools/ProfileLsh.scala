package graft.tools

import graft.ops.{Ann, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: recall diagnostics for the cosine LSH path. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

    val e = embs.select(col("vec_id").as("id"),
      Ann.unitVector(col("embedding").cast("array<double>")).as("u"))
    println("n=" + e.count())
    // bucket balance per table
    for (t <- 0 until 3) {
      val b = e.select(Ann.lshBucketFor(col("u"), t, 1).as("b"))
        .groupBy("b").count().collect().toSeq
      println(s"table $t buckets: $b")
    }
    val brute = Dedup.embeddingPairs(embs, "vec_id", "embedding", 0.5)
    println("brute pairs=" + brute.count())
    val lsh = Ann.lshCosinePairs(embs, "vec_id", "embedding", 0.5, 1, 10)
    println("lsh pairs=" + lsh.count())
    val missed = brute.select("id_a", "id_b")
      .join(lsh.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
    println("missed=" + missed.count())
    spark.stop()
  }
}
