package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Ann

/** Dev tool: per-query IVF/LSH recall vs brute force on the gate corpora —
  * used to pick the recall floors the q_ann_* gate queries assert. */
object CheckRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("check-recall")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("0.001", "0.01")) {
      val embs = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val qs = embs.filter(col("vec_id") < 8)
      val bf = Ann.bruteForceTopK(embs, qs, k = 5)
        .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
      for ((name, df) <- Seq(
        "ivf p4" -> Ann.ivfTopK(embs, qs, 5, nCentroids = 16, nProbe = 4),
        "ivf p8" -> Ann.ivfTopK(embs, qs, 5, nCentroids = 16, nProbe = 8),
        "lsh b4t4" -> Ann.lshTopK(embs, qs, 5, nBits = 4, nTables = 4))) {
        val got = df.select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
        val recalls = bf.map { case (q, rows) =>
          val g = got.getOrElse(q, Array.empty).map(_._2).toSet
          q -> rows.count(r => g.contains(r._2)).toDouble / rows.length
        }
        println(s"sf$sf $name: min=${recalls.values.min} " +
          s"per-q=${recalls.toSeq.sortBy(_._1).map(_._2).mkString(",")}")
      }
    }
    spark.stop()
  }
}
