package graft.ops

import graft.core.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; broadcast the query set so
  * the corpus scan is a single map stage — no shuffle of the 100 TB side).
  * Scale path: random-hyperplane LSH bucketing — each vector lands in one
  * bucket per table; queries probe their bucket only, turning the cross
  * product into a bucket-equi-join.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector.
    * queries is small (broadcast); corpus is arbitrarily large — the join
    * is a BroadcastNestedLoopJoin = one pass over the corpus, then a
    * per-query top-k window on (score, id). Deterministic: ranking key is
    * (rounded score desc, id asc). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).cast("array<double>").as("n_v"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_v"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("n_id") =!= col("q_id") else lit(true))
      .withColumn("cos", round(Similarity.cosine(col("q_v"), col("n_v")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** Random-hyperplane signature: nBits sign-bits of dot(v, h_i) where the
    * hyperplanes are pseudo-random but seeded deterministically from
    * (bit index, dimension index) via a hash → no RNG, reproducible across
    * runs and cluster sizes. */
  private def hyperplaneBit(v: org.apache.spark.sql.Column, bit: Int) = {
    // h[d] = hash(bit, d) mapped to [-1, 1); dot via aggregate over zip index
    val dot = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, d) => x * (pmod(xxhash64(lit(bit), d), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
      lit(0.0), (acc, x) => acc + x)
    when(dot >= 0, lit(1L << bit)).otherwise(lit(0L))
  }

  /** Assign each vector an nBits LSH bucket id. */
  def lshBucket(df: DataFrame, vecCol: String, nBits: Int = 12): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val sig = (0 until nBits).map(b => hyperplaneBit(v, b)).reduce(_.bitwiseOR(_))
    df.withColumn("lsh_bucket", sig)
  }

  /** Bucketed ANN top-k: exact ranking inside the shared LSH bucket.
    * Trades recall for a shuffle keyed on bucket instead of a cross join;
    * at 100 TB the bucket join is the only viable physical plan. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nBits: Int = 8): DataFrame = {
    val c = lshBucket(corpus, vecCol, nBits)
      .select(col("lsh_bucket"), col(idCol).as("n_id"), col(vecCol).cast("array<double>").as("n_v"))
    val q = lshBucket(queries, vecCol, nBits)
      .select(col("lsh_bucket"), col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_v"))
    val joined = c.join(q, Seq("lsh_bucket")).filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", round(Similarity.cosine(col("q_v"), col("n_v")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }
}
