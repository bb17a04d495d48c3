package graft.ops

import graft.core.Similarity
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design: exact dedup is one hash-shuffle on a 32-byte key; near-dup
  * avoids the O(n²) cross join by inverted-index / LSH-bucket joins whose
  * shuffle keys are (shingle|band-signature) — at 100 TB both stay linear in
  * corpus size + pair-candidate count, and skewed keys (stop-shingles,
  * giant buckets) are capped explicitly before the join.
  */
object Dedup {

  /** Exact dedup: one row per distinct normalized content, keeping the
    * smallest id (deterministic winner). Single hash aggregation on the
    * md5 fingerprint — the 32-char key keeps shuffle volume flat no matter
    * how long documents are. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextStats.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Near-duplicate pairs by word-shingle Jaccard ≥ minJaccard, via an
    * inverted-index join on shingles (no cross join).
    *
    * maxPostings caps stop-shingle posting lists (skew guard): a shingle
    * appearing in more than maxPostings docs is dropped from candidate
    * generation — standard practice; such shingles carry no dedup signal
    * but would produce quadratic candidate blowup.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minJaccard: Double = 0.8,
                   maxPostings: Int = 1000): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), TextStats.shingles(col(textCol), n).as("sh"))
    val posts = sh.select(col("id"), explode(col("sh")).as("shingle"))
    val rare = posts
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("cnt") <= maxPostings)
      .drop("cnt")
    // candidate pairs: docs sharing ≥1 rare shingle, ordered id_a < id_b
    val cands = rare.as("x").join(rare.as("y"), col("x.shingle") === col("y.shingle"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // verify with exact set Jaccard (union denominator — standard near-dup)
    val verified = cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    verified
  }

  /** MinHash signature: numPerms independent 64-bit hash mins over the
    * shingle set (xxhash64 with distinct seeds — codegen'd builtin). */
  def minhashSignature(shingleSet: Column, numPerms: Int): Column =
    array((0 until numPerms).map { seed =>
      array_min(transform(shingleSet, s => xxhash64(lit(seed), s)))
    }: _*)

  /** MinHash-LSH near-dup pairs: signature → bands → bucket join →
    * exact-Jaccard verification. Output = verified pairs (precision 1 by
    * construction; recall governed by bands×rows, tested vs the exact
    * operator). bandBuckets over-maxPostings are dropped (skew guard). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numPerms: Int = 32, bands: Int = 16,
                      minJaccard: Double = 0.8,
                      maxBucket: Int = 2000): DataFrame = {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val rows = numPerms / bands
    val sh = docs.select(col(idCol).as("id"), TextStats.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), numPerms))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows)))).as(Seq("band", "bandsig")))
      .withColumn("bucket", xxhash64(col("band"), col("bandsig").cast("string")))
    val smallBuckets = banded
      .withColumn("bcnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("bcnt") <= maxBucket)
    val cands = smallBuckets.as("x").join(smallBuckets.as("y"), "bucket")
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over token features: per bit, sum ±1 weighted by token
    * hash bit; sign → bit. Pure expressions (no UDF): for each of 64 bits,
    * count tokens whose xxhash64 has that bit set vs total. */
  def simhash64(tokenSet: Column): Column = {
    val hashes = transform(tokenSet, t => xxhash64(t))
    val totalTokens = size(tokenSet)
    // bit b set iff #tokens-with-bit-b > n/2 (strict majority)
    val bits = (0 until 64).map { b =>
      val cnt = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1).cast("int"))
      when(cnt * 2 > totalTokens, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, blocked by
    * 4×16-bit segments (any pair within distance 3 shares ≥1 exact
    * segment — pigeonhole), so the join key is a 16-bit block not O(n²). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-segment blocking supports maxHamming<=3")
    val sigs = docs.select(col(idCol).as("id"),
      simhash64(graft.core.Text.tokenSet(col(textCol))).as("sig"))
    val seg = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("seg_idx", "seg")))
    val cands = seg.as("x").join(seg.as("y"),
      col("x.seg_idx") === col("y.seg_idx") && col("x.seg") === col("y.seg") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-dup pairs: cosine ≥ minCos. Brute-force block-nested
    * join at test scale; the scale path is Ann.lshCosinePairs (random
    * hyperplane buckets). */
  def embeddingPairs(embs: DataFrame, idCol: String, vecCol: String,
                     minCos: Double = 0.95): DataFrame = {
    val e = embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= minCos)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }
}
