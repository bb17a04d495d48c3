package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall/equivalence oracles for the approximate dedup operators — the
  * missing check for the engine-defined-hash gates (q_minhash_pairs,
  * q_simhash_pairs are rows-only at the driver; here they are measured
  * against their exact counterparts on a corpus with planted near-dups). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus: 40 base docs of 30 pseudo-random words, plus a
    * near-dup of every 2nd doc (two words changed ⇒ shingle Jaccard ≈0.8)
    * and an exact dup of every 5th. */
  private lazy val docs = {
    def word(seed: Long): String = {
      val h = java.lang.Long.rotateLeft(seed * 0x9E3779B97F4A7C15L, 17)
      "w" + math.abs(h % 997)
    }
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => word(i * 100 + j)).mkString(" "))
    }
    val nearDups = base.filter(_._1 % 2 == 0).map { case (i, t) =>
      val ws = t.split(" "); ws(3) = "changed3"; ws(17) = "changed17"
      (i + 1000L, ws.mkString(" "))
    }
    val exactDups = base.filter(_._1 % 5 == 0).map { case (i, t) => (i + 2000L, t) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("minhashLshPairs: precision 1 and recall >= 0.9 vs exact jaccardPairs") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, numPerms = 32, bands = 16, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "planted near-dups must be found by the exact operator")
    assert(lsh.subsetOf(exact), "verification makes precision 1 by construction")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"minhash-LSH recall $recall < 0.9 (found ${lsh.size}/${exact.size})")
  }

  test("simhashPairs: Manku block tables are complete — nBlocks 4 and 8 agree") {
    val p4 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, nBlocks = 4)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val p8 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, nBlocks = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(p4 == p8, "both blockings are complete by pigeonhole ⇒ identical output")
    assert(p4.nonEmpty, "exact dups (hamming 0) must collide")
  }

  test("jaccardPairs: stop-shingle cap keeps precision 1 (subset of uncapped)") {
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, maxPostings = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, maxPostings = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(full))
  }

  test("minhashSignature: one fold, numPerms entries, deterministic") {
    val sig = docs.limit(1)
      .select(Dedup.minhashSignature(TextStats.shingles(col("text"), 3), 16).as("s"))
      .as[Seq[Long]].head()
    val sig2 = docs.limit(1)
      .select(Dedup.minhashSignature(TextStats.shingles(col("text"), 3), 16).as("s"))
      .as[Seq[Long]].head()
    assert(sig.length == 16 && sig == sig2)
  }
}
