package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F1-F4 unit tests — golden values hand-computed from the reference
  * definitions (`lamapi/utils.py:14-68`, `lamapi/utils.py:43-45`). */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).first().get(0)

  test("cleanStr lowercases and collapses whitespace (utils.py:43-45)") {
    assert(one(Text.cleanStr(lit("  A\t b\nc "))) == "a b c")
    assert(one(Text.cleanStr(lit("Batman  Begins"))) == "batman begins")
    assert(one(Text.cleanStr(lit(""))) == "")
  }

  test("editDistanceScore = 1 - lev/max(len) (utils.py:14-15)") {
    // editdistance("batman begins", "batman") = 1 - 7/13
    val v = one(Similarity.editDistanceScore(lit("batman begins"), lit("batman")))
      .asInstanceOf[Double]
    assert(math.abs(v - (1.0 - 7.0 / 13.0)) < 1e-9)
    assert(one(Similarity.editDistanceScore(lit("abc"), lit("abc"))) == 1.0)
    assert(one(Similarity.editDistanceScore(lit(""), lit(""))) == 1.0)
  }

  test("tokenJaccard uses MAX denominator, not union (utils.py:48-68)") {
    // tokens {batman, begins} vs {batman} → 1/2
    val v = one(Similarity.tokenJaccard(lit("batman begins"), lit("batman")))
      .asInstanceOf[Double]
    assert(v == 0.5)
    // identical sets → 1.0
    assert(one(Similarity.tokenJaccard(lit("a b"), lit("b a"))) == 1.0)
    // disjoint → 0.0
    assert(one(Similarity.tokenJaccard(lit("x"), lit("y"))) == 0.0)
  }

  test("tokenNgrams: window grams; len<n => token itself (utils.py:55-61)") {
    assert(one(Text.ngramSet(lit("cat"), 3)).asInstanceOf[scala.collection.Seq[String]] .toSeq == Seq("cat"))
    assert(one(Text.ngramSet(lit("ab"), 3)).asInstanceOf[scala.collection.Seq[String]] .toSeq == Seq("ab"))
    assert(one(Text.ngramSet(lit("cats"), 3)).asInstanceOf[scala.collection.Seq[String]].toSeq.sorted
      == Seq("ats", "cat"))
  }

  test("ngramJaccard max-denominator over distinct grams") {
    // "cat" grams {cat}; "cats" grams {cat, ats}; |∩|=1, max=2 → 0.5
    val v = one(Similarity.ngramJaccard(lit("cat"), lit("cats"), 3)).asInstanceOf[Double]
    assert(v == 0.5)
  }

  test("similarity bounds & symmetry (property)") {
    val samples = Seq("a", "ab c", "batman begins", "the dark knight",
      "x y z", "", "  spaces  here ")
    for (a <- samples; b <- samples) {
      val Seq(j1, j2, e1, e2) = Seq(
        Similarity.tokenJaccard(lit(a), lit(b)), Similarity.tokenJaccard(lit(b), lit(a)),
        Similarity.editDistanceScore(lit(a), lit(b)), Similarity.editDistanceScore(lit(b), lit(a)))
        .map(c => one(c).asInstanceOf[Double])
      assert(j1 == j2); assert(math.abs(e1 - e2) < 1e-12)
      assert(j1 >= 0.0 && j1 <= 1.0); assert(e1 >= 0.0 && e1 <= 1.0)
    }
  }

  test("cosine similarity incl. zero-norm guard") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    val vs = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(vs(0) - 1.0) < 1e-6)
    assert(math.abs(vs(1)) < 1e-6)
    assert(vs(2) == 0.0)
  }

  test("bowTokens drops stopwords and non-alnum (bow_retriever.py:30-38)") {
    val v = one(Text.bowTokens(lit("The Batman, and his car!"))).asInstanceOf[scala.collection.Seq[String]]
    assert(v.toSet == Set("batman", "car"))
  }
}
