package graft.core

import graft.SparkSpec
import graft.functions.TextSetExprs
import org.apache.spark.sql.functions._

/** Bit-equivalence of the native Catalyst text-set expressions vs the
  * Column-expression definitions they replace, over adversarial input
  * (whitespace runs, case, CJK, combining marks, astral plane) plus a
  * seeded random corpus. */
class TextSetExprsSpec extends SparkSpec {
  import spark.implicits._

  // the ORIGINAL column-expression definitions (frozen copies)
  private def tokensCol(c: org.apache.spark.sql.Column) = {
    val cleaned = lower(trim(regexp_replace(c, "\\s+", " ")))
    when(cleaned === "", array().cast("array<string>")).otherwise(split(cleaned, " "))
  }
  private def tokenSetCol(c: org.apache.spark.sql.Column) =
    array_sort(array_distinct(tokensCol(c)))
  private def ngramSetCol(c: org.apache.spark.sql.Column, n: Int) = {
    def tokenNgrams(t: org.apache.spark.sql.Column) =
      when(length(t) < n, array(t)).otherwise(
        transform(sequence(lit(1), length(t) - lit(n - 1)),
          i => t.substr(i, lit(n))))
    array_sort(array_distinct(flatten(transform(tokensCol(c), t => tokenNgrams(t)))))
  }
  private def shinglesCol(c: org.apache.spark.sql.Column, n: Int) = {
    val toks = tokensCol(c)
    val grams = when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    array_sort(array_distinct(grams))
  }

  /** Adversarial fixed cases + 400 seeded random compositions. */
  private lazy val corpus: Seq[String] = {
    val pieces = Array("alpha", "Beta", "GAMMA", " ", "\t", "\n", "\r", "",
      "", "  ", "", "Ää", "ÉLAN", "中文字", "😀🎉x", "á", "ß", "İstanbul",
      "a", "ab", "abc", "x.y-z'", "0123456789", "ALPHA  beta\tGamma")
    val fixed = Seq("", " ", "   ", "\t\n\r", "a", "one two three four",
      "repeated repeated repeated", "中文 字 中文", "😀 😀🎉 x")
    val rnd = new scala.util.Random(42)
    val random = (0 until 400).map { _ =>
      (0 until (1 + rnd.nextInt(6))).map(_ => pieces(rnd.nextInt(pieces.length)))
        .mkString
    }
    fixed ++ random
  }

  private def check(name: String,
                    nat: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    ref: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
    test(s"$name: native expression ≡ column expressions") {
      val df = corpus.toDF("s")
        .select(col("s"), nat(col("s")).as("a"), ref(col("s")).as("b"))
      val bad = df.filter(not(col("a") === col("b"))).collect()
      assert(bad.isEmpty, bad.take(3).map(r =>
        s"input=${r.get(0)} native=${r.get(1)} ref=${r.get(2)}").mkString("; "))
    }

  private def winnowCol(c: org.apache.spark.sql.Column, k: Int, w: Int) = {
    val toks = tokensCol(c)
    val sh = when(size(toks) < k, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
    val hs = transform(sh, s => md5(s))
    val wins = when(size(hs) < w, array(array_min(hs))).otherwise(
      transform(sequence(lit(0), size(hs) - w),
        i => array_min(slice(hs, i + 1, lit(w)))))
    array_sort(array_distinct(wins))
  }

  check("tokenSet", TextSetExprs.tokenSet, tokenSetCol)
  check("winnow(3,4)", c => TextSetExprs.winnow(c, 3, 4), c => winnowCol(c, 3, 4))
  check("winnow(2,3)", c => TextSetExprs.winnow(c, 2, 3), c => winnowCol(c, 2, 3))

  test("winnowing guarantee: docs sharing a run of >= k+w-1 words share a fingerprint") {
    val shared = "quick brown foxes jump over lazy dogs today" // 8 words >= 3+4-1
    val a = s"prefix words here $shared and then something else"
    val b = s"totally different opening $shared closing remarks differ"
    val df = Seq(a, b).toDF("s")
      .select(TextSetExprs.winnow(col("s"), 3, 4).as("fp"))
    val Array(fa, fb) = df.collect().map(_.getSeq[String](0).toSet)
    assert(fa.intersect(fb).nonEmpty)
  }
  check("ngramSet(3)", c => TextSetExprs.ngramSet(c, 3), c => ngramSetCol(c, 3))
  check("ngramSet(2)", c => TextSetExprs.ngramSet(c, 2), c => ngramSetCol(c, 2))
  check("shingles(3)", c => TextSetExprs.shingles(c, 3), c => shinglesCol(c, 3))
  check("shingles(2)", c => TextSetExprs.shingles(c, 2), c => shinglesCol(c, 2))

  test("sortedOverlapCount ≡ size(array_intersect) on sorted set pairs") {
    // pair every corpus string with its successor; compare on token sets,
    // 3-gram sets and 2-shingle sets (all sorted distinct by construction)
    val pairs = corpus.zip(corpus.drop(1) :+ corpus.head).toDF("x", "y")
    for ((name, f) <- Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
        ("tokenSet", TextSetExprs.tokenSet),
        ("ngramSet3", c => TextSetExprs.ngramSet(c, 3)),
        ("shingles2", c => TextSetExprs.shingles(c, 2)))) {
      val df = pairs.select(
        TextSetExprs.sortedOverlapCount(f(col("x")), f(col("y"))).as("a"),
        size(array_intersect(f(col("x")), f(col("y")))).as("b"))
      val bad = df.filter(col("a") =!= col("b")).collect()
      assert(bad.isEmpty, s"$name: ${bad.take(3).mkString("; ")}")
    }
  }

  test("whole-stage codegen keeps the span (no eval fallback in plan)") {
    val dir = java.nio.file.Files.createTempDirectory("tse").toString
    Seq("alpha beta gamma").toDF("s").write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
      .select(TextSetExprs.ngramSet(col("s"), 3).as("g"))
    // doGenCode via static helper ⇒ the Project stays codegen'd ("*(n)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
