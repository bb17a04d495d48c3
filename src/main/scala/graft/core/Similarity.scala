package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Candidate-scoring similarity features.
  *
  * Formulae mirror the reference exactly:
  *  - editDistanceScore: `1 − levenshtein(a,b)/max(|a|,|b|)`
  *    (`lamapi/utils.py:14-15`)
  *  - tokenJaccard / ngramJaccard: `|A∩B| / max(|A|,|B|,1)` — note the
  *    reference uses a **max denominator**, not the set union
  *    (`lamapi/utils.py:48-68`).
  *
  * All pure Column expressions (built-in `levenshtein` is codegen'd); no
  * UDFs, so whole-stage codegen spans stay wide in the scoring stage.
  */
object Similarity {

  /** Normalized edit-distance similarity ∈ [0,1]. Empty-vs-empty → 1.0
    * (distance 0, guarded denominator). */
  def editDistanceScore(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b), lit(1)).cast("double")

  /** Set Jaccard with max-denominator over two pre-built array columns.
    * Inputs MUST be sorted distinct sets as produced by
    * Text.tokenSet / Text.ngramSet / shingles (binary UTF8String order) —
    * the intersection size is a native merge scan
    * ([[graft.functions.TextSetExprs.sortedOverlapCount]]): no per-row
    * hash set or materialized intersection array, which was the hot
    * allocation in the candidate-scoring stage (evaluated twice per
    * post-cut candidate pair). Bit-identical to
    * size(array_intersect(sa, sb)) for such inputs. */
  def setOverlapScore(sa: Column, sb: Column): Column =
    graft.functions.TextSetExprs.sortedOverlapCount(sa, sb).cast("double") /
      greatest(size(sa), size(sb), lit(1)).cast("double")

  /** Whole-word token Jaccard of two raw strings (reference ngram=None). */
  def tokenJaccard(a: Column, b: Column): Column =
    setOverlapScore(Text.tokenSet(a), Text.tokenSet(b))

  /** Character n-gram Jaccard of two raw strings (reference ngram=3 path). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    setOverlapScore(Text.ngramSet(a, n), Text.ngramSet(b, n))

  /** Cosine similarity of two float-array embedding columns (same length).
    * Implemented with zip_with + aggregate — stays inside codegen, no UDF.
    * Zero-norm vectors score 0.0. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }
}
