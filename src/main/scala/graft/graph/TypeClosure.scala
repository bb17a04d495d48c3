package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure of a (child, parent) edge relation.
  *
  * Reference semantics: `scripts/infer_types.py:62-111` materializes
  * `subclass_closure` with a SQLite recursive CTE; the notebook
  * (`scripts/create_types_db.ipynb` cells 7-8) asserts the per-seed
  * recursive query and the materialized table agree — that equivalence is
  * our ScalaTest property.
  *
  * Spark has no recursive CTE, so this is the canonical iterative
  * semi-naive frontier loop:
  *   closure₀ = edges;  frontierₖ₊₁ = frontierₖ ⋈ edges − closureₖ
  * Each iteration is one shuffle join on the frontier only (semi-naive:
  * joining the delta, not the whole closure — the standard Datalog
  * optimization; see PAPERS.md on iterative dataflow).
  *
  * Scale notes:
  *  - `localCheckpoint()` per iteration truncates lineage, otherwise the
  *    plan tree grows exponentially and Catalyst analysis dominates.
  *  - Cycles terminate naturally: a cycle adds no new pairs once closed.
  *  - Hub skew (a parent with millions of descendants) is shuffle-key skew
  *    on `parent`; AQE skew-join splitting handles residuals, and the
  *    closure table is written bucketed by `child` for downstream joins.
  */
object TypeClosure {

  /** @param edges DataFrame with columns (child, parent)
    * @return closure (child, ancestor) — all pairs child →* ancestor,
    *         excluding the trivial (x, x) unless present as an edge. */
  def closure(edges: DataFrame, maxIters: Int = 64): DataFrame = {
    val e = edges.select(col("child").as("e_child"), col("parent").as("e_parent"))
      .distinct().localCheckpoint(eager = true)
    var acc = e.select(col("e_child").as("child"), col("e_parent").as("ancestor"))
      .localCheckpoint(eager = true)
    var frontier = acc
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      // frontier(child, ancestor) ⋈ edges(ancestor=child₂ → parent) ⇒ (child, parent)
      // lazy checkpoint: the count() below is the single materializing job
      // per iteration (an eager checkpoint + separate isEmpty would double
      // the per-iteration latency floor)
      val next = frontier
        .join(e, frontier("ancestor") === e("e_child"))
        .select(frontier("child").as("child"), e("e_parent").as("ancestor"))
        .distinct()
        .join(acc, Seq("child", "ancestor"), "left_anti")
        .localCheckpoint(eager = false)
      if (next.count() == 0) done = true
      else {
        acc = acc.union(next).localCheckpoint(eager = false)
        frontier = next
        i += 1
      }
    }
    acc
  }
}
