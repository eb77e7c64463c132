package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, In, Not, Or}

/** Materialized-view search hints — the reference's
  * `MaterializedViewSearchInfo` (`include/knowhere/comp/
  * materialized_view.h:23-46`): the planner tells filtered search which
  * categorical fields the scalar filter touches, whether the expression is
  * pure-AND, and whether it contains NOT — consumed to pick a filtered-
  * search strategy (`faiss_hnsw_config.h`,
  * `tests/ut/test_materialized_view_search_info.cc`).
  *
  * Spark rendering: the "filter expression" IS a Catalyst expression tree,
  * so the hints are derived, not declared — a tree walk counts touched
  * field equality/IN constraints and detects OR/NOT structure. The
  * consumer is [[AdaptiveSearch]] (strategy + nprobe scaling).
  */
final case class MvSearchInfo(
    touchedFields: Map[String, Long], // field → number of category constraints
    isPureAnd: Boolean,
    hasNot: Boolean)

object MvSearchInfo {

  /** Derive hints from a filter column's ANALYZED expression tree over the
    * frame it will filter (Spark 4 columns are lazy nodes until bound). */
  def from(df: org.apache.spark.sql.DataFrame, filter: Column): MvSearchInfo = {
    val expr = df.filter(filter).queryExecution.analyzed match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      case other => throw new IllegalStateException(s"unexpected plan $other")
    }
    val touched = scala.collection.mutable.Map.empty[String, Long]

    def fieldOf(e: Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(a.name)
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => Some(a.name)
      case _ => None
    }

    var pureAnd = true
    var hasNot = false

    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case Or(l, r) => pureAnd = false; walk(l); walk(r)
      case Not(c) => hasNot = true; walk(c)
      case EqualTo(l, r) =>
        fieldOf(l).orElse(fieldOf(r)).foreach(f => touched(f) = touched.getOrElse(f, 0L) + 1)
      case In(v, list) =>
        fieldOf(v).foreach(f => touched(f) = touched.getOrElse(f, 0L) + list.length)
      case other => other.children.foreach(walk)
    }
    walk(expr)
    MvSearchInfo(touched.toMap, pureAnd, hasNot)
  }
}
