package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, Expression, LessThan, LessThanOrEqual, Literal, NamedExpression,
  Round, RowNumber, SortOrder, Sqrt, WindowExpression, Ascending, Descending
}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Join, LogicalPlan, Project, Window, WindowGroupLimit
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rewrite — tier (c)'s missing rung, the `Rule[LogicalPlan]`:
  * recognizes the NAIVE declarative kNN formulation
  *
  * {{{
  *   Filter (rnk <= k)
  *     Window [row_number() over (partition by qid order by dist, nid) rnk]
  *       [WindowGroupLimit]                  // when Spark already inserted it
  *         Project [qid, id AS nid, round?(metric(qvec, vec)) AS dist]
  *           Join Cross (queries × base)
  * }}}
  *
  * and replaces the whole stack with one [[KnnJoinNode]] — the fused
  * bounded-heap execution ([[KnnJoinExec]]): no nq×nb row materialization,
  * no per-query sort, the base side never shuffles. The SQL-facing win: a
  * user who writes the textbook window-top-k query gets the `flat.cc`-
  * shaped physical operator without knowing the library API (the same
  * contract Catalyst itself follows with `WindowGroupLimit` — this rule
  * just goes further for the metric expressions it owns).
  *
  * Matching is deliberately conservative: the distance must be one of
  * graft's own codegen'd kernels ([[VecL2Sq]] under `sqrt`/bare,
  * [[VecDot]]), operands must come one from each join side, ordering must
  * be the repo's (dist, nid) tie-break with the metric's direction, both
  * ids LONG. Anything else is left for Spark to plan normally. Output
  * attribute ids are preserved, so parents above the filter are
  * untouched. */
object KnnWindowRewrite extends Rule[LogicalPlan] {

  private def asRowNumberAlias(e: NamedExpression): Option[(Alias, Seq[Expression], Seq[SortOrder])] =
    e match {
      case a @ Alias(WindowExpression(_: RowNumber, spec), _) =>
        Some((a, spec.partitionSpec, spec.orderSpec))
      case _ => None
    }

  /** (metricName, roundDigits, qvecExpr, vecExpr) from the dist alias. */
  private def matchDist(e: Expression): Option[(String, Int, Expression, Expression)] =
    e match {
      // Round's constructor arity differs across Spark versions — match the
      // class and read child/scale as fields
      case r: Round =>
        r.scale match {
          case Literal(d: Int, _) =>
            matchDist(r.child).collect { case (m, -1, a, b) => (m, d, a, b) }
          case _ => None
        }
      // FastRoundRewrite may have already swapped Round for the native
      // kernel (rule order is not guaranteed) — recognize it too
      case FastRoundExpr(c, d) =>
        matchDist(c).collect { case (m, -1, a, b) => (m, d, a, b) }
      case Sqrt(VecL2Sq(a, b)) => Some(("l2", -1, a, b))
      case VecL2Sq(a, b) => Some(("l2sq", -1, a, b))
      case VecDot(a, b) => Some(("ip", -1, a, b))
      case _ => None
    }

  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w @ Window(Seq(winExpr), _, _, wchild, _)) =>
      val rewritten = for {
        (rnkAlias, part, order) <- asRowNumberAlias(winExpr)
        k <- cond match {
          case LessThanOrEqual(attr: Attribute, Literal(k: Int, _))
            if attr.exprId == rnkAlias.exprId => Some(k)
          case LessThan(attr: Attribute, Literal(k: Int, _))
            if attr.exprId == rnkAlias.exprId => Some(k - 1)
          case _ => None
        }
        if k > 0
        proj <- stripGroupLimit(wchild) match {
          case p: Project => Some(p)
          case _ => None
        }
        join <- proj.child match {
          case j @ Join(_, _, Cross, None, _) => Some(j)
          case _ => None
        }
        // projection: [qid (left attr), id AS nid (right attr), dist expr]
        out = proj.projectList
        if out.length == 3
        qidAttr <- out(0) match {
          case a: Attribute if a.dataType == LongType => Some(a)
          case _ => None
        }
        nidPair <- out(1) match {
          case al @ Alias(src: Attribute, _) if src.dataType == LongType => Some((al, src))
          case _ => None
        }
        distAlias <- out(2) match { case a: Alias => Some(a); case _ => None }
        (metric, digits, qvecE, vecE) <- matchDist(distAlias.child)
        qvecAttr <- qvecE match { case a: Attribute => Some(a); case _ => None }
        vecAttr <- vecE match { case a: Attribute => Some(a); case _ => None }
        // sides: (qid, qvec) from the left child, (id, vec) from the right
        if join.left.outputSet.contains(qidAttr) && join.left.outputSet.contains(qvecAttr)
        if join.right.outputSet.contains(nidPair._2) && join.right.outputSet.contains(vecAttr)
        // ordering: (dist <metric direction>, nid ASC) partitioned by qid
        if part == Seq(qidAttr)
        distDir = if (metric == "ip") Descending else Ascending
        if (order.toList match {
          case SortOrder(d: Attribute, dir1, _, _) :: SortOrder(n: Attribute, Ascending, _, _) :: Nil =>
            d.exprId == distAlias.exprId && n.exprId == nidPair._1.exprId && dir1 == distDir
          case _ => false
        })
      } yield {
        val node = KnnJoinNode(
          Project(Seq(qidAttr, qvecAttr), join.left),
          Project(Seq(nidPair._2, vecAttr), join.right),
          k, metric, digits, KnnJoinNode.resultAttrs())
        val Seq(nq, nn, nd, nr) = node.output
        // rebind the original output ids so parents above are untouched
        Project(
          Seq(
            Alias(nq, qidAttr.name)(exprId = qidAttr.exprId),
            Alias(nn, nidPair._1.name)(exprId = nidPair._1.exprId),
            Alias(nd, distAlias.name)(exprId = distAlias.exprId),
            Alias(nr, rnkAlias.name)(exprId = rnkAlias.exprId)),
          node)
      }
      rewritten.getOrElse(f)
  }
}
