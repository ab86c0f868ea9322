package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.functions.{CosineSimilarity, L2Norm, NormalizedDot}

/** Norm-precompute rewrite (SURVEY §4 upgrade 3): when a column in scope is
  * declared to hold the L2 norm of a vector column (metadata
  * `graft.normOf = <vector column name>`, attached by
  * [[graft.functions.VectorFunctions.normTagged]] and persisted through
  * parquet schema metadata), `cosine_sim(v, q)` rewrites to
  * `normalized_dot(v, q, nv, nq)` — the per-row kernel drops from 3
  * FMAs/element to 1, the dominant cost of a brute-force KNN scan. At
  * 100 TB this is the difference between re-deriving every stored vector's
  * norm on every query and reading an 8-byte column the ingest job wrote
  * once.
  *
  * The rewrite is EXACT (see [[NormalizedDot]]'s bit-parity note), so no
  * oracle changes anywhere; a side without a bound norm column falls back
  * to an inline [[L2Norm]] (still ≤ the fused cost).
  *
  * Injected as a post-hoc RESOLUTION rule, not an optimizer rule, on
  * purpose: the optimizer's ColumnPruning drops a stored norm column that
  * nothing references BEFORE the post-hoc optimizer batch runs, so by then
  * the binding this rule needs is gone. At resolution time the analyzed
  * plan still carries every projected column.
  */
object NormPrecomputeRewrite extends Rule[LogicalPlan] {

  val NormOfKey = "graft.normOf"

  /** The vector column under VectorFunctions' float-array cast wrapper. */
  private def asVecAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast => c.child match {
      case a: AttributeReference if c.dataType.isInstanceOf[ArrayType] => Some(a)
      case _ => None
    }
    case _ => None
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node =>
      val bindings: Map[String, Attribute] = node.children.flatMap(_.output)
        .filter(a => a.metadata.contains(NormOfKey))
        .map(a => a.metadata.getString(NormOfKey) -> a)
        .toMap
      if (bindings.isEmpty) node
      else node.transformExpressions {
        case cs @ CosineSimilarity(l, r) if cs.resolved && isFloatArray(l) && isFloatArray(r) =>
          val ln = asVecAttr(l).flatMap(a => bindings.get(a.name))
          val rn = asVecAttr(r).flatMap(a => bindings.get(a.name))
          if (ln.isEmpty && rn.isEmpty) cs
          else NormalizedDot(l, r,
            ln.map(a => a: Expression).getOrElse(L2Norm(l)),
            rn.map(a => a: Expression).getOrElse(L2Norm(r)))
      }
  }
}
