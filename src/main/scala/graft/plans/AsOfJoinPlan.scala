package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Whole-operator custom-plan path for the as-of join (SURVEY §2.4 Op-35
  * family / the x_asof_join semantics): a dedicated logical node, a planner
  * strategy lowering it to [[AsOfJoinExec]], and an optimizer rule restoring
  * probe-side predicate pushdown through the opaque node — the
  * `LogicalPlan + Rule + SparkStrategy + SparkPlan` extension tier, wired
  * through the same `SparkSessionExtensions` the SQL functions use
  * ([[graft.functions.GraftExtensions]]).
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]], which remains
  * the pure-DataFrame formulation and the equivalence reference): every
  * probe row picks up the value columns of the LATEST build row with the
  * same key and build ts ≤ probe ts; unmatched probes null-extend; NULL
  * keys/timestamps never match (SQL join-key semantics). The declarative
  * form pays a union + window over the merged stream; this exec merges the
  * two sorted streams directly — per partition one forward pass, O(1) state
  * (the current key's best build row), no window buffer at all.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        probeKey: Attribute, probeTs: Attribute,
                        buildKey: Attribute, buildTs: Attribute,
                        valueAttrs: Seq[Attribute]) extends BinaryNode {
  require(probeKey.dataType == buildKey.dataType &&
    probeTs.dataType == buildTs.dataType,
    "as-of key/ts types must match across sides")

  override def output: Seq[Attribute] =
    left.output ++ valueAttrs.map(_.withNullability(true))

  // left semantics: one output row per probe row
  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[AsOfJoinPlan]] to the merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, pk, pt, bk, bt, vals) =>
      AsOfJoinExec(pk, pt, bk, bt, vals, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Catalyst cannot see through a custom node, so a Filter sitting above the
  * as-of join would otherwise stop the probe-side predicate short of the
  * scan (no row-group pruning, join input unpruned). The as-of join is
  * per-probe-row (left semantics), so any deterministic conjunct touching
  * only probe columns commutes with it — push those below, keep the rest
  * above. Fixed point: after one push the remaining conjuncts are
  * unpushable, so the rule no-ops on its own output. */
object PushFilterThroughAsOf extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
