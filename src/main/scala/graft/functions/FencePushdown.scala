package graft.functions

import org.apache.spark.sql.catalyst.expressions.{And, Expression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.optimizer.PushDownPredicates
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Selective predicate pushdown through fenced projections — the repair for
  * [[OptimizerFence]]'s collateral damage.
  *
  * `fence()` marks an expensive projected metric non-deterministic so the
  * threshold filter on its alias is NOT re-inlined below the Project
  * (single evaluation — see OptimizerFence). But Catalyst's
  * `PushPredicateThroughNonJoin` is all-or-nothing: ONE non-deterministic
  * field freezes EVERY predicate above that Project, including ones that
  * only touch pass-through columns and belong at the scan. This rule adds
  * the per-conjunct granularity Catalyst lacks, for exactly the projects
  * whose only "non-determinism" is a fence (which is semantically an
  * identity, so reordering a deterministic filter below it is safe — that
  * is NOT true of genuine non-determinism like rand() or
  * monotonically_increasing_id, hence the strict fence-only guard):
  *
  *   - conjuncts whose alias-substituted form is still deterministic (no
  *     fence in their lineage) move below the Project;
  *   - conjuncts that consume a fenced alias stay above it (single eval).
  *
  * Runs in the "User Provided Optimizers" fixed-point batch (after the main
  * operator-optimization batch has pushed everything it legally can),
  * paired with the stock [[PushDownPredicates]] so a conjunct this rule
  * frees keeps descending through whatever deterministic operators sit
  * between the fenced Project and the scan. Installed idempotently by
  * [[GraftFunctions.register]] via `spark.experimental.extraOptimizations`
  * (runtime path) and by [[GraftExtensions]] (build-time path).
  */
object FencePushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def stripFences(e: Expression): Expression =
    e.transformUp { case OptimizerFence(c) => c }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Only projects where every non-deterministic field is non-deterministic
    // SOLELY because of a fence — genuine non-determinism keeps Catalyst's
    // conservative freeze.
    case f @ Filter(cond, project @ Project(fields, child))
        if fields.exists(!_.deterministic) &&
          fields.forall(fld => fld.deterministic || stripFences(fld).deterministic) =>
      val aliasMap = getAliasMap(project)
      val (push, keep) = splitConjunctivePredicates(cond).partition { c =>
        val substituted = replaceAlias(c, aliasMap)
        // No subqueries: stock pushdown guards this with
        // canPushThroughCondition (a pushed subquery whose plan shares
        // output attributes with `child` would capture the wrong exprIds
        // after decorrelation); mirror it conservatively by never pushing
        // a conjunct that embeds a plan.
        !substituted.exists(_.isInstanceOf[PlanExpression[_]]) &&
        substituted.deterministic && substituted.references.subsetOf(child.outputSet)
      }
      if (push.isEmpty) f
      else {
        val pushed = Filter(push.map(replaceAlias(_, aliasMap)).reduce(And), child)
        val np = project.copy(child = pushed)
        keep.reduceOption(And).map(Filter(_, np)).getOrElse(np)
      }
  }

  /** The extra-optimizations batch: this rule frees fence-safe conjuncts one
    * Project at a time; the stock pushdown then carries them the rest of the
    * way down (joins, further projections) inside the same fixed point. */
  val batch: Seq[Rule[LogicalPlan]] = Seq(FencePushdown, PushDownPredicates)
}
