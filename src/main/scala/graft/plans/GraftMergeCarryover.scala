package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Coalesce, Literal, MonotonicallyIncreasingID, Subtract}
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Deduplicate, Join, LogicalPlan, MergeRows, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.BooleanType

/** S26 correctness patch over Spark's group-based MERGE rewrite: a
  * target row matched by SEVERAL source rows is LEGAL when the
  * statement has no `WHEN MATCHED` clause (the SQL cardinality rule
  * governs only update/delete), and the row must survive EXACTLY once.
  * `RewriteMergeIntoTable` plans that case as a left/full-outer join
  * whose only matched instruction is the carryover `Keep(Copy, true)`,
  * with the cardinality check off — so each extra source match emits
  * an extra carried copy of the target row into the copy-on-write
  * output: silent row duplication (the extension-seam kernel this
  * adoption replaced special-cased the same shape with semi/anti
  * joins).
  *
  * The patch is a value-free plan transform on our own tables only:
  * tag each target row with a monotonic id BEFORE the join, then
  * deduplicate the join output on that id (source-only rows get a
  * unique synthetic negative key, so inserts — where SQL really does
  * take every source row — pass through untouched), and hand MergeRows
  * its original column set back. Which of a target row's matches
  * survives is immaterial: the only instruction that can fire for a
  * matched row is the carryover, whose output ignores the source side
  * entirely. All original attribute ids pass through unchanged, so the
  * MergeRows instructions resolve exactly as Spark built them.
  *
  * Scale note: the dedup keys by one LONG over the rewrite stream; a
  * matched row's duplicates are co-partitioned by the join key, so the
  * aggregate sees skew only where the join already did. It costs one
  * exchange on the rewrite path of one statement shape (MERGE with no
  * WHEN MATCHED clause) — correctness over an edge-shape shuffle. */
object GraftMergeCarryoverDedup extends Rule[LogicalPlan] {

  /** True when the matched-instruction list is ONLY the synthetic
    * carryover — i.e. the user wrote no WHEN MATCHED clause and the
    * rewrite copies matched rows verbatim. */
  private def carryoverOnly(instrs: Seq[MergeRows.Instruction]): Boolean =
    instrs match {
      case Seq(k: MergeRows.Keep) =>
        k.context == MergeRows.Copy && (k.condition match {
          case Literal(true, BooleanType) => true
          case _ => false
        })
      case _ => false
    }

  private def graftGroupTarget(rel: Any): Boolean = rel match {
    case r: DataSourceV2Relation =>
      org.apache.spark.sql.GraftShims.rowLevelOperationOf(r.table)
        .exists(_.isInstanceOf[graft.sources.GraftGroupOperation])
    case _ => false
  }

  /** Locate the rewrite's target-vs-source join STRUCTURALLY — the
    * first left/full-outer join, descending through any unary nodes
    * Spark's rewrite (or a future upstream change) interposes, whose
    * LEFT side outputs the `__row_from_target` marker — and rebuild
    * the subtree with the dedup wired in. Matching the one exact plan
    * shape the current rewrite emits would turn a benign upstream
    * refactor (an extra Project, an alias rename) into a hard runtime
    * failure on every no-WHEN-MATCHED MERGE; keying off the join
    * semantics keeps the patch working across such changes. None =
    * no such join anywhere below (the caller fails loudly — the
    * duplication-prone shape with no patchable join is the signal to
    * re-derive this rule against the new rewrite). */
  private def patched(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case j @ Join(left, _, LeftOuter | FullOuter, _, _)
        if left.output.exists(_.name == "__row_from_target") =>
      val tid = Alias(MonotonicallyIncreasingID(), "__graft_tid")()
      val j2 = j.copy(left = Project(left.output :+ tid, left))
      val dk = Alias(Coalesce(Seq(tid.toAttribute,
        Subtract(Literal(-1L), MonotonicallyIncreasingID()))),
        "__graft_dk")()
      val keyed = Project(j2.output :+ dk, j2)
      val deduped = Deduplicate(Seq(dk.toAttribute), keyed)
      Some(Project(j.output, deduped))
    case u if u.children.length == 1 =>
      patched(u.children.head).map(c => u.withNewChildren(Seq(c)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case rd: ReplaceData if graftGroupTarget(rd.table) =>
      // descend through unary wrappers to FIND the MergeRows — an
      // interposed node (a Spark upgrade's Project, another injected
      // rule) must not silently skip the patch this shape needs; the
      // direct-child match used to return the plan unpatched, quietly
      // reintroducing the duplication `patched` fails loudly to
      // prevent (r20 review find)
      def findMergeRows(p: LogicalPlan)
          : Option[(MergeRows, MergeRows => LogicalPlan)] = p match {
        case m: MergeRows => Some((m, identity[MergeRows] _))
        case u if u.children.length == 1 =>
          findMergeRows(u.children.head).map { case (m, rebuild) =>
            (m, (nm: MergeRows) => u.withNewChildren(Seq(rebuild(nm))))
          }
        case _ => None
      }
      findMergeRows(rd.query) match {
        case Some((m, rebuild))
            if carryoverOnly(m.matchedInstructions) && !m.checkCardinality =>
          patched(m.child) match {
            case Some(c) => rd.withNewQuery(rebuild(m.copy(child = c)))
            case None =>
              // Only reached when the statement HAS the duplication-
              // prone shape (carryover-only, cardinality check off,
              // our group table) and no target-left outer join exists
              // anywhere below. Running it unpatched would silently
              // duplicate multi-matched target rows — fail loudly
              // instead; if a Spark upgrade fixed the carryover
              // upstream, this error is the signal to retire the patch.
              throw new IllegalStateException(
                "MERGE with no WHEN MATCHED clause on a graft table " +
                  "planned with no recognizable target join below " +
                  s"MergeRows (${m.child.getClass.getSimpleName}); " +
                  "refusing to run UNPATCHED — Spark's group rewrite " +
                  "duplicates multi-matched target rows in this " +
                  "statement shape (GraftMergeCarryoverDedup)")
          }
        case _ => rd
      }
    case other => other
  }
}
