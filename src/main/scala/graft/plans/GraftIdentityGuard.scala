package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CaseWhen, Cast, Expression, If}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, MergeRows, Project, RowLevelWrite}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftTable, ManifestTable}

/** S51 contract closure: a GENERATED ALWAYS identity column can never
  * be ASSIGNED — not at insert (the append kernel's per-record gate
  * refuses explicit values) and not through UPDATE / MERGE ... UPDATE
  * either, where an assignment could silently duplicate an existing id
  * (Delta refuses the same statement shapes). The rewrite rules run
  * inside the analyzer's Resolution fixpoint, so by the time any
  * injected rule sees the plan the assignments are already baked into
  * the row-level write — this guard therefore inspects the REWRITTEN
  * plan: for every rewritten row-level write on a graft table with a
  * GENERATED ALWAYS identity column, the expression producing that
  * column for UPDATE rows must be exactly the target's own attribute
  * (the read and write relations share attribute ids, so an exprId
  * comparison separates the carryover from `SET id = s.id` even when
  * the MERGE source has a same-named column).
  *
  * Covered shapes (one per DML route):
  *  - group copy-on-write UPDATE: `Project[.. If(cond, assigned, id) ..]`
  *    under ReplaceData — every result branch of the conditional must
  *    be the target attribute;
  *  - position/key delta UPDATE: `Project[.. assigned AS id ..]` under
  *    WriteDelta;
  *  - MERGE (both routes): `MergeRows` instruction outputs — Update-
  *    context Keeps and the reinsert half of Splits. Insert
  *    instructions are NOT judged here: explicit insert values flow
  *    through the append kernel's own per-record identity gate.
  *
  * The traversal stops at MergeRows/Join boundaries so a SOURCE
  * subquery alias that merely shares the column's name (e.g.
  * `SELECT 999 AS id` used by an INSERT action) is never misread as an
  * assignment. */
object GraftIdentityUpdateGuard extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan match {
      case rw: RowLevelWrite => check(rw)
      case _ =>
    }
    plan
  }

  private def check(rw: RowLevelWrite): Unit = {
    val rel = rw.table match {
      case r: DataSourceV2Relation => r
      case _ => return
    }
    val gt = org.apache.spark.sql.GraftShims.rowLevelInnerTable(rel.table)
        match {
      case Some(g: GraftTable) => g
      case _ => return
    }
    val spark = SparkSession.active
    val head = gt.pinnedV
      .orElse(ManifestTable.headVersion(spark, gt.tableDir))
      .getOrElse(return)
    val fs = new org.apache.hadoop.fs.Path(gt.tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val meta = ManifestTable.metaOf(fs, gt.tableDir, head)
    val always = ManifestTable.identitySpecs(meta)
      .collect { case (phys, s) if !s.allowExplicit => phys }.toSet
    if (always.isEmpty) return
    // identity channels key by PHYSICAL name; assignments and plan
    // attributes speak logical — map through the column-mapping channel
    val physToLogical = ManifestTable.colMapOf(fs, gt.tableDir, head)
      .map(_.swap)
    val resolver = spark.sessionState.conf.resolver
    always.map(p => physToLogical.getOrElse(p, p)).foreach { c =>
      rel.output.find(a => resolver(a.name, c)).foreach { tAttr =>
        judgeColumn(rw.query, c, tAttr, resolver)
      }
    }
  }

  private def judgeColumn(query: LogicalPlan, c: String, tAttr: Attribute,
                          resolver: (String, String) => Boolean): Unit = {
    def refuse(): Nothing = throw new UnsupportedOperationException(
      s"identity column '$c' is GENERATED ALWAYS — UPDATE/MERGE cannot " +
        "assign it (an assigned value could duplicate an existing id); " +
        "updated rows carry their ids")
    // value-preserving iff every result branch is the target attribute
    // itself (modulo the casts/aliases resolution interposes)
    def preserved(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == tAttr.exprId
      case al: Alias => preserved(al.child)
      case If(_, t, f) => preserved(t) && preserved(f)
      case CaseWhen(branches, elseV) =>
        branches.forall(b => preserved(b._2)) && elseV.forall(preserved)
      case ct: Cast => preserved(ct.child)
      case _ => false
    }
    def judgeMergeRows(m: MergeRows): Unit = {
      val idx = m.output.indexWhere(a => resolver(a.name, c))
      if (idx < 0) return
      (m.matchedInstructions ++ m.notMatchedBySourceInstructions).foreach {
        case k: MergeRows.Keep if k.context == MergeRows.Update =>
          if (!preserved(k.output(idx))) refuse()
        case s: MergeRows.Split =>
          // delete-record half legitimately nulls the row columns; the
          // reinsert half carries the update's assigned values
          if (!preserved(s.otherOutput(idx))) refuse()
        case _ =>
      }
    }
    def walk(p: LogicalPlan): Unit = p match {
      case m: MergeRows => judgeMergeRows(m)
      case _: Join => () // below a join = merge source territory
      case proj: Project =>
        proj.projectList.foreach {
          case al: Alias if resolver(al.name, c) =>
            if (!preserved(al.child)) refuse()
          case _ =>
        }
        proj.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(query)
  }
}
