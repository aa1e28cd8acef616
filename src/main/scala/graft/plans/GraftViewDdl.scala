package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedIdentifier, ResolvedNamespace, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.GraftCatalog

/** S35 — SQL view DDL on the graft catalog, through the extension seam.
  *
  * Spark 4.1 ships the `ViewCatalog` INTERFACE but no SQL wiring for it
  * (`ResolveSessionCatalog` still throws "catalog does not support
  * views" for any non-session catalog) — so, exactly like UPDATE/MERGE
  * before Spark's row-level API matured, the statements ride injected
  * rules onto the catalog's own `ViewCatalog` implementation:
  *
  *  - `CREATE [OR REPLACE] VIEW cat.ns.v AS ...` → [[GraftCreateViewCommand]]
  *  - `DROP VIEW [IF EXISTS] cat.ns.v` → [[GraftDropViewCommand]]
  *  - `SHOW VIEWS IN cat.ns` → [[GraftShowViewsCommand]]
  *  - reading: [[GraftViewReadRule]] substitutes an `UnresolvedRelation`
  *    naming a stored view with its parsed SQL text (resolution-batch
  *    rule, so the body resolves in the same fixpoint)
  *
  * The DDL statements are rewritten AT PARSE TIME
  * ([[graft.GraftSqlParser]]): `ResolveSessionCatalog` rejects
  * non-session view DDL INSIDE the main resolution fixpoint — upstream
  * of every injectable rule seam — so the parser is the one hook that
  * sees the statement first (the same seam Delta used for MERGE before
  * Spark grew native support). ALTER VIEW statements resolve through
  * session-view machinery the same way, so property edits ride
  * `alterView` on the catalog API directly (spec-covered); the SQL
  * statements cover the create/read/list/drop lifecycle a BI user
  * actually drives.
  *
  * Resolution-context caveat (documented, spec-pinned): the stored SQL
  * re-resolves in the READER's current catalog/namespace, not the
  * creator's (the context IS persisted in the view file for a future
  * context-switching substitution, but Spark's `View` context plumbing
  * is not public) — qualify table names inside view bodies, as every
  * example here does. */
object GraftViewDdl {

  /** (catalog, namespace, name) when `parts` addresses a graft catalog:
    * an explicit leading catalog name wins; otherwise the CURRENT
    * catalog is probed. None = not ours, leave the statement alone. */
  private[plans] def graftTarget(spark: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    def catalogNamed(n: String): Option[GraftCatalog] =
      try cm.catalog(n) match {
        case g: GraftCatalog => Some(g)
        case _ => None
      } catch { case _: Exception => None }
    parts match {
      case head +: rest if rest.nonEmpty =>
        catalogNamed(head)
          .map(g => (g, Identifier.of(rest.init.toArray, rest.last)))
          .orElse(cm.currentCatalog match {
            case g: GraftCatalog =>
              // a head naming ANY registered catalog (graft or not)
              // is catalog-qualified, never relative: claiming it
              // would bind `other_cat.ns.v` to a graft view stored at
              // namespace [other_cat, ns] — the read rule refuses the
              // same binding, so a mis-created view would be
              // unreadable (r20 review find)
              val headIsCatalog =
                try { cm.catalog(head); true }
                catch { case _: Exception => false }
              if (headIsCatalog) None
              else Some((g, Identifier.of(parts.init.toArray, parts.last)))
            case _ => None
          })
      case Seq(only) => cm.currentCatalog match {
        case g: GraftCatalog =>
          Some((g, Identifier.of(cm.currentNamespace, only)))
        case _ => None
      }
      case _ => None
    }
  }

  /** The parse-time statement rewrite [[graft.GraftSqlParser]] applies:
    * view DDL naming a graft catalog becomes an eager command on the
    * catalog's `ViewCatalog` implementation BEFORE any analyzer rule
    * can reject it (`ResolveSessionCatalog` throws for non-session
    * view DDL inside the main resolution fixpoint — upstream of every
    * injectable rule seam, which is why this lives in the parser). */
  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case c: CreateView =>
        val parts = c.child match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
            u.nameParts
          case _ => Seq.empty
        }
        graftTarget(spark, parts) match {
          case Some((cat, id)) =>
            val sql = c.originalText.getOrElse(
              throw new UnsupportedOperationException(
                "graft CREATE VIEW needs the view's SQL text"))
            require(c.userSpecifiedColumns.isEmpty,
              "graft CREATE VIEW does not support a column list — alias " +
                "columns in the SELECT itself")
            GraftCreateViewCommand(cat, id, sql, c.query,
              c.properties ++ c.comment.map("comment" -> _),
              c.allowExisting, c.replace)
          case None => plan
        }
      case d: DropView =>
        val parts = d.child match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
            u.nameParts
          case _ => Seq.empty
        }
        // a single-part name may be a session TEMP view even when the
        // current catalog is graft — temp views SHADOW (standard
        // resolution order), so a standing temp view always wins the
        // claim, and otherwise the graft view must actually exist
        graftTarget(spark, parts) match {
          case Some((cat, id))
              if (parts.length > 1 || cat.viewExists(id)) &&
                !(parts.length == 1 &&
                  spark.sessionState.catalog.isTempView(parts)) =>
            GraftDropViewCommand(cat, id, d.ifExists)
          case _ => plan
        }
      case s: ShowViews =>
        val parts = s.namespace match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace =>
            u.multipartIdentifier
          case _ => Seq.empty
        }
        val cm = spark.sessionState.catalogManager
        parts match {
          case head +: rest =>
            (try cm.catalog(head) match {
              case g: GraftCatalog => Some(g)
              case _ => None
            } catch { case _: Exception => None }) match {
              case Some(g) =>
                GraftShowViewsCommand(g, rest, s.pattern, s.output)
              case None => cm.currentCatalog match {
                // a RELATIVE namespace under a current graft catalog:
                // `SHOW VIEWS IN ns` must list what `CREATE VIEW ns.v`
                // just created — the same lifecycle symmetry
                // CREATE/DROP/read already have (r20 review find).
                // A head naming any registered catalog stays unclaimed.
                case g: GraftCatalog
                    if (try { cm.catalog(head); false }
                        catch { case _: Exception => true }) =>
                  GraftShowViewsCommand(g, parts, s.pattern, s.output)
                case _ => plan
              }
            }
          case _ => cm.currentCatalog match {
            // bare `SHOW VIEWS` lists the current namespace
            case g: GraftCatalog =>
              GraftShowViewsCommand(g, cm.currentNamespace.toSeq,
                s.pattern, s.output)
            case _ => plan
          }
        }
      case p => p
    }
}

case class GraftCreateViewCommand(@transient cat: GraftCatalog,
                                  ident: Identifier, sql: String,
                                  @transient query: LogicalPlan,
                                  props: Map[String, String],
                                  allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // the analyzed query supplies the stored schema; analysis happens
    // HERE (the rule ran post-hoc, where c.query may still be the
    // parsed child) so unresolvable view SQL fails at CREATE, not read
    val analyzed = spark.sessionState.executePlan(query).analyzed
    if (cat.viewExists(ident)) {
      if (allowExisting) return Seq.empty // CREATE VIEW IF NOT EXISTS
      if (replace) cat.dropView(ident): Unit
    }
    import scala.jdk.CollectionConverters._
    cat.createView(new ViewInfo(ident, sql,
      spark.sessionState.catalogManager.currentCatalog.name(),
      spark.sessionState.catalogManager.currentNamespace,
      analyzed.schema,
      analyzed.output.map(_.name).toArray,
      Array.empty[String], Array.empty[String],
      props.asJava)): Unit
    Seq.empty
  }
}

case class GraftDropViewCommand(@transient cat: GraftCatalog,
                                ident: Identifier,
                                ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = cat.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

case class GraftShowViewsCommand(@transient cat: GraftCatalog,
                                 namespace: Seq[String],
                                 pattern: Option[String],
                                 override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val views = cat.listViews(namespace: _*).toSeq.map(_.name)
      .filter(n => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(n), p).nonEmpty))
      .sorted
    views.map(n => Row(namespace.mkString("."), n, false))
  }
}

/** Read-side substitution: an `UnresolvedRelation` that names a stored
  * graft view becomes the view's parsed SQL under a subquery alias —
  * a RESOLUTION-batch rule, so the substituted body resolves in the
  * same fixpoint (views over views compose by re-entry). Runs after
  * Spark's own relation resolution has had its chance: only still-
  * unresolved relations are probed, so tables (and temp views) always
  * win and the probe cost is zero on the hot path.
  *
  * Name resolution mirrors [[GraftViewDdl.graftTarget]]: an explicit
  * leading graft-catalog name wins; otherwise — `ns.v` or bare `v`
  * with a graft catalog current — the current catalog/namespace is
  * probed, so the read lifecycle is symmetric with CREATE/DROP.
  *
  * The substituted body resolves in the CREATOR's persisted context,
  * not the reader's: every unqualified table name in the parsed body
  * is qualified against the view's stored currentCatalog/
  * currentNamespace before substitution (Spark's own `View.context`
  * semantics), so a reader defaulted to a different namespace can
  * never silently bind a view's `t` to a different table. CTE names
  * defined anywhere in the body are exempt — they are scope-local,
  * not catalog names. */
object GraftViewReadRule extends Rule[LogicalPlan] {

  private def graftCatalogNamed(spark: SparkSession, n: String)
      : Option[GraftCatalog] =
    try spark.sessionState.catalogManager.catalog(n) match {
      case g: GraftCatalog => Some(g)
      case _ => None
    } catch { case _: Exception => None }

  /** The stored view `parts` addresses, probing explicit-catalog first
    * then the current catalog/namespace — None = not a graft view. */
  private def resolveView(spark: SparkSession, parts: Seq[String])
      : Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val candidates: Seq[(GraftCatalog, Identifier)] = (parts match {
      case head +: rest if rest.nonEmpty =>
        graftCatalogNamed(spark, head)
          .map(g => (g, Identifier.of(rest.init.toArray, rest.last))).toSeq
      case _ => Seq.empty
    }) ++ (cm.currentCatalog match {
      // a multi-part name whose head names ANY registered catalog
      // (graft or not) is catalog-qualified, never relative — probing
      // the current graft catalog with it could silently bind
      // `other_cat.ns.t` to a graft view stored at namespace
      // [other_cat, ns] instead of raising table-not-found
      case g: GraftCatalog if parts.length >= 2 =>
        val headIsCatalog =
          try { cm.catalog(parts.head); true }
          catch { case _: Exception => false }
        if (headIsCatalog) Seq.empty
        else Seq((g, Identifier.of(parts.init.toArray, parts.last)))
      case g: GraftCatalog =>
        Seq((g, Identifier.of(cm.currentNamespace, parts.last)))
      case _ => Seq.empty
    })
    candidates.find { case (g, id) => g.viewExists(id) }
  }

  /** Qualify the body's unqualified relation names against the view's
    * persisted creation context. A single-part name gets the stored
    * catalog + namespace; a multi-part name whose head is NOT a
    * catalog gets the stored catalog (it was namespace-relative at
    * creation). CTE names collected from the whole tree are skipped
    * (conservative: a sub-scope CTE shadows globally here, which can
    * only leave a name unqualified, never mis-qualify it). */
  private def applyContext(spark: SparkSession, body0: LogicalPlan,
                           ctxCat: String, ctxNs: Array[String])
      : LogicalPlan = {
    // the analyzer's CTESubstitution batch ran BEFORE this rule
    // injected the body, so a `WITH` inside a view body would never be
    // substituted — its references would resolve as TABLES ("No plan
    // for CTE"). Run the substitution on the parsed body now; CTE
    // references become CTERelationRefs that the qualifier below
    // naturally skips.
    val body = org.apache.spark.sql.catalyst.analysis.CTESubstitution(body0)
    // collected from the PRE-substitution body: after CTESubstitution
    // the UnresolvedWith nodes are gone, so collecting from `body`
    // matched nothing and the exemption was dead code (r20 review
    // find). Substitution already turns in-scope references into
    // CTERelationRefs; this set is the belt-and-braces for any
    // reference shape the substitution leaves unresolved.
    val cteNames = body0.collectWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet
    def isCatalog(n: String): Boolean =
      try { spark.sessionState.catalogManager.catalog(n); true }
      catch { case _: Exception => false }
    body.transformDownWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 &&
          !cteNames(u.multipartIdentifier.head
            .toLowerCase(java.util.Locale.ROOT)) =>
        u.copy(multipartIdentifier =
          (ctxCat +: ctxNs.toSeq) :+ u.multipartIdentifier.head)
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 &&
          !isCatalog(u.multipartIdentifier.head) =>
        u.copy(multipartIdentifier = ctxCat +: u.multipartIdentifier)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    substitute(SparkSession.active, plan, depth = 0)

  /** One substitution pass, recursing eagerly into each substituted
    * body so EVERY nesting level expands inside a single rule
    * invocation with a tracked depth — a self- or mutually-referential
    * view (creatable via CREATE OR REPLACE) hits the depth ceiling and
    * fails loudly instead of re-substituting forever across analyzer
    * fixpoint iterations (Spark's own views bound nesting the same
    * way, via `spark.sql.view.maxNestedViewDepth`). */
  private def substitute(spark: SparkSession, plan: LogicalPlan,
                         depth: Int): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        val parts = u.multipartIdentifier
        resolveView(spark, parts) match {
          case Some((cat, ident)) =>
            val maxDepth = spark.sessionState.conf.maxNestedViewDepth
            if (depth + 1 > maxDepth)
              throw new org.apache.spark.sql.AnalysisException(
                errorClass = "RECURSIVE_VIEW",
                messageParameters = Map(
                  "viewIdent" -> parts.mkString("."),
                  "newPath" -> (s"max nested view depth $maxDepth " +
                    s"exceeded resolving ${parts.mkString(".")} — " +
                    "recursive view or raise " +
                    "spark.sql.view.maxNestedViewDepth")))
            val v = cat.loadView(ident)
            val body = spark.sessionState.sqlParser.parsePlan(v.query)
            SubqueryAlias(parts.last, substitute(spark,
              applyContext(spark, body, v.currentCatalog, v.currentNamespace),
              depth + 1))
          case None => u
        }
    }
}
