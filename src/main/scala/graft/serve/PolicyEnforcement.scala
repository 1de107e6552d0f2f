package graft.serve

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Row-level security + column masking for CATALOG tables (round 12,
  * r11 verdict #5): the round-11 policy path rewrites per-user TEMP
  * views, but a temp view cannot shadow a catalog-qualified name —
  * `SELECT * FROM g.db.t` resolves through catalog `g`, never through
  * the session's view namespace, so a policy naming a DSv2 table had
  * no engine-enforced teeth. This rule closes that: an analyzer
  * resolution rule (the same `SparkSessionExtensions` seam as
  * [[graft.catalog.GraftDmlRule]]) rewrites every policied
  * [[DataSourceV2Relation]] in an impersonated session into
  * Project(masks, Filter(rowFilter, relation)) — BEFORE references
  * resolve, so Catalyst pushes the predicate into the scan like any
  * user-written filter (no per-row UDF tax, partition/file pruning
  * intact) and time-travelled reads (`VERSION/TIMESTAMP AS OF`) are
  * policied identically, because the time-travel relation node carries
  * the same identifier.
  *
  * Scoping: the rule is registered JVM-wide via [[graft.engine
  * .GraftExtensions]] but fires only in sessions where BOTH confs are
  * set — `spark.graft.user` (an impersonated, untrusted identity; the
  * service session itself stays trusted) and
  * `spark.graft.policy.namespace` (which [[QueryService]] points at
  * its own registry entry, so two services in one JVM can't read each
  * other's policies). Masked columns keep their ORIGINAL exprIds
  * (`Alias(expr, name)(exprId = attr.exprId)`), so the rewrite is
  * sound even when a parent operator resolved against the relation's
  * output in an earlier analyzer iteration.
  *
  * Write statements: the write TARGET resolves raw (a filtered Project
  * cannot be a write target; DML against policied tables is the
  * `allowDml` gate's jurisdiction), but every READ feeding a write —
  * INSERT...SELECT, CTAS/RTAS, MERGE USING, CACHE TABLE AS SELECT — is
  * policied like any other read, so a user cannot launder unmasked
  * rows into a table they can read (round-12 review finding).
  */
object PolicyEnforcement {
  val UserConf = "spark.graft.user"
  val NamespaceConf = "spark.graft.policy.namespace"
  /** Marker option on a relation the rule already rewrote — the copy
    * inside the policy subtree must not match again on the analyzer's
    * next fixed-point iteration. Options are part of the relation case
    * class, so the marker survives plan copies (a TreeNodeTag would
    * not, reliably). */
  val AppliedOption = "graft.policy.applied"

  private val registry =
    new ConcurrentHashMap[String, Map[String, QueryService.TablePolicy]]()

  /** Register a service's catalog-table policies under its namespace;
    * keys are full catalog-qualified names (`cat.db.t`), matched
    * case-insensitively. */
  def install(ns: String, policies: Map[String, QueryService.TablePolicy]): Unit =
    registry.put(ns, policies.map { case (k, v) => k.toLowerCase -> v })

  def uninstall(ns: String): Unit = registry.remove(ns)

  private[serve] def lookup(ns: String): Map[String, QueryService.TablePolicy] =
    Option(registry.get(ns)).getOrElse(Map.empty)
}

final class PolicyEnforcementRule(session: SparkSession) extends Rule[LogicalPlan] {
  import PolicyEnforcement._

  private def fullName(r: DataSourceV2Relation): Option[String] =
    r.identifier.map { id =>
      (r.catalog.map(_.name()).toSeq ++ id.namespace() :+ id.name()).mkString(".")
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val ns = session.conf.get(NamespaceConf, "")
    if (ns.isEmpty) return plan
    val user = session.conf.get(UserConf, "anonymous")
    if (user == "anonymous") return plan
    val pols = lookup(ns)
    if (pols.isEmpty) return plan
    // Write statements: the TARGET relation resolves raw (a filtered
    // Project cannot be a write target; DML against policied tables is
    // the allowDml gate's jurisdiction) — but every READ feeding a
    // write IS policied, otherwise CTAS / INSERT...SELECT / MERGE
    // USING would copy unmasked, unfiltered rows somewhere the user
    // can read them (round-12 review finding: the original early
    // return left write-rooted reads completely unpoliced).
    plan match {
      case _: UpdateTable | _: DeleteFromTable => return plan // target-only plans
      case m: MergeIntoTable =>
        return m.copy(sourceTable = rewriteReads(m.sourceTable, user, pols))
      case i: InsertIntoStatement =>
        return i.copy(query = rewriteReads(i.query, user, pols))
      case ctas: CreateTableAsSelect =>
        return ctas.copy(query = rewriteReads(ctas.query, user, pols))
      case rtas: ReplaceTableAsSelect =>
        return rtas.copy(query = rewriteReads(rtas.query, user, pols))
      case v2w: V2WriteCommand =>
        return v2w.withNewQuery(rewriteReads(v2w.query, user, pols))
      case c: CacheTableAsSelect =>
        return c.copy(plan = rewriteReads(c.plan, user, pols))
      case _: Command => return plan // metadata commands carry no policied reads
      case _ =>
    }
    rewriteReads(plan, user, pols)
  }

  private def rewriteReads(plan: LogicalPlan, user: String,
                           pols: Map[String, QueryService.TablePolicy]): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation if r.identifier.isDefined &&
          !r.options.containsKey(AppliedOption) &&
          fullName(r).exists(n => pols.contains(n.toLowerCase)) =>
        val pol = pols(fullName(r).get.toLowerCase)
        val unknown = pol.columnMasks.keySet
          .filterNot(m => r.output.exists(_.name.equalsIgnoreCase(m)))
        require(unknown.isEmpty,
          s"policy for '${fullName(r).get}' masks non-existent column(s): " +
            unknown.mkString(", "))
        // A parent operator may already reference this relation's
        // exprIds (references can resolve in an earlier analyzer
        // iteration than this rule fires), so the policy subtree must
        // keep producing THOSE ids at its top. But an attribute id must
        // have exactly one producer in a plan — re-issuing an old id
        // from an Alias over the same relation breaks attribute
        // uniqueness, and the optimizer (correctly) collapses the alias
        // back to the scan column, silently unmasking. So: the inner
        // relation gets FRESH ids (newInstance), and the projection
        // aliases every column — masked or passed through — back to
        // its ORIGINAL id.
        val fresh = r.newInstance()
        val optsMap = new java.util.HashMap[String, String](r.options.asCaseSensitiveMap())
        optsMap.put(AppliedOption, "true")
        val marked = fresh.copy(options = new CaseInsensitiveStringMap(optsMap))
        val parser = session.sessionState.sqlParser
        // filter sees UNMASKED values (predicate over true data), then
        // the projection replaces masked columns for everything above;
        // parsed policy expressions resolve by NAME against the fresh
        // relation in later analyzer iterations
        val filtered: LogicalPlan = pol.rowFilter(user) match {
          case Some(pred) => Filter(parser.parseExpression(pred), marked)
          case None => marked
        }
        val projectList = r.output.zip(marked.output).map { case (old, nu) =>
          pol.columnMasks.find(_._1.equalsIgnoreCase(old.name)) match {
            case Some((_, mask)) =>
              Alias(parser.parseExpression(mask), old.name)(exprId = old.exprId)
            case None => Alias(nu, old.name)(exprId = old.exprId)
          }
        }
        Project(projectList, filtered)
    }
}
