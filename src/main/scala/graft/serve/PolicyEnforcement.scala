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
  * Writes are out of scope by design: DML/INSERT against policied
  * tables is governed by the service's `allowDml` gate and Spark's
  * command path, not by silently filtered writes — the rule skips any
  * plan rooted at a write statement.
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
    // write statements resolve against the raw relation: RLS governs
    // reads; writes are the allowDml gate's jurisdiction
    plan match {
      case _: UpdateTable | _: MergeIntoTable | _: DeleteFromTable |
           _: InsertIntoStatement | _: Command => return plan
      case _ =>
    }
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
}
