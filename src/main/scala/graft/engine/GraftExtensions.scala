package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-driven session extension: registers every graft function
  * (Trino-dialect parity names + native kernels) at session build time.
  *
  * This is the injection point Spark gives libraries for sessions the
  * library does not itself construct — `spark-submit`, the Thrift
  * server, Spark Connect:
  *
  *   spark.sql.extensions = graft.engine.GraftExtensions
  *
  * (walden's equivalent "always-on surface" is Trino's built-in
  * function library reaching every client, `docker/devserver/
  * Dockerfile:24-26`.) GraftSession sets this config too, so sessions
  * forked from ours inherit the functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.injections.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    graft.functions.GraftFunctions.tableInjections.foreach { case (name, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // SQL UPDATE / MERGE INTO for graft catalog tables: rewrite the
    // resolved statements onto the store's copy-on-write engine
    // (see graft.catalog.GraftDmlRule for why not SupportsRowLevelOperations)
    ext.injectResolutionRule(session => new graft.catalog.GraftDmlRule(session))
    // Row-level security + masking over CATALOG tables: fires only in
    // sessions carrying an impersonated user + a policy namespace
    // (set by graft.serve.QueryService); inert everywhere else
    ext.injectResolutionRule(session => new graft.serve.PolicyEnforcementRule(session))
    // Trino MATCH_RECOGNIZE clause for plain spark.sql text: rewritten
    // onto the graft_match_recognize TVF before Spark's parser runs
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}
