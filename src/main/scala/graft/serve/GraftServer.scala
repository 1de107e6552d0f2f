package graft.serve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** HiveServer2-protocol SQL endpoint over the engine's session — the
  * wire walden's BI layer actually speaks: Superset connects to Trino
  * through SQLAlchemy (`trino://trino:80/hive`,
  * `tf/superset/superset.tf:62`); the Spark-native equivalent endpoint
  * is the Thrift server (`hive://host:port`), served in-process from
  * the same SparkSession that owns the catalog and the graft function
  * registry.
  *
  * Any JDBC/ODBC client (beeline, Superset's pyhive driver, Tableau)
  * can then query every registered table and graft SQL function with
  * no engine-specific client code — the same "one endpoint, many BI
  * tools" shape as walden's Trino service.
  */
object GraftServer {

  /** Boot a Spark Connect gRPC endpoint on `port` — the second wire
    * protocol modern clients (pyspark/scala `--remote sc://host:port`,
    * BI connectors) speak. Complements the HiveServer2 endpoint below;
    * graft functions reach Connect sessions via `spark.sql.extensions`
    * (GraftExtensions), which is exactly why that injection path
    * exists. Returns a handle whose `close()` stops the service. */
  def startConnect(spark: SparkSession, port: Int): AutoCloseable = {
    // static conf: the gRPC server reads the driver's live SparkConf
    // (SparkEnv), not the session's runtime conf
    org.apache.spark.SparkEnv.get.conf
      .set("spark.connect.grpc.binding.port", port.toString)
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    new AutoCloseable {
      override def close(): Unit =
        org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    }
  }

  /** Boot the Thrift JDBC endpoint on `port`, sharing this session's
    * catalog (temp views included when
    * `spark.sql.hive.thriftServer.singleSession=true`). Returns a
    * handle whose `close()` shuts the server down. (The concrete
    * HiveThriftServer2 type is not named here: its Hive superclasses
    * are shaded into the thriftserver jar in a way scalac cannot read
    * as a type, though the companion's static surface links fine.) */
  def start(spark: SparkSession, port: Int): AutoCloseable = {
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    val srv: AnyRef = HiveThriftServer2.startWithContext(spark.sqlContext)
    new AutoCloseable {
      override def close(): Unit = srv.getClass.getMethod("stop").invoke(srv)
    }
  }
}
