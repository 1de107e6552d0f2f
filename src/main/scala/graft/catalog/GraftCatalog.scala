package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.GraftTable

/** Name-addressed catalog over GraftTable roots — walden's model of
  * versioned tables living in a NAMED catalog (`tf/main.tf:93-98`
  * registers the iceberg-nessie catalog; extra catalogs per
  * `README.md:403`), expressed through Spark's public DataSourceV2
  * `TableCatalog` plugin API:
  *
  * {{{
  *   spark.sql.catalog.graft            = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse  = /path/to/warehouse
  *
  *   CREATE NAMESPACE graft.db;
  *   CREATE TABLE graft.db.t (id BIGINT, name STRING);
  *   INSERT INTO graft.db.t VALUES (1, 'a');
  *   SELECT * FROM graft.db.t VERSION AS OF 1;      -- numeric snapshot
  *   SELECT * FROM graft.db.t VERSION AS OF 'main'; -- branch/tag ref
  *   SELECT * FROM graft.db.t TIMESTAMP AS OF '2026-01-01 00:00:00';
  * }}}
  *
  * Layout: a namespace is a directory under the warehouse root; a table
  * is a directory holding a GraftTable commit log. Everything the
  * catalog does is metadata-sized (directory listings, commit-log
  * reads); data stays distributed.
  *
  * Read path: scans go through a [[V1Scan]] bridge (the same public
  * connector seam Spark's own JDBC source uses). Pruned columns and the
  * translatable filter subset are handed to [[GraftTable.read]], so
  * file-level stats pruning AND parquet row-group pushdown both still
  * fire inside the bridged DataFrame; Spark re-evaluates every filter
  * above the scan, so the translation is an IO optimization, never a
  * correctness dependency. At 100 TB the expensive part of a scan is
  * the IO the pruning avoids — the per-row V1 Row conversion is the
  * accepted bridge cost (identical trade to Spark's JDBC connector).
  *
  * Write path: INSERT INTO appends, INSERT OVERWRITE truncates —
  * both land as GraftTable commits via the [[V1Write]] seam, keeping
  * the store's atomic-rename optimistic concurrency.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"spark.sql.catalog.$name.warehouse must point at a directory")
    warehouse = Paths.get(w)
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  // ---- path mapping ------------------------------------------------------
  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)(_ resolve _)

  private def tablePath(ident: Identifier): Path =
    nsPath(ident.namespace()).resolve(ident.name())

  private def isTableDir(p: Path): Boolean =
    Files.isDirectory(p.resolve("_graft_log"))

  // ---- tables ------------------------------------------------------------
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(dir)
    try s.iterator.asScala
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def tableExists(ident: Identifier): Boolean = isTableDir(tablePath(ident))

  override def loadTable(ident: Identifier): Table = loadPinned(ident, None)

  /** `VERSION AS OF` — numeric snapshot id, or a named branch/tag
    * (walden's Nessie refs; `FOR SYSTEM_VERSION AS OF` maps here too). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val gt = graftTable(ident)
    val v =
      if (version.forall(_.isDigit)) version.toLong
      else gt.resolveVersion(ref = Some(version))
    loadPinned(ident, Some(v))
  }

  /** `TIMESTAMP AS OF` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val gt = graftTable(ident)
    loadPinned(ident, Some(gt.versionAsOfTimestamp(timestampMicros / 1000L)))
  }

  private def graftTable(ident: Identifier): GraftTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    GraftTable.load(SparkSession.active, tablePath(ident).toString)
  }

  private def loadPinned(ident: Identifier, version: Option[Long]): Table = {
    val gt = graftTable(ident)
    val pinned = version.getOrElse(gt.currentVersion)
    new GraftV2Table(gt, s"$catalogName.${ident.toString}", pinned, timeTravel = version.isDefined)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables cluster via compact(clusterBy) + stats pruning, not static partitions")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val dir = tablePath(ident)
    if (!Files.isDirectory(dir.getParent)) throw new NoSuchNamespaceException(ident.namespace())
    Files.createDirectories(dir)
    val spark = SparkSession.active
    val fmt = Option(properties.get("format")).getOrElse("parquet")
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val gt = GraftTable.create(spark, dir.toString, empty, fmt)
    new GraftV2Table(gt, s"$catalogName.${ident.toString}", gt.currentVersion, timeTravel = false)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val gt = graftTable(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1, "nested ADD COLUMN not supported")
        gt.addColumn(add.fieldNames()(0), add.dataType())
      case other =>
        throw new UnsupportedOperationException(s"unsupported table change: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    if (!isTableDir(dir)) return false
    deleteRecursively(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    Files.move(tablePath(oldIdent), tablePath(newIdent))
  }

  // ---- namespaces ----------------------------------------------------------
  override def listNamespaces(): Array[Array[String]] = {
    val s = Files.list(warehouse)
    try s.iterator.asScala
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => Array(p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsPath(namespace)
    if (!Files.isDirectory(dir) || isTableDir(dir)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(dir)
    try s.iterator.asScala
      .filter(p => Files.isDirectory(p) && !isTableDir(p))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
    finally s.close()
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val dir = nsPath(namespace)
    Files.isDirectory(dir) && !isTableDir(dir)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    if (!namespaceExists(namespace)) return false
    if (!cascade) {
      val s = Files.list(dir)
      val nonEmpty = try s.iterator().hasNext finally s.close()
      if (nonEmpty) throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(namespace)
    }
    deleteRecursively(dir)
    true
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally s.close()
  }
}

/** One catalog table = one GraftTable pinned to a snapshot version
  * (resolved at load time → every query reads one consistent snapshot,
  * Iceberg's isolation contract). */
private[catalog] final class GraftV2Table(gt: GraftTable, fullName: String,
                                          pinned: Long, timeTravel: Boolean)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String = fullName
  override def schema(): StructType = gt.schemaAt(pinned)
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): util.Map[String, String] =
    Map("format" -> gt.format, "version" -> pinned.toString,
      TableCatalog.PROP_LOCATION -> gt.root).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(gt, pinned, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!timeTravel, s"cannot write to a time-travelled snapshot of $fullName")
    new GraftWriteBuilder(gt)
  }

  /** `DELETE FROM graft.db.t WHERE ...` — only predicates the store can
    * evaluate are accepted (Spark falls back to an analysis error for
    * the rest, never a partial delete); the delete itself is
    * GraftTable's copy-on-write: stats-pruned scan for matching files,
    * rewrite only those, one atomic commit. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    !timeTravel && filters.forall(f => GraftScanBuilder.toColumn(f, schema()).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(f => GraftScanBuilder.toColumn(f, schema()))
      .reduceOption(_ && _).getOrElse(lit(true))
    gt.delete(cond)
  }

  override def truncateTable(): Boolean = { gt.delete(lit(true)); true }
}

/** Column pruning + filter pushdown into the GraftTable read.
  *
  * Pushdown contract: `pushFilters` returns ALL filters (Spark keeps
  * re-evaluating them above the scan); the translatable subset is
  * reported via `pushedFilters` and handed to the store, where it
  * drives commit-log stats pruning (skip whole files) and, inside the
  * bridged DataFrame, parquet row-group pushdown. Double evaluation of
  * a cheap predicate is noise; skipped IO at 100 TB is the win.
  */
private[catalog] final class GraftScanBuilder(gt: GraftTable, version: Long,
                                              fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftScanBuilder.toColumn(f, fullSchema).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val req = required
    val filterCols = pushed.flatMap(f => GraftScanBuilder.toColumn(f, fullSchema)).toSeq
    new V1Scan {
      override def readSchema(): StructType = req
      override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
        new BaseRelation with TableScan {
          override def sqlContext: SQLContext = ctx
          override def schema: StructType = req
          override def buildScan(): RDD[Row] = {
            val df = gt.read(asOfVersion = Some(version), filters = filterCols)
            val projected =
              if (req.isEmpty) df.select() // count(*): zero-column rows
              else df.select(req.fieldNames.toIndexedSeq.map(col): _*)
            projected.rdd
          }
        }.asInstanceOf[T]
    }
  }
}

private[catalog] object GraftScanBuilder {
  /** V1 Filter → Column, for the subset the stats pruner understands.
    * Only top-level attributes translate (nested fields fall through —
    * Spark still evaluates them above the scan). */
  def toColumn(f: Filter, schema: StructType): Option[Column] = {
    def top(a: String): Boolean = schema.fieldNames.contains(a)
    f match {
      case sources.EqualTo(a, v) if top(a) => Some(col(a) === lit(v))
      case sources.EqualNullSafe(a, v) if top(a) => Some(col(a) <=> lit(v))
      case sources.GreaterThan(a, v) if top(a) => Some(col(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) if top(a) => Some(col(a) >= lit(v))
      case sources.LessThan(a, v) if top(a) => Some(col(a) < lit(v))
      case sources.LessThanOrEqual(a, v) if top(a) => Some(col(a) <= lit(v))
      case sources.In(a, vs) if top(a) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a) if top(a) => Some(col(a).isNull)
      case sources.IsNotNull(a) if top(a) => Some(col(a).isNotNull)
      case sources.StringStartsWith(a, v) if top(a) => Some(col(a).startsWith(v))
      case sources.StringEndsWith(a, v) if top(a) => Some(col(a).endsWith(v))
      case sources.StringContains(a, v) if top(a) => Some(col(a).contains(v))
      case sources.And(l, r) =>
        for (lc <- toColumn(l, schema); rc <- toColumn(r, schema)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- toColumn(l, schema); rc <- toColumn(r, schema)) yield lc || rc
      case sources.Not(c) => toColumn(c, schema).map(!_)
      case _ => None
    }
  }
}

/** INSERT INTO → append commit; INSERT OVERWRITE → overwrite commit.
  * The V1Write seam hands us the materialized source DataFrame, which
  * GraftTable writes distributed (immutable files + one stats pass). */
private[catalog] final class GraftWriteBuilder(gt: GraftTable)
  extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): V1Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      (data, overwriteFlag) =>
        if (overwrite || overwriteFlag) gt.overwrite(data) else gt.append(data)
  }
}
