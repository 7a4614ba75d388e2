package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableCatalog` over a directory tree of log tables —
  * what gives tables NAMES. Register per session:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.lake.root", "/data/lake")
  * }}}
  *
  * and `lake.db.orders` addresses the log table at `/data/lake/db/orders`
  * everywhere SQL takes a name — SELECT (with VERSION/TIMESTAMP AS OF),
  * INSERT, DELETE, UPDATE, MERGE, the lifecycle dialect (DESCRIBE
  * HISTORY/DETAIL, VACUUM, OPTIMIZE, constraints), CREATE TABLE [AS
  * SELECT], DROP TABLE, SHOW TABLES, CREATE/DROP NAMESPACE. Namespaces
  * are directories; a table is a directory holding a `_graft_log`.
  *
  * **One read path, one write path.** The catalog's [[GraftTable]]
  * deliberately advertises NO capabilities: it exists for catalog
  * plumbing (DESCRIBE, SHOW, existence, schema) only. Every read of a
  * named table substitutes the SAME snapshot/FileIndex relation
  * [[LogTable.table]] builds, and every write lands on the same
  * transactional entry points — [[LogTableSql]]'s parser rewrites a
  * named reference to the `graft.`path`` form before analysis, and its
  * resolution rule swaps any catalog-resolved relation (e.g. via
  * `spark.table`) for the log-table plan. Spark's own V2 scan/write
  * exec paths can never touch the table directory behind the commit
  * log: with no capabilities they fail loud instead.
  *
  * Layout declarations for `CREATE TABLE` arrive as table properties:
  * `stats_by`, `cluster_by`, `bloom_by`, `zorder_by` (comma-separated
  * column lists) — the same vocabulary [[LogTable.create]] takes.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var rootDir: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    rootDir = Option(options.get("root")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog `$name` needs spark.sql.catalog.$name.root=<dir>"))
  }

  override def name(): String = catName

  /** `namespace... table` → the table directory under the root. */
  def pathOf(parts: Seq[String]): String = {
    parts.foreach(p => require(!p.contains("/") && !p.contains("..") &&
      p.nonEmpty, s"graft catalog `$catName`: illegal name part `$p`"))
    (rootDir +: parts).mkString("/")
  }
  private def pathOf(ident: Identifier): String =
    pathOf(ident.namespace.toSeq :+ ident.name)

  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    new Path(rootDir).getFileSystem(spark.sessionState.newHadoopConf())

  private def isTableDir(p: Path): Boolean =
    fs.exists(new Path(p, "_graft_log"))

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path(pathOf(namespace.toSeq))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).iterator.filter(_.isDirectory)
      .filter(st => isTableDir(st.getPath))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(new Path(pathOf(ident)))

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!isTableDir(new Path(p))) throw new NoSuchTableException(ident)
    GraftTable(p, LogTable.snapshot(spark, p), asOf = None)
  }

  /** `VERSION AS OF` through the catalog (the string is the version). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!isTableDir(new Path(p))) throw new NoSuchTableException(ident)
    val v = version.toLong
    GraftTable(p, LogTable.snapshot(spark, p, Some(v)), asOf = Some(v))
  }

  /** `TIMESTAMP AS OF` through the catalog (microseconds). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = pathOf(ident)
    if (!isTableDir(new Path(p))) throw new NoSuchTableException(ident)
    val v = LogTable.versionAt(spark, p, timestampMicros / 1000L)
    GraftTable(p, LogTable.snapshot(spark, p, Some(v)), asOf = Some(v))
  }

  /** CREATE TABLE (no AS SELECT): an EMPTY log table with the declared
    * schema — version 1 references zero files; the first INSERT appends.
    * Partitioning must be identity transforms (the log's partition
    * tracking); layout declarations ride in as properties.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val p = pathOf(ident)
    if (isTableDir(new Path(p))) throw new TableAlreadyExistsException(ident)
    // identity transforms partition directly; years/months/days become
    // GENERATED derived columns (the Iceberg-transform shape), shared
    // with the CTAS dialect's vocabulary
    val entries = partitions.toSeq.map { t =>
      val singleRef = t.references.length == 1 &&
        t.references.head.fieldNames.length == 1
      (t.name, singleRef) match {
        case ("identity", true) => t.references.head.fieldNames.head
        case ("years" | "months" | "days" | "hours", true) =>
          s"${t.name.stripSuffix("s")}(${t.references.head.fieldNames.head})"
        case ("bucket", true) =>
          val n = t.arguments.collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(
            s"graft catalog `$catName`: bucket transform needs a " +
              "bucket count"))
          s"bucket($n, ${t.references.head.fieldNames.head})"
        case _ => throw new IllegalArgumentException(
          s"graft catalog `$catName`: unsupported partition transform " +
            s"`$t` — identity, years/months/days/hours, or bucket(N) " +
            "of one column")
      }
    }
    // no PARTITIONED BY = an unpartitioned table (one partition tuple) —
    // the dimension/lookup-table shape
    val (pcols, gens) = LogTableSql.partitionSpecs(entries)
    def propCols(key: String): Seq[String] =
      Option(properties.get(key)).toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
    // namespaces materialize implicitly (mkdirs is part of create)
    LogTable.create(spark, p, LogTable.emptyDf(spark, schema), pcols,
      statsCols = propCols("stats_by"), clusterBy = propCols("cluster_by"),
      bloomFilterCols = propCols("bloom_by"),
      zorderBy = propCols("zorder_by"), generatedColumns = gens): Unit
    loadTable(ident)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    createTable(ident,
      StructType(columns.toIndexedSeq.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType,
          c.nullable))),
      partitions, properties)

  override def createTable(ident: Identifier, info: TableInfo): Table =
    createTable(ident, info.columns(), info.partitions(), info.properties())

  /** ALTER TABLE through the catalog: ADD COLUMNS and widening ALTER
    * COLUMN TYPE land on the log's metadata-only schema-evolution commit
    * (see [[LogTable.evolveSchema]]); anything else is refused loud.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    if (!isTableDir(new Path(p))) throw new NoSuchTableException(ident)
    val (props, schema) = changes.partition(c =>
      c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty])
    if (props.nonEmpty)
      LogTable.setProperties(spark, p,
        props.collect { case s: TableChange.SetProperty =>
          s.property -> s.value }.toMap,
        props.collect { case r: TableChange.RemoveProperty =>
          r.property }): Unit
    if (schema.nonEmpty) LogTable.evolveSchema(spark, p, schema): Unit
    loadTable(ident)
  }

  /** DROP TABLE deletes the directory — data, log, everything (the
    * managed-table semantic: the catalog's tree owns its tables) — but
    * REFUSES while live shallow clones still reference this table's
    * data files by absolute URI (vacuum respects those markers; so must
    * drop). Drop the clones first: dropping a clone eagerly releases
    * its source-side marker. DROP NAMESPACE ... CASCADE applies the
    * same guard subtree-wide (see [[dropNamespace]]).
    */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = new Path(pathOf(ident))
    if (!isTableDir(dir)) return false
    val clones = LogTable.liveClones(spark, dir.toString)
    if (clones.nonEmpty)
      throw new IllegalStateException(
        s"graft catalog `$catName`: cannot DROP TABLE $ident — live " +
          s"shallow clones still reference its data files: " +
          s"${clones.mkString(", ")}. Drop the clones first.")
    // if THIS table is a clone, releasing its source-side marker frees
    // the source immediately (no grace-window wait)
    val srcUri =
      try LogTable.snapshot(spark, dir.toString)
        .properties.get("clone.source")
      catch { case scala.util.control.NonFatal(_) => None }
    val dstUri = fs.makeQualified(dir).toUri.toString
    val ok = fs.delete(dir, true)
    if (ok) srcUri.foreach(s =>
      LogTable.releaseCloneMarker(spark, s, dstUri))
    ok
  }

  /** ALTER TABLE ... RENAME TO — one atomic directory move (the log is
    * self-contained); see [[LogTable.renameTable]] for the clone/MV
    * bookkeeping and the loud refusals.
    */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val op = pathOf(oldIdent); val np = pathOf(newIdent)
    if (!isTableDir(new Path(op))) throw new NoSuchTableException(oldIdent)
    if (isTableDir(new Path(np)))
      throw new TableAlreadyExistsException(newIdent)
    LogTable.renameTable(spark, op, np)
  }

  // --------------------------------------------------------- namespaces

  private def nsPath(ns: Array[String]) = new Path(pathOf(ns.toSeq))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).iterator.filter(_.isDirectory)
      .filterNot(st => isTableDir(st.getPath))
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => namespace :+ st.getPath.getName)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    if (namespace.isEmpty) return true
    val dir = nsPath(namespace)
    fs.exists(dir) && !isTableDir(dir)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION ->
      pathOf(namespace.toSeq)).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    fs.mkdirs(nsPath(namespace)): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"graft catalog `$catName`: namespaces carry no mutable metadata")

  /** DROP NAMESPACE [CASCADE] — CASCADE walks the subtree first: a live
    * shallow clone OUTSIDE the namespace whose source lives inside it
    * refuses the drop loud (its log references the doomed files by
    * absolute URI); clones wholly inside die together, and their
    * source-side markers on OUTSIDE sources are released eagerly so
    * those sources free up without waiting out the grace window.
    */
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val dir = nsPath(namespace)
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade)
        require(fs.listStatus(dir).isEmpty,
          s"graft catalog `$catName`: namespace " +
            s"${namespace.mkString(".")} is not empty — DROP ... CASCADE")
      else {
        val nsUri = fs.makeQualified(dir).toUri.toString
        def inside(uri: String): Boolean =
          uri == nsUri || uri.startsWith(nsUri + "/")
        val outsideSources = Seq.newBuilder[(String, String)] // (src, dst)
        def walk(p: Path): Unit =
          if (isTableDir(p)) {
            val escaped = LogTable.liveClones(spark, p.toString)
              .filterNot(inside)
            require(escaped.isEmpty,
              s"graft catalog `$catName`: cannot DROP NAMESPACE " +
                s"${namespace.mkString(".")} CASCADE — live shallow " +
                s"clones outside it reference ${p.getName}'s data " +
                s"files: ${escaped.mkString(", ")}. Drop them first.")
            val dstUri = fs.makeQualified(p).toUri.toString
            try LogTable.snapshot(spark, p.toString)
              .properties.get("clone.source")
              .filterNot(inside)
              .foreach(src => outsideSources += ((src, dstUri)))
            catch { case scala.util.control.NonFatal(_) => () }
          } else fs.listStatus(p).iterator.filter(_.isDirectory)
            .foreach(st => walk(st.getPath))
        walk(dir)
        val ok = fs.delete(dir, true)
        if (ok) outsideSources.result().foreach { case (src, dst) =>
          LogTable.releaseCloneMarker(spark, src, dst)
        }
        return ok
      }
      fs.delete(dir, true)
    }
  }
}

/** The catalog's table handle — schema, partitioning and metadata for
  * DESCRIBE/SHOW/existence, and the (path, pinned version) the
  * substitution rule reads. NO capabilities on purpose: scans and
  * writes must go through the log-table plan and its transactional
  * entry points, never Spark's generic V2 exec paths (see
  * [[GraftCatalog]]'s one-path contract).
  */
final case class GraftTable(path: String, snapshot: LogTable.Snapshot,
                            asOf: Option[Long]) extends Table {
  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = snapshot.schema
  override def partitioning(): Array[Transform] =
    snapshot.partitionCols.map(Expressions.identity).toArray
  override def properties(): java.util.Map[String, String] =
    (Map(
      TableCatalog.PROP_PROVIDER -> "graft",
      TableCatalog.PROP_LOCATION -> path,
      "version" -> snapshot.version.toString) ++
      (if (snapshot.statsCols.nonEmpty)
        Map("stats_by" -> snapshot.statsCols.mkString(",")) else Map.empty) ++
      (if (snapshot.bloomCols.nonEmpty)
        Map("bloom_by" -> snapshot.bloomCols.mkString(",")) else Map.empty))
      .asJava
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.emptySet()
}
