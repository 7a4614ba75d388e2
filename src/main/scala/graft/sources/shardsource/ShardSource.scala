package graft.sources.shardsource

import java.util

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 for the WebDataset-style tar payload shards written by
  * [[graft.scale.Multimodal.exportPayloadShards]] — the preference-order
  * (c) move done where it genuinely pays: tar shards are not a Spark
  * built-in format, and a first-class source gives the planner two things
  * the `mapPartitions` reader cannot express:
  *
  *  - **Partition planning**: one input partition per shard file, planned
  *    from a driver-side listing (a metadata op), so shards parallelize
  *    exactly like parquet files and locality/ordering stay with the
  *    scheduler, not with a hand-rolled `mapPartitions` over a path list.
  *  - **Column-pruning pushdown** (`SupportsPushDownRequiredColumns`): a
  *    metadata-only projection — `select(name)`, a manifest or count —
  *    never materializes payload bytes; the reader skips over each tar
  *    entry's body (a seek on seekable filesystems) instead of buffering
  *    it. On a 100 TB shard corpus that is the difference between
  *    listing entry names and reading the archive.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): equality / IN /
  *    prefix predicates on `name` and `shard_path` are taken by the
  *    source and evaluated EXACTLY — shards that a predicate rules out
  *    are skipped at PLANNING (shard_path directly; name via the
  *    per-shard entry manifest [[ShardManifest]], the tar analog of
  *    parquet row-group pruning), and within a surviving shard,
  *    non-matching entries' bodies are skipped, never buffered. A
  *    single-id lookup on a 100 TB corpus opens one shard and reads one
  *    body. Manifest reads happen on the driver and only when a name
  *    predicate was pushed — O(surviving shards) small metadata reads,
  *    the same planning-cost class as parquet footers; a shard with no
  *    (or a torn) manifest is planned unpruned, never dropped.
  *
  * Usage: `spark.read.format("graft-shards").load(dir)` (shortName via
  * META-INF service registration, or the full class name). Schema:
  * `shard_path STRING, name STRING, content BINARY`. Orphan `.tmp`
  * shards from crashed write attempts are excluded at planning; listing
  * is recursive, so date-partitioned layouts (`dt=.../shard-*.tar`)
  * plan all their shards.
  */
class ShardSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-shards"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-shards needs a path — .load(dir)"))
    new ShardTable(path)
  }
}

object ShardTable {
  val Schema: StructType = StructType(Seq(
    StructField("shard_path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))
}

class ShardTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-shards(`$path`)"
  override def schema(): StructType = ShardTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardScanBuilder(path)
}

/** The pushable predicate dialect: equality / IN / prefix / suffix /
  * contains / not-null over the two string metadata columns. Everything
  * here is evaluated EXACTLY by the source (planning + reader), so
  * accepted filters are fully consumed — Spark plans no residual Filter
  * for them. (`IsNotNull` conjuncts, which Catalyst adds next to almost
  * every comparison, are vacuously true on these non-null columns —
  * consuming them keeps the plan free of leftover Filter nodes.)
  */
private[shardsource] object ShardFilters {
  private def attrOf(f: Filter): Option[String] = f match {
    case EqualTo(a, v) if v.isInstanceOf[String] => Some(a)
    case In(a, vs) if vs != null && vs.nonEmpty &&
      vs.forall(_.isInstanceOf[String]) => Some(a)
    case StringStartsWith(a, _) => Some(a)
    case StringEndsWith(a, _) => Some(a)
    case StringContains(a, _) => Some(a)
    case IsNotNull(a) => Some(a)
    case _ => None
  }
  def supported(f: Filter): Boolean =
    attrOf(f).exists(a => a == "name" || a == "shard_path")
  def onName(f: Filter): Boolean = attrOf(f).contains("name")

  /** Exact evaluation against one entry's (name, shard_path) — both
    * columns are non-null by schema, so three-valued logic collapses to
    * plain boolean.
    */
  def eval(f: Filter, name: String, shardPath: String): Boolean = {
    def v(a: String): String = if (a == "name") name else shardPath
    f match {
      case EqualTo(a, x: String) => v(a) == x
      case In(a, xs) => xs.exists(_ == v(a))
      case StringStartsWith(a, p) => v(a).startsWith(p)
      case StringEndsWith(a, s) => v(a).endsWith(s)
      case StringContains(a, s) => v(a).contains(s)
      case IsNotNull(_) => true // schema-non-null
      case _ => true // unreachable: only supported() filters are pushed
    }
  }
}

class ShardScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters with SupportsPushDownLimit {
  private var required: StructType = ShardTable.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // an empty projection (count(*)) still needs a row per entry; keep
    // the empty struct — the reader emits empty rows without any IO body
    required = requiredSchema
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(ShardFilters.supported)
    pushed = sup
    unsup // residual conjuncts Spark keeps evaluating post-scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  // PARTIAL limit pushdown: each reader stops streaming its archive after
  // `limit` matching entries (a head(5) on a TB corpus reads ~5 bodies in
  // the first shard), while Spark's own Limit still enforces the global
  // count across partitions.
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true
  override def build(): Scan = new ShardScan(path, required, pushed, limit)
}

final case class ShardInputPartition(uri: String) extends InputPartition

/** Scan-level observability, surfaced in the Spark UI / status store like
  * any built-in source metric: how many archive entries were produced and
  * how many payload bytes the pruning fast-path never read.
  */
final class EntriesReadMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "entriesRead"
  override def description(): String = "shard entries read"
}

final class BytesSkippedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "bytesSkipped"
  override def description(): String = "payload bytes skipped by column pruning"
}

private final class ShardTaskMetric(n: String, v: Long)
  extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = n
  override def value(): Long = v
}

object ShardScan {
  /** Above this many candidate shards, manifest pruning fans out as a
    * Spark job instead of serial driver reads.
    */
  val ParallelPruneThreshold = 64

  /** Above this many pending directories, the recursive listing walk
    * fans out as a Spark job instead of driver-serial `listStatus`
    * recursion — a 400k-shard corpus under a deep dt=.../bucket=... tree
    * must not serialize its metadata calls through one thread (the
    * `InMemoryFileIndex` parallel-listing discipline).
    */
  val ParallelListThreshold = 32

  /** Real `listStatus` calls the walk had to make (JVM-local — the
    * spec's hook): with fresh listing sidecars everywhere this stays 0
    * and discovery is O(directories) sidecar reads, flat in shards.
    */
  val listStatusCalls = new java.util.concurrent.atomic.AtomicLong(0L)
}

class ShardScan(path: String, required: StructType,
                pushed: Array[Filter], limit: Int = -1) extends Scan with Batch
  with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shards $path readSchema=${required.fieldNames.mkString(",")} " +
      s"pushedFilters=[${pushed.mkString(", ")}]" +
      (if (limit >= 0) s" limit=$limit" else "")

  /** Planning-time size estimate = archive bytes of the shards that
    * SURVIVED pruning, so a pushed single-id lookup reports KB against a
    * TB corpus and the planner can broadcast its result side. Row count
    * is left unknown (manifests are only consulted when a name predicate
    * was pushed; guessing rows from bytes would just mislead the CBO).
    */
  override def estimateStatistics(): Statistics = {
    planned: Unit // force the (cached) plan so plannedBytes is populated
    val bytes = plannedBytes
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  private var plannedBytes: Long = 0L
  private lazy val planned: Array[InputPartition] = plan()

  override def planInputPartitions(): Array[InputPartition] = planned

  /** Recursive shard listing — each directory is answered by its fresh
    * LISTING sidecar when one exists ([[ShardListingManifest]] — two
    * `getFileStatus` probes + one cached parse, flat in the shard
    * count), degrading per-directory to a real `listStatus` when the
    * sidecar is absent or stale (a shard written after it can never be
    * missed: the write bumped the directory's mtime). The `listStatus`
    * fallback is driver-serial for shallow trees and fans out as a
    * Spark job once the pending-directory frontier exceeds
    * [[ShardScan.ParallelListThreshold]]. Plain listStatus, NOT
    * fs.listFiles(recursive): the located-status iterator fetches block
    * locations per file, which we never use and which costs ~100x on
    * some filesystems (measured 3 s vs 0.03 s for 720 local files).
    * `.tmp` orphans and sidecar files never plan (only `.tar`).
    */
  private def listShards(spark: org.apache.spark.sql.SparkSession,
                         fs: org.apache.hadoop.fs.FileSystem,
                         root: Path): Array[(String, Long)] = {
    val out = Array.newBuilder[(String, Long)]
    var pending: List[Path] = List(root)
    while (pending.nonEmpty) {
      if (pending.length > ShardScan.ParallelListThreshold) {
        val sc = spark.sparkContext
        val conf = new SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        val dirs = pending.map(_.toUri.toString)
        pending = Nil
        out ++= sc.parallelize(dirs, math.min(dirs.length,
            sc.defaultParallelism * 4))
          .flatMap { uri =>
            val d = new Path(java.net.URI.create(uri))
            val dfs = d.getFileSystem(conf.value)
            def walk(x: Path): Iterator[(String, Long)] =
              ShardListingManifest.read(dfs, x) match {
                case Some(l) =>
                  l.shards.iterator.map { case (n, len) =>
                    (new Path(x, n).toUri.toString, len)
                  } ++ l.subdirs.iterator.flatMap(n => walk(new Path(x, n)))
                case None =>
                  ShardScan.listStatusCalls.incrementAndGet(): Unit
                  dfs.listStatus(x).iterator.flatMap { st =>
                    if (st.isDirectory) walk(st.getPath)
                    else if (st.getPath.getName.endsWith(".tar"))
                      Iterator((st.getPath.toUri.toString, st.getLen))
                    else Iterator.empty
                  }
              }
            walk(d)
          }
          .collect() // bounded by the shard count (same as planned partitions)
      } else {
        val level = pending
        pending = Nil
        level.foreach { d =>
          ShardListingManifest.read(fs, d) match {
            case Some(l) =>
              l.subdirs.foreach(n => pending ::= new Path(d, n))
              l.shards.foreach { case (n, len) =>
                out += ((new Path(d, n).toUri.toString, len))
              }
            case None =>
              ShardScan.listStatusCalls.incrementAndGet(): Unit
              fs.listStatus(d).foreach { st =>
                if (st.isDirectory) pending ::= st.getPath
                else if (st.getPath.getName.endsWith(".tar"))
                  out += ((st.getPath.toUri.toString, st.getLen))
              }
          }
        }
      }
    }
    out.result()
  }

  /** Pre-prune candidates with the per-directory AGGREGATE manifest: one
    * sidecar read per candidate directory answers every equality/IN name
    * probe from in-memory Blooms (no false negatives ⇒ exact-safe), so a
    * single-id lookup stops paying O(shards) per-shard manifest reads.
    * Shards the aggregate does not describe — or describes with a stale
    * byte stamp, or whose directory has no aggregate — survive to the
    * per-shard sweep. Only EqualTo/In on `name` consult it: a membership
    * sketch cannot answer prefix/suffix/contains.
    */
  private def aggPrune(fs: org.apache.hadoop.fs.FileSystem,
                       candidates: Array[String], sizeOf: Map[String, Long],
                       exact: Array[Filter]): Array[String] = {
    def bloomSaysPossible(s: ShardAggManifest.ShardSummary): Boolean =
      exact.forall {
        case EqualTo(_, v: String) => s.bloom.mightContainString(v)
        case In(_, vs) => vs.exists {
          // non-string elements can't appear (ShardFilters only accepts
          // all-string INs for pushdown) — keep-the-shard if one ever does
          case v: String => s.bloom.mightContainString(v)
          case _ => true
        }
        case _ => true
      }
    candidates.groupBy(u => new Path(java.net.URI.create(u)).getParent)
      .iterator.flatMap { case (dir, uris) =>
        ShardAggManifest.read(fs, dir) match {
          case None => uris // no aggregate for this directory → keep all
          case Some(m) => uris.filter { uri =>
            val name = new Path(java.net.URI.create(uri)).getName
            m.get(name) match {
              case Some(s) if s.tarBytes == sizeOf.getOrElse(uri, -1L) =>
                bloomSaysPossible(s)
              case _ => true // unknown shard / stale stamp → keep
            }
          }
        }
      }.toArray
  }

  private def plan(): Array[InputPartition] = {
    // driver-side metadata listing only (recursive — nested dt=... layouts
    // plan too) — one partition per shard file; `.tmp` orphans from
    // crashed write attempts never plan
    val p = new Path(path)
    val spark = org.apache.spark.sql.SparkSession.active
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Array.empty
    val shards = listShards(spark, fs, p)
    val sizeOf = shards.toMap
    val pathFilters = pushed.filterNot(ShardFilters.onName)
    val nameFilters = pushed.filter(ShardFilters.onName)
    // shard_path predicates prune on the listing alone
    val pathPruned = shards.iterator.map(_._1)
      .filter(uri => pathFilters.forall(ShardFilters.eval(_, "", uri)))
      .toArray
    // equality/IN name predicates consult the per-directory AGGREGATE
    // first — one read per directory, O(1) in the shard count
    val exactNameFilters = nameFilters.filter {
      case EqualTo(a, _) => a == "name"
      case In(a, _) => a == "name"
      case _ => false
    }
    val candidates =
      if (exactNameFilters.isEmpty) pathPruned
      else aggPrune(fs, pathPruned, sizeOf, exactNameFilters)
    // remaining name predicates prune via the entry manifest: drop a shard
    // only when its manifest PROVES no entry can satisfy the conjunction;
    // a missing/torn manifest plans the shard unpruned (the reader still
    // filters exactly). Few shards read serially on the driver; beyond
    // that the manifest sweep fans out as a tiny Spark job over the
    // candidate URIs (the InMemoryFileIndex listing pattern) — at 100 TB
    // a single-id lookup over 400k shards must not serialize 400k
    // metadata reads through one thread.
    val survivors =
      if (nameFilters.isEmpty) candidates
      else {
        if (candidates.length <= ShardScan.ParallelPruneThreshold)
          candidates.filter { uri =>
            val sp = new Path(java.net.URI.create(uri))
            ShardManifest.read(fs, sp, sizeOf.getOrElse(uri, -1L)) match {
              case Some(entries) => entries.exists { case (n, _) =>
                nameFilters.forall(ShardFilters.eval(_, n, uri))
              }
              case None => true
            }
          }
        else {
          val sc = spark.sparkContext
          val conf = new SerializableConfiguration(
            spark.sessionState.newHadoopConf())
          val nf = nameFilters // avoid closing over the Scan
          val withSizes = candidates.map(u => (u, sizeOf.getOrElse(u, -1L)))
          // chunk ~16 manifests per task: one-candidate-per-task pays a
          // scheduler round trip per tiny metadata read and made the
          // fan-out SLOWER than the serial sweep it replaced
          sc.parallelize(withSizes.toIndexedSeq,
            math.min(math.max(candidates.length / 16, 1),
              sc.defaultParallelism * 4))
            .filter { case (uri, len) =>
              val sp = new Path(java.net.URI.create(uri))
              ShardManifest.read(sp.getFileSystem(conf.value), sp, len) match {
                case Some(entries) => entries.exists { case (n, _) =>
                  nf.forall(ShardFilters.eval(_, n, uri))
                }
                case None => true
              }
            }
            .map(_._1)
            .collect() // bounded by the surviving shard count
        }
      }
    plannedBytes = survivors.iterator.map(sizeOf.getOrElse(_, 0L)).sum
    survivors.sorted
      .map(uri => ShardInputPartition(uri): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new ShardReaderFactory(required, pushed, limit,
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
  }

  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new EntriesReadMetric, new BytesSkippedMetric)
}

class ShardReaderFactory(required: StructType, pushed: Array[Filter],
                         limit: Int, conf: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShardPartitionReader(
      partition.asInstanceOf[ShardInputPartition].uri, required, pushed,
      limit, conf)
}

/** Streams one shard's entries. Memory is bounded by ONE entry — and only
  * when `content` is actually required; otherwise the body is skipped by
  * the tar stream on the next `getNextEntry` (a positioned skip, not a
  * read, on seekable filesystems). Pushed filters are evaluated per entry
  * HEADER: a non-matching entry is never emitted and its body is skipped
  * the same way, so a pushed single-id lookup reads exactly one body.
  */
class ShardPartitionReader(uri: String, required: StructType,
                           pushed: Array[Filter], limit: Int,
                           conf: SerializableConfiguration)
  extends PartitionReader[InternalRow] {

  private val needContent = required.fieldNames.contains("content")
  private val pathUtf8 = UTF8String.fromString(uri)
  private val in: TarArchiveInputStream = {
    val p = new Path(java.net.URI.create(uri))
    new TarArchiveInputStream(p.getFileSystem(conf.value).open(p))
  }
  private var cur: TarArchiveEntry = _
  private var entriesRead = 0L
  private var bytesSkipped = 0L

  private def matches(name: String): Boolean =
    pushed.forall(ShardFilters.eval(_, name, uri))

  override def next(): Boolean = {
    // pushed limit satisfied: stop streaming the archive entirely — the
    // remaining entries (headers AND bodies) are never read
    if (limit >= 0 && entriesRead >= limit) { cur = null; return false }
    cur = in.getNextEntry
    while (cur != null && (cur.isDirectory || !matches(cur.getName))) {
      // a filtered-out entry's body is skipped by the stream, not read —
      // account for it alongside the column-pruning skips
      if (!cur.isDirectory) bytesSkipped += cur.getSize
      cur = in.getNextEntry
    }
    if (cur != null) {
      entriesRead += 1
      // with content pruned, the body is never read — the stream skips it
      // on the next getNextEntry; account for it here
      if (!needContent) bytesSkipped += cur.getSize
    }
    cur != null
  }

  override def currentMetricsValues():
      Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(new ShardTaskMetric("entriesRead", entriesRead),
      new ShardTaskMetric("bytesSkipped", bytesSkipped))

  override def get(): InternalRow = {
    val values = required.fieldNames.map {
      case "shard_path" => pathUtf8
      case "name" => UTF8String.fromString(cur.getName)
      case "content" =>
        // fail loud rather than silently truncating a >2 GB entry via
        // toInt wraparound (the shard writer caps entries well below this)
        require(cur.getSize <= Int.MaxValue,
          s"tar entry ${cur.getName} in $uri is ${cur.getSize} bytes — " +
            "exceeds the 2 GB single-entry limit")
        val buf = new Array[Byte](cur.getSize.toInt)
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) throw new java.io.EOFException(
            s"torn tar entry ${cur.getName} in $uri")
          off += n
        }
        buf
      case other => throw new IllegalStateException(s"unknown column $other")
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = in.close()
}
