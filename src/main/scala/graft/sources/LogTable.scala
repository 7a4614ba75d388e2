package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A minimal TRANSACTIONAL table format — the commit-log layout that
  * [[Merge.upsertPartitioned]]'s scaladoc names as what replaces its
  * stage-then-publish double write. Directory-encoded tables make the
  * FILESYSTEM the source of truth, so safe replacement needs every
  * touched partition written twice; a log-table makes the LOG the source
  * of truth, so a merge writes its data files ONCE and then publishes
  * them with one atomic commit-file rename. This is the (heavily
  * simplified) shape of Delta/Iceberg, built from nothing but parquet,
  * JSON, and rename:
  *
  * {{{
  * table/
  *   part-<job>-<task>-<uuid>.parquet     immutable data files
  *   _graft_log/00000000000000000001.json ordered commits
  * }}}
  *
  * Each commit records the schema, the files it ADDS (with per-file
  * partition min/max — log-level pruning, finer than directory pruning
  * because a file spanning several partition values is tracked honestly
  * as a range) and the files it REMOVES. A snapshot at version V =
  * replay of commits 1..V; readers list one directory and never race
  * writers:
  *
  *  - **Atomic publish**: data files land under non-referenced names
  *    (invisible — readers only trust the log), then the commit file is
  *    renamed into place with no-overwrite semantics, which doubles as
  *    OPTIMISTIC CONCURRENCY: two writers racing to version V+1 →
  *    exactly one wins, the loser re-reads the new snapshot and retries
  *    its merge against it. On HDFS-class filesystems the no-overwrite
  *    rename is atomic by itself; a RAW LOCAL filesystem's rename would
  *    silently replace, so local commits additionally serialize under a
  *    JVM-wide lock — correct for every writer in one application
  *    (Spark local / one driver). Separate-process writers on a raw
  *    local path, and S3-class stores (which need a coordinator), are
  *    out of contract — the same boundary as Delta's non-HDFS story.
  *  - **Crash safety for free**: a crash before commit leaves only
  *    unreferenced data files (invisible; reclaimed by [[vacuum]]); a
  *    crash after commit is a completed merge. No torn state exists, no
  *    idempotent-rerun reasoning needed, and nothing is written twice.
  *  - **Time travel**: `read(spark, path, asOf = Some(v))` replays the
  *    prefix — yesterday's table for audits/backfills, until a vacuum
  *    reclaims removed files.
  *  - **Add-column schema evolution** (opt-in, `mergeSchema = true`): a
  *    batch carrying new columns widens the committed schema; untouched
  *    files are never rewritten (schema-on-read fills NULLs), historical
  *    versions keep their schema, and type changes fail loud — the
  *    in-table twin of `Sources.readEvolved`'s multi-epoch rule. By
  *    default any schema difference is an ERROR (a typo'd column name
  *    must never silently widen a table), and the columns the merge
  *    itself consumes (keys, order, op, partition) must always be
  *    physically present in the batch.
  *
  * Log growth is handled the standard way: [[checkpoint]] writes a full
  * snapshot file at the current version, [[snapshot]] replays from the
  * newest checkpoint at-or-before the requested version instead of from
  * commit 1, and [[expireLog]] deletes the commits a checkpoint made
  * redundant (giving up time travel behind it — pair with [[vacuum]]).
  * [[vacuum]] itself breaks time travel behind the current version and
  * must out-wait in-flight readers/writers (`olderThanMs`).
  */
object LogTable {

  /** One live data file: absolute-relative path (table-rooted name),
    * partition value range as strings (pmin==pmax ⇒ single-partition
    * file, equality-prunable), exact rows, bytes.
    */
  final case class LogFile(name: String, pmin: String, pmax: String,
                           rows: Long, bytes: Long)

  final case class Snapshot(version: Long, schemaDdl: String,
                            partitionCol: String, files: Seq[LogFile]) {
    def schema: StructType = StructType.fromDDL(schemaDdl)
  }

  final class CommitConflictException(msg: String) extends RuntimeException(msg)

  private val Mapper = new ObjectMapper()

  private def logDir(path: String) = new Path(path, "_graft_log")
  private def commitPath(path: String, v: Long) =
    new Path(logDir(path), f"$v%020d.json")
  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Create a new log table at `path` from `df`, partition-tracked on
    * `partitionCol` (kept as an ordinary column IN the data — the log,
    * not the directory name, carries partition values). One data write,
    * one commit. Fails if a log already exists.
    */
  def create(spark: SparkSession, path: String, df: DataFrame,
             partitionCol: String): Long = {
    val fs = fsOf(spark, path)
    require(!fs.exists(logDir(path)),
      s"log table already exists at $path — use upsert")
    fs.mkdirs(logDir(path)): Unit
    val adds = writeDataFiles(spark, path, df, partitionCol)
    commit(spark, path, 1L, df.schema.toDDL, partitionCol, adds, Nil)
    1L
  }

  private val CommitName = """^(\d{20})\.json$""".r
  private val CheckpointName = """^(\d{20})\.checkpoint\.json$""".r

  /** Current (or `asOf`-pinned) snapshot: replay starts from the newest
    * checkpoint at-or-before the target version (one file instead of the
    * whole history), then folds the remaining commits — one directory
    * listing plus O(commits since checkpoint) small JSON reads.
    */
  def snapshot(spark: SparkSession, path: String,
               asOf: Option[Long] = None): Snapshot = {
    val fs = fsOf(spark, path)
    val listed = fs.listStatus(logDir(path)).iterator
      .filter(_.isFile).map(_.getPath).toSeq
    val commits = listed.flatMap(p => p.getName match {
      case CommitName(v) => Some((v.toLong, p))
      case _ => None
    }).sortBy(_._1)
    val ckptAll = listed.flatMap(p => p.getName match {
      case CheckpointName(v) => Some((v.toLong, p))
      case _ => None
    }).sortBy(_._1)
    require(commits.nonEmpty || ckptAll.nonEmpty, s"no commits at $path")
    val target = asOf.getOrElse(
      (commits.lastOption.map(_._1) ++ ckptAll.lastOption.map(_._1)).max)
    val upTo = commits.filter(_._1 <= target)
    val ckpt = ckptAll.filter(_._1 <= target).lastOption
    require(upTo.nonEmpty || ckpt.nonEmpty,
      s"no commit at or before version $target (expired log?)")
    var schemaDdl = ""
    var pcol = ""
    var version = 0L
    val live = scala.collection.mutable.LinkedHashMap.empty[String, LogFile]
    def fold(p: Path): Unit = {
      val in = fs.open(p)
      val node = try Mapper.readTree(in) finally in.close()
      schemaDdl = node.get("schema").asText()
      pcol = node.get("partitionCol").asText()
      version = node.get("version").asLong()
      node.get("removes").forEach(r => live.remove(r.asText()): Unit)
      node.get("adds").forEach { a =>
        val f = LogFile(a.get("name").asText(), a.get("pmin").asText(),
          a.get("pmax").asText(), a.get("rows").asLong(), a.get("bytes").asLong())
        live.put(f.name, f): Unit
      }
    }
    ckpt.foreach { case (_, p) => fold(p) }
    upTo.filter { case (v, _) => ckpt.forall(v > _._1) }
      .foreach { case (_, p) => fold(p) }
    // a replay must END at the requested version — a gap (expired commits
    // past the checkpoint) is an error, not a silently older table
    require(asOf.forall(_ == version),
      s"version ${asOf.getOrElse(-1L)} not reachable (replay ends at $version)")
    Snapshot(version, schemaDdl, pcol, live.values.toSeq)
  }

  /** Write a full-snapshot checkpoint at the current version, so future
    * [[snapshot]] calls replay O(commits since) instead of the whole log.
    * Idempotent: an existing checkpoint for the version is kept.
    */
  def checkpoint(spark: SparkSession, path: String): Long = {
    val snap = snapshot(spark, path)
    val fs = fsOf(spark, path)
    val dst = new Path(logDir(path), f"${snap.version}%020d.checkpoint.json")
    if (!fs.exists(dst)) {
      val tmp = new Path(logDir(path),
        ".ckpt_" + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(commitJson(snap.version, snap.schemaDdl, snap.partitionCol,
        snap.files, Nil)) finally out.close()
      if (!fs.rename(tmp, dst)) {
        fs.delete(tmp, false): Unit
        // lost a race to an identical checkpoint — fine
        if (!fs.exists(dst))
          throw new java.io.IOException(s"checkpoint rename failed for $dst")
      }
    }
    snap.version
  }

  /** Debt-triggered small-file compaction — the log-table sibling of
    * `Sources.compactIfNeeded`'s discipline: daily merges leave each
    * touched partition a few more files, and once a partition value
    * exceeds `maxFilesPerPartition` live files its rows are rewritten
    * into a fresh (range-salted, so still parallel) set and swapped in
    * with ONE commit — readers atomically flip from the small files to
    * the compacted ones. Partitions under budget are untouched; a
    * metadata-only check decides from the snapshot, no data read.
    * Boundary files (pmin != pmax) are counted toward every value they
    * span. Returns the new version, or -1 if nothing needed compacting.
    */
  def compactPartitions(spark: SparkSession, path: String,
                        maxFilesPerPartition: Int = 8): Long = {
    require(maxFilesPerPartition > 0, "need a positive file budget")
    val snap = snapshot(spark, path)
    val countByValue = scala.collection.mutable.Map.empty[String, Int]
    snap.files.foreach { f =>
      // a range file adds debt to both endpoints (values between the
      // endpoints are unknown without reading — endpoints are the
      // honest lower bound)
      (Set(f.pmin) ++ Set(f.pmax)).foreach { v =>
        countByValue(v) = countByValue.getOrElse(v, 0) + 1
      }
    }
    val over = countByValue.filter(_._2 > maxFilesPerPartition).keySet
    if (over.isEmpty) return -1L
    val victims = snap.files.filter(f =>
      over.contains(f.pmin) || over.contains(f.pmax))
    // EXPLICIT output count, or the default shuffle-partition fan-out
    // would re-fragment exactly what we are defragmenting: half the
    // budget per value involved, so the rewritten partitions land well
    // under budget and the next call is a metadata no-op (convergence)
    val valuesInvolved = victims.iterator
      .flatMap(f => Iterator(f.pmin, f.pmax)).toSet
    val target = math.max(1,
      valuesInvolved.size * math.max(1, maxFilesPerPartition / 2))
    val rows = readFiles(spark, path, snap, victims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adds =
      try writeDataFiles(spark, path, rows, snap.partitionCol, Some(target))
      finally { rows.unpersist(): Unit }
    try {
      commit(spark, path, snap.version + 1, snap.schemaDdl, snap.partitionCol,
        adds, victims.map(_.name))
    } catch {
      case e: CommitConflictException =>
        // same discipline as upsert's losing race: our files are invisible,
        // drop them eagerly; compaction is maintenance, so no retry — the
        // next scheduled run re-decides from the winner's snapshot
        val fs = fsOf(spark, path)
        adds.foreach(a => fs.delete(new Path(path, a.name), false): Unit)
        throw e
    }
    snap.version + 1
  }

  /** Delete the commits the newest checkpoint made redundant. Time travel
    * to versions before the checkpoint stops working (fails loud in
    * [[snapshot]], never silently serves an older table). Returns the
    * number of commit files removed.
    */
  def expireLog(spark: SparkSession, path: String): Int = {
    val fs = fsOf(spark, path)
    val listed = fs.listStatus(logDir(path)).iterator
      .filter(_.isFile).map(_.getPath).toSeq
    val ckptV = listed.flatMap(p => p.getName match {
      case CheckpointName(v) => Some(v.toLong)
      case _ => None
    }).sorted.lastOption.getOrElse(return 0)
    val dead = listed.filter(p => p.getName match {
      case CommitName(v) => v.toLong <= ckptV
      case _ => false
    })
    dead.foreach(p => fs.delete(p, false): Unit)
    dead.size
  }

  /** Read the table at the current (or a historical) version. */
  def read(spark: SparkSession, path: String,
           asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    readFiles(spark, path, snap, snap.files)
  }

  /** Read ONLY the partitions in `values` — log-level file pruning: the
    * plan never references a file whose (pmin, pmax) range excludes every
    * requested value, so the scan-side cost of a one-partition query on a
    * 2,000-partition table is one partition's files plus any boundary
    * files. The residual equality filter still applies (boundary files
    * carry neighbor rows).
    */
  def readPartitions(spark: SparkSession, path: String, values: Seq[Any],
                     asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    val wanted = values.map(String.valueOf).toSet
    val keep = snap.files.filter(f =>
      // string min/max bounds are ORDER-comparable only within one value,
      // so range files prune solely on the exact-match endpoints; a
      // spanning file is kept conservatively
      (f.pmin == f.pmax && wanted.contains(f.pmin)) || f.pmin != f.pmax)
    readFiles(spark, path, snap, keep)
      .filter(col(snap.partitionCol).cast("string")
        .isin(wanted.toSeq: _*))
  }

  /** The files a batch touching `values` (stringified partition values)
    * must rewrite: every single-partition file holding a touched value,
    * plus every range file (pmin != pmax) — its non-touched rows ride
    * along through the rewrite, which is what keeps removal sound.
    */
  def prunedFiles(snap: Snapshot, values: Set[String]): Seq[LogFile] =
    snap.files.filter(f => f.pmin != f.pmax || values.contains(f.pmin))

  /** Delete-aware latest-wins merge (q108 semantics — see [[Merge.merge]])
    * committed as one log transaction: read ONLY the prunable files, merge
    * with the batch, write the replacement files once, commit
    * {adds, removes}. A losing race re-reads the fresh snapshot and
    * retries the whole merge (the batch re-merges against the winner's
    * state — converging exactly because the merge itself is the conflict
    * resolution).
    */
  def upsert(spark: SparkSession, path: String, changes: DataFrame,
             keyCols: Seq[String], orderCols: Seq[String], opCol: String,
             deleteOp: String = "D", maxRetries: Int = 3,
             mergeSchema: Boolean = false): Long = {
    val fs = fsOf(spark, path)
    var attempt = 0
    while (true) {
      val snap = snapshot(spark, path)
      // The columns the MERGE ITSELF consumes must be physically present
      // in the batch regardless of evolution mode — NULL-filling the op
      // column would turn `op =!= deleteOp` three-valued and silently
      // DELETE every updated key; a NULL-filled key/order column
      // corrupts the argmax. Loud, always.
      val batchCols = changes.schema.fieldNames.map(_.toLowerCase).toSet
      ((keyCols ++ orderCols) :+ opCol :+ snap.partitionCol).foreach { c =>
        require(batchCols.contains(c.toLowerCase),
          s"log table $path: batch is missing merge-critical column `$c`")
      }
      // ADD-COLUMN schema evolution — OPT-IN via mergeSchema (a typo'd
      // column name is indistinguishable from an intentional new column,
      // so silent widening must never be the default): batch columns
      // absent from the table widen the schema (appended, nullable);
      // untouched files are NEVER rewritten — parquet schema-on-read
      // fills the new column with NULLs on old files, and the commit
      // carries the widened DDL so every later snapshot resolves it.
      // Table columns the batch omits NULL-fill on the batch's own rows
      // (also gated by mergeSchema), and the committed field becomes
      // nullable — the data now contains NULLs and the DDL must say so.
      // Column TYPE changes are not evolution and fail loud below.
      val known = snap.schema.fieldNames.map(_.toLowerCase).toSet
      val added = changes.schema.fields.toIndexedSeq
        .filterNot(f => known.contains(f.name.toLowerCase))
        .map(_.copy(nullable = true))
      val missing = snap.schema.fields.toIndexedSeq
        .filterNot(f => batchCols.contains(f.name.toLowerCase))
      require(mergeSchema || (added.isEmpty && missing.isEmpty),
        s"log table $path: batch schema differs from the table " +
          s"(new: ${added.map(_.name).mkString(",")}; " +
          s"missing: ${missing.map(_.name).mkString(",")}) — pass " +
          "mergeSchema=true to evolve/NULL-fill, or fix the batch")
      val missingNames = missing.map(_.name.toLowerCase).toSet
      val schema = StructType(
        snap.schema.fields.toIndexedSeq.map(f =>
          if (missingNames.contains(f.name.toLowerCase)) f.copy(nullable = true)
          else f) ++ added)
      val evolved = snap.copy(schemaDdl = schema.toDDL)
      val touched = changes
        .select(col(snap.partitionCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet // bounded: touched partitions
      val victims = prunedFiles(snap, touched)
      val base = readFiles(spark, path, evolved, victims)
      // the batch aligned to the (possibly widened) table schema: a
      // missing nullable column fills with typed NULL; a TYPE clash is
      // not evolution and fails loud
      val aligned = changes.select(schema.fields.toIndexedSeq.map { f =>
        // backtick-quoted so a literal dot in a column name is never
        // parsed as nested-field access
        def ref(n: String) = col("`" + n.replace("`", "``") + "`")
        changes.schema.fields.find(_.name.equalsIgnoreCase(f.name)) match {
          case Some(g) if g.dataType == f.dataType => ref(g.name).as(f.name)
          case Some(g) => throw new IllegalArgumentException(
            s"log table $path: column `${f.name}` is ${f.dataType.sql}; a " +
              s"${g.dataType.sql} batch cannot evolve it — only ADD-column " +
              "evolution is supported")
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }: _*)
      // persisted across the range-sampling pass and the shuffled write,
      // so the merge aggregation runs ONCE (bounded by the touched
      // partitions + batch — the rows being rewritten anyway)
      val merged = Merge.merge(base, aligned, keyCols, orderCols, opCol, deleteOp)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val adds =
        try writeDataFiles(spark, path, merged, snap.partitionCol)
        finally { merged.unpersist(): Unit }
      try {
        commit(spark, path, snap.version + 1, evolved.schemaDdl,
          snap.partitionCol, adds, victims.map(_.name))
        return snap.version + 1
      } catch {
        case e: CommitConflictException =>
          // our uncommitted files are invisible; drop them eagerly rather
          // than waiting for vacuum, then retry against the new snapshot
          adds.foreach(a => fs.delete(new Path(path, a.name), false): Unit)
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Reclaim everything invisible to the CURRENT snapshot: unreferenced
    * data files (crash orphans and vacated history), whole `_tmp_*`
    * scratch directories from writers that died before their renames,
    * and torn `.tmp` commit/checkpoint files in the log. Irreversibly
    * breaks time travel behind the current version; `olderThanMs` must
    * out-wait any in-flight reader of an old snapshot and any writer
    * that has staged but not committed. Returns the number of
    * files/directories deleted.
    */
  def vacuum(spark: SparkSession, path: String, olderThanMs: Long): Int = {
    val fs = fsOf(spark, path)
    val live = snapshot(spark, path).files.map(_.name).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val deadData = fs.listStatus(new Path(path)).iterator.filter { st =>
      st.getModificationTime < cutoff && {
        (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !live.contains(st.getPath.getName)) ||
          (st.isDirectory && st.getPath.getName.startsWith("_tmp_"))
      }
    }.map(_.getPath).toSeq
    val deadLog = fs.listStatus(logDir(path)).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".tmp") &&
        st.getModificationTime < cutoff)
      .map(_.getPath).toSeq
    deadData.foreach(p => fs.delete(p, true): Unit)
    deadLog.foreach(p => fs.delete(p, false): Unit)
    deadData.size + deadLog.size
  }

  // -------------------------------------------------------------- internals

  private def readFiles(spark: SparkSession, path: String, snap: Snapshot,
                        files: Seq[LogFile]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), snap.schema)
    else
      spark.read.schema(snap.schema)
        .parquet(files.map(f => new Path(path, f.name).toString): _*)

  /** Write `df` once as parquet files directly referenced by the log:
    * land in a scratch dir, collect per-file (partition min/max, rows)
    * with ONE metadata-shaped scan of the new files only, then rename
    * each into the table root under its (already unique) name. Files are
    * invisible until a commit references them.
    */
  private def writeDataFiles(spark: SparkSession, path: String, df: DataFrame,
                             partitionCol: String,
                             numFiles: Option[Int] = None): Seq[LogFile] = {
    val fs = fsOf(spark, path)
    val tmp = new Path(path, "_tmp_" + java.util.UUID.randomUUID().toString.take(8))
    // partition-clustered output: RANGE partitioning on (value, salt).
    // The leading value keeps equal values adjacent and never
    // hash-collides distant values into one file, so files come out
    // single-partition (pmin==pmax, equality-prunable) except at value
    // boundaries — and an unlucky file degrades to a tracked RANGE,
    // never to wrong pruning. The SALT lets one hot partition value
    // spread across many writer tasks (range-partitioning on the value
    // alone would funnel a whole 100 TB date-partition through one
    // task). The partition count is EXPLICIT so AQE cannot coalesce
    // small outputs into one multi-partition file.
    val n = numFiles.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(1L << 20)))
      .repartitionByRange(n, col(partitionCol), col("__salt"))
      .drop("__salt")
      .write.mode("overwrite").parquet(tmp.toString)
    val stats = spark.read.parquet(tmp.toString)
      .select(col(partitionCol).cast("string").as("__p"),
        col("_metadata.file_path").as("__f"))
      .groupBy(col("__f"))
      .agg(min(col("__p")).as("pmin"), max(col("__p")).as("pmax"),
        count(lit(1)).as("rows"))
      .collect() // bounded: one row per NEW file
    val adds = stats.map { r =>
      // NULL partition values would round-trip through the commit JSON as
      // the string "null" and desynchronize pruning — same contract as
      // upsertPartitioned: partition values must be non-null, fail loud
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"log table $path: NULL values in partition column " +
          s"`$partitionCol` are not supported")
      val src = new Path(java.net.URI.create(r.getString(0)))
      val name = src.getName
      val bytes = fs.getFileStatus(src).getLen
      val dst = new Path(path, name)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed")
      LogFile(name, r.getString(1), r.getString(2), r.getLong(3), bytes)
    }.toIndexedSeq
    fs.delete(tmp, true): Unit
    adds
  }

  private def commitJson(version: Long, schemaDdl: String, partitionCol: String,
                         adds: Seq[LogFile], removes: Seq[String]): Array[Byte] = {
    val root = Mapper.createObjectNode()
    root.put("version", version): Unit
    root.put("schema", schemaDdl): Unit
    root.put("partitionCol", partitionCol): Unit
    val aArr = root.putArray("adds")
    adds.foreach { f =>
      val n = aArr.addObject()
      n.put("name", f.name): Unit
      n.put("pmin", f.pmin): Unit
      n.put("pmax", f.pmax): Unit
      n.put("rows", f.rows): Unit
      n.put("bytes", f.bytes): Unit
    }
    val rArr = root.putArray("removes")
    removes.foreach(r => rArr.add(r): Unit)
    Mapper.writeValueAsBytes(root)
  }

  private def commit(spark: SparkSession, path: String, version: Long,
                     schemaDdl: String, partitionCol: String,
                     adds: Seq[LogFile], removes: Seq[String]): Unit = {
    val fs = fsOf(spark, path)
    val tmp = new Path(logDir(path),
      ".commit_" + java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(commitJson(version, schemaDdl, partitionCol, adds, removes))
    finally out.close()
    val dst = commitPath(path, version)
    // Rename-no-overwrite IS the transaction: exactly one writer can
    // publish version N. HDFS-class filesystems make the no-overwrite
    // rename atomic on its own; a RAW LOCAL filesystem's rename is
    // POSIX rename(2), which silently REPLACES an existing destination —
    // so the exists+rename pair is additionally serialized under a
    // JVM-wide lock, which makes the check-then-act atomic for every
    // writer in one application (Spark local / one driver, incl. the
    // concurrent-merge threads MergeSpec exercises). Separate-PROCESS
    // writers against a raw local path are out of contract (same
    // boundary as Delta's non-HDFS story).
    val won = CommitLock.synchronized {
      !fs.exists(dst) && fs.rename(tmp, dst)
    }
    if (!won) {
      fs.delete(tmp, false): Unit
      if (fs.exists(dst))
        throw new CommitConflictException(
          s"version $version already committed at $path")
      throw new java.io.IOException(s"commit rename failed for $dst")
    }
  }

  private object CommitLock
}
