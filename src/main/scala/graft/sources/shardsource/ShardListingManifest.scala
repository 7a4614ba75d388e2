package graft.sources.shardsource

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-directory LISTING manifest — what takes a pushed lookup's shard
  * DISCOVERY from O(shards) `listStatus` work to O(directories) sidecar
  * reads. The aggregate manifest ([[ShardAggManifest]]) already answers
  * "which of this directory's shards can hold the name?" in one read,
  * but the walk that discovers the shards (and feeds the aggregate its
  * candidates) still listed every directory — per-entry stat cost on a
  * local filesystem, paginated LIST round trips on an object store, and
  * the reason the 10× scale probe's lookup wall-time kept growing. This
  * sidecar freezes one directory's RELEVANT children (subdirectory names
  * + committed `.tar` shards with their byte stamps) into one small
  * file, so the recursive walk costs two `getFileStatus` calls and one
  * short read per directory, flat in the shard count.
  *
  * **Freshness without listing** — the sidecar is trusted only when the
  * DIRECTORY's mtime is at or before the sidecar's own: every child
  * add/remove/rename bumps the parent directory's mtime on a POSIX
  * filesystem, so a shard exported after the sidecar (or a crashed
  * export's leftover churn) makes the directory strictly newer and the
  * walk DEGRADES to the real `listStatus` — staleness costs the old
  * price, never a missed shard. [[write]] pins the sidecar's mtime to
  * the directory's own post-rename mtime so the fresh state is
  * deterministic; a writer landing a shard within the same millisecond
  * as the sidecar commit is outside the export discipline (the listing
  * is written LAST, after every shard and the aggregate). Filesystems
  * without directory mtimes (object stores lacking the semantic) never
  * validate — same degradation.
  *
  * The sidecar is DERIVED state (rebuilt from one listing at any time),
  * written by `exportPayloadShards` after the aggregate manifest with
  * the same tmp+rename discipline, and [[writeTree]] rebuilds a whole
  * layout bottom-up as maintenance.
  */
object ShardListingManifest {

  val FileName = "_graft_shards.list"
  private val Header = "graft-shard-listing\tv1"

  /** One directory's frozen children: subdirectory names and committed
    * shard (name, tarBytes) pairs — names relative to the directory.
    */
  final case class Listing(subdirs: Seq[String], shards: Seq[(String, Long)])

  def listPath(dir: Path): Path = new Path(dir, FileName)

  /** Observability counters (JVM-local — what the spec pins): sidecar
    * walks served from a fresh listing vs degraded to `listStatus`.
    */
  val hits = new java.util.concurrent.atomic.AtomicLong(0L)
  val misses = new java.util.concurrent.atomic.AtomicLong(0L)

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** Build (or rebuild) `dir`'s listing sidecar from one real listing —
    * the O(children) cost paid once at export/maintenance time. Returns
    * the number of children recorded. The sidecar's mtime is aligned to
    * the directory's post-commit mtime so the freshness check
    * (`dir.mtime <= sidecar.mtime`) starts true.
    */
  def write(fs: FileSystem, dir: Path): Int = {
    val children =
      try fs.listStatus(dir)
      catch { case scala.util.control.NonFatal(_) => return 0 }
    val lines = children.iterator.flatMap { st =>
      val n = st.getPath.getName
      if (st.isDirectory) Iterator.single("D\t" + enc(n))
      else if (st.isFile && n.endsWith(".tar"))
        Iterator.single("F\t" + enc(n) + "\t" + st.getLen)
      else Iterator.empty
    }.toIndexedSeq
    val tmp = new Path(dir, FileName + "." +
      java.util.UUID.randomUUID().toString.take(8) + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((Header + "\n" + lines.mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = listPath(dir)
    if (fs.exists(dst)) fs.delete(dst, false): Unit
    if (!fs.rename(tmp, dst)) {
      if (fs.exists(dst)) fs.delete(tmp, false): Unit
      else throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
    // the rename above just bumped the directory's mtime past the
    // sidecar's creation time — align them so the sidecar validates
    val dirM = fs.getFileStatus(dir).getModificationTime
    try fs.setTimes(dst, math.max(dirM, fs.getFileStatus(dst)
      .getModificationTime), -1)
    catch { case scala.util.control.NonFatal(_) => () } // degrade: stale
    lines.size
  }

  /** Maintenance: rebuild listing sidecars for `root` and every
    * subdirectory, bottom-up (children first, so a parent's recorded
    * subdir set is at least as fresh as the children's own sidecars).
    * Returns the number of directories written.
    */
  def writeTree(fs: FileSystem, root: Path): Int = {
    val subdirs =
      try fs.listStatus(root).iterator.filter(_.isDirectory).map(_.getPath)
        .toIndexedSeq
      catch { case scala.util.control.NonFatal(_) => return 0 }
    val below = subdirs.iterator.map(writeTree(fs, _)).sum
    write(fs, root): Unit
    below + 1
  }

  /** Bounded parsed-listing cache, validated by the sidecar's
    * (length, mtime); the DIRECTORY mtime freshness check still runs on
    * every probe (it is the correctness gate), so the cache only saves
    * re-reading and re-parsing.
    */
  private val CacheMax = 256
  private val cache = new java.util.LinkedHashMap[
      String, (Long, Long, Option[Listing])](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, (Long, Long, Option[Listing])]) =
      size() > CacheMax
  }

  /** `dir`'s listing IF a fresh sidecar proves it: None means absent,
    * torn, unparseable, or STALE (the directory changed after the
    * sidecar committed) — the caller falls back to `listStatus`.
    */
  def read(fs: FileSystem, dir: Path): Option[Listing] = {
    val side =
      try fs.getFileStatus(listPath(dir))
      catch { case scala.util.control.NonFatal(_) =>
        misses.incrementAndGet(); return None }
    val dirM =
      try fs.getFileStatus(dir).getModificationTime
      catch { case scala.util.control.NonFatal(_) =>
        misses.incrementAndGet(); return None }
    if (dirM > side.getModificationTime) {
      // the directory changed after the sidecar — degrade to the walk
      misses.incrementAndGet()
      return None
    }
    val key = dir.toUri.toString
    val parsed = cache.synchronized {
      Option(cache.get(key)) match {
        case Some((len, mtime, p))
            if len == side.getLen && mtime == side.getModificationTime => p
        case _ =>
          val p = parse(fs, dir)
          cache.put(key,
            (side.getLen, side.getModificationTime, p)): Unit
          p
      }
    }
    (if (parsed.isDefined) hits else misses).incrementAndGet(): Unit
    parsed
  }

  private def parse(fs: FileSystem, dir: Path): Option[Listing] =
    try {
      val in = fs.open(listPath(dir))
      val text =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 << 10)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          new String(bos.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      val lines = text.split('\n').iterator.filter(_.nonEmpty).toIndexedSeq
      if (lines.isEmpty || lines.head != Header) None
      else {
        val subdirs = Seq.newBuilder[String]
        val shards = Seq.newBuilder[(String, Long)]
        lines.drop(1).foreach { ln =>
          val parts = ln.split('\t')
          parts(0) match {
            case "D" => subdirs += dec(parts(1))
            case "F" => shards += ((dec(parts(1)), parts(2).toLong))
            case _ => return None // unknown record kind: treat as torn
          }
        }
        Some(Listing(subdirs.result(), shards.result()))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
