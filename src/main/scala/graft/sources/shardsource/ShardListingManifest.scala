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
  * **Freshness without listing** — the sidecar is trusted outright only
  * when the DIRECTORY's mtime is strictly BEFORE the sidecar's own:
  * every child add/remove/rename bumps the parent directory's mtime on
  * a POSIX filesystem, so a shard exported after the sidecar (or a
  * crashed export's leftover churn) makes the directory newer and the
  * walk DEGRADES to the real `listStatus` — staleness costs the old
  * price, never a missed shard. [[write]] pins the sidecar's mtime one
  * millisecond PAST the directory's post-rename mtime so the fresh
  * state validates strictly. The two untrustworthy cases both fail
  * CLOSED: a non-positive directory mtime (object stores whose marker
  * directories report 0 — mtime carries no information there) is a
  * miss, and an EQUAL stamp (a change landed within the sidecar's own
  * mtime granule, or a coarse-granularity filesystem rounded the pin
  * away) triggers a VERIFYING read — one real `listStatus`, compared
  * name-for-name (and byte-for-byte on shard sizes) against the
  * sidecar's records; any mismatch is a miss. The residual blind spot
  * is a change landing within the same mtime granule as the
  * directory's LAST pre-sidecar stamp — outside the export discipline
  * (the listing is written last, after every shard and the aggregate).
  *
  * The sidecar is DERIVED state (rebuilt from one listing at any time),
  * written by `exportPayloadShards` after the aggregate manifest with
  * the same tmp+rename discipline, and [[writeTree]] rebuilds a whole
  * layout bottom-up as maintenance.
  */
object ShardListingManifest {

  val FileName = "_graft_shards.list"
  private val HeaderV1 = "graft-shard-listing\tv1"
  // v2 adds the record count to the header — a torn/truncated sidecar
  // (fewer lines than promised) parses as None instead of as a shorter
  // directory; v1 sidecars read forever (no count check)
  private val HeaderV2 = "graft-shard-listing\tv2"

  /** One directory's frozen children: subdirectory names and committed
    * shard (name, tarBytes) pairs — names relative to the directory.
    */
  final case class Listing(subdirs: Seq[String], shards: Seq[(String, Long)])

  def listPath(dir: Path): Path = new Path(dir, FileName)

  /** Observability counters (JVM-local — what the spec pins): sidecar
    * walks served from a fresh listing vs degraded to `listStatus`;
    * `verified` counts the equal-stamp probes that paid a real listing
    * to break the mtime tie (a subset of hits when the compare held).
    */
  val hits = new java.util.concurrent.atomic.AtomicLong(0L)
  val misses = new java.util.concurrent.atomic.AtomicLong(0L)
  val verified = new java.util.concurrent.atomic.AtomicLong(0L)

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
    try out.write(
      (HeaderV2 + "\t" + lines.size + "\n" + lines.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = listPath(dir)
    if (fs.exists(dst)) fs.delete(dst, false): Unit
    if (!fs.rename(tmp, dst)) {
      if (fs.exists(dst)) fs.delete(tmp, false): Unit
      else throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
    // the rename above just bumped the directory's mtime past the
    // sidecar's creation time — pin the sidecar one millisecond PAST it
    // so the fresh state validates STRICTLY (dir < sidecar); a coarse
    // filesystem that rounds the pin back to equality degrades to the
    // verifying read, never to blind trust
    val dirM = fs.getFileStatus(dir).getModificationTime
    try fs.setTimes(dst, math.max(dirM + 1L, fs.getFileStatus(dst)
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
    // fail CLOSED on an untrustworthy directory mtime: 0/negative means
    // the filesystem carries no directory-change signal (S3A marker
    // dirs) — trusting a sidecar forever there would silently miss
    // every shard exported after it
    if (dirM <= 0L || dirM > side.getModificationTime) {
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
    // EQUAL stamps cannot distinguish "unchanged" from "changed within
    // the sidecar's mtime granule" — break the tie with one real
    // listing, compared against the records; costs the old price, which
    // is exactly the promised degradation
    val checked = parsed.filter { l =>
      dirM < side.getModificationTime || {
        verified.incrementAndGet()
        matchesLive(fs, dir, l)
      }
    }
    (if (checked.isDefined) hits else misses).incrementAndGet(): Unit
    checked
  }

  /** Does one REAL listing agree with the sidecar's records exactly —
    * same subdirectory names, same committed shard (name, bytes) pairs?
    */
  private def matchesLive(fs: FileSystem, dir: Path, l: Listing): Boolean =
    try {
      val subdirs = Set.newBuilder[String]
      val shards = Set.newBuilder[(String, Long)]
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) subdirs += n
        else if (st.isFile && n.endsWith(".tar")) shards += ((n, st.getLen))
      }
      subdirs.result() == l.subdirs.toSet &&
        shards.result() == l.shards.toSet
    } catch { case scala.util.control.NonFatal(_) => false }

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
      val expected: Option[Int] =
        if (lines.isEmpty) return None
        else if (lines.head == HeaderV1) None
        else if (lines.head.startsWith(HeaderV2 + "\t"))
          Some(lines.head.drop(HeaderV2.length + 1).toInt)
        else return None
      // a truncated v2 sidecar has fewer records than its header
      // promised — torn, not a shorter directory
      if (expected.exists(_ != lines.size - 1)) None
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
