package graft.sources.shardsource

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-shard entry manifest — the tar analog of parquet's footer stats,
  * shaped after the engine's own `rangeManifest` file-skipping contract
  * (`graft.sources.Sources.rangeManifest`): a tiny sidecar
  * `<shard>.tar.manifest` listing every entry's (size, name) lets the
  * DSv2 planner decide "can this shard contain a row matching the pushed
  * name predicate?" WITHOUT opening the archive. At 100 TB that is the
  * difference between a single-id lookup walking every shard's entry
  * headers and it opening exactly the one shard that holds the id.
  *
  * Durability contract mirrors the shard writer's tmp+rename discipline,
  * and the manifest commits strictly AFTER its tar: every reachable
  * manifest describes a committed shard, and a shard whose manifest is
  * missing or torn (crash between the two renames, pre-manifest layout)
  * degrades to "cannot prune — scan it", never to a wrong answer. The
  * same fallback covers unknown future versions: [[read]] returns None
  * for anything it does not fully recognize.
  *
  * Entry names are URL-encoded per line (ids are caller strings and may
  * contain tabs/newlines); sizes are recorded for completeness and
  * debugging — pruning needs only the names.
  */
object ShardManifest {

  val Suffix = ".manifest"
  private val Header = "graft-shard-manifest\tv2"

  def manifestPath(shard: Path): Path =
    new Path(shard.getParent, shard.getName + Suffix)

  /** Write the sidecar for a COMMITTED shard: task-attempt-unique tmp,
    * then atomic rename — identical discipline to the shard itself, so a
    * crashed attempt leaves only an unreachable `.tmp` orphan. The
    * sidecar records the tar's exact byte length, which [[read]] checks
    * against the live tar: if a racing attempt's differently-packed tar
    * ends up next to this manifest, the length mismatch demotes the
    * manifest to "absent" and the shard is scanned instead of pruned.
    * (Attempts of a DETERMINISTIC plan — the export's documented
    * precondition — produce identical bytes, so the check never fires
    * in contract; it is defense-in-depth for violated preconditions.)
    */
  def write(fs: FileSystem, shard: Path, tarBytes: Long,
            entries: Seq[(String, Long)], attempt: Long): Unit = {
    val tmp = new Path(shard.getParent, shard.getName + Suffix + s".$attempt.tmp")
    val out = fs.create(tmp, true)
    try {
      val sb = new StringBuilder(Header).append('\n')
        .append(tarBytes).append('\n')
      entries.foreach { case (name, size) =>
        sb.append(size).append('\t')
          .append(java.net.URLEncoder.encode(name, StandardCharsets.UTF_8))
          .append('\n')
      }
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    val dst = manifestPath(shard)
    if (fs.exists(dst)) fs.delete(dst, false): Unit
    if (!fs.rename(tmp, dst)) {
      if (fs.exists(dst)) fs.delete(tmp, false): Unit
      else throw new java.io.IOException(s"rename $tmp -> $dst failed")
    }
  }

  /** Planning-observability counter: per-shard manifest read attempts.
    * Incremented on executors too, so it is meaningful within one JVM
    * (local mode) — what ShardSourceSpec uses to pin that the aggregate
    * manifest actually removes O(shards) sidecar reads from a lookup.
    */
  val reads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Read a shard's manifest as (name, size) pairs. None — absent, torn,
    * unrecognized version, or describing a tar of a DIFFERENT length
    * than `liveTarBytes` — means "no pruning information; scan the
    * shard", which is always safe.
    */
  def read(fs: FileSystem, shard: Path,
           liveTarBytes: Long = -1L): Option[Seq[(String, Long)]] =
    try {
      reads.incrementAndGet(): Unit
      val mp = manifestPath(shard)
      // open directly — a missing manifest lands in the catch; probing
      // with exists() first would double the metadata round trips
      val in = fs.open(mp)
      val text =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 << 10)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          new String(bos.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      val lines = text.split('\n').iterator.filter(_.nonEmpty).toIndexedSeq
      if (lines.length < 2 || lines.head != Header) None
      else if (liveTarBytes >= 0 && lines(1).toLong != liveTarBytes) None
      else Some(lines.drop(2).map { ln =>
        val i = ln.indexOf('\t')
        require(i > 0, s"malformed manifest line in $mp")
        (java.net.URLDecoder.decode(ln.substring(i + 1), StandardCharsets.UTF_8),
          ln.substring(0, i).toLong)
      })
    } catch { case scala.util.control.NonFatal(_) => None }
}
