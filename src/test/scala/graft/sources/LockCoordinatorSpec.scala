package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The lock-file commit coordinator — the separate-process writer story
  * the default JVM-locked rename cannot cover (LogTable.scala documents
  * the boundary): exactly-one-winner per destination under thread AND
  * process contention, stale-lock takeover, and full LogTable
  * transactions riding on it.
  */
class LockCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-lock").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("publish wins once, loses on an existing destination, releases its lock") {
    val dir = tmp()
    val fs = fsOf(dir)
    val coord = new LogTable.LockFileCommitCoordinator()
    def mkTmp(n: String): Path = {
      val p = new Path(dir, n)
      val o = fs.create(p, true); o.write(n.getBytes("UTF-8")); o.close()
      p
    }
    val dst = new Path(dir, "00001.json")
    assert(coord.publish(fs, mkTmp("t1"), dst))
    assert(fs.exists(dst))
    // the OS lock must be RELEASED (the inert lock file may remain —
    // flock identity is the lock, not the file): a different coordinator
    // can immediately decide the next version through the same lock path
    val coord2 = new LogTable.LockFileCommitCoordinator(
      acquireTimeoutMs = 2000L)
    assert(coord2.publish(fs, mkTmp("t1b"), new Path(dir, "00001b.json")))
    // second publish to the same version must LOSE, not replace
    val t2 = mkTmp("t2")
    assert(!coord.publish(fs, t2, dst))
    val in = fs.open(dst)
    val buf = new Array[Byte](16)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "t1", "loser must not clobber")
  }

  test("a crashed holder's lock file is inert; a LIVE OS lock is respected") {
    val dir = tmp()
    val fs = fsOf(dir)
    val dst = new Path(dir, "00002.json")
    val lock = new java.io.File(dir, "00002.json.lock")
    // a crashed holder leaves only a FILE — the kernel released its lock
    // with the process, so publish proceeds immediately (no staleness
    // horizon exists on local filesystems)
    java.nio.file.Files.write(lock.toPath, "dead\n0\n".getBytes("UTF-8")): Unit
    assert(lock.setLastModified(System.currentTimeMillis() - 120000L))
    val coord = new LogTable.LockFileCommitCoordinator()
    val t = new Path(dir, "t")
    val o = fs.create(t, true); o.write(1); o.close()
    assert(coord.publish(fs, t, dst), "a dead holder's file must not block")
    // a HELD lock (live holder) blocks until the acquire timeout, loud
    val dst3 = new Path(dir, "00003.json")
    val lock3 = new java.io.File(dir, "00003.json.lock")
    val ch = java.nio.channels.FileChannel.open(lock3.toPath,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val held = ch.lock()
    try {
      val strict = new LogTable.LockFileCommitCoordinator(
        acquireTimeoutMs = 300L)
      val t3 = new Path(dir, "t3")
      val o3 = fs.create(t3, true); o3.write(1); o3.close()
      intercept[java.io.IOException] { strict.publish(fs, t3, dst3) }
    } finally { held.release(); ch.close() }
  }

  test("a failed rename re-checks dst: competing commit = LOSS, absence = loud") {
    val dir = tmp()
    val fs = fsOf(dir)
    // wrapper filesystem whose rename FAILS after landing a competing
    // writer's dst — the lost-race edge a frozen-then-resumed holder hits
    // when a foreign writer decided the version while it slept
    class RaceFs(inner: org.apache.hadoop.fs.FileSystem, competing: Boolean)
        extends org.apache.hadoop.fs.FilterFileSystem(inner) {
      override def rename(src: Path, dst: Path): Boolean = {
        if (competing) {
          val o = inner.create(dst, true)
          o.write("foreign".getBytes("UTF-8")); o.close()
        }
        false // the holder's own rename fails either way
      }
    }
    def mkTmp(n: String): Path = {
      val p = new Path(dir, n)
      val o = fs.create(p, true); o.write(n.getBytes("UTF-8")); o.close()
      p
    }
    val coord = new LogTable.LockFileCommitCoordinator()
    // competing dst landed → publish reports LOSS (caller retries) …
    assert(!coord.publish(new RaceFs(fs, competing = true),
      mkTmp("t4"), new Path(dir, "00004.json")))
    // … while a rename failing with dst ABSENT is storage misbehaving
    intercept[java.io.IOException] {
      coord.publish(new RaceFs(fs, competing = false),
        mkTmp("t5"), new Path(dir, "00005.json"))
    }
  }

  test("stamp-file protocol: stale takeover, fencing, fresh-holder respect") {
    val dir = tmp()
    val fs = fsOf(dir)
    val coord = new LogTable.LockFileCommitCoordinator(staleMs = 1000L)
    def mkTmp(n: String): Path = {
      val p = new Path(dir, n)
      val o = fs.create(p, true); o.write(n.getBytes("UTF-8")); o.close()
      p
    }
    // a stale foreign stamp is taken over (re-stat + delete + re-race)
    val dst = new Path(dir, "00006.json")
    val lock = new java.io.File(dir, "00006.json.lock")
    java.nio.file.Files.write(lock.toPath, "dead\n0\n".getBytes("UTF-8")): Unit
    assert(lock.setLastModified(System.currentTimeMillis() - 120000L))
    assert(coord.publishStampFile(fs, mkTmp("t6"), dst),
      "stale stamp must be taken over")
    assert(fs.exists(dst))
    assert(!lock.exists(), "winner must release its own stamp")
    // a FRESH foreign stamp blocks until the acquire timeout, loud, and
    // is NOT deleted on the way out (it is not ours — fencing)
    val dst7 = new Path(dir, "00007.json")
    val lock7 = new java.io.File(dir, "00007.json.lock")
    java.nio.file.Files.write(lock7.toPath, "live\n0\n".getBytes("UTF-8")): Unit
    val strict = new LogTable.LockFileCommitCoordinator(
      staleMs = 60000L, acquireTimeoutMs = 300L)
    intercept[java.io.IOException] {
      strict.publishStampFile(fs, mkTmp("t7"), dst7)
    }
    assert(lock7.exists(), "a foreign live stamp must survive our timeout")
  }

  test("thread race: N writers, one destination each version, no torn commits") {
    val dir = tmp()
    val fs = fsOf(dir)
    val coord = new LogTable.LockFileCommitCoordinator()
    val slots = 40
    val threads = 4
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val tasks = (0 until threads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = (0 until slots).foreach { i =>
            val tp = new Path(dir, s"tmp-$t-$i")
            val o = fs.create(tp, true); o.write(t); o.close()
            if (coord.publish(fs, tp, new Path(dir, f"s-$i%04d")))
              wins.incrementAndGet(): Unit
            else fs.delete(tp, false): Unit
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() == slots,
      s"exactly one winner per slot: ${wins.get()} wins for $slots slots")
    (0 until slots).foreach { i =>
      assert(fs.exists(new Path(dir, f"s-$i%04d")), s"slot $i undecided")
    }
  }

  test("two PROCESSES race the same slots: every slot decided exactly once") {
    val dir = tmp()
    val fs = fsOf(dir)
    val slots = 60
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val child = new ProcessBuilder(
      javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.sources.LockRaceChild", dir, slots.toString, "child")
      .redirectErrorStream(true).start()
    // rendezvous, then run the parent half of the race
    java.nio.file.Files.write(new java.io.File(dir, "go").toPath,
      Array.emptyByteArray): Unit
    val coord = new LogTable.LockFileCommitCoordinator()
    var parentWins = 0
    (0 until slots).foreach { i =>
      val tp = new Path(dir, s"tmp-parent-$i")
      val o = fs.create(tp, true); o.write("parent".getBytes("UTF-8")); o.close()
      if (coord.publish(fs, tp, new Path(dir, f"slot-$i%05d.json")))
        parentWins += 1
      else fs.delete(tp, false): Unit
    }
    val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
    assert(child.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      "child did not finish")
    assert(child.exitValue() == 0, s"child failed:\n$out")
    val childWins = out.linesIterator.collectFirst {
      case l if l.startsWith("WINS ") => l.drop(5).trim.toInt
    }.getOrElse(fail(s"no WINS line in child output:\n$out"))
    assert(parentWins + childWins == slots,
      s"parent $parentWins + child $childWins != $slots — a slot was " +
        "double-won (lost update) or lost")
    // every slot holds exactly one UNTORN owner stamp
    (0 until slots).foreach { i =>
      val p = new Path(dir, f"slot-$i%05d.json")
      assert(fs.exists(p), s"slot $i undecided")
      val in = fs.open(p)
      val content = new String(in.readAllBytes(), "UTF-8"); in.close()
      assert(content == "parent" || content == "child", s"torn slot $i: $content")
    }
  }

  test("full LogTable transactions ride the lock coordinator across threads") {
    val dir = tmp() + "/t"
    val prev = LogTable.coordinator
    try {
      LogTable.coordinator = new LogTable.LockFileCommitCoordinator()
      LogTable.create(spark, dir,
        Seq((0L, "seed", 0, "p0", "U")).toDF("k", "v", "ver", "p", "op"), "p")
      val threads = 4
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val tasks = (1 to threads).map { t =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              LogTable.upsert(spark, dir,
                Seq((t.toLong, s"w$t", 1, s"p$t", "U"))
                  .toDF("k", "v", "ver", "p", "op"),
                Seq("k"), Seq("ver"), "op", maxRetries = 16): Unit
            }
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      // every writer's row landed and the log replays cleanly to the head
      assert(LogTable.latestVersion(spark, dir) == (1 + threads).toLong)
      assert(LogTable.read(spark, dir).count() == (1 + threads).toLong)
      (1 to threads).foreach { t =>
        assert(LogTable.read(spark, dir)
          .filter(org.apache.spark.sql.functions.col("k") === t.toLong)
          .count() == 1L, s"writer $t lost")
      }
    } finally LogTable.coordinator = prev
  }
}
