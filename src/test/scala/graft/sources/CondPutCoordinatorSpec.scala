package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The CONDITIONAL-PUT commit coordinator — the object-store
  * exactly-once primitive (if-none-match PUT), simulated locally with
  * atomic `link(2)`: win/loss parity with the lock-file coordinator,
  * the same forked-JVM two-process race, and property-wired full
  * LogTable transactions.
  */
class CondPutCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-condput").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("publish wins once, loses on an existing key, never tears dst") {
    val dir = tmp()
    val fs = fsOf(dir)
    val coord = new LogTable.ConditionalPutCommitCoordinator()
    def mkTmp(n: String): Path = {
      val p = new Path(dir, n)
      val o = fs.create(p, true); o.write(n.getBytes("UTF-8")); o.close()
      p
    }
    val dst = new Path(dir, "00001.json")
    assert(coord.publish(fs, mkTmp("t1"), dst))
    assert(fs.exists(dst))
    assert(!fs.exists(new Path(dir, "t1")), "a win consumes tmp")
    // second publish to the same key LOSES, and the content is the
    // winner's, untorn
    val t2 = mkTmp("t2")
    assert(!coord.publish(fs, t2, dst))
    assert(fs.exists(t2), "tmp cleanup on loss is the caller's job")
    val in = fs.open(dst)
    val buf = new Array[Byte](16)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "t1", "loser must not clobber")
  }

  test("thread race: exactly one winner per slot (no lock to leak)") {
    val dir = tmp()
    val fs = fsOf(dir)
    val coord = new LogTable.ConditionalPutCommitCoordinator()
    val slots = 40
    val threads = 4
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      (0 until threads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = (0 until slots).foreach { i =>
            val tp = new Path(dir, s"tmp-$t-$i")
            val o = fs.create(tp, true); o.write(t); o.close()
            if (coord.publish(fs, tp, new Path(dir, f"s-$i%04d")))
              wins.incrementAndGet(): Unit
            else fs.delete(tp, false): Unit
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(wins.get() == slots,
      s"exactly one winner per slot: ${wins.get()} wins for $slots slots")
  }

  test("two PROCESSES race the same slots through conditional put: " +
    "every slot decided exactly once, untorn (flock parity)") {
    val dir = tmp()
    val fs = fsOf(dir)
    val slots = 60
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val child = new ProcessBuilder(
      javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.sources.LockRaceChild", dir, slots.toString, "child", "condput")
      .redirectErrorStream(true).start()
    java.nio.file.Files.write(new java.io.File(dir, "go").toPath,
      Array.emptyByteArray): Unit
    val coord = new LogTable.ConditionalPutCommitCoordinator()
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
    (0 until slots).foreach { i =>
      val p = new Path(dir, f"slot-$i%05d.json")
      assert(fs.exists(p), s"slot $i undecided")
      val in = fs.open(p)
      val content = new String(in.readAllBytes(), "UTF-8"); in.close()
      assert(content == "parent" || content == "child", s"torn slot $i: $content")
    }
  }

  test("full LogTable transactions ride the coordinator via the TABLE " +
    "property; the session conf wires it too; unknown names refuse") {
    val dir = tmp() + "/t"
    LogTable.create(spark, dir,
      Seq((0L, "seed", 0, "p0", "U")).toDF("k", "v", "ver", "p", "op"),
      Seq("p"), statsCols = Seq("k"),
      tableProperties = Map("commit.coordinator" -> "condput"))
    val threads = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      (1 to threads).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            LogTable.upsert(spark, dir,
              Seq((t.toLong, s"w$t", 1, s"p$t", "U"))
                .toDF("k", "v", "ver", "p", "op"),
              Seq("k"), Seq("ver"), "op", maxRetries = 16): Unit
          }
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    assert(LogTable.latestVersion(spark, dir) == (1 + threads).toLong)
    assert(LogTable.read(spark, dir).count() == (1 + threads).toLong)
    // session-conf wiring: a fresh table with no property commits
    // through the conf-selected coordinator
    val dir2 = tmp() + "/t2"
    spark.conf.set("spark.graft.commit.coordinator", "condput")
    try {
      LogTable.create(spark, dir2,
        Seq((1L, "p0", 1L)).toDF("k", "p", "v"), Seq("p")): Unit
      LogTable.append(spark, dir2,
        Seq((2L, "p1", 2L)).toDF("k", "p", "v")): Unit
      assert(LogTable.read(spark, dir2).count() == 2L)
      spark.conf.set("spark.graft.commit.coordinator", "bogus")
      intercept[IllegalArgumentException] {
        LogTable.append(spark, dir2,
          Seq((3L, "p1", 3L)).toDF("k", "p", "v")): Unit
      }
    } finally spark.conf.unset("spark.graft.commit.coordinator")
  }
}
