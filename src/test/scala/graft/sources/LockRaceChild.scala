package graft.sources

import org.apache.hadoop.fs.Path

/** Forked-JVM half of the two-process commit-lock race
  * (`LockCoordinatorSpec`): races `n` publishes against the parent
  * process over the same destination slots through
  * [[LogTable.LockFileCommitCoordinator]] — the separate-process
  * contention the JVM-locked rename coordinator cannot serialize.
  * Prints `WINS <k>` on stdout when done.
  */
object LockRaceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val n = args(1).toInt; val id = args(2)
    val root = new Path(dir)
    val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
    // rendezvous so the two loops genuinely overlap
    val go = new java.io.File(dir, "go")
    val waitStart = System.currentTimeMillis()
    while (!go.exists() &&
      System.currentTimeMillis() - waitStart < 30000L) Thread.sleep(2L)
    val coord: LogTable.CommitCoordinator =
      if (args.length > 3 && args(3) == "condput")
        new LogTable.ConditionalPutCommitCoordinator()
      else new LogTable.LockFileCommitCoordinator()
    var wins = 0
    (0 until n).foreach { i =>
      val tmp = new Path(root, s"tmp-$id-$i")
      val o = fs.create(tmp, true)
      try o.write(id.getBytes("UTF-8")) finally o.close()
      val dst = new Path(root, f"slot-$i%05d.json")
      if (coord.publish(fs, tmp, dst)) wins += 1
      else fs.delete(tmp, false): Unit
    }
    println(s"WINS $wins")
  }
}
