package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Sources

/** Z-order interleave correctness + the point of it: a 2-D box predicate
  * touches far fewer files under a Z-sorted layout than under a one-key
  * range sort.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleave matches the reference bit arithmetic") {
    val pairs = for (x <- 0L to 17L; y <- 0L to 17L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (x, y) => mortonRef(x, y, 8) }
    assert(got.toSeq == want.toSeq)
    // the SQL emitter is the same function: run it through Spark SQL
    val gotSql = pairs.toDF("x", "y")
      .selectExpr(s"(${ZOrder.interleaveSql("x", "y", 8)}) AS z")
      .collect().map(_.getLong(0))
    assert(gotSql.toSeq == want.toSeq)
  }

  test("z-sorted layout prunes a 2-D box on both dimensions; x-sort only on one") {
    val dim = 32
    val grid = (for (x <- 0 until dim; y <- 0 until dim; _ <- 0 until 4)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("z", ZOrder.interleave(col("x"), col("y"), bits = 5))
    val nFiles = 16
    val zdir = Files.createTempDirectory("graft-z").toString + "/z"
    val xdir = Files.createTempDirectory("graft-z").toString + "/x"
    Sources.writeRangeSorted(grid, zdir, "z", nFiles)
    Sources.writeRangeSorted(grid, xdir, "x", nFiles)
    // query box: ALL x, a narrow y band — the worst case for the x-sort
    // (every file intersects), the payoff case for z
    val yLo = 8L
    val yHi = 9L
    val boxZ = (for (x <- 0L until dim.toLong; y <- yLo to yHi)
      yield mortonRef(x, y, 5)).toSet
    val zMan = Sources.rangeManifest(spark, zdir, "z").collect()
    val zTouched = zMan.count { r =>
      val lo = r.getAs[Long]("min_key")
      val hi = r.getAs[Long]("max_key")
      boxZ.exists(z => z >= lo && z <= hi)
    }
    val xMan = Sources.rangeManifest(spark, xdir, "x").collect()
    val xTouched = xMan.count { r =>
      // x unconstrained by the box: every file whose x-range is nonempty
      // could hold rows with y in band — file-level stats on x prune 0
      r.getAs[Long]("min_key") <= dim.toLong - 1
    }
    assert(xTouched == nFiles, s"x-sort should touch all $nFiles files")
    assert(zTouched < nFiles / 2,
      s"z-sort should touch well under half the files, touched $zTouched/$nFiles")
  }

  test("interleaveN: d=2 reproduces the 2-D key bit-for-bit; d=3 matches its reference") {
    def morton3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (3 * i)) |
          (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }
    val pairs = for (x <- 0L to 9L; y <- 0L to 9L) yield (x, y)
    val got2 = pairs.toDF("x", "y")
      .select(ZOrder.interleaveN(Seq(col("x"), col("y")), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    assert(got2.toSeq == pairs.map { case (x, y) => mortonRef(x, y, 8) }.toSeq)
    val triples = for (x <- 0L to 7L; y <- 0L to 7L; z <- 0L to 7L)
      yield (x, y, z)
    val got3 = triples.toDF("x", "y", "w")
      .select(ZOrder.interleaveN(
        Seq(col("x"), col("y"), col("w")), bits = 4).as("m"))
      .collect().map(_.getLong(0))
    assert(got3.toSeq ==
      triples.map { case (x, y, z) => morton3(x, y, z, 4) }.toSeq)
    intercept[IllegalArgumentException](
      ZOrder.interleaveN(Seq(col("x")), 8))
    intercept[IllegalArgumentException](ZOrder.interleaveN(
      Seq(col("a"), col("b"), col("c"), col("d"), col("e")), 8))
  }

  test("3-D z-order on a log table: a box bounded on EACH dimension prunes") {
    import graft.sources.LogTable
    val dir = Files.createTempDirectory("graft-z3").toString + "/t"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val rows = (for (x <- 0 until 24; y <- 0 until 24; w <- 0 until 4)
      yield (x.toLong, y.toLong, (x * 7 + y * 3 + w).toLong % 50, "p"))
      .toDF("x", "y", "w", "p")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      LogTable.create(spark, dir, rows, Seq("p"),
        statsCols = Seq("x", "y", "w"), zorderBy = Seq("x", "y", "w"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val files = LogTable.snapshot(spark, dir).files.length
    assert(files >= 8)
    // one narrow band per dimension: EACH must exclude files on its own
    def excluded(c: String, lo: Long, hi: Long): Int =
      LogTable.countWhere(spark, dir,
        col(c) >= lo && col(c) <= hi).excludedFiles
    assert(excluded("x", 0L, 2L) > 0, "x band must prune")
    assert(excluded("y", 0L, 2L) > 0, "y band must prune")
    assert(excluded("w", 0L, 2L) > 0, "w band must prune")
    // and the data is intact under the layout
    assert(LogTable.read(spark, dir).count() == rows.count())
  }
}
