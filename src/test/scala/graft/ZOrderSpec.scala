package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; (v, lane) <- vals.zipWithIndex)
      z |= ((v >> i) & 1L) << (i * vals.size + lane)
    z
  }

  test("zorderKey matches a serial Morton reference on random inputs") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val out = rows.toDF("x", "y")
      .withColumn("z", ZOrder.zorderKey(Seq(col("x"), col("y")), 16))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) => assert(z == mortonRef(Seq(x, y), 16)) }
  }

  test("zorderKey interleaves three columns without lane collisions") {
    val out = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .withColumn("z", ZOrder.zorderKey(Seq(col("a"), col("b"), col("c")), 4))
      .collect().head.getLong(3)
    assert(out == 7L) // bits 0,1,2 set — one lane per column
  }

  test("z-ordered layout prunes a box query that defeats a linear sort") {
    // 64x64 grid; 16 files. A y-slab touches EVERY file of an x-sorted
    // layout but only the files whose Z-range intersects the slab.
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y").repartition(8)
    val dir = Files.createTempDirectory("graft_zorder")
    val (zDir, xDir) = (dir.resolve("z").toString, dir.resolve("x").toString)
    ZOrder.writeZOrdered(df, zDir, Seq("x", "y"), bits = 6, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(xDir)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") >= 8 && col("y") < 16) // all x, narrow y
        .select(col("_metadata.file_path")).distinct().count()

    val zTouched = filesTouched(zDir)
    val xTouched = filesTouched(xDir)
    assert(xTouched == 16L, s"x-sorted layout should touch all files, got $xTouched")
    assert(zTouched <= 8L, s"z-ordered layout should touch at most half, got $zTouched")
    // and the layout loses no rows
    assert(spark.read.parquet(zDir).count() == 64L * 64L)
  }
}
