package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.GraphReaders

/** ESRI ASCII raster → point cloud (io/RasterReader.cpp parity on the shape). */
class RasterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeRaster(): String = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "raster")
    val f = dir.resolve("pop.asc")
    val txt =
      """ncols         3
        |nrows         2
        |xllcorner     0.0
        |yllcorner     0.0
        |cellsize      1.0
        |NODATA_value  -9999
        |2 0 1
        |0 3 1
        |""".stripMargin
    java.nio.file.Files.writeString(f, txt)
    f.toString
  }

  test("point counts follow the grid; points land inside their cells; deterministic") {
    val p = writeRaster()
    val pts = GraphReaders.readRaster(spark, p)
    val rows = pts.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.length == 7) // 2+0+1 + 0+3+1
    // Row 0 cells cover y in [0,1), row 1 cells y in [-1,0); cols cover [c, c+1).
    assert(rows.forall { case (x, y) => x >= 0.0 && x < 3.0 && y >= -1.0 && y < 1.0 })
    // Cell (0,0) has 2 points in [0,1)x[0,1).
    assert(rows.count { case (x, y) => x < 1.0 && y >= 0.0 } == 2)
    // Cell (1,1) has 3 points in [1,2)x[-1,0).
    assert(rows.count { case (x, y) => x >= 1.0 && x < 2.0 && y < 0.0 } == 3)
    val again = GraphReaders.readRaster(spark, p)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.toSet == again.toSet)
    // Normalization halves then HALF_UP-rounds the counts:
    // 2->1, 0->0, 1->1, 0->0, 3->2, 1->1 = 5 (std::round parity).
    assert(GraphReaders.readRaster(spark, p, 0.5).count() == 5)
  }
}
