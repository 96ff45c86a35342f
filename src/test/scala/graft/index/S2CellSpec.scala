package graft.index

import org.scalatest.funsuite.AnyFunSuite

class S2CellSpec extends AnyFunSuite {
  val pts = Seq(
    (0.0, 0.0), (12.0, 56.0), (-122.42, 37.77), (151.2, -33.87),
    (139.69, 35.69), (-43.2, -22.9), (179.99, 0.01), (-179.99, -0.01),
    (0.0, 89.99), (0.0, -89.99), (45.0, 45.0), (-135.0, 35.26))

  test("leaf ids are valid and level-extractable") {
    for ((lon, lat) <- pts) {
      val id = S2CellId.fromLonLatDeg(lon, lat)
      assert(S2CellId.isLeaf(id))
      assert(S2CellId.level(id) == 30)
      val f = S2CellId.face(id)
      assert(f >= 0 && f <= 5)
    }
  }

  test("cell center round-trips into the same cell") {
    for ((lon, lat) <- pts; lvl <- Seq(4, 8, 12, 16, 20)) {
      val id = S2CellId.cellId(lon, lat, lvl)
      assert(S2CellId.level(id) == lvl)
      val (clon, clat) = S2CellId.toLonLatDeg(id)
      val id2 = S2CellId.cellId(clon, clat, lvl)
      assert(id2 == id, s"center of $id at lvl $lvl mapped to $id2")
    }
  }

  test("parent ranges contain children") {
    for ((lon, lat) <- pts) {
      val leaf = S2CellId.fromLonLatDeg(lon, lat)
      for (lvl <- 0 to 29) {
        val p = S2CellId.parent(leaf, lvl)
        assert(S2CellId.rangeMin(p) <= leaf && leaf <= S2CellId.rangeMax(p))
        val c = S2CellId.parent(leaf, lvl + 1)
        assert(S2CellId.children(p).contains(c))
      }
    }
  }

  test("encode/decode faceIJ round-trip") {
    for ((lon, lat) <- pts) {
      val id = S2CellId.fromLonLatDeg(lon, lat)
      val (f, i, j, _) = S2CellId.toFaceIJ(id)
      assert(S2CellId.fromFaceIJ(f, i, j) == id)
    }
  }

  test("neighbors are distinct, same level, and near the cell") {
    for ((lon, lat) <- pts; lvl <- Seq(6, 10, 14)) {
      val id = S2CellId.cellId(lon, lat, lvl)
      val ns = S2CellId.allNeighbors(id)
      assert(ns.length >= 3 && ns.length <= 8, s"${ns.length} neighbors")
      assert(ns.distinct.length == ns.length)
      assert(!ns.contains(id))
      for (n <- ns) {
        assert(S2CellId.level(n) == lvl)
        val (nlon, nlat) = S2CellId.toLonLatDeg(n)
        val d = graft.core.Geodesic.WGS84.distance(lat, lon, nlat, nlon)
        // neighbor centers are within ~4 cell diagonals
        val cellScale = 6400e3 * math.Pi / (1 << lvl)
        assert(d < 6 * cellScale, s"neighbor too far: $d vs cell $cellScale")
      }
    }
  }

  test("ring expansion grows monotonically") {
    val id = S2CellId.cellId(12.0, 56.0, 10)
    val r0 = S2CellId.ringCells(id, 0)
    val r1 = S2CellId.ringCells(id, 1)
    val r2 = S2CellId.ringCells(id, 2)
    assert(r0.length == 1 && r1.length >= 8 && r2.length > r1.length)
    assert(r1.toSet.subsetOf(r2.toSet))
  }

  test("slippy tiles match the webmerc formulas") {
    assert(SlippyTile.tileX(0.0, 1) == 1 && SlippyTile.tileY(0.0, 1) == 1)
    // Greenwich at z=12
    assert(SlippyTile.tileX(-0.0015, 12) == 2047)
    val (minLon, minLat, maxLon, maxLat) = SlippyTile.tileBounds(12,
      SlippyTile.tileX(12.0, 12), SlippyTile.tileY(56.0, 12))
    assert(minLon <= 12.0 && 12.0 <= maxLon)
    assert(minLat <= 56.0 && 56.0 <= maxLat)
    val key = SlippyTile.tileKey(12.0, 56.0, 12)
    assert(SlippyTile.keyZ(key) == 12)
    assert(SlippyTile.keyX(key) == SlippyTile.tileX(12.0, 12))
    assert(SlippyTile.keyY(key) == SlippyTile.tileY(56.0, 12))
  }
}
