package graft.proj.ops

import graft.core.{Coord, GeoMath}
import graft.proj._
import GeoMath._
import OpKernel._

/** Interrupted composite projections: Goode homolosine (igh), its oceanic
  * view (igh_o), and interrupted Mollweide land/ocean (imoll, imoll_o).
  * Each is a set of sub-projections (spherical sinusoidal / Mollweide)
  * selected per zone with per-zone lam0/x0/y0 offsets and inverse validity
  * windows. Structure per reference src/projections/{igh,igh_o,imoll,
  * imoll_o}.cpp. */
object InterruptedOps {
  private final val EPS = 1e-10
  private def d(v: Double): Double = v * DEG2RAD
  private val PHI_BOUND = (40 + 44 / 60.0 + 11.8 / 3600.0) * DEG2RAD

  /** One sub-zone: kernel + offsets; fwd/inv mirror the reference's direct
    * kernel calls (no prepare/finalize on sub-projections). */
  private final class Zone(val k: OpKernel, val lam0: Double, var x0: Double, val y0: Double) {
    def fwd(c: Coord): Unit = {
      c.x -= lam0
      k.fwd2(c)
      c.x += x0; c.y += y0
    }
    def inv(c: Coord): Unit = {
      c.x -= x0; c.y -= y0
      k.inv2(c)
      c.x += lam0
    }
  }

  private def sinuKernel(): OpKernel = {
    val p = new PJ(ParamList.empty, "sinu"); p.es = 0
    PseudoCylOps.sinu(p); p.kernel
  }
  private def mollKernel(): OpKernel = {
    val p = new PJ(ParamList.empty, "moll"); p.es = 0
    PseudoCylOps.moll(p); p.kernel
  }

  private def fwdZone(z: Zone, lam: Double, phi: Double): (Double, Double) = {
    val c = new Coord
    c.set(lam, phi, 0, 0)
    z.fwd(c)
    (c.x, c.y)
  }

  private def install(P: PJ, zones: Array[Zone],
                      zoneFwd: (Double, Double) => Int,
                      zoneInv: (Double, Double) => Int,
                      okCheck: (Int, Double, Double) => Boolean): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = {
        val z = zoneFwd(c.x, c.y)
        zones(z - 1).fwd(c)
      }
      override def inv2(c: Coord): Unit = {
        var z = zoneInv(c.x, c.y)
        if (z != 0) {
          zones(z - 1).inv(c)
          if (!okCheck(z, c.x, c.y)) z = 0
        }
        if (z == 0) {
          c.x = Double.PositiveInfinity
          c.y = Double.PositiveInfinity
        }
      }
    }
  }

  // -------------------------------------------------- igh

  def igh(P: PJ): Unit = {
    val sinus = Array.fill(6)(sinuKernel())
    val molls = Array.fill(6)(mollKernel())
    val zones = new Array[Zone](12)
    // sinusoidal zones 3..8 (reference igh.cpp setup)
    zones(2) = new Zone(sinus(0), -d(100), -d(100), 0)
    zones(3) = new Zone(sinus(1), d(30), d(30), 0)
    zones(4) = new Zone(sinus(2), -d(160), -d(160), 0)
    zones(5) = new Zone(sinus(3), -d(60), -d(60), 0)
    zones(6) = new Zone(sinus(4), d(20), d(20), 0)
    zones(7) = new Zone(sinus(5), d(140), d(140), 0)
    // mollweide zone 1 first, to compute dy0
    zones(0) = new Zone(molls(0), -d(100), -d(100), 0)
    val y1 = fwdZone(zones(0), -d(100), PHI_BOUND)._2
    val y3 = fwdZone(zones(2), -d(100), PHI_BOUND)._2
    val dy0 = y3 - y1
    val zones0 = new Zone(molls(0), -d(100), -d(100), dy0)
    zones(0) = zones0
    zones(1) = new Zone(molls(1), d(30), d(30), dy0)
    zones(8) = new Zone(molls(2), -d(160), -d(160), -dy0)
    zones(9) = new Zone(molls(3), -d(60), -d(60), -dy0)
    zones(10) = new Zone(molls(4), d(20), d(20), -dy0)
    zones(11) = new Zone(molls(5), d(140), d(140), -dy0)

    val y90 = dy0 + math.sqrt(2.0)
    def zf(lam: Double, phi: Double): Int =
      if (phi >= PHI_BOUND) { if (lam <= -d(40)) 1 else 2 }
      else if (phi >= 0) { if (lam <= -d(40)) 3 else 4 }
      else if (phi >= -PHI_BOUND) {
        if (lam <= -d(100)) 5 else if (lam <= -d(20)) 6 else if (lam <= d(80)) 7 else 8
      } else {
        if (lam <= -d(100)) 9 else if (lam <= -d(20)) 10 else if (lam <= d(80)) 11 else 12
      }
    def zi(x: Double, y: Double): Int =
      if (y > y90 + EPS || y < -y90 + EPS) 0
      else if (y >= PHI_BOUND) { if (x <= -d(40)) 1 else 2 }
      else if (y >= 0) { if (x <= -d(40)) 3 else 4 }
      else if (y >= -PHI_BOUND) {
        if (x <= -d(100)) 5 else if (x <= -d(20)) 6 else if (x <= d(80)) 7 else 8
      } else {
        if (x <= -d(100)) 9 else if (x <= -d(20)) 10 else if (x <= d(80)) 11 else 12
      }
    def ok(z: Int, lam: Double, phi: Double): Boolean = z match {
      case 1 => (lam >= -d(180) - EPS && lam <= -d(40) + EPS) ||
        ((lam >= -d(40) - EPS && lam <= -d(10) + EPS) && (phi >= d(60) - EPS && phi <= d(90) + EPS))
      case 2 => (lam >= -d(40) - EPS && lam <= d(180) + EPS) ||
        ((lam >= -d(180) - EPS && lam <= -d(160) + EPS) && (phi >= d(50) - EPS && phi <= d(90) + EPS)) ||
        ((lam >= -d(50) - EPS && lam <= -d(40) + EPS) && (phi >= d(60) - EPS && phi <= d(90) + EPS))
      case 3 => lam >= -d(180) - EPS && lam <= -d(40) + EPS
      case 4 => lam >= -d(40) - EPS && lam <= d(180) + EPS
      case 5 | 9 => lam >= -d(180) - EPS && lam <= -d(100) + EPS
      case 6 | 10 => lam >= -d(100) - EPS && lam <= -d(20) + EPS
      case 7 | 11 => lam >= -d(20) - EPS && lam <= d(80) + EPS
      case _ => lam >= d(80) - EPS && lam <= d(180) + EPS
    }
    install(P, zones, zf, zi, ok)
  }

  // -------------------------------------------------- igh_o

  def ighO(P: PJ): Unit = {
    val zones = new Array[Zone](12)
    zones(3) = new Zone(sinuKernel(), -d(140), -d(140), 0)
    zones(4) = new Zone(sinuKernel(), -d(10), -d(10), 0)
    zones(5) = new Zone(sinuKernel(), d(130), d(130), 0)
    zones(6) = new Zone(sinuKernel(), -d(110), -d(110), 0)
    zones(7) = new Zone(sinuKernel(), d(20), d(20), 0)
    zones(8) = new Zone(sinuKernel(), d(150), d(150), 0)
    zones(0) = new Zone(mollKernel(), -d(140), -d(140), 0)
    val y1 = fwdZone(zones(0), -d(140), PHI_BOUND)._2
    val y4 = fwdZone(zones(3), -d(140), PHI_BOUND)._2
    val dy0 = y4 - y1
    zones(0) = new Zone(mollKernel(), -d(140), -d(140), dy0)
    zones(1) = new Zone(mollKernel(), -d(10), -d(10), dy0)
    zones(2) = new Zone(mollKernel(), d(130), d(130), dy0)
    zones(9) = new Zone(mollKernel(), -d(110), -d(110), -dy0)
    zones(10) = new Zone(mollKernel(), d(20), d(20), -dy0)
    zones(11) = new Zone(mollKernel(), d(150), d(150), -dy0)

    val y90 = dy0 + math.sqrt(2.0)
    def zf(lam: Double, phi: Double): Int =
      if (phi >= PHI_BOUND) { if (lam <= -d(90)) 1 else if (lam >= d(60)) 3 else 2 }
      else if (phi >= 0) { if (lam <= -d(90)) 4 else if (lam >= d(60)) 6 else 5 }
      else if (phi >= -PHI_BOUND) { if (lam <= -d(60)) 7 else if (lam >= d(90)) 9 else 8 }
      else { if (lam <= -d(60)) 10 else if (lam >= d(90)) 12 else 11 }
    def zi(x: Double, y: Double): Int =
      if (y > y90 + EPS || y < -y90 + EPS) 0
      else if (y >= PHI_BOUND) { if (x <= -d(90)) 1 else if (x >= d(60)) 3 else 2 }
      else if (y >= 0) { if (x <= -d(90)) 4 else if (x >= d(60)) 6 else 5 }
      else if (y >= -PHI_BOUND) { if (x <= -d(60)) 7 else if (x >= d(90)) 9 else 8 }
      else { if (x <= -d(60)) 10 else if (x >= d(90)) 12 else 11 }
    def ok(z: Int, lam: Double, phi: Double): Boolean = z match {
      case 1 => (lam >= -d(180) - EPS && lam <= -d(90) + EPS) ||
        ((lam >= d(160) - EPS && lam <= d(180) + EPS) && (phi >= d(50) - EPS && phi <= d(90) + EPS))
      case 2 => lam >= -d(90) - EPS && lam <= d(60) + EPS
      case 3 => (lam >= d(60) - EPS && lam <= d(180) + EPS) ||
        ((lam >= -d(180) - EPS && lam <= -d(160) + EPS) && (phi >= d(50) - EPS && phi <= d(90) + EPS))
      case 4 => lam >= -d(180) - EPS && lam <= -d(90) + EPS
      case 5 => lam >= -d(90) - EPS && lam <= d(60) + EPS
      case 6 => lam >= d(60) - EPS && lam <= d(180) + EPS
      case 7 | 10 => lam >= -d(180) - EPS && lam <= -d(60) + EPS
      case 8 | 11 => lam >= -d(60) - EPS && lam <= d(90) + EPS
      case _ => lam >= d(90) - EPS && lam <= d(180) + EPS
    }
    install(P, zones, zf, zi, ok)
  }

  // -------------------------------------------------- imoll / imoll_o

  private def zoneOffsetX(zones: Array[Zone], z1: Int, z2: Int,
                          lam: Double, phi1: Double, phi2: Double): Double = {
    val a = fwdZone(zones(z1 - 1), lam, phi1)
    val b = fwdZone(zones(z2 - 1), lam, phi2)
    b._1 - a._1
  }

  def imoll(P: PJ): Unit = {
    val zones = Array(
      new Zone(mollKernel(), -d(100), -d(100), 0),
      new Zone(mollKernel(), d(30), d(30), 0),
      new Zone(mollKernel(), -d(160), -d(160), 0),
      new Zone(mollKernel(), -d(60), -d(60), 0),
      new Zone(mollKernel(), d(20), d(20), 0),
      new Zone(mollKernel(), d(140), d(140), 0))
    zones(2).x0 += zoneOffsetX(zones, 3, 1, -d(160), -EPS, EPS)
    zones(1).x0 += zoneOffsetX(zones, 2, 1, -d(40), EPS, EPS)
    zones(3).x0 += zoneOffsetX(zones, 4, 1, -d(100), -EPS, EPS)
    zones(4).x0 += zoneOffsetX(zones, 5, 2, -d(20), -EPS, EPS)
    zones(5).x0 += zoneOffsetX(zones, 6, 2, d(80), -EPS, EPS)

    def zfRaw(lam: Double, phi: Double): Int =
      if (phi >= 0) { if (lam <= -d(40)) 1 else 2 }
      else {
        if (lam <= -d(100)) 3 else if (lam <= -d(20)) 4 else if (lam <= d(80)) 5 else 6
      }
    def seam(lam: Double, phi: Double): Double = {
      val a = fwdZone(zones(zfRaw(lam - EPS, phi) - 1), lam - EPS, phi)._1
      val b = fwdZone(zones(zfRaw(lam + EPS, phi) - 1), lam + EPS, phi)._1
      (a + b) / 2
    }
    val b12 = seam(-d(40), EPS)
    val b34 = seam(-d(100), -EPS)
    val b45 = seam(-d(20), -EPS)
    val b56 = seam(d(80), -EPS)
    val y90 = math.sqrt(2.0)

    def zi(x: Double, y: Double): Int =
      if (y > y90 + EPS || y < -y90 + EPS) 0
      else if (y >= 0) { if (x <= b12) 1 else 2 }
      else { if (x <= b34) 3 else if (x <= b45) 4 else if (x <= b56) 5 else 6 }
    def ok(z: Int, lam: Double, phi: Double): Boolean = z match {
      case 1 => lam >= -d(180) - EPS && lam <= -d(40) + EPS && phi >= -EPS
      case 2 => lam >= -d(40) - EPS && lam <= d(180) + EPS && phi >= -EPS
      case 3 => lam >= -d(180) - EPS && lam <= -d(100) + EPS && phi <= EPS
      case 4 => lam >= -d(100) - EPS && lam <= -d(20) + EPS && phi <= EPS
      case 5 => lam >= -d(20) - EPS && lam <= d(80) + EPS && phi <= EPS
      case _ => lam >= d(80) - EPS && lam <= d(180) + EPS && phi <= EPS
    }
    install(P, zones, zfRaw, zi, ok)
  }

  def imollO(P: PJ): Unit = {
    val zones = Array(
      new Zone(mollKernel(), -d(140), -d(140), 0),
      new Zone(mollKernel(), -d(10), -d(10), 0),
      new Zone(mollKernel(), d(130), d(130), 0),
      new Zone(mollKernel(), -d(110), -d(110), 0),
      new Zone(mollKernel(), d(20), d(20), 0),
      new Zone(mollKernel(), d(150), d(150), 0))
    zones(1).x0 += zoneOffsetX(zones, 2, 1, -d(90), EPS, EPS)
    zones(2).x0 += zoneOffsetX(zones, 3, 2, d(60), EPS, EPS)
    zones(3).x0 += zoneOffsetX(zones, 4, 1, -d(180), -EPS, EPS)
    zones(4).x0 += zoneOffsetX(zones, 5, 2, -d(60), -EPS, EPS)
    zones(5).x0 += zoneOffsetX(zones, 6, 3, d(90), -EPS, EPS)

    def zfRaw(lam: Double, phi: Double): Int =
      if (phi >= 0) { if (lam <= -d(90)) 1 else if (lam >= d(60)) 3 else 2 }
      else { if (lam <= -d(60)) 4 else if (lam >= d(90)) 6 else 5 }
    def seam(lam: Double, phi: Double): Double = {
      val a = fwdZone(zones(zfRaw(lam - EPS, phi) - 1), lam - EPS, phi)._1
      val b = fwdZone(zones(zfRaw(lam + EPS, phi) - 1), lam + EPS, phi)._1
      (a + b) / 2
    }
    val b12 = seam(-d(90), EPS)
    val b23 = seam(d(60), EPS)
    val b45 = seam(-d(60), -EPS)
    val b56 = seam(d(90), -EPS)
    val y90 = math.sqrt(2.0)

    def zi(x: Double, y: Double): Int =
      if (y > y90 + EPS || y < -y90 + EPS) 0
      else if (y >= 0) { if (x <= b12) 1 else if (x >= b23) 3 else 2 }
      else { if (x <= b45) 4 else if (x >= b56) 6 else 5 }
    def ok(z: Int, lam: Double, phi: Double): Boolean = z match {
      case 1 => lam >= -d(180) - EPS && lam <= -d(90) + EPS && phi >= -EPS
      case 2 => lam >= -d(90) - EPS && lam <= d(60) + EPS && phi >= -EPS
      case 3 => lam >= d(60) - EPS && lam <= d(180) + EPS && phi >= -EPS
      case 4 => lam >= -d(180) - EPS && lam <= -d(60) + EPS && phi <= EPS
      case 5 => lam >= -d(60) - EPS && lam <= d(90) + EPS && phi <= EPS
      case _ => lam >= d(90) - EPS && lam <= d(180) + EPS && phi <= EPS
    }
    install(P, zones, zfRaw, zi, ok)
  }
}
