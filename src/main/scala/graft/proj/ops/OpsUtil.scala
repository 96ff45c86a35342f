package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr}
import GeoMath._

/** Shared numeric helpers for projection kernels. */
object OpsUtil {

  /** Generic 2D Newton inverse over a forward kernel, with finite-difference
    * Jacobian and clamped updates (reference pj_generic_inverse_2d,
    * src/inv.cpp). `fwd` maps (lam, phi) in c.(x,y) to projected (x,y). */
  def genericInverse2d(fwd: Coord => Unit, c: Coord,
                       lamInit: Double, phiInit: Double,
                       tol: Double): Boolean = {
    val targetX = c.x; val targetY = c.y
    var lam = lamInit; var phi = phiInit
    var dLamX = 0.0; var dLamY = 0.0; var dPhiX = 0.0; var dPhiY = 0.0
    val w = new Coord
    var i = 0
    while (i < 15) {
      w.set(lam, phi, 0, 0)
      fwd(w)
      val deltaX = w.x - targetX
      val deltaY = w.y - targetY
      if (math.abs(deltaX) < tol && math.abs(deltaY) < tol) {
        c.x = lam; c.y = phi; c.err = 0
        return true
      }
      if (i == 0 || math.abs(deltaX) > 1e-6 || math.abs(deltaY) > 1e-6) {
        val apx = w.x; val apy = w.y
        val dLam = if (lam > 0) -1e-6 else 1e-6
        w.set(lam + dLam, phi, 0, 0); fwd(w)
        val dXlam = (w.x - apx) / dLam
        val dYlam = (w.y - apy) / dLam
        val dPhi = if (phi > 0) -1e-6 else 1e-6
        w.set(lam, phi + dPhi, 0, 0); fwd(w)
        val dXphi = (w.x - apx) / dPhi
        val dYphi = (w.y - apy) / dPhi
        val det = dXlam * dYphi - dXphi * dYlam
        if (det != 0) {
          dLamX = dYphi / det
          dLamY = -dXphi / det
          dPhiX = -dYlam / det
          dPhiY = dXlam / det
        }
      }
      val deltaLam = math.max(math.min(deltaX * dLamX + deltaY * dLamY, 0.3), -0.3)
      lam -= deltaLam
      if (lam < -math.Pi) lam = -math.Pi else if (lam > math.Pi) lam = math.Pi
      val deltaPhi = math.max(math.min(deltaX * dPhiX + deltaY * dPhiY, 0.3), -0.3)
      phi -= deltaPhi
      if (phi < -HALFPI) phi = -HALFPI else if (phi > HALFPI) phi = HALFPI
      i += 1
    }
    c.x = lam; c.y = phi
    c.setError(ProjErr.COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN)
    false
  }
}
