package graft.proj

import graft.core.Coord
import OpFactory.Candidate

/** Per-point operation selection over a prepared candidate list — the
  * engine's mirror of the reference's proj_trans alternative-operation
  * protocol (reference src/trans.cpp:47-345): pick the best-accuracy
  * candidate whose area of use contains the point (smaller pseudo-area
  * breaking accuracy ties, onshore preferred over offshore), retry at most
  * twice on failure, fall back to the first gridless operation, and speak
  * the ONLY_BEST error/warn protocol with the reference's exact
  * missing-grid message text.
  */
final class OpRuntime(cands: Vector[Candidate],
                      onlyBestError: Boolean,
                      onlyBestWarn: Boolean,
                      /** error-level log (reaches stderr) */
                      logError: String => Unit,
                      /** debug-level log (PROJ_DEBUG >= 2) */
                      logDebug: String => Unit,
                      /** the warn-mode single-op protocol already warned at
                        * creation time: start with non-instantiable
                        * candidates skipped (reference crs_to_crs.cpp:609) */
                      startSkipNonInstantiable: Boolean = false) {

  private var warnPending = onlyBestWarn && !startSkipNonInstantiable
  private var iCur: Int = -1

  private val metas: Array[OpRuntime.CandMeta] =
    cands.iterator.map(OpRuntime.metaOf).toArray

  /** pj_get_suggested_operation: lonDeg/latDeg are the point in the source
    * CRS's geographic degrees. */
  private def suggest(lonDeg: Double, latDeg: Double,
                      excluded: Array[Int], skipNonInstantiable: Boolean): Int =
    OpRuntime.suggest(metas, lonDeg, latDeg, excluded(0), excluded(1),
      skipNonInstantiable)

  def missingGridMessage(c: Candidate): String = {
    val sb = new StringBuilder(s"Attempt to use coordinate operation ${c.name} failed.")
    // the reference enumerates gridsNeeded (an ordered set) — name order
    for ((g, avail) <- c.grids.sortBy(_._1) if !avail) {
      sb ++= s" Grid $g is not available. Consult " +
        "https://proj.org/resource_files.html for guidance."
    }
    sb.toString
  }

  private def warnAboutMissingGrid(c: Candidate): Unit = {
    var msg = missingGridMessage(c)
    if (!onlyBestError && warnPending) {
      msg += " This might become an error in a future PROJ major release. " +
        "Set the ONLY_BEST option to YES or NO. " +
        "This warning will no longer be emitted (for the current " +
        "transformation instance)."
      warnPending = false
    }
    if (onlyBestError) logError(msg) else logDebug(msg)
  }

  /** the name of the most recently used operation (for -v style output) */
  def currentName: Option[String] = if (iCur >= 0) Some(cands(iCur).name) else None

  /** transform `c` (source-CRS native form) in place; (lonDeg, latDeg) is
    * the same point in source geographic degrees for extent checks. Returns
    * false on failure (coord left in error state). */
  def trans(c: Coord, lonDeg: Double, latDeg: Double): Boolean = {
    val excluded = Array(-1, -1)
    // reference trans.cpp:237: skip = P->skipNonInstantiable && !warn &&
    // !error — in warn mode, once the one-shot warning is consumed, every
    // later point starts with non-instantiable candidates skipped
    var skipNonInstantiable = startSkipNonInstantiable ||
      (onlyBestWarn && !warnPending && !onlyBestError)
    var iRetry = 0
    while (iRetry <= 2) {
      val iBest = suggest(lonDeg, latDeg, excluded, skipNonInstantiable)
      if (iBest < 0) {
        // no extent match: fall through to the gridless fallback below
        return fallbackGridless(c)
      }
      val cand = cands(iBest)
      if (iCur != iBest) {
        // a single-op list is returned as a bare PJ by the reference
        // (crs_to_crs.cpp:760) — no alternative-operation logging
        if (cands.length > 1) logDebug(s"Using coordinate operation ${cand.name}")
        iCur = iBest
      }
      val saved = new Coord
      saved.copyFrom(c)
      var failed = false
      cand.pj match {
        case Right(pj) if cand.gridsAvailable =>
          Dispatch.fwd4d(pj, c)
          failed = c.isError
        case _ => failed = true
      }
      if (!failed) return true
      if (onlyBestError || warnPending) {
        warnAboutMissingGrid(cand)
        if (onlyBestError) {
          c.copyFrom(saved)
          c.setError(graft.core.ProjErr.COORD_TRANSFM_NO_OPERATION)
          return false
        }
        warnPending = false
        skipNonInstantiable = true
      }
      c.copyFrom(saved)
      if (iRetry == 2) return fallbackGridless(c)
      excluded(iRetry) = iBest
      iRetry += 1
    }
    fallbackGridless(c)
  }

  /** trans.cpp:305-345 — first operation that needs no grids, regardless of
    * extent. */
  private def fallbackGridless(c: Coord): Boolean = {
    var i = 0
    while (i < cands.length) {
      val cand = cands(i)
      if (!cand.hasGrids) {
        cand.pj match {
          case Right(pj) =>
            if (iCur != i) {
              logDebug(s"Using coordinate operation ${cand.name} as a " +
                "fallback due to lack of more appropriate operations")
              iCur = i
            }
            Dispatch.fwd4d(pj, c)
            return !c.isError
          case Left(_) => ()
        }
      }
      i += 1
    }
    c.setError(graft.core.ProjErr.COORD_TRANSFM_NO_OPERATION)
    false
  }
}

/** The pj_get_suggested_operation comparator over plain serializable
  * candidate facts — the single implementation shared by the CLI runtime
  * (OpRuntime, above) and the Spark per-row dispatch expression
  * (graft.spark.RegistryDispatch), so SQL `graft_crs_dispatch` and cs2cs
  * pick identical operations per point (reference src/trans.cpp:47-150).
  */
object OpRuntime {

  /** the per-candidate facts the comparator consults (plain data: safe to
    * ship to executors) */
  final case class CandMeta(
      /** extent boxes, flat [west, south, east, north]×k, geographic deg */
      boxes: Array[Double],
      /** raw accuracy in metres; < 0 = unknown */
      accuracy: Double,
      pseudoArea: Double,
      offshore: Boolean,
      unknownArea: Boolean,
      priority: Boolean,
      instantiable: Boolean,
      hasGrids: Boolean) extends Serializable

  def metaOf(c: Candidate): CandMeta = CandMeta(
    c.boxes.toArray.flatMap(b => Array(b.west, b.south, b.east, b.north)),
    c.accuracy, c.pseudoArea,
    offshore = c.areaName.contains("- offshore"),
    unknownArea = c.areaName.isEmpty || c.areaName == "unknown",
    priority = c.isPriorityOp,
    instantiable = c.instantiable,
    hasGrids = c.hasGrids)

  def normLon(x0: Double): Double = {
    var x = x0
    if (x > 180.0) { x -= 360.0; if (x > 180.0) x = ((x + 180.0) % 360.0) - 180.0 }
    else if (x < -180.0) { x += 360.0; if (x < -180.0) x = ((x + 180.0) % 360.0) - 180.0 }
    x
  }

  /** Best candidate for the point, or -1 when no extent matches. The first
    * extent match is taken unconditionally; a later candidate displaces it
    * only when onshore AND (strictly better known accuracy, or same-accuracy
    * smaller-area without an unknown-area candidate displacing a known-area
    * one or anything displacing a priority null-transform). */
  def suggest(metas: Array[CandMeta], lonDeg: Double, latDeg: Double,
              ex0: Int, ex1: Int, skipNonInstantiable: Boolean): Int = {
    val lon = normLon(lonDeg)
    var iBest = -1
    var bestAccuracy = Double.MaxValue
    var i = 0
    while (i < metas.length) {
      if (i != ex0 && i != ex1) {
        val c = metas(i)
        var ok = false
        var j = 0
        while (j < c.boxes.length && !ok) {
          ok = latDeg >= c.boxes(j + 1) && latDeg <= c.boxes(j + 3) &&
            lon >= c.boxes(j) && lon <= c.boxes(j + 2)
          j += 4
        }
        if (ok) {
          val better = iBest < 0 ||
            (((c.accuracy >= 0 && c.accuracy < bestAccuracy) ||
              (c.accuracy == bestAccuracy &&
                c.pseudoArea < metas(iBest).pseudoArea &&
                !(c.unknownArea && !metas(iBest).unknownArea) &&
                !metas(iBest).priority)) &&
              !c.offshore)
          if (better && !(skipNonInstantiable && !c.instantiable)) {
            iBest = i
            bestAccuracy = c.accuracy
          }
        }
      }
      i += 1
    }
    iBest
  }
}
