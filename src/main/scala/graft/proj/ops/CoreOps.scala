package graft.proj.ops

import graft.core.{Coord, GeoMath, ProjErr, ProjError}
import graft.proj._
import GeoMath._
import OpKernel._

/** Identity / tag conversions and the core coordinate-kind conversions.
  *
  * Semantics follow the reference implementations (cited per op); the code
  * is an independent Scala expression of the same public math.
  */
object CoreOps {

  /** noop — identity (reference src/conversions/noop.cpp:5). */
  def noop(P: PJ): Unit = {
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      override def fwd4(c: Coord): Unit = ()
      override def inv4(c: Coord): Unit = ()
    }
    P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER
  }

  /** latlong/longlat/latlon/lonlat — tagged identity
    * (reference src/projections/latlong.cpp:34-99). */
  def latlong(P: PJ): Unit = {
    P.isLatlong = true
    P.x0 = 0; P.y0 = 0
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2 | FWD3 | INV3 | FWD4 | INV4
      override def fwd2(c: Coord): Unit = ()
      override def inv2(c: Coord): Unit = ()
      override def fwd3(c: Coord): Unit = ()
      override def inv3(c: Coord): Unit = ()
      override def fwd4(c: Coord): Unit = ()
      override def inv4(c: Coord): Unit = ()
    }
  }

  /** geocent — tag-only geocentric passthrough
    * (reference src/conversions/geocent.cpp:33-60). The actual conversion is
    * done by the cart sub-operation installed in fwd/inv finalize. */
  def geocent(P: PJ): Unit = {
    P.isGeocent = true
    P.x0 = 0; P.y0 = 0
    P.left = IOUnits.RADIANS; P.right = IOUnits.CARTESIAN
    P.kernel = new OpKernel {
      val caps = FWD2 | INV2
      override def fwd2(c: Coord): Unit = ()
      override def inv2(c: Coord): Unit = ()
    }
    // the geodetic<->cartesian conversion runs as a sub-op (cs2cs-emu style)
    val sub = Proj.create(new ParamList(Vector(
      "proj" -> "cart",
      "a" -> P.a.toString, "es" -> P.es.toString)))
    sub.skipFwdPrepare = true; sub.skipFwdFinalize = true
    sub.skipInvPrepare = true; sub.skipInvFinalize = true
    P.cartSub = sub
  }

  /** geoc — geodetic ⇄ geocentric latitude
    * (reference src/conversions/geoc.cpp:34-85). */
  def geoc(P: PJ): Unit = {
    P.isLatlong = true
    P.left = IOUnits.RADIANS; P.right = IOUnits.RADIANS
    val oneEs = P.oneEs; val rOneEs = P.rOneEs; val es = P.es
    val limit = HALFPI - 1e-9
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      override def fwd4(c: Coord): Unit = {
        if (!(c.y > limit || c.y < -limit || es == 0))
          c.y = math.atan(oneEs * math.tan(c.y))
      }
      override def inv4(c: Coord): Unit = {
        if (!(c.y > limit || c.y < -limit || es == 0))
          c.y = math.atan(rOneEs * math.tan(c.y))
      }
    }
  }

  /** cart — geodetic (λ,φ,h) ⇄ geocentric (X,Y,Z)
    * (reference src/conversions/cart.cpp:139-239; Bowring 1976 inverse with
    * polar guard). */
  def cart(P: PJ): Unit = {
    P.left = IOUnits.RADIANS; P.right = IOUnits.CARTESIAN
    val a = P.a; val es = P.es; val ra = P.ra; val f = P.f
    val e2s = P.e2s
    P.kernel = new OpKernel {
      val caps = FWD3 | INV3

      @inline private def normalRadius(sinphi: Double): Double =
        if (es == 0) a else a / math.sqrt(1 - es * sinphi * sinphi)

      override def fwd3(c: Coord): Unit = {
        val cosphi = math.cos(c.y)
        val sinphi = math.sin(c.y)
        val nr = normalRadius(sinphi)
        val lam = c.x; val h = c.z
        c.x = (nr + h) * cosphi * math.cos(lam)
        c.y = (nr + h) * cosphi * math.sin(lam)
        c.z = (nr * (1 - es) + h) * sinphi
      }

      override def inv3(c: Coord): Unit = {
        val xDivA = c.x * ra
        val yDivA = c.y * ra
        val zDivA = c.z * ra
        val pDivA = math.sqrt(xDivA * xDivA + yDivA * yDivA)
        val bDivA = 1 - f
        val pb = pDivA * bDivA
        val norm = math.sqrt(zDivA * zDivA + pb * pb)
        var cth = 1.0; var sth = 0.0
        if (norm != 0) { val inv = 1.0 / norm; cth = pb * inv; sth = zDivA * inv }
        val yPhi = zDivA + e2s * bDivA * sth * sth * sth
        val xPhi = pDivA - es * cth * cth * cth
        val normPhi = math.sqrt(yPhi * yPhi + xPhi * xPhi)
        var cosphi = 1.0; var sinphi = 0.0
        if (normPhi != 0) { val inv = 1.0 / normPhi; cosphi = xPhi * inv; sinphi = yPhi * inv }
        var phi = 0.0
        val zIn = c.z
        if (xPhi <= 0) {
          // degenerate near the geocenter: clamp to the poles
          phi = if (zIn >= 0) HALFPI else -HALFPI
          cosphi = 0; sinphi = if (zIn >= 0) 1 else -1
        } else phi = math.atan(yPhi / xPhi)
        val lam = math.atan2(yDivA, xDivA)
        val h =
          if (cosphi < 1e-6) {
            // poleward of ~89.99994 deg: use geocentric radius for the height
            val ba2 = bDivA * bDivA
            val c2 = cosphi * cosphi; val s2 = sinphi * sinphi
            val r = a * math.sqrt((c2 + ba2 * ba2 * s2) / (c2 + ba2 * s2))
            math.abs(zIn) - r
          } else a * pDivA / cosphi - normalRadius(sinphi)
        c.x = lam; c.y = phi; c.z = h
      }
    }
  }

  /** axisswap — reorder/negate axes (reference src/conversions/axisswap.cpp).
    */
  def axisswap(P: PJ): Unit = {
    val params = P.params
    val hasOrder = params.has("order"); val hasAxis = params.has("axis")
    if (hasOrder == hasAxis)
      throw ProjError(ProjErr.INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS,
        "axisswap: provide EITHER order OR axis")
    val axis = Array(4, 5, 6, 7) // deliberately invalid to catch dup check
    val sign = Array(1, 1, 1, 1)
    var n = 0
    if (hasOrder) {
      val order = params.s("order").get
      if (!order.forall(c => "1234-,".contains(c)))
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"axisswap: unknown axis in $order")
      val parts = order.split(",").filter(_.nonEmpty)
      for (p <- parts if n < 4) {
        val v = try p.toInt catch { case _: NumberFormatException =>
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"axisswap: bad order token $p") }
        axis(n) = math.abs(v) - 1
        if (axis(n) > 3 || axis(n) < 0)
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"axisswap: invalid axis $v")
        sign(n) = if (v > 0) 1 else if (v < 0) -1 else 0
        n += 1
      }
    } else {
      val ax = params.s("axis").get
      if (ax.length != 3)
        throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "axisswap: invalid axis spec")
      var i = 0
      while (i < 3) {
        ax.charAt(i) match {
          case 'w' => sign(i) = -1; axis(i) = 0
          case 'e' => sign(i) = 1; axis(i) = 0
          case 's' => sign(i) = -1; axis(i) = 1
          case 'n' => sign(i) = 1; axis(i) = 1
          case 'd' => sign(i) = -1; axis(i) = 2
          case 'u' => sign(i) = 1; axis(i) = 2
          case c => throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"axisswap: unknown axis '$c'")
        }
        i += 1
      }
      n = 3
    }
    // duplicate axes check
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) {
        if (i != j && axis(i) == axis(j))
          throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "axisswap: duplicate axes")
        j += 1
      }
      i += 1
    }
    val nf = n
    if (nf == 3 && !(axis(0) < 3 && axis(1) < 3 && axis(2) < 3))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "axisswap: 3-axis spec must use axes 1-3")
    if (nf == 2 && !(axis(0) < 2 && axis(1) < 2))
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "axisswap: 2-axis spec must use axes 1-2")
    P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      // kernels must be stateless: expressions may be shared across executor
      // threads in local mode, so scratch space lives on the stack
      override def fwd4(c: Coord): Unit = {
        val in = new Array[Double](4)
        in(0) = c.x; in(1) = c.y; in(2) = c.z; in(3) = c.t
        nf match {
          case 2 =>
            c.x = in(axis(0)) * sign(0)
            c.y = in(axis(1)) * sign(1)
          case 3 =>
            c.x = in(axis(0)) * sign(0)
            c.y = in(axis(1)) * sign(1)
            c.z = in(axis(2)) * sign(2)
          case _ =>
            c.x = in(axis(0)) * sign(0)
            c.y = in(axis(1)) * sign(1)
            c.z = in(axis(2)) * sign(2)
            c.t = in(axis(3)) * sign(3)
        }
      }
      override def inv4(c: Coord): Unit = {
        val in = new Array[Double](4)
        in(0) = c.x; in(1) = c.y; in(2) = c.z; in(3) = c.t
        val out = new Array[Double](4)
        out(0) = c.x; out(1) = c.y; out(2) = c.z; out(3) = c.t
        var i = 0
        while (i < nf) { out(axis(i)) = in(i) * sign(i); i += 1 }
        c.x = out(0); c.y = out(1)
        if (nf >= 3) c.z = out(2)
        if (nf >= 4) c.t = out(3)
      }
    }
  }

  /** set — overwrite selected components with constants
    * (reference src/conversions/set.cpp:6-75). */
  def set(P: PJ): Unit = {
    val params = P.params
    val has = Array("v_1", "v_2", "v_3", "v_4").map(params.has)
    val v = Array("v_1", "v_2", "v_3", "v_4").map(k => params.d(k))
    P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      private def apply(c: Coord): Unit = {
        if (has(0)) c.x = v(0)
        if (has(1)) c.y = v(1)
        if (has(2)) c.z = v(2)
        if (has(3)) c.t = v(3)
      }
      override def fwd4(c: Coord): Unit = apply(c)
      override def inv4(c: Coord): Unit = apply(c)
    }
  }

  /** unitconvert — linear, vertical and time unit conversions
    * (reference src/conversions/unitconvert.cpp:74-595). */
  def unitconvert(P: PJ): Unit = {
    val params = P.params
    P.skipFwdPrepare = true; P.skipInvPrepare = true
    P.left = IOUnits.WHATEVER; P.right = IOUnits.WHATEVER

    // returns (factor, isLinear: Option[Boolean], normalizedAngular: Option[String])
    def unitFactor(name: String): Option[(Double, Boolean, String)] =
      Units.linear.get(name).map(f => (f, true, "")).orElse(
        Units.angular.get(name).map(f => (f, false, name)))

    var xyFactor = 1.0; var zFactor = 1.0
    var xyInLinear = -1; var xyOutLinear = -1
    var zInLinear = -1; var zOutLinear = -1

    params.s("xy_in").foreach { name =>
      unitFactor(name) match {
        case Some((f, lin, ang)) =>
          xyFactor = f; xyInLinear = if (lin) 1 else 0
          if (ang == "rad") P.left = IOUnits.RADIANS
          if (ang == "deg") P.left = IOUnits.DEGREES
        case None =>
          val f = params.d("xy_in")
          if (f == 0.0 || 1.0 / f == 0.0)
            throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "unknown xy_in unit")
          xyFactor = f
      }
    }
    params.s("xy_out").foreach { name =>
      unitFactor(name) match {
        case Some((f, lin, ang)) =>
          xyFactor /= f; xyOutLinear = if (lin) 1 else 0
          if (ang == "rad") P.right = IOUnits.RADIANS
          if (ang == "deg") P.right = IOUnits.DEGREES
        case None =>
          val f = params.d("xy_out")
          if (f == 0.0 || 1.0 / f == 0.0)
            throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "unknown xy_out unit")
          xyFactor /= f
      }
    }
    if (xyInLinear >= 0 && xyOutLinear >= 0 && xyInLinear != xyOutLinear)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "inconsistent unit type between xy_in and xy_out")
    params.s("z_in").foreach { name =>
      unitFactor(name) match {
        case Some((f, lin, _)) => zFactor = f; zInLinear = if (lin) 1 else 0
        case None =>
          val f = params.d("z_in")
          if (f == 0.0 || 1.0 / f == 0.0)
            throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "unknown z_in unit")
          zFactor = f
      }
    }
    params.s("z_out").foreach { name =>
      unitFactor(name) match {
        case Some((f, lin, _)) => zFactor /= f; zOutLinear = if (lin) 1 else 0
        case None =>
          val f = params.d("z_out")
          if (f == 0.0 || 1.0 / f == 0.0)
            throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, "unknown z_out unit")
          zFactor /= f
      }
    }
    if (zInLinear >= 0 && zOutLinear >= 0 && zInLinear != zOutLinear)
      throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE,
        "inconsistent unit type between z_in and z_out")

    val timeIds = Seq("mjd", "decimalyear", "gps_week", "yyyymmdd")
    def timeId(key: String): Int = params.s(key) match {
      case Some(name) =>
        val i = timeIds.indexOf(name)
        if (i < 0) throw ProjError(ProjErr.INVALID_OP_ILLEGAL_ARG_VALUE, s"unknown $key unit")
        i
      case None => -1
    }
    val tIn = timeId("t_in")
    val tOut = timeId("t_out")

    val xyF = xyFactor; val zF = zFactor
    P.kernel = new OpKernel {
      val caps = FWD4 | INV4
      override def fwd4(c: Coord): Unit = {
        c.x *= xyF; c.y *= xyF; c.z *= zF
        if (tIn >= 0) c.t = TimeUnits.toMjd(tIn, c.t)
        if (tOut >= 0) c.t = TimeUnits.fromMjd(tOut, c.t)
      }
      override def inv4(c: Coord): Unit = {
        c.x /= xyF; c.y /= xyF; c.z /= zF
        if (tOut >= 0) c.t = TimeUnits.toMjd(tOut, c.t)
        if (tIn >= 0) c.t = TimeUnits.fromMjd(tIn, c.t)
      }
    }
  }
}

/** Time-unit conversions to/from modified Julian date
  * (reference src/conversions/unitconvert.cpp:105-270). */
object TimeUnits {
  private def isLeap(year: Long): Boolean =
    (year % 4 == 0 && year % 100 != 0) || year % 400 == 0
  private def daysInYear(year: Long): Int = if (isLeap(year)) 366 else 365
  private val monthTable = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
  private def daysInMonth(year: Long, month0: Long): Int = {
    val m = math.min(12L, math.max(1L, month0))
    val d = monthTable((m - 1).toInt)
    if (isLeap(year) && m == 2) d + 1 else d
  }
  private def dayNumberInYear(year: Long, month0: Long, day0: Long): Int = {
    val m = math.min(12L, math.max(1L, month0))
    val day = math.min(daysInMonth(year, m).toLong, day0)
    var dn = 0L
    var i = 1L
    while (i < m) { dn += daysInMonth(year, i); i += 1 }
    (dn + day).toInt
  }

  def decimalyearToMjd(dy: Double): Double = {
    if (!(dy >= -10000 && dy <= 10000)) return 0
    val year = math.floor(dy).round
    val frac = dy - year
    var mjd = (year - 1859) * 365.0 + 14 + 31
    mjd += frac * daysInYear(year)
    var y = year - 1
    while (y > 1858) { if (isLeap(y)) mjd += 1; y -= 1 }
    mjd
  }

  def mjdToDecimalyear(mjd: Double): Double = {
    var mjdIter = (14 + 31).toDouble
    var year = 1859L
    while (mjd >= mjdIter) { mjdIter += daysInYear(year); year += 1 }
    year -= 1
    mjdIter -= daysInYear(year)
    year + (mjd - mjdIter) / daysInYear(year)
  }

  def gpsWeekToMjd(w: Double): Double = 44244.0 + w * 7.0
  def mjdToGpsWeek(mjd: Double): Double = (mjd - 44244.0) / 7.0

  def yyyymmddToMjd(v: Double): Double = {
    val year = math.floor(v / 10000).round
    val month = math.floor((v - year * 10000) / 100).round
    val day = math.floor(v - year * 10000 - month * 100).round
    var mjd = dayNumberInYear(year, month, day).toDouble
    var y = year - 1
    while (y > 1858) { mjd += daysInYear(y); y -= 1 }
    mjd + 13 + 31
  }

  def mjdToYyyymmdd(mjd: Double): Double = {
    var dateIter = 14 + 31
    var year = 1859L
    val date = math.round(mjd)
    while (date >= dateIter) { dateIter += daysInYear(year); year += 1 }
    year -= 1
    dateIter -= daysInYear(year)
    var month = 1L
    while (dateIter + daysInMonth(year, month) <= date) {
      dateIter += daysInMonth(year, month); month += 1
    }
    val day = date - dateIter + 1
    year * 10000.0 + month * 100.0 + day
  }

  /** id: 0=mjd 1=decimalyear 2=gps_week 3=yyyymmdd */
  def toMjd(id: Int, v: Double): Double = id match {
    case 0 => v
    case 1 => decimalyearToMjd(v)
    case 2 => gpsWeekToMjd(v)
    case _ => yyyymmddToMjd(v)
  }
  def fromMjd(id: Int, v: Double): Double = id match {
    case 0 => v
    case 1 => mjdToDecimalyear(v)
    case 2 => mjdToGpsWeek(v)
    case _ => mjdToYyyymmdd(v)
  }
}
