package graft.cli

/** Radians → DMS ascii, a faithful port of the reference rtodms
  * (src/rtodms.cpp:38-95) with the set_rtodms(-w/-W) state held per
  * instance instead of process-global.
  *
  * Output grammar matches the C exactly, including its trailing-zero trim
  * quirks: seconds decimals are trimmed (59.821000→59.821, 3.000→3, and
  * even integral "30"→"3" with -w0, as the C does), zero seconds drop to
  * d°m', zero minutes to d° alone; `-W` (conWidth) switches to fixed-width
  * zero-padded fields and suppresses all trimming.
  */
final class Rtodms(fract: Int = 3, conWidth: Boolean = false) {
  private var res = 1000.0
  private var res60 = 60000.0
  private var conv = 206264806.24709635516
  private var prec = 3
  private var doLong = false

  set(fract, conWidth)

  /** set_rtodms (src/rtodms.cpp:19-37). */
  def set(fract: Int, conW: Boolean): Unit = {
    if (fract >= 0 && fract < 9) {
      res = 1.0
      var i = 0
      while (i < fract) { res *= 10.0; i += 1 }
      res60 = res * 60.0
      conv = 180.0 * 3600.0 * res / math.Pi
      prec = fract
      doLong = conW
    }
  }

  /** rtodms(r, pos, neg); pos/neg are the hemisphere suffix chars; pos = 0
    * means no suffix with a '-' prefix for negatives. */
  def format(r0: Double, pos: Char, neg: Char): String = {
    var r = r0
    var sign: Char = 0
    val sb = new StringBuilder
    if (r < 0) {
      r = -r
      if (pos == 0) { sb.append('-'); sign = 0 }
      else sign = neg
    } else sign = pos

    r = math.floor(r * conv + 0.5)
    val sec = (r / res) % 60.0
    r = math.floor(r / res60)
    val min = (r % 60.0).toInt
    r = math.floor(r / 60.0)
    val deg = r.toInt

    if (doLong) {
      // "%dd%02d'%0<w>.<prec>f\"%c" with w = prec + 2 + (prec ? 1 : 0)
      val w = prec + 2 + (if (prec != 0) 1 else 0)
      val s = CFormat.format(CFormat.Spec(plus = false, zeroPad = true,
        width = w, prec = prec, conv = 'f'), sec)
      sb.append(deg).append('d').append(f"$min%02d").append('\'')
        .append(s).append('"')
      if (sign != 0) sb.append(sign)
    } else if (sec != 0.0) {
      var s = CFormat.format(CFormat.Spec(plus = false, zeroPad = false,
        width = 0, prec = prec, conv = 'f'), sec)
      // exact port of the C trim loop (src/rtodms.cpp:70-90): strip
      // trailing zeros, and the '.' when all decimals were zero — which
      // also trims an integral "30" to "3" at -w0, like the C does
      var p = s.length - 1
      while (p >= 0 && s.charAt(p) == '0') p -= 1
      if (p < 0 || s.charAt(p) != '.') p += 1
      s = s.substring(0, p)
      sb.append(deg).append('d').append(min).append('\'').append(s).append('"')
      if (sign != 0) sb.append(sign)
    } else if (min != 0) {
      sb.append(deg).append('d').append(min).append('\'')
      if (sign != 0) sb.append(sign)
    } else {
      sb.append(deg).append('d')
      if (sign != 0) sb.append(sign)
    }
    sb.toString
  }
}
