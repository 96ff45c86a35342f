package graft.cli

import java.math.{BigDecimal => JBig, MathContext, RoundingMode}

/** C-printf-compatible formatting for one double, covering exactly the
  * subset the reference CLI apps accept (`%[+]?[0-9]*[.]?[0-9]*[eEfFgG]`,
  * reference src/apps/utils.cpp validate_form_string_for_numbers:34-58 and
  * limited_fprintf_for_number:128-180).
  *
  * Semantics follow glibc printf rather than java.util.Formatter: rounding
  * is round-half-to-even of the EXACT binary value of the double (Java's %f
  * uses HALF_UP, which differs on exact decimal ties), infinities print as
  * "inf"/"-inf", and %g strips trailing zeros.
  */
object CFormat {

  final case class Spec(plus: Boolean, zeroPad: Boolean, width: Int,
                        prec: Int, conv: Char)

  /** Parse the accepted subset; None mirrors the reference's
    * validate_form_string_for_numbers returning false. */
  def parse(fmt: String): Option[Spec] = {
    if (fmt.length < 2 || fmt.charAt(0) != '%') return None
    var i = 1
    var plus = false
    if (fmt.charAt(i) == '+') { plus = true; i += 1 }
    val zeroPad = i < fmt.length && fmt.charAt(i) == '0'
    var width = 0
    while (i < fmt.length && fmt.charAt(i).isDigit) { width = width * 10 + (fmt.charAt(i) - '0'); i += 1 }
    var prec = -1
    if (i < fmt.length && fmt.charAt(i) == '.') {
      i += 1
      prec = 0
      var any = false
      while (i < fmt.length && fmt.charAt(i).isDigit) { prec = prec * 10 + (fmt.charAt(i) - '0'); i += 1; any = true }
      if (!any) prec = 0 // "%." means precision 0 in C
    }
    if (i != fmt.length - 1) return None
    val conv = fmt.charAt(i)
    if ("eEfFgG".indexOf(conv) < 0) return None
    Some(Spec(plus, zeroPad, width, prec, conv))
  }

  def format(fmt: String, v: Double): String =
    parse(fmt) match {
      case Some(spec) => format(spec, v)
      case None => fmt // mirrors printf leaving a bad format mostly verbatim
    }

  def format(spec: Spec, v: Double): String = {
    val upper = spec.conv.isUpper
    val body: String =
      if (v.isNaN) if (upper) "NAN" else "nan"
      else if (v.isInfinite) {
        val s = if (upper) "INF" else "inf"
        if (v < 0) "-" + s else if (spec.plus) "+" + s else s
      } else {
        val neg = v < 0 || (v == 0.0 && 1.0 / v < 0)
        val digits = spec.conv.toLower match {
          case 'f' => fDigits(math.abs(v), if (spec.prec < 0) 6 else spec.prec)
          case 'e' => eDigits(math.abs(v), if (spec.prec < 0) 6 else spec.prec, upper)
          case 'g' => gDigits(math.abs(v), if (spec.prec < 0) 6 else spec.prec, upper)
        }
        if (neg) "-" + digits else if (spec.plus) "+" + digits else digits
      }
    pad(body, spec, numeric = !v.isNaN && !v.isInfinite)
  }

  private def pad(body: String, spec: Spec, numeric: Boolean): String = {
    if (body.length >= spec.width) body
    else if (spec.zeroPad && numeric) {
      val signLen = if (body.nonEmpty && (body.charAt(0) == '-' || body.charAt(0) == '+')) 1 else 0
      body.substring(0, signLen) + ("0" * (spec.width - body.length)) + body.substring(signLen)
    } else (" " * (spec.width - body.length)) + body
  }

  /** %f body of a non-negative finite value: exact binary rounded
    * half-to-even at `prec` decimals. */
  private def fDigits(a: Double, prec: Int): String =
    new JBig(a).setScale(prec, RoundingMode.HALF_EVEN).toPlainString

  /** %e body: d.ddd e±XX with at least two exponent digits. */
  private def eDigits(a: Double, prec: Int, upper: Boolean): String = {
    val e = if (upper) "E" else "e"
    if (a == 0.0) {
      val m = if (prec == 0) "0" else "0." + ("0" * prec)
      return s"$m${e}+00"
    }
    val bd = new JBig(a).round(new MathContext(prec + 1, RoundingMode.HALF_EVEN))
    val exp = bd.precision - bd.scale - 1
    val mant = bd.movePointLeft(exp).setScale(prec, RoundingMode.HALF_EVEN)
    val sign = if (exp < 0) "-" else "+"
    f"${mant.toPlainString}$e$sign${math.abs(exp)}%02d"
  }

  /** %g body: C99 rules — P = prec (0 → 1); exponent X of the value rounded
    * to P significant digits picks %f (−4 ≤ X < P, precision P−1−X) or %e
    * (precision P−1); trailing zeros then removed. */
  private def gDigits(a: Double, prec0: Int, upper: Boolean): String = {
    val p = if (prec0 == 0) 1 else prec0
    if (a == 0.0) return "0"
    val r = new JBig(a).round(new MathContext(p, RoundingMode.HALF_EVEN))
    val x = r.precision - r.scale - 1
    if (x >= -4 && x < p) stripZeros(fDigits(a, p - 1 - x))
    else {
      val s = eDigits(a, p - 1, upper)
      val cut = s.indexOf(if (upper) 'E' else 'e')
      stripZeros(s.substring(0, cut)) + s.substring(cut)
    }
  }

  private def stripZeros(s: String): String =
    if (!s.contains('.')) s
    else {
      var end = s.length
      while (end > 0 && s.charAt(end - 1) == '0') end -= 1
      if (end > 0 && s.charAt(end - 1) == '.') end -= 1
      s.substring(0, end)
    }
}
