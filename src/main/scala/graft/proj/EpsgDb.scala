package graft.proj

/** In-memory view of the generated coordinate-operation sidecar
  * (`/graft/epsg_ops`, produced by devtools/epsg_ops_gen.py from the
  * reference's public EPSG SQL data — see the reference's data/sql tree).
  *
  * This is deliberately NOT the reference's iso19111 object model: it is the
  * minimal relational picture the operation factory (graft.proj.OpFactory)
  * needs — CRSs with their datum links, datums with dynamic/ensemble
  * information, coordinate operations with normalized parameters and extents,
  * grid aliases, supersession, and a name index.
  */
object EpsgDb {

  /** geodetic CRS kinds */
  final val Geog2D = 0
  final val Geog3D = 1
  final val Geocentric = 2

  final case class GeodCrs(code: String, kind: Int, datum: String,
                           a: Double, rf: Double, pmDeg: Double,
                           bbox: Option[Bbox], name: String) {
    def ellTokens: String =
      if (rf == 0.0) s"a=$a b=$a" else s"a=$a rf=$rf"
  }
  final case class ProjCrs(code: String, baseGeog: String, bbox: Option[Bbox],
                           name: String,
                           /** inline proj-string body (non-EPSG authorities;
                             * EPSG bodies come from the init sidecar) */
                           body: Option[String] = None)
  final case class VertCrs(code: String, datum: String, bbox: Option[Bbox],
                           name: String)
  final case class CompCrs(code: String, horiz: String, vert: String,
                           name: String)
  /** plane-grid CRS with no geodetic base (Cartesian engineering grid);
    * reachable only through registered whole-CRS operations */
  final case class EngCrs(code: String, bbox: Option[Bbox], areaName: String,
                          name: String)
  final case class Datum(code: String, frameEpoch: Option[Double],
                         ensembleAccuracy: Option[Double], name: String)

  /** degrees, west may exceed east across the antimeridian */
  final case class Bbox(west: Double, south: Double, east: Double, north: Double)

  final case class Op(code: String, kind: Char, method: String,
                      srcCrs: String, dstCrs: String, accuracy: Double,
                      bbox: Option[Bbox], deprecated: Boolean,
                      extras: Map[String, String], areaName: String,
                      name: String) {
    def auth: String = code.substring(0, code.indexOf(':'))
  }

  final case class GridAlias(proj: String, old: String, format: String,
                             method: String, inverse: Boolean)

  final class Db(
      val geodetic: Map[String, GeodCrs],
      val projected: Map[String, ProjCrs],
      val vertical: Map[String, VertCrs],
      val compound: Map[String, CompCrs],
      val engineering: Map[String, EngCrs],
      val datums: Map[String, Datum],
      val ensembleMembers: Map[String, Seq[String]],
      val ops: Vector[Op],
      val gridAlias: Map[String, GridAlias],
      val superseded: Set[String],
      /** authority code aliases (deprecated ESRI codes -> EPSG objects) */
      val codeAlias: Map[String, String],
      /** same-pair supersession (flag=1 rows): superseded -> replacements.
        * The factory applies the reference's refined rule — discard only
        * when a replacement is in the same candidate pool and does not
        * need an unknown grid (factory.cpp:7418-7434). */
      val supersededBy: Map[String, Seq[String]],
      /** (lowercased name, kind letter) -> codes in priority order */
      val names: Map[(String, Char), Seq[String]]) {

    /** ops indexed by the datum of their source and target geodetic CRSs
      * (ops whose ends are not geodetic CRSs — vertical, projected — are
      * indexed under the end code itself). */
    val opsByEnds: Map[(String, String), Vector[Op]] = {
      val m = scala.collection.mutable.Map.empty[(String, String), Vector[Op]]
      for (op <- ops) {
        val k = (endKey(op.srcCrs), endKey(op.dstCrs))
        m(k) = m.getOrElse(k, Vector.empty) :+ op
      }
      m.toMap
    }

    /** datum membership: member datum -> ensemble datum(s) */
    val memberOf: Map[String, Seq[String]] = {
      val m = scala.collection.mutable.Map.empty[String, Seq[String]]
      for ((ens, members) <- ensembleMembers; mem <- members)
        m(mem) = m.getOrElse(mem, Seq.empty) :+ ens
      m.toMap
    }

    /** a CRS end key: the datum for geodetic CRSs (so 2D/3D/geocentric
      * realizations of the same datum unify), otherwise the CRS code. */
    def endKey(crsCode: String): String =
      geodetic.get(crsCode).map(_.datum).getOrElse(crsCode)

    /** all ops touching the given pair of end keys, either direction:
      * (op, inverse?) */
    def opsBetween(a: String, b: String): Vector[(Op, Boolean)] = {
      val fwd = opsByEnds.getOrElse((a, b), Vector.empty).map((_, false))
      val inv =
        if (a == b) Vector.empty
        else opsByEnds.getOrElse((b, a), Vector.empty).map((_, true))
      fwd ++ inv
    }

    def isDynamicDatum(datum: String): Boolean =
      datums.get(datum).exists(_.frameEpoch.isDefined)

    /** ensemble-aware datum equivalence: identical, or one is an ensemble
      * containing the other (the reference treats a member CRS and its
      * ensemble CRS as connected by a null transformation within the
      * ensemble accuracy). */
    def sameDatum(a: String, b: String): Boolean =
      a == b ||
        memberOf.getOrElse(a, Nil).contains(b) ||
        memberOf.getOrElse(b, Nil).contains(a)

    /** two distinct member realizations of one ensemble: connected for
      * glue-leg pruning, but NOT null-transformable (the reference's
      * isSameGeodeticDatum equates a member with its ensemble only —
      * member-to-member hops go through their registered transformations
      * when any exist). */
    def sameEnsembleMembers(a: String, b: String): Boolean =
      a != b &&
        memberOf.getOrElse(a, Nil).exists(memberOf.getOrElse(b, Nil).contains)

    def byName(name: String, kinds: String): Seq[(Char, String)] = {
      val key = EpsgDb.canonName(name)
      kinds.flatMap(k => names.getOrElse((key, k), Nil).map((k, _)))
    }
  }

  /** the reference's name-equivalence canonicalization (metadata.cpp
    * Identifier::isEquivalentName): case-insensitive, punctuation/space
    * ignored, and a leading "19dd" year collapses to "dd" (so "ITRF1993"
    * matches "ITRF93"). */
  def canonName(name: String): String = {
    val ignored = " _-/().&,"
    val sb = new StringBuilder(name.length)
    var lastValid: Char = 0
    var i = 0
    while (i < name.length) {
      val ch = Character.toLowerCase(name.charAt(i))
      if (ignored.indexOf(ch) >= 0) i += 1
      else if (ch == '1' && !Character.isDigit(lastValid) &&
        i + 3 < name.length && name.charAt(i + 1) == '9' &&
        Character.isDigit(name.charAt(i + 2)) &&
        Character.isDigit(name.charAt(i + 3))) {
        i += 2
        lastValid = '9'
      } else {
        sb.append(ch)
        lastValid = ch
        i += 1
      }
    }
    sb.toString
  }

  lazy val db: Db = load()

  private def load(): Db = {
    val in = getClass.getResourceAsStream("/graft/epsg_ops")
    require(in != null, "missing /graft/epsg_ops sidecar")
    val geodetic = Map.newBuilder[String, GeodCrs]
    val projected = Map.newBuilder[String, ProjCrs]
    val vertical = Map.newBuilder[String, VertCrs]
    val compound = Map.newBuilder[String, CompCrs]
    val engineering = Map.newBuilder[String, EngCrs]
    val datums = Map.newBuilder[String, Datum]
    val ensembles = Map.newBuilder[String, Seq[String]]
    val ops = Vector.newBuilder[Op]
    val gridAlias = Map.newBuilder[String, GridAlias]
    val superseded = Set.newBuilder[String]
    val codeAlias = Map.newBuilder[String, String]
    val supersededBy = scala.collection.mutable.Map.empty[String, Vector[String]]
    val names = scala.collection.mutable.Map.empty[(String, Char), Vector[String]]

    def dOpt(s: String): Option[Double] =
      if (s.isEmpty || s == "-") None else Some(s.toDouble)
    def bbox(w: String, s: String, e: String, n: String): Option[Bbox] =
      if (w.isEmpty || s.isEmpty || e.isEmpty || n.isEmpty) None
      else Some(Bbox(w.toDouble, s.toDouble, e.toDouble, n.toDouble))

    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "UTF-8"), 1 << 20)
    try {
      var line = reader.readLine()
      while (line != null) {
        if (line.nonEmpty && line.charAt(0) != '#') {
          // limit = -1 keeps trailing empty fields
          val f = line.split("\\|", -1)
          f(0) match {
            case "C" =>
              val kind = f(2) match {
                case "g2" => Geog2D; case "g3" => Geog3D; case _ => Geocentric
              }
              geodetic += f(1) -> GeodCrs(f(1), kind, f(3), f(4).toDouble,
                f(5).toDouble, dOpt(f(6)).getOrElse(0.0),
                bbox(f(7), f(8), f(9), f(10)), f(11))
            case "P" =>
              val body =
                if (f.length > 8 && f(8).nonEmpty)
                  Some(new String(java.util.Base64.getDecoder.decode(f(8)), "UTF-8"))
                else None
              projected += f(1) -> ProjCrs(f(1), f(2),
                bbox(f(3), f(4), f(5), f(6)), f(7), body)
            case "V" =>
              vertical += f(1) -> VertCrs(f(1), f(2),
                bbox(f(3), f(4), f(5), f(6)), f(7))
            case "X" =>
              compound += f(1) -> CompCrs(f(1), f(2), f(3), f(4))
            case "J" =>
              engineering += f(1) -> EngCrs(f(1),
                bbox(f(3), f(4), f(5), f(6)), f(7), f(8))
            case "D" =>
              datums += f(1) -> Datum(f(1), dOpt(f(2)), dOpt(f(3)), f(4))
            case "M" =>
              ensembles += f(1) -> f(2).split(',').toSeq
            case "N" =>
              val k = (canonName(f(1)), f(2).charAt(0))
              val prev = names.getOrElse(k, Vector.empty)
              if (!prev.contains(f(3))) names(k) = prev :+ f(3)
            case "O" =>
              val extras = f(12).split(';').iterator.filter(_.nonEmpty).map { kv =>
                val eq = kv.indexOf('=')
                kv.substring(0, eq) -> kv.substring(eq + 1)
              }.toMap
              ops += Op(f(1), f(2).charAt(0), f(3), f(4), f(5),
                dOpt(f(6)).getOrElse(-1.0), bbox(f(7), f(8), f(9), f(10)),
                f(11) == "1", extras, f(13), f(14))
            case "A" =>
              gridAlias += f(1) -> GridAlias(f(2), f(3), f(4), f(5), f(6) == "1")
            case "Z" =>
              codeAlias += f(1) -> f(2)
            case "U" =>
              // same_source_target_crs flag in f(3): only such rows
              // participate in the reference's discardSuperseded protocol
              if (f(3) == "1") {
                superseded += f(1)
                supersededBy(f(1)) = supersededBy.getOrElse(f(1), Vector.empty) :+ f(2)
              }
            case _ => ()
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()

    new Db(geodetic.result(), projected.result(), vertical.result(),
      compound.result(), engineering.result(), datums.result(),
      ensembles.result(), ops.result(),
      gridAlias.result(), superseded.result(), codeAlias.result(),
      supersededBy.view.mapValues(_.toSeq).toMap,
      names.view.mapValues(_.toSeq).toMap)
  }
}
