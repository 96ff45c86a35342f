package graft.proj

import graft.proj.ops._

/** Operation registry — the analogue of the reference's static constructor
  * table (src/pj_list.h:9-196 + locate_constructor src/init.cpp:424-434).
  * Grows as kernels land; Proj.create rejects names not present here with
  * invalid_op_wrong_syntax, like the reference does for unknown ops.
  */
object OpRegistry {

  private def op(name: String, ctor: PJ => Unit,
                 isProjection: Boolean = false,
                 needEllps: Boolean = false): (String, OpDef) =
    name -> OpDef(name, needEllps, isProjection, ctor)

  val byName: Map[String, OpDef] = Map(
    // --- core plumbing / conversions ---
    op("noop", CoreOps.noop),
    op("latlong", CoreOps.latlong, isProjection = true),
    op("longlat", CoreOps.latlong, isProjection = true),
    op("latlon", CoreOps.latlong, isProjection = true),
    op("lonlat", CoreOps.latlong, isProjection = true),
    op("geocent", CoreOps.geocent, isProjection = true),
    op("geoc", CoreOps.geoc),
    op("cart", CoreOps.cart, needEllps = true),
    op("axisswap", CoreOps.axisswap),
    op("unitconvert", CoreOps.unitconvert),
    op("set", CoreOps.set),
    op("pipeline", PipelineOp.pipeline),
    op("push", PipelineOp.push),
    op("pop", PipelineOp.pop),
    // --- datum transformations ---
    op("helmert", HelmertOps.helmert),
    op("molobadekas", HelmertOps.molobadekas),
    // --- azimuthal projections ---
    op("ortho", AzimuthalOps.ortho, isProjection = true, needEllps = true),
    op("gnom", AzimuthalOps.gnom, isProjection = true, needEllps = true),
    op("laea", AzimuthalOps.laea, isProjection = true, needEllps = true),
    op("stere", Azimuthal2Ops.stere, isProjection = true, needEllps = true),
    op("ups", Azimuthal2Ops.ups, isProjection = true, needEllps = true),
    op("sterea", Azimuthal2Ops.sterea, isProjection = true, needEllps = true),
    op("aeqd", Azimuthal2Ops.aeqd, isProjection = true, needEllps = true),
    // --- conic / cylindrical ---
    op("aea", ConicCylOps.aea, isProjection = true, needEllps = true),
    op("leac", ConicCylOps.leac, isProjection = true, needEllps = true),
    op("eqc", ConicCylOps.eqc, isProjection = true, needEllps = true),
    op("eqdc", ConicCylOps.eqdc, isProjection = true, needEllps = true),
    op("cass", ConicCylOps.cass, isProjection = true, needEllps = true),
    op("cea", ConicCylOps.cea, isProjection = true, needEllps = true),
    op("bonne", ConicCylOps.bonne, isProjection = true, needEllps = true),
    op("tobmerc", ConicCylOps.tobmerc, isProjection = true, needEllps = true),
    // --- pseudocylindrical / world ---
    op("moll", PseudoCylOps.moll, isProjection = true),
    op("wag4", PseudoCylOps.wag4, isProjection = true),
    op("wag5", PseudoCylOps.wag5, isProjection = true),
    op("sinu", PseudoCylOps.sinu, isProjection = true, needEllps = true),
    op("gn_sinu", PseudoCylOps.gnSinu, isProjection = true),
    op("eck6", PseudoCylOps.eck6, isProjection = true),
    op("mbtfps", PseudoCylOps.mbtfps, isProjection = true),
    op("eck4", PseudoCylOps.eck4, isProjection = true),
    op("eqearth", PseudoCylOps.eqearth, isProjection = true, needEllps = true),
    op("eck1", PseudoCyl2Ops.eck1, isProjection = true),
    op("eck2", PseudoCyl2Ops.eck2, isProjection = true),
    op("eck3", PseudoCyl2Ops.eck3, isProjection = true),
    op("kav7", PseudoCyl2Ops.kav7, isProjection = true),
    op("wag6", PseudoCyl2Ops.wag6, isProjection = true),
    op("putp1", PseudoCyl2Ops.putp1, isProjection = true),
    op("eck5", PseudoCyl2Ops.eck5, isProjection = true),
    op("goode", PseudoCyl2Ops.goode, isProjection = true),
    op("boggs", PseudoCyl2Ops.boggs, isProjection = true),
    op("collg", PseudoCyl2Ops.collg, isProjection = true),
    op("crast", PseudoCyl2Ops.crast, isProjection = true),
    op("denoy", PseudoCyl2Ops.denoy, isProjection = true),
    op("fahey", PseudoCyl2Ops.fahey, isProjection = true),
    op("hammer", PseudoCyl2Ops.hammer, isProjection = true),
    op("aitoff", PseudoCyl2Ops.aitoff, isProjection = true),
    op("wintri", PseudoCyl2Ops.wintri, isProjection = true),
    op("robin", PseudoCyl2Ops.robin, isProjection = true),
    op("vandg", PseudoCyl2Ops.vandg, isProjection = true),
    op("igh", InterruptedOps.igh, isProjection = true),
    op("igh_o", InterruptedOps.ighO, isProjection = true),
    op("imoll", InterruptedOps.imoll, isProjection = true),
    op("imoll_o", InterruptedOps.imollO, isProjection = true),
    op("euler", PseudoCyl3Ops.euler, isProjection = true),
    op("murd1", PseudoCyl3Ops.murd1, isProjection = true),
    op("murd2", PseudoCyl3Ops.murd2, isProjection = true),
    op("murd3", PseudoCyl3Ops.murd3, isProjection = true),
    op("pconic", PseudoCyl3Ops.pconic, isProjection = true),
    op("tissot", PseudoCyl3Ops.tissot, isProjection = true),
    op("vitk1", PseudoCyl3Ops.vitk1, isProjection = true),
    op("fouc", PseudoCyl3Ops.fouc, isProjection = true),
    op("kav5", PseudoCyl3Ops.kav5, isProjection = true),
    op("qua_aut", PseudoCyl3Ops.quaAut, isProjection = true),
    op("mbt_s", PseudoCyl3Ops.mbtS, isProjection = true),
    op("putp2", PseudoCyl3Ops.putp2, isProjection = true),
    op("putp3", PseudoCyl3Ops.putp3, isProjection = true),
    op("putp3p", PseudoCyl3Ops.putp3p, isProjection = true),
    op("putp4p", PseudoCyl3Ops.putp4p, isProjection = true),
    op("weren", PseudoCyl3Ops.weren, isProjection = true),
    op("putp5", PseudoCyl3Ops.putp5, isProjection = true),
    op("putp5p", PseudoCyl3Ops.putp5p, isProjection = true),
    op("putp6", PseudoCyl3Ops.putp6, isProjection = true),
    op("putp6p", PseudoCyl3Ops.putp6p, isProjection = true),
    op("urm5", PseudoCyl3Ops.urm5, isProjection = true),
    op("urmfps", PseudoCyl3Ops.urmfps, isProjection = true),
    op("wag1", PseudoCyl3Ops.wag1, isProjection = true),
    op("wag2", PseudoCyl3Ops.wag2, isProjection = true),
    op("wag3", PseudoCyl3Ops.wag3, isProjection = true),
    op("wag7", PseudoCyl3Ops.wag7, isProjection = true),
    op("wink1", PseudoCyl3Ops.wink1, isProjection = true),
    op("wink2", PseudoCyl3Ops.wink2, isProjection = true),
    // --- conformal projections ---
    op("tmerc", TmercOps.tmerc, isProjection = true, needEllps = true),
    op("etmerc", TmercOps.etmerc, isProjection = true, needEllps = true),
    op("utm", TmercOps.utm, isProjection = true, needEllps = true),
    op("merc", MercLccOps.merc, isProjection = true, needEllps = true),
    op("webmerc", MercLccOps.webmerc, isProjection = true, needEllps = true),
    op("lcc", MercLccOps.lcc, isProjection = true, needEllps = true)
  )
}
