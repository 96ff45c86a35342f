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
    // --- conformal projections ---
    op("tmerc", TmercOps.tmerc, isProjection = true, needEllps = true),
    op("etmerc", TmercOps.etmerc, isProjection = true, needEllps = true),
    op("utm", TmercOps.utm, isProjection = true, needEllps = true),
    op("merc", MercLccOps.merc, isProjection = true, needEllps = true),
    op("webmerc", MercLccOps.webmerc, isProjection = true, needEllps = true),
    op("lcc", MercLccOps.lcc, isProjection = true, needEllps = true)
  )
}
