package graft.tools
import graft.gie.GieRunner
object GieFails {
  def main(args: Array[String]): Unit = {
    val ops = args.headOption.getOrElse("tmerc,etmerc,utm,merc,webmerc,lcc,pipeline,helmert,cart,axisswap,unitconvert,noop,latlong,longlat,geoc,geocent,set,push,pop,molobadekas").split(",").toSet
    val s = new GieRunner.Stats
    GieRunner.runFile("/root/reference/test/gie/builtins.gie", s)
    GieRunner.runFile("/root/reference/test/gie/more_builtins.gie", s)
    s.failures.filter(f => ops.contains(f.opName)).take(60).foreach { f =>
      println(s"${f.file}:${f.lineno} [${f.opName}] ${f.msg.take(160)}")
    }
  }
}
