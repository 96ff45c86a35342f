package graft.tools
import graft.gie.GieRunner
object GieFails2 {
  def main(args: Array[String]): Unit = {
    val ops = args.headOption.getOrElse("eqearth,ob_tran,krovak,laea,sterea,col_urban,pipeline,chamb").split(",").toSet
    val s = new GieRunner.Stats
    GieRunner.runFile("/root/reference/test/gie/builtins.gie", s)
    GieRunner.runFile("/root/reference/test/gie/more_builtins.gie", s)
    s.failures.filter(f => ops.contains(f.opName)).take(40).foreach { f =>
      println(s"${f.file}:${f.lineno} [${f.opName}] ${f.msg.take(150)}")
    }
  }
}
