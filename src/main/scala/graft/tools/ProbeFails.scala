package graft.tools
import graft.gie.GieRunner
object ProbeFails {
  def main(args: Array[String]): Unit = {
    val s = GieRunner.runFile(args(0))
    s.failures.foreach(f => println(s"${f.lineno} [${f.opName}] ${f.msg.take(200)}"))
  }
}
