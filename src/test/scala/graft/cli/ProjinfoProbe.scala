package graft.cli

import graft.proj.OpFactory
import graft.proj.OpFactory.{GridMode, Options}

/** scratch probe for projinfo candidate debugging */
object ProjinfoProbe {
  def main(argv: Array[String]): Unit = {
    val src = OpFactory.resolve(argv(0)).get
    val dst = OpFactory.resolve(argv(1)).get
    println(s"src=${src.code} datum=${src.geod.datum} bbox=${src.bbox}")
    println(s"dst=${dst.code} datum=${dst.geod.datum} bbox=${dst.bbox}")
    val list = OpFactory.createListForDisplay(src, dst, Options(), GridMode.Ignore)
    println(s"candidates: ${list.length}")
    for (c <- list)
      println(s"  ${c.name} | acc=${c.accuracy} | hops=${c.dispHops.map(h => (if (h._2) "-" else "+") + h._1.code).mkString(",")} | ballpark=${c.ballpark} | grids=${c.grids} | pipe=${c.pipeline.take(120)}")
  }
}
