object AllocProbe {
  def main(a: Array[String]): Unit = {
    import graft.core.Coord
    import graft.proj.{Proj, Dispatch}
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    val tid = Thread.currentThread.getId
    def measure(name: String, n: Int)(body: Int => Double): Unit = {
      var acc = 0.0; var i = 0
      while (i < 10000) { acc += body(i); i += 1 }
      val b0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime
      i = 0
      while (i < n) { acc += body(i); i += 1 }
      val secs = (System.nanoTime - t0) / 1e9
      println(f"$name: ${(tmx.getThreadAllocatedBytes(tid) - b0).toDouble / n}%.1f B/row, ${n/secs/1e6}%.2f M/s (acc $acc%.0f)")
    }
    val d = new graft.spark.RegistryDispatch("EPSG:4267", "EPSG:4326")
    println("cands: " + d.pipeStrs.length)
    // which candidate serves the probe points?
    val idx = d.select(-100.0 + 5, 30.0 + 5)
    println("selected idx=" + idx + " pipe=" + d.pipeStrs(idx))
    val pj = Proj.create(d.pipeStrs(idx))
    val c = new Coord
    measure("selected pipe trans", 200000) { i =>
      c.set(math.toRadians(-100.0 + (i % 40)), math.toRadians(30.0 + (i % 20)), 0, Double.PositiveInfinity)
      Dispatch.trans(pj, true, c); c.x
    }
    measure("suggest only", 200000) { i =>
      d.select(-100.0 + (i % 40), 30.0 + (i % 20)).toDouble
    }
  }
}
