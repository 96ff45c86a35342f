package graft.proj

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Coord
import graft.proj.ops.GridShiftOps

/** HttpGridSource against a local in-process HTTP server: the hgridshift
  * result through the HTTP fetch path must equal the file-source result,
  * misses must fall through to the file source, and the disk cache must
  * serve a second fetch without touching the server. */
class HttpGridSpec extends AnyFunSuite {

  private val gridBytes = java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("/root/reference/data/tests/ntv2_0_downsampled.gsb"))

  private def withServer[A](f: (String, () => Int) => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/grids/", { exchange =>
      val name = exchange.getRequestURI.getPath.stripPrefix("/grids/")
      if (name == "http_only_ntv2.gsb") {
        hits.incrementAndGet()
        exchange.sendResponseHeaders(200, gridBytes.length.toLong)
        exchange.getResponseBody.write(gridBytes)
      } else exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/grids", () => hits.get())
    finally server.stop(0)
  }

  private def shiftThrough(gridName: String): (Double, Double) = {
    val p = Proj.create(s"proj=hgridshift grids=$gridName")
    val c = new Coord
    c.set(math.toRadians(-82.0), math.toRadians(42.0), 0, 0)
    Dispatch.fwd4d(p, c)
    assert(!c.isError)
    (c.x, c.y)
  }

  test("grids fetched over HTTP shift identically to the file source") {
    val fileResult = shiftThrough("ntv2_0_downsampled.gsb")
    withServer { (base, hits) =>
      val saved = GridShiftOps.gridSource
      try {
        GridShiftOps.gridSource =
          new GridShiftOps.HttpGridSource(base, saved)
        val httpResult = shiftThrough("http_only_ntv2.gsb")
        assert(hits() == 1)
        assert(httpResult == fileResult)
        // fall-through: a name the server 404s still resolves locally
        val fallback = shiftThrough("ntv2_0_downsampled.gsb")
        assert(fallback == fileResult)
      } finally GridShiftOps.gridSource = saved
    }
  }

  test("the disk cache serves the second JVM-cold fetch without the server") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gridcache").toString
    withServer { (base, hits) =>
      val saved = GridShiftOps.gridSource
      try {
        val src = new GridShiftOps.HttpGridSource(base, saved, Some(dir))
        assert(src.fetch("http_only_ntv2.gsb").exists(_.sameElements(gridBytes)))
        assert(hits() == 1)
        // second fetch: disk cache, no new server hit
        assert(src.fetch("http_only_ntv2.gsb").exists(_.sameElements(gridBytes)))
        assert(hits() == 1)
      } finally GridShiftOps.gridSource = saved
    }
  }
}
