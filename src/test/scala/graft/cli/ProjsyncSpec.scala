package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** The projsync grid catalog: manifest filtering (name / source id /
  * area / bbox with antimeridian handling, PROJ_DATA.VERSION windows),
  * --list-files CSV output, the unknown-value error protocol, and the
  * actual download flow against a local in-process HTTP endpoint
  * (dry-run, fetch into the target dir, already-downloaded skip). */
class ProjsyncSpec extends AnyFunSuite {

  /** a small synthetic files.geojson in the CDN manifest's shape */
  private val manifest = {
    def feat(name: String, source: String, area: String, size: Int,
             bbox: (Double, Double, Double, Double),
             extra: String = ""): String = {
      val (w, s, e, n) = bbox
      s"""{"type":"Feature","properties":{"name":"$name","source_id":"$source","area_of_use":"$area","file_size":$size$extra},
         |"geometry":{"type":"Polygon","coordinates":[[[$w,$s],[$e,$s],[$e,$n],[$w,$n],[$w,$s]]]}}""".stripMargin
    }
    // a grid straddling the antimeridian as the CDN publishes it: a
    // MultiPolygon with one part ending at +180 and one starting at -180
    val nz = """{"type":"Feature","properties":{"name":"nz_straddle.tif","source_id":"nz_linz","area_of_use":"New Zealand offshore","file_size":500},
               |"geometry":{"type":"MultiPolygon","coordinates":[[[[170,-50],[180,-50],[180,-30],[170,-30],[170,-50]]],[[[-180,-50],[-175,-50],[-175,-30],[-180,-30],[-180,-50]]]]}}""".stripMargin
    s"""{"type":"FeatureCollection","features":[
       |${feat("fr_ign_ntf_r93.tif", "fr_ign", "France", 1000, (-5.5, 41.0, 10.0, 52.0))},
       |${feat("au_icsm_conformal.tif", "au_icsm", "Australia", 2000, (112.0, -44.0, 154.0, -9.0))},
       |${feat("us_future_grid.tif", "us_noaa", "USA", 3000, (-125.0, 24.0, -66.0, 50.0),
          ""","version_added":"1.25"""")},
       |${feat("eu_retired_grid.tif", "eu_old", "Europe", 4000, (-10.0, 35.0, 30.0, 70.0),
          ""","version_removed":"1.10"""")},
       |$nz
       |]}""".stripMargin
  }

  private def run(args: String*): CliResult =
    CliProjsync.run(args.toSeq, "", "projsync",
      Map("files.geojson" -> manifest))

  test("--list-files applies the PROJ_DATA.VERSION window") {
    val r = run("--local-geojson-file", "files.geojson", "--list-files")
    assert(r.exit == 0, r.stderr)
    val lines = r.stdout.trim.split('\n').toSeq
    assert(lines.head == "filename,area_of_use,source_id,file_size")
    // version_added 1.25 > data 1.24 and version_removed 1.10 <= 1.24
    // are both filtered out
    assert(lines.tail == Seq(
      "fr_ign_ntf_r93.tif,France,fr_ign,1000",
      "au_icsm_conformal.tif,Australia,au_icsm,2000",
      "nz_straddle.tif,New Zealand offshore,nz_linz,500"))
    val all = run("--local-geojson-file", "files.geojson", "--list-files",
      "--no-version-filtering")
    assert(all.stdout.contains("us_future_grid.tif") &&
      all.stdout.contains("eu_retired_grid.tif"))
  }

  test("--bbox filtering handles the antimeridian on both sides") {
    // a query crossing the antimeridian (east < west renormalizes)
    val r = run("--local-geojson-file", "files.geojson", "--list-files",
      "--bbox", "175,-45,-174,-35")
    assert(r.exit == 0, r.stderr)
    assert(r.stdout.contains("nz_straddle.tif"))
    assert(!r.stdout.contains("fr_ign"))
    // containment: France grid inside a Europe box, Australia not
    val c = run("--local-geojson-file", "files.geojson", "--list-files",
      "--bbox", "-10,35,30,70", "--spatial-test", "contains")
    assert(c.stdout.contains("fr_ign_ntf_r93.tif"))
    assert(!c.stdout.contains("au_icsm"))
  }

  test("unknown --source-id lists the known values and exits 1") {
    val r = run("--local-geojson-file", "files.geojson",
      "--source-id", "nope")
    assert(r.exit == 1)
    assert(r.stderr.contains("'nope' is a unknown value for --source-id."))
    assert(r.stderr.contains("  au_icsm") && r.stderr.contains("  fr_ign"))
  }

  test("dry-run, download into target dir, and already-downloaded skip") {
    val dir = java.nio.file.Files.createTempDirectory("projsync").toString
    val payload = "grid-bytes".getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      val name = exchange.getRequestURI.getPath.stripPrefix("/")
      if (name == "files.geojson") {
        val b = manifest.getBytes("UTF-8")
        exchange.sendResponseHeaders(200, b.length.toLong)
        exchange.getResponseBody.write(b)
      } else if (name == "fr_ign_ntf_r93.tif") {
        exchange.sendResponseHeaders(200, payload.length.toLong)
        exchange.getResponseBody.write(payload)
      } else exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val dry = CliProjsync.run(Seq("--endpoint", base, "--target-dir", dir,
        "--file", "fr_ign", "--dry-run"), "", "projsync", Map.empty)
      assert(dry.exit == 0, dry.stderr)
      assert(dry.stdout.contains(s"Downloading from $base into $dir"))
      assert(dry.stdout.contains("Total to download: 1000 bytes"))
      assert(dry.stdout.contains(
        s"Would download $base/fr_ign_ntf_r93.tif... (1 / 1)"))

      val real = CliProjsync.run(Seq("--endpoint", base, "--target-dir", dir,
        "--file", "fr_ign"), "", "projsync", Map.empty)
      assert(real.exit == 0, real.stderr)
      assert(real.stdout.contains(
        s"Downloading $base/fr_ign_ntf_r93.tif... (1 / 1)"))
      val dest = java.nio.file.Paths.get(dir, "fr_ign_ntf_r93.tif")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(dest), payload))

      val again = CliProjsync.run(Seq("--endpoint", base, "--target-dir", dir,
        "--file", "fr_ign"), "", "projsync", Map.empty)
      assert(again.stdout.contains(
        s"$base/fr_ign_ntf_r93.tif already downloaded."))
    } finally server.stop(0)
  }
}
