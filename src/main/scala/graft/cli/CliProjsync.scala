package graft.cli

import graft.proj.EpsgMeta
import graft.proj.ops.TinshiftOps.{JArr, JNum, JObj, JStr, JVal, Json}

/** The projsync app: the reference's grid catalog/sync tool
  * (src/apps/projsync.cpp) — reads the CDN's files.geojson manifest,
  * filters by file name / source id / area of use / bbox (with the
  * antimeridian wrap rules and MultiPolygon bbox merging) and the
  * PROJ_DATA.VERSION version_added/version_removed window, then lists
  * (--list-files CSV) or downloads the selected grids into the target
  * directory (skipping files already present, --dry-run printing what
  * it would fetch).
  *
  * Behavioral provenance (no code copied): reference src/apps/projsync.cpp
  * — option grammar, filter semantics, output formats, exit codes.
  */
object CliProjsync {

  private final class Opt {
    var targetDir = ""
    var endpoint = "https://cdn.proj.org"
    var localGeojson = ""
    var listFiles = false
    var sourceId = ""
    var areaOfUse = ""
    var file = ""
    var hasBbox = false
    var west, south, east, north = 0.0
    var intersects = true
    var dryRun = false
    var quiet = false
    var verbose = false
    var includeWorld = true
    var all = false
    var versionFiltering = true
  }

  def run(args: Seq[String], stdin: String, prog: String,
          files: Map[String, String],
          env: Map[String, String] = Map.empty): CliResult = {
    val io = new CliOut
    val code =
      try execute(args, io, files)
      catch { case e: Throwable => io.err(s"Error: ${e.getMessage}\n"); 1 }
    CliResult(io.stdout, io.stderr, io.combined, code)
  }

  private def usage(io: CliOut): Int = {
    io.err("usage: projsync [--endpoint URL] [--target-dir dir] " +
      "[--local-geojson-file file] (--list-files | --file name | " +
      "--source-id id | --area-of-use area | --bbox w,s,e,n | --all) " +
      "[--spatial-test contains|intersects] [--dry-run] " +
      "[--exclude-world-coverage] [--no-version-filtering] [-q] [--verbose]\n")
    1
  }

  private def execute(args: Seq[String], io: CliOut,
                      files: Map[String, String]): Int = {
    val o = new Opt
    var i = 0
    def next(): String = { i += 1; if (i < args.length) args(i) else "" }
    while (i < args.length) {
      args(i) match {
        case "--endpoint" => o.endpoint = next()
        case "--user-writable-directory" | "--system-directory" => ()
        case "--target-dir" => o.targetDir = next()
        case "--local-geojson-file" => o.localGeojson = next()
        case "--list-files" => o.listFiles = true
        case "--source-id" => o.sourceId = next()
        case "--area-of-use" => o.areaOfUse = next()
        case "--file" => o.file = next()
        case "--bbox" =>
          val p = next().split(',')
          if (p.length != 4) {
            io.err(s"Incorrect number of values for option --bbox: ${p.mkString(",")}\n")
            return usage(io)
          }
          o.west = p(0).toDouble; o.south = p(1).toDouble
          o.east = p(2).toDouble; o.north = p(3).toDouble
          // antimeridian renormalization (reference projsync.cpp:189-200)
          if (o.west > 180 && o.east > o.west) { o.west -= 360; o.east -= 360 }
          else if (o.west < -180 && o.east > o.west) { o.west += 360; o.east += 360 }
          else if (math.abs(o.west) < 180 && math.abs(o.east) < 180 &&
            o.east < o.west) o.east += 360
          o.hasBbox = true
        case "--spatial-test" => next().toLowerCase match {
          case "contains" => o.intersects = false
          case "intersects" => o.intersects = true
          case other =>
            io.err(s"Unrecognized value for option --spatial-test: $other\n")
            return usage(io)
        }
        case "--dry-run" => o.dryRun = true
        case "--exclude-world-coverage" => o.includeWorld = false
        case "--all" => o.all = true
        case "--no-version-filtering" => o.versionFiltering = false
        case "-q" | "--quiet" => o.quiet = true
        case "--verbose" => o.verbose = true
        case other => io.err(s"Unrecognized option: $other\n"); return usage(io)
      }
      i += 1
    }
    if (!o.listFiles && o.file.isEmpty && o.sourceId.isEmpty &&
      o.areaOfUse.isEmpty && !o.hasBbox && !o.all) {
      io.err("At least one of --list-files, --file, --source-id, " +
        "--area-of-use, --bbox or --all must be specified.\n\n")
      return usage(io)
    }
    if (o.targetDir.isEmpty) o.targetDir = sys.props("java.io.tmpdir")
    o.targetDir = o.targetDir.stripSuffix("/")
    o.endpoint = o.endpoint.stripSuffix("/")
    if (!o.quiet && !o.listFiles)
      io.out(s"Downloading from ${o.endpoint} into ${o.targetDir}\n")

    val manifestText: String =
      if (o.localGeojson.nonEmpty)
        files.getOrElse(o.localGeojson,
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(o.localGeojson)), "UTF-8"))
      else
        httpGet(s"${o.endpoint}/files.geojson").map(new String(_, "UTF-8"))
          .getOrElse {
            io.err(s"Cannot download ${o.endpoint}/files.geojson\n"); return 1
          }

    if (o.listFiles) io.out("filename,area_of_use,source_id,file_size\n")

    val (dataMajor, dataMinor) = {
      val v = EpsgMeta.meta.metadata.getOrElse("PROJ_DATA.VERSION", "")
      val t = v.split('.')
      if (t.length >= 2) (t(0).toIntOption.getOrElse(0), t(1).toIntOption.getOrElse(0))
      else (0, 0)
    }

    val root = Json.parse(manifestText) match {
      case obj: JObj => obj
      case _ => io.err("Error: no features member\n"); return 1
    }
    val features = root.fields.get("features") match {
      case Some(JArr(fs)) => fs
      case _ => io.err("Error: no features member\n"); return 1
    }

    var foundSourceId = false
    var foundArea = false
    var foundFile = false
    val sourceIds = scala.collection.mutable.SortedSet.empty[String]
    val areas = scala.collection.mutable.SortedSet.empty[String]
    val fileNames = scala.collection.mutable.SortedSet.empty[String]
    val toDownload = Vector.newBuilder[(String, Long)]
    var totalSize = 0L

    def str(obj: JObj, k: String): Option[String] =
      obj.fields.get(k).collect { case JStr(s) => s }

    for (feat0 <- features) feat0 match {
      case feat: JObj =>
        feat.fields.get("properties") match {
          case Some(props: JObj) =>
            str(props, "name").foreach { name =>
              def versionPair(k: String): Option[(Int, Int)] =
                str(props, k).map(_.split('.')).collect {
                  case t if t.length >= 2 =>
                    (t(0).toIntOption.getOrElse(0), t(1).toIntOption.getOrElse(0))
                }
              val tooNew = o.versionFiltering && dataMajor > 0 &&
                versionPair("version_added").exists { case (ma, mi) =>
                  dataMajor < ma || (dataMajor == ma && dataMinor < mi)
                }
              val tooOld = o.versionFiltering && dataMajor > 0 &&
                versionPair("version_removed").exists { case (ma, mi) =>
                  dataMajor > ma || (dataMajor == ma && dataMinor >= mi)
                }
              if (!tooNew && !tooOld) {
                fileNames += name
                val sourceId = str(props, "source_id").getOrElse("")
                if (sourceId.nonEmpty) sourceIds += sourceId
                val area = str(props, "area_of_use").getOrElse("")
                if (area.nonEmpty) areas += area
                val fileSize = props.fields.get("file_size")
                  .collect { case JNum(v, _) => v.toLong }.getOrElse(0L)

                val matchSource = o.all || o.sourceId.isEmpty ||
                  sourceId.contains(o.sourceId)
                if (o.sourceId.nonEmpty && sourceId.contains(o.sourceId))
                  foundSourceId = true
                val matchArea = o.all || o.areaOfUse.isEmpty ||
                  area.contains(o.areaOfUse)
                if (o.areaOfUse.nonEmpty && area.contains(o.areaOfUse))
                  foundArea = true
                val matchFile = o.all || o.file.isEmpty ||
                  name.contains(o.file)
                if (o.file.nonEmpty && name.contains(o.file)) foundFile = true

                val matchBbox =
                  if (!o.all && !o.hasBbox) true
                  else geometryBbox(feat) match {
                    case None => o.all
                    case Some((w0, s0, e0, n0)) =>
                      var gw = w0; var ge = e0
                      val worldWide = ge - gw > 359 && n0 - s0 > 179
                      if (worldWide && !o.includeWorld) false
                      else if (o.all) true
                      else {
                        if (worldWide) { gw = -1e300; ge = 1e300 }
                        else if (ge > 180 && o.west < -180) { gw -= 360; ge -= 360 }
                        if (o.intersects)
                          o.west < ge && gw < o.east && o.south < n0 && s0 < o.north
                        else
                          gw >= o.west && s0 >= o.south && ge <= o.east && n0 <= o.north
                      }
                  }

                if (matchFile && matchSource && matchArea && matchBbox) {
                  if (o.listFiles)
                    io.out(s"$name,$area,$sourceId,$fileSize\n")
                  else {
                    val url = s"${o.endpoint}/$name"
                    val dest = java.nio.file.Paths.get(o.targetDir, name)
                    if (!java.nio.file.Files.isReadable(dest)) {
                      totalSize += fileSize
                      toDownload += ((url, fileSize))
                    } else if (!o.quiet)
                      io.out(s"$url already downloaded.\n")
                  }
                }
              } else if (o.verbose) {
                val v = EpsgMeta.meta.metadata.getOrElse("PROJ_DATA.VERSION", "")
                if (tooNew)
                  io.out(s"Skipping $name as it is only useful starting " +
                    s"with PROJ-data ${str(props, "version_added").getOrElse("")} " +
                    s"and we are targeting $v\n")
                else
                  io.out(s"Skipping $name as it is no longer useful " +
                    s"starting with PROJ-data " +
                    s"${str(props, "version_removed").getOrElse("")} " +
                    s"and we are targeting $v\n")
              }
            }
          case _ => ()
        }
      case _ => ()
    }

    val dl = toDownload.result()
    if (!o.quiet && !o.listFiles && totalSize > 0) {
      if (totalSize > 1024 * 1024)
        io.out(s"Total size to download: ${totalSize / (1024 * 1024)} MB\n")
      else io.out(s"Total to download: $totalSize bytes\n")
    }
    for (((url, _), idx) <- dl.zipWithIndex) {
      if (!o.quiet)
        io.out((if (o.dryRun) "Would download " else "Downloading ") +
          s"$url... (${idx + 1} / ${dl.length})\n")
      if (!o.dryRun) {
        httpGet(url) match {
          case Some(bytes) =>
            val dest = java.nio.file.Paths.get(o.targetDir,
              url.substring(url.lastIndexOf('/') + 1))
            java.nio.file.Files.createDirectories(dest.getParent)
            val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmp")
            java.nio.file.Files.write(tmp, bytes)
            java.nio.file.Files.move(tmp, dest,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          case None =>
            io.err(s"Cannot download $url\n"); return 1
        }
      }
    }

    def unknown(label: String, value: String, known: Iterable[String]): Int = {
      io.err(s"Warning: '$value' is a unknown value for $label.\n")
      io.err("Known values are:\n")
      known.foreach(v => io.err(s"  $v\n"))
      1
    }
    if (o.sourceId.nonEmpty && !foundSourceId)
      return unknown("--source-id", o.sourceId, sourceIds)
    if (o.areaOfUse.nonEmpty && !foundArea)
      return unknown("--area-of-use", o.areaOfUse, areas)
    if (o.file.nonEmpty && !foundFile)
      return unknown("--file", o.file, fileNames)
    0
  }

  /** bbox of a GeoJSON geometry: recursive min/max over coordinate pairs,
    * with the reference's MultiPolygon antimeridian merge (parts touching
    * both -180 and +180 wrap the -180 parts to +180..+540). */
  private def geometryBbox(feat: JObj): Option[(Double, Double, Double, Double)] = {
    val geom = feat.fields.get("geometry") match {
      case Some(g: JObj) => g
      case _ => return None
    }
    val coords = geom.fields.get("coordinates") match {
      case Some(a: JArr) => a
      case _ => return None
    }
    val gtype = geom.fields.get("type") match {
      case Some(JStr(t)) => t
      case _ => return None
    }
    def bboxOf(v: JVal): Option[(Double, Double, Double, Double)] = v match {
      case JArr(items) if items.length >= 2 &&
        items.forall(_.isInstanceOf[JNum]) =>
        val x = items(0).asInstanceOf[JNum].v
        val y = items(1).asInstanceOf[JNum].v
        Some((x, y, x, y))
      case JArr(items) =>
        items.flatMap(bboxOf) match {
          case Seq() => None
          case bs => Some((bs.map(_._1).min, bs.map(_._2).min,
            bs.map(_._3).max, bs.map(_._4).max))
        }
      case _ => None
    }
    if (gtype == "MultiPolygon") {
      val parts = coords.items.flatMap(bboxOf)
      if (parts.isEmpty) return None
      val foundMinus180 = parts.exists(_._1 == -180)
      val foundPlus180 = parts.exists(_._3 == 180)
      val adj = parts.map { b =>
        if (foundMinus180 && foundPlus180 && b._1 == -180)
          (180.0, b._2, b._3 + 360, b._4)
        else b
      }
      Some((adj.map(_._1).min, adj.map(_._2).min,
        adj.map(_._3).max, adj.map(_._4).max))
    } else bboxOf(coords)
  }

  private def httpGet(url: String): Option[Array[Byte]] = {
    try {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(60)).GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode == 200) Some(resp.body) else None
    } catch { case _: java.io.IOException | _: InterruptedException => None }
  }
}
