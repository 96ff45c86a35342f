package graft.proj.grids

/** Minimal read-only SQLite 3 reader — just enough of the public file
  * format (sqlite.org/fileformat2) to scan ordinary rowid tables: header,
  * table b-tree walking (interior + leaf), record decoding with all serial
  * types, payload overflow chains, and INTEGER PRIMARY KEY rowid aliasing.
  * No SQL, no indices, no WAL (the bundled GeoPackage fixtures are plain
  * journal-mode files). Used by the tinshift GeoPackage loader.
  */
object Sqlite {

  final class SqliteError(msg: String) extends RuntimeException(msg)

  final case class Table(columns: Vector[String], rows: Vector[(Long, Vector[Any])])

  final class Db(bytes: Array[Byte]) {
    if (bytes.length < 100 ||
        new String(bytes, 0, 15, "ISO-8859-1") != "SQLite format 3" ||
        bytes(15) != 0)
      throw new SqliteError("not a SQLite 3 database")

    private def u16(off: Int): Int =
      ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    private def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

    val pageSize: Int = { val v = u16(16); if (v == 1) 65536 else v }
    private val usable = pageSize - (bytes(20) & 0xff)

    /** big-endian 7-bit varint; 9th byte uses all 8 bits. Returns
      * (value, bytesConsumed). */
    private def varint(off: Int): (Long, Int) = {
      var v = 0L
      var i = 0
      while (i < 8) {
        val b = bytes(off + i) & 0xff
        v = (v << 7) | (b & 0x7f)
        if ((b & 0x80) == 0) return (v, i + 1)
        i += 1
      }
      ((v << 8) | (bytes(off + 8) & 0xff), 9)
    }

    private def pageBase(p: Int): Int = {
      val b = (p.toLong - 1) * pageSize
      if (b < 0 || b >= bytes.length) throw new SqliteError(s"bad page $p")
      b.toInt
    }

    /** read `len` payload bytes starting at `off`, following the overflow
      * chain when the local part is shorter. */
    private def payload(off: Int, len: Long): Array[Byte] = {
      val x = usable - 35
      if (len <= x) return java.util.Arrays.copyOfRange(bytes, off, off + len.toInt)
      val m = (usable - 12) * 32 / 255 - 23
      val k = m + ((len - m) % (usable - 4)).toInt
      val local = if (k <= x) k else m
      val out = new Array[Byte](len.toInt)
      System.arraycopy(bytes, off, out, 0, local)
      var written = local
      var page = u32(off + local).toInt
      while (written < len && page != 0) {
        val base = pageBase(page)
        val n = math.min(usable - 4, len.toInt - written)
        System.arraycopy(bytes, base + 4, out, written, n)
        written += n
        page = u32(base).toInt
      }
      if (written != len) throw new SqliteError("truncated overflow chain")
      out
    }

    /** decode one record (already overflow-resolved). */
    private def record(buf: Array[Byte]): Vector[Any] = {
      def vi(off: Int): (Long, Int) = {
        var v = 0L; var i = 0
        while (i < 8) {
          val b = buf(off + i) & 0xff
          v = (v << 7) | (b & 0x7f)
          if ((b & 0x80) == 0) return (v, i + 1)
          i += 1
        }
        ((v << 8) | (buf(off + 8) & 0xff), 9)
      }
      val (hdrLen, n0) = vi(0)
      var h = n0
      val types = Vector.newBuilder[Long]
      while (h < hdrLen) { val (t, n) = vi(h); types += t; h += n }
      var d = hdrLen.toInt
      types.result().map { t =>
        def intN(n: Int): Long = {
          var v = if ((buf(d) & 0x80) != 0) -1L else 0L
          var i = 0
          while (i < n) { v = (v << 8) | (buf(d + i) & 0xff); i += 1 }
          d += n
          v
        }
        t match {
          case 0 => null
          case 1 => intN(1)
          case 2 => intN(2)
          case 3 => intN(3)
          case 4 => intN(4)
          case 5 => intN(6)
          case 6 => intN(8)
          case 7 => val v = java.lang.Double.longBitsToDouble(intN(8)); v
          case 8 => 0L
          case 9 => 1L
          case n if n >= 13 && n % 2 == 1 =>
            val len = ((n - 13) / 2).toInt
            val s = new String(buf, d, len, "UTF-8"); d += len; s
          case n if n >= 12 && n % 2 == 0 =>
            val len = ((n - 12) / 2).toInt
            val b = java.util.Arrays.copyOfRange(buf, d, d + len); d += len; b
          case n => throw new SqliteError(s"unsupported serial type $n")
        }
      }
    }

    /** walk a table b-tree in rowid order. */
    private def scan(root: Int): Vector[(Long, Vector[Any])] = {
      val out = Vector.newBuilder[(Long, Vector[Any])]
      def walk(page: Int): Unit = {
        val base = pageBase(page)
        val hdr = base + (if (page == 1) 100 else 0)
        val typ = bytes(hdr) & 0xff
        val nCells = u16(hdr + 3)
        typ match {
          case 0x05 => // interior table
            val ptrs = hdr + 12
            var i = 0
            while (i < nCells) {
              val cell = base + u16(ptrs + 2 * i)
              walk(u32(cell).toInt)
              i += 1
            }
            walk(u32(hdr + 8).toInt) // right-most child
          case 0x0d => // leaf table
            val ptrs = hdr + 8
            var i = 0
            while (i < nCells) {
              val cell = base + u16(ptrs + 2 * i)
              val (plen, n1) = varint(cell)
              val (rowid, n2) = varint(cell + n1)
              out += ((rowid, record(payload(cell + n1 + n2, plen))))
              i += 1
            }
          case other => throw new SqliteError(s"unexpected b-tree page type $other")
        }
      }
      walk(root)
      out.result()
    }

    /** column names from a CREATE TABLE statement (naive but sufficient for
      * the GeoPackage fixtures); returns (names, indexOfIntegerPrimaryKey). */
    private def parseColumns(sql: String): (Vector[String], Int) = {
      val open = sql.indexOf('(')
      val close = sql.lastIndexOf(')')
      if (open < 0 || close <= open) throw new SqliteError("unparseable CREATE TABLE")
      val body = sql.substring(open + 1, close)
      val defs = Vector.newBuilder[String]
      var depth = 0; var start = 0
      var i = 0
      while (i < body.length) {
        body.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 => defs += body.substring(start, i); start = i + 1
          case _ =>
        }
        i += 1
      }
      defs += body.substring(start)
      val constraint = Set("CONSTRAINT", "PRIMARY", "UNIQUE", "CHECK", "FOREIGN")
      var ipk = -1
      val names = defs.result().map(_.trim).filter(_.nonEmpty)
        .filterNot(d => constraint.contains(d.takeWhile(!_.isWhitespace).toUpperCase))
        .zipWithIndex.map { case (d, idx) =>
          if (d.toUpperCase.contains("INTEGER PRIMARY KEY")) ipk = idx
          val tok = d.takeWhile(!_.isWhitespace)
          tok.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("`").stripSuffix("`")
            .stripPrefix("[").stripSuffix("]")
            .stripPrefix("'").stripSuffix("'")
        }
      (names, ipk)
    }

    private lazy val master: Map[String, (Int, String)] =
      scan(1).flatMap { case (_, row) =>
        (row.lift(0), row.lift(1), row.lift(3), row.lift(4)) match {
          case (Some("table"), Some(name: String), Some(root: Long), sqlOpt) =>
            Some(name -> (root.toInt, sqlOpt.collect { case s: String => s }.getOrElse("")))
          case _ => None
        }
      }.toMap

    /** full contents of an ordinary table; INTEGER PRIMARY KEY columns are
      * materialized from the rowid. */
    def table(name: String): Option[Table] = master.get(name).map { case (root, sql) =>
      val (cols, ipk) = parseColumns(sql)
      val rows = scan(root).map { case (rowid, vals0) =>
        // rows may have fewer values than columns (added-column defaults)
        val vals = (vals0 ++ Vector.fill(math.max(0, cols.length - vals0.length))(null))
          .take(cols.length)
        val fixed = if (ipk >= 0 && ipk < vals.length && vals(ipk) == null)
          vals.updated(ipk, rowid.asInstanceOf[Any]) else vals
        (rowid, fixed)
      }
      Table(cols, rows)
    }
  }
}
