package graft

/** DuckDB-runnable oracle SQL builders for the cross-engine-verifiable
  * queries. Every formula here MIRRORS the corresponding kernel's floating-
  * point arithmetic (same operations, same association) so the only cross-
  * engine differences are libm ulps, far below each query's quantization.
  *
  * Grid-node VALUES tables are dumped by graft.tools.GridDump from the same
  * files the kernels read (Double.toString round-trip, so the SQL literal
  * parses to the identical double); the grid READERS are locked by the gie
  * corpus (geotiff_grids.gie 51/51, gridshift.gie 59/59), and these oracles
  * lock the Spark-side interpolation + plumbing on top of them.
  */
object OracleSql {

  /** derived point set shared by the geo queries (same arithmetic as
    * SparkEntry.custPoints). */
  private val ptsCte =
    """pts AS (
        SELECT c_custkey AS point_id,
          (((c_custkey*73)%360)-180+0.5)::DOUBLE AS lon,
          (((c_custkey*37)%160)-80+0.25)::DOUBLE AS lat
        FROM customer)"""

  // ---------------------------------------------------------------- lang_id

  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "ing", " of"),
    "es" -> Seq(" de", "de ", " la", "os ", "i\u00f3n", " el", "ent"),
    "fr" -> Seq(" de", "es ", " le", "ent", "de ", " la", "ion"),
    "de" -> Seq("en ", "er ", "ch ", " de", "ein", "sch", "die"))

  def langId: String = {
    val scores = langProfiles.map { case (l, grams) =>
      grams.map(g => s"(length(t)-length(replace(t,'$g','')))/3").mkString("(", " + ", s") AS s_$l")
    }.mkString(",\n      ")
    s"""SELECT lang_pred, count(*) AS n FROM (
      SELECT CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                  WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                  WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS lang_pred
      FROM (SELECT $scores
            FROM (SELECT ' ' || lower(text) || ' ' AS t FROM documents))
    ) GROUP BY 1 ORDER BY 1"""
  }

  // ----------------------------------------------------------- dedup_simhash

  /** 16-bit md5-digit simhash bucket; bit k = majority vote of nibble bit
    * (k%4) of hex digit (13+k/4) over normalized words. */
  def dedupSimhash: String = {
    val bits = (0 until 16).map { k =>
      val pos = 13 + k / 4
      val shift = 1 << (k % 4)
      s"""CASE WHEN list_sum(list_transform(w, x -> CASE WHEN ((strpos('0123456789abcdef', substring(md5(x),$pos,1))-1) // $shift) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1 << k} ELSE 0 END"""
    }.mkString(" + ")
    s"""SELECT bucket, count(*) AS n FROM (
      SELECT ($bits)::BIGINT AS bucket
      FROM (SELECT string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents)
    ) GROUP BY 1 ORDER BY 1"""
  }

  // ----------------------------------------------------------- dedup_minhash

  /** the shared-hash MinHash+LSH candidate CTE chain (base docs with
    * injected near-dups → shingles → md5 hash family → banded candidate
    * pairs → signature-agreement jaccard), reused by the pair query and
    * the cluster query. */
  private def minhashCtes(numHashes: Int, bands: Int): String =
    s"""base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000, text || ' extra' FROM documents WHERE doc_id % 11 = 0),
    words AS (
      SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w FROM base),
    grams AS (
      SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        ELSE list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
      FROM words),
    bh AS (
      SELECT doc_id, ('0x' || substring(md5(g), 1, 7))::BIGINT AS h FROM grams),
    hashed AS (
      SELECT doc_id, k, min((h*(2*k+1) + 12345 + 777*k) % 1000000007) AS h
      FROM bh, range(0, $numHashes) t(k) GROUP BY doc_id, k),
    bands AS (
      SELECT doc_id, b, md5(string_agg(h::VARCHAR, ',' ORDER BY k)) AS band_key
      FROM (SELECT doc_id, k, h, k // ${numHashes / bands} AS b FROM hashed) GROUP BY doc_id, b),
    pairs AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    jac AS (
      SELECT p.da, p.db, CAST(round(sum(CASE WHEN ha.h = hb.h THEN 1 ELSE 0 END) / $numHashes.0 * 1000000) AS BIGINT) AS jacc_ppm
      FROM pairs p JOIN hashed ha ON ha.doc_id = p.da JOIN hashed hb ON hb.doc_id = p.db AND ha.k = hb.k
      GROUP BY 1, 2)"""

  def dedupMinhash(numHashes: Int, bands: Int, thresholdPpm: Long): String =
    s"""WITH ${minhashCtes(numHashes, bands)}
    SELECT da AS doc_a, db AS doc_b, jacc_ppm FROM jac WHERE jacc_ppm >= $thresholdPpm ORDER BY 1, 2"""

  /** connected components over the near-dup pairs: transitive closure by a
    * recursive CTE (label = min doc_id reachable), an algorithm genuinely
    * different from the engine's iterative min-label propagation. */
  def dedupClusters(numHashes: Int, bands: Int, thresholdPpm: Long): String =
    s"""WITH RECURSIVE ${minhashCtes(numHashes, bands)},
    cand AS (SELECT da, db FROM jac WHERE jacc_ppm >= $thresholdPpm),
    edges AS (SELECT da AS a, db AS b FROM cand UNION SELECT db, da FROM cand),
    reach(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b),
    lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
    sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
    SELECT l.doc_id, l.cluster_id, s.cluster_size
    FROM lab l JOIN sz s USING (cluster_id) ORDER BY 1"""

  /** end-to-end near-dup dedup survivors: corpus minus cluster members,
    * plus one representative per cluster (longest text, min doc_id). */
  def dedupKeep(numHashes: Int, bands: Int, thresholdPpm: Long): String =
    s"""WITH RECURSIVE ${minhashCtes(numHashes, bands)},
    cand AS (SELECT da, db FROM jac WHERE jacc_ppm >= $thresholdPpm),
    edges AS (SELECT da AS a, db AS b FROM cand UNION SELECT db, da FROM cand),
    reach(node, label) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b),
    lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
    members AS (
      SELECT b.doc_id, b.text, l.cluster_id,
        row_number() OVER (PARTITION BY l.cluster_id
          ORDER BY length(b.text) DESC, b.doc_id) AS rnk
      FROM base b JOIN lab l USING (doc_id)),
    survivors AS (
      SELECT doc_id, text FROM base WHERE doc_id NOT IN (SELECT doc_id FROM lab)
      UNION ALL
      SELECT doc_id, text FROM members WHERE rnk = 1)
    SELECT doc_id, md5(text) AS fp FROM survivors ORDER BY doc_id"""

  // --------------------------------------------------------------- ann_brute

  def annBrute(k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q_id, e.vec_id AS c_id,
        CAST(round(1000000.0 * (CASE WHEN
          sqrt(list_sum(list_transform(qv, x -> x*x))) * sqrt(list_sum(list_transform(v, x -> x*x))) = 0
          THEN 0.0 ELSE
          list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*v[i]))
          / (sqrt(list_sum(list_transform(qv, x -> x*x))) * sqrt(list_sum(list_transform(v, x -> x*x))))
          END
        )) AS BIGINT) AS cos_ppm
      FROM e, q WHERE e.vec_id <> q_id),
    ranked AS (
      SELECT q_id, c_id, cos_ppm,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_ppm DESC, c_id) AS rnk
      FROM scored)
    SELECT q_id, c_id, cos_ppm, rnk FROM ranked WHERE rnk <= $k ORDER BY q_id, rnk"""

  // ----------------------------------------------------------------- ann_lsh

  def annLsh(k: Int, planes: Int, tables: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    hv AS (
      SELECT t, p, list_transform(range(1, 65), d ->
        (((('0x' || substring(md5(t::VARCHAR || ',' || p::VARCHAR || ',' || (d-1)::VARCHAR), 1, 8))::BIGINT) % 2001) - 1000) / 1000.0) AS h
      FROM range(0, $tables) r1(t), range(0, $planes) r2(p)),
    dots AS (
      SELECT vec_id, t, p,
        list_sum(list_transform(range(1, 65), i -> v[i]*h[i])) AS dot
      FROM e, hv),
    buckets AS (
      SELECT vec_id, t, sum(CASE WHEN dot >= 0 THEN (1 << p) ELSE 0 END) AS bucket
      FROM dots GROUP BY 1, 2),
    qb AS (SELECT vec_id AS q_id, t, bucket FROM buckets WHERE vec_id < 10),
    cand AS (
      SELECT DISTINCT qb.q_id, cb.vec_id AS c_id
      FROM qb JOIN buckets cb ON cb.t = qb.t AND cb.bucket = qb.bucket
      WHERE cb.vec_id <> qb.q_id),
    scored AS (
      SELECT cand.q_id, cand.c_id,
        CAST(round(1000000.0 * (CASE WHEN
          sqrt(list_sum(list_transform(eq.v, x -> x*x))) * sqrt(list_sum(list_transform(ec.v, x -> x*x))) = 0
          THEN 0.0 ELSE
          list_sum(list_transform(range(1, 65), i -> eq.v[i]*ec.v[i]))
          / (sqrt(list_sum(list_transform(eq.v, x -> x*x))) * sqrt(list_sum(list_transform(ec.v, x -> x*x))))
          END
        )) AS BIGINT) AS cos_ppm
      FROM cand JOIN e eq ON eq.vec_id = cand.q_id JOIN e ec ON ec.vec_id = cand.c_id),
    ranked AS (
      SELECT q_id, c_id, cos_ppm,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_ppm DESC, c_id) AS rnk
      FROM scored)
    SELECT q_id, c_id, cos_ppm, rnk FROM ranked WHERE rnk <= $k ORDER BY q_id, rnk"""

  // ----------------------------------------------------------------- ann_ivf

  /** zero-norm similarity is 0, mirroring TrainingOps.cosine's guard. */
  private def cosSql(a: String, b: String): String =
    s"""(CASE WHEN sqrt(list_sum(list_transform($a, x -> x*x))) * sqrt(list_sum(list_transform($b, x -> x*x))) = 0
        THEN 0.0 ELSE
        list_sum(list_transform(range(1, 65), i -> $a[i]*$b[i]))
        / (sqrt(list_sum(list_transform($a, x -> x*x))) * sqrt(list_sum(list_transform($b, x -> x*x))))
        END)"""

  /** IVF with fixed seed centroids (the first nlist corpus vectors,
    * re-keyed 0..nlist-1): assignment = argmax cosine, probes = top-nprobe
    * lists, exact ppm-ranked scoring — mirrors TrainingOps.annIvf(iters=0). */
  def annIvf(k: Int, nlist: Int, nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM e WHERE vec_id < $nlist),
    cs AS (
      SELECT e.vec_id, c.cid, ${cosSql("e.v", "c.cv")} AS s,
        row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.cid) AS rn
      FROM e, cent c),
    asg AS (SELECT vec_id, cid FROM cs WHERE rn = 1),
    probes AS (SELECT vec_id AS q_id, cid FROM cs WHERE rn <= $nprobe AND vec_id < 10),
    cand AS (
      SELECT DISTINCT p.q_id, a.vec_id AS c_id
      FROM probes p JOIN asg a ON a.cid = p.cid WHERE a.vec_id <> p.q_id),
    scored AS (
      SELECT cand.q_id, cand.c_id,
        CAST(round(1000000.0 * ${cosSql("eq.v", "ec.v")}) AS BIGINT) AS cos_ppm
      FROM cand JOIN e eq ON eq.vec_id = cand.q_id JOIN e ec ON ec.vec_id = cand.c_id),
    ranked AS (
      SELECT q_id, c_id, cos_ppm,
        row_number() OVER (PARTITION BY q_id ORDER BY cos_ppm DESC, c_id) AS rnk
      FROM scored)
    SELECT q_id, c_id, cos_ppm, rnk FROM ranked WHERE rnk <= $k ORDER BY q_id, rnk"""

  // ----------------------------------------------------------- dedup_embedding

  /** embedding near-dup via shared-hyperplane LSH buckets + exact cosine
    * threshold; perturbed copies injected like the Spark query. */
  def dedupEmbedding(thresholdPpm: Long, planes: Int, tables: Int): String =
    s"""WITH b0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (
      SELECT * FROM b0
      UNION ALL
      SELECT vec_id + 5000, [v[1] + 0.01] || v[2:64] FROM b0 WHERE vec_id % 13 = 0),
    hv AS (
      SELECT t, p, list_transform(range(1, 65), d ->
        (((('0x' || substring(md5(t::VARCHAR || ',' || p::VARCHAR || ',' || (d-1)::VARCHAR), 1, 8))::BIGINT) % 2001) - 1000) / 1000.0) AS h
      FROM range(0, $tables) r1(t), range(0, $planes) r2(p)),
    dots AS (
      SELECT vec_id, t, p,
        list_sum(list_transform(range(1, 65), i -> v[i]*h[i])) AS dot
      FROM e, hv),
    buckets AS (
      SELECT vec_id, t, sum(CASE WHEN dot >= 0 THEN (1 << p) ELSE 0 END) AS bucket
      FROM dots GROUP BY 1, 2),
    pairs AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
        AND a.vec_id < b.vec_id),
    scored AS (
      SELECT pairs.vec_a, pairs.vec_b,
        CAST(round(1000000.0 * ${cosSql("ea.v", "eb.v")}) AS BIGINT) AS cos_ppm
      FROM pairs JOIN e ea ON ea.vec_id = pairs.vec_a JOIN e eb ON eb.vec_id = pairs.vec_b)
    SELECT vec_a, vec_b, cos_ppm FROM scored WHERE cos_ppm >= $thresholdPpm
    ORDER BY vec_a, vec_b"""

  // ----------------------------------------------------------- doc_fingerprint

  def docFingerprint: String =
    s"""SELECT source, count(*) AS n_docs,
      count(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS n_unique
    FROM (SELECT * FROM documents
          UNION ALL
          SELECT doc_id + 3000000, text, lang, source, n_chars
          FROM documents WHERE doc_id % 9 = 0)
    GROUP BY source ORDER BY source"""

  // ---------------------------------------------------------- geo_datum_shift

  /** cart fwd -> helmert(coordinate_frame, small-angle) -> Bowring inverse,
    * mirroring CoreOps.cart / HelmertOps exactly; micro-degree output. */
  def geoDatumShift: String =
    s"""WITH $ptsCte,
    rad AS (
      SELECT point_id, lon*(pi()/180) AS lam, lat*(pi()/180) AS phi FROM pts),
    fwd AS (
      SELECT point_id,
        1.0/298.257222101 AS ff, 2*ff - ff*ff AS es, 6378137.0 AS aa,
        aa/sqrt(1 - es*sin(phi)*sin(phi)) AS nr,
        nr*cos(phi)*cos(lam) AS X0,
        nr*cos(phi)*sin(lam) AS Y0,
        (nr*(1-es))*sin(phi) AS Z0,
        (-0.0394924/3600)*(pi()/180) AS rx,
        (-0.0327221/3600)*(pi()/180) AS ry,
        (-0.0328979/3600)*(pi()/180) AS rz,
        1 + (-0.009994)*1e-6 AS sc,
        sc*(X0 + rz*Y0 - ry*Z0) + 0.06155 AS X,
        sc*(-rz*X0 + Y0 + rx*Z0) + (-0.01087) AS Y,
        sc*(ry*X0 - rx*Y0 + Z0) + (-0.04019) AS Z
      FROM rad),
    inv AS (
      SELECT point_id, es/(1-es) AS e2s,
        X/aa AS xa, Y/aa AS ya, Z/aa AS za,
        sqrt(xa*xa+ya*ya) AS p, 1-ff AS ba, p*ba AS pb,
        sqrt(za*za+pb*pb) AS nrm,
        pb/nrm AS cth, za/nrm AS sth,
        za + e2s*ba*sth*sth*sth AS yphi,
        p - es*cth*cth*cth AS xphi,
        atan(yphi/xphi) AS phi2, atan2(ya, xa) AS lam2
      FROM fwd)
    SELECT point_id,
      CAST(round(lam2*(180/pi())*1000000) AS BIGINT) AS lon_udeg,
      CAST(round(phi2*(180/pi())*1000000) AS BIGINT) AS lat_udeg
    FROM inv ORDER BY point_id"""

  // ------------------------------------------------------------ geo_s2_cells

  /** S2 face selection + face (u,v) coordinates, mirroring DggOps.faceOf /
    * validFaceXyzToUv; radians via Java Math.toRadians form (x/180*pi). */
  def geoS2Cells: String =
    s"""WITH $ptsCte,
    xyz AS (
      SELECT point_id,
        cos(lat/180.0*pi())*cos(lon/180.0*pi()) AS x,
        cos(lat/180.0*pi())*sin(lon/180.0*pi()) AS y,
        sin(lat/180.0*pi()) AS z
      FROM pts),
    fc AS (
      SELECT point_id, x, y, z,
        CASE WHEN abs(x) > abs(y) THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
             WHEN abs(y) > abs(z) THEN 1 ELSE 2 END AS f0,
        CASE WHEN f0 = 0 AND x < 0 THEN 3
             WHEN f0 = 1 AND y < 0 THEN 4
             WHEN f0 = 2 AND z < 0 THEN 5 ELSE f0 END AS face,
        CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                  WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
        CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                  WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
      FROM xyz)
    SELECT point_id, face,
      CAST(round(u*1e9) AS BIGINT) AS u_nano,
      CAST(round(v*1e9) AS BIGINT) AS v_nano
    FROM fc ORDER BY point_id"""

  // ----------------------------------------- geo_range_partition (full s2 id)

  /** Full 64-bit s2 cell id mirror: face/(u,v) as in [[geoS2Cells]], the
    * quadratic uv->st transform, st->ij discretization, then the Hilbert
    * curve as a 30-step recursive CTE over the published 4-entry traversal
    * tables (posToIJ / posToOrientation, inverted to (orientation, ij) ->
    * (pos, next orientation) — 16 literal rows). Independent of the
    * implementation's 4-bit lookup-table machinery. The range-partition
    * invariants (sorted-within, disjoint ranges) are computed Spark-side
    * from the actual partition layout; this oracle pins them at zero and
    * recomputes rows / distinct / exact min and max of the key. */
  /** CTE chain computing cells(point_id, cell) = the full s2 id at `level`
    * for the shared customer point set — reused by every oracle that needs
    * the real cell key. Must follow a WITH RECURSIVE. */
  private def s2CellsCte(level: Int): String = s"""$ptsCte,
    xyz AS (
      SELECT point_id,
        cos(lat/180.0*pi())*cos(lon/180.0*pi()) AS x,
        cos(lat/180.0*pi())*sin(lon/180.0*pi()) AS y,
        sin(lat/180.0*pi()) AS z
      FROM pts),
    fc AS (
      SELECT point_id, x, y, z,
        CASE WHEN abs(x) > abs(y) THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
             WHEN abs(y) > abs(z) THEN 1 ELSE 2 END AS f0,
        CASE WHEN f0 = 0 AND x < 0 THEN 3
             WHEN f0 = 1 AND y < 0 THEN 4
             WHEN f0 = 2 AND z < 0 THEN 5 ELSE f0 END AS face,
        CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                  WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
        CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                  WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
      FROM xyz),
    ij AS (
      SELECT point_id, face,
        CAST(LEAST(GREATEST(floor(1073741824.0 *
          (CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) ELSE 1-0.5*sqrt(1-3*u) END)
          ), 0), 1073741823) AS BIGINT) AS i,
        CAST(LEAST(GREATEST(floor(1073741824.0 *
          (CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) ELSE 1-0.5*sqrt(1-3*v) END)
          ), 0), 1073741823) AS BIGINT) AS j
      FROM fc),
    hp(o, ij2, pos, no) AS (VALUES
      (0,0,0,1),(0,1,1,0),(0,2,3,3),(0,3,2,0),
      (1,0,0,0),(1,2,1,1),(1,3,2,1),(1,1,3,2),
      (2,3,0,3),(2,2,1,2),(2,0,2,2),(2,1,3,1),
      (3,3,0,2),(3,1,1,3),(3,0,2,3),(3,2,3,0)),
    hseq(k, point_id, i, j, o, n) AS (
      SELECT 29, point_id, i, j, face & 1, CAST(face AS HUGEINT) FROM ij
      UNION ALL
      SELECT r.k - 1, r.point_id, r.i, r.j, hp.no, r.n * 4 + hp.pos
      FROM hseq r JOIN hp ON hp.o = r.o
        AND hp.ij2 = ((r.i >> r.k) & 1) * 2 + ((r.j >> r.k) & 1)
      WHERE r.k >= 0),
    leaf AS (
      SELECT point_id,
        CASE WHEN n * 2 + 1 > 9223372036854775807
             THEN CAST(n * 2 + 1 - 18446744073709551616 AS BIGINT)
             ELSE CAST(n * 2 + 1 AS BIGINT) END AS id
      FROM hseq WHERE k = -1),
    cells AS (
      SELECT point_id,
        (id & -(1::BIGINT << ${2 * (30 - level)})) |
          (1::BIGINT << ${2 * (30 - level)}) AS cell
      FROM leaf)"""

  /** q_stream_window: the closed windows after the four-batch replay —
    * customer cells in the two 5-minute windows (batch A), the late
    * re-sends dropped (batch C contributes nothing), and the two advancer
    * windows closed by later watermarks. */
  def streamWindow: String =
    s"""WITH RECURSIVE ${s2CellsCte(10)},
    ev AS (
      SELECT point_id, cell,
        CASE WHEN point_id % 10 < 5 THEN 1767225600 ELSE 1767225900 END AS w
      FROM cells)
    SELECT CAST(w AS BIGINT) AS win_start, cell, count(*) AS n
    FROM ev GROUP BY w, cell
    UNION ALL
    SELECT CAST(1767229200 AS BIGINT), CAST(-999 AS BIGINT), CAST(1 AS BIGINT)
    UNION ALL
    SELECT CAST(1767232800 AS BIGINT), CAST(-999 AS BIGINT), CAST(1 AS BIGINT)
    ORDER BY win_start, cell"""

  def geoRangePartition: String =
    s"""WITH RECURSIVE ${s2CellsCte(10)}
    SELECT CAST(0 AS BIGINT) AS sort_violations,
      CAST(0 AS BIGINT) AS range_overlaps,
      count(*) AS n_rows, count(DISTINCT cell) AS n_cells,
      min(cell) AS min_cell, max(cell) AS max_cell
    FROM cells"""

  // --------------------------------------------- geo_global_hex (ISEA mirror)

  /** Full SQL mirror of the ISEA forward projection (Snyder 1992 equations
    * 5-14, plane mode, standard ISEA orientation) + the flat-top axial hex
    * binning: coordinate-frame rotation, 20-face search (first face whose
    * great-circle distance passes both the circumradius and the in-triangle
    * azimuth gate), the closed-form equal-area mapping, the unfolded-plane
    * triangle layout, semi-major-axis scaling, then cube-rounded hex
    * assignment. Constants are Snyder's published values; the face table
    * (center sin/cos/lon, azimuth adjustment, flip, plane offsets) is
    * generated from the same published geometry. */
  def geoGlobalHex: String = {
    val DEG120 = 2.09439510239319549229
    val E = 0.91843818701052843323
    val F = 0.18871053078356206978
    val G = 0.6523581397843681859886783
    val TANG = 0.76393202250021030358019673567
    val TAN30 = 0.57735026918962576450914878
    val COTT = 1.0 / TAN30
    val COSG = 0.80901699437494742410229341718281905886
    val SIN_G = 0.587785252292473129168705954639072768597652
    val COS_SDC = 0.7946544722917661229596057297879189448539
    val SGCS = SIN_G * COS_SDC
    val SQRT3 = 1.73205080756887729352744634150587236694280525381038
    val RP = 0.9103832815095032
    val STD_LAT = 1.01722196792335072101
    val STD_LON = 0.19634954084936207740
    val D2R = math.Pi / 180.0
    val TABLE_G = TANG * (SQRT3 / 2.0)
    val TABLE_H = 0.25 * TANG
    val A36 = D2R * 36
    val RPT2 = RP * RP * TANG * TANG
    val RPTANG = RP * TANG
    val TWORP = 2.0 * RP
    val beta = STD_LON + math.Pi
    val sinA = math.sin(STD_LAT); val cosA = math.cos(STD_LAT)
    val zmax = G + 0.000005
    val faces = (0 until 20).map { i =>
      val clatR = if (i < 5) E else if (i < 10) F else if (i < 15) -F else -E
      val lonDeg = Array(-144.0, -72.0, 0.0, 72.0, 144.0)(i % 5) +
        (if (i >= 10) 36.0 else 0.0)
      val lonAdj = if (lonDeg > 180.0) lonDeg - 360.0 else lonDeg // 144+36=180
      val clon = lonAdj * D2R
      val adj = if ((i >= 5 && i <= 9) || i == 15 || i == 16) math.Pi
        else if (i >= 17) -math.Pi else 0.0
      val flip = if ((i / 5) % 2 == 1) -1.0 else 1.0
      var cx = TABLE_G * ((i % 5) - 2) * 2.0
      if (i > 9) cx += TABLE_G
      val cy = (i / 5) match {
        case 0 => 5.0 * TABLE_H; case 1 => TABLE_H
        case 2 => -TABLE_H; case _ => -5.0 * TABLE_H
      }
      s"($i,${math.sin(clatR)},${math.cos(clatR)},$clon,$adj,$flip,${cx * RP},${cy * RP})"
    }.mkString(",")
    val size = 500000.0
    s"""WITH $ptsCte,
    faces(fi, slat, clat, clon, adj, flip, tcx, tcy) AS (VALUES $faces),
    pr AS (
      SELECT point_id, lat*(pi()/180.0) AS phi, lon*(pi()/180.0) AS lam
      FROM pts),
    ct AS (
      SELECT point_id,
        asin(LEAST(GREATEST(
          $sinA*sin(phi) - $cosA*cos(phi)*cos(lam - $beta), -1.0), 1.0)) AS plat,
        atan2(cos(phi)*sin(lam - $beta),
              $sinA*cos(phi)*cos(lam - $beta) + $cosA*sin(phi)) + $beta AS l0
      FROM pr),
    ct2 AS (
      SELECT point_id, plat,
        (l1 - $STD_LON) - 2*pi()*floor(((l1 - $STD_LON) + pi())/(2*pi())) AS plon
      FROM (SELECT point_id, plat,
              l0 - 2*pi()*floor((l0 + pi())/(2*pi())) AS l1 FROM ct)),
    fx AS (
      SELECT p.point_id, f.fi, f.flip, f.tcx, f.tcy,
        acos(LEAST(GREATEST(
          f.slat*sin(p.plat) + f.clat*(cos(p.plat)*cos(p.plon - f.clon)),
          -1.0), 1.0)) AS z,
        atan2(cos(p.plat)*sin(p.plon - f.clon),
              f.clat*sin(p.plat) - f.slat*(cos(p.plat)*cos(p.plon - f.clon)))
          - f.adj AS az0
      FROM ct2 p CROSS JOIN faces f),
    fy AS (
      SELECT *, az0 + (CASE WHEN az0 < 0 THEN 2*pi() ELSE 0 END) AS az1
      FROM fx WHERE z <= $zmax),
    fw AS (
      SELECT *, az1 - m*$DEG120 AS azr FROM (
        SELECT *,
          CASE WHEN az1 > 2*$DEG120 + 2.220446049250313e-16 THEN 2
               WHEN az1 > $DEG120 + 2.220446049250313e-16 THEN 1
               ELSE 0 END AS m
        FROM fy)),
    sel AS (
      SELECT *, row_number() OVER (PARTITION BY point_id ORDER BY fi) AS rn
      FROM (SELECT *, atan2($TANG, cos(azr) + sin(azr)*$COTT) AS qq FROM fw)
      WHERE z <= qq + 0.000005),
    sny AS (
      SELECT point_id, fi, flip, tcx, tcy, z, m, azr, qq,
        azr + $A36 + acos(LEAST(GREATEST(
          sin(azr)*$SGCS - cos(azr)*$COSG, -1.0), 1.0)) - pi() AS ag
      FROM sel WHERE rn = 1),
    sny3 AS (
      SELECT *, atan2(2.0*ag, $RPT2 - 2.0*ag*$COTT) AS azp FROM sny),
    sny5 AS (
      SELECT point_id, flip, tcx, tcy,
        ($TWORP*(($RPTANG/(cos(azp) + sin(azp)*$COTT))
          / ($TWORP*sin(qq/2.0))))*sin(z/2.0) AS rho,
        azp + $DEG120*m AS azp2
      FROM sny3),
    pl AS (
      SELECT point_id,
        (flip*(rho*sin(azp2)) + tcx) * 6378137.0 AS px,
        (flip*(rho*cos(azp2)) + tcy) * 6378137.0 AS py
      FROM sny5),
    hx AS (
      SELECT point_id, px, py,
        (2.0/3.0*px)/$size AS fq,
        (-1.0/3.0*px + sqrt(3.0)/3.0*py)/$size AS fr,
        -fq - fr AS fs,
        floor(fq + 0.5) AS rq, floor(fr + 0.5) AS rr, floor(fs + 0.5) AS rs,
        abs(rq - fq) AS dq, abs(rr - fr) AS dr, abs(rs - fs) AS ds
      FROM pl)
    SELECT point_id,
      CAST(round(px*1000) AS BIGINT) AS x_mm,
      CAST(round(py*1000) AS BIGINT) AS y_mm,
      CAST(CASE WHEN dq > dr AND dq > ds THEN -rr - rs ELSE rq END AS BIGINT) AS q,
      CAST(CASE WHEN NOT (dq > dr AND dq > ds) AND dr > ds
                THEN -rq - rs ELSE rr END AS BIGINT) AS r
    FROM hx ORDER BY point_id"""
  }

  // ----------------------------------------------------------- geo_gridshift

  private val tifNodes: String =
    "(4,0,2.6556574084679596E-5,6.444079335778952E-4)," +
    "(5,0,2.2738053303328343E-5,6.401714636012912E-4)," +
    "(6,0,1.8624463336891495E-5,6.358136306516826E-4)," +
    "(7,0,1.4273096894612536E-5,6.313736666925251E-4)," +
    "(8,0,9.72560064838035E-6,6.268374272622168E-4)," +
    "(9,0,4.997046744392719E-6,6.222081137821078E-4)," +
    "(10,0,6.278590802821782E-8,6.175872404128313E-4)," +
    "(4,1,3.292771361884661E-5,6.440827855840325E-4)," +
    "(5,1,2.8946065867785364E-5,6.400120328180492E-4)," +
    "(6,1,2.4725322873564437E-5,6.35810021776706E-4)," +
    "(7,1,2.0243285689502954E-5,6.314882775768638E-4)," +
    "(8,1,1.5687119230278768E-5,6.270536105148494E-4)," +
    "(9,1,1.0737900993262883E-5,6.225974066182971E-4)," +
    "(10,1,5.647435955324909E-6,6.181069184094667E-4)," +
    "(4,2,3.88004191336222E-5,6.439610733650625E-4)," +
    "(5,2,3.475645280559547E-5,6.400276906788349E-4)," +
    "(6,2,3.04014884022763E-5,6.359480903483927E-4)," +
    "(7,2,2.579584179329686E-5,6.317412480711937E-4)," +
    "(8,2,2.103489896398969E-5,6.274575716815889E-4)," +
    "(9,2,1.5947043721098453E-5,6.231171428225935E-4)," +
    "(10,2,1.0694042430259287E-5,6.187837570905685E-4)," +
    "(4,3,4.467716280487366E-5,6.440458237193525E-4)," +
    "(5,3,4.053585871588439E-5,6.402122089639306E-4)," +
    "(6,3,3.601800563046709E-5,6.362252752296627E-4)," +
    "(7,3,3.134857979603112E-5,6.32172217592597E-4)," +
    "(8,3,2.640741877257824E-5,6.280127563513815E-4)," +
    "(9,3,2.118451266142074E-5,6.23814295977354E-4)," +
    "(10,3,1.568181687616743E-5,6.195697351358831E-4)," +
    "(4,4,5.076054367236793E-5,6.442799931392074E-4)," +
    "(5,4,4.651372000807896E-5,6.405632593668997E-4)," +
    "(6,4,4.191513289697468E-5,6.367171299643815E-4)," +
    "(7,4,3.710275632329285E-5,6.327878800220788E-4)," +
    "(8,4,3.199332786607556E-5,6.287717842496932E-4)," +
    "(9,4,2.660794234543573E-5,6.246872362680733E-4)," +
    "(10,4,2.1036177713540383E-5,6.206220714375377E-4)," +
    "(4,5,5.7254339481005445E-5,6.446695770137012E-4)," +
    "(5,5,5.300367047311738E-5,6.410907371900976E-4)," +
    "(6,5,4.837017331738025E-5,6.37378019746393E-4)," +
    "(7,5,4.349472146714106E-5,6.335640791803598E-4)," +
    "(8,5,3.818197001237422E-5,6.296482170000672E-4)," +
    "(9,5,3.277054929640144E-5,6.257327040657401E-4)," +
    "(10,5,2.7098905775346793E-5,6.218013004399836E-4)," +
    "(4,6,6.44837855361402E-5,6.452350644394755E-4)," +
    "(5,6,6.025331458658911E-5,6.4178736647591E-4)," +
    "(6,6,5.5581345804966986E-5,6.381978746503592E-4)," +
    "(7,6,5.070944826002233E-5,6.3449761364609E-4)," +
    "(8,6,4.532124876277521E-5,6.307334406301379E-4)," +
    "(9,6,3.9830378227634355E-5,6.269390578381717E-4)," +
    "(10,6,3.4037719160551205E-5,6.231782608665526E-4)," +
    "(4,7,7.177638326538727E-5,6.459648138843477E-4)," +
    "(5,7,6.74361945129931E-5,6.42600585706532E-4)," +
    "(6,7,6.285999552346766E-5,6.391055067069829E-4)," +
    "(7,7,5.76692218601238E-5,6.355410441756248E-4)," +
    "(8,7,5.228473310125992E-5,6.319030653685331E-4)," +
    "(9,7,4.663736399379559E-5,6.282599060796201E-4)," +
    "(10,7,4.089953290531412E-5,6.246202392503619E-4)," +
    "(4,8,7.887508400017396E-5,6.467866478487849E-4)," +
    "(5,8,7.442234345944598E-5,6.435112445615232E-4)," +
    "(6,8,6.952018884476274E-5,6.40137295704335E-4)," +
    "(7,8,6.424340244848281E-5,6.366856978274882E-4)," +
    "(8,8,5.872876863577403E-5,6.33196032140404E-4)," +
    "(9,8,5.3069674322614446E-5,6.296718493103981E-4)," +
    "(10,8,4.7104640543693677E-5,6.262037786655128E-4)," +
    "(4,9,8.606931805843487E-5,6.477690767496824E-4)," +
    "(5,9,8.100335980998352E-5,6.446023471653461E-4)," +
    "(6,9,7.570115849375725E-5,6.413214723579586E-4)," +
    "(7,9,7.019137410679832E-5,6.379875703714788E-4)," +
    "(8,9,6.473790563177317E-5,6.345916190184653E-4)," +
    "(9,9,5.869954838999547E-5,6.312239565886557E-4)," +
    "(10,9,5.254607094684616E-5,6.27869158051908E-4)"

  private val gtxNodes: String =
    "(184,134,51.351585388183594),(185,134,51.18162155151367),(186,134,52.52753829956055)," +
    "(187,134,50.90046691894531),(184,135,51.12047576904297),(185,135,49.82252502441406)," +
    "(186,135,51.23637771606445),(187,135,51.670082092285156),(184,136,49.111053466796875)," +
    "(185,136,49.09831619262695),(186,136,49.905460357666016),(187,136,50.23531723022461)," +
    "(184,137,47.55485153198242),(185,137,47.952049255371094),(186,137,49.0360107421875)," +
    "(187,137,49.00468444824219)"

  /** NADCON5 bilinear grid shift, mirroring GridShift2Ops bilinear
    * interpolation; grid georef from GridDump. Output: applied shift in
    * 1e-10 deg units (the shift is ~1.7e-7 deg, so fully resolved). */
  def geoGridshift: String =
    s"""WITH nodes(ix, iy, vlat, vlon) AS (VALUES $tifNodes),
    pts AS (
      SELECT c_custkey AS point_id,
        -95.4995 + (c_custkey % 100) * 0.0008 AS lon,
        36.9212 + (c_custkey % 80) * 0.0018 AS lat
      FROM customer),
    g AS (
      SELECT point_id, lon, lat,
        lon*(pi()/180) AS lam, lat*(pi()/180) AS phi,
        (-95.583333333333330)*(pi()/180) AS west,
        (36.916666666666680)*(pi()/180) AS south,
        (0.016666666666666666)*(pi()/180) AS resx,
        (0.016666666666666666)*(pi()/180) AS resy,
        floor((lam - west)/resx) AS ixf, floor((phi - south)/resy) AS iyf,
        (lam - west)/resx - ixf AS fx, (phi - south)/resy - iyf AS fy,
        CAST(ixf AS INT) AS ix, CAST(iyf AS INT) AS iy,
        fx*(1-fy) AS m10, fx*fy AS m11, (1-fx)*fy AS m01, (1-fx)*(1-fy) AS m00
      FROM pts),
    interp AS (
      SELECT g.point_id, g.lam, g.phi, g.lon, g.lat,
        g.m00*n00.vlon + g.m10*n10.vlon + g.m01*n01.vlon + g.m11*n11.vlon AS dx,
        g.m00*n00.vlat + g.m10*n10.vlat + g.m01*n01.vlat + g.m11*n11.vlat AS dy
      FROM g
      JOIN nodes n00 ON n00.ix = g.ix     AND n00.iy = g.iy
      JOIN nodes n10 ON n10.ix = g.ix + 1 AND n10.iy = g.iy
      JOIN nodes n01 ON n01.ix = g.ix     AND n01.iy = g.iy + 1
      JOIN nodes n11 ON n11.ix = g.ix + 1 AND n11.iy = g.iy + 1)
    SELECT point_id,
      CAST(round(((lam + dx*(1.0/3600/180*pi()))*(180/pi()) - lon)*1e10) AS BIGINT) AS dlon_e10,
      CAST(round(((phi + dy*(1.0/3600/180*pi()))*(180/pi()) - lat)*1e10) AS BIGINT) AS dlat_e10
    FROM interp ORDER BY point_id"""

  // --------------------------------------------------------------- geo_geoid

  /** EGM96 vgridshift undulation, mirroring GridShiftOps.VGrid.interp
    * (forward z += -N); mm output. */
  def geoGeoid: String =
    s"""WITH nodes(ix, iy, nval) AS (VALUES $gtxNodes),
    pts AS (
      SELECT c_custkey AS point_id,
        5.0 + (c_custkey % 100) * 0.02 AS lon,
        45.0 + (c_custkey % 80) * 0.025 AS lat
      FROM customer),
    g AS (
      SELECT point_id,
        lon*(pi()/180) AS lam, lat*(pi()/180) AS phi,
        (-179.625)*(pi()/180) AS west,
        (-89.62430555555557)*(pi()/180) AS south,
        (1.0)*(pi()/180) AS resx,
        (1.0013888888888889)*(pi()/180) AS resy,
        floor((lam - west)/resx) AS ixf, floor((phi - south)/resy) AS iyf,
        (lam - west)/resx - ixf AS gx, (phi - south)/resy - iyf AS gy,
        CAST(ixf AS INT) AS ix, CAST(iyf AS INT) AS iy,
        gx*gy AS gxy
      FROM pts),
    interp AS (
      SELECT g.point_id,
        na.nval*(1.0 - gx - gy + gxy) + nb.nval*(gx - gxy) + nc.nval*(gy - gxy) + nd.nval*gxy AS nv
      FROM g
      JOIN nodes na ON na.ix = g.ix     AND na.iy = g.iy
      JOIN nodes nb ON nb.ix = g.ix + 1 AND nb.iy = g.iy
      JOIN nodes nc ON nc.ix = g.ix     AND nc.iy = g.iy + 1
      JOIN nodes nd ON nd.ix = g.ix + 1 AND nd.iy = g.iy + 1)
    SELECT point_id,
      CAST(round((nv * (-1.0)) * 1000) AS BIGINT) AS undulation_mm
    FROM interp ORDER BY point_id"""

  // ------------------------------------------------------------ geo_utm_native

  /** Per-row zone-native UTM easting/northing via the Karney order-6
    * Krueger alpha-series (public TM formulation, agrees with the engine's
    * Poder/Engsager exact kernel to ~nm inside a zone); sinh/cosh/asinh/
    * atanh spelled with exp/ln since DuckDB lacks the hyperbolics. */
  def geoUtmNative: String =
    s"""WITH $ptsCte,
    z AS (
      SELECT point_id, lon, lat,
        CAST(LEAST(GREATEST(floor((lon+180)/6),0),59)+1 AS INT) AS zone,
        (CAST(LEAST(GREATEST(floor((lon+180)/6),0),59)+1 AS INT)*6 - 183)::DOUBLE AS lon0
      FROM pts),
    c AS (
      SELECT 6378137.0 AS aa, 1.0/298.257223563 AS ff,
        ff*(2-ff) AS es, sqrt(ff*(2-ff)) AS ee, ff/(2-ff) AS n,
        aa/(1+n)*(1 + n*n/4 + n*n*n*n/64 + n*n*n*n*n*n/256) AS a1r,
        n/2 - 2*n*n/3 + 5*n*n*n/16 + 41*n*n*n*n/180 - 127*n*n*n*n*n/288 + 7891*n*n*n*n*n*n/37800 AS k1,
        13*n*n/48 - 3*n*n*n/5 + 557*n*n*n*n/1440 + 281*n*n*n*n*n/630 - 1983433*n*n*n*n*n*n/1935360 AS k2,
        61*n*n*n/240 - 103*n*n*n*n/140 + 15061*n*n*n*n*n/26880 + 167603*n*n*n*n*n*n/181440 AS k3,
        49561*n*n*n*n/161280 - 179*n*n*n*n*n/168 + 6601661*n*n*n*n*n*n/7257600 AS k4,
        34729*n*n*n*n*n/80640 - 3418889*n*n*n*n*n*n/1995840 AS k5,
        212378941*n*n*n*n*n*n/319334400 AS k6),
    t AS (
      SELECT point_id, zone, lat,
        lat*(pi()/180) AS phi, (lon - lon0)*(pi()/180) AS dl,
        tan(phi) AS tau,
        ee*tau/sqrt(1+tau*tau) AS w,
        0.5*ln((1+w)/(1-w)) AS aw,
        (exp(ee*aw) - exp(-ee*aw))/2 AS sg,
        tau*sqrt(1+sg*sg) - sg*sqrt(1+tau*tau) AS taup,
        atan2(taup, cos(dl)) AS xip,
        sin(dl)/sqrt(taup*taup + cos(dl)*cos(dl)) AS q,
        ln(q + sqrt(q*q+1)) AS etap,
        xip + k1*sin(2*xip)*(exp(2*etap)+exp(-2*etap))/2
            + k2*sin(4*xip)*(exp(4*etap)+exp(-4*etap))/2
            + k3*sin(6*xip)*(exp(6*etap)+exp(-6*etap))/2
            + k4*sin(8*xip)*(exp(8*etap)+exp(-8*etap))/2
            + k5*sin(10*xip)*(exp(10*etap)+exp(-10*etap))/2
            + k6*sin(12*xip)*(exp(12*etap)+exp(-12*etap))/2 AS xi,
        etap + k1*cos(2*xip)*(exp(2*etap)-exp(-2*etap))/2
             + k2*cos(4*xip)*(exp(4*etap)-exp(-4*etap))/2
             + k3*cos(6*xip)*(exp(6*etap)-exp(-6*etap))/2
             + k4*cos(8*xip)*(exp(8*etap)-exp(-8*etap))/2
             + k5*cos(10*xip)*(exp(10*etap)-exp(-10*etap))/2
             + k6*cos(12*xip)*(exp(12*etap)-exp(-12*etap))/2 AS eta,
        0.9996*a1r*eta + 500000 AS x,
        0.9996*a1r*xi + (CASE WHEN lat < 0 THEN 10000000 ELSE 0 END) AS y
      FROM z, c)
    SELECT point_id, zone,
      CAST(round(x*1000) AS BIGINT) AS x_mm,
      CAST(round(y*1000) AS BIGINT) AS y_mm
    FROM t ORDER BY point_id"""

  // ---------------------------------------------------------------- geo_epsg

  /** EPSG alias dispatch: EPSG:3857 (spherical web-mercator on the WGS84
    * ellipsoid) + EPSG:4978 (geocentric cart fwd), plus the generic
    * CRS→CRS planner's Lambert-93 (cart hop WGS84→GRS80, then LCC 2SP
    * mirroring MercLccOps.lcc op-for-op) and British National Grid
    * (7-parameter position-vector Helmert inverse + Bowring inverse on
    * airy + Krueger alpha-series tmerc with the lat_0=49 rectifying
    * offset). All closed-form. */
  /** geo_registry: the EPSG:5166 similarity transformation (ED50/UTM31N →
    * ETRS89/UTM31N, EPSG Guidance Note 7.2 worked example) recomputed
    * closed-form from its published parameters: XT0=-129.549 YT0=-208.185,
    * scale M=1.0000015504, rotation 0.000434733333°. The Spark side selects
    * this operation from the generated coordinate-operation database. */
  def geoRegistry: String =
    s"""WITH $ptsCte,
    p AS (
      SELECT point_id,
        280000.0 + (point_id % 300)*100.0 AS ex,
        4450000.0 + (point_id % 400)*150.0 AS ny
      FROM pts),
    c AS (
      SELECT 1.0000015504*cos(0.000434733333*pi()/180) AS cc,
             1.0000015504*sin(0.000434733333*pi()/180) AS ss)
    SELECT point_id,
      CAST(round((-129.549 + ex*cc + ny*ss)*1000) AS BIGINT) AS reg_x_mm,
      CAST(round((-208.185 - ex*ss + ny*cc)*1000) AS BIGINT) AS reg_y_mm
    FROM p, c
    ORDER BY point_id"""

  /** geo_dispatch: per-row operation selection over the ED50 -> WGS 84
    * candidate field. The candidate table (extents, accuracies, areas,
    * offshore/unknown-area/priority/instantiable flags, published
    * 3/7-parameter values) is emitted from the SAME dispatch plan the Spark
    * expression compiles — shared data, like the grid-node dumps — while
    * the selection rule is re-implemented in SQL as the reference's exact
    * pj_get_suggested_operation fold (trans.cpp:47-150): the first extent
    * match is taken unconditionally; a later candidate displaces it only
    * when onshore AND (strictly better known accuracy OR same-accuracy
    * smaller-area, never unknown-area over known-area, never over a
    * priority null-transform); no match falls back to the first gridless
    * instantiable candidate. (The runtime's retry-on-transform-failure leg
    * is unreachable here: helmert/noop candidates cannot fail.) The chosen
    * small-angle Helmert + cart/Bowring round-trip is re-implemented in
    * SQL. */
  def geoDispatch: String = {
    val d = new graft.spark.RegistryDispatch("EPSG:4230", "EPSG:4326")
    val helm = """proj=helmert (.*?)(?: step|$)""".r
    def b2i(b: Boolean) = if (b) 1 else 0
    val rows = d.pipeStrs.zip(d.metas).zipWithIndex.map { case ((pipe, m), i) =>
      require(m.boxes.length == 4, s"multi-box candidate $i needs oracle support")
      val noop = pipe == "proj=noop"
      val p = scala.collection.mutable.Map.empty[String, Double]
      var pv = 0
      if (!noop) helm.findFirstMatchIn(pipe).foreach { mm =>
        mm.group(1).trim.split(" ").foreach { kv =>
          val eq = kv.indexOf('=')
          if (eq > 0) {
            val k = kv.substring(0, eq); val v = kv.substring(eq + 1)
            if (k == "convention") pv = if (v == "position_vector") 1 else 0
            else p(k) = v.toDouble
          }
        }
      }
      def g(k: String) = p.getOrElse(k, 0.0)
      s"(${i}, ${m.boxes(0)}, ${m.boxes(1)}, ${m.boxes(2)}, ${m.boxes(3)}, " +
        s"${m.accuracy}, ${m.pseudoArea}, ${b2i(m.offshore)}, " +
        s"${b2i(m.unknownArea)}, ${b2i(m.priority)}, ${b2i(m.instantiable)}, " +
        s"${b2i(!m.hasGrids)}, " +
        s"${if (noop) 1 else 0}, ${g("x")}, ${g("y")}, ${g("z")}, " +
        s"${g("rx")}, ${g("ry")}, ${g("rz")}, ${g("s")}, $pv)"
    }.mkString(",\n      ")
    // input lons are already in [-180, 180]: normLon is the identity here
    s"""WITH RECURSIVE $ptsCte,
    f AS (
      SELECT point_id,
        (point_id % 400)*0.1 - 9.0 AS lon,
        36.0 + (point_id % 300)*0.1 AS lat
      FROM pts),
    cand(ord, w, s, e, n, acc, area, offsh, unk, pri, inst, nogrids,
         noop, tx, ty, tz, rxas, ryas, rzas, dsppm, pv) AS (VALUES
      $rows),
    m AS ( -- instantiable extent matches, in candidate order
      SELECT f.point_id, c.ord, c.acc, c.area, c.offsh, c.unk, c.pri,
        ROW_NUMBER() OVER (PARTITION BY f.point_id ORDER BY c.ord) AS seq
      FROM f JOIN cand c
        ON c.inst = 1 AND f.lon >= c.w AND f.lat >= c.s
          AND f.lon <= c.e AND f.lat <= c.n),
    rec AS ( -- the suggested-operation fold, one candidate per step
      SELECT point_id, seq, ord AS bord, acc AS bacc, area AS barea,
             unk AS bunk, pri AS bpri
      FROM m WHERE seq = 1
      UNION ALL
      SELECT point_id, seq,
        CASE WHEN repl THEN ord  ELSE bord  END,
        CASE WHEN repl THEN acc  ELSE bacc  END,
        CASE WHEN repl THEN area ELSE barea END,
        CASE WHEN repl THEN unk  ELSE bunk  END,
        CASE WHEN repl THEN pri  ELSE bpri  END
      FROM (
        SELECT m.point_id, m.seq, m.ord, m.acc, m.area, m.unk, m.pri,
          r.bord, r.bacc, r.barea, r.bunk, r.bpri,
          (m.offsh = 0 AND ((m.acc >= 0 AND m.acc < r.bacc)
            OR (m.acc = r.bacc AND m.area < r.barea
                AND NOT (m.unk = 1 AND r.bunk = 0)
                AND r.bpri = 0))) AS repl
        FROM rec r JOIN m ON m.point_id = r.point_id AND m.seq = r.seq + 1)),
    pick AS (
      SELECT point_id, bord FROM (
        SELECT point_id, bord,
          ROW_NUMBER() OVER (PARTITION BY point_id ORDER BY seq DESC) AS rn
        FROM rec) WHERE rn = 1),
    fb AS ( -- gridless fallback when no extent matches
      SELECT min(ord) AS ford FROM cand WHERE nogrids = 1 AND inst = 1),
    sel AS (
      SELECT f.point_id, f.lon, f.lat,
        COALESCE(p.bord, (SELECT ford FROM fb)) AS ord
      FROM f LEFT JOIN pick p USING (point_id)),
    j AS (
      SELECT sel.point_id, sel.lon, sel.lat, sel.ord, c.noop,
        c.tx, c.ty, c.tz,
        (c.rxas/3600)*pi()/180 AS rx, (c.ryas/3600)*pi()/180 AS ry,
        (c.rzas/3600)*pi()/180 AS rz,
        1 + c.dsppm*1e-6 AS sc, c.pv
      FROM sel JOIN cand c ON c.ord = sel.ord),
    g AS ( -- cart forward on International 1924
      SELECT point_id, lon, lat, ord, noop, tx, ty, tz, rx, ry, rz, sc, pv,
        lon*pi()/180 AS lam, lat*pi()/180 AS phi,
        1.0/297.0 AS ffi, 2*ffi - ffi*ffi AS esi, 6378388.0 AS ai,
        ai/sqrt(1 - esi*sin(phi)*sin(phi)) AS nr,
        nr*cos(phi)*cos(lam) AS X0,
        nr*cos(phi)*sin(lam) AS Y0,
        (nr*(1-esi))*sin(phi) AS Z0
      FROM j),
    h AS ( -- small-angle helmert, coordinate_frame rows; pv transposes
      SELECT point_id, lon, lat, ord, noop,
        CASE WHEN pv = 1
          THEN sc*(X0 - rz*Y0 + ry*Z0) + tx
          ELSE sc*(X0 + rz*Y0 - ry*Z0) + tx END AS X,
        CASE WHEN pv = 1
          THEN sc*(rz*X0 + Y0 - rx*Z0) + ty
          ELSE sc*(-rz*X0 + Y0 + rx*Z0) + ty END AS Y,
        CASE WHEN pv = 1
          THEN sc*(-ry*X0 + rx*Y0 + Z0) + tz
          ELSE sc*(ry*X0 - rx*Y0 + Z0) + tz END AS Z
      FROM g),
    b AS ( -- Bowring inverse on WGS 84
      SELECT point_id, lon, lat, ord, noop,
        1.0/298.257223563 AS ffw, 2*ffw - ffw*ffw AS esw, 6378137.0 AS aw,
        esw/(1-esw) AS e2s, X/aw AS xa, Y/aw AS ya, Z/aw AS za,
        sqrt(xa*xa+ya*ya) AS pp, 1-ffw AS ba, pp*ba AS pb,
        sqrt(za*za+pb*pb) AS nrm, pb/nrm AS cth, za/nrm AS sth,
        atan((za + e2s*ba*sth*sth*sth)/(pp - esw*cth*cth*cth)) AS phi2,
        atan2(ya, xa) AS lam2
      FROM h)
    SELECT point_id, ord AS op,
      CAST(round(CASE WHEN noop = 1 THEN lon ELSE lam2*180/pi() END * 1e8) AS BIGINT) AS x_e8,
      CAST(round(CASE WHEN noop = 1 THEN lat ELSE phi2*180/pi() END * 1e8) AS BIGINT) AS y_e8
    FROM b
    ORDER BY point_id"""
  }

  def geoEpsg: String =
    s"""WITH $ptsCte,
    c AS (SELECT 6378137.0 AS aa, 1.0/298.257223563 AS ff, 2*ff - ff*ff AS es),
    t AS (
      SELECT point_id,
        lon*(pi()/180) AS lam, lat*(pi()/180) AS phi,
        aa/sqrt(1 - es*sin(phi)*sin(phi)) AS nr
      FROM pts, c),
    o AS (
      SELECT point_id,
        6378137.0*lam AS wm_x,
        6378137.0*ln(tan(pi()/4 + phi/2)) AS wm_y,
        nr*cos(phi)*cos(lam) AS gc_x,
        nr*cos(phi)*sin(lam) AS gc_y,
        (nr*(1-(SELECT es FROM c)))*sin(phi) AS gc_z
      FROM t),
    -- France/UK-domain inputs (same derivation as the Spark side)
    f AS (
      SELECT point_id,
        ((point_id % 600)*0.01 + 0.005)*(pi()/180) AS lamf,
        (44.0 + (point_id % 700)*0.01)*(pi()/180) AS phif,
        ((point_id % 500)*0.01 - 4.5)*(pi()/180) AS lamb,
        (50.0 + (point_id % 550)*0.01)*(pi()/180) AS phib
      FROM pts),
    -- Lambert-93 leg: cart fwd on WGS84, Bowring inverse on GRS80
    l1 AS (
      SELECT point_id,
        1.0/298.257223563 AS ffw, 2*ffw - ffw*ffw AS esw, 6378137.0 AS aa,
        aa/sqrt(1 - esw*sin(phif)*sin(phif)) AS nr,
        nr*cos(phif)*cos(lamf) AS X,
        nr*cos(phif)*sin(lamf) AS Y,
        (nr*(1-esw))*sin(phif) AS Z
      FROM f),
    l2 AS (
      -- aag, not aa: l1 carries an aa column (same value here, but the
      -- shadowing rule bit the BNG leg — keep both legs collision-free)
      SELECT point_id,
        1.0/298.257222101 AS ffg, 2*ffg - ffg*ffg AS esg, 6378137.0 AS aag,
        esg/(1-esg) AS e2s, X/aag AS xa, Y/aag AS ya, Z/aag AS za,
        sqrt(xa*xa+ya*ya) AS p, 1-ffg AS ba, p*ba AS pb,
        sqrt(za*za+pb*pb) AS nrm, pb/nrm AS cth, za/nrm AS sth,
        atan((za + e2s*ba*sth*sth*sth)/(p - esg*cth*cth*cth)) AS phi2,
        atan2(ya, xa) AS lam2
      FROM l1),
    -- LCC 2SP consts on GRS80: phi1=49, phi2=44, phi0=46.5, lon0=3
    lc AS (
      SELECT 1.0/298.257222101 AS ff, ff*(2-ff) AS es, sqrt(es) AS e,
        49*(pi()/180) AS p1, 44*(pi()/180) AS p2, 46.5*(pi()/180) AS p0,
        cos(p1)/sqrt(1-es*sin(p1)*sin(p1)) AS m1,
        cos(p2)/sqrt(1-es*sin(p2)*sin(p2)) AS m2,
        exp(e*0.5*ln((1+e*sin(p1))/(1-e*sin(p1))))*cos(p1)/(1+sin(p1)) AS ts1,
        exp(e*0.5*ln((1+e*sin(p2))/(1-e*sin(p2))))*cos(p2)/(1+sin(p2)) AS ts2,
        exp(e*0.5*ln((1+e*sin(p0))/(1-e*sin(p0))))*cos(p0)/(1+sin(p0)) AS ts0,
        ln(m1/m2)/ln(ts1/ts2) AS nn,
        m1*power(ts1, -nn)/nn AS c0,
        c0*power(ts0, nn) AS rho0),
    l3 AS (
      SELECT point_id,
        c0*power(exp(e*0.5*ln((1+e*sin(phi2))/(1-e*sin(phi2))))
                 *cos(phi2)/(1+sin(phi2)), nn) AS rho,
        (lam2 - 3*(pi()/180))*nn AS th,
        6378137.0*rho*sin(th) + 700000 AS l93_x,
        6378137.0*(rho0 - rho*cos(th)) + 6600000 AS l93_y
      FROM l2, lc),
    -- BNG leg: cart fwd WGS84, inverse position-vector Helmert (OSGB36
    -- towgs84 446.448,-125.157,542.06,0.15,0.247,0.842,-20.489), Bowring
    -- inverse on airy
    b1 AS (
      SELECT point_id,
        1.0/298.257223563 AS ffw, 2*ffw - ffw*ffw AS esw, 6378137.0 AS aa,
        aa/sqrt(1 - esw*sin(phib)*sin(phib)) AS nr,
        nr*cos(phib)*cos(lamb) AS X0,
        nr*cos(phib)*sin(lamb) AS Y0,
        (nr*(1-esw))*sin(phib) AS Z0,
        (0.15/3600)*(pi()/180) AS rx,
        (0.247/3600)*(pi()/180) AS ry,
        (0.842/3600)*(pi()/180) AS rz,
        1 + (-20.489)*1e-6 AS sc,
        (X0 - 446.448)/sc AS x1, (Y0 + 125.157)/sc AS y1, (Z0 - 542.06)/sc AS z1,
        x1 + rz*y1 - ry*z1 AS X,
        -rz*x1 + y1 + rx*z1 AS Y,
        ry*x1 - rx*y1 + z1 AS Z
      FROM f),
    b2 AS (
      -- alias must NOT be named aa: b1 carries an aa column (WGS84) and
      -- DuckDB resolves an existing FROM column before a lateral alias
      SELECT point_id,
        1.0/299.3249646 AS ffa, 2*ffa - ffa*ffa AS esa, 6377563.396 AS aab,
        esa/(1-esa) AS e2s, X/aab AS xa, Y/aab AS ya, Z/aab AS za,
        sqrt(xa*xa+ya*ya) AS p, 1-ffa AS ba, p*ba AS pb,
        sqrt(za*za+pb*pb) AS nrm, pb/nrm AS cth, za/nrm AS sth,
        atan((za + e2s*ba*sth*sth*sth)/(p - esa*cth*cth*cth)) AS phi2,
        atan2(ya, xa) AS lam2
      FROM b1),
    -- Krueger alpha-series tmerc on airy, k0=0.9996012717, lon0=-2,
    -- x0=400000, y0=-100000, lat_0=49 (xi0 subtraction = etmerc Zb)
    bc AS (
      SELECT 6377563.396 AS aa, 1.0/299.3249646 AS ff,
        ff*(2-ff) AS es, sqrt(ff*(2-ff)) AS ee, ff/(2-ff) AS n,
        aa/(1+n)*(1 + n*n/4 + n*n*n*n/64 + n*n*n*n*n*n/256) AS a1r,
        n/2 - 2*n*n/3 + 5*n*n*n/16 + 41*n*n*n*n/180 - 127*n*n*n*n*n/288 + 7891*n*n*n*n*n*n/37800 AS k1,
        13*n*n/48 - 3*n*n*n/5 + 557*n*n*n*n/1440 + 281*n*n*n*n*n/630 - 1983433*n*n*n*n*n*n/1935360 AS k2,
        61*n*n*n/240 - 103*n*n*n*n/140 + 15061*n*n*n*n*n/26880 + 167603*n*n*n*n*n*n/181440 AS k3,
        49561*n*n*n*n/161280 - 179*n*n*n*n*n/168 + 6601661*n*n*n*n*n*n/7257600 AS k4,
        34729*n*n*n*n*n/80640 - 3418889*n*n*n*n*n*n/1995840 AS k5,
        212378941*n*n*n*n*n*n/319334400 AS k6,
        0.9996012717 AS bk0,
        tan(49*(pi()/180)) AS tau0,
        ee*tau0/sqrt(1+tau0*tau0) AS w0,
        0.5*ln((1+w0)/(1-w0)) AS aw0,
        (exp(ee*aw0) - exp(-ee*aw0))/2 AS sg0,
        tau0*sqrt(1+sg0*sg0) - sg0*sqrt(1+tau0*tau0) AS taup0,
        atan2(taup0, 1.0) AS xip0,
        xip0 + k1*sin(2*xip0) + k2*sin(4*xip0) + k3*sin(6*xip0)
             + k4*sin(8*xip0) + k5*sin(10*xip0) + k6*sin(12*xip0) AS xi0),
    b3 AS (
      SELECT point_id,
        phi2 AS phi, lam2 - (-2)*(pi()/180) AS dl,
        tan(phi) AS tau,
        ee*tau/sqrt(1+tau*tau) AS w,
        0.5*ln((1+w)/(1-w)) AS aw,
        (exp(ee*aw) - exp(-ee*aw))/2 AS sg,
        tau*sqrt(1+sg*sg) - sg*sqrt(1+tau*tau) AS taup,
        atan2(taup, cos(dl)) AS xip,
        sin(dl)/sqrt(taup*taup + cos(dl)*cos(dl)) AS q,
        ln(q + sqrt(q*q+1)) AS etap,
        xip + k1*sin(2*xip)*(exp(2*etap)+exp(-2*etap))/2
            + k2*sin(4*xip)*(exp(4*etap)+exp(-4*etap))/2
            + k3*sin(6*xip)*(exp(6*etap)+exp(-6*etap))/2
            + k4*sin(8*xip)*(exp(8*etap)+exp(-8*etap))/2
            + k5*sin(10*xip)*(exp(10*etap)+exp(-10*etap))/2
            + k6*sin(12*xip)*(exp(12*etap)+exp(-12*etap))/2 AS xi,
        etap + k1*cos(2*xip)*(exp(2*etap)-exp(-2*etap))/2
             + k2*cos(4*xip)*(exp(4*etap)-exp(-4*etap))/2
             + k3*cos(6*xip)*(exp(6*etap)-exp(-6*etap))/2
             + k4*cos(8*xip)*(exp(8*etap)-exp(-8*etap))/2
             + k5*cos(10*xip)*(exp(10*etap)-exp(-10*etap))/2
             + k6*cos(12*xip)*(exp(12*etap)-exp(-12*etap))/2 AS eta,
        bk0*a1r*eta + 400000 AS bng_x,
        bk0*a1r*(xi - xi0) - 100000 AS bng_y
      FROM b2, bc)
    SELECT o.point_id,
      CAST(round(wm_x*1000) AS BIGINT) AS wm_x_mm,
      CAST(round(wm_y*1000) AS BIGINT) AS wm_y_mm,
      CAST(round(gc_x*1000) AS BIGINT) AS gc_x_mm,
      CAST(round(gc_y*1000) AS BIGINT) AS gc_y_mm,
      CAST(round(gc_z*1000) AS BIGINT) AS gc_z_mm,
      CAST(round(l93_x*1000) AS BIGINT) AS l93_x_mm,
      CAST(round(l93_y*1000) AS BIGINT) AS l93_y_mm,
      CAST(round(bng_x*1000) AS BIGINT) AS bng_x_mm,
      CAST(round(bng_y*1000) AS BIGINT) AS bng_y_mm
    FROM o JOIN l3 ON o.point_id = l3.point_id
           JOIN b3 ON o.point_id = b3.point_id
    ORDER BY o.point_id"""

  // ------------------------------------------------------------ media_features

  /** closed-form expectations for the round trip real-encode -> real-parse
    * (MediaCodecs): the parameter derivation in MultimodalOps.encodeFor. */
  def mediaFeatures: String =
    s"""SELECT doc_id,
      CASE doc_id % 3 WHEN 1 THEN 'audio' ELSE 'image' END AS media_kind,
      CAST(CASE doc_id % 3
           WHEN 0 THEN (16 + (doc_id % 16)*4)
                       // (CASE WHEN ((doc_id // 3) % 3) = 0 THEN 1 ELSE 2 END)
           WHEN 2 THEN 32 + (doc_id % 100) ELSE 0 END AS BIGINT) AS width,
      CAST(CASE doc_id % 3
           WHEN 0 THEN (16 + ((doc_id*7) % 16)*4)
                       // (CASE WHEN ((doc_id // 3) % 3) = 0 THEN 1 ELSE 2 END)
           WHEN 2 THEN 32 + ((doc_id*13) % 100) ELSE 0 END AS BIGINT) AS height,
      CAST(CASE doc_id % 3 WHEN 1 THEN 8000*(1 + doc_id % 6) ELSE 0 END AS BIGINT) AS sample_rate,
      CAST(CASE doc_id % 3
           WHEN 0 THEN (CASE ((doc_id // 3) % 3) WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)
           WHEN 1 THEN 1 + doc_id % 2
           ELSE 3 END AS BIGINT) AS channels
    FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------- media_pixels

  /** Independent per-pixel reconstruction of the engine's PNG payloads:
    * the encoder draws w*h*channels pixel bytes from a 64-bit LCG (s =
    * s*M + A, top byte) in scanline order, then encodes each scanline
    * with filter (seed + row) % 5 — so the Spark side must implement real
    * Sub/Up/Average/Paeth reconstruction to recover this stream. DuckDB
    * emulates the LCG wrap-around with HUGEINT (mod 2^64) in a recursive
    * CTE and folds the same sum and index-weighted polynomial hash the
    * engine computes from the REAL inflate+unfilter decode. Channel
    * count cycles gray/RGB/RGBA by (doc_id/3) % 3; multi-channel images
    * halve each dimension (matching MultimodalOps.encodeFor). */
  def mediaPixels: String =
    s"""WITH RECURSIVE png AS (
      SELECT doc_id,
        CASE ((doc_id // 3) % 3) WHEN 0 THEN CAST(1 AS BIGINT)
             WHEN 1 THEN 3 ELSE 4 END AS ch,
        (16 + (doc_id % 16)*4) // (CASE WHEN ch = 1 THEN 1 ELSE 2 END) AS w,
        (16 + ((doc_id*7) % 16)*4) // (CASE WHEN ch = 1 THEN 1 ELSE 2 END) AS h
      FROM documents WHERE doc_id % 3 = 0),
    gen AS (
      SELECT doc_id, w * h * ch AS n, CAST(0 AS BIGINT) AS i,
             CAST(doc_id AS HUGEINT) AS s,
             CAST(0 AS BIGINT) AS px_sum, CAST(0 AS BIGINT) AS px_poly
      FROM png
      UNION ALL
      SELECT doc_id, n, i + 1, s2,
        px_sum + b,
        (px_poly + b * (i + 1)) % 1000000007
      FROM (
        SELECT doc_id, n, i, px_sum, px_poly,
          (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s2,
          CAST((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
               // 72057594037927936 AS BIGINT) AS b
        FROM gen WHERE i < n) t)
    SELECT doc_id, CAST(n AS BIGINT) AS n_px, px_sum, px_poly
    FROM gen WHERE i = n
    ORDER BY doc_id"""

  /** JPEG counterpart of mediaPixels: the baseline encoder draws one
    * quantized DC per 8x8 block from the same LCG (dc = top byte % 193 -
    * 96); with the DC quantizer at 8 the IDCT of a DC-only block is the
    * exact flat value dc + 128, so DuckDB regenerates the block stream and
    * folds the per-pixel statistics in closed form — the index-weighted
    * polynomial sums each block's raster positions analytically
    * (sum over an 8x8 block at (bx,by) of (row*W + col + 1) =
    * 64*(by*8*W + bx*8 + 1) + 224*W + 224). */
  /** Progressive-JPEG mirror: three LCG draws per block (dc, a1, a2). The
    * AC bases at natural (4,0) and (4,4) contribute exactly ±2*a per pixel
    * with the (+,-,-,+,+,-,-,+) column/checker pattern, which is
    * orthogonal to the constant and global-linear folds (their block sums
    * are 41616*v-only like the baseline) but shows in px_chk through the
    * quadratic in-block weight: sum s(x)*(1+x)^2 = 8, sum (1+y)^2 = 204,
    * so each block adds 41616*v + 3264*a1 + 128*a2. */
  def mediaJpegProg: String =
    s"""WITH RECURSIVE jpg AS (
      SELECT doc_id,
        CAST(8 * (1 + doc_id % 6) AS BIGINT) AS w,
        CAST(8 * (1 + (doc_id*7) % 6) AS BIGINT) AS h
      FROM documents WHERE doc_id % 3 = 0),
    gen AS (
      SELECT doc_id, w, h, (w//8)*(h//8) AS nb, CAST(0 AS BIGINT) AS k,
             CAST(doc_id AS HUGEINT) AS s,
             CAST(0 AS BIGINT) AS px_sum, CAST(0 AS BIGINT) AS px_poly,
             CAST(0 AS BIGINT) AS px_chk
      FROM jpg
      UNION ALL
      SELECT doc_id, w, h, nb, k + 1, s3,
        px_sum + 64 * v,
        (px_poly + v * (64 * ((k // (w//8)) * 8 * w + (k % (w//8)) * 8 + 1)
                        + 224 * w + 224)) % 1000000007,
        (px_chk + 41616 * v + 3264 * a1 + 128 * a2) % 1000000007
      FROM (
        SELECT doc_id, w, h, nb, k, px_sum, px_poly, px_chk,
          (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s1,
          (s1 * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s2,
          (s2 * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s3,
          CAST(s1 // 72057594037927936 AS BIGINT) % 193 - 96 + 128 AS v,
          CAST(s2 // 72057594037927936 AS BIGINT) % 13 - 6 AS a1,
          CAST(s3 // 72057594037927936 AS BIGINT) % 13 - 6 AS a2
        FROM gen WHERE k < nb) t)
    SELECT doc_id, w * h AS n_px, px_sum, px_poly, px_chk
    FROM gen WHERE k = nb
    ORDER BY doc_id"""

  /** media_resize mirror: after the aligned factor-2 area average every
    * 8x8 flat block becomes a 4x4 flat block of the same value in the
    * (w/2)-wide raster; fold the same statistics over that plane. */
  def mediaResize: String =
    s"""WITH RECURSIVE jpg AS (
      SELECT doc_id,
        CAST(8 * (1 + doc_id % 6) AS BIGINT) AS w,
        CAST(8 * (1 + (doc_id*5) % 6) AS BIGINT) AS h
      FROM documents WHERE doc_id % 3 = 2),
    gen AS (
      SELECT doc_id, w, h, (w//8)*(h//8) AS nb, CAST(0 AS BIGINT) AS k,
             CAST(doc_id AS HUGEINT) AS s,
             CAST(0 AS BIGINT) AS px_sum, CAST(0 AS BIGINT) AS px_poly
      FROM jpg
      UNION ALL
      SELECT doc_id, w, h, nb, k + 1, s2,
        px_sum + 16 * v,
        (px_poly + v * (16 * ((k // (w//8)) * 4 * (w//2) + (k % (w//8)) * 4 + 1)
                        + 24 * (w//2) + 24)) % 1000000007
      FROM (
        SELECT doc_id, w, h, nb, k, px_sum, px_poly,
          (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s2,
          CAST((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
               // 72057594037927936 AS BIGINT) % 193 - 96 + 128 AS v
        FROM gen WHERE k < nb) t)
    SELECT doc_id, (w//2) * (h//2) AS n_px, px_sum, px_poly
    FROM gen WHERE k = nb
    ORDER BY doc_id"""

  def mediaJpeg: String =
    s"""WITH RECURSIVE jpg AS (
      SELECT doc_id,
        CAST(8 * (1 + doc_id % 6) AS BIGINT) AS w,
        CAST(8 * (1 + (doc_id*5) % 6) AS BIGINT) AS h
      FROM documents WHERE doc_id % 3 = 2),
    gen AS (
      SELECT doc_id, w, h, (w//8)*(h//8) AS nb, CAST(0 AS BIGINT) AS k,
             CAST(doc_id AS HUGEINT) AS s,
             CAST(0 AS BIGINT) AS px_sum, CAST(0 AS BIGINT) AS px_poly
      FROM jpg
      UNION ALL
      SELECT doc_id, w, h, nb, k + 1, s2,
        px_sum + 64 * v,
        (px_poly + v * (64 * ((k // (w//8)) * 8 * w + (k % (w//8)) * 8 + 1)
                        + 224 * w + 224)) % 1000000007
      FROM (
        SELECT doc_id, w, h, nb, k, px_sum, px_poly,
          (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s2,
          CAST((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
               // 72057594037927936 AS BIGINT) % 193 - 96 + 128 AS v
        FROM gen WHERE k < nb) t)
    SELECT doc_id, w * h AS n_px, px_sum, px_poly
    FROM gen WHERE k = nb
    ORDER BY doc_id"""

  /** Audio counterpart of mediaPixels: the WAV encoder draws signed 16-bit
    * PCM samples from the same LCG (top 16 bits); DuckDB re-generates
    * every sample (b in 0..65535, signed = b - 65536 when b >= 32768) and
    * folds the same sum + index-weighted polynomial (Scala's and DuckDB's
    * % both take the dividend's sign, so negative samples mod
    * identically). */
  def mediaSamples: String =
    s"""WITH RECURSIVE wav AS (
      SELECT doc_id,
        CAST((64 + doc_id % 64) * (1 + doc_id % 2) AS BIGINT) AS n
      FROM documents WHERE doc_id % 3 = 1),
    gen AS (
      SELECT doc_id, n, CAST(0 AS BIGINT) AS i, CAST(doc_id AS HUGEINT) AS s,
             CAST(0 AS BIGINT) AS smp_sum, CAST(0 AS BIGINT) AS smp_poly
      FROM wav
      UNION ALL
      SELECT doc_id, n, i + 1, s2,
        smp_sum + sv,
        (smp_poly + sv * (i + 1)) % 1000000007
      FROM (
        SELECT doc_id, n, i, smp_sum, smp_poly,
          (s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS s2,
          CAST((s * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
               // 281474976710656 AS BIGINT) AS b16,
          CASE WHEN b16 >= 32768 THEN b16 - 65536 ELSE b16 END AS sv
        FROM gen WHERE i < n) t)
    SELECT doc_id, CAST(n AS BIGINT) AS n_smp, smp_sum, smp_poly
    FROM gen WHERE i = n
    ORDER BY doc_id"""

  // ---------------------------------------------------- geo_geodesic_meridian

  /** Karney inverse along a meridian == Helmert meridian-arc series
    * (order n^5, error ~1e-10 m on WGS84); mm output. */
  def geoGeodesicMeridian: String =
    s"""WITH pts AS (
      SELECT c_custkey AS point_id,
        (((c_custkey*37)%140)-70+0.25)::DOUBLE AS lat1,
        (((c_custkey*37)%140)-70+0.25+5.5)::DOUBLE AS lat2
      FROM customer),
    c AS (
      SELECT 6378137.0 AS aa, 1.0/298.257223563 AS ff, ff/(2-ff) AS n,
        aa/(1+n)*(1 + n*n/4 + n*n*n*n/64 + n*n*n*n*n*n/256 + 25*n*n*n*n*n*n*n*n/16384) AS ar,
        -3*n/2 + 9*n*n*n/16 - 3*n*n*n*n*n/32 AS d1,
        15*n*n/16 - 15*n*n*n*n/32 AS d2,
        -35*n*n*n/48 + 105*n*n*n*n*n/256 AS d3,
        315*n*n*n*n/512 AS d4,
        -693*n*n*n*n*n/1280 AS d5),
    m AS (
      SELECT point_id,
        lat1*(pi()/180) AS p1, lat2*(pi()/180) AS p2,
        ar*(p1 + d1*sin(2*p1) + d2*sin(4*p1) + d3*sin(6*p1) + d4*sin(8*p1) + d5*sin(10*p1)) AS m1,
        ar*(p2 + d1*sin(2*p2) + d2*sin(4*p2) + d3*sin(6*p2) + d4*sin(8*p2) + d5*sin(10*p2)) AS m2
      FROM pts, c)
    SELECT point_id, CAST(round(abs(m2 - m1)*1000) AS BIGINT) AS dist_mm
    FROM m ORDER BY point_id"""

  // ---------------------------------------------------- geo_knn_geodesic

  /** Independent brute-force kNN oracle: every (query, point) pair's WGS84
    * inverse problem is re-solved with fully converged Vincenty (12 fixed
    * lambda iterations in a recursive CTE — convergence factor ~f per step,
    * so machine precision after ~4), then ranked on metre-quantized
    * distance with point_id tie-breaks. The engine ranks the ring-join
    * candidates by Karney order-6; the two independent algorithms agree to
    * ~1e-5 m at this <60 km range, far inside the 1 m bucket.
    * Formulas: Vincenty 1975 (the standard published inverse iteration). */
  def geoKnnGeodesic: String = geoKnnGeodesicBase(
    """SELECT id AS q_id,
        139.59005 + ((id*37) % 100)*0.001031 AS q_lon,
        35.59005 + ((id*59) % 100)*0.001073 AS q_lat
      FROM range(0,20) t(id)""")

  /** hex kNN oracle: the dense query grid PLUS a sparse outlier (~30 km
    * southwest of the point cloud) whose true neighbors sit far outside a
    * 2-ring hex reach — green only under hexKnnJoin's adaptive expansion. */
  def geoHexKnn: String = geoKnnGeodesicBase(
    """SELECT id AS q_id,
        139.59005 + ((id*37) % 100)*0.001031 AS q_lon,
        35.59005 + ((id*59) % 100)*0.001073 AS q_lat
      FROM range(0,20) t(id)
      UNION ALL SELECT 20 AS q_id, 139.30 AS q_lon, 35.30 AS q_lat""")

  private def geoKnnGeodesicBase(qCte: String): String =
    s"""WITH RECURSIVE pts AS (
      SELECT point_id,
        139.49 + (point_id*193 % 4000)*0.0001 AS lon,
        35.49 + (point_id*149 % 4000)*0.0001 AS lat
      FROM (SELECT c_custkey*16 + j AS point_id FROM customer, range(0,16) t(j))),
    q AS ($qCte),
    pairs AS (
      SELECT q_id, point_id,
        atan((1-1.0/298.257223563)*tan(q_lat*(pi()/180))) AS u1,
        atan((1-1.0/298.257223563)*tan(lat*(pi()/180))) AS u2,
        (lon - q_lon)*(pi()/180) AS ell
      FROM pts, q),
    vin AS (
      SELECT q_id, point_id, u1, u2, ell, ell AS lam, 0 AS i FROM pairs
      UNION ALL
      SELECT q_id, point_id, u1, u2, ell,
        ell + (1-cc)*ff*sina*(sig + cc*sinsig*(cos2sm + cc*cossig*(-1 + 2*cos2sm*cos2sm))) AS lam,
        i + 1 AS i
      FROM (
        SELECT q_id, point_id, u1, u2, ell, i,
          1.0/298.257223563 AS ff,
          sqrt(pow(cos(u2)*sin(lam),2) + pow(cos(u1)*sin(u2) - sin(u1)*cos(u2)*cos(lam), 2)) AS sinsig,
          sin(u1)*sin(u2) + cos(u1)*cos(u2)*cos(lam) AS cossig,
          atan2(sinsig, cossig) AS sig,
          CASE WHEN sinsig = 0 THEN 0 ELSE cos(u1)*cos(u2)*sin(lam)/sinsig END AS sina,
          1 - sina*sina AS cos2a,
          CASE WHEN cos2a = 0 THEN 0 ELSE cossig - 2*sin(u1)*sin(u2)/cos2a END AS cos2sm,
          ff/16*cos2a*(4 + ff*(4 - 3*cos2a)) AS cc
        FROM vin WHERE i < 12) s),
    fin AS (
      SELECT q_id, point_id, bb*bigA*(sig - dsig) AS s_m
      FROM (
        SELECT q_id, point_id,
          6378137.0 AS axa, 6378137.0*(1-1.0/298.257223563) AS bb,
          sqrt(pow(cos(u2)*sin(lam),2) + pow(cos(u1)*sin(u2) - sin(u1)*cos(u2)*cos(lam), 2)) AS sinsig,
          sin(u1)*sin(u2) + cos(u1)*cos(u2)*cos(lam) AS cossig,
          atan2(sinsig, cossig) AS sig,
          CASE WHEN sinsig = 0 THEN 0 ELSE cos(u1)*cos(u2)*sin(lam)/sinsig END AS sina,
          1 - sina*sina AS cos2a,
          CASE WHEN cos2a = 0 THEN 0 ELSE cossig - 2*sin(u1)*sin(u2)/cos2a END AS cos2sm,
          cos2a*(axa*axa - bb*bb)/(bb*bb) AS up2,
          1 + up2/16384*(4096 + up2*(-768 + up2*(320 - 175*up2))) AS bigA,
          up2/1024*(256 + up2*(-128 + up2*(74 - 47*up2))) AS bigB,
          bigB*sinsig*(cos2sm + bigB/4*(cossig*(-1 + 2*cos2sm*cos2sm)
            - bigB/6*cos2sm*(-3 + 4*sinsig*sinsig)*(-3 + 4*cos2sm*cos2sm))) AS dsig
        FROM vin WHERE i = 12) s)
    SELECT q_id, point_id, dist_q, rnk FROM (
      SELECT q_id, point_id,
        CAST(round(s_m/1.0) AS BIGINT) AS dist_q,
        row_number() OVER (PARTITION BY q_id
          ORDER BY CAST(round(s_m/1.0) AS BIGINT), point_id) AS rnk
      FROM fin) WHERE rnk <= 5"""
}
