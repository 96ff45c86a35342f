#!/usr/bin/env python3
"""Generate the coordinate-operation sidecar `src/main/resources/graft/epsg_ops`
from the reference's public EPSG SQL data (/root/reference/data/sql/*.sql).

The reference ships the EPSG dataset as plain INSERT scripts (its build
assembles them into proj.db); we load them into an in-memory sqlite and emit
a compact line-oriented sidecar that the Scala side (graft.proj.EpsgDb) can
parse without a SQL engine:

  C|auth:code|kind|datumAuth:code|a|rf|pm_deg|w|s|e|n|name      geodetic CRS
      kind: g2 geographic-2D, g3 geographic-3D, gc geocentric
  P|auth:code|baseGeogAuth:code|w|s|e|n|name                    projected CRS
  V|auth:code|datumAuth:code|w|s|e|n|name                       vertical CRS
  X|auth:code|horiz|vert|name                                   compound CRS
  D|auth:code|frameEpoch or -|ensembleAccuracy or -|name        geodetic datum
  M|ensembleAuth:code|member1,member2,...                       ensemble members
  N|lowercased name|{C,P,V,X}|auth:code                         name/alias index
  O|auth:code|{H,G,O,C,S}|method|src|dst|acc|w|s|e|n|dep|extras|areaName|name
      H helmert (extras k=v: x,y,z m; rx,ry,rz arcsec; s ppm; dx..ds rates /yr;
        epoch; px,py,pz m), G grid (extras: grid=, grid2=, interp=, orig=),
      O other (extras: p<EPSG param code>=normalized value, angles in degrees,
        lengths in metres, scales in ppm-free unity), C concatenated
      (extras: steps=+auth:code,-auth:code,...), S raw PROJ-string method
      (extras: projstring base64? no: stored verbatim after 'str=')
  A|original_grid_name|proj_grid_name|format|proj_method|inverse  grid aliases
  U|auth:code|auth:code                                          supersession

Authorities EPSG, PROJ, IAU_2015, IGNF, ESRI and NKG are emitted. NKG's
operations all need network grids unavailable in this sandbox, so they load
as structurally-known but non-instantiable candidates (grids flagged
unavailable) — exactly how the reference answers candidate queries without
the grids.
"""
import os, re, sqlite3, sys, base64

SQL_DIR = "/root/reference/data/sql"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/epsg_ops")

ORDER = ['unit_of_measure','extent','scope','prime_meridian','ellipsoid',
 'geodetic_datum','vertical_datum','engineering_datum','coordinate_system','axis',
 'geodetic_crs','vertical_crs','engineering_crs','conversion','projected_crs','compound_crs',
 'helmert_transformation','grid_transformation','grid_alternatives',
 'grid_alternatives_generated_noaa','other_transformation',
 'concatenated_operation','concatenated_operation_step','alias_name',
 'supersession','deprecation','esri','ignf','iau','nkg','nrcan',
 'transformations_czechia','customizations_early','customizations',
 'nkg_post_customizations','nadcon5_concatenated_operations',
 'wgs84_realizations_concatenated_operations','other_transformation_custom',
 'grid_transformation_custom','non_imported_operations',
 'geodetic_datum_ensemble_member','vertical_datum_ensemble_member','metadata']

AUTHS = ("EPSG", "PROJ", "IAU_2015", "IGNF", "ESRI", "NKG")

def load():
    db = sqlite3.connect(':memory:')
    db.executescript(open(os.path.join(SQL_DIR, 'proj_db_table_defs.sql')).read())
    for f in ORDER:
        p = os.path.join(SQL_DIR, f + '.sql')
        if not os.path.exists(p):
            continue
        try:
            db.executescript(open(p).read())
        except sqlite3.Error as e:
            print(f"warning: {f}: {e}", file=sys.stderr)
    db.row_factory = sqlite3.Row
    return db

def num(v):
    """compact numeric formatting."""
    if v is None:
        return ''
    if isinstance(v, int):
        return str(v)
    v = round(v, 12)  # strip float noise from unit conversion; the values
    # are in convenient units (m, arcsec, ppm, deg) so 1e-12 is sub-nm
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)

def main():
    db = load()
    uom = {}
    for r in db.execute("select auth_name,code,name,conv_factor,type from unit_of_measure"):
        uom[(r['auth_name'], str(r['code']))] = (r['name'], r['conv_factor'], r['type'])

    ARCSEC = 4.848136811095355e-06  # radians

    def conv(value, uauth, ucode, target):
        """normalize a value to target unit: 'm', 'arcsec', 'ppm', 'deg',
        'year', 'unity'. Rate uoms ('per year') normalize the base unit."""
        if value is None:
            return None
        name, factor, typ = uom[(uauth, str(ucode))]
        if factor is None and typ == 'angle' and not name.startswith('sexagesimal'):
            # 'degree minute second [hemisphere]' style: only two operations
            # use these; value is stored as signed decimal degrees already
            if target == 'deg':
                return value
            if target == 'arcsec':
                return value * 3600.0
        if name.startswith('sexagesimal'):
            # D.MMSSsss / D.MMm signed encodings
            sign = -1.0 if value < 0 else 1.0
            v = abs(value)
            d = int(v)
            if name == 'sexagesimal DM':
                deg = sign * (d + (v - d) * 100.0 / 60.0)
            else:
                mm = int((v - d) * 100 + 1e-9)
                ss = (v - d - mm / 100.0) * 10000.0
                deg = sign * (d + mm / 60.0 + ss / 3600.0)
            if target == 'deg':
                return deg
            if target == 'arcsec':
                return deg * 3600.0
            raise ValueError('DMS to ' + target)
        per_year = 'per year' in name or name.endswith('s per year')
        si = value * factor          # SI: m, rad, unity (per second for rates)
        if per_year:
            si = si * 31556925.445   # back to per-year
        if target == 'm':
            return si
        if target == 'arcsec':
            return si / ARCSEC
        if target == 'deg':
            return si * 180.0 / 3.14159265358979323846
        if target == 'ppm':
            return si * 1e6
        if target == 'unity':
            return si
        if target == 'year':
            return value if typ == 'time' else si
        raise ValueError(target)

    # extents + scope: usage -> extent bbox/name/scope per (table, auth, code)
    ext = {}
    for r in db.execute(
        "select u.object_table_name t, u.object_auth_name a, u.object_code c,"
        " e.south_lat s, e.north_lat n, e.west_lon w, e.east_lon e, e.name nm,"
        " sc.scope sp"
        " from usage u join extent e on e.auth_name=u.extent_auth_name"
        " and e.code=u.extent_code"
        " left join scope sc on sc.auth_name=u.scope_auth_name"
        " and sc.code=u.scope_code order by u.code"):
        k = (r['t'], r['a'], str(r['c']))
        if k not in ext:
            ext[k] = (r['w'], r['s'], r['e'], r['n'], r['nm'], r['sp'])

    # the reference hot-patches EPSG:4326 to its pre-10.077 usage (extent
    # 1262 "World", scope 1183) to avoid the verbose 2830 description
    # (factory.cpp createPropertiesSearchUsages)
    for r in db.execute("select west_lon w,south_lat s,east_lon e,"
                        "north_lat n,name from extent"
                        " where auth_name='EPSG' and code='1262'"):
        sc = db.execute("select scope from scope where auth_name='EPSG'"
                        " and code='1183'").fetchone()
        ext[('geodetic_crs', 'EPSG', '4326')] = (
            r['w'], r['s'], r['e'], r['n'], r['name'], sc['scope'])

    def extent_of(table, auth, code):
        e = ext.get((table, auth, str(code)))
        if e is None:
            return ('', '', '', '', '')
        return (num(e[0]), num(e[1]), num(e[2]), num(e[3]), e[4] or '')

    def scope_of(table, auth, code):
        e = ext.get((table, auth, str(code)))
        return (e[5] or '') if e is not None else ''

    def b64(s):
        return base64.b64encode(s.encode()).decode() if s else ''

    lines = []
    names = []   # (lowername, kindLetter, auth:code, deprecated)

    # ---- extents (for --area code/name lookup):
    # E|auth:code|w|s|e|n|name|description
    for r in db.execute("select auth_name,code,west_lon w,south_lat s,"
                        "east_lon e,north_lat n,name,description,deprecated"
                        " from extent"):
        if r['deprecated']:
            continue
        lines.append(f"E|{r['auth_name']}:{r['code']}|{num(r['w'])}|"
                     f"{num(r['s'])}|{num(r['e'])}|{num(r['n'])}|{r['name']}|"
                     f"{r['description']}")

    def numx(v):
        """full-precision numeric text (round-trip repr): WKT output needs
        the exact double (unit factors print at 15 significant digits)."""
        if v is None:
            return ''
        if isinstance(v, int) or (v == int(v) and abs(v) < 1e15):
            return str(int(v))
        return repr(v)

    # ---- units of measure: Q|auth:code|name|factor|type
    for r in db.execute("select auth_name,code,name,conv_factor,type"
                        " from unit_of_measure"):
        lines.append(f"Q|{r['auth_name']}:{r['code']}|{r['name']}|"
                     f"{numx(r['conv_factor'])}|{r['type']}")

    ells = {}
    for r in db.execute("select auth_name,code,name,semi_major_axis,inv_flattening,"
                        "semi_minor_axis,uom_auth_name ua,uom_code uc"
                        " from ellipsoid"):
        # the axes carry their own unit (Clarke 1858 is in Clarke's feet)
        a = conv(r['semi_major_axis'], r['ua'], r['uc'], 'm')
        rf = r['inv_flattening']
        if rf is None:
            b = r['semi_minor_axis']  # rf is unit-invariant
            rf = 0.0 if (b is None or b == r['semi_major_axis']) \
                else r['semi_major_axis'] / (r['semi_major_axis'] - b)
        ells[(r['auth_name'], str(r['code']))] = (a, rf)
        # WKT-grade row: original-unit axis values + derived rf text
        # L|auth:code|name|a_orig|rf_text|b_orig_or_empty|uomKey
        rft = '' if r['inv_flattening'] is None and rf == 0.0 else numx(rf)
        lines.append(f"L|{r['auth_name']}:{r['code']}|{r['name']}|"
                     f"{num(r['semi_major_axis'])}|{rft}|"
                     f"{num(r['semi_minor_axis'])}|{r['ua']}:{r['uc']}")
        names.append((r['name'].lower(), 'B', f"{r['auth_name']}:{r['code']}", 0))

    pms = {}
    for r in db.execute("select auth_name,code,name,longitude,"
                        "uom_auth_name,uom_code from prime_meridian"):
        pms[(r['auth_name'], str(r['code']))] = conv(r['longitude'], r['uom_auth_name'], r['uom_code'], 'deg')
        # R|auth:code|name|lon_orig|uomKey
        lines.append(f"R|{r['auth_name']}:{r['code']}|{r['name']}|"
                     f"{num(r['longitude'])}|{r['uom_auth_name']}:{r['uom_code']}")

    # ---- registry metadata: G|key|value (data/version identifiers the
    # catalog surface reports — PROJ_DATA.VERSION drives projsync's
    # version_added/version_removed filtering)
    for r in db.execute("select key, value from metadata where key in "
                        "('EPSG.VERSION','PROJ_DATA.VERSION',"
                        "'DATABASE.LAYOUT.VERSION.MAJOR',"
                        "'DATABASE.LAYOUT.VERSION.MINOR')"):
        lines.append(f"G|{r['key']}|{r['value']}")

    # ---- ESRI display names: B|auth:code|esri_alias (the WKT1-ESRI
    # exporter's reverse lookup — alias_name rows tagged source='ESRI')
    for r in db.execute("select table_name t, auth_name a, code c, alt_name n"
                        " from alias_name where source='ESRI' and"
                        " table_name in ('projected_crs','geodetic_crs',"
                        "'geodetic_datum','ellipsoid','vertical_crs')"):
        if r['a'] in AUTHS:
            lines.append(f"B|{r['a']}:{r['c']}|{r['n']}")

    # ---- scopes: F|auth:code|b64(text) (usage scope codes for SQL export)
    for r in db.execute("select auth_name,code,scope from scope"):
        if r['auth_name'] in AUTHS:
            lines.append(f"F|{r['auth_name']}:{r['code']}|{b64(r['scope'])}")

    # ---- coordinate systems (axes): S|auth:code|type|axes
    # axes = name~abbrev~orientation~uomKey;...  ordered by cs order
    cs_axes = {}
    for r in db.execute("select coordinate_system_auth_name a,"
                        " coordinate_system_code c, name, abbrev, orientation,"
                        " uom_auth_name ua, uom_code uc from axis"
                        " order by coordinate_system_auth_name,"
                        " coordinate_system_code, coordinate_system_order"):
        cs_axes.setdefault((r['a'], str(r['c'])), []).append(
            f"{r['name']}~{r['abbrev']}~{r['orientation']}~{r['ua']}:{r['uc']}")
    cs_type = {}
    for r in db.execute("select auth_name,code,type from coordinate_system"):
        cs_type[(r['auth_name'], str(r['code']))] = r['type']
    for k, axes in cs_axes.items():
        lines.append(f"S|{k[0]}:{k[1]}|{cs_type.get(k, '')}|{';'.join(axes)}")

    # ---- geodetic datums
    dat_ell = {}
    for r in db.execute("select auth_name,code,name,ellipsoid_auth_name ea,"
                        "ellipsoid_code ec,prime_meridian_auth_name pa,"
                        "prime_meridian_code pc,frame_reference_epoch fe,"
                        "ensemble_accuracy ac,anchor,anchor_epoch ae,"
                        "deprecated from geodetic_datum"):
        if r['auth_name'] not in AUTHS:
            continue
        key = f"{r['auth_name']}:{r['code']}"
        dat_ell[key] = (ells[(r['ea'], str(r['ec']))], pms[(r['pa'], str(r['pc']))])
        lines.append(f"D|{key}|{num(r['fe']) or '-'}|"
                     f"{('' if r['ac'] is None else str(r['ac'])) or '-'}|{r['name']}|"
                     f"{r['ea']}:{r['ec']}|{r['pa']}:{r['pc']}|"
                     f"{b64(r['anchor'])}|{numx(r['ae'])}")
        names.append((r['name'].lower(), 'D', key, r['deprecated']))
    for r in db.execute("select ensemble_auth_name a, ensemble_code c,"
                        " group_concat(member_auth_name||':'||member_code) m"
                        " from geodetic_datum_ensemble_member group by 1,2 "):
        if r['a'] in AUTHS:
            lines.append(f"M|{r['a']}:{r['c']}|{r['m']}")

    # ---- geodetic CRSs
    kindmap = {'geographic 2D': 'g2', 'geographic 3D': 'g3', 'geocentric': 'gc'}
    geod_ell = {}  # geod CRS key -> (a, rf, pmDeg) for inline projected bodies
    crs_datum = {}  # geod CRS key -> datum key (concat direction inference)
    for r in db.execute("select auth_name,code,name,type,datum_auth_name da,"
                        "datum_code dc,coordinate_system_auth_name csa,"
                        "coordinate_system_code csc,description,deprecated"
                        " from geodetic_crs"):
        if r['auth_name'] not in AUTHS or r['type'] not in kindmap:
            continue
        key = f"{r['auth_name']}:{r['code']}"
        dkey = f"{r['da']}:{r['dc']}"
        if dkey not in dat_ell:
            continue
        (a, rf), pm = dat_ell[dkey]
        geod_ell[key] = (a, rf, pm)
        crs_datum[key] = dkey
        w, s, e, n, area = extent_of('geodetic_crs', r['auth_name'], r['code'])
        scope = scope_of('geodetic_crs', r['auth_name'], r['code'])
        lines.append(f"C|{key}|{kindmap[r['type']]}|{dkey}|{num(a)}|{num(rf)}|"
                     f"{num(pm)}|{w}|{s}|{e}|{n}|{r['name']}|{area}|"
                     f"{b64(scope)}|{r['csa']}:{r['csc']}|{r['deprecated']}|"
                     f"{b64(r['description'])}")
        names.append((r['name'].lower(), 'C', key, r['deprecated']))

    # ---- projected CRSs. EPSG bodies live in the epsg init sidecar; for
    # other authorities (IGNF) the proj-string body is emitted inline,
    # covering exactly the conversion methods those registries use.
    conv_rows = {}
    for r in db.execute("select * from conversion"):
        conv_rows[(r['auth_name'], str(r['code']))] = r

    def conv_params(r):
        p = {}
        for k in range(1, 8):
            pc = r[f'param{k}_code']
            if pc is None:
                continue
            p[int(pc)] = (r[f'param{k}_value'],
                          r[f'param{k}_uom_auth_name'], r[f'param{k}_uom_code'])
        return p

    # ESRI WKT1 projection name -> (proj name, [(esri param, proj param)]).
    # Every CRS gets lon_0 from Central_Meridian and x_0/y_0 from
    # False_Easting/Northing implicitly; this table adds the rest.
    # (Behavioral provenance: the reference's ESRI method mapping,
    # src/iso19111/operation/esriparammappings.cpp — public data.)
    ESRI_PROJ = {
      'Transverse_Mercator_Complex': ('tmerc', [('Latitude_Of_Origin', 'lat_0'), ('Scale_Factor', 'k')]),
      'Lambert_Conformal_Conic_1SP': ('lcc1sp', [('Latitude_Of_Origin', 'lat_0'), ('Scale_Factor', 'k_0')]),
      'Equidistant_Conic': ('eqdc', [('Latitude_Of_Origin', 'lat_0'), ('Standard_Parallel_1', 'lat_1'), ('Standard_Parallel_2', 'lat_2')]),
      'Azimuthal_Equidistant': ('aeqd', [('Latitude_Of_Origin', 'lat_0'), ('Latitude_Of_Center', 'lat_0'), ('Longitude_Of_Center', 'lon_0')]),
      'Stereographic': ('stere', [('Latitude_Of_Origin', 'lat_0'), ('Scale_Factor', 'k')]),
      'Stereographic_North_Pole': ('stere', [('!lat_0', '90'), ('Standard_Parallel_1', 'lat_ts')]),
      'Stereographic_South_Pole': ('stere', [('!lat_0', '-90'), ('Standard_Parallel_1', 'lat_ts')]),
      'Sinusoidal': ('sinu', []),
      'Lambert_Azimuthal_Equal_Area': ('laea', [('Latitude_Of_Origin', 'lat_0'), ('Latitude_Of_Center', 'lat_0'), ('Longitude_Of_Center', 'lon_0')]),
      'Bonne': ('bonne', [('Standard_Parallel_1', 'lat_1')]),
      'Winkel_Tripel': ('wintri', [('Standard_Parallel_1', 'lat_1')]),
      'Orthographic': ('ortho', [('Latitude_Of_Origin', 'lat_0'), ('Latitude_Of_Center', 'lat_0'), ('Longitude_Of_Center', 'lon_0')]),
      'Plate_Carree': ('eqc', []),
      'Equidistant_Cylindrical_Ellipsoidal': ('eqc', [('Standard_Parallel_1', 'lat_ts')]),
      'Miller_Cylindrical': ('mill', []),
      'Mollweide': ('moll', []),
      'Eckert_I': ('eck1', []), 'Eckert_II': ('eck2', []),
      'Eckert_III': ('eck3', []), 'Eckert_IV': ('eck4', []),
      'Eckert_V': ('eck5', []), 'Eckert_VI': ('eck6', []),
      'Gall_Stereographic': ('gall', []),
      'Behrmann': ('cea', [('!lat_ts', '30')]),
      'Winkel_I': ('wink1', [('Standard_Parallel_1', 'lat_ts')]),
      'Winkel_II': ('wink2', [('Standard_Parallel_1', 'lat_1')]),
      'Quartic_Authalic': ('qua_aut', []),
      'Loximuthal': ('loxim', [('Central_Parallel', 'lat_1'), ('Standard_Parallel_1', 'lat_1')]),
      'Van_der_Grinten_I': ('vandg', []),
      'Robinson': ('robin', []),
      'Two_Point_Equidistant': ('tpeqd', [('Latitude_Of_1st_Point', 'lat_1'), ('Longitude_Of_1st_Point', 'lon_1'), ('Latitude_Of_2nd_Point', 'lat_2'), ('Longitude_Of_2nd_Point', 'lon_2')]),
      'Cylindrical_Equal_Area': ('cea', [('Standard_Parallel_1', 'lat_ts')]),
      'Aitoff': ('aitoff', []),
      'Hammer_Aitoff': ('hammer', []),
      'Flat_Polar_Quartic': ('mbtfpq', []),
      'Craster_Parabolic': ('crast', []),
      'Times': ('times', []),
      'Vertical_Near_Side_Perspective': ('nsper', [('Latitude_Of_Center', 'lat_0'), ('Longitude_Of_Center', 'lon_0'), ('Height', 'h')]),
      'Wagner_IV': ('wag4', []), 'Wagner_V': ('wag5', []),
      'Wagner_VII': ('wag7', []),
      'Natural_Earth': ('natearth', []), 'Natural_Earth_II': ('natearth2', []),
      'Patterson': ('patterson', []),
      'Compact_Miller': ('comill', []),
      'Goode_Homolosine': ('goode', []),
      'Gnomonic': ('gnom', [('Latitude_Of_Origin', 'lat_0'), ('Latitude_Of_Center', 'lat_0'), ('Longitude_Of_Center', 'lon_0')]),
      'Mercator': ('merc', [('Standard_Parallel_1', 'lat_ts')]),
      'Mercator_Auxiliary_Sphere': ('webmerc', []),
    }

    def body_from_esri_text(text, geod_key):
        """proj-string body parsed from an ESRI WKT1 text_definition, for
        ESRI projected CRSs that carry no conversion row (the world /
        continental systems), or None when the projection is unmapped."""
        if not text or geod_key not in geod_ell:
            return None
        mproj = re.search(r'PROJECTION\["([^"]+)"\]', text)
        if not mproj or mproj.group(1) not in ESRI_PROJ:
            return None
        pname, extra = ESRI_PROJ[mproj.group(1)]
        params = dict(re.findall(r'PARAMETER\["([^"]+)",([-0-9.eE]+)\]', text))
        # the last UNIT is the projected linear unit; scale false E/N by it
        units_found = re.findall(r'UNIT\["[^"]+",([-0-9.eE]+)\]', text)
        to_m = float(units_found[-1]) if units_found else 1.0
        toks = [f"proj={pname}"]
        if pname == 'lcc1sp':
            # lcc 1SP spells lat_1 = lat_0
            toks[0] = "proj=lcc"
            la = params.get('Latitude_Of_Origin', '0')
            toks.append(f"lat_1={num(float(la))}")
        seen = set()
        for ek, pk in extra:
            if pk in seen:
                continue
            if ek.startswith('!'):
                toks.append(f"{ek[1:]}={pk}")
                seen.add(ek[1:])
            elif ek in params:
                toks.append(f"{pk}={num(float(params[ek]))}")
                seen.add(pk)
        if 'lon_0' not in seen and 'Central_Meridian' in params:
            toks.append(f"lon_0={num(float(params['Central_Meridian']))}")
        toks.append(f"x_0={num(float(params.get('False_Easting', '0')) * to_m)}")
        toks.append(f"y_0={num(float(params.get('False_Northing', '0')) * to_m)}")
        a, rf, pm = geod_ell[geod_key]
        toks.append(f"a={num(a)} rf={num(rf)}" if rf else f"a={num(a)} b={num(a)}")
        if pm:
            toks.append(f"pm={num(pm)}")
        toks.append("units=m" if abs(to_m - 1.0) < 1e-12 else f"to_meter={num(to_m)}")
        return " ".join(toks)

    def body_of(conv_key, geod_key):
        """proj-string body for a non-EPSG projected CRS, or None."""
        r = conv_rows.get(conv_key)
        if r is None or geod_key not in geod_ell:
            return None
        p = conv_params(r)
        def A(c, d=None):
            if c not in p:
                return d
            v, ua, uc = p[c]
            return conv(v, ua, uc, 'deg')
        def L(c, d=0.0):
            if c not in p:
                return d
            v, ua, uc = p[c]
            return conv(v, ua, uc, 'm')
        def S(c, d=1.0):
            if c not in p:
                return d
            v, ua, uc = p[c]
            return conv(v, ua, uc, 'unity')
        try:
            m = int(r['method_code'])
        except (TypeError, ValueError):
            # raw PROJ-method conversions ('PROJ','mill'); some registries
            # use display-cased or legacy codes (IAU 'ROBINSON', IGNF
            # 'gstm') that map onto the proj op names, and carry the
            # standard natural-origin parameter set
            PROJ_METHOD_MAP = {'ROBINSON': 'robin', 'MOLLWEIDE': 'moll',
                               'SINUSOIDAL': 'sinu', 'gstm': 'gstmerc'}
            if r['method_auth_name'] == 'PROJ' and r['method_code'] and \
               str(r['method_code']).isalnum():
                pname = PROJ_METHOD_MAP.get(str(r['method_code']),
                                            str(r['method_code']))
                toks = [f"proj={pname}"]
                if 8801 in p:
                    toks.append(f"lat_0={num(A(8801, 0.0))}")
                if 8802 in p:
                    toks.append(f"lon_0={num(A(8802, 0.0))}")
                if 8805 in p:
                    toks.append(f"k={num(S(8805))}")
                toks.append(f"x_0={num(L(8806))}")
                toks.append(f"y_0={num(L(8807))}")
                a, rf, pm = geod_ell[geod_key]
                toks.append(f"a={num(a)} rf={num(rf)}" if rf
                            else f"a={num(a)} b={num(a)}")
                if pm:
                    toks.append(f"pm={num(pm)}")
                toks.append("units=m")
                return " ".join(toks)
            return None
        if m == 9807 or m == 9808:
            # ESRI encodes Transverse Mercator (South Orientated) as 9807
            # with a NEGATIVE scale factor (the Cape/Hartebeesthoek Lo
            # grids); the reference maps TMSO to tmerc with axis=wsu
            # (conversion.cpp:4074)
            k = S(8805)
            south = m == 9808 or (k is not None and k < 0)
            ax = " axis=wsu" if south else ""
            kv = abs(k) if k is not None else 1.0
            core = (f"proj=tmerc lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" k={num(kv)} x_0={num(L(8806))} y_0={num(L(8807))}{ax}")
        elif m == 9801:
            la = num(A(8801, 0.0))
            core = (f"proj=lcc lat_1={la} lat_0={la} lon_0={num(A(8802, 0.0))}"
                    f" k_0={num(S(8805))} x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9802:
            core = (f"proj=lcc lat_0={num(A(8821, 0.0))} lon_0={num(A(8822, 0.0))}"
                    f" lat_1={num(A(8823, 0.0))} lat_2={num(A(8824, 0.0))}"
                    f" x_0={num(L(8826))} y_0={num(L(8827))}")
        elif m == 1028 or m == 1029:
            core = (f"proj=eqc lat_ts={num(A(8823, 0.0))} lat_0=0"
                    f" lon_0={num(A(8802, 0.0))} x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9804:
            core = (f"proj=merc lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" k={num(S(8805))} x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9827:
            core = (f"proj=bonne lat_1={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9820:
            core = (f"proj=laea lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9810:
            core = (f"proj=stere lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" k={num(S(8805))} x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 1024:
            core = (f"proj=webmerc lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9805:
            core = (f"proj=merc lat_ts={num(A(8823, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9822:
            core = (f"proj=aea lat_0={num(A(8821, 0.0))} lon_0={num(A(8822, 0.0))}"
                    f" lat_1={num(A(8823, 0.0))} lat_2={num(A(8824, 0.0))}"
                    f" x_0={num(L(8826))} y_0={num(L(8827))}")
        elif m == 9806:
            core = (f"proj=cass lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9812:
            # Hotine Oblique Mercator variant A = omerc no_uoff
            core = (f"proj=omerc no_uoff lat_0={num(A(8811, 0.0))}"
                    f" lonc={num(A(8812, 0.0))} alpha={num(A(8813, 0.0))}"
                    f" gamma={num(A(8814, 0.0))} k={num(S(8815))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 9818:
            core = (f"proj=poly lat_0={num(A(8801, 0.0))} lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 1078:
            core = (f"proj=eqearth lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 1052:
            core = (f"proj=col_urban lat_0={num(A(8801, 0.0))}"
                    f" lon_0={num(A(8802, 0.0))} x_0={num(L(8806))}"
                    f" y_0={num(L(8807))} h_0={num(L(1039))}")
        elif m == 9840:
            core = (f"proj=ortho lat_0={num(A(8801, 0.0))}"
                    f" lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        elif m == 1026:
            # Mercator (Spherical): the reference exports merc with R_A
            # spherification of the ellipsoid (authalic radius); IAU uses
            # it on spheres where it reduces to plain merc
            core = (f"proj=merc lat_0={num(A(8801, 0.0))}"
                    f" lon_0={num(A(8802, 0.0))}"
                    f" x_0={num(L(8806))} y_0={num(L(8807))}")
        else:
            return None
        a, rf, pm = geod_ell[geod_key]
        ell = f" a={num(a)} rf={num(rf)}" if rf else f" a={num(a)} b={num(a)}"
        pmtok = f" pm={num(pm)}" if pm else ""
        return core + ell + pmtok + " units=m"

    for r in db.execute("select auth_name,code,name,geodetic_crs_auth_name ga,"
                        "geodetic_crs_code gc,conversion_auth_name ca,"
                        "conversion_code cc,coordinate_system_auth_name csa,"
                        "coordinate_system_code csc,description,deprecated,text_definition td"
                        " from projected_crs"):
        if r['auth_name'] not in AUTHS:
            continue
        key = f"{r['auth_name']}:{r['code']}"
        w, s, e, n, area = extent_of('projected_crs', r['auth_name'], r['code'])
        scope = scope_of('projected_crs', r['auth_name'], r['code'])
        body = ''
        if r['auth_name'] != 'EPSG':
            body = (body_of((r['ca'], str(r['cc'])),
                            f"{r['ga']}:{r['gc']}") or
                    body_from_esri_text(r['td'], f"{r['ga']}:{r['gc']}") or '')
            body = base64.b64encode(body.encode()).decode() if body else ''
        cv = conv_rows.get((r['ca'], str(r['cc'])))
        cname = cv['name'] if cv is not None else ''
        lines.append(f"P|{key}|{r['ga']}:{r['gc']}|{w}|{s}|{e}|{n}|{r['name']}|{body}|"
                     f"{area}|{b64(scope)}|{r['ca']}:{r['cc']}|{cname}|"
                     f"{r['csa']}:{r['csc']}|{r['deprecated']}|{b64(r['description'])}")
        names.append((r['name'].lower(), 'P', key, r['deprecated']))

    # ---- conversions (WKT-grade): K|auth:code|name|methodKey|methodName|
    #      params(code~value~uomKey;...)|extName|scopeB64|remarkB64
    for (ca, cc), r in conv_rows.items():
        if ca not in AUTHS:
            continue
        parts = []
        for k in range(1, 8):
            pc = r[f'param{k}_code']
            if pc is None:
                continue
            parts.append(f"{pc}~{num(r[f'param{k}_value'])}~"
                         f"{r[f'param{k}_uom_auth_name']}:{r[f'param{k}_uom_code']}")
        w, s, e, n, area = extent_of('conversion', ca, cc)
        scope = scope_of('conversion', ca, cc)
        lines.append(f"K|{ca}:{cc}|{r['name']}|"
                     f"{r['method_auth_name']}:{r['method_code']}|{r['method_name']}|"
                     f"{';'.join(parts)}|{area}|{b64(scope)}|{b64(r['description'])}")

    # ---- vertical datums: W|auth:code|name|frameEpoch
    for r in db.execute("select auth_name,code,name,frame_reference_epoch fe"
                        " from vertical_datum"):
        if r['auth_name'] not in AUTHS:
            continue
        lines.append(f"W|{r['auth_name']}:{r['code']}|{r['name']}|{num(r['fe']) or '-'}")
        names.append((r['name'].lower(), 'W', f"{r['auth_name']}:{r['code']}", 0))

    # ---- vertical CRSs
    for r in db.execute("select auth_name,code,name,datum_auth_name da,"
                        "datum_code dc,coordinate_system_auth_name csa,"
                        "coordinate_system_code csc,description,deprecated"
                        " from vertical_crs"):
        if r['auth_name'] not in AUTHS:
            continue
        key = f"{r['auth_name']}:{r['code']}"
        w, s, e, n, area = extent_of('vertical_crs', r['auth_name'], r['code'])
        scope = scope_of('vertical_crs', r['auth_name'], r['code'])
        lines.append(f"V|{key}|{r['da']}:{r['dc']}|{w}|{s}|{e}|{n}|{r['name']}|"
                     f"{area}|{b64(scope)}|{r['csa']}:{r['csc']}|{r['deprecated']}|"
                     f"{b64(r['description'])}")
        names.append((r['name'].lower(), 'V', key, r['deprecated']))

    # ---- engineering CRSs (J records: plane-grid CRSs with no geodetic
    # base; reachable only through registered whole-CRS operations such as
    # Cartesian Grid Offsets, e.g. Christmas Island Grid 1985)
    for r in db.execute("select auth_name,code,name,"
                        "coordinate_system_auth_name csa,"
                        "coordinate_system_code csc,deprecated"
                        " from engineering_crs"):
        if r['auth_name'] not in AUTHS:
            continue
        key = f"{r['auth_name']}:{r['code']}"
        w, s, e, n, area = extent_of('engineering_crs', r['auth_name'],
                                     r['code'])
        lines.append(f"J|{key}|{r['csa']}:{r['csc']}|{w}|{s}|{e}|{n}|"
                     f"{area}|{r['name']}")
        names.append((r['name'].lower(), 'J', key, r['deprecated']))

    # ---- compound CRSs
    for r in db.execute("select auth_name,code,name,horiz_crs_auth_name ha,"
                        "horiz_crs_code hc,vertical_crs_auth_name va,"
                        "vertical_crs_code vc,description,deprecated"
                        " from compound_crs"):
        if r['auth_name'] not in AUTHS:
            continue
        key = f"{r['auth_name']}:{r['code']}"
        w, s, e, n, area = extent_of('compound_crs', r['auth_name'], r['code'])
        scope = scope_of('compound_crs', r['auth_name'], r['code'])
        lines.append(f"X|{key}|{r['ha']}:{r['hc']}|{r['va']}:{r['vc']}|{r['name']}|"
                     f"{area}|{b64(scope)}|{w}|{s}|{e}|{n}|{r['deprecated']}|"
                     f"{b64(r['description'])}")
        names.append((r['name'].lower(), 'X', key, r['deprecated']))

    # ---- alias names
    kind_for_table = {'geodetic_crs': 'C', 'projected_crs': 'P',
                      'vertical_crs': 'V', 'compound_crs': 'X',
                      'geodetic_datum': 'D', 'ellipsoid': 'B',
                      'vertical_datum': 'W'}
    for r in db.execute("select table_name t, auth_name a, code c, alt_name n"
                        " from alias_name"):
        if r['a'] in AUTHS and r['t'] in kind_for_table:
            names.append((r['n'].lower(), kind_for_table[r['t']], f"{r['a']}:{r['c']}", 0))

    # ---- operations
    op_ends = {}  # "auth:code" -> (srcCrsKey, dstCrsKey) for direction inference

    def op_line(auth, code, kind, method, sa, sc, ta, tc, acc, dep, extras,
                name, remark='', mname='', ver=''):
        w, s, e, n, area = extent_of(table_for_kind[kind], auth, code)
        scope = scope_of(table_for_kind[kind], auth, code)
        op_ends[f"{auth}:{code}"] = (f"{sa}:{sc}", f"{ta}:{tc}")
        # accuracy keeps the database's own text form ('1.0' stays '1.0'):
        # the reference surfaces it verbatim in operation summaries
        acc_t = '' if acc is None else str(acc)
        return (f"O|{auth}:{code}|{kind}|{method}|{sa}:{sc}|{ta}:{tc}|"
                f"{acc_t}|{w}|{s}|{e}|{n}|{1 if dep else 0}|{extras}|{area}|{name}|"
                f"{b64(scope)}|{b64(remark)}|{mname}|{ver or ''}")

    table_for_kind = {'H': 'helmert_transformation', 'G': 'grid_transformation',
                      'O': 'other_transformation', 'C': 'concatenated_operation',
                      'S': 'other_transformation'}

    for r in db.execute("select * from helmert_transformation"):
        if r['auth_name'] not in AUTHS or r['source_crs_auth_name'] not in AUTHS \
           or r['target_crs_auth_name'] not in AUTHS:
            continue
        kv = []
        ta, tc = r['translation_uom_auth_name'], r['translation_uom_code']
        kv.append('x=%s' % num(conv(r['tx'], ta, tc, 'm')))
        kv.append('y=%s' % num(conv(r['ty'], ta, tc, 'm')))
        kv.append('z=%s' % num(conv(r['tz'], ta, tc, 'm')))
        if r['rx'] is not None:
            ra, rc = r['rotation_uom_auth_name'], r['rotation_uom_code']
            kv.append('rx=%s' % num(conv(r['rx'], ra, rc, 'arcsec')))
            kv.append('ry=%s' % num(conv(r['ry'], ra, rc, 'arcsec')))
            kv.append('rz=%s' % num(conv(r['rz'], ra, rc, 'arcsec')))
        if r['scale_difference'] is not None:
            kv.append('s=%s' % num(conv(r['scale_difference'],
                r['scale_difference_uom_auth_name'],
                r['scale_difference_uom_code'], 'ppm')))
        if r['rate_tx'] is not None:
            ra, rc = r['rate_translation_uom_auth_name'], r['rate_translation_uom_code']
            kv.append('dx=%s' % num(conv(r['rate_tx'], ra, rc, 'm')))
            kv.append('dy=%s' % num(conv(r['rate_ty'], ra, rc, 'm')))
            kv.append('dz=%s' % num(conv(r['rate_tz'], ra, rc, 'm')))
        if r['rate_rx'] is not None:
            ra, rc = r['rate_rotation_uom_auth_name'], r['rate_rotation_uom_code']
            kv.append('drx=%s' % num(conv(r['rate_rx'], ra, rc, 'arcsec')))
            kv.append('dry=%s' % num(conv(r['rate_ry'], ra, rc, 'arcsec')))
            kv.append('drz=%s' % num(conv(r['rate_rz'], ra, rc, 'arcsec')))
        if r['rate_scale_difference'] is not None:
            kv.append('ds=%s' % num(conv(r['rate_scale_difference'],
                r['rate_scale_difference_uom_auth_name'],
                r['rate_scale_difference_uom_code'], 'ppm')))
        if r['epoch'] is not None:
            kv.append('epoch=%s' % num(conv(r['epoch'],
                r['epoch_uom_auth_name'], r['epoch_uom_code'], 'year')))
        if r['px'] is not None:
            pa, pc = r['pivot_uom_auth_name'], r['pivot_uom_code']
            kv.append('px=%s' % num(conv(r['px'], pa, pc, 'm')))
            kv.append('py=%s' % num(conv(r['py'], pa, pc, 'm')))
            kv.append('pz=%s' % num(conv(r['pz'], pa, pc, 'm')))
        lines.append(op_line(r['auth_name'], r['code'], 'H', r['method_code'],
            r['source_crs_auth_name'], r['source_crs_code'],
            r['target_crs_auth_name'], r['target_crs_code'],
            r['accuracy'], r['deprecated'], ';'.join(kv), r['name'],
            r['description'], r['method_name'], r['operation_version']))

    # grid alternatives (EPSG grid name -> PROJ-delivered file)
    galt = {}
    for r in db.execute("select original_grid_name o, proj_grid_name p,"
                        " old_proj_grid_name old, proj_grid_format f,"
                        " proj_method m, inverse_direction i"
                        " from grid_alternatives"):
        galt[r['o']] = (r['p'], r['f'], r['m'], r['i'])
        lines.append(f"A|{r['o']}|{r['p']}|{r['old'] or ''}|{r['f']}|{r['m']}|{r['i']}")

    for r in db.execute("select * from grid_transformation"):
        if r['auth_name'] not in AUTHS or r['source_crs_auth_name'] not in AUTHS \
           or r['target_crs_auth_name'] not in AUTHS:
            continue
        kv = ['grid=%s' % r['grid_name']]
        if r['grid2_name']:
            kv.append('grid2=%s' % r['grid2_name'])
        if r['interpolation_crs_auth_name']:
            kv.append('interp=%s:%s' % (r['interpolation_crs_auth_name'],
                                        r['interpolation_crs_code']))
        if r['param1_value'] is not None:
            kv.append('p%s=%s' % (r['param1_code'], num(r['param1_value'])))
        lines.append(op_line(r['auth_name'], r['code'], 'G', r['method_code'],
            r['source_crs_auth_name'], r['source_crs_code'],
            r['target_crs_auth_name'], r['target_crs_code'],
            r['accuracy'], r['deprecated'], ';'.join(kv), r['name'],
            r['description'], r['method_name'], r['operation_version']))

    for r in db.execute("select * from other_transformation"):
        if r['auth_name'] not in AUTHS or r['source_crs_auth_name'] not in AUTHS \
           or r['target_crs_auth_name'] not in AUTHS:
            continue
        if r['method_auth_name'] == 'PROJ':
            # raw PROJ-string method: keep verbatim (base64 to survive the
            # pipe-separated format)
            enc = base64.b64encode(r['method_name'].encode()).decode()
            lines.append(op_line(r['auth_name'], r['code'], 'S', 'projstring',
                r['source_crs_auth_name'], r['source_crs_code'],
                r['target_crs_auth_name'], r['target_crs_code'],
                r['accuracy'], r['deprecated'], 'str=' + enc, r['name'],
                r['description'], '', r['operation_version']))
            continue
        kv = []
        for i in range(1, 10):
            pc = r[f'param{i}_code']
            if pc is None:
                continue
            v = r[f'param{i}_value']
            ua, uc = r[f'param{i}_uom_auth_name'], r[f'param{i}_uom_code']
            typ = uom[(ua, str(uc))][2] if (ua and uc is not None) else 'scale'
            if typ == 'angle':
                v = conv(v, ua, uc, 'deg')
            elif typ == 'length':
                v = conv(v, ua, uc, 'm')
            elif str(r['method_code']) == '1143' and str(pc) == '8611':
                # Position Vector (geocen) & NEU velocities: Scale
                # difference is registered in ppb; the PROJ helmert step
                # takes ppm (reference singleoperation.cpp ~5060
                # parameterValueNumeric(..., PARTS_PER_MILLION))
                v = conv(v, ua, uc, 'ppm')
            # other scale params keep their raw value (similarity scale is
            # unity)
            kv.append('p%s=%s' % (pc, num(v)))
        if r['grid_name']:
            kv.append('grid=%s' % r['grid_name'])
        if r['interpolation_crs_auth_name']:
            kv.append('interp=%s:%s' % (r['interpolation_crs_auth_name'],
                                        r['interpolation_crs_code']))
        lines.append(op_line(r['auth_name'], r['code'], 'O', r['method_code'],
            r['source_crs_auth_name'], r['source_crs_code'],
            r['target_crs_auth_name'], r['target_crs_code'],
            r['accuracy'], r['deprecated'], ';'.join(kv), r['name'],
            r['description'], r['method_name'], r['operation_version']))

    steps = {}
    for r in db.execute("select operation_auth_name a, operation_code c,"
                        " step_auth_name sa, step_code sc, step_direction d"
                        " from concatenated_operation_step order by a, c, step_number"):
        steps.setdefault((r['a'], str(r['c'])), []).append(
            (r['d'], f"{r['sa']}:{r['sc']}"))

    def end_key(crs):
        # datum for geodetic CRSs so 2D/3D realizations chain; code otherwise
        return crs_datum.get(crs, crs)

    for r in db.execute("select * from concatenated_operation"):
        if r['auth_name'] not in AUTHS or r['source_crs_auth_name'] not in AUTHS \
           or r['target_crs_auth_name'] not in AUTHS:
            continue
        # a NULL step_direction means "whichever direction continues the
        # chain" (the schema requires explicit directions all-or-nothing) —
        # infer by walking from the concatenation's source CRS
        cur = end_key(f"{r['source_crs_auth_name']}:{r['source_crs_code']}")
        toks = []
        for d, code in steps.get((r['auth_name'], str(r['code'])), []):
            ends = op_ends.get(code)
            if d == 'reverse':
                toks.append('-' + code)
                if ends:
                    cur = end_key(ends[0])
            elif d == 'forward' or ends is None:
                toks.append('+' + code)
                if ends:
                    cur = end_key(ends[1])
            else:
                skey, dkey2 = end_key(ends[0]), end_key(ends[1])
                if dkey2 == cur and skey != cur:
                    toks.append('-' + code)
                    cur = skey
                else:
                    toks.append('+' + code)
                    cur = dkey2
        lines.append(op_line(r['auth_name'], r['code'], 'C', '',
            r['source_crs_auth_name'], r['source_crs_code'],
            r['target_crs_auth_name'], r['target_crs_code'],
            r['accuracy'], r['deprecated'], 'steps=' + ','.join(toks), r['name'],
            r['description'], '', r['operation_version']))

    # ---- ESRI authority: deprecated ESRI codes map to their EPSG
    # replacements (the reference resolves ESRI:102100 via the deprecation
    # table), and the ESRI WKT1 names alias the same EPSG objects.
    # Z|ESRI:code|EPSG:code
    esri_name = {}
    for t in ('geodetic_crs', 'projected_crs', 'vertical_crs', 'compound_crs'):
        for r in db.execute(f"select code, name from {t}"
                            " where auth_name='ESRI'"):
            esri_name[str(r['code'])] = r['name']
    kind_for_dep = {'geodetic_crs': 'C', 'projected_crs': 'P',
                    'vertical_crs': 'V', 'compound_crs': 'X'}
    for r in db.execute("select table_name t, deprecated_code c,"
                        " replacement_auth_name ra, replacement_code rc"
                        " from deprecation where deprecated_auth_name='ESRI'"):
        if r['ra'] != 'EPSG' or r['t'] not in kind_for_dep:
            continue
        lines.append(f"Z|ESRI:{r['c']}|EPSG:{r['rc']}")
        nm = esri_name.get(str(r['c']))
        if nm:
            names.append((nm.lower(), kind_for_dep[r['t']],
                          f"EPSG:{r['rc']}", 0))

    # ---- deprecation (replacement objects): Y|old|new
    for r in db.execute("select table_name t, deprecated_auth_name a,"
                        " deprecated_code c, replacement_auth_name ra,"
                        " replacement_code rc from deprecation"):
        if r['a'] in AUTHS and r['ra'] in AUTHS:
            lines.append(f"Y|{r['a']}:{r['c']}|{r['ra']}:{r['rc']}")

    for r in db.execute("select superseded_auth_name a, superseded_code c,"
                        " replacement_auth_name ra, replacement_code rc,"
                        " same_source_target_crs s from supersession"):
        if r['a'] in AUTHS and r['ra'] in AUTHS:
            lines.append(f"U|{r['a']}:{r['c']}|{r['ra']}:{r['rc']}|{r['s']}")

    # ---- operation-parameter names: T|code|name (for WKT PARAMETER output).
    # The conversion/other_transformation tables carry names inline; the
    # helmert/offset family has fixed columns, so those EPSG names are listed
    # here (public EPSG registry vocabulary).
    pnames = {
        8601: 'Latitude offset', 8602: 'Longitude offset',
        8603: 'Vertical offset', 8605: 'X-axis translation',
        8606: 'Y-axis translation', 8607: 'Z-axis translation',
        8608: 'X-axis rotation', 8609: 'Y-axis rotation',
        8610: 'Z-axis rotation', 8611: 'Scale difference',
        1040: 'Rate of change of X-axis translation',
        1041: 'Rate of change of Y-axis translation',
        1042: 'Rate of change of Z-axis translation',
        1043: 'Rate of change of X-axis rotation',
        1044: 'Rate of change of Y-axis rotation',
        1045: 'Rate of change of Z-axis rotation',
        1046: 'Rate of change of Scale difference',
        1049: 'Parameter reference epoch',
        8617: 'Ordinate 1 of evaluation point',
        8618: 'Ordinate 2 of evaluation point',
        8667: 'Ordinate 3 of evaluation point',
        8619: 'Ordinate 1 of evaluation point in source CRS',
        8624: 'Ordinate 2 of evaluation point in source CRS',
        8666: 'Ordinate 3 of evaluation point in source CRS',
        8620: 'Ordinate 1 of evaluation point in target CRS',
        8625: 'Ordinate 2 of evaluation point in target CRS',
        8668: 'Ordinate 3 of evaluation point in target CRS',
        8621: 'Semi-major axis length difference',
        8622: 'Flattening difference',
        1061: 'Unit conversion scalar',
    }
    for table in ('conversion', 'other_transformation'):
        for r in db.execute(f"select * from {table}"):
            for k in range(1, 10):
                try:
                    pc = r[f'param{k}_code']
                except IndexError:
                    break
                if pc is not None and r[f'param{k}_name']:
                    pnames.setdefault(int(pc), r[f'param{k}_name'])
    for pc in sorted(pnames):
        lines.append(f"T|{pc}|{pnames[pc]}")

    # name index: non-deprecated objects first so lookups prefer them
    names.sort(key=lambda t: (t[3], t[0]))
    seen = set()
    for nm, k, key, dep in names:
        if (nm, k, key) in seen:
            continue
        seen.add((nm, k, key))
        lines.append(f"N|{nm}|{k}|{key}")

    with open(OUT, 'w') as f:
        f.write("# Coordinate-operation sidecar generated by devtools/"
                "epsg_ops_gen.py\n# from the reference's public EPSG SQL data"
                " (data/sql/*.sql). Format: see generator docstring.\n")
        f.write('\n'.join(lines))
        f.write('\n')
    print(f"wrote {OUT}: {len(lines)} lines")

if __name__ == '__main__':
    main()
