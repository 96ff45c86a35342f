#!/usr/bin/env python3
"""Generate a legacy proj4-style `epsg` init file from the reference's public
EPSG SQL data (/root/reference/data/sql/*.sql).

Emits src/main/resources/graft/epsg with entries of the form

    <4326> +proj=longlat +a=6378137.0 +rf=298.257223563 +towgs84=0,0,0 +no_defs <>

covering every EPSG geographic-2D / geocentric CRS and every projected CRS
whose conversion method maps onto one of the engine's projection kernels.
The method->proj mapping mirrors the reference's own PROJ-string export rules
(src/iso19111/operation/parammappings.cpp and conversion.cpp:3950-4110 —
somerc special case for HOM with azimuth=gamma=90, +no_uoff for variant A,
tmerc +axis=wsu for TM South Orientated, merc +lat_ts for variant B, lcc 2SP
used for 2SP-Belgium as the reference does).

towgs84 values for the classic datums are the legacy proj4 epsg-file values
(public knowledge); they matter only on the cs2cs-emulation path.
"""
import re, sqlite3, sys, os

SQL_DIR = "/root/reference/data/sql"
OUT = os.path.join(os.path.dirname(__file__), "..", "src/main/resources/graft/epsg")

# ---------------------------------------------------------------- sql loading

def tokenize_values(s):
    """Parse the literal list inside VALUES(...) -> list of (value, raw)."""
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c in ", \t":
            i += 1
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        buf.append("'"); j += 2; continue
                    break
                buf.append(s[j]); j += 1
            out.append(("".join(buf), None))
            i = j + 1
        else:
            j = i
            while j < n and s[j] not in ",)":
                j += 1
            raw = s[i:j].strip()
            if raw.upper() == "NULL":
                out.append((None, None))
            else:
                try:
                    out.append((int(raw), raw))
                except ValueError:
                    out.append((float(raw), raw))
            i = j
    return out

def load(db, table, filename):
    pat = 'INSERT INTO "%s" VALUES(' % table
    created = False
    cur = db.cursor()
    with open(os.path.join(SQL_DIR, filename)) as f:
        for line in f:
            if not line.startswith(pat):
                continue
            body = line.strip()[len(pat):]
            if body.endswith(");"):
                body = body[:-2]
            vals = tokenize_values(body)
            if not created:
                cols = ",".join("c%d" % k for k in range(len(vals)))
                cur.execute("CREATE TABLE IF NOT EXISTS %s(%s)" % (table, cols))
                created = True
            cur.execute(
                "INSERT INTO %s VALUES(%s)" % (table, ",".join("?" * len(vals))),
                [v for v, _ in vals])
    db.commit()

# ------------------------------------------------------------- unit handling

def fmt(x):
    """Shortest round-trip repr without exponent surprises."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)

class Units:
    def __init__(self, db):
        self.factor = {}
        self.type = {}
        for code, typ, f in db.execute(
                "SELECT c1, c3, c4 FROM unit_of_measure WHERE c0='EPSG'"):
            self.factor[int(code)] = f
            self.type[int(code)] = typ

    def angle_deg(self, value, raw, uom):
        """EPSG angle value -> degrees, preserving decimal precision."""
        if uom == 9102:          # degree
            return value
        if uom == 9110:          # sexagesimal DMS: (-)DDD.MMSSsssss
            s = raw if raw is not None else repr(value)
            neg = s.startswith("-")
            s = s.lstrip("+-")
            if "." in s:
                d, frac = s.split(".", 1)
            else:
                d, frac = s, ""
            frac = (frac + "0000")  # pad so mm/ss always present
            mm = int(frac[0:2]); ss = int(frac[2:4])
            sfrac = frac[4:].rstrip("0")
            sec = ss + (int(sfrac) / (10.0 ** len(sfrac)) if sfrac else 0.0)
            deg = int(d) + mm / 60.0 + sec / 3600.0
            return -deg if neg else deg
        if uom == 9105:          # grad
            return value * 0.9
        if uom == 9104:          # arc-second
            return value / 3600.0
        if uom == 9103:          # arc-minute
            return value / 60.0
        if uom == 9101:          # radian
            return value * 180.0 / 3.14159265358979323846
        f = self.factor.get(uom)
        if f is None:
            raise KeyError("angle uom %s" % uom)
        return value * f * 180.0 / 3.14159265358979323846

    def length_m(self, value, uom):
        f = self.factor.get(uom)
        if f is None:
            raise KeyError("length uom %s" % uom)
        return value * f

    def scale(self, value, uom):
        if uom == 9201:
            return value
        f = self.factor.get(uom)
        if f is None:
            raise KeyError("scale uom %s" % uom)
        return value * f

# legacy proj4 epsg-file datum shifts (datum code -> towgs84); only the
# classic entries whose values were published in the proj4 epsg init file.
TOWGS84 = {
    6326: "0,0,0", 6258: "0,0,0", 6283: "0,0,0", 6269: "0,0,0",
    6152: "0,0,0", 6674: "0,0,0", 6148: "0,0,0", 6171: "0,0,0",
    6619: "0,0,0", 6167: "0,0,0", 6140: "0,0,0", 6759: "0,0,0",
    1168: "0,0,0",  # GDA2020
    6230: "-87,-98,-121",          # ED50
    6275: "-168,-60,320,0,0,0,0",  # NTF
    6807: "-168,-60,320,0,0,0,0",  # NTF (Paris)
    6237: "52.17,-71.82,-14.9,0,0,0,0",  # HD72
    6211: "-377,681,-50",          # Batavia
    6289: "565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725",  # Amersfoort
    6313: "-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,-1.2747",     # Belge 1972
    6284: "23.92,-141.27,-80.9,0,0.35,0.82,-0.12",                      # Pulkovo 1942
    6277: "446.448,-125.157,542.06,0.15,0.247,0.842,-20.489",           # OSGB36
    6314: "598.1,73.7,418.2,0.202,0.045,-2.455,6.7",                    # DHDN
    6121: "-199.87,74.79,246.62",  # GGRS87
    6272: "59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993",  # NZGD49
    6299: "482.53,-130.596,564.557,-1.042,-0.214,-0.631,8.15",  # TM65 / Ireland 1965
    6312: "577.326,90.129,463.919,5.137,1.474,5.297,2.4232",  # MGI
    6222: "-136,-108,-292",        # Cape
    6221: "-148,136,90",           # Campo Inchauspe
    6618: "-59,-11,-52",           # SAD69 (96)? use 6618 SAD69
}

UNIT_NAME = {9001: "m", 9002: "ft", 9003: "us-ft", 9036: "km",
             9030: "kmi", 9093: "mi", 9094: "ft", 9096: "yd", 9097: "ch",
             9098: "link"}

def main():
    db = sqlite3.connect(":memory:")
    load(db, "unit_of_measure", "unit_of_measure.sql")
    load(db, "ellipsoid", "ellipsoid.sql")
    load(db, "prime_meridian", "prime_meridian.sql")
    load(db, "geodetic_datum", "geodetic_datum.sql")
    load(db, "geodetic_crs", "geodetic_crs.sql")
    load(db, "conversion", "conversion.sql")
    load(db, "projected_crs", "projected_crs.sql")
    load(db, "coordinate_system", "coordinate_system.sql")
    load(db, "axis", "axis.sql")
    units = Units(db)

    # ellipsoid code -> "+a=... +rf=..." / "+a=... +b=..."
    ell = {}
    for code, a, uoma_raw, rf, b in db.execute(
            "SELECT c1, c6, c8, c9, c10 FROM ellipsoid WHERE c0='EPSG'"):
        uom = int(uoma_raw)
        am = units.length_m(a, uom)
        if rf is not None and rf != 0:
            ell[int(code)] = "+a=%s +rf=%s" % (fmt(am), fmt(rf))
        else:
            bm = units.length_m(b, uom)
            ell[int(code)] = "+a=%s +b=%s" % (fmt(am), fmt(bm))

    # prime meridian code -> '+pm=...' or ''
    KNOWN_PM = {"greenwich", "lisbon", "paris", "bogota", "madrid", "rome",
                "bern", "jakarta", "ferro", "brussels", "stockholm", "athens",
                "oslo"}
    pm = {}
    for code, name, lon, lon_raw_id, uom in db.execute(
            "SELECT c1, c2, c3, c3, c5 FROM prime_meridian WHERE c0='EPSG'"):
        deg = units.angle_deg(lon, None if isinstance(lon, int) else repr(lon),
                              int(uom))
        # re-derive with raw text for 9110 precision
        if int(uom) == 9110:
            row = db.execute("SELECT c3 FROM prime_meridian WHERE c0='EPSG' AND c1=?",
                             (code,)).fetchone()
            deg = units.angle_deg(row[0], repr(row[0]), 9110)
        nm = str(name).lower()
        if abs(deg) < 1e-12:
            pm[int(code)] = ""
        elif nm in KNOWN_PM:
            pm[int(code)] = " +pm=%s" % nm
        else:
            pm[int(code)] = " +pm=%s" % repr(deg)

    # datum code -> (ellps string, pm string, towgs84 string)
    datum = {}
    for code, ecode, pcode in db.execute(
            "SELECT c1, c5, c7 FROM geodetic_datum WHERE c0='EPSG'"):
        if ecode is None:
            continue
        dcode = int(code)
        tow = TOWGS84.get(dcode)
        datum[dcode] = (ell.get(int(ecode), None), pm.get(int(pcode), ""),
                        (" +towgs84=" + tow) if tow else "")

    # geographic/geocentric CRS -> init line + remember datum per CRS
    out = {}
    geog_datum = {}
    for code, name, typ, dcode in db.execute(
            "SELECT c1, c2, c4, c8 FROM geodetic_crs WHERE c0='EPSG'"):
        if dcode is None or int(dcode) not in datum:
            continue
        e, p, t = datum[int(dcode)]
        if e is None:
            continue
        c = int(code)
        geog_datum[c] = int(dcode)
        if typ == "geographic 2D":
            out[c] = "+proj=longlat %s%s%s +no_defs" % (e, p, t)
        elif typ == "geocentric":
            out[c] = "+proj=geocent %s%s%s +units=m +no_defs" % (e, p, t)
        elif typ == "geographic 3D":
            out[c] = "+proj=longlat %s%s%s +no_defs" % (e, p, t)

    # conversions
    conv = {}
    for row in db.execute("SELECT * FROM conversion WHERE c0='EPSG'"):
        code = int(row[1])
        method = int(row[5])
        params = {}
        for k in range(7):
            base = 7 + k * 6
            pcode = row[base + 1]
            if pcode is None:
                continue
            params[int(pcode)] = (row[base + 3], row[base + 5])
        conv[code] = (method, params)

    # cs code -> (+units/to_meter suffix or None-to-skip)
    cs_unit = {}
    cs_orient = {}
    for cscode, order, orient, uom in db.execute(
            "SELECT c6, c7, c4, c9 FROM axis WHERE c0='EPSG'"):
        c = int(cscode)
        if int(order) == 1 and uom is not None:
            cs_unit[c] = int(uom)
        cs_orient.setdefault(c, []).append((int(order), orient))

    def unit_suffix(cscode):
        uom = cs_unit.get(cscode)
        if uom is None:
            return None
        if units.type.get(uom) != "length":
            return None
        nm = UNIT_NAME.get(uom)
        if nm == "m":
            return " +units=m"
        if nm is not None:
            return " +units=%s" % nm
        f = units.factor.get(uom)
        if f is None:
            return None
        return " +to_meter=%s" % repr(f)

    stats = {"ok": 0, "skip_method": 0, "skip_err": 0}
    skipped_methods = {}

    def angle(params, pcode, default=None):
        if pcode not in params:
            if default is not None:
                return default
            raise KeyError(pcode)
        v, uom = params[pcode]
        return units.angle_deg(v, repr(v), int(uom))

    def length(params, pcode, default=None):
        if pcode not in params:
            if default is not None:
                return default
            raise KeyError(pcode)
        v, uom = params[pcode]
        return units.length_m(v, int(uom))

    def scale(params, pcode, default=None):
        if pcode not in params:
            if default is not None:
                return default
            raise KeyError(pcode)
        v, uom = params[pcode]
        return units.scale(v, int(uom))

    def build_proj(method, params, cscode):
        """Return (projstr, axis_suffix) or None if unsupported."""
        A = lambda p, d=None: angle(params, p, d)
        L = lambda p, d=None: length(params, p, d)
        S = lambda p, d=None: scale(params, p, d)
        if method == 9807:      # Transverse Mercator
            return ("+proj=tmerc +lat_0=%s +lon_0=%s +k=%s +x_0=%s +y_0=%s" % (
                fmt(A(8801)), fmt(A(8802)), repr(S(8805, 1.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 1052:      # Colombia Urban
            return ("+proj=col_urban +lat_0=%s +lon_0=%s +x_0=%s +y_0=%s +h_0=%s" % (
                fmt(A(8801)), fmt(A(8802)), fmt(L(8806, 0.0)),
                fmt(L(8807, 0.0)), fmt(L(1039, 0.0))), "")
        if method == 9808:      # TM South Orientated -> tmerc +axis=wsu
            if L(8806, 0.0) != 0 or L(8807, 0.0) != 0:
                return None
            return ("+proj=tmerc +lat_0=%s +lon_0=%s +k=%s +x_0=0 +y_0=0" % (
                fmt(A(8801)), fmt(A(8802)), repr(S(8805, 1.0))), " +axis=wsu")
        if method == 9801:      # LCC 1SP
            la = A(8801)
            return ("+proj=lcc +lat_1=%s +lat_0=%s +lon_0=%s +k_0=%s +x_0=%s +y_0=%s" % (
                repr(la), repr(la), fmt(A(8802)), repr(S(8805, 1.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method in (9802, 9803):  # LCC 2SP (Belgium treated as plain 2SP,
                                    # like the reference's WKT1/PROJ4 export)
            return ("+proj=lcc +lat_0=%s +lon_0=%s +lat_1=%s +lat_2=%s +x_0=%s +y_0=%s" % (
                fmt(A(8821)), fmt(A(8822)), repr(A(8823)), repr(A(8824)),
                fmt(L(8826, 0.0)), fmt(L(8827, 0.0))), "")
        if method == 1051:      # LCC 2SP Michigan
            return ("+proj=lcc +lat_0=%s +lon_0=%s +lat_1=%s +lat_2=%s +x_0=%s +y_0=%s +k_0=%s" % (
                fmt(A(8821)), fmt(A(8822)), repr(A(8823)), repr(A(8824)),
                fmt(L(8826, 0.0)), fmt(L(8827, 0.0)), repr(S(1038, 1.0))), "")
        if method == 9804:      # Mercator variant A
            if A(8801, 0.0) != 0:
                return None
            return ("+proj=merc +lon_0=%s +k=%s +x_0=%s +y_0=%s" % (
                fmt(A(8802)), repr(S(8805, 1.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9805:      # Mercator variant B
            return ("+proj=merc +lat_ts=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                repr(A(8823)), fmt(A(8802)), fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9809:      # Oblique Stereographic
            return ("+proj=sterea +lat_0=%s +lon_0=%s +k=%s +x_0=%s +y_0=%s" % (
                repr(A(8801)), repr(A(8802)), repr(S(8805, 1.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9810:      # Polar Stereographic variant A
            return ("+proj=stere +lat_0=%s +lon_0=%s +k=%s +x_0=%s +y_0=%s" % (
                fmt(A(8801)), fmt(A(8802)), repr(S(8805, 1.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9829:      # Polar Stereographic variant B
            ts = A(8832)
            pole = 90 if ts >= 0 else -90
            return ("+proj=stere +lat_0=%d +lat_ts=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                pole, repr(ts), fmt(A(8833)), fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method in (9812, 9815):  # Hotine Oblique Mercator A/B
            az = A(8813); gamma = A(8814, az)
            lat0 = A(8811); lonc = A(8812); k = S(8815, 1.0)
            if abs(az - 90) < 1e-4 and abs(gamma - 90) < 1e-4:
                x0 = L(8806, 0.0) if method == 9812 else L(8816, 0.0)
                y0 = L(8807, 0.0) if method == 9812 else L(8817, 0.0)
                return ("+proj=somerc +lat_0=%s +lon_0=%s +k_0=%s +x_0=%s +y_0=%s" % (
                    repr(lat0), repr(lonc), repr(k), fmt(x0), fmt(y0)), "")
            if method == 9812:
                return ("+proj=omerc +no_uoff +lat_0=%s +lonc=%s +alpha=%s +gamma=%s +k=%s +x_0=%s +y_0=%s" % (
                    repr(lat0), repr(lonc), repr(az), repr(gamma), repr(k),
                    fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
            return ("+proj=omerc +lat_0=%s +lonc=%s +alpha=%s +gamma=%s +k=%s +x_0=%s +y_0=%s" % (
                repr(lat0), repr(lonc), repr(az), repr(gamma), repr(k),
                fmt(L(8816, 0.0)), fmt(L(8817, 0.0))), "")
        if method == 9822:      # Albers Equal Area
            return ("+proj=aea +lat_0=%s +lon_0=%s +lat_1=%s +lat_2=%s +x_0=%s +y_0=%s" % (
                fmt(A(8821)), fmt(A(8822)), repr(A(8823)), repr(A(8824)),
                fmt(L(8826, 0.0)), fmt(L(8827, 0.0))), "")
        if method == 9806:      # Cassini-Soldner
            return ("+proj=cass +lat_0=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                repr(A(8801)), repr(A(8802)), fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9820:      # Lambert Azimuthal Equal Area
            return ("+proj=laea +lat_0=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                repr(A(8801)), repr(A(8802)), fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9818:      # Polyconic
            return ("+proj=poly +lat_0=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                fmt(A(8801)), fmt(A(8802)), fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 9811:      # New Zealand Map Grid
            return ("+proj=nzmg +lat_0=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                repr(A(8801)), repr(A(8802)), fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method == 1024:      # Popular Visualisation Pseudo Mercator
            return ("+proj=webmerc +lat_0=%s +lon_0=%s +x_0=%s +y_0=%s" % (
                fmt(A(8801, 0.0)), fmt(A(8802, 0.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), "")
        if method in (9819, 1041):  # Krovak (south orientated / north)
            colat = A(1036, 30.28813972222222)
            latps = A(8818, 78.5)
            axis = " +axis=swu" if method == 9819 else ""
            return ("+proj=krovak +lat_0=%s +lon_0=%s +alpha=%s +k=%s +x_0=%s +y_0=%s" % (
                repr(A(8811)), repr(A(8833)), repr(colat), repr(S(8819, 1.0)),
                fmt(L(8806, 0.0)), fmt(L(8807, 0.0))), axis)
        return None

    for code, cscode, gcode, ccode in db.execute(
            "SELECT c1, c5, c7, c9 FROM projected_crs WHERE c0='EPSG' AND c9 IS NOT NULL"):
        c = int(code)
        if int(gcode) not in geog_datum or int(ccode) not in conv:
            continue
        method, params = conv[int(ccode)]
        usuf = unit_suffix(int(cscode))
        if usuf is None:
            stats["skip_err"] += 1
            continue
        try:
            r = build_proj(method, params, int(cscode))
        except KeyError:
            stats["skip_err"] += 1
            continue
        if r is None:
            stats["skip_method"] += 1
            skipped_methods[method] = skipped_methods.get(method, 0) + 1
            continue
        projstr, axis_suffix = r
        e, p, t = datum[geog_datum[int(gcode)]]
        out[c] = "%s %s%s%s%s%s +no_defs" % (projstr, e, p, t, usuf, axis_suffix)
        stats["ok"] += 1

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("# EPSG init file generated by devtools/epsg_init_gen.py from\n")
        f.write("# the reference's public EPSG SQL data (data/sql/*.sql).\n")
        f.write("# Legacy proj4 init-file format: <code> ...definition... <>\n")
        for c in sorted(out):
            f.write("<%d> %s <>\n" % (c, out[c]))

    # ---- authority axis-order sidecar (epsg_axis) --------------------------
    # The init table above is GIS order (lon,lat / easting,northing); bare
    # `EPSG:code` usage in cs2cs is authority order. Emit one line per code
    # whose authority FIRST axis deviates from GIS order, or whose angular
    # unit is not degree: "code first unit" with first in {north, south,
    # west} and unit in {deg, grad}.
    cs_first = {}
    for cscode, orient, order, uom in db.execute(
            "SELECT c6, c4, c7, c9 FROM axis WHERE c0='EPSG' AND c7=1"):
        if cscode is None or orient is None or uom is None:
            continue
        cs_first[int(cscode)] = (str(orient), int(uom))
    geog_cs = {int(code): int(cscode) for code, cscode in db.execute(
        "SELECT c1, c6 FROM geodetic_crs WHERE c0='EPSG' AND c6 IS NOT NULL")}
    proj_cs = {int(code): int(cscode) for code, cscode in db.execute(
        "SELECT c1, c5 FROM projected_crs WHERE c0='EPSG' AND c5 IS NOT NULL")}
    UNIT = {9105: "grad"}  # anything else in first-axis position is degree/metre
    axis_out = {}
    for c in sorted(out):
        cs = geog_cs.get(c, proj_cs.get(c))
        if cs is None or cs not in cs_first:
            continue
        orient, uom = cs_first[cs]
        unit = UNIT.get(uom, "deg")
        if orient in ("north", "south", "west") or unit != "deg":
            axis_out[c] = "%s %s" % (orient, unit)
    axis_path = os.path.join(os.path.dirname(OUT), "epsg_axis")
    with open(axis_path, "w") as f:
        f.write("# Authority axis-order sidecar generated by\n")
        f.write("# devtools/epsg_init_gen.py from the EPSG SQL axis table:\n")
        f.write("# 'code firstAxisOrientation angularUnit' for codes whose\n")
        f.write("# authority order/unit deviates from the GIS-order table.\n")
        for c in sorted(axis_out):
            f.write("%d %s\n" % (c, axis_out[c]))
    print("axis sidecar: %d deviating codes -> %s" % (len(axis_out), axis_path))
    print("wrote %d entries (projected ok=%d, skip_method=%d, skip_err=%d)" %
          (len(out), stats["ok"], stats["skip_method"], stats["skip_err"]))
    print("skipped methods:", dict(sorted(skipped_methods.items(),
                                          key=lambda kv: -kv[1])[:15]))

if __name__ == "__main__":
    main()
