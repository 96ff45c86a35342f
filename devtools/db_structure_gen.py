#!/usr/bin/env python3
"""Generate `src/main/resources/graft/epsg_db_structure` — the DDL dump
`projinfo --dump-db-structure` prints.

Mirrors DatabaseContext::getDatabaseStructure()
(reference src/iso19111/factory.cpp:1284): each sqlite_master sql||';' for
tables (excluding sqlite_stat*), then views, then triggers, in
sqlite_master order, followed by the two DATABASE.LAYOUT.VERSION metadata
INSERTs. The schema is loaded from the reference's public
proj_db_table_defs.sql, so the stored SQL text round-trips verbatim.
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from epsg_ops_gen import load

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/epsg_db_structure")


def main():
    db = load()
    out = open(OUT, 'w')
    n = 0
    for objtype in ("'table' AND name NOT LIKE 'sqlite_stat%'", "'view'",
                    "'trigger'"):
        for r in db.execute("SELECT sql||';' FROM sqlite_master WHERE "
                            f"type = {objtype}"):
            out.write(r[0] + "\n")
            n += 1
    major = minor = None
    for r in db.execute("SELECT key, value FROM metadata WHERE key IN "
                        "('DATABASE.LAYOUT.VERSION.MAJOR',"
                        "'DATABASE.LAYOUT.VERSION.MINOR')"):
        if r[0].endswith('MAJOR'):
            major = r[1]
        else:
            minor = r[1]
    if major is not None:
        out.write("INSERT INTO metadata VALUES("
                  f"'DATABASE.LAYOUT.VERSION.MAJOR',{major});\n")
        out.write("INSERT INTO metadata VALUES("
                  f"'DATABASE.LAYOUT.VERSION.MINOR',{minor});\n")
    out.close()
    print(f"wrote {n} DDL statements -> {OUT}")


if __name__ == '__main__':
    main()
