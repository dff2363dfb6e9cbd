#!/usr/bin/env python3
"""Generate src/test/resources/aoi_real_fixture.gpkg.

Fixture for the declared-affinity typing path of graft.sources.GeoPackage:
a REAL column whose first stored value has no fractional part (SQLite
stores it as INTEGER on disk — the serial type the reader must NOT trust
over the declared type), plus a NUMERIC column with mixed Long/Double
storage. Pure stdlib; run from the repo root.
"""
import sqlite3
import struct
import os

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/test/resources/aoi_real_fixture.gpkg")


def gp_blob(coords):
    """GPKG geometry blob: GP header (no envelope) + little-endian WKB
    Polygon with one ring."""
    hdr = b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", 4326)
    wkb = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(coords))
    for x, y in coords:
        wkb += struct.pack("<dd", x, y)
    return hdr + wkb


def main():
    try:
        os.remove(OUT)
    except FileNotFoundError:
        pass
    con = sqlite3.connect(OUT)
    cur = con.cursor()
    cur.execute("CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
                "data_type TEXT, identifier TEXT, srs_id INTEGER)")
    cur.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, "
                "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, "
                "z TINYINT, m TINYINT)")
    cur.execute("CREATE TABLE fields (fid INTEGER PRIMARY KEY, name TEXT, "
                "score REAL, yield NUMERIC, geom BLOB)")
    cur.execute("INSERT INTO gpkg_contents VALUES ('fields','features','fields',4326)")
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES "
                "('fields','geom','POLYGON',4326,0,0)")
    square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    rows = [
        (1, "a", 2.0, 7, gp_blob(square)),      # score stored as INTEGER
        (2, "b", 2.5, 7.25, gp_blob(square)),   # score stored as REAL
        (3, "c", None, None, gp_blob(square)),
    ]
    cur.executemany("INSERT INTO fields VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()
    # sanity: row 1's score must be integer-stored on disk
    con = sqlite3.connect(OUT)
    t = con.execute("SELECT typeof(score) FROM fields WHERE fid=1").fetchone()[0]
    assert t == "real", t  # sqlite reports declared-affinity type back
    con.close()
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
