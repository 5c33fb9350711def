#!/usr/bin/env python3
"""Build an sf-shaped testdata variant with NULLs injected into the
nullable narrative columns (documents.text/lang, events.ts/value) —
rule-3 insurance: the driver can regenerate testdata between rounds with
different physical characteristics, and the gate contract must survive
rows whose text/lang/ts are NULL rather than merely absent.

Injection is deterministic (id-modulus), so Spark and the DuckDB oracle
see the identical variant. Non-injected tables are copied byte-for-byte.

Usage: python3 tools/make_null_variant.py <src_sf_dir> <out_dir>
"""
import shutil
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src, out = Path(sys.argv[1]), Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        sp, op = src / f"{t}.parquet", out / f"{t}.parquet"
        if t == "documents":
            # ~1% NULL text, ~1% NULL lang (disjoint-ish residues)
            con.sql(
                f"""COPY (SELECT doc_id,
                       CASE WHEN doc_id % 97 = 13 THEN NULL ELSE text END AS text,
                       CASE WHEN doc_id % 89 = 7 THEN NULL ELSE lang END AS lang,
                       source, n_chars
                     FROM '{sp}' ORDER BY doc_id)
                    TO '{op}' (FORMAT PARQUET)""")
        elif t == "events":
            # ~0.7% NULL ts, ~0.7% NULL value
            con.sql(
                f"""COPY (SELECT event_id,
                       CASE WHEN event_id % 151 = 31 THEN NULL ELSE ts END AS ts,
                       user_id, event_type,
                       CASE WHEN event_id % 139 = 11 THEN NULL ELSE value END AS value,
                       props
                     FROM '{sp}' ORDER BY event_id)
                    TO '{op}' (FORMAT PARQUET)""")
        else:
            if op.is_dir():
                shutil.rmtree(op)
            elif op.exists():
                op.unlink()
            if sp.is_dir():
                shutil.copytree(sp, op)
            else:
                shutil.copy2(sp, op)
    ndoc = con.sql(f"SELECT count(*) FILTER (WHERE text IS NULL), "
                   f"count(*) FILTER (WHERE lang IS NULL), count(*) "
                   f"FROM '{out}/documents.parquet'").fetchone()
    nev = con.sql(f"SELECT count(*) FILTER (WHERE ts IS NULL), "
                  f"count(*) FILTER (WHERE value IS NULL), count(*) "
                  f"FROM '{out}/events.parquet'").fetchone()
    print(f"documents: {ndoc[0]} null text, {ndoc[1]} null lang of {ndoc[2]}")
    print(f"events: {nev[0]} null ts, {nev[1]} null value of {nev[2]}")


if __name__ == "__main__":
    main()
