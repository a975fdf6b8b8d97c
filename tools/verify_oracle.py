"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, column names
and an order-insensitive value hash (columns sorted by name, rows sorted
by their stringified tuple). This is the tight feedback loop used while
developing — run before every commit:

    python tools/verify_oracle.py [sf_dir] [query ...]

``--json PATH`` additionally records {query: {sf, pass, wall_s, status}}
to PATH, MERGING into an existing file (so an sf0.01 run and an sf0.1
run land in one artifact, keyed ``query@sf``). This is the committed
evidence trail the round-5 verdict asked for: whenever a commit touches
an oracled query that won't fit the 50-slot driver window that round,
run the sweep and commit ``SWEEP_VERIFY_r{N}.json`` so the judge can
read the builder-side verification instead of re-running it.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from dnsflow_clickhouse_spark.schemas import TESTDATA_TABLES
from dnsflow_clickhouse_spark.session import get_spark


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Keep the float-ness visible (2.0 stays "2.0"): collapsing to
        # "2" masked int-vs-float representation drift that the driver's
        # stricter normalization catches (round-1 HUGEINT incident).
        return repr(v)
    return str(v)


# Canonical type categories so the Spark schema and the DuckDB oracle
# schema can be compared engine-neutrally. DuckDB HUGEINT deliberately
# maps to its own category: a SUM(BIGINT) left as HUGEINT is exactly the
# representation drift that turned 10 driver rows red in round 1.
_DUCK_INTS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _canon_duck_type(t) -> str:
    u = str(t).upper()
    if u in _DUCK_INTS:
        return "int"
    if u == "HUGEINT":
        return "hugeint"
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if u.startswith("DECIMAL"):
        return "decimal"
    if u == "VARCHAR":
        return "str"
    if u == "BOOLEAN":
        return "bool"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP"):
        return "ts"
    if u.endswith("[]"):
        return "array"
    if u.startswith("STRUCT"):
        return "struct"
    return u.lower()


def _canon_spark_type(t: str) -> str:
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("double", "float"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("array"):
        return "array"
    if t.startswith("struct"):
        return "struct"
    return t


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted_cols, h


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = Path(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    if os.environ.get("VERIFY_VANILLA"):
        # replicate the external harness: a bare session with none of
        # get_spark's tuned confs — the query wrappers (__spark_entry__.
        # _tune) must supply everything they depend on at runtime
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("verify-oracle-vanilla")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="verify-oracle")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        s_n, s_c, s_h = frame_fingerprint(scols, srows)
        status = []
        if name in oracles:
            res = con.sql(oracles[name])
            orows = [tuple(r) for r in res.fetchall()]
            ocols = list(res.columns)
            o_n, o_c, o_h = frame_fingerprint(ocols, orows)
            # engine-neutral type signature, sorted by column name like
            # the value hash, so representation drift (HUGEINT, decimal
            # vs double, int vs float) fails locally before the driver
            # sees it
            s_types = dict(sdf.dtypes)
            stype_sig = [_canon_spark_type(s_types[c]) for c in sorted(scols)]
            o_types = dict(zip(res.columns, res.types))
            otype_sig = [
                _canon_duck_type(o_types[c]) for c in sorted(ocols)
            ] if s_c == o_c else []
            if s_n != o_n:
                status.append(f"ROWS {s_n} != {o_n}")
            if s_c != o_c:
                status.append(f"COLS {s_c} != {o_c}")
            elif stype_sig != otype_sig:
                status.append(f"TYPES {stype_sig} != {otype_sig}")
            if s_h != o_h:
                status.append(f"HASH {s_h} != {o_h}")
        else:
            status.append("(rows-only)") if s_n >= 0 else None
        ok = not any(x for x in status if not x.startswith("("))
        dt = time.time() - t0
        sf_tag = Path(sf_dir).name
        records[f"{name}@{sf_tag}"] = {
            "query": name,
            "sf": sf_tag,
            "pass": ok,
            "wall_s": round(dt, 2),
            "status": " ".join(status) or "HASH-MATCH",
        }
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} rows={s_n:<7d} {dt:5.1f}s {' '.join(status)}")
        if not ok:
            failures.append(name)
            # dump a few mismatching lines for debugging
            if name in oracles and s_n and o_n:
                sset = {tuple(map(_norm, r)) for r in srows}
                oset = {tuple(map(_norm, r)) for r in orows}
                for x in list(sset - oset)[:3]:
                    print("   spark-only:", x)
                for x in list(oset - sset)[:3]:
                    print("   oracle-only:", x)
    if json_path is not None:
        import json as _json

        merged: dict[str, dict] = {}
        if json_path.exists():
            merged = _json.loads(json_path.read_text())
        merged.update(records)
        json_path.write_text(_json.dumps(merged, indent=1, sort_keys=True))
        print(f"# sweep artifact: {json_path} ({len(merged)} records)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
