#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify) and
the oracle_sql.json, runs each oracle statement in DuckDB against views
over <sfDir>/*.parquet, and compares: schema (column names), row count,
and a hash over the full sorted result (columns sorted by name, rows
sorted, values canonicalized). Exit 0 iff all queries match.
"""
import sys, os, json, hashlib, math, datetime, decimal

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_digest(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    # --json <path> (optional, any position) writes the per-query
    # verdicts in the driver's CORRECTNESS_r*.json shape. Parse and
    # STRIP the flag pair before reading positionals, so `--json p ...`
    # before the positionals doesn't mis-bind them, and `--json` as the
    # last arg errors cleanly instead of raising IndexError.
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracle.py <sfDir> <outDir> [--json <path>]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) < 2:
        sys.exit("usage: check_oracle.py <sfDir> <outDir> [--json <path>]")
    sf_dir, out_dir = argv[0], argv[1]
    results = {}
    con = duckdb.connect()
    # heavy oracles at the 10x tile spill; point the spill at /tmp (the
    # default .tmp lands on whatever small volume cwd is on) and cap
    # memory so DuckDB spills instead of thrashing the box
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET memory_limit='80GB'")
    con.execute("SET max_temp_directory_size='60GB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written tables (e.g. the ScaleUp tile) are part-file
            # directories; DuckDB needs the glob form there
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = []
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_tbl = pq.read_table(qdir)
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [tuple(r[c] for c in spark_tbl.column_names)
                      for r in spark_tbl.to_pylist()]
        if name not in oracles:
            print(f"  {name}: NO ORACLE (rows={len(spark_rows)})")
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": len(spark_rows),
               "oracle_rows": None, "err": None}
        results[name] = rec
        try:
            res = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            # Type lint: the driver's comparator hashes a DuckDB
            # DECIMAL/HUGEINT (e.g. sum(BIGINT) or an integer-div of
            # sums) differently from Spark's int64 even when values are
            # equal — the q117/q126/q137/q142 trap. Fail loudly here so
            # it can never reach the driver. Sibling of the "no
            # array-typed final column" rule.
            desc = con.execute(
                f"DESCRIBE (SELECT * FROM ({oracles[name]}) LIMIT 0)"
            ).fetchall()
            bad = [(c, t) for c, t, *_ in desc
                   if "DECIMAL" in t.upper() or "HUGEINT" in t.upper()]
            if bad:
                failures.append(name)
                rec["err"] = f"oracle emits DECIMAL/HUGEINT: {bad}"
                print(f"✗ {name}: oracle emits DECIMAL/HUGEINT column(s) "
                      f"{bad} — CAST to BIGINT in the oracle SQL")
                continue
        except Exception as e:
            failures.append(name)
            rec["err"] = f"oracle SQL failed: {e}"
            print(f"✗ {name}: oracle SQL failed: {e}")
            continue
        duck_cols = sorted(duck_cols_raw)
        rec["oracle_rows"] = len(duck_rows)
        rec["schema_match"] = spark_cols == duck_cols
        rec["rows_match"] = len(spark_rows) == len(duck_rows)
        ok = True
        if spark_cols != duck_cols:
            ok = False
            print(f"✗ {name}: columns differ spark={spark_cols} duck={duck_cols}")
        elif len(spark_rows) != len(duck_rows):
            ok = False
            print(f"✗ {name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        else:
            hs = table_digest(spark_rows, spark_tbl.column_names)
            hd = table_digest(duck_rows, duck_cols_raw)
            if hs != hd:
                ok = False
                print(f"✗ {name}: hash mismatch ({len(spark_rows)} rows)")
                # print first differing canonical row for debugging
                order_s = sorted(range(len(spark_tbl.column_names)),
                                 key=lambda i: spark_tbl.column_names[i])
                order_d = sorted(range(len(duck_cols_raw)),
                                 key=lambda i: duck_cols_raw[i])
                rs = sorted("\x1f".join(canon(r[i]) for i in order_s) for r in spark_rows)
                rd = sorted("\x1f".join(canon(r[i]) for i in order_d) for r in duck_rows)
                for a, b in zip(rs, rd):
                    if a != b:
                        print(f"    spark: {a[:250]}")
                        print(f"    duck : {b[:250]}")
                        break
        rec["hash_match"] = ok and rec["schema_match"] and rec["rows_match"]
        if ok:
            print(f"✓ {name} ({len(spark_rows)} rows)")
        else:
            failures.append(name)

    missing = [n for n in oracles if not os.path.isdir(os.path.join(out_dir, n))]
    for n in missing:
        failures.append(n)
        results[n] = {"rows_match": False, "schema_match": False,
                      "hash_match": False, "spark_rows": None,
                      "oracle_rows": None, "err": "no spark output"}
        print(f"✗ {n}: oracle declared but no spark output")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} queries)")
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
