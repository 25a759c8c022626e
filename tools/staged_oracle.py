#!/usr/bin/env python3
"""Staged DuckDB oracle replay for the two queries whose one-shot oracle
SQL exceeds the local spill budget at the 10x tile (q179_curation_dag,
q205_hits — CORRECTNESS_r14_sf1.json recorded the OOMs).

The staged replay executes the SAME oracle logic stage by stage, with a
FRESH DuckDB connection per stage and each stage's output materialized
to parquet — so the peak temp usage is one stage's, not the whole CTE
chain's. The stage SQL mirrors the committed one-shot oracle text
statement-for-statement; any transcription drift shows up as a hash
MISMATCH against the Spark result (a false alarm, never a false pass).

Usage:
  python3 tools/staged_oracle.py <sfDir> <verifyOutDir> [--json <path>]

Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify at the
same sfDir) and compares with check_oracle's canonical hash. Writes the
per-query verdicts (same shape as check_oracle --json, plus a "method"
note) to --json if given, and exits 0 iff both queries match.
"""
import sys, os, json, shutil, tempfile

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import canon, table_digest, TABLES  # noqa: E402

SPILL = "/tmp/duckdb_spill_staged"


def fresh_con(sf_dir, stage_dir):
    """A new connection with table views + views over staged parquets."""
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{SPILL}'")
    con.execute("SET memory_limit='80GB'")
    con.execute("SET max_temp_directory_size='55GB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")
    for f in os.listdir(stage_dir):
        if f.endswith(".parquet"):
            name = f[:-len(".parquet")]
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                        f"read_parquet('{stage_dir}/{f}')")
    return con


def run_stage(sf_dir, stage_dir, name, sql):
    """Run one stage in a fresh connection; materialize to parquet."""
    if os.path.isdir(SPILL):
        shutil.rmtree(SPILL, ignore_errors=True)
    con = fresh_con(sf_dir, stage_dir)
    try:
        con.execute(f"COPY ({sql}) TO '{stage_dir}/{name}.parquet' "
                    "(FORMAT PARQUET)")
    finally:
        con.close()
    print(f"  stage {name}: done")


def final_rows(sf_dir, stage_dir, sql):
    if os.path.isdir(SPILL):
        shutil.rmtree(SPILL, ignore_errors=True)
    con = fresh_con(sf_dir, stage_dir)
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        return cols, rows
    finally:
        con.close()


# ---------------------------------------------------------------- q179
# Mirrors PipelineQueries.q179Sql stage by stage. Heavy stages (shh,
# cand, the inter/jac join) each run alone.

Q179_STAGES = [
    ("s179_g", """
      SELECT doc_id, text, source FROM (
        SELECT doc_id, text, source,
          (CASE WHEN len(w) BETWEEN 10 AND 5000 THEN 1 ELSE 0 END)
          + (CASE WHEN wc >= len(w)*3 AND wc <= len(w)*10 THEN 1 ELSE 0 END)
          + (CASE WHEN na*5 >= len(w)*4 THEN 1 ELSE 0 END)
          + (CASE WHEN ns >= 2 THEN 1 ELSE 0 END)
          + (CASE WHEN nd*10 <= len(w) THEN 1 ELSE 0 END) AS score
        FROM (
          SELECT doc_id, text, source, w,
            list_reduce(list_transform(w, t -> length(t)), (a,b) -> a+b) AS wc,
            len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS na,
            len(list_filter(w, t -> regexp_matches(t, '^[0-9]+$'))) AS nd,
            len(list_intersect(list_distinct(w),
              ['the','a','of','and','to','in'])) AS ns
          FROM (SELECT doc_id, text, source,
              string_split_regex(lower(text), '\\s+') AS w FROM documents)))
      WHERE score >= 4"""),
    ("s179_e", """
      SELECT doc_id, text, source FROM (
          SELECT doc_id, text, source,
            min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM s179_g)
        WHERE doc_id = keeper"""),
    ("s179_shh", """
      WITH corpus AS (SELECT doc_id AS id, text FROM s179_e),
      words AS (SELECT id, string_split_regex(lower(text), '\\s+') AS w
        FROM corpus),
      sh AS (SELECT DISTINCT id, unnest(CASE WHEN len(w) >= 3
        THEN list_distinct(list_transform(range(len(w)-2),
          i -> array_to_string(w[i+1:i+3], ' ')))
        ELSE []::VARCHAR[] END) AS shingle FROM words)
      SELECT id, ('0x'||substr(md5(shingle),1,12))::BIGINT AS shingle
      FROM sh"""),
    ("s179_sz", "SELECT id, count(*) AS sz FROM s179_shh GROUP BY id"),
    ("s179_bands", """
      WITH corpus AS (SELECT doc_id AS id, text FROM s179_e),
      hl_t AS (SELECT id, list(shingle % 1000000007) AS hl
        FROM s179_shh GROUP BY id),
      fb AS (SELECT id,
          [('0x'||substr(md5(lower(text)),1,12))::BIGINT % 1000000007] AS hl
        FROM corpus WHERE id NOT IN (SELECT id FROM s179_shh)),
      hs AS (SELECT * FROM hl_t UNION ALL SELECT * FROM fb),
      sig AS (SELECT id, list_transform(range(16),
          i -> list_min(list_transform(hl,
            h -> ((i*2+1)*h + 12289*i) % 1000000007))) AS sig FROM hs)
      SELECT id, band,
          array_to_string(sig[band*4+1:band*4+4], '_') AS band_key
        FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band) bs"""),
    ("s179_cand", """
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM s179_bands a JOIN s179_bands b
          ON a.band = b.band AND a.band_key = b.band_key
          AND a.id < b.id"""),
    ("s179_pairs", """
      WITH inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
        FROM s179_cand c JOIN s179_shh a ON a.id = c.id_a
                    JOIN s179_shh b ON b.id = c.id_b
                      AND b.shingle = a.shingle
        GROUP BY 1, 2),
      jac AS (SELECT id_a, id_b,
          round(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter), 4) AS jac
        FROM inter JOIN s179_sz sa ON sa.id = id_a
                   JOIN s179_sz sb ON sb.id = id_b)
      SELECT id_a, id_b FROM jac WHERE jac >= 0.5"""),
    ("s179_comp", """
      WITH RECURSIVE
      edges AS (SELECT id_a AS src, id_b AS dst FROM s179_pairs
        UNION ALL SELECT id_b, id_a FROM s179_pairs),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, x.dst FROM reach r JOIN edges x ON r.dst = x.src)
      SELECT src AS doc_id, least(src, min(dst)) AS comp
        FROM reach GROUP BY src"""),
    ("s179_sp", """
      WITH rep AS (SELECT e.doc_id, e.text, e.source,
          coalesce(k.comp, e.doc_id) AS rep
        FROM s179_e e LEFT JOIN s179_comp k ON k.doc_id = e.doc_id)
      SELECT doc_id, text, source,
        CASE WHEN ('0x'||substr(md5(CAST(rep AS VARCHAR)),1,12))::BIGINT
               % 100 < 80 THEN 'train'
             WHEN ('0x'||substr(md5(CAST(rep AS VARCHAR)),1,12))::BIGINT
               % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
        FROM rep"""),
    ("s179_mixed", """
      WITH train AS (SELECT doc_id, text, source FROM s179_sp
        WHERE split = 'train'),
      wmix(source, wt) AS (VALUES ('src0', CAST(1 AS BIGINT)),
          ('src1', CAST(1 AS BIGINT)), ('src2', CAST(8 AS BIGINT))),
      tgt AS (SELECT source, (wt * 100) // 10 AS target FROM wmix),
      dmix AS (SELECT source, doc_id AS id,
          ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,12))::BIGINT AS h
        FROM train),
      rmix AS (SELECT source, id, h,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY h % 64, h, id) AS BIGINT) AS rnk,
          count(*) OVER (PARTITION BY source) AS avail
        FROM dmix),
      cmix AS (SELECT rmix.source, rmix.id, (t.target // rmix.avail) +
          CASE WHEN rmix.rnk <= t.target % rmix.avail THEN 1 ELSE 0 END
            AS copies
        FROM rmix JOIN tgt t USING (source))
      SELECT source, id AS doc_id, copies FROM cmix WHERE copies >= 1"""),
    ("s179_deciles", """
      WITH train AS (SELECT doc_id, text FROM s179_sp
        WHERE split = 'train'),
      tok AS (SELECT doc_id,
          CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
            AS n_tok
        FROM train),
      streamx AS (SELECT m.doc_id * 1000
            + unnest(range(1, m.copies + 1)) AS mid,
          tok.n_tok
        FROM s179_mixed m JOIN tok USING (doc_id)),
      pk AS (SELECT mid, n_tok,
          ('0x'||substr(md5(CAST(mid AS VARCHAR)),1,12))::BIGINT % 8
            AS shard
        FROM streamx),
      cum AS (SELECT mid, shard, n_tok,
          sum(n_tok) OVER (PARTITION BY shard ORDER BY mid) - n_tok
            AS cum_before
        FROM pk),
      bins AS (SELECT shard * 1000000 + cum_before // 2048 AS bin, n_tok
        FROM cum),
      bagg AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS fill FROM bins GROUP BY bin)
      SELECT least(10, (fill * 10) // 2048) AS util_decile,
          CAST(count(*) AS BIGINT) AS n_bins,
          CAST(sum(n_docs) AS BIGINT) AS n_docs,
          CAST(sum(fill) AS BIGINT) AS total_tokens
        FROM bagg GROUP BY 1"""),
]

Q179_FINAL = """
  WITH stats AS (
    SELECT '1_gate' AS stage, 'n_docs' AS k,
      CAST(count(*) AS BIGINT) AS v FROM s179_g
    UNION ALL SELECT '2_exact_dedup', 'n_docs', count(*) FROM s179_e
    UNION ALL SELECT '3_lsh_pairs', 'n_pairs', count(*) FROM s179_pairs
    UNION ALL SELECT '4_split', split, count(*) FROM s179_sp GROUP BY split
    UNION ALL SELECT '5_mixture', 'n_docs', count(*) FROM s179_mixed
    UNION ALL SELECT '5_mixture', 'total_copies', sum(copies)
      FROM s179_mixed
    UNION ALL SELECT '6_packing', printf('d%02d_bins', util_decile),
      n_bins FROM s179_deciles
    UNION ALL SELECT '6_packing', printf('d%02d_docs', util_decile),
      n_docs FROM s179_deciles
    UNION ALL SELECT '6_packing', printf('d%02d_tokens', util_decile),
      total_tokens FROM s179_deciles)
  SELECT stage, k, CAST(v AS BIGINT) AS v FROM stats ORDER BY stage, k"""

# ---------------------------------------------------------------- q205
# Mirrors Frontier2Queries.q205Sql. Staged scores are the normalized
# BIGINT h/a values (each bounded by the 1e12 scale); the HUGEINT
# arithmetic (raw sums up to ~1e27) happens INSIDE each stage exactly
# as in the one-shot oracle.

SC = "1000000000000"


def q205_half(stage_in, frm, to, score_in, score_out):
    return f"""
      WITH r AS (SELECT e.{to} AS node,
          sum(CAST({stage_in}.{score_in} AS HUGEINT)) AS raw
        FROM s205_e e JOIN {stage_in}
          ON e.{frm} = {stage_in}.node GROUP BY 1),
      rt AS (SELECT sum(raw) AS tot FROM r)
      SELECT node, CAST((raw * {SC}) // tot AS BIGINT) AS {score_out}
        FROM r CROSS JOIN rt"""


Q205_STAGES = [
    ("s205_e", """
      SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey"""),
    ("s205_h0", f"""
      SELECT DISTINCT src AS node, CAST({SC} AS BIGINT) AS h
        FROM s205_e"""),
    ("s205_a1", q205_half("s205_h0", "src", "dst", "h", "a")),
    ("s205_h1", q205_half("s205_a1", "dst", "src", "a", "h")),
    ("s205_a2", q205_half("s205_h1", "src", "dst", "h", "a")),
    ("s205_h2", q205_half("s205_a2", "dst", "src", "a", "h")),
]

Q205_FINAL = """
  SELECT node, 'auth' AS kind, CAST(a AS BIGINT) AS score FROM s205_a2
  UNION ALL
  SELECT node, 'hub' AS kind, CAST(h AS BIGINT) AS score FROM s205_h2
  ORDER BY kind, node"""

PLANS = {
    "q179_curation_dag": (Q179_STAGES, Q179_FINAL),
    "q205_hits": (Q205_STAGES, Q205_FINAL),
}


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) < 2:
        sys.exit("usage: staged_oracle.py <sfDir> <outDir> [--json <path>]")
    sf_dir, out_dir = argv[0], argv[1]
    results = {}
    failures = []
    for name, (stages, final) in PLANS.items():
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"- {name}: no spark output under {out_dir}, skipping")
            continue
        print(f"{name}: staged replay ({len(stages)} stages)")
        stage_dir = tempfile.mkdtemp(prefix=f"graft-staged-{name}-")
        try:
            for sname, sql in stages:
                run_stage(sf_dir, stage_dir, sname, sql)
            cols, rows = final_rows(sf_dir, stage_dir, final)
        finally:
            shutil.rmtree(stage_dir, ignore_errors=True)
            shutil.rmtree(SPILL, ignore_errors=True)
        spark_tbl = pq.read_table(qdir)
        spark_rows = [tuple(r[c] for c in spark_tbl.column_names)
                      for r in spark_tbl.to_pylist()]
        rec = {"rows_match": len(spark_rows) == len(rows),
               "schema_match": sorted(spark_tbl.column_names) == sorted(cols),
               "hash_match": False,
               "spark_rows": len(spark_rows), "oracle_rows": len(rows),
               "err": None,
               "method": f"staged oracle replay ({len(stages)} stages, "
                         "fresh connection + parquet materialization per "
                         "stage; same SQL logic as the one-shot oracle)"}
        if rec["rows_match"] and rec["schema_match"]:
            rec["hash_match"] = (
                table_digest(spark_rows, spark_tbl.column_names)
                == table_digest(rows, cols))
        results[name] = rec
        ok = rec["hash_match"]
        if not ok:
            failures.append(name)
        print(("✓" if ok else "✗") + f" {name} "
              f"(spark={len(spark_rows)} oracle={len(rows)} rows)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{len(results) - len(failures)}/{len(results)} staged queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
