#!/usr/bin/env python3
"""Differential fuzz: random small dump pairs -> reference sync.py vs our
CLI -> byte-compare scripts (modulo the timestamp line).

Usage: python3 tools/diff_fuzz.py [n_cases] [seed]
Requires the repo compiled (sbt compile) and uses the runtime classpath
via sbt; dumps/outputs land in /tmp/graft_fuzz/.
"""
import os, random, subprocess, sys, difflib

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 7
OUT = "/tmp/graft_fuzz"
os.makedirs(OUT, exist_ok=True)

LITS = ["NULL", "'a'", "'b, c'", "'O''Brien'", '"dq"', "123", "45.6",
        "''", "'MODIFIED'", "0", "'x y z'"]
# note: ')'-in-string and ';\n'-in-string excluded: known reference bugs
# (sync.py:111-112, regex statement scan) where our grammar is a superset.


# DDL shapes exercising the reference's PK fallback chain (sync.py:89-104):
# explicit single PK; composite PK (falls through to 'id' default);
# AUTO_INCREMENT; no key info at all ('id' default + first-value fallback,
# empty WHERE clauses -> skipped UPDATE/DELETE statements).
KEYLINES = [
    ",\n  PRIMARY KEY (`id`)",
    ",\n  PRIMARY KEY (`id`,`v1`)",
    "",  # plain, has an `id` column -> default pk applies
]


def render(tables):
    parts = []
    for name, rows, shape in tables:
        if shape == "auto":
            cols = ["id", "v1", "v2"]
            collines = "  `id` INT,\n  `v1` INT AUTO_INCREMENT,\n  `v2` VARCHAR(50)"
        elif shape == "nokey":
            cols = ["a", "b", "c"]
            collines = "  `a` INT,\n  `b` VARCHAR(50),\n  `c` VARCHAR(50)"
        else:
            cols = ["id", "v1", "v2"]
            collines = ("  `id` INT,\n  `v1` VARCHAR(50),\n  `v2` VARCHAR(50)"
                        + shape)
        ddl = f"CREATE TABLE `{name}` (\n{collines}\n) ENGINE=InnoDB;"
        stmts = [ddl]
        collist = ", ".join(f"`{c}`" for c in cols)
        for i in range(0, len(rows), 3):
            vals = ",\n".join("(" + ", ".join(r) + ")" for r in rows[i:i + 3])
            stmts.append(f"INSERT INTO `{name}` ({collist}) VALUES\n{vals};")
        parts.append("\n".join(stmts))
    return "\n\n".join(parts) + "\n"


def gen_tables(rnd, shapes):
    tables = []
    names = rnd.sample(["t1", "t2", "alpha", "zz"], rnd.randint(1, 3))
    for name in names:
        n = rnd.randint(0, 14)
        rows = [[str(rnd.randint(0, 18)), rnd.choice(LITS), rnd.choice(LITS)]
                for _ in range(n)]
        tables.append((name, rows, shapes[name]))
    return tables


rnd = random.Random(SEED)
fails = 0
for case in range(N):
    # same DDL shape per table name on both sides (prod/backup of one db)
    shapes = {n: rnd.choice(KEYLINES + ["auto", "nokey"])
              for n in ["t1", "t2", "alpha", "zz"]}
    prod = render(gen_tables(rnd, shapes))
    backup = render(gen_tables(rnd, shapes))
    pp, bp = f"{OUT}/prod_{case}.sql", f"{OUT}/backup_{case}.sql"
    open(pp, "w").write(prod)
    open(bp, "w").write(backup)
    ref_out, our_out = f"{OUT}/ref_{case}.sql", f"{OUT}/our_{case}.sql"
    subprocess.run(["python3", "/root/reference/sync.py", pp, bp, ref_out],
                   capture_output=True, check=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.cli.Main {pp} {bp} {our_out}"],
        capture_output=True, cwd="/root/repo")
    if r.returncode != 0:
        print(f"✗ case {case}: our CLI failed\n{r.stdout.decode()[-500:]}")
        fails += 1
        continue
    ref = open(ref_out).read().split("\n")
    ours = open(our_out).read().split("\n")
    ref[2] = ours[2] = ""  # timestamp line
    if ref != ours:
        fails += 1
        print(f"✗ case {case}: scripts differ")
        for line in list(difflib.unified_diff(ref, ours, lineterm=""))[:15]:
            print("   ", line)
    else:
        print(f"✓ case {case}: byte-identical ({len(ours)} lines)")
print(f"\n{N - fails}/{N} cases byte-identical")
sys.exit(1 if fails else 0)
