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


def render(tables):
    parts = []
    for name, rows in tables:
        ddl = (f"CREATE TABLE `{name}` (\n  `id` INT,\n  `v1` VARCHAR(50),\n"
               f"  `v2` VARCHAR(50),\n  PRIMARY KEY (`id`)\n) ENGINE=InnoDB;")
        stmts = [ddl]
        for i in range(0, len(rows), 3):
            vals = ",\n".join("(" + ", ".join(r) + ")" for r in rows[i:i + 3])
            stmts.append(
                f"INSERT INTO `{name}` (`id`, `v1`, `v2`) VALUES\n{vals};")
        parts.append("\n".join(stmts))
    return "\n\n".join(parts) + "\n"


def gen_tables(rnd):
    tables = []
    names = rnd.sample(["t1", "t2", "alpha", "zz"], rnd.randint(1, 3))
    for name in names:
        n = rnd.randint(0, 14)
        rows = [[str(rnd.randint(0, 18)), rnd.choice(LITS), rnd.choice(LITS)]
                for _ in range(n)]
        tables.append((name, rows))
    return tables


rnd = random.Random(SEED)
fails = 0
for case in range(N):
    prod = render(gen_tables(rnd))
    backup = render(gen_tables(rnd))
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
