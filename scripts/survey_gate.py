#!/usr/bin/env python3
"""SURVEY §2 ↔ CORRECTNESS consistency gate (r15 verdict task 3).

The 2,400-line SURVEY is big enough to drift from the driver's hard
signal — r15 shipped a §2 row claiming "hash-exact at all three
scales" while the driver's CORRECTNESS row for that key was red. This
script makes that class of drift a ROUND FAILURE:

  - every §2 query-form row marked ✓ must have its key(s) hash-green
    (hash_match == true) in the given CORRECTNESS json;
  - every ◐ row's key must be present with rows/schema green (its
    accuracy gate lives in the specs, not the oracle hash);
  - every key in the CORRECTNESS json must appear in §2 (no orphan
    queries the checklist doesn't own).

Usage:
  python3 scripts/survey_gate.py [CORRECTNESS.json]
(default: the highest-numbered CORRECTNESS_r*.json in the repo root —
run with a fresh local dump via `check.py ... --json` before the
round-end commit, since the last driver file is one round stale.)
"""
import glob
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if len(sys.argv) > 1:
    cpath = sys.argv[1]
else:
    cands = glob.glob(f"{repo}/CORRECTNESS_r*.json")
    cpath = max(cands, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
corr = json.load(open(cpath))

survey = open(f"{repo}/SURVEY.md").read()
m = re.search(r"^## §2 .*?(?=^## §3 )", survey, re.M | re.S)
assert m, "SURVEY.md §2 section not found"
sec2 = m.group(0)

KEY = re.compile(r"`([a-z]+\d+[a-z]?_[a-z0-9_]+)`")
rows = []  # (keys, status, line)
for line in sec2.splitlines():
    if not line.startswith("|"):
        continue
    cells = [c.strip() for c in line.strip("|").split("|")]
    if len(cells) < 3 or cells[0] in ("#", "---") or set(cells[0]) == {"-"}:
        continue
    status = cells[-1]
    if not (status.startswith("✓") or status.startswith("◐")
            or status.startswith("arch")):
        continue
    keys = KEY.findall(cells[-2])
    rows.append((keys, status, line[:90]))

fails = []
declared = set()
for keys, status, line in rows:
    if status.startswith("arch"):
        continue  # arch rows gate via named suites, not the oracle
    for k in keys:
        declared.add(k)
        rec = corr.get(k)
        if rec is None:
            fails.append(f"§2 row declares `{k}` but CORRECTNESS has no row: {line}")
        elif status.startswith("✓") and rec.get("hash_match") is not True:
            fails.append(f"§2 marks `{k}` ✓ but CORRECTNESS hash_match="
                         f"{rec.get('hash_match')} (err={rec.get('err')})")
        elif status.startswith("◐"):
            # rows-only-by-design: the driver records err='no_oracle'
            # with a row count, or a clean rows/schema match; a hash
            # pass also satisfies (a ◐ that turned exact is fine)
            ok = (rec.get("hash_match") is True
                  or (rec.get("err") == "no_oracle"
                      and (rec.get("spark_rows") or 0) > 0)
                  or (rec.get("rows_match") is True
                      and rec.get("err") in (None, "")))
            if not ok:
                fails.append(f"§2 marks `{k}` ◐ but CORRECTNESS row is not clean: {rec}")

orphans = sorted(set(corr) - declared)
for k in orphans:
    fails.append(f"CORRECTNESS has `{k}` but no §2 row declares it")

# r17 (r16 verdict task 8): a ◐ row passes the driver on
# `spark_rows > 0` alone — its accuracy burden lives entirely in a
# named spec suite. Close that softness: each remaining ◐ key's suite
# must EXIST in target/test-reports AND report 0 failures/errors, so
# "spec-gated" is checked, not asserted.
MOON_SUITES = {
    "d02_dedup_minhash": "graft.operators.MinHashRecallSpec",
    "d03_dedup_simhash": "graft.operators.SimHashCompletenessSpec",
    "r04_sample": "graft.sources.LogSourceSpec",
    "s27_top_pc_fd": "graft.operators.FdSketchSpec",
}
moon_keys = {k for keys, status, _ in rows if status.startswith("◐")
             for k in keys}
for k in sorted(moon_keys):
    suite = MOON_SUITES.get(k)
    if suite is None:
        fails.append(f"◐ key `{k}` has no named spec suite in survey_gate's "
                     "MOON_SUITES map — add the suite that carries its "
                     "accuracy gate")
        continue
    rpt = f"{repo}/target/test-reports/TEST-{suite}.xml"
    if not os.path.exists(rpt):
        fails.append(f"◐ key `{k}`: spec suite report {rpt} missing — "
                     "run `sbt test` before the gate")
        continue
    head = open(rpt).read(2048)
    mf = re.search(r'failures="(\d+)"', head)
    me = re.search(r'errors="(\d+)"', head)
    if not mf or not me or mf.group(1) != "0" or me.group(1) != "0":
        fails.append(f"◐ key `{k}`: suite {suite} reports "
                     f"failures/errors != 0 ({rpt})")

n_check = sum(len(ks) for ks, s, _ in rows if not s.startswith("arch"))
print(f"survey_gate: {len(rows)} §2 rows, {n_check} query keys checked "
      f"against {os.path.basename(cpath)} ({len(corr)} entries)")
if fails:
    print(f"GATE FAIL ({len(fails)}):")
    for f in fails:
        print(f"  {f}")
    sys.exit(1)
print("GATE GREEN: every §2 ✓/◐ claim is backed by the correctness file")
