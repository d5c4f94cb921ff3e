#!/usr/bin/env python3
"""Three-SF sweep gate (the r7 merge_intervals lesson made a GATE, not
a convention: cross-engine tie/overflow bugs only surface at larger
SFs, so every verified key must carry an oracle-green record at ALL
THREE driver SFs before it ships).

Records live in tools/sweeps.tsv (key<TAB>sf<TAB>status), merged by
`record`; `check` exits 1 listing any SparkEntry key missing an "ok"
at any of sf0.001/sf0.01/sf0.1. SweepGateSpec enforces the same rule
inside `sbt test`, so a new key without a triple sweep fails the suite.

Usage:
  sweep_gate.py record <sf_dir> <verify_out_dir>   # oracle-compare + merge
  sweep_gate.py check                              # gate over SparkEntry keys
"""
import os, re, sys

HERE = os.path.dirname(os.path.abspath(__file__))
TSV = os.path.join(HERE, "sweeps.tsv")
SFS = ["sf0.001", "sf0.01", "sf0.1"]
ENTRY = os.path.join(HERE, "..", "src/main/scala/graft/SparkEntry.scala")


def load():
    recs = {}
    if os.path.exists(TSV):
        for line in open(TSV):
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 3:
                recs.setdefault(parts[0], {})[parts[1]] = parts[2]
    return recs


def save(recs):
    with open(TSV, "w") as f:
        for key in sorted(recs):
            for sf in sorted(recs[key]):
                f.write(f"{key}\t{sf}\t{recs[key][sf]}\n")


def record(sf_dir, out_dir):
    sys.path.insert(0, HERE)
    import oracle_check
    sf = os.path.basename(sf_dir.rstrip("/"))
    if sf not in SFS:
        print(f"unknown sf label {sf} (want one of {SFS})"); return 2
    results = oracle_check.check(sf_dir, out_dir)
    recs = load()
    for key, status in results.items():
        recs.setdefault(key, {})[sf] = status
    save(recs)
    bad = sum(1 for v in results.values() if v != "ok")
    print(f"[sweep_gate] recorded {len(results)} keys at {sf} "
          f"({bad} non-ok) -> {TSV}")
    return 1 if bad else 0


def spark_entry_keys():
    src = open(ENTRY).read()
    return sorted(set(re.findall(r'"([a-z0-9_]+)" -> \(\(s, dir\)', src)))


def check():
    recs = load()
    missing = []
    for key in spark_entry_keys():
        gaps = [sf for sf in SFS if recs.get(key, {}).get(sf) != "ok"]
        if gaps:
            missing.append((key, gaps))
    if missing:
        print(f"[sweep_gate] {len(missing)} keys lack a green triple sweep:")
        for key, gaps in missing:
            print(f"  {key}: missing {','.join(gaps)}")
        return 1
    print(f"[sweep_gate] all {len(spark_entry_keys())} keys have green "
          "records at all three SFs")
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "record":
        sys.exit(record(sys.argv[2], sys.argv[3]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "check":
        sys.exit(check())
    print(__doc__)
    sys.exit(2)
