#!/usr/bin/env python3
"""Round-snapshot artifact gate (r11 verdict #1).

Two rounds running, a committed headline bench artifact predated the
tree it was graded against (BENCH_warm at r10, BENCH_sf1_full at r11).
Bench now stamps `commit` (short HEAD hash, "+dirty" when the working
tree had uncommitted changes) into every artifact; this script asserts
that every protocol artifact that exists carries the SAME clean hash,
and — unless --allow-stale-head — that the hash is an ancestor-or-equal
of the current HEAD's short hash (i.e. the artifacts describe the tree
being committed).

Usage: python3 tools/check_artifacts.py [--require a.json b.json ...]
Exit 0 = consistent; exit 1 = stale/dirty/missing with a reason per file.
"""
import json
import subprocess
import sys

ARTIFACTS = ["BENCH_last.json", "BENCH_warm.json", "BENCH_sf1_full.json"]

def main() -> int:
    args = sys.argv[1:]
    required = ARTIFACTS
    if "--require" in args:
        required = args[args.index("--require") + 1:]
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    bad = []
    seen = {}
    for path in required:
        try:
            with open(path) as f:
                art = json.load(f)
        except FileNotFoundError:
            bad.append(f"{path}: MISSING")
            continue
        except json.JSONDecodeError as e:
            bad.append(f"{path}: unparseable ({e})")
            continue
        commit = art.get("commit")
        if commit is None:
            bad.append(f"{path}: no commit stamp (pre-r12 artifact)")
        elif commit.endswith("+dirty"):
            bad.append(f"{path}: captured on a DIRTY tree ({commit})")
        else:
            seen[path] = commit
    hashes = set(seen.values())
    if len(hashes) > 1:
        bad.append(f"artifacts span {len(hashes)} commits: {seen}")
    for path, commit in seen.items():
        # the artifact's commit must exist in this repo and be an
        # ancestor of HEAD (same tree or one HEAD builds on)
        anc = subprocess.run(["git", "merge-base", "--is-ancestor", commit, "HEAD"],
                             capture_output=True)
        if anc.returncode != 0 and "--allow-stale-head" not in args:
            bad.append(f"{path}: commit {commit} is not an ancestor of HEAD {head}")
    if bad:
        print("ARTIFACT GATE: FAIL")
        for b in bad:
            print(f"  - {b}")
        return 1
    print(f"ARTIFACT GATE: OK ({', '.join(f'{p}={c}' for p, c in seen.items())}; HEAD {head})")
    return 0

if __name__ == "__main__":
    sys.exit(main())
