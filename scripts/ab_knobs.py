#!/usr/bin/env python
"""A/B the exact-search budget knobs at day scale against the f64 oracle.

Runs scripts/day_check.py in a fresh process per configuration (the knobs
bind at module import) and collects the JSON reports.  Each non-default
configuration is a new fit graph -> one cold remote compile (~minutes);
run sequentially, never two TPU processes at once.

Usage: python scripts/ab_knobs.py [--nrec 1000]
"""
import argparse
import json
import os
import subprocess
import sys

CONFIGS = [
    ("ctrl", {}),
    ("d7p2", {"VITPU_NDEFECT": "7", "VITPU_NPOLISH": "2"}),
    ("d7p2_mid", {"VITPU_NDEFECT": "7", "VITPU_NPOLISH": "2",
                  "VITPU_ENDGAME_TAIL": "mid"}),
    # per-product Ozaki chunk budgets (VERDICT r3 item 5: the named ~15%
    # of MXU work): shave the M-product and basis-product budgets one
    # chunk each below the shipped 6/5
    ("mp5", {"VITPU_LADDER_MAXPQ": "5"}),
    ("mp5v4", {"VITPU_LADDER_MAXPQ": "5", "VITPU_LADDER_MAXPQ_V": "4"}),
    # the shipped round-3 combo (N_DEFECT stays 9: the 7-round trim
    # passed the TPU-vs-oracle A/B but degraded the CPU/f64 oracle path
    # itself on a curvature-regularized record — see regparam.N_DEFECT)
    ("ship", {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrec", type=int, default=1000)
    ap.add_argument("--configs", type=str, default=None,
                    help="comma-separated subset of config names")
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    names = (args.configs.split(",") if args.configs
             else [n for n, _ in CONFIGS])
    results = {}
    for name, env in CONFIGS:
        if name not in names:
            continue
        e = dict(os.environ)
        e.update(env)
        e.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
        print(f"=== {name}: {env} ===", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(here, "day_check.py"),
             "--nrec", str(args.nrec)],
            env=e, capture_output=True, text=True)
        tail = p.stdout.strip().splitlines()
        rep = None
        for line in reversed(tail):
            try:
                rep = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if rep is None:
            print("FAILED:", p.stdout[-2000:], p.stderr[-2000:], flush=True)
            continue
        results[name] = rep
        print(json.dumps({name: rep}), flush=True)
    print("=== SUMMARY ===")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
