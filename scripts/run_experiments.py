#!/usr/bin/env python
"""Experiment fan-out CLI (reference scripts/run_experiments.py:28-175)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.bench.launcher import run_experiments  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", help="experiment-list JSON")
    p.add_argument("--mode", choices=["local", "slurm", "slurm-multihost"],
                   default="local")
    p.add_argument("--max-parallel", type=int, default=1)
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    launched = run_experiments(args.config, mode=args.mode,
                               max_parallel=args.max_parallel,
                               dry_run=args.dry_run)
    for item in launched:
        print(item)


if __name__ == "__main__":
    main()
