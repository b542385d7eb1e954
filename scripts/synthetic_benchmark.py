#!/usr/bin/env python
"""Hermetic benchmark on synthetic clustered embeddings (no network).

Mirrors the reference benchmark entry points (qqp_dataset.py __main__ :63-80)
with the synthetic dataset adapter; the full method matrix runs on the TPU.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


from rag_cobweb_tpu.bench.harness import BenchmarkRunner  # noqa: E402


def main():
    parser = BenchmarkRunner.create_argument_parser(
        "Synthetic-embedding retrieval benchmark"
    )
    args = BenchmarkRunner.handle_config_and_args(parser.parse_args())
    BenchmarkRunner.print_run_info = getattr(
        BenchmarkRunner, "print_run_info", None
    )
    runner = BenchmarkRunner("synthetic")
    runner.run(
        model_name=args.model_name, subset_size=args.subset_size,
        split=args.split, target_size=args.target_size, top_k=args.top_k,
        method=args.method, dim=args.dim,
    )


if __name__ == "__main__":
    main()
