#!/usr/bin/env python
"""QQP duplicate-question retrieval benchmark (reference
src/benchmarks/qqp_dataset.py).  Needs HF datasets access (or cached
embeddings under data/embeddings/)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rag_cobweb_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


from rag_cobweb_tpu.bench.harness import BenchmarkRunner  # noqa: E402


def main():
    parser = BenchmarkRunner.create_argument_parser("QQP benchmark")
    args = BenchmarkRunner.handle_config_and_args(parser.parse_args())
    runner = BenchmarkRunner("qqp")
    runner.run(
        model_name=args.model_name, subset_size=args.subset_size,
        split=args.split, target_size=args.target_size, top_k=args.top_k,
        method=args.method, use_dpr=args.use_dpr,
    )


if __name__ == "__main__":
    main()
