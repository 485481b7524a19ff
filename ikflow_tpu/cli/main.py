"""``ikflow-tpu`` CLI: build-dataset / train / evaluate / solve / benchmark.

Mirrors the reference's script surface (``/root/reference/scripts/*.py``) as
subcommands of one entry point; each subcommand keeps the reference's flag
names where they exist.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ikflow-tpu", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    from ikflow_tpu.cli import (
        bench_cmd,
        build_dataset_cmd,
        evaluate_cmd,
        solve_cmd,
        train_cmd,
        visualize_cmd,
    )

    build_dataset_cmd.add_parser(sub)
    train_cmd.add_parser(sub)
    evaluate_cmd.add_parser(sub)
    solve_cmd.add_parser(sub)
    bench_cmd.add_parser(sub)
    visualize_cmd.add_parser(sub)

    args = parser.parse_args(argv)

    # CLI entry points opt into the persistent XLA compile cache; plain
    # library imports stay side-effect free (advisor item, r2).
    from ikflow_tpu.config import enable_compile_cache

    enable_compile_cache()
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
