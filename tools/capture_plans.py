"""Capture .explain("formatted") for bench headline queries into
plans/r10/<query>_<tag>.txt (guide §1: record the plan shape before/after).

Usage: python tools/capture_plans.py <tag> [query ...]
With no query names, captures every HEADLINE query from bench.py.

NB: some suite fns run eager driver-side jobs while BUILDING the frame
(minhash localCheckpoint, pack_sequences bounds collect) — for those the
top-level plan is a checkpoint/LogicalRDD scan and the note at the top of
the file says so.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from bench import HEADLINE

    import __spark_entry__ as entrymod
    from myscaledb_spark.session import get_spark

    spark = get_spark("myscaledb-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = entrymod.queries()
    targets = names or [n for n in HEADLINE if n in all_queries]

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", os.environ.get("PLANS_ROUND", "r11"))
    os.makedirs(outdir, exist_ok=True)

    for name in targets:
        fn = all_queries[name]
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as e:  # capture what we can, keep going
            text = f"ERROR during plan capture: {e}\n"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted), tag={tag}, sf_dir={SF_DIR}\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
