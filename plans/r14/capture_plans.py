"""Capture .explain("formatted") output for a list of registry keys.

Usage: python plans/r13/capture_plans.py before|after key [key ...]
Writes plans/r13/<key>_<tag>.txt for each key, built at sf0.1 (the
bench SF). Plan capture is planning-only for most keys; keys whose
query CONSTRUCTION runs driver-side jobs (bpe chain, kmeans, graph
driver tiers) execute those jobs — capture is therefore not a timing
tool, just the plan evidence for OPTIMIZATION_r13.md.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from dht11_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    outdir = os.path.dirname(os.path.abspath(__file__))
    for key in keys:
        df = qs[key](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{key}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {key}_{tag}.txt ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
