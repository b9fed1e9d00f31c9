"""Dump .explain('formatted') for the r14 optimization round's touched
queries into plans/r14/<query>_<suffix>.txt (before/after evidence the
judge checks plan claims against — OPTIMIZATION_r14.md).

Usage: python tools/dump_plans_r14.py <suffix> <query> [<query> ...]
       python tools/dump_plans_r14.py before ext_ngram_novelty ...
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (  # noqa: E402
    REGISTRY,
)
from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r14")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump-plans-r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted'), {suffix}, "
                     f"sf_dir={sf_dir}\n")
            fh.write(buf.getvalue())
            if os.environ.get("DUMP_EXEC"):
                # AQE exchange/stage reuse is a runtime decision — run
                # the query and append the FINAL adaptive plan (the
                # r13 pmi-dump precedent)
                df.collect()
                fh.write("\n# Final adaptive plan after execution "
                         "(AQE exchange reuse is a runtime decision — "
                         "the initial plan above cannot show it):\n")
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
