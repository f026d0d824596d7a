"""Capture .explain('formatted') output for declared queries.

Usage: python tools/capture_plans.py <outdir> <suffix> <query...>

Writes <outdir>/<query>_<suffix>.txt for each query at sf0.1 (the bench
scale).  Run from a pristine checkout with suffix 'before' and from the
optimized tree with suffix 'after'; the judge checks plan claims against
these files.
"""
import os
import sys

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
os.chdir(here)

outdir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
os.makedirs(outdir, exist_ok=True)

import __spark_entry__ as entry  # noqa: E402
from cascading_flink_spark.session import get_spark  # noqa: E402

spark = get_spark("capture_plans")
qs = entry.queries()
for name in names:
    df = qs[name](spark, "/root/testdata/sf0.1")
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(txt)
    print("wrote", name, suffix, len(txt))
