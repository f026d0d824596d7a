"""Per-boundary job attribution for composed queries (round 14).

Usage: python tools/profile_jobs.py <query...> [--sf DIR]

Runs each query once at sf0.001 (warm-up), then once at the target SF,
and prints every Spark job the run submitted with its duration, task
count and the pipeline boundary that triggered it: localCheckpoint /
count / collect / first are monkeypatched to set a thread-local
jobDescription naming their call site, so the AQE query-stage jobs an
eager boundary materializes are attributed to that boundary.  This is
the tool that localized the flagship compositions' cost to two serial
single-task map stages (the clean/gopher chain executing twice below
the fan-out exchange) in round 14.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from cascading_flink_spark.session import get_spark  # noqa: E402

spark = get_spark("profile_jobs")
sc = spark.sparkContext

args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf = "/root/testdata/sf0.1"
for i, a in enumerate(sys.argv[1:]):
    if a == "--sf":
        sf = sys.argv[1:][i + 1]; args.remove(sf)


def _caller():
    for fr in reversed(traceback.extract_stack()):
        if "cascading_flink_spark" in fr.filename:
            return f"{os.path.basename(fr.filename)}:{fr.lineno}"
    return "?"


def wrap(name):
    orig = getattr(DataFrame, name)

    def timed(self, *a, **k):
        sc.setJobDescription(f"{name}@{_caller()}")
        try:
            return orig(self, *a, **k)
        finally:
            sc.setJobDescription(None)
    setattr(DataFrame, name, timed)


for m in ["localCheckpoint", "count", "collect", "first"]:
    wrap(m)

import __spark_entry__ as entry  # noqa: E402
qs = entry.queries()

store = sc._jsc.sc().statusStore()

for q in args:
    df = qs[q](spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    n0 = store.jobsList(None).size()
    t0 = time.time()
    df = qs[q](spark, sf)
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    print(f"== {q}: build={t1 - t0:.2f}s exec={t2 - t1:.2f}s")
    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size() - n0):
        j = jobs.apply(i)
        sub = j.submissionTime().get().getTime()
        comp = (j.completionTime().get().getTime()
                if j.completionTime().isDefined() else None)
        dur = (comp - sub) / 1000.0 if comp else -1
        d = j.description()
        desc = d.get() if d.isDefined() else ""
        rows.append((sub, dur, j.jobId(), j.numTasks(), desc[:90]))
    rows.sort()
    agg = {}
    prev_end = None
    for sub, dur, jid, nt, desc in rows:
        gap = (sub - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = sub + dur * 1000
        key = desc or "(unlabelled: broadcast/exchange side threads)"
        a = agg.setdefault(key, [0.0, 0, 0.0])
        a[0] += dur; a[1] += 1; a[2] += max(gap, 0)
        if dur >= 0.25:
            print(f"  job {jid}: {dur:6.2f}s gap={gap:5.2f}s "
                  f"tasks={nt} {desc}")
    print("-- by boundary (job-seconds, job count, driver gaps before):")
    for k, (tt, n, g) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {tt:6.2f}s jobs={n:3d} gaps={g:5.2f}s  {k}")
