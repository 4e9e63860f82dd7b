#!/usr/bin/env python3
"""Round-11 measurement harness (guide §1): time queries in isolation with
the noop sink and capture .explain('formatted') for plan audits.

Usage:
    python tools/profile_queries.py [--sf DIR] [--plans OUT_SUFFIX]
                                    [--reps N] [--top N | names...]

Writes plans to <outdir>/<name>_<suffix>.txt (default plans/r12) (suffix: "before"/"after")
and prints one line per query: seconds, #Exchange, join strategies,
python-eval nodes. Job descriptions are set per query (guide §1.5).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from contextlib import redirect_stdout
from io import StringIO
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def plan_text(df) -> str:
    buf = StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_summary(txt: str) -> str:
    n_exch = len(re.findall(r"\bExchange\b", txt.split("\n\n")[0]))
    joins = sorted(set(re.findall(r"(\w*Join\w*)", txt.split("\n\n")[0])))
    pyev = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", txt)))
    return f"exch={n_exch} joins={joins} py={pyev}"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    suffix = "before"
    outdir = "plans/r12"
    reps = 2
    top = 0
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--plans":
            suffix = args[i + 1]; i += 2
        elif a == "--outdir":
            outdir = args[i + 1]; i += 2
        elif a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--top":
            top = int(args[i + 1]); i += 2
        else:
            names.append(a); i += 1

    import __spark_entry__ as e
    from iceberg_relative_io_spark.session import get_spark

    queries = e.queries()
    if top:
        full = json.loads((REPO / "BENCH_FULL.json").read_text())["queries"]
        names += [k for k, _ in sorted(full.items(), key=lambda kv: -kv[1])[:top]]
    names = [n for n in dict.fromkeys(names) if n in queries]

    plans_dir = REPO / outdir
    plans_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="profile_r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    results: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        if warm_dir != "off" and os.path.isdir(warm_dir):
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:
                print(f"warmup {name}: {type(exc).__name__}: {exc}", file=sys.stderr)
        best = None
        txt = ""
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"r12-profile:{name}")
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            best = el if best is None else min(best, el)
            if not txt:
                txt = plan_text(df)
        (plans_dir / f"{name}_{suffix}.txt").write_text(txt)
        results[name] = round(best, 3)
        print(f"{best:8.3f}s  {name}  [{plan_summary(txt)}]", flush=True)

    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
