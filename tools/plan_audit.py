"""Registry-wide shuffle-budget audit.

For every registered query, build the physical plan (no execution except
the handful of callables that run their own action by design) and count
the operators that matter at 100 TB: exchanges, join strategies, Python
evaluation, cartesian products. Output: one markdown table sorted by
exchange count, written to PLAN_AUDIT.md and echoed to stdout.

This is the whole-registry version of tests/test_plans.py: the tests pin
a dozen load-bearing shapes exactly; this report makes the OTHER
170-odd queries' shuffle budgets reviewable at a glance each round.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import covid_data_challenge_spark.queries  # noqa: F401, E402 — populate REGISTRY
import covid_data_challenge_spark.queries_ext  # noqa: F401, E402
from covid_data_challenge_spark.registry import REGISTRY  # noqa: E402
from covid_data_challenge_spark.session import get_spark  # noqa: E402

#: Queries whose callable executes its own action (streaming runs,
#: df.observe) — their returned frame's plan is the post-action shell,
#: so the census would mislead; skip with a note instead.
_RUNS_OWN_ACTION = ("stream", "observed_quality_report", "bpe_merge_table")


_DEPTH_RE = re.compile(r"^([\s:+\-]*)(?:\*\(\d+\)\s*)?")
_BOUNDING = ("HashAggregate", "SortAggregate", "ObjectHashAggregate",
             "TakeOrderedAndProject", "GlobalLimit", "WindowGroupLimit")
_LEAF = ("Scan ", "FileScan", "ExistingRDD", "LocalTableScan",
         "InMemoryTableScan")


def _depth(line: str) -> int:
    return len(_DEPTH_RE.match(line).group(1))


def corpus_global_windows(plan: str) -> int:
    """Count Window nodes that sort the FULL input through a single
    partition: the window's subtree reaches a leaf scan before any
    cardinality-bounding node (aggregate / limit / group-limit), and its
    nearest Exchange is SinglePartition. A global window over a
    groupBy-collapsed table (e.g. the AUC distinct-logit table) is
    bounded and does NOT count — only the genuinely corpus-sized sort
    (the r3 classifier_eval_auc shape) trips this."""
    lines = plan.splitlines()
    n_bad = 0
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow\b", ln) or "WindowGroupLimit" in ln:
            continue
        d = _depth(ln)
        sub = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and _depth(nxt) <= d:
                break
            sub.append(nxt)
        first_ex = next((s for s in sub if "Exchange" in s), None)
        is_global = first_ex is not None and "SinglePartition" in first_ex
        bounded = False
        for s in sub:
            if any(tag in s for tag in _BOUNDING):
                bounded = True
                break
            if any(tag in s for tag in _LEAF):
                break
        if is_global and not bounded:
            n_bad += 1
    return n_bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")

    rows = []
    skipped = []
    for name, spec in sorted(REGISTRY.items()):
        if any(tag in name for tag in _RUNS_OWN_ACTION):
            skipped.append(name)
            continue
        df = spec.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jmode)
        rows.append(
            (
                name,
                plan.count("Exchange hashpartitioning"),
                plan.count("BroadcastHashJoin"),
                plan.count("SortMergeJoin"),
                plan.count("BroadcastNestedLoopJoin"),
                plan.count("CartesianProduct"),
                plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
                corpus_global_windows(plan),
            )
        )

    rows.sort(key=lambda r: (-r[1], r[0]))
    lines = [
        "# PLAN_AUDIT — per-query shuffle budget (plans built at "
        f"{sf_dir}, AQE initial plans)",
        "",
        "Regenerate: `python tools/plan_audit.py`. Sorted by exchange",
        "count — the top of this table is where 100 TB attention goes.",
        "`cartesian` must be 0 everywhere (also enforced by",
        "`test_no_cartesian_product_anywhere`); `python_eval` is only",
        "sanctioned for the multimodal mapInPandas stage; `global_win`",
        "counts corpus-sized single-partition Window sorts (a global",
        "window over an already-aggregated value table is bounded and",
        "does not count) and must be 0 everywhere.",
        "",
        "| query | exchanges | bhj | smj | bnlj | cartesian | python_eval | global_win |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    lines.append("")
    lines.append(
        f"Skipped (callable runs its own action; plan shell not meaningful): "
        + ", ".join(sorted(skipped))
    )
    out = "\n".join(lines) + "\n"
    with open("/root/repo/PLAN_AUDIT.md", "w") as f:
        f.write(out)
    n_cart = sum(r[5] for r in rows)
    n_py = sum(1 for r in rows if r[6] and not r[0].startswith("multimodal"))
    n_gwin = sum(r[7] for r in rows)
    print(f"{len(rows)} plans audited, {n_cart} cartesian products, "
          f"{n_py} unsanctioned python-eval queries, "
          f"{n_gwin} corpus-sized global windows -> PLAN_AUDIT.md")
    return 0 if n_cart == 0 and n_py == 0 and n_gwin == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
