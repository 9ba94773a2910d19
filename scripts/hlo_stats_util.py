"""Shared parsing/printing for xprof hlo_stats dumps.

xprof's ``raw_to_tool_data`` returns hlo_stats either as CSV (older builds)
or as a gviz DataTable JSON blob (the build on this image). Both carry the
same columns; normalize to a list of dicts keyed by the snake_case ids.
"""
import csv
import io
import json

_COL_ALIASES = {
    "Total Self Time (us)": "total_self_time",
    "total_self_time_us": "total_self_time",
    "Self time (us)": "total_self_time",
    "HLO Op Name": "hlo_op_name",
    "HLO Op Category": "category",
    "hlo_category": "category",
    "HLO Op Expression": "hlo_op_expression",
    "#Occurrences": "occurrences",
}


def parse_hlo_stats(data: str):
    """CSV or gviz-JSON hlo_stats text -> list of row dicts with at least
    total_self_time (us, float), category, hlo_op_name, hlo_op_expression,
    occurrences, bound_by, model_flop_rate."""
    data = data.lstrip()
    if data.startswith("{"):
        d = json.loads(data)
        cols = [c["id"] for c in d["cols"]]
        rows = []
        for r in d["rows"]:
            rows.append({cols[i]: (cell or {}).get("v")
                         for i, cell in enumerate(r["c"])})
    else:
        rows = []
        for raw in csv.DictReader(io.StringIO(data)):
            rows.append({_COL_ALIASES.get(k, k): v for k, v in raw.items()})
    for r in rows:
        try:
            r["total_self_time"] = float(r.get("total_self_time") or 0)
        except (TypeError, ValueError):
            r["total_self_time"] = 0.0
    rows.sort(key=lambda r: -r["total_self_time"])
    return rows


def print_hlo_stats(rows, iters: int, top: int = 25):
    tot = sum(r["total_self_time"] for r in rows)
    print(f"total self time: {tot/1e3:.1f} ms over {iters} iters "
          f"({tot/iters/1e3:.1f} ms/iter)")
    by_cat = {}
    for r in rows:
        cat = r.get("category") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + r["total_self_time"]
    print(f"--- by category (ms/iter over {iters} iters) ---")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/iters/1e3:8.2f} ms  {cat}")
    print(f"--- top {top} ops (ms/iter) ---")
    for r in rows[:top]:
        name = (r.get("hlo_op_name") or "?")[:56]
        cat = (r.get("category") or "?")[:26]
        extra = f"bound_by={r.get('bound_by')} gflops={r.get('model_flop_rate')}"
        print(f"{r['total_self_time']/iters/1e3:8.2f} ms  {cat:26s} {name}  {extra}")
        print("           " + (r.get("hlo_op_expression") or "")[:150])
