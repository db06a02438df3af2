#!/usr/bin/env python3
"""Merge two Bench subset artifacts (a small-SF and a large-SF run of the
same query list) into a scale-step report with per-query ratios.

Usage:
    python3 tools/scale_report.py <small.json> <large.json> <out.json> \
        [--factor 10] [--note "..."]

The ratio column is large_sec / small_sec. On a fixed-core machine a
perfectly linear operator shows ratio ~= data factor (plus constant-cost
amortization below it); ratios well above the factor flag superlinear
work growth.
"""
import sys, json

args = sys.argv[1:]
small_p, large_p, out_p = args[0], args[1], args[2]
factor = 10.0
note = ""
i = 3
while i < len(args):
    if args[i] == "--factor":
        factor = float(args[i + 1]); i += 2
    elif args[i] == "--note":
        note = args[i + 1]; i += 2
    else:
        raise SystemExit(f"unknown arg {args[i]}")

small = json.load(open(small_p))
large = json.load(open(large_p))
qs, ql = small["queries"], large["queries"]
common = sorted(set(qs) & set(ql))
rows = {
    q: {
        "small_sec": round(qs[q], 3),
        "large_sec": round(ql[q], 3),
        "ratio": round(ql[q] / qs[q], 2) if qs[q] > 0 else None,
    }
    for q in common
}
worst = sorted(common, key=lambda q: -(rows[q]["ratio"] or 0))[:5]

# shared-stage folding (same semantics as Bench's effective headline):
# when BOTH artifacts carry a `shared` column, each clean shared group's
# one-pass cost replaces its members' solo sum in the effective totals,
# and the group gets its own ratio row — so the scale step reports the
# cost a pipeline reusing the trained/verified frame actually pays,
# next to the solo oracle-checkable record.
ss, sl = small.get("shared") or {}, large.get("shared") or {}
prefix_of = {q.split("_")[0]: q for q in common}
shared_rows, covered = {}, set()
for g in sorted(set(ss) & set(sl)):
    if ss[g] < 0 or sl[g] < 0:
        continue
    # all-members rule (mirrors Bench's subset folding): a group folds
    # only when EVERY member resolves in `common` — a partially-covered
    # group would book the shared pass's full cost against a solo total
    # that's missing the absent members, skewing the effective ratio
    if not all(p in prefix_of for p in g.split("+")):
        missing = [p for p in g.split("+") if p not in prefix_of]
        print(f"[scale] skipping shared group {g}: members {missing} "
              f"absent from one or both artifacts")
        continue
    members = [prefix_of[p] for p in g.split("+")]
    shared_rows[g] = {
        "small_sec": round(ss[g], 3),
        "large_sec": round(sl[g], 3),
        "ratio": round(sl[g] / ss[g], 2) if ss[g] > 0 else None,
        "members": members,
        "solo_small_sec": round(sum(qs[q] for q in members), 3),
        "solo_large_sec": round(sum(ql[q] for q in members), 3),
    }
    covered.update(members)
eff_small = sum(qs[q] for q in common if q not in covered) \
    + sum(r["small_sec"] for r in shared_rows.values())
eff_large = sum(ql[q] for q in common if q not in covered) \
    + sum(r["large_sec"] for r in shared_rows.values())

out = {
    "metric": "scale_step",
    "factor": factor,
    "small_sf": small.get("sf"),
    "large_sf": large.get("sf"),
    "small_total_sec": round(sum(qs[q] for q in common), 1),
    "large_total_sec": round(sum(ql[q] for q in common), 1),
    "n_queries": len(common),
    "worst_ratios": {q: rows[q]["ratio"] for q in worst},
    "preflight_load": {"small": small.get("preflight_load"),
                       "large": large.get("preflight_load")},
    "contaminated": {"small": small.get("contaminated"),
                     "large": large.get("contaminated")},
    "note": note,
    "queries": rows,
}
if shared_rows:
    out["shared"] = shared_rows
    out["effective_small_total_sec"] = round(eff_small, 1)
    out["effective_large_total_sec"] = round(eff_large, 1)
    out["effective_ratio"] = round(eff_large / eff_small, 2) if eff_small > 0 else None
with open(out_p, "w") as f:
    json.dump(out, f, indent=1, sort_keys=False)
print(f"[scale] {len(common)} queries: total {out['small_total_sec']}s -> "
      f"{out['large_total_sec']}s at {factor}x data; worst ratios "
      + ", ".join(f"{q}={rows[q]['ratio']}" for q in worst))
if shared_rows:
    print(f"[scale] effective (shared-folded): "
          f"{out['effective_small_total_sec']}s -> "
          f"{out['effective_large_total_sec']}s "
          f"(ratio {out['effective_ratio']}) over "
          + ", ".join(f"{g}={r['ratio']}" for g, r in shared_rows.items()))
