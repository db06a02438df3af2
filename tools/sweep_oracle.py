#!/usr/bin/env python3
"""Resumable large-SF oracle sweep.

Runs tools/check_oracle.py one query at a time in a child process with a
per-query wall-clock budget, persisting per-query status after EVERY query
so the sweep can be killed and resumed at any point. The expensive side is
DuckDB (iterative twins unroll to recursive CTEs); a timeout marks the
query TIMEOUT instead of eating the session, and a later pass with a bigger
budget can retry just those (--retry-timeouts).

Usage:
    python3 tools/sweep_oracle.py <sfdir> <verify_out> <progress.json> \
        [--timeout SECS] [--retry-timeouts] [--only a,b,c]
"""
import sys, os, json, subprocess, time

args = sys.argv[1:]
sfdir, outdir, progress_path = args[0], args[1], args[2]
timeout = 300.0
retry_timeouts = False
only = None
i = 3
while i < len(args):
    if args[i] == "--timeout":
        timeout = float(args[i + 1]); i += 2
    elif args[i] == "--retry-timeouts":
        retry_timeouts = True; i += 1
    elif args[i] == "--only":
        only = set(args[i + 1].split(",")); i += 2
    else:
        raise SystemExit(f"unknown arg {args[i]}")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
progress = {}
if os.path.exists(progress_path):
    progress = json.load(open(progress_path))

def save():
    tmp = progress_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(progress, f, indent=1, sort_keys=True)
    os.replace(tmp, progress_path)

names = sorted(oracle)
if only is not None:
    names = [n for n in names if n in only]
todo = [n for n in names
        if n not in progress
        or (retry_timeouts and progress[n]["status"] == "TIMEOUT")]
print(f"[sweep] {len(todo)} to run, {len(progress)} already recorded, "
      f"timeout={timeout}s", flush=True)

here = os.path.dirname(os.path.abspath(__file__))
for n, name in enumerate(todo):
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "check_oracle.py"),
             sfdir, outdir, name],
            capture_output=True, text=True, timeout=timeout)
        dt = time.time() - t0
        ok = r.returncode == 0 and "1/1 OK" in r.stdout
        status = "OK" if ok else "FAIL"
        detail = "" if ok else (r.stdout.strip().splitlines() or ["?"])[0][:300]
    except subprocess.TimeoutExpired:
        dt = time.time() - t0
        status, detail = "TIMEOUT", f"exceeded {timeout}s"
    progress[name] = {"status": status, "sec": round(dt, 2)}
    if detail:
        progress[name]["detail"] = detail
    save()
    print(f"[sweep] {n+1}/{len(todo)} {name}: {status} ({dt:.1f}s)", flush=True)

counts = {}
for v in progress.values():
    counts[v["status"]] = counts.get(v["status"], 0) + 1
print(f"[sweep] done: {counts} of {len(oracle)} oracle queries", flush=True)
