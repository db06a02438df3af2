#!/usr/bin/env python3
"""Standalone leak scan with provenance.

Scans the committed source surface (src/, tools/, *.md at the top level,
build.sbt) for strings that should never appear in a public, self-contained
engine: credential-shaped tokens, cloud bucket URIs, chat-archive links,
non-public URLs, and environment variables outside the project's own
namespace. Unlike the driver-written LEAKCHECK.json (a bare counter), the
artifact this emits stands alone: it records the commit SHA it scanned,
the scan date, the pattern set, and the file census, so a reviewer can
re-run the exact check.

Usage:
    python3 tools/leakcheck.py [out.json]
"""
import sys, os, re, json, subprocess, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Public hosts the repo legitimately cites (papers, upstream docs).
PUBLIC_HOSTS = (
    "apache.org", "github.com", "arxiv.org", "duckdb.org", "scala-lang.org",
    "wikipedia.org", "example.com", "w3.org", "json.org", "ietf.org",
    "scalatest.org", "scalacheck.org", "commoncrawl.org", "openjdk.org",
    # synthetic placeholder hosts planted by TextFns URL-strip fixtures
    "site.com", "x.org", "a.com",
)

# Env vars the project itself defines or standard tool/OS vars.
ENV_ALLOW = re.compile(
    r"^(SPARK_GRAFT_\w+|SPARK_\w+|JAVA_\w+|SBT_\w+|COURSIER_\w+|PATH|HOME|"
    r"USER|LANG|LC_\w+|TZ|TMPDIR|PWD|HOSTNAME|TERM|SHELL)$")

PATTERNS = {
    "credential": re.compile(
        r"AKIA[0-9A-Z]{16}|xox[baprs]-[0-9A-Za-z-]{8,}|ghp_[A-Za-z0-9]{36}"
        r"|sk-[A-Za-z0-9]{20,}|BEGIN [A-Z ]*PRIVATE KEY"),
    "bucket-uri": re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w./-]+"),
    "chat-archive": re.compile(r"\bslack\.com/|\bdiscord\.gg/"),
    "url": re.compile(r"https?://([\w.-]+)"),
    "env-read": re.compile(
        r"""sys\.env(?:\.get)?\(\s*"(\w+)"|os\.environ(?:\.get)?[(\[]\s*['"](\w+)"""),
}

def scan_targets():
    out = []
    for base in ("src", "tools", "project"):
        for dirpath, _, files in os.walk(os.path.join(ROOT, base)):
            for f in files:
                if f.endswith((".scala", ".py", ".sbt", ".sql", ".md")):
                    out.append(os.path.join(dirpath, f))
    for f in os.listdir(ROOT):
        if f.endswith((".md", ".sbt")):
            out.append(os.path.join(ROOT, f))
    return sorted(out)

def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench/LEAKCHECK_LOCAL.json"
    files = scan_targets()
    hits = {k: [] for k in PATTERNS}
    for path in files:
        rel = os.path.relpath(path, ROOT)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for lineno, line in enumerate(text.splitlines(), 1):
            for kind, rx in PATTERNS.items():
                for m in rx.finditer(line):
                    if kind == "url":
                        host = m.group(1).lower()
                        if any(host == h or host.endswith("." + h)
                               for h in PUBLIC_HOSTS):
                            continue
                        if host in ("localhost", "127.0.0.1"):
                            continue
                    if kind == "env-read":
                        var = m.group(1) or m.group(2)
                        if ENV_ALLOW.match(var):
                            continue
                        hits[kind].append(f"{rel}:{lineno}: {var}")
                        continue
                    hits[kind].append(f"{rel}:{lineno}: {m.group(0)[:80]}")
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=ROOT,
                           capture_output=True, text=True).stdout.strip()
    artifact = {
        "generated_at_commit": sha + ("+dirty" if dirty else ""),
        "generated_at_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "command": "python3 tools/leakcheck.py",
        "files_scanned": len(files),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, out_path), "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[leakcheck] {len(files)} files, {artifact['n_hits']} hits "
          f"-> {out_path} @ {artifact['generated_at_commit'][:12]}")
    return 1 if artifact["n_hits"] else 0

if __name__ == "__main__":
    raise SystemExit(main())
