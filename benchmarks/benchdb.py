"""Benchmark result database + regression comparison.

Lightweight analog of the reference's ASV tooling
(``src/eradiate/test_tools/benchmark/asvdb.py``, 1,345 LoC + ASV config):
records ``bench.py``-style JSON lines per commit into
``benchmarks/results/``, lists history, and compares runs with a
regression threshold.

Usage::

    python bench.py | python benchmarks/benchdb.py record -
    python benchmarks/benchdb.py list
    python benchmarks/benchdb.py compare            # latest vs previous
    python benchmarks/benchdb.py compare A B --threshold 0.9
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

RESULTS_DIR = Path(__file__).parent / "results"


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def record(source: str) -> Path:
    """Record one bench JSON line (path or '-' for stdin) under
    results/<timestamp>_<rev>.json with commit + machine metadata."""
    raw = (
        sys.stdin.read() if source == "-" else Path(source).read_text()
    ).strip().splitlines()
    payload = None
    for line in reversed(raw):
        line = line.strip()
        if line.startswith("{"):
            payload = json.loads(line)
            break
    if payload is None:
        raise SystemExit("no JSON object found in input")
    import platform

    entry = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "revision": _git_rev(),
        "machine": platform.node(),
        "result": payload,
    }
    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    name = f"{time.strftime('%Y%m%d-%H%M%S')}_{entry['revision']}.json"
    out = RESULTS_DIR / name
    out.write_text(json.dumps(entry, indent=2))
    print(f"recorded {out}")
    return out


def _load_all() -> list[tuple[str, dict]]:
    if not RESULTS_DIR.exists():
        return []
    return sorted(
        (p.stem, json.loads(p.read_text()))
        for p in RESULTS_DIR.glob("*.json")
    )


def list_results() -> None:
    for name, entry in _load_all():
        r = entry["result"]
        configs = r.get("configs") or {}
        extra = " ".join(
            f"{k.split('_')[0]}="
            + (f"{v / 1e6:.2f}M" if v is not None else "FAILED")
            for k, v in configs.items()
        )
        print(
            f"{name}  rev={entry['revision']}  "
            f"{r.get('metric')}={r.get('value')} {r.get('unit', '')}  {extra}"
        )


def compare(a: str | None, b: str | None, threshold: float) -> int:
    """Compare run ``b`` (default latest) against ``a`` (default previous).
    Returns nonzero when any shared metric of b falls below
    ``threshold * a`` (a regression)."""
    allr = _load_all()
    if len(allr) < 2 and (a is None or b is None):
        print("need at least two recorded results")
        return 0

    def pick(key, default_idx):
        if key is None:
            return allr[default_idx]
        for name, entry in allr:
            if name.startswith(key) or entry["revision"] == key:
                return name, entry
        raise SystemExit(f"no result matching {key!r}")

    name_a, ea = pick(a, -2)
    name_b, eb = pick(b, -1)

    def metrics(e):
        r = e["result"]
        out = {}
        if r.get("value") is not None:
            out["headline"] = float(r["value"])
        for k, v in (r.get("configs") or {}).items():
            if v is not None:
                out[k] = float(v)
        return out

    ma, mb = metrics(ea), metrics(eb)
    status = 0
    print(f"comparing {name_b} vs {name_a} (threshold {threshold})")
    for k in sorted(set(ma) & set(mb)):
        ratio = mb[k] / ma[k] if ma[k] else float("inf")
        flag = ""
        if ratio < threshold:
            flag = "  << REGRESSION"
            status = 1
        elif ratio > 1.0 / threshold:
            flag = "  improvement"
        print(f"  {k:28s} {ma[k]:14.1f} -> {mb[k]:14.1f}  x{ratio:.3f}{flag}")
    return status


def history(metric: str | None) -> None:
    """Per-metric time series across every recorded run (ASV-style
    history view): one line per run with revision, value, and the ratio
    to the best value seen so far."""
    allr = _load_all()
    keys = set()
    for _, e in allr:
        r = e["result"]
        keys.add("headline")
        keys.update(k for k, v in (r.get("configs") or {}).items() if v)
    if metric is None:
        print("metrics:", " ".join(sorted(keys)))
        return
    best = 0.0
    for name, e in allr:
        r = e["result"]
        v = (
            r.get("value")
            if metric == "headline"
            else (r.get("configs") or {}).get(metric)
        )
        if v is None:
            print(f"{name}  rev={e['revision']}  (absent)")
            continue
        best = max(best, float(v))
        bar = "#" * int(40 * float(v) / best) if best else ""
        print(
            f"{name}  rev={e['revision']}  {float(v):14.1f}  "
            f"{float(v) / best:5.3f}x-best  {bar}"
        )


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    rec = sub.add_parser("record")
    rec.add_argument("source", help="JSON file or '-' for stdin")
    sub.add_parser("list")
    cmp_ = sub.add_parser("compare")
    cmp_.add_argument("a", nargs="?", default=None)
    cmp_.add_argument("b", nargs="?", default=None)
    cmp_.add_argument("--threshold", type=float, default=0.9)
    hist = sub.add_parser("history")
    hist.add_argument(
        "metric", nargs="?", default=None,
        help="config key or 'headline'; omit to list available metrics",
    )
    args = ap.parse_args()
    if args.cmd == "record":
        record(args.source)
    elif args.cmd == "list":
        list_results()
    elif args.cmd == "history":
        history(args.metric)
    else:
        raise SystemExit(compare(args.a, args.b, args.threshold))


if __name__ == "__main__":
    main()
