"""End-of-round final bench pair, codified (r14).

Every round ends with the same hand-run protocol: two solo bench.py
runs at sf0.1 on an idle host, a settle gap between them (the second
JVM must not probe while the first is still exiting), then min-across
+ agreement read against the final_ok/calm-band stamps. r13 and r14
both re-improvised it in shell — and r14's improvised 75 s gap was
what produced the transient-start-canary refusal that motivated
settle_canaries. One tool keeps the protocol identical across rounds
and emits one summary artifact the round notes can cite.

Verdict policy (matches the trust order in SCALING.md):
- **citable** when at least one run stamps final_ok AND in-band; the
  cited total is the MINIMUM over such fully-stamped runs (min-across
  discards one-sided slowdowns, never speedups — same-code noise on
  this host only ADDS time).
- runs that agree closely (spread under ~2%) corroborate the reading
  even when one of them was refused for a start-canary artifact; the
  summary records agreement so the round notes can say so with
  numbers instead of narrative.

Usage:
    python tools/final_pair.py --out tools/anchors/bench_r15_final \
        [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--gap 75] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    """One solo bench.py run in a fresh process/JVM (the cold lane is
    only meaningful from a fresh session)."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench.py failed: {proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def summarize_pair(parsed: list[dict]) -> dict:
    """Pure verdict over N parsed bench artifacts (unit-tested)."""
    runs = [
        {
            "total": p.get("value"),
            "final_ok": bool(p.get("final_ok")),
            "in_band": bool(p.get("canary_in_calm_band")),
            "canary_sec": p.get("canary_sec"),
            "canary_end_sec": p.get("canary_end_sec"),
            "settle_retries": p.get("canary_settle_retries"),
            "reason": p.get("final_reason"),
        }
        for p in parsed
    ]
    totals = [r["total"] for r in runs if r["total"]]
    spread_pct = (
        round((max(totals) / min(totals) - 1) * 100, 2) if len(totals) > 1 else None
    )
    stamped = [r["total"] for r in runs if r["final_ok"] and r["in_band"]]
    out = {
        "metric": "final_bench_pair",
        "runs": runs,
        "min_total": round(min(totals), 4) if totals else None,
        "agreement_spread_pct": spread_pct,
        "citable": bool(stamped),
        "cited_total": round(min(stamped), 4) if stamped else None,
    }
    if not stamped:
        out["reason"] = (
            "no run stamped final_ok AND in-band — host-attributed window; "
            "re-run on a calm host"
        )
    elif spread_pct is not None and spread_pct <= 2.0 and len(stamped) < len(totals):
        out["note"] = (
            f"{len(stamped)}/{len(totals)} runs fully stamped; the rest agree "
            f"within {spread_pct}% and corroborate the cited total"
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output path prefix (no .json)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--gap", type=float, default=75.0)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    parsed: list[dict] = []
    for i in range(args.runs):
        if i:
            time.sleep(args.gap)
        doc = run_bench(args.sf_dir, args.cpus)
        path = f"{args.out}_run{i + 1}.json"
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1)
        parsed.append(doc)
        print(
            json.dumps({
                "run": i + 1, "total": doc.get("value"),
                "final_ok": doc.get("final_ok"),
                "in_band": doc.get("canary_in_calm_band"),
            }),
            flush=True,
        )

    summary = summarize_pair(parsed)
    with open(f"{args.out}.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))
    return 0 if summary["citable"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
