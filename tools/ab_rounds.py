"""Same-window A/B of two repo trees (r14, VERDICT item 3): make the
cross-round headline comparison STRUCTURAL instead of anchor-inferred.

The repo's validated trust order puts same-session A/B above everything
else, but the anchor discipline still ran the old tree in a separate
process window — leaving every cross-round delta formally
host-attributed. This tool closes that gap: it checks the OLD commit
out into a git worktree, starts one long-lived worker per tree (each
its own SparkSession — two Python processes CANNOT share one JVM
importing two versions of the same package), and interleaves old/new
runs of each query within one wall-clock window, alternating which
side goes first on each pass so slow host drift cancels instead of
biasing one side. Only one query executes at any instant; the idle
worker's JVM is parked, so the two sessions share the window without
contending for cores.

"Same-window" is the honest name: it is the canary_norm experiment's
interleaving mechanics (r13) applied to two trees. Per-query output is
the full run matrix plus medians and the new/old ratio; the headline
is total_new/total_old over paired medians.

Usage:
  python tools/ab_rounds.py --old <commit-ish> [--iters N] [--sf-dir D]
                            [--out PATH] [query ...]
Defaults: iters=3, sf_dir=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1,
queries = bench.py's HEADLINE list (intersected with both registries).
The worktree lives under /tmp and is removed on exit.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Self-contained worker source: written to a tempfile and launched with
# the TREE path as argv[1], so the old tree needs no copy of this tool.
_WORKER_SRC = r"""
import json, os, sys, time
tree = sys.argv[1]
sf_dir = sys.argv[2]
sys.path.insert(0, tree)
os.chdir(tree)
from etl_school_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("ab-rounds-worker")
qs = e.queries()
# one-time JVM I/O-stack init, same as bench.py
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).limit(1).collect()
print(json.dumps({"ready": True, "queries": sorted(qs)}), flush=True)
for line in sys.stdin:
    cmd = json.loads(line)
    if cmd.get("cmd") == "quit":
        break
    name = cmd["q"]
    t0 = time.time()
    try:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(json.dumps({"q": name, "sec": round(time.time() - t0, 4)}), flush=True)
    except Exception as ex:
        print(json.dumps({"q": name, "err": f"{type(ex).__name__}: {str(ex)[:200]}"}), flush=True)
spark.stop()
"""


def summarize(runs: dict[str, dict[str, list]]) -> dict:
    """Per-query medians + new/old ratios and paired totals from the
    raw run matrix (a worker error string in any cell marks the query
    err and drops it from the totals — errors are the headline, never
    silently averaged around)."""
    pairs: dict[str, dict] = {}
    errs = 0
    for q, r in runs.items():
        o = [v for v in r["old"] if isinstance(v, float)]
        n = [v for v in r["new"] if isinstance(v, float)]
        if len(o) < len(r["old"]) or len(n) < len(r["new"]) or not o or not n:
            pairs[q] = {"old": r["old"], "new": r["new"], "err": True}
            errs += 1
            continue
        om, nm = round(statistics.median(o), 4), round(statistics.median(n), 4)
        pairs[q] = {
            "old": r["old"], "new": r["new"],
            "old_median": om, "new_median": nm,
            "ratio": round(nm / om, 4) if om > 0 else None,
            # min-across is the repo's standard noisy-host estimator:
            # this host lands ×2–3 spikes on random cells (same-code
            # control run, tools/anchors/ab_rounds_r14_control.json),
            # so at small iters the min is the least-contended reading
            "old_min": round(min(o), 4), "new_min": round(min(n), 4),
        }
    tot_o = round(sum(p["old_median"] for p in pairs.values() if "old_median" in p), 4)
    tot_n = round(sum(p["new_median"] for p in pairs.values() if "new_median" in p), 4)
    mtot_o = round(sum(p["old_min"] for p in pairs.values() if "old_min" in p), 4)
    mtot_n = round(sum(p["new_min"] for p in pairs.values() if "new_min" in p), 4)
    ratios = sorted(p["ratio"] for p in pairs.values() if p.get("ratio"))
    return {
        "errors": errs,
        "total_old": tot_o, "total_new": tot_n,
        "ratio_new_over_old": round(tot_n / tot_o, 4) if tot_o else None,
        "min_total_old": mtot_o, "min_total_new": mtot_n,
        "min_ratio_new_over_old": round(mtot_n / mtot_o, 4) if mtot_o else None,
        # the ROBUST direction estimator (r14 control finding): a single
        # contention episode on one heavy query moves the totals ~10%
        # while the per-query ratio median barely feels it — the r14
        # same-code controls read 1.015/1.012 here even when their
        # total-ratios swung 0.98→0.89. Read direction from this,
        # magnitude from the totals, and both against the control band.
        "median_query_ratio": (
            round(statistics.median(ratios), 4) if ratios else None
        ),
        "pairs": pairs,
    }


class Worker:
    def __init__(self, tree: str, sf_dir: str, script: str):
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        self.proc = subprocess.Popen(
            [sys.executable, "-u", script, tree, sf_dir],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, env=env, cwd=tree,
        )
        self.queries: list[str] = []

    def _readline(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError("worker died")
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)

    def wait_ready(self) -> None:
        msg = self._readline()
        assert msg.get("ready"), msg
        self.queries = msg["queries"]

    def run(self, name: str) -> float | str:
        self.proc.stdin.write(json.dumps({"cmd": "run", "q": name}) + "\n")
        self.proc.stdin.flush()
        msg = self._readline()
        return msg.get("sec", msg.get("err"))

    def quit(self) -> None:
        try:
            self.proc.stdin.write(json.dumps({"cmd": "quit"}) + "\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main() -> int:
    args = sys.argv[1:]
    old_ref, iters, out_path = None, 3, None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--old":
            old_ref, i = args[i + 1], i + 2
        elif args[i] == "--iters":
            iters, i = int(args[i + 1]), i + 2
        elif args[i] == "--sf-dir":
            sf_dir, i = args[i + 1], i + 2
        elif args[i] == "--out":
            out_path, i = args[i + 1], i + 2
        else:
            only.append(args[i])
            i += 1
    if not old_ref:
        print("ERROR: --old <commit-ish> is required", file=sys.stderr)
        return 2

    old_sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", old_ref],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    new_sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = tempfile.mkdtemp(prefix="ab_old_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--force", "--detach", wt, old_sha],
        check=True, capture_output=True,
    )
    script = os.path.join(tempfile.mkdtemp(prefix="ab_worker_"), "worker.py")
    with open(script, "w") as fh:
        fh.write(_WORKER_SRC)

    try:
        t_start = time.time()
        old_w = Worker(wt, sf_dir, script)
        new_w = Worker(REPO, sf_dir, script)
        old_w.wait_ready()
        new_w.wait_ready()

        from bench import HEADLINE

        names = only or [q for q in HEADLINE]
        names = [q for q in names if q in old_w.queries and q in new_w.queries]
        skipped = sorted(set(only or HEADLINE) - set(names))
        if skipped:
            print(json.dumps({"skipped_not_in_both": skipped}), flush=True)

        # warm pass (cold lane excluded from the pairing, like bench.py)
        for q in names:
            old_w.run(q)
            new_w.run(q)

        runs: dict[str, dict[str, list]] = {q: {"old": [], "new": []} for q in names}
        for it in range(iters):
            for qi, q in enumerate(names):
                # alternate which side goes first per (pass, query):
                # the second runner of a pair inherits its sibling's
                # just-warmed page cache, so a pass-level alternation
                # still favored one side 2/3 of the time at iters=3 —
                # per-query parity gives each side the first slot
                # exactly half the time within every pass
                order = (("old", old_w), ("new", new_w)) if (it + qi) % 2 == 0 else (
                    ("new", new_w), ("old", old_w))
                for side, w in order:
                    runs[q][side].append(w.run(q))
                print(json.dumps({"pass": it, "q": q,
                                  "old": runs[q]["old"][-1],
                                  "new": runs[q]["new"][-1]}), flush=True)
        old_w.quit()
        new_w.quit()

        doc = {
            "metric": "ab_rounds_same_window",
            "old_commit": old_sha, "new_commit": new_sha,
            "sf_dir": sf_dir, "iters": iters,
            "wall_sec": round(time.time() - t_start, 1),
            **summarize(runs),
        }
        print(json.dumps(doc), flush=True)
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(doc, fh, indent=1)
        return 1 if doc["errors"] else 0
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
