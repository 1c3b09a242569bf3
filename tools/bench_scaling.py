"""Two-parallelism scaling benchmark driver (the north rule's N vs 4N
executor-cluster criterion, evidenced per the sandbox instruction by running
the same job on the same input at two local parallelism levels).

Packages the library, runs tools/scaling_worker.py via spark-submit at
--levels N,4N (fresh JVM per level, warm-up discarded, median of --runs
timed runs, correctness asserted in-process), then prints the scaling
summary as JSON and appends a results block to BENCH_SCALING.md.

Ambient gate (BASELINE.md "ambient-contention audit"): a below-target
result is only attributable to the CODE when the whole gate passes —
(a) the Spark-free numpy memory-bandwidth 1-vs-4-proc probe reads >= 0.8
BOTH before and after the timed levels (a single pre-run instant
demonstrably fails to certify a multi-minute window: two 2026-08-17 runs
passed a pre-run probe yet ran contended), (b) /proc/stat steal measured
ACROSS each level's actual spark-submit window stays < 0.5%, and (c)
per-level wall dispersion (max-min)/median stays <= 10% — the CLAUDE.md
noise rule; contended windows show up as dispersion even when the
steal/bandwidth proxies miss the co-tenant. This workload is
string/shuffle-bandwidth-bound, so a co-tenant consuming memory bandwidth
bounds the measurable efficiency below the code's own ceiling.

Usage:
    python tools/bench_scaling.py [--docs 20000] [--levels 2,8] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "cies_ocr_java_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def _stat_snap() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _steal_pct(a: list[int], b: list[int]) -> float:
    d = [y - x for x, y in zip(a, b)]
    return round(100 * d[7] / sum(d), 2) if sum(d) else 0.0


def ambient_probe() -> dict:
    """Steal%% over 8s + a 1-vs-4-process numpy bandwidth efficiency —
    the instantaneous half of the environment gate (the in-window half is
    the per-level steal + dispersion measured around the timed runs)."""
    a = _stat_snap()
    time.sleep(8)
    b = _stat_snap()
    steal_pct = _steal_pct(a, b)

    import multiprocessing as mp

    t0 = time.time()
    _mem_work(0)
    one = time.time() - t0
    with mp.Pool(4) as pool:
        t0 = time.time()
        pool.map(_mem_work, range(4))
        four = time.time() - t0
    return {
        "steal_pct": steal_pct,
        "bandwidth_eff_1v4": round(one / four, 3) if four else None,
    }


def _dispersion(walls: list[float]) -> float:
    med = sorted(walls)[len(walls) // 2]
    return round((max(walls) - min(walls)) / med, 3) if med else 0.0


def _mem_work(_):
    import numpy as np

    arr = np.zeros(400_000_000 // 8)  # 400 MB — long enough to see co-tenant bandwidth pressure
    for _ in range(6):
        arr = arr + 1.0
    return float(arr[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--corpus", default=None, help="reuse an existing corpus dir")
    ap.add_argument("--driver-memory", default="16g")
    ap.add_argument("--report", default=os.path.join(REPO, "BENCH_SCALING.md"))
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    assert len(levels) == 2 and levels[1] == 4 * levels[0], "levels must be N,4N"

    workdir = tempfile.mkdtemp(prefix="cies-scaling-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    corpus = args.corpus
    if corpus is None:
        corpus = os.path.join(workdir, "corpus")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/make_fixtures.py"),
             "--docs", str(args.docs), "--out", corpus],
            check=True,
        )

    zip_path = os.path.join(workdir, "cies_ocr_java_spark.zip")
    make_zip(zip_path)

    ambient_pre = ambient_probe()
    print(json.dumps({"metric": "ambient_pre", **ambient_pre}))

    results = {}
    window_steal = {}
    for n in levels:
        cmd = [
            "spark-submit",
            "--master", f"local[{n}]",
            "--driver-memory", args.driver_memory,
            # shuffle blocks land here; tmpfs, so the
            # bench measures compute scaling, not one local disk's bandwidth
            # (a cluster's storage bandwidth scales with executors).
            "--conf", f"spark.local.dir={workdir}/spark-local",
            "--py-files", zip_path,
            os.path.join(REPO, "tools/scaling_worker.py"),
            "--input", corpus,
            "--workdir", workdir,
            "--runs", str(args.runs),
        ]
        snap0 = _stat_snap()
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        window_steal[n] = _steal_pct(snap0, _stat_snap())
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[n] = json.loads(line)
        print(json.dumps({**results[n], "window_steal_pct": window_steal[n]}))

    ambient_post = ambient_probe()
    print(json.dumps({"metric": "ambient_post", **ambient_post}))

    lo, hi = levels
    speedup = results[lo]["median_wall"] / results[hi]["median_wall"]
    efficiency = speedup / (hi / lo)
    disp = {n: _dispersion(results[n]["walls"]) for n in levels}
    gate_ok = (
        all(
            (amb["bandwidth_eff_1v4"] or 0) >= 0.8 and amb["steal_pct"] < 0.5
            for amb in (ambient_pre, ambient_post)
        )
        and all(s < 0.5 for s in window_steal.values())
        and all(d <= 0.10 for d in disp.values())
    )
    summary = {
        "metric": "scaling_efficiency",
        "levels": levels,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
        "meets_target": efficiency >= 0.8,
        "docs_per_sec": {str(n): results[n]["docs_per_sec"] for n in levels},
        "span_equality": {
            str(n): results[n]["span_equality_pass_rate"] for n in levels
        },
        "ambient_pre": ambient_pre,
        "ambient_post": ambient_post,
        "window_steal_pct": {str(n): window_steal[n] for n in levels},
        "wall_dispersion": {str(n): disp[n] for n in levels},
        "ambient_ok": gate_ok,
    }
    print(json.dumps(summary))

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(args.report, "a") as f:
        f.write(
            f"\n## Run {stamp} — corpus {results[lo]['n_docs']} docs, "
            f"{results[lo]['payload_bytes']:,} payload bytes, "
            f"{args.runs} timed runs/level (median; warm-up discarded)\n\n"
            f"| master | median wall (s) | docs/sec | span-equality |\n"
            f"|---|---|---|---|\n"
        )
        for n in levels:
            r = results[n]
            f.write(
                f"| local[{n}] | {r['median_wall']} | {r['docs_per_sec']} | "
                f"{r['span_equality_pass_rate']:.3f} ({r['golden_docs']} golden docs) |\n"
            )
        f.write(
            f"\nSpeedup local[{lo}]→local[{hi}]: **{speedup:.2f}×** → scaling "
            f"efficiency **{efficiency:.2f}** (target ≥ 0.8: "
            f"{'MET' if efficiency >= 0.8 else 'NOT MET'}).\n"
            f"All walls: local[{lo}]={results[lo]['walls']}, "
            f"local[{hi}]={results[hi]['walls']}\n"
            f"Ambient gate: probe pre/post "
            f"{ambient_pre['bandwidth_eff_1v4']}/{ambient_post['bandwidth_eff_1v4']}, "
            f"steal pre/post {ambient_pre['steal_pct']}%/{ambient_post['steal_pct']}%, "
            f"in-window steal {window_steal}, wall dispersion {disp} "
            f"({'OK' if summary['ambient_ok'] else 'CONTENDED/NOISY — result is a lower bound, not the code ceiling'})\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
