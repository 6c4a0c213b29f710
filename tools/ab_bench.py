"""Interleaved A/B benchmark (round-5 standing practice).

The sequential drift control cannot arbitrate a round-over-round headline
under this host's external contention ramps (loadavg 6-12 arriving from
outside the VM mid-measurement): whichever run happens to land on the
ramp loses. This tool runs TWO commits' bench.py ABAB-interleaved — fresh
subprocess JVMs per rep, BENCH_SKIP_BIG=1, no control recursion — so both
sides sample the same conditions, then prints the per-rep headlines, the
medians, and the pairwise win count.

Usage:
  python tools/ab_bench.py [--big] <commitA> <commitB> [reps=3] [sf_dir] [cpus]

A commit can be "WORKTREE" to run the current working tree in place.
Output: one JSON line {"a": ..., "b": ..., "a_runs": [...], "b_runs":
[...], "a_median": ..., "b_median": ..., "ratio_b_over_a": ...}.

``--big`` (round-6 arbitration mode): each rep runs the BIG corpus
section (BENCH_BIG_DOCS synthetic docs, default 1M) and the compared
metric becomes ``big_build_sec`` instead of the sf headline — this is
the interleaved judge for the r5 big-build record that landed in a
contention episode without an in-session control. Reps are long
(~3-6 min per side); 2-3 reps suffice because both sides sample the
same host window.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _checkout(commit: str) -> str:
    if commit == "WORKTREE":
        return REPO
    # cache by RESOLVED sha, not ref name: a branch/tag that moved since a
    # previous run would otherwise silently bench the stale checkout
    sha = subprocess.run(
        ["git", "rev-parse", commit], cwd=REPO, check=True,
        capture_output=True, text=True, timeout=30,
    ).stdout.strip()
    wt = f"{tempfile.gettempdir()}/ab_bench_{sha[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO, check=True, capture_output=True, timeout=120,
        )
    return wt


def _run_once(wt: str, sf_dir: str, cpus: str, big: bool = False) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": cpus,
        "BENCH_SKIP_BIG": "" if big else "1",
        "BENCH_CONTROL": "none",
        "PYTHONPATH": wt,
    })
    proc = subprocess.run(
        [sys.executable, f"{wt}/bench.py"],
        cwd=wt, env=env, capture_output=True, text=True, timeout=3600,
    )
    line = next(
        (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
        None,
    )
    if proc.returncode != 0 or line is None:
        raise RuntimeError(
            f"bench.py in {wt} failed (rc={proc.returncode}); stderr tail:\n"
            + "\n".join(proc.stderr.splitlines()[-15:])
        )
    return json.loads(line)


def main() -> None:
    args = [x for x in sys.argv[1:] if x != "--big"]
    big = "--big" in sys.argv[1:]
    a, b = args[0], args[1]
    reps = int(args[2]) if len(args) > 2 else 3
    sf_dir = args[3] if len(args) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = args[4] if len(args) > 4 else os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    )
    wa, wb = _checkout(a), _checkout(b)
    a_runs, b_runs, details = [], [], []
    for i in range(reps):
        for label, wt, runs in (("a", wa, a_runs), ("b", wb, b_runs)):
            res = _run_once(wt, sf_dir, cpus, big=big)
            val = (
                float(res["queries"]["big_build_sec"])
                if big else float(res["value"])
            )
            runs.append(val)
            details.append({
                "rep": i, "side": label, "headline": res["value"],
                "topk_mean": res["queries"].get("topk_mean_sec"),
                "topk_p95": res["queries"].get("topk_p95_sec"),
                "build": res["queries"].get("build_sec"),
                **(
                    {
                        "big_build": res["queries"].get("big_build_sec"),
                        "big_files_per_sec": res["queries"].get(
                            "big_build_files_per_sec"
                        ),
                        "big_scattered_delta": res["queries"].get(
                            "big_inc_scattered_delta_sec"
                        ),
                    }
                    if big else {}
                ),
            })
            print(f"rep {i} {label}: {val}s", file=sys.stderr)
    wins_b = sum(1 for x, y in zip(a_runs, b_runs) if y < x)
    out = {
        "a": a, "b": b, "reps": reps, "metric": "big_build_sec" if big else "headline",
        "a_runs": a_runs, "b_runs": b_runs,
        "a_median": statistics.median(a_runs),
        "b_median": statistics.median(b_runs),
        "ratio_b_over_a": round(
            statistics.median(b_runs) / statistics.median(a_runs), 4
        ),
        "pairwise_wins_b": wins_b,
        "details": details,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
