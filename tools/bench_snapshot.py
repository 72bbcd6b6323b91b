"""Close-gate bench snapshot protocol (r9 verdict item 8; tiered r13).

A single full bench run at sf0.1 carries a ±15-20% ambient-load band
(the r9 close snapshot was 254.3s against 217-221s clean runs of the
same code), which forces judges to cross-read multiple artifacts.  This
tool makes the committed snapshot self-sufficient: run bench.py up to
`max_runs` times, stop as soon as two CONSECUTIVE totals agree within
5%, and stamp every run's total into the snapshot under
"snapshot_protocol" so the noise band is visible in the artifact.

Stable-class tiering (r12 verdict item 6): re-timing every entry in
every convergence run grows the snapshot wall linearly with the
registry.  Run 1 is always the FULL headline; it then classifies every
entry ≤ 0.6s that is not Arrow-bearing (bench.MATMUL_MIN2) as STABLE —
the sub-second JVM-codegen class whose variance is additive ambient
noise, exactly what the noise sentinel reads — and passes the list to
bench.py via $SPARK_GRAFT_BENCH_SKIP for runs 2+.  Convergence totals
for later runs are COMPOSITES: stable class at its run-1 time + the
re-timed noisy class.  The kept detail takes the per-entry MIN across
runs for the noisy class and run-1 times for the stable class, so the
min-of-N protocol is reserved for the entries that need it.

Usage: python tools/bench_snapshot.py [round_no] [sf_dir] [max_runs]
Writes BENCH_DETAIL.json (+ BENCH_DETAIL_r{round}.json when round_no is
given).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STABLE_CUTOFF_SEC = 0.6


def one_run(sf_dir: str, skip_file: str | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if skip_file:
        env["SPARK_GRAFT_BENCH_SKIP"] = skip_file
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd="/tmp",
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench run failed:\n{proc.stderr[-3000:]}")
    with open(os.path.join(HERE, "BENCH_DETAIL.json")) as fh:
        return json.load(fh)


def stable_class(detail: dict) -> set[str]:
    """Headline entries eligible to skip in convergence runs: sub-second
    JVM-codegen queries.  Arrow-bearing entries (MATMUL_MIN2) and the
    tier/build entries (> cutoff in practice) always re-time."""
    sys.path.insert(0, HERE)
    from bench import HEADLINE, MATMUL_MIN2  # noqa: E402

    return {
        name
        for name in HEADLINE
        if name in detail["queries"]
        and detail["queries"][name] <= STABLE_CUTOFF_SEC
        and name not in MATMUL_MIN2
    }


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    max_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    first = one_run(sf_dir)
    stable = stable_class(first)
    stable_sum = round(sum(first["queries"][n] for n in stable), 3)
    totals = [first["value"]]
    print(
        f"run 1: {first['value']}s (stable class: {len(stable)} entries, "
        f"{stable_sum}s)",
        flush=True,
    )

    best_noisy = {
        k: v for k, v in first["queries"].items() if k not in stable
    }
    noisy_src = {k: 1 for k in best_noisy}
    converged = False
    if max_runs > 1:
        with tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False
        ) as fh:
            json.dump({"skip": sorted(stable)}, fh)
            skip_file = fh.name
        try:
            for i in range(1, max_runs):
                detail = one_run(sf_dir, skip_file)
                composite = round(stable_sum + detail["value"], 3)
                totals.append(composite)
                print(
                    f"run {i + 1}: composite {composite}s "
                    f"(noisy re-time {detail['value']}s)",
                    flush=True,
                )
                for k, v in detail["queries"].items():
                    if k not in best_noisy or v < best_noisy[k]:
                        best_noisy[k] = v
                        noisy_src[k] = i + 1
                lo, hi = sorted(totals[-2:])
                if hi / lo <= 1.05:
                    converged = True
                    break
        finally:
            os.unlink(skip_file)

    # composite detail: stable class at run-1 times, noisy class at the
    # per-entry min across runs
    out = dict(first)
    out["queries"] = {
        k: (first["queries"][k] if k in stable else best_noisy[k])
        for k in first["queries"]
    }
    # entries that only exist in later runs (shouldn't happen, but keep)
    for k, v in best_noisy.items():
        out["queries"].setdefault(k, v)
    out["value"] = round(sum(out["queries"].values()), 3)
    out.pop("skipped_stable", None)
    out["snapshot_protocol"] = {
        "rule": (
            "run 1 full; runs 2+ re-time only the noisy class "
            "(Arrow-bearing or > 0.6s in run 1); stop when two "
            "consecutive composite totals agree within 5%; detail = "
            "stable class at run-1 times + per-entry min over runs for "
            "the noisy class"
        ),
        "totals_sec": totals,
        "converged_within_5pct": converged,
        "n_runs": len(totals),
        "stable_class_n": len(stable),
        "stable_class_sec": stable_sum,
        "stable_cutoff_sec": STABLE_CUTOFF_SEC,
    }
    detail_path = os.path.join(HERE, "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(out, fh, indent=1)
    if round_no:
        shutil.copyfile(
            detail_path, os.path.join(HERE, f"BENCH_DETAIL_r{round_no}.json")
        )
    print(
        json.dumps(
            {
                "kept_total_sec": out["value"],
                "totals_sec": totals,
                "converged_within_5pct": converged,
                "stable_class_n": len(stable),
            }
        )
    )


if __name__ == "__main__":
    main()
