#!/usr/bin/env python3
"""Bench contention-correction verification (dev tool, driver-side python).

Round 14 shipped a 198.8 s bench artifact for a 157.9 s engine because
UNIFORM machine load inflated every segment probe equally and the
median-relative detector saw nothing. Bench now carries an ABSOLUTE
reference (the committed quiet bench_full.json): queries measuring
>1.5x their committed quiet time get up to 2 extra re-measures, min
kept. This script verifies that machinery end-to-end:

  1. runs Bench on a query subset with CPU hogs pinned from process
     start (warmup + the min-of-3 first pass run LOADED),
  2. kills the hogs the moment Bench's stderr announces the absolute
     re-measure pass ("queries above 1.5x committed quiet time"), so
     the correction passes run QUIET — the transient-load scenario the
     machinery exists for,
  3. runs the SAME subset once more with no hogs (the quiet CONTROL),
  4. compares the two artifacts per query.

PASS = the correction fired (n_remeasured > 0) AND the loaded-then-
corrected total lands within TOLERANCE of the quiet CONTROL total.
The control is a same-protocol subset run, NOT the committed full-run
reference: a 10-query subset run is 30-70% slower per query than the
same query inside a 239-query run even on an idle machine (fewer
warmup queries -> colder shared-path JIT — measured in COVERAGE.md's
round-12 bench notes), so comparing against the full-run reference
would fail on warmup bias, not on load. The committed reference still
serves as Bench's in-process absolute yardstick (that is what triggers
the re-measures); the control isolates what the LOAD cost after
correction.

The Bench child runs in a temp cwd with the committed bench_full.json
copied in (Bench reads its quiet reference from cwd), so nothing in
the repo is clobbered.

Usage: python3 tools/bench_loadtest.py [hogs] [max_load_secs]
"""
import json
import multiprocessing
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# moderate-cost queries spanning execution profiles, all present in the
# committed quiet reference
QUERIES = [
    "q_a1_oi", "q_tfidf", "q_dedup_exact", "q_bpe_train",
    "q_m8_rolling_refit", "q_pack_chunks", "q_hll_rollup",
    "q_sessionize", "q_w3_rolling", "q_decontam",
]
TOLERANCE = 1.25  # loaded-then-corrected total vs quiet-control total
RELEASE_MARKER = "committed quiet time: re-measuring"


def burn(release, deadline: float) -> None:
    x = 0
    while not release.is_set() and time.time() < deadline:
        x += 1  # pure-python spin pegs one core per process


def run_bench(quiet_path: str, hogs: int, max_load: float) -> dict:
    """One subset Bench run; hogs > 0 pins CPUs until the absolute
    re-measure pass is announced on stderr (or max_load elapses)."""
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_GRAFT_ONLY": ",".join(QUERIES),
    })
    cp = f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*"
    release = multiprocessing.Event()
    deadline = time.time() + max_load
    procs = [multiprocessing.Process(target=burn, args=(release, deadline),
                                     daemon=True) for _ in range(hogs)]
    released_at = {"t": None}
    t0 = time.time()
    with tempfile.TemporaryDirectory(prefix="benchload-") as cwd:
        # Bench reads its absolute quiet reference from cwd
        shutil.copy(quiet_path, os.path.join(cwd, "bench_full.json"))
        for p in procs:
            p.start()
        child = subprocess.Popen(
            ["java", "-cp", cp, "-Xmx16g", "graft.Bench"],
            cwd=cwd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)

        stderr_lines = []

        def watch() -> None:
            for line in child.stderr:
                stderr_lines.append(line)
                if RELEASE_MARKER in line and not release.is_set():
                    released_at["t"] = time.time() - t0
                    release.set()
                    print(f"[loadtest] re-measure pass announced at "
                          f"+{released_at['t']:.0f}s — hogs released",
                          file=sys.stderr)

        w = threading.Thread(target=watch, daemon=True)
        w.start()
        child.wait()
        w.join(timeout=5)
        release.set()
        for p in procs:
            p.join()
        if child.returncode != 0:
            sys.exit("[loadtest] bench failed:\n" + "".join(stderr_lines[-20:]))
        with open(os.path.join(cwd, "bench_full_subset.json")) as f:
            art = json.load(f)
    art["_load_window"] = released_at["t"]
    return art


def main() -> None:
    hogs = int(sys.argv[1]) if len(sys.argv) > 1 else os.cpu_count()
    max_load = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
    quiet_path = os.path.join(REPO, "bench_full.json")
    with open(quiet_path) as f:
        committed = json.load(f)
    missing = [q for q in QUERIES if q not in committed["queries"]]
    if missing:
        sys.exit(f"quiet reference lacks {missing} — refresh bench_full.json")

    print(f"[loadtest] LOADED run: {hogs} hogs until the re-measure pass",
          file=sys.stderr)
    loaded = run_bench(quiet_path, hogs, max_load)
    print("[loadtest] CONTROL run: no hogs", file=sys.stderr)
    control = run_bench(quiet_path, hogs=0, max_load=0.0)

    # a query that failed inside either child run is recorded in its
    # `errors` and omitted from `queries` (the child still exits 0) —
    # fail LOUDLY with the missing names rather than KeyError mid-report
    present = [q for q in QUERIES
               if q in loaded["queries"] and q in control["queries"]]
    absent = [q for q in QUERIES if q not in present]
    if absent:
        sys.exit(f"[loadtest] queries missing from a child artifact "
                 f"(failed inside Bench?): {absent}; "
                 f"loaded errors={loaded.get('errors')}, "
                 f"control errors={control.get('errors')}")
    ratios = {q: round(loaded["queries"][q] /
                       max(control["queries"][q], 1e-3), 2) for q in present}
    tot_loaded = sum(loaded["queries"][q] for q in present)
    tot_control = sum(control["queries"][q] for q in present)
    result = {
        "metric": "bench_loadtest",
        "hogs": hogs,
        "load_window_secs": None if loaded["_load_window"] is None
        else round(loaded["_load_window"], 1),
        "n_remeasured_loaded": loaded["n_remeasured"],
        "n_remeasured_control": control["n_remeasured"],
        "calib_loaded": loaded["calib_sec"],
        "calib_control": control["calib_sec"],
        "total_loaded": round(tot_loaded, 3),
        "total_control": round(tot_control, 3),
        "total_ratio": round(tot_loaded / tot_control, 3),
        "per_query_ratio": ratios,
        "corrected": loaded["n_remeasured"] > 0,
        "pass": tot_loaded / tot_control <= TOLERANCE
                and loaded["n_remeasured"] > 0,
    }
    print(json.dumps(result))
    if not result["pass"]:
        hint = ("correction never fired — the load missed the timed window"
                if loaded["n_remeasured"] == 0 else
                "artifact still inflated after quiet re-measures")
        sys.exit(f"[loadtest] FAIL: {hint}")


if __name__ == "__main__":
    main()
