"""bench.py contamination self-adjudication (round 15 — r14 verdict
#2): five consecutive driver benches ran contended and each cost the
next round its top task re-adjudicating artifacts; the bench now
detects a contaminated query (kept-run spread > 1.5x, or a bracketing
GEMM probe degraded > 2x vs the warm baseline) and RE-RUNS it, keeping
the lower median — so the emitted number matches an idle run within
the documented ±20% floor without a next-round bisect.

bench.py imports pyspark session helpers but starting no session at
import time; these tests drive ``run_headline`` directly with scripted
and real-CPU fake queries — no Spark, fast.
"""

from __future__ import annotations

import multiprocessing
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import bench  # noqa: E402


def _scripted(per_query: dict[str, list[float]]):
    """run_query stub replaying scripted durations (no sleeping)."""
    idx: dict[str, int] = {}

    def run(name: str):
        i = idx.get(name, 0)
        idx[name] = i + 1
        series = per_query[name]
        return series[min(i, len(series) - 1)], 7

    return run


def test_spread_trigger_reruns_and_converges():
    """A query whose kept runs spread 2.2x (contention hit runs 2-5)
    re-runs; the rerun (idle) median wins and lands within the ±20%
    floor of a truly idle invocation."""
    dirty_then_idle = [1.0, 2.2, 1.1, 2.4, 2.3,  # first pass
                       1.02, 0.99, 1.01, 1.0]     # rerun (idle)
    run = _scripted({"q": dirty_then_idle})
    timings, spread, reruns = bench.run_headline(
        ["q"], run, runs=5, gemm_base=0.02,
        probe=lambda: 0.02, log=lambda s: None,
    )
    assert "q" in reruns and reruns["q"]["reason"].startswith("spread")
    idle_median = 1.0
    assert abs(timings["q"] - idle_median) / idle_median <= bench.DRIFT_FLOOR
    assert reruns["q"]["rerun_median"] < reruns["q"]["first_median"]


def test_gemm_probe_trigger():
    """Uniformly-slowed runs (tight spread — spread can't see it) with
    a PERSISTENTLY degraded bracketing probe (both the first probe and
    the post-settle re-probe) still re-run, and the re-run counts as
    effective because its median landed materially lower."""
    slowed_then_idle = [2.0, 2.05, 2.1, 2.02, 2.08,
                        1.0, 1.01, 0.99, 1.02]
    probes = iter([0.05, 0.05])  # 2.5x the 0.02 baseline, twice
    run = _scripted({"q": slowed_then_idle})
    timings, _, reruns = bench.run_headline(
        ["q"], run, runs=5, gemm_base=0.02,
        probe=lambda: next(probes), log=lambda s: None,
    )
    assert "q" in reruns and reruns["q"]["reason"].startswith("gemm")
    assert reruns["q"]["effective"] is True
    assert timings["q"] <= 1.02


def test_gemm_probe_false_alarm_settles_without_rerun():
    """One depressed probe right after a query (trailing executor/GC
    activity on an idle machine) must NOT trigger a re-run when the
    post-settle re-probe reads clean."""
    run = _scripted({"q": [1.5, 1.0, 1.05, 1.02, 1.04]})
    probes = iter([0.05, 0.021])  # degraded, then clean after settle
    timings, _, reruns = bench.run_headline(
        ["q"], run, runs=5, gemm_base=0.02,
        probe=lambda: next(probes), log=lambda s: None,
    )
    assert reruns == {}
    assert timings["q"] == 1.03


def test_ineffective_rerun_marked_and_excluded_from_stamp():
    """A spread-triggered re-run whose median merely CONFIRMS the
    original (probe/spread false alarm, e.g. one straggler run) is
    recorded with effective=false — and effective=false re-runs must
    not trip the whole-run contamination stamp the way
    RERUN_STAMP_COUNT effective ones do."""
    # one straggler run trips the spread trigger; the re-run matches
    straggler = [1.0, 1.0, 1.0, 1.0, 1.9,
                 1.01, 1.0, 0.99, 1.0]
    run = _scripted({"q": straggler})
    _, _, reruns = bench.run_headline(
        ["q"], run, runs=5, gemm_base=0.02,
        probe=lambda: 0.02, log=lambda s: None,
    )
    assert "q" in reruns and reruns["q"]["effective"] is False
    n_eff = sum(1 for r in reruns.values() if r.get("effective"))
    stamped, _ = bench.stamp_contaminated(0.0030, 0.0031, n_eff)
    assert not stamped


def test_clean_query_not_rerun():
    run = _scripted({"q": [1.5, 1.0, 1.05, 1.02, 1.04]})
    timings, spread, reruns = bench.run_headline(
        ["q"], run, runs=5, gemm_base=0.02,
        probe=lambda: 0.02, log=lambda s: None,
    )
    assert reruns == {}
    assert timings["q"] == 1.03  # median of the 4 kept runs
    assert spread["q"] == [1.0, 1.05]


def test_whole_run_stamp_keys_on_gemm_not_canary():
    """The contamination STAMP must not fire on an idle run: the
    canary rel_drift carries JVM warm-up slope (an idle r14 run read
    0.62), so the stamp keys on the warm-up-free GEMM drift and the
    re-run count instead."""
    # idle: GEMM stable within a few %, no re-runs -> clean
    stamped, drift = bench.stamp_contaminated(0.0030, 0.0032, 0)
    assert not stamped and drift < bench.GEMM_DRIFT_FLOOR
    # contended at the end: GEMM 3x -> stamped
    stamped, _ = bench.stamp_contaminated(0.0030, 0.0090, 0)
    assert stamped
    # contended at the start (gemm_base inflated, end clean) -> stamped
    stamped, _ = bench.stamp_contaminated(0.0090, 0.0030, 0)
    assert stamped
    # spiky mid-run contention that missed both GEMM legs but forced
    # many per-query re-runs -> stamped
    stamped, _ = bench.stamp_contaminated(0.0030, 0.0031,
                                          bench.RERUN_STAMP_COUNT)
    assert stamped


def _spin(stop_path: str) -> None:
    x = 1.0
    while not os.path.exists(stop_path):
        x = x * 1.0000001 + 1.0


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="spawns 3x-oversubscription spinner load + settle loops "
    "(~10-30s, machine-state dependent); opt in with "
    "SPARK_GRAFT_SLOW_TESTS=1 — the trigger/retirement logic is pinned "
    "by the scripted tests above",
)
def test_synthetic_load_rerun_matches_idle(tmp_path):
    """The prescribed end-to-end shape: a real CPU-bound query timed
    under genuine synthetic load (three spinners per CPU) gets flagged,
    the load stops, the re-run median matches an idle measurement
    within the ±20% floor."""
    def work():
        # pure-Python CPU work: scheduler-bound only, so it recovers
        # the instant the load dies (a multithreaded-BLAS workload
        # takes ~4s to re-settle its thread pool after heavy
        # oversubscription — measured — which would test the machine,
        # not the bench)
        t0 = time.monotonic()
        x = 0
        for i in range(2_000_000):
            x += i * i
        return time.monotonic() - t0, 1

    # idle references (min — contention only adds time), BEFORE load.
    # gemm_base over three spaced probe batches: in the full suite this
    # test runs after files that started Spark sessions, and a single
    # batch can land entirely inside a residual-JVM GC burst — an
    # inflated base silently disables the 2x degrade trigger (the
    # observed flake). min over ~a second of wall clock is burst-proof.
    idle = min(work()[0] for _ in range(3))
    bases = []
    for _ in range(3):
        bases.append(bench.gemm_probe(5))
        time.sleep(0.3)
    gemm_base = min(bases)

    # 3x oversubscription: the probe and the query get ~1/4 of a core,
    # putting the probe well past the 2x degrade threshold even if the
    # base carries some residual inflation
    stop = str(tmp_path / "stop")
    procs = [
        multiprocessing.Process(target=_spin, args=(stop,), daemon=True)
        for _ in range(3 * (os.cpu_count() or 8))
    ]
    for p in procs:
        p.start()
    # establish the load via the trigger's own instrument, not a fixed
    # sleep: proceed only once a probe reads past the degrade threshold
    # with margin. If this host cannot even show the load to the probe,
    # the end-to-end precondition is absent — skip rather than assert
    # on machine state (the scripted-trigger tests above pin the logic).
    deadline = time.monotonic() + 20
    while bench.gemm_probe(3) <= 2.2 * gemm_base:
        if time.monotonic() > deadline:
            for _p in procs:
                _p.terminate()
            pytest.skip(
                "synthetic load never became visible to the GEMM probe "
                "on this host; trigger logic is covered by the scripted "
                "tests"
            )
        time.sleep(0.2)

    state = {"n": 0, "recovered": True}

    def run(name: str):
        # the load dies the moment the re-run pass begins (first pass
        # = `runs` invocations), modeling contention that has moved on
        if state["n"] >= 5 and not os.path.exists(stop):
            with open(stop, "w") as f:
                f.write("x")
            for p in procs:
                p.join(timeout=10)
            # settle-until-visible, symmetric with the load-establish
            # loop above: fixed sleeps kept flaking (0.3 s read 15-25%
            # slow; 1.0 s still read +24% once — run-queue drain +
            # frequency recovery vary by host state), so wait until the
            # work unit itself reads back at idle speed, bounded. If
            # the host never recovers, that is machine state the bench
            # cannot control — flag it and skip after the run.
            time.sleep(0.5)
            deadline = time.monotonic() + 10
            while work()[0] > idle * 1.10:
                if time.monotonic() > deadline:
                    state["recovered"] = False
                    break
                time.sleep(0.2)
        state["n"] += 1
        return work()

    try:
        # the bracketing probe runs while the load is still alive, so
        # the GEMM trigger fires even if the loaded spread stays tight
        timings, _, reruns = bench.run_headline(
            ["q"], run, runs=5, gemm_base=gemm_base,
            probe=lambda: bench.gemm_probe(3), log=lambda s: None,
        )
    finally:
        if not os.path.exists(stop):
            with open(stop, "w") as f:
                f.write("x")
        for p in procs:
            p.join(timeout=10)

    assert "q" in reruns, "loaded first pass must trigger a re-run"
    if not state["recovered"]:
        pytest.skip(
            "host did not return to idle speed within 10 s of the "
            "synthetic load dying; rerun-vs-idle convergence would "
            "measure machine state, not the bench (trigger + retirement "
            "logic is covered by the scripted tests)"
        )
    # compare against a CONTEMPORANEOUS idle read (multithreaded BLAS
    # throughput takes seconds to fully recover after 2x
    # oversubscription dies — the pre-load idle alone would fail the
    # rerun for machine state the bench cannot control); the claim
    # under test is that the rerun converges on idle, so idle is
    # whichever reference the machine supports best
    idle_after = min(work()[0] for _ in range(3))
    idle_ref = max(idle, idle_after)
    assert timings["q"] <= idle_ref * (1 + bench.DRIFT_FLOOR), (
        timings["q"], idle, idle_after, reruns,
    )
    # and the rerun must have retired the contaminated number
    assert reruns["q"]["rerun_median"] < reruns["q"]["first_median"] / 2
