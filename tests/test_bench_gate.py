"""The bench quiet-start gate must actually refuse (r16): three
rounds recorded headlines under foreign-tenant load because the old
gate only waited and then started anyway, and each cost the next
round an A/B adjudication (BASELINE.md r13/r15/r16 sections). These
tests pin the refusal contract WITHOUT starting Spark — the gate
sits before session creation by design, so a refused run costs
nothing."""

import json
import sys

import pytest


def _run_gate(monkeypatch, capsys, loadavg, force=False,
              sleep_fn=None, steal=0.0, probe_calls=None):
    """Drive bench.main() with a fake host load; returns (exit_code,
    parsed last stdout JSON line) when it refuses, or (None, None)
    when the gate passes (we stop at get_spark — the test must never
    launch a real session). ``steal`` fakes the _steal_probe_median
    result (the gate's probe — median-of-3 because theft here is
    bursty): a scalar (every check), a list (consumed per gate
    check, last value repeats), or None (non-Linux — the steal gate
    must skip). The real probe spins every vCPU, so it is ALWAYS
    patched."""
    import bench

    class _Started(Exception):
        pass

    seq = list(steal) if isinstance(steal, list) else [steal]

    def fake_probe(*a, **k):
        if probe_calls is not None:
            probe_calls.append(1)
        return seq.pop(0) if len(seq) > 1 else seq[0]

    monkeypatch.setattr(bench, "_steal_probe_median", fake_probe)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: loadavg)
    monkeypatch.setattr(bench.time, "sleep",
                        sleep_fn or (lambda s: None))
    monkeypatch.setattr(
        bench, "get_spark",
        lambda *a, **k: (_ for _ in ()).throw(_Started()))
    if force:
        monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    try:
        bench.main()
    except SystemExit as e:
        line = capsys.readouterr().out.strip().splitlines()[-1]
        return e.code, json.loads(line)
    except _Started:
        return None, None
    pytest.fail("bench.main() returned without starting or refusing")


def test_gate_refuses_on_persistently_loaded_host(monkeypatch, capsys):
    code, artifact = _run_gate(monkeypatch, capsys, (9.0, 9.0, 9.0))
    assert code == 3
    assert artifact["refused_noisy_host"] is True
    assert artifact["value"] is None and artifact["queries"] == {}
    # the exhausted two-tier budget is recorded for the adjudicator
    assert artifact["quiet_wait_sec"] >= 1500
    assert artifact["loadavg_start"][0] == 9.0


def test_gate_force_override_starts_without_waiting(monkeypatch,
                                                    capsys):
    """A forced capture is a deliberately-loaded one: it must skip
    the quiet waits too, not just the refusal — the load is there by
    premise and may be gone in 25 minutes."""
    slept = []
    code, _ = _run_gate(monkeypatch, capsys, (9.0, 9.0, 9.0),
                        force=True,
                        sleep_fn=lambda s: slept.append(s))
    assert code is None  # reached get_spark: the run would proceed
    assert slept == []  # and without burning the wait budget


def test_gate_quiet_host_starts_immediately(monkeypatch, capsys):
    slept = []
    code, _ = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                        sleep_fn=lambda s: slept.append(s))
    assert code is None  # reached get_spark
    assert slept == []  # zero wait on a quiet host


def test_gate_borderline_host_waits_then_starts(monkeypatch, capsys):
    """Between the 1.5 quiet target and the 2.5 refusal ceiling the
    gate burns its tier-1 budget but still records (the r15 case —
    1.87 at start — now costs a bounded wait, not a refusal)."""
    slept = []
    code, _ = _run_gate(monkeypatch, capsys, (1.9, 1.9, 1.9),
                        sleep_fn=lambda s: slept.append(s))
    assert code is None  # reached get_spark: borderline still runs
    assert sum(slept) == 600  # tier-1 budget only; tier 2 passes


def test_gate_refuses_on_stolen_host(monkeypatch, capsys):
    """A loadavg-quiet window where the hypervisor is giving the CPU
    to other tenants must refuse: twice in r16 such a window inflated
    every untouched query 1.2-1.9x (BASELINE.md), which loadavg
    cannot see before the fact."""
    code, artifact = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                               steal=37.5)
    assert code == 3
    assert artifact["refused_stolen_host"] is True
    assert artifact["steal_pct"] == 37.5
    assert artifact["value"] is None and artifact["queries"] == {}
    assert artifact["steal_wait_sec"] >= 600  # budget exhausted


def test_gate_stolen_window_that_clears_proceeds(monkeypatch, capsys):
    """Theft that ends inside the wait budget must record, not
    refuse — the probe re-checks until the tenant leaves."""
    slept = []
    code, _ = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                        steal=[42.0, 18.0, 0.2],
                        sleep_fn=lambda s: slept.append(s))
    assert code is None  # reached get_spark
    assert sum(slept) == 60  # two 30s waits, then the clean probe


def test_gate_skips_steal_where_unmeasurable(monkeypatch, capsys):
    """No /proc/stat steal (non-Linux) = the steal gate must skip,
    not block: the loadavg gate still applies and the artifact
    records the probe as null."""
    code, _ = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                        steal=None)
    assert code is None  # reached get_spark


def test_gate_rechecks_loadavg_after_steal_wait(monkeypatch, capsys):
    """The steal wait can run minutes after the loadavg gate passed;
    if local load rose meanwhile, starting anyway would record the
    stale pre-wait load_start as quiet provenance for a loaded
    capture. The gate must re-check and refuse."""
    import bench

    class _Started(Exception):
        pass

    # key the load arrival on the steal wait's sleep, not on a
    # hardcoded count of getloadavg() reads: the loadavg gate is
    # quiet until the steal wait actually sleeps (the only sleep on
    # this path — the loadavg tiers pass immediately), then load
    # arrives — so adding/removing a read in the gate can't silently
    # shift which read flips
    slept = []
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: slept.append(s))
    monkeypatch.setattr(
        bench.os, "getloadavg",
        lambda: (5.0, 5.0, 5.0) if slept else (0.4, 0.4, 0.4))
    steals = iter([42.0])  # one stolen probe forces a 30s wait
    monkeypatch.setattr(bench, "_steal_probe_median",
                        lambda *a, **k: next(steals, 0.2))
    monkeypatch.setattr(
        bench, "get_spark",
        lambda *a, **k: (_ for _ in ()).throw(_Started()))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 3
    line = capsys.readouterr().out.strip().splitlines()[-1]
    artifact = json.loads(line)
    assert artifact["refused_noisy_host"] is True
    assert artifact["steal_wait_sec"] == 30
    assert artifact["loadavg_start"][0] == 5.0  # the POST-wait truth


def test_steal_wait_spends_only_the_envelope_remainder(monkeypatch,
                                                       capsys):
    """The total gate wait must stay inside the pre-existing 25-min
    envelope the driver is known to tolerate: a loadavg wait that
    burned 1470 s leaves the steal gate only 30 s before it must
    decide, not its full 600 s budget."""
    import bench

    slept = []
    monkeypatch.setattr(
        bench.os, "getloadavg",
        lambda: (2.6, 2.6, 2.6) if sum(slept) < 1470
        else (0.4, 0.4, 0.4))
    monkeypatch.setattr(bench, "_steal_probe_median",
                        lambda *a, **k: 42.0)
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: slept.append(s))
    monkeypatch.setattr(
        bench, "get_spark",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError(
            "gate must refuse, not start")))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 3
    artifact = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert artifact["refused_stolen_host"] is True
    assert artifact["quiet_wait_sec"] == 1470
    assert artifact["steal_wait_sec"] == 30  # 1500 - 1470, not 600


def test_steal_median_rides_out_one_burst(monkeypatch):
    """Theft here is bursty (0.25% -> 20.4% -> 0.38% across spot
    probes at idle loadavg): one burst in a 3-sample window must not
    decide the gate either way, and an unmeasurable sample (None)
    must short-circuit to None."""
    import bench

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    for seq, want in ([[0.3, 22.0, 0.5], 0.5],     # one burst: pass
                      [[18.0, 0.4, 31.0], 18.0],   # two bursts: hold
                      [[None, 9.9, 9.9], None]):   # unmeasurable
        vals = list(seq)
        monkeypatch.setattr(bench, "_steal_probe",
                            lambda *a, **k: vals.pop(0))
        assert bench._steal_probe_median() == want


def test_gate_force_override_skips_steal_probe(monkeypatch, capsys):
    """A forced capture must not burn 2s x ncpu on the probe either —
    the load is there by premise."""
    calls = []
    code, _ = _run_gate(monkeypatch, capsys, (9.0, 9.0, 9.0),
                        force=True, steal=99.0, probe_calls=calls)
    assert code is None  # reached get_spark
    assert calls == []  # probe never ran


def test_retry_candidates_include_stolen_stable_rows():
    """r17: the stabilization pass must retry rows whose per-query
    steal exceeds the ceiling even when their warm-rep CV is stable —
    the r16 artifact's three unstable rows AND its stolen-but-stable
    inflations (emb_near_dedup_capped, CV 0.123 at 77% steal) all
    carried high steal_pct; CV alone caught only the former."""
    import bench

    repstats = {
        "quiet_stable": {"reps": 3, "cv": 0.02, "steal_pct": 0.4},
        "noisy": {"reps": 6, "cv": 0.41, "steal_pct": 1.0},
        "stolen_stable": {"reps": 3, "cv": 0.12, "steal_pct": 77.0},
        "stolen_noisy": {"reps": 6, "cv": 0.55, "steal_pct": 61.0},
        "unmeasurable": {"reps": 3, "cv": 0.05, "steal_pct": None},
        "no_steal_field": {"reps": 3, "cv": 0.05},
    }
    got = bench._retry_candidates(repstats)
    assert got == ["noisy", "stolen_noisy", "stolen_stable"]
    assert repstats["noisy"]["retry_reason"] == "cv"
    assert repstats["stolen_stable"]["retry_reason"] == "steal"
    assert repstats["stolen_noisy"]["retry_reason"] == "cv+steal"
    assert "retry_reason" not in repstats["quiet_stable"]
    assert "retry_reason" not in repstats["unmeasurable"]


def test_gate_survives_probe_inflated_loadavg_after_steal_wait(
        monkeypatch, capsys):
    """The steal wait's own probes spin every vCPU ~10 s per median
    sample, inflating the 1-min loadavg the post-wait recheck reads
    (a real 205 s wait self-refused at loadavg 7.3 on an otherwise
    idle host). Self-inflicted load that DECAYS inside the bounded
    window must not refuse; only load that persists is foreign (the
    persisting case is pinned by
    test_gate_rechecks_loadavg_after_steal_wait)."""
    import bench

    class _Started(Exception):
        pass

    slept = []
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: slept.append(s))
    post = iter([7.3, 5.0, 3.1])  # the probes' wake, then decay

    def load():
        if not slept:  # quiet until the steal wait's first sleep
            return (0.4, 0.4, 0.4)
        v = next(post, 0.5)
        return (v, v, v)

    monkeypatch.setattr(bench.os, "getloadavg", load)
    steals = iter([42.0])  # one stolen probe forces a 30s wait
    monkeypatch.setattr(bench, "_steal_probe_median",
                        lambda *a, **k: next(steals, 0.2))
    monkeypatch.setattr(
        bench, "get_spark",
        lambda *a, **k: (_ for _ in ()).throw(_Started()))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    with pytest.raises(_Started):
        bench.main()  # reached get_spark: the decayed load recorded


def test_gate_same_regime_window_proceeds(monkeypatch, capsys):
    """r19 adoption rule (b): after the wait budget fails to find a
    <=5% window, a probe no worse than the standing committed
    capture's run-long steal + 2.0 proceeds as a like-for-like
    candidate instead of refusing (BASELINE.md "Bench adoption
    rule")."""
    import bench

    monkeypatch.setattr(bench, "_standing_run_steal", lambda: 9.16)
    code, _ = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                        steal=9.5)
    assert code is None  # reached get_spark
    err = capsys.readouterr().err
    assert "SAME-REGIME window accepted" in err


def test_gate_worse_than_regime_still_refuses(monkeypatch, capsys):
    """Rule (b) replaces "no artifact" with "honestly-paired
    artifact", never "quiet" with "stolen": a window worse than the
    standing regime's band must refuse exactly as before."""
    import bench

    monkeypatch.setattr(bench, "_standing_run_steal", lambda: 9.16)
    code, artifact = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                               steal=12.0)
    assert code == 3
    assert artifact["refused_stolen_host"] is True
    assert artifact["steal_pct"] == 12.0


def test_gate_same_regime_needs_a_standing_capture(monkeypatch,
                                                   capsys):
    """No committed standing capture (or one without run-long steal
    provenance) = no regime to match: the gate must refuse a >5%
    window rather than invent a band."""
    import bench

    monkeypatch.setattr(bench, "_standing_run_steal", lambda: None)
    code, artifact = _run_gate(monkeypatch, capsys, (0.4, 0.4, 0.4),
                               steal=9.5)
    assert code == 3
    assert artifact["refused_stolen_host"] is True


def test_standing_capture_resolves_through_pointer():
    """The standing capture rule (b) bands against is the ADOPTED
    one named by BENCH_STANDING.json, not HEAD:BENCH_DETAIL.json —
    the driver's round-end commit overwrites the latter with its own
    run's capture even when that capture was noisy (r18 committed a
    27.84%-steal one; banding against it would admit equally-noisy
    windows)."""
    import os
    import subprocess

    import bench

    repo = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(repo, "BENCH_STANDING.json")) as f:
        ptr = json.load(f)
    pointed = json.loads(subprocess.run(
        ["git", "-C", repo, "show",
         f"{ptr['commit']}:BENCH_DETAIL.json"],
        capture_output=True, text=True, check=True).stdout)
    want = pointed["loadavg"]["steal"]["run_pct_of_demand"]
    assert bench._standing_run_steal() == want
    # the pointer's summary fields must agree with the capture they
    # point at — a stale pointer edit would silently move the band
    assert ptr["run_steal_pct"] == want


class _FakeSC:
    def setJobGroup(self, *a):
        pass


class _FakeSpark:
    sparkContext = _FakeSC()


def test_release_caches_runs_between_reps():
    """(r20, verdict r19 issue #1) The timed loop must release caches
    BETWEEN reps, not only after a query's reps: Spark's CacheManager
    matches canonicalized plans, so without the per-rep release every
    rep after the first of a query with an in-query persist reads the
    previous rep's materialized cache and warm-min understates the
    persist's real cost. The release must also run OUTSIDE the timed
    region (after the rep's clock stops)."""
    import bench

    calls = []

    class _DF:
        def count(self):
            calls.append("run")
            return 1

    reps, best, n, _ = bench._time_query(
        _FakeSpark(), lambda s, d: _DF(), "/nowhere", "q",
        release=lambda: calls.append("release"),
        metrics=lambda s, g: None, max_reps=4)
    assert len(reps) >= 3 and n == 1 and best == min(reps)
    # strict alternation: every timed run is followed by a release
    # before the next run starts
    assert calls == ["run", "release"] * (len(calls) // 2)


def test_time_query_records_cold_and_task_metrics():
    """The adopted rep's task metrics ride along (steal-resistant
    scaling evidence) and the rep list keeps rep 1 (cold) so
    BENCH_DETAIL can record cold_sec next to warm-min."""
    import bench

    class _DF:
        def count(self):
            return 7

    grabbed = []
    reps, best, n, tm = bench._time_query(
        _FakeSpark(), lambda s, d: _DF(), "/nowhere", "q",
        release=lambda: None,
        metrics=lambda s, g: grabbed.append(g) or {"task_time_sec": 1.0},
        max_reps=3)
    assert n == 7
    assert tm == {"task_time_sec": 1.0}
    # metrics were (re)captured whenever a rep became the new best,
    # under that rep's job group
    assert all(g.startswith("bench_q_") for g in grabbed)
    assert len(reps) == 3
