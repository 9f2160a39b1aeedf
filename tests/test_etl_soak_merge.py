"""Spark-free tests for the ETL soak's min-over-runs merge — the
logic that decides which measurements survive in the committed
SCALE_SOAK.json evidence file. The r16 review found the first
version could erase gz/fullinc evidence in the replace direction
and mix one run's phase time with another run's stats; these pin
the fixed contract."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))

from etl_scale_soak import merge_scales  # noqa: E402


def _rec(total, fullinc=None, gz=None, n_rows=1000, gen=2, **extra):
    r = {"n_rows": n_rows, "gen_version": gen, "total_sec": total,
         "l0_sec": total / 3, "l5_sec": 2 * total / 3}
    if fullinc is not None:
        r["fullinc_sec"] = fullinc
        r["fullinc_stats"] = {"I": 1, "U": 1, "D": 1,
                              "tag": f"fi{fullinc}"}
        r["rows_after_fullinc"] = n_rows
    if gz is not None:
        r["l0_gz_sec"] = gz
        r["gz_bytes"] = 10
        r["plain_bytes"] = 30
    r.update(extra)
    return r


def test_prior_better_total_keeps_record_and_grafts_new_phases():
    prev = {"f1": _rec(10.0)}
    new = {"f1": _rec(12.0, fullinc=5.0, gz=3.0)}
    m = merge_scales(prev, new)
    assert m["f1"]["total_sec"] == 10.0  # prior total wins
    assert m["f1"]["fullinc_sec"] == 5.0  # new phases graft in
    assert m["f1"]["l0_gz_sec"] == 3.0


def test_new_better_total_replaces_but_keeps_prior_phase_evidence():
    """The r16 review finding: replacement must not erase a prior
    (better or only) gz/fullinc recording."""
    prev = {"f1": _rec(12.0, fullinc=4.0, gz=3.0)}
    new = {"f1": _rec(10.0)}  # faster total, no gz/fullinc this run
    m = merge_scales(prev, new)
    assert m["f1"]["total_sec"] == 10.0
    assert m["f1"]["fullinc_sec"] == 4.0  # prior evidence survives
    assert m["f1"]["l0_gz_sec"] == 3.0
    assert m["f1"]["gz_bytes"] == 10


def test_phase_time_travels_with_its_own_aux():
    """No mix-and-match: the surviving fullinc_sec keeps the stats
    of the run that produced it."""
    prev = {"f1": _rec(10.0, fullinc=4.0)}
    new = {"f1": _rec(11.0, fullinc=6.0)}  # worse fullinc too
    m = merge_scales(prev, new)
    assert m["f1"]["fullinc_sec"] == 4.0
    assert m["f1"]["fullinc_stats"]["tag"] == "fi4.0"
    # reversed: better new fullinc brings ITS stats
    m2 = merge_scales({"f1": _rec(10.0, fullinc=6.0)},
                      {"f1": _rec(11.0, fullinc=4.0)})
    assert m2["f1"]["total_sec"] == 10.0
    assert m2["f1"]["fullinc_sec"] == 4.0
    assert m2["f1"]["fullinc_stats"]["tag"] == "fi4.0"


def test_generator_version_bump_replaces_wholesale():
    """A re-plant changes what the phases measure: no cross-version
    minima, no cross-version grafting."""
    prev = {"f1": _rec(5.0, fullinc=2.0, gen=1)}
    new = {"f1": _rec(9.0, fullinc=7.0, gen=2)}
    m = merge_scales(prev, new)
    assert m["f1"]["total_sec"] == 9.0  # slower but current-version
    assert m["f1"]["fullinc_sec"] == 7.0
    assert m["f1"]["gen_version"] == 2


def test_unrelated_factors_pass_through():
    prev = {"f1": _rec(10.0)}
    new = {"f10": _rec(30.0)}
    m = merge_scales(prev, new)
    assert set(m) == {"f1", "f10"}


def test_inputs_not_mutated():
    prev = {"f1": _rec(12.0, gz=3.0)}
    new = {"f1": _rec(10.0)}
    merge_scales(prev, new)
    assert "l0_gz_sec" not in new["f1"]
    assert prev["f1"]["total_sec"] == 12.0


def test_grafted_phase_clears_stale_aux_pairing():
    """The r17 advice finding: when a record WITHOUT the same-window
    plain pairing grafts its better l0_gz_sec into a record that HAS
    one, the destination's l0_plain_same_window_sec must be cleared —
    otherwise the artifact presents a cross-run gz/plain pair as the
    'recomputable same-window' ratio."""
    prev = {"f1": _rec(10.0, gz=5.0,
                       l0_plain_same_window_sec=4.5)}
    # pre-r17-shaped record: better gz time, no same-window pairing
    new = {"f1": _rec(12.0, gz=3.0)}
    m = merge_scales(prev, new)
    assert m["f1"]["l0_gz_sec"] == 3.0
    assert "l0_plain_same_window_sec" not in m["f1"]
    # and when the better gz time DOES carry its pairing, it travels
    m2 = merge_scales(
        {"f1": _rec(10.0, gz=5.0, l0_plain_same_window_sec=4.5)},
        {"f1": _rec(12.0, gz=3.0, l0_plain_same_window_sec=2.9)})
    assert m2["f1"]["l0_gz_sec"] == 3.0
    assert m2["f1"]["l0_plain_same_window_sec"] == 2.9
    # losing graft direction: prev keeps its own coherent pair
    m3 = merge_scales(
        {"f1": _rec(10.0, gz=3.0, l0_plain_same_window_sec=2.9)},
        {"f1": _rec(12.0, gz=5.0)})
    assert m3["f1"]["l0_gz_sec"] == 3.0
    assert m3["f1"]["l0_plain_same_window_sec"] == 2.9
