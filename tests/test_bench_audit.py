"""Unit tests for bench.py's mechanical audit pieces: the
regression-adjudication decision tree (in particular the round-12
advice fix — a manual waiver must never outrank a moved static plan
fingerprint) and the trailing throughput floor. Pure functions, no
Spark session."""

from __future__ import annotations

import bench


def _adj(**kw):
    base = dict(
        name="q", p=1.0, t=2.0, pfp=None, nfp=None,
        pfi=None, nfi=None, io_same=False, waivers={},
    )
    base.update(kw)
    return bench.adjudicate_regression(**base)


def test_static_fp_move_is_unexplained_regardless_of_io():
    adj, fp_moved = _adj(pfi="aaa", nfi="bbb", pfp="x", nfp="y",
                         io_same=True, t=1.6)
    assert adj.startswith("UNEXPLAINED (static plan fingerprint moved")
    assert fp_moved is True


def test_aqe_replan_waived_only_with_identical_io_under_2x():
    kw = dict(pfi="aaa", nfi="aaa", pfp="x", nfp="y")
    adj, _ = _adj(io_same=True, t=1.9, **kw)
    assert "AQE runtime re-plan" in adj and not adj.startswith("UN")
    adj, _ = _adj(io_same=False, t=1.9, **kw)
    assert adj.startswith("UNEXPLAINED (AQE runtime re-plan")
    adj, _ = _adj(io_same=True, t=2.5, **kw)
    assert adj.startswith("UNEXPLAINED (AQE runtime re-plan")


def test_io_identical_variance_band():
    adj, _ = _adj(io_same=True, t=1.9)
    assert "ambient machine variance" in adj
    adj, _ = _adj(io_same=True, t=1.9, pfp="x", nfp="x",
                  pfi="a", nfi="a")
    assert "mechanically confirmed" in adj
    adj, _ = _adj(io_same=True, t=2.5)
    assert adj == "UNEXPLAINED"
    adj, _ = _adj(io_same=False, t=1.5)
    assert adj == "UNEXPLAINED"


def test_waiver_applies_while_static_fp_inside_pinned_set():
    w = {"q": {"note": "known bistability", "pinned_fp_init": ["aaa"]}}
    # fpi landed on the pinned state: waiver applies even though the
    # final plan moved with moved io (the q21 shape)
    adj, _ = _adj(waivers=w, pfi="aaa", nfi="aaa", pfp="x", nfp="y",
                  io_same=False, t=2.1)
    assert adj == "known bistability"
    # the previous round was also pinned but the new static plan is
    # NOT in the set: the waiver is stale and must escalate, never
    # mask (round-12 advice — the exact blind spot)
    adj, _ = _adj(waivers=w, pfi="aaa", nfi="zzz", pfp="x", nfp="y",
                  io_same=True, t=1.5)
    assert adj.startswith("UNEXPLAINED (static plan fingerprint")
    assert "waiver is stale" in adj


def test_waiver_without_pin_needs_provably_unmoved_fpi():
    w = {"q": {"note": "hand waiver"}}
    adj, _ = _adj(waivers=w, pfi="aaa", nfi="aaa")
    assert adj == "hand waiver"
    # static plan moved: the pin-less waiver is overridden
    adj, _ = _adj(waivers=w, pfi="aaa", nfi="bbb")
    assert adj.startswith("UNEXPLAINED (static plan fingerprint")
    # no fingerprint captured at all: the waiver must NOT apply on
    # missing evidence — fall through to the mechanical io rules
    adj, _ = _adj(waivers=w, io_same=True, t=1.5)
    assert "ambient machine variance" in adj


def test_throughput_floor_flags_below_band():
    trailing = [("BENCH_r10.json", 79051), ("BENCH_r11.json", 95917),
                ("BENCH_r12.json", 77932)]
    best = max(tp for _, tp in trailing)
    floor = best / 1.5
    assert 77932 > floor  # the r12 figure itself passes the bar
    assert 60000 < floor  # a genuine ~40% regression would flag


def test_pinned_waiver_bounded_by_wall_cap():
    """round-13 advice: a pin certifies the PLAN, not the runtime —
    an extreme same-plan slowdown must still escalate. Default cap
    3.0x; per-waiver override honored."""
    w = {"q": {"note": "known bistability", "pinned_fp_init": ["aaa"]}}
    kw = dict(waivers=w, pfi="aaa", nfi="aaa", pfp="x", nfp="y",
              io_same=False)
    # inside the cap: waived exactly as before (the codified 2.1x)
    adj, _ = _adj(t=2.1, **kw)
    assert adj == "known bistability"
    # past the cap: UNEXPLAINED even though fpi sits on the pin
    adj, _ = _adj(t=4.0, **kw)
    assert adj.startswith("UNEXPLAINED (static plan inside the waiver")
    assert "waiver cap" in adj
    # per-waiver override
    w2 = {"q": {"note": "n", "pinned_fp_init": ["aaa"],
                "wall_cap": 5.0}}
    adj, _ = _adj(t=4.0, waivers=w2, pfi="aaa", nfi="aaa",
                  pfp="x", nfp="y", io_same=False)
    assert adj == "n"
    # the cap also bounds PIN-LESS waivers with provably-unmoved fpi
    w3 = {"q": {"note": "hand waiver"}}
    adj, _ = _adj(t=4.0, waivers=w3, pfi="aaa", nfi="aaa")
    assert adj.startswith("UNEXPLAINED (static plan inside the waiver")


def test_vm_canary_is_fast_and_positive():
    """The calibration task must be cheap (sub-second-ish on any sane
    box) and strictly positive — it brackets every bench run."""
    t = bench._vm_canary_s()
    assert 0 < t < 30


def test_no_unpinned_waivers():
    """Every manual waiver must carry a pinned static-fingerprint set
    (an unpinned entry would mask future genuine plan changes — the
    round-12 advice). The round-14 synthetic_stream one-transition
    waiver was removed in round 15 per its own cleanup rule once the
    r14 BENCH_LOCAL.json baseline absorbed the transition; this test
    now guards the general invariant instead of that single entry."""
    for name, w in bench._REGRESSION_ADJUDICATIONS.items():
        assert w.get("pinned_fp_init"), (name, w)


def test_throughput_floor_canary_adjudication():
    """round 14: the dedicated throughput runs execute at the very
    end of the bench, so a slow VM phase there flagged ambient drift
    as a pipeline regression. The adjudicator waives a below-raw-floor
    figure ONLY when the canary-adjusted figure clears the floor AND
    the silver pipeline's static fingerprint + io are provably
    unmoved; anything less stays UNEXPLAINED."""
    from bench import adjudicate_throughput_floor as _a

    floor = 63945.0
    # above the floor raw: no adjudication at all
    adj, _ = _a(70000, floor, 1.3, True, True)
    assert adj is None
    # below raw, adjusted clears it, plan+io identical: waived
    adj, tp_adj = _a(62814, floor, 1.4, True, True)
    assert adj is not None and not adj.startswith("UNEXPLAINED")
    assert tp_adj == round(62814 * 1.4)
    # same numbers but the plan moved: must escalate
    adj, _ = _a(62814, floor, 1.4, False, True)
    assert adj.startswith("UNEXPLAINED")
    # same numbers but no previous artifact (evidence unknown): escalate
    adj, _ = _a(62814, floor, 1.4, None, None)
    assert adj.startswith("UNEXPLAINED")
    # canary says the machine is FINE (ratio 1.0): a genuine
    # regression stays flagged
    adj, _ = _a(50000, floor, 1.0, True, True)
    assert adj.startswith("UNEXPLAINED")


def test_regression_flag_fires_on_raw_ratio_only():
    """round-15 de-noise (round-14 verdict fix #2): the per-query flag
    gate is the RAW wall ratio — the canary must never CREATE a flag.
    The r14 driver tail printed 51 auto-waived REGRESSION rows, some
    for queries that got faster (1.264s -> 1.225s flagged), because the
    gate compared the canary-INFLATED time. Both thresholds (>1.25x
    AND >+0.3s) are raw."""
    flag = bench.regression_flag_fires
    assert flag(1.0, 1.4)            # 1.4x and +0.4s: genuine mover
    assert not flag(1.0, 1.2)        # below the ratio bar
    assert not flag(0.1, 0.2)        # 2x but only +0.1s: noise floor
    assert not flag(1.264, 1.225)    # the r14 faster-but-flagged case
    assert not flag(None, 5.0)       # no previous artifact
    assert not flag(0, 5.0)          # zero/absent previous timing
