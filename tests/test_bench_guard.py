"""Benchmark-infrastructure invariants (no TPU needed).

Round-3 verdict item 9: committed bench artifacts must not silently regress
to degraded-window samples, and the health probe's nominal must track the
committed healthy wall.
"""

import importlib.util
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_should_write_artifact_guard():
    bench = _load("bench", os.path.join(REPO, "bench.py"))
    healthy = {"window": "healthy"}
    degraded = {"window": "degraded"}
    unknown = {"window": "unknown"}
    g = bench.should_write_artifact
    # no prior artifact: anything may land
    assert g(None, degraded)
    # healthy may replace anything
    assert g(healthy, healthy)
    assert g(degraded, healthy)
    assert g(unknown, healthy)
    # degraded/unknown may NOT silently replace healthy ...
    assert not g(healthy, degraded)
    assert not g(healthy, unknown)
    # ... unless forced
    assert g(healthy, degraded, force=True)
    # degraded-over-degraded refreshes are fine (newer commit field)
    assert g(degraded, degraded)
    # a healthy artifact keeps the deck's best healthy wall (r4): a slower
    # healthy sample is window luck, not a regression record
    fast = {"window": "healthy", "wall_mlups": 21079.4}
    slow = {"window": "healthy", "wall_mlups": 20325.9}
    assert not g(fast, slow)
    assert g(slow, fast)
    assert g(fast, slow, force=True)
    # wall absent on the EXISTING side: the window-only rule applies; a new
    # sample missing the wall never replaces a recorded one (r4 advisor)
    assert not g(fast, healthy)
    assert g(healthy, slow)
    # dispatch-bound sits between healthy and degraded (r4): it may replace
    # degraded/unknown but not healthy, and keeps its own best wall
    disp = {"window": "dispatch-bound", "wall_mlups": 11803.0}
    assert g(degraded, disp)
    assert g(unknown, disp)
    assert not g(healthy, disp)
    assert not g(disp, degraded)
    assert g(disp, healthy)
    assert not g(disp, {"window": "dispatch-bound", "wall_mlups": 11000.0})
    assert g(disp, {"window": "dispatch-bound", "wall_mlups": 12000.0})
    # degraded-over-degraded refreshes must not lower a recorded best device
    dslow = {"window": "degraded", "device_mlups": 20000.0}
    dfast = {"window": "degraded", "device_mlups": 22461.0}
    assert not g(dfast, dslow)
    assert g(dslow, dfast)
    # unknown ranks BELOW degraded (r4 advisor): an unknown-window sample —
    # which by definition carries no device measurement — must not replace
    # a degraded artifact's recorded best device number
    assert not g(dfast, unknown)
    assert not g(degraded, unknown)
    assert g(unknown, degraded)
    # within a class, a sample missing the comparison measurement never
    # replaces one that has it (r4 advisor: the skipped-comparison hole)
    assert not g(dfast, {"window": "degraded"})
    assert not g(fast, {"window": "healthy"})
    assert g({"window": "degraded"}, dfast)
    assert g(unknown, unknown)


def test_classify_window():
    bench = _load("bench", os.path.join(REPO, "bench.py"))
    c = bench.classify_window
    assert c(1.0, None) == "unknown"
    assert c(1.3, 1.0) == "healthy"
    # 55 ms wall / 27 ms device (the 128x128 shape): one ~28 ms launch
    # round trip, pool healthy -> dispatch-bound, not degraded
    assert c(0.055, 0.027) == "dispatch-bound"
    # a genuinely starved small run blows the absolute gap immediately
    assert c(0.36, 0.027) == "degraded"
    # large decks never qualify as dispatch-bound: 1.5x of seconds-scale
    # device time is far beyond the 60 ms gap allowance
    assert c(3.0, 1.5) == "degraded"


def test_tpu_health_nominal_tracks_committed_artifact():
    """NOMINAL_US must equal the committed healthy-window 1024^2 wall
    (us/step): a kernel-era change that lands a new healthy artifact without
    recalibrating the health probe fails here (round-3 verdict item 9)."""
    with open(os.path.join(REPO, "bench_artifacts", "1024x1024.json")) as fh:
        art = json.load(fh)
    assert art["window"] == "healthy", (
        "the headline 1024^2 artifact itself must be a healthy-window sample"
    )
    steps = int(re.search(r"_(\d+)steps", art["metric"]).group(1))
    wall_us = art["wall_s"] / steps * 1e6

    src = open(os.path.join(REPO, "scripts", "tpu_health.py")).read()
    nominal = float(re.search(r"^NOMINAL_US = ([0-9.]+)", src, re.M).group(1))
    assert abs(nominal - wall_us) / wall_us < 0.05, (
        f"scripts/tpu_health.py NOMINAL_US={nominal} is stale vs the "
        f"committed healthy artifact ({wall_us:.1f} us/step) — recalibrate"
    )
