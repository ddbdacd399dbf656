"""Regression net for the autonomous kidnap-detection science
(VALIDATION.md "Kidnapped-robot relocalization").

Reduced-scale analogue of the committed 5-seed protocol, in the
test_headline.py pattern: the in-model controller (gate_mode=
'auto_recovery', a stateful node in the compiled step) must
* stay silent through phase A (zero false triggers while the map is
  learned and tracking is healthy),
* detect the teleport within a bounded window, and
* end up better off than the strict reference gate, which provably
  blocks its own rescue after a far teleport.

Scale choice (measured, /tmp-probe then pinned here): ssp_dim=55,
250/500-neuron populations, T=60 s with the kidnap at 30 s — long enough
for the map to establish (pre-err 0.10) and for the +0.86 teleport's
agreement dip to be seen by the controller (detected at +18.3 s with the
committed thresholds), short enough for CPU CI (~5 min).  At this scale
the cons(recall, value) channel stays high (few familiar re-encounters),
so detection rides the agreement EMA — the assertions cover the
controller contract, not which channel fires; the channel-level science
is pinned at full scale in VALIDATION.md.  A LONGER phase A at this toy
scale erases the dip before the EMA sees it (measured: T=100/kidnap 50
never detects) — the reduced protocol needs the kidnap mid-learning.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_in_model_detection_and_recovery_direction():
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "experiments", "kidnapped_robot.py"),
         "--cpu", "--in-model", "--T", "60", "--ssp-dim", "55",
         "--pi-n-neurons", "250", "--mem-n-neurons", "500",
         "--circonv-n-neurons", "50", "--n-landmarks", "30",
         "--view-rad", "0.3", "--seed", "0"],
        capture_output=True, text=True, timeout=3000, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-3000:]
    r = json.loads([l for l in proc.stdout.splitlines()
                    if l.startswith("{")][-1])
    # the probe found a real teleport (measured 0.864)
    assert r["jump"] > 0.5, r
    auto = r["auto"]
    # phase A silence: the armed controller must not cry wolf while the
    # map is being learned (measured 0)
    assert auto["false_triggers"] == 0, auto
    # detection within the window (measured +18.3 s of the 30 s phase B)
    assert auto["detect_s"] is not None, auto
    assert auto["detect_s"] <= 27.0, auto
    # direction: the self-healing gate must beat the strict gate after
    # the kidnap (measured 0.66 vs 1.03; strict stays lost)
    assert r["adaptive"]["post_err"] < r["strict"]["post_err"], r
    assert r["strict"]["post_err"] > 0.5, r


@pytest.mark.slow
def test_anchor_channel_detection_and_recovery():
    """Regression net for the absolute-anchor science (VALIDATION.md
    "Absolute anchor" / parts 8b-9b): surveyed beacons give the in-model
    controller a WORLD-referenced agreement statistic and a
    map-independent recovery target.

    Same reduced protocol as the base test above, plus ``--anchor
    --anchor-k 6 --auto-derive``.  At this scale the internal channels
    alone detect at +18.3 s (the test above); with beacons the absolute
    channel fires at +1.1 s and recovery lands at 0.024 — phase-A
    quality — because the recovery target never touches the (kidnap-
    poisoned) learned map.  Pins the anchor contract: zero false
    triggers during phase A at ~61% beacon duty, detection fast enough
    that only the anchor channel can explain it, recovery below the
    view radius, strict gate still lost."""
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "experiments", "kidnapped_robot.py"),
         "--cpu", "--in-model", "--anchor", "--anchor-k", "6",
         "--auto-derive", "--T", "60", "--ssp-dim", "55",
         "--pi-n-neurons", "250", "--mem-n-neurons", "500",
         "--circonv-n-neurons", "50", "--n-landmarks", "30",
         "--view-rad", "0.3", "--seed", "0"],
        capture_output=True, text=True, timeout=3000, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-3000:]
    r = json.loads([l for l in proc.stdout.splitlines()
                    if l.startswith("{")][-1])
    assert r["jump"] > 0.5, r
    # the survey found usable beacons (measured 61% phase-A duty)
    assert r["anchor"]["in_view_frac_pre"] > 0.3, r
    auto = r["auto"]
    # zero false triggers with the absolute channel armed all of phase A
    assert auto["false_triggers"] == 0, auto
    # anchor-speed detection: the internal channels need +18.3 s at this
    # scale, so a detection inside 5 s can only be the absolute channel
    # (measured +1.1 s)
    assert auto["detect_s"] is not None, auto
    assert auto["detect_s"] <= 5.0, auto
    # recovery to phase-A quality, below the view radius (measured 0.024
    # vs the base controller's 0.66 — the absolute target bypasses the
    # poisoned map)
    assert r["adaptive"]["post_err"] <= 0.3, r
    assert r["adaptive"]["post_err"] < r["strict"]["post_err"], r
    assert r["strict"]["post_err"] > 0.5, r


@pytest.mark.slow
def test_view_family_anchor_detection():
    """Regression net for the view-family anchor science (VALIDATION.md
    "Part 9" / "part 9b"): the view model's internal statistics carry NO
    kidnap signature (continuous aliased view keys — part 9 measured a
    ~0.05 dip vs benign fluctuations 10x larger), so any detection at
    all must come from the absolute beacon channel.

    Reduced scale (probed, then pinned): ssp_dim=55, 12 landmarks,
    vr 0.35, 4 surveyed beacons, kidnap at 30 s of 60 s.  Measured:
    detect +2.65 s, zero false triggers at 62% beacon duty, adaptive
    phase-A 0.093 (vs strict 0.148 — the drift-governor effect), post
    0.53 vs pi-only 0.83.  At THIS scale the strict gate self-recovers
    (the view family absorbs teleports, part 9 seed 0), so the pinned
    contract is detection + phase-A silence + tracking + beating the
    uncorrected control; the full-scale recovery win is the VALIDATION
    part-9b table."""
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "experiments", "kidnapped_robot.py"),
         "--cpu", "--model", "view", "--in-model", "--anchor",
         "--anchor-k", "4", "--auto-derive", "--T", "60",
         "--ssp-dim", "55", "--pi-n-neurons", "250",
         "--mem-n-neurons", "500", "--circonv-n-neurons", "50",
         "--n-landmarks", "12", "--view-rad", "0.35",
         "--update-thres", "0.2", "--seed", "0"],
        capture_output=True, text=True, timeout=3000, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-3000:]
    r = json.loads([l for l in proc.stdout.splitlines()
                    if l.startswith("{")][-1])
    assert r["model"] == "view" and r["jump"] > 0.5, r
    assert r["anchor"]["in_view_frac_pre"] > 0.3, r
    auto = r["auto"]
    # the armed absolute channel must stay silent through phase A
    assert auto["false_triggers"] == 0, auto
    # detection exists at all == the beacon channel fired (the view
    # family's internal channels never do — part 9)
    assert auto["detect_s"] is not None, auto
    assert auto["detect_s"] <= 10.0, auto
    # live beacon corrections must not hurt healthy tracking (measured
    # 0.093, well inside the 0.35 view radius)
    assert r["adaptive"]["pre_err"] <= 0.2, r
    # and the governed model must beat the uncorrected PI control
    assert r["adaptive"]["post_err"] < r["pi_only"]["post_err"], r
