"""Regression test for the headline science claims (VALIDATION.md).

Pins the REDUCED-scale analogue of the tuned loop-closure protocol
(experiments/validate_loop_closure.py, the committed form of the headline
table) so the central claims break CI when broken:

* the tuned config tracks (median decoded error inside a band), and
* SLAM beats pure path integration by a wide margin once drift has
  accumulated (oracle metric: reference run_slam.py:238-255).

Scale choice: ssp_dim=55 / 400 PI neurons / 600 memory neurons / T=100 s,
seed 0 — long enough for gross PI drift (measured: PI median 0.946,
last-quarter 0.964) while tuned SLAM holds (median 0.032, lastq 0.031),
a ~30x separation asserted here at >=3x to leave room for host-codegen
spike-flip variation.  Marked slow (~4 min on CPU).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tuned_loop_closure_band_and_separation():
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "experiments", "validate_loop_closure.py"),
         "--cpu", "--T", "100", "--ssp-dim", "61",
         "--pi-n-neurons", "400", "--mem-n-neurons", "600",
         "--circonv-n-neurons", "50", "--n-landmarks", "30",
         "--tuned", "--seed", "0"],
        capture_output=True, text=True, timeout=1200, cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-3000:]
    r = json.loads([l for l in proc.stdout.splitlines()
                    if l.startswith("{")][-1])
    # tuned-config tracking band (measured 0.032 / 0.031)
    assert r["slam_median"] < 0.08, r
    assert r["slam_lastq"] < 0.12, r
    # SLAM vs pure-PI separation (measured ~30x; asserted >=3x)
    assert r["pi_median"] > 3 * r["slam_median"], r
    assert r["pi_lastq"] > 3 * r["slam_lastq"], r
