"""Grasp + lift with cube state from PIXELS ONLY (VERDICT r2 next #5).

Scaled-down twin of examples/14_pick_from_pixels: the controller's belief
takes its cube position from a CNN over overhead renders (dead-reckoned
under occlusion); success is judged on the true plant, which the
controller never reads. Slow tier (MPPI full-fidelity rollouts on CPU).
"""

import importlib

import pytest


@pytest.mark.slow
def test_pick_from_pixels_lifts(tmp_path):
    mod = importlib.import_module("gym_kmanip_tpu.examples.14_pick_from_pixels")
    rate, est_err = mod.run(
        n_episodes=2, ep_len=90, n_samples=128, est_samples=256,
        est_steps=800, seed=0, log=lambda *a: None,
    )
    # the estimator must localize the cube to grasp tolerance
    assert est_err < 0.02, f"estimator err {est_err:.3f} m"
    # and at least one pixels-only episode must lift the cube
    assert rate > 0, "never lifted from pixels"
