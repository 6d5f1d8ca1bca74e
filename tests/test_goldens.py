"""Fixed-seed golden tests — the 'bit-comparable samples at fixed seed'
fidelity contract (BASELINE.json north star). Regenerate with
``python tests/make_goldens.py`` after an intentional math change."""

import os

import numpy as np
import pytest

import tests.make_goldens as mg

GOLDEN_DIR = mg.GOLDEN_DIR


def _load(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing; run tests/make_goldens.py")
    return np.load(path)


def test_stage1_step_golden():
    want = _load("stage1_step.npz")
    got = mg.stage1_golden()
    for k in want.files:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5, err_msg=k)


def test_stage2_step_golden():
    want = _load("stage2_step.npz")
    got = mg.stage2_golden()
    for k in want.files:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5, err_msg=k)


def test_v2_engine_golden():
    want = _load("v2_engine.npz")
    got = mg.v2_golden()
    np.testing.assert_allclose(got["z"], want["z"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["losses"], want["losses"], rtol=1e-4, atol=1e-5)


def test_stage1_sample_golden():
    """Pins the Stage1System.sample eval path (BN running stats,
    eval-mode encoder, CA/z key split) — VERDICT.md round-4 next #5."""
    want = _load("sample_stage1.npz")
    got = mg.stage1_sample_golden()
    np.testing.assert_allclose(
        got["images"], want["images"], rtol=1e-4, atol=1e-5
    )


def test_stage2_sample_golden():
    want = _load("sample_stage2.npz")
    got = mg.stage2_sample_golden()
    np.testing.assert_allclose(
        got["images"], want["images"], rtol=1e-4, atol=1e-5
    )


def test_models_golden():
    want = _load("models.npz")
    got = mg.models_golden()
    np.testing.assert_allclose(got["g1_out"], want["g1_out"], rtol=1e-5, atol=1e-6)
