"""bench.py config builders: the *_golden variants must be immune to
BENCH_* env overrides — the golden series is a regression tracker whose
meaning depends on its config being frozen (a stray BENCH_RNG/GELU/ATTN
left set during a BENCH_TARGET=all run must not emit a different config
under the golden name and mask a regression in the pinned path)."""

import importlib
import sys


def _bench():
    # bench.py lives at the repo root, next to the tests' parent
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    return importlib.import_module("bench")


def test_golden_bert_cfg_ignores_env_overrides(monkeypatch):
    bench = _bench()
    monkeypatch.setenv("BENCH_GELU", "tanh")
    monkeypatch.setenv("BENCH_ATTN", "pallas")
    monkeypatch.setenv("BENCH_LN", "pallas")
    cfg = bench._bench_bert_cfg(gelu="exact", attn="xla", pinned=True)
    assert not cfg.gelu_approximate
    assert not cfg.gelu_output_bwd
    assert not cfg.fused_attention
    assert not cfg.fused_ln


def test_unpinned_bert_cfg_honors_env(monkeypatch):
    bench = _bench()
    monkeypatch.setenv("BENCH_GELU", "exact_outbwd")
    monkeypatch.setenv("BENCH_ATTN", "xla")
    monkeypatch.delenv("BENCH_LN", raising=False)
    cfg = bench._bench_bert_cfg(gelu="tanh", attn="pallas")
    assert cfg.gelu_output_bwd and not cfg.gelu_approximate
    assert not cfg.fused_attention


def test_rng_impl_resolution(monkeypatch):
    bench = _bench()
    monkeypatch.delenv("BENCH_RNG", raising=False)
    assert bench._rng_impl(None) is None
    assert bench._rng_impl("rbg") == "rbg"
    monkeypatch.setenv("BENCH_RNG", "threefry")
    assert bench._rng_impl("rbg") is None
    monkeypatch.setenv("BENCH_RNG", "rbg")
    assert bench._rng_impl(None) == "rbg"
