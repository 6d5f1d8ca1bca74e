"""Evaluation subsystem: Fréchet distance oracle parity + CLIP metrics.

The Fréchet implementation (symmetric-eig formulation, host f64) is
checked against a ``scipy.linalg.sqrtm`` oracle and against the two
closed forms (identical stats -> 0; equal covariances -> squared mean
shift). The CLIP extractor is checked for pad-batching equivalence and
the CLI end-to-end on a tiny random tower (the reference has no
evaluation code to mirror — SURVEY.md §5 'Metrics/observability').
"""

import json
import os

import numpy as np
import pytest

from imagegenerator_tpu.eval import cli as eval_cli
from imagegenerator_tpu.eval import clip_eval, frechet


def _random_stats(rng, dim, n=None):
    n = n or dim * 4
    x = rng.standard_normal((n, dim))
    # a non-trivial anisotropic Gaussian
    mix = rng.standard_normal((dim, dim)) * 0.4 + np.eye(dim)
    return frechet.gaussian_stats(x @ mix + rng.standard_normal(dim))


def test_frechet_matches_scipy_sqrtm():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(0)
    for dim in (4, 16, 48):
        mu1, c1 = _random_stats(rng, dim)
        mu2, c2 = _random_stats(rng, dim)
        got = frechet.frechet_distance(mu1, c1, mu2, c2, eps=0.0)
        covmean = scipy_linalg.sqrtm(c1 @ c2)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        want = (
            (mu1 - mu2) @ (mu1 - mu2)
            + np.trace(c1)
            + np.trace(c2)
            - 2.0 * np.trace(covmean)
        )
        assert got == pytest.approx(want, rel=1e-8, abs=1e-8)


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(1)
    mu, cov = _random_stats(rng, 12)
    assert frechet.frechet_distance(mu, cov, mu, cov, eps=0.0) == (
        pytest.approx(0.0, abs=1e-9)
    )


def test_frechet_equal_cov_is_squared_mean_shift():
    rng = np.random.default_rng(2)
    mu, cov = _random_stats(rng, 8)
    shift = rng.standard_normal(8)
    got = frechet.frechet_distance(mu, cov, mu + shift, cov, eps=0.0)
    assert got == pytest.approx(shift @ shift, rel=1e-9)


def test_frechet_rank_deficient_regularized():
    # fewer samples than dims -> singular covariance; the default eps
    # offset must keep the distance finite and >= 0
    rng = np.random.default_rng(3)
    a = rng.standard_normal((10, 32))
    b = rng.standard_normal((10, 32)) + 1.0
    d = frechet.frechet_distance(
        *frechet.gaussian_stats(a), *frechet.gaussian_stats(b)
    )
    assert np.isfinite(d) and d > 0


def test_moments_streaming_matches_oneshot():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((37, 9))
    m = frechet.FeatureMoments(9)
    for chunk in (x[:5], x[5:20], x[20:]):
        m.update(chunk)
    mu, cov = m.stats()
    np.testing.assert_allclose(mu, x.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-12)


def test_moments_validation():
    m = frechet.FeatureMoments(4)
    with pytest.raises(ValueError):
        m.update(np.zeros((2, 5)))
    m.update(np.zeros((1, 4)))
    with pytest.raises(ValueError):
        m.stats()


@pytest.fixture(scope="module")
def tiny_clip():
    import jax
    import jax.numpy as jnp

    from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig

    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
        jnp.zeros((1, cfg.context_length), jnp.int32),
    )["params"]
    return cfg, params


def test_image_embeddings_pad_batching(tiny_clip):
    cfg, params = tiny_clip
    rng = np.random.default_rng(5)
    imgs = rng.random((5, 16, 16, 3), np.float32)  # off-res: resize path
    small = clip_eval.image_embeddings(cfg, params, imgs, batch_size=2)
    big = clip_eval.image_embeddings(cfg, params, imgs, batch_size=8)
    assert small.shape == (5, cfg.embed_dim)
    np.testing.assert_allclose(small, big, atol=1e-5)


def test_text_embeddings_pad_batching(tiny_clip):
    cfg, params = tiny_clip
    rng = np.random.default_rng(6)
    toks = rng.integers(0, cfg.vocab_size, (5, cfg.context_length))
    small = clip_eval.text_embeddings(cfg, params, toks, batch_size=2)
    big = clip_eval.text_embeddings(cfg, params, toks, batch_size=16)
    np.testing.assert_allclose(small, big, atol=1e-5)


def test_image_embeddings_mesh_matches_single_device(tiny_clip):
    # the DP recipe of the trainers applied to eval extraction: batch
    # sharded over the virtual 8-device mesh, params replicated, zero
    # collectives — numerics must match the unsharded path
    from imagegenerator_tpu.parallel.mesh import make_mesh

    cfg, params = tiny_clip
    rng = np.random.default_rng(10)
    imgs = rng.random((8, cfg.image_resolution, cfg.image_resolution, 3),
                      np.float32)
    toks = rng.integers(0, cfg.vocab_size, (8, cfg.context_length))
    mesh = make_mesh(8)
    plain_i = clip_eval.image_embeddings(cfg, params, imgs, batch_size=8)
    mesh_i = clip_eval.image_embeddings(
        cfg, params, imgs, batch_size=8, mesh=mesh
    )
    np.testing.assert_allclose(mesh_i, plain_i, atol=2e-5)
    plain_t = clip_eval.text_embeddings(cfg, params, toks, batch_size=8)
    mesh_t = clip_eval.text_embeddings(
        cfg, params, toks, batch_size=8, mesh=mesh
    )
    np.testing.assert_allclose(mesh_t, plain_t, atol=2e-5)
    with pytest.raises(ValueError):  # 3 does not divide over 8 devices
        clip_eval.image_embeddings(
            cfg, params, imgs, batch_size=3, mesh=mesh
        )


def test_cli_dp_mesh(tmp_path):
    rng = np.random.default_rng(11)
    np.savez(
        tmp_path / "gen.npz",
        images=rng.integers(0, 255, (4, 16, 16, 3), np.uint8),
    )
    result = eval_cli.main([
        "--samples", str(tmp_path / "gen.npz"),
        "--captions", "dp-sharded evaluation",
        "--batch", "4", "--dp", "2",
    ])
    assert np.isfinite(result["clip_score"])


def test_clip_score_closed_forms():
    e = np.eye(4)[:2]  # two orthogonal unit rows
    assert clip_eval.clip_score(e, e) == pytest.approx(100.0)
    assert clip_eval.clip_score(e, e[::-1]) == pytest.approx(0.0)
    # negative cosine clamps to zero, scaling invariance of the norm
    assert clip_eval.clip_score(e, -3.0 * e) == pytest.approx(0.0)
    with pytest.raises(ValueError):
        clip_eval.clip_score(e, np.eye(3))


def _write_pngs(tmpdir, arrays):
    from PIL import Image

    os.makedirs(tmpdir, exist_ok=True)
    for i, a in enumerate(arrays):
        Image.fromarray(a).save(os.path.join(tmpdir, f"{i:03d}.png"))


def test_cli_end_to_end(tmp_path, capsys):
    rng = np.random.default_rng(7)
    gen = rng.integers(0, 255, (3, 24, 24, 3), np.uint8)
    ref = rng.integers(0, 255, (4, 24, 24, 3), np.uint8)
    _write_pngs(tmp_path / "gen", gen)
    np.savez(tmp_path / "ref.npz", images=ref)
    out_path = tmp_path / "metrics.json"

    result = eval_cli.main([
        "--samples", str(tmp_path / "gen"),
        "--ref", str(tmp_path / "ref.npz"),
        "--captions", "a tiny test image|another one|a third",
        "--batch", "2",
        "-o", str(out_path),
    ])
    assert result["n_samples"] == 3 and result["n_ref"] == 4
    assert result["real_weights"] is False
    assert np.isfinite(result["clip_score"])
    assert result["frechet_clip_distance"] >= 0
    # stdout is the same single JSON line the file records
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == result
    assert json.loads(out_path.read_text()) == result


def test_cli_streaming_matches_direct_api(tmp_path):
    # the CLI's one-pass chunked accumulation (batch 2 over 5 images,
    # broadcast caption embedded once) must equal the eager API compose
    import jax

    from imagegenerator_tpu.v2.generate import load_clip
    from imagegenerator_tpu.v2.tokenizer import open_tokenizer

    rng = np.random.default_rng(12)
    gen = rng.integers(0, 255, (5, 16, 16, 3), np.uint8)
    ref = rng.integers(0, 255, (6, 16, 16, 3), np.uint8)
    np.savez(tmp_path / "gen.npz", images=gen)
    np.savez(tmp_path / "ref.npz", images=ref)
    result = eval_cli.main([
        "--samples", str(tmp_path / "gen.npz"),
        "--ref", str(tmp_path / "ref.npz"),
        "--captions", "one broadcast caption",
        "--batch", "2", "--seed", "3",
    ])

    cfg, params = load_clip("ViT-B/32", None, jax.random.PRNGKey(3))
    g01 = gen.astype(np.float32) / 255.0
    r01 = ref.astype(np.float32) / 255.0
    ge = clip_eval.image_embeddings(cfg, params, g01, batch_size=2)
    re = clip_eval.image_embeddings(cfg, params, r01, batch_size=2)
    tok = open_tokenizer(None, cfg.context_length, cfg.vocab_size)
    te = clip_eval.text_embeddings(
        cfg, params, tok(["one broadcast caption"] * 5), batch_size=2
    )
    assert result["clip_score"] == pytest.approx(
        clip_eval.clip_score(ge, te), abs=2e-3
    )
    assert result["frechet_clip_distance"] == pytest.approx(
        frechet.frechet_distance(
            *frechet.gaussian_stats(ge), *frechet.gaussian_stats(re)
        ),
        rel=1e-3,
    )


def test_npz_streaming_roundtrip(tmp_path):
    # the npz branch streams rows from the zip member (header-only
    # probe, sequential chunk reads) — bytes must round-trip exactly
    # for uint8 and float32 alike, across chunk boundaries
    rng = np.random.default_rng(13)
    u8 = rng.integers(0, 255, (5, 6, 7, 3), np.uint8)
    f32 = rng.random((5, 6, 7, 3)).astype(np.float32)
    np.savez(tmp_path / "u8.npz", images=u8)
    np.savez_compressed(tmp_path / "f32.npz", images=f32)
    got_u8 = eval_cli.load_image_set(str(tmp_path / "u8.npz"))
    np.testing.assert_allclose(got_u8, u8.astype(np.float32) / 255.0)
    s = eval_cli.ImageSet(str(tmp_path / "f32.npz"))
    assert len(s) == 5
    chunks = list(s.batches(2))
    assert [c.shape[0] for c in chunks] == [2, 2, 1]
    np.testing.assert_array_equal(np.concatenate(chunks), f32)
    with pytest.raises(ValueError, match="images"):
        np.savez(tmp_path / "bad.npz", other=u8)
        eval_cli.ImageSet(str(tmp_path / "bad.npz"))


def test_load_image_set_single_file(tmp_path):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (1, 20, 20, 3), np.uint8)
    _write_pngs(tmp_path, img)
    loaded = eval_cli.load_image_set(str(tmp_path / "000.png"))
    assert loaded.shape == (1, 20, 20, 3)
    np.testing.assert_allclose(loaded, img.astype(np.float32) / 255.0)


def test_parse_captions_file(tmp_path):
    f = tmp_path / "caps.txt"
    f.write_text("a red bus\n\n  a snowy street  \n")
    caps = eval_cli.parse_captions(f"@{f}", 2)
    assert caps == ["a red bus", "a snowy street"]
    # single line in a file broadcasts like the inline form
    f.write_text("just one\n")
    assert eval_cli.parse_captions(f"@{f}", 3) == ["just one"] * 3


def test_cli_caption_broadcast_and_errors(tmp_path):
    rng = np.random.default_rng(8)
    _write_pngs(
        tmp_path / "gen",
        rng.integers(0, 255, (2, 16, 16, 3), np.uint8),
    )
    result = eval_cli.main([
        "--samples", str(tmp_path / "gen"),
        "--captions", "one caption broadcasts",
        "--batch", "4",
    ])
    assert "clip_score" in result and "frechet_clip_distance" not in result
    with pytest.raises(ValueError):
        eval_cli.parse_captions("a|b|c", 2)
    with pytest.raises(SystemExit):  # nothing to compute
        eval_cli.main(["--samples", str(tmp_path / "gen")])
