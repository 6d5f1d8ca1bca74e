"""v2 generate CLI end-to-end (tiny fallback models): runs N iterations,
writes a PNG with the prompt embedded as a comment text chunk."""

import numpy as np
from PIL import Image

from imagegenerator_tpu.v2.generate import main


def test_generate_cli_end_to_end(tmp_path, capsys):
    out = tmp_path / "out.png"
    main(
        [
            "-p", "a tiny test prompt:1|negative thing:-0.5",
            "-i", "2",
            "-se", "1",
            "-s", "32", "32",
            "-sd", "123",
            "-o", str(out),
            "-conf", str(tmp_path / "missing.yaml"),
            "-ckpt", str(tmp_path / "missing.ckpt"),
        ]
    )
    captured = capsys.readouterr()
    assert "Using seed: 123" in captured.out
    assert "i: 0, loss:" in captured.out
    # per-chain progress surface (reference generate.py:185-188;
    # VERDICT.md round-3 next #7): 2 iterations, save_every 1 -> two
    # chain windows
    assert "progress: 1/2 iterations, loss:" in captured.out
    assert "progress: 2/2 iterations, loss:" in captured.out

    img = Image.open(out)
    assert img.size == (32, 32)
    assert "a tiny test prompt" in img.info.get("comment", "")
    arr = np.asarray(img)
    assert arr.shape == (32, 32, 3)


def test_generate_cli_init_noise(tmp_path):
    out = tmp_path / "out2.png"
    main(
        [
            "-p", "gradient init",
            "-i", "1",
            "-s", "32", "32",
            "-sd", "7",
            "-in", "gradient",
            "-o", str(out),
            "-conf", "/nonexistent.yaml",
            "-ckpt", "/nonexistent.ckpt",
        ]
    )
    assert out.exists()


def test_generate_cli_prompts_file(tmp_path):
    pf = tmp_path / "prompts.txt"
    pf.write_text("a red thing\na blue thing|not green:-0.3\n")
    out = tmp_path / "batch.png"
    main(
        [
            "--prompts_file", str(pf),
            "-i", "1",
            "-s", "32", "32",
            "-sd", "11",
            "-o", str(out),
            "-conf", "/nonexistent.yaml",
            "-ckpt", "/nonexistent.ckpt",
        ]
    )
    assert (tmp_path / "batch_0.png").exists()
    assert (tmp_path / "batch_1.png").exists()
