"""v2 generation CLI: ``python -m imagegenerator_tpu.v2.generate -p "..."``.

End-to-end capability match for ``/root/reference/v2_implementation/
generate.py``: load the VQGAN checkpoint (+ yaml config) and CLIP, build
per-prompt text embeddings, initialize the latent (random tokens, or an
encoded random-noise/gradient image), optimize with Adam, and write the
output PNG with the prompt embedded as a PNG 'comment' text chunk —
printing per-prompt losses every ``--save_every`` iterations.

Without checkpoint files on disk this falls back to randomly-initialized
small models (clearly warned) so the full pipeline remains runnable in
the zero-egress environment.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from imagegenerator_tpu.v2.arg_parser import get_parser
from imagegenerator_tpu.v2 import convert
from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig
from imagegenerator_tpu.v2.engine import GenerateEngine, pad_prompt_specs
from imagegenerator_tpu.v2.init_image import random_gradient_image, random_noise_image
from imagegenerator_tpu.v2.prompts import split_prompt
from imagegenerator_tpu.v2.tokenizer import open_tokenizer
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel, config_from_yaml_dict

DEFAULT_IMAGE_SIZE = 128

CLIP_CONFIGS = {
    "ViT-B/32": CLIPConfig.vit_b32,
    "ViT-B/16": CLIPConfig.vit_b16,
    "ViT-L/14": CLIPConfig.vit_l14,
    "ViT-L/14@336px": CLIPConfig.vit_l14_336,
    # modified-ResNet towers (reference clip.load accepts these via the
    # -m flag, arg_parser.py:33-38)
    "RN50": CLIPConfig.rn50,
    "RN101": CLIPConfig.rn101,
    "RN50x4": CLIPConfig.rn50x4,
    "RN50x16": CLIPConfig.rn50x16,
    "RN50x64": CLIPConfig.rn50x64,
}


def load_vqgan(config_path: str, ckpt_path: str, key):
    """yaml + .ckpt -> (config, params); random tiny model if absent."""
    if os.path.exists(config_path) and os.path.exists(ckpt_path):
        import yaml

        with open(config_path) as f:
            y = yaml.safe_load(f)
        target = y["model"].get("target", "taming.models.vqgan.VQModel")
        if not target.endswith("VQModel"):
            raise ValueError(f"unknown model type: {target}")
        cfg = config_from_yaml_dict(y["model"]["params"])
        sd = convert.load_torch_state_dict(ckpt_path)
        return cfg, convert.convert_vqgan_params(sd, cfg)
    print(
        f"[warn] VQGAN checkpoint not found ({ckpt_path}); "
        "using a randomly-initialized tiny model",
        file=sys.stderr,
    )
    cfg = VQGANConfig.tiny()
    model = VQModel(cfg)
    x = jnp.zeros((1, cfg.resolution, cfg.resolution, 3))
    return cfg, model.init(key, x)["params"]


def load_clip(model_name: str, ckpt_path: str | None, key):
    if model_name not in CLIP_CONFIGS:
        raise ValueError(
            f"unsupported CLIP model {model_name!r}; "
            f"choose one of {sorted(CLIP_CONFIGS)}"
        )
    if ckpt_path and os.path.exists(ckpt_path):
        sd = convert.load_torch_state_dict(ckpt_path)
        cfg = convert.clip_config_from_state_dict(sd)
        return cfg, convert.convert_clip_params(sd, cfg)
    print(
        f"[warn] CLIP checkpoint not found for {model_name}; "
        "using a randomly-initialized tiny model",
        file=sys.stderr,
    )
    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    imgs = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3))
    toks = jnp.zeros((1, cfg.context_length), jnp.int32)
    return cfg, model.init(key, imgs, toks)["params"]


def save_png(path: str, image01: np.ndarray, comment: str) -> None:
    """[0,1] HWC float -> PNG with the prompt in a 'comment' text chunk
    (reference generate.py:147-151)."""
    from PIL import Image, PngImagePlugin

    arr = np.clip(np.asarray(image01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    info = PngImagePlugin.PngInfo()
    info.add_text("comment", comment)
    Image.fromarray(arr).save(path, pnginfo=info)


def main(argv=None):
    args = get_parser(DEFAULT_IMAGE_SIZE).parse_args(argv)

    if args.cuda_device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # prompt SETS: one image per set. Single -p "a|b" = one image with
    # two prompts (the reference contract); --prompts_file = one set per
    # line, batched over devices (BASELINE.json config 5).
    prompt_sets: list[list[str]] = []
    if args.prompts_file:
        with open(args.prompts_file) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    prompt_sets.append(line.split("|"))
    elif args.prompts:
        prompt_sets.append(args.prompts.strip().split("|"))
    else:
        prompt_sets.append([])

    batch = len(prompt_sets)
    seed = args.seed if args.seed is not None else int.from_bytes(os.urandom(4), "little")
    print("Using seed:", seed)
    key = (
        jax.random.key(seed, impl=args.rng_impl)
        if args.rng_impl
        else jax.random.key(seed)
    )
    k_vq, k_clip, k_init, k_run = jax.random.split(key, 4)

    vq_cfg, vq_params = load_vqgan(args.vqgan_config, args.vqgan_checkpoint, k_vq)
    clip_cfg, clip_params = load_clip(args.clip_model, args.clip_checkpoint, k_clip)

    engine = GenerateEngine(
        vqgan_config=vq_cfg,
        clip_config=clip_cfg,
        vqgan_params=vq_params,
        clip_params=clip_params,
        step_size=args.step_size,
    )

    f = vq_cfg.f
    toks_x, toks_y = args.size[0] // f, args.size[1] // f
    side_x, side_y = toks_x * f, toks_y * f

    # latent init (reference generate.py:94-111)
    if args.init_noise in ("random", "gradient"):
        rng = np.random.default_rng(seed)
        img_fn = random_noise_image if args.init_noise == "random" else (
            random_gradient_image
        )
        imgs01 = np.stack([img_fn(side_x, side_y, rng) for _ in range(batch)])
        z = engine.encode_image_to_latent(jnp.asarray(imgs01 * 2.0 - 1.0))
    else:
        z = engine.random_token_latent(k_init, batch, toks_y, toks_x)

    # per-prompt CLIP text embeddings, padded to a common P across sets
    tokenizer = open_tokenizer(
        args.bpe_vocab, clip_cfg.context_length, clip_cfg.vocab_size
    )
    p_max = max(1, max(len(s) for s in prompt_sets))
    rows = []
    for prompts in prompt_sets:
        embed_list, weights, stops = [], [], []
        for prompt in prompts:
            txt, w, s = split_prompt(prompt)
            tokens = tokenizer([txt])
            embed_list.append(np.asarray(engine.encode_text(tokens))[0])
            weights.append(w)
            stops.append(s)
        rows.append(pad_prompt_specs(embed_list, weights, stops, pad_to=p_max))
    embeds = jnp.asarray(np.concatenate([r[0] for r in rows]))
    w_arr = jnp.asarray(np.concatenate([r[1] for r in rows]))
    s_arr = jnp.asarray(np.concatenate([r[2] for r in rows]))

    # shard the generation batch data-parallel when it divides the mesh
    devices = jax.devices()
    if batch > 1 and len(devices) > 1 and batch % len(devices) == 0:
        from imagegenerator_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh(len(devices))
        z = shard_batch(z, mesh)
        embeds = shard_batch(embeds, mesh)
        w_arr, s_arr = shard_batch(w_arr, mesh), shard_batch(s_arr, mesh)

    state = engine.init_state(z)

    # --state: resume snapshot (round-5 extension — the reference v2
    # checkpoints nothing). Restoring AFTER init_state gives
    # load_latent_state the template's shapes/dtypes/shardings, so a
    # mismatched resume (size/batch/optimizer) errors clearly.
    it0 = 0
    state_callback = None
    if args.state_path:
        from imagegenerator_tpu.v2.engine import (
            load_latent_state,
            save_latent_state,
        )

        if os.path.exists(args.state_path):
            it0, state = load_latent_state(args.state_path, state)
            print(f"Resumed state at iteration {it0} from {args.state_path}")

        def state_callback(i, st):
            save_latent_state(args.state_path, it0 + i, st)

    remaining = max(0, args.max_iterations - it0)

    stem, ext = os.path.splitext(args.output)

    def out_path(i: int) -> str:
        return args.output if batch == 1 else f"{stem}_{i}{ext or '.png'}"

    def checkin(i, imgs, losses):
        for b, prompts in enumerate(prompt_sets):
            per_prompt = losses[b, : max(1, len(prompts))]
            loss_str = ", ".join(f"{v:g}" for v in per_prompt)
            prefix = f"[{b}] " if batch > 1 else ""
            print(
                f"{prefix}i: {it0 + i}, loss: {per_prompt.sum():g}, "
                f"losses: {loss_str}"
            )
            save_png(out_path(b), imgs[b], f"{prompts}")

    def progress(done, total, last_losses):
        # one line per chain window (the reference's visible per-iteration
        # tqdm bar, generate.py:185-188, amortized to the dispatch window)
        per_image = [
            f"{last_losses[b, : max(1, len(p))].sum():g}"
            for b, p in enumerate(prompt_sets)
        ]
        print(
            f"progress: {it0 + done}/{args.max_iterations} iterations, "
            f"loss: {', '.join(per_image)}"
        )

    import contextlib

    from imagegenerator_tpu.utils.profiling import trace

    prof = (
        trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()
    )
    try:
        with prof:
            engine.run(
                state,
                k_run,
                embeds,
                w_arr,
                s_arr,
                iterations=remaining,
                display_freq=args.display_freq,
                checkin=checkin,
                progress=progress,
                state_callback=state_callback,
            )
    except KeyboardInterrupt:
        pass  # reference generate.py:194-195


if __name__ == "__main__":
    main()
