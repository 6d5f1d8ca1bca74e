"""v2 CLI flag surface — identical contract to the reference's parser
(``/root/reference/v2_implementation/arg_parser.py:4-95``): same short
and long names, same dests, same defaults. One TPU-motivated addition
(``--bpe_vocab``) is appended at the end; everything the reference
accepts works unchanged (``-cd/--cuda_device`` is accepted and mapped to
a JAX platform hint)."""

from __future__ import annotations

import argparse


def get_parser(default_image_size: int = 128) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ImageGenv2 using VQGAN+CLIP (TPU)")
    p.add_argument("-p", "--prompts", type=str, default=None, dest="prompts",
                   help="Text prompts (| separated; each 'text:weight:stop')")
    p.add_argument("-i", "--iterations", type=int, default=200,
                   dest="max_iterations", help="Optimization iterations to run")
    p.add_argument("-se", "--save_every", type=int, default=20,
                   dest="display_freq", help="Checkin/save interval (iterations)")
    p.add_argument("-s", "--size", nargs=2, type=int,
                   default=[default_image_size, default_image_size],
                   dest="size", help="Output image width and height (pixels)")
    p.add_argument("-m", "--clip_model", type=str, default="ViT-B/32",
                   dest="clip_model", help="CLIP model variant (ViT-B/32, ViT-B/16, ViT-L/14)")
    p.add_argument("-conf", "--vqgan_config", type=str,
                   default="checkpoints/vqgan_imagenet_f16_16384.yaml",
                   dest="vqgan_config", help="Path to the VQGAN yaml config")
    p.add_argument("-ckpt", "--vqgan_checkpoint", type=str,
                   default="checkpoints/vqgan_imagenet_f16_16384.ckpt",
                   dest="vqgan_checkpoint", help="Path to the VQGAN .ckpt weights")
    p.add_argument("-lr", "--learning_rate", type=float, default=0.1,
                   dest="step_size", help="Adam step size for the latent")
    p.add_argument("-sd", "--seed", type=int, default=None, dest="seed",
                   help="PRNG seed (random when omitted)")
    p.add_argument("-cd", "--cuda_device", type=str, default="tpu",
                   dest="cuda_device",
                   help="Accelerator hint (reference compat; tpu|cpu)")
    p.add_argument("-o", "--output", type=str, default="output.png",
                   dest="output", help="Output PNG path")
    p.add_argument("-in", "--init_noise", type=str, default=None,
                   dest="init_noise",
                   help="Latent init image kind: random | gradient")
    # TPU build extras (appended; absent in the reference)
    p.add_argument("--bpe_vocab", type=str, default=None, dest="bpe_vocab",
                   help="Path to CLIP bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--clip_checkpoint", type=str, default=None,
                   dest="clip_checkpoint",
                   help="Path to an OpenAI CLIP .pt checkpoint")
    p.add_argument("--prompts_file", type=str, default=None,
                   dest="prompts_file",
                   help="File with one prompt set per line; generates one "
                        "image per line, batched and sharded across devices "
                        "(outputs <stem>_<i>.png)")
    p.add_argument("--profile_dir", type=str, default=None,
                   dest="profile_dir",
                   help="Capture a jax.profiler trace of the optimization "
                        "loop into this directory (xprof / TensorBoard "
                        "profile plugin)")
    p.add_argument("--state", type=str, default=None, dest="state_path",
                   help="Path of an npz resume snapshot: the latent + "
                        "optimizer state is saved here at every "
                        "--save_every checkin (atomic tmp+rename) and on "
                        "completion, and restored at startup when the "
                        "file exists — an interrupted run relaunched "
                        "with the same command continues where it "
                        "stopped, with the identical per-iteration key "
                        "schedule when the same --seed is given (keys "
                        "fold the saved step counter). "
                        "The reference's v2 path has no checkpointing; "
                        "this is an extension (off unless given)")
    p.add_argument("--rng_impl", type=str, default=None,
                   choices=["threefry2x32", "rbg"], dest="rng_impl",
                   help="PRNG impl for the run key (typed keys carry their "
                        "impl through split/fold_in, so this switches every "
                        "in-step draw: cutout geometry, augmentation bits, "
                        "noise). rbg = faster bit generation, deterministic, "
                        "different bitstream; default threefry")
    return p
