"""Top-level evaluation entry (CLIPScore / CLIP-Fréchet distance):

    python evaluate.py --samples samples/ --captions "a red bus" [...]

See imagegenerator_tpu/eval/cli.py for the full flag surface.
"""

from imagegenerator_tpu.eval.cli import main

if __name__ == "__main__":
    main()
