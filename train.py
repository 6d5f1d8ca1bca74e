"""Top-level training entry — the ``python train.py`` of the reference
(``/root/reference/train.py:167-169``), delegating to the real CLI:

    python train.py --stage 1 [flags]   # see imagegenerator_tpu/train/cli.py
"""

from imagegenerator_tpu.train.cli import main

if __name__ == "__main__":
    main()
