"""Quality evaluation: CLIPScore + CLIP-Fréchet distance.

The reference has no metric code (see frechet.py); this subpackage
gives the framework a measurable fidelity story for both the v1
sampling CLI and the v2 generator. Entry points:

* ``frechet.FeatureMoments`` / ``frechet.frechet_distance`` — exact
  host-f64 Gaussian fit + Fréchet distance over any feature set.
* ``clip_eval.image_embeddings`` / ``text_embeddings`` /
  ``clip_score`` — jitted CLIP towers as the feature extractor.
* ``cli.main`` — ``python evaluate.py`` (root wrapper).
"""

from imagegenerator_tpu.eval.clip_eval import (  # noqa: F401
    clip_score,
    image_embeddings,
    text_embeddings,
)
from imagegenerator_tpu.eval.frechet import (  # noqa: F401
    FeatureMoments,
    frechet_distance,
    gaussian_stats,
)
