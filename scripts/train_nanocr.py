"""Train the nanocr glyph MLP and vendor the weights.

Real numpy minibatch SGD over noisy/shifted/contrast-jittered renders
of the 5x7 font (engines/nanocr.py).  Deterministic (seeded), so the
vendored ``nanocr_weights.npz`` is reproducible:

    python scripts/train_nanocr.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from medical_and_charity_document_extraction_system_ray.engines.nanocr import (  # noqa: E402
    WEIGHTS_FILE,
    model_accuracy,
    train_nanocr_weights,
)


def main() -> int:
    w = train_nanocr_weights(seed=0)
    acc = model_accuracy(w, seed=1234)
    np.savez_compressed(WEIGHTS_FILE, **w)
    size = os.path.getsize(WEIGHTS_FILE)
    print(f"held-out accuracy: {acc:.4f}  weights: {WEIGHTS_FILE} ({size} B)")
    return 0 if acc >= 0.97 else 1


if __name__ == "__main__":
    sys.exit(main())
