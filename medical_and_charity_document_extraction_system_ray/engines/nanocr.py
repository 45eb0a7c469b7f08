"""nanocr — a REAL (trained) neural text recognizer for the actor pool.

The easyocr/paddle adapters (``external.py``) follow the reference's
product path (``backend/app/core/ocr_engines/easyocr_engine.py:20-47``)
but their backing libraries are not installable in this container, so
until now only FAKED modules ever flowed through the engine machinery.
This module closes that gap with a genuinely learned model:

- a fixed-pitch 5x7 glyph renderer (the reference's own test recipe —
  render known text onto a white ndarray, add Gaussian noise:
  ``scripts/test_preprocessing.py:22-49``),
- a one-hidden-layer softmax MLP trained by real numpy minibatch SGD
  over noisy, shifted, contrast-jittered glyph samples
  (``scripts/train_nanocr.py`` → vendored ``nanocr_weights.npz``),
- an engine class honoring the full BaseOCREngine contract: weights
  loaded once in ``initialize`` (the warm actor state), per-image
  inference is ONE matmul over all glyph patches, word boxes +
  per-word confidences from the softmax probabilities.

Recognition here is statistical (the model can misread a noisy glyph
— confidences are real posteriors, not pinned 100), unlike the band
codec, which is exact by construction.  That makes nanocr the honest
stand-in for a production recognizer: same adapter surface, same
actor-pool lifecycle, learned weights, probabilistic output.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from .base import BaseOCREngine, EngineUnavailableError

# ---------------------------------------------------------------------------
# 5x7 fixed-pitch glyph font (A-Z 0-9; anything else renders as space)
# ---------------------------------------------------------------------------

_FONT_ROWS = {
    "A": [".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "B": ["####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."],
    "C": [".####", "#....", "#....", "#....", "#....", "#....", ".####"],
    "D": ["####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."],
    "E": ["#####", "#....", "#....", "####.", "#....", "#....", "#####"],
    "F": ["#####", "#....", "#....", "####.", "#....", "#....", "#...."],
    "G": [".####", "#....", "#....", "#.###", "#...#", "#...#", ".###."],
    "H": ["#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"],
    "I": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "J": ["..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."],
    "K": ["#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"],
    "L": ["#....", "#....", "#....", "#....", "#....", "#....", "#####"],
    "M": ["#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"],
    "N": ["#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"],
    "O": [".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "P": ["####.", "#...#", "#...#", "####.", "#....", "#....", "#...."],
    "Q": [".###.", "#...#", "#...#", "#...#", "#...#", "#..#.", ".##.#"],
    "R": ["####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"],
    "S": [".####", "#....", "#....", ".###.", "....#", "....#", "####."],
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "V": ["#...#", "#...#", "#...#", "#...#", ".#.#.", ".#.#.", "..#.."],
    "W": ["#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"],
    "X": ["#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"],
    "Y": ["#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."],
    "Z": ["#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"],
    "0": [".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."],
    "1": ["..#..", ".##..", "..#..", "..#..", "..#..", "..#..", "#####"],
    "2": [".###.", "#...#", "....#", "..##.", ".#...", "#....", "#####"],
    "3": ["#####", "....#", "...#.", "..##.", "....#", "#...#", ".###."],
    "4": ["...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."],
    "5": ["#####", "#....", "####.", "....#", "....#", "#...#", ".###."],
    "6": [".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."],
    "7": ["#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."],
    "8": [".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."],
    "9": [".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."],
}

CHARSET = "".join(sorted(_FONT_ROWS))  # classifier classes, stable order
GW, GH = 5, 7           # font glyph size
SCALE = 2               # rendered px per font px
ADV_X = (GW + 1) * SCALE   # horizontal advance (1 font px spacing)
ADV_Y = (GH + 1) * SCALE   # line advance
MARGIN = 8
PATCH_W, PATCH_H = GW * SCALE, GH * SCALE

_GLYPHS = {
    ch: np.array(
        [[c == "#" for c in row] for row in rows], dtype=bool
    ).repeat(SCALE, axis=0).repeat(SCALE, axis=1)
    for ch, rows in _FONT_ROWS.items()
}

WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "nanocr_weights.npz")


def render_text_image(
    text: str,
    *,
    noise_sigma: float = 0.0,
    seed: int = 0,
    wrap: int = 24,
) -> np.ndarray:
    """Render ``text`` (uppercased; unknown chars -> space) as a white
    grayscale page with fixed-pitch glyphs + optional Gaussian noise —
    the reference's known-text synthesis recipe."""
    lines: list[str] = []
    for raw in text.upper().splitlines() or [""]:
        raw = "".join(c if c in _GLYPHS or c == " " else " " for c in raw)
        while len(raw) > wrap:
            lines.append(raw[:wrap])
            raw = raw[wrap:]
        lines.append(raw)
    ncols = max((len(ln) for ln in lines), default=0) or 1
    h = 2 * MARGIN + len(lines) * ADV_Y - SCALE
    w = 2 * MARGIN + ncols * ADV_X - SCALE
    img = np.full((h, w), 255, dtype=np.float64)
    for r, ln in enumerate(lines):
        for c, ch in enumerate(ln):
            g = _GLYPHS.get(ch)
            if g is None:
                continue
            y, x = MARGIN + r * ADV_Y, MARGIN + c * ADV_X
            img[y : y + PATCH_H, x : x + PATCH_W][g] = 0
    if noise_sigma > 0:
        rng = np.random.default_rng(seed)
        img = img + rng.normal(0.0, noise_sigma, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Training (real numpy SGD; invoked by scripts/train_nanocr.py)
# ---------------------------------------------------------------------------

def _sample_batch(rng, n_per_class: int):
    """Noisy/shifted/contrast-jittered glyph patches + labels."""
    xs, ys = [], []
    for label, ch in enumerate(CHARSET):
        g = _GLYPHS[ch].astype(np.float64)
        base = 255.0 * (1.0 - g)
        for _ in range(n_per_class):
            # ±1 px alignment jitter (every glyph has ink in font row 0
            # and col 0, so the engine's bbox alignment is exact up to
            # rounding) + noise + brightness/contrast jitter
            dy, dx = rng.integers(-1, 2, size=2)
            pad = np.full((PATCH_H + 4, PATCH_W + 4), 255.0)
            pad[2 + dy : 2 + dy + PATCH_H, 2 + dx : 2 + dx + PATCH_W] = base
            patch = pad[2 : 2 + PATCH_H, 2 : 2 + PATCH_W]
            patch = patch * rng.uniform(0.75, 1.05) + rng.uniform(-20, 20)
            patch = patch + rng.normal(0, rng.uniform(3, 28), patch.shape)
            xs.append(np.clip(patch, 0, 255))
            ys.append(label)
    x = np.stack(xs).reshape(len(xs), -1)
    return _normalize(x), np.array(ys)


def _normalize(x: np.ndarray) -> np.ndarray:
    """Per-patch standardization: removes the brightness/contrast
    nuisance dimensions entirely (the preprocess chain may rescale
    intensities arbitrarily before the engine sees the page)."""
    mu = x.mean(axis=1, keepdims=True)
    sd = x.std(axis=1, keepdims=True)
    return (x - mu) / (sd + 1e-6)


def train_nanocr_weights(
    seed: int = 0,
    n_per_class: int = 400,
    hidden: int = 64,
    epochs: int = 30,
    lr: float = 0.15,
    batch: int = 128,
) -> dict[str, np.ndarray]:
    """One-hidden-layer ReLU MLP + softmax, minibatch SGD, numpy only."""
    rng = np.random.default_rng(seed)
    x, y = _sample_batch(rng, n_per_class)
    n, d = x.shape
    k = len(CHARSET)
    w1 = rng.normal(0, np.sqrt(2.0 / d), (d, hidden))
    b1 = np.zeros(hidden)
    w2 = rng.normal(0, np.sqrt(2.0 / hidden), (hidden, k))
    b2 = np.zeros(k)
    onehot = np.eye(k)[y]
    for _ in range(epochs):
        perm = rng.permutation(n)
        for s in range(0, n, batch):
            idx = perm[s : s + batch]
            xb, yb = x[idx], onehot[idx]
            h1 = np.maximum(x[idx] @ w1 + b1, 0.0)
            logits = h1 @ w2 + b2
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            p = e / e.sum(axis=1, keepdims=True)
            g2 = (p - yb) / len(idx)
            gw2, gb2 = h1.T @ g2, g2.sum(axis=0)
            gh1 = (g2 @ w2.T) * (h1 > 0)
            gw1, gb1 = xb.T @ gh1, gh1.sum(axis=0)
            w2 -= lr * gw2
            b2 -= lr * gb2
            w1 -= lr * gw1
            b1 -= lr * gb1
    return {
        "w1": w1.astype(np.float32),
        "b1": b1.astype(np.float32),
        "w2": w2.astype(np.float32),
        "b2": b2.astype(np.float32),
    }


def model_accuracy(weights: dict, seed: int = 1234, n_per_class: int = 50) -> float:
    """Held-out accuracy on freshly sampled noisy glyphs."""
    rng = np.random.default_rng(seed)
    x, y = _sample_batch(rng, n_per_class)
    p = _forward(x, weights)
    return float((p.argmax(axis=1) == y).mean())


def _forward(x: np.ndarray, w: dict) -> np.ndarray:
    h1 = np.maximum(x @ w["w1"] + w["b1"], 0.0)
    logits = h1 @ w["w2"] + w["b2"]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------

class NanOCREngine(BaseOCREngine):
    """Fixed-pitch neural recognizer over the vendored trained weights.

    Warm state = the weight matrices, loaded once in ``initialize``
    (per actor); per image, glyph patches are segmented off the ink
    bounding box of each text line and classified in ONE matmul."""

    engine_name = "nanocr"

    def __init__(self, language: str = "eng", weights_path: str | None = None):
        super().__init__(language=language)
        self._weights_path = weights_path or WEIGHTS_FILE
        self._w: dict[str, np.ndarray] | None = None

    def initialize(self) -> None:
        if self._w is not None:
            return
        if not os.path.exists(self._weights_path):
            raise EngineUnavailableError(
                f"nanocr weights not found at {self._weights_path}; "
                "run scripts/train_nanocr.py"
            )
        npz = np.load(self._weights_path)
        self._w = {k: npz[k].astype(np.float64) for k in ("w1", "b1", "w2", "b2")}
        self._initialized = True

    # -- inference ----------------------------------------------------

    def process_image(self, image: np.ndarray) -> dict[str, Any]:
        self.initialize()
        img = np.asarray(image, dtype=np.float64)
        if img.ndim == 3:
            img = img.mean(axis=2)
        ink = img < 128
        if not ink.any():
            return self.format_output("", 0.0, [])
        # >=2 ink px per row/col: a real stroke is >=SCALE px wide, so
        # isolated salt noise never corrupts the bbox alignment
        rows_ink = np.flatnonzero(ink.sum(axis=1) >= 2)
        if rows_ink.size == 0:
            return self.format_output("", 0.0, [])
        # line segmentation: blank-row runs split text lines
        brk = np.flatnonzero(np.diff(rows_ink) > SCALE)
        line_bounds = zip(
            np.concatenate([[0], brk + 1]), np.concatenate([brk, [rows_ink.size - 1]])
        )
        out_lines: list[str] = []
        words: list[dict[str, Any]] = []
        confs: list[float] = []
        for ls, le in line_bounds:
            y0, y1 = int(rows_ink[ls]), int(rows_ink[le]) + 1
            strip = img[y0:y1]
            sink = strip < 128
            cols_ink = np.flatnonzero(sink.sum(axis=0) >= 2)
            if cols_ink.size == 0:
                continue
            x0 = int(cols_ink[0])
            ncells = max(1, int(round((cols_ink[-1] + 1 - x0 + SCALE) / ADV_X)))
            patches = np.full((ncells, PATCH_H, PATCH_W), 255.0)
            for c in range(ncells):
                xs = x0 + c * ADV_X
                p = img[y0 : y0 + PATCH_H, xs : xs + PATCH_W]
                patches[c, : p.shape[0], : p.shape[1]] = p
            flat = _normalize(patches.reshape(ncells, -1))
            probs = _forward(flat, self._w)
            labels = probs.argmax(axis=1)
            conf = probs[np.arange(ncells), labels]
            # blank cells (no ink) are spaces, not the model's best guess
            is_space = (patches < 128).mean(axis=(1, 2)) < 0.02
            chars = [
                " " if sp else CHARSET[la] for sp, la in zip(is_space, labels)
            ]
            line = "".join(chars).rstrip()
            out_lines.append(line)
            # word boxes: split on space cells
            c = 0
            while c < len(line):
                if line[c] == " ":
                    c += 1
                    continue
                e = c
                while e < len(line) and line[e] != " ":
                    e += 1
                wconf = float(conf[c:e].mean() * 100.0)
                words.append(
                    {
                        "text": line[c:e],
                        "confidence": wconf,
                        "bbox": {
                            "left": int(x0 + c * ADV_X),
                            "top": int(y0),
                            "width": int((e - c) * ADV_X - SCALE),
                            "height": int(PATCH_H),
                        },
                        "block_num": 0,
                        "line_num": len(out_lines) - 1,
                        "word_num": sum(
                            1 for w_ in words if w_["line_num"] == len(out_lines) - 1
                        ),
                    }
                )
                confs.append(wconf)
                c = e
        text = "\n".join(out_lines).rstrip()
        avg = round(sum(confs) / len(confs), 2) if confs else 0.0
        return self.format_output(text, avg, words, model="mlp-5x7")
