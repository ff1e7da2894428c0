"""Batched inference / serving path (BASELINE.json configs[3]).

The reference has no serving path (training script only); this module adds
one: a jit-compiled predictor with fused on-device preprocessing (raw u8
canvases + crop boxes in, per-class probabilities out), static-shape
micro-batching with tail padding, and optional attention-rollout /
Grad-CAM maps per request.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from chestxray_vit_tpu.config import Config, ModelConfig
from chestxray_vit_tpu.data import decode as dec
from chestxray_vit_tpu.data import geometry as geo
from chestxray_vit_tpu.models import vit
from chestxray_vit_tpu.ops.preprocess import fused_preprocess
from chestxray_vit_tpu.serve import attention_maps as am
from chestxray_vit_tpu.train.checkpoint import load_model


@dataclass
class PredictOutput:
    probs: np.ndarray                       # [N, C]
    logits: np.ndarray                      # [N, C]
    classes: Optional[List[str]] = None
    maps: Optional[np.ndarray] = None       # [N, g, g] when requested


class Predictor:
    """Serving wrapper around a trained model.

    ``from_model_dir`` loads a Trainer ``save_model()`` export; inputs are
    raw image bytes (PNG/JPEG) — decode happens on host threads, everything
    from the u8 canvas onward (crop/pad/resize/normalize/ViT) is one
    compiled device program per micro-batch shape.
    """

    def __init__(self, params, cfg: ModelConfig,
                 classes: Optional[Sequence[str]] = None,
                 batch_size: int = 8, canvas_size: int = 1024):
        self.params = params
        self.cfg = cfg
        self.classes = list(classes) if classes else None
        self.batch_size = batch_size
        self.canvas_size = canvas_size

        def forward(params, canvases, boxes):
            images = fused_preprocess(canvases, boxes,
                                      out_size=cfg.img_size,
                                      dtype=jnp.dtype(cfg.dtype))
            logits = vit.apply(params, images, cfg)
            return logits, jax.nn.sigmoid(logits)

        self._forward = jax.jit(forward)

        def forward_rollout(params, canvases, boxes):
            images = fused_preprocess(canvases, boxes,
                                      out_size=cfg.img_size,
                                      dtype=jnp.dtype(cfg.dtype))
            logits, maps = am.compute_rollout(params, images, cfg)
            return logits, jax.nn.sigmoid(logits), maps

        self._forward_rollout = jax.jit(forward_rollout)

    @classmethod
    def from_model_dir(cls, directory: str, batch_size: int = 8
                       ) -> "Predictor":
        with open(os.path.join(os.path.expanduser(directory),
                               "config.json")) as f:
            cfg = Config.from_json(f.read())
        template = vit.init_params(jax.random.key(0), cfg.model)
        params, classes = load_model(directory, template)
        return cls(params, cfg.model, classes, batch_size)

    # ------------------------------------------------------------------

    def _stage(self, images_bytes: Sequence[bytes]):
        """bytes → (canvases u8 [n, C, C], boxes i32 [n, 4])."""
        c = self.canvas_size
        canvases = np.zeros((len(images_bytes), c, c), np.uint8)
        boxes = np.zeros((len(images_bytes), 4), np.int32)
        for i, data in enumerate(images_bytes):
            gray = dec.safe_decode_gray(data, dummy_size=(c, c))
            h, w = min(gray.shape[0], c), min(gray.shape[1], c)
            canvases[i, :h, :w] = gray[:h, :w]
            box = geo.full_image_box(w, h)
            boxes[i] = (box.left, box.top, box.width, box.height)
        return canvases, boxes

    def predict_bytes(self, images_bytes: Sequence[bytes],
                      with_maps: bool = False) -> PredictOutput:
        """Micro-batched inference over raw encoded images."""
        n = len(images_bytes)
        bs = self.batch_size
        logits_out, probs_out, maps_out = [], [], []
        for lo in range(0, n, bs):
            chunk = list(images_bytes[lo:lo + bs])
            valid = len(chunk)
            while len(chunk) < bs:       # static-shape tail padding
                chunk.append(chunk[-1])
            canvases, boxes = self._stage(chunk)
            if with_maps:
                logits, probs, maps = self._forward_rollout(
                    self.params, jnp.asarray(canvases), jnp.asarray(boxes))
                maps_out.append(np.asarray(maps)[:valid])
            else:
                logits, probs = self._forward(
                    self.params, jnp.asarray(canvases), jnp.asarray(boxes))
            logits_out.append(np.asarray(logits)[:valid])
            probs_out.append(np.asarray(probs)[:valid])
        return PredictOutput(
            probs=np.concatenate(probs_out),
            logits=np.concatenate(logits_out),
            classes=self.classes,
            maps=np.concatenate(maps_out) if maps_out else None,
        )

    def predict_arrays(self, grays: Sequence[np.ndarray]) -> PredictOutput:
        """Inference over already-decoded u8 grayscale arrays."""
        import io
        from PIL import Image
        blobs = []
        for g in grays:
            buf = io.BytesIO()
            Image.fromarray(g, "L").save(buf, format="PNG")
            blobs.append(buf.getvalue())
        return self.predict_bytes(blobs)

    def top_findings(self, probs_row: np.ndarray, k: int = 5
                     ) -> List[Dict[str, float]]:
        order = np.argsort(probs_row)[::-1][:k]
        return [{"label": (self.classes[i] if self.classes else str(i)),
                 "probability": float(probs_row[i])} for i in order]
