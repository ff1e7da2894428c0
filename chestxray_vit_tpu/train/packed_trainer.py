"""Packed variable-resolution trainer (BASELINE configs[4], end-to-end).

Subclasses :class:`Trainer` to train over NaViT-style packed sequences:
several variable-resolution images share each ``seq_len``-token sequence,
isolated by segment-masked flash attention; evaluation packs too (a
packed-trained model has no trained CLS token — per-image masked mean
pooling is its readout in both phases).

Notes:
- mid-epoch resume restarts the epoch (packing boundaries are
  content-dependent; the cursor stores the epoch only).
- the global batch is ``batch_seqs`` sequences, sharded on the data axis
  (``batch_seqs`` must be divisible by the data-parallel world size).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax
import numpy as np

from chestxray_vit_tpu.config import Config
from chestxray_vit_tpu.data import packing as pk
from chestxray_vit_tpu.models import packed as packed_model
from chestxray_vit_tpu.parallel import mesh as mesh_lib
from chestxray_vit_tpu.train import steps as S
from chestxray_vit_tpu.train.trainer import Trainer


class PackedTrainer(Trainer):
    def __init__(self, cfg: Config, *, seq_len: int = 1152,
                 grids: Tuple[int, ...] = (16, 24, 32),
                 batch_seqs: int = 8, **kw):
        self.seq_len = seq_len
        self.grids = tuple(grids)
        self.batch_seqs = batch_seqs
        super().__init__(cfg, **kw)
        dp = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        if batch_seqs % dp:
            raise ValueError(f"batch_seqs={batch_seqs} not divisible by "
                             f"data-parallel world size {dp}")
        # ≥1 image per sequence; epoch accounting is approximate (packing
        # density is content-dependent) — use a conservative lower bound
        min_tokens = min(g * g for g in self.grids)
        imgs_per_seq = max(self.seq_len // (min_tokens * 4), 1)
        self.steps_per_epoch = max(
            len(self.bundle.train) // (batch_seqs * imgs_per_seq), 1)

    def _has_full_batch(self) -> bool:
        return len(self.bundle.train) > 0

    def _build_steps(self) -> None:
        self._train_step = S.jit_train_step(
            S.make_packed_train_step(self.cfg, self.total_steps, self.grids),
            self.mesh, self.state)
        self._eval_step = None  # packed eval path below

    # ------------------------------------------------------------------

    def _packed_iter(self, index, epoch: int
                     ) -> Iterator[Dict[str, np.ndarray]]:
        return pk.iterate_packed_batches(
            index, self.bundle.blob_map, self.bundle.store,
            batch_seqs=self.batch_seqs,
            patch=self.cfg.model.patch_size,
            seq_len=self.seq_len, grids=self.grids,
            epoch=epoch, shuffle=True,
            seed=self.cfg.data.shuffle_buffer_seed,
            num_workers=self.cfg.data.num_workers)

    def _train_batches(self, epoch: int, skip: int = 0):
        # packing boundaries are content-dependent → resume restarts epoch
        for i, batch in enumerate(self._packed_iter(self.bundle.train,
                                                    epoch)):
            if batch["tokens"].shape[0] != self.batch_seqs:
                continue   # drop the padded tail batch (static shapes)
            if i < skip:
                continue
            yield mesh_lib.shard_batch(self.mesh, batch)

    # ------------------------------------------------------------------

    def _forward_all(self, index):
        """Packed eval: logits per image via masked mean pooling."""
        if len(index) == 0:
            c = self.cfg.model.num_classes
            return (np.zeros((0, c), np.float32),
                    np.zeros((0, c), np.float32), 0.0)

        if not hasattr(self, "_packed_fwd"):
            self._packed_fwd = jax.jit(
                lambda params, t, s, p, w: packed_model.apply_packed(
                    params, t, s, p, w, self.cfg.model, self.grids))
        fwd = self._packed_fwd

        logits_all, labels_all = [], []
        total_loss, total_n = 0.0, 0
        for batch in pk.iterate_packed_batches(
                index, self.bundle.blob_map, self.bundle.store,
                batch_seqs=self.batch_seqs,
                patch=self.cfg.model.patch_size,
                seq_len=self.seq_len, grids=self.grids,
                epoch=0, shuffle=False,
                num_workers=self.cfg.data.num_workers):
            # pad the tail batch to the static sequence count
            n_seqs = batch["tokens"].shape[0]
            if n_seqs < self.batch_seqs:
                padn = self.batch_seqs - n_seqs

                def pad(k, v):
                    fill = np.zeros_like(v[:1])
                    if k == "segment_ids":
                        fill = np.full_like(v[:1], pk.PAD_SEGMENT)
                    return np.concatenate(
                        [v, np.repeat(fill, padn, axis=0)])

                batch = {k: pad(k, v) for k, v in batch.items()}
            logits = np.asarray(fwd(
                self.state.params,
                jax.numpy.asarray(batch["tokens"]),
                jax.numpy.asarray(batch["segment_ids"]),
                jax.numpy.asarray(batch["pos_indices"]),
                jax.numpy.asarray(batch["pool_weights"])))
            mask = batch["image_mask"]
            got = logits[mask]
            labs = batch["labels"][mask]
            loss = float(packed_model.packed_bce_loss(
                jax.numpy.asarray(logits),
                jax.numpy.asarray(batch["labels"]),
                jax.numpy.asarray(mask)))
            total_loss += loss * got.shape[0]
            total_n += got.shape[0]
            logits_all.append(got)
            labels_all.append(labs)
        return (np.concatenate(logits_all), np.concatenate(labels_all),
                total_loss / max(total_n, 1))
