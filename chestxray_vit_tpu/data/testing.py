"""Synthetic NIH ChestX-ray14 bucket fixture.

Generates the exact bucket layout the reference consumes (SURVEY §4:
``images_001..012/images/*.png``, the two CSVs, the two list files —
pyc L64-L70, L222-L228) into a :class:`MemoryStore`, so integration tests
and smoke fine-tunes run with zero network. Images are deterministic
per-name grayscale PNGs with class-correlated structure so a tiny model can
actually learn from them.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from chestxray_vit_tpu.config import NIH_CLASSES
from chestxray_vit_tpu.data.storage import MemoryStore

PATHOLOGIES: Tuple[str, ...] = tuple(
    c for c in NIH_CLASSES if c != "No Finding")


@dataclass
class FakeNIH:
    store: MemoryStore
    image_names: List[str]
    labels_by_name: Dict[str, List[str]]
    bboxes_by_name: Dict[str, Tuple[float, float, float, float]] = field(
        default_factory=dict)


def _png_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    return buf.getvalue()


def _render_image(rng: np.random.Generator, labels: Sequence[str],
                  size: int) -> np.ndarray:
    """Noise background + one bright block per pathology at a class-specific
    position — learnable signal, deterministic given the rng."""
    img = rng.integers(20, 60, (size, size), dtype=np.uint8) \
        if size else np.zeros((0, 0), np.uint8)
    n = len(PATHOLOGIES)
    for lab in labels:
        if lab == "No Finding":
            continue
        k = PATHOLOGIES.index(lab)
        cell = max(size // n, 4)
        y = (k * cell) % max(size - cell, 1)
        x = ((k * 37) % n) * cell % max(size - cell, 1)
        img[y:y + cell, x:x + cell] = 220
    return img


def build_fake_nih(
    num_images: int = 64,
    image_size: int = 64,
    num_test: Optional[int] = None,
    bbox_fraction: float = 0.25,
    seed: int = 0,
    classes: Sequence[str] = PATHOLOGIES,
) -> FakeNIH:
    """Create the full synthetic bucket. ~num_test names (default 20%) land
    in test_list.txt, the rest in train_val_list.txt."""
    rng = np.random.default_rng(seed)
    store = MemoryStore()
    names: List[str] = []
    labels_by_name: Dict[str, List[str]] = {}
    bboxes_by_name: Dict[str, Tuple[float, float, float, float]] = {}

    entry_rows = ["Image Index,Finding Labels,Follow-up #,Patient ID"]
    bbox_rows = ["Image Index,Finding Label,Bbox [x,y,w,h],,"]

    for i in range(num_images):
        name = f"{i:08d}_000.png"
        names.append(name)
        if i < len(classes):
            # guarantee every pathology occurs → the derived vocabulary is
            # always the full class set (NUM_CLASSES is data-derived in the
            # reference, pyc L174)
            labels = [classes[i]]
        elif rng.random() < 0.3:
            labels = ["No Finding"]
        else:
            k = int(rng.integers(1, 3))
            labels = sorted(rng.choice(classes, size=k, replace=False))
        labels_by_name[name] = list(labels)
        img = _render_image(rng, labels, image_size)
        folder = (i % 12) + 1
        store.put(f"images_{folder:03d}/images/{name}", _png_bytes(img))
        entry_rows.append(f"{name},{'|'.join(labels)},{i},{i}")
        if labels != ["No Finding"] and rng.random() < bbox_fraction:
            side = image_size // 3
            x = float(rng.integers(0, image_size - side))
            y = float(rng.integers(0, image_size - side))
            bboxes_by_name[name] = (x, y, float(side), float(side))
            bbox_rows.append(f"{name},{labels[0]},{x},{y},{side},{side},,")

    n_test = num_test if num_test is not None else max(num_images // 5, 1)
    test_names = names[-n_test:]
    train_val_names = names[:-n_test]

    store.put("Data_Entry_2017.csv", "\n".join(entry_rows).encode())
    store.put("BBox_List_2017.csv", "\n".join(bbox_rows).encode())
    store.put("train_val_list.txt", "\n".join(train_val_names).encode())
    store.put("test_list.txt", "\n".join(test_names).encode())

    return FakeNIH(store=store, image_names=names,
                   labels_by_name=labels_by_name,
                   bboxes_by_name=bboxes_by_name)
