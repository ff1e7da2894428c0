"""Evaluation metrics: on-device per-class AUROC + micro-F1, host report.

Reference semantics being matched:
- ``compute_metrics_fn`` (pyc L320-L355): sigmoid(logits) → per-class
  ``roc_auc_score``; a class whose label column is constant yields NaN and is
  excluded; ``avg_auroc`` = mean over valid classes, 0.0 when none valid.
- Version A ``compute_metrics`` (/root/reference/ViT-Training.py:112-118):
  sigmoid → threshold 0.5 → micro-F1 with zero_division=0.
- Version A final report (ViT-Training.py:135-149): sklearn
  ``classification_report`` written to a text file.

The AUROC here is sort-based (Mann-Whitney U with midrank tie handling —
exactly sklearn's trapezoid AUC) and runs fully on device, vmapped over
classes; no sklearn in the hot path. SURVEY.md §7 hard part 4.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# On-device AUROC (sort-based, tie-aware)
# ---------------------------------------------------------------------------

def _auroc_single(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """AUROC for one class via the rank-sum identity with midranks.

    AUC = (Σ ranks(positives) − n⁺(n⁺+1)/2) / (n⁺ n⁻), ranks 1-based with
    tied scores sharing their average rank — equivalent to sklearn's
    trapezoidal ``roc_auc_score``. Returns NaN for degenerate columns
    (reference skips them, pyc L334-L344)."""
    scores = scores.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    n = scores.shape[0]
    sorted_scores = jnp.sort(scores)
    # midranks via binary search over the sorted copy: for score s,
    # rank = (left_index + right_index + 1) / 2 + 0.5  (1-based average)
    lo = jnp.searchsorted(sorted_scores, scores, side="left")
    hi = jnp.searchsorted(sorted_scores, scores, side="right")
    ranks = (lo + hi + 1).astype(jnp.float32) / 2.0  # 1-based midranks
    n_pos = jnp.sum(labels)
    n_neg = n - n_pos
    rank_sum = jnp.sum(ranks * labels)
    auc = (rank_sum - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)
    degenerate = jnp.logical_or(n_pos == 0, n_neg == 0)
    return jnp.where(degenerate, jnp.nan, auc)


@jax.jit
def auroc_per_class(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """[N, C] scores (any monotone of probability — logits work) and
    {0,1} labels → [C] AUROCs with NaN for degenerate classes."""
    return jax.vmap(_auroc_single, in_axes=(1, 1))(scores, labels)


@jax.jit
def avg_auroc(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean AUROC over valid (non-degenerate) classes; 0.0 when none are
    valid — exact ``compute_metrics_fn`` semantics (pyc L349-L353)."""
    per_class = auroc_per_class(scores, labels)
    valid = ~jnp.isnan(per_class)
    total = jnp.sum(jnp.where(valid, per_class, 0.0))
    count = jnp.sum(valid)
    return jnp.where(count > 0, total / count, 0.0)


# ---------------------------------------------------------------------------
# Threshold metrics (on device)
# ---------------------------------------------------------------------------

@jax.jit
def f1_micro(logits: jax.Array, labels: jax.Array,
             threshold: float = 0.5) -> jax.Array:
    """sigmoid → ≥threshold → micro-F1, zero_division=0
    (ViT-Training.py:112-118)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    pred = (probs >= threshold).astype(jnp.float32)
    lab = labels.astype(jnp.float32)
    tp = jnp.sum(pred * lab)
    fp = jnp.sum(pred * (1.0 - lab))
    fn = jnp.sum((1.0 - pred) * lab)
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / denom, 0.0)


@jax.jit
def precision_recall_f1_per_class(logits: jax.Array, labels: jax.Array,
                                  threshold: float = 0.5):
    """Per-class (precision, recall, f1, support) with zero_division=0."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    pred = (probs >= threshold).astype(jnp.float32)
    lab = labels.astype(jnp.float32)
    tp = jnp.sum(pred * lab, axis=0)
    fp = jnp.sum(pred * (1.0 - lab), axis=0)
    fn = jnp.sum((1.0 - pred) * lab, axis=0)
    safe = lambda num, den: jnp.where(den > 0, num / den, 0.0)
    precision = safe(tp, tp + fp)
    recall = safe(tp, tp + fn)
    f1 = safe(2 * precision * recall, precision + recall)
    support = jnp.sum(lab, axis=0)
    return precision, recall, f1, support


def compute_metrics(logits: np.ndarray | jax.Array,
                    labels: np.ndarray | jax.Array,
                    class_names: Optional[Sequence[str]] = None
                    ) -> Dict[str, float]:
    """The rebuild's ``compute_metrics_fn``: avg_auroc + f1_micro together,
    plus per-class AUROCs keyed by name when names are given."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    per_class = np.asarray(auroc_per_class(logits, labels))
    # mean over valid classes on host from the already-computed per-class
    # array (running avg_auroc too would re-sort the whole [N, C] matrix)
    valid = ~np.isnan(per_class)
    out: Dict[str, float] = {
        "avg_auroc": float(per_class[valid].mean()) if valid.any() else 0.0,
        "f1_micro": float(np.asarray(f1_micro(logits, labels))),
    }
    if class_names is not None:
        for name, auc in zip(class_names, per_class):
            out[f"auroc_{name}"] = float(auc)
    return out


def calibrate_thresholds(logits: np.ndarray, labels: np.ndarray
                         ) -> np.ndarray:
    """Per-class decision thresholds maximizing per-class F1 on a held-out
    (validation) set — the principled replacement for the fixed 0.5 the
    reference's report uses (ViT-Training.py:139), which is usually far
    from optimal for imbalanced multi-label targets.

    Exact sweep per class in O(N log N): sort probabilities descending;
    predicting the top-k flips one sample at a time, so
    F1(k) = 2·tp_k / (k + P) with tp_k a cumulative sum. The returned
    threshold is the midpoint between the k-th and (k+1)-th probability.
    Degenerate classes (no positives) keep 0.5.
    """
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))
    lab = np.asarray(labels).astype(np.float64)
    n, c = probs.shape
    out = np.full(c, 0.5)
    for j in range(c):
        pos = lab[:, j].sum()
        if pos == 0 or n == 0:
            continue
        order = np.argsort(-probs[:, j])
        p_sorted = probs[order, j]
        tp = np.cumsum(lab[order, j])
        k = np.arange(1, n + 1)
        # only cuts at tie-block boundaries are realizable by a threshold:
        # a midpoint inside a run of equal probabilities degenerates to the
        # tied value itself, and `>=` then includes the WHOLE block — the
        # realized F1 would differ from the computed one (ties are real:
        # f64 sigmoid saturates to exactly 1.0 for logits ≳ 36.7)
        realizable = np.empty(n, dtype=bool)
        realizable[:-1] = p_sorted[:-1] > p_sorted[1:]
        realizable[-1] = True
        f1 = np.where(realizable, 2.0 * tp / (k + pos), -1.0)
        best = int(np.argmax(f1))
        lo = p_sorted[best]
        hi = p_sorted[best + 1] if best + 1 < n else 0.0
        out[j] = (lo + hi) / 2.0
    return out


# ---------------------------------------------------------------------------
# Host-side classification report (sklearn text-format parity)
# ---------------------------------------------------------------------------

def classification_report(logits: np.ndarray, labels: np.ndarray,
                          class_names: Sequence[str],
                          threshold: "float | np.ndarray" = 0.5) -> str:
    """sklearn-style multilabel classification report text
    (ViT-Training.py:145-148 writes this to final_classification_report.txt).
    Rows: per-class precision/recall/f1/support; footer: micro, macro,
    weighted and samples averages. One prediction array (f64 sigmoid on
    host, like sklearn's caller-side thresholding) feeds every row — mixing
    the jitted f32 sigmoid for per-class rows with f64 for the footer can
    disagree on boundary logits and print an internally inconsistent
    report."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))
    # threshold broadcasts: scalar (reference 0.5) or per-class [C]
    # (calibrate_thresholds output)
    pred = (probs >= np.asarray(threshold)).astype(np.int64)
    lab = np.asarray(labels).astype(np.int64)
    tp_c = (pred * lab).sum(0).astype(np.float64)
    fp_c = (pred * (1 - lab)).sum(0).astype(np.float64)
    fn_c = ((1 - pred) * lab).sum(0).astype(np.float64)
    safe = lambda num, den: np.where(den > 0, num / np.maximum(den, 1), 0.0)
    p = safe(tp_c, tp_c + fp_c)
    r = safe(tp_c, tp_c + fn_c)
    f1 = np.where(p + r > 0, 2 * p * r / np.maximum(p + r, 1e-12), 0.0)
    sup = lab.sum(0)

    name_w = max(len(n) for n in class_names)
    width = max(name_w, len("weighted avg"))
    head = f"{'':>{width}}  precision    recall  f1-score   support\n\n"
    lines = [head]
    for i, name in enumerate(class_names):
        lines.append(f"{name:>{width}}  {p[i]:9.2f} {r[i]:9.2f} {f1[i]:9.2f}"
                     f" {int(sup[i]):9d}\n")
    lines.append("\n")

    tp = float((pred * lab).sum())
    fp = float((pred * (1 - lab)).sum())
    fn = float(((1 - pred) * lab).sum())
    micro_p = tp / (tp + fp) if tp + fp else 0.0
    micro_r = tp / (tp + fn) if tp + fn else 0.0
    micro_f = (2 * micro_p * micro_r / (micro_p + micro_r)
               if micro_p + micro_r else 0.0)
    total = int(sup.sum())
    macro = (p.mean(), r.mean(), f1.mean())
    wsum = sup.sum() if sup.sum() else 1.0
    weighted = ((p * sup).sum() / wsum, (r * sup).sum() / wsum,
                (f1 * sup).sum() / wsum)
    # samples average (sklearn's 4th footer row for multilabel targets)
    inter = (pred & lab).sum(1).astype(np.float64)
    psz = pred.sum(1).astype(np.float64)
    lsz = lab.sum(1).astype(np.float64)
    sp = np.where(psz > 0, inter / np.maximum(psz, 1), 0.0)
    sr = np.where(lsz > 0, inter / np.maximum(lsz, 1), 0.0)
    sf = np.where(sp + sr > 0, 2 * sp * sr / np.maximum(sp + sr, 1e-12), 0.0)

    for tag, (pp, rr, ff) in (("micro avg", (micro_p, micro_r, micro_f)),
                              ("macro avg", macro),
                              ("weighted avg", weighted),
                              ("samples avg", (sp.mean(), sr.mean(),
                                               sf.mean()))):
        lines.append(f"{tag:>{width}}  {pp:9.2f} {rr:9.2f} {ff:9.2f}"
                     f" {total:9d}\n")
    return "".join(lines)


def write_classification_report(path: str, logits: np.ndarray,
                                labels: np.ndarray,
                                class_names: Sequence[str],
                                threshold: "float | np.ndarray" = 0.5
                                ) -> str:
    text = classification_report(logits, labels, class_names, threshold)
    if np.ndim(threshold) > 0:
        text += ("\ncalibrated per-class thresholds: "
                 + ", ".join(f"{n}={t:.3f}"
                             for n, t in zip(class_names,
                                             np.asarray(threshold))) + "\n")
    with open(path, "w") as f:
        f.write(text)
    return text


def f1_micro_at(logits: np.ndarray, labels: np.ndarray,
                threshold: "float | np.ndarray") -> float:
    """Host micro-F1 at a scalar or per-class threshold (f64 sigmoid,
    matching the report's own thresholding)."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))
    pred = (probs >= np.asarray(threshold)).astype(np.int64)
    lab = np.asarray(labels).astype(np.int64)
    tp = float((pred * lab).sum())
    fp = float((pred * (1 - lab)).sum())
    fn = float(((1 - pred) * lab).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0
