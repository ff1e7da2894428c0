"""CI gate at the recommended token-merging budget (VERDICT r4 next #1
done-criterion: "a CI gate at the recommended budget, not just r=2").

These tests pin the CONCLUSIONS of BENCH_NOTES "Round 5: convergence-level
quality A/B" against the committed chip-measured data in
BENCH_QUALITY_AB.jsonl, and tie the shipped `fast_finetune` preset to the
budget that data recommends. If cells are re-run and the data stops
supporting the documented bands, or the preset drifts away from the
measured recommendation, CI fails — notes, data, and defaults must move
together.

Reference capability matched: a fine-tune whose point is the AUC it
reaches (ViT-Training.py:132, pyc:L320-L355) — a throughput recipe is
only shippable with a quality bound attached.
"""

import json
import os

import pytest

from chestxray_vit_tpu.config import _PRESETS

_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                     "BENCH_QUALITY_AB.jsonl")


def _cells():
    rows = []
    with open(_PATH) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    # The A/B science band: the hard task at ViT-B depth. Other rows
    # (depth probes at layers!=12, easier contrasts, dense-warmup
    # treatment cells) have their own gates.
    return [r for r in rows
            if r.get("layers") == 12 and r.get("contrast") == 80
            and not r.get("tome_warmup")]


@pytest.fixture(scope="module")
def cells():
    rows = _cells()
    assert rows, "BENCH_QUALITY_AB.jsonl missing or has no 12-layer " \
                 "contrast=80 cells"
    return rows


def _best(cells, **match):
    out = [c for c in cells
           if all(c.get(k) == v for k, v in match.items())]
    assert out, f"no quality cell matches {match}"
    return out


def test_required_cells_present(cells):
    """The documented table's cells all exist in the committed data."""
    need = [
        dict(cell="dense", steps=2400),
        dict(tome_r=8, schedule="constant", steps=2400),
        dict(tome_r=8, schedule="decreasing", steps=2400),
        dict(tome_r=16, schedule="constant", steps=2400),
        dict(tome_r=16, schedule="decreasing", steps=2400),
        dict(tome_r=32, schedule="constant", steps=2400),
        dict(tome_r=32, schedule="decreasing", steps=2400),
        dict(tome_r=48, schedule="decreasing", steps=2400),
        # extended-steps plateau bounds
        dict(cell="dense", steps=4800),
        dict(tome_r=16, schedule="decreasing", steps=4800),
        dict(tome_r=32, schedule="decreasing", steps=4800),
    ]
    for m in need:
        _best(cells, **m)


def test_dense_plateau_band(cells):
    """Dense converges on the hard task in its sharp-takeoff mode
    (>=0.985 best avg_auroc on inits 0/1) — the anchor all merged
    deltas are read against. The queue-J init-2 anchor showed dense is
    ALSO init-sensitive (takeoff ~2100, best 0.821 at 2400 steps,
    still rising — while the SAME init's merged runs reach 0.94): the
    takeoff bimodality is a property of the task's optimization, not
    of merging alone. Gate both facts."""
    dense = _best(cells, tome_r=0)
    assert max(c["best_auroc"] for c in dense) >= 0.985, dense
    sharp = [c for c in dense if c.get("init_seed", 0) in (0, 1)]
    for c in sharp:
        assert c["best_auroc"] >= 0.985, c
    late = [c for c in dense if c.get("init_seed") == 2]
    if late:  # the dense bad mode persists in the data
        assert min(c["best_auroc"] for c in late) < 0.92, late


def test_headline_budgets_learning_floor_and_init_sensitivity(cells):
    """The decreasing-schedule headline budgets (r=16 and r=32): every
    cell must learn well past the 0.74 easy-class floor (>=0.79 best),
    and the measured init-sensitivity (>=5 pt spread across cells at
    each budget) must persist in the data — it is the documented reason
    merged training is a throughput tool, not the final-model default.
    If new cells erase the spread, the guidance in BENCH_NOTES/README
    ('init-sensitive at every headline budget') is stale and must be
    revisited WITH the preset."""
    for r in (16, 32):
        best = [c["best_auroc"]
                for c in _best(cells, tome_r=r, schedule="decreasing")]
        assert all(b >= 0.79 for b in best), (r, best)
        assert max(best) >= 0.92, (r, best)   # the good mode exists
        if len(best) >= 3:
            assert max(best) - min(best) >= 0.05, (
                f"r{r}-dec cells now agree within 5 pts — the "
                "init-sensitivity warning is stale", best)


def test_decreasing_schedule_is_a_quality_lever(cells):
    """At the headline budgets the decreasing schedule must beat constant
    by >=5 pts at equal steps (BENCH_NOTES finding #3)."""
    for r in (16, 32):
        dec = max(c["best_auroc"] for c in _best(
            cells, tome_r=r, schedule="decreasing", steps=2400))
        const = max(c["best_auroc"] for c in _best(
            cells, tome_r=r, schedule="constant", steps=2400))
        assert dec - const >= 0.05, (r, dec, const)


def test_gap_lives_in_the_weights_not_the_eval(cells):
    """Merged-eval vs dense-eval of the SAME trained weights agree within
    2.5 pts wherever both tracks were recorded (BENCH_NOTES finding #1:
    'train merged, serve dense' does not recover dense quality)."""
    tracked = [c for c in cells if "best_dense_auroc" in c]
    assert tracked, "no cells carry the dense-eval track"
    for c in tracked:
        assert abs(c["best_auroc"] - c["best_dense_auroc"]) <= 0.025, c


def _warmup_cells():
    rows = []
    with open(_PATH) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return [r for r in rows
            if r.get("layers") == 12 and r.get("contrast") == 80
            and r.get("tome_warmup")]


def test_dense_warmup_rescues_the_bad_init():
    """The dense-warmup treatment (train.tome_warmup — BENCH_NOTES
    'Dense-warmup rescue'): on the bad-mode init (r32_dec init_seed=1,
    which flattens at ~0.82 without warmup), warming up dense through
    the takeoff window must recover to >=0.95 best avg_auroc and beat
    the no-warmup run by >=10 pts. This is the measured basis for the
    tome_warmup knob's documentation; if re-run cells stop supporting
    it, knob docs and guidance must move together."""
    warm = [c for c in _warmup_cells()
            if c["tome_r"] == 32 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 1]
    assert warm, "the rescue cell is missing from BENCH_QUALITY_AB.jsonl"
    base = [c for c in _cells()
            if c["tome_r"] == 32 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 1 and c["steps"] == 2400]
    assert base, "the no-warmup bad-init anchor cell is missing"
    best_warm = max(c["best_auroc"] for c in warm)
    best_base = max(c["best_auroc"] for c in base)
    assert best_warm >= 0.95, best_warm
    assert best_warm - best_base >= 0.10, (best_warm, best_base)


def test_dense_warmup_does_not_cost_the_good_init():
    """Warmup on the GOOD init (r32_dec init_seed=0, 0.9503 without
    warmup) must not cost quality — measured it LIFTS the good mode to
    dense parity (0.9967 vs dense anchors 0.992–0.996, BENCH_NOTES
    'Dense-warmup rescue'). Gate: the warmup cell beats its no-warmup
    counterpart and clears 0.98."""
    warm = [c for c in _warmup_cells()
            if c["tome_r"] == 32 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 0]
    assert warm, "the good-init warmup cell is missing"
    base = [c for c in _cells()
            if c["tome_r"] == 32 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 0 and c["steps"] == 2400]
    assert base, "the no-warmup good-init anchor cell is missing"
    best_warm = max(c["best_auroc"] for c in warm)
    best_base = max(c["best_auroc"] for c in base)
    assert best_warm >= 0.98, best_warm
    assert best_warm >= best_base, (best_warm, best_base)


def test_dense_warmup_rescues_the_preset_budget():
    """The rescue must hold at the budget the preset ships (r=16): on
    the bad-mode init (r16_dec init_seed=1 flattened at 0.8174 without
    warmup), the warmup cell must reach dense-parity territory
    (>=0.98) and beat the no-warmup run by >=10 pts (measured 0.9919,
    BENCH_NOTES 'Dense-warmup rescue'). This is the measured basis for
    fast_finetune shipping tome_warmup."""
    warm = [c for c in _warmup_cells()
            if c["tome_r"] == 16 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 1]
    assert warm, "the r16 rescue cell is missing"
    base = [c for c in _cells()
            if c["tome_r"] == 16 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 1 and c["steps"] == 2400]
    assert base, "the no-warmup r16 bad-init anchor cell is missing"
    best_warm = max(c["best_auroc"] for c in warm)
    best_base = max(c["best_auroc"] for c in base)
    assert best_warm >= 0.98, best_warm
    assert best_warm - best_base >= 0.10, (best_warm, best_base)


def test_dense_warmup_can_miss_a_late_takeoff():
    """The warmup's second measured caveat (BENCH_NOTES 'Third-init
    caveat'), unified with the depth caveat into one rule: the warmup
    inherits whatever mode DENSE is in. On init_seed=2 dense itself is
    slow (takeoff ~2100, ~0.82 at 2400 steps) while the same init's
    no-warmup merged runs are in the good mode (>=0.92) — and the
    warmup floors the merged run at EVERY tested W (900 and 1500), so
    'retry with a larger W' is a measured no-go: the docs say to
    restart a post-switch floor WITHOUT the warmup. If re-run cells
    erase any leg of this, that guidance must move with the data."""
    miss = [c for c in _warmup_cells()
            if c["tome_r"] == 16 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 2]
    assert len({c["tome_warmup"] for c in miss}) >= 2, \
        "need the init-2 miss at two warmup sizes (900 and 1500)"
    base = [c for c in _cells()
            if c["tome_r"] == 16 and c["schedule"] == "decreasing"
            and c.get("init_seed") == 2 and c["steps"] == 2400]
    assert base, "the init-2 no-warmup anchor cell is missing"
    dense = [c for c in _cells()
             if c["tome_r"] == 0 and c.get("init_seed") == 2
             and c["steps"] == 2400]
    assert dense, "the init-2 dense anchor cell is missing"
    best_base = max(c["best_auroc"] for c in base)
    best_dense = max(c["best_auroc"] for c in dense)
    # the same init learns well merged without warmup...
    assert best_base >= 0.92, best_base
    # ...dense itself is in its slow mode (well under its sharp-mode
    # 0.985 band at equal steps)...
    assert best_dense < 0.92, best_dense
    # ...and EVERY warmup size floors the merged run: pure merged >
    # pure dense > any warmup on a dense-slow init
    for c in miss:
        assert c["best_auroc"] <= 0.80, c
        assert c["best_auroc"] < best_dense, c


def test_dense_warmup_is_not_a_depth_fix():
    """The warmup's measured precondition (BENCH_NOTES 'Depth caveat'):
    it inherits whatever mode DENSE is in. At 24 layers on the too-hot
    lr=1e-3 — where dense itself floors (0.746) and no-warmup merged
    escapes (r8_dec 0.930) — adding the warmup DRAGS the merged run
    toward the dense trajectory (measured 0.850, 8 pts below no-warmup
    merged). Gate: the 24-layer warmup cell must sit >=0.05 below the
    best no-warmup merged 24-layer cell at the same lr; if re-run data
    erases that, the 'tune lr first' guidance in README/MIGRATION is
    stale and must move with it."""
    rows = []
    with open(_PATH) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    deep = [r for r in rows if r.get("layers") == 24 and r["lr"] == 1e-3]
    warm = [r for r in deep if r.get("tome_warmup")]
    base = [r for r in deep if not r.get("tome_warmup") and r["tome_r"] > 0]
    dense = [r for r in deep if r["tome_r"] == 0]
    assert warm and base and dense, "24-layer caveat cells missing"
    best_warm = max(r["best_auroc"] for r in warm)
    best_base = max(r["best_auroc"] for r in base)
    best_dense = max(r["best_auroc"] for r in dense)
    # dense is the floored mode at this lr; warmup lands between dense
    # and no-warmup merged — i.e. it transfers, not fixes, the pathology
    assert best_dense < 0.80, best_dense
    assert best_warm > best_dense, (best_warm, best_dense)
    assert best_base - best_warm >= 0.05, (best_base, best_warm)


def test_preset_matches_measured_recommendation(cells):
    """fast_finetune ships the full measured recipe: the budget must use
    the decreasing schedule (constant is a measured quality no-go), its
    best-case mode must exist (>=0.92 in some cell), its floor must
    clear the learning bar (>=0.79 in every cell), and among budgets
    tied on those counts the preset takes the SMALLEST (least
    information discarded at equal measured risk — BENCH_NOTES
    'Recommendation'). Today: r=16. And because every no-warmup budget
    is init-sensitive (>=5 pt spread), the preset must also carry a
    dense warmup — the measured rescue (BENCH_NOTES 'Dense-warmup
    rescue': within 1.8 pts of dense on every measured rescue cell,
    including the r16 bad init 0.8174 -> 0.9919)."""
    cfg = _PRESETS["fast_finetune"]()
    assert cfg.model.tome_schedule == "decreasing"
    by_r = {}
    for c in cells:
        if c["tome_r"] > 0 and c["schedule"] == "decreasing":
            by_r.setdefault(c["tome_r"], []).append(c["best_auroc"])
    qualifying = [r for r, vals in by_r.items()
                  if max(vals) >= 0.92 and min(vals) >= 0.79]
    assert qualifying, "no merged budget qualifies — preset must go dense"
    assert cfg.model.tome_r == min(qualifying), (
        f"preset tome_r={cfg.model.tome_r} but the data recommends "
        f"{min(qualifying)} (qualifying budgets: {sorted(qualifying)})")
    spread = max(by_r[cfg.model.tome_r]) - min(by_r[cfg.model.tome_r])
    if spread >= 0.05:
        assert cfg.train.tome_warmup > 0, (
            "the preset budget is init-sensitive in the data "
            f"(spread {spread:.3f}) but the preset ships no dense warmup")
