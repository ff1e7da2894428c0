"""Metadata engine tests, oracle-checked against pandas/sklearn
(SURVEY.md §4: preprocessing/label-engine unit tests the reference lacks)."""

import numpy as np
import pytest

from chestxray_vit_tpu.data import metadata as md


# ---------------------------------------------------------------------------
# Label normalization (pyc L145-L149 semantics)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("raw,expected", [
    ("Cardiomegaly", "Cardiomegaly"),
    ("Cardiomegaly|Effusion", "Cardiomegaly|Effusion"),
    ("Cardiomegaly|No Finding", "Cardiomegaly"),
    ("No Finding|Effusion|Mass", "Effusion|Mass"),
    ("No Finding", "No Finding"),
    ("", "No Finding"),
    ("   ", "No Finding"),
    ("No Finding|No Finding", "No Finding"),   # all tokens dropped → empty → No Finding
    (" Mass | Nodule ", "Mass|Nodule"),        # per-token strip
])
def test_normalize_finding_labels(raw, expected):
    assert md.normalize_finding_labels(raw) == expected


def test_build_vocabulary_includes_no_finding_and_sorted():
    vocab = md.build_vocabulary(["Mass|Nodule", "Effusion", "Mass"])
    assert vocab == ["Effusion", "Mass", "No Finding", "Nodule"]
    assert md.build_vocabulary([]) == ["No Finding"]


# ---------------------------------------------------------------------------
# Binarizer vs sklearn oracle
# ---------------------------------------------------------------------------

def test_binarizer_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.preprocessing")
    classes = ["A", "B", "C", "No Finding", "Z"]
    label_lists = [["A"], ["B", "C"], ["No Finding"], ["Z", "A", "C"], []]
    ours = md.LabelBinarizer(classes).transform(label_lists)
    mlb = sklearn.MultiLabelBinarizer(classes=classes)
    theirs = mlb.fit_transform(label_lists)
    np.testing.assert_array_equal(ours, theirs)


def test_binarizer_ignores_unknown_labels():
    out = md.LabelBinarizer(["A", "B"]).transform([["A", "UNKNOWN"]])
    np.testing.assert_array_equal(out, [[1, 0]])


def test_binarizer_inverse():
    b = md.LabelBinarizer(["A", "B", "C"])
    assert b.inverse_transform(np.array([[1, 0, 1], [0, 0, 0]])) == [
        ("A", "C"), ()]


# ---------------------------------------------------------------------------
# BBox CSV (pyc L102-L137) — real NIH header shape
# ---------------------------------------------------------------------------

BBOX_CSV = """Image Index,Finding Label,Bbox [x,y,w,h],,
img1.png,Atelectasis,225.08,547.02,86.78,79.18,,
img1.png,Cardiomegaly,100.5,200.25,300.0,150.75,,
img2.png,Mass,10,20,30,40,,
"""


def test_parse_bbox_csv_column_cleaning_and_grouping():
    d = md.parse_bbox_csv(BBOX_CSV)
    assert set(d) == {"img1.png", "img2.png"}
    assert len(d["img1.png"]) == 2
    first = d["img1.png"][0]
    assert first.label == "Atelectasis"
    assert (first.x, first.y, first.w, first.h) == (225.08, 547.02, 86.78, 79.18)


def test_parse_bbox_csv_matches_pandas_cleaning():
    pd = pytest.importorskip("pandas")
    import io as _io
    import re as _re
    df = pd.read_csv(_io.StringIO(BBOX_CSV))
    # the reference's cleaning (pyc L113-L118)
    df.columns = [_re.sub(r"[\[\]]", "", c).strip().replace(" ", "_")
                  for c in df.columns]
    df = df[[c for c in df.columns if not c.startswith("Unnamed")]]
    ours = md.parse_bbox_csv(BBOX_CSV)
    for _, row in df.iterrows():
        boxes = ours[row["Image_Index"]]
        assert any(b.label == row["Finding_Label"]
                   and b.x == row["Bbox_x"] and b.h == row["h"]
                   for b in boxes)


def test_parse_bbox_csv_degrades_to_empty():
    assert md.parse_bbox_csv("") == {}
    assert md.parse_bbox_csv("some,unrelated,header\n1,2,3\n") == {}


# ---------------------------------------------------------------------------
# Data_Entry CSV (pyc L139-L181)
# ---------------------------------------------------------------------------

DATA_ENTRY_CSV = """Image Index,Finding Labels,Follow-up #,Patient ID,Patient Age,Patient Gender,View Position,OriginalImage[Width,Height],OriginalImagePixelSpacing[x,y]
a.png,Cardiomegaly|Effusion,0,1,58,M,PA,2682,2749,0.143,0.143
b.png,No Finding,1,2,58,M,PA,2894,2729,0.143,0.143
c.png,Mass|No Finding,2,3,40,F,AP,2500,2048,0.168,0.168
d.png,,3,4,33,F,PA,2500,2048,0.168,0.168
"""


def test_parse_data_entry():
    entries, vocab = md.parse_data_entry_csv(DATA_ENTRY_CSV)
    assert [e.image_index for e in entries] == ["a.png", "b.png", "c.png", "d.png"]
    assert entries[2].finding_labels == "Mass"        # 'No Finding' stripped
    assert entries[3].finding_labels == "No Finding"  # empty → No Finding
    assert vocab == ["Cardiomegaly", "Effusion", "Mass", "No Finding"]


def test_parse_data_entry_raises_on_garbage():
    with pytest.raises(ValueError):
        md.parse_data_entry_csv("")
    with pytest.raises(ValueError):
        md.parse_data_entry_csv("x,y\n1,2\n")


def test_parse_list_file():
    assert md.parse_list_file("a.png\nb.png\n\n  c.png \n") == [
        "a.png", "b.png", "c.png"]


# ---------------------------------------------------------------------------
# Splits vs sklearn oracle (pyc L415; ViT-Training.py:39-46)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,test_size,seed", [
    (100, 0.15, 42), (101, 0.15, 42), (7, 0.5, 0), (1000, 0.2, 42),
])
def test_train_test_split_matches_sklearn(n, test_size, seed):
    skms = pytest.importorskip("sklearn.model_selection")
    items = [f"img_{i:05d}.png" for i in range(n)]
    ours_train, ours_test = md.train_test_split(items, test_size, seed)
    ref_train, ref_test = skms.train_test_split(
        items, test_size=test_size, random_state=seed)
    assert ours_train == ref_train
    assert ours_test == ref_test


@pytest.mark.parametrize("n,test_size,seed", [
    (100, 0.2, 42), (101, 0.2, 42), (7, 0.5, 0), (1000, 0.15, 1),
])
def test_datasets_train_test_split_matches_hf_datasets(n, test_size, seed):
    """The Version A splitter must be bit-identical (membership AND order)
    to datasets.Dataset.train_test_split — the reference's actual splitter
    (ViT-Training.py:39-46), which uses a PCG64 permutation, not sklearn's
    MT19937."""
    hfd = pytest.importorskip("datasets")
    items = [f"img_{i:05d}.png" for i in range(n)]
    ours_train, ours_test = md.datasets_train_test_split(items, test_size,
                                                         seed)
    ds = hfd.Dataset.from_dict({"name": items})
    sp = ds.train_test_split(test_size=test_size, seed=seed)
    assert ours_train == sp["train"]["name"]
    assert ours_test == sp["test"]["name"]


def test_split_80_10_10_matches_reference_scheme():
    """Version A chains two datasets.train_test_split calls
    (ViT-Training.py:39-46); the oracle is the datasets library itself."""
    hfd = pytest.importorskip("datasets")
    items = [f"img_{i:05d}.png" for i in range(500)]
    tr, va, te = md.split_80_10_10(items, seed=42)
    ds = hfd.Dataset.from_dict({"name": items})
    sp = ds.train_test_split(test_size=0.2, seed=42)
    held = sp["test"].train_test_split(test_size=0.5, seed=42)
    assert tr == sp["train"]["name"]
    assert va == held["train"]["name"]
    assert te == held["test"]["name"]
    assert len(tr) + len(va) + len(te) == 500


# ---------------------------------------------------------------------------
# Dataset index (pyc L247-L258)
# ---------------------------------------------------------------------------

def test_build_dataset_index_filtering_subset_and_labels():
    entries, vocab = md.parse_data_entry_csv(DATA_ENTRY_CSV)
    b = md.LabelBinarizer(vocab)
    bboxes = md.parse_bbox_csv(BBOX_CSV)
    idx = md.build_dataset_index(entries, ["c.png", "a.png", "d.png"], b,
                                 bbox_dict=bboxes)
    # CSV order preserved (isin-filter), not file-list order
    assert idx.filenames == ["a.png", "c.png", "d.png"]
    np.testing.assert_array_equal(
        idx.labels,
        [[1, 1, 0, 0],   # a: Cardiomegaly|Effusion
         [0, 0, 1, 0],   # c: Mass
         [0, 0, 0, 1]])  # d: No Finding
    # subsetting (USE_SUBSET_DATA, pyc L254-L255)
    sub = md.build_dataset_index(entries, ["c.png", "a.png", "d.png"], b,
                                 use_subset=2)
    assert sub.filenames == ["a.png", "c.png"]
    # first-bbox-only lookup (pyc L290-L291)
    assert idx.bbox_for("img1.png").label == "Atelectasis"
    assert idx.bbox_for("a.png") is None


def test_parse_data_entry_raises_on_header_only():
    """build_vocabulary force-includes 'No Finding', so an empty CSV must
    fail on the zero-rows guard, not slip through as a 1-class dataset."""
    with pytest.raises(ValueError, match="no data rows"):
        md.parse_data_entry_csv("Image Index,Finding Labels\n")
