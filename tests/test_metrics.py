"""Cross-check pure-numpy metrics against sklearn (the reference's source of truth)."""

import numpy as np
import pytest

from hriemo.utils import metrics as M

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import average_precision_score, f1_score, roc_auc_score


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    y_true = (rng.uniform(size=(200, 6)) > 0.7).astype(np.int64)
    y_prob = np.clip(y_true * 0.4 + rng.uniform(size=(200, 6)) * 0.6, 0, 1)
    return y_true, y_prob


def test_f1_micro_macro_vs_sklearn(data):
    y_true, y_prob = data
    y_pred = (y_prob >= 0.5).astype(np.int64)
    assert M.micro_f1(y_true, y_pred) == pytest.approx(
        f1_score(y_true, y_pred, average="micro"), abs=1e-9
    )
    assert M.macro_f1(y_true, y_pred) == pytest.approx(
        f1_score(y_true, y_pred, average="macro"), abs=1e-9
    )


def test_auc_vs_sklearn(data):
    y_true, y_prob = data
    for c in range(6):
        assert M.roc_auc(y_true[:, c], y_prob[:, c]) == pytest.approx(
            roc_auc_score(y_true[:, c], y_prob[:, c]), abs=1e-9
        )
    assert M.macro_auc(y_true, y_prob) == pytest.approx(
        roc_auc_score(y_true, y_prob, average="macro"), abs=1e-9
    )


def test_auc_with_ties():
    y_true = np.array([0, 0, 1, 1, 0, 1])
    y_score = np.array([0.3, 0.5, 0.5, 0.9, 0.5, 0.5])
    assert M.roc_auc(y_true, y_score) == pytest.approx(
        roc_auc_score(y_true, y_score), abs=1e-9
    )


def test_auc_degenerate_is_nan():
    assert np.isnan(M.roc_auc(np.zeros(5), np.random.rand(5)))


def test_average_precision_vs_sklearn(data):
    y_true, y_prob = data
    for c in range(6):
        assert M.average_precision(y_true[:, c], y_prob[:, c]) == pytest.approx(
            average_precision_score(y_true[:, c], y_prob[:, c]), abs=1e-9
        )


def test_calibration_beats_default_threshold(data):
    y_true, y_prob = data
    ths, best = M.calibrate_thresholds(y_true, y_prob)
    default = [M.f1_binary(y_true[:, c], (y_prob[:, c] >= 0.5).astype(int)) for c in range(6)]
    assert (best >= np.asarray(default) - 1e-12).all()
    assert ths.min() >= 0.05 and ths.max() <= 0.95


def test_pos_weights():
    y = np.array([[1, 0], [1, 0], [0, 0], [1, 0]])
    w = M.pos_weights(y)
    assert w[0] == pytest.approx(1 / 3)
    assert w[1] == 1.0  # no positives -> 1.0


def test_binarize_truth_mosei_convention():
    y = np.array([[-0.5, 0.0, 0.2], [3.0, 1.0, -1.0]])
    np.testing.assert_array_equal(M.binarize_truth(y), [[0, 0, 1], [1, 1, 0]])
