"""eval/metrics.py vs executed sklearn/scipy — the reference's metrics()
(vggishish/metrics.py) is a thin wrapper over sklearn, so sklearn IS the
executable reference for AP/AUC semantics (ties, step-wise AP, fallback)."""

import numpy as np
import pytest

from maa3_tpu.eval.metrics import average_precision, roc_auc, metrics


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("ties", [False, True])
def test_ap_auc_vs_sklearn(seed, ties):
    from sklearn.metrics import average_precision_score, roc_auc_score
    rng = np.random.RandomState(seed)
    y = (rng.rand(257) < 0.3).astype(int)
    y[0], y[1] = 1, 0  # both classes present
    s = rng.randn(257)
    if ties:
        s = np.round(s, 1)  # force many tied scores
    np.testing.assert_allclose(average_precision(y, s),
                               average_precision_score(y, s), atol=1e-12)
    np.testing.assert_allclose(roc_auc(y, s), roc_auc_score(y, s),
                               atol=1e-12)


def test_roc_auc_single_class_raises():
    with pytest.raises(ValueError):
        roc_auc(np.ones(5), np.arange(5.0))


def test_metrics_matches_reference_semantics():
    """The reference's own __main__ example (metrics.py:59-69), with the
    expected dict computed by executing sklearn the way metrics.py does."""
    import torch
    from sklearn.metrics import average_precision_score, roc_auc_score
    from scipy.stats import norm

    targets = np.array([3, 3, 1, 2, 1, 0])
    outputs = np.array([
        [1.2, 1.3, 1.1, 1.5],
        [1.3, 1.4, 1.0, 1.1],
        [1.5, 1.1, 1.4, 1.3],
        [1.0, 1.2, 1.4, 1.5],
        [1.2, 1.3, 1.1, 1.1],
        [1.2, 1.1, 1.1, 1.1],
    ], dtype=np.float32)

    got = metrics(targets, outputs, topk=(1, 3))

    # executed reference path
    t = torch.tensor(targets)
    o = torch.tensor(outputs)
    _, preds = torch.topk(o, k=3, dim=1)
    correct = preds == t.view(-1, 1).expand_as(preds)
    onehot = torch.nn.functional.one_hot(t, num_classes=4).numpy()
    probs = torch.softmax(o, dim=1).numpy()
    aps = [average_precision_score(onehot[:, c], probs[:, c])
           for c in range(4)]
    aucs = [roc_auc_score(onehot[:, c], probs[:, c]) for c in range(4)]

    assert got["accuracy_1"] == pytest.approx(
        float(correct[:, :1].sum() / 6))
    assert got["accuracy_3"] == pytest.approx(
        float(correct[:, :3].sum() / 6))
    assert got["mAP"] == pytest.approx(np.mean(aps), abs=1e-12)
    assert got["mROCAUC"] == pytest.approx(np.mean(aucs), abs=1e-12)
    assert got["dprime"] == pytest.approx(
        norm().ppf(np.mean(aucs)) * np.sqrt(2), abs=1e-12)


def test_metrics_missing_class_fallback():
    # class 3 never occurs -> reference sets mAP=0, mROCAUC=0.5, dprime=0
    targets = np.array([0, 1, 2, 0])
    outputs = np.random.RandomState(0).randn(4, 4)
    got = metrics(targets, outputs, topk=(1,))
    assert got["mAP"] == 0.0
    assert got["mROCAUC"] == 0.5
    assert got["dprime"] == pytest.approx(0.0, abs=1e-12)
