"""D53 quality_logreg: the distributed GD loop must match a numpy
reference of the identical iteration (tolerance — float sums accumulate
in partition order), training must make progress, and the scoring pass
must agree with the learned model."""

import math

import numpy as np


def test_logreg_matches_numpy_reference(spark, sf_dir):
    from frolyk_spark.operators.learn import (
        LOGREG_ITERS, LOGREG_LR, _quality_features, _train_logreg,
    )

    feats = _quality_features(spark, sf_dir)
    rows = feats.orderBy("doc_id").collect()
    X = np.array([[1.0, r.x1, r.x2, r.x3] for r in rows])  # x2 pre-scaled in the op
    y = np.array([r.y for r in rows])

    w_ref = np.zeros(4)
    losses_ref = []
    for _ in range(LOGREG_ITERS):
        z = X @ w_ref
        p = 1.0 / (1.0 + np.exp(-z))
        # same stable logloss form as the Spark expression
        loss = np.mean(np.log1p(np.exp(-np.abs(z))) + np.where(z > 0, (1 - y) * z, -y * z))
        losses_ref.append(loss)
        w_ref = w_ref - LOGREG_LR * (X.T @ (p - y)) / len(y)

    w, losses = _train_logreg(feats)
    assert np.allclose(w, w_ref, rtol=1e-6, atol=1e-9), (w, list(w_ref))
    assert np.allclose(losses, losses_ref, rtol=1e-6)
    assert losses[-1] < losses[0], "training must reduce the loss"
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:])), (
        "full-batch GD at this step size must descend monotonically"
    )


def test_quality_logreg_scoring_consistent(spark, sf_dir):
    from frolyk_spark.operators.learn import (
        _quality_features, _train_logreg, quality_logreg,
    )

    w, _ = _train_logreg(_quality_features(spark, sf_dir))
    got = quality_logreg(spark, sf_dir).collect()
    feats = {r.doc_id: (r.x1, r.x2, r.x3) for r in _quality_features(spark, sf_dir).collect()}
    assert len(got) == len(feats)
    for r in got[:50]:
        x1, x2, x3 = feats[r.doc_id]
        p = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3)))
        assert abs(r.p_en - p) < 5e-6
        assert r.pred_en == int(p >= 0.5)
        assert r.label_en in (0, 1)
