"""Label-comparison metrics (reference `utility.compare_labeling`,
utility.py:794-820) plus helpers for parity evaluation."""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.special import comb
from sklearn.metrics.cluster import (
    adjusted_mutual_info_score, adjusted_rand_score,
    normalized_mutual_info_score)


def compare_labeling(label1, label2):
    """NMI, AMI, ARI, RI, precision, recall, F1 between two labelings —
    byte-for-byte the reference's metric set."""
    label1 = np.asarray(label1).astype(np.int64)
    label2 = np.asarray(label2).astype(np.int64)
    nmi = normalized_mutual_info_score(label1, label2)
    ami = adjusted_mutual_info_score(label1, label2)
    ari = adjusted_rand_score(label1, label2)

    n1 = label1.shape[0]
    tp = 0.0
    for i in np.unique(label1):
        t1 = np.bincount(label2[label1 == i])
        tp += comb(t1, 2).sum()
    a = comb(np.bincount(label2), 2).sum()
    b = comb(np.bincount(label1), 2).sum()
    fp = a - tp
    fn = b - tp
    s1 = comb(n1, 2)
    tn = s1 - tp - fp - fn
    ri = (tp + tn) / s1
    precision = tp / a if a > 0 else 0.0
    recall = tp / b if b > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return nmi, ami, ari, ri, precision, recall, f1


def best_match_accuracy(pred, true) -> float:
    """Accuracy under the optimal label permutation (Hungarian matching);
    labels are identifiable only up to permutation."""
    pred = np.asarray(pred).astype(np.int64)
    true = np.asarray(true).astype(np.int64)
    k = int(max(pred.max(), true.max())) + 1
    conf = np.zeros((k, k), dtype=np.int64)
    np.add.at(conf, (pred, true), 1)
    row, col = linear_sum_assignment(-conf)
    return conf[row, col].sum() / pred.shape[0]


def cnt_estimate(state, n_components):
    """Per-state counts and fractions (reference `utility.py:687-699`)."""
    state = np.asarray(state)
    state_vec = np.unique(state)
    cnt_vec = np.zeros(n_components)
    for i in range(n_components):
        if i < len(state_vec):
            cnt_vec[i] = np.sum(state == state_vec[i])
    return cnt_vec, cnt_vec / cnt_vec.sum(), state_vec


def meanvalue_state(x, state):
    """Per-state feature percentiles (reference `utility.py:760-791`)."""
    x = np.asarray(x)
    state = np.asarray(state)
    vec1 = np.unique(state)
    percentiles = [5, 25, 50, 75, 95]
    m_vec, cnt_vec = [], np.zeros(len(vec1))
    for i, s in enumerate(vec1):
        sel = state == s
        cnt_vec[i] = sel.sum()
        for p in percentiles:
            m_vec.append(np.percentile(x[sel], p, axis=0))
    return np.asarray(m_vec), cnt_vec
