"""Streaming feature scalers.

Pure-numpy equivalents of sklearn's ``StandardScaler`` / ``MinMaxScaler``
with identical attribute semantics (``mean_``, ``scale_``, ``var_``,
``data_min_``, ``data_max_``), because the fitted scaler object is the
normalization contract shared by train / decode / vocoder-denorm in the
reference (compute_statistics.py:122-141, ssc_decode.py:303-307).  Objects
serialize with joblib exactly like the reference's ``stats.joblib``, and
sklearn-fitted scalers can be consumed interchangeably (duck-typed).
"""

from __future__ import annotations

import numpy as np


class StandardScaler:
    """Z-normalization with Chan et al. parallel-variance streaming updates
    (numerically matches sklearn's partial_fit)."""

    def __init__(self):
        self.n_samples_seen_ = 0
        self.mean_ = None
        self.var_ = None
        self.scale_ = None

    def partial_fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        n = X.shape[0]
        if n == 0:
            return self
        batch_mean = X.mean(axis=0)
        batch_var = X.var(axis=0)
        if self.n_samples_seen_ == 0:
            self.mean_ = batch_mean
            self.var_ = batch_var
            self.n_samples_seen_ = n
        else:
            m = self.n_samples_seen_
            total = m + n
            delta = batch_mean - self.mean_
            new_mean = self.mean_ + delta * n / total
            # combine M2 moments (Chan parallel algorithm)
            m2 = self.var_ * m + batch_var * n + delta**2 * m * n / total
            self.mean_ = new_mean
            self.var_ = m2 / total
            self.n_samples_seen_ = total
        self.scale_ = np.sqrt(np.where(self.var_ == 0.0, 1.0, self.var_))
        return self

    def fit(self, X):
        self.n_samples_seen_ = 0
        return self.partial_fit(X)

    def transform(self, X):
        X = np.asarray(X)
        return (X - self.mean_) / self.scale_

    def inverse_transform(self, X):
        X = np.asarray(X)
        return X * self.scale_ + self.mean_


class MinMaxScaler:
    """Min-max scaling to ``feature_range`` with sklearn attribute names."""

    def __init__(self, feature_range=(0.0, 1.0)):
        self.feature_range = feature_range
        self.n_samples_seen_ = 0
        self.data_min_ = None
        self.data_max_ = None
        self.scale_ = None
        self.min_ = None

    def partial_fit(self, X):
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X[:, None]
        if X.shape[0] == 0:
            return self
        batch_min = X.min(axis=0)
        batch_max = X.max(axis=0)
        if self.n_samples_seen_ == 0:
            self.data_min_ = batch_min
            self.data_max_ = batch_max
        else:
            self.data_min_ = np.minimum(self.data_min_, batch_min)
            self.data_max_ = np.maximum(self.data_max_, batch_max)
        self.n_samples_seen_ += X.shape[0]
        lo, hi = self.feature_range
        rng = self.data_max_ - self.data_min_
        rng = np.where(rng == 0.0, 1.0, rng)
        self.scale_ = (hi - lo) / rng
        self.min_ = lo - self.data_min_ * self.scale_
        return self

    def fit(self, X):
        self.n_samples_seen_ = 0
        return self.partial_fit(X)

    def transform(self, X):
        X = np.asarray(X)
        return X * self.scale_ + self.min_

    def inverse_transform(self, X):
        X = np.asarray(X)
        return (X - self.min_) / self.scale_
