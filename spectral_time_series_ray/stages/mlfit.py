"""Distributed generalized-linear model fitting.

Logistic regression via IRLS / Newton-Raphson where each iteration is
ONE streaming pass over the feature Dataset: every batch emits the
k x k Hessian partial ``X^T W X``, the gradient partial ``X^T (y-mu)``
and its log-likelihood contribution — a single row of k*k + k + 2
floats — and ``Dataset.sum`` reduces them. The driver only ever holds
k x k matrices, never rows, so the fit shape is identical at 10^12
rows: per-iteration cost is one map over blocks plus a tiny
all-reduce, with the current beta shipped in the task closure.

The fit is self-certifying: logistic log-likelihood (plus an optional
ridge term) is concave, so a final gradient with
``||g||_inf / n < tol`` together with a positive-definite Hessian is a
PROOF of global optimality — no reference implementation needed.
Analogue of the reference's model-fit loops (torch training internals
scoped out by SURVEY); this is the classical statistics counterpart a
data engine ships.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["logistic_irls"]


def _pass(feats, beta: np.ndarray, feature_cols, label_col):
    """One distributed pass: Hessian, gradient, log-lik, row count at
    ``beta``. Ships beta in the closure; reduces k*k+k+2 floats."""
    k = len(beta)
    b = beta.copy()

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        X = np.column_stack(
            [np.ones(len(batch))]
            + [batch[c].to_numpy(np.float64) for c in feature_cols]
        )
        y = batch[label_col].to_numpy(np.float64)
        eta = X @ b
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        H = (X * w[:, None]).T @ X
        g = X.T @ (y - mu)
        ll = float(np.sum(y * eta - np.logaddexp(0.0, eta)))
        row = {f"h{i}_{j}": [H[i, j]] for i in range(k) for j in range(i, k)}
        row.update({f"g{i}": [g[i]] for i in range(k)})
        row.update({"ll": [ll], "n": [float(len(batch))]})
        return pd.DataFrame(row)

    cols = [f"h{i}_{j}" for i in range(k) for j in range(i, k)]
    cols += [f"g{i}" for i in range(k)] + ["ll", "n"]
    s = feats.map_batches(partials, batch_format="pandas", batch_size=None).sum(cols)
    H = np.empty((k, k))
    for i in range(k):
        for j in range(i, k):
            H[i, j] = H[j, i] = s[f"sum(h{i}_{j})"]
    g = np.array([s[f"sum(g{i})"] for i in range(k)])
    return H, g, float(s["sum(ll)"]), int(s["sum(n)"])


def logistic_irls(
    feats,
    feature_cols,
    label_col: str,
    max_iters: int = 30,
    tol: float = 1e-10,
    ridge: float = 1e-8,
) -> dict:
    """Fit ``P(y=1) = sigmoid(b0 + X beta)`` by IRLS with step-halving.

    ``feats`` is a Dataset with float feature columns and a 0/1 label;
    it is materialized once (per-key feature tables are orders of
    magnitude smaller than the raw event log) and re-scanned per
    iteration. Returns coefficient vector (intercept first), standard
    errors from the inverse Hessian, the optimality certificate
    ``grad_inf`` (max |gradient| / n at the solution), deviance and
    null deviance, iteration count and a ``converged`` flag.
    """
    feats = feats.materialize()
    k = len(feature_cols) + 1
    eye = np.eye(k)
    beta = np.zeros(k)
    H, g, ll, n = _pass(feats, beta, feature_cols, label_col)
    iters = 0
    converged = False
    for _ in range(max_iters):
        iters += 1
        delta = np.linalg.solve(H + ridge * eye, g - ridge * beta)
        step = 1.0
        nb, H2, g2, ll2 = beta, H, g, ll
        for _ in range(8):  # halve until the penalized log-lik improves
            nb = beta + step * delta
            H2, g2, ll2, _ = _pass(feats, nb, feature_cols, label_col)
            if (ll2 - 0.5 * ridge * nb @ nb) >= (ll - 0.5 * ridge * beta @ beta) - 1e-12:
                break
            step *= 0.5
        moved = float(np.max(np.abs(nb - beta)))
        beta, H, g, ll = nb, H2, g2, ll2
        if moved < tol:
            converged = True
            break
    grad_inf = float(np.max(np.abs(g - ridge * beta))) / max(n, 1)
    cov = np.linalg.inv(H + ridge * eye)
    # PD certificate: concave problem + tiny gradient => global optimum
    np.linalg.cholesky(H + ridge * eye)
    ybar_ll = _null_loglik(feats, label_col)
    return {
        "beta": beta,
        "se": np.sqrt(np.diag(cov)),
        "loglik": ll,
        "deviance": -2.0 * ll,
        "null_deviance": -2.0 * ybar_ll,
        "grad_inf": grad_inf,
        "n": n,
        "iters": iters,
        "converged": converged or grad_inf < 1e-8,
    }


def _null_loglik(feats, label_col: str) -> float:
    """Intercept-only log-likelihood: n1*ln(p) + n0*ln(1-p) at the
    base rate — one tiny aggregate pass."""
    def part(batch: pd.DataFrame) -> pd.DataFrame:
        y = batch[label_col].to_numpy(np.float64)
        return pd.DataFrame({"n1": [float(y.sum())], "n0": [float(len(y) - y.sum())]})

    s = feats.map_batches(part, batch_format="pandas", batch_size=None).sum(["n1", "n0"])
    n1, n0 = float(s["sum(n1)"]), float(s["sum(n0)"])
    if n1 == 0 or n0 == 0:
        return 0.0
    p = n1 / (n1 + n0)
    return n1 * np.log(p) + n0 * np.log(1.0 - p)
