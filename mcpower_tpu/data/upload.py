"""Pilot-data upload pipeline: detection, standardization, correlations.

Mirrors the reference's upload path (ports/py/mcpower/data/upload.py +
crates/engine-spec-builder/src/upload.rs): user data is normalized to
column-major float lists; each column's type is auto-detected (binary /
factor / continuous) and type-locked against the model's declarations;
continuous columns are z-scored with the POPULATION standard deviation;
pairwise latent-Gaussian correlations are measured through Spearman's rho
(r_latent = 2 sin(pi/6 rho_s)), with user-set pairs taking precedence.

Two generation modes:
* ``partial`` (NORTA): each uploaded column keeps its empirical marginal
  (inverse-CDF resampling through the Gaussian copula) while the latent
  correlation structure is synthetic — new draws every sim.
* ``strict``: whole-row bootstrap — the exact empirical joint is preserved,
  rows are resampled with replacement.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import CONFIG


class UploadError(ValueError):
    pass


@dataclass
class UploadedColumn:
    name: str
    kind: str  # "continuous" | "binary" | "factor"
    values: np.ndarray  # standardized (continuous) / 0-1 (binary) / level codes
    param: float = 0.5  # binary proportion
    n_levels: int = 0
    proportions: List[float] = field(default_factory=list)
    mean: float = 0.0
    sd: float = 1.0


@dataclass
class UploadedData:
    columns: Dict[str, UploadedColumn]
    n_rows: int
    mode: str  # "partial" | "strict"
    measured_correlations: Dict[Tuple[str, str], float] = field(default_factory=dict)

    def frame_matrix(self, names: Sequence[str]) -> np.ndarray:
        return np.column_stack([self.columns[n].values for n in names])


def _as_columns(data: Any) -> Dict[str, np.ndarray]:
    """Accept dict-of-lists, list-of-dicts, 2-D array + names, pandas-like."""
    if hasattr(data, "to_dict") and hasattr(data, "columns"):  # pandas duck-type
        return {str(c): np.asarray(data[c], dtype=np.float64) for c in data.columns}
    if isinstance(data, dict):
        return {str(k): np.asarray(v, dtype=np.float64) for k, v in data.items()}
    if isinstance(data, list) and data and isinstance(data[0], dict):
        keys = list(data[0])
        return {
            k: np.asarray([row[k] for row in data], dtype=np.float64) for k in keys
        }
    raise UploadError(
        "upload_data expects a dict of columns, a list of row dicts, or a "
        "DataFrame-like object"
    )


def detect_column_kind(values: np.ndarray) -> Tuple[str, Dict[str, Any]]:
    """binary (2 unique values) / factor (few integer levels) / continuous."""
    finite = values[np.isfinite(values)]
    if finite.size != values.size:
        raise UploadError("uploaded data contains missing/non-finite values")
    uniq = np.unique(finite)
    if uniq.size < 2:
        raise UploadError("uploaded column is constant")
    if uniq.size == 2:
        return "binary", {"levels": uniq}
    max_k = int(CONFIG["upload"]["max_factor_k_soft"])
    is_integral = np.allclose(finite, np.round(finite))
    if is_integral and uniq.size <= max_k:
        ratio = finite.size / uniq.size
        if ratio >= CONFIG["upload"]["max_factor_ratio"]:
            return "factor", {"levels": uniq}
    return "continuous", {}


def spearman_latent(x: np.ndarray, y: np.ndarray) -> float:
    """Latent-Gaussian correlation from Spearman's rho: 2 sin(pi rho_s / 6)."""
    rx = np.argsort(np.argsort(x)).astype(np.float64)
    ry = np.argsort(np.argsort(y)).astype(np.float64)
    rx -= rx.mean()
    ry -= ry.mean()
    denom = math.sqrt(float(rx @ rx) * float(ry @ ry))
    if denom == 0:
        return 0.0
    rho_s = float(rx @ ry) / denom
    return 2.0 * math.sin(math.pi * rho_s / 6.0)


def prepare_upload(
    data: Any,
    *,
    mode: str = "partial",
    declared_types: Optional[Dict[str, str]] = None,
) -> UploadedData:
    """Normalize + detect + standardize one uploaded dataset."""
    if mode not in ("partial", "strict", "none"):
        raise UploadError(f"unknown upload mode {mode!r}")
    cols_raw = _as_columns(data)
    n_rows = len(next(iter(cols_raw.values())))
    lim = CONFIG["upload"]
    if n_rows < lim["min_rows"]:
        raise UploadError(
            f"uploaded data has {n_rows} rows; at least {lim['min_rows']} required"
        )
    if n_rows > lim["max_rows"]:
        raise UploadError(f"uploaded data exceeds {lim['max_rows']} rows")

    declared_types = declared_types or {}
    columns: Dict[str, UploadedColumn] = {}
    for name, values in cols_raw.items():
        if len(values) != n_rows:
            raise UploadError(f"column {name!r} length mismatch")
        kind, info = detect_column_kind(values)
        declared = declared_types.get(name)
        if declared:
            # type-lock: a declared model type must agree with detection
            d = "factor" if declared == "factor" else (
                "binary" if declared == "binary" else "continuous"
            )
            if d == "binary" and kind != "binary":
                raise UploadError(
                    f"column {name!r} declared binary but has "
                    f"{np.unique(values).size} distinct values"
                )
            if d == "factor" and kind == "continuous":
                raise UploadError(
                    f"column {name!r} declared factor but looks continuous"
                )
            if d == "continuous":
                kind = "continuous"
            else:
                kind = d
        if kind == "binary":
            uniq = np.unique(values)
            v01 = (values == uniq[-1]).astype(np.float64)
            p = float(v01.mean())
            if not 0.0 < p < 1.0:
                raise UploadError(f"binary column {name!r} is constant")
            columns[name] = UploadedColumn(
                name=name, kind="binary", values=v01, param=p
            )
        elif kind == "factor":
            uniq = np.unique(values)
            codes = np.searchsorted(uniq, values).astype(np.float64)
            props = [float(np.mean(codes == i)) for i in range(uniq.size)]
            min_count = CONFIG["limits"]["factor_min_level_count"]
            if min(props) * n_rows < min_count:
                raise UploadError(
                    f"factor column {name!r} has a level with fewer than "
                    f"{min_count} rows"
                )
            columns[name] = UploadedColumn(
                name=name,
                kind="factor",
                values=codes,
                n_levels=int(uniq.size),
                proportions=props,
            )
        else:
            mu = float(values.mean())
            sd = float(values.std())  # population SD (ddof=0), reference parity
            if sd <= 0:
                raise UploadError(f"continuous column {name!r} has zero variance")
            columns[name] = UploadedColumn(
                name=name,
                kind="continuous",
                values=(values - mu) / sd,
                mean=mu,
                sd=sd,
            )

    # Measured latent correlations over continuous+binary pairs.
    measured: Dict[Tuple[str, str], float] = {}
    cont_names = [n for n, c in columns.items() if c.kind == "continuous"]
    for i, a in enumerate(cont_names):
        for b in cont_names[i + 1 :]:
            measured[(a, b)] = spearman_latent(columns[a].values, columns[b].values)

    return UploadedData(
        columns=columns, n_rows=n_rows, mode=mode, measured_correlations=measured
    )


def strict_reuse_warning(n_upload: int, n_target: int) -> Optional[str]:
    """Warn when a strict-bootstrap run extrapolates far beyond the pilot."""
    ratio = n_target / max(n_upload, 1)
    if ratio > CONFIG["upload"]["strict_warning_ratio"]:
        return (
            f"strict mode resamples {n_upload} pilot rows to N={n_target} "
            f"({ratio:.1f}x reuse): power estimates treat the pilot's "
            "idiosyncrasies as truth; consider mode='partial'"
        )
    return None
