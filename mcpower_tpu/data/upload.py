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
    # factor level display labels (sorted data values); [] elsewhere
    labels: List[str] = field(default_factory=list)


@dataclass
class UploadedData:
    columns: Dict[str, UploadedColumn]
    n_rows: int
    mode: str  # "partial" | "strict"
    measured_correlations: Dict[Tuple[str, str], float] = field(default_factory=dict)

    def frame_matrix(self, names: Sequence[str]) -> np.ndarray:
        return np.column_stack([self.columns[n].values for n in names])


_MISSING_MARKERS = {"", "na", "n/a", "nan", "null", "none", "."}


def _coerce_column(name: str, v: Any) -> np.ndarray:
    """float64 array when every value parses as a number; otherwise an
    object array of stripped strings (a string column is a factor — the
    reference's numeric probe, ports/py/mcpower/data/upload.py:173).

    A column that is MOSTLY numeric but carries text missing markers
    ('NA', '', 'null', ...) raises the missing-value error instead of
    silently re-typing the predictor as a string factor with the marker
    as a level."""
    try:
        return np.asarray(v, dtype=np.float64)
    except (ValueError, TypeError):
        pass
    vals = []
    any_numeric = False
    any_marker = False
    for x in np.asarray(v, dtype=object).ravel():
        s = "" if x is None else str(x).strip()
        if s.lower() in _MISSING_MARKERS:
            any_marker = True
        else:
            try:
                float(s)
                any_numeric = True
            except ValueError:
                pass
        vals.append(s)
    if any_marker and any_numeric:
        # numeric column with text missing markers
        raise UploadError(
            f"column {name!r} contains missing values ('NA'/empty cells) — "
            "drop or impute them before upload"
        )
    if any(not s for s in vals):
        # pure-string columns only reject genuinely empty cells ('none' or
        # 'na' could be legitimate category names)
        raise UploadError(f"column {name!r} contains empty values")
    return np.asarray(vals, dtype=object)


def _read_delimited(path) -> Dict[str, list]:
    """stdlib csv read of a .csv/.tsv file: header row -> column names
    (reference normalize_upload_input, upload.py:86)."""
    import csv
    import os

    delim = "\t" if str(path).lower().endswith((".tsv", ".tab")) else ","
    with open(os.fspath(path), newline="") as fh:
        rows = list(csv.reader(fh, delimiter=delim))
    if len(rows) < 2:
        raise UploadError("delimited file needs a header row and data rows")
    names = [c.strip() for c in rows[0]]
    cols: Dict[str, list] = {n: [] for n in names}
    for r in rows[1:]:
        if not any(c.strip() for c in r):
            continue  # trailing blank line
        if len(r) != len(names):
            raise UploadError("delimited file has ragged rows")
        for n, c in zip(names, r):
            cols[n].append(c.strip())
    return cols


def _as_columns(data: Any) -> Dict[str, np.ndarray]:
    """Accept dict-of-lists, list-of-dicts, a .csv/.tsv path, pandas-like."""
    import os

    if isinstance(data, (str, os.PathLike)):
        data = _read_delimited(data)
    if hasattr(data, "to_dict") and hasattr(data, "columns"):  # pandas duck-type
        return {str(c): _coerce_column(str(c), data[c]) for c in data.columns}
    if isinstance(data, dict):
        return {str(k): _coerce_column(str(k), v) for k, v in data.items()}
    if isinstance(data, list) and data and isinstance(data[0], dict):
        keys = list(data[0])
        return {
            k: _coerce_column(k, [row[k] for row in data]) for k in keys
        }
    raise UploadError(
        "upload_data expects a dict of columns, a list of row dicts, a "
        "csv/tsv path, or a DataFrame-like object"
    )


def value_to_label(v) -> str:
    """Canonical string label for a factor level value: int-valued floats
    render without the trailing .0 ("4", not "4.0"); strings pass through
    (reference upload.py:9 value_to_label)."""
    try:
        fv = float(v)
    except (ValueError, TypeError):
        return str(v)
    return str(int(fv)) if fv == int(fv) else str(fv)


def detect_column_kind(values: np.ndarray) -> Tuple[str, Dict[str, Any]]:
    """Reference detection rules (ports/py/mcpower/data/upload.py:150):

    - a non-numeric (string) column is a factor, sorted string labels;
    - numeric with exactly 2 distinct values is binary;
    - numeric with <= max_factor_k_soft distinct values AND
      n_rows/n_distinct >= max_factor_ratio is a factor (no integrality
      requirement — 1.5/2.5/3.5 codes are levels too);
    - otherwise continuous.
    """
    if values.dtype == object:
        labels = sorted(set(str(v) for v in values))
        if len(labels) < 2:
            raise UploadError("uploaded column is constant")
        return "factor", {"labels": labels}
    finite = values[np.isfinite(values)]
    if finite.size != values.size:
        raise UploadError("uploaded data contains missing/non-finite values")
    uniq = np.unique(finite)
    if uniq.size < 2:
        raise UploadError("uploaded column is constant")
    if uniq.size == 2:
        return "binary", {"levels": uniq}
    max_k = int(CONFIG["upload"]["max_factor_k_soft"])
    if uniq.size <= max_k:
        ratio = finite.size / uniq.size
        if ratio >= CONFIG["upload"]["max_factor_ratio"]:
            return "factor", {"levels": uniq,
                              "labels": [value_to_label(u) for u in uniq]}
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
            if d in ("continuous", "binary") and values.dtype == object:
                raise UploadError(
                    f"column {name!r} declared {d} but holds non-numeric "
                    "values"
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
            uniq = np.unique(values)  # sorted; works for strings too
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
                labels=info.get("labels")
                or [value_to_label(u) for u in uniq],
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


def reuse_fraction(n_upload: int, n_target: int) -> float:
    """Expected % of uploaded rows drawn MORE THAN ONCE within one
    strict-bootstrap dataset of size N from U pilot rows (reference
    model.py:85-97): g = 100*[1 - p^N - (N/U)*p^(N-1)], p = 1 - 1/U."""
    U, N = n_upload, n_target
    if U <= 0:
        return 0.0
    if U == 1:
        return 100.0
    p = 1.0 - 1.0 / U
    return 100.0 * (1.0 - p**N - (N / U) * p ** (N - 1))


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
