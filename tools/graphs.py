"""Plotting ecosystem: analogues of the reference's graph scripts.

Reference: ``/root/reference/python/graph_performance_by_dimension.py``,
``graph_ingestion_parallelism.py``, ``graph_skyline_points_2d.py`` —
matplotlib charts over the collector CSV
(``metrics_collector.py:60-72`` schema).

matplotlib is not in this container, so rendering is gated behind an
import-try; the data-preparation half of each script (load, sort,
unit-convert, step-line geometry) is pure pandas/NumPy and fully
testable.  ``python tools/graphs.py <cmd> ...`` renders when matplotlib
is available and fails with a clear message when not.

Usage:
    python tools/graphs.py dimensions out.png 2d=NAME:FILE.csv[,...] \
        [3d=...] [4d=...]
    python tools/graphs.py dashboard out.png NAME:FILE.csv [...]
    python tools/graphs.py skyline2d out.png FILE.csv [row_idx]
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pandas as pd

try:  # pragma: no cover - exercised only where matplotlib exists
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except ImportError:  # container has no matplotlib; prep still works
    plt = None

# graph_performance_by_dimension.py styling constants
MARKERS = {"MR-Angle": "o", "MR-Dim": "s", "MR-Grid": "^"}
COLORS = {"MR-Angle": "royalblue", "MR-Dim": "peru", "MR-Grid": "seagreen"}
D_MIN, D_MAX = 0, 10000  # graph_skyline_points_2d.py domain lock


def _require_plt():
    if plt is None:
        raise RuntimeError(
            "matplotlib is not installed in this environment; "
            "data-prep functions work, rendering does not.")


# -- data prep (pure pandas/NumPy, testable without matplotlib) ----------

def perf_series(csv_path: str) -> pd.DataFrame:
    """Records(millions) vs TotalTime(s), sorted — the transform every
    line chart applies (graph_performance_by_dimension.py: records/1e6,
    ms/1000, sort for monotone lines)."""
    df = pd.read_csv(csv_path)
    out = pd.DataFrame({
        "records_m": df["Records"] / 1e6,
        "total_s": df["TotalTime(ms)"] / 1000.0,
        "ingest_s": df.get("IngestTime(ms)", 0) / 1000.0,
        "optimality": df.get("Optimality", 0.0),
        "local_ms": df.get("LocalTime(ms)", 0),
        "global_ms": df.get("GlobalTime(ms)", 0),
    })
    return out.sort_values("records_m", ignore_index=True)


def skyline_step(points) -> tuple[np.ndarray, np.ndarray]:
    """Sorted points + the dominance step-line vertices
    (graph_skyline_points_2d.py: sort by x, then post-step to the next
    point).  Accepts a JSON string or a [[x, y], ...] list."""
    if isinstance(points, str):
        points = json.loads(points)
    pts = np.asarray(points, dtype=float)
    if pts.size == 0:
        return pts.reshape(0, 2), pts.reshape(0, 2)
    pts = pts[np.argsort(pts[:, 0], kind="stable")]
    # step-line: from each point go right to the next x, then down/up to
    # the next y — the 'area of dominance' boundary for minimization
    step = [pts[0]]
    for a, b in zip(pts[:-1], pts[1:]):
        step.append([b[0], a[1]])
        step.append(b)
    return pts, np.asarray(step)


def _parse_filemap(arg: str) -> dict:
    return dict(pair.split(":", 1) for pair in arg.split(","))


# -- renderers (reference figure layouts) --------------------------------

def plot_performance_by_dimension(file_groups: dict, out: str) -> None:
    """1×N line-chart row, one subplot per dimensionality
    (graph_performance_by_dimension.py layout)."""
    _require_plt()
    names = sorted(file_groups)
    fig, axes = plt.subplots(1, len(names), figsize=(6 * len(names), 5))
    axes = np.atleast_1d(axes)
    for ax, dim in zip(axes, names):
        for label, path in file_groups[dim].items():
            s = perf_series(path)
            ax.plot(s["records_m"], s["total_s"],
                    marker=MARKERS.get(label, "o"),
                    color=COLORS.get(label), label=label)
        ax.set_title(f"Performance in {dim}")
        ax.set_xlabel("Records (millions)")
        ax.set_ylabel("Total Processing Time (s)")
        ax.grid(True, alpha=0.3)
        ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)


def plot_dashboard(file_map: dict, out: str) -> None:
    """2×2 dashboard: ingestion, total time, optimality, local/global
    breakdown for the largest run (graph_ingestion_parallelism.py)."""
    _require_plt()
    fig, ax = plt.subplots(2, 2, figsize=(14, 10))
    breakdown = {}
    for label, path in file_map.items():
        s = perf_series(path)
        ax[0][0].plot(s["records_m"], s["ingest_s"], marker="o", label=label)
        ax[0][1].plot(s["records_m"], s["total_s"], marker="o", label=label)
        ax[1][0].plot(s["records_m"], s["optimality"], "--", label=label)
        last = s.iloc[-1]
        breakdown[label] = (last["local_ms"], last["global_ms"])
    for a, t, y in ((ax[0][0], "Ingestion Time", "s"),
                    (ax[0][1], "Total Processing Time", "s"),
                    (ax[1][0], "Optimality Ratio", "ratio")):
        a.set_title(t)
        a.set_xlabel("Records (millions)")
        a.set_ylabel(y)
        a.grid(True, alpha=0.3)
        a.legend()
    labels = list(breakdown)
    loc = [breakdown[k][0] for k in labels]
    glo = [breakdown[k][1] for k in labels]
    ax[1][1].bar(labels, loc, label="Local (ms)")
    ax[1][1].bar(labels, glo, bottom=loc, label="Global (ms)")
    ax[1][1].set_title("Time Breakdown (largest batch)")
    ax[1][1].legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    plt.close(fig)


def plot_skyline_2d(csv_path: str, out: str, row_idx: int = 0) -> None:
    """Scatter + dominance step-line, axes locked to the domain
    (graph_skyline_points_2d.py)."""
    _require_plt()
    df = pd.read_csv(csv_path)
    pts, step = skyline_step(df["SkylinePoints"].iloc[row_idx])
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], color="red", zorder=3,
                   label="Skyline points")
        ax.plot(step[:, 0], step[:, 1], "r:", alpha=0.7)
    ax.set_xlim(D_MIN, D_MAX)
    ax.set_ylim(D_MIN, D_MAX)
    ax.set_xlabel("d0")
    ax.set_ylabel("d1")
    ax.set_title(f"Skyline (query {df['QueryID'].iloc[row_idx]})")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.savefig(out, dpi=150)
    plt.close(fig)


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 1
    cmd, out = argv[1], argv[2]
    if cmd == "dimensions":
        groups = {a.split("=", 1)[0]: _parse_filemap(a.split("=", 1)[1])
                  for a in argv[3:]}
        plot_performance_by_dimension(groups, out)
    elif cmd == "dashboard":
        plot_dashboard(_parse_filemap(",".join(argv[3:])), out)
    elif cmd == "skyline2d":
        plot_skyline_2d(argv[3], out,
                        int(argv[4]) if len(argv) > 4 else 0)
    else:
        print(__doc__)
        return 1
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
