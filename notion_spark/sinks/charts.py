"""Chart sink (S9 — reference analyze_pages.py:422-492 status pie +
velocity bars via matplotlib/seaborn).

Aggregation happens in Spark; only the tiny aggregate result crosses to
the driver. matplotlib is optional in this container — `charts_available`
gates rendering, and the data-prep path (`chart_data`) is always testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def charts_available() -> bool:
    try:
        import matplotlib  # noqa: F401

        return True
    except ImportError:
        return False


def chart_data(sections: dict[str, DataFrame]) -> dict[str, list[tuple]]:
    """Collect the chart inputs (status pie, priority bars, weekly
    velocity) as plain tuples — the render-agnostic artifact."""
    return {
        "status_pie": [tuple(r) for r in sections["status_counts"].collect()],
        "priority_bars": [tuple(r) for r in sections["priority_counts"].collect()],
        "velocity": [tuple(r) for r in sections["completion_velocity"].collect()],
    }


def render_charts(sections: dict[str, DataFrame], out_dir: str) -> list[str]:
    """Render PNG charts like the reference (status pie, velocity bars).
    Returns written paths; no-op (empty list) when matplotlib is absent."""
    if not charts_available():  # pragma: no cover
        return []
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = chart_data(sections)
    paths = []

    fig, ax = plt.subplots()
    labels, counts = zip(*data["status_pie"]) if data["status_pie"] else ((), ())
    ax.pie(counts, labels=labels, autopct="%1.1f%%")
    p = f"{out_dir}/task_status_distribution.png"
    fig.savefig(p)
    plt.close(fig)
    paths.append(p)

    fig, ax = plt.subplots()
    if data["velocity"]:
        weeks, counts = zip(*data["velocity"])
        ax.bar([str(w) for w in weeks], counts)
        ax.set_xticklabels([str(w) for w in weeks], rotation=45, ha="right")
    p = f"{out_dir}/velocity.png"
    fig.savefig(p)
    plt.close(fig)
    paths.append(p)
    return paths
