"""Chart sink (S9 — reference analyze_pages.py:422-492 status pie +
velocity bars via matplotlib/seaborn).

Aggregation happens in Spark; only the tiny aggregate result crosses to
the driver. Rendering is dependency-free: matplotlib is used when
present, otherwise the vendored `minipng` rasterizer produces real,
deterministic PNGs — so `render_charts` always writes files, and
`render_chart_canvases` feeds raw RGB buffers straight into the PDF
sink's image XObjects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from notion_spark.sinks import minipng


def charts_available() -> bool:
    """True when matplotlib can render; the minipng fallback makes
    rendering itself unconditional."""
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


def render_chart_canvases(sections: dict[str, DataFrame]) -> list[minipng.Canvas]:
    """Render the reference's two report charts
    (generate_reports.py:220-253: status pie + priority bars) as minipng
    canvases — PNG-encodable AND embeddable in the PDF as raw RGB."""
    data = chart_data(sections)
    return [
        minipng.pie_chart(data["status_pie"], "Work Distribution"),
        minipng.bar_chart(data["priority_bars"], "Tasks by Priority"),
        minipng.bar_chart(
            [(str(w), n) for w, n in data["velocity"]], "Tasks Completed Over Time"
        ),
    ]


def render_charts(sections: dict[str, DataFrame], out_dir: str) -> list[str]:
    """Render PNG charts like the reference (status pie, velocity bars).
    Always writes files: matplotlib when present, minipng otherwise."""
    if not charts_available():
        names = ["task_status_distribution.png", "tasks_by_priority.png", "velocity.png"]
        paths = []
        for canvas, name in zip(render_chart_canvases(sections), names):
            p = f"{out_dir}/{name}"
            with open(p, "wb") as f:
                f.write(canvas.png_bytes())
            paths.append(p)
        return paths
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
