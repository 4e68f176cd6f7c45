"""PDF report sink (S10 — reference generate_reports.py:28-123, 505-600:
fpdf document with watermark, chapters, grouped task lists, markdown
rendering, embedded charts).

fpdf is not in this container, so the RENDER is stubbed behind
`pdf_available()`; the testable artifact is `report_payload` — the fully
sorted/grouped/truncated row stream the renderer would consume
(FIXTURES.md §6: "the PDF is a render concern; its input frames are the
testable artifact").
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from notion_spark.config import EngineConfig
from notion_spark.functions.text import truncate_lines


def pdf_available() -> bool:
    try:
        import fpdf  # noqa: F401

        return True
    except ImportError:
        return False


def report_payload(
    frames: dict[str, DataFrame],
    period: str,
    now: datetime,
    cfg: EngineConfig,
    attachments: DataFrame | None = None,
) -> dict:
    """Collect the report sections as render-ready rows: body truncated to
    cfg.body_content_max_lines (X11, generate_reports.py:97-102), grouped
    by parent_name in section sort order (W1 boundaries implicit in the
    ordering). With ``attachments`` and include_attachments on, readable
    previews join in by nid and append to the body — one join replacing
    the reference's per-row file reads (get_smart_attachment_content,
    generate_reports.py:256-305)."""
    att_text = None
    if attachments is not None and cfg.include_attachments:
        from notion_spark.sources.attachments import attachment_previews

        previews = attachment_previews(attachments, cfg)
        att_text = (
            previews.groupBy("nid")
            .agg(
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("filename").alias("f"),
                                    F.concat_ws(
                                        ": ",
                                        F.col("filename"),
                                        F.coalesce(F.col("preview"), F.lit("(attachment)")),
                                    ).alias("t"),
                                )
                            )
                        ),
                        lambda s: s["t"],
                    ),
                ).alias("__att")
            )
        )

    def rows(df: DataFrame) -> list[dict]:
        cols = ["nid", "name", "status", "priority", "parent_name"]
        present = [c for c in cols if c in df.columns]
        out = df
        if cfg.include_body_content and "body_content" in df.columns:
            out = out.withColumn(
                "body_content", truncate_lines("body_content", cfg.body_content_max_lines)
            )
            if att_text is not None:
                out = out.join(att_text, "nid", "left").withColumn(
                    "body_content",
                    F.concat_ws("\n", F.col("body_content"), F.col("__att")),
                ).drop("__att")
            present.append("body_content")
        return [r.asDict() for r in out.select(*present).collect()]

    return {
        "period": period,
        "generated_at": now.isoformat(),
        "sections": {name: rows(df) for name, df in frames.items() if name != "pie_counts"},
        "pie_counts": [tuple(r) for r in frames["pie_counts"].collect()],
    }


def render_pdf(payload: dict, path: str) -> str:
    """Assemble the PDF (driver-side, over the collected payload)."""
    if not pdf_available():
        raise NotImplementedError(
            "fpdf not installed in this container; consume report_payload() "
            "— the sorted section rows — directly"
        )
    raise NotImplementedError("PDF assembly pending a render dependency")
