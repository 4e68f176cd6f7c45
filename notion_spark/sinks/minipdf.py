"""Dependency-free PDF writer (S10 render fallback, fpdf-API workalike).

fpdf is absent in this container, so the report PDF is assembled by this
minimal writer instead: A4 pages in mm units, the core Helvetica family
(Arial maps to it, as in fpdf) with real AFM advance widths for wrapping
and centering, `cell`/`multi_cell`/`ln`/`text` and rotation — the exact
subset the reference's PDFReport uses (generate_reports.py:28-123). Text
is latin-1 (the reference's safe_encode contract); images embed as
FlateDecode RGB XObjects fed by sinks/minipng.Canvas buffers.

Deterministic: no timestamps, no IDs, uncompressed text streams — golden
tests parse the output (pages, text runs) and hash the bytes.
"""

from __future__ import annotations

import math
import zlib

K = 72 / 25.4  # mm -> pt

# Helvetica / Helvetica-Bold AFM advance widths (per mille), ASCII 32-126.
_W_REG = (
    "278 278 355 556 556 889 667 191 333 333 389 584 278 333 278 278 556 556 556 556 "
    "556 556 556 556 556 556 278 278 584 584 584 556 1015 667 667 722 722 667 611 778 "
    "722 278 500 667 556 833 722 778 667 778 722 667 611 722 667 944 667 667 611 278 "
    "278 278 469 556 333 556 556 500 556 556 278 556 556 222 222 500 222 833 556 556 "
    "556 556 333 500 278 556 500 722 500 500 500 334 260 334 584"
)
_W_BOLD = (
    "278 333 474 556 556 889 722 238 333 333 389 584 278 333 278 278 556 556 556 556 "
    "556 556 556 556 556 556 333 333 584 584 584 611 975 722 722 722 722 667 611 778 "
    "722 278 556 722 611 833 722 778 667 778 722 667 611 722 667 944 667 667 611 333 "
    "278 333 584 556 333 556 611 556 611 556 333 611 611 278 278 556 278 889 611 611 "
    "611 611 389 556 333 611 556 778 556 556 500 389 280 389 584"
)
WIDTHS = {
    "": [int(w) for w in _W_REG.split()],
    "B": [int(w) for w in _W_BOLD.split()],
    "I": [int(w) for w in _W_REG.split()],  # oblique shares regular metrics
    "BI": [int(w) for w in _W_BOLD.split()],
}
FONT_NAMES = {
    "": "Helvetica",
    "B": "Helvetica-Bold",
    "I": "Helvetica-Oblique",
    "BI": "Helvetica-BoldOblique",
}


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class MiniPDF:
    """The fpdf subset the report sink needs. Sizes in mm, origin top-left."""

    def __init__(self, w_mm: float = 210.0, h_mm: float = 297.0):
        self.w, self.h = w_mm, h_mm
        self.l_margin = self.t_margin = self.r_margin = 10.0
        self.b_margin = 20.0
        self.x = self.l_margin
        self.y = self.t_margin
        self.font_style = ""
        self.font_size = 12.0
        self.text_color = (0, 0, 0)
        self.fill_color = (255, 255, 255)
        self.pages: list[list[str]] = []
        self.images: list[tuple[int, int, bytes]] = []  # (w_px, h_px, rgb)
        self._page_images: list[list[tuple[int, float, float, float, float]]] = []
        self.alias = "{nb}"
        self._last_h = 0.0
        self._in_footer = False

    # ------------------------------------------------------------ hooks
    def header(self) -> None:  # overridden by subclasses
        pass

    def footer(self) -> None:
        pass

    # ------------------------------------------------------------ state
    def _preserving_state(self, fn) -> None:
        """Run a header/footer hook with the caller's text state saved and
        restored (fpdf does the same): a mid-cell auto page break must not
        leave the watermark's 20pt bold font active for the remaining
        body lines."""
        keep = (
            self.font_style,
            self.font_size,
            self.text_color,
            self.fill_color,
            self._last_h,
        )
        fn()
        (
            self.font_style,
            self.font_size,
            self.text_color,
            self.fill_color,
            self._last_h,
        ) = keep

    def _run_footer(self) -> None:
        # footer writes below the break trigger; suppress auto page break
        # while inside it (fpdf's in_footer flag)
        self._in_footer = True
        self._preserving_state(self.footer)
        self._in_footer = False

    def add_page(self) -> None:
        if self.pages:
            self._run_footer()
        self.pages.append([])
        self._page_images.append([])
        self.x, self.y = self.l_margin, self.t_margin
        self._preserving_state(self.header)

    def page_no(self) -> int:
        return len(self.pages)

    def set_font(self, family: str, style: str = "", size: float | None = None) -> None:
        del family  # Arial/Helvetica both map to core Helvetica, like fpdf
        self.font_style = "".join(sorted(style.upper()))
        if size is not None:
            self.font_size = float(size)

    def set_text_color(self, r: int, g: int = None, b: int = None) -> None:
        g = r if g is None else g
        b = r if b is None else b
        self.text_color = (r, g, b)

    def set_fill_color(self, r: int, g: int = None, b: int = None) -> None:
        g = r if g is None else g
        b = r if b is None else b
        self.fill_color = (r, g, b)

    def get_y(self) -> float:
        return self.y

    def ln(self, h: float | None = None) -> None:
        self.x = self.l_margin
        self.y += self._last_h if h is None else h

    def get_string_width(self, s: str) -> float:
        tbl = WIDTHS[self.font_style]
        total = 0
        for ch in s:
            o = ord(ch)
            total += tbl[o - 32] if 32 <= o <= 126 else 556
        return total * self.font_size / 1000.0 / K  # mm

    # ------------------------------------------------------------ output ops
    def _out(self, op: str) -> None:
        if not self.pages:
            self.add_page()
        self.pages[-1].append(op)

    def _color_op(self, rgb, stroke=False) -> str:
        r, g, b = (v / 255.0 for v in rgb)
        return f"{r:.3f} {g:.3f} {b:.3f} {'RG' if stroke else 'rg'}"

    def _text_at(self, x_mm: float, y_mm: float, s: str) -> None:
        fname = FONT_NAMES[self.font_style]
        self._out(
            f"BT /{fname} {self.font_size:.2f} Tf {self._color_op(self.text_color)} "
            f"{x_mm * K:.2f} {(self.h - y_mm) * K:.2f} Td ({_esc(s)}) Tj ET"
        )

    def text(self, x: float, y: float, txt: str) -> None:
        """Raw positioned text (baseline at y), like fpdf.text — used by
        the watermark tiling."""
        self._text_at(x, y, txt)

    # ------------------------------------------------------------ layout ops
    def _maybe_break(self, h: float) -> None:
        if not self._in_footer and self.y + h > self.h - self.b_margin:
            self.add_page()

    def cell(
        self,
        w: float,
        h: float,
        txt: str = "",
        border: int = 0,
        ln: int = 0,
        align: str = "L",
        fill: bool = False,
    ) -> None:
        self._maybe_break(h)
        if w == 0:
            w = self.w - self.r_margin - self.x
        if fill:
            self._out(
                f"{self._color_op(self.fill_color)} "
                f"{self.x * K:.2f} {(self.h - self.y - h) * K:.2f} {w * K:.2f} {h * K:.2f} re f"
            )
        if border:
            self._out(
                f"0 0 0 RG {self.x * K:.2f} {(self.h - self.y - h) * K:.2f} "
                f"{w * K:.2f} {h * K:.2f} re S"
            )
        if txt:
            tw = self.get_string_width(txt)
            if align == "C":
                tx = self.x + (w - tw) / 2
            elif align == "R":
                tx = self.x + w - tw
            else:
                tx = self.x
            # baseline ~72% down the cell box
            self._text_at(tx, self.y + h * 0.72, txt)
        self._last_h = h
        if ln == 1:
            self.x = self.l_margin
            self.y += h
        else:
            self.x += w

    def _wrap(self, txt: str, w_mm: float) -> list[str]:
        lines: list[str] = []
        for para in txt.split("\n"):
            if not para:
                lines.append("")
                continue
            cur = ""
            for word in para.split(" "):
                cand = word if not cur else cur + " " + word
                if self.get_string_width(cand) <= w_mm or not cur:
                    cur = cand
                else:
                    lines.append(cur)
                    cur = word
            lines.append(cur)
        return lines

    def multi_cell(self, w: float, h: float, txt: str) -> None:
        if w == 0:
            w = self.w - self.r_margin - self.x
        for line in self._wrap(txt, w):
            self._maybe_break(h)
            if line:
                self._text_at(self.x, self.y + h * 0.72, line)
            self.y += h
        self.x = self.l_margin
        self._last_h = h

    # ------------------------------------------------------------ rotation
    def rotation(self, angle_deg: float, x: float, y: float) -> None:
        """Open a rotated coordinate frame around (x, y) mm — caller must
        close with end_rotation() (reference generate_reports.py:36-44)."""
        a = math.radians(angle_deg)
        c, s = math.cos(a), math.sin(a)
        cx, cy = x * K, (self.h - y) * K
        self._out(
            f"q {c:.5f} {s:.5f} {-s:.5f} {c:.5f} {cx:.5f} {cy:.5f} cm "
            f"1 0 0 1 {-cx:.5f} {-cy:.5f} cm"
        )

    def end_rotation(self) -> None:
        self._out("Q")

    # ------------------------------------------------------------ images
    def image_rgb(self, rgb: bytes, w_px: int, h_px: int, x: float, y: float, w: float) -> None:
        """Place a raw RGB buffer (e.g. minipng.Canvas.rgb_bytes()) at
        (x, y) mm scaled to w mm wide (aspect preserved)."""
        self.images.append((w_px, h_px, rgb))
        idx = len(self.images)
        h_mm = w * h_px / w_px
        if not self.pages:
            self.add_page()
        self._page_images[-1].append((idx, x, y, w, h_mm))
        self._out(
            f"q {w * K:.2f} 0 0 {h_mm * K:.2f} {x * K:.2f} "
            f"{(self.h - y - h_mm) * K:.2f} cm /Im{idx} Do Q"
        )

    # ------------------------------------------------------------ serialize
    def output(self) -> bytes:
        if self.pages:
            self._run_footer()
        n_pages = len(self.pages)
        objs: list[bytes] = []

        def add(body: bytes) -> int:
            objs.append(body)
            return len(objs)

        font_ids = {
            style: add(
                f"<< /Type /Font /Subtype /Type1 /BaseFont /{name} "
                f"/Encoding /WinAnsiEncoding >>".encode()
            )
            for style, name in FONT_NAMES.items()
        }
        image_ids = []
        for w_px, h_px, rgb in self.images:
            data = zlib.compress(rgb, 9)
            body = (
                f"<< /Type /XObject /Subtype /Image /Width {w_px} /Height {h_px} "
                f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
                f"/Length {len(data)} >>\nstream\n".encode()
                + data
                + b"\nendstream"
            )
            image_ids.append(add(body))

        content_ids = []
        for i, ops in enumerate(self.pages):
            stream = "\n".join(ops).replace("{nb}", str(n_pages)).encode("latin-1")
            content_ids.append(
                add(f"<< /Length {len(stream)} >>\nstream\n".encode() + stream + b"\nendstream")
            )

        pages_id = len(objs) + n_pages + 1
        page_ids = []
        for i in range(n_pages):
            fonts = " ".join(f"/{FONT_NAMES[s]} {font_ids[s]} 0 R" for s in FONT_NAMES)
            xobjs = ""
            if self._page_images[i]:
                entries = " ".join(
                    f"/Im{idx} {image_ids[idx - 1]} 0 R" for idx, *_ in self._page_images[i]
                )
                xobjs = f" /XObject << {entries} >>"
            page_ids.append(
                add(
                    f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox "
                    f"[0 0 {self.w * K:.2f} {self.h * K:.2f}] /Contents {content_ids[i]} 0 R "
                    f"/Resources << /Font << {fonts} >>{xobjs} >> >>".encode()
                )
            )
        kids = " ".join(f"{pid} 0 R" for pid in page_ids)
        add(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
        catalog_id = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

        out = bytearray(b"%PDF-1.4\n")
        offsets = [0]
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root {catalog_id} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n".encode()
        )
        return bytes(out)
