"""Nightly observation log: header-key table + red-flag summary + email.

Rebuild of the reference's ``create_obslog``/``send_email``
(/root/reference/blackbox.py:3280-3656): scan the night's raw+reduced
trees, extract the standard key set per frame into an ASCII table,
count QC colors, and optionally email the log.  The weather-page
screenshot (wkhtmltoimage) is intentionally out of scope for the
framework core (SURVEY.md §2.4 marks it optional/host-side).
"""

from __future__ import annotations

import io
import os
import smtplib
from email.message import EmailMessage
from typing import Optional

from blackbox_tpu.io.fits import read_fits
from blackbox_tpu.io.storage import get_backend, list_files
from blackbox_tpu.orchestration.paths import DataTree, base_name

# the reference's 21-key obslog column set (blackbox.py:3334-3343)
OBSLOG_KEYS = [
    "FILENAME", "IMAGETYP", "DATE-OBS", "EXPTIME", "FILTER", "OBJECT",
    "AIRMASS", "S-SEEING", "CL-BASE", "RDNOISE", "NOBJECTS",
    "PC-ZP", "PC-ZPSTD", "LIMMAG", "T-NTRANS", "QC-FLAG", "TQC-FLAG",
]


def _header_of(path):
    for data, h in read_fits(path):
        if "IMAGETYP" in h or "QC-FLAG" in h:
            return h
    return read_fits(path)[0][1]


def collect_night(tree: DataTree, date: str) -> list:
    """One row dict per reduced frame of the night."""
    rows = []
    for sub in ("object", "bias", "dark", "flat"):
        rdir = tree.red_dir(date, sub)
        for p in list_files(os.path.join(rdir, "*_red_hdr.fits")) or []:
            try:
                h = _header_of(p)
            except Exception:
                continue
            row = {"FILENAME": base_name(p)[:-len("_red_hdr")]}
            for k in OBSLOG_KEYS[1:]:
                row[k] = h.get(k)
            rows.append(row)
        # calibration frames carry headers inside the fz products
        if sub != "object":
            for p in list_files(os.path.join(rdir, "*_red.fits.fz")):
                try:
                    h = _header_of(p)
                except Exception:
                    continue
                row = {"FILENAME": base_name(p)[:-len("_red")]}
                for k in OBSLOG_KEYS[1:]:
                    row[k] = h.get(k)
                rows.append(row)
    rows.sort(key=lambda r: str(r.get("DATE-OBS")))
    return rows


def format_obslog(rows, date: str, telescope: str) -> str:
    """Fixed-width ASCII table + QC summary."""
    cols = OBSLOG_KEYS
    widths = {c: max(len(c), *(len(_s(r.get(c))) for r in rows))
              if rows else len(c) for c in cols}
    lines = [f"# Observation log  {telescope}  night {date}",
             f"# frames: {len(rows)}"]
    counts = {}
    for r in rows:
        counts[_s(r.get("QC-FLAG"))] = counts.get(_s(r.get("QC-FLAG")),
                                                  0) + 1
    lines.append("# QC: " + "  ".join(f"{k}={v}"
                                      for k, v in sorted(counts.items())))
    lines.append(" ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        lines.append(" ".join(_s(r.get(c)).ljust(widths[c])
                              for c in cols))
    return "\n".join(lines) + "\n"


def _s(v) -> str:
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v).strip()


def create_obslog(tree: DataTree, date: str, telescope: str,
                  email_to: Optional[str] = None,
                  smtp_host: str = "localhost") -> str:
    """Write the obslog into the night's red dir; optionally email it."""
    rows = collect_night(tree, date)
    text = format_obslog(rows, date, telescope)
    rdir = tree.red_dir(date)
    path = os.path.join(rdir, f"{telescope}_{date}_obslog.txt")
    get_backend(path).write_bytes(path, text.encode())
    if email_to:
        send_email(email_to, f"{telescope} obslog {date}", text,
                   smtp_host=smtp_host)
    return path


def send_email(to: str, subject: str, body: str,
               sender: str = "blackbox-tpu@localhost",
               smtp_host: str = "localhost", attachments=()):
    """SMTP nightly report (reference send_email, blackbox.py:3612-3656)."""
    msg = EmailMessage()
    msg["From"] = sender
    msg["To"] = to
    msg["Subject"] = subject
    msg.set_content(body)
    for name, data in attachments:
        msg.add_attachment(data, maintype="application",
                           subtype="octet-stream", filename=name)
    with smtplib.SMTP(smtp_host) as s:
        s.send_message(msg)
