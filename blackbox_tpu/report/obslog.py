"""Nightly observation log: header-key table + red-flag summary + email.

Rebuild of the reference's ``create_obslog``/``send_email``
(/root/reference/blackbox.py:3280-3656): scan the night's raw+reduced
trees, extract the standard key set per frame into an ASCII table,
count QC colors, and optionally email the log.  The weather-page
screenshot (wkhtmltoimage) is intentionally out of scope for the
framework core (SURVEY.md §2.4 marks it optional/host-side).
"""

from __future__ import annotations

import os
import smtplib
from email.message import EmailMessage
from typing import Optional

from blackbox_tpu.io.fits import read_fits
from blackbox_tpu.io.storage import get_backend, list_files
from blackbox_tpu.orchestration.paths import DataTree, base_name

# the reference's full 21-key obslog column set (blackbox.py:3359-3362;
# ORIGFILE becomes FILENAME) plus three framework extras the operators
# read nightly (NOBJECTS, T-NTRANS, TQC-FLAG)
OBSLOG_KEYS = [
    "FILENAME", "IMAGETYP", "DATE-OBS", "PROGNAME", "PROGID", "OBJECT",
    "FILTER", "EXPTIME", "RA", "DEC", "AIRMASS", "FOCUSPOS",
    "S-SEEING", "CL-BASE", "RH-MAST", "WINDAVE", "LIMMAG", "QC-FLAG",
    "QCRED1", "QCRED2", "QCRED3",
    "NOBJECTS", "T-NTRANS", "TQC-FLAG", "N-SSO",
]

IMGTYPES = ("bias", "dark", "flat", "object")


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


def night_summary(tree: DataTree, date: str, telescope: str,
                  rows=None) -> str:
    """Per-imgtype raw/reduced counts + catalog red-flag counts: the
    reference's email body (blackbox.py:3500-3545)."""
    raw = {t: 0 for t in IMGTYPES}
    for p in list_files(os.path.join(tree.raw_dir(date), "*.fits*")):
        name = os.path.basename(p).lower()
        kind = next((t for t in IMGTYPES[:3] if t in name), "object")
        raw[kind] += 1

    red = {t: 0 for t in IMGTYPES}
    ncat = nred_cat = ntrans = nred_trans = nsso = nsso_dum = 0
    rows = rows if rows is not None else collect_night(tree, date)
    for r in rows:
        kind = _s(r.get("IMAGETYP")).lower()
        red[kind if kind in IMGTYPES else "object"] += 1
        if r.get("NOBJECTS") is not None or kind == "object":
            ncat += 1
            nred_cat += _s(r.get("QC-FLAG")) == "red"
        if r.get("T-NTRANS") is not None:
            ntrans += 1
            nred_trans += _s(r.get("TQC-FLAG")) == "red"
        if r.get("N-SSO") is not None:
            nsso += 1
            nsso_dum += not r.get("N-SSO")

    def _per(c):
        return (f"{sum(c.values())} ({c['bias']} biases, {c['dark']} "
                f"darks, {c['flat']} flats, {c['object']} objects)")

    return "\n".join([
        f"{telescope}: summary of {date} observations:",
        "-" * 40,
        f"# raw images:       {_per(raw)}",
        f"# reduced images:   {_per(red)}",
        f"# full-source cats: {ncat} ({nred_cat} red-flagged)",
        f"# transient cats:   {ntrans} ({nred_trans} red-flagged)",
        f"# SSO cats:         {nsso} ({nsso_dum} empty)",
    ]) + "\n"


def create_obslog(tree: DataTree, date: str, telescope: str,
                  email_to: Optional[str] = None,
                  smtp_host: str = "localhost") -> str:
    """Write the obslog into the night's red dir; optionally email it
    with the night-summary body and the table attached (reference
    create_obslog, blackbox.py:3280-3578)."""
    rows = collect_night(tree, date)
    summary = night_summary(tree, date, telescope, rows=rows)
    text = summary + "\n" + format_obslog(rows, date, telescope)
    rdir = tree.red_dir(date)
    path = os.path.join(rdir, f"{telescope}_{date}_obslog.txt")
    get_backend(path).write_bytes(path, text.encode())
    if email_to:
        send_email(email_to, f"{telescope} night report {date}", summary,
                   smtp_host=smtp_host,
                   attachments=((os.path.basename(path), text.encode()),))
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
