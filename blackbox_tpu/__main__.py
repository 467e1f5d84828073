"""Command-line entry point (reference CLI parity, blackbox.py:8128-8213).

    python -m blackbox_tpu --telescope ML1 --mode day --date 20260301
    python -m blackbox_tpu --image /data/ML1/raw/.../frame.fits
    python -m blackbox_tpu --master_date 20260301
    python -m blackbox_tpu --obslog 20260301
"""

from __future__ import annotations

import argparse
import logging
import sys


def str2bool(v) -> bool:
    """Tolerant boolean flag parsing (reference str2bool, 8115-8123)."""
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("yes", "true", "t", "y", "1"):
        return True
    if str(v).lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean expected, got {v!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="blackbox_tpu",
        description="TPU-native survey image-reduction pipeline")
    p.add_argument("--telescope", default="ML1",
                   help="ML1|BG2|BG3|BG4 (default ML1)")
    p.add_argument("--mode", default="day", choices=["day", "night"],
                   help="batch a date or stream arrivals")
    p.add_argument("--date", default=None,
                   help="observing night yyyymmdd")
    p.add_argument("--image", default=None, help="reduce one raw frame")
    p.add_argument("--image_list", default=None,
                   help="file with one raw frame per line")
    p.add_argument("--imgtypes", default=None,
                   help="comma list: bias,dark,flat,object")
    p.add_argument("--filters", default="q", help="comma list of filters")
    p.add_argument("--img_reduce", type=str2bool, default=True)
    p.add_argument("--cat_extract", type=str2bool, default=True)
    p.add_argument("--trans_extract", type=str2bool, default=True)
    p.add_argument("--force_reproc_new", type=str2bool, default=False)
    p.add_argument("--master_date", default=None,
                   help="build masters for this date and exit")
    p.add_argument("--obslog", default=None,
                   help="write the obslog for this date and exit")
    p.add_argument("--buildref", default=None, metavar="FIELD_ID",
                   help="build the reference co-add for this field")
    p.add_argument("--data_root", default=".",
                   help="root of the per-telescope data tree")
    p.add_argument("--geometry", default="meerlicht",
                   choices=["meerlicht", "tiny"],
                   help="detector geometry (tiny = smoke tests)")
    p.add_argument("--keep_tmp", type=str2bool, default=False)
    p.add_argument("--max_runtime_s", type=float, default=None,
                   help="night mode: stop after this many seconds")
    p.add_argument("--finding_chart", nargs=3, default=None,
                   metavar=("RA", "DEC", "FITS_RED"),
                   help="render a finding chart: RA (deg or sexagesimal "
                        "hours), DEC (deg or sexagesimal), reduced "
                        "product path (.fits[.fz|.gz], POSIX or gs://)")
    p.add_argument("--target_name", default=None,
                   help="finding chart: target name")
    p.add_argument("--size_arcmin", type=float, default=3.0,
                   help="finding chart size [arcmin]")
    p.add_argument("--output_format", default="pdf",
                   choices=["pdf", "jpg", "png"],
                   help="finding chart output format")
    p.add_argument("--run_id", default=None, help="finding chart: ESO run")
    p.add_argument("--pi_name", default=None, help="finding chart: PI")
    p.add_argument("--ob_name", default=None, help="finding chart: OB")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)sUTC %(process)d %(levelname)s "
               "%(funcName)s:%(lineno)d %(message)s")

    if args.finding_chart:
        # standalone tool, no pipeline construction (reference ships
        # finding_chart.py as its own CLI, finding_chart.py:56-328)
        from blackbox_tpu.report.finding_chart import chart_from_product
        ra, dec, fits_red = args.finding_chart
        out = chart_from_product(
            fits_red, ra, dec, size_arcmin=args.size_arcmin,
            target_name=args.target_name,
            output_format=args.output_format,
            info={"run": args.run_id, "PI": args.pi_name,
                  "OB": args.ob_name})
        print(out)
        return 0

    from blackbox_tpu.config.defaults import ReductionSettings
    from blackbox_tpu.orchestration.paths import DataTree
    from blackbox_tpu.pipeline.driver import Pipeline

    from blackbox_tpu.core.geometry import MEERLICHT, TINY
    settings = ReductionSettings(
        geometry=TINY if args.geometry == "tiny" else MEERLICHT)
    # --data_root beats the configured run_dir (reference proc_env
    # directory trees, set_blackbox.py:89-153)
    root = args.data_root if args.data_root != "." \
        else (settings.run_dir or ".")
    tree = DataTree(root, args.telescope)
    settings.img_reduce = args.img_reduce
    settings.cat_extract = args.cat_extract
    settings.trans_extract = args.trans_extract
    pipe = Pipeline(tree, args.telescope, settings)

    if args.obslog:
        from blackbox_tpu.report.obslog import create_obslog
        path = create_obslog(tree, args.obslog, args.telescope)
        print(path)
        return 0

    if args.buildref:
        from blackbox_tpu.pipeline.buildref import build_reference
        ok = True
        for filt in args.filters.split(","):
            status, info = build_reference(tree, args.telescope,
                                           int(args.buildref), filt)
            print(f"field {args.buildref} {filt}: {status} {info}")
            ok &= status in ("published", "not_deeper")
        return 0 if ok else 1

    if args.master_date:
        from blackbox_tpu.orchestration.scheduler import create_masters
        out = create_masters(pipe, args.master_date,
                             filters=args.filters.split(","))
        bad = [k for k, v in out.items() if v is None]
        print(f"masters built: {len(out) - len(bad)}/{len(out)}")
        return 1 if bad else 0

    kw = dict(img_reduce=args.img_reduce, cat_extract=args.cat_extract,
              trans_extract=args.trans_extract,
              force=args.force_reproc_new)

    if args.image:
        r = pipe.process_file(args.image, **kw)
        print(f"{args.image}: {r.status} qc={r.qc_flag} "
              f"{r.error or ''}".strip())
        return 0 if r.status in ("reduced", "skipped") else 1

    if args.image_list:
        from blackbox_tpu.orchestration.scheduler import sort_files
        with open(args.image_list) as fh:
            paths = [ln.strip() for ln in fh if ln.strip()]
        nbad = 0
        for p in sort_files(paths):
            r = pipe.process_file(p, **kw)
            print(f"{p}: {r.status} {r.error or ''}".strip())
            nbad += r.status == "error"
        return 1 if nbad else 0

    if not args.date:
        print("need --date, --image, --image_list, --master_date or "
              "--obslog", file=sys.stderr)
        return 2

    if args.mode == "day":
        from blackbox_tpu.orchestration.scheduler import run_day
        rep = run_day(pipe, args.date, force=args.force_reproc_new)
        print(f"processed={rep.nprocessed} reduced={rep.nreduced} "
              f"skipped={rep.nskipped} rejected={rep.nrejected} "
              f"errors={rep.nerror}")
        return 1 if rep.nerror else 0
    else:
        from blackbox_tpu.orchestration.scheduler import run_night
        rep = run_night(pipe, args.date,
                        max_runtime_s=args.max_runtime_s)
        print(f"processed={rep.nprocessed} reduced={rep.nreduced} "
              f"errors={rep.nerror}")
        return 1 if rep.nerror else 0


if __name__ == "__main__":
    sys.exit(main())
