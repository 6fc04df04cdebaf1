"""CLI twin of the reference's generate_*/update_* scripts, on Spark.

    python scripts/vegindex_job.py gcc-summary  --archive DIR --site S \
        --roi DB_0001 [--nday 3] [--nmin 1] [--out PATH] [--master local[8]]
    python scripts/vegindex_job.py ndvi-summary --archive DIR --site S --roi ...
    python scripts/vegindex_job.py update-gcc   --archive DIR --site S --roi ...
    python scripts/vegindex_job.py update-ndvi  --archive DIR --site S --roi ...
    python scripts/vegindex_job.py generate-roi|update-roi|generate-ir|update-ir \
        --archive DIR --site S --roi ... --lat L --lon L [--codec fake]
    python scripts/vegindex_job.py generate-ndvi --archive DIR --site S --roi ...

Reads the canonical roistats / NDVI CSVs via sources.catalog, runs the
flagship pipelines (operators/vegindex_summary), and writes the result
in the reference's headered-CSV summary format (write_headered_csv) at
the canonical path (``{site}_{roi}_{nday}day.csv`` next to the inputs)
unless --out overrides. Mirrors generate_summary_timeseries.py /
generate_ndvi_summary_timeseries.py / update_summary_timeseries.py CLI
semantics (plus update_ndvi_summary_timeseries.py for update-ndvi)
with explicit QC-threshold flags.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stamps(existing_props: dict[str, str] | None = None) -> dict[str, str]:
    """Creation/Update stamps. Updates PRESERVE the existing file's
    Creation Date/Time (the reference reads created_at back from the
    header and re-writes it, gcctimeseries readCSV/writeCSV) and bump
    only the Update stamps."""
    now = dt.datetime.now()
    d, t = now.strftime("%Y-%m-%d"), now.strftime("%H:%M:%S")
    ex = existing_props or {}
    return {
        "Creation Date": ex.get("Creation Date", d),
        "Creation Time": ex.get("Creation Time", t),
        "Update Date": d,
        "Update Time": t,
    }


def _site_props(args) -> dict[str, str]:
    """Site/ROI identity + location block shared by every header family
    (Lat/Lon/Elev written when provided — the reference always carries
    them from site info, and its readers fall back to config defaults
    when absent)."""
    roitype, seqno = args.roi.split("_")
    p = {"Site": args.site, "Veg Type": roitype, "ROI ID Number": seqno}
    if args.lat is not None:
        p["Lat"] = str(args.lat)
    if args.lon is not None:
        p["Lon"] = str(args.lon)
    if args.elev is not None:
        p["Elev"] = str(args.elev)
    p["UTC Offset"] = str(args.tzoffset)
    return p


def build_props(
    args, nday: int, existing_props: dict[str, str] | None = None
) -> dict[str, str]:
    """Summary-family header (gcctimeseries.py:584-625 /
    ndvi_summary_timeseries.py:502-541 field set and order)."""
    p = _site_props(args)
    p.update(
        {
            "Image Count Threshold": str(args.nmin),
            "Aggregation Period": str(nday),
            "Solar Elevation Min": str(args.sunelev_min),
            "Time of Day Min": args.tod_min,
            "Time of Day Max": args.tod_max,
            "ROI Brightness Min": str(int(args.brt_min)),
            "ROI Brightness Max": str(int(args.brt_max)),
        }
    )
    p.update(_stamps(existing_props))
    return p


def build_tier1_props(
    args, existing_props: dict[str, str] | None = None, resize: bool = False
) -> dict[str, str]:
    """Tier-1 header family (roitimeseries.py:746-755 /
    ir_roitimeseries.py:498-506 / generate_ndvi_timeseries.py:265-273):
    identity + location + Resize Flag + Version, no QC-threshold keys.
    The Resize Flag round-trips: persisted on generate
    (roitimeseries.py:754), honored on update when re-read from the
    existing header (roitimeseries.py:871-874)."""
    p = _site_props(args)
    p.update({"Resize Flag": str(bool(resize)), "Version": "1"})
    p.update(_stamps(existing_props))
    return p


def check_update_thresholds(existing_props: dict[str, str], args, nday: int) -> None:
    """The reference update refuses to mix QC regimes: the requested
    thresholds must match the existing file's header or it exits 1
    (update_summary_timeseries.py:160-177; it checks nmin / brt_min /
    brt_max / tod_min / sunelev_min — tod_max and nday are checked here
    too, same refusal). Keys absent from the header are skipped."""

    def _num(s: str) -> float | str:
        try:
            return float(s)
        except ValueError:
            return s.strip()

    wanted = {
        "Image Count Threshold": args.nmin,
        "Aggregation Period": nday,
        "Solar Elevation Min": args.sunelev_min,
        "Time of Day Min": args.tod_min,
        "Time of Day Max": args.tod_max,
        "ROI Brightness Min": args.brt_min,
        "ROI Brightness Max": args.brt_max,
    }
    for key, want in wanted.items():
        if key not in existing_props:
            continue
        have = _num(existing_props[key])
        want_n = _num(str(want))
        if (
            isinstance(have, float)
            and isinstance(want_n, float)
            and have == want_n
        ) or str(have) == str(want_n):
            continue
        sys.stderr.write(
            f"{key} requested ({want}) doesn't match CSV header ({existing_props[key]})\n"
        )
        sys.exit(1)


def main(argv: list[str] | None = None) -> str:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "job",
        choices=[
            "gcc-summary", "ndvi-summary", "update-gcc", "update-ndvi",
            "generate-roi", "update-roi", "generate-ir", "update-ir",
            "generate-ndvi", "plot-roistats",
        ],
    )
    ap.add_argument("--archive", required=True)
    ap.add_argument("--site", required=True)
    ap.add_argument("--roi", required=True, help="e.g. DB_0001")
    ap.add_argument("--nday", type=int, default=3)
    ap.add_argument("--nmin", type=int, default=1)
    ap.add_argument("--tod-min", default="00:00:00")
    ap.add_argument("--tod-max", default="23:59:59")
    ap.add_argument("--sunelev-min", type=float, default=10.0)
    ap.add_argument("--brt-min", type=float, default=100.0)
    ap.add_argument("--brt-max", type=float, default=665.0)
    ap.add_argument(
        "--ndvi-qc", choices=["reference", "conjunctive"], default="reference",
        help="NDVI summary row selection: 'reference' = NDVI range filter "
             "only (bug-compatible with generate_ndvi_summary_timeseries.py, "
             "whose filter_rows call discards the select_rows result); "
             "'conjunctive' = QC thresholds AND the NDVI range filter",
    )
    ap.add_argument("--lat", type=float, default=None, help="site latitude (roi jobs)")
    ap.add_argument("--lon", type=float, default=None, help="site longitude (roi jobs)")
    ap.add_argument("--elev", type=float, default=None, help="site elevation (header)")
    ap.add_argument("--tzoffset", type=float, default=0.0)
    ap.add_argument(
        "--resize", action="store_true",
        help="resize images to mask dims when they differ (reference "
             "resizeFlg, roitimeseries.py:426-433); persisted in the CSV "
             "header as 'Resize Flag' and re-read on update jobs",
    )
    ap.add_argument(
        "--codec", choices=["none", "fake"], default="none",
        help="image codec for roi jobs: 'fake' = deterministic seed codec "
             "(tests); 'none' requires decode injection via the API",
    )
    ap.add_argument(
        "--width", type=int, default=1600,
        help="plot-roistats: M4 pre-reduction width in device pixels",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from python_vegindex_spark.session import get_spark
    from python_vegindex_spark.sources import catalog
    from python_vegindex_spark.sources.csv_compat import write_headered_csv
    from python_vegindex_spark.operators.vegindex_summary import (
        generate_gcc_summary,
        generate_ndvi_summary_table,
        update_gcc_summary,
        update_ndvi_summary,
    )

    spark = get_spark("vegindex-job", master=args.master)
    existing_props = None
    qc = dict(
        tod_min=args.tod_min, tod_max=args.tod_max,
        sunelev_min=args.sunelev_min, brt_min=args.brt_min, brt_max=args.brt_max,
    )
    roi_dir = os.path.join(args.archive, args.site, "ROI")

    if args.job == "gcc-summary":
        roistats, _ = catalog.get_roi_timeseries(spark, args.archive, args.site, args.roi)
        out = generate_gcc_summary(roistats, nday=args.nday, nmin=args.nmin, **qc)
        default = f"{args.site}_{args.roi}_{args.nday}day.csv"
    elif args.job == "ndvi-summary":
        ndvits, _ = catalog.get_ndvi_timeseries(spark, args.archive, args.site, args.roi)
        out = generate_ndvi_summary_table(
            ndvits, nday=args.nday, nmin=args.nmin, qc_mode=args.ndvi_qc, **qc
        )
        default = f"{args.site}_{args.roi}_ndvi_{args.nday}day.csv"
    elif args.job == "update-gcc":
        existing, existing_props = catalog.get_gcc_timeseries(
            spark, args.archive, args.site, args.roi, nday=args.nday, nmin=0
        )  # nmin=0: take stored values as-is; the regenerate applies tiering
        check_update_thresholds(existing_props, args, args.nday)
        roistats, _ = catalog.get_roi_timeseries(spark, args.archive, args.site, args.roi)
        out = update_gcc_summary(existing, roistats, nday=args.nday, nmin=args.nmin, **qc)
        default = f"{args.site}_{args.roi}_{args.nday}day.csv"
    elif args.job == "update-ndvi":  # update_ndvi_summary_timeseries.py twin
        existing, existing_props = catalog.get_ndvi_summary(
            spark, args.archive, args.site, args.roi, nday=args.nday, nmin=0
        )
        check_update_thresholds(existing_props, args, args.nday)
        ndvits, _ = catalog.get_ndvi_timeseries(spark, args.archive, args.site, args.roi)
        out = update_ndvi_summary(
            existing, ndvits, nday=args.nday, nmin=args.nmin, qc_mode=args.ndvi_qc, **qc
        )
        default = f"{args.site}_{args.roi}_ndvi_{args.nday}day.csv"
    elif args.job in ("generate-roi", "update-roi", "generate-ir", "update-ir"):
        # E1: archive -> tier-1 roistats / IR roistats
        # (generate/update_roi[_ir]_timeseries.py twins)
        from python_vegindex_spark.operators.roi_pipeline import (
            fake_decode,
            generate_roi_ir_stats,
            generate_roi_stats,
            update_roi_ir_stats,
            update_roi_stats,
        )

        if args.lat is None or args.lon is None:
            ap.error("--lat/--lon are required for roi jobs")
        decode = fake_decode if args.codec == "fake" else None
        kw = dict(
            lat=args.lat, lon=args.lon, tzoffset=args.tzoffset, decode_fn=decode,
            resize_to_mask=args.resize,
        )
        is_ir = args.job.endswith("-ir")
        gen = generate_roi_ir_stats if is_ir else generate_roi_stats
        upd = update_roi_ir_stats if is_ir else update_roi_stats
        get = (
            catalog.get_roi_ir_timeseries if is_ir else catalog.get_roi_timeseries
        )
        if args.job.startswith("generate"):
            out = gen(spark, args.archive, args.site, args.roi, **kw)
        else:
            existing, existing_props = get(spark, args.archive, args.site, args.roi)
            # the existing header wins (roitimeseries.py:871-874: readCSV
            # sets resizeFlg from the 'Resize Flag' comment; the update
            # script then processes new images under that regime)
            if "Resize Flag" in (existing_props or {}):
                kw["resize_to_mask"] = existing_props["Resize Flag"] == "True"
            out = upd(existing, spark, args.archive, args.site, args.roi, **kw)
        out = out.drop("ts")
        suffix = "IR_roistats" if is_ir else "roistats"
        default = f"{args.site}_{args.roi}_{suffix}.csv"
    elif args.job == "plot-roistats":
        # plot_roistats.py twin: chart-ready (layer, series, ts, gcc)
        # table — good/low-sun/brightness-filtered scatter partitions
        # M4-pre-reduced, plus the 3-day gcc_90 line; a PNG would need
        # matplotlib (absent here), the CSV renders anywhere
        from python_vegindex_spark.operators.plot_export import plot_roistats_table

        roistats, _ = catalog.get_roi_timeseries(spark, args.archive, args.site, args.roi)
        summary, _ = catalog.get_gcc_timeseries(
            spark, args.archive, args.site, args.roi, nday=args.nday
        )
        out = plot_roistats_table(
            roistats, summary, width=args.width,
            sunelev_min=args.sunelev_min, brt_min=args.brt_min,
            brt_max=args.brt_max,
        )
        default = f"{args.site}_{args.roi}_roistats_plot.csv"
    elif args.job == "generate-ndvi":
        # tier-1.5: RGB + IR roistats -> NDVI timeseries
        # (generate_ndvi_timeseries.py twin; it has no update twin in the
        # reference's console scripts either)
        from python_vegindex_spark.operators.paired import generate_ndvi_table

        rgb, _ = catalog.get_roi_timeseries(spark, args.archive, args.site, args.roi)
        ir, _ = catalog.get_roi_ir_timeseries(
            spark, args.archive, args.site, args.roi
        )
        out = generate_ndvi_table(rgb, ir).drop("ts")
        default = f"{args.site}_{args.roi}_NDVI_roistats.csv"

    path = args.out or os.path.join(roi_dir, default)
    tier1_jobs = (
        "generate-roi", "update-roi", "generate-ir", "update-ir", "generate-ndvi",
    )
    if args.job == "plot-roistats":
        # gcc included: two points in one pixel can share (layer,
        # series, ts) with different gcc (same-timestamp rows), so the
        # export ordering must be total for byte-identical re-runs
        sort_cols = ["layer", "series", "ts", "gcc"]
    elif args.job in tier1_jobs:
        sort_cols = ["date", "local_std_time"]
    else:
        sort_cols = ["date"]
    # per-family fixed formats: RGB and IR quantiles render as integers
    # (roitimeseries.py:662-689 / ir_roitimeseries.py format_csvrow
    # '{:.0f}'); the NDVI CSV is uniformly %.4f
    # (generate_ndvi_timeseries.py writeCSV float_format)
    float_decimals = None
    default_decimals = 5
    if args.job in ("generate-roi", "update-roi"):
        float_decimals = {
            f"{band}_{q}_qtl": 0
            for band in ("r", "g", "b")
            for q in (5, 10, 25, 50, 75, 90, 95)
        }
    elif args.job in ("generate-ir", "update-ir"):
        float_decimals = {f"ir_{q}_qtl": 0 for q in (5, 10, 25, 50, 75, 90, 95)}
    elif args.job == "generate-ndvi":
        default_decimals = 4

    # per-family header + banner (reference writeCSV prologues)
    banners = {
        "gcc-summary": f"{args.nday}-day summary product timeseries for {args.site}",
        "update-gcc": f"{args.nday}-day summary product timeseries for {args.site}",
        "ndvi-summary": f"{args.nday}-day NDVI summary timeseries for {args.site}",
        "update-ndvi": f"{args.nday}-day NDVI summary timeseries for {args.site}",
        "generate-roi": f"ROI color statistics timeseries for {args.site}",
        "update-roi": f"ROI color statistics timeseries for {args.site}",
        "generate-ir": f"ROI IR statistics timeseries for {args.site}",
        "update-ir": f"ROI IR statistics timeseries for {args.site}",
        "generate-ndvi": f"NDVI statistics timeseries for {args.site}",
        "plot-roistats": f"gcc plot export for {args.site} (M4 width {args.width})",
    }
    if args.job == "plot-roistats":
        props = _site_props(args)
        props.update({
            "Solar Elevation Min": str(args.sunelev_min),
            "ROI Brightness Min": str(int(args.brt_min)),
            "ROI Brightness Max": str(int(args.brt_max)),
            "M4 Width": str(args.width),
        })
        props.update(_stamps(None))
    elif args.job in tier1_jobs:
        resolved_resize = args.resize
        if args.job in ("update-roi", "update-ir") and "Resize Flag" in (
            existing_props or {}
        ):
            resolved_resize = existing_props["Resize Flag"] == "True"
        props = build_tier1_props(args, existing_props, resize=resolved_resize)
    else:
        props = build_props(args, args.nday, existing_props)

    # the reference's sub-threshold / no-data rows switch those fields to
    # plain '{}' (full float repr) — reproduce per row
    plain_rule = None
    if args.job in ("gcc-summary", "update-gcc"):
        from python_vegindex_spark.sources.summary_export import GCC_SUMMARY_FIELDS

        sub_plain = set(GCC_SUMMARY_FIELDS[10:27])  # stats + max_solar_elev
        zero_plain = set(GCC_SUMMARY_FIELDS[5:27])  # midday block too

        def plain_rule(row, nmin=args.nmin):  # gcctimeseries.py:497-531
            if row.image_count == 0:
                return zero_plain
            if row.image_count < nmin:
                return sub_plain
            return None

    elif args.job in ("ndvi-summary", "update-ndvi"):
        from python_vegindex_spark.sources.summary_export import NDVI_SUMMARY_FIELDS

        all_plain = set(NDVI_SUMMARY_FIELDS[6:14])  # midday_ndvi..max_solar_elev

        def plain_rule(row, nmin=args.nmin):  # ndvi_summary_timeseries.py:432-459
            return all_plain if row.image_count < nmin else None

    n = write_headered_csv(
        out, path, props, sort_cols=sort_cols,
        float_decimals=float_decimals, default_decimals=default_decimals,
        banner=banners[args.job], plain_cols_for_row=plain_rule,
    )
    print(f"WROTE {n} rows -> {path}")
    return path


if __name__ == "__main__":
    main()
