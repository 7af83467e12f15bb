#!/usr/bin/env python3
"""The cmd/cdcplot face (reference /root/reference/cmd/cdcplot/main.go):
per-algorithm charts -- chunk-size distribution, chunk-size CDF, resync
impact after edits, dedup ratio vs average chunk size -- rendered under
out/<algo>/. The reference draws PNGs with gonum/plot; this sandbox has no
plotting library, so the charts are hand-rendered SVG (no dependencies,
same four charts, one algorithm per chart, main.go:78-92's layout).

The DATA is computed by the engine's own Spark operators -- the same
relations the driver queries oracle-check (stats.length_histogram /
length_cdf / dedup_sweep, the resync shared-bytes join) -- so the pictures
are a rendering of already-verified relations, never a second
implementation of the math.

    python tools/cdcplot.py --synthetic 24 --out /tmp/graphs
    python tools/cdcplot.py --path DIR [--glob '*.bin'] --out /tmp/graphs \
        --chunkers fastcdc-v1.0.0,jc-v1.1.0 --kind all
"""

from __future__ import annotations

import argparse
import os
import sys
from xml.sax.saxutils import escape

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESYNC_STEPS = (0, 1, 2, 4, 8, 16, 32, 64)   # main.go:293
SWEEP_AVGS = (4096, 8192, 16384, 32768, 65536)  # main.go:319
W, H = 640, 400
ML, MR, MT, MB = 70, 20, 40, 50  # margins
FILL = "#4878cf"


def _sanitize(algo: str) -> str:
    return algo.replace("/", "_").replace(" ", "_")


# ---------------------------------------------------------------------------
# SVG primitives (driver-side, over tiny collected relations)
# ---------------------------------------------------------------------------

def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        return [lo]
    step = (hi - lo) / n
    return [lo + i * step for i in range(n + 1)]


def _fmt(v: float) -> str:
    if abs(v) >= 1000 and float(v).is_integer():
        return f"{int(v):,}"
    if float(v).is_integer():
        return str(int(v))
    return f"{v:.3g}"


def _frame(title: str, xlabel: str, ylabel: str, xlo, xhi, ylo, yhi,
           log_x: bool = False):
    """Returns (header_lines, x(), y()): the axes/labels/ticks plus data->px
    mappers. log_x mirrors the reference's dedup-sweep log scale."""
    import math

    def tx(v):
        if log_x:
            lo, hi = math.log(xlo), math.log(xhi)
            f = (math.log(v) - lo) / (hi - lo) if hi > lo else 0.5
        else:
            f = (v - xlo) / (xhi - xlo) if xhi > xlo else 0.5
        return ML + f * (W - ML - MR)

    def ty(v):
        f = (v - ylo) / (yhi - ylo) if yhi > ylo else 0.5
        return H - MB - f * (H - MT - MB)

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 {W} {H}" '
        f'font-family="sans-serif" font-size="11">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W / 2}" y="{MT - 18}" text-anchor="middle" '
        f'font-size="13">{escape(title)}</text>',
        f'<text x="{W / 2}" y="{H - 10}" text-anchor="middle">{escape(xlabel)}</text>',
        f'<text x="14" y="{H / 2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {H / 2})">{escape(ylabel)}</text>',
        f'<line x1="{ML}" y1="{H - MB}" x2="{W - MR}" y2="{H - MB}" stroke="black"/>',
        f'<line x1="{ML}" y1="{MT}" x2="{ML}" y2="{H - MB}" stroke="black"/>',
    ]
    xticks = ([xlo * (xhi / xlo) ** (i / 4) for i in range(5)]
              if log_x else _ticks(xlo, xhi))
    for v in xticks:
        px = tx(v)
        out.append(f'<line x1="{px:.1f}" y1="{H - MB}" x2="{px:.1f}" '
                   f'y2="{H - MB + 4}" stroke="black"/>')
        out.append(f'<text x="{px:.1f}" y="{H - MB + 16}" '
                   f'text-anchor="middle">{_fmt(v)}</text>')
    for v in _ticks(ylo, yhi):
        py = ty(v)
        out.append(f'<line x1="{ML - 4}" y1="{py:.1f}" x2="{ML}" '
                   f'y2="{py:.1f}" stroke="black"/>')
        out.append(f'<text x="{ML - 7}" y="{py + 3:.1f}" '
                   f'text-anchor="end">{_fmt(v)}</text>')
    return out, tx, ty


def svg_bars(title: str, xlabel: str, ylabel: str,
             bars: list[tuple[float, float, float]]) -> str:
    """bars = [(x0, x1, height)] -- the histogram (plotter.NewHist analogue)."""
    xlo = min(b[0] for b in bars)
    xhi = max(b[1] for b in bars)
    yhi = max((b[2] for b in bars), default=1) or 1
    out, tx, ty = _frame(title, xlabel, ylabel, xlo, xhi, 0, yhi)
    for x0, x1, n in bars:
        if n <= 0:
            continue
        px0, px1, py = tx(x0), tx(x1), ty(n)
        out.append(
            f'<rect x="{px0:.1f}" y="{py:.1f}" width="{max(px1 - px0, 0.5):.1f}" '
            f'height="{H - MB - py:.1f}" fill="{FILL}"/>')
    out.append("</svg>")
    return "\n".join(out)


def svg_line(title: str, xlabel: str, ylabel: str,
             pts: list[tuple[float, float]], log_x: bool = False,
             markers: bool = True) -> str:
    pts = sorted(pts)
    xlo, xhi = pts[0][0], pts[-1][0]
    ys = [p[1] for p in pts]
    ylo, yhi = min(0.0, min(ys)), max(ys) or 1
    out, tx, ty = _frame(title, xlabel, ylabel, max(xlo, 1e-9) if log_x else xlo,
                         xhi, ylo, yhi, log_x=log_x)
    path = " ".join(f"{tx(x):.1f},{ty(y):.1f}" for x, y in pts)
    out.append(f'<polyline points="{path}" fill="none" stroke="{FILL}" '
               f'stroke-width="1.5"/>')
    if markers:
        for x, y in pts:
            out.append(f'<circle cx="{tx(x):.1f}" cy="{ty(y):.1f}" r="3" '
                       f'fill="{FILL}"/>')
    out.append("</svg>")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# Chart builders: Spark relation -> collected points -> SVG file
# ---------------------------------------------------------------------------

def plot_distribution(spark, clips, algo, opts, out_dir) -> str:
    from go_cdc_chunkers_spark.operators import chunking, stats

    chunks = chunking.chunk_clips(clips, algo, opts, digest=False)
    hist = stats.length_histogram(chunks, n_bins=60).collect()
    from pyspark.sql import functions as F

    lohi = chunks.agg(F.min("length").alias("lo"), F.max("length").alias("hi")
                      ).collect()[0]
    lo, hi = lohi["lo"], lohi["hi"]
    width = max((hi - lo) / 60.0, 1.0)
    bars = [(lo + r["bin"] * width, lo + (r["bin"] + 1) * width, r["n"])
            for r in hist]
    svg = svg_bars(
        f"{algo} — chunk-size distribution (min={opts.min_size or 'def'} "
        f"avg={opts.normal_size or 'def'} max={opts.max_size or 'def'})",
        "chunk size (bytes)", "count", bars)
    return _write(out_dir, "chunk-distribution.svg", svg)


def plot_cdf(spark, clips, algo, opts, out_dir) -> str:
    from go_cdc_chunkers_spark.operators import chunking, stats

    chunks = chunking.chunk_clips(clips, algo, opts, digest=False)
    rows = stats.length_cdf(chunks).collect()
    pts = [(r["length"], 100.0 * r["cdf"]) for r in rows]
    svg = svg_line(f"{algo} — chunk-size CDF ({len(pts)} distinct lengths)",
                   "chunk size (bytes)", "cumulative %", pts, markers=False)
    return _write(out_dir, "chunk-size-cdf.svg", svg)


def plot_resync(spark, clips, algo, opts, edit_size, out_dir) -> str:
    """main.go:287-311: shared% vs insertion count on the first file. Edits
    use the engine's deterministic sample-insertion model
    (sources/clips.edit_pcm_bytes: one 2-byte PCM sample per insertion;
    the reference's -edit-size byte knob has no separate analogue, the
    flag is accepted for CLI parity and recorded in the title)."""
    from pyspark.sql import functions as F

    from go_cdc_chunkers_spark.operators import chunking, stats
    from go_cdc_chunkers_spark.sources import clips as clips_src

    first = clips.orderBy("clip_id").select("clip_id", "bytes").first()
    orig = bytes(first["bytes"])
    orig_df = spark.createDataFrame([(first["clip_id"], bytearray(orig))],
                                    "clip_id string, bytes binary")
    orig_chunks = chunking.chunk_clips(orig_df, algo, opts).persist()
    pts = []
    for n in RESYNC_STEPS:
        edited = (orig if n == 0
                  else clips_src.edit_pcm_bytes(orig, n, seed=1000 + n))
        edf = spark.createDataFrame([(first["clip_id"], bytearray(edited))],
                                    "clip_id string, bytes binary")
        shared = stats.resync_shared(
            orig_chunks, chunking.chunk_clips(edf, algo, opts)).collect()[0]
        pts.append((float(n), 100.0 * shared["shared_pct"]))
    orig_chunks.unpersist()
    svg = svg_line(f"{algo} — resync quality vs edits ({edit_size}-sample insertions)",
                   "number of insertions", "shared chunks (% of edited file)", pts)
    return _write(out_dir, "resync-impact.svg", svg)


def plot_dedup_sweep(spark, clips, algo, out_dir) -> str:
    from go_cdc_chunkers_spark.operators import chunking, stats

    rows = stats.dedup_sweep(clips, algo, list(SWEEP_AVGS),
                             chunking.chunk_clips).collect()
    pts = [(float(r["avg_size"]), float(r["dedup_ratio"])) for r in rows]
    svg = svg_line(f"{algo} — dedup ratio vs avg chunk size",
                   "avg size (bytes)", "dedup ratio (lower = better)",
                   pts, log_x=True)
    return _write(out_dir, "dedup-sweep.svg", svg)


def _write(out_dir: str, name: str, svg: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, name)
    with open(p, "w") as f:
        f.write(svg + "\n")
    return p


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", default="all",
                    choices=["distribution", "resync", "dedup-sweep", "count",
                             "all"])
    ap.add_argument("--out", default=".")
    ap.add_argument("--chunkers", default="fastcdc-v1.0.0,jc-v1.1.0,ultracdc-v1.0.0")
    ap.add_argument("--path", default=None, help="input file tree")
    ap.add_argument("--glob", default=None)
    ap.add_argument("--synthetic", type=int, default=None,
                    help="N synthetic clips instead of --path")
    ap.add_argument("--min", dest="min_size", type=int, default=2 * 1024)
    ap.add_argument("--avg", dest="avg_size", type=int, default=8 * 1024)
    ap.add_argument("--max", dest="max_size", type=int, default=64 * 1024)
    ap.add_argument("--edit-size", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()
    if not args.path and not args.synthetic:
        ap.error("need --path or --synthetic")

    from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts
    from go_cdc_chunkers_spark.session import get_spark

    spark = get_spark(app="cdcplot", cpus=args.cpus)
    try:
        if args.synthetic:
            from go_cdc_chunkers_spark.sources import clips as clips_src

            rows, _ = clips_src.generate_clips(
                n_base=args.synthetic, dup_frac=0.2, near_frac=0.2,
                n_const=0, seed=7, min_ms=1500, max_ms=4000)
            clips = spark.createDataFrame(
                [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
                "clip_id string, bytes binary")
        else:
            from go_cdc_chunkers_spark.sources.files import clips_from_files

            clips = clips_from_files(spark, args.path, glob=args.glob)
        clips = clips.cache()
        clips.count()
        opts = ChunkerOpts(min_size=args.min_size, normal_size=args.avg_size,
                           max_size=args.max_size)
        kinds = (["distribution", "resync", "dedup-sweep", "count"]
                 if args.kind == "all" else [args.kind])
        written = []
        for algo in [a.strip() for a in args.chunkers.split(",") if a.strip()]:
            d = os.path.join(args.out, _sanitize(algo))
            for k in kinds:
                if k == "distribution":
                    written.append(plot_distribution(spark, clips, algo, opts, d))
                elif k == "count":
                    written.append(plot_cdf(spark, clips, algo, opts, d))
                elif k == "resync":
                    written.append(plot_resync(spark, clips, algo, opts,
                                               args.edit_size, d))
                elif k == "dedup-sweep":
                    written.append(plot_dedup_sweep(spark, clips, algo, d))
        for p in written:
            print(p)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
