"""cdcplot SVG face (tools/cdcplot.py vs /root/reference/cmd/cdcplot):
the four per-algorithm charts render well-formed SVG whose geometry
matches the already-oracle-checked relations they draw (histogram bar
count, CDF monotonicity, resync curve start/decay, sweep point count)."""

import sys
import xml.etree.ElementTree as ET

import pytest

sys.path.insert(0, "/root/repo")

from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts  # noqa: E402
from go_cdc_chunkers_spark.sources import clips as clips_src  # noqa: E402

SVG_NS = "{http://www.w3.org/2000/svg}"


@pytest.fixture(scope="module")
def plot_clips(spark):
    rows, _ = clips_src.generate_clips(
        n_base=8, dup_frac=0.25, near_frac=0.0, n_const=0, seed=7,
        min_ms=1500, max_ms=3000)
    df = spark.createDataFrame(
        [(r["clip_id"], bytearray(r["bytes"])) for r in rows],
        "clip_id string, bytes binary")
    df.cache().count()
    return df


def _parse(path):
    return ET.parse(path).getroot()


def test_distribution_svg_matches_histogram(spark, plot_clips, tmp_path):
    from go_cdc_chunkers_spark.operators import chunking, stats
    from tools import cdcplot

    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
    p = cdcplot.plot_distribution(spark, plot_clips, "fastcdc-v1.0.0", opts,
                                  str(tmp_path))
    root = _parse(p)
    # one bar rect per non-empty histogram bin (+1 background rect)
    hist = stats.length_histogram(
        chunking.chunk_clips(plot_clips, "fastcdc-v1.0.0", opts, digest=False),
        n_bins=60).collect()
    nonzero = sum(1 for r in hist if r["n"] > 0)
    rects = root.findall(f"{SVG_NS}rect")
    assert len(rects) == nonzero + 1


def test_cdf_svg_monotone(spark, plot_clips, tmp_path):
    from tools import cdcplot

    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
    p = cdcplot.plot_cdf(spark, plot_clips, "fastcdc-v1.0.0", opts,
                         str(tmp_path))
    root = _parse(p)
    poly = root.find(f"{SVG_NS}polyline")
    pts = [tuple(map(float, t.split(","))) for t in poly.get("points").split()]
    assert len(pts) > 20
    xs, ys = [x for x, _ in pts], [y for _, y in pts]
    assert xs == sorted(xs)            # lengths ascending
    assert ys == sorted(ys, reverse=True)  # SVG y down = cdf ascending


def test_resync_svg_starts_full_and_decays(spark, plot_clips, tmp_path):
    from tools import cdcplot

    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
    p = cdcplot.plot_resync(spark, plot_clips, "fastcdc-v1.0.0", opts, 1,
                            str(tmp_path))
    root = _parse(p)
    markers = root.findall(f"{SVG_NS}circle")
    assert len(markers) == len(cdcplot.RESYNC_STEPS)
    ys = [float(c.get("cy")) for c in markers]
    # first point (0 edits) is 100% shared = the chart's minimum y (top)
    assert ys[0] == min(ys)


def test_dedup_sweep_svg_point_count(spark, plot_clips, tmp_path):
    from tools import cdcplot

    p = cdcplot.plot_dedup_sweep(spark, plot_clips, "fastcdc-v1.0.0",
                                 str(tmp_path))
    root = _parse(p)
    assert len(root.findall(f"{SVG_NS}circle")) == len(cdcplot.SWEEP_AVGS)
    # dup_frac=0.25 corpus: dedup ratio < 1 at every size (dups detected)
    poly = root.find(f"{SVG_NS}polyline")
    assert poly is not None
