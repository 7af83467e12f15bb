"""Range-split + overlap-stitch chunking == whole-buffer chunking,
byte-exact (operators/bigfile.py).

The whole-buffer kernel output (cdc/kernels.py, itself byte-exact vs the
reference goldens) is the oracle; the stitched pipeline must reproduce it
for files many times larger than one range, across algorithms, for
pathological content (via the fallback), and at edge sizes.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_cdc_chunkers_spark.cdc import kernels
from go_cdc_chunkers_spark.cdc.opts import ChunkerOpts, resolve
from go_cdc_chunkers_spark.operators import bigfile

OPTS = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192)
R, O = 65536, 32768  # file >> range; overlap = 4x MaxSize


def _write(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def _files_df(spark, paths):
    import os

    return spark.createDataFrame(
        [(p, os.path.getsize(p)) for p in paths], "clip_id string, size long"
    )


def _expected(algo, data, opts=OPTS):
    return [
        (i, off, ln, h)
        for i, (off, ln, h) in enumerate(kernels.split_chunks(resolve(algo, opts), data))
    ]


def _got(df, path):
    rows = df.filter(F.col("clip_id") == path).orderBy("chunk_idx").collect()
    return [(r.chunk_idx, r.offset, r.length, bytes(r.chunk_hash)) for r in rows]


@pytest.mark.parametrize(
    "algo",
    ["fastcdc-v1.0.0", "fastcdc", "ultracdc-v1.0.0", "jc-v1.1.0",
     "fastcdc4stadia", "fixed-v1.0.0"],
)
def test_stitched_equals_whole_buffer(spark, tmp_path, algo):
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, size=400_000, dtype=np.uint8).tobytes()
    opts = OPTS if algo != "fixed-v1.0.0" else ChunkerOpts(
        min_size=1024, normal_size=1024, max_size=1024
    )
    path = _write(tmp_path, f"{algo}.bin", data)
    out = bigfile.chunk_files_ranged(
        spark, _files_df(spark, [path]), algo, opts, range_bytes=R, overlap=O
    )
    assert _got(out, path) == _expected(algo, data, opts)


def test_keyed_gear_stitched(spark, tmp_path):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    opts = ChunkerOpts(min_size=256, normal_size=1024, max_size=8192,
                       key=bytes(range(32)))
    path = _write(tmp_path, "keyed.bin", data)
    out = bigfile.chunk_files_ranged(
        spark, _files_df(spark, [path]), "kfastcdc", opts,
        range_bytes=R, overlap=O,
    )
    assert _got(out, path) == _expected("kfastcdc", data, opts)


def test_edge_sizes_and_many_files(spark, tmp_path):
    """One job over files at every interesting size class: empty, tiny
    (< MinSize), single-range, exactly range-aligned, range+1."""
    rng = np.random.default_rng(3)
    sizes = [0, 100, 5000, R + O, 2 * R, 2 * R + 1, 3 * R - 17]
    paths, datas = [], {}
    for i, n in enumerate(sizes):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        p = _write(tmp_path, f"f{i}_{n}.bin", data)
        paths.append(p)
        datas[p] = data
    out = bigfile.chunk_files_ranged(
        spark, _files_df(spark, paths), "fastcdc-v1.0.0", OPTS,
        range_bytes=R, overlap=O,
    ).cache()
    for p in paths:
        assert _got(out, p) == _expected("fastcdc-v1.0.0", datas[p]), p


def test_pathological_constant_content_falls_back_exact(spark, tmp_path):
    """Constant bytes force back-to-back MaxSize cuts; a misaligned cold
    scan can never agree, so the stitch must detect the dead seam and the
    fallback must still produce the exact whole-buffer chunking."""
    data = b"\xaa" * 300_000
    path = _write(tmp_path, "const.bin", data)
    files = _files_df(spark, [path])

    marked = bigfile.chunk_files_ranged(
        spark, files, "fastcdc-v1.0.0", OPTS, range_bytes=R, overlap=O,
        on_stitch_failure="keep_markers",
    )
    mrows = marked.filter(F.col("chunk_idx") == -1).collect()
    fellback = len(mrows) == 1
    out = bigfile.chunk_files_ranged(
        spark, files, "fastcdc-v1.0.0", OPTS, range_bytes=R, overlap=O
    )
    assert _got(out, path) == _expected("fastcdc-v1.0.0", data)
    # document which path produced it (constant content SHOULD fail resync
    # unless the period happens to align ranges with cuts)
    exp_lengths = [ln for _i, _o, ln, _h in _expected("fastcdc-v1.0.0", data)]
    if not fellback:
        # resync succeeded only if range starts aligned with the cut grid
        assert R % max(set(exp_lengths[:-1]) or {1}) == 0


def test_mixed_corpus_with_pathological_member(spark, tmp_path):
    """Good and pathological files in ONE job: stitched + rescued unions
    must both be exact."""
    rng = np.random.default_rng(11)
    good = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    bad = b"\x00" * 200_000
    pg = _write(tmp_path, "good.bin", good)
    pb = _write(tmp_path, "bad.bin", bad)
    out = bigfile.chunk_files_ranged(
        spark, _files_df(spark, [pg, pb]), "fastcdc-v1.0.0", OPTS,
        range_bytes=R, overlap=O,
    ).cache()
    assert _got(out, pg) == _expected("fastcdc-v1.0.0", good)
    assert _got(out, pb) == _expected("fastcdc-v1.0.0", bad)


def test_validation(spark, tmp_path):
    files = _files_df(spark, [])
    with pytest.raises(ValueError, match="overlap"):
        bigfile.chunk_files_ranged(spark, files, "fastcdc-v1.0.0", OPTS,
                                   range_bytes=R, overlap=100)
    with pytest.raises(ValueError, match="seam locality"):
        bigfile.chunk_files_ranged(spark, files, "fastcdc-v1.0.0", OPTS,
                                   range_bytes=2 * 8192, overlap=4 * 8192)


def test_list_local_files(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.pcm").write_bytes(b"x" * 10)
    (tmp_path / "sub" / "b.pcm").write_bytes(b"y" * 20)
    (tmp_path / "sub" / "c.txt").write_bytes(b"z")
    got = bigfile.list_local_files(spark, str(tmp_path), glob="*.pcm").collect()
    assert sorted((r.clip_id.split("/")[-1], r.size) for r in got) == [
        ("a.pcm", 10), ("b.pcm", 20)
    ]


def test_cli_ranged_matches_whole(tmp_path):
    """jobs/cdc.py --ranged: the CLI face of chunk_files_ranged produces
    the same chunks as whole-file loading (measure rows identical;
    distribution identical up to double-agg fold order in stddev)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    import numpy as np

    tree = tmp_path / "tree"
    tree.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        (tree / f"f{i}.pcm").write_bytes(
            rng.integers(0, 256, size=2_000_000, dtype=np.uint8).tobytes())

    job = Path(__file__).parent.parent / "jobs" / "cdc.py"
    outs = {}
    for name, extra in (("whole", []), ("ranged", ["--ranged", "--range-mb", "1"])):
        r = subprocess.run(
            [sys.executable, str(job), "analyze", "--path", str(tree),
             "--cpus", "4", "--min-size", "256", "--normal-size", "1024",
             "--max-size", "8192", *extra],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-800:]
        outs[name] = json.loads(r.stdout.strip().splitlines()[-1])

    assert outs["whole"]["measure"] == outs["ranged"]["measure"]
    dw, dr = outs["whole"]["distribution"][0], outs["ranged"]["distribution"][0]
    sw, sr = dw.pop("stddev_len"), dr.pop("stddev_len")
    assert dw == dr
    assert abs(sw - sr) < 1e-6
