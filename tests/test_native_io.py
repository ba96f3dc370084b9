"""Native inflate (native/fast_inflate.cpp via utils/native_io.py).

The native decode path is the input pipeline's host hot loop (SURVEY
§5.8; replaces the reference's process-pool decode in the koafusion run
apps). These tests pin its contract directly: byte identity with the
Python codec, the multi-member-gzip grow path (ISIZE undercounts), and
graceful fallback on corrupt input. No JAX.
"""

import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

from oaprogressionmmf_tpu.utils import native_io


@pytest.fixture(scope="module")
def lib_available():
    if os.environ.get("OAPROG_NO_NATIVE"):
        pytest.skip("OAPROG_NO_NATIVE set")
    if native_io._load() is None:
        pytest.skip("native library unavailable on this host")
    return True


def test_inflate_identity(tmp_path, lib_available):
    rng = np.random.RandomState(0)
    # compressible volume-ish payload, incl. a high-entropy tail
    data = np.concatenate([
        np.repeat(rng.randint(0, 50, 40_000), 17).astype(np.uint8),
        rng.randint(0, 256, 123_457).astype(np.uint8),
    ]).tobytes()
    p = tmp_path / "vol.bin.gz"
    p.write_bytes(gzip.compress(data, 6))
    out = native_io.inflate_gz(p)
    assert out is not None
    assert out.tobytes() == data


def test_inflate_empty_payload(tmp_path, lib_available):
    p = tmp_path / "empty.gz"
    p.write_bytes(gzip.compress(b"", 6))
    # ISIZE==0 → inflate_gz returns None (caller falls back to gzip),
    # never a wrong-sized buffer
    assert native_io.inflate_gz(p) is None


def test_inflate_multimember_grow_path(tmp_path, lib_available):
    # Concatenated gzip members: trailing ISIZE counts only the LAST
    # member, so the first sized attempt must report "more data" and the
    # wrapper grows (x4, 3 tries) until the whole logical stream fits.
    rng = np.random.RandomState(2)
    m1 = rng.randint(0, 256, 40_000).astype(np.uint8).tobytes()
    m2 = rng.randint(0, 256, 30_000).astype(np.uint8).tobytes()  # ISIZE=30k
    p = tmp_path / "multi.gz"
    p.write_bytes(gzip.compress(m1, 6) + gzip.compress(m2, 6))
    with gzip.open(p, "rb") as f:
        expect = f.read()
    assert expect == m1 + m2
    out = native_io.inflate_gz(p)
    assert out is not None
    assert out.tobytes() == expect


def test_inflate_extreme_undercount_falls_back(tmp_path, lib_available):
    # Last-member ISIZE < total/64: outside the grow budget → the native
    # wrapper must return None (no wrong data), and the read_nifti-style
    # Python fallback (gzip.open reads all members) stays correct.
    big = bytes(range(256)) * 4096        # 1 MiB member 1
    small = b"t" * 16                     # ISIZE = 16
    p = tmp_path / "extreme.gz"
    p.write_bytes(gzip.compress(big, 6) + gzip.compress(small, 6))
    assert native_io.inflate_gz(p) is None
    with gzip.open(p, "rb") as f:
        assert f.read() == big + small


def test_inflate_corrupt_returns_none(tmp_path, lib_available):
    good = gzip.compress(b"x" * 10_000, 6)
    p = tmp_path / "corrupt.gz"
    p.write_bytes(good[: len(good) // 2])  # truncated stream
    assert native_io.inflate_gz(p) is None

    q = tmp_path / "notgzip.gz"
    q.write_bytes(b"this is not a gzip stream, not even close" * 100)
    assert native_io.inflate_gz(q) is None


def test_read_nifti_uses_native_path(tmp_path, lib_available):
    from oaprogressionmmf_tpu.utils.formats import (
        nifti_to_numpy, numpy_to_nifti, read_nifti)
    rng = np.random.RandomState(1)
    vol = rng.randint(0, 255, (31, 17, 9)).astype(np.uint8)
    p = tmp_path / "v.nii.gz"
    numpy_to_nifti(vol, str(p))
    data, _affine = read_nifti(str(p), preserve_dtype=True)
    np.testing.assert_array_equal(np.asarray(data), vol)
    stack, _spacings = nifti_to_numpy(str(p))
    np.testing.assert_array_equal(stack, vol)


def test_deflate_roundtrip(tmp_path, lib_available):
    rng = np.random.RandomState(3)
    raw = np.concatenate([
        np.repeat(rng.randint(0, 60, 30_000), 11).astype(np.uint8),
        rng.randint(0, 256, 77_001).astype(np.uint8),
    ]).tobytes()
    p = tmp_path / "w.gz"
    assert native_io.deflate_gz(raw, p, level=6)
    with gzip.open(p, "rb") as f:
        assert f.read() == raw
    # and back through the native inflate path
    out = native_io.inflate_gz(p)
    assert out is not None and out.tobytes() == raw
    # ndarray input form
    assert native_io.deflate_gz(np.frombuffer(raw, np.uint8), p, level=1)
    with gzip.open(p, "rb") as f:
        assert f.read() == raw


def test_write_nifti_gz_native_path(tmp_path, lib_available):
    from oaprogressionmmf_tpu.utils.formats import (
        nifti_to_numpy, numpy_to_nifti)
    rng = np.random.RandomState(4)
    vol = rng.randint(0, 255, (23, 11, 7)).astype(np.uint8)
    p = tmp_path / "w.nii.gz"
    numpy_to_nifti(vol, str(p))          # native compress
    stack, _ = nifti_to_numpy(str(p))    # native inflate
    np.testing.assert_array_equal(stack, vol)
    # the file is a plain gzip stream any consumer can read
    with gzip.open(p, "rb") as f:
        assert f.read(4) == b"\x5c\x01\x00\x00"  # sizeof_hdr=348 LE


def test_makefile_builds_from_clean(tmp_path):
    """The first-use auto-build contract: `make` from a clean tree links
    (with libdeflate when the toolchain has it, zlib otherwise)."""
    if os.environ.get("OAPROG_NO_NATIVE"):
        pytest.skip("native path disabled (OAPROG_NO_NATIVE)")
    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no native toolchain on this host")
    src = native_io._NATIVE_DIR
    build = tmp_path / "native"
    build.mkdir()
    for f in ("Makefile", "fast_inflate.cpp"):
        (build / f).write_bytes((src / f).read_bytes())
    r = subprocess.run(["make", "-C", str(build)], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert (build / "libfastinflate.so").exists()
