import numpy as np
import pytest

from oaprogressionmmf_tpu.utils import formats as F


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16,
                                   np.float32, np.float64])
@pytest.mark.parametrize("gz", [False, True])
def test_nifti_roundtrip_dtypes(tmp_path, dtype, gz):
    rng = np.random.RandomState(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.randint(0, 200, size=(7, 5, 3)).astype(dtype)
    else:
        data = rng.rand(7, 5, 3).astype(dtype)
    fn = tmp_path / ("vol.nii.gz" if gz else "vol.nii")
    F.write_nifti(data, fn, affine=np.diag([0.5, 0.7, 2.0, 1.0]))
    out, affine = F.read_nifti(fn)
    np.testing.assert_allclose(out, data.astype(np.float64))
    np.testing.assert_allclose(np.diag(affine)[:3], [0.5, 0.7, 2.0])


def test_ras_ipr_roundtrip(tmp_path):
    """IPR write → read must reproduce stack and spacings (parity with
    koafusion/various/_formats.py:107-139)."""
    rng = np.random.RandomState(1)
    stack = rng.rand(6, 5, 4)  # (row, col, plane) in IPR+
    spacings = (0.36, 0.36, 0.7)
    fn = tmp_path / "dess.nii.gz"
    F.numpy_to_nifti(stack, fn, spacings=spacings, ipr_to_ras=True)
    out, sp = F.nifti_to_numpy(fn, ras_to_ipr=True)
    np.testing.assert_allclose(out, stack)
    np.testing.assert_allclose(sp, spacings)


def test_ras_irp_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    stack = rng.rand(6, 5, 4)
    spacings = (0.36, 0.36, 3.0)
    fn = tmp_path / "tse.nii.gz"
    F.numpy_to_nifti(stack, fn, spacings=spacings, irp_to_ras=True)
    out, sp = F.nifti_to_numpy(fn, ras_to_irp=True)
    np.testing.assert_allclose(out, stack)
    np.testing.assert_allclose(sp, spacings)


def test_fortran_order_on_disk(tmp_path):
    """NIfTI stores column-major: first axis varies fastest on disk."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    fn = tmp_path / "v.nii"
    F.write_nifti(data, fn)
    raw = fn.read_bytes()
    vox = np.frombuffer(raw[352:], dtype=np.float32)
    np.testing.assert_array_equal(vox[:2], data[:, 0, 0])


def test_png_roundtrip(tmp_path):
    img = (np.random.RandomState(3).rand(20, 30) * 255).astype(np.uint8)
    fn = tmp_path / "im.png"
    F.numpy_to_png(img, fn)
    out = F.png_to_numpy(fn)
    np.testing.assert_array_equal(out, img)


def test_png_series_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    stack = (rng.rand(8, 9, 5) * 255).astype(np.uint8)
    for i in range(stack.shape[-1]):
        F.numpy_to_png(stack[..., i], tmp_path / f"s_{i:03d}.png")
    out = F.png_series_to_numpy(tmp_path / "s_*.png")
    np.testing.assert_array_equal(out, stack)
    out_r = F.png_series_to_numpy(tmp_path / "s_*.png", reverse=True)
    np.testing.assert_array_equal(out_r, stack[..., ::-1])


def test_scl_slope_applied(tmp_path):
    """Reader honours scl_slope/scl_inter like nibabel get_fdata()."""
    import struct
    data = np.arange(6, dtype=np.int16).reshape(3, 2, 1)
    fn = tmp_path / "scaled.nii"
    F.write_nifti(data, fn)
    raw = bytearray(fn.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 5.0)   # scl_inter
    fn.write_bytes(bytes(raw))
    out, _ = F.read_nifti(fn)
    np.testing.assert_allclose(out, data * 2.0 + 5.0)
