"""DICOM codec + MRI/XR prep-app pipeline tests on synthetic series."""

import numpy as np
import pandas as pd
import pytest

from oaprogressionmmf_tpu.utils import dicom as D
from oaprogressionmmf_tpu.utils.formats import nifti_to_numpy, numpy_to_png


def _write_slice(path, *, rows=8, cols=8, value=None, series="SAG_3D_DESS_RIGHT",
                 instance=1, slice_loc=0.0, echo=1, echo_time=10.0,
                 ipp=(0.0, 0.0, 0.0), iop=(0, 1, 0, 0, 0, -1),
                 photometric="MONOCHROME2", explicit=True):
    pix = (np.full((rows, cols), instance, np.uint16) if value is None
           else value.astype(np.uint16))
    D.dcmwrite(path, {
        "PatientID": "9000001", "SeriesDescription": series,
        "Rows": rows, "Columns": cols, "BitsAllocated": 16,
        "PixelRepresentation": 0, "SamplesPerPixel": 1,
        "PixelSpacing": [0.36, 0.36], "SliceThickness": 0.7,
        "EchoTime": echo_time, "EchoNumbers": echo, "SliceLocation": slice_loc,
        "InstanceNumber": instance, "ImagePositionPatient": list(ipp),
        "ImageOrientationPatient": list(iop),
        "PhotometricInterpretation": photometric,
        "BodyPartExamined": "KNEE",
        "PixelData": pix.tobytes(),
    }, explicit=explicit)
    return pix


@pytest.mark.parametrize("explicit", [True, False])
def test_dicom_roundtrip(tmp_path, explicit):
    pix = _write_slice(tmp_path / "a.dcm", explicit=explicit)
    ds = D.dcmread(tmp_path / "a.dcm")
    assert ds.PatientID == "9000001"
    assert ds.SeriesDescription == "SAG_3D_DESS_RIGHT"
    assert float(ds.SliceThickness) == pytest.approx(0.7)
    assert list(np.asarray(ds.PixelSpacing)) == pytest.approx([0.36, 0.36])
    np.testing.assert_array_equal(ds.pixel_array, pix)


def test_dicom_stop_before_pixels(tmp_path):
    _write_slice(tmp_path / "a.dcm")
    ds = D.dcmread(tmp_path / "a.dcm", stop_before_pixels=True)
    assert float(ds.SliceLocation) == 0.0
    with pytest.raises(AttributeError):
        _ = ds.pixel_array


def test_reorient_to():
    from oaprogressionmmf_tpu.run.prepare_data_mri_oai import reorient_to
    vol = np.arange(2 * 3 * 4).reshape(2, 3, 4).astype(float)
    # axes: axis0 → S(uperior), axis1 → P(osterior), axis2 → L(eft)
    dirs = ([0, 0, 1], [0, 1, 0], [1, 0, 0])
    out = reorient_to(vol, dirs, "IPR")
    # I = flip of S → axis0 flipped; P stays axis1; R = flip of L → flipped
    np.testing.assert_array_equal(out, vol[::-1, :, ::-1])
    assert out.shape == (2, 3, 4)
    out2 = reorient_to(vol, dirs, "IRP")
    assert out2.shape == (2, 4, 3)


def _make_dess_series(root, n_slices=40, rows=40, cols=40):
    # sagittal: row dir = +y (P), col dir = -z (I); normal = row x col = -x (R)
    sdir = root / "0.C.2" / "9000001" / "20050101" / "12345"
    sdir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(n_slices):
        _write_slice(sdir / f"{i:03d}.dcm",
                     rows=rows, cols=cols,
                     value=rng.randint(0, 2000, (rows, cols)),
                     series="SAG_3D_DESS_RIGHT", instance=i + 1,
                     ipp=(-i * 0.7, 0.0, 0.0), iop=(0, 1, 0, 0, 0, -1))
    return sdir


def test_mri_prep_end_to_end(tmp_path):
    from oaprogressionmmf_tpu.run import prepare_data_mri_oai as prep
    sdir = _make_dess_series(tmp_path / "raw")
    out_root = tmp_path / "out"
    out_root.mkdir()
    meta = prep.handle_series({"dir_root_output": str(out_root)}, str(sdir))
    assert meta["sequence"] == "SAG_3D_DESS"
    assert meta["side"] == "RIGHT"
    assert meta["visit_month"] == "000m"
    path_img = (out_root / "9000001" / "000m" /
                "KNEE__RIGHT__SAG_3D_DESS" / "image.nii.gz")
    assert path_img.exists()
    vol, spacings = nifti_to_numpy(path_img, ras_to_ipr=True)
    # 16px margin crop on rows/cols; slices unchanged
    assert vol.shape == (40 - 32, 40 - 32, 40)
    assert vol.max() <= 255  # DESS compressed to uint8 range


def test_t2_prep_end_to_end(tmp_path):
    from oaprogressionmmf_tpu.run import prepare_data_mri_oai as prep
    sdir = tmp_path / "raw" / "0.C.2" / "9000002" / "20050101" / "777"
    sdir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    rows = cols = 40
    t2_true = 0.05
    n_slices, n_echoes = 3, 7
    tes_ms = np.linspace(10, 70, n_echoes)
    amp = 3000.0
    for s in range(n_slices):
        for e in range(n_echoes):
            val = amp * np.exp(-(tes_ms[e] / 1000.0) / t2_true)
            img = np.full((rows, cols), val)
            _write_slice(sdir / f"s{s}_e{e}.dcm", rows=rows, cols=cols,
                         value=img, series="SAG_T2_MAP_LEFT",
                         instance=s * n_echoes + e + 1,
                         slice_loc=float(s), echo=e + 1,
                         echo_time=float(tes_ms[e]))
    out_root = tmp_path / "out"
    out_root.mkdir()
    meta = prep.handle_series({"dir_root_output": str(out_root)}, str(sdir))
    assert meta["sequence"] == "SAG_T2_MAP"
    path_img = (out_root / "9000002" / "000m" /
                "KNEE__LEFT__SAG_T2_MAP" / "image.nii.gz")
    vol, _ = nifti_to_numpy(path_img, ras_to_ipr=True)
    # constant decay → T2 everywhere ≈ 0.05 s (quantization from uint16 pix)
    np.testing.assert_allclose(vol, t2_true, atol=2e-3)


def test_xr_prep_end_to_end(tmp_path):
    from oaprogressionmmf_tpu.run import prepare_data_xr_oulu as prep
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.RandomState(2)
    for name in ("9000001_00_L.png", "9000001_00_R.png",
                 "9000001_12_L.png"):
        numpy_to_png((rng.rand(32, 32) * 255).astype(np.uint8), raw / name)
    out = tmp_path / "out"
    prep.main([f"dir_root_mipt_xr={raw}", f"dir_root_output={out}",
               "num_threads=1"])
    df = pd.read_csv(out / "meta_base.csv")
    assert len(df) == 2  # baseline visits only
    assert set(df["side"]) == {"LEFT", "RIGHT"}
    assert (out / "9000001" / "000m" / "KNEE__LEFT__XR_PA" /
            "image.png").exists()
