"""Native baseline JPEG decoder (utils/jpeg.py) vs the PIL/libjpeg
oracle: must match within IDCT rounding so the reference's .jpg
golden assets load identically PIL-less (ray.cpp:1035-1074)."""

import io

import numpy as np
import pytest

from shader_ray_tpu.utils.jpeg import decode_jpeg

PIL = pytest.importorskip("PIL.Image")


def _mk(img: np.ndarray, **save_kw) -> bytes:
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", **save_kw)
    return buf.getvalue()


def _oracle(data: bytes) -> np.ndarray:
    return np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"), np.int32)


def _test_image(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 127 + 100 * np.sin(xx * 0.3)
    g = 127 + 100 * np.cos(yy * 0.2)
    b = (xx + yy) * 255 / (h + w)
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_subsampling_modes(subsampling):
    # 4:4:4, 4:2:2, 4:2:0
    data = _mk(_test_image(), quality=90, subsampling=subsampling)
    got = decode_jpeg(data).astype(np.int32)
    want = _oracle(data)
    assert got.shape == want.shape
    # triangle chroma upsampling matches libjpeg's fancy upsampler
    # to a few counts; 4:4:4 is pure IDCT rounding
    tol = 2 if subsampling == 0 else 6
    assert np.abs(got - want).max() <= tol
    assert np.abs(got - want).mean() < 1.0


def test_nonmultiple_of_8_dims():
    data = _mk(_test_image(h=17, w=23), quality=95, subsampling=0)
    got = decode_jpeg(data).astype(np.int32)
    want = _oracle(data)
    assert got.shape == (17, 23, 3)
    assert np.abs(got - want).max() <= 2


def test_grayscale():
    img = _test_image()[:, :, 0]
    buf = io.BytesIO()
    PIL.fromarray(img, mode="L").save(buf, format="JPEG", quality=92)
    data = buf.getvalue()
    got = decode_jpeg(data).astype(np.int32)
    want = _oracle(data)
    assert np.abs(got - want).max() <= 2


def test_restart_intervals():
    buf = io.BytesIO()
    PIL.fromarray(_test_image(64, 64)).save(
        buf, format="JPEG", quality=88, restart_marker_blocks=2,
        subsampling=0,
    )
    data = buf.getvalue()
    assert b"\xdd" in data[:1000]  # DRI present
    got = decode_jpeg(data).astype(np.int32)
    want = _oracle(data)
    assert np.abs(got - want).max() <= 2


def test_progressive_raises_clean():
    data = _mk(_test_image(), quality=85, progressive=True)
    with pytest.raises(ValueError, match="SOF2|baseline"):
        decode_jpeg(data)


def test_background_loader_uses_native_jpeg(tmp_path):
    from shader_ray_tpu.models.background import load_background

    p = tmp_path / "env.jpg"
    img = _test_image(32, 64)
    PIL.fromarray(img).save(p, quality=95, subsampling=0)
    out = load_background(str(p))
    assert out.shape == (32, 64, 3) and out.dtype == np.float32
    assert np.abs(out * 255 - img.astype(np.float32)).max() < 6
